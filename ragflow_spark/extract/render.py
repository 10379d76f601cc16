"""Block-aware text rendering of a DOM subtree.

Stands in for html_text.extract_text (used by the reference at
deepdoc/parser/html_parser.py:46): block-level elements become line
breaks, inline content is concatenated, whitespace inside a line is
collapsed to single spaces, empty lines are dropped, lines are joined
with "\\n".
"""

from __future__ import annotations

from .dom import BLOCK_TAGS, CELL_TAGS, Node


def render_text(node: Node) -> str:
    lines: list[str] = []
    buf: list[str] = []

    def flush() -> None:
        # " ".join(split()) == collapse-whitespace + strip, in C
        line = " ".join("".join(buf).split())
        if line:
            lines.append(line)
        buf.clear()

    # explicit-stack pre/post walk: recursion here dies with
    # RecursionError on pathologically nested real-world pages (10k+
    # nested divs / unclosed-inline floods), which at corpus scale
    # would fail the whole Arrow batch.  Entries: str = text to append,
    # (node, False) = enter, (node, True) = exit actions.
    stack: list = [(node, False)]
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            buf.append(item)
            continue
        n, exiting = item
        is_block = n.tag in BLOCK_TAGS
        if is_block:
            flush()
        elif n.tag in CELL_TAGS:
            # cells stay on the row's line, space-separated (html_text:
            # <tr> is a NEWLINE_TAG, <td>/<th> are not)
            buf.append(" ")
        if exiting:
            continue
        stack.append((n, True))
        for c in reversed(n.children):
            stack.append(c if isinstance(c, str) else (c, False))
    flush()
    return "\n".join(lines)
