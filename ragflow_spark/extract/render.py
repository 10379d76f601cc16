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

    def walk(n: Node) -> None:
        is_block = n.tag in BLOCK_TAGS
        if is_block:
            flush()
        elif n.tag in CELL_TAGS:
            # cells stay on the row's line, space-separated (html_text:
            # <tr> is a NEWLINE_TAG, <td>/<th> are not)
            buf.append(" ")
        for c in n.children:
            if isinstance(c, str):
                buf.append(c)
            else:
                walk(c)
        if is_block:
            flush()
        elif n.tag in CELL_TAGS:
            buf.append(" ")

    walk(node)
    flush()
    return "\n".join(lines)
