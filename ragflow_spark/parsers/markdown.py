"""Markdown table extraction + sectioning.

Behavior matched to ``RAGFlowMarkdownParser.extract_tables_and_remainder``
(deepdoc/parser/markdown_parser.py:26-106) — the same three extraction
passes (bordered md tables, borderless md tables, inline HTML tables) —
and the heading-glue sectioning of ``naive.Markdown``
(rag/app/naive.py:299-366).  ``render_tables=True`` renders extracted
tables to HTML like the reference's
``markdown(table, extensions=['markdown.extensions.tables'])``
(naive.py:365) via the clean-room renderer (text/md_render.py);
the default keeps raw markdown for backward-compatible callers.
"""

from __future__ import annotations

import re

from ..text.tokens import count_tokens

# Deterministic (linear-time) forms of the reference's lazy row shapes
# (markdown_parser.py uses e.g. `\|.*?\|.*?\|.*?\n`): chained lazy
# quantifiers backtrack combinatorially on pipe-dense lines that never
# complete a match — 2,000 lines of 250 pipes ran for minutes.  Each
# rewrite matches the SAME language: a lazy `.*?` before `\|` is
# exactly `[^|\n]*` (it can never cross a newline and never passes a
# pipe it could stop at), a trailing `.*?\n` is exactly `[^\n]*\n`
# (forced to the first newline), and the divider rows' `\s*` — which
# the reference lets cross NEWLINES, so a divider may borrow the next
# line's leading pipe (`|h|h|h\n|---\n|a|b|c\n` is a real match) or
# swallow blank lines around the dashes — becomes _WS, the same
# whitespace language factored unambiguously around `\n` so it cannot
# backtrack quadratically.  Equivalence is pinned by a fuzz compare
# against the reference patterns in tests/test_markdown_hostile.py.
_WS = r"[ \t\r\f\v]*(?:\n[ \t\r\f\v]*)*"
_BORDERED = re.compile(
    r"(?:\n|^)"
    r"(?:\|[^|\n]*\|[^|\n]*\|[^\n]*\n)"
    rf"(?:\|{_WS}[:-]+[-| :]*{_WS}\|[^\n]*\n)"
    r"(?:\|[^|\n]*\|[^|\n]*\|[^\n]*\n)+"
)
_BORDERLESS = re.compile(
    r"(?:\n|^)"
    r"(?:\S[^|\n]*\|[^\n]*\n)"
    rf"(?:{_WS}[:-]+[-| :]*{_WS}[^\n]*\n)"
    r"(?:\S[^|\n]*\|[^\n]*\n)+"
)
_HTML_TABLE = re.compile(
    r"(?:\n|^)\s*(?:"
    r"(?:<html[^>]*>\s*<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>\s*</html>)"
    r"|(?:<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>)"
    r"|(?:<table[^>]*>.*?</table>)"
    r")\s*(?=\n|$)",
    re.DOTALL | re.IGNORECASE,
)


# The row patterns above are the reference's own lazy-quantifier shapes
# (markdown_parser.py) and they backtrack combinatorially on lines
# dense with pipes that never complete a match — a single 2,000-pipe
# line costs ~16 s, a 1M-pipe line effectively hangs the executor.  No
# legitimate table row carries hundreds of columns or 64k chars, so
# such lines are swapped for pipe-free placeholders during the table
# scan and restored in the remainder afterwards (they can never be
# table rows; everything else matches exactly as before).
_MAX_ROW_PIPES = 256
_MAX_ROW_CHARS = 65_536


def _neutralize_hostile_rows(text: str) -> tuple[str, dict[str, str]]:
    if "|" not in text:
        return text, {}
    lines = text.split("\n")
    swapped: dict[str, str] = {}
    for i, ln in enumerate(lines):
        if len(ln) > _MAX_ROW_CHARS or ln.count("|") > _MAX_ROW_PIPES:
            key = f"\x00mdrow{i}\x00"
            swapped[key] = ln
            lines[i] = key
    return ("\n".join(lines), swapped) if swapped else (text, {})


def split_markdown_tables(
    text: str, separate_tables: bool = True
) -> tuple[str, list[str]]:
    tables: list[str] = []
    working, swapped = _neutralize_hostile_rows(text)

    def strip_pattern(pattern: re.Pattern, source: str) -> str:
        out = []
        last = 0
        for m in pattern.finditer(source):
            tables.append(m.group())
            if separate_tables:
                out.append(source[last : m.start()] + "\n\n")
            else:
                out.append(source[last : m.start()] + m.group() + "\n\n")
            last = m.end()
        out.append(source[last:])
        return "".join(out)

    if "|" in working:
        working = strip_pattern(_BORDERED, working)
        working = strip_pattern(_BORDERLESS, working)
    # restore before the HTML pass: a minified one-line <table> can
    # legitimately be both huge and pipe-dense, and _HTML_TABLE's lazy
    # scan to the first </table> is linear (no pipe-split backtracking).
    # One re.sub pass, not a replace per swapped line — k str.replace
    # calls each rescan the whole document (O(k*N): 100k hostile rows
    # in a 26 MB doc is terabytes of byte scanning).
    if swapped:
        working = re.sub(
            r"\x00mdrow\d+\x00",
            lambda m: swapped.get(m.group(0), m.group(0)),
            working,
        )
    if "<table>" in working.lower():
        working = strip_pattern(_HTML_TABLE, working)
    return working, tables


_HEADING = re.compile(r"^\s{0,3}(#{1,6})\s")
_CODE_FENCE = re.compile(r"^\s{0,3}(```|~~~)")


def markdown_sections(
    text: str,
    budget: int = 128,
    separate_tables: bool = False,
    render_tables: bool = False,
) -> tuple[list[tuple[str, str]], list[str]]:
    """Split into (section, "") pairs: headings glue to the following
    body until the next heading; fenced code blocks stay intact."""
    remainder, tables = split_markdown_tables(text, separate_tables)
    if render_tables and tables:
        from ..text.md_render import render_markdown

        tables = [render_markdown(t.strip(), tables=True) for t in tables]
    sections: list[tuple[str, str]] = []
    buf: list[str] = []
    in_fence = False

    def flush() -> None:
        sec = "\n".join(buf).strip()
        if sec:
            sections.append((sec, ""))
        buf.clear()

    for line in remainder.split("\n"):
        if _CODE_FENCE.match(line):
            in_fence = not in_fence
            buf.append(line)
            continue
        if not in_fence and _HEADING.match(line):
            flush()
            buf.append(line)
            continue
        if not in_fence and not line.strip():
            if buf and count_tokens("\n".join(buf)) >= budget:
                flush()
                continue
        buf.append(line)
    flush()
    return sections, tables
