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

_BORDERED = re.compile(
    r"(?:\n|^)"
    r"(?:\|.*?\|.*?\|.*?\n)"
    r"(?:\|(?:\s*[:-]+[-| :]*\s*)\|.*?\n)"
    r"(?:\|.*?\|.*?\|.*?\n)+"
)
_BORDERLESS = re.compile(
    r"(?:\n|^)"
    r"(?:\S.*?\|.*?\n)"
    r"(?:(?:\s*[:-]+[-| :]*\s*).*?\n)"
    r"(?:\S.*?\|.*?\n)+"
)
_HTML_TABLE = re.compile(
    r"(?:\n|^)\s*(?:"
    r"(?:<html[^>]*>\s*<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>\s*</html>)"
    r"|(?:<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>)"
    r"|(?:<table[^>]*>.*?</table>)"
    r")\s*(?=\n|$)",
    re.DOTALL | re.IGNORECASE,
)


def split_markdown_tables(
    text: str, separate_tables: bool = True
) -> tuple[str, list[str]]:
    tables: list[str] = []
    working = text

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

    if "|" in text:
        working = strip_pattern(_BORDERED, working)
        working = strip_pattern(_BORDERLESS, working)
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
