"""Markdown -> HTML rendering for QA answers and table chunks.

The reference renders QA answers and extracted markdown tables through
the Python-Markdown package (rag/app/qa.py:31,438,450 —
``markdown(txt, extensions=['markdown.extensions.tables'])`` — and
rag/app/naive.py:365).  That package is unavailable here, so this is a
clean-room renderer of the subset those call sites actually see,
written against Python-Markdown's documented output conventions
(one tag per line for block structures, ``<p>`` paragraphs joined by
newlines, the ``tables`` extension's thead/tbody serialization):

* paragraphs (soft line breaks preserved inside one ``<p>``)
* atx (``#``..``######``) and setext (``===``/``---``) headings
* unordered/ordered lists (``<ul>/<ol>`` with one ``<li>`` per line)
* blockquotes, horizontal rules
* 4-space-indented code blocks (``<pre><code>``)
* inline: ``**strong**``, ``*em*``/``_em_``, `` `code` ``,
  ``[text](href)``, ``![alt](src)``, ``&``/``<``/``>`` escaping
* pipe tables (the ``tables`` extension) incl. per-column alignment

Exactness is verified at deploy against the real package by
``scripts/parity_markdown.py`` (the readability-harness pattern:
byte-compares this renderer with ``markdown.markdown`` over the fuzz
corpus wherever that wheel is installed); in-sandbox the behavior is
pinned by characterization tests.  Constructs outside the subset
(raw HTML blocks, reference links, nested lists) pass through as
paragraphs — QA answers are prose and table cells.
"""

from __future__ import annotations

import re

_ATX = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_SETEXT_H1 = re.compile(r"^=+\s*$")
_SETEXT_H2 = re.compile(r"^-+\s*$")
_HR = re.compile(r"^ {0,3}((\*\s*){3,}|(-\s*){3,}|(_\s*){3,})$")
_UL_ITEM = re.compile(r"^ {0,3}[-*+]\s+(.*)$")
_OL_ITEM = re.compile(r"^ {0,3}\d+\.\s+(.*)$")
_QUOTE = re.compile(r"^ {0,3}>\s?(.*)$")
_TABLE_DIV = re.compile(r"^\s*\|?\s*:?-{1,}:?\s*(\|\s*:?-{1,}:?\s*)*\|?\s*$")

_AMP = re.compile(r"&(?![#\w]+;)")


def _escape(text: str) -> str:
    """Python-Markdown's text escaping: bare ``&`` (existing entities
    kept), ``<`` and ``>``."""
    text = _AMP.sub("&amp;", text)
    return text.replace("<", "&lt;").replace(">", "&gt;")


_CODE_SPAN = re.compile(r"(`+)(.+?)\1")
_IMG = re.compile(r"!\[([^\]]*)\]\(([^)\s]*)\)")
_LINK = re.compile(r"\[([^\]]*)\]\(([^)\s]*)\)")
_STRONG_EM = re.compile(r"\*\*\*(?=\S)(.+?)(?<=\S)\*\*\*|___(?=\S)(.+?)(?<=\S)___")
_STRONG = re.compile(r"\*\*(?=\S)(.+?)(?<=\S)\*\*|__(?=\S)(.+?)(?<=\S)__")
_EM = re.compile(r"\*(?=\S)([^*]+?)(?<=\S)\*|_(?=\S)([^_]+?)(?<=\S)_")


def _inline(text: str) -> str:
    """Inline spans over escaped text; code spans first (their content
    is literal), then images/links, strong before em."""
    out: list[str] = []
    pos = 0
    for m in _CODE_SPAN.finditer(text):
        out.append(_inline_nocode(text[pos : m.start()]))
        out.append("<code>%s</code>" % _escape(m.group(2).strip()))
        pos = m.end()
    out.append(_inline_nocode(text[pos:]))
    return "".join(out)


def _inline_nocode(text: str) -> str:
    text = _escape(text)
    text = _IMG.sub(r'<img alt="\1" src="\2" />', text)
    text = _LINK.sub(r'<a href="\2">\1</a>', text)
    text = _STRONG_EM.sub(
        lambda m: "<strong><em>%s</em></strong>" % (m.group(1) or m.group(2)),
        text,
    )
    text = _STRONG.sub(
        lambda m: "<strong>%s</strong>" % (m.group(1) or m.group(2)), text
    )
    text = _EM.sub(lambda m: "<em>%s</em>" % (m.group(1) or m.group(2)), text)
    return text


def _split_row(line: str) -> list[str]:
    row = line.strip()
    if row.startswith("|"):
        row = row[1:]
    if row.endswith("|") and not row.endswith("\\|"):
        row = row[:-1]
    cells, cur, esc = [], [], False
    for ch in row:
        if esc:
            cur.append(ch)
            esc = False
        elif ch == "\\":
            cur.append(ch)
            esc = True
        elif ch == "|":
            cells.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    cells.append("".join(cur))
    return [c.strip().replace("\\|", "|") for c in cells]


def _alignments(divider: str) -> list[str | None]:
    out: list[str | None] = []
    for cell in _split_row(divider):
        left, right = cell.startswith(":"), cell.endswith(":")
        if left and right:
            out.append("center")
        elif right:
            out.append("right")
        elif left:
            out.append("left")
        else:
            out.append(None)
    return out


def _render_table(lines: list[str]) -> list[str]:
    aligns = _alignments(lines[1])
    n = len(aligns)

    def cells(line: str) -> list[str]:
        got = _split_row(line)
        return (got + [""] * n)[:n]

    def row(vals: list[str], tag: str) -> list[str]:
        out = ["<tr>"]
        for v, a in zip(vals, aligns):
            attr = ' style="text-align: %s;"' % a if a else ""
            out.append("<%s%s>%s</%s>" % (tag, attr, _inline(v), tag))
        out.append("</tr>")
        return out

    html = ["<table>", "<thead>"]
    html += row(cells(lines[0]), "th")
    html += ["</thead>", "<tbody>"]
    for ln in lines[2:]:
        html += row(cells(ln), "td")
    html += ["</tbody>", "</table>"]
    return html


def _is_table_start(lines: list[str], i: int) -> bool:
    if i + 1 >= len(lines):
        return False
    head = lines[i]
    if "|" not in head:
        return False
    if not _TABLE_DIV.match(lines[i + 1]) or "-" not in lines[i + 1]:
        return False
    return len(_split_row(head)) == len(_split_row(lines[i + 1]))


# one render_markdown frame per blockquote level; real content nests a
# handful, a crafted "> " * 100k line otherwise blows the recursion
# limit.  Past the cap the inner text renders escaped, un-recursed.
_MAX_QUOTE_DEPTH = 32


def render_markdown(text: str, tables: bool = True, _depth: int = 0) -> str:
    """HTML for ``text`` in Python-Markdown's output shape (blocks
    joined by ``\\n``, no trailing newline)."""
    lines = (text or "").replace("\r\n", "\n").replace("\r", "\n").split("\n")
    blocks: list[str] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if not line.strip():
            i += 1
            continue
        # indented code block
        if line.startswith("    ") or line.startswith("\t"):
            code: list[str] = []
            while i < n and (
                lines[i].startswith(("    ", "\t")) or not lines[i].strip()
            ):
                code.append(
                    lines[i][4:] if lines[i].startswith("    ") else lines[i][1:]
                )
                i += 1
            while code and not code[-1].strip():
                code.pop()
            blocks.append(
                "<pre><code>%s\n</code></pre>" % _escape("\n".join(code))
            )
            continue
        m = _ATX.match(line)
        if m:
            blocks.append(
                "<h%d>%s</h%d>" % (len(m.group(1)), _inline(m.group(2)), len(m.group(1)))
            )
            i += 1
            continue
        if _HR.match(line):
            blocks.append("<hr />")
            i += 1
            continue
        if tables and _is_table_start(lines, i):
            j = i + 2
            while j < n and "|" in lines[j] and lines[j].strip():
                j += 1
            blocks.append("\n".join(_render_table(lines[i:j])))
            i = j
            continue
        m = _QUOTE.match(line)
        if m:
            inner: list[str] = []
            while i < n and (_QUOTE.match(lines[i]) or lines[i].strip()):
                qm = _QUOTE.match(lines[i])
                inner.append(qm.group(1) if qm else lines[i])
                i += 1
            inner_txt = "\n".join(inner)
            blocks.append(
                "<blockquote>\n%s\n</blockquote>"
                % (
                    render_markdown(inner_txt, tables, _depth + 1)
                    if _depth < _MAX_QUOTE_DEPTH
                    else "<p>%s</p>" % _escape(inner_txt.strip())
                )
            )
            continue
        m = _UL_ITEM.match(line) or _OL_ITEM.match(line)
        if m:
            ordered = _OL_ITEM.match(line) is not None
            pat = _OL_ITEM if ordered else _UL_ITEM
            items: list[str] = []
            while i < n:
                im = pat.match(lines[i])
                if not im:
                    break
                items.append("<li>%s</li>" % _inline(im.group(1).strip()))
                i += 1
            tag = "ol" if ordered else "ul"
            blocks.append("<%s>\n%s\n</%s>" % (tag, "\n".join(items), tag))
            continue
        # paragraph (with setext heading lookahead)
        para: list[str] = [line]
        i += 1
        while i < n and lines[i].strip():
            if (
                _SETEXT_H1.match(lines[i])
                or (_SETEXT_H2.match(lines[i]) and len(para) >= 1)
            ) and len(para) == 1:
                lvl = 1 if _SETEXT_H1.match(lines[i]) else 2
                blocks.append(
                    "<h%d>%s</h%d>" % (lvl, _inline(para[0].strip()), lvl)
                )
                para = []
                i += 1
                break
            if (
                _ATX.match(lines[i])
                or _UL_ITEM.match(lines[i])
                or _OL_ITEM.match(lines[i])
                or _QUOTE.match(lines[i])
                or (tables and _is_table_start(lines, i))
            ):
                break
            para.append(lines[i])
            i += 1
        if para:
            blocks.append(
                "<p>%s</p>" % _inline("\n".join(p.strip() for p in para))
            )
    return "\n".join(blocks)
