"""Minimal born-digital PDF text extraction (no external deps).

Plays the role of the reference's ``PlainParser``
(deepdoc/parser/pdf_parser.py:1243-1276, pypdf ``extract_text``): the
primary web-scale PDF path — no OCR, no layout models.  pypdf is not
available in this environment, so this is a from-scratch reader good for
simple born-digital PDFs (our fixture generator and most text-first
PDFs): it walks content streams (FlateDecode or raw), collects text
operators (Tj, TJ, ', ") inside BT/ET blocks, and emits one line per
text-positioning break (Td/TD/T*).

Scanned or exotic PDFs yield "" and fall back to the row's ``text``
column upstream — the OCR/layout stack is an optional plugin at this
tier (SURVEY.md §2.4).
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_FLATE_NEAR = re.compile(rb"/FlateDecode")


def _iter_content_streams(pdf: bytes):
    pos = 0
    for m in _STREAM_RE.finditer(pdf):
        raw = m.group(1)
        # look back a bit for the stream dict to spot the filter
        head = pdf[max(0, m.start() - 300) : m.start()]
        if _FLATE_NEAR.search(head):
            try:
                yield zlib.decompress(raw)
            except Exception:
                continue
        else:
            yield raw
        pos = m.end()
    del pos


_TEXT_BLOCK = re.compile(rb"BT(.*?)ET", re.DOTALL)
# string ops: (..) Tj | (..) ' | (..) " | <hex> Tj/'/" | [..] TJ ;
# positioning that starts a new line: Td TD T* Tm
_OP_RE = re.compile(
    rb"((?:\((?:\\.|[^()\\])*\)|<[0-9A-Fa-f\s]*>)\s*(?:Tj|'|\"))"
    rb"|(\[(?:\\.|[^\]])*?\]\s*TJ)"
    rb"|(T\*)|(-?[\d.]+\s+-?[\d.]+\s+Td)|(-?[\d.]+\s+-?[\d.]+\s+TD)"
    rb"|((?:-?[\d.]+\s+){6}Tm)",
    re.DOTALL,
)
_LITERAL = re.compile(rb"\((?:\\.|[^()\\])*\)|<[0-9A-Fa-f\s]*>", re.DOTALL)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_bytes(out: bytes) -> str:
    # UTF-16BE with BOM: how CID/Unicode-aware producers write non-ASCII
    if out[:2] == b"\xfe\xff":
        try:
            return out.decode("utf-16-be")[1:]
        except UnicodeDecodeError:
            pass
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return out.decode("latin-1", errors="ignore")


def _decode_literal(lit: bytes) -> str:
    if lit[:1] == b"<":  # hex string: <48656C6C6F>
        hx = re.sub(rb"\s+", b"", lit[1:-1])
        if len(hx) % 2:  # odd digit count: implicit trailing 0
            hx += b"0"
        try:
            return _decode_bytes(bytes.fromhex(hx.decode("ascii")))
        except ValueError:
            return ""
    body = lit[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape
                oct_digits = body[i + 1 : i + 4]
                j = 1
                while j <= 3 and body[i + j : i + j + 1].isdigit():
                    j += 1
                out.append(int(body[i + 1 : i + j], 8) & 0xFF)
                i += j
                continue
            i += 2
            out += nxt
            continue
        out += c
        i += 1
    return _decode_bytes(bytes(out))


def extract_pdf_text(pdf: bytes) -> str:
    if not pdf.startswith(b"%PDF-"):
        return ""
    lines: list[str] = []
    for stream in _iter_content_streams(pdf):
        for block in _TEXT_BLOCK.finditer(stream):
            buf: list[str] = []

            def flush() -> None:
                line = "".join(buf).strip()
                if line:
                    lines.append(line)
                buf.clear()

            for m in _OP_RE.finditer(block.group(1)):
                tj, tj_arr, tstar, td, tdd, tm = m.groups()
                if tj:
                    if tj.rstrip()[-1:] in (b"'", b'"'):
                        flush()  # ' and " move to the next line first
                    lit = _LITERAL.search(tj)
                    if lit:
                        buf.append(_decode_literal(lit.group()))
                elif tj_arr:
                    for lit in _LITERAL.finditer(tj_arr):
                        buf.append(_decode_literal(lit.group()))
                else:  # Td / TD / T* start a new line
                    flush()
            flush()
    return "\n".join(lines)
