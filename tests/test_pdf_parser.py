"""Born-digital PDF text extraction (parsers/pdf.py) on the operator
shapes real web PDFs use: literal + hex strings, TJ kerning arrays,
escapes, UTF-16BE strings, ' / " line ops, Tm repositioning, Flate."""

from __future__ import annotations

import zlib

from ragflow_spark.parsers.pdf import extract_pdf_text


def _pdf(stream: bytes, flate: bool = False) -> bytes:
    filt = b"/Filter /FlateDecode " if flate else b""
    body = zlib.compress(stream) if flate else stream
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << " + filt + b"/Length " + str(len(body)).encode()
        + b" >> stream\n" + body + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF"
    )


def test_literal_tj_lines():
    s = b"BT /F1 12 Tf 72 720 Td (Hello) Tj 0 -14 Td (World) Tj ET"
    assert extract_pdf_text(_pdf(s)) == "Hello\nWorld"


def test_hex_string():
    s = b"BT 72 720 Td <48656C6C6F> Tj ET"
    assert extract_pdf_text(_pdf(s)) == "Hello"


def test_hex_string_odd_digits_and_whitespace():
    # odd digit count gets an implicit trailing 0; whitespace allowed
    s = b"BT 72 720 Td <48 65 6C 6C 6F2> Tj (x) Tj ET"
    assert extract_pdf_text(_pdf(s)) == "Hello x"


def test_tj_array_with_kerning():
    s = b"BT 72 720 Td [(He) -120 (llo) 20 ( wo) (rld)] TJ ET"
    assert extract_pdf_text(_pdf(s)) == "Hello world"


def test_utf16be_literal():
    txt = "café 中文".encode("utf-16-be")
    s = b"BT 72 720 Td (\xfe\xff" + txt + b") Tj ET"
    assert extract_pdf_text(_pdf(s)) == "café 中文"


def test_utf16be_hex_string():
    hx = ("﻿Hi".encode("utf-16-be")).hex().encode()
    s = b"BT 72 720 Td <" + hx + b"> Tj ET"
    assert extract_pdf_text(_pdf(s)) == "Hi"


def test_quote_ops_break_lines():
    s = b"BT 72 720 Td (a) Tj (b) ' 1 2 (c) \" ET"
    assert extract_pdf_text(_pdf(s)) == "a\nb\nc"


def test_tm_breaks_line():
    s = b"BT 1 0 0 1 72 720 Tm (x) Tj 1 0 0 1 72 700 Tm (y) Tj ET"
    assert extract_pdf_text(_pdf(s)) == "x\ny"


def test_escapes_and_octal():
    s = rb"BT 72 720 Td (par\(en\) \134 oct\101) Tj ET"
    assert extract_pdf_text(_pdf(s)) == "par(en) \\ octA"


def test_flate_stream():
    s = b"BT 72 720 Td (Compressed body text) Tj ET"
    assert extract_pdf_text(_pdf(s, flate=True)) == "Compressed body text"


def test_not_a_pdf_and_garbage():
    assert extract_pdf_text(b"hello") == ""
    assert extract_pdf_text(b"%PDF-1.4\ngarbage with no streams") == ""
