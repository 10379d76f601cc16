"""Crafted hostile FONT/box structures through ``pdf_pages_chars``.

tests/test_pdf_roundtrip_fuzz.py::test_hostile_bytes_never_raise covers
random corruption; these cases are structured attacks on the parsing
paths random flips essentially never reach — each one crashed the
interpreter before the guards it now pins:

* ``chr()`` past U+10FFFF from a /ToUnicode bfrange whose destination
  starts near the top of the Unicode range, and from a /Differences
  array carrying an absurd integer code;
* ``float()`` on dot-only tokens (``.``/``...``) matched by the old
  ``-?[\\d.]+`` number pattern in /DW, /MediaBox, /W;
* ``int(inf)`` OverflowError from 400-digit numbers in /W and, via the
  text matrix, from inf/NaN glyph coordinates reaching the
  ``dedupe_chars`` grid.

Contract (same as the fuzz): degrade to empty/partial chars, never
raise — upstream falls back to the row's ``text`` column.
"""

from __future__ import annotations

from ragflow_spark.parsers.pdf_chars import pdf_pages_chars

MEDIA = b"/MediaBox [0 0 612 792]"


def _pdf(objs: list[bytes]) -> bytes:
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


def _doc(
    stream: bytes, font_objs: list[bytes], media: bytes = MEDIA
) -> bytes:
    return _pdf(
        [
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
            b"3 0 obj << /Type /Page /Parent 2 0 R " + media
            + b" /Resources << /Font << /F1 5 0 R >> >>"
            b" /Contents 4 0 R >> endobj",
            b"4 0 obj << /Length " + str(len(stream)).encode()
            + b" >> stream\n" + stream + b"\nendstream endobj",
            *font_objs,
        ]
    )


def _tounicode_font(cmap_body: bytes) -> list[bytes]:
    return [
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Hostile"
        b" /Encoding /Identity-H /DescendantFonts [6 0 R]"
        b" /ToUnicode 7 0 R >> endobj",
        b"6 0 obj << /Type /Font /Subtype /CIDFontType2 /DW 1000 >> endobj",
        b"7 0 obj << /Length " + str(len(cmap_body)).encode()
        + b" >> stream\n" + cmap_body + b"\nendstream endobj",
    ]


SHOW_HEX = b"BT /F1 12 Tf 72 720 Td <00000001> Tj ET"


def test_bfrange_past_unicode_top_truncates_not_raises():
    """dst <DBFFDFFF> decodes to U+10FFFF; a range over it must stop at
    the Unicode ceiling instead of calling chr(0x110000)."""
    body = (
        b"begincmap\n1 beginbfrange\n<0000> <0010> <DBFFDFFF>\n"
        b"endbfrange\nendcmap"
    )
    pages = pdf_pages_chars(_doc(SHOW_HEX, _tounicode_font(body)))
    assert len(pages) == 1
    texts = [c["text"] for c in pages[0]["chars"]]
    # code 0 decodes (U+10FFFF); code 1 fell past the ceiling -> unmapped
    assert "\U0010FFFF" in texts or texts == []


def test_differences_with_absurd_code_never_raises():
    font = [
        b"5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /Hostile"
        b" /Encoding << /Differences [ 99999999999 /zzznope 65 /zzz ] >>"
        b" >> endobj",
    ]
    stream = b"BT /F1 12 Tf 72 720 Td (AB) Tj ET"
    pages = pdf_pages_chars(_doc(stream, font))
    assert len(pages) == 1 and len(pages[0]["chars"]) == 2


def test_dot_only_numbers_in_dw_and_w_never_raise():
    font = [
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Hostile"
        b" /Encoding /Identity-H /DescendantFonts [6 0 R] >> endobj",
        b"6 0 obj << /Type /Font /Subtype /CIDFontType2 /DW ..."
        b" /W [ . [ ... ] 1.2.3 ] >> endobj",
    ]
    pages = pdf_pages_chars(_doc(SHOW_HEX, font))
    assert len(pages) == 1  # undecodable (no ToUnicode) but not a crash


def test_huge_w_entry_overflow_degrades_to_dw():
    font = [
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Hostile"
        b" /Encoding /Identity-H /DescendantFonts [6 0 R] >> endobj",
        b"6 0 obj << /Type /Font /Subtype /CIDFontType2 /DW 1000"
        b" /W [ " + b"9" * 400 + b" [ 500 ] ] >> endobj",
    ]
    pages = pdf_pages_chars(_doc(SHOW_HEX, font))
    assert len(pages) == 1


def test_dot_only_mediabox_falls_back_to_default():
    font = [
        b"5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /H >> endobj",
    ]
    stream = b"BT /F1 12 Tf 72 720 Td (hi) Tj ET"
    pages = pdf_pages_chars(
        _doc(stream, font, media=b"/MediaBox [. . ... .]")
    )
    assert len(pages) == 1
    # the dot tokens parse to no numbers -> default letter-size box
    assert pages[0]["width"] == 612.0 and pages[0]["height"] == 792.0


def test_infinite_text_matrix_drops_glyphs_not_raises():
    """float('9'*400) is inf; inf * 0 inside the matrix product is NaN.
    Glyphs with non-finite positions must be dropped by the dedupe
    grid, not crash int()."""
    big = b"9" * 400
    font = [
        b"5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /H >> endobj",
    ]
    stream = (
        b"BT /F1 12 Tf " + big + b" 0 0 " + big + b" 0 0 Tm (xy) Tj ET\n"
        b"BT /F1 12 Tf 72 700 Td (ok) Tj ET"
    )
    pages = pdf_pages_chars(_doc(stream, font))
    assert len(pages) == 1
    texts = "".join(c["text"] for c in pages[0]["chars"])
    assert "ok" in texts  # the sane glyphs survive
    import math

    assert all(
        math.isfinite(c["x0"]) and math.isfinite(c["top"])
        for c in pages[0]["chars"]
    )


def test_oversized_bfchar_code_width_never_raises():
    body = (
        b"begincmap\n1 beginbfchar\n<"
        + b"FF" * 9
        + b"> <0041>\nendbfchar\nendcmap"
    )
    pages = pdf_pages_chars(_doc(SHOW_HEX, _tounicode_font(body)))
    assert isinstance(pages, list) and len(pages) == 1


def test_deep_kids_chain_iterates_not_recurses():
    """A linear /Kids chain deeper than the recursion limit (a few MB
    of crafted objects) must walk iteratively; cycles must terminate."""
    n = 60_000
    objs = [b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj"]
    for i in range(2, n):
        objs.append(
            str(i).encode() + b" 0 obj << /Type /Pages /Kids ["
            + str(i + 1).encode() + b" 0 R] /Count 1 >> endobj"
        )
    objs.append(
        str(n).encode() + b" 0 obj << /Type /Page /Parent "
        + str(n - 1).encode() + b" 0 R " + MEDIA + b" >> endobj"
    )
    pdf = _pdf(objs)
    pages = pdf_pages_chars(pdf)
    assert len(pages) == 1

    # self-referential cycle: terminates with no pages, no hang
    cyc = _pdf(
        [
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
            b"3 0 obj << /Type /Pages /Kids [2 0 R] /Count 1 >> endobj",
        ]
    )
    assert pdf_pages_chars(cyc) == []


def test_exponential_form_fanout_capped_by_draw_budget():
    """The XObject depth cap (8) leaves BREADTH unbounded: seven levels
    of forms each drawing the next TWENTY times is 20^7 = 1.28e9 leaf
    executions from ~10 KB of PDF — a time bomb, not a parse error.
    The per-page draw budget (10k) must bound it."""
    import time

    levels = 7
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R " + MEDIA
        + b" /Resources << /Font << /F1 20 0 R >>"
        b" /XObject << /L0 5 0 R >> >> /Contents 4 0 R >> endobj",
        b"20 0 obj << /Type /Font /BaseFont /Helvetica >> endobj",
    ]
    page = b"/L0 Do " * 20
    objs.append(
        b"4 0 obj << /Length " + str(len(page)).encode()
        + b" >> stream\n" + page + b"\nendstream endobj"
    )
    for lv in range(levels):
        num = 5 + lv
        if lv < levels - 1:
            body = b"/L%d Do " % (lv + 1) * 20
            res = b"/Resources << /XObject << /L%d %d 0 R >> >>" % (
                lv + 1, num + 1,
            )
        else:
            body = b"BT /F1 9 Tf 10 10 Td (x) Tj ET"
            res = b"/Resources << /Font << /F1 20 0 R >> >>"
        objs.append(
            b"%d 0 obj << /Subtype /Form /Matrix [1 0 0 1 0 0] " % num
            + res + b" /Length " + str(len(body)).encode()
            + b" >> stream\n" + body + b"\nendstream endobj"
        )
    pdf = _pdf(objs)
    assert len(pdf) < 20_000
    t0 = time.time()
    pages = pdf_pages_chars(pdf)
    wall = time.time() - t0
    assert wall < 20.0, f"draw budget failed to bound the fan-out: {wall:.1f}s"
    assert len(pages) == 1
    # the budget still let thousands of leaf draws through
    assert len(pages[0]["chars"]) > 0


def test_shared_form_dag_build_is_budgeted_not_exponential():
    """_page_xobjects' cycle set is per-PATH, so a 24-level ladder in
    which every form's resource dict names BOTH forms of the next level
    would be rebuilt once per path — 2^24 builds from ~50 tiny objects,
    hanging the BUILD step before the interpreter's per-page draw
    budget is ever consulted.  The build depth cap (mirroring the
    interpreter's 8-level draw cap) plus the per-page build budget must
    bound it."""
    import time

    levels = 24
    body = b"BT /F1 6 Tf 1 1 Td (x) Tj ET"
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R " + MEDIA
        + b" /Resources << /XObject << /A 10 0 R /B 11 0 R >> >>"
        b" /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length 22 >> stream\n/A Do /B Do /A Do /B Do\nendstream endobj",
    ]
    for lv in range(levels):
        a, b = 10 + 2 * lv, 11 + 2 * lv
        if lv < levels - 1:
            res = b" /Resources << /XObject << /A %d 0 R /B %d 0 R >> >>" % (
                10 + 2 * (lv + 1),
                11 + 2 * (lv + 1),
            )
        else:
            res = b""
        for num in (a, b):
            objs.append(
                b"%d 0 obj << /Subtype /Form /BBox [0 0 10 10]" % num
                + res
                + b" /Length %d >> stream\n" % len(body)
                + body
                + b"\nendstream endobj"
            )
    doc = _pdf(objs)
    t0 = time.perf_counter()
    pages = pdf_pages_chars(doc)
    assert time.perf_counter() - t0 < 10.0
    assert pages and pages[0]["chars"]  # the reachable forms still drew
