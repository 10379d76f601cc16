"""Parity vs the reference's own Recognizer geometry statics.

``Recognizer``'s spatial sorts and overlap joins
(deepdoc/vision/recognizer.py:54-281) are dependency-free at class-def
time (numpy + cmp_to_key); the class is extracted from source AST and
its static methods are run side-by-side with ragflow_spark.pdf.geometry
on randomized box sets.  Byte-exact agreement here pins the XY-cut
reading order and the overlap-join semantics the whole PDF stack
builds on.
"""

from __future__ import annotations

import ast
import logging
import math
import random
import re
from collections import Counter
from functools import cmp_to_key

import numpy as np
import pytest

from ragflow_spark.pdf.geometry import (
    cleanup_layouts,
    find_max_overlap,
    find_overlap_with_threshold,
    find_tightest_horizontal_fit,
    overlap_area,
    sort_cols_first,
    sort_rows_first,
    sort_x_first,
    sort_y_first,
)


@pytest.fixture(scope="module")
def ref_cls():
    src = open("/root/reference/deepdoc/vision/recognizer.py").read()
    tree = ast.parse(src)
    cls = next(
        n for n in tree.body if isinstance(n, ast.ClassDef) and n.name == "Recognizer"
    )
    ns = {
        "np": np,
        "cmp_to_key": cmp_to_key,
        "Counter": Counter,
        "re": re,
        "math": math,
        "logging": logging,
        "os": __import__("os"),
    }
    exec(compile(ast.Module(body=[cls], type_ignores=[]), "recognizer", "exec"), ns)
    return ns["Recognizer"]


def _rand_boxes(rng: random.Random, n: int, tagged: bool = False) -> list[dict]:
    out = []
    for i in range(n):
        x0 = rng.uniform(0, 500)
        top = rng.uniform(0, 700)
        b = {
            "x0": x0,
            "x1": x0 + rng.uniform(5, 200),
            "top": top,
            "bottom": top + rng.uniform(5, 40),
            "text": f"box{i}",
            "page_number": 1,
            "layoutno": f"t{rng.randrange(3)}",
        }
        if tagged and rng.random() < 0.7:
            b["R"] = rng.randrange(4)
        if tagged and rng.random() < 0.7:
            b["C"] = rng.randrange(4)
        out.append(b)
    return out


def _keys(boxes):
    return [b["text"] for b in boxes]


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("thr", [0.0, 3.0, 12.0])
def test_sort_parity(ref_cls, seed, thr):
    rng = random.Random(seed)
    boxes = _rand_boxes(rng, 25)
    assert _keys(sort_y_first(boxes, thr)) == _keys(ref_cls.sort_Y_firstly(boxes, thr))
    assert _keys(sort_x_first(boxes, thr)) == _keys(ref_cls.sort_X_firstly(boxes, thr))


@pytest.mark.parametrize("seed", range(6))
def test_rc_sort_parity(ref_cls, seed):
    rng = random.Random(100 + seed)
    boxes = _rand_boxes(rng, 20, tagged=True)
    assert _keys(sort_rows_first(boxes, 2.0)) == _keys(
        ref_cls.sort_R_firstly([dict(b) for b in boxes], 2.0)
    )
    assert _keys(sort_cols_first(boxes, 2.0)) == _keys(
        ref_cls.sort_C_firstly([dict(b) for b in boxes], 2.0)
    )


@pytest.mark.parametrize("seed", range(8))
def test_overlap_area_parity(ref_cls, seed):
    rng = random.Random(200 + seed)
    for _ in range(50):
        a, b = _rand_boxes(rng, 2)
        assert overlap_area(a, b) == pytest.approx(
            ref_cls.overlapped_area(a, b), abs=0
        )
        assert overlap_area(a, b, ratio=False) == pytest.approx(
            ref_cls.overlapped_area(a, b, ratio=False), abs=0
        )


@pytest.mark.parametrize("seed", range(8))
def test_find_overlapped_parity(ref_cls, seed):
    rng = random.Random(300 + seed)
    grid = ref_cls.sort_Y_firstly(_rand_boxes(rng, 30), 0)
    probe = _rand_boxes(rng, 1)[0]
    ours = find_max_overlap(probe, grid)
    # reference's binary search narrows then scans the SAME maximization
    theirs = ref_cls.find_overlapped(probe, grid)
    assert ours == theirs


@pytest.mark.parametrize("seed", range(8))
def test_find_overlapped_with_threshold_parity(ref_cls, seed):
    rng = random.Random(400 + seed)
    boxes = _rand_boxes(rng, 25)
    probe = _rand_boxes(rng, 1)[0]
    assert find_overlap_with_threshold(probe, boxes) == ref_cls.find_overlapped_with_threshold(
        probe, boxes
    )


@pytest.mark.parametrize("seed", range(8))
def test_tightest_fit_parity(ref_cls, seed):
    rng = random.Random(500 + seed)
    boxes = _rand_boxes(rng, 25)
    probe = _rand_boxes(rng, 1)[0]
    assert find_tightest_horizontal_fit(probe, boxes) == ref_cls.find_horizontally_tightest_fit(
        probe, boxes
    )


@pytest.mark.parametrize("seed", range(6))
def test_layouts_cleanup_parity(ref_cls, seed):
    rng = random.Random(600 + seed)
    boxes = _rand_boxes(rng, 30)
    layouts = []
    for i, b in enumerate(_rand_boxes(rng, 12)):
        b["type"] = rng.choice(["table", "text", "figure"])
        if rng.random() < 0.7:
            b["score"] = round(rng.uniform(0.1, 1.0), 3)
        layouts.append(b)
    ours = cleanup_layouts([dict(b) for b in boxes], [dict(x) for x in layouts])
    theirs = ref_cls.layouts_cleanup([dict(b) for b in boxes], [dict(x) for x in layouts])
    assert [x["text"] for x in ours] == [x["text"] for x in theirs]


# -- RAGFlowPdfParser merge methods (fake-self extraction) -----------------


@pytest.fixture(scope="module")
def ref_pdf(ref_cls):
    src = open("/root/reference/deepdoc/parser/pdf_parser.py").read()
    tree = ast.parse(src)
    cls = next(
        n
        for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name == "RAGFlowPdfParser"
    )
    ns = {
        "np": np,
        "re": re,
        "logging": logging,
        "math": math,
        "os": __import__("os"),
        "Recognizer": ref_cls,
        "cmp_to_key": cmp_to_key,
        "timeout_decorator": None,
        "rag_tokenizer": None,
    }
    try:
        exec(
            compile(ast.Module(body=[cls], type_ignores=[]), "pdf_parser", "exec"), ns
        )
    except Exception as exc:  # pragma: no cover - env-dependent class body
        pytest.skip(f"RAGFlowPdfParser class not extractable: {exc}")
    return ns["RAGFlowPdfParser"]


class _FakePdf:
    def __init__(self, boxes, mean_height, mean_width=None, is_english=True):
        self.boxes = [dict(b) for b in boxes]
        self.mean_height = mean_height
        self.mean_width = mean_width or [50.0] * len(mean_height)
        self.is_english = is_english

    # the reference computes these on self; reproduce its formulas
    # (deepdoc/parser/pdf_parser.py:196-203)
    def _y_dis(self, a, b):
        return (b["top"] + b["bottom"] - a["top"] - a["bottom"]) / 2

    def _x_dis(self, a, b):
        return min(
            abs(a["x1"] - b["x0"]), abs(a["x0"] - b["x1"]),
            abs(a["x0"] + a["x1"] - b["x0"] - b["x1"]) / 2,
        )


def _line_boxes(rng, n):
    out = []
    y = 0.0
    for i in range(n):
        y += rng.uniform(8, 20)
        x0 = rng.uniform(0, 60)
        tail = rng.choice([",", ".", "", ";", "!", " and", "word"])
        out.append(
            {
                "x0": x0,
                "x1": x0 + rng.uniform(40, 400),
                "top": y,
                "bottom": y + rng.uniform(8, 14),
                "text": f"line {i} text{tail}",
                "page_number": 1,
                "layoutno": f"t{rng.randrange(2)}",
            }
        )
    return out


@pytest.mark.parametrize("seed", range(6))
def test_text_merge_parity(ref_pdf, seed):
    from ragflow_spark.pdf.geometry import merge_horizontal

    rng = random.Random(700 + seed)
    boxes = _line_boxes(rng, 20)
    fake = _FakePdf(boxes, mean_height=[12.0])
    ref_pdf._text_merge(fake)
    theirs = [b["text"] for b in fake.boxes]
    ours = [b["text"] for b in merge_horizontal([dict(b) for b in boxes], [12.0])]
    assert ours == theirs


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("eng", [True, False])
def test_naive_vertical_merge_parity(ref_pdf, seed, eng):
    from ragflow_spark.pdf.geometry import merge_vertical

    rng = random.Random(800 + seed)
    boxes = _line_boxes(rng, 18)
    fake = _FakePdf(boxes, mean_height=[12.0], is_english=eng)
    ref_pdf._naive_vertical_merge(fake)
    theirs = [b["text"] for b in fake.boxes]
    ours = [
        b["text"]
        for b in merge_vertical([dict(b) for b in boxes], [12.0], [50.0], is_english=eng)
    ]
    assert ours == theirs


@pytest.mark.parametrize("seed", range(4))
def test_merge_with_same_bullet_parity(ref_pdf, seed):
    from ragflow_spark.pdf.geometry import merge_same_bullet

    rng = random.Random(900 + seed)
    boxes = _line_boxes(rng, 12)
    for b in boxes:
        if rng.random() < 0.5:
            b["text"] = "• " + b["text"]
    # the reference consults rag_tokenizer.is_chinese on the first char;
    # provide the same contract our geometry uses
    import types as _types

    fake_tok = _types.SimpleNamespace(is_chinese=lambda ch: "一" <= ch <= "鿿")
    ref_pdf._merge_with_same_bullet.__globals__["rag_tokenizer"] = fake_tok
    fake = _FakePdf(boxes, mean_height=[12.0])
    ref_pdf._merge_with_same_bullet(fake)
    theirs = [b["text"] for b in fake.boxes]
    ours = [b["text"] for b in merge_same_bullet([dict(b) for b in boxes])]
    assert ours == theirs


# -- _line_tag / _filter_forpages ------------------------------------------


class _Img:
    def __init__(self, w, h):
        self.size = (w, h)


@pytest.mark.parametrize("seed", range(5))
def test_line_tag_parity(ref_pdf, seed):
    from ragflow_spark.pdf.geometry import line_tag

    rng = random.Random(1000 + seed)
    ZM = 3
    heights = [800.0, 800.0, 600.0]
    cum = [0.0, 800.0, 1600.0]
    fake = _FakePdf([], mean_height=[12.0])
    fake.page_cum_height = cum
    fake.page_images = [_Img(612 * ZM, int(h * ZM)) for h in heights]
    for _ in range(30):
        pn = rng.randrange(1, 4)
        top = cum[pn - 1] + rng.uniform(0, heights[pn - 1] + 100)
        box = {
            "x0": round(rng.uniform(0, 500), 2),
            "x1": round(rng.uniform(0, 500), 2),
            "top": top,
            "bottom": top + rng.uniform(5, 300),
            "page_number": pn,
        }
        theirs = ref_pdf._line_tag(fake, dict(box), ZM)
        ours = line_tag(dict(box), cum, heights)
        assert ours == theirs


@pytest.mark.parametrize("seed", range(5))
def test_filter_forpages_parity(ref_pdf, seed):
    from ragflow_spark.pdf.geometry import drop_toc_boxes

    rng = random.Random(1100 + seed)
    texts = [
        "Contents",
        "Chapter One ........ 3",
        "Chapter Two ........ 9",
        "Appendix ........ 21",
        "Chapter One",
        "Real body text begins here",
        "More body text",
    ]
    rng.shuffle(texts[1:4])  # shuffle the toc entries only
    boxes = []
    y = 0.0
    for t in texts:
        y += 14
        boxes.append(
            {"x0": 10, "x1": 400, "top": y, "bottom": y + 10, "text": t, "page_number": 1}
        )
    fake = _FakePdf(boxes, mean_height=[12.0])
    fake.page_images = [_Img(612, 800)]
    ref_pdf._filter_forpages(fake)
    theirs = [b["text"] for b in fake.boxes]
    ours = [b["text"] for b in drop_toc_boxes([dict(b) for b in boxes], n_pages=1)]
    assert ours == theirs


# -- TableStructureRecognizer.blockType / is_caption -----------------------


@pytest.fixture(scope="module")
def ref_tsr(ref_cls):
    import types as _types

    from ragflow_spark.text.tokenizer import tokenize_text

    src = open("/root/reference/deepdoc/vision/table_structure_recognizer.py").read()
    tree = ast.parse(src)
    cls = next(
        n
        for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name == "TableStructureRecognizer"
    )
    fake_tok = _types.SimpleNamespace(
        tokenize=tokenize_text, tag=lambda t: "", fine_grained_tokenize=lambda t: t
    )
    ns = {
        "np": np,
        "re": re,
        "logging": logging,
        "Counter": Counter,
        "os": __import__("os"),
        "Recognizer": ref_cls,
        "rag_tokenizer": fake_tok,
        "get_project_base_directory": lambda: "/tmp",
        "snapshot_download": None,
    }
    exec(compile(ast.Module(body=[cls], type_ignores=[]), "tsr", "exec"), ns)
    return ns["TableStructureRecognizer"]


_CELLS = [
    "1,234.5", "2023年4月5日", "2023年", "ABC/123", "hello world", "x", "@",
    "Total revenue for the fiscal year was strong overall, really",
    "第一季度", "99%", "-12.5", "A1_B2", "Short words here now",
    "数据", "2021-03", "word " * 20,
]


def test_block_type_parity(ref_tsr):
    from ragflow_spark.pdf.tsr import block_type

    mismatches = {
        t: (block_type(t), ref_tsr.blockType({"text": t}))
        for t in _CELLS
        if block_type(t) != ref_tsr.blockType({"text": t})
    }
    assert not mismatches, mismatches


def test_is_caption_parity(ref_tsr):
    from ragflow_spark.pdf.tsr import is_caption

    for t, lt in [
        ("表 1: 结果", ""), ("图 2: overview", ""), ("not a caption", ""),
        ("anything", "figure caption"), ("anything", "text"),
    ]:
        box = {"text": t, "layout_type": lt}
        assert is_caption(box) == ref_tsr.is_caption(box), (t, lt)


# -- construct_table full parity -------------------------------------------


def _table_boxes(rng, n_rows, n_cols, header=True, caption=False, numeric=True,
                 spans=False):
    out = []
    for r in range(n_rows):
        for c in range(n_cols):
            if r == 0 and header:
                text = rng.choice(["name", "count", "total price", "区域", "金额"]) + str(c)
            elif numeric and c > 0:
                text = f"{rng.randrange(1, 9999)}.{rng.randrange(10)}"
            else:
                text = rng.choice(["apple", "pear", "west region", "华东", "x"])
            b = {
                "x0": c * 100.0,
                "x1": c * 100.0 + 90.0,
                "top": r * 20.0,
                "bottom": r * 20.0 + 15.0,
                "text": text,
                "page_number": 1,
                "R": r,
                "C": c,
                "R_top": r * 20.0,
                "R_bott": r * 20.0 + 15.0,
                "C_left": c * 100.0,
                "C_right": c * 100.0 + 90.0,
            }
            if r == 0 and header:
                b["H"] = True
            out.append(b)
    if spans and out:
        # make the first body cell a column-spanning cell
        b = out[n_cols if header else 0]
        b["SP"] = 1
        b["H_left"] = 0.0
        b["H_right"] = n_cols * 100.0
        b["H_top"] = b["top"]
        b["H_bott"] = b["bottom"]
    if caption:
        out.append(
            {
                "x0": 0.0, "x1": 200.0, "top": -25.0, "bottom": -10.0,
                "text": "表 12: summary", "page_number": 1,
            }
        )
    return out


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("html", [False, True])
@pytest.mark.parametrize("eng", [False, True])
def test_construct_table_parity(ref_tsr, seed, html, eng):
    from ragflow_spark.pdf.tsr import construct_table

    rng = random.Random(1200 + seed)
    boxes = _table_boxes(
        rng,
        n_rows=rng.randrange(2, 6),
        n_cols=rng.randrange(2, 5),
        header=rng.random() < 0.8,
        caption=rng.random() < 0.5,
        numeric=rng.random() < 0.7,
        spans=rng.random() < 0.4,
    )
    theirs = ref_tsr.construct_table([dict(b) for b in boxes], is_english=eng, html=html)
    ours = construct_table([dict(b) for b in boxes], is_english=eng, html=html)
    assert ours == theirs


def test_construct_table_parity_untagged(ref_tsr):
    from ragflow_spark.pdf.tsr import construct_table

    rng = random.Random(1300)
    boxes = _table_boxes(rng, 3, 2, header=False)
    for b in boxes:
        for k in ("R", "C", "R_top", "R_bott", "C_left", "C_right", "H"):
            b.pop(k, None)
    # NB: the reference defaults html=True; ours defaults html=False —
    # pass explicitly on both sides
    theirs = ref_tsr.construct_table(
        [dict(b) for b in boxes], is_english=True, html=False
    )
    ours = construct_table([dict(b) for b in boxes], is_english=True, html=False)
    assert ours == theirs


# -- __filterout_scraps -----------------------------------------------------


class _ScrapsFake(_FakePdf):
    def __init__(self, mean_height, ref_pdf):
        super().__init__([], mean_height)
        self.page_images = [_Img(612 * 3, 800 * 3)]
        self.page_cum_height = [0.0, 800.0]
        self._ref = ref_pdf

    def proj_match(self, line):
        return self._ref.proj_match(self, line)

    def _line_tag(self, bx, ZM):
        return self._ref._line_tag(self, bx, ZM)


@pytest.mark.parametrize("seed", range(8))
def test_filterout_scraps_parity(ref_pdf, seed):
    from ragflow_spark.pdf.geometry import filter_scraps, line_tag

    rng = random.Random(1400 + seed)
    boxes = []
    y = 0.0
    for i in range(20):
        y += rng.uniform(10, 25)
        wide = rng.random() < 0.7
        x0 = rng.uniform(0, 50) if wide else rng.uniform(400, 550)
        w = rng.uniform(250, 500) if wide else rng.uniform(10, 40)
        t = rng.choice(
            [f"1. heading {i}", f"body line {i} with words", f"{i}", "第一章 标题"]
        )
        b = {
            "x0": x0, "x1": x0 + w, "top": y, "bottom": y + 12,
            "text": t, "page_number": 1,
        }
        if rng.random() < 0.5:
            b["layout_type"] = "text" if rng.random() < 0.8 else "title"
        boxes.append(b)
    fake = _ScrapsFake([12.0], ref_pdf)
    theirs = ref_pdf._RAGFlowPdfParser__filterout_scraps(fake, [dict(b) for b in boxes], 3)
    tagged = [dict(b, _tag=line_tag(b, [0.0, 800.0], [800.0, 800.0])) for b in boxes]
    ours = filter_scraps(tagged, page_width=[612.0], mean_height=[12.0])
    assert ours == theirs
