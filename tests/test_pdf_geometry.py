"""Synthetic-box tests for the model-free PDF geometry + TSR stack."""

from __future__ import annotations

from ragflow_spark.pdf import (
    block_type,
    cleanup_layouts,
    concat_downward,
    construct_table,
    drop_toc_boxes,
    filter_scraps,
    find_max_overlap,
    find_overlap_with_threshold,
    find_tightest_horizontal_fit,
    line_tag,
    merge_horizontal,
    merge_same_bullet,
    merge_vertical,
    overlap_area,
    parse_line_tags,
    proj_level,
    remove_tags,
    sort_x_first,
    sort_y_first,
)


def box(x0, top, x1, bottom, text="", page=1, **kw):
    return {"x0": x0, "top": top, "x1": x1, "bottom": bottom, "text": text,
            "page_number": page, **kw}


# -- sorts -----------------------------------------------------------------


def test_sort_y_first_threshold_ties_break_left_to_right():
    a = box(50, 10.2, 60, 20, "right")
    b = box(10, 10.0, 20, 20, "left")
    c = box(10, 40, 20, 50, "below")
    assert [x["text"] for x in sort_y_first([a, c, b], 3)] == ["left", "right", "below"]
    # below threshold: strict top order wins
    assert [x["text"] for x in sort_y_first([a, b], 0.1)] == ["left", "right"]


def test_sort_x_first():
    a, b = box(30, 0, 40, 10, "b"), box(10, 5, 20, 15, "a")
    assert [x["text"] for x in sort_x_first([a, b], 1)] == ["a", "b"]


# -- overlap joins ---------------------------------------------------------


def test_overlap_area_ratio_and_absolute():
    a = box(0, 0, 10, 10)
    b = box(5, 5, 15, 15)
    assert overlap_area(a, b, ratio=False) == 25
    assert overlap_area(a, b) == 0.25
    assert overlap_area(a, box(20, 20, 30, 30)) == 0


def test_find_max_overlap_picks_best():
    grid = [box(0, i * 10, 10, i * 10 + 10, f"r{i}") for i in range(10)]
    probe = box(0, 33, 10, 39)
    assert grid[find_max_overlap(probe, grid)]["text"] == "r3"


def test_find_overlap_with_threshold():
    cells = [box(0, 0, 10, 10, "a"), box(20, 0, 30, 10, "b")]
    assert find_overlap_with_threshold(box(21, 1, 29, 9), cells) == 1
    assert find_overlap_with_threshold(box(100, 100, 110, 110), cells) is None


def test_find_tightest_horizontal_fit_respects_layout():
    cells = [box(0, 0, 10, 10, layoutno="t0"), box(12, 0, 22, 10, layoutno="t0"),
             box(0, 0, 10, 10, layoutno="other")]
    probe = box(11, 50, 23, 60, layoutno="t0")
    assert find_tightest_horizontal_fit(probe, cells) == 1


def test_cleanup_layouts_prefers_score():
    l1 = box(0, 0, 100, 100, type="table", score=0.9)
    l2 = box(1, 1, 99, 99, type="table", score=0.5)
    out = cleanup_layouts([], [l1, l2])
    assert out == [l1]


# -- merges ----------------------------------------------------------------


def test_merge_horizontal_same_layout():
    a = box(0, 10, 50, 20, "hello ", layoutno="t0")
    b = box(50, 11, 90, 21, "world", layoutno="t0")
    out = merge_horizontal([a, b], [6.0])
    assert len(out) == 1 and out[0]["text"] == "hello world"
    # different layout untouched
    c = box(50, 11, 90, 21, "world", layoutno="t1")
    assert len(merge_horizontal([dict(a), c], [6.0])) == 2


def test_merge_vertical_concats_on_comma_and_stops_on_period():
    a = box(0, 0, 90, 10, "first line,", layoutno="t0")
    b = box(0, 12, 90, 22, "continues here.", layoutno="t0")
    c = box(0, 24, 90, 34, "New paragraph", layoutno="t0")
    out = merge_vertical([a, b, c], [10.0], [5.0], is_english=True)
    assert [o["text"] for o in out] == ["first line,continues here.", "New paragraph"]


def test_concat_downward_is_y_sort_parity():
    # parity: dead xgboost path (pdf_parser.py:482-483) is NOT resurrected
    a, b = box(0, 50, 10, 60, "second"), box(0, 0, 10, 10, "first")
    assert [x["text"] for x in concat_downward([a, b])] == ["first", "second"]


def test_merge_same_bullet():
    a = box(0, 0, 50, 10, "• alpha")
    b = box(0, 12, 50, 22, "• beta")
    out = merge_same_bullet([a, b])
    assert len(out) == 1 and out[0]["text"] == "• alpha\n• beta"
    # latin letter openers never merge
    c, d = box(0, 0, 50, 10, "alpha"), box(0, 12, 50, 22, "avocado")
    assert len(merge_same_bullet([c, d])) == 2


# -- TOC / scraps ----------------------------------------------------------


def test_drop_toc_boxes_removes_entries_until_body_repeat():
    bxs = [
        box(0, 0, 90, 10, "Contents"),
        box(0, 12, 90, 22, "Chapter One .... 3"),
        box(0, 24, 90, 34, "Chapter Two .... 9"),
        box(0, 36, 90, 46, "Chapter One"),
        box(0, 48, 90, 58, "Body text here"),
    ]
    out = drop_toc_boxes(bxs, n_pages=1)
    assert [b["text"] for b in out] == ["Chapter One", "Body text here"]


def test_drop_toc_boxes_dirty_pages():
    dirty = [box(0, i * 10, 90, i * 10 + 8, f"entry {i} ······ {i}", page=1) for i in range(5)]
    clean = [box(0, 0, 90, 8, "real body", page=2)]
    out = drop_toc_boxes(dirty + clean, n_pages=2)
    assert [b["text"] for b in out] == ["real body"]


def test_proj_level_patterns():
    assert proj_level("第一章 总则") == 1
    assert proj_level("1. Introduction") == 5
    assert proj_level("1.2 Methods x") == 6
    assert proj_level("plain text line") is None
    assert proj_level("123 45.6%") is None


def test_filter_scraps_keeps_wide_drops_narrow():
    wide = [box(0, i * 20, 400, i * 20 + 12, f"wide line {i}") for i in range(3)]
    scrap = [box(500, 500, 520, 508, "pg")]
    text = filter_scraps(wide + scrap, page_width=[600.0], mean_height=[10.0])
    assert "wide line 0" in text and "pg" not in text


# -- position tags ---------------------------------------------------------


def test_line_tag_roundtrip():
    b = box(10, 30, 100, 50, page=1)
    tag = line_tag(b, page_cum_height=[0.0, 800.0], page_heights=[800.0, 800.0])
    assert tag.startswith("@@1\t10.0\t100.0\t30.0\t50.0##")
    spans = parse_line_tags("some text" + tag)
    assert spans == [([1], 10.0, 100.0, 30.0, 50.0)]
    assert remove_tags("abc" + tag + "def") == "abcdef"


def test_line_tag_cross_page():
    b = box(10, 790, 100, 820, page=1)
    tag = line_tag(b, page_cum_height=[0.0, 800.0], page_heights=[800.0, 800.0])
    pages = parse_line_tags("x" + tag)[0][0]
    assert pages == [1, 2]


# -- table structure recovery ----------------------------------------------


def test_block_type():
    assert block_type("1,234.5") == "Nu"
    assert block_type("2023年4月5日") == "Dt"
    assert block_type("ABC/123") == "Ca"
    assert block_type("hello world") == "En"
    # NB: a single latin letter is 'En' (the En pattern wins before Sg,
    # matching the reference's pattern order); Sg catches symbols
    assert block_type("x") == "En"
    assert block_type("@") == "Sg"


def _tagged_table(header_flag=True):
    # 3x3 with header row; R/C tags (+H on the header) as the detector emits
    texts = [
        ["name", "count", "price"],
        ["apple", "10", "1.5"],
        ["pear", "20", "2.5"],
    ]
    boxes = []
    for r, row in enumerate(texts):
        for c, t in enumerate(row):
            boxes.append(
                box(
                    c * 100, r * 20, c * 100 + 90, r * 20 + 15, t,
                    R=r, C=c, R_top=r * 20, R_bott=r * 20 + 15,
                    C_left=c * 100, C_right=c * 100 + 90,
                    **({"H": True} if header_flag and r == 0 else {}),
                )
            )
    return boxes


def test_construct_table_desc_rows():
    rows = construct_table(_tagged_table(), is_english=True)
    # reference format: "header：value; ..." one row per body row (the
    # \n-folding path only applies to <=2-column tables)
    assert rows == [
        "name：apple; count：10; price：1.5",
        "name：pear; count：20; price：2.5",
    ]


def test_construct_table_html():
    html = construct_table(_tagged_table(), is_english=True, html=True)
    assert html.startswith("<table>")
    assert "<th  >name</th>" in html and "<td  >apple</td>" in html


def test_construct_table_caption_pull():
    bxs = _tagged_table() + [box(0, -20, 290, -5, "表 1: demo")]
    rows = construct_table(bxs, is_english=True)
    assert len(rows) == 2
    assert all(r.endswith("\t—— in “表 1: demo”") for r in rows)


def test_construct_table_untagged_geometry_only():
    # no R/C tags: clustering falls back to pure geometry; no H flags and
    # non-Nu majority -> no header row detected, cols<=2 join with "："
    texts = [["h1", "h2"], ["a", "1.0"], ["b", "2.0"]]
    boxes = []
    for r, row in enumerate(texts):
        for c, t in enumerate(row):
            boxes.append(box(c * 100, r * 20, c * 100 + 90, r * 20 + 15, t))
    rows = construct_table(boxes, is_english=True)
    assert rows and all("：" in r for r in rows)
