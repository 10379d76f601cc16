"""Table structure recovery from tagged layout boxes.

Distilled from deepdoc/vision/table_structure_recognizer.py:135-587
(construct_table / blockType / html & description emitters): the ONNX
TSR detector only *tags* cell boxes with row (``R``) / column (``C``)
memberships; everything afterwards is pure geometry + text typing and
is implemented here model-free.  Synthetic tagged boxes exercise it in
tests, which is exactly how it runs in production behind the optional
detector plugin.

A cell box: ``{x0 x1 top bottom text page_number [R] [C] [R_top R_bott
C_left C_right]}``.
"""

from __future__ import annotations

import re
from collections import Counter

from .geometry import Box, sort_cols_first, sort_rows_first, sort_x_first

_CAPTION_RE = re.compile(r"[图表]+[ 0-9:：]{2,}")

_BLOCK_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"^(20|19)[0-9]{2}[年/-][0-9]{1,2}[月/-][0-9]{1,2}日*$"), "Dt"),
    (re.compile(r"^(20|19)[0-9]{2}年$"), "Dt"),
    (re.compile(r"^(20|19)[0-9]{2}[年-][0-9]{1,2}月*$"), "Dt"),
    (re.compile(r"^[0-9]{1,2}[月-][0-9]{1,2}日*$"), "Dt"),
    (re.compile(r"^第*[一二三四1-4]季度$"), "Dt"),
    (re.compile(r"^(20|19)[0-9]{2}年*[一二三四1-4]季度$"), "Dt"),
    (re.compile(r"^(20|19)[0-9]{2}[ABCDE]$"), "Dt"),
    (re.compile(r"^[0-9.,+%/ -]+$"), "Nu"),
    (re.compile(r"^[0-9A-Z/\._~-]+$"), "Ca"),
    (re.compile(r"^[A-Z]*[a-z' -]+$"), "En"),
    (re.compile(r"^[0-9.,+-]+[0-9A-Za-z/$￥%<>（）()' -]+$"), "NE"),
    (re.compile(r"^.{1}$"), "Sg"),
]


def block_type(text: str) -> str:
    """Cell content class: date / number / code / english / mixed /
    single char / short text / long text / other."""
    t = text.strip()
    for pat, label in _BLOCK_PATTERNS:
        if pat.search(t):
            return label
    n_tokens = len([w for w in t.split() if len(w) > 1])
    if n_tokens > 3:
        return "Tx" if n_tokens < 12 else "Lx"
    return "Ot"


def is_caption(box: Box) -> bool:
    return bool(_CAPTION_RE.match(box["text"].strip())) or (
        box.get("layout_type", "").find("caption") >= 0
    )


def _cluster_rows(boxes: list[Box]) -> list[list[Box]]:
    """Row clustering: detector `R` tag wins; otherwise a new row
    starts when a box's top clears the running bottom (3px slack)."""
    rowh = [b["R_bott"] - b["R_top"] for b in boxes if "R" in b and "R_bott" in b]
    thr = (min(rowh) / 2) if rowh else 0
    boxes = sort_rows_first(boxes, thr)
    rows = [[boxes[0]]]
    btm = boxes[0]["bottom"]
    boxes[0]["rn"] = 0
    for b in boxes[1:]:
        last = rows[-1][-1]
        new_row = last.get("R", "") != b.get("R", "") or (
            b["top"] >= btm - 3 and last.get("R", "-1") != b.get("R", "-2")
        )
        if new_row:
            btm = b["bottom"]
            b["rn"] = len(rows)
            rows.append([b])
        else:
            btm = (btm + b["bottom"]) / 2
            b["rn"] = len(rows) - 1
            rows[-1].append(b)
    return rows


def _cluster_cols(boxes: list[Box]) -> list[list[Box]]:
    colw = [b["C_right"] - b["C_left"] for b in boxes if "C" in b and "C_right" in b]
    thr = (min(colw) / 2) if colw else 0
    crosspage = len({b["page_number"] for b in boxes}) > 1
    boxes = sort_x_first(boxes, thr) if crosspage else sort_cols_first(boxes, thr)
    cols = [[boxes[0]]]
    right = boxes[0]["x1"]
    boxes[0]["cn"] = 0
    for b in boxes[1:]:
        last = cols[-1][-1]
        tag_step = (
            "C" in b
            and "C" in last
            and int(b["C"]) - int(last["C"]) == 1
            and b["page_number"] == last["page_number"]
        )
        new_col = tag_step or (
            b["x0"] >= right and last.get("C", "-1") != b.get("C", "-2")
        )
        if new_col:
            right = b["x1"]
            b["cn"] = len(cols)
            cols.append([b])
        else:
            right = (right + b["x1"]) / 2
            b["cn"] = len(cols) - 1
            cols[-1].append(b)
    return cols


def _header_rows(grid: list[list[str]], btypes: list[list[str]]) -> int:
    """Leading rows whose cell-type mix differs from the table body
    (body majority is usually Nu/NE): distilled header detection."""
    if len(grid) < 2:
        return 0
    body = Counter(t for row in btypes[1:] for t in row if t)
    if not body:
        return 0
    body_major = body.most_common(1)[0][0]
    n = 0
    for r in range(min(2, len(grid) - 1)):
        row_types = [t for t in btypes[r] if t]
        if not row_types:
            break
        row_major = Counter(row_types).most_common(1)[0][0]
        if row_major != body_major and row_major not in ("Nu", "NE"):
            n = r + 1
        else:
            break
    return n


def construct_table(
    boxes: list[Box], is_english: bool = False, html: bool = False
) -> tuple[str, list[str]]:
    """(caption, rows) — rows as HTML ``<table>`` markup (html=True) or
    "header: value; ..." description lines (html=False)."""
    boxes = [dict(b) for b in boxes]
    cap = ""
    rest: list[Box] = []
    for b in boxes:
        if is_caption(b):
            cap += (" " if cap and is_english else "") + b["text"]
        else:
            rest.append(b)
    if not rest:
        return cap, []

    rows = _cluster_rows(rest)
    _cluster_cols(rest)
    n_rows = max(b["rn"] for b in rest) + 1
    n_cols = max(b["cn"] for b in rest) + 1

    grid: list[list[str]] = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    btypes: list[list[str]] = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    for b in rest:
        cell = grid[b["rn"]][b["cn"]]
        grid[b["rn"]][b["cn"]] = (cell + " " + b["text"]).strip() if cell else b["text"]
        btypes[b["rn"]][b["cn"]] = block_type(grid[b["rn"]][b["cn"]])

    n_hdr = _header_rows(grid, btypes)

    if html:
        out = ["<table>"]
        for r, row in enumerate(grid):
            tag = "th" if r < n_hdr else "td"
            out.append(
                "<tr>" + "".join(f"<{tag}>{c}</{tag}>" for c in row) + "</tr>"
            )
        out.append("</table>")
        return cap, ["".join(out)]

    sep = "; " if is_english else "； "
    headers = (
        [" ".join(filter(None, (grid[r][c] for r in range(n_hdr)))) for c in range(n_cols)]
        if n_hdr
        else [f"col{c}" for c in range(n_cols)]
    )
    lines = []
    for r in range(n_hdr, n_rows):
        parts = [
            f"{headers[c]}: {grid[r][c]}" for c in range(n_cols) if grid[r][c]
        ]
        if parts:
            lines.append(sep.join(parts))
    return cap, lines
