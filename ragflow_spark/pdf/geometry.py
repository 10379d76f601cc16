"""Layout-box geometry: reading order, spatial joins, merges, tags.

A *box* is a dict with at least ``x0 x1 top bottom text page_number``
and optionally ``layout_type layoutno score R C``.  Coordinates grow
rightward/downward (page pixel space).

Semantics mirror the reference's deepdoc geometry stack — behaviors
re-derived from:
* sorts: deepdoc/vision/recognizer.py:54-111 (threshold-tolerant
  lexicographic — the XY-cut reading-order reconstruction)
* overlap joins: deepdoc/vision/recognizer.py:113-281
* merges: deepdoc/parser/pdf_parser.py:374-479 (_text_merge,
  _naive_vertical_merge), :481-483 (_concat_downward is a Y-sort in
  this snapshot — kept as-is for parity), :593-666 (_filter_forpages,
  _merge_with_same_bullet)
* projection filter: deepdoc/parser/pdf_parser.py:881-992
* position tags: deepdoc/parser/pdf_parser.py:905-920

This is per-document logic: it runs inside one Arrow batch of a
``mapInPandas`` stage, one document at a time, and never shuffles.
"""

from __future__ import annotations

import re
from functools import cmp_to_key

Box = dict

# --------------------------------------------------------------------------
# reading-order sorts
# --------------------------------------------------------------------------


def sort_y_first(boxes: list[Box], threshold: float) -> list[Box]:
    """Top-to-bottom, ties within ``threshold`` broken left-to-right."""

    def cmp(a: Box, b: Box) -> float:
        d = a["top"] - b["top"]
        if abs(d) < threshold:
            d = a["x0"] - b["x0"]
        return d

    return sorted(boxes, key=cmp_to_key(cmp))


def sort_x_first(boxes: list[Box], threshold: float) -> list[Box]:
    """Left-to-right, ties within ``threshold`` broken top-to-bottom."""

    def cmp(a: Box, b: Box) -> float:
        d = a["x0"] - b["x0"]
        if abs(d) < threshold:
            d = a["top"] - b["top"]
        return d

    return sorted(boxes, key=cmp_to_key(cmp))


def _stable_bubble(boxes: list[Box], key: str, tie: str) -> list[Box]:
    """Restore detector row/col ordering (`R`/`C` tags) on top of a
    spatial sort: bubble any tagged box left past untagged neighbours
    until tags are non-decreasing (the reference's sort_C/R_firstly)."""
    arr = list(boxes)
    for i in range(len(arr) - 1):
        for j in range(i, -1, -1):
            if key not in arr[j] or key not in arr[j + 1]:
                continue
            if arr[j + 1][key] < arr[j][key] or (
                arr[j + 1][key] == arr[j][key] and arr[j + 1][tie] < arr[j][tie]
            ):
                arr[j], arr[j + 1] = arr[j + 1], arr[j]
    return arr


def sort_rows_first(boxes: list[Box], threshold: float = 0) -> list[Box]:
    return _stable_bubble(sort_y_first(boxes, threshold), "R", "x0")


def sort_cols_first(boxes: list[Box], threshold: float = 0) -> list[Box]:
    return _stable_bubble(sort_x_first(boxes, threshold), "C", "top")


# --------------------------------------------------------------------------
# spatial joins
# --------------------------------------------------------------------------


def overlap_area(a: Box, b: Box, ratio: bool = True) -> float:
    """Intersection area of a and b; if ``ratio``, normalized by a's
    own area (asymmetric — "how much of a does b cover")."""
    if b["x0"] > a["x1"] or b["x1"] < a["x0"]:
        return 0.0
    if b["bottom"] < a["top"] or b["top"] > a["bottom"]:
        return 0.0
    w = min(a["x1"], b["x1"]) - max(a["x0"], b["x0"])
    h = min(a["bottom"], b["bottom"]) - max(a["top"], b["top"])
    area_a = (a["x1"] - a["x0"]) * (a["bottom"] - a["top"])
    ov = w * h if area_a != 0 else 0.0
    if ov > 0 and ratio:
        ov /= area_a
    return ov


def find_max_overlap(box: Box, boxes_sorted_by_y: list[Box]) -> int | None:
    """Index of the y-sorted box with max overlap vs ``box`` (binary
    search narrows the y-range, then a linear scan maximizes)."""
    bxs = boxes_sorted_by_y
    if not bxs:
        return None
    s, e = 0, len(bxs)
    while s < e:
        mid = (s + e) // 2
        if box["bottom"] < bxs[mid]["top"]:
            e = mid
        elif box["top"] > bxs[mid]["bottom"]:
            s = mid + 1
        else:
            break
    best_i, best = None, 0.0
    for i in range(len(bxs)):
        ov = overlap_area(bxs[i], box)
        if ov > best:
            best_i, best = i, ov
    return best_i


def find_overlap_with_threshold(box: Box, boxes: list[Box], thr: float = 0.3) -> int | None:
    """Max mutual-overlap partner, ignoring overlaps below ``thr``."""
    best_i, best = None, (thr, 0.0)
    for i, b in enumerate(boxes):
        ov = (overlap_area(box, b), overlap_area(b, box))
        if ov < best:
            continue
        best_i, best = i, ov
    return best_i


def find_tightest_horizontal_fit(box: Box, boxes: list[Box]) -> int | None:
    """Partner in the same layout whose left/right/center x-distance is
    minimal (used to slot a stray box into its column)."""
    best_i, best = None, float("inf")
    for i, b in enumerate(boxes):
        if box.get("layoutno", "0") != b.get("layoutno", "0"):
            continue
        d = min(
            abs(box["x0"] - b["x0"]),
            abs(box["x1"] - b["x1"]),
            abs(box["x0"] + box["x1"] - b["x0"] - b["x1"]) / 2,
        )
        if d < best:
            best_i, best = i, d
    return best_i


def cleanup_layouts(
    boxes: list[Box], layouts: list[Box], far: int = 2, thr: float = 0.7
) -> list[Box]:
    """Drop the worse of two near-duplicate layout regions: by detector
    score when both have one, else by total covered text-box area."""

    def disjoint(a: Box, b: Box) -> bool:
        return (
            a["x1"] < b["x0"]
            or a["x0"] > b["x1"]
            or a["bottom"] < b["top"]
            or a["top"] > b["bottom"]
        )

    lts = list(layouts)
    i = 0
    while i + 1 < len(lts):
        j = i + 1
        while j < min(i + far, len(lts)) and (
            lts[i].get("type", "") != lts[j].get("type", "") or disjoint(lts[i], lts[j])
        ):
            j += 1
        if j >= min(i + far, len(lts)):
            i += 1
            continue
        if overlap_area(lts[i], lts[j]) < thr and overlap_area(lts[j], lts[i]) < thr:
            i += 1
            continue
        if lts[i].get("score") and lts[j].get("score"):
            lts.pop(j if lts[i]["score"] > lts[j]["score"] else i)
            continue
        cover_i = sum(
            overlap_area(b, lts[i], False) for b in boxes if not disjoint(b, lts[i])
        )
        cover_j = sum(
            overlap_area(b, lts[j], False) for b in boxes if not disjoint(b, lts[j])
        )
        lts.pop(j if cover_i > cover_j else i)
    return lts


# --------------------------------------------------------------------------
# merges
# --------------------------------------------------------------------------


def _y_dis(a: Box, b: Box) -> float:
    return (b["top"] + b["bottom"] - a["top"] - a["bottom"]) / 2


def merge_horizontal(boxes: list[Box], mean_height: list[float]) -> list[Box]:
    """Merge horizontally adjacent boxes of the same layout unit when
    their vertical centers are within mean_height/3 (tables, figures
    and equations are left intact)."""
    bxs = list(boxes)
    i = 0
    while i < len(bxs) - 1:
        a, b = bxs[i], bxs[i + 1]
        if a.get("layoutno", "0") != b.get("layoutno", "1") or a.get(
            "layout_type", ""
        ) in ("table", "figure", "equation"):
            i += 1
            continue
        mh = mean_height[a["page_number"] - 1]
        if abs(_y_dis(a, b)) < mh / 3:
            a["x1"] = b["x1"]
            a["top"] = (a["top"] + b["top"]) / 2
            a["bottom"] = (a["bottom"] + b["bottom"]) / 2
            a["text"] += b["text"]
            bxs.pop(i + 1)
            continue
        i += 1
    return bxs


_CONCAT_TAIL = ",;:'\"，、‘“；：-"
_CONCAT_TAIL2 = ",;:'\"，‘“、；："
_CONCAT_HEAD = "。；？！?”）),，、："
_STOP_TAIL = "。？！?"
_PAGE_SCRAP = re.compile(r"[0-9  •一—-]+$")


def merge_vertical(
    boxes: list[Box],
    mean_height: list[float],
    mean_width: list[float],
    is_english: bool = False,
) -> list[Box]:
    """Vertical merge driven by punctuation / layout / page features;
    drops page-number scraps at page boundaries."""
    import statistics

    med_h = statistics.median(mean_height) if mean_height else 10.0
    bxs = sort_y_first(boxes, med_h / 3)
    i = 0
    while i + 1 < len(bxs):
        a, b = bxs[i], bxs[i + 1]
        if a["page_number"] < b["page_number"] and _PAGE_SCRAP.match(a["text"]):
            bxs.pop(i)
            continue
        if not a["text"].strip():
            bxs.pop(i)
            continue
        at, bt = a["text"].strip(), b["text"].strip()
        concat = [
            at[-1] in _CONCAT_TAIL,
            len(at) > 1 and at[-2] in _CONCAT_TAIL2,
            bool(bt) and bt[0] in _CONCAT_HEAD,
        ]
        keep_apart = [
            a.get("layoutno", 0) != b.get("layoutno", 0),
            at[-1] in _STOP_TAIL,
            is_english and at[-1] in ".!?",
            a["page_number"] == b["page_number"]
            and b["top"] - a["bottom"] > mean_height[a["page_number"] - 1] * 1.5,
            a["page_number"] < b["page_number"]
            and abs(a["x0"] - b["x0"]) > mean_width[a["page_number"] - 1] * 4,
        ]
        detach = [a["x1"] < b["x0"], a["x0"] > b["x1"]]
        if (any(keep_apart) and not any(concat)) or any(detach):
            i += 1
            continue
        a["bottom"] = b["bottom"]
        a["text"] += b["text"]
        a["x0"] = min(a["x0"], b["x0"])
        a["x1"] = max(a["x1"], b["x1"])
        bxs.pop(i + 1)
    return bxs


def concat_downward(boxes: list[Box]) -> list[Box]:
    """Reading-order finalization.  Parity note: the reference's
    _concat_downward is an early-returned Y-sort in this snapshot
    (pdf_parser.py:482-483, xgboost model dead below it) — replicated
    as-is, not "fixed"."""
    return sort_y_first(boxes, 0)


_BULLET_ALPHA = set("qwertyuopasdfghjklzxcvbnm")


def merge_same_bullet(boxes: list[Box], is_cjk=None) -> list[Box]:
    """Join consecutive boxes that open with the identical bullet char
    (non-letter, non-CJK)."""
    if is_cjk is None:
        is_cjk = lambda ch: "一" <= ch <= "鿿"  # noqa: E731
    bxs = list(boxes)
    i = 0
    while i + 1 < len(bxs):
        a, b = bxs[i], bxs[i + 1]
        if not a["text"].strip():
            bxs.pop(i)
            continue
        if not b["text"].strip():
            bxs.pop(i + 1)
            continue
        ca, cb = a["text"].strip()[0], b["text"].strip()[0]
        if (
            ca != cb
            or ca.lower() in _BULLET_ALPHA
            or is_cjk(ca)
            or a["top"] > b["bottom"]
        ):
            i += 1
            continue
        b["text"] = a["text"] + "\n" + b["text"]
        b["x0"] = min(a["x0"], b["x0"])
        b["x1"] = max(a["x1"], b["x1"])
        b["top"] = a["top"]
        bxs.pop(i)
    return bxs


# --------------------------------------------------------------------------
# TOC / dirty-page removal
# --------------------------------------------------------------------------

# "table of contents" kept verbatim from the reference even though the
# match runs after _SPACES strips spaces (dead alternative there too —
# preserved so a "Table of Contents" page behaves identically).
_TOC_RE = re.compile(r"(contents|目录|目次|table of contents|致谢|acknowledge)$")
_SPACES = re.compile(r"[  　]+")
# exact dirty-page marker from _filter_forpages (pdf_parser.py): the
# reference alternation is literally (··|··|··) — the same two middle
# dots, three times).  ASCII "...." leaders are NOT dirty there; parity.
_DOT_LEADER = re.compile("(\u00b7\u00b7)")


def drop_toc_boxes(boxes: list[Box], n_pages: int) -> list[Box]:
    """Remove table-of-contents runs: after a TOC heading, drop entries
    until a body line repeats the prefix of the first entry; if no TOC
    heading, drop pages dominated by dot-leader lines."""
    bxs = list(boxes)
    found = False
    i = 0
    while i < len(bxs):
        squeezed = _SPACES.sub("", bxs[i]["text"].lower())
        if not _TOC_RE.match(squeezed):
            i += 1
            continue
        found = True
        eng = re.match(r"[0-9a-zA-Z :'.-]{5,}", bxs[i]["text"].strip())
        bxs.pop(i)
        if i >= len(bxs):
            break
        def first_prefix() -> str:
            t = bxs[i]["text"].strip()
            return " ".join(t.split()[:2]) if eng else t[:3]

        prefix = first_prefix()
        while not prefix:
            bxs.pop(i)
            if i >= len(bxs):
                break
            prefix = first_prefix()
        if i >= len(bxs) or not prefix:
            break
        bxs.pop(i)
        for j in range(i, min(i + 128, len(bxs))):
            # reference matches the prefix as a RAW regex (pdf_parser.py
            # _filter_forpages); only guard the crash an invalid
            # pattern would cause, semantics otherwise identical
            try:
                hit = re.match(prefix, bxs[j]["text"])
            except re.error:
                hit = re.match(re.escape(prefix), bxs[j]["text"])
            if not hit:
                continue
            del bxs[i:j]
            break
    if found:
        return bxs

    dirty = [0] * max(n_pages, 1)
    for b in bxs:
        if _DOT_LEADER.search(b["text"]):
            dirty[b["page_number"] - 1] += 1
    dirty_pages = {p + 1 for p, n in enumerate(dirty) if n > 3}
    if not dirty_pages:
        return bxs
    return [b for b in bxs if b["page_number"] not in dirty_pages]


# --------------------------------------------------------------------------
# projection levels + scrap filter
# --------------------------------------------------------------------------

_PROJ_PATTERNS: list[tuple[re.Pattern, int]] = [
    (re.compile(r"第[零一二三四五六七八九十百]+章"), 1),
    (re.compile(r"第[零一二三四五六七八九十百]+[条节]"), 2),
    (re.compile(r"[零一二三四五六七八九十百]+[、 　]"), 3),
    (re.compile(r"[\(（][零一二三四五六七八九十百]+[）\)]"), 4),
    (re.compile(r"[0-9]+(、|\.[　 ]|\.[^0-9])"), 5),
    (re.compile(r"[0-9]+\.[0-9]+(、|[. 　]|[^0-9])"), 6),
    (re.compile(r"[0-9]+\.[0-9]+\.[0-9]+(、|[ 　]|[^0-9])"), 7),
    (re.compile(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+(、|[ 　]|[^0-9])"), 8),
    (re.compile(r".{,48}[：:?？]$"), 9),
    (re.compile(r"[0-9]+）"), 10),
    (re.compile(r"[\(（][0-9]+[）\)]"), 11),
    (re.compile(r"[零一二三四五六七八九十百]+是"), 12),
    (re.compile(r"[⚫•➢✓]"), 12),
]
_NUMERIC_LINE = re.compile(r"[0-9 ().,%%+/-]+$")


def proj_level(line: str) -> int | None:
    """Outline level of a line by its numbering pattern; None if plain
    text, False-y for pure-numeric junk."""
    if len(line) <= 2:
        return None
    if _NUMERIC_LINE.match(line):
        return None
    for pat, level in _PROJ_PATTERNS:
        if pat.match(line):
            return level
    return None


def filter_scraps(
    boxes: list[Box],
    page_width: list[float],
    mean_height: list[float],
) -> str:
    """Keep only useful boxes (layout-typed, wide, or tall), grow each
    seed downward by projection/x-proximity DFS, and drop narrow scrap
    groups; groups join with newlines, documents with blank lines."""

    def width(b: Box) -> float:
        return b["x1"] - b["x0"]

    def x_dis(a: Box, b: Box) -> float:
        return min(
            abs(a["x1"] - b["x0"]),
            abs(a["x0"] - b["x1"]),
            abs(a["x0"] + a["x1"] - b["x0"] - b["x1"]) / 2,
        )

    def useful(b: Box) -> bool:
        if b.get("layout_type"):
            return True
        if width(b) > page_width[b["page_number"] - 1] / 3:
            return True
        return b["bottom"] - b["top"] > mean_height[b["page_number"] - 1]

    bxs = list(boxes)
    out: list[str] = []
    while bxs:
        lines: list[Box] = []
        widths: list[float] = []
        pw = page_width[bxs[0]["page_number"] - 1]
        mh = mean_height[bxs[0]["page_number"] - 1]
        seed_level = proj_level(bxs[0]["text"]) or bxs[0].get("layout_type", "") == "title"

        # recursion-then-pop ordering and the min/center x-distance both
        # affect which boxes land in the 20-box lookahead window — kept
        # exactly as the reference (pdf_parser.py:936-957), parity-tested
        def grow(line: Box, start: int) -> None:
            lines.append(line)
            widths.append(width(line))
            level = proj_level(line["text"]) or line.get("layout_type", "") == "title"
            for k in range(start + 1, min(start + 20, len(bxs))):
                if bxs[k]["page_number"] - line["page_number"] > 0:
                    break
                if (
                    not level
                    and _y_dis(line, bxs[k]) >= 3 * mh
                    and line["bottom"] - line["top"] < 1.5 * mh
                ):
                    break
                if not useful(bxs[k]):
                    continue
                if level or x_dis(bxs[k], line) < pw / 10:
                    grow(bxs[k], k)
                    bxs.pop(k)
                    break

        try:
            if useful(bxs[0]):
                grow(bxs[0], 0)
        except Exception:  # noqa: BLE001 - recursion guard (reference parity)
            pass
        bxs.pop(0)
        mw = sum(widths) / len(widths) if widths else float("nan")
        # no `lines and` guard: an empty group with a heading-level seed
        # still emits (as "") in the reference — quirk preserved
        if seed_level or mw / pw >= 0.35 or mw > 200:
            out.append("\n".join(ln["text"] + ln.get("_tag", "") for ln in lines))
    return "\n\n".join(out)


# --------------------------------------------------------------------------
# position tags
# --------------------------------------------------------------------------

_TAG_RE = re.compile(r"@@([0-9-]+)\t([0-9.\-]+)\t([0-9.\-]+)\t([0-9.\-]+)\t([0-9.\-]+)##")


def line_tag(box: Box, page_cum_height: list[float], page_heights: list[float]) -> str:
    """In-band position tag ``@@pn\tx0\tx1\ttop\tbottom##`` (page-local
    coordinates; a box spilling past the page bottom lists every page
    it crosses)."""
    pn = [box["page_number"]]
    top = box["top"] - page_cum_height[pn[0] - 1]
    bottom = box["bottom"] - page_cum_height[pn[0] - 1]
    if pn[-1] - 1 >= len(page_heights):
        return ""
    while bottom > page_heights[pn[-1] - 1]:
        bottom -= page_heights[pn[-1] - 1]
        pn.append(pn[-1] + 1)
        if pn[-1] - 1 >= len(page_heights):
            return ""
    return "@@{}\t{:.1f}\t{:.1f}\t{:.1f}\t{:.1f}##".format(
        "-".join(str(p) for p in pn), box["x0"], box["x1"], top, bottom
    )


def remove_tags(text: str) -> str:
    return _TAG_RE.sub("", text)


def parse_line_tags(text: str) -> list[tuple[list[int], float, float, float, float]]:
    """Extract (pages, x0, x1, top, bottom) spans from tagged text."""
    out = []
    for m in _TAG_RE.finditer(text):
        pages = [int(p) for p in m.group(1).split("-")]
        out.append(
            (pages, float(m.group(2)), float(m.group(3)), float(m.group(4)), float(m.group(5)))
        )
    return out
