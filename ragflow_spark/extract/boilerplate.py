"""Readability-style main-content selection (clean-room).

The reference delegates boilerplate stripping to readability-lxml 0.8.1
(deepdoc/parser/html_parser.py:44-46).  That library is unavailable here,
so this module reimplements the published Arc90 readability heuristic
family from scratch on our own DOM:

* paragraph scoring: 1 point + one per comma + one per 100 chars (cap 3)
  credited to the parent, half to the grandparent;
* class/id weighting: +25 for content-ish names, -25 for boilerplate-ish;
* link density discounts a candidate's score;
* always-drop tags (script/style/noscript/iframe) and, when a clear
  candidate exists, structural boilerplate (nav/aside/footer/header/form).

It is intentionally conservative: on pages with no clear winner it falls
back to the <body> so no content is silently lost.
"""

from __future__ import annotations

import re

from .dom import Node, parse_html

_POSITIVE = re.compile(
    r"article|body|content|entry|hentry|main|page|pagination|post|text|blog|story",
    re.I,
)
_NEGATIVE = re.compile(
    r"combx|comment|com-|contact|foot|footer|footnote|masthead|media|meta|"
    r"outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|shopping|tags|"
    r"tool|widget|nav|menu|banner|breadcrumb|ad-|ads|advert",
    re.I,
)

_ALWAYS_DROP = {"script", "style", "noscript", "iframe", "template", "svg"}
_STRUCTURAL_BOILERPLATE = {"nav", "aside", "footer", "header", "form"}
_PARAGRAPHISH = {"p", "td", "pre", "li", "dd", "blockquote"}


def _class_weight(node: Node) -> int:
    name = node.class_id()
    w = 0
    if name:
        if _NEGATIVE.search(name):
            w -= 25
        if _POSITIVE.search(name):
            w += 25
    if node.tag in ("article", "main", "section"):
        w += 25
    if node.tag in _STRUCTURAL_BOILERPLATE:
        w -= 25
    return w


def _squeeze(s: str) -> str:
    # equivalent to re.sub(r"\s+", " ", s).strip(), but in C
    return " ".join(s.split())


def _squeezed_len(s: str) -> int:
    # len(_squeeze(s)) without materializing the joined string: word
    # lengths + single separators.  Used where only the LENGTH feeds a
    # threshold (body/widen/sanitize checks) — the joined string there
    # was a pure allocation.
    parts = s.split()
    return sum(map(len, parts)) + len(parts) - 1 if parts else 0


class _TextIndex:
    """One post-order pass caching, per node, two integers: raw subtree
    text length and the character count under <a> descendants.

    Lazy ``node.text()`` re-walks the subtree on every call, which turns
    link-density checks (every div/ul/table in sanitize) into an
    O(chars x nodes) pass on deep pages.  Ints only — caching the text
    strings themselves is a net loss at high core counts, where the
    extra allocations compete for the memory bandwidth that bounds the
    whole job (see BASELINE.md).  Detach only unlinks a node (subtrees
    are never mutated), so values captured up front are identical to
    what the lazy walk would return at every use site below.
    """

    __slots__ = ("text_len", "link_len")

    def __init__(self, root: Node, order: list[Node] | None = None):
        self.text_len: dict[int, int] = {}
        self.link_len: dict[int, int] = {}
        # parents-before-children order (any sibling order works: the
        # reversed() walk below only needs children aggregated first);
        # callers that already walked the tree pass their list in
        if order is None:
            order = []
            stack = [root]
            while stack:
                n = stack.pop()
                order.append(n)
                for c in n.children:
                    if isinstance(c, Node):
                        stack.append(c)
        tl, ll = self.text_len, self.link_len
        for n in reversed(order):
            total = 0
            link = 0
            for c in n.children:
                if type(c) is str:  # children hold str or Node only
                    total += len(c)
                else:
                    k = id(c)
                    total += tl[k]
                    if c.tag == "a":
                        link += tl[k]
                    else:
                        link += ll[k]
            tl[id(n)] = total
            ll[id(n)] = link

    def link_density(self, node: Node) -> float:
        total = self.text_len[id(node)]
        if total == 0:
            return 0.0
        return min(1.0, self.link_len[id(node)] / total)


def select_main_content(root: Node) -> Node:
    """Pick the best content container; fall back to <body>/root."""
    # ONE document-order walk does what three full-tree passes did
    # (always-drop scan, _TextIndex build walk, paragraph scan):
    # dropped subtrees are skipped (their text must not count), kept
    # nodes land in `order` (pre-order, so reversed() aggregates
    # children first) and paragraphish ones in `paras` in document
    # order — which preserves scores-dict insertion order, the
    # first-wins tiebreak of the best-candidate scan below.
    order: list[Node] = []
    paras: list[Node] = []
    drops: list[Node] = []
    stack = [root]
    while stack:
        n = stack.pop()
        if n.tag in _ALWAYS_DROP:
            drops.append(n)
            continue
        order.append(n)
        if n.tag in _PARAGRAPHISH:
            paras.append(n)
        for c in reversed(n.children):
            if type(c) is not str:  # children hold str or Node only
                stack.append(c)
    for n in drops:
        n.detach()

    ix = _TextIndex(root, order)
    scores: dict[int, tuple[float, Node]] = {}

    def bump(container: Node | None, pts: float) -> None:
        if container is None or container.tag in ("#root", "html"):
            return
        key = id(container)
        if key not in scores:
            scores[key] = (float(_class_weight(container)), container)
        base, node = scores[key]
        scores[key] = (base + pts, node)

    text_len = ix.text_len
    for para in paras:
        if text_len[id(para)] < 25:  # cheap reject before squeeze
            continue
        text = para.text()
        sq_len = _squeezed_len(text)
        if sq_len < 25:
            continue
        # commas survive squeezing unchanged, so counting on the raw
        # text equals counting on the squeezed text — no join needed
        pts = 1.0 + text.count(",") + text.count("，") + min(sq_len // 100, 3)
        bump(para.parent, pts)
        if para.parent is not None:
            bump(para.parent.parent, pts / 2.0)

    best: Node | None = None
    best_score = 0.0
    for raw, node in scores.values():
        score = raw * (1.0 - ix.link_density(node))
        if score > best_score:
            best, best_score = node, score

    if best is None:
        best = root.find("body") or root
    else:
        # widen to a meaningful ancestor if the winner holds <20% of the
        # body text but its parent is still low-link-density (readability's
        # sibling-join, simplified)
        body = root.find("body")
        if body is not None:
            body_len = _squeezed_len(body.text())
            parent = best.parent
            while (
                parent is not None
                and parent.tag not in ("#root", "html", "body")
                and body_len > 0
                and _squeezed_len(best.text()) < 0.2 * body_len
                and ix.link_density(parent) < 0.25
            ):
                best = parent
                parent = best.parent

    _sanitize(best, ix)
    return best


def _sanitize(candidate: Node, ix: _TextIndex) -> None:
    """Drop obvious boilerplate inside the chosen subtree."""
    for n in list(candidate.iter()):
        if n is candidate:
            continue
        if n.tag in _STRUCTURAL_BOILERPLATE:
            n.detach()
            continue
        if n.tag in ("div", "ul", "ol", "table", "section"):
            w = _class_weight(n)
            # raw length < 200 already implies squeezed < 200
            if w < 0 and (
                ix.text_len[id(n)] < 200 or _squeezed_len(n.text()) < 200
            ):
                n.detach()
                continue
            if ix.link_density(n) > 0.6 and w <= 0:
                n.detach()


def page_title(root: Node) -> str:
    t = root.find("title")
    if t is not None:
        title = _squeeze(t.text())
        if title:
            return title
    for h in ("h1", "h2"):
        node = root.find(h)
        if node is not None:
            title = _squeeze(node.text())
            if title:
                return title
    return ""


__all__ = ["parse_html", "select_main_content", "page_title"]
