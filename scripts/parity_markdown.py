#!/usr/bin/env python
"""Byte-parity check: text/md_render.py vs the Python-Markdown package.

The reference renders QA answers and extracted tables through
``markdown.markdown(txt, extensions=['markdown.extensions.tables'])``
(rag/app/qa.py:438,450, rag/app/naive.py:365).  The engine's renderer
is clean-room; run THIS in any environment where the real package is
installed (``pip install markdown``) to byte-compare the two over the
corpus below:

    python scripts/parity_markdown.py [-v]

In-sandbox (package absent) it reports that and exits 0 — the
readability-harness pattern (scripts/parity_readability.py).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

CASES = [
    "plain answer text",
    "two\nlines soft-wrapped",
    "para one\n\npara two",
    "# H1\nbody",
    "###### H6 deep",
    "Title\n===\nbody",
    "Sub\n---\nbody",
    "**bold** mid *em* and `code & <x>`",
    "***both stars***",
    "[text](http://example.com/a) and ![alt](img.png)",
    "- item a\n- item b\n\nafter",
    "1. first\n2. second",
    "> quoted line\n> second line",
    "> quote\n\nplain",
    "| A | B |\n|---|---|\n| 1 | 2 |",
    "| L | C | R |\n|:--|:-:|--:|\n| a | b | c |",
    "before\n\n| A | B |\n|---|---|\n| 1 | 2 |\n\nafter",
    "    indented code\n    second line",
    "a & b < c > d &amp; kept &#65; too",
    "---",
    "answer with | pipe but no table",
    "\nleading blank line answer",
    "mixed\n- list after para",
]


def main() -> int:
    try:
        from markdown import markdown
    except ImportError:
        print("markdown package not installed — parity run is a deploy-time "
              "step; nothing to compare here (exit 0)")
        return 0
    from ragflow_spark.text.md_render import render_markdown

    verbose = "-v" in sys.argv
    bad = 0
    for case in CASES:
        want = markdown(case, extensions=["markdown.extensions.tables"])
        got = render_markdown(case, tables=True)
        if want != got:
            bad += 1
            print(f"MISMATCH {case!r}")
            if verbose:
                print(f"  theirs: {want!r}")
                print(f"  ours:   {got!r}")
    print(f"{len(CASES) - bad}/{len(CASES)} byte-identical")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
