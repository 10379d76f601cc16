#!/usr/bin/env python
"""Deploy-time byte-parity harness: clean-room HTML extraction vs the
reference's readability-lxml + html-text pipeline.

The reference's ``RAGFlowHtmlParser.parser_txt`` delegates main-content
selection to readability-lxml==0.8.1 and text rendering to
html-text==0.6.2 (deepdoc/parser/html_parser.py:40-49; pins in the
reference's pyproject.toml).  Neither wheel is installable in the build
sandbox, so the clean-room extractor (ragflow_spark/extract/) is
characterization-tested there but never byte-compared.  This harness is
committed ready-to-run: in ANY environment with those wheels installed
it byte-compares the two pipelines over

  * the deterministic synthetic page corpus (ragflow_spark.data.pagegen,
    HTML rows only — PDFs are skipped),
  * the committed real-page golden corpus (tests/goldens/pages/*.html —
    CJK, RTL/bidi, malformed markup, forum/comments, template/SVG
    pages; skip with --no-goldens), and
  * any ``.html`` files passed as positional args (e.g. the reference
    tree's own sample page
    ``sdk/python/test/test_sdk_api/test_data/test.html``).

Usage::

    pip install readability-lxml==0.8.1 html-text==0.6.2
    python scripts/parity_readability.py [--pages 500] [--seed 42] \
        [--show 5] [file.html ...]

Exit codes: 0 = ran, all pages byte-identical; 1 = ran, mismatches
found (counts + first diffs printed); 3 = deps absent (clean report,
nothing compared).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def reference_parser_txt(txt: str) -> list[str]:
    """The reference's RAGFlowHtmlParser.parser_txt body
    (deepdoc/parser/html_parser.py:40-49), inlined so the harness needs
    only the two public wheels, not the reference tree."""
    import html_text
    import readability

    html_doc = readability.Document(txt)
    title = html_doc.title()
    content = html_text.extract_text(html_doc.summary(html_partial=True))
    glued = f"{title}\n{content}"
    return glued.split("\n")


def _norm(lines: list[str]) -> str:
    """Whitespace-insensitive view: collapsed runs, blank lines dropped.
    Separates 'different content' from 'same content, different
    spacing' in the mismatch report."""
    out = [" ".join(ln.split()) for ln in lines]
    return "\n".join(ln for ln in out if ln)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("files", nargs="*", help="extra .html files to compare")
    ap.add_argument("--pages", type=int, default=500, help="synthetic corpus size")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--show", type=int, default=5, help="mismatch diffs to print")
    ap.add_argument(
        "--no-goldens",
        action="store_true",
        help="skip the committed tests/goldens/pages corpus",
    )
    args = ap.parse_args()

    try:
        import html_text  # noqa: F401
        import readability  # noqa: F401
    except ImportError as e:
        print(f"deps absent ({e.name}): install readability-lxml==0.8.1 "
              f"html-text==0.6.2 to run the byte-parity comparison")
        return 3

    from ragflow_spark.data.pagegen import generate_pages
    from ragflow_spark.extract.html import extract_html
    from ragflow_spark.text.codec import decode_bytes

    cases: list[tuple[str, str]] = []  # (label, html text)
    for url, _ts, blob, _text, _lang in generate_pages(args.pages, args.seed):
        if blob[:5] == b"%PDF-":
            continue
        cases.append((url, decode_bytes(bytes(blob))))
    if not args.no_goldens:
        gd = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "goldens", "pages",
        )
        if os.path.isdir(gd):
            for f in sorted(os.listdir(gd)):
                if f.endswith(".html"):
                    p = os.path.join(gd, f)
                    cases.append((p, decode_bytes(open(p, "rb").read())))
    for path in args.files:
        cases.append((path, decode_bytes(open(path, "rb").read())))

    exact = ws_only = diff = 0
    shown = 0
    for label, txt in cases:
        ref = reference_parser_txt(txt)
        ours = extract_html(txt).sections
        if ours == ref:
            exact += 1
            continue
        if _norm(ours) == _norm(ref):
            ws_only += 1
            kind = "whitespace-only"
        else:
            diff += 1
            kind = "CONTENT"
        if shown < args.show:
            shown += 1
            print(f"--- mismatch ({kind}): {label}")
            for i, (a, b) in enumerate(zip(ref, ours)):
                if a != b:
                    print(f"  line {i}: ref={a!r}")
                    print(f"  line {i}: got={b!r}")
                    break
            if len(ref) != len(ours):
                print(f"  line counts: ref={len(ref)} got={len(ours)}")

    total = len(cases)
    print(f"pages={total} byte-identical={exact} "
          f"whitespace-only={ws_only} content-diff={diff}")
    if total:
        print(f"byte-identity rate: {exact / total:.4f}")
    return 0 if exact == total else 1


if __name__ == "__main__":
    sys.exit(main())
