"""End-to-end HTML extraction: bytes -> (title, text, sections).

Mirrors ``RAGFlowHtmlParser`` (deepdoc/parser/html_parser.py:30-49):

1. codec detection + ``decode(errors="ignore")``   (:32-34)
2. main-content selection (readability role)       (:44-46)
3. block-aware text rendering (html_text role)     (:46)
4. glue ``f"{title}\\n{content}"`` then split on "\\n"  (:47-49)

The glue and split are byte-exact ports; steps 2-3 are clean-room
reimplementations (readability-lxml / html-text are unavailable here).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..text.codec import decode_bytes
from .boilerplate import page_title, parse_html, select_main_content
from .render import render_text


@dataclass
class HtmlExtraction:
    title: str
    text: str           # main content, lines joined with "\n"
    sections: list[str]  # f"{title}\n{text}".split("\n")


def extract_html(payload: bytes | str) -> HtmlExtraction:
    if isinstance(payload, (bytes, bytearray, memoryview)):
        txt = decode_bytes(bytes(payload))
    else:
        txt = payload or ""
    root = parse_html(txt)
    title = page_title(root)
    main = select_main_content(root)
    # title may live outside the candidate subtree; drop it from the body
    # render if the candidate still contains <title> (full-page fallback)
    for t in main.find_all("title"):
        t.detach()
    content = render_text(main)
    glued = f"{title}\n{content}"
    return HtmlExtraction(title=title, text=content, sections=glued.split("\n"))
