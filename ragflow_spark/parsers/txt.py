"""Plain-text chunk splitting.

Behavior matched to ``RAGFlowTxtParser.parser_txt``
(deepdoc/parser/txt_parser.py:28-64): unicode-unescape the delimiter
config, split keeping separators attached to the *previous* chunk, pack
until the current chunk's token count exceeds the budget (note: the
reference checks the count *before* adding — quirk preserved), and
return ``[text, ""]`` pairs.
"""

from __future__ import annotations

import re

from ..chunk.delimiters import delimiter_pattern
from ..text.tokens import count_tokens

DEFAULT_TXT_DELIMITERS = "\n!?;。；！？"


def _unescape(delims: str) -> str:
    # the reference round-trips through unicode_escape to honor "\n"
    # written literally in user config (txt_parser.py:34)
    try:
        return (
            delims.encode("utf-8")
            .decode("unicode_escape")
            .encode("latin1")
            .decode("utf-8")
        )
    except Exception:
        return delims


def split_txt(
    txt: str,
    budget: int = 128,
    delimiters: str = DEFAULT_TXT_DELIMITERS,
) -> list[list[str]]:
    delimiters = _unescape(delimiters)
    chunks = [""]
    counts = [0]

    def push(piece: str) -> None:
        n = count_tokens(piece)
        if counts[-1] > budget:
            chunks.append(piece)
            counts.append(n)
        else:
            chunks[-1] += piece
            counts[-1] += n

    pattern = delimiter_pattern(delimiters)
    if not pattern:
        push(txt)
    else:
        only = re.compile(f"^{pattern}$")
        for piece in re.split(f"({pattern})", txt):
            if only.match(piece):
                continue
            push(piece)
    return [[c, ""] for c in chunks]
