"""Delimiter-string compilation.

Behavior matched to ``get_delimiters`` (rag/nlp/__init__.py:705-721):
a delimiter config is a string of single-char separators, optionally
with backtick-quoted multi-char separators; compiled to a regex
alternation sorted longest-first so multi-char separators win.
"""

from __future__ import annotations

import re
from functools import lru_cache

_QUOTED = re.compile(r"`([^`]+)`", re.I)


@lru_cache(maxsize=256)
def delimiter_pattern(delimiters: str) -> str:
    parts: list[str] = []
    cursor = 0
    for m in _QUOTED.finditer(delimiters):
        start, end = m.span()
        parts.append(m.group(1))
        parts.extend(delimiters[cursor:start])
        cursor = end
    parts.extend(delimiters[cursor:])
    parts.sort(key=len, reverse=True)
    escaped = [re.escape(p) for p in parts if p]
    return "|".join(escaped)
