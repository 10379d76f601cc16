"""Unicode / whitespace normalization helpers.

Behavior matched from:
* full-width -> half-width (``strQ2B``, rag/nlp/rag_tokenizer.py:101-113)
* English / Chinese ratio heuristics (rag/nlp/__init__.py:228-257)
* ``rmSpace`` (rag/utils/__init__.py:37-39)
"""

from __future__ import annotations

import re

_EN_CHAR = re.compile(r"[`a-zA-Z0-9\s.,':;/\"?<>!\(\)\-]")


_Q2B_TABLE = {0x3000: 0x20, **{c: c - 0xFEE0 for c in range(0xFF01, 0xFF5F)}}


def full_to_half(s: str) -> str:
    """Full-width ASCII forms and ideographic space -> half-width
    (str.translate: one C call instead of a per-char Python loop)."""
    return s.translate(_Q2B_TABLE)


def squeeze_space(s: str) -> str:
    """Collapse runs of whitespace to one space, trim ends."""
    return re.sub(r"\s+", " ", s).strip()


def ascii_ratio(s: str) -> float:
    if not s:
        return 0.0
    hits = sum(1 for ch in s if _EN_CHAR.fullmatch(ch))
    return hits / len(s)


def cjk_ratio(s: str) -> float:
    if not s:
        return 0.0
    hits = sum(1 for ch in s if "一" <= ch <= "鿿")
    return hits / len(s)


def looks_english(s: str) -> bool:
    """Char-class ratio > 0.8, mirroring ``is_english``
    (rag/nlp/__init__.py:228-244)."""
    return ascii_ratio(s) > 0.8


def looks_chinese(s: str) -> bool:
    """CJK ratio > 0.2, mirroring ``is_chinese``
    (rag/nlp/__init__.py:247-256)."""
    return cjk_ratio(s) > 0.2
