"""Hostile-input equivalence for the template_chunks twin (r5).

The driver gate compares the Spark side against the DuckDB oracle on
the sf corpus, whose text is clean space-separated words.  This test
runs the SAME oracle SQL against a tiny hostile documents table (NULL
text, empty text, punctuation-only words, unicode whitespace, CJK,
40-char words, digit runs) and compares it to the Python side: the
shared section synthesis (ragflow_spark/data/twinspec.py — the one
definition the Spark closure executes) feeding the real chunkers.
Guards every cross-engine assumption the twin leans on — ASCII-
whitespace split, the [^A-Za-z0-9] sanitizer, NULL coalescing, the
token lexer, the strict-> fold threshold, and the outline shape.

No Spark session needed.
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd

import __spark_entry__ as E
from ragflow_spark.data.twinspec import (
    twin_chunk_rows,
    twin_sections,
    twin_words,
)

HOSTILE_TEXTS = [
    None,  # NULL text -> coalesce('') -> ['x'] fallback (review find)
    "",  # empty -> ['x'] fallback
    "x",
    "   ",  # whitespace only -> ['x'] fallback
    "!!! ??? ...",  # words sanitize to '' but stay in the list
    "a\xa0b c",  # \xa0 is NOT a separator on either side
    "数据 处理 engine 哈希x",  # CJK strips to '' / 'engine' / 'x'
    "supercalifragilisticexpialidocious " * 4,  # 34-char alpha runs
    "12345678901234567890 1 22 333",  # digit-run tokenization
    "a\tb\nc\rd\fe\vf",  # every ASCII whitespace separator
    "word " * 60,  # long uniform stream
    "Section 9 decoy Article 4 PART ONE",  # bullet-looking WORDS are
    # fine: they enter sections mid-string, never at section start
]


def python_rows(docs: list[tuple[int, str | None]]) -> pd.DataFrame:
    rows = []
    for did, text in docs:
        rows.extend(twin_chunk_rows(did, text))
    return pd.DataFrame(
        rows, columns=["doc_id", "template", "chunk_ord", "content"]
    )


def _compare(docs: list[tuple[int, str | None]]) -> pd.DataFrame:
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(docs, columns=["doc_id", "text"])
    )
    want = con.sql(E.oracle_sql()["template_chunks"]).df()
    got = python_rows(docs)
    key = ["doc_id", "template", "chunk_ord", "content"]
    g = got[key].sort_values(key, ignore_index=True).astype(str)
    w = want[key].sort_values(key, ignore_index=True).astype(str)
    assert len(g) == len(w), (len(g), len(w))
    mismatch = (g != w).any(axis=1)
    assert not mismatch.any(), pd.concat(
        [g[mismatch].head(5), w[mismatch].head(5)], axis=1
    ).to_string()
    return got


def test_template_twin_hostile_inputs():
    got = _compare(list(enumerate(HOSTILE_TEXTS)))
    # every template must actually be exercised, and the fold's
    # >budget chunk-boundary branch must fire for BOTH folded
    # templates (naive budget 16, book budget 256) somewhere
    per = got.groupby("template")["chunk_ord"].max()
    assert set(per.index) == {"naive", "book", "laws", "paper", "one"}
    assert per["naive"] >= 1 and per["book"] >= 1
    assert per["laws"] >= 1 and per["paper"] >= 1


from hypothesis import given, settings
from hypothesis import strategies as st

_text_st = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
        max_size=400,
    ),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_text_st, min_size=1, max_size=6), st.integers(0, 10_000))
def test_template_twin_fuzz(texts, base_id):
    """Random unicode (and NULL) documents: the DuckDB oracle must
    replay the real chunkers byte-for-byte — the property the driver
    gate samples at one corpus, checked here across arbitrary inputs
    (doc ids offset so every (n_secs, words-per-sec, outline-shape)
    residue gets hit over the example budget)."""
    _compare([(base_id + i, t) for i, t in enumerate(texts)])


def test_twin_structural_assumptions():
    """The closed-form oracle shapes rely on: sanitized sections never
    hit a bullet pattern (book -> no-outline), headings hit exactly
    group 3, and sections carry no delimiter characters (naive's
    oversize-split branch degenerates to a whole-section push)."""
    from ragflow_spark.chunk.hierarchy import bullet_group_of

    for did, text in enumerate(HOSTILE_TEXTS):
        plain, book, outline = twin_sections(did, twin_words(text))
        for s in plain + book + outline:
            assert not re.search(r"[^A-Za-z0-9 ]", s), repr(s)
        assert bullet_group_of(book) == -1
        assert bullet_group_of(outline) == 3
