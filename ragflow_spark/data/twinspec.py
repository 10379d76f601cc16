"""Section synthesis for the ``template_chunks`` twin oracle.

The SINGLE definition of the deterministic word arithmetic that
``__spark_entry__._template_chunks`` (Spark side, inside mapInPandas)
and ``tests/test_template_twin.py`` (hostile/fuzz equivalence) both
execute, mirrored expression-for-expression by the DuckDB oracle SQL
in ``__spark_entry__.oracle_sql()['template_chunks']``.  Keeping it in
one module means an edit here cannot silently desync the shipped
closure from the suites that guard it (r5 review finding).

Spec (per doc, over the sanitized word stream ``ws``):

* plain   — 4 + id%5 sections of 2 + (id+j)%4 words at stride 7
  (naive template, budget 16);
* book    — 10 + id%6 sections of 'para ' + 18 + (id+j)%7 words at
  stride 25 (book template, budget 256, bullet-free by construction);
* outline — 2 + id%3 ``Section k`` headings, each with 1 + (id+g)%3
  'body ' sections (laws / paper / one templates).

Words are split on EXPLICIT ASCII whitespace (not ``str.split``/
``\\s``: Python whitespace is Unicode-wide, RE2's ``\\s`` is ASCII —
an ``\\xa0`` in a document would desync the twin) and sanitized to
``[A-Za-z0-9]`` so no delimiter / bullet / TOC / colon side-branch can
fire unreplayed.
"""

from __future__ import annotations

import re

_WS = re.compile(r"[ \t\n\r\f\v]+")
_SANITIZE = re.compile(r"[^A-Za-z0-9]")


def twin_words(text: str | None) -> list[str]:
    ws = [_SANITIZE.sub("", w) for w in _WS.split(text or "") if w != ""]
    return ws or ["x"]


def twin_sections(
    doc_id: int, ws: list[str]
) -> tuple[list[str], list[str], list[str]]:
    """(plain, book, outline) section lists for one document."""

    def w(i: int) -> str:
        return ws[i % len(ws)]

    plain = [
        " ".join(w(j * 7 + t) for t in range(2 + (doc_id + j) % 4))
        for j in range(4 + doc_id % 5)
    ]
    book = [
        "para " + " ".join(w(j * 25 + t) for t in range(18 + (doc_id + j) % 7))
        for j in range(10 + doc_id % 6)
    ]
    outline: list[str] = []
    for g in range(2 + doc_id % 3):
        outline.append(
            f"Section {g + 1} " + w(100 + 3 * g) + " " + w(101 + 3 * g)
        )
        for b in range(1 + (doc_id + g) % 3):
            outline.append(
                "body "
                + " ".join(
                    w(200 + g * 20 + b * 5 + t)
                    for t in range(3 + (doc_id + b) % 3)
                )
            )
    return plain, book, outline


def twin_chunk_rows(doc_id: int, text: str | None) -> list[tuple]:
    """(doc_id, template, chunk_ord, content) rows: the five real
    template chunkers over this doc's synthesized sections."""
    from ..chunk.templates import (
        book_chunks,
        laws_chunks,
        naive_chunks,
        one_chunk,
        paper_chunks,
    )

    plain, book, outline = twin_sections(doc_id, twin_words(text))
    rows: list[tuple] = []
    for template, chunks in (
        ("naive", naive_chunks(plain, budget=16)),
        ("book", book_chunks(book)),
        ("laws", laws_chunks(outline)),
        ("paper", paper_chunks([(x, "") for x in outline])),
        ("one", one_chunk(outline)),
    ):
        for i, ck in enumerate(chunks):
            rows.append((doc_id, template, i, ck))
    return rows
