"""Citation insertion: attach [ID:n] markers to answer sentences.

Clean-room port of ``Dealer.insert_citations``
(rag/nlp/search.py:164-270): the answer splits into sentence pieces
(code fences kept intact), each piece >= 5 chars is embedded and
scored against the retrieved chunks with 0.1-token/0.9-vector hybrid
similarity, and chunks within 1% of a piece's max similarity (up to 4)
are cited after it; the acceptance threshold starts at 0.63 and decays
by 0.8 until something cites.

The embedding model is injected (``encode_fn: list[str] ->
list[vec]``) — production plugs the real encoder, tests and queries
use the deterministic hash encoder (ops/embed.py).  This is a
serving-path text operator (one answer, a page of chunks), not a
corpus-scale stage; at scale it runs inside whatever serving layer
calls it, never in a Spark job.
"""

from __future__ import annotations

import re

from ..text.querybuild import QueryBuilder, hybrid_similarity_of, rm_www

_PIECE_SPLIT = r"([^\|][；。？!！\n]|[a-z][.?;!][ \n])"


def split_answer_pieces(answer: str) -> list[str]:
    """Sentence pieces with code fences kept whole (search.py:171-192)."""
    pieces = re.split(r"(```)", answer)
    if len(pieces) >= 3:
        i = 0
        pieces_ = []
        while i < len(pieces):
            if pieces[i] == "```":
                st = i
                i += 1
                while i < len(pieces) and pieces[i] != "```":
                    i += 1
                if i < len(pieces):
                    i += 1
                pieces_.append("".join(pieces[st:i]) + "\n")
            else:
                pieces_.extend(re.split(_PIECE_SPLIT, pieces[i]))
                i += 1
        pieces = pieces_
    else:
        pieces = re.split(_PIECE_SPLIT, answer)
    # the split captures the sentence-final character pair: glue its
    # first char back onto the previous piece (search.py:193-197)
    for i in range(1, len(pieces)):
        if re.match(_PIECE_SPLIT, pieces[i]):
            pieces[i - 1] += pieces[i][0]
            pieces[i] = pieces[i][1:]
    return pieces


def insert_citations(
    answer: str,
    chunks: list[str],
    chunk_v: list[list[float]],
    encode_fn,
    builder: QueryBuilder | None = None,
    tkweight: float = 0.1,
    vtweight: float = 0.9,
) -> tuple[str, set[str]]:
    """Returns (answer_with_markers, cited_chunk_indices)."""
    assert len(chunks) == len(chunk_v)
    if not chunks:
        return answer, set()
    builder = builder or QueryBuilder()
    tokenize = builder._tokenize

    pieces = split_answer_pieces(answer)
    idx: list[int] = []
    pieces_: list[str] = []
    for i, t in enumerate(pieces):
        if len(t) < 5:
            continue
        idx.append(i)
        pieces_.append(t)
    if not pieces_:
        return answer, set()

    ans_v = encode_fn(pieces_)
    chunk_v = [
        v if len(v) == len(ans_v[0]) else [0.0] * len(ans_v[0]) for v in chunk_v
    ]
    chunks_tks = [tokenize(rm_www(ck)).split() for ck in chunks]
    cites: dict[int, list[str]] = {}
    thr = 0.63
    while thr > 0.3 and len(cites.keys()) == 0 and pieces_ and chunks_tks:
        for i, _a in enumerate(pieces_):
            sim, _tksim, _vtsim = hybrid_similarity_of(
                builder,
                ans_v[i],
                chunk_v,
                tokenize(rm_www(pieces_[i])).split(),
                chunks_tks,
                tkweight,
                vtweight,
            )
            mx = max(sim) * 0.99
            if mx < thr:
                continue
            # sorted, not the reference's list(set(...)): set iteration
            # order follows the interpreter's randomized string hashing
            # (PYTHONHASHSEED), so WHICH four chunks get cited and the
            # marker order both varied run to run — the same
            # reproducibility hazard templates.py documents for
            # random.choices.  Numeric order is deterministic; the
            # parity test compares marker runs order-normalized.
            cites[idx[i]] = sorted(
                set(str(ii) for ii in range(len(chunk_v)) if sim[ii] > mx),
                key=int,
            )[:4]
        thr *= 0.8

    res = ""
    seted: set[str] = set()
    for i, p in enumerate(pieces):
        res += p
        if i not in idx:
            continue
        if i not in cites:
            continue
        for c in cites[i]:
            if c in seted:
                continue
            res += f" [ID:{c}]"
            seted.add(c)
    return res, seted
