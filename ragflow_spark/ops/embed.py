"""Embedding stage plumbing (reference §2.8 shape, model stubbed).

The reference embeds chunks in batches of 16 with a weighted
``0.1*title + 0.9*content`` combination (rag/svr/task_executor.py:
427-476, rag/settings.py:60).  The model itself is out of scope here;
what this module provides is the *production plumbing* on Spark:

* iterator-style ``mapInPandas`` so per-executor model init happens
  once (the ONNX/HTTP session in production, a hash projector here);
* internal micro-batching at EMBED_BATCH=16 inside the Arrow batch —
  the exact call pattern a real encoder needs;
* deterministic hash-based unit vectors standing in for the model, so
  tests and downstream similarity-search operators run end-to-end.

Swap ``_HashEncoder`` for a real encoder via ``--py-files`` on a
cluster; nothing else changes.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

EMBED_BATCH = 16  # parity: rag/settings.py:60
TITLE_W, CONTENT_W = 0.1, 0.9  # parity: rag/svr/task_executor.py:472-475

EMBED_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.LongType()),
        T.StructField("q_vec", T.ArrayType(T.FloatType())),
    ]
)


class _HashEncoder:
    """Deterministic stand-in encoder: token-hash bag projected to
    ``dim`` and L2-normalized.  One instance per python worker."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def encode(self, texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            v = [0.0] * self.dim
            for tok in (t or "").split():
                h = hashlib.md5(tok.encode()).digest()
                idx = int.from_bytes(h[:4], "big") % self.dim
                sign = 1.0 if h[4] & 1 else -1.0
                v[idx] += sign
            norm = math.sqrt(sum(x * x for x in v)) or 1.0
            out.append([x / norm for x in v])
        return out


def make_embed_batches(dim: int = 64):
    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = _HashEncoder(dim)  # per-worker init, amortized over batches
        for pdf in batches:
            titles = list(pdf.get("title", pd.Series([""] * len(pdf))))
            contents = list(pdf["content"])
            vecs: list[list[float]] = []
            for lo in range(0, len(contents), EMBED_BATCH):
                tv = enc.encode([t or "" for t in titles[lo : lo + EMBED_BATCH]])
                cv = enc.encode([c or "" for c in contents[lo : lo + EMBED_BATCH]])
                vecs.extend(
                    [
                        [TITLE_W * a + CONTENT_W * b for a, b in zip(ta, ca)]
                        for ta, ca in zip(tv, cv)
                    ]
                )
            yield pd.DataFrame(
                {"chunk_id": pdf["chunk_id"], "q_vec": vecs}
            )

    return embed_batches


def embed_chunks(chunks: DataFrame, dim: int = 64) -> DataFrame:
    """chunks(chunk_id, title, content) -> (chunk_id, q_vec)."""
    cols = [c for c in ("chunk_id", "title", "content") if c in chunks.columns]
    return chunks.select(*cols).mapInPandas(
        make_embed_batches(dim), schema=EMBED_SCHEMA
    )
