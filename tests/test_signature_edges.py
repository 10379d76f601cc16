"""Edge-input regressions for the r4 single-pass signature rewrites.

The array-accumulator forms index their input with element_at inside a
lambda; under Spark 4 ANSI mode an unguarded sequence(0, size-1) on an
EMPTY array yields a descending [0, -1] whose element_at(1) throws and
aborts the whole job on one bad row (found in r4 self-review with a
live repro).  These tests pin the guards.
"""

from pyspark.sql import functions as F


def test_lsh_signature_empty_and_null_vectors(spark):
    """Empty/null embeddings must yield signature 0 (the unrolled
    form's value) instead of throwing INVALID_ARRAY_INDEX_IN_ELEMENT_AT."""
    from ragflow_spark.ops.simsearch import lsh_signature_from

    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.75]), (2, []), (3, None)],
        "id long, v array<double>",
    )
    rows = {
        r["id"]: r["sig"]
        for r in df.select(
            "id", lsh_signature_from(F.col("v"), 16).alias("sig")
        ).collect()
    }
    assert rows[2] == 0 and rows[3] == 0
    assert rows[1] != 0  # real vector gets a real sketch


def test_embedding_near_dup_lsh_survives_empty_vector(spark):
    """One empty embedding row in the corpus must not abort the job."""
    from ragflow_spark.ops.dedup import embedding_near_dup_lsh

    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]), (3, [])],
        "vec_id long, embedding array<double>",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_lsh(df, threshold=0.9).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_minhash_signature_empty_grams_keeps_null_api(spark):
    """Public-API parity with the pre-rewrite array_min form: an empty
    gram array signs as [null]*K, never leaking the aggregate's _M31
    init sentinels into persisted signatures."""
    from ragflow_spark.ops.dedup import minhash_signature

    df = spark.createDataFrame(
        [(1, ["abc", "bcd"]), (2, [])], "id long, grams array<string>"
    )
    rows = {
        r["id"]: r["sig"]
        for r in df.select(
            "id", minhash_signature(F.col("grams"), num_hashes=4).alias("sig")
        ).collect()
    }
    assert rows[2] == [None, None, None, None]
    assert all(v is not None for v in rows[1])
