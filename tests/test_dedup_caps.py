"""Hot-bucket caps on the MinHash/SimHash band joins (VERDICT r1 item 5):
a pathological corpus putting thousands of docs on one band key must not
produce an O(n²) candidate explosion, and the skip must be disclosed."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_jigsaw_spark.operators import dedup as D

N_DOCS = 10_000


def _identical_docs(spark, n=N_DOCS):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("lorem ipsum dolor sit amet consectetur adipiscing elit sed")
        .alias("text"),
    )


def test_minhash_hot_bucket_capped(spark):
    docs = _identical_docs(spark)
    sigs = D.minhash_signatures(docs).localCheckpoint(eager=True)
    cands = D.lsh_candidates(sigs, max_bucket=100)
    assert cands.count() == 0  # the 10k-doc bucket is skipped, not joined
    over = D.lsh_oversized_buckets(sigs, max_bucket=100)
    rows = over.collect()
    assert len(rows) == D.MINHASH_BANDS  # every band has the one hot bucket
    assert all(r.bucket_n == N_DOCS for r in rows)


def test_minhash_small_buckets_unaffected(spark):
    """Docs distinct enough to stay under the cap behave as before."""
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("completely distinct document number "),
                 F.col("id").cast("string"),
                 F.lit(" with its own unique words token"),
                 (F.col("id") * 7).cast("string")).alias("text"),
    )
    sigs = D.minhash_signatures(docs).localCheckpoint(eager=True)
    uncapped = D.lsh_candidates(sigs, max_bucket=10**9).count()
    capped = D.lsh_candidates(sigs).count()
    assert capped == uncapped


def test_simhash_hot_bucket_capped(spark):
    docs = _identical_docs(spark, n=2_000)
    pairs = D.simhash_near_duplicates(docs, max_hamming=6, max_bucket=100)
    assert pairs.count() == 0
    over = D.simhash_oversized_buckets(docs, max_bucket=100).collect()
    assert len(over) == D.SIMHASH_CHUNKS
    assert all(r.bucket_n == 2_000 for r in over)
