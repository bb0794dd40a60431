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


def test_simhash_8_chunk_banding(spark):
    """n_chunks=8 (6-bit chunks): candidate recall is guaranteed for
    hamming <= 7 (pigeonhole), so the 8-chunk pair set at max_hamming=7
    must be a superset of the default 4-chunk set (guaranteed only <=3),
    and be exactly the brute-force pair set at that distance."""
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("shared core words alpha beta gamma delta epsilon "),
                 F.when(F.col("id") % 3 == 0, F.lit("zeta eta theta"))
                 .otherwise(F.lit("iota kappa")),
                 F.lit(" tail variant "),
                 (F.col("id") % 17).cast("string")).alias("text"),
    )
    sigs = D.simhash_signatures(docs).localCheckpoint(eager=True)
    a = sigs.select(F.col("doc_id").alias("doc_a"),
                    F.col("simhash").alias("sim_a"))
    b = sigs.select(F.col("doc_id").alias("doc_b"),
                    F.col("simhash").alias("sim_b"))
    brute = {
        (r.doc_a, r.doc_b)
        for r in a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("h", F.bit_count(
            F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("h") <= 7).collect()
    }
    p8 = {(r.doc_a, r.doc_b) for r in D.simhash_near_duplicates(
        docs, max_hamming=7, max_bucket=10**9, n_chunks=8).collect()}
    p4 = {(r.doc_a, r.doc_b) for r in D.simhash_near_duplicates(
        docs, max_hamming=7, max_bucket=10**9).collect()}
    assert p8 == brute  # 8 chunks: complete at hamming <= 7
    assert p4 <= p8     # 4 chunks: best-effort subset above hamming 3
