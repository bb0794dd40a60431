"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension (no reference analog):

- brute_force_topk: exact cosine top-k — the correctness baseline. Query
  set × corpus join (broadcast the query side), dot products via
  zip_with/aggregate (JVM-side), per-query window top-k. At 100 TB this is
  the verifier, not the scale path.
- lsh_topk: random-hyperplane LSH — hyperplane components derived from the
  portable hash60 (deterministic across engines AND runs, no RNG), sign
  signature → bucket equi-join → exact cosine within bucket → top-k.
  Candidates shrink ~2^bits-fold; recall tunable by bits/tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LSH_PLANES = 8  # signature bits


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def brute_force_topk(embeddings: DataFrame, n_queries: int = 20,
                     k: int = 5) -> DataFrame:
    """(query_id, vec_id, cos_sim, rank) — exact cosine top-k for the first
    n_queries vec_ids against the whole corpus."""
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    c = embeddings.select("vec_id", "embedding")
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id"))
    sims = joined.select(
        "query_id", "vec_id",
        F.round(
            _dot(F.col("qv"), F.col("embedding"))
            / (_norm(F.col("qv")) * _norm(F.col("embedding"))),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def _lsh_signature(emb, planes: int = LSH_PLANES):
    """Sign signature against pseudo-random hyperplanes.

    plane p component for dimension d = hash60("p:<p>:<d>") scaled to
    [-1, 1] — deterministic, identical for every row and engine.
    """
    def component_fn(p):
        def fn(d):
            return (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"p:{p}:"), d.cast("string"))),
                        1, 15),
                    16, 10,
                ).cast("long").cast("double") / F.lit(float(2 ** 59)) - F.lit(1.0)
            )
        return fn

    bits = []
    for p in range(planes):
        comp = F.transform(F.sequence(F.lit(0), F.size(emb) - 1), component_fn(p))
        dot = F.aggregate(
            F.zip_with(emb, comp, lambda x, c: x.cast("double") * c),
            F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))
                    * F.lit(1 << p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5,
             planes: int = LSH_PLANES) -> DataFrame:
    """(query_id, vec_id, cos_sim, rank) — approximate top-k: candidates
    restricted to the query's LSH bucket."""
    with_sig = embeddings.withColumn(
        "sig", _lsh_signature(F.col("embedding"), planes))
    q = with_sig.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
        F.col("sig"))
    c = with_sig.select("vec_id", "embedding", "sig")
    joined = c.join(F.broadcast(q), "sig").filter(
        F.col("vec_id") != F.col("query_id"))
    sims = joined.select(
        "query_id", "vec_id",
        F.round(
            _dot(F.col("qv"), F.col("embedding"))
            / (_norm(F.col("qv")) * _norm(F.col("embedding"))),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )
