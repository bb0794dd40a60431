"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension (no reference analog):

- brute_force_topk: exact cosine top-k. The query side is small by
  definition (a bounded query set), so it is collected, L2-normalized in
  numpy, and broadcast; the corpus side streams through a vectorized
  mapInPandas kernel that computes one matmul per Arrow batch and emits
  only the per-batch top-k per query. A final (tiny) window merge yields
  the exact global top-k — per-batch pruning is lossless because both
  levels use the same total order (cos_sim desc, vec_id asc). At 100 TB
  the shuffle after the kernel carries ≤ k·n_queries rows per partition,
  never the corpus.
- lsh_topk: random-hyperplane LSH — hyperplane components derived from
  md5("p:<plane>:<dim>") (deterministic across engines AND runs, no RNG);
  sign signature → bucket match against the broadcast query signatures →
  exact cosine only within matching buckets. Candidates shrink
  ~2^planes-fold; recall tunable by planes.

Both kernels are Arrow-batched numpy (no per-row Python), stay
embarrassingly partition-parallel, and never shuffle the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LSH_PLANES = 8  # signature bits

_OUT_SCHEMA = "query_id long, vec_id long, cos_sim double"


def _collect_queries(embeddings: DataFrame, n_queries: int):
    """(q_ids int64[nq], Q float64[nq, d]) — the bounded query set."""
    rows = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    q_ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    Q = np.array([r.embedding for r in rows], dtype=np.float64)
    return q_ids, Q


def _batch_topk(sims: np.ndarray, vec_ids: np.ndarray, q_ids: np.ndarray,
                k: int):
    """Per-query top-k rows of a (n_rows, n_q) rounded sims matrix under
    the total order (cos_sim desc, vec_id asc). Returns a pandas frame."""
    out_q, out_v, out_s = [], [], []
    n = sims.shape[0]
    kk = min(k, n)
    for qi in range(sims.shape[1]):
        col = sims[:, qi]
        mask = vec_ids != q_ids[qi]
        idx = np.nonzero(mask)[0]
        if idx.size == 0:
            continue
        sub = col[idx]
        take = min(kk, idx.size)
        # lexsort: primary -sub desc, tie-break vec_id asc
        order = np.lexsort((vec_ids[idx], -sub))[:take]
        sel = idx[order]
        out_q.append(np.full(take, q_ids[qi], dtype=np.int64))
        out_v.append(vec_ids[sel])
        out_s.append(col[sel])
    if not out_q:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "cos_sim": pd.Series([], dtype="float64")})
    return pd.DataFrame({
        "query_id": np.concatenate(out_q),
        "vec_id": np.concatenate(out_v),
        "cos_sim": np.concatenate(out_s),
    })


def _rank_merge(partial: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim",
                F.col("rank").cast("long").alias("rank"))
    )


def brute_force_topk(embeddings: DataFrame, n_queries: int = 20,
                     k: int = 5) -> DataFrame:
    """(query_id, vec_id, cos_sim, rank) — exact cosine top-k for the first
    n_queries vec_ids against the whole corpus."""
    spark = embeddings.sparkSession
    q_ids, Q = _collect_queries(embeddings, n_queries)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, Qn))

    def kernel(batches):
        b_ids, b_Qn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(list(pdf["embedding"]), dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            sims = np.round(Cn @ b_Qn.T, 6)
            yield _batch_topk(sims, pdf["vec_id"].to_numpy(np.int64),
                              b_ids, k)

    partial = embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, _OUT_SCHEMA)
    return _rank_merge(partial, k)


def _plane_matrix(planes: int, dim: int) -> np.ndarray:
    """(planes, dim) pseudo-random hyperplanes from the portable md5 hash:
    component = int(md5("p:<p>:<d>")[:15 hex], 16) / 2^59 - 1 ∈ [-1, 1)."""
    M = np.empty((planes, dim), dtype=np.float64)
    for p in range(planes):
        for d in range(dim):
            h = hashlib.md5(f"p:{p}:{d}".encode()).hexdigest()[:15]
            M[p, d] = int(h, 16) / float(2 ** 59) - 1.0
    return M


def _signatures(V: np.ndarray, M: np.ndarray) -> np.ndarray:
    """int64 bucket id per row: bit p set iff V·plane_p >= 0."""
    bits = (V @ M.T) >= 0.0
    weights = (1 << np.arange(M.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def lsh_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5,
             planes: int = LSH_PLANES) -> DataFrame:
    """(query_id, vec_id, cos_sim, rank) — approximate top-k: candidates
    restricted to corpus rows whose sign signature equals the query's."""
    spark = embeddings.sparkSession
    q_ids, Q = _collect_queries(embeddings, n_queries)
    M = _plane_matrix(planes, Q.shape[1])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_sigs = _signatures(Q, M)
    bc = spark.sparkContext.broadcast((q_ids, Qn, q_sigs, M))

    def kernel(batches):
        b_ids, b_Qn, b_sigs, b_M = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(list(pdf["embedding"]), dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            c_sigs = _signatures(C, b_M)
            vec_ids = pdf["vec_id"].to_numpy(np.int64)
            frames = []
            for qi in range(len(b_ids)):
                hit = c_sigs == b_sigs[qi]
                hit &= vec_ids != b_ids[qi]
                idx = np.nonzero(hit)[0]
                if idx.size == 0:
                    continue
                sims = np.round(Cn[idx] @ b_Qn[qi], 6)
                take = min(k, idx.size)
                order = np.lexsort((vec_ids[idx], -sims))[:take]
                frames.append(pd.DataFrame({
                    "query_id": np.full(take, b_ids[qi], dtype=np.int64),
                    "vec_id": vec_ids[idx][order],
                    "cos_sim": sims[order],
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    partial = embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, _OUT_SCHEMA)
    return _rank_merge(partial, k)


def embedding_near_duplicates(embeddings: DataFrame,
                              threshold: float = 0.45) -> DataFrame:
    """(vec_a, vec_b, cos_sim) — exact all-pairs cosine near-duplicates
    (vec_a < vec_b, cos_sim ≥ threshold).

    Block formulation: the normalized corpus is broadcast once and each
    Arrow batch emits its block of the similarity matrix above the
    threshold — one matmul per batch, rows only for qualifying pairs. This
    is the exact verifier; at 100 TB the broadcast becomes the LSH bucket
    join (see lsh_topk) as a prefilter and this kernel verifies within
    buckets."""
    spark = embeddings.sparkSession
    rows = embeddings.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, Vn))

    def kernel(batches):
        c_ids, c_Vn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.array(list(pdf["embedding"]), dtype=np.float64)
            Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
            b_ids = pdf["vec_id"].to_numpy(np.int64)
            sims = np.round(Bn @ c_Vn.T, 6)
            keep = (sims >= threshold) & (b_ids[:, None] < c_ids[None, :])
            bi, ci = np.nonzero(keep)
            if bi.size:
                yield pd.DataFrame({
                    "vec_a": b_ids[bi], "vec_b": c_ids[ci],
                    "cos_sim": sims[bi, ci],
                })

    return embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, "vec_a long, vec_b long, cos_sim double")
