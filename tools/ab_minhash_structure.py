"""Ad-hoc interleaved A/B: minhash_near_duplicates barrier structure.

A ("harr", current): checkpoint per-doc hashed-shingle ARRAYS (~8 B/shingle
   of snapshot volume), sign from the hashes, verify joins on longs.
B ("bands"): no array checkpoint — signatures stay inline (split+md5 runs
   once, the capped band table is checkpointed before the self-join via
   lsh_candidates(materialize=True)), verify re-shingles only candidate
   docs. Snapshot volume is the SKINNY (doc_id, band, key) table
   (4 rows/doc) instead of the shingle arrays (~200 longs/doc).

Structures are interleaved per rep so the host's steal-time bursts hit
both; per-structure minima across reps estimate clean-window cost.
Usage: python tools/ab_minhash_structure.py [cpus] [n_docs] [reps]
"""
from __future__ import annotations

import os
import sys
import time

for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
             "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_var, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_jigsaw_spark.fixtures.scaled_docs import scaled_text_docs  # noqa: E402
from osm_jigsaw_spark.operators import dedup as DD  # noqa: E402
from osm_jigsaw_spark.session import get_spark  # noqa: E402


def run_harr(docs) -> int:
    harr = DD.hashed_shingle_arrays(docs).localCheckpoint(eager=True)
    sigs = DD.minhash_signatures(docs, h_arrays=harr)
    cands = DD.lsh_candidates(sigs).localCheckpoint(eager=True)
    return DD.jaccard_verify(docs, cands, 0.5, h_arrays=harr).count()


def run_bands(docs) -> int:
    sigs = DD.minhash_signatures(docs)
    cands = DD.lsh_candidates(
        sigs, materialize=True).localCheckpoint(eager=True)
    return DD.jaccard_verify(docs, cands, 0.5).count()


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="minhash-ab", cores=cpus,
                      shuffle_partitions=cpus)
    docs = scaled_text_docs(spark, n_docs).localCheckpoint(eager=True)

    best: dict[str, float] = {}
    times: dict[str, list[float]] = {"harr": [], "bands": []}
    pairs: dict[str, int] = {}
    for _ in range(reps):
        for name, fn in (("harr", run_harr), ("bands", run_bands)):
            spark.catalog.clearCache()
            t0 = time.time()
            pairs[name] = fn(docs)
            dt = time.time() - t0
            times[name].append(round(dt, 2))
            if name not in best or dt < best[name]:
                best[name] = dt
    print({k: round(v, 2) for k, v in best.items()}, "| all:", times,
          "| pairs:", pairs, "| cpus:", cpus, "n_docs:", n_docs)


if __name__ == "__main__":
    main()
