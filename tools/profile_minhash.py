"""Ad-hoc: decompose minhash_near_duplicates wall time into its three
barriered phases (arrays checkpoint / candidates checkpoint / verify).
Usage: python tools/profile_minhash.py [cpus] [n_docs] [reps]
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


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(app_name="minhash-profile", cores=cpus,
                      shuffle_partitions=cpus)
    docs = scaled_text_docs(spark, n_docs).localCheckpoint(eager=True)

    best = {}
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        harr = DD.hashed_shingle_arrays(docs).localCheckpoint(eager=True)
        t1 = time.time()
        sigs = DD.minhash_signatures(docs, h_arrays=harr)
        cands = DD.lsh_candidates(sigs).localCheckpoint(eager=True)
        t2 = time.time()
        n = DD.jaccard_verify(docs, cands, 0.5, h_arrays=harr).count()
        t3 = time.time()
        phases = {"arrays": t1 - t0, "cands": t2 - t1, "verify": t3 - t2,
                  "total": t3 - t0}
        for k, v in phases.items():
            if k not in best or v < best[k]:
                best[k] = v
    print({k: round(v, 2) for k, v in best.items()}, "pairs:", n,
          "cpus:", cpus, "n_docs:", n_docs)


if __name__ == "__main__":
    main()
