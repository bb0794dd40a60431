"""Stage-barrier materialization: disk-parquet snapshot vs localCheckpoint.

Heavy pipeline stages need a materialization barrier: the stage result
feeds multiple downstream branches that do not share exchanges (left lazy,
the subtree re-executes once per branch), and on a cluster the stage IS an
Iceberg snapshot — the resume point the north rule mandates. Two barrier
mechanisms exist and they are NOT equivalent at high parallelism:

- ``localCheckpoint(eager=True)``: partitions serialize into the executor
  block manager. In local mode there is ONE shared block manager, and the
  round-4 pipeline decomposition (BENCH_APPENDIX.md) measured its snapshot
  write ANTI-scaling — 3.76 s at local[4] -> 6.84 s at local[16] for the
  same bytes (16 writers contending on one BlockManager + one memory bus).
- parquet snapshot (this module): write the stage to a temp parquet
  directory and read it back — per-partition parallel file writes through
  the OS page cache with no shared lock, and the truer analog of the
  Iceberg stage snapshot a 100 TB run writes anyway
  (plans/checkpoints.py:80 persists resumable stages exactly this way).

Round-5 interleaved A/B (tools/ab_snapshot.py; tables in BENCH_APPENDIX.md)
measured parquet >= checkpoint at every parallelism level, with the gap
widening where the block manager contends, so ``parquet`` is the default;
``SPARK_GRAFT_BARRIER=checkpoint`` restores the old behavior for A/Bs.

Reference analog: the Scala pipeline chains stages through protobuf files
on disk between JVMs (go.bash:9-17) — the parquet barrier is the same
architecture inside one session.
"""

from __future__ import annotations

import atexit
import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

DEFAULT_MODE = "parquet"
_ENV = "SPARK_GRAFT_BARRIER"

_root: str | None = None
_seq = itertools.count()


def _snap_root() -> str:
    global _root
    if _root is None:
        _root = tempfile.mkdtemp(prefix="osm-jigsaw-snap-")
        atexit.register(shutil.rmtree, _root, True)
    return _root


def snapshot(df: DataFrame, name: str = "snap",
             mode: str | None = None) -> DataFrame:
    """Materialize ``df`` and return a re-readable barrier over its rows.

    mode: "parquet" (default; per-partition parallel file I/O, the Iceberg
    snapshot analog) or "checkpoint" (localCheckpoint into the block
    manager). Resolved from $SPARK_GRAFT_BARRIER when not passed.
    """
    mode = mode or os.environ.get(_ENV, DEFAULT_MODE)
    if mode == "checkpoint":
        return df.localCheckpoint(eager=True)
    if mode != "parquet":
        raise ValueError(f"unknown barrier mode {mode!r}")
    path = os.path.join(_snap_root(), f"{name}-{next(_seq)}")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
