"""Deterministic, scalable id assignment.

Replaces the reference's process-local AtomicLong area ids
(model/AreaIdSequence.scala:5-12) with ids that are a pure function of the
data: rank over a canonical ordering. A naive
``row_number().over(Window.orderBy(...))`` collapses to ONE partition — fine
at fixture scale, fatal at 15M+ rows — so the default implementation is the
classic two-phase distributed rank:

1. range-repartition by the ordering columns (Spark samples split points —
   deterministic for a given input);
2. per-partition local rank (mapInPandas, Arrow-batched);
3. add exclusive prefix sums of partition counts (tiny driver-side table,
   broadcast joined back).

Result: ids are dense, start at `start`, and identical across runs/cluster
sizes for identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_ids(df: DataFrame, order_cols: list, id_col: str = "area_id",
               start: int = 0, partitions: int | None = None) -> DataFrame:
    """Add `id_col` = deterministic dense rank of `order_cols`.

    order_cols: list of Column or column-name strings (ascending). The
    ordering must be a total order (include a tiebreaker) for determinism.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    spark = df.sparkSession
    n = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    n = max(1, min(n, 200))

    ranged = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())

    # exclusive prefix sums of per-partition counts (driver-side, tiny)
    counts = with_pid.groupBy("_pid").count().orderBy("_pid").collect()
    offsets = {}
    acc = start
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    offsets_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
    )

    import pandas as pd  # local import: only the UDF body needs it

    def add_local_rank(it):
        seen = {}
        for pdf in it:
            out = []
            for pid, grp in pdf.groupby("_pid", sort=False):
                base = seen.get(pid, 0)
                grp = grp.copy()
                grp["_lrank"] = range(base, base + len(grp))
                seen[pid] = base + len(grp)
                out.append(grp)
            yield pd.concat(out) if out else pdf.assign(_lrank=pd.Series(dtype="int64"))

    from pyspark.sql import types as T  # avoid mutating the cached schema
    schema = T.StructType(
        list(with_pid.schema.fields) + [T.StructField("_lrank", T.LongType())]
    )
    local = with_pid.mapInPandas(add_local_rank, schema=schema)
    return (
        local.join(F.broadcast(offsets_df), "_pid")
        .withColumn(id_col, (F.col("_offset") + F.col("_lrank")).cast("long"))
        .drop("_pid", "_lrank", "_offset")
    )
