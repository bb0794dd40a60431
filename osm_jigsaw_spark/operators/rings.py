"""Ring stitching: unordered, arbitrarily-directed ways → closed rings.

Grouped-map Arrow UDF (applyInPandas) re-expressing the reference's greedy
`joinWays` (resolving/OutlineBuilder.scala:18-66): start a ring from the
first available way, repeatedly attach the first remaining way sharing the
current tail node (reversing it when it attaches tail-to-tail), close the
ring when no attachment remains; unclosed leftovers are dropped
(OutlineBuilder.scala:52-59 closure test).

The greedy scan is inherently sequential *within one relation* — exactly the
granularity applyInPandas gives us: every relation stitches independently in
parallel across executors, with the way membership delivered by a prior
equi-join (no MapDB volume; the shuffle is the index).

Determinism: ways are processed in member order (`pos`), replacing the
reference's mutable-Set iteration order (its tests are order-insensitive on
ring counts/membership; ours are deterministic).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

RING_SCHEMA = (
    "rel_id long, ring_index int, n_ways int, "
    "way_ids array<long>, node_ids array<long>"
)


def _stitch_one(pdf: pd.DataFrame) -> pd.DataFrame:
    rel_id = int(pdf["rel_id"].iloc[0])
    pdf = pdf.sort_values("pos", kind="mergesort")
    available: list[tuple[int, list[int]]] = [
        (int(w), list(n)) for w, n in zip(pdf["way_id"], pdf["node_ids"])
        if len(n) > 0
    ]
    rings = []
    while available:
        way_id, nodes = available.pop(0)
        joined_ways = [way_id]
        joined_nodes = list(nodes)
        last = joined_nodes[-1]
        progressing = True
        while progressing and available:
            progressing = False
            for i, (wid, wn) in enumerate(available):
                if wn[0] == last or wn[-1] == last:
                    seq = wn if wn[0] == last else list(reversed(wn))
                    # signed-way-id encoding: negative = traversed reversed
                    # (reference steps/ExtractAreas.scala:55)
                    joined_ways.append(wid if wn[0] == last else -wid)
                    joined_nodes.extend(seq)
                    last = joined_nodes[-1]
                    available.pop(i)
                    progressing = True
                    break
        if joined_nodes[0] == joined_nodes[-1]:
            rings.append((joined_ways, joined_nodes))
        # else: not closed — dropped (logged by the reference)
    return pd.DataFrame(
        {
            "rel_id": [rel_id] * len(rings),
            "ring_index": list(range(len(rings))),
            "n_ways": [len(rw) for rw, _ in rings],
            "way_ids": [rw for rw, _ in rings],
            "node_ids": [nn for _, nn in rings],
        }
    )


def stitch_rings(outer_ways_with_nodes: DataFrame) -> DataFrame:
    """Input: (rel_id, way_id, pos, node_ids array<long>) — one row per outer
    way of each relation. Output: RING_SCHEMA, one row per closed ring.
    """
    return outer_ways_with_nodes.groupBy("rel_id").applyInPandas(
        _stitch_one, schema=RING_SCHEMA
    )
