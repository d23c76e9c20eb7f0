"""Graph analytics over relational edges: PageRank.

Complements ``dedup.dedup_clusters`` (connected components — label
propagation to a fixpoint) with the other canonical iterative-graph
shape: damped power iteration over a normalized adjacency.

Graph: the customer↔supplier trade network — an undirected edge
whenever a customer's order contains a lineitem from a supplier
(orders ⋈ lineitem, projected to DISTINCT (custkey, suppkey)).
Undirected means every node has out-degree ≥ 1, so no dangling-mass
redistribution term is needed and the inner contribution join is total.

Node ids live in one bigint space: customer c -> 2c, supplier s ->
2s+1 (collision-free, engine-portable).

Scale: each iteration is ONE shuffle — edges ⋈ ranks on src (both
sides hash-partitioned on node id; the degree factor is pre-merged
into the edge weight so the loop body is join → groupBy(dst) → sum).
|edges| rows move per round, |V|-sized state. The iteration count is
fixed (3), so lineage stays shallow without checkpointing; a
convergence-driven variant would localCheckpoint per round like
``dedup_clusters``. The DuckDB oracle unrolls the same three
iterations as CTEs r1→r3 — the Spark loop IS that recursion,
reformulated for a distributed engine.

No reference analogue; extends the LLM-pipeline/graph surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.numeric import quant, quant_sql
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table

#: Damping factor (the standard 0.85) and fixed iteration count. Both
#: the oracle SQL and the DataFrame body derive their literals from
#: these two constants — editing DAMPING changes both engines in
#: lockstep. TELEPORT is spelled out (not computed as 1 - DAMPING) so
#: the rendered SQL constant stays a clean decimal, float artifacts
#: like 0.15000000000000002 would poison the 9-decimal quantizer.
DAMPING = 0.85
TELEPORT = 0.15
assert DAMPING + TELEPORT == 1.0
N_ITERS = 3
TOP_K = 20

_EDGES_SQL = """
pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg)
"""


def _iter_sql(prev: str, cur: str) -> str:
    # Per-ITERATION quantization (12 dp, the events_daily_ewma
    # recursive-smoothing discipline): each engine sums per-node
    # contributions in its own order, so without a per-step snap the
    # last-ulp difference compounds through the iterations and can
    # land a final value on the 9-dp grid boundary — the rare
    # whole-suite flake this replaced. With inputs re-identical every
    # round, only the FINAL step's reassociation meets the 9-dp grid.
    return f"""
{cur} AS (
  SELECT e.dst AS node,
         {quant_sql(
             f"{TELEPORT} / (SELECT n FROM nn)"
             f" + {DAMPING} * SUM({prev}.r / deg.d)",
             12,
         )} AS r
  FROM edges e
  JOIN {prev} ON e.src = {prev}.node
  JOIN deg ON e.src = deg.src
  GROUP BY e.dst
)"""


@register(
    "pagerank_trade_network",
    oracle=f"""
WITH {_EDGES_SQL},
r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS r FROM deg)
,{_iter_sql("r0", "r1")}
,{_iter_sql("r1", "r2")}
,{_iter_sql("r2", "r3")}
SELECT node, {quant_sql("r", 9)} AS rank_q
FROM r3
ORDER BY rank_q DESC, node
LIMIT {TOP_K}
""",
)
def pagerank_trade_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank nodes of the customer↔supplier network after
    three damped power iterations.

    Ranks are quantized to 9 decimals before the final sort: the two
    engines sum per-node contributions in different orders, so raw
    doubles differ in the last ulp; the quantizer absorbs that (same
    policy as functions/numeric.py).
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # Materialize the edge list ONCE: everything downstream (degrees,
    # |V|, initial ranks, and every iteration's join) reads it, and
    # without this the orders⋈lineitem→distinct chain re-executes per
    # round and the final plan nests it three deep (same hygiene as
    # dedup_clusters; on a cluster use persist(MEMORY_AND_DISK) /
    # checkpoint instead).
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .union(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # |V| as a 1-row aggregate joined in (never a driver-side collect).
    nn = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    edges_deg = edges.join(deg, "src").select("src", "dst", "d")
    ranks = deg.crossJoin(F.broadcast(nn)).select(
        F.col("src").alias("node"), (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(N_ITERS):
        ranks = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(F.col("dst"), (F.col("r") / F.col("d")).alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("dst").alias("node"),
                # per-iteration 12-dp snap, mirrored in _iter_sql — see
                # the comment there
                quant(
                    F.lit(TELEPORT) / F.col("n") + F.lit(DAMPING) * F.col("s"),
                    12,
                ).alias("r"),
            )
        )
    return (
        ranks.select("node", quant("r", 9).alias("rank_q"))
        .orderBy(F.col("rank_q").desc(), "node")
        .limit(TOP_K)
    )
