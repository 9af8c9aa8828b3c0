"""Iterative graph analytics over edge DataFrames — PageRank by power
iteration, expressed as repeated equi-join + aggregate rounds.

The training-data use case: rank sources/domains/pages by link or
transition structure (per-domain quality priors for web corpora, as in
the public Common-Crawl curation literature), where nodes are domains
(millions) and edges are hyperlinks or navigation transitions
(billions).  The tiny event-type graph in the registry query is the
determinism harness; the plan shape is what scales.

Reference heritage: fs2-data's pipes are single-pass stream transforms
(``fs2/data/json/package.scala`` tokens -> values); an iterative
fixpoint over a dataset is the one shape its streaming model does NOT
express — this module is the Spark-native answer (a driver-side loop of
declarative rounds, each round one shuffle).

Determinism contract (cross-engine, DuckDB-mirrorable):
- per-edge contribution ``r(u) * cnt / W(u)`` is pure IEEE-double
  arithmetic on engine-identical inputs;
- every SUM that crosses rows (inflow per node, dangling mass) is
  accumulated in DECIMAL(38, 28) — order-independent, so shuffle
  nondeterminism cannot move a ulp;
- scalar literals are embedded via ``repr(float)`` in the generated
  oracle SQL and ``F.lit`` of the SAME Python float in the plan, so
  both engines see bit-identical constants (DuckDB's bare ``0.85``
  would be DECIMAL, a different rounding chain).

Scale notes (100 TB / 10^9 nodes): each iteration is ONE shuffle — the
inflow aggregation keyed by dst — plus two broadcast scalars (N, the
dangling mass).  The edge table is static across rounds: persist it
partitioned by ``src`` and the rank-join probes it with an unchanged
partitioning (Catalyst reuses the exchange); ranks are the small,
changing side.  Lineage grows linearly in ``iters`` — checkpoint every
few rounds on a real cluster (``df.checkpoint()``), which also bounds
recovery replay per the lineage-manifest protocol in
``fs2_data_spark/checkpoint.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,28)"


def _dsum28(c: F.Column) -> F.Column:
    """Order-independent double sum via exact DECIMAL(38,28) accumulation."""
    return F.sum(c.cast(_DEC)).cast("double")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "cnt",
    damping: float = 0.85,
    iters: int = 3,
) -> DataFrame:
    """Weighted PageRank with uniform teleport and dangling-mass
    redistribution, ``iters`` synchronous power-iteration rounds.

    ``r_{k+1}(v) = (1-d)/N + d * sum_{(u,v)} r_k(u)*w(u,v)/W(u)
                   + d * (sum_{dangling u} r_k(u)) / N``

    Input: an edge table with columns (src, dst, weight); multi-edges
    should be pre-aggregated.  Output: one row per node with its final
    rank (column ``pr``, unrounded double) — total mass is conserved at
    exactly 1 up to decimal-accumulation rounding.
    """
    d = float(damping)
    teleport = 1.0 - d
    e = (edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"),
                      F.col(weight).cast("bigint").alias("_w")))
    nodes = (e.select(F.col("_src").alias("node"))
             .union(e.select(F.col("_dst")))
             .distinct())
    outw = e.groupBy("_src").agg(F.sum("_w").alias("_ow"))
    nn = nodes.agg(F.count(F.lit(1)).alias("_n"))
    # edges pre-joined with their source's out-weight: static across
    # rounds (persist + partition by _src on a real cluster)
    ej = e.join(outw, on="_src")
    ranks = (nodes.crossJoin(nn)
             .select("node", (F.lit(1.0) / F.col("_n").cast("double"))
                     .alias("pr")))
    for _ in range(int(iters)):
        r = ranks.select(F.col("node").alias("_rn"), F.col("pr").alias("_r"))
        contrib = (ej.join(r, ej["_src"] == r["_rn"])
                   .select(F.col("_dst").alias("node"),
                           (F.col("_r") * F.col("_w").cast("double")
                            / F.col("_ow").cast("double")).alias("_c")))
        inflow = contrib.groupBy("node").agg(_dsum28(F.col("_c"))
                                             .alias("_in"))
        dang = (r.join(outw, r["_rn"] == outw["_src"], "left_anti")
                .agg(F.coalesce(_dsum28(F.col("_r")), F.lit(0.0))
                     .alias("_dm")))
        ranks = (nodes.crossJoin(nn).crossJoin(dang)
                 .join(inflow, on="node", how="left")
                 .select("node",
                         (F.lit(teleport) / F.col("_n").cast("double")
                          + F.lit(d) * F.coalesce(F.col("_in"), F.lit(0.0))
                          + F.lit(d) * F.col("_dm")
                          / F.col("_n").cast("double")).alias("pr")))
    return ranks


def pagerank_oracle_sql(
    edges_cte: str,
    damping: float = 0.85,
    iters: int = 3,
    round_dp: int = 6,
) -> str:
    """Generate the DuckDB mirror: the same power iteration unrolled as
    CTEs.  ``edges_cte`` must define a relation ``e(src, dst, cnt)``.
    Float literals are embedded with ``repr`` and cast to DOUBLE so both
    engines compute on bit-identical constants."""
    d = repr(float(damping))
    t = repr(1.0 - float(damping))
    sql = [f"""
WITH {edges_cte},
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT count(*) AS n FROM nodes),
ow AS (SELECT src, SUM(cnt) AS w FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS r
       FROM nodes CROSS JOIN nn)"""]
    for k in range(int(iters)):
        sql.append(f""",
i{k} AS (SELECT e.dst AS node,
                CAST(SUM(CAST(r.r * CAST(e.cnt AS DOUBLE)
                              / CAST(ow.w AS DOUBLE)
                              AS DECIMAL(38,28))) AS DOUBLE) AS inflow
         FROM e JOIN r{k} r ON e.src = r.node
                JOIN ow ON ow.src = e.src
         GROUP BY e.dst),
d{k} AS (SELECT CAST(COALESCE(SUM(CAST(r.r AS DECIMAL(38,28))),
                              CAST(0 AS DECIMAL(38,28))) AS DOUBLE) AS dm
         FROM r{k} r LEFT JOIN ow ON ow.src = r.node
         WHERE ow.src IS NULL),
r{k + 1} AS (SELECT n.node,
                CAST('{t}' AS DOUBLE) / CAST(nn.n AS DOUBLE)
                + CAST('{d}' AS DOUBLE)
                  * COALESCE(i.inflow, CAST(0 AS DOUBLE))
                + CAST('{d}' AS DOUBLE) * dk.dm / CAST(nn.n AS DOUBLE) AS r
             FROM nodes n CROSS JOIN nn CROSS JOIN d{k} dk
             LEFT JOIN i{k} i ON i.node = n.node)""")
    sql.append(f"""
SELECT node, ROUND(r, {int(round_dp)}) AS pr FROM r{int(iters)}""")
    return "".join(sql)


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "cnt",
    node_col: str = "node",
    label_col: str = "label",
    iters: int = 2,
) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani 2002, the
    hard-label variant): a small seed set carries known labels; each
    round every node adopts the label with the highest incoming edge
    weight from currently-labeled neighbors (seeds stay clamped) — how
    a handful of audited domain labels (spam/quality/topic) spread over
    a web-scale link or co-occurrence graph.

    Determinism contract: the per-round vote is an exact integer weight
    sum; the argmax tie-breaks by (weight DESC, label ASC); seeds are
    clamped by a left-anti join.  All comparisons are integers/strings —
    no floats anywhere, so any ANSI engine replays it exactly
    (:func:`label_propagation_oracle_sql` unrolls the rounds).

    Scale notes: each round is one (dst, label) aggregation + one
    row_number window on dst — two shuffles over the labeled frontier,
    which starts seed-sized and only grows as labels spread; the edge
    table is static (persist, partition by src).  Unlabeled nodes never
    materialize rows.
    """
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"),
                     F.col(weight).cast("bigint").alias("_w"))
    lab = seeds.select(F.col(node_col).alias("node"),
                       F.col(label_col).alias("label"),
                       F.lit(0).alias("round"))
    seed_ids = seeds.select(F.col(node_col).alias("node"))
    from pyspark.sql import Window
    for it in range(1, int(iters) + 1):
        cur = lab.select(F.col("node").alias("_ln"),
                         F.col("label").alias("_ll"))
        votes = (e.join(cur, e["_src"] == cur["_ln"])
                 .groupBy(F.col("_dst").alias("node"),
                          F.col("_ll").alias("label"))
                 .agg(F.sum("_w").alias("_votes")))
        w = Window.partitionBy("node").orderBy(F.col("_votes").desc(),
                                               F.col("label"))
        picked = (votes.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1)
                  .select("node", "label", F.lit(it).alias("round")))
        # clamp: seeds and already-labeled nodes keep their first label
        fresh = (picked.join(lab.select("node"), on="node", how="left_anti"))
        lab = lab.unionByName(fresh)
    return lab


def label_propagation_oracle_sql(
    edges_cte: str,
    seeds_cte: str,
    iters: int = 2,
) -> str:
    """DuckDB mirror of :func:`label_propagation`: ``edges_cte`` defines
    ``e(src, dst, cnt)``; ``seeds_cte`` defines ``seeds(node, label)``."""
    sql = [f"""
WITH {edges_cte},
{seeds_cte},
l0 AS (SELECT node, label, 0 AS round FROM seeds)"""]
    for t in range(1, int(iters) + 1):
        sql.append(f""",
v{t} AS (SELECT e.dst AS node, l.label, SUM(e.cnt) AS votes
         FROM e JOIN l{t - 1} l ON e.src = l.node
         GROUP BY e.dst, l.label),
p{t} AS (SELECT node, label, {t} AS round
         FROM (SELECT *, row_number() OVER (PARTITION BY node
                          ORDER BY votes DESC, label) AS rn FROM v{t})
         WHERE rn = 1),
l{t} AS (SELECT * FROM l{t - 1}
         UNION ALL
         SELECT p.* FROM p{t} p
         WHERE p.node NOT IN (SELECT node FROM l{t - 1}))""")
    sql.append(f"""
SELECT node, label, round FROM l{int(iters)}""")
    return "".join(sql)


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact global triangle count of the UNDIRECTED simple graph induced
    by ``edges`` — the standard density/community signal on link and
    co-occurrence graphs (a near-dup doc cluster of size c contributes
    C(c, 3) triangles; a random sparse graph contributes almost none).

    Algorithm: compact-forward wedge counting with DEGREE-BASED edge
    orientation (Schank & Wagner 2005; Suri & Vassilvitskii WWW'11 for
    the MapReduce form).  Direction and multiplicity are first erased
    (``least/greatest`` + distinct, self-loops dropped); each edge is
    then oriented from its lower- to its higher-``(degree, node)``
    endpoint, a total order, so every triangle is counted EXACTLY once:
    at its minimum vertex, as a wedge ``a->b, a->c (b < c)`` closed by
    the oriented edge ``b->c``.

    Orienting by degree (not node id) is the scale-critical choice: the
    wedge count becomes sum-of-squares of OUT-degrees, which the
    orientation bounds by O(E^1.5) regardless of skew — a web-scale
    star node (degree 10^7) generates ZERO wedges at its center because
    all its edges point toward it.  Id-ordered orientation would make
    that one node produce 10^14 wedges.

    Plan shape: degree aggregation (one shuffle, map-side combined) ->
    two equi-joins to attach endpoint degrees -> a self-equi-join on
    the wedge apex -> one semi-join against the oriented edge set ->
    a single count.  No cartesian product; all joins are equi-joins on
    node or (node, node) keys.  Everything is exact integer arithmetic.

    Output ONE row: ``n_nodes, n_edges, n_triangles`` (an empty edge
    set yields ``0, 0, 0``).
    """
    e = (edges
         .filter(F.col(src).isNotNull() & F.col(dst).isNotNull()
                 & (F.col(src) != F.col(dst)))
         .select(F.least(src, dst).alias("_a"),
                 F.greatest(src, dst).alias("_b"))
         .distinct())
    deg = (e.select(F.col("_a").alias("_n"))
           .unionAll(e.select(F.col("_b").alias("_n")))
           .groupBy("_n").agg(F.count(F.lit(1)).alias("_d")))
    da = deg.select(F.col("_n").alias("_a"), F.col("_d").alias("_da"))
    db = deg.select(F.col("_n").alias("_b"), F.col("_d").alias("_db"))
    keyed = e.join(da, on="_a").join(db, on="_b")
    # orient low (degree, id) -> high (degree, id): a strict total order
    fwd = F.col("_da") < F.col("_db")
    rev = (F.col("_db") < F.col("_da")) | \
        ((F.col("_da") == F.col("_db")) & (F.col("_b") < F.col("_a")))
    lo = F.when(fwd | ~rev, F.col("_a")).otherwise(F.col("_b"))
    lo_d = F.when(fwd | ~rev, F.col("_da")).otherwise(F.col("_db"))
    hi = F.when(fwd | ~rev, F.col("_b")).otherwise(F.col("_a"))
    hi_d = F.when(fwd | ~rev, F.col("_db")).otherwise(F.col("_da"))
    o = keyed.select(lo.alias("_u"), lo_d.alias("_ud"),
                     hi.alias("_v"), hi_d.alias("_vd"))
    l = o.select(F.col("_u").alias("_w"), F.col("_v").alias("_x"),
                 F.col("_vd").alias("_xd"))
    r = o.select(F.col("_u").alias("_w"), F.col("_v").alias("_y"),
                 F.col("_vd").alias("_yd"))
    wedges = (l.join(r, on="_w")
              .filter((F.col("_xd") < F.col("_yd"))
                      | ((F.col("_xd") == F.col("_yd"))
                         & (F.col("_x") < F.col("_y")))))
    tri = wedges.join(
        o.select(F.col("_u").alias("_x"), F.col("_v").alias("_y")),
        on=["_x", "_y"], how="leftsemi")
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    nt = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return nn.crossJoin(ne).crossJoin(nt)
