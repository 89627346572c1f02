"""Graph operators: connected components as a public API (SURVEY §2
round-2 addendum).

The propagation engine behind dedup_near generalizes to any graph — this
module exposes it for arbitrary edge lists and node-bucket memberships
(entity resolution, identity stitching, cluster assignment), plus one
registered query over an events-derived co-presence graph.

Scale notes (100 TB): hash-to-min with pointer jumping is the standard
CC-on-Spark shape — per iteration two shuffles of (node, bucket, label)
triples and one small self-join of the label map; iterations are
O(log diameter) and the map is checkpointed between rounds. No GraphX
(RDD-based, no Python API) and no driver-side graph: everything stays a
DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load, table_rows


_PROP_MAX_ITERS = 20

# The "next active user" edge derivation needs lead() over the full
# (event_type, ts, event_id) order — and event_type has FIVE values, so
# the naive window collapses any events table to five single-task sorts
# (the win_range_ntile pathology: 27 of 32 cores idle at the 64× probe).
# Above this row count the sort is split by calendar day and re-linked
# across bucket boundaries (exact same pairs — see _lead_pairs); below
# it the two extra passes cost more than the five small sorts save.
_EDGE_BUCKET_MIN_ROWS = 3_000_000


def _lead_pairs(
    spark: SparkSession, sf_dir: str, bucketed: bool | None = None
) -> DataFrame:
    """(user_id, next_user) consecutive-event pairs within each
    event_type stream, next_user ≠ user_id — the shared core of every
    user-interaction-graph query.

    bucketed=None gates on the parquet footer row count (zero jobs):
    small tables keep the single window; big ones split each stream by
    calendar day, lead() within (event_type, day) in parallel, and
    re-link the boundary by planting one probe row per bucket — the
    next NON-EMPTY bucket's first user, obtained from a lead over the
    tiny per-bucket-firsts frame — sorted after all real rows (probes
    emit no pairs themselves). The pair SET is identical by
    construction: a real row's successor is either inside its bucket
    or the next bucket's first row, which is exactly the probe
    (tests/test_graph.py pins bucketed ≡ plain equality).
    """
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    if bucketed is None:
        bucketed = table_rows(sf_dir, "events") >= _EDGE_BUCKET_MIN_ROWS
    if not bucketed:
        w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        return ev.select(
            "user_id", F.lead("user_id").over(w).alias("next_user")
        ).filter(
            F.col("next_user").isNotNull()
            & (F.col("next_user") != F.col("user_id"))
        )
    base = ev.select(
        "event_type",
        "ts",
        "event_id",
        "user_id",
        F.date_trunc("day", "ts").alias("b"),
    )
    ts_type = dict(base.dtypes)["ts"]
    firsts = base.groupBy("event_type", "b").agg(
        F.min_by("user_id", F.struct("ts", "event_id")).alias("user_id")
    )
    wf = Window.partitionBy("event_type").orderBy("b")
    probes = (
        firsts.select(
            "event_type",
            "b",
            F.lead("user_id").over(wf).alias("user_id"),
        )
        .where(F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.lit(None).cast(ts_type).alias("ts"),
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "b",
            F.lit(1).alias("is_probe"),
        )
    )
    merged = base.withColumn("is_probe", F.lit(0)).unionByName(probes)
    w_in = Window.partitionBy("event_type", "b").orderBy(
        "is_probe", "ts", "event_id"
    )
    return (
        merged.withColumn("next_user", F.lead("user_id").over(w_in))
        .filter(
            (F.col("is_probe") == 0)
            & F.col("next_user").isNotNull()
            & (F.col("next_user") != F.col("user_id"))
        )
        .select("user_id", "next_user")
    )


def user_edges(
    spark: SparkSession,
    sf_dir: str,
    directed: bool = False,
    bucketed: bool | None = None,
) -> DataFrame:
    """Distinct user-interaction edges (see _lead_pairs). Undirected
    edges canonicalize to (a, b) with a < b; directed keep (src, dst)
    order-of-occurrence."""
    pairs = _lead_pairs(spark, sf_dir, bucketed)
    if directed:
        return pairs.select(
            F.col("user_id").alias("src"), F.col("next_user").alias("dst")
        ).distinct()
    return pairs.select(
        F.least("user_id", "next_user").alias("a"),
        F.greatest("user_id", "next_user").alias("b"),
    ).distinct()


def _propagate_min_labels(
    buckets: DataFrame, fixed_iters: int | None = None
) -> DataFrame:
    """Hash-to-min label propagation over a (doc_id, bucket) graph.

    Iterates bucket-min → doc-min passes until the rep map stops
    changing (exact decimal sum of the monotone rep column compared
    across passes — no join needed), capped at _PROP_MAX_ITERS. Reps only decrease,
    so "no row changed" is exact convergence. Each converging iteration
    also pointer-jumps (rep ← rep(rep) — reps are doc_ids, so the map
    composes with itself): min labels travel one graph hop per
    bucket-pass but chain depth HALVES per jump, so convergence is
    O(log diameter) instead of O(diameter) — measured 9 → 5 iterations
    on the sf0.1 verified-dedup graph. Each iteration localCheckpoints
    the new map — at cluster scale that is persist/checkpoint between
    iterations, standard for iterative graph algorithms; a fixed
    iteration count (the old behavior, kept as fixed_iters for tests,
    without jumping) under-converges on deep cluster chains.
    """
    # Convergence witness (r11): reps only DECREASE, so the exact
    # decimal(38,0) sum of the rep column strictly decreases until the
    # fixpoint — one aggregate over the already-checkpointed map replaces
    # the former changed-rows join (new map ⋈ prev map + count), saving a
    # join and its two exchanges every pass.
    rep_sum = F.sum(F.col("rep").cast("decimal(38,0)")).alias("s")
    # No initial-sum job: None never equals a Decimal, so pass 1 always
    # proceeds — the only cost is one redundant pass when the input had
    # zero non-singleton components, vs one saved aggregate job on
    # every real run.
    prev_sum = None
    doc_rep = None
    for _ in range(fixed_iters if fixed_iters is not None else _PROP_MAX_ITERS):
        if doc_rep is None:
            # Pass 1 fused with init (r12): with rep₀ = doc_id the
            # first bucket-min is just min(doc_id) per bucket, so the
            # former identity join of the freshly-initialized map (and
            # the map's own eager checkpoint action) is skipped.
            bucket_rep = buckets.groupBy("bucket").agg(
                F.min("doc_id").alias("brep")
            )
        else:
            bucket_rep = (
                buckets.join(doc_rep, "doc_id")
                .groupBy("bucket")
                .agg(F.min("rep").alias("brep"))
            )
        half = (
            buckets.join(bucket_rep, "bucket")
            .groupBy("doc_id")
            .agg(F.min("brep").alias("rep"))
        )
        if fixed_iters is None:
            # Truncate BEFORE the pointer-jump self-join: the two join
            # sides shuffle on DIFFERENT keys (rep vs doc_id), so no
            # exchange reuse applies and an un-checkpointed `half` is
            # re-derived — both bucket joins and both aggregates run
            # TWICE per pass (measured r11: ~2× the iteration compute).
            half = half.localCheckpoint(eager=False)
            lookup = half.select(
                F.col("doc_id").alias("rep"), F.col("rep").alias("rep2")
            )
            half = half.join(lookup, "rep", "left").select(
                "doc_id", F.coalesce("rep2", "rep").alias("rep")
            )
        # LAZY checkpoint: the convergence aggregate below is the action
        # that materializes it. Per-iteration lineage truncation itself
        # is non-negotiable here: the pointer-jump self-join doubles the
        # plan each pass without it.
        doc_rep = half.localCheckpoint(eager=False)
        if fixed_iters is None:
            s = doc_rep.agg(rep_sum).collect()[0]["s"]
            # s is None only under non-ANSI decimal(38,0) overflow
            # (~1e19 rows); two consecutive Nones must NOT read as
            # converged (ADVICE r11) — keep iterating to the cap.
            if s is not None and s == prev_sum:
                break
            prev_sum = s
    if doc_rep is None:  # fixed_iters=0: the init map, as before
        doc_rep = buckets.groupBy("doc_id").agg(
            F.min("doc_id").alias("rep")
        )
    return doc_rep


def _propagate_min_labels_over_edges(edges: DataFrame) -> DataFrame:
    """Hash-to-min over an undirected (src, dst) edge list — the
    edge-direct twin of _propagate_min_labels for inputs that are
    ALREADY pair edges (verified near-dup pairs, generic edge lists).

    The bucket engine models a pair as a 2-member bucket, so each pass
    pays doc→bucket→doc: two joins + two aggregates (~6 exchanges) and
    a concat-string bucket key. A pair bucket's min is just the two
    endpoints' min, so the same per-pass operator collapses to ONE
    neighbor join + one aggregate over long keys (~3 exchanges), with
    the identical monotone-sum convergence witness and pointer jump —
    the fixpoint (min node id per component) is unchanged. Self-loops
    carry singletons. Init fuses pass 1: rep₀(d) = min(d, neighbors) is
    exactly what the first bucket pass produced from rep = id.
    """
    sym = (
        edges.select(F.col("src").alias("doc_id"), F.col("dst").alias("nbr"))
        .union(
            edges.select(
                F.col("dst").alias("doc_id"), F.col("src").alias("nbr")
            )
        )
        .localCheckpoint()
    )
    doc_rep = (
        sym.groupBy("doc_id")
        .agg(F.min("nbr").alias("m"))
        .select("doc_id", F.least("m", "doc_id").alias("rep"))
        .localCheckpoint()
    )
    rep_sum = F.sum(F.col("rep").cast("decimal(38,0)")).alias("s")
    prev_sum = None
    for _ in range(_PROP_MAX_ITERS):
        msgs = sym.join(
            doc_rep.select(F.col("doc_id").alias("nbr"), "rep"), "nbr"
        ).select("doc_id", "rep")
        half = (
            msgs.union(doc_rep.select("doc_id", "rep"))
            .groupBy("doc_id")
            .agg(F.min("rep").alias("rep"))
        )
        # pointer jump (rep ← rep(rep)), lineage truncated first — the
        # self-join's two sides shuffle on different keys, so an
        # un-checkpointed half would re-derive the whole pass twice
        # (the _propagate_min_labels r11 finding).
        half = half.localCheckpoint(eager=False)
        lookup = half.select(
            F.col("doc_id").alias("rep"), F.col("rep").alias("rep2")
        )
        half = half.join(lookup, "rep", "left").select(
            "doc_id", F.coalesce("rep2", "rep").alias("rep")
        )
        doc_rep = half.localCheckpoint(eager=False)
        s = doc_rep.agg(rep_sum).collect()[0]["s"]
        # NULL sum = decimal overflow; never read as converged.
        if s is not None and s == prev_sum:
            break
        prev_sum = s
    return doc_rep


def connected_components_from_edges(edges: DataFrame) -> DataFrame:
    """Connected components of an undirected edge list.

    edges: DataFrame with long columns (src, dst). Returns (node,
    component) where component is the minimum node id in the component.
    Isolated self-loops are fine; nodes absent from edges are absent
    from the output (union self-edges first if every node must appear).
    """
    rep = _propagate_min_labels_over_edges(edges)
    return rep.select(
        F.col("doc_id").alias("node"), F.col("rep").alias("component")
    )


def connected_components_from_buckets(memberships: DataFrame) -> DataFrame:
    """Components of a node-bucket bipartite graph: nodes sharing any
    bucket are connected (the LSH-bucket / shared-attribute shape —
    skips pair materialization entirely, so a hot bucket costs O(size),
    not O(size²))."""
    rep = _propagate_min_labels(
        memberships.select(
            F.col("node").alias("doc_id"), "bucket"
        ).localCheckpoint()
    )
    return rep.select(
        F.col("doc_id").alias("node"), F.col("rep").alias("component")
    )


@query("graph_user_components")
def graph_user_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity-stitching demo: users co-present in the same
    (event_type, hour) bucket belong to one component.

    The entity-resolution shape: shared attributes (device id, email
    hash, session cookie — here the co-presence bucket) connect
    records; components are the resolved entities. Bucket membership
    feeds propagation directly — hot buckets never materialize pairs.
    Rows-only (iterative); pytest cross-checks against a pure-Python
    union-find on the same memberships.
    """
    ev = load(spark, sf_dir, "events")
    memberships = ev.select(
        F.col("user_id").alias("node"),
        F.concat_ws(
            "#", "event_type", F.date_trunc("hour", "ts").cast("string")
        ).alias("bucket"),
    ).distinct()
    return connected_components_from_buckets(memberships)


_PR_DAMPING = 0.85
_PR_ITERS = 10


def pagerank(
    edges: DataFrame,
    damping: float = _PR_DAMPING,
    iters: int = _PR_ITERS,
) -> DataFrame:
    """PageRank over a directed (src, dst) edge list → (node, rank).

    Power iteration as pure DataFrame ops: each pass is one join of the
    current rank vector to the edge list, one groupBy(dst) to sum
    contributions, plus a one-row aggregate that redistributes dangling
    mass (nodes with no out-edges) — the standard normalized
    formulation, so ranks sum to n at every step (test-asserted). The
    rank map is localCheckpointed per iteration: lineage would double
    per pass otherwise (same discipline as _propagate_min_labels).

    Scale: the per-iteration work is exactly two shuffles — the
    rank-to-edges join (on src) and the contribution sum (on dst).
    Everything static is hoisted out of the loop and checkpointed once:
    out-degree rides ON the edge list (no per-pass deg join) and the
    dangling flag rides ON the rank frame (dangling mass is a column
    scan, not a per-pass anti-join). On a cluster you additionally
    pre-partition the edge list by src so only the rank vector moves.
    Deterministic: fixed iteration count; exact double sums are NOT
    guaranteed order-stable, so ranks are rounded at comparison
    boundaries by the caller (the registered query rounds to 6dp;
    pytest checks vs NumPy power iteration at 1e-9).
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # static loop invariants, materialized once:
    edges_w = edges.join(out_deg, "src").localCheckpoint()  # (src,dst,deg)
    node_flags = nodes.join(
        out_deg.select(F.col("src").alias("node"), F.lit(False).alias("d0")),
        "node",
        "left",
    ).select(
        "node", F.coalesce("d0", F.lit(True)).alias("dangling")
    ).localCheckpoint()
    ranks = node_flags.select("node", F.lit(1.0).alias("rank"), "dangling")
    for _ in range(iters):
        # dangling nodes (no out-edges) spread their rank uniformly —
        # a filtered scan of the rank frame (cheap: `ranks` is a
        # checkpoint scan), broadcast so the whole pass stays ONE action
        # whose jobs overlap (a per-pass collect() was measured SLOWER:
        # it serializes the dangling aggregate against the update).
        dangling = ranks.agg(
            F.coalesce(
                F.sum(F.when(F.col("dangling"), F.col("rank"))), F.lit(0.0)
            ).alias("dmass")
        )
        # Zero-contribution rows from the rank frame ride the SAME
        # aggregate (x + 0.0 is IEEE-exact, so each sum is unchanged),
        # replacing the former node_flags left-join of the contribution
        # table — one join + exchange fewer per pass (r11).
        # max(dangling) re-attaches the flag: exactly one non-null per
        # node (its own base row).
        contribs = edges_w.join(ranks, edges_w.src == ranks.node).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("deg")).alias("c"),
            F.lit(None).cast("boolean").alias("dangling"),
        )
        base = ranks.select("node", F.lit(0.0).alias("c"), "dangling")
        ranks = (
            contribs.unionByName(base)
            .groupBy("node")
            .agg(
                F.sum("c").alias("contrib"),
                F.max("dangling").alias("dangling"),
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (
                        F.col("contrib")
                        + F.col("dmass") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
                "dangling",
            )
            .localCheckpoint()
        )
    return ranks.select("node", "rank")


@query("graph_user_pagerank")
def graph_user_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by PageRank on the directed "next active user"
    graph (user u → user v when v's event directly follows u's within
    the same event_type stream).

    Influence ranking over an interaction graph — the second classic
    iterative-graph op after connected components, sharing its
    per-iteration checkpoint discipline. Rows-only (iterative float
    fixpoint); pytest cross-checks the full rank vector against NumPy
    power iteration on the same edges.
    """
    edges = user_edges(spark, sf_dir, directed=True)
    return (
        pagerank(edges)
        .select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("node"))
        .limit(20)
    )


_EDGE_SQL = """
  SELECT DISTINCT least(user_id, next_user) AS a,
                  greatest(user_id, next_user) AS b
  FROM (
    SELECT user_id,
      lead(user_id) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id) AS next_user
    FROM events
  ) WHERE next_user IS NOT NULL AND next_user <> user_id
"""


def _orient_by_degree(e: DataFrame) -> DataFrame:
    """Reorient the canonical (a < b by id) undirected edge set so every
    edge points from the lower-(degree, id) endpoint to the higher one.

    Triangle counts are orientation-invariant (any total order on the
    vertices counts each triangle exactly once in the wedge closure),
    but the join fan-out is not: under id order the wedge count is
    Σ in(v)·out(v) with no bound on out-degree, while degree-descending
    orientation provably caps out-degree at O(√m) — every out-neighbor
    has degree ≥ yours, and degrees sum to 2m — so the fan-out is
    O(m^1.5) worst case instead of Σ deg². This is the standard
    distributed-triangle orientation (Schank-Wagner / Cohen's
    MapReduce formulation), and it is what keeps a densifying 100×
    graph's wedge stage sub-quadratic.

    One extra degree aggregate + two node-keyed joins over the edge
    list — negligible against the wedge stage it caps.
    """
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ranked = e.join(
        deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a"
    ).join(
        deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b"
    )
    # canonical form guarantees a < b, so equal degrees keep (a, b)
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return ranked.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("a"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("b"),
    )


@query(
    "graph_triangle_count",
    f"""
WITH e AS ({_EDGE_SQL})
SELECT count(*) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.b
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
""",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the undirected user-interaction graph —
    the clustering/community-density primitive (LSCC, clustering
    coefficient, spam-graph detection all start here), and the third
    classic graph op beside connected components and PageRank.

    The degree-oriented wedge-closure formulation: edges canonicalize
    to a < b once, then reorient by (degree, id) rank via
    _orient_by_degree — wedges enumerate only rank-ascending (e1=(a,b)
    ⋈ e2=(b,c) gives rank a < b < c), and a final join probes the
    closing edge (a,c). Each triangle is counted exactly once, no
    division by 6, and the orientation caps out-degrees at O(√m) so
    the wedge fan-out is O(m^1.5) instead of Σ deg² — the fix for the
    one super-linear 64× exponent found in round 7 (id-ordered wedges
    densify quadratically on a fixed vertex set). The oracle keeps the
    id-ordered SQL join: counts are orientation-invariant, so the
    hash check also certifies the orientation's correctness.
    """
    e = user_edges(spark, sf_dir).localCheckpoint()
    # checkpoint: degree agg + orientation joins consume it
    eo = _orient_by_degree(e).localCheckpoint()  # three join consumers
    # Explicit shuffle width on the wedge join: AQE sizes this stage by
    # the ~95k-row edge input and coalesces to ~2 tasks, blind to the
    # wedge fan-out produced INSIDE the stage (same pathology as
    # graph_link_prediction, where the fix measured 6.2 s → 1.2 s).
    # The closing join self-heals: its shuffle reads real wedge bytes.
    n_part = spark.sparkContext.defaultParallelism
    e1 = eo.repartition(n_part, "b").alias("e1")
    e2 = eo.repartition(n_part, "a").alias("e2")
    e3 = eo.alias("e3")
    wedges = e1.join(e2, F.col("e2.a") == F.col("e1.b"))
    closed = wedges.join(
        e3,
        (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


@query("graph_kcore")
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the user-interaction graph: iteratively peel nodes
    with degree < 3 until the fixpoint — the density filter that
    separates a cohesive community from hairball periphery (spam-ring
    and bot-cluster detection run on cores, not raw graphs). The
    k-core is the unique maximal subgraph with min degree ≥ k, so the
    peel order doesn't matter and reruns are deterministic
    (tests/test_graph.py cross-checks against a pure-Python peeler).

    Plan per iteration: one degree aggregate over the current edge
    list + two semi-joins to drop edges touching peeled nodes — all
    keyed on node ids, localCheckpointed so the loop's lineage stays
    flat (the iterative-algorithm discipline shared with
    _propagate_min_labels). Iterations are bounded by the peel depth
    (≤ max degree, in practice a handful); each pass shrinks the edge
    list monotonically. Not SQL-expressible (recursive CTEs are
    append-only; peeling is a shrinking fixpoint) → rows-only check.

    Returns (user_id, core_degree) for members of the 3-core, with
    core_degree the node's degree INSIDE the core.
    """
    k = 3
    edges = user_edges(spark, sf_dir).localCheckpoint()
    # One count action per iteration: this pass's pre-prune edge count
    # IS last pass's post-prune count, so carry it forward instead of
    # re-counting the checkpointed edge list every iteration (r11: one
    # job + one full pass fewer per peel round).
    n_edges = edges.count()
    for _ in range(30):
        deg = (
            edges.select(F.col("a").alias("node"))
            .unionAll(edges.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node").localCheckpoint()
        pruned = (
            edges.join(
                keep.withColumnRenamed("node", "a"), "a", "left_semi"
            )
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        n_pruned = pruned.count()
        edges = pruned
        if n_pruned == n_edges:
            break
        n_edges = n_pruned
    return (
        edges.select(F.col("a").alias("user_id"))
        .unionAll(edges.select(F.col("b").alias("user_id")))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


@query(
    "graph_degree_distribution",
    f"""
WITH e AS ({_EDGE_SQL}),
adj AS (SELECT a AS u FROM e UNION ALL SELECT b FROM e),
deg AS (SELECT u, count(*) AS degree FROM adj GROUP BY 1),
hist AS (SELECT degree, count(*) AS n_nodes FROM deg GROUP BY 1)
SELECT degree,
  CAST(n_nodes AS BIGINT) AS n_nodes,
  round(sum(n_nodes) OVER (ORDER BY degree DESC)
        / CAST(sum(n_nodes) OVER () AS DOUBLE), 6) AS ccdf
FROM hist
""",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram + complementary CDF of the user-interaction
    graph — the first diagnostic on any graph (is it heavy-tailed? is
    there a hub that will blow up wedge joins?), and the measurement
    that justifies the hub caps in graph_link_prediction and
    mine_basket_pairs. Degrees come from one groupBy over the doubled
    edge list; the histogram is a second groupBy over the (tiny)
    per-node frame; the ccdf window runs over the distinct-degree
    frame, which is bounded by max-degree, not node count. ccdf(d) =
    fraction of nodes with degree ≥ d: exact integer cumsums, one
    division.
    """
    from pyspark.sql import Window

    e = user_edges(spark, sf_dir)
    # explode both endpoints from ONE pass over the edge frame — a
    # unionAll of two selects re-derives the whole window+distinct
    # edge pipeline per branch (measured 10.6 s → 8.7 s at the 64×
    # probe; the remaining cost is the shared edge derivation itself)
    adj = e.select(F.explode(F.array("a", "b")).alias("u"))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    wd = Window.orderBy(F.col("degree").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return hist.select(
        "degree",
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.round(
            F.sum("n_nodes").over(wd)
            / F.sum("n_nodes").over(Window.partitionBy()).cast("double"),
            6,
        ).alias("ccdf"),
    )


_MAX_HUB_DEG = 1000


@query(
    "graph_link_prediction",
    f"""
WITH e AS ({_EDGE_SQL}),
adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT u, count(*) AS d FROM adj GROUP BY 1),
cand AS (
  SELECT j1.v AS a, j2.v AS c,
    count(*) AS cn,
    sum(1.0 / ln(db.d)) AS aa
  FROM adj j1
  JOIN adj j2 ON j1.u = j2.u AND j1.v < j2.v
  JOIN deg db ON db.u = j1.u AND db.d <= {_MAX_HUB_DEG}
  GROUP BY 1, 2
),
nonadj AS (
  SELECT cand.a, cand.c, cand.cn, cand.aa
  FROM cand LEFT JOIN e ON e.a = cand.a AND e.b = cand.c
  WHERE e.a IS NULL
)
SELECT n.a AS user_a, n.c AS user_b,
  CAST(n.cn AS BIGINT) AS common_neighbors,
  round(n.cn / CAST(da.d + dc.d - n.cn AS DOUBLE), 6) AS jaccard,
  round(n.aa, 6) AS adamic_adar
FROM nonadj n
JOIN deg da ON da.u = n.a
JOIN deg dc ON dc.u = n.c
ORDER BY n.cn DESC, user_a, user_b
LIMIT 20
""",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the user-interaction graph: for the top-20
    NON-adjacent user pairs by common-neighbor count, the three
    classic scores — common neighbors, Jaccard overlap of
    neighborhoods, Adamic-Adar (Σ 1/ln deg over shared neighbors,
    down-weighting promiscuous hubs) — the "people you may know" /
    entity-resolution candidate generator.

    Scale shape: wedges enumerate through shared centers with an
    explicit hub cap (centers with degree > 1000 are excluded — a hub
    connects everyone-to-everyone, carries no predictive signal, and
    makes the fan-out quadratic; the measured justification lives in
    graph_degree_distribution). Candidate pairs anti-join the edge
    list to keep only genuinely absent links; degree lookups broadcast
    the tiny per-node frame; ranking is integer-keyed (cn, then pair)
    so the top-20 is a bounded heap with no float-order hazard —
    Adamic-Adar's float sum only ever lands in a ROUNDED output
    column.
    """
    e = user_edges(spark, sf_dir).localCheckpoint(
        eager=False
    )  # adj ×2 + anti-join consumer
    adj = e.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    centers = deg.filter(F.col("d") <= _MAX_HUB_DEG)
    # Explicit repartition on the wedge-center key: AQE sizes the join
    # stage by its INPUT bytes (~191k adjacency rows → it coalesces to
    # 2 tasks) and is blind to the d² wedge fan-out computed inside the
    # stage (~12M rows at sf0.1). Forcing the shuffle width keeps the
    # fan-out + partial-agg parallel — measured 6.2 s → 1.2 s warm at
    # sf0.1, and at 100 TB this co-partitioned shuffle join (NOT a
    # broadcast: adjacency of a big graph doesn't fit) is exactly the
    # plan you want.
    n_part = spark.sparkContext.defaultParallelism
    # Hub cap applied BEFORE the wedge fan-out (r10): the former shape
    # enumerated wedges through EVERY center and only then inner-joined
    # the capped-centers frame — correct (hub wedges were discarded)
    # but the d² fan-out of the hubs still materialized into the
    # shuffle: at the 256× probe the uncapped wedge spill exceeded the
    # box's free disk (~69 GB) before the filter ever ran. Spark does
    # not reorder inner joins without CBO stats, so the cap must be
    # written upstream: filter the adjacency to capped centers first —
    # identical output, and the shuffle now carries Σ_{d≤cap} d², which
    # the cap bounds at any scale.
    adjc = adj.join(F.broadcast(centers), "u")
    j1 = adjc.select(
        F.col("u").alias("b_"), F.col("v").alias("a"), "d"
    ).repartition(n_part, "b_")
    j2 = adjc.select(
        F.col("u").alias("b2_"), F.col("v").alias("c")
    ).repartition(n_part, "b2_")
    cand = (
        j1.join(j2, (F.col("b_") == F.col("b2_")) & (F.col("a") < F.col("c")))
        .groupBy("a", "c")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(1.0 / F.log(F.col("d"))).alias("aa"),
        )
    )
    e_pairs = e.select(
        F.col("a").alias("ea"), F.col("b").alias("eb")
    )
    nonadj = cand.join(
        e_pairs,
        (F.col("a") == F.col("ea")) & (F.col("c") == F.col("eb")),
        "left_anti",
    )
    da = deg.select(F.col("u").alias("a"), F.col("d").alias("da"))
    dc = deg.select(F.col("u").alias("c"), F.col("d").alias("dc"))
    return (
        nonadj.join(F.broadcast(da), "a")
        .join(F.broadcast(dc), "c")
        .select(
            F.col("a").alias("user_a"),
            F.col("c").alias("user_b"),
            F.col("cn").cast("long").alias("common_neighbors"),
            F.round(
                F.col("cn")
                / (F.col("da") + F.col("dc") - F.col("cn")).cast("double"),
                6,
            ).alias("jaccard"),
            F.round("aa", 6).alias("adamic_adar"),
        )
        .orderBy(F.col("common_neighbors").desc(), "user_a", "user_b")
        .limit(20)
    )


@query(
    "graph_assortativity",
    f"""
WITH e AS ({_EDGE_SQL}),
adj AS (SELECT a AS u FROM e UNION ALL SELECT b FROM e),
deg AS (SELECT u, count(*) AS d FROM adj GROUP BY 1),
de AS (
  SELECT da.d AS x, db.d AS y
  FROM e JOIN deg da ON da.u = e.a JOIN deg db ON db.u = e.b
  UNION ALL
  SELECT db.d, da.d
  FROM e JOIN deg da ON da.u = e.a JOIN deg db ON db.u = e.b
)
SELECT
  CAST(count(*) / 2 AS BIGINT) AS n_edges,
  round(
    (sum(CAST(x AS DOUBLE) * y) - sum(CAST(x AS DOUBLE)) * sum(CAST(y AS DOUBLE)) / count(*))
    / nullif(sqrt((sum(CAST(x AS DOUBLE) * x) - sum(CAST(x AS DOUBLE)) * sum(CAST(x AS DOUBLE)) / count(*))
           * (sum(CAST(y AS DOUBLE) * y) - sum(CAST(y AS DOUBLE)) * sum(CAST(y AS DOUBLE)) / count(*))), 0),
    6) AS assortativity
FROM de
""",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the user graph: Pearson correlation of
    endpoint degrees over (symmetrized) edges — positive means hubs
    befriend hubs (social nets), negative means hub-and-spoke
    (internet topology); with graph_degree_distribution it completes
    the two-number topology fingerprint that predicts whether wedge
    joins and partition skew will bite at scale. Both directions of
    each edge enter once (the standard undirected convention, and what
    makes Σx = Σy exact). Degree products are exact integers summed as
    doubles (degrees ≤ node count — far inside the 2⁵³ mantissa), so
    both engines add identical values; one division at the end.
    """
    # eager: e feeds 3 concurrent plan branches (both unionAll arms
    # + the ends join); without the checkpoint each re-derives the
    # events scan + window + distinct (10 parquet scans measured),
    # and a LAZY checkpoint would race the concurrent branches onto
    # the same first materialization (the dedup_simhash lesson).
    e = user_edges(spark, sf_dir).localCheckpoint()
    adj = e.select(F.col("a").alias("u")).unionAll(
        e.select(F.col("b").alias("u"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d")).localCheckpoint()
    da = deg.select(F.col("u").alias("a"), F.col("d").alias("dx"))
    db = deg.select(F.col("u").alias("b"), F.col("d").alias("dy"))
    ends = e.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
    de = ends.select(
        F.col("dx").alias("x"), F.col("dy").alias("y")
    ).unionAll(ends.select(F.col("dy").alias("x"), F.col("dx").alias("y")))
    n = F.count(F.lit(1))
    x, y = F.col("x").cast("double"), F.col("y")
    sx, sy = F.sum(x), F.sum(F.col("y").cast("double"))
    sxy = F.sum(x * y)
    sxx = F.sum(x * F.col("x"))
    syy = F.sum(F.col("y").cast("double") * F.col("y"))
    return de.agg(
        (n / 2).cast("long").alias("n_edges"),
        # NULLIF guard: on a degree-regular graph (every endpoint the
        # same degree — the sf0.001 co-presence graph is one) the
        # variance is 0 and assortativity is undefined; both engines
        # must emit NULL, not throw (Spark ANSI) or ±inf.
        F.round(
            (sxy - sx * sy / n)
            / F.nullif(
                F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
                F.lit(0.0),
            ),
            6,
        ).alias("assortativity"),
    )


@query(
    "graph_clustering_coefficient",
    f"""
WITH e AS ({_EDGE_SQL}),
adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT u, count(*) AS d FROM adj GROUP BY 1),
wedges AS (SELECT sum(d * (d - 1) / 2) AS n_wedges FROM deg),
tri AS (
  SELECT count(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT
  CAST(n_triangles AS BIGINT) AS n_triangles,
  CAST(n_wedges AS BIGINT) AS n_wedges,
  round(3.0 * n_triangles / n_wedges, 6) AS global_cc
FROM tri CROSS JOIN wedges
""",
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient: 3·triangles ÷ wedges — the
    single scalar that separates clustered social-style graphs
    (friends of friends are friends) from random ones, composing the
    two primitives this module already proves out
    (graph_triangle_count's ordered wedge closure and the degree
    frame behind graph_degree_distribution).

    Scale shape: the triangle side reuses the degree-oriented closure
    (_orient_by_degree — out-degrees capped at O(√m), fan-out O(m^1.5)
    instead of Σ deg²; the round-7 super-linear exponent fix), reusing
    the SAME degree frame the wedge denominator needs anyway, so the
    orientation is one join, not one extra aggregate. The denominator
    is pure per-node arithmetic on that frame. Both reductions are
    exact integers; the one division is display-rounded. The explicit
    shuffle-width lesson from graph_triangle_count applies to the
    closure join here identically.
    """
    e = user_edges(spark, sf_dir).localCheckpoint(
        eager=False
    )  # wedge join ×2 + closure + degrees
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    # LAZY degree checkpoint + bounded collect of the 1-row wedge
    # total (r10): the collect materializes BOTH the edge and degree
    # checkpoints (deg's plan reads e), so the closure pass below is
    # the only remaining consumer chain — retires the former eager
    # degree job AND the wedge broadcast-build job.
    deg = (
        adj.groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=False)
    )
    n_wedges = (
        deg.agg(
            F.sum(F.col("d") * (F.col("d") - 1) / 2)
            .cast("long")
            .alias("n_wedges")
        ).collect()[0]["n_wedges"]
        or 0
    )
    # Degree-descending orientation off the SAME degree frame the
    # denominator uses (see _orient_by_degree for the O(√m) bound).
    ranked = e.join(
        deg.select(F.col("u").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("u").alias("b"), F.col("d").alias("db")), "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    eo = ranked.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("a"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("b"),
    ).localCheckpoint()
    n_part = spark.sparkContext.defaultParallelism
    e1 = eo.repartition(n_part, "b").alias("e1")
    e2 = eo.repartition(n_part, "a").alias("e2")
    e3 = eo.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return tri.select(
        F.col("n_triangles").cast("long").alias("n_triangles"),
        F.lit(int(n_wedges)).cast("long").alias("n_wedges"),
        F.round(
            3.0 * F.col("n_triangles") / F.lit(int(n_wedges)), 6
        ).alias("global_cc"),
    )


_LPA_ITERS = 8


def label_propagation(edges: DataFrame, iters: int = _LPA_ITERS) -> DataFrame:
    """Deterministic semi-synchronous label propagation (community
    detection): every node repeatedly adopts the most frequent label
    among its neighbors PLUS its own current label, ties broken by the
    smallest label id — the classic Raghavan et al. LPA made
    engine-deterministic by (a) the total tie-break order and (b) a
    FIXED iteration count instead of run-to-convergence (synchronous
    LPA can 2-cycle on bipartite structures; a fixed horizon makes
    reruns bit-identical regardless).

    ``edges`` is an undirected (a, b) frame. Per iteration: one
    symmetric expansion join of the label map onto edge endpoints, one
    (node, label) count aggregate, one per-node arg-max window —
    all hash-partitioned on node id, localCheckpointed so the loop's
    lineage stays flat (the _propagate_min_labels discipline). At
    100 TB each round is two node-keyed shuffles; hub nodes cost their
    degree in count rows, never materialized pairs.

    Returns (node, community) with community = the converged label.
    """
    nbr = (
        edges.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(
            edges.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
        )
        .localCheckpoint()
    )
    labels = (
        nbr.select("node").distinct().withColumn("lbl", F.col("node"))
    ).localCheckpoint()
    for _ in range(iters):
        nbr_lbl = nbr.join(
            labels.withColumnRenamed("node", "nbr"), "nbr"
        ).select("node", "lbl")
        votes = (
            nbr_lbl.unionAll(labels.select("node", "lbl"))
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # max_by over struct(n, -lbl) replaces the former
        # row_number-window + rk=1 filter (r11): the same winner —
        # lexicographic max = highest vote count, ties to the smallest
        # label (labels are node ids ≥ 0, so negation is overflow-safe)
        # — computed as a small per-node aggregate instead of a full
        # per-partition SORT of the vote table every pass.
        labels = (
            votes.groupBy("node")
            .agg(
                F.max_by(
                    "lbl", F.struct(F.col("n"), (-F.col("lbl")).alias("neg"))
                ).alias("lbl")
            )
            .localCheckpoint()
        )
    return labels.select("node", F.col("lbl").alias("community"))


@query("graph_label_propagation")
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the user-interaction graph via
    deterministic LPA — the mesoscale readout between
    graph_user_components (macro: who is connected at all) and
    graph_kcore (micro: who is in the dense center): communities are
    the behavioral clusters marketing/abuse teams actually act on.
    Edges are REPEATED co-presences: consecutive interactions within
    an (event_type, hour) stream, kept only when the pair recurs >= 3
    times — the chance-adjacency floor. Unthresholded, the fixture's
    all-time graph is near-complete and LPA honestly collapses it to
    one community (measured: 1 community = all users at every SF);
    repeated-co-presence edges leave real cluster structure, and the
    threshold is the same signal-vs-noise cut an entity-resolution
    pipeline applies before clustering. Per-community rollup
    (size + min member id as the stable community name) keeps the
    output grain report-sized; fixed 8 iterations =>
    rerun-deterministic (rows-only; tests/test_graph.py cross-checks
    a pure-Python LPA with identical tie-break rules on the same
    edges).
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy(
        "event_type", F.date_trunc("hour", "ts")
    ).orderBy("ts", "event_id")
    edges = (
        ev.select("user_id", F.lead("user_id").over(w).alias("next_user"))
        .filter(
            F.col("next_user").isNotNull()
            & (F.col("next_user") != F.col("user_id"))
        )
        .select(
            F.least("user_id", "next_user").alias("a"),
            F.greatest("user_id", "next_user").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 3)
        .select("a", "b")
    )
    res = label_propagation(edges)
    return (
        res.groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("node").cast("long").alias("min_member"),
        )
        .select(
            F.col("community").cast("long").alias("community"),
            "n_members",
            "min_member",
        )
        .orderBy(F.col("n_members").desc(), F.col("community"))
    )
