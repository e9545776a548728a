"""Iterative graph analytics over relational edge lists.

Companion to the min-label connected-components loop in
``operators/dedup.py`` (the cluster-collapse step of near-dup dedup):
this module holds general graph measures computed the same Spark-native
way — the graph is a plain (src, dst) DataFrame, every iteration is one
hash join plus one partially-aggregated groupBy on the node key, and
``localCheckpoint`` truncates lineage so a 20-round loop doesn't build a
20-deep plan.  No GraphX/RDDs: the edge list at 100 TB is just another
shuffled table, and Catalyst handles the join strategy per round.

Determinism contract (shared with the engine's other float reducers):
per-node contributions are rounded then summed as exact decimals, so
rank vectors are bit-identical across engines and partitionings — a SQL
oracle can replay the whole power iteration as unrolled CTE stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataengineer_spark.tuning import lineage_cut, tie_lifetime, transient_persist


def _session_width(spark) -> int:
    """Parallelism the session is configured for: max(defaultParallelism,
    shuffle partitions).  The conf parse is defensive — platforms can set
    spark.sql.shuffle.partitions to a non-numeric value (e.g. 'auto'
    under some AQE distributions), and a ValueError at plan-build time
    would crash the whole query (ADVICE r10)."""
    sc = spark.sparkContext
    raw = spark.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        conf_width = int(raw)
    except (TypeError, ValueError):
        conf_width = sc.defaultParallelism
    return max(sc.defaultParallelism, conf_width)


def _lake_width(df: DataFrame) -> int:
    """Jobless scan-width signal for a frame read from a lake: the
    distinct input file count, from the plan's FileIndex METADATA — no
    Spark job runs (unlike an `.rdd.getNumPartitions()` probe, which
    plans and executes the physical scan).  Under the engine's lake
    contract (compaction targets 128 MB files) file count ≈ scan split
    count, so `max(session_width, lake_width)` keeps a corpus-sized
    frame's parallelism from collapsing to a small session conf.
    Purely in-memory/derived frames report no files → 0 (callers fall
    back to the session width via the max)."""
    try:
        return len(df.inputFiles())
    except Exception:
        return 0


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
    checkpoint_every: int = 8,
    broadcast_node_limit: int = 1_000_000,
    dangling: str = "leak",
) -> DataFrame:
    """Fixed-iteration PageRank by power iteration on an edge list.

    Per round: each node ships ``rank / out_degree`` along its out-edges
    (the join on ``src`` reuses the degree table's partitioning), and
    every node's new rank is ``(1-d)/N + d * Σ contributions``.  The
    contribution is rounded to 14 digits and summed as DECIMAL(38,14),
    so the Σ is exact and order-independent; the new rank is re-rounded
    to 12 digits — the float sequence is reproducible on any engine and
    any partition count.

    Scale shape: ``iterations`` × (one join of the degree-carrying edge
    table against the rank vector + one hash aggregate on dst + one
    co-partitioned left join back onto the node universe for the
    teleport floor).  The degree-carrying edge table is hash-partitioned
    on ``src`` ONCE at an explicit width and lineage-cut, so every
    round's join reuses those stored blocks and only the
    (node-count-sized) rank vector moves; the width is max(session
    confs, lake file count) — both metadata-only reads, no plan-build
    job (the r10 form's ``.rdd`` partition probe executed the edge
    build to size it; tools/profile_r10_pr.py measured where the edge
    frame's own width is load-bearing).  When the node count — an EXACT control-plane scalar, already
    paid for by the teleport term — is at most ``broadcast_node_limit``
    (~24 MB of (key, rank) rows at the 1 M default), the rank vector is
    explicitly broadcast into that join: round-8 stage profiling showed
    AQE instead planning the round as a shuffle join and then COALESCING
    the ~24 MB contribution exchange to one task (64 MB advisory target),
    so every round ran single-threaded (~1.5 s/round at sf0.1, the whole
    per-iteration wall of VERDICT r7 item 1); the size-guarded broadcast
    keeps each round map-side over the edge blocks.  Past the limit the
    rank vector is genuinely big and the shuffle join against the
    pre-partitioned edges IS the right plan (without the pre-partition
    it would re-shuffle the FULL edge table every round).  A
    teleport-floor variant that fuses the left join into the aggregate
    (union one NULL contribution per node, coalesce the all-NULL
    groups) was measured and REJECTED in round 8 — noop-sink best-of-4:
    13.0 s fused vs 10.5 s join form at sf0.1 on the measurement box —
    an AQE-broadcast tiny left join costs less than widening every
    round's aggregate exchange.  Short runs chain into ONE lazily-planned DAG;
    every ``checkpoint_every`` rounds the rank vector is lineage-cut to
    truncate lineage for long convergence runs (the classic
    Pregel-without-Pregel loop).  The node universe is src ∪ dst, and
    every round's new rank vector is left-joined back onto it (nodes
    receiving no contributions default to ``(1-d)/N``), so source-only
    nodes keep a rank instead of silently vanishing after iteration 1
    and sink-only nodes are ranked too.

    ``dangling`` (VERDICT r10 item 4): with the default ``"leak"``,
    sink nodes (no out-edges) contribute nothing forward and their rank
    mass drains out of the system each round — fine for symmetrized
    (undirected) inputs, which have no sinks, and kept as the default so
    existing result hashes stay pinned.  ``"redistribute"`` implements
    standard PageRank: each round the dangling nodes' total rank is
    spread uniformly, ``rank = (1-d)/N + d*(sum contrib + leak/N)``.  The
    leak is ONE node-bounded semi-join + scalar aggregate per round,
    folded into the lazy plan as a broadcast 1-row cross join (the same
    control-plane pattern as the teleport term — no per-round driver
    job), and its float path is deterministic like the contributions:
    ranks are rounded/14 and summed as DECIMAL(38,14), the scalar
    ``leak/N`` is re-rounded/14 in double, so a SQL oracle replays the
    whole iteration bit-for-bit.

    Output: (node, rank) with rank rounded to 8 digits.
    """
    if dangling not in ("leak", "redistribute"):
        raise ValueError(
            f"pagerank: dangling must be 'leak' or 'redistribute', got "
            f"{dangling!r}"
        )
    # the edge list feeds degree/node prep — cut it once (callers often
    # hand in a derived/self-joined frame that would otherwise be
    # recomputed per consumer); lineage_cut, not a bare persist, so the
    # blocks free on frame GC (the joins.py lesson).  LAZY cuts: the
    # blocks fill inside the jobs that first need them (e under the
    # node-count job, e_deg under round 1) instead of costing two extra
    # build jobs up front
    e = lineage_cut(
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")),
        eager=False,
        serialized=True,  # edge-list-sized: see lineage_cut docstring
    )
    deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
    # full node universe, cut once: rank-vector-sized, the loop's
    # inherent state; the per-round left join co-partitions with the
    # groupBy (or broadcasts, when AQE sees a small node set)
    nodes = lineage_cut(
        e.select(F.col("_src").alias("node"))
        .unionAll(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    # control-plane scalar (node count), same pattern as the engine's
    # other documented driver-side scalars (aggregates.py partition counts)
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty edge list (e.g. an upstream filter dropped everything):
        # empty rank vector, not a driver-side ZeroDivisionError
        return nodes.select(
            "node", F.lit(0.0).alias("rank")
        ).where(F.lit(False))
    base = (1.0 - damping) / n_nodes
    # exact-count-guarded broadcast (see docstring): values identical
    # either way, only the join's physical side assignment changes
    small_ranks = n_nodes <= broadcast_node_limit
    # degree is iteration-invariant: attach it to the edges ONCE,
    # hash-partition on the per-round join key at an EXPLICIT width, and
    # cut lineage.  The explicit count matters because a bare
    # repartition("_src") lets AQE coalesce the stored blocks to a
    # handful of fat partitions (advisory-size targeting) and every
    # round inherits that under-parallelism — the r10 sf0.1 A/B showed
    # pagerank3 2× slower with no pre-partition at all (AQE stored the
    # tiny join output as ~1 block and every round's map stage ran
    # single-task).  The width is max(session confs, lake metadata):
    # a production edge frame's own scan width can dominate the session
    # conf, and halving a corpus-sized frame's parallelism to a conf
    # value would be the real regression — the r10 form measured that
    # with a `.rdd` partition-count probe, which physically plans and
    # EXECUTES the edge build at plan-build time (at sf1 the probe job
    # cost about as much as the repartition it was sizing); the
    # file-count read below is metadata-only (jobless — VERDICT r10
    # nit 2), and under the engine's own lake contract (compaction
    # targets 128 MB files, catalog.compact_batch) file count ≈ scan
    # split count.  Derived in-memory frames report no input files and
    # fall back to the session width.
    n_parts = max(_session_width(e.sparkSession), _lake_width(edges))
    e_deg = lineage_cut(
        e.join(deg, "_src").repartition(n_parts, "_src"),
        eager=False,
        serialized=True,  # edge-list-sized
    )
    redistribute = dangling == "redistribute"
    if redistribute:
        # dangling set = nodes with no out-edges; node-bounded and
        # iteration-invariant, cut once like the node universe
        dang = lineage_cut(nodes.join(deg, nodes["node"] == deg["_src"], "left_anti"))
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n_nodes), 12).alias("rank")
    )
    for i in range(1, iterations + 1):
        rhs = F.broadcast(ranks) if small_ranks else ranks
        contribs = (
            e_deg.join(rhs, F.col("_src") == F.col("node"))
            .select(
                F.col("_dst").alias("node"),
                F.round(F.col("rank") / F.col("_deg"), 14)
                .cast("decimal(38,14)")
                .alias("_c"),
            )
        )
        if redistribute:
            # dangling mass this round: exact decimal sum of rounded
            # ranks over the dangling set, spread as a per-node double
            # scalar — one 1-row frame broadcast-cross-joined into both
            # branches below (no per-round driver job; the whole run
            # stays one lazy DAG)
            leak = ranks.join(dang, "node", "left_semi").agg(
                F.coalesce(
                    F.sum(F.round(F.col("rank"), 14).cast("decimal(38,14)")),
                    F.lit(0).cast("decimal(38,14)"),
                ).alias("_leak")
            )
            lk = F.round(F.col("_leak").cast("double") / n_nodes, 14)
            new_ranks = (
                contribs.groupBy("node")
                .agg(F.sum("_c").alias("_sc"))
                .crossJoin(F.broadcast(leak))
                .select(
                    "node",
                    F.round(
                        base
                        + damping * (F.col("_sc").cast("double") + lk),
                        12,
                    ).alias("rank"),
                )
            )
            floor = F.round(base + damping * lk, 12)
            ranks = (
                nodes.join(
                    F.broadcast(new_ranks) if small_ranks else new_ranks,
                    "node",
                    "left",
                )
                .crossJoin(F.broadcast(leak))
                .select("node", F.coalesce("rank", floor).alias("rank"))
            )
        else:
            new_ranks = contribs.groupBy("node").agg(
                F.round(
                    base + damping * F.sum("_c").cast("double"), 12
                ).alias("rank")
            )
            # keep contribution-less nodes alive at the teleport floor;
            # the new rank vector is node-bounded, so the same
            # exact-count guard broadcasts it — statically, instead of
            # per-round AQE re-plans
            ranks = nodes.join(
                F.broadcast(new_ranks) if small_ranks else new_ranks,
                "node",
                "left",
            ).select(
                "node",
                F.coalesce("rank", F.round(F.lit(base), 12)).alias("rank"),
            )
        if redistribute and i < iterations:
            # the redistribute round references the previous rank vector
            # THREE times (contribs, leak, and the floor's cross join) —
            # uncut, the chained DAG would re-expand prior rounds
            # exponentially (the BFS lesson); a lazy per-round cut keeps
            # each round's vector computed exactly once
            ranks = lineage_cut(ranks, eager=False)
        elif i % checkpoint_every == 0 and i < iterations:
            ranks = lineage_cut(ranks)
    return ranks.select("node", F.round("rank", 8).alias("rank"))


def degree_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node in/out degree in one pass: explode each edge into two

    (node, is_out) rows and hash-aggregate — a single shuffle on the
    node key regardless of direction mix."""
    both = edges.select(
        F.col(src).alias("node"), F.lit(1).alias("out_d"), F.lit(0).alias("in_d")
    ).unionAll(
        edges.select(
            F.col(dst).alias("node"), F.lit(0).alias("out_d"), F.lit(1).alias("in_d")
        )
    )
    return both.groupBy("node").agg(
        F.sum("out_d").alias("out_degree"), F.sum("in_d").alias("in_degree")
    )


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_node_limit: int = 1_000_000,
) -> DataFrame:
    """Global triangle census over a canonical undirected edge list

    (callers pass each edge once as src < dst, deduplicated): the
    EDGE-ITERATOR algorithm over DEGREE-ORDERED forward adjacency
    lists.  Edges are re-oriented low-degree -> high-degree (ties by
    id), defining a total order x ≺ y iff (deg(x), x) < (deg(y), y);
    triangle {x ≺ y ≺ z} is counted exactly once, at its ≺-smallest
    edge (x, y), as a member of adj⁺(x) ∩ adj⁺(y).  Each node's forward
    neighbours are collected once (one hash aggregate, array-valued),
    the lists are attached to both endpoints of every oriented edge,
    and the per-edge intersection size sums to the global count.
    Counts are orientation-invariant — any total order yields the same
    census — so results are bit-identical to the round-10 id-ordered
    form and to the SQL oracle.

    Why degree order (VERDICT r10 item 3): under id order a hub's
    forward list holds nearly its whole neighbourhood, so the probe
    join ships that array once per incident edge — the round-10 sf10
    probe measured the adjacency exchange at ~58 GB for a 120 M-edge
    co-purchase graph (14.85 B wedges).  Degree order caps every
    forward list at O(√m) (the classic arboricity bound: a node keeps
    only neighbours of ≥ its own degree, and only √(2m) nodes have
    degree ≥ √(2m)), which shrinks Σ|adj⁺| bytes shipped per edge and
    bounds the worst per-partition hash-build skew.  The orientation
    itself costs two joins of the edge list against the node-sized
    degree table — map-side cheap next to the probe exchange it trims.

    Why not the wedge-join form ((x,y)⋈(y,z) then semi-check (x,z)):
    its intermediate IS the ordered-wedge set — the round-10 sf10 probe
    measured 14.85 × 10⁹ wedge rows off the 120 M-edge graph, and the
    closing join's sort of that stream overflowed a 48 GB/80 GB local
    node (UnsafeExternalSorter spill -> disk full).  The edge-iterator
    never materialises wedges: the only corpus-sized shuffle carries
    one adjacency array per edge endpoint (~58 GB at that probe before
    degree ordering, no sort anywhere), and the Σ deg² work happens
    inside ``array_intersect`` without ever becoming rows.

    Wedge totals come from the UNDIRECTED degree distribution
    (unchanged by orientation); the global clustering coefficient
    closes on scalars.  All counts integral -> engine-exact;
    coefficient rounds to 6.

    Output: one row (n_nodes, n_edges, n_wedges, n_triangles,
    clustering_coeff).

    The canonical edge list is referenced several times (degree union
    twice, edge count, orientation) and the oriented list twice
    (adjacency build, intersection probe) — callers hand in a derived
    frame (typically a self-join + distinct), so without caches the
    heaviest subtrees execute once per reference (round-10 plan audit:
    25 exchanges, most of them the edge build repeating).  Transient
    persists make each compute-once; lifetimes ride the returned census
    frame.
    """
    e = transient_persist(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    # UNDIRECTED degree: feeds the wedge count AND the orientation (3
    # references) — node-sized, persist once
    deg = transient_persist(
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    counts = deg.agg(
        F.count("*").alias("n_nodes"),
        # d*(d-1) is even, so a right-shift is EXACT integer halving —
        # `/ 2` would detour through a double and lose exactness past
        # 2^53 (hub nodes at 100 TB reach ~1e16 wedges)
        F.shiftright(F.sum(F.col("d") * (F.col("d") - 1)), 1)
        .cast("bigint")
        .alias("n_wedges"),
    )
    n_edges = e.agg(F.count("*").alias("n_edges"))
    # degree-ordered orientation: (a, b) becomes (u, v) with u ≺ v under
    # (deg, id) order.  a < b canonically, so the tie-break keeps (a, b).
    # Join strategy for the node-sized degree sides (round-12, guide
    # §3.1 — the SHUFFLE_HASH hint is preserved through AQE's
    # re-optimization, so "AQE upgrades tiny sides" never actually
    # fired): the exact node count — a driver scalar whose job doubles
    # as the materialization of the deg/e persists every later stage
    # reads — picks an explicit broadcast when the degree table fits
    # (≤ ``broadcast_node_limit`` rows ≈ 16 MB of (node, d)), which
    # makes BOTH orientation joins map-side over the persisted edge
    # blocks instead of shuffling the edge list twice (A/B'd −0.9 s of
    # the 4.0 s census at sf0.1, bit-identical counts).  Past the limit
    # the degree table is genuinely big and the hinted shuffle-hash
    # join IS the right plan (an SMJ would sort the edge list twice).
    n_nodes_exact = deg.count()
    small_deg = n_nodes_exact <= broadcast_node_limit
    da = deg.select(F.col("node").alias("_an"), F.col("d").alias("_da"))
    db = deg.select(F.col("node").alias("_bn"), F.col("d").alias("_db"))
    if small_deg:
        da, db = F.broadcast(da), F.broadcast(db)
    else:
        da, db = da.hint("shuffle_hash"), db.hint("shuffle_hash")
    lo_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    fwd = transient_persist(
        e.join(da, F.col("a") == F.col("_an"))
        .join(db, F.col("b") == F.col("_bn"))
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    # forward adjacency: node -> its ≺-greater neighbours.  Node-COUNT
    # rows but Σ fdeg = m total array entries, i.e. edge-list-sized
    # BYTES (each row carries its full neighbour array) — degree
    # ordering caps any one array at O(√m), bounding the per-partition
    # build skew.  A triangle {x ≺ y ≺ z} appears EXACTLY at edge
    # (x, y): z is a forward neighbour of both x and y, while at
    # (x,z)/(y,z) the third vertex precedes the endpoint and is in
    # neither forward list.
    # shuffle_hash, not sort-merge: the probe side of the second join
    # carries an adjacency array per edge — Σ deg longs, ~58 GB at the
    # r10 sf10 probe — and an SMJ SORTS that stream (measured: 43 GB
    # disk spill, 715 s wall; hinted SHJ streams it sort-free).  The
    # trade: ShuffledHashJoin's build side cannot spill, so the
    # adjacency partition being built must fit executor memory — degree
    # ordering is what keeps hub-skewed partitions from concentrating
    # there (the same no-spill caveat applies to the BFS frontier
    # hint when a level's frontier approaches the node universe).
    adj = fwd.groupBy(F.col("u").alias("node")).agg(
        F.collect_list("v").alias("nbrs")
    ).hint("shuffle_hash")
    empty = F.array().cast(dict(adj.dtypes)["nbrs"])
    tri = (
        # inner join is exact: adj⁺(u) always contains v (the edge
        # itself), so every edge's u-side matches a row
        fwd.join(adj, F.col("u") == adj["node"], "inner")
        .select(F.col("v").alias("_y"), F.col("nbrs").alias("_nx"))
        # v may have NO forward neighbours (≺-maximal in its
        # component) — left join + empty list, intersection 0
        .join(adj, F.col("_y") == adj["node"], "left")
        .select(
            F.size(
                F.array_intersect(F.col("_nx"), F.coalesce("nbrs", empty))
            ).alias("_t")
        )
        # coalesce: an empty edge list must census 0 triangles, not NULL
        .agg(
            F.coalesce(F.sum("_t"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles")
        )
    )
    out = counts.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(tri))
    out = out.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ).otherwise(0.0),
            6,
        ).alias("clustering_coeff"),
    )
    return tie_lifetime(tie_lifetime(tie_lifetime(out, e), deg), fwd)


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 3,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Multi-source BFS: shortest hop distance from any seed node, out to

    ``max_depth`` hops — the reachability / blast-radius primitive.
    Frontier expansion: each round joins the edge list against the
    previous frontier (one shuffle join), anti-joins the visited set so
    a node keeps its FIRST (minimal) level, and unions into the distance
    table.  Every round's frontier is lineage-cut LAZILY: it is
    referenced TWICE (unioned into the distance table AND joined as the
    next frontier), and each round's plan embeds the previous rounds'
    — without the cut the chained DAG re-expands prior frontiers
    exponentially in depth (round-8 audit: the depth-3 plan carried 87
    exchanges; with per-round cuts it is a handful, each frontier
    computed exactly once under the single final job).
    ``checkpoint_every`` additionally cuts the accumulated distance
    table on deep traversals.  All-integer levels → deterministic on
    any engine or partitioning.

    Output: (node, dist) for every node within ``max_depth`` hops of a
    seed (seeds themselves at dist 0).
    """
    # lazy cut: BFS builds one chained DAG with no build-time job (the
    # blocks still materialize once at first action and free on frame GC).
    # Round-12 (§2.4, the pagerank e_deg pattern): hash-partition the
    # stored edge blocks on the per-level join key at an explicit width —
    # localCheckpoint preserves outputPartitioning, so every level's
    # frontier join co-locates against the stored blocks and only the
    # (node-bounded) frontier side shuffles; without it each level
    # re-exchanged the FULL edge list (depth× corpus shuffles).  The
    # explicit width pins parallelism against AQE's advisory-size
    # coalescing of the stored blocks, exactly as in pagerank.
    n_parts = max(_session_width(edges.sparkSession), _lake_width(edges))
    e = lineage_cut(
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .repartition(n_parts, "_src"),
        eager=False,
        serialized=True,  # edge-list-sized
    )
    dist = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct().select(
        "node", F.lit(0).alias("dist")
    )
    frontier = dist
    for depth in range(1, max_depth + 1):
        nxt = lineage_cut(
            bfs_level_plan(e, frontier, dist, depth, src="_src", dst="_dst"),
            eager=False,
        )
        dist = dist.unionByName(nxt)
        frontier = nxt
        if depth % checkpoint_every == 0 and depth < max_depth:
            dist = lineage_cut(dist)
    return dist


def bfs_level_plan(
    edges: DataFrame,
    frontier: DataFrame,
    visited: DataFrame,
    depth: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """ONE frontier-expansion level of ``bfs_distances`` — the loop's
    stable sub-shape, factored out so the plan gate can pin its join
    strategy (VERDICT r10 item 6: the full BFS is loop-built over
    lineage cuts and not pinnable as a whole; this one-level plan is,
    via the oracled ``q_graph_bfs_level``).

    shuffle_hash on the frontier (build) side: the frontier is
    node-bounded while the probe side is the full edge list — an SMJ
    here re-SORTS the edges every level (the r10 sf10 probe planned
    exactly that once the frontier outgrew broadcast: 180 M rows sorted
    per level for a hash lookup's worth of work); AQE still upgrades to
    broadcast when a level's frontier is tiny.  SHJ's build side cannot
    spill, so a frontier approaching the node universe must fit the
    per-partition hash build — node-bounded by construction, same
    caveat as the triangle adjacency hint.  ``frontier`` must expose a
    ``node`` column; ``visited`` holds (node, ...) rows already
    reached (the anti join keeps first/minimal levels)."""
    return (
        edges.join(
            frontier.select("node").hint("shuffle_hash"),
            F.col(src) == F.col("node"),
        )
        .select(F.col(dst).alias("node"))
        .distinct()
        .join(visited, "node", "left_anti")
        .select("node", F.lit(depth).alias("dist"))
    )
