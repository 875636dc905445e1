"""Iterative graph analytics on DataFrames — PageRank.

The iterative shape on Spark mirrors operators/similarity.py::kmeans_assign:
each round is one equi-join (rank x edges on src) + one keyed aggregation
(contributions by dst), i.e. a single shuffle per iteration on the vertex
id — the canonical distributed PageRank step (same dataflow Pregel/GraphX
lower to, declared here with DataFrame ops so Catalyst/AQE handle skew and
partitioning).

Determinism discipline: the default per-vertex fold is QUANTIZED
fixed-point accumulation — each edge contribution ``c = r/deg`` (a
double that is IEEE-identical in any engine) is quantized to
``floor(c * 2^50)`` and summed as int64.  Integer addition is exact and
order-independent, so the fold is simultaneously (a) bit-deterministic
across engines, partitionings, and retries, and (b) a plain map-side-
combinable ``sum()`` — no per-dst ``collect_list`` array, no per-group
sort, no in-degree bound on task memory.  The ``2^-50`` quantization
step costs ≤ ``in_degree * 2^-50`` absolute error per vertex per
iteration (~1e-11 even at millions of in-edges) — far below any useful
rank resolution, and the SAME value everywhere, so it is error in the
metric, never disagreement between engines.  ``fold="plain"`` drops the
quantization (pure double sum, order-dependent last-ulp noise;
tested equivalent to ~1e-12); ``fold="sorted"`` is the legacy
oracle path (``array_sort(collect_list(...))`` + ``aggregate``,
matching ``array_agg(... ORDER BY src)`` + ``list_reduce`` SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.operators.caching import barrier

DAMPING = 0.85

# Fixed-point quantum for fold="quantized": exactly representable as a
# double (power of two), so c * QUANT_SCALE and s / QUANT_SCALE are
# single IEEE operations with identical results in every engine.
# Headroom: per-dst quantized sums are bounded by the total rank mass,
# Σ floor(c·2^50) ≤ 2^50 ≪ int64 max, at ANY graph size.
QUANT_SCALE = float(2**50)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 2,
    damping: float = DAMPING,
    dangling: str = "error",
    fold: str = "quantized",
    salt: int | None = None,
) -> DataFrame:
    """``iters`` rounds of PageRank over directed ``edges``.

    ``salt`` is the HUB-SKEW guard: the per-iteration ``edges ⋈ rank``
    join fans out by out-degree, and a celebrity vertex (10⁶ out-edges)
    lands its whole fan-out in ONE join task.  AQE's skew split does
    NOT cover this shape — measured on Spark 4.1.2, OptimizeSkewedJoin
    only engages when the join feeds the result stage directly, and
    here a keyed aggregation (the rank fold) always follows
    (tests/test_graph.py::test_pagerank_salted_join_bounds_hub_tasks).
    With ``salt=S``, edges carry ``pmod(xxhash64(dst), S)`` and the
    vertex-side (rank ⋈ degree) table is replicated S× so the join key
    becomes (src, salt): every hub's fan-out spreads over S tasks,
    bounding per-task rows at out_degree/S.  Cost: an S× bigger
    vertex-side shuffle — pay it when the degree distribution demands
    it, skip it otherwise (default None keeps the 1× plan).  Results
    are BIT-IDENTICAL either way under the default quantized fold
    (order-free integer sums), which is what makes the knob safe to
    flip per-corpus.

    Dangling vertices (out-degree 0, e.g. a pure sink) would silently
    LEAK rank mass — they receive rank but contribute nothing back, so
    ranks stop summing to ~1.  The docstring contract is therefore
    enforced in code, selected by ``dangling``:

    - ``"error"`` (default): one cheap control-plane aggregate (dst
      anti-join src, count) raises ``ValueError`` if any vertex has
      out-degree 0 — callers that guarantee out-degree >= 1 by
      construction (e.g. both directions of an undirected graph, as
      plans/graph_queries.py::supplier_pagerank does) pay one tiny job
      and keep exact deterministic ranks.
    - ``"redistribute"``: per iteration, the rank mass sitting on
      dangling vertices is summed (one scalar broadcast, exact decimal
      so the oracle could mirror it) and redistributed uniformly — the
      standard random-surfer completion; ranks again sum to ~1.

    ``fold`` selects the contribution-sum strategy (module docstring):
    ``"quantized"`` (default — deterministic AND map-side combinable),
    ``"plain"`` (pure double sum), ``"sorted"`` (legacy per-dst sorted
    array fold; in-degree bounds task memory — oracle use only).

    Returns (node, r) with ``r`` the raw rank (sums to ~1).
    """
    if dangling not in ("error", "redistribute"):
        raise ValueError(f"dangling must be error|redistribute: {dangling!r}")
    if fold not in ("quantized", "plain", "sorted"):
        raise ValueError(f"fold must be quantized|plain|sorted: {fold!r}")
    edges, deg, nodes, sinks, n_df = _pagerank_setup(
        edges, src_col, dst_col, dangling
    )
    rank = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(iters):
        rank = _pagerank_round(
            rank, edges, deg, nodes, sinks, n_df, damping, dangling, fold, salt
        )
    return rank


def _pagerank_setup(edges, src_col, dst_col, dangling):
    """Loop-invariant PageRank structure: the corpus-sized edge list is
    persisted ONCE (the GraphX-style lineage cut — without the barrier
    each round re-runs the distinct shuffle from scratch), and the
    VERTEX-sized tables (deg, nodes) are cut with an eager
    ``localCheckpoint`` (r14): they are referenced by every iteration
    AND by the dangling probe / n scalar, and a persist only caches
    execution — the logical plan re-included their full derivation at
    every reference, compounding to a 218 KB / 407-Exchange physical
    plan for a 2-round PageRank (~2.9 s of driver analysis per run,
    plans/r14/supplier_pagerank_before.txt).  Checkpointing the |V|-row
    tables truncates them to plan leaves at vertex-table cost (the same
    trade k_core_with_rounds and pagerank_converged already make per
    round); the edge list stays a persist, referenced linearly."""
    edges = barrier(
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).distinct()
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sinks = nodes.join(
        deg.withColumnRenamed("src", "node"), "node", "left_anti"
    )
    if dangling == "error":
        n_dangling = sinks.count()
        if n_dangling:
            raise ValueError(
                f"pagerank: {n_dangling} dangling vertex(es) (out-degree "
                "0) would leak rank mass; add reverse edges or call with "
                "dangling='redistribute'"
            )
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))
    return edges, deg, nodes, sinks, n_df


def _pagerank_round(
    rank, edges, deg, nodes, sinks, n_df, damping, dangling, fold, salt
):
    """ONE damped PageRank round — the loop body shared verbatim by the
    fixed-``iters`` mode and :func:`pagerank_converged`.

    Pre-join the two VERTEX-sized tables (rank, degree) before
    touching the edge list: the corpus-sized join then happens
    exactly once per iteration, and — because nothing downstream
    of it requires src partitioning (the fold shuffles on dst) —
    AQE's skew split is free to break a celebrity vertex's hub
    partition into chunks (tests/test_graph.py hub-skew fixture).
    The old edges⋈rank⋈deg chain pinned src partitioning across
    two joins, which vetoed the split exactly where it mattered."""
    rd = rank.withColumnRenamed("node", "src").join(deg, "src")
    if salt:
        rd_s = rd.withColumn(
            "salt",
            F.explode(F.sequence(F.lit(0), F.lit(salt - 1))),
        )
        e_s = edges.withColumn(
            "salt",
            F.pmod(F.xxhash64("dst"), F.lit(salt)).cast("int"),
        )
        contrib = e_s.join(rd_s, ["src", "salt"]).select(
            "dst", "src", (F.col("r") / F.col("deg")).alias("c")
        )
    else:
        contrib = edges.join(rd, "src").select(
            "dst", "src", (F.col("r") / F.col("deg")).alias("c")
        )
    if fold == "quantized":
        # fixed-point fold: floor(c·2^50) is IEEE-identical in every
        # engine, and int64 addition is exact & order-independent —
        # deterministic AND a plain map-side-partial sum (no per-dst
        # array).  sum ≤ 2^50 ≪ int64 max at any scale.
        summed = contrib.groupBy("dst").agg(
            (
                F.sum(F.floor(F.col("c") * F.lit(QUANT_SCALE))).cast(
                    "double"
                )
                / F.lit(QUANT_SCALE)
            ).alias("s")
        )
    elif fold == "sorted":
        # legacy oracle path: sorted fold, bit-identical to the
        # unrolled SQL's array_agg(... ORDER BY src) + list_reduce
        summed = contrib.groupBy("dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "c"))),
                F.lit(0.0),
                lambda acc, s: acc + s["c"],
            ).alias("s")
        )
    else:
        # plain map-side-partial double sum — PageRank tolerates
        # last-ulp summation-order noise
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
    if dangling == "redistribute":
        sink_ranks = rank.join(sinks, "node", "left_semi")
        if fold == "quantized":
            # same fixed-point trick on the leak scalar: exact,
            # order-independent, no collect_list over the sink set
            leak = sink_ranks.agg(
                (
                    F.coalesce(
                        F.sum(
                            F.floor(F.col("r") * F.lit(QUANT_SCALE))
                        ),
                        F.lit(0),
                    ).cast("double")
                    / F.lit(QUANT_SCALE)
                ).alias("leak")
            )
        elif fold == "sorted":
            # legacy oracle path: the leak scalar is a SORTED fold
            # over (node, r) — bit-identical to the oracle's
            # array_agg(r ORDER BY node) + list_reduce
            leak = sink_ranks.agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("node", "r"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["r"],
                ).alias("leak")
            )
        else:
            leak = sink_ranks.agg(
                F.coalesce(F.sum("r"), F.lit(0.0)).alias("leak")
            )
        rank = (
            nodes.join(
                summed.withColumnRenamed("dst", "node"), "node", "left"
            )
            .crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(leak))
            .select(
                "node",
                (
                    F.lit(1 - damping) / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce("s", F.lit(0.0))
                        + F.col("leak") / F.col("n")
                    )
                ).alias("r"),
            )
        )
    else:
        rank = (
            nodes.join(
                summed.withColumnRenamed("dst", "node"), "node", "left"
            )
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (
                    F.lit(1 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce("s", F.lit(0.0))
                ).alias("r"),
            )
        )
    return rank


def pagerank_converged(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float = 1e-6,
    max_rounds: int = 40,
    damping: float = DAMPING,
    dangling: str = "error",
    fold: str = "quantized",
    salt: int | None = None,
    probe_every: int = 1,
) -> tuple[DataFrame, int]:
    """PageRank iterated to CONVERGENCE — the production fixpoint mode
    matching :func:`k_core_with_rounds`: run :func:`_pagerank_round`
    until the L1 rank delta ``Σ|r_t − r_{t−1}|`` drops to ``tol``, with
    a loud ``max_rounds`` guard instead of silent truncation.

    ``probe_every`` amortizes the gate cost (r10 verdict: 17 rounds x
    (checkpoint + probe) = ~34 driver-synchronous barriers to rank a
    25-node fixture): the L1 delta is evaluated only every
    ``probe_every``-th round (and at ``max_rounds``), so unprobed
    rounds pay exactly one action — the per-round eager
    ``localCheckpoint``, which MUST stay unconditional (measured both
    ways: plan depth >1 between cuts re-inflates analysis enough to
    cost more than the skipped probes save, and depth ~40 OOMs the
    driver outright).  The exit stays deterministic: the loop exits at
    the first PROBED round whose delta ≤ tol, a pure function of the
    graph and ``probe_every`` (damped PageRank contracts in L1, so a
    probed round past the true fixpoint still satisfies the
    tolerance), at most ``probe_every − 1`` rounds past the true
    fixpoint.  The returned round count is that probed round — the
    unrolled-oracle depth that reproduces the returned ranks exactly.

    Returns ``(rank, rounds)`` — rounds is how many damped rounds ran,
    i.e. the unrolled-oracle depth that reproduces these exact ranks
    (registry queries gated against a fixed-depth CTE oracle assert it,
    the trade_k_core_converged discipline).

    Determinism of the EXIT, not just the ranks: under the default
    quantized fold the ranks are bit-identical cross-engine, and the
    delta probe is the same fixed-point trick — one exact
    order-independent int64 sum of ``floor(|Δr|·2^50)`` per round (a
    scalar control-plane probe, not data movement) — so the round count
    is a pure function of the graph, never of partitioning or
    summation order.

    Lineage discipline — STRONGER than a persist barrier here: a
    convergence loop can legitimately run dozens of rounds, and persist
    caches data but leaves the LOGICAL plan growing round over round,
    so Catalyst re-analyzes an ever-deeper tree each iteration and the
    driver heap dies long before the data does (measured: OOM at
    default heap near round ~40 on a 25-node fixture with per-round
    persist; the knn_ivfpq train-lineage lesson).  Each round is
    therefore cut with an eager ``localCheckpoint`` — constant plan
    depth, one materialization per round (the delta probe needs the
    data anyway); a dropped round's blocks are reclaimed by Spark's
    ContextCleaner once unreferenced.  The loop-invariant setup
    barriers are released on BOTH exits (the k_core_with_rounds rule,
    r9 ADVICE): the returned rank is its own checkpoint, so nothing
    this call persisted outlives it.
    """
    if dangling not in ("error", "redistribute"):
        raise ValueError(f"dangling must be error|redistribute: {dangling!r}")
    if fold not in ("quantized", "plain", "sorted"):
        raise ValueError(f"fold must be quantized|plain|sorted: {fold!r}")
    if not 1 <= probe_every <= 4:
        raise ValueError(
            f"probe_every must be in 1..4 (it bounds how far past the "
            f"true fixpoint the exit can land): {probe_every}"
        )
    edges, deg, nodes, sinks, n_df = _pagerank_setup(
        edges, src_col, dst_col, dangling
    )
    # deg/nodes are localCheckpoint leaves since r14 (ContextCleaner
    # reclaims them); only the persisted edge list needs releasing
    setup_barriers = (edges,)

    def _release_setup() -> None:
        for b in setup_barriers:
            b.unpersist(blocking=False)

    rank = (
        nodes.crossJoin(F.broadcast(n_df))
        .select("node", (F.lit(1.0) / F.col("n")).alias("r"))
        .localCheckpoint(eager=True)
    )
    tol_q = int(tol * QUANT_SCALE)
    delta_q = None
    for rnd in range(1, max_rounds + 1):
        nxt = _pagerank_round(
            rank, edges, deg, nodes, sinks, n_df, damping, dangling,
            fold, salt,
        ).localCheckpoint(eager=True)
        if rnd % probe_every and rnd != max_rounds:
            rank = nxt  # unprobed round: lineage cut only, no delta action
            continue
        # exact L1 delta vs the previous round: int64 sum of
        # floor(|Δr|·2^50) — order-free, so the convergence round is
        # deterministic cross-engine; one scalar control-plane probe
        # per probed round, not data movement
        delta_q = nxt.join(
            rank.select("node", F.col("r").alias("r_prev")), "node"
        ).agg(
            F.coalesce(
                F.sum(
                    F.floor(
                        F.abs(F.col("r") - F.col("r_prev"))
                        * F.lit(QUANT_SCALE)
                    )
                ),
                F.lit(0),
            ).alias("dq")
        ).first()["dq"]
        rank = nxt
        if delta_q <= tol_q:
            _release_setup()
            return rank, rnd
    _release_setup()
    raise RuntimeError(
        f"pagerank_converged: L1 delta {delta_q / QUANT_SCALE:.3g} still "
        f"above tol={tol} after max_rounds={max_rounds} damped rounds; "
        "raise max_rounds or loosen tol — rounds are early-exit, so a "
        "generous bound only costs work when needed"
    )


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """:func:`k_core_with_rounds` without the round count — see there
    for the algorithm, contracts, and cache discipline."""
    core, _rounds = k_core_with_rounds(
        edges, k, src_col, dst_col, max_rounds
    )
    return core


def k_core_with_rounds(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
) -> tuple[DataFrame, int]:
    """Peel-until-STABLE k-core over a SYMMETRIC (doubled) edge list —
    the production fixpoint mode the fixed-round registry query
    (plans/graph_queries.py::trade_k_core) documents: drop every vertex
    with degree < k, re-filter edges to surviving endpoints, repeat
    until one full round removes nothing.

    Input contract: ``edges`` carries BOTH orientations of every
    undirected edge (the doubled list trade_k_core builds), so
    degree(v) = count of ``src_col = v`` rows.  Returns
    ``(core, shrinking_rounds)``: the surviving symmetric edge list
    with the input column names, plus how many rounds removed at least
    one edge — i.e. the MINIMAL unrolled-oracle depth that reproduces
    the fixpoint, which registry queries gated against a fixed-depth
    CTE oracle use to fail LOUDLY (named error, not a bare hash
    mismatch) if the data ever needs a deeper peel than the oracle
    expresses (r9 ADVICE).

    Convergence discipline (matches connected_components,
    operators/dedup.py): the peel is monotone — the edge set only
    shrinks — so one scalar ``count()`` per round (a control-plane
    probe, not data movement) detects the fixpoint exactly; rounds are
    early-exit, and the loud ``max_rounds`` guard turns a
    never-converging loop into an error instead of silent truncation.
    Each round's plan is the unrolled query's plan verbatim: one
    map-side-combinable degree aggregation + two semi-joins.

    Lineage discipline — eager ``localCheckpoint`` per round, NOT a
    persist barrier (r10 measurement): each round references the
    previous edge list three times (degree + two semi-join probes), and
    persist only cuts EXECUTION — the logical plan still grows
    3^rounds, so Catalyst re-ANALYZES an exponentially deeper tree each
    round (measured: the 5-round fixture peel spent ~6 s/round on
    analysis alone, 30 s warm for a 25-node graph; the same defect
    class that OOMs pagerank_converged at depth ~40).  The checkpoint
    truncates the plan to a scan per round, its materialization doubles
    as the probe's input, blocks are ContextCleaner-reclaimed once a
    round's reference drops, and NOTHING this call persists outlives it
    (r9 ADVICE — no stranded executor storage on either exit path).
    """
    cur = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    n_prev = cur.count()
    for rnd in range(max_rounds):
        keep = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        nxt = (
            cur.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
        ).localCheckpoint(eager=True)
        n = nxt.count()
        cur = nxt
        if n == n_prev:
            return (
                cur.select(
                    F.col("src").alias(src_col),
                    F.col("dst").alias(dst_col),
                ),
                rnd,
            )
        n_prev = n
    raise RuntimeError(
        f"k_core did not converge within max_rounds={max_rounds} (edge "
        "set still shrinking); raise `max_rounds` — rounds are "
        "early-exit, so a generous bound only costs work when needed"
    )


def triangle_counts(edges: DataFrame, u_col: str = "u", v_col: str = "v") -> DataFrame:
    """Per-vertex triangle participation counts over an undirected graph
    given as canonical edges (``u < v``, deduplicated by the caller).

    Algorithm: degree-ordered enumeration (Latapy's compact-forward /
    the MapReduce formulation of Suri & Vassilvitskii's "Counting
    Triangles and the Curse of the Last Reducer").  Every edge is
    oriented from its lower-rank endpoint to its higher-rank endpoint
    under the total order ``(degree, vertex_id)``; a triangle is then
    counted exactly once as a wedge ``x→y, x→z`` (with rank(y) <
    rank(z)) closed by the oriented edge ``y→z``.

    Why the orientation matters at 100 TB: with arbitrary orientation a
    celebrity vertex of degree d yields O(d²) wedges in one task — the
    "curse of the last reducer".  Ordering by degree bounds every
    out-degree by O(√m), so total closure work is O(m^{3/2}) and no
    single key dominates.

    Physical strategy: neighborhood INTERSECTION, not wedge
    materialization.  A wedge-join formulation (x→y ⋈ x→z, closed by
    y→z) materializes and SHUFFLES every wedge — O(m^{3/2}) rows
    through the exchange (41M rows for the 1.2M-edge basket graph at
    sf0.1, ~20 GB of shuffle at 100× that).  Instead we build each
    vertex's oriented out-neighbor array (size ≤ O(√m) by the
    orientation bound, so per-row state is bounded), join each oriented
    edge (a, b) to the two endpoint arrays — two equi-joins of the edge
    table against a |V|-row array table, which AQE broadcasts when
    small — and compute ``array_intersect(N⁺(a), N⁺(b))`` inside
    whole-stage codegen.  Each triangle {x, y, z} (ranks x<y<z) is
    found exactly once, at edge (x, y), as z ∈ N⁺(x)∩N⁺(y); the only
    rows that ever hit an exchange after the adjacency build are the
    per-edge count contributions (3 per triangle, pre-aggregated
    map-side).  The output is orientation-invariant — the oracle may
    enumerate ``a<b<c`` directly.

    Returns (node, n_triangles) for vertices in >= 1 triangle.
    """
    e = barrier(
        edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
    )
    # one scan of the persisted edge list (explode both endpoints)
    # instead of a two-scan union feeding the degree shuffle
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    u_first = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    oriented = barrier(
        with_deg.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        )
    )
    adj = barrier(
        oriented.groupBy("lo").agg(F.collect_list("hi").alias("nbrs"))
    )
    closures = (
        oriented.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
        .join(adj.select(F.col("lo").alias("a"), F.col("nbrs").alias("na")), "a")
        .join(adj.select(F.col("lo").alias("b"), F.col("nbrs").alias("nb")), "b")
        .select(
            "a", "b", F.array_intersect(F.col("na"), F.col("nb")).alias("cs")
        )
        .filter(F.size("cs") > 0)
    )
    closures = barrier(closures)
    counts = (
        closures.select(F.col("a").alias("node"), F.size("cs").alias("cnt"))
        .unionAll(
            closures.select(F.col("b").alias("node"), F.size("cs").alias("cnt"))
        )
        .unionAll(
            closures.select(
                F.explode("cs").alias("node"), F.lit(1).alias("cnt")
            )
        )
    )
    return counts.groupBy("node").agg(F.sum("cnt").alias("n_triangles"))
