"""Similarity search over embedding columns: brute-force cosine top-k,
random-hyperplane LSH ANN, IVF cells with exact centroids, and
embedding-cosine near-dup pairs.

No reference counterpart (the reference corpus has no vector data at all —
SURVEY.md §2.12); these are the beyond-reference similarity operators a
training-data pipeline needs (BASELINE.json north star).  Everything is
built-in Spark SQL higher-order functions — ``zip_with`` + ``aggregate``
for dot products, JVM-side, no Python in the hot path — so every operator
has an exact DuckDB oracle.

Cross-engine exactness rules (the whole design):
- dot products are SEQUENTIAL left folds over ``array<double>`` — Spark
  ``aggregate(zip_with(a, b, *))`` and DuckDB
  ``list_reduce(list_prepend(0.0, list_transform(...)))`` perform the same
  IEEE-754 operations in the same order, so the resulting doubles are
  bit-identical and downstream ranking ties out identically.
- IVF centroids are means computed as exact DECIMAL sums divided by counts
  (see functions/exact.py for why: double summation is order-dependent).
- hyperplanes are small-integer vectors from a fixed LCG, shared verbatim
  with the SQL builders in plans/similarity_queries.py.

Scale shape: the embedding tables here are small (≤2000 rows), but every
plan is written for the 100 TB case — the query set / hyperplanes /
centroids are the broadcast side, the corpus is never collected, and the
only shuffles are the LSH-bucket equi-join and the per-query top-k window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipelines_using_llm_spark.operators.caching import barrier

DIM = 64
N_TABLES = 2
N_PLANES = 8  # per table -> 256 buckets per table
DEFAULT_K = 10

# knn_lsh family: shorter codes + more tables + radius-1 multiprobe.  The
# driver embeddings are near-orthogonal (top-10 neighbors sit barely above
# the cosine noise floor), so a recall>=0.9 candidate set necessarily
# covers a large corpus fraction; these constants hit recall 0.92 at
# sf0.01 with ~60% of the corpus scanned (measured, see
# tests/test_similarity.py::test_lsh_recall_vs_exact).
KNN_TABLES = 8
KNN_PLANES = 6  # per table -> 64 buckets per table
#: probe masks: home bucket + every Hamming-1 neighbor (flip one plane bit)
KNN_PROBE_MASKS: list[int] = [0] + [1 << j for j in range(KNN_PLANES)]


def _lcg_ints(seed: int, n: int, lo: int = -16, hi: int = 16) -> list[int]:
    """Deterministic small ints for hyperplane components (shared with the
    DuckDB oracle builders, so both engines use identical hyperplanes)."""
    x = seed
    out: list[int] = []
    for _ in range(n):
        x = (1103515245 * x + 12345) % (2**31 - 1)
        out.append(lo + x % (hi - lo + 1))
    return out


#: HYPERPLANES[t][j] is the j-th hyperplane of LSH table t (64 ints each).
HYPERPLANES: list[list[list[int]]] = [
    [_lcg_ints(seed=1_000 + t * 100 + j, n=DIM) for j in range(N_PLANES)]
    for t in range(N_TABLES)
]

#: Hyperplanes for the knn_lsh family (same LCG scheme, 8 tables x 6 planes).
KNN_HYPERPLANES: list[list[list[int]]] = [
    [_lcg_ints(seed=1_000 + t * 100 + j, n=DIM) for j in range(KNN_PLANES)]
    for t in range(KNN_TABLES)
]


def to_double(c: str | Column) -> Column:
    """float32 array -> array<double> (all arithmetic happens in double)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def plane_literal(plane: list[int]) -> Column:
    return F.array(*[F.lit(float(v)) for v in plane])


def bucket_from_planes(v: Column, planes: list[list[int]]) -> Column:
    """Random-hyperplane bucket id: bit j set iff dot(v, planes[j]) >= 0.
    Integer hyperplanes keep the sign exact."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        bit = (dot(v, plane_literal(plane)) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, j)
    return bucket


def lsh_bucket(v: Column, table: int) -> Column:
    """Bucket id of pair-blocking LSH ``table`` (2 tables x 8 planes)."""
    return bucket_from_planes(v, HYPERPLANES[table])


def normed(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Project to (vec_id, v: array<double>, nrm) — the shared base of every
    operator below (norm computed once, not per pair)."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        to_double(vec_col).alias("v"),
        norm(to_double(vec_col)).alias("nrm"),
    )


def knn_brute_force(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_mod: int = 100,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact cosine top-k: every vec_id divisible by ``query_mod`` is a
    query; neighbors ranked by cosine desc (id asc tiebreak), self excluded.

    The query side is explicitly broadcast — at 100 TB the corpus streams
    through the executors once, and the only shuffle is the per-query
    top-k window (small: |queries| × |corpus-partition| rows pre-filtered
    to k per partition by the window's rank).
    """
    base = normed(df, id_col, vec_col)
    queries = base.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    scored = F.broadcast(queries).join(
        base, F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


def _bucketed(base: DataFrame) -> DataFrame:
    """(vec_id, v, nrm) -> one row per LSH table with the bucket id."""
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"), lsh_bucket(F.col("v"), t).alias("bucket")
            )
            for t in range(N_TABLES)
        ]
    )
    return base.select(
        "vec_id", "v", "nrm", F.explode(tables).alias("tb")
    ).select("vec_id", "v", "nrm", "tb.tbl", "tb.bucket")


def knn_planes_df(df: DataFrame) -> DataFrame:
    """The 8x6x64 hyperplane matrix as a ONE-ROW DataFrame.

    Shipping the constant as broadcast DATA instead of a literal
    expression keeps ~3000 literal nodes out of the plan — analysis and
    codegen of the signature stage drop from seconds to milliseconds,
    and the optimizer still sees a single tiny broadcast."""
    planes = [
        [[float(v) for v in p] for p in KNN_HYPERPLANES[t]]
        for t in range(KNN_TABLES)
    ]
    return df.sparkSession.createDataFrame(
        [(planes,)], "planes array<array<array<double>>>"
    )


def knn_signatures(v: Column, planes: Column) -> Column:
    """All ``KNN_TABLES`` bucket ids of ``v`` as one ``array<long>``.

    A single nested higher-order function over the planes column rather
    than 48 separate aggregate expressions: the arithmetic
    (sequential-fold dots, exact sign on integer planes) is identical,
    but the expression tree is ~50x smaller.  ``pow(2, j)`` is exact in
    doubles for j < 53, so the bit packing matches the oracle's
    ``1 << j``."""
    return F.transform(
        planes,
        lambda planes_t: F.aggregate(
            F.transform(
                planes_t,
                lambda p, j: (dot(v, p) >= 0).cast("long")
                * F.pow(F.lit(2.0), j).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )


def knn_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_mod: int = 100,
    k: int = DEFAULT_K,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Approximate top-k via multi-probe random-hyperplane LSH
    (8 tables x 6 planes, probe radius 1): candidates = corpus vectors
    whose bucket in some table matches the query's bucket with at most one
    plane bit flipped; exact cosine ranks the candidates.

    Scale shape:

    - the per-vector bucket signature (48 hyperplane dots) is computed
      ONCE behind a persist barrier — Catalyst's projection collapse
      would otherwise re-evaluate it for the query side, the corpus side,
      and the ownership filter (the 50x trap, operators/dedup.py).
    - candidate generation is an equi-join on (table, bucket) with the
      probe side broadcast — work proportional to bucket collisions,
      never |queries| x |corpus|.
    - duplicate candidates (pairs colliding in several tables) are
      eliminated WITHOUT a shuffle: a joined row at table t implies
      ``bit_count(qb[t] XOR xb[t]) <= 1`` (the probe flipped at most one
      bit), so the FIRST such table owns the pair — an 8-branch
      closed-form filter, no per-probe bookkeeping (same
      bucket-ownership trick as simhash blocking).
    - ``min_parallelism`` redistributes a SMALL input before the
      CPU-heavy signature step (a single local parquet file arrives as
      one partition).  Leave ``None`` at scale — a real corpus already
      has many partitions and the repartition would be a full shuffle.
    """
    if min_parallelism is not None:
        df = df.repartition(min_parallelism)
    src = df.crossJoin(F.broadcast(knn_planes_df(df)))
    vd = to_double(vec_col)
    sig = barrier(
        src.select(
            F.col(id_col).alias("vec_id"),
            vd.alias("v"),
            norm(vd).alias("nrm"),
            knn_signatures(vd, F.col("planes")).alias("bkts"),
        )
    )
    corpus = sig.select(
        "vec_id",
        "v",
        "nrm",
        "bkts",
        F.explode(F.array(*[F.lit(t) for t in range(KNN_TABLES)])).alias("tbl"),
    ).withColumn("bucket", F.element_at("bkts", F.col("tbl") + 1))
    probe_list = F.array(
        *[
            F.struct(F.lit(t).alias("tbl"), F.lit(m).alias("mask"))
            for t in range(KNN_TABLES)
            for m in KNN_PROBE_MASKS
        ]
    )
    probes = (
        sig.filter(F.col("vec_id") % query_mod == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
            F.col("bkts").alias("qbkts"),
            F.explode(probe_list).alias("c"),
        )
        .select(
            "query_id",
            "qv",
            "qnrm",
            "qbkts",
            F.col("c.tbl").alias("tbl"),
            F.element_at("qbkts", F.col("c.tbl") + 1)
            .bitwiseXOR(F.col("c.mask"))
            .alias("bucket"),
        )
    )
    # First table where the pair is within probe radius (hamming <= 1)
    # owns it — identical on every joined duplicate of the pair, so
    # `tbl == owner` keeps exactly one row per pair, shuffle-free.
    def _ham(t: int) -> Column:
        return F.bit_count(
            F.element_at(F.col("qbkts"), t + 1).bitwiseXOR(
                F.element_at(F.col("bkts"), t + 1)
            )
        )

    owner = F.least(
        *[
            F.when(_ham(t) <= 1, F.lit(t)).otherwise(F.lit(KNN_TABLES))
            for t in range(KNN_TABLES)
        ]
    )
    cand = (
        F.broadcast(probes)
        .join(corpus, ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .filter(F.col("tbl") == owner)
        .select("query_id", "qv", "qnrm", "vec_id", "v", "nrm")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


def ivf_centroids(base: DataFrame, cell_col: str) -> DataFrame:
    """Per-cell mean vector with ORDER-INDEPENDENT exact arithmetic:
    per-dimension decimal(28,10) sums -> double division, fused into ONE
    ``groupBy(cell)`` exchange of d-column partials (r14: previously a
    posexplode fed TWO exchanges — (cell, pos) sums then the collect_list
    re-assembly — shuffling d rows per vector where one row of d partial
    sums suffices).  The per-dimension arithmetic (cast-then-sum, s / n
    double division, position order) is unchanged, so the cells are
    bit-identical on any partitioning and in the DuckDB oracle.  Assumes
    fixed-dimension (``DIM``) non-null vectors — the embeddings corpus
    contract every caller already relies on."""
    sums = (
        _spread(base)
        .filter(F.col("v").isNotNull())  # NULL vectors: no sum, no count
        .groupBy(F.col(cell_col).alias("cell"))
        .agg(*_mean_aggs(_try_elem("v"), DIM))
    )
    return sums.select("cell", _means_array(DIM).alias("cv")).select(
        "cell", "cv", norm(F.col("cv")).alias("cnrm")
    )


def _normed_with_cell(df: DataFrame, id_col: str, vec_col: str, cell_col: str) -> DataFrame:
    """(vec_id, v, nrm, cell) as ONE projection — r15: previously every
    IVF serve path built this as ``normed(df) ⋈ df[vec_id, cell]``, a
    corpus SELF-join on a unique key whose only effect was re-attaching
    a column the input row already carried.  The projection is
    value-identical (ids are unique, so the join duplicated/dropped
    nothing) and removes one corpus-wide exchange from every serve."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        to_double(vec_col).alias("v"),
        norm(to_double(vec_col)).alias("nrm"),
        F.col(cell_col).alias("cell"),
    )


def knn_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    query_mod: int = 100,
    k: int = DEFAULT_K,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search with a provided coarse partition (``cell_col``): queries
    probe the ``nprobe`` nearest cell centroids, exact cosine within probed
    cells only.  At scale the corpus is hash-partitioned by cell and only
    probed cells are scanned; centroids + queries broadcast."""
    base = _normed_with_cell(df, id_col, vec_col, cell_col)
    cents = ivf_centroids(base, "cell")
    queries = base.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    wprobe = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cell")
    )
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "qv",
            "qnrm",
            "cell",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qnrm") * F.col("cnrm"))).alias(
                "ccos"
            ),
        )
        .withColumn("crank", F.row_number().over(wprobe))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "qv", "qnrm", "cell")
    )
    scored = (
        F.broadcast(probes)
        .join(base, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


def ivf_scan_stats(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    query_mod: int = 100,
    nprobe: int = 2,
) -> DataFrame:
    """Capacity-planning companion to :func:`knn_ivf`: per query, how many
    corpus rows the probed cells contain (``scanned_rows``) out of
    ``corpus_rows`` — the scan fraction that decides whether an IVF config
    actually beats brute force at scale.  Same probe selection as
    :func:`knn_ivf`, so the numbers are the real ones."""
    base = _normed_with_cell(df, id_col, vec_col, cell_col)
    cents = ivf_centroids(base, "cell")
    sizes = base.groupBy("cell").agg(F.count(F.lit(1)).alias("cell_rows"))
    queries = base.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    wprobe = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cell"))
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "cell",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qnrm") * F.col("cnrm"))).alias(
                "ccos"
            ),
        )
        .withColumn("crank", F.row_number().over(wprobe))
        .filter(F.col("crank") <= nprobe)
    )
    total = base.count()
    return (
        probes.join(sizes, "cell")
        .groupBy("query_id")
        .agg(F.sum("cell_rows").alias("scanned_rows"))
        .withColumn("corpus_rows", F.lit(total))
    )


def dist2(a: Column, b: Column) -> Column:
    """Squared L2 distance as a sequential fold (bit-identical to the
    oracle's list_reduce, like :func:`dot`)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism floor for the literal-centroid argmin
    kernels (k·d fold steps per row) — see
    :func:`data_pipelines_using_llm_spark.sources.tables.spread_to_cores`
    (shared implementation).  Results are partitioning-independent
    everywhere this is used (exact order-free sums, pure per-row maps)."""
    from data_pipelines_using_llm_spark.sources.tables import spread_to_cores

    return spread_to_cores(df)


def _sql_double_lit(x: float) -> str:
    """Exact SQL double literal: ``repr`` emits the shortest decimal that
    round-trips to the same binary64, and Spark's parser reads it with
    Double.parseDouble (correctly rounded), so the value re-enters the
    plan bit-identical."""
    return f"{float(x)!r}D"


def _sql_vec_lit(xs: list[float]) -> str:
    return "array(" + ",".join(_sql_double_lit(x) for x in xs) + ")"


def _least_assign_sql(
    vexpr: str, cents: list[tuple[int, list[float]]]
) -> str:
    """Argmin over LITERAL centroids as ``least`` of (d2, cid) structs —
    the same (distance, lowest-cid) tie-break as ``min(struct(d2, cid))``
    over a broadcast centroid table, but evaluated MAP-SIDE with zero
    joins, zero exchanges: the centroids ride in the expression itself
    (k·d double literals — codebook-sized at any corpus scale).  ``d2``
    is the same sequential ``(x-y)²`` left fold as :func:`dist2` (the
    SQL text parses to the identical ArrayAggregate/ZipWith nodes), so
    distances are bit-identical to the joined formulation.  Emitted as
    ONE SQL string because building the k·d-literal tree through py4j
    Column calls costs seconds of driver round trips per round."""

    def d2(cv: list[float]) -> str:
        return (
            f"aggregate(zip_with({vexpr}, {_sql_vec_lit(cv)}, "
            "(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)"
        )

    structs = [
        f"named_struct('d2', {d2(cv)}, 'cid', CAST({int(cid)} AS BIGINT))"
        for cid, cv in cents
    ]
    if len(structs) == 1:
        return structs[0]
    return "least(" + ",".join(structs) + ")"


def _mean_aggs(elem_sql, dim: int) -> list[Column]:
    """Per-dimension decimal-exact sum aggregates + count — the fused
    one-exchange form of the posexplode → (key, pos) double shuffle.
    ``elem_sql(i)`` yields the i-th (1-based) element's SQL expression;
    sums cast decimal(28,10) BEFORE summing exactly as the exploded
    form did."""
    return [
        F.expr(
            f"CAST(sum(CAST({elem_sql(i + 1)} AS DECIMAL(28,10))) "
            "AS DOUBLE)"
        ).alias(f"_s{i}")
        for i in range(dim)
    ] + [F.count(F.lit(1)).alias("_n")]


def _try_elem(col: str):
    """ANSI-safe element accessor for :func:`_mean_aggs` — identical to
    ``element_at`` on fixed-dimension data (the corpus contract), NULL
    (excluded from the decimal sum, exactly as the exploded form's
    missing row) on a shorter vector instead of the ANSI index error."""
    return lambda i: f"try_element_at({col}, {i})"


def _means_array(dim: int) -> Column:
    """Re-assemble the per-dimension means (s / n, the same double
    division the exploded form applied per (key, pos) row) in position
    order."""
    return F.expr(
        "array(" + ",".join(f"_s{i} / _n" for i in range(dim)) + ")"
    )


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    iters: int = 2,
) -> DataFrame:
    """Lloyd's k-means with deterministic seeding (centroids = vectors
    with the ``k`` lowest ids) and ORDER-INDEPENDENT centroid updates
    (decimal-exact per-dimension means, see :func:`ivf_centroids`).

    The iterative shape on Spark (r14 optimization — the literal-centroid
    formulation): centroids are CONTROL-PLANE state (k·d doubles — the
    quantizer, never the corpus), so each Lloyd round collects the k
    updated mean vectors to the driver and embeds them as literals in the
    next round's argmin expression (:func:`_least_assign`).  A round is
    then ONE job: corpus scan → map-side argmin → map-side partial
    decimal sums → one k-row exchange → collect.  The previous
    formulation (broadcast-join the centroid table, min(struct) argmin
    aggregation, posexplode mean update) ran 3 exchanges and ~7 AQE
    stage-jobs per round for the identical arithmetic; at 100 TB the
    collect is still k·d scalars (the same size the broadcast shipped)
    and the corpus still moves zero times per round.

    Arithmetic is unchanged and bit-identical: sequential-fold squared
    distances, (d2, lowest-cid) argmin tie-break, per-dimension
    decimal(28,10) sums with the double division applied after the cast
    — collected doubles re-enter the plan exactly (IEEE round-trip).
    Assumes fixed-dimension (``DIM``) non-null vectors, which every
    caller guarantees (the embeddings corpus contract).
    """
    base = barrier(
        _spread(
            df.select(
                F.col(id_col).alias("vec_id"), to_double(vec_col).alias("v")
            )
        )
    )
    cents = _kmeans_rounds(base, k, iters)
    if cents is None:  # no seedable vectors: the joined formulation yielded 0 rows
        return base.select(
            "vec_id",
            F.lit(None).cast("long").alias("cluster_id"),
            F.lit(None).cast("double").alias("dist"),
        ).filter(F.lit(False))
    # final assignment against the last updated centroids — a pure map
    dc = F.expr(_least_assign_sql("v", cents))
    return base.select(
        "vec_id",
        dc["cid"].alias("cluster_id"),
        F.round(F.sqrt(dc["d2"]), 6).alias("dist"),
    )


def _kmeans_rounds(base: DataFrame, k: int, iters: int) -> list | None:
    """The Lloyd-round loop of :func:`kmeans_assign` over a persisted
    (vec_id, v) base — seed collect + ``iters`` literal-centroid rounds;
    returns the final ``[(cid, cv)]`` list (None when no seedable
    vectors exist).  Factored out (r15) so callers that only need the
    CENTROIDS as control-plane literals (the self-trained IVF rows —
    the final assignment is then a projected column, no assignment
    table, no join) share the exact round arithmetic."""
    seed = base.filter(F.col("vec_id") < k).select("vec_id", "v").collect()
    cents = sorted((int(r["vec_id"]), list(r["v"])) for r in seed)
    if not cents:
        return None
    dim = len(cents[0][1])  # fixture dims vary; the corpus contract is DIM
    for _ in range(iters):
        # v IS NOT NULL before the mean aggregation (r14 ADVICE): the
        # exploded form excluded NULL vectors from BOTH sum and count
        # (posexplode of NULL yields no rows); count(1) alone would
        # silently inflate the mean divisor.  Free at any scale.
        sums = (
            base.filter(F.col("v").isNotNull())
            .select(
                F.expr(f"({_least_assign_sql('v', cents)}).cid").alias("cid"),
                "v",
            )
            .groupBy("cid")
            .agg(*_mean_aggs(_try_elem("v"), dim))
        )
        rows = sums.select("cid", _means_array(dim).alias("cv")).collect()
        cents = sorted((int(r["cid"]), list(r["cv"])) for r in rows)
    return cents


def kmeans_cents_literals(
    df: DataFrame, id_col: str, vec_col: str, k: int = 10, iters: int = 2
) -> tuple[list, DataFrame] | None:
    """Final k-means centroids as a literal list — :func:`kmeans_assign`
    minus the assignment table: callers project the cell id as a column
    (``_least_assign_sql`` over the final centroids) instead of joining
    a materialized assignment, which removes the persist+count
    materialization job AND the corpus-wide assignment join from the
    self-trained IVF serve paths.  Same seed collect, same rounds, same
    IEEE round-trip — centroid values are bit-identical to
    :func:`kmeans_assign`'s.  Returns ``(cents, base)`` — the persisted
    (vec_id, v) base is handed back so the serve side reuses the
    materialized doubles instead of re-scanning the source (``v`` is
    already array<double>; ``to_double`` over it is value-identity) —
    or None when no seedable vectors exist."""
    base = barrier(
        _spread(
            df.select(
                F.col(id_col).alias("vec_id"), to_double(vec_col).alias("v")
            )
        )
    )
    cents = _kmeans_rounds(base, k, iters)
    if cents is None:
        return None
    return cents, base


def kmeans_assign_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    iters: int = 2,
) -> DataFrame:
    """Arrow/numpy Lloyd's k-means — the 100 TB execution path for the
    clustering family (:func:`kmeans_assign` is the oracle-exact JVM-fold
    twin, kept for the cross-engine hash gates).

    Same semantics: deterministic seeding (the ``k`` lowest ids),
    argmin assignment with lowest-cluster-id tie-break, and the SAME
    decimal-exact per-dimension centroid update on the JVM side — so the
    per-round centroids match the exact variant to the last ulp of the
    double cast.  What changes is the assignment kernel: centroids ride
    in the task closure (k×d doubles, re-collected once per round — a
    control-plane read bounded by the quantizer size, never the corpus)
    and each partition computes ONE ``|batch| × k`` squared-distance
    GEMM inside ``mapInPandas`` instead of evaluating interpreted
    higher-order-function folds per (vector, centroid) pair.  numpy's
    pairwise summation can differ from the sequential fold in the last
    ulp, so assignments may flip on exact distance near-ties — the
    agreement test (tests/test_similarity.py) pins ≥99% assignment
    agreement and the registered gates keep using the fold variant.
    """
    import numpy as np
    import pandas as pd

    base = barrier(
        df.select(F.col(id_col).alias("vec_id"), to_double(vec_col).alias("v"))
    )
    cent_rows = (
        base.filter(F.col("vec_id") < k)
        .orderBy("vec_id")
        .collect()
    )
    cids = np.array([r["vec_id"] for r in cent_rows], dtype=np.int64)
    C = np.array([r["v"] for r in cent_rows], dtype=np.float64)

    def assigner(cids_: "np.ndarray", C_: "np.ndarray"):
        def assign(batches):
            c_sq = (C_ * C_).sum(axis=1)
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(pdf["v"].to_numpy())
                # ||v-c||^2 = |v|^2 - 2 v.c + |c|^2 ; |v|^2 constant per row
                d2 = -2.0 * (V @ C_.T) + c_sq
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "v": pdf["v"],
                        "cid": cids_[np.argmin(d2, axis=1)],
                        "d2": ((V * V).sum(axis=1) + d2.min(axis=1)),
                    }
                )

        return assign

    schema = "vec_id long, v array<double>, cid long, d2 double"
    for _ in range(iters):
        assigned = base.mapInPandas(assigner(cids, C), schema=schema)
        comp = assigned.select("cid", F.posexplode("v").alias("pos", "x"))
        cents = (
            comp.groupBy("cid", "pos")
            .agg(
                F.sum(F.col("x").cast("decimal(28,10)")).cast("double").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .select("cid", "pos", (F.col("s") / F.col("n")).alias("c"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("cv")
            )
            .orderBy("cid")
            .collect()
        )
        cids = np.array([r["cid"] for r in cents], dtype=np.int64)
        C = np.array([r["cv"] for r in cents], dtype=np.float64)

    final = base.mapInPandas(assigner(cids, C), schema=schema)
    return final.select(
        "vec_id",
        F.col("cid").alias("cluster_id"),
        F.round(F.sqrt(F.greatest(F.col("d2"), F.lit(0.0))), 6).alias("dist"),
    )


def farthest_point_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
) -> DataFrame:
    """Greedy farthest-point (k-center) selection over embeddings — the
    coreset / diverse-prototype picker dual to SemDeDup (that removes
    redundancy; this EXTRACTS the k most mutually-dissimilar exemplars,
    e.g. seed documents for labeling or eval-set anchors).

    Round structure: seed = lowest id; the per-vector "max cosine to the
    selected set" is maintained INCREMENTALLY — each round joins the
    corpus against only the ONE newly selected vector (a one-row
    broadcast) and folds it in with ``greatest``, so a round costs
    O(N·d), not O(N·|selected|·d): the textbook FPS recurrence.  The
    next pick minimizes that running max (ties → lowest id) via one
    ``orderBy().limit(1)`` control-plane read per round
    (TakeOrderedAndProject — no global sort), like PageRank's
    convergence probe; per-round state is persisted so round i+1 starts
    from materialized maxima, not i rounds of lineage.  ``max`` /
    ``greatest`` are exact comparisons and cosines sequential folds, so
    the incremental recurrence is BIT-equal to the oracle's
    recompute-over-the-whole-set form (unrolled-round SQL, the k-means
    oracle trick).

    Returns (vec_id, sel_rank, max_cos_prior) for the k selected rows;
    the seed reports ``max_cos_prior = -1.0``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    spark = df.sparkSession
    state = barrier(
        normed(df, id_col, vec_col).withColumn(
            "mx", F.lit(None).cast("double")
        )
    )
    seed = state.orderBy("vec_id").limit(1).first()
    sel: list[tuple[int, list[float], float, float]] = [
        (seed["vec_id"], list(seed["v"]), seed["nrm"], -1.0)
    ]
    for _ in range(k - 1):
        new_id, new_v, new_nrm, _ = sel[-1]
        # the newly selected vector is control-plane state — inline it
        # as a literal array (exact IEEE round-trip) instead of a
        # crossJoin(broadcast(1-row df)): same sequential-fold dot,
        # zero exchanges per round (r14; was one broadcast exchange +
        # a createDataFrame round trip per selection)
        cos_new = dot(
            F.col("v"), F.expr(_sql_vec_lit(new_v))
        ) / (F.col("nrm") * F.lit(float(new_nrm)))
        state = barrier(
            state.filter(F.col("vec_id") != new_id)
            .select(
                "vec_id",
                "v",
                "nrm",
                F.when(F.col("mx").isNull(), cos_new)
                .otherwise(F.greatest("mx", cos_new))
                .alias("mx"),
            )
        )
        chosen = (
            state.orderBy(F.col("mx").asc(), F.col("vec_id").asc())
            .limit(1)
            .first()
        )
        if chosen is None:  # corpus exhausted before k
            break
        sel.append(
            (chosen["vec_id"], list(chosen["v"]), chosen["nrm"], chosen["mx"])
        )
    out = spark.createDataFrame(
        [(vid, rank + 1, mx) for rank, (vid, _, _, mx) in enumerate(sel)],
        "vec_id bigint, sel_rank int, mx double",
    )
    # round via Spark (half-up, matching the SQL oracle), not Python's
    # banker's rounding
    return out.select(
        "vec_id", "sel_rank", F.round("mx", 6).alias("max_cos_prior")
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-blocked: candidate pairs share
    at least one (table, bucket); exact cosine filters.  Linear-ish in
    corpus size for clustered data — the all-pairs product never happens."""
    buck = _bucketed(normed(df, id_col, vec_col))
    a = buck.alias("a")
    b = buck.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            (
                dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cos"),
        )
        .dropDuplicates(["vec_id_a", "vec_id_b"])
        .filter(F.col("cos") >= threshold)
        .select(
            "vec_id_a", "vec_id_b", F.round("cos", 6).alias("cosine_sim")
        )
    )


def hard_negatives(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    max_cos: float = 0.4,
    k: int = 3,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: per
    anchor vector, the ``k`` highest-cosine candidates that are still
    BELOW the near-duplicate threshold (``max_cos``) — close enough to
    be confusable, far enough to be true negatives.  Candidates come
    from the same LSH band join as :func:`cosine_pairs` (near-misses
    collide in some bucket; uniform-random vectors mostly don't), so
    the mining cost tracks true near-neighbor density, never the
    all-pairs product.

    Determinism: cosines are sequential-fold dots (bit-identical
    cross-engine), ranking breaks ties by negative id, so the result
    hash-gates with no float caveat.
    """
    buck = _bucketed(normed(df, id_col, vec_col))
    a, b = buck.alias("a"), buck.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("anchor_id"),
            F.col("b.vec_id").alias("negative_id"),
            (
                dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cos"),
        )
        .dropDuplicates(["anchor_id", "negative_id"])
        .filter(F.col("cos") < max_cos)
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").desc(), F.col("negative_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id",
            "negative_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


def knn_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_mod: int = 100,
    k: int = DEFAULT_K,
    queries: DataFrame | None = None,
    max_queries: int = 65_536,
) -> DataFrame:
    """Arrow/numpy brute-force cosine top-k — the 100 TB hot path.

    Same semantics as :func:`knn_brute_force`, different engine path: the
    query block is collected once and shipped in the task closure; each
    corpus partition computes one numpy GEMM against it inside
    ``mapInPandas`` (Arrow batches, no per-element lambda evaluation) and
    emits only its LOCAL top-k rows per query, so the merge window
    shuffles |queries| × k × |partitions| rows — never the corpus.

    The query set is either an explicit ``queries`` DataFrame (the scale
    API — pass the small query table) or, for convenience, the corpus
    rows with ``id % query_mod == 0``.  Either way the collect is guarded
    by ``max_queries`` BEFORE pulling rows to the driver: at 100 TB
    "corpus / query_mod" is a corpus-sized fraction that must never land
    on the driver, so an oversized query set fails fast instead of
    OOM-ing.  The guard is folded into the collect itself — ONE
    ``limit(max_queries + 1)`` job (early-out scan) whose result either
    raises or IS the query block, instead of a count job followed by a
    second full collect of the same rows (the r5 1.78x bench
    regression).

    numpy's pairwise-summed dot differs from the JVM sequential fold in
    the last ulp, so the SCORES have no cross-engine hash oracle; the
    RANKS do — the registered query (plans/similarity_queries.py) strips
    scores and hash-gates (query_id, neighbor_id, rank, near_tie).  The
    agreement test (tests/test_similarity.py) additionally checks the
    per-query score sets against :func:`knn_brute_force` at 1e-9.
    """
    import numpy as np
    import pandas as pd

    if queries is None:
        queries = df.filter(F.col(id_col) % query_mod == 0)
    qsel = queries.select(
        F.col(id_col).alias("query_id"), to_double(vec_col).alias("qv")
    )
    qrows = qsel.limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"knn_arrow query set exceeds max_queries={max_queries}; "
            "pass an explicit small `queries` DataFrame or raise the cap"
        )
    q_ids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["qv"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)

    base = df.select(
        F.col(id_col).alias("vec_id"), to_double(vec_col).alias("v")
    )

    def part_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            V = np.stack(pdf["v"].to_numpy())
            cos = (V @ Q.T) / np.outer(np.linalg.norm(V, axis=1), qn)
            out: dict[str, list] = {"query_id": [], "neighbor_id": [], "cos": []}
            for qi in range(len(q_ids)):
                col = cos[:, qi].copy()
                col[ids == q_ids[qi]] = -np.inf  # self-exclusion
                top = min(k, len(ids))
                sel = np.argpartition(-col, top - 1)[:top]
                out["query_id"].extend([q_ids[qi]] * len(sel))
                out["neighbor_id"].extend(ids[sel])
                out["cos"].extend(col[sel])
            yield pd.DataFrame(out)

    local = base.mapInPandas(
        part_topk, schema="query_id long, neighbor_id long, cos double"
    ).filter(F.col("cos") > float("-inf"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


# ---- int8 scalar quantization (vector compression serving path) ----

INT8_LEVELS = 127


def idot(a: Column, b: Column) -> Column:
    """Integer dot product of two array<long> columns — exact (no
    floating-point, so summation order is irrelevant and every engine
    agrees bit-for-bit)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantize_int8(v: Column) -> Column:
    """Per-vector symmetric int8 scalar quantization: ``scale =
    max|x|/127``, ``q_i = round(x_i / scale)`` ∈ [-127, 127].

    The compression story at 100 TB: 4x smaller vectors (int8 vs
    float32), integer SIMD distance kernels, and — because the
    quantization is symmetric — the per-vector scale CANCELS in cosine
    similarity, so ranking needs only the integer dot products.  Both
    engines round doubles half-away-from-zero, so the quantized codes
    are bit-identical cross-engine (see the oracle in
    plans/similarity_queries.py).

    Let-bound so the vector and its max-abs are each evaluated ONCE
    (Spark's subexpression elimination does not reach interpreted
    higher-order functions — operators/text.py::let)."""
    from data_pipelines_using_llm_spark.operators.text import let

    def scale_of(vv: Column) -> Column:
        amax = F.array_max(F.transform(vv, F.abs))
        return F.when(amax > 0, amax / INT8_LEVELS).otherwise(F.lit(1.0))

    return let(
        v,
        lambda vv: let(
            scale_of(vv),
            lambda s: F.transform(vv, lambda x: F.round(x / s, 0).cast("long")),
        ),
    )


def knn_int8(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_mod: int = 100,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors — the
    compressed serving path of :func:`knn_brute_force` (identical join/
    window skeleton, integer distance kernel).

    Unlike the float paths, every similarity here derives from EXACT
    integer dot products (one double division at the end), so the
    result is fully deterministic and hash-gates cross-engine — the
    rare ANN variant with no float-summation caveat.  Rank agreement
    vs the exact float top-k is asserted in tests/test_similarity.py.
    """
    q8 = df.select(
        F.col(id_col).alias("vec_id"),
        quantize_int8(to_double(vec_col)).alias("q"),
    ).select(
        "vec_id", "q", F.sqrt(idot(F.col("q"), F.col("q")).cast("double")).alias("qnrm")
    )
    queries = q8.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("qnrm").alias("qqnrm"),
    )
    scored = F.broadcast(queries).join(
        q8, F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            idot(F.col("qq"), F.col("q")).cast("double")
            / (F.col("qqnrm") * F.col("qnrm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


def knn_ivf_int8(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    query_mod: int = 100,
    k: int = DEFAULT_K,
    nprobe: int = 2,
) -> DataFrame:
    """IVF + int8 codes — the production ANN serving stack in miniature:
    a LEARNED coarse quantizer picks ``nprobe`` cells (float centroids
    from exact decimal means, float probe ranking), then candidates are
    scored on their int8 codes (exact integer dot products — the scale
    cancels in cosine, see :func:`quantize_int8`).

    Why this composition at 100 TB: the corpus lives partitioned by cell
    with 4x-compressed codes; a query touches nprobe/k_cells of the data
    AND streams int8 instead of float32 — both knobs compound.  The
    centroid table and int8 query codes broadcast; the only non-broadcast
    join is the cell equi-join against the probed partitions.

    Fully deterministic (float folds are sequential, int dots exact), so
    the whole stack hash-gates cross-engine — rare for an ANN pipeline.
    """
    base = _normed_with_cell(df, id_col, vec_col, cell_col)
    # int8 codes as columns of the SAME projection (r15): the previous
    # ``base ⋈ codes`` was a second corpus self-join on the unique id —
    # q/qnrm8 are per-row expressions of the input row, value-identical
    # without the exchange.
    base8 = base.withColumn(
        "q", quantize_int8(F.col("v"))
    ).withColumn(
        "qnrm8", F.sqrt(idot(F.col("q"), F.col("q")).cast("double"))
    )
    cents = ivf_centroids(base, "cell")
    queries = base8.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.col("q").alias("qq"),
        F.col("qnrm8").alias("qqnrm8"),
    )
    wprobe = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cell")
    )
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "qq",
            "qqnrm8",
            "cell",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qnrm") * F.col("cnrm"))).alias(
                "ccos"
            ),
        )
        .withColumn("crank", F.row_number().over(wprobe))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "qq", "qqnrm8", "cell")
    )
    scored = (
        F.broadcast(probes)
        .join(base8, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                idot(F.col("qq"), F.col("q")).cast("double")
                / (F.col("qqnrm8") * F.col("qnrm8"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


DEFAULT_CELL_SIZE = 50


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int | None = None,
    iters: int = 2,
    threshold: float = 0.4,
    target_cell_size: int = DEFAULT_CELL_SIZE,
    max_cell_factor: float = 8.0,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means cells bound the
    candidate set, exact cosine inside each cell marks near-duplicates,
    and the lowest id in each near-dup neighborhood survives.

    Decision rule (deterministic, oracle-checkable): a vector is DROPPED
    iff some lower-id vector in the SAME cell has cosine >= ``threshold``
    with it; ``dup_of`` records the smallest such partner (or -1 for
    survivors).  This is the greedy per-ball rule, not a transitive
    closure — chains A~B~C with cos(A,C) < threshold keep only A (B and C
    each see a lower-id partner).  For full transitive grouping compose
    with operators/dedup.py::connected_components over the pair list.

    At 100 TB: the quadratic pair scan never leaves a cell, so total pair
    work is Σ|cell|² ≈ N · avg_cell — tractable ONLY if the cell count
    grows with the corpus (SemDeDup production runs use ~10⁵ clusters).
    That sizing is therefore not left to the caller by default: when
    ``k`` is None it is derived as ``ceil(N / target_cell_size)`` from a
    control-plane count, and after assignment an oversized-cell guard
    (one tiny aggregate over cell populations) raises if any cell exceeds
    ``max_cell_factor x target`` — a degenerate clustering (all points in
    one cell = silent O(N²)) fails loudly instead of hanging the stage.
    Pass an explicit ``k`` to pin the quantizer (e.g. to match a
    pre-generated oracle); the guard still runs against N/k.  The cell
    equi-join shuffles each vector once on its cell id; no all-pairs
    product exists in the plan.
    """
    import math

    n_vecs = df.count()
    if k is None:
        k = max(1, math.ceil(n_vecs / target_cell_size))
    base = normed(df, id_col, vec_col)
    cells = kmeans_assign(df, id_col, vec_col, k=k, iters=iters).select(
        "vec_id", "cluster_id"
    )
    # referenced three times below (both self-join sides + the keep-rule
    # join): persist so the kmeans lineage runs once, not three times
    lbl = barrier(base.join(cells, "vec_id"))
    cell_bound = max(1.0, max_cell_factor * n_vecs / k)
    max_pop = (
        lbl.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("pop"))
        .agg(F.max("pop").alias("mx"))
        .first()["mx"]
    )
    if max_pop is not None and max_pop > cell_bound:
        raise ValueError(
            f"semantic_dedup cell population {max_pop} exceeds bound "
            f"{cell_bound:.0f} (= {max_cell_factor} x N/k, N={n_vecs}, "
            f"k={k}); the within-cell pair scan would degenerate toward "
            "O(N^2) — raise k / lower target_cell_size, or pre-split the "
            "oversized cells (e.g. LSH sub-buckets) before dedup"
        )
    a, b = lbl.alias("a"), lbl.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_id"),
            F.col("a.vec_id").alias("partner"),
            (
                dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    dups = pairs.groupBy("vec_id").agg(F.min("partner").alias("dup_of"))
    return (
        lbl.select("vec_id", "cluster_id")
        .join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.col("dup_of").isNull().cast("int").alias("kept"),
            F.coalesce("dup_of", F.lit(-1).cast("long")).alias("dup_of"),
        )
    )


# ---- product quantization (PQ / ADC serving path) ----

PQ_M = 4  # subspaces
PQ_SUBDIM = DIM // PQ_M  # 16 dims each
PQ_K = 16  # codewords per sub-codebook (codes fit 4 bits)
PQ_ITERS = 2


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization training (Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011): split each vector into
    ``m`` contiguous subvectors and run an independent deterministic
    k-means (:func:`kmeans_assign`: lowest-id seeding, decimal-exact
    centroid means) in each subspace.

    Returns ``(codes, cents)``:
    - ``codes`` (vec_id, m, code) — the compressed corpus: m small ints
      per vector (m·log2(k) bits ≈ 2 bytes here vs 256 bytes float32 —
      the 100 TB corpus becomes ~1 TB of codes).
    - ``cents`` (m, code, cv, cn2) — sub-codebooks re-derived from the
      FINAL assignment by decimal-exact per-dimension means (the same
      assignment→centroid convention :func:`ivf_centroids` uses), plus
      each codeword's exact-fold squared norm for reconstruction norms.

    The m sub-quantizers are mathematically independent, so they are
    trained JOINTLY over one exploded (vec_id, m, sv) table: every
    Lloyd round is ONE broadcast-centroid argmin (the m x k centroid
    table is k·DIM doubles total — same bytes as one full-space k-means)
    plus ONE (m, code, pos) centroid-update shuffle, instead of m
    sequential k-means jobs.  Per-(vec, m) argmin ties break to the
    lowest code id and centroid means are decimal-exact, bit-identical
    to running :func:`kmeans_assign` per subspace (the oracle unrolls
    the per-subspace formulation and the gate agrees).
    """
    subdim = DIM // m
    base = barrier(
        _spread(
            df.select(
                F.col(id_col).alias("vec_id"), to_double(vec_col).alias("v")
            )
        )
    )
    seed = base.filter(F.col("vec_id") < k).select("vec_id", "v").collect()
    if not seed:  # no seedable vectors (r14 ADVICE): the joined
        # formulation degraded to empty results; the literal argmin
        # would emit a zero-arg least() — an AnalysisException.  Mirror
        # kmeans_assign's empty early return with the same schemas.
        codes = base.select(
            "vec_id",
            F.lit(None).cast("int").alias("m"),
            F.lit(None).cast("long").alias("code"),
        ).filter(F.lit(False))
        cents_df = base.select(
            F.lit(None).cast("int").alias("m"),
            F.lit(None).cast("long").alias("code"),
            F.lit(None).cast("array<double>").alias("cv"),
            F.lit(None).cast("double").alias("cn2"),
        ).filter(F.lit(False))
        return codes, cents_df
    # per-subspace literal codebooks: cents[mi] = [(cid, subvector), ...]
    cents = {
        mi: sorted(
            (int(r["vec_id"]), list(r["v"])[mi * subdim : (mi + 1) * subdim])
            for r in seed
        )
        for mi in range(m)
    }

    def codes_arr(cc: dict) -> Column:
        # one (m-long) array of per-subspace argmin codes, computed
        # MAP-SIDE against literal codebooks (:func:`_least_assign_sql`)
        # — the joint m-subspace Lloyd round with zero joins
        return F.expr(_pq_codes_arr_sql(cc, m, subdim))

    # per-round: explode the m codes (map-side), ONE (m, cid) exchange of
    # per-dimension decimal partials, collect the m·k updated sub-means
    def round_means(cc: dict) -> dict:
        # NULL vectors excluded from sums AND counts (r14 ADVICE — the
        # exploded form's semantics; see kmeans_assign)
        ex = base.filter(F.col("v").isNotNull()).select(
            "v", F.posexplode(codes_arr(cc)).alias("m", "cid")
        )
        sums = ex.groupBy("m", "cid").agg(
            *_mean_aggs(
                lambda i: f"try_element_at(v, CAST(m * {subdim} + {i} AS INT))",
                subdim,
            )
        )
        rows = sums.select("m", "cid", _means_array(subdim).alias("cv")).collect()
        out: dict = {mi: [] for mi in range(m)}
        for r in rows:
            out[int(r["m"])].append((int(r["cid"]), list(r["cv"])))
        return {mi: sorted(v) for mi, v in out.items()}

    for _ in range(iters):
        cents = round_means(cents)
    # final code table: a pure map over the persisted base (no exchange)
    codes = barrier(
        base.select(
            "vec_id", F.posexplode(codes_arr(cents)).alias("m", "code")
        )
    )
    # sub-codebooks re-derived from the FINAL assignment — same fused
    # one-exchange decimal-mean shape, kept in-engine (m·k rows out)
    ex = base.filter(F.col("v").isNotNull()).select(
        "v", F.posexplode(codes_arr(cents)).alias("m", "code")
    )
    sums = ex.groupBy("m", "code").agg(
        *_mean_aggs(
            lambda i: f"try_element_at(v, CAST(m * {subdim} + {i} AS INT))",
            subdim,
        )
    )
    cents_df = sums.select(
        "m", "code", _means_array(subdim).alias("cv")
    ).select("m", "code", "cv", dot(F.col("cv"), F.col("cv")).alias("cn2"))
    return codes, barrier(cents_df)


def _pq_codes_arr_sql(cc: dict, m: int, subdim: int) -> str:
    """The m-long array of per-subspace argmin codes as ONE SQL string —
    map-side against literal codebooks (:func:`_least_assign_sql`), the
    joint m-subspace assignment with zero joins.  Shared by
    :func:`pq_train` and the fused trainer so the expression text (and
    therefore every bit of the assignment) has one definition."""
    parts = ",".join(
        f"({_least_assign_sql(f'slice(v, {mi * subdim + 1}, {subdim})', cc[mi])}).cid"
        for mi in range(m)
    )
    return f"array({parts})"


def ivfpq_train_literals(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    iters: int = 2,
    m: int = PQ_M,
    kcodes: int = PQ_K,
    pq_iters: int = PQ_ITERS,
) -> tuple[list, dict, DataFrame] | None:
    """FUSED coarse-k-means + PQ training over ONE persisted base —
    the r15 cut of the self-contained IVFPQ rows' training floor
    (guide §1.2-1, §2.4, §2.6): the coarse quantizer and the m
    sub-quantizers are mathematically independent, but the r14 code ran
    them as two sequential Lloyd chains over the SAME corpus (one seed
    collect + one aggregation job per family per round ≈ 6 sequential
    jobs).  Both are control-plane state (k·d + m·k·subdim doubles), so
    each fused round evaluates BOTH argmin families map-side in one
    pass and groups their decimal partials under one (family, cid) key
    — ONE corpus-scan job per round, one seed collect total.

    Bit-exactness: the per-family groups are disjoint (family = -1 for
    coarse, 0..m-1 for PQ), so each group aggregates exactly the value
    multiset the unfused round aggregated, with the same expressions —
    cast-decimal(28,10)-then-sum, s/n double division, the
    (d2, lowest-cid) literal-argmin tie-break, IEEE round-trip of the
    collected doubles (all unchanged from r14's literal-centroid
    formulation; proven by the oracle gates).

    Returns ``(coarse, pqc, base)`` — the final coarse centroid list
    ``[(cid, cv)]``, the per-subspace codebooks ``{mi: [(cid, cv)]}``,
    and the persisted (vec_id, v) base for the serve side to reuse — or
    ``None`` when either seed set is empty (the caller falls back to
    the unfused formulations, which carry the degenerate-input
    semantics).
    """
    subdim = DIM // m
    base = barrier(
        _spread(
            df.select(
                F.col(id_col).alias("vec_id"), to_double(vec_col).alias("v")
            )
        )
    )
    seed = (
        base.filter(F.col("vec_id") < max(k, kcodes))
        .select("vec_id", "v")
        .collect()
    )
    coarse = sorted(
        (int(r["vec_id"]), list(r["v"])) for r in seed if r["vec_id"] < k
    )
    pq_seed = [r for r in seed if r["vec_id"] < kcodes]
    if not coarse or not pq_seed:
        return None
    pqc = {
        mi: sorted(
            (int(r["vec_id"]), list(r["v"])[mi * subdim : (mi + 1) * subdim])
            for r in pq_seed
        )
        for mi in range(m)
    }
    dim = len(coarse[0][1])  # fixture dims vary; the corpus contract is DIM
    width = max(dim, subdim)

    def fused_elem(i: int) -> str:
        # family -1 reads position i of the full vector (kmeans_assign's
        # elem); families 0..m-1 read position fam·subdim+i (pq_train's
        # elem) for i <= subdim and contribute nothing beyond it — NULL
        # is excluded from the decimal sum exactly like the absent
        # column of the narrower unfused aggregation.
        if i <= subdim:
            return (
                f"CASE WHEN fam = -1 THEN try_element_at(v, {i}) "
                f"ELSE try_element_at(v, CAST(fam * {subdim} + {i} AS INT)) "
                "END"
            )
        return f"CASE WHEN fam = -1 THEN try_element_at(v, {i}) END"

    rounds = max(iters, pq_iters)
    for it in range(rounds):
        entries = []
        if it < iters:
            entries.append(
                "named_struct('fam', -1, 'cid', "
                f"({_least_assign_sql('v', coarse)}).cid)"
            )
        if it < pq_iters:
            for mi in range(m):
                entries.append(
                    f"named_struct('fam', {mi}, 'cid', "
                    f"({_least_assign_sql(f'slice(v, {mi * subdim + 1}, {subdim})', pqc[mi])}).cid)"
                )
        ex = base.filter(F.col("v").isNotNull()).select(
            "v", F.expr(f"inline(array({','.join(entries)}))")
        )
        sums = ex.groupBy("fam", "cid").agg(*_mean_aggs(fused_elem, width))
        rows = sums.select(
            "fam", "cid", _means_array(width).alias("cv")
        ).collect()
        if it < iters:
            coarse = sorted(
                (int(r["cid"]), list(r["cv"])[:dim])
                for r in rows
                if r["fam"] == -1
            )
        if it < pq_iters:
            nxt: dict = {mi: [] for mi in range(m)}
            for r in rows:
                if r["fam"] >= 0:
                    nxt[int(r["fam"])].append(
                        (int(r["cid"]), list(r["cv"])[:subdim])
                    )
            pqc = {mi: sorted(v) for mi, v in nxt.items()}
    return coarse, pqc, base


def knn_ivfpq_selftrained(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_mod: int = 100,
    k: int = DEFAULT_K,
    nprobe: int = 2,
    m: int = PQ_M,
    kcodes: int = PQ_K,
    iters: int = PQ_ITERS,
    coarse_k: int = 10,
    coarse_iters: int = 2,
    refine_factor: int | None = None,
    n_queries: int | None = None,
) -> DataFrame:
    """The self-contained IVFPQ rows' train+serve composition with the
    FUSED trainer (:func:`ivfpq_train_literals`) and every serve-side
    artifact derived MAP-SIDE from the one persisted base — no
    kmeans-output join, no eager checkpoints (the artifacts are literal
    expressions, so the serve plan carries no training lineage to cut):

    - membership: the final coarse argmin as a projected column;
    - probe centroids: :func:`ivf_centroids`'s exact aggregation shape
      over that projection (in-plan — referenced once, broadcast);
    - code table: the final PQ argmin array posexploded (pure map);
    - sub-codebooks: pq_train's final re-derivation aggregation
      verbatim (in-plan — referenced once, broadcast in the LUT).

    Every expression is textually shared with the unfused path
    (``_least_assign_sql`` / ``_pq_codes_arr_sql`` / ``_mean_aggs`` /
    ``ivfpq_serve``), so the result is bit-identical to the r14
    composition — the checkpoint/collect choreography was the only
    thing removed.  ``refine_factor`` composes the exact re-rank
    (:func:`_refine_exact`) over the widened candidate list exactly as
    :func:`knn_ivfpq_refined`."""
    trained = ivfpq_train_literals(
        df, id_col, vec_col, coarse_k, coarse_iters, m, kcodes, iters
    )
    if trained is None:
        # degenerate corpus (no seedable vectors): the unfused
        # formulations own the empty-input semantics
        cells = (
            kmeans_assign(df, id_col, vec_col, k=coarse_k, iters=coarse_iters)
            .select(
                F.col("vec_id").alias(id_col),
                F.col("cluster_id").alias("__cell"),
            )
            .localCheckpoint(eager=True)
        )
        codes, pqcents = pq_train(df, id_col, vec_col, m, kcodes, iters)
        pq = (
            codes.localCheckpoint(eager=True),
            pqcents.localCheckpoint(eager=True),
        )
        joined = df.join(cells, id_col)
        if refine_factor is None:
            return knn_ivfpq(
                joined, id_col, vec_col, "__cell", query_mod, k, nprobe,
                m, kcodes, iters, pq=pq,
            )
        return knn_ivfpq_refined(
            joined, id_col, vec_col, "__cell", query_mod, k, nprobe,
            refine_factor, m, kcodes, iters, pq=pq, n_queries=n_queries,
        )
    coarse, pqc, base = trained
    subdim = DIM // m
    cell_sql = f"({_least_assign_sql('v', coarse)}).cid"
    with_cell = base.select("vec_id", "v", F.expr(cell_sql).alias("cell"))
    membership = with_cell.select("vec_id", "cell")
    icents = ivf_centroids(with_cell, "cell")
    codes_sql = _pq_codes_arr_sql(pqc, m, subdim)
    codes = base.select(
        "vec_id", F.posexplode(F.expr(codes_sql)).alias("m", "code")
    )
    pex = base.filter(F.col("v").isNotNull()).select(
        "v", F.posexplode(F.expr(codes_sql)).alias("m", "code")
    )
    psums = pex.groupBy("m", "code").agg(
        *_mean_aggs(
            lambda i: f"try_element_at(v, CAST(m * {subdim} + {i} AS INT))",
            subdim,
        )
    )
    pqcents = psums.select(
        "m", "code", _means_array(subdim).alias("cv")
    ).select("m", "code", "cv", dot(F.col("cv"), F.col("cv")).alias("cn2"))
    queries = (
        base.filter(F.col("vec_id") % query_mod == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            norm(F.col("v")).alias("qnrm"),
        )
    )
    ncand = k if refine_factor is None else refine_factor * k
    out = ivfpq_serve(
        queries, membership, icents, codes, pqcents, ncand, nprobe, m
    )
    if refine_factor is None:
        return out
    cands = out.select("query_id", "neighbor_id")
    return _refine_exact(
        normed(df, id_col, vec_col), cands, query_mod, k, ncand,
        n_queries=n_queries,
    )


def _sorted_fold_sum(key: str, val: str) -> Column:
    """Order-exact sum of ``val`` over a group, sequenced by ``key`` —
    matches the oracle's ``list_reduce(list_prepend(0.0, array_agg(val
    ORDER BY key)), +)`` bit-for-bit.  Group size here is m (tiny)."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(key, val))),
            lambda s: s[val],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def knn_pq(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_mod: int = 100,
    k: int = DEFAULT_K,
    m: int = PQ_M,
    kcodes: int = PQ_K,
    iters: int = PQ_ITERS,
    pq: tuple[DataFrame, DataFrame] | None = None,
    base: DataFrame | None = None,
) -> DataFrame:
    """Exhaustive PQ search with ASYMMETRIC DISTANCE COMPUTATION (ADC) —
    FAISS's ``IndexPQ`` re-expressed as a dataflow: queries stay float,
    the corpus is scanned as codes, and each (query, codeword) partial
    dot product is computed ONCE in a lookup table instead of once per
    corpus vector.

    Plan shape: the LUT is |queries| x m x k rows (query-side only —
    broadcast), the corpus-side scan is an equi-join of the (vec_id, m,
    code) table against it on (m, code), then a per-(query, vector)
    fold of exactly m partials.  The full-precision corpus is never
    read at serve time — only ``pq_train``'s code table — and nothing
    joins on an inequality.  Approximate cosine uses the reconstruction
    norm ``sqrt(Σ_m |c_{m,code}|²)`` (centroid cross-terms vanish:
    subspaces are disjoint coordinate blocks).

    Determinism: every float reduction is a sequenced fold (the m-way
    partial sum via :func:`_sorted_fold_sum`), all other arithmetic is
    exact — so the ADC scores hash-gate cross-engine like the int8
    family.  Composition with an IVF coarse quantizer (scan only probed
    cells' codes) is the FAISS IVFPQ layout; the cell equi-join of
    :func:`knn_ivf_int8` composes unchanged with this scorer.
    """
    subdim = DIM // m
    base = base if base is not None else normed(df, id_col, vec_col)
    codes, cents = (
        pq if pq is not None else pq_train(df, id_col, vec_col, m, kcodes, iters)
    )
    queries = base.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    # LUT: partial = Σ_i qv[m·subdim + i] · cv[i] — the same product
    # sequence the oracle states, left-folded
    partial = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(subdim)),
            lambda i: F.element_at(
                F.col("qv"), (F.col("m") * subdim + i).cast("int")
            )
            * F.element_at(F.col("cv"), i.cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "qnrm",
            "m",
            "code",
            partial.alias("partial"),
            "cn2",
        )
    )
    scored_parts = codes.join(F.broadcast(lut), ["m", "code"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    agg = scored_parts.groupBy("query_id", "vec_id").agg(
        _sorted_fold_sum("m", "partial").alias("adc"),
        _sorted_fold_sum("m", "cn2").alias("rn2"),
        F.min("qnrm").alias("qnrm"),
    )
    scored = agg.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (F.col("adc") / (F.col("qnrm") * F.sqrt("rn2"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


PQ_REFINE_FACTOR = 8


def knn_pq_refined(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_mod: int = 100,
    k: int = DEFAULT_K,
    refine_factor: int = PQ_REFINE_FACTOR,
    m: int = PQ_M,
    kcodes: int = PQ_K,
    iters: int = PQ_ITERS,
    pq: tuple[DataFrame, DataFrame] | None = None,
    n_queries: int | None = None,
) -> DataFrame:
    """PQ ADC candidate generation + exact re-rank — FAISS's
    ``IndexRefineFlat`` over ``IndexPQ`` as a dataflow.  The ADC scan
    (:func:`knn_pq`) keeps its compressed-corpus economics but ranks
    with 2-byte codes; this refine stage takes each query's top-C ADC
    candidates (C = refine_factor·k), re-scores them EXACTLY against
    the float vectors fetched by id, and emits the exact-cosine top-k.

    Scale shape: the candidate set is |queries|·C rows — fetched
    full-precision via a size-gated join over one additional corpus
    pass on top of ``knn_pq``'s code-table scan (broadcast below
    :data:`REFINE_BROADCAST_ROW_LIMIT`, shuffle equi-join above — see
    :func:`_refine_exact`; one corpus row duplicated per referencing
    query; no all-pairs).  Refine cost is O(|queries|·C·d) exact dot products
    regardless of corpus size; C is a serving constant, so at 100 TB
    the stage costs one extra scan + a driver-negligible re-score.

    Recall: exact re-ranking surfaces every true neighbor present in
    the candidate set, so recall@k equals the ADC candidate recall@C —
    measured 0.80 at sf0.01 with C=8k (and 0.64 at sf0.001) on the
    driver's i.i.d. near-orthogonal embeddings (PQ's worst case; floor
    asserted in tests/test_similarity.py and recorded in SCALE.md), vs
    0.15 worst-case floor for raw :func:`knn_pq`.  Determinism: ADC
    scores are sequenced folds (hash-gated in ``knn_pq``); exact cosine
    is the same fold :func:`knn_brute_force` gates — so the composition
    hash-gates too.

    ``n_queries`` (behavior change, r11→r12): the refine stage's
    candidate-broadcast hint fires only when the caller supplies the
    query count — pre-r12 an EAGER count at plan-construction time
    attached it automatically.  Callers who omit it get the same rows
    but leave the fetch-join strategy to AQE's runtime stats; pass
    ``n_queries`` (e.g. one cached ``count()`` of the query block, as
    the registry rows do via ``_n_queries_cached``) to restore the
    plan-time broadcast.
    """
    ncand = refine_factor * k
    base = normed(df, id_col, vec_col)
    cands = knn_pq(
        df, id_col, vec_col, query_mod, ncand, m, kcodes, iters, pq=pq,
        base=base,
    ).select("query_id", "neighbor_id")
    return _refine_exact(base, cands, query_mod, k, ncand, n_queries=n_queries)


REFINE_BROADCAST_ROW_LIMIT = 10_000_000  # ~160 MB of (query_id, neighbor_id)


def _refine_exact(
    base: DataFrame,
    cands: DataFrame,
    query_mod: int,
    k: int,
    cand_per_query: int,
    broadcast_row_limit: int = REFINE_BROADCAST_ROW_LIMIT,
    n_queries: int | None = None,
) -> DataFrame:
    """The exact re-rank stage shared by every ``*_refined`` variant:
    fetch the candidates' full-precision vectors via an inner join over
    one corpus pass of ``base``, score with the same sequenced-fold
    cosine :func:`knn_brute_force` hash-gates, and emit the exact top-k
    per query.

    Broadcast gate (r10 ADVICE — the candidate set is |queries|·C rows,
    which grows LINEARLY with the corpus at fixed query_mod, so it is
    NOT unconditionally broadcastable): the bound ``n_queries``·
    ``cand_per_query`` decides the strategy; at or under
    ``broadcast_row_limit`` (10M rows ≈ 160 MB of id pairs) the fetch
    join broadcasts the candidates and the corpus never shuffles, above
    it the hint is dropped and the fetch becomes a shuffle equi-join on
    vec_id.  ``n_queries`` is CALLER-SUPPLIED (r11 ADVICE — builders
    stay lazy: no eager count at plan-construction time; the registry
    rows pass a per-session cached query-block count,
    plans/similarity_queries.py::_n_queries_cached).  When None, no
    hint is attached and AQE picks the strategy from runtime stats at
    the shuffle boundary.  Same rows every way — the gate changes
    strategy, never results."""
    queries = base.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cands_hinted = (
        F.broadcast(cands)
        if n_queries is not None
        and n_queries * cand_per_query <= broadcast_row_limit
        else cands
    )
    fetched = base.join(
        cands_hinted, base["vec_id"] == cands["neighbor_id"]
    ).select("query_id", "neighbor_id", "v", "nrm")
    exact = fetched.join(F.broadcast(queries), "query_id").select(
        "query_id",
        "neighbor_id",
        (dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


def knn_ivfpq_refined(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    query_mod: int = 100,
    k: int = DEFAULT_K,
    nprobe: int = 2,
    refine_factor: int = PQ_REFINE_FACTOR,
    m: int = PQ_M,
    kcodes: int = PQ_K,
    iters: int = PQ_ITERS,
    pq: tuple[DataFrame, DataFrame] | None = None,
    ivf: DataFrame | None = None,
    n_queries: int | None = None,
) -> DataFrame:
    """The full FAISS production serving stack as one dataflow —
    ``IndexRefineFlat(IndexIVFPQ)``: the coarse quantizer bounds WHICH
    vectors are ADC-scored (:func:`knn_ivfpq`, nprobe cells), the PQ
    codes bound the BYTES the candidate scan reads, and this refine
    stage re-scores each query's top-C survivors exactly
    (:func:`_refine_exact` — size-gated candidate join, one extra
    full-precision pass restricted by the fetch join, O(|q|·C·d)
    re-score).  Recall@k = the IVFPQ candidate recall@C, so the refine
    converts the compressed index's weak ORDERING into exact ordering
    while inheriting the IVF scan-fraction economics — the standard
    billion-scale recipe.  Determinism: candidate ranks and exact
    cosines are both sequenced folds, so the composition hash-gates
    like its two factors.

    ``n_queries`` (behavior change, r11→r12): as in
    :func:`knn_pq_refined` — the refine stage's candidate-broadcast
    hint fires only when the caller supplies the query count (pre-r12
    an eager plan-time count attached it automatically); omit it and
    the fetch-join strategy falls to AQE, same rows either way."""
    ncand = refine_factor * k
    cands = knn_ivfpq(
        df, id_col, vec_col, cell_col, query_mod, ncand, nprobe,
        m, kcodes, iters, pq=pq, ivf=ivf,
    ).select("query_id", "neighbor_id")
    base = normed(df, id_col, vec_col)
    return _refine_exact(base, cands, query_mod, k, ncand, n_queries=n_queries)


def knn_ivfpq(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    query_mod: int = 100,
    k: int = DEFAULT_K,
    nprobe: int = 2,
    m: int = PQ_M,
    kcodes: int = PQ_K,
    iters: int = PQ_ITERS,
    pq: tuple[DataFrame, DataFrame] | None = None,
    ivf: DataFrame | None = None,
) -> DataFrame:
    """IVF + PQ — the FAISS ``IVFPQ`` layout, the standard billion-scale
    serving stack: a learned coarse quantizer bounds WHICH vectors are
    scored (nprobe of the cells, float centroid probe exactly as
    :func:`knn_ivf`), and product-quantized codes bound the BYTES per
    scored vector (m·log2(k) bits via the :func:`knn_pq` ADC lookup
    table).  The two factors compound: a query touches nprobe/k_cells of
    a corpus that is itself ~128x compressed.

    Serve-time reads: cell membership (vec_id, cell) and the code table
    (vec_id, m, code) — never the float corpus; full-precision vectors
    exist only in the two training paths.  Every join is an equi-join
    (cell; vec_id; (query_id, m, code) against the broadcast LUT), and
    every float reduction is a sequenced fold, so the whole stack
    hash-gates cross-engine like its factors.

    Pass ``pq=(codes, cents)`` (from :func:`pq_train`, ideally behind a
    ``localCheckpoint`` lineage cut) to serve from a pre-trained code
    table — production trains once and amortizes, and without the cut
    the serve plan drags five k-means lineages (coarse + m sub-spaces)
    through analysis/codegen, which is driver-heap-hostile even though
    execution hits the persisted blocks (measured: 41s/OOM-at-1g
    composed vs seconds with checkpointed training artifacts).
    ``ivf`` optionally supplies pre-trained coarse centroids
    ``(cell, cv, cnrm)`` the same way (the persisted-index serve path,
    plans/similarity_queries.py::knn_ivfpq_stored); by default they are
    re-derived from the full-precision corpus per call.
    """
    base = _normed_with_cell(df, id_col, vec_col, cell_col)
    cents = ivf if ivf is not None else ivf_centroids(base, "cell")
    codes, pqcents = (
        pq if pq is not None else pq_train(df, id_col, vec_col, m, kcodes, iters)
    )
    queries = base.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    return ivfpq_serve(
        queries, base.select("vec_id", "cell"), cents, codes, pqcents,
        k, nprobe, m,
    )


def ivfpq_serve(
    queries: DataFrame,
    membership: DataFrame,
    cents: DataFrame,
    codes: DataFrame,
    pqcents: DataFrame,
    k: int = DEFAULT_K,
    nprobe: int = 2,
    m: int = PQ_M,
    labels: DataFrame | None = None,
) -> DataFrame:
    """The PURE IVFPQ serving dataflow — queries in, top-k out, every
    trained artifact passed in: ``queries`` (query_id, qv, qnrm),
    ``membership`` (vec_id, cell), ``cents`` (cell, cv, cnrm),
    ``codes``/``pqcents`` from :func:`pq_train` or
    plans/similarity_queries.py::ann_index_load.  This is the function
    a production deployment calls per query batch (the ``knn_ivfpq*``
    registry rows wrap it with their self-contained training for the
    hash gates; the streaming row serves each micro-batch through it) —
    and because the scoring is sequenced folds + exact arithmetic, the
    result for a given query is independent of WHICH batch it arrives
    in.  The float corpus is never touched: candidates come from the
    membership table, scores from the code table, queries carry their
    own vectors.

    ``labels`` turns on METADATA-FILTERED search (the production
    multi-tenant / attribute-filter shape every serving stack ships —
    "search within my tenant"): pass ``(vec_id, label)`` and give each
    query row a ``qlabel`` column, and candidates are PRE-filtered to
    label-equal vectors INSIDE candidate generation — each query still
    gets its full top-k among its own tenant, which a post-filter of
    an unfiltered top-k cannot guarantee.  The filter is one equi-join
    of the candidate pairs against the label table (O(corpus)
    partition-friendly, never broadcast) plus a broadcast of the
    per-query labels; candidates shrink BEFORE the ADC join, so
    filtered serving reads fewer code rows, not more.  Default None
    leaves every existing plan byte-identical.

    PER-QUERY probe depth (r14, the skewed-tenant serving policy): if
    ``queries`` carries a ``qnprobe`` column, each query probes its own
    number of cells instead of the scalar ``nprobe`` — the production
    fix for filtered search over a SKEWED tenant distribution, where a
    cold tenant's members are so sparse per cell that the default probe
    depth cannot fill k (raise its qnprobe to the cell count: scanning
    a tiny tenant's full membership is cheap) while the hot tenant
    stays cell-pruned at the default.  Queries without the column are
    untouched — the scalar path is byte-identical."""
    subdim = DIM // m
    wprobe = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cell")
    )
    per_query_nprobe = "qnprobe" in queries.columns
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            *(["qnprobe"] if per_query_nprobe else []),
            "cell",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qnrm") * F.col("cnrm"))).alias(
                "ccos"
            ),
        )
        .withColumn("crank", F.row_number().over(wprobe))
        .filter(
            F.col("crank")
            <= (F.col("qnprobe") if per_query_nprobe else F.lit(nprobe))
        )
        .select("query_id", "cell")
    )
    # PARTITIONED tenant layout (r14): when the membership table itself
    # carries a ``label`` column (written ``partitionBy("label")`` at
    # index-build time) and queries carry ``qlabel``, the tenant filter
    # costs NOTHING extra at serve — the label rides the membership
    # rows (on disk it is a partition directory, so a single-tenant
    # serve is a PRUNED scan), and the O(corpus) label-table equi-join
    # of the ``labels=`` path disappears.  ``labels=`` still wins when
    # the index layout cannot be changed.
    membership_label = (
        labels is None
        and "label" in membership.columns
        and "qlabel" in queries.columns
    )
    cand = (
        F.broadcast(probes)
        .join(membership, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", *(["label"] if membership_label else [])
        )
    )
    if labels is not None:
        qlab = queries.select("query_id", "qlabel")
        cand = (
            cand.join(labels.select("vec_id", "label"), "vec_id")
            .join(F.broadcast(qlab), "query_id")
            .filter(F.col("label") == F.col("qlabel"))
            .select("query_id", "vec_id")
        )
    elif membership_label:
        qlab = queries.select("query_id", "qlabel")
        cand = (
            cand.join(F.broadcast(qlab), "query_id")
            .filter(F.col("label") == F.col("qlabel"))
            .select("query_id", "vec_id")
        )
    partial = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(subdim)),
            lambda i: F.element_at(
                F.col("qv"), (F.col("m") * subdim + i).cast("int")
            )
            * F.element_at(F.col("cv"), i.cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(pqcents))
        .select(
            "query_id", "qnrm", "m", "code", partial.alias("partial"), "cn2"
        )
    )
    sp = cand.join(codes, "vec_id").join(
        F.broadcast(lut), ["query_id", "m", "code"]
    )
    agg = sp.groupBy("query_id", "vec_id").agg(
        _sorted_fold_sum("m", "partial").alias("adc"),
        _sorted_fold_sum("m", "cn2").alias("rn2"),
        F.min("qnrm").alias("qnrm"),
    )
    final = agg.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (F.col("adc") / (F.col("qnrm") * F.sqrt("rn2"))).alias("cos"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        final.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, icents: DataFrame
) -> DataFrame:
    """Assign vectors to EXISTING coarse cells — the FAISS ``add()``
    path's coarse step: argmin exact squared distance to the stored
    centroids ``(cell, cv, ...)``, ties to the lowest cell id (the same
    ``min(struct(d2, id))`` map-side-combinable argmin
    :func:`kmeans_assign` uses, so assignments are deterministic and
    oracle-checkable).  No retraining, no shuffle of the corpus — one
    broadcast of the centroid table.  Returns ``(vec_id, cell)``."""
    base = df.select(
        F.col(id_col).alias("vec_id"), to_double(vec_col).alias("v")
    )
    return (
        base.crossJoin(F.broadcast(icents.select("cell", "cv")))
        .select(
            "vec_id",
            F.struct(
                dist2(F.col("v"), F.col("cv")).alias("d2"),
                F.col("cell").alias("cell"),
            ).alias("dc"),
        )
        .groupBy("vec_id")
        .agg(F.min("dc").alias("dc"))
        .select("vec_id", F.col("dc.cell").alias("cell"))
    )


def pq_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    pqcents: DataFrame,
    m: int = PQ_M,
) -> DataFrame:
    """Encode vectors against EXISTING sub-codebooks — the FAISS
    ``add()`` path's PQ step: per subspace, argmin exact squared
    distance to the stored codewords ``(m, code, cv, ...)``, ties to
    the lowest code.  One broadcast of the m·k codeword table over one
    exploded pass of the new vectors; the codebooks are NOT updated
    (exactly FAISS semantics — re-centering on add would invalidate
    every previously stored code).  Returns ``(vec_id, m, code)``."""
    subdim = DIM // m
    subs = df.select(
        F.col(id_col).alias("vec_id"), to_double(vec_col).alias("v")
    ).select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).alias("m"),
                        F.slice("v", mi * subdim + 1, subdim).alias("sv"),
                    )
                    for mi in range(m)
                ]
            )
        ).alias("ms"),
    ).select("vec_id", "ms.m", "ms.sv")
    return (
        subs.join(
            F.broadcast(pqcents.select("m", "code", "cv")), "m"
        )
        .select(
            "vec_id",
            "m",
            F.struct(
                dist2(F.col("sv"), F.col("cv")).alias("d2"),
                F.col("code").alias("code"),
            ).alias("dc"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min("dc").alias("dc"))
        .select("vec_id", "m", F.col("dc.code").alias("code"))
    )


def ann_retrain_decision(
    stats: DataFrame,
    concentration_threshold: float = 0.5,
    append_cost_s: float | None = None,
    retrain_cost_s: float | None = None,
) -> dict:
    """Close the retrain loop (r11 verdict task 3): turn the index
    health report (plans/similarity_queries.py::ann_index_stats_from_parts
    — per cell: population, corpus share, max single-PQ-code count)
    into an APPEND vs RETRAIN decision.

    The drift signal is the worst per-cell CODE CONCENTRATION
    ``max_code_count / n_vectors`` — within one subspace a cell's
    vectors spread over PQ_K codewords, so a healthy quantizer sits
    near 1/PQ_K (0.0625 at PQ_K=16; measured 0.32–0.34 on the i.i.d.
    driver corpus — small cells keep the max noisy upward at these
    SFs) while add-path drift pushes it toward 1.0 (new
    vectors from a shifted distribution all collapse onto the single
    nearest codeword, and the quantizer has stopped discriminating —
    measured 1.0 on the shifted-fixture test).  The default threshold
    0.5 ("half of some cell's vectors share one codeword in some
    subspace") sits far above every healthy measurement and far below
    the drift fixture; see SCALE.md "Retrain policy" for the
    measurements.

    Cost context: pass the measured per-batch ``append_cost_s`` and
    ``retrain_cost_s`` (SCALE.md records 1.28 s vs 2.73 s at sf0.1) and
    the report includes the amortization ratio — how many appends one
    retrain costs — so an operator can see what the decision trades.
    One aggregation over the (driver-bounded, n_cells-row) stats frame;
    returns driver scalars."""
    row = stats.agg(
        F.max(
            F.col("max_code_count") / F.col("n_vectors").cast("double")
        ).alias("worst"),
        F.sum("n_vectors").alias("n_total"),
    ).first()
    if row["worst"] is None:
        # r12 ADVICE: an EMPTY stats frame (e.g. an index whose vectors
        # were all removed) must fail loudly, not TypeError on
        # float(None) — there is no quantizer health to judge and no
        # sane default decision for a vectorless index.
        raise ValueError(
            "ann_retrain_decision: empty index stats — the index has no "
            "per-vector rows (all vectors removed, or the wrong parts "
            "were passed); retrain-vs-append is undefined for an empty "
            "index"
        )
    worst = float(row["worst"])
    report = {
        "decision": (
            "retrain" if worst > concentration_threshold else "append"
        ),
        "worst_code_concentration": worst,
        "threshold": concentration_threshold,
        "n_vectors": int(row["n_total"]),
    }
    if append_cost_s is not None and retrain_cost_s is not None:
        report["append_cost_s"] = append_cost_s
        report["retrain_cost_s"] = retrain_cost_s
        report["retrain_costs_n_appends"] = retrain_cost_s / append_cost_s
    return report


def pq_residuals(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cells: DataFrame,
    icents: DataFrame,
) -> DataFrame:
    """Residual vectors for RESIDUAL-ENCODED IVFPQ — the standard FAISS
    ``IndexIVFPQ`` semantics (Jégou et al. 2011 §IV: encode
    ``r = x − q1(x)``, the offset from the coarse centroid, not the raw
    vector): per vector, subtract its assigned cell's float centroid
    element-wise.  Residuals concentrate the product quantizer's budget
    on the within-cell variation — the main published recall lever at
    equal code budget — which is why FAISS encodes residuals by default.

    Determinism: ``zip_with(v, cv, (a, b) -> a − b)`` is one exact IEEE
    subtraction per element over engine-identical inputs (raw corpus
    doubles, decimal-exact centroid means), textually mirrored in the
    oracle's ``v[i] - cv[i]``.  Scale: one broadcast of the centroid
    table over one corpus pass — no shuffle.  Returns
    ``(vec_id, v, cell)`` where ``v`` IS the residual (named ``v`` so
    :func:`pq_train` and the oracle's subspace CTEs consume it
    unchanged)."""
    base = df.select(
        F.col(id_col).alias("vec_id"), to_double(vec_col).alias("v")
    )
    return (
        base.join(cells.select("vec_id", "cell"), "vec_id")
        .join(
            F.broadcast(icents.select("cell", F.col("cv").alias("ccv"))),
            "cell",
        )
        .select(
            "vec_id",
            F.zip_with("v", "ccv", lambda a, b: a - b).alias("v"),
            "cell",
        )
    )


def ivfpq_residual_serve(
    queries: DataFrame,
    membership: DataFrame,
    icents: DataFrame,
    codes: DataFrame,
    pqcents: DataFrame,
    k: int = DEFAULT_K,
    nprobe: int = 2,
    m: int = PQ_M,
    labels: DataFrame | None = None,
) -> DataFrame:
    """The RESIDUAL-IVFPQ serving dataflow — :func:`ivfpq_serve` with
    the reconstruction ``x̂ = c_cell + r̂`` instead of ``x̂ = r̂``:

    - numerator  ``q·x̂ = q·c_cell + Σ_m q_m·r̂_m`` — the coarse term is
      ONE dot product per (query, cell) (a broadcast-size table:
      |queries| × n_cells), the residual term is the same per-(query,
      m, code) ADC lookup as flat PQ;
    - ‖x̂‖² ``= ‖c‖² + 2·Σ_m c_m·r̂_m + Σ_m ‖r̂_m‖²`` — the cross term is
      a (cell, m, code) table (n_cells × m × k codewords, broadcast;
      subspaces are disjoint blocks so cross-subspace terms vanish).

    Serve-time reads are unchanged from :func:`ivfpq_serve` — cell
    membership and the code table, never the float corpus; the three
    new lookup tables are all centroid/codebook-sized (broadcast at any
    corpus scale).  Every float reduction is a sequenced fold and the
    final score is one fixed-shape expression
    ``(qc + adc) / (qnrm · sqrt(cn2c + 2·crs + rn2))`` mirrored
    textually in the oracle, so the stack hash-gates like the raw-PQ
    family.  ``labels`` turns on the same metadata (multi-tenant)
    pre-filter as :func:`ivfpq_serve` — label-equal candidates only,
    applied inside candidate generation.  A ``qnprobe`` column on
    ``queries`` gives each query its own probe depth (the skewed-tenant
    policy), exactly as in :func:`ivfpq_serve`; without it the scalar
    path is byte-identical."""
    subdim = DIM // m
    wprobe = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cell")
    )
    per_query_nprobe = "qnprobe" in queries.columns
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(icents))
        .select(
            "query_id",
            *(["qnprobe"] if per_query_nprobe else []),
            "cell",
            (
                dot(F.col("qv"), F.col("cv"))
                / (F.col("qnrm") * F.col("cnrm"))
            ).alias("ccos"),
        )
        .withColumn("crank", F.row_number().over(wprobe))
        .filter(
            F.col("crank")
            <= (F.col("qnprobe") if per_query_nprobe else F.lit(nprobe))
        )
        .select("query_id", "cell")
    )
    cand = (
        F.broadcast(probes)
        .join(membership, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "cell")
    )
    if labels is not None:
        # same metadata pre-filter as ivfpq_serve's (see its docstring):
        # label-equal candidates only, shrunk BEFORE the ADC join
        qlab = queries.select("query_id", "qlabel")
        cand = (
            cand.join(labels.select("vec_id", "label"), "vec_id")
            .join(F.broadcast(qlab), "query_id")
            .filter(F.col("label") == F.col("qlabel"))
            .select("query_id", "vec_id", "cell")
        )
    partial = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(subdim)),
            lambda i: F.element_at(
                F.col("qv"), (F.col("m") * subdim + i).cast("int")
            )
            * F.element_at(F.col("cv"), i.cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(pqcents))
        .select(
            "query_id", "qnrm", "m", "code", partial.alias("partial"), "cn2"
        )
    )
    # coarse term per (query, cell) and ‖c‖² per cell — broadcast-size
    qc = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(icents))
        .select(
            "query_id", "cell", dot(F.col("qv"), F.col("cv")).alias("qc")
        )
    )
    cinfo = icents.select(
        "cell", dot(F.col("cv"), F.col("cv")).alias("cn2c")
    )
    # centroid×codeword cross term per (cell, m, code)
    cross = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(subdim)),
            lambda i: F.element_at(
                F.col("ccv"), (F.col("m") * subdim + i).cast("int")
            )
            * F.element_at(F.col("cv"), i.cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ccross = (
        F.broadcast(icents.select("cell", F.col("cv").alias("ccv")))
        .crossJoin(F.broadcast(pqcents))
        .select("cell", "m", "code", cross.alias("crs"))
    )
    sp = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .join(F.broadcast(ccross), ["cell", "m", "code"])
    )
    agg = sp.groupBy("query_id", "vec_id", "cell").agg(
        _sorted_fold_sum("m", "partial").alias("adc"),
        _sorted_fold_sum("m", "cn2").alias("rn2"),
        _sorted_fold_sum("m", "crs").alias("crs"),
        F.min("qnrm").alias("qnrm"),
    )
    final = (
        agg.join(F.broadcast(qc), ["query_id", "cell"])
        .join(F.broadcast(cinfo), "cell")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                (F.col("qc") + F.col("adc"))
                / (
                    F.col("qnrm")
                    * F.sqrt(
                        F.col("cn2c")
                        + F.lit(2.0) * F.col("crs")
                        + F.col("rn2")
                    )
                )
            ).alias("cos"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        final.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


PI_QUANTUM = float(1 << 30)  # order-free matrix-vector fold quantum


def _power_iteration_raw(
    cov: DataFrame,
    i_col: str = "i",
    j_col: str = "j",
    val_col: str = "cov",
    tol: float = 1e-6,
    max_iters: int = 100,
) -> DataFrame:
    """Dominant eigenpair of a symmetric matrix by power iteration TO A
    RESIDUAL-NORM FIXPOINT — the production mode the fixed-round registry
    query (plans/similarity_queries.py::embedding_top_eigvec, PI_ITERS
    unrolled so the oracle stays CTE-expressible) documents.

    Input is the upper-triangular cell list (``i_col <= j_col``, one row
    per cell) exactly as embedding_covariance emits; the matrix is
    mirrored internally.  Returns (dim, loading, eigenvalue) with the
    same quantized-fold arithmetic as the unrolled query (floor(x*2^30)
    int64 sums — order-free, engine-deterministic), so after the same
    number of rounds the two produce IDENTICAL vectors.

    Convergence discipline (matches connected_components and k_core):
    one scalar ``collect()`` per round reads ``max_d |v_t[d]-v_{t-1}[d]|``
    — a control-plane probe over a d-row table, not data movement — and
    the loop exits when it drops below ``tol``; the loud ``max_iters``
    guard turns non-convergence (e.g. a tied dominant eigenvalue, where
    power iteration oscillates in the tied subspace) into an error
    instead of a silently unconverged vector.  Per-round
    ``localCheckpoint`` on the d-row vector cuts the 2^rounds lineage
    (the next round references v twice: the fold and the residual).

    Scale: the corpus pass happens UPSTREAM (building ``cov``); here
    every table is d or d² rows on one partition, so a hundred rounds
    is control-plane latency, not cluster work.
    """
    q = PI_QUANTUM
    cells = cov.select(
        F.col(i_col).alias("i"), F.col(j_col).alias("j"),
        F.col(val_col).cast("double").alias("c"),
    ).coalesce(1)
    full = cells.unionAll(
        cells.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "c"
        )
    ).localCheckpoint(eager=True)
    v = (
        full.select(F.col("i").alias("d")).distinct()
        .select("d", F.lit(1.0).alias("x"))
        .localCheckpoint(eager=True)
    )
    nn = None
    delta = None  # stays None if max_iters <= 0 — the raise must not NameError
    for _ in range(max_iters):
        w = (
            full.join(v.select(F.col("d").alias("j"), "x"), "j")
            .groupBy("i")
            .agg(
                (
                    F.sum(
                        F.floor(F.col("c") * F.col("x") * F.lit(q)).cast(
                            "long"
                        )
                    ).cast("double")
                    / F.lit(q)
                ).alias("w")
            )
        )
        nn = w.agg(
            (
                F.sum(
                    F.floor(F.col("w") * F.col("w") * F.lit(q)).cast("long")
                ).cast("double")
                / F.lit(q)
            ).alias("nn")
        )
        v_new = (
            w.crossJoin(F.broadcast(nn))
            .select(
                F.col("i").alias("d"),
                (F.col("w") / F.sqrt(F.col("nn"))).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            v_new.join(
                v.select(F.col("d").alias("d"), F.col("x").alias("x_prev")),
                "d",
            )
            .agg(F.max(F.abs(F.col("x") - F.col("x_prev"))).alias("m"))
            .collect()[0]["m"]
        )
        v = v_new
        if delta is not None and delta < tol:
            # UNROUNDED (d, x, nn-as-eigenvalue) — top_m_eigvecs deflates
            # with these; the public wrapper rounds for reports.
            return v.crossJoin(F.broadcast(nn)).select(
                F.col("d").alias("dim"),
                F.col("x").alias("loading"),
                F.sqrt(F.col("nn")).alias("eigenvalue"),
            )
    raise RuntimeError(
        f"power_iteration did not converge within max_iters={max_iters} "
        f"(last residual {delta!r} >= tol={tol!r}); either a tied "
        "dominant |eigenvalue| (the iterate oscillates — deflate the "
        "tied subspace) or tol is below the fold-quantum noise floor "
        "(~d*2^-30/lambda) — raise `tol` or `max_iters`"
    )


def power_iteration(
    cov: DataFrame,
    i_col: str = "i",
    j_col: str = "j",
    val_col: str = "cov",
    tol: float = 1e-6,
    max_iters: int = 100,
) -> DataFrame:
    """Public report form of :func:`_power_iteration_raw` — identical
    fixpoint arithmetic, loadings and eigenvalue rounded to 6 (the
    registry output convention)."""
    raw = _power_iteration_raw(cov, i_col, j_col, val_col, tol, max_iters)
    return raw.select(
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round("eigenvalue", 6).alias("eigenvalue"),
    )


def top_m_eigvecs(
    cov: DataFrame,
    m: int = 2,
    i_col: str = "i",
    j_col: str = "j",
    val_col: str = "cov",
    tol: float = 1e-6,
    max_iters: int = 100,
) -> DataFrame:
    """Top-``m`` eigenpairs of a symmetric matrix by residual-converged
    power iteration + HOTELLING DEFLATION — the production fixpoint
    counterpart of the unrolled registry query
    (plans/similarity_queries.py::embedding_top2_eigvecs): after each
    converged component (v, lambda), the matrix is replaced by
    ``C <- C - lambda*v*v^T`` (one d^2-row join against the d-row
    vector) and the iteration restarts, so component k+1 converges to
    the dominant eigenpair of the deflated remainder.

    Deflation uses the UNROUNDED converged vector (rounding first would
    inject ~1e-6*lambda of rank-1 error into every later component).
    Input/output contract matches power_iteration: upper-triangular
    cells in, (component, dim, loading, eigenvalue) long-format out,
    rounded to 6 for reporting.  Each deflated matrix is cut with
    ``localCheckpoint`` — it is referenced 2 x rounds times by the next
    component's iteration.

    Scale: the corpus pass is upstream (building ``cov``); here every
    step is d- or d^2-row control-plane work, so m components cost m
    power-iteration runs of tiny jobs, never another corpus pass.
    """
    if m < 1:
        raise ValueError(f"top_m_eigvecs: m must be >= 1, got {m}")
    cur = cov.select(
        F.col(i_col).alias("i"),
        F.col(j_col).alias("j"),
        F.col(val_col).cast("double").alias("cov"),
    ).coalesce(1)
    outs = []
    for comp in range(1, m + 1):
        # Rank-exhaustion pre-check: once deflation has removed every
        # component, the remainder's cells quantize to zero inside the
        # fold (|c·x| < 2^-30 for unit x), w/sqrt(0) goes NaN, and the
        # residual would never converge — the iteration would burn
        # max_iters and raise the MISLEADING tied-eigenvalue error.
        # One d²-row scalar probe names the real condition instead.
        mx = cur.agg(F.max(F.abs(F.col("cov")))).first()[0]
        if mx is None or mx * PI_QUANTUM < 1.0:
            raise ValueError(
                f"top_m_eigvecs: matrix rank exhausted at component "
                f"{comp} (deflated max |cell| "
                f"{0.0 if mx is None else mx!r} is below the fold "
                f"quantum); request m < {comp}"
            )
        eig = _power_iteration_raw(
            cur, "i", "j", "cov", tol, max_iters
        ).localCheckpoint(eager=True)
        outs.append(
            eig.select(
                F.lit(comp).cast("int").alias("component"),
                "dim",
                F.round("loading", 6).alias("loading"),
                F.round("eigenvalue", 6).alias("eigenvalue"),
            )
        )
        if comp == m:
            break
        vi = eig.select(
            F.col("dim").alias("i"),
            F.col("loading").alias("xi"),
            F.col("eigenvalue").alias("lam"),
        )
        vj = eig.select(F.col("dim").alias("j"), F.col("loading").alias("xj"))
        # upper-triangular representation is preserved: deflation is
        # symmetric, so subtracting on the i<=j cells is exact.
        cur = (
            cur.join(vi, "i")
            .join(vj, "j")
            .select(
                "i",
                "j",
                (
                    F.col("cov") - F.col("lam") * F.col("xi") * F.col("xj")
                ).alias("cov"),
            )
            .localCheckpoint(eager=True)
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
