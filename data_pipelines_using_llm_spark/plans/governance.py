"""Data-governance audit pack: k-anonymity risk profiling and a
Benford first-digit fraud screen.

The reference's quality layer stops at null/duplicate/freshness checks
(``Second Experiment/GPT 5.py`` quality reports; SURVEY.md §2.13); a
pipeline platform that ships training corpora additionally needs
re-identification risk metrics (k-anonymity over quasi-identifiers) and
distributional fraud screens (Benford's law over money columns).  Both
are pure grouped aggregations — one shuffle each, exact-integer cores,
every derived double a single expression mirrored textually in the
DuckDB oracle.

Scale: ``k_anonymity_profile`` aggregates to |equivalence classes| rows
(bounded by the quasi-identifier domain product, not the corpus), then
explodes 4 k-thresholds per class — |classes|x4 intermediate, one more
tiny aggregation.  ``benford_digit_profile`` aggregates 100 TB of
orders to at most 9 rows.  Neither plan contains a join wider than a
one-row broadcast.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_using_llm_spark.registry import QuerySpec
from data_pipelines_using_llm_spark.sources.tables import load_table

# Re-identification thresholds to report (classic k-anonymity ladder).
K_THRESHOLDS = (2, 5, 10, 20)

# Quasi-identifier bucket width for the document-length dimension.
CHAR_BUCKET = 100

# Benford expectations log10(1 + 1/d), precomputed once in Python and
# injected as the SAME double literal into both engines so no libm
# log10 discrepancy can surface.
BENFORD_EXPECTED = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def k_anonymity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk report over ``documents`` with quasi-identifiers
    (lang, source, floor(n_chars/100)).

    For each k in ``K_THRESHOLDS``: how many equivalence classes have
    fewer than k members, how many rows sit in those classes, and what
    fraction of the corpus is therefore at re-identification risk.

    Plan: one groupBy to class sizes, a 4-way literal explode, one
    groupBy(k) — the second aggregation input is |classes|x4 rows, never
    corpus-sized.  The corpus total joins back as a one-row broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    classes = d.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / CHAR_BUCKET).alias("size_bucket"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    exploded = classes.select(
        "class_size",
        F.explode(F.array(*[F.lit(k) for k in K_THRESHOLDS])).alias("k"),
    )
    below = F.col("class_size") < F.col("k")
    agg = exploded.groupBy("k").agg(
        F.sum(F.when(below, 1).otherwise(0)).alias("classes_below_k"),
        F.sum(F.when(below, F.col("class_size")).otherwise(0)).alias(
            "rows_at_risk"
        ),
    )
    total = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return agg.join(F.broadcast(total)).select(
        "k",
        "classes_below_k",
        "rows_at_risk",
        F.round(F.col("rows_at_risk") / F.col("n_docs"), 6).alias("risk_pct"),
    )


K_ANONYMITY_PROFILE_ORACLE = f"""
WITH classes AS (
    SELECT lang, source,
           CAST(floor(n_chars / {CHAR_BUCKET}) AS BIGINT) AS size_bucket,
           count(*) AS class_size
    FROM documents GROUP BY 1, 2, 3
),
ks AS (SELECT unnest([{", ".join(str(k) for k in K_THRESHOLDS)}]) AS k),
agg AS (
    SELECT k,
           CAST(sum(CASE WHEN class_size < k THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_below_k,
           CAST(sum(CASE WHEN class_size < k THEN class_size ELSE 0 END)
               AS BIGINT) AS rows_at_risk
    FROM classes CROSS JOIN ks GROUP BY k
),
tot AS (SELECT count(*) AS n_docs FROM documents)
SELECT k, classes_below_k, rows_at_risk,
       round(CAST(rows_at_risk AS DOUBLE) / n_docs, 6) AS risk_pct
FROM agg CROSS JOIN tot
"""


def benford_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over ``orders.o_totalprice``.

    The leading significant digit is extracted from the DECIMAL(18,2)
    string rendering (identical formatting on both engines — no
    ``log10``/``pow`` floor that could flip at a power-of-10 boundary).
    Expected shares are Python-precomputed ``log10(1+1/d)`` literals
    injected into both engines; the chi-square contribution
    ``(obs - E)^2 / E`` with ``E = expected * n`` is a single double
    expression over the exact count.  100 TB of orders reduces to <= 9
    rows in one map-side-combinable aggregation.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1.0
    )
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    counts = o.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    total = o.agg(F.count(F.lit(1)).alias("n_total"))
    # 1-indexed literal array lookup keyed by digit.
    expected = F.element_at(
        F.array(*[F.lit(BENFORD_EXPECTED[d]) for d in range(1, 10)]),
        F.col("digit"),
    )
    e_cnt = expected * F.col("n_total")
    return (
        counts.join(F.broadcast(total))
        .select(
            "digit",
            "n_orders",
            F.round(F.col("n_orders") / F.col("n_total"), 6).alias("obs_pct"),
            F.round(expected, 6).alias("expected_pct"),
            F.round(
                (F.col("n_orders") - e_cnt) * (F.col("n_orders") - e_cnt)
                / e_cnt,
                6,
            ).alias("chi2_contrib"),
        )
    )


def _benford_oracle() -> str:
    exp_rows = ", ".join(
        f"({d}, {BENFORD_EXPECTED[d]!r})" for d in range(1, 10)
    )
    return f"""
WITH base AS (
    SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                       1, 1) AS INT) AS digit
    FROM orders WHERE o_totalprice >= 1.0
),
counts AS (SELECT digit, count(*) AS n_orders FROM base GROUP BY 1),
tot AS (SELECT count(*) AS n_total FROM base),
exp AS (SELECT digit, CAST(expected AS DOUBLE) AS expected
        FROM (VALUES {exp_rows}) AS t(digit, expected))
SELECT c.digit, c.n_orders,
       round(CAST(c.n_orders AS DOUBLE) / t.n_total, 6) AS obs_pct,
       round(e.expected, 6) AS expected_pct,
       round((c.n_orders - e.expected * t.n_total)
             * (c.n_orders - e.expected * t.n_total)
             / (e.expected * t.n_total), 6) AS chi2_contrib
FROM counts c JOIN exp e ON e.digit = c.digit CROSS JOIN tot t
"""


def l_diversity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attribute-disclosure complement of
    :func:`k_anonymity_profile` (Machanavajjhala et al. 2007): a class
    can be k-anonymous yet still leak the SENSITIVE attribute if every
    member shares one value.  Quasi-identifiers here are
    (source, floor(n_chars/100)); the sensitive attribute is ``lang``.

    Output: one row per observed diversity level l — how many
    equivalence classes expose exactly l distinct sensitive values, how
    many rows they hold, and the corpus fraction; ``l = 1`` rows are the
    disclosure set.

    Plan: one corpus groupBy to (class, lang) cells, one re-aggregation
    of the CELLS to classes (exact distinct — the cell count per class
    IS the diversity), one tiny histogram aggregation; total n_docs
    joins back as a one-row broadcast.  Nothing after the first shuffle
    is corpus-sized.
    """
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy(
        "source",
        F.floor(F.col("n_chars") / CHAR_BUCKET).alias("size_bucket"),
        "lang",
    ).agg(F.count(F.lit(1)).alias("cell_n"))
    classes = cells.groupBy("source", "size_bucket").agg(
        F.count(F.lit(1)).alias("diversity"),
        F.sum("cell_n").alias("class_size"),
    )
    hist = classes.groupBy("diversity").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").alias("n_rows"),
    )
    total = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return hist.join(F.broadcast(total)).select(
        "diversity",
        "n_classes",
        "n_rows",
        F.round(F.col("n_rows") / F.col("n_docs"), 6).alias("rows_pct"),
    )


L_DIVERSITY_PROFILE_ORACLE = f"""
WITH cells AS (
    SELECT source,
           CAST(floor(n_chars / {CHAR_BUCKET}) AS BIGINT) AS size_bucket,
           lang, count(*) AS cell_n
    FROM documents GROUP BY 1, 2, 3
),
classes AS (
    SELECT source, size_bucket,
           count(*) AS diversity, CAST(sum(cell_n) AS BIGINT) AS class_size
    FROM cells GROUP BY 1, 2
),
hist AS (
    SELECT diversity, count(*) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows
    FROM classes GROUP BY 1
),
tot AS (SELECT count(*) AS n_docs FROM documents)
SELECT diversity, n_classes, n_rows,
       round(CAST(n_rows AS DOUBLE) / n_docs, 6) AS rows_pct
FROM hist CROSS JOIN tot
"""


# (child_table, fk_col, parent_table, pk_col) — the star schema's FK
# edges, audited in one report.
FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
)


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key integrity report over every edge of the star schema:
    per relation, the child row count, NULL-key rows, orphan rows
    (non-null key with no parent), and the resulting coverage ratio —
    the first audit a warehouse ingestion runs, and the one the
    reference's null/duplicate checks (SURVEY.md §2.13) do not cover.

    Scale: each edge is one LEFT ANTI join (child keyed on its FK
    against the parent key set — Spark builds/broadcasts the smaller
    parent side under AQE) plus map-side count aggregations; the
    report is |edges| rows.  Dimension-sized parents broadcast; the
    fact-fact edge (lineitem→orders) shuffles both sides on the key,
    which is the join the warehouse does anyway.
    """
    import functools

    rows = []
    for child, fk, parent, pk in FK_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(fk).alias("fk"))
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("pk"))
        nn = c.filter(F.col("fk").isNotNull())
        orphans = nn.join(
            p, nn["fk"] == p["pk"], "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        tot = c.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(
                F.when(F.col("fk").isNull(), 1).otherwise(0)
            ).alias("n_null_fk"),
        )
        rows.append(
            tot.crossJoin(F.broadcast(orphans)).select(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("relation"),
                "n_child",
                "n_null_fk",
                "n_orphans",
                F.round(
                    (
                        F.col("n_child")
                        - F.col("n_null_fk")
                        - F.col("n_orphans")
                    ).cast("double")
                    / F.col("n_child").cast("double"),
                    6,
                ).alias("fk_coverage"),
            )
        )
    return functools.reduce(lambda a, b: a.unionAll(b), rows)


def _referential_integrity_oracle() -> str:
    parts = []
    for child, fk, parent, pk in FK_EDGES:
        parts.append(f"""
SELECT '{child}.{fk}->{parent}.{pk}' AS relation,
       (SELECT count(*) FROM {child}) AS n_child,
       (SELECT count(*) FROM {child} WHERE {fk} IS NULL) AS n_null_fk,
       (SELECT count(*) FROM {child} c
        LEFT JOIN {parent} p ON p.{pk} = c.{fk}
        WHERE c.{fk} IS NOT NULL AND p.{pk} IS NULL) AS n_orphans,
       round(CAST((SELECT count(*) FROM {child})
                  - (SELECT count(*) FROM {child} WHERE {fk} IS NULL)
                  - (SELECT count(*) FROM {child} c
                     LEFT JOIN {parent} p ON p.{pk} = c.{fk}
                     WHERE c.{fk} IS NOT NULL AND p.{pk} IS NULL)
                 AS DOUBLE)
             / CAST((SELECT count(*) FROM {child}) AS DOUBLE), 6)
           AS fk_coverage""")
    return "\nUNION ALL\n".join(parts)


QUERIES = {
    "referential_integrity_audit": QuerySpec(
        referential_integrity_audit,
        _referential_integrity_oracle(),
        "FK orphan/coverage audit over every star-schema edge",
    ),
    "k_anonymity_profile": QuerySpec(
        k_anonymity_profile,
        K_ANONYMITY_PROFILE_ORACLE,
        "k-anonymity re-identification risk ladder",
    ),
    "benford_digit_profile": QuerySpec(
        benford_digit_profile,
        _benford_oracle(),
        "Benford first-digit distribution screen",
    ),
    "l_diversity_profile": QuerySpec(
        l_diversity_profile,
        L_DIVERSITY_PROFILE_ORACLE,
        "l-diversity attribute-disclosure histogram over QI classes",
    ),
}
