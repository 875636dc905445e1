"""In-dataflow supervised training: a linear classifier fit by batch
gradient descent where each step is ONE aggregation pass over the corpus.

The 100 TB shape (reference has no counterpart — beyond-reference,
SURVEY.md §7.1 step 8 family): the model is d+1 driver scalars (the
k-means-centroid / PCA-basis control-plane discipline — bounded by
feature width at any corpus size), a training step is one map-side-
combinable aggregation producing d+1 gradient sums, and the weight
update happens on the driver between passes.  K steps cost K corpus
scans and nothing ever shuffles by row — the exact dataflow of
large-scale logistic-regression trainers (Vowpal-Wabbit-style batch
mode, Spark MLlib's own LBFGS data pass), reduced to its deterministic
core.

Determinism (the hash-gate discipline used module-wide):

- the link is a HARD sigmoid ``clamp(z/4 + 1/2, 0, 1)`` — the
  piecewise-linear logistic standard in quantized ML — because ``exp``
  is the one place engines differ in the last ulp; multiply/add/clamp
  are IEEE-identical everywhere;
- each gradient component is folded as ``Σ floor(err·x·2^30)`` into an
  int64 — exact and order-free, so the gradient (and therefore the
  whole weight trajectory) is a pure function of the data, never of
  partitioning;
- the driver-side update ``w − lr·(g/2^30/n)`` uses the same operation
  order the SQL oracle's weight CTEs state, so both engines walk
  bit-identical trajectories.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAD_Q = float(2**30)  # gradient quantization step (order-free int sums)
OLS_Q = float(2**24)  # label-moment quantization for the one-pass OLS


def hard_sigmoid(z: Column) -> Column:
    """Piecewise-linear logistic link ``clamp(0.25·z + 0.5, 0, 1)`` —
    exact arithmetic only, so scores are bit-identical cross-engine
    (the reason this trainer avoids ``exp``)."""
    return F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), z * F.lit(0.25) + F.lit(0.5))
    )


def linear_score(feature_cols: list[str], weights: list[float]) -> Column:
    """``w0 + Σ wj·xj`` with the fixed left-to-right association the
    oracle mirrors (association changes last-ulp bits)."""
    z = F.lit(float(weights[0]))
    for j, c in enumerate(feature_cols):
        z = z + F.lit(float(weights[j + 1])) * F.col(c)
    return z


def linear_classifier_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 6,
    lr: float = 4.0,
) -> list[float]:
    """Fit ``[bias, w1..wd]`` by ``steps`` batch-GD passes.

    Per step: err = hard_sigmoid(z) − y per row (a projection), then
    d+1 quantized gradient sums in one aggregation; the update runs on
    the driver.  Squared-loss gradient under the hard-sigmoid link
    (err·x), clamp regions included — simple, monotone, and exactly
    mirrorable in SQL."""
    n = df.count()
    if n == 0:
        raise ValueError("linear_classifier_train: empty training set")
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(steps):
        err = hard_sigmoid(linear_score(feature_cols, w)) - F.col(
            label_col
        ).cast("double")
        aggs = [
            F.sum(F.floor(err * F.lit(GRAD_Q))).cast("long").alias("g0")
        ] + [
            F.sum(F.floor(err * F.col(c) * F.lit(GRAD_Q)))
            .cast("long")
            .alias(f"g{j + 1}")
            for j, c in enumerate(feature_cols)
        ]
        g = df.agg(*aggs).first()
        w = [
            w[j] - lr * (float(g[f"g{j}"]) / GRAD_Q / n)
            for j in range(len(w))
        ]
    return w


def ols_fit_one_pass(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> list[float]:
    """Closed-form least squares ``y ~ b0 + Σ bj·xj`` for exactly TWO
    INTEGER-valued features, fit in ONE corpus scan — the classic
    distributed-ML primitive: accumulate the normal-equation moments
    (X^T X and X^T y) as map-side-combinable sums, solve the 3x3 system
    on the driver, and never touch the rows again.  At 100 TB the cost
    is one scan producing nine scalars.

    Determinism, the hash-gate discipline: the X^T X entries are sums
    of products of integers — EXACT int64, no quantization needed; the
    X^T y moments quantize the double label (``Σ floor(xj·y·2^24)`` —
    exact, order-free); the Cramer solve casts the integer moments to
    double and uses the fixed term order the SQL oracle states, so both
    engines produce bit-identical coefficients.  (Integer determinants
    would overflow int64 at scale — products of three ~1e9 moments —
    which is why the solve is double-space on BOTH sides.)

    Returns ``[b0, b1, b2]``.  Raises on a singular system (collinear
    features), d != 2, or an empty input.
    """
    if len(feature_cols) != 2:
        raise ValueError(
            "ols_fit_one_pass solves the 3x3 normal equations: pass "
            f"exactly two integer feature columns, got {feature_cols}"
        )
    x1, x2 = (F.col(c).cast("long") for c in feature_cols)
    y = F.col(label_col).cast("double")
    m = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(F.floor(y * F.lit(OLS_Q))).alias("sy"),
        F.sum(F.floor(x1.cast("double") * y * F.lit(OLS_Q))).alias("sy1"),
        F.sum(F.floor(x2.cast("double") * y * F.lit(OLS_Q))).alias("sy2"),
    ).first()
    if not m["n"]:
        raise ValueError("ols_fit_one_pass: empty input")
    n = float(m["n"])
    s1, s2 = float(m["s1"]), float(m["s2"])
    s11, s12, s22 = float(m["s11"]), float(m["s12"]), float(m["s22"])
    sy = float(m["sy"]) / OLS_Q
    sy1 = float(m["sy1"]) / OLS_Q
    sy2 = float(m["sy2"]) / OLS_Q

    def det3(a, b, c, d, e, f, g, h, i):
        # fixed association, mirrored verbatim in the SQL oracle
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    if det == 0.0:
        raise ValueError(
            "ols_fit_one_pass: singular normal equations (collinear or "
            "constant features)"
        )
    b0 = det3(sy, s1, s2, sy1, s11, s12, sy2, s12, s22) / det
    b1 = det3(n, sy, s2, s1, sy1, s12, s2, sy2, s22) / det
    b2 = det3(n, s1, sy, s1, s11, sy1, s2, s12, sy2) / det
    return [b0, b1, b2]
