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
