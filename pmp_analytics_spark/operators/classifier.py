"""Hashing-trick logistic-regression quality classifier.

Model-based document filtering is a named stage of real pretraining
pipelines (GPT-3's LR quality filter over CommonCrawl, CCNet/fastText
langid-and-quality, FineWeb's edu classifier): a tiny linear model is
trained on weak labels and its score gates the corpus. The reference has
no analog (north-star LLM-pipeline surface, like DSIR/BPE); this module
is the Spark-native shape of that stage.

Architecture — full-batch gradient descent, engine-deterministic:

- Features are the HASHING TRICK over the shared word tokenizer: bucket
  = md5(token) mod dim (the engine-independent md5 idiom every dedup
  operator uses), value = token count in bucket / doc token count, plus
  a constant bias feature at bucket ``dim``. Sparse (doc, bucket, x)
  rows — one explode + one map-side-combined groupBy, never a dense
  dim-wide vector per doc.
- Each GD iteration is two bounded shuffles over the CACHED feature
  frame: margins (groupBy doc, weights folded in as a broadcast
  dim+1-row table) and gradient (groupBy bucket). The weight vector
  (dim+1 doubles) is collected to the driver per iteration — the same
  bounded-collect contract as PCA/BPE fitting — and re-broadcast.
- Determinism across engines: the per-bucket gradient is ROUNDED
  IN-ENGINE to ``grad_dp`` decimals before the driver-side update. Sum
  order differs between Spark partial aggregation and DuckDB's
  sequential sum only at the ~1e-14 level, far inside the 1e-8 grid, so
  both engines collect bit-identical gradients; the update
  ``w - lr * g`` is then pure IEEE double arithmetic on identical
  inputs. Downstream score comparisons use the sign of the margin
  (never a float-equality on sigmoid outputs).

100 TB posture: feature extraction is one corpus pass; each iteration
moves one (doc-count x ~1 row) and one (dim+1 row) aggregate through a
shuffle with map-side combine; weights travel as a broadcast literal.
Iterations are a small constant — the classifier is O(iters) corpus
passes over a cached narrow frame, exactly how a production LR filter
is fit. Scoring new documents is a pure map-side fold (join-free when
the weight array is folded as literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pmp_analytics_spark.functions.text import tokens

__all__ = [
    "hashed_features",
    "fit_logistic",
    "score_logistic",
    "margin_expression",
]


def _bucket(col, dim: int):
    """md5-based token bucket in [0, dim): engine-independent (DuckDB:
    ``CAST(('0x' || SUBSTRING(MD5(t), 1, 15)) AS BIGINT) % dim``)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % dim
    ).cast("int")


def hashed_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 32,
    binary: bool = False,
) -> DataFrame:
    """Sparse bag-of-buckets features: (id, bucket, x), plus one bias
    row (bucket = dim, x = 1.0) per doc — so every doc has at least one
    feature row and the bias needs no special-casing anywhere (docs with
    ZERO tokens get only the bias row).

    ``binary=False``: x = count(tokens in bucket) / count(tokens) — a
    ratio of two integers, so IEEE division is exact-deterministic and
    identical in every engine. ``binary=True``: presence features
    (x = 1.0 for every touched bucket) — stronger per-feature gradients
    on short synthetic docs, and what fastText-style filters use."""
    from pyspark.sql import Window

    from pmp_analytics_spark.operators.partitioning import ensure_parallelism

    # tokenize is the expensive projection — repartition the narrow text
    # input up to the core count first (no-op on an already-split scan)
    docs = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__t")
    )
    cnt = toks.groupBy(id_col, _bucket(F.col("__t"), dim).alias("bucket")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    if binary:
        per_bucket = cnt.select(id_col, "bucket", F.lit(1.0).alias("x"))
    else:
        per_bucket = cnt.select(
            id_col,
            "bucket",
            (
                F.col("__c")
                / F.sum("__c").over(Window.partitionBy(id_col))
            ).alias("x"),
        )
    bias = docs.select(
        F.col(id_col), F.lit(dim).cast("int").alias("bucket"), F.lit(1.0).alias("x")
    )
    return per_bucket.unionByName(bias)


def fit_logistic(
    spark: SparkSession,
    feats: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "y",
    weight_col: str | None = None,
    dim: int = 32,
    lr: float = 0.5,
    iters: int = 3,
    grad_dp: int = 8,
) -> list[float]:
    """Full-batch GD on sigmoid cross-entropy from w = 0. Returns the
    dim+1 weight vector (last entry = bias). ``feats`` should be cached
    by the caller (consumed twice per iteration). ``weight_col`` names an
    optional per-doc sample weight on ``labels`` (e.g. the class-balanced
    n/(2*n_y), so an imbalanced weak-label corpus doesn't collapse the
    decision threshold into the majority class).

    w starts at zero so iteration 1's sigmoid(0) = 0.5 is EXACT in every
    engine; thereafter determinism rests on the in-engine gradient
    rounding (module docstring). The oracle twin unrolls these exact
    iterations as SQL CTEs."""
    n = labels.count()
    w = [0.0] * (dim + 1)
    sw = F.col(weight_col) if weight_col else F.lit(1.0)
    for _ in range(iters):
        # margins under the current weights via the same literal-array
        # fold the scorer uses (score_logistic ≡ join-based margins is
        # pinned in tests): zero joins and zero broadcasts per
        # iteration, where the former createDataFrame + broadcast-join
        # per step cost 8 driver round-trips per fit — measured ~10x
        # the whole fit's wall inside a long session whose driver is
        # already carrying ~100 queries of listener/broadcast state.
        margins = score_logistic(feats, w, id_col)
        err = labels.join(margins, id_col).select(
            id_col,
            (
                sw
                * (
                    1.0 / (1.0 + F.exp(-F.col("m")))
                    - F.col(label_col).cast("double")
                )
            ).alias("e"),
        )
        grad = (
            feats.join(err, id_col)
            .groupBy("bucket")
            .agg(F.round(F.sum(F.col("x") * F.col("e")) / n, grad_dp).alias("g"))
            .collect()
        )
        g = {r["bucket"]: r["g"] for r in grad}
        w = [wb - lr * g.get(b, 0.0) for b, wb in enumerate(w)]
    return w


def score_logistic(
    feats: DataFrame,
    w: list[float],
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, m) margins under a FIXED weight vector — the weights fold in
    as an array literal indexed per row, so scoring is one
    map-side-combined aggregate and zero joins (the deployment shape:
    ship the tiny model, stream the corpus through it). Predictions
    should derive from ``m``'s SIGN, which is stable under the ~1-ulp
    cross-engine wobble of float sums; sigma(m) itself is monotone in m
    so thresholding at 0.5 is exactly m > 0."""
    arr = F.array(*[F.lit(float(x)) for x in w])
    return (
        feats.withColumn("__w", F.element_at(arr, F.col("bucket") + 1))
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("__w")).alias("m"))
    )


def margin_expression(w: list[float], text_col: str = "text", dim: int = 32):
    """Row-local margin under a FIXED weight vector for BINARY presence
    features: fold the distinct token buckets' weights plus the bias —
    a pure projection expression (no explode, no aggregate operator, no
    state), so it scores a STREAM under any micro-batch slicing and a
    100 TB batch as a map-only pass. Exactly ``score_logistic`` over
    ``hashed_features(binary=True)``: sum of w[bucket] over distinct
    buckets + w[dim]; equivalence is pinned in tests. NULL text scores
    like zero-token text — the bias-only margin — because
    ``hashed_features`` keeps every doc's bias row regardless of text
    (the coalesce below keeps the expression from propagating NULL)."""
    arr = F.array(*[F.lit(float(x)) for x in w])
    bks = F.array_distinct(
        F.transform(
            F.coalesce(tokens(text_col), F.array().cast("array<string>")),
            lambda t: _bucket(t, dim),
        )
    )
    s = F.aggregate(
        F.transform(bks, lambda b: F.element_at(arr, b + 1)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return s + F.lit(float(w[dim]))
