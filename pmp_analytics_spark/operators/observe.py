"""Zero-extra-pass data-quality metrics via ``DataFrame.observe``.

The reference's scripts re-scan their frames to log row counts and null
rates around each pipeline stage (e.g. the height/shape prints sprinkled
through /root/reference/awarxe_cleanup.py and the sanity counts in
/root/reference/delinquent_data_submitters.py). At 100 TB a second scan
per metric is the difference between one pass and N passes — Spark's
observation API instead attaches aggregate expressions to the plan and
collects them AS A SIDE EFFECT of whatever action runs: the metrics ride
the same tasks, same scan, zero extra jobs.

Batch-only here (streaming queries surface the same metrics through
``StreamingQueryProgress.observedMetrics``; the streaming paths in
``streaming/`` already expose progress via ``run_to_memory``'s returned
query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def observed_quality(
    df: DataFrame, null_cols: list[str] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count observations to ``df``.

    Returns ``(df_with_observation, observation)``; run any action on
    the returned frame (write, count, collect), then read
    ``observation.get`` — a dict with ``n_rows`` and ``nulls_<col>``
    for each requested column. The metrics are computed by the SAME
    tasks that execute the action: no second scan, no extra job, which
    is the only acceptable cost model for per-stage counters at scale.

    The observation is single-use (Spark contract): attach a fresh one
    per action.
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    obs = Observation()
    return df.observe(obs, *metrics), obs


def observe_bucket_drops(
    buckets: DataFrame, size_col: str, max_bucket: int, obs: Observation
) -> DataFrame:
    """Attach drop counters for a ``max_bucket`` recall cap (the LSH
    over-common-bucket trim in ``operators/dedup._bucket_pairs``).

    "No silent caps": when a bucket exceeds ``max_bucket`` it is dropped
    for pair expansion — this observation makes the trim measurable
    instead of silent, counting as a side effect of the SAME action that
    consumes the pairs (no extra scan):

    - ``dropped_buckets`` — buckets the cap removed;
    - ``dropped_pairs`` — candidate pairs inside them, ``s*(s-1)/2`` per
      bucket. An upper bound on recall loss per band: a pair in a
      dropped bucket may still surface via another band's bucket.

    ``obs`` is caller-supplied (Spark observations are single-use and
    must outlive the operator call so the caller can read ``obs.get``
    after an action runs).
    """
    s = F.size(size_col).cast("long")
    return buckets.observe(
        obs,
        F.coalesce(
            F.sum((s > max_bucket).cast("long")), F.lit(0).cast("long")
        ).alias("dropped_buckets"),
        F.coalesce(
            F.sum(F.when(s > max_bucket, (s * (s - 1)) / F.lit(2).cast("long"))).cast("long"),
            F.lit(0).cast("long"),
        ).alias("dropped_pairs"),
    )
