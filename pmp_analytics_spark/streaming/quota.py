"""Per-source admission quota on a document ingest stream.

The pipeline shape: a crawl/ingest stream must cap how many documents any
single source contributes to the corpus (per-domain quotas are how
RefinedWeb-style pipelines stop one domain from dominating a dump). The
cap must hold ACROSS micro-batches — a per-batch ``row_number`` cannot see
what earlier batches admitted — so the admitted-count per source is
operator state carried between batches.

Two implementations of identical semantics (cross-checked in tests):

- ``source_quota_stream`` — the Spark 4 ``transformWithStateInPandas``
  form: a ``StatefulProcessor`` with a named, schema'd ``ValueState``
  (``admitted: n BIGINT``). The current-generation API supports several
  independently-named state variables per key, per-variable TTL
  (``ttlDurationMs`` — a rolling daily quota would set it to the reset
  horizon), and registered timers for event-time quota resets. Its
  Python worker protocol needs ``google.protobuf``, which this container
  lacks — the path is import-gated and exercised where protobuf exists.
- ``source_quota_stream_legacy`` — the same state machine on
  ``applyInPandasWithState`` (runs everywhere Spark 3.4+ does); the
  declared query uses ``source_quota_stream_auto`` which picks the new
  API when its dependency is present.

Determinism contract: rows arrive Arrow-batched per (key, micro-batch);
admission sorts the batch by ``doc_id``, so over a doc_id-ordered stream
the admitted set is exactly the first ``n_per_source`` docs of each
source regardless of micro-batch slicing (multi-batch ≡ one-batch is
asserted in tests, and the whole stream against a ``row_number`` oracle).

Scale: one shuffle on ``source`` per micro-batch; state is a single long
per source (O(distinct sources), trivially in-store at 100 TB). Output is
append-mode — each doc is admitted at most once, in the batch where it
arrives.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id BIGINT, source STRING, admit_rank BIGINT"


def _admit(
    source: str, n_prior: int, cap: int, pdfs: Iterator[pd.DataFrame]
) -> tuple[int, pd.DataFrame | None]:
    """Shared admission step: take the first ``cap - n_prior`` docs of the
    batch in doc_id order; return (new_total, emitted rows or None)."""
    remaining = cap - n_prior
    if remaining <= 0:
        for _ in pdfs:  # quota exhausted: consume, emit nothing
            pass
        return n_prior, None
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values("doc_id", kind="mergesort").head(remaining)
    n_admit = len(batch)
    if not n_admit:
        return n_prior, None
    out = pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy(),
            "source": source,
            "admit_rank": range(n_prior + 1, n_prior + n_admit + 1),
        }
    )
    return n_prior + n_admit, out


def transform_with_state_available() -> bool:
    """The transformWithState Python worker speaks protobuf to the state
    server; without the package the stream fails at runner init."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def source_quota_stream(docs: DataFrame, n_per_source: int) -> DataFrame:
    """Quota admission on the Spark 4 arbitrary-state API. Requires
    ``google.protobuf`` at runtime (see module docstring)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class SourceQuotaProcessor(StatefulProcessor):
        def __init__(self, n: int) -> None:
            self._n = n

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._admitted = handle.getValueState("admitted", "n BIGINT")

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
        ) -> Iterator[pd.DataFrame]:
            prior = self._admitted.get()
            n_prior = int(prior[0]) if prior is not None else 0
            total, out = _admit(key[0], n_prior, self._n, rows)
            if total != n_prior:
                self._admitted.update((total,))
            if out is not None:
                yield out

        def close(self) -> None:
            pass

    return docs.groupBy("source").transformWithStateInPandas(
        SourceQuotaProcessor(n_per_source),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def source_quota_stream_legacy(docs: DataFrame, n_per_source: int) -> DataFrame:
    """Same quota state machine on ``applyInPandasWithState``."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n_prior = state.get[0] if state.exists else 0
        total, out = _admit(key[0], n_prior, n_per_source, pdfs)
        if total != n_prior:
            state.update((total,))
        if out is not None:
            yield out

    return docs.groupBy("source").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType="n BIGINT",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def source_quota_stream_auto(docs: DataFrame, n_per_source: int) -> DataFrame:
    """The new-API path when its runtime dependency exists, else legacy —
    identical results either way (same ``_admit`` step, cross-checked in
    ``tests/test_streaming.py``)."""
    if transform_with_state_available():
        return source_quota_stream(docs, n_per_source)
    return source_quota_stream_legacy(docs, n_per_source)
