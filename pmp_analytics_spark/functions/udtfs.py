"""Python UDTFs (table functions) — Spark 4's set-returning UDF surface.

The reference needs no UDTFs (`explode` covers its only set-returning
pattern, SURVEY.md §2.11); this module exists to round out the engine's
API surface: a UDTF is the escape hatch when one input row must fan out
into a *computed* variable-length relation that higher-order functions
can't express (stateful tokenizers, external parsers, generators).

``ChunkDocs`` deliberately mirrors the pure-JVM chunker used by the
``docs_chunks`` query (queries/extended.py) so the two paths are
cross-checkable; the JVM HOF path is the production one — a UDTF pays
Python+Arrow transfer per row and is the slow path by design. Use it
when the logic genuinely can't be a HOF, and keep ``useArrow=True``.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

from pmp_analytics_spark.functions.text import TOKEN_SPLIT_RE


@udtf(returnType="chunk_idx bigint, n_chunk_tokens bigint, chunk_text string")
class ChunkDocs:
    """Fan one document out into non-overlapping 30-token chunks.

    Same tokenizer as functions.text.tokens() (lowercase, split on
    ``[^a-z0-9]+``, drop empties) so results line up with the JVM path
    and the DuckDB oracle.
    """

    CHUNK = 30

    def eval(self, text: str | None):  # noqa: D102 — UDTF contract
        if text is None:
            return
        toks = [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]
        for i in range(0, len(toks), self.CHUNK):
            piece = toks[i : i + self.CHUNK]
            yield i // self.CHUNK, len(piece), " ".join(piece)


def register_udtfs(spark) -> None:
    """Register all module UDTFs for SQL ``LATERAL`` use."""
    spark.udtf.register("chunk_docs", ChunkDocs)
