"""Lexical retrieval: BM25 scoring and reciprocal-rank fusion.

The missing half of a retrieval stack next to the ANN family
(``similarity_search``): BM25 is the lexical baseline every hybrid
search pairs with dense vectors, and RRF is the standard way to fuse
the two ranked lists without score calibration (Cormack et al. 2009 —
1/(k + rank) sums are scale-free, so a cosine in [-1,1] and an
unbounded BM25 fuse without normalization).

Scale shape of ``bm25_topk``:

- document stats (term frequency, doc length, document frequency) are
  plain aggregate trees over the exploded token stream — map-side
  partial aggregation, one shuffle each, computed once per corpus and
  reusable across query batches;
- document frequency is computed AFTER a semi-join onto the query term
  universe — df for the whole vocabulary is never materialized;
- query term sets are broadcast; scoring joins the tf stream on the
  term (the posting-list join), aggregates per (query, doc), and
  top-k cuts with the same two-window pre-cut the ANN operators use
  (partition-local cut first, so no per-query single-reducer hotspot).
  The principled next step at extreme scale is an impact-ordered index
  with WAND-style early termination — out of scope here, noted for the
  record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    doc_tokens: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    token_col: str = "token",
    query_id: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k documents per query by BM25.

    ``doc_tokens``: one row per token OCCURRENCE (id_col, token_col) —
    the exploded corpus stream. ``query_terms``: DISTINCT (query_id,
    token_col) rows (query-side weights are the standard bag-of-one
    each). Returns (query_id, id_col, bm25, rank), rank 1..k per query
    ordered by rounded score desc with id tie-break. ``exclude_self``
    drops the query_id == doc id row (self-retrieval) before ranking.
    """
    tf = doc_tokens.groupBy(id_col, token_col).agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = doc_tokens.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    terms = F.broadcast(query_terms.select(query_id, token_col).distinct())
    # df only over the query-term universe — never the whole vocabulary
    df_t = (
        tf.join(terms.select(token_col).distinct(), token_col, "left_semi")
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("df"))
    )

    postings = (
        tf.join(terms, token_col)  # the posting-list join, term-keyed
        .join(F.broadcast(df_t), token_col)
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    scored = postings.groupBy(query_id, id_col).agg(
        F.round(F.sum(contrib), 6).alias("bm25")
    )
    if exclude_self:
        scored = scored.where(F.col(query_id) != F.col(id_col))

    # Two-window top-k: partition-local pre-cut, then the bounded global
    # window (same exactness argument as similarity_search.brute_force).
    pre = Window.partitionBy(F.spark_partition_id(), query_id).orderBy(
        F.desc("bm25"), F.asc(id_col)
    )
    final = Window.partitionBy(query_id).orderBy(F.desc("bm25"), F.asc(id_col))
    return (
        scored.withColumn("__p", F.row_number().over(pre))
        .where(F.col("__p") <= k)
        .drop("__p")
        .withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int = 5,
    rrf_k: int = 60,
    query_id: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion: each input carries (query_id, id_col,
    rank_col); a candidate's fused score sums 1/(rrf_k + rank) over the
    lists that retrieved it (absent = contributes 0 — the union shape).
    Returns the fused top-k per query with deterministic id tie-break.

    Inputs are top-k lists (bounded per query), so the union + one
    aggregate + one bounded window is O(q · Σk) — fusion never touches
    corpus-sized data."""
    tagged = [
        df.select(
            query_id,
            F.col(id_col).alias("__id"),
            (1.0 / (F.lit(rrf_k) + F.col(rank_col))).alias("__c"),
        )
        for df in ranked_lists
    ]
    allc = tagged[0]
    for t in tagged[1:]:
        allc = allc.unionByName(t)
    fused = allc.groupBy(query_id, "__id").agg(
        F.round(F.sum("__c"), 6).alias("rrf_score")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("rrf_score"), F.asc("__id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumnRenamed("__id", id_col)
    )
