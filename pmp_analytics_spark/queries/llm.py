"""LLM-data-pipeline queries (north-star extension surface).

Dedup, similarity search, and text analysis over the ``documents`` and
``embeddings`` tables. Every operator is shuffle-aware and oracle-checked
against DuckDB where ANSI-SQL-expressible; the md5 hash family is used for
fingerprints/MinHash precisely because it is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pmp_analytics_spark.functions.text import (
    fingerprint,
    langid_guess,
    mean_token_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
from pmp_analytics_spark.operators.dedup import minhash_lsh_candidates, ngram_jaccard_dedup
from pmp_analytics_spark.operators.similarity_search import brute_force_topk
from pmp_analytics_spark.sources.reader import load_table

QUERIES: dict = {}
# Values are SQL strings, or a zero-arg callable returning SQL-or-None for
# oracles that are expensive to build (resolved lazily by all_oracles()).
ORACLE: dict = {}

# DuckDB equivalent of functions.text.tokens()
_DUCK_TOKENS = "LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), t -> t <> '')"


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Q: docs_exact_dedup — normalization-invariant exact dedup: one shuffle on
# the md5 fingerprint (uniform key, no skew); keeps min doc_id per group.
# --------------------------------------------------------------------------
@query(
    "docs_exact_dedup",
    f"""
    SELECT MD5(ARRAY_TO_STRING({_DUCK_TOKENS}, ' ')) AS fp,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", fingerprint("text"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_count"))
    )


# --------------------------------------------------------------------------
# Q: docs_token_stats — token counting (whitespace+punct tokenizer) and
# length statistics; the cheap text-profiling pass of a corpus pipeline.
# --------------------------------------------------------------------------
@query(
    "docs_token_stats",
    f"""
    WITH tk AS (SELECT doc_id, n_chars, {_DUCK_TOKENS} AS toks FROM documents)
    SELECT doc_id,
           CAST(LEN(toks) AS BIGINT) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(toks)) AS BIGINT) AS n_unique_tokens,
           ROUND(CASE WHEN LEN(toks) > 0
                 THEN LIST_SUM(LIST_TRANSFORM(toks, t -> LENGTH(t))) * 1.0 / LEN(toks)
                 ELSE 0.0 END, 4) AS mean_token_len,
           n_chars
    FROM tk
    """,
)
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens("text"))).cast("long").alias("n_unique_tokens"),
        F.round(mean_token_len("text"), 4).alias("mean_token_len"),
        "n_chars",
    )


# --------------------------------------------------------------------------
# Q: docs_quality — quality scoring (length/punct/stopword ratios), the
# standard cheap pre-filter for corpus cleaning.
# --------------------------------------------------------------------------
@query(
    "docs_quality",
    f"""
    WITH feats AS (
        SELECT doc_id,
               LENGTH(text) AS n,
               LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct,
               {_DUCK_TOKENS} AS toks
        FROM documents
    ), ratios AS (
        SELECT doc_id,
               CASE WHEN n > 0 THEN n_punct * 1.0 / n ELSE 0.0 END AS punct_ratio,
               CASE WHEN LEN(toks) > 0
                    THEN LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(
                        ['the','and','of','to','in','is','that','for','with','as'], t))) * 1.0 / LEN(toks)
                    ELSE 0.0 END AS stopword_ratio,
               n
        FROM feats
    )
    SELECT doc_id,
           ROUND(punct_ratio, 6) AS punct_ratio,
           ROUND(stopword_ratio, 6) AS stopword_ratio,
           ROUND((LEAST(n / 500.0, 1.0)
                  + (1.0 - LEAST(punct_ratio * 5.0, 1.0))
                  + LEAST(stopword_ratio * 4.0, 1.0)) / 3.0, 6) AS quality
    FROM ratios
    """,
)
def docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(stopword_ratio("text"), 6).alias("stopword_ratio"),
        quality_score("text").alias("quality"),
    )


# --------------------------------------------------------------------------
# Q: docs_langid — stopword-heuristic language ID vs the labeled lang
# column; per-language agreement counts.
# --------------------------------------------------------------------------
@query(
    "docs_langid",
    f"""
    WITH tk AS (SELECT doc_id, lang, {_DUCK_TOKENS} AS toks FROM documents),
    hits AS (
        SELECT doc_id, lang,
          LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['the','and','of','to','in','is','that','for','with','as'], t))) AS h_en,
          LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['el','la','de','que','y','en','los','del','las','por'], t))) AS h_es,
          LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['le','la','de','et','les','des','en','un','une','du'], t))) AS h_fr,
          LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['der','die','und','das','von','zu','den','mit','ist','im'], t))) AS h_de
        FROM tk
    ), guess AS (
        SELECT doc_id, lang,
               CASE WHEN GREATEST(h_en, h_es, h_fr, h_de) <= 0 THEN 'und'
                    WHEN h_en = GREATEST(h_en, h_es, h_fr, h_de) THEN 'en'
                    WHEN h_es = GREATEST(h_en, h_es, h_fr, h_de) THEN 'es'
                    WHEN h_fr = GREATEST(h_en, h_es, h_fr, h_de) THEN 'fr'
                    ELSE 'de' END AS lang_guess
        FROM hits
    )
    SELECT lang, lang_guess, COUNT(*) AS n_docs
    FROM guess GROUP BY lang, lang_guess
    """,
)
def docs_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", langid_guess("text").alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Q: docs_fingerprint_sample — document fingerprinting exposed row-level
# (md5 over normalized tokens), deterministic sample for inspection.
# --------------------------------------------------------------------------
@query(
    "docs_fingerprint_sample",
    f"""
    SELECT doc_id,
           MD5(ARRAY_TO_STRING({_DUCK_TOKENS}, ' ')) AS fp,
           source
    FROM documents
    ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 50
    """,
)
def docs_fingerprint_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint("text").alias("fp"), "source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .limit(50)
    )


# --------------------------------------------------------------------------
# Q: docs_neardup_pairs — MinHash(md5)+LSH banding candidates verified with
# exact shingle Jaccard. The oracle recomputes the identical md5-family
# signatures in SQL (engine-independent by construction).
# --------------------------------------------------------------------------
_SEEDS = list(range(16))
_BANDS = 4
_ROWS_PER_BAND = 4
_SHINGLE_K = 5
_JACCARD_T = 0.6

_DUCK_SHINGLES = (
    "LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LENGTH(LOWER(text)) - 4, 0)), "
    "i -> SUBSTRING(LOWER(text), CAST(i AS INT), 5))"
)
# Universal-hash MinHash mirroring functions.text.minhash_signature: one
# 60-bit md5-derived integer per shingle, then (a_i·x + b_i) mod P per seed.
from pmp_analytics_spark.functions.text import MINHASH_P, minhash_params  # noqa: E402

_PARAMS = minhash_params(len(_SEEDS))
_DUCK_SHINGLE_HASH = (
    "LIST_TRANSFORM(sh, s -> CAST(('0x' || SUBSTRING(MD5(s), 1, 15)) AS BIGINT) "
    f"% {MINHASH_P})"
)
_DUCK_SIG = ", ".join(
    f"LIST_MIN(LIST_TRANSFORM(hs, x -> ({a} * x + {b}) % {MINHASH_P})) AS m{i}"
    for i, (a, b) in enumerate(_PARAMS)
)
_DUCK_BAND_ROWS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id, "
    + "MD5("
    + " || '|' || ".join(f"CAST(m{b * _ROWS_PER_BAND + r} AS VARCHAR)" for r in range(_ROWS_PER_BAND))
    + ") AS band_key FROM sig"
    for b in range(_BANDS)
)


@query(
    "docs_neardup_pairs",
    f"""
    WITH sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents
        WHERE LENGTH(text) >= 5
    ), hashed AS (
        SELECT doc_id, {_DUCK_SHINGLE_HASH} AS hs FROM sh
    ), sig AS (
        SELECT doc_id, {_DUCK_SIG} FROM hashed
    ), banded AS (
        {_DUCK_BAND_ROWS}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
    ), dsh AS (
        SELECT doc_id, LIST_DISTINCT(hs) AS dsh FROM hashed
    ), scored AS (
        SELECT id_a, id_b,
               LEN(LIST_INTERSECT(a.dsh, b.dsh)) * 1.0 /
               (LEN(a.dsh) + LEN(b.dsh) - LEN(LIST_INTERSECT(a.dsh, b.dsh))) AS j
        FROM cand JOIN dsh a ON cand.id_a = a.doc_id
                  JOIN dsh b ON cand.id_b = b.doc_id
    )
    SELECT id_a, id_b, ROUND(j, 6) AS jaccard
    FROM scored WHERE j >= {_JACCARD_T}
    """,
)
def docs_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_dedup(
        docs,
        text_col="text",
        id_col="doc_id",
        shingle_k=_SHINGLE_K,
        threshold=_JACCARD_T,
        num_hashes=len(_SEEDS),
        bands=_BANDS,
    ).withColumnsRenamed({"jaccard": "jaccard"})


# --------------------------------------------------------------------------
# Q: docs_incremental_neardup — batch-vs-corpus near-dup ingest check:
# the newest ~20% of docs (the "incoming batch") probe the older 80%'s
# LSH band-bucket store; bucket collisions verify with exact Jaccard.
# The oracle replays the identical deterministic pipeline in SQL —
# shingle→md5 hash→MinHash signature→band keys on BOTH sides, cross-side
# bucket join, set-Jaccard verify — so bucket assignment and scoring are
# byte-identical (same _DUCK_* machinery as docs_neardup_pairs).
# --------------------------------------------------------------------------
@query(
    "docs_incremental_neardup",
    f"""
    WITH cut AS (
        SELECT (MAX(doc_id) * 4) // 5 AS c FROM documents
    ), sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents
        WHERE LENGTH(text) >= 5
    ), hashed AS (
        SELECT doc_id, {_DUCK_SHINGLE_HASH} AS hs FROM sh
    ), sig AS (
        SELECT doc_id, {_DUCK_SIG} FROM hashed
    ), banded AS (
        {_DUCK_BAND_ROWS}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
        CROSS JOIN cut
        WHERE a.doc_id >= cut.c AND b.doc_id < cut.c
    ), dsh AS (
        SELECT doc_id, LIST_DISTINCT(hs) AS dsh FROM hashed
    ), scored AS (
        SELECT id_a, id_b,
               LEN(LIST_INTERSECT(a.dsh, b.dsh)) * 1.0 /
               (LEN(a.dsh) + LEN(b.dsh) - LEN(LIST_INTERSECT(a.dsh, b.dsh))) AS j
        FROM cand JOIN dsh a ON cand.id_a = a.doc_id
                  JOIN dsh b ON cand.id_b = b.doc_id
    )
    SELECT id_a, id_b, ROUND(j, 6) AS jaccard
    FROM scored WHERE ROUND(j, 6) >= {_JACCARD_T}
    """,
)
def docs_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import neardup_probe

    cut, ex, ex_h, keys_h = _neardup_ingest_store(spark, sf_dir)
    return neardup_probe(
        ex_h,
        keys_h,
        ex.where(F.col("doc_id") >= cut),
        "doc_id",
        threshold=_JACCARD_T,
        num_hashes=len(_SEEDS),
        bands=_BANDS,
    )


_INGEST_STORE_MEMO: dict[tuple[str, str], tuple] = {}
"""Session-scoped memo of the historical bucket store, keyed by
(applicationId, sf_dir). At deployment the store is PERSISTED state — a
bucket-store table pair maintained at corpus-ingest time, not rebuilt
per probe — so within one session the two ingest queries (batch +
streaming) share one cached build instead of re-deriving the corpus
explode + signatures each. Entries from a stopped session are inert
(new sessions get a new applicationId); ``clear_neardup_ingest_store``
unpersists explicitly for memory-sensitive harnesses."""


def clear_neardup_ingest_store() -> None:
    """Unpersist and drop every memoized ingest store (see
    ``_INGEST_STORE_MEMO``)."""
    for _, _, _, keys_h in _INGEST_STORE_MEMO.values():
        try:
            keys_h.unpersist()
        except Exception:  # session already stopped
            pass
    _INGEST_STORE_MEMO.clear()


def _neardup_ingest_store(spark: SparkSession, sf_dir: str):
    """Shared derivation for the two incremental-ingest queries (batch +
    streaming): the deterministic newest-fifth cut and the history
    side's bucket store. One definition keeps cut formula / shingle_k /
    seed count / band count in lockstep across both declared queries and
    their SHARED SQL-replay oracle. Both sides come as filters of ONE
    corpus-wide exploded stream: a single explode pass, plan-identical
    to the subtree the self-dedup pipeline caches — a multi-query
    session computes the shingle hashes once for all dedup paths.

    The band-key store ``keys_h`` (bands rows per doc — the small,
    probe-hot state) is cached and memoized per (session, sf_dir) — the
    in-session model of the persisted bucket-store table the deployment
    maintains at ingest time. The exploded hash stream ``ex_h`` stays
    UNCACHED on purpose: it is shingle-count-sized (orders of magnitude
    larger), the verify stage consumes it exactly once per probe behind
    a candidate semi-join, and materializing it costs more than the
    recompute it would save (measured 2x slower at sf0.1).

    Returns (cut, corpus_ex, ex_h, keys_h); the cut is one scalar agg
    collect — bounded by definition."""
    from pmp_analytics_spark.operators.dedup import (
        band_key_frame,
        exploded_shingle_hashes,
        minhash_signatures,
    )

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    hit = _INGEST_STORE_MEMO.get(memo_key)
    if hit is not None:
        return hit
    docs = load_table(spark, sf_dir, "documents")
    cut = docs.agg(F.max("doc_id")).collect()[0][0] * 4 // 5
    ex = exploded_shingle_hashes(docs, "text", "doc_id", _SHINGLE_K)
    ex_h = ex.where(F.col("doc_id") < cut)
    keys_h = band_key_frame(
        minhash_signatures(ex_h, "doc_id", len(_SEEDS)), "doc_id", len(_SEEDS), _BANDS
    ).cache()
    _INGEST_STORE_MEMO[memo_key] = (cut, ex, ex_h, keys_h)
    return cut, ex, ex_h, keys_h


# --------------------------------------------------------------------------
# Q: streaming_neardup_ingest — the STREAMING form of
# docs_incremental_neardup: the ingest batch arrives through the custom
# pyshard stream source; each micro-batch probes the static historical
# bucket store via foreachBatch (streaming/ingest.py) and lands its
# pairs in a per-batch-id idempotent parquet sink. Deterministic
# regardless of how the stream splits into micro-batches (each new doc's
# matches depend only on that doc and the static history), so the oracle
# is the SAME full SQL replay as the batch query — the strongest check a
# streaming path can get.
# --------------------------------------------------------------------------
@query("streaming_neardup_ingest", ORACLE["docs_incremental_neardup"])
def streaming_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from pmp_analytics_spark.sources import pydatasource
    from pmp_analytics_spark.streaming import neardup_ingest_stream

    cut, _, ex_h, keys_h = _neardup_ingest_store(spark, sf_dir)
    pydatasource.register(spark)
    batch_stream = (
        spark.readStream.format("pyshard")
        .option("path", f"{sf_dir}/documents.parquet")
        .load()
        .where(F.col("doc_id") >= cut)
    )
    # Working dirs live under one fixed parent; this run's dir is
    # removed ON SUCCESS below (the result detaches from the files via
    # localCheckpoint first). The stale-dir purge stays as a backstop
    # for crashed runs, whose dirs would otherwise leak until the next
    # invocation.
    from pmp_analytics_spark.streaming import stream_workdir

    work = stream_workdir("pmp_neardup_ingest")
    out_path, checkpoint = f"{work}/pairs", f"{work}/ckpt"
    neardup_ingest_stream(
        ex_h,
        keys_h,
        batch_stream,
        "text",
        "doc_id",
        out_path,
        checkpoint,
        shingle_k=_SHINGLE_K,
        threshold=_JACCARD_T,
        num_hashes=len(_SEEDS),
        bands=_BANDS,
        own_cache=False,  # store is the memoized session store — outlives this drain
    )
    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("jaccard", DoubleType()),
        ]
    )
    try:
        out = spark.read.parquet(out_path).select("id_a", "id_b", "jaccard")
        # Materialize into executor storage (distributed, no driver
        # collect — pairs are ingest-batch-sized, not corpus-sized) so
        # the temp sink can be deleted NOW instead of leaking until the
        # next invocation. A production deployment keeps the sink as
        # the output table and skips both steps.
        out = out.localCheckpoint(eager=True)
    except Exception:  # all micro-batches empty: no files written
        out = spark.createDataFrame([], schema)
    shutil.rmtree(work, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# Q: docs_decontamination_report — FUZZY benchmark decontamination as a
# per-source report: the held-out eval slice (doc_id < 25, same split as
# the exact-8-gram docs_contamination) probes the train corpus through
# the MinHash band-bucket store (operators/dedup.py::incremental_neardup
# — eval side broadcasts, the corpus never shuffles), and every train
# doc whose verified Jaccard clears the decontamination threshold is
# counted against its source. The two-tier hygiene pair: the exact
# n-gram query catches verbatim leakage, this one catches paraphrased /
# near-dup leakage, and the per-source pct is the actionable output (a
# leaking source gets dropped, not individual docs). Oracle: the same
# deterministic MinHash pipeline in SQL, aggregated per source.
# --------------------------------------------------------------------------
_DECON_EVAL_MAX = 25
_DECON_T = 0.5


@query(
    "docs_decontamination_report",
    f"""
    WITH sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents
        WHERE LENGTH(text) >= 5
    ), hashed AS (
        SELECT doc_id, {_DUCK_SHINGLE_HASH} AS hs FROM sh
    ), sig AS (
        SELECT doc_id, {_DUCK_SIG} FROM hashed
    ), banded AS (
        {_DUCK_BAND_ROWS}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
        WHERE a.doc_id < {_DECON_EVAL_MAX} AND b.doc_id >= {_DECON_EVAL_MAX}
    ), dsh AS (
        SELECT doc_id, LIST_DISTINCT(hs) AS dsh FROM hashed
    ), scored AS (
        SELECT id_b,
               LEN(LIST_INTERSECT(a.dsh, b.dsh)) * 1.0 /
               (LEN(a.dsh) + LEN(b.dsh) - LEN(LIST_INTERSECT(a.dsh, b.dsh))) AS j
        FROM cand JOIN dsh a ON cand.id_a = a.doc_id
                  JOIN dsh b ON cand.id_b = b.doc_id
    ), contaminated AS (
        SELECT DISTINCT id_b AS train_id FROM scored
        WHERE ROUND(j, 6) >= {_DECON_T}
    )
    SELECT d.source, COUNT(*) AS n_docs,
           COUNT(c.train_id) AS n_contaminated,
           ROUND(COUNT(c.train_id) * 1.0 / COUNT(*), 6) AS contaminated_pct
    FROM documents d LEFT JOIN contaminated c ON d.doc_id = c.train_id
    WHERE d.doc_id >= {_DECON_EVAL_MAX}
    GROUP BY d.source
    """,
)
def docs_decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import incremental_neardup

    docs = load_table(spark, sf_dir, "documents")
    evl = docs.where(F.col("doc_id") < _DECON_EVAL_MAX)
    train = docs.where(F.col("doc_id") >= _DECON_EVAL_MAX)
    pairs = incremental_neardup(
        train,
        evl,
        "text",
        "doc_id",
        shingle_k=_SHINGLE_K,
        threshold=_DECON_T,
        num_hashes=len(_SEEDS),
        bands=_BANDS,
    )
    contaminated = (
        pairs.select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("__c", F.lit(1))
    )
    return (
        train.join(F.broadcast(contaminated), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("__c").alias("n_contaminated"),
            F.round(
                F.count("__c").cast("double") / F.count(F.lit(1)), 6
            ).alias("contaminated_pct"),
        )
    )


# --------------------------------------------------------------------------
# Q: docs_jaccard_exact_pairs — EXACT n-gram Jaccard near-dup pairs via
# prefix filtering (AllPairs/PPJoin family) — the lossless counterpart to
# docs_neardup_pairs' MinHash sketch. Because prefix filtering is
# complete (every pair with J >= t is found), the oracle is brute-force
# pairwise Jaccard over the same hashed shingle sets, with the lossless
# size filter (t·|A| <= |B| <= |A|/t) pruning the quadratic pair space.
# Both sides compare the UNROUNDED ratio and round only for display.
#
# Bounded slice (doc_id < 1000), same framing as embedding_neardup_exact:
# this synthetic corpus draws shingles from a ~2k-token universe (avg
# token df ≈ 500 at sf0.1), which DEGENERATES every exact set-similarity
# join — no prefix is rare, so candidates approach all-pairs. That is a
# property of the data, not the algorithm; at 100 TB the exact join runs
# where exactness is required (contamination audits, eval-slice dedup)
# and the MinHash screen handles the open corpus.
# --------------------------------------------------------------------------
_PJ_T = 0.5
_PJ_MAX_ID = 1000


@query(
    "docs_jaccard_exact_pairs",
    f"""
    WITH sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents
        WHERE LENGTH(text) >= 5 AND doc_id < {_PJ_MAX_ID}
    ), d AS (
        SELECT doc_id, LIST_DISTINCT({_DUCK_SHINGLE_HASH}) AS s FROM sh
    ), scored AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               LEN(LIST_INTERSECT(a.s, b.s)) * 1.0 /
               (LEN(a.s) + LEN(b.s) - LEN(LIST_INTERSECT(a.s, b.s))) AS j
        FROM d a JOIN d b
          ON a.doc_id < b.doc_id
         AND LEN(b.s) >= CEIL({_PJ_T} * LEN(a.s))
         AND LEN(a.s) >= CEIL({_PJ_T} * LEN(b.s))
    )
    SELECT id_a, id_b, ROUND(j, 6) AS jaccard
    FROM scored WHERE j >= {_PJ_T}
    """,
)
def docs_jaccard_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import jaccard_prefix_join

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < _PJ_MAX_ID
    )
    return jaccard_prefix_join(
        docs, text_col="text", id_col="doc_id", shingle_k=_SHINGLE_K, threshold=_PJ_T
    )


# --------------------------------------------------------------------------
# Q: docs_containment_pairs — EXACT asymmetric CONTAINMENT pairs:
# directional (id_a, id_b) with |A∩B|/|A| >= t — "A quoted inside B",
# the relation symmetric Jaccard structurally misses for size-mismatched
# docs (J ≈ |A|/|B| → 0 while containment → 1). Prefix filtering prunes
# only the contained side (see operators.dedup.containment_prefix_join);
# the oracle is brute-force directional containment over the same hashed
# shingle sets with the one-sided size prune. Same bounded slice and
# framing as docs_jaccard_exact_pairs (the data's 2k-token universe
# degenerates any exact set join; the operator is the scale-correct
# formulation and is property-tested unbounded at small n).
# --------------------------------------------------------------------------
_CT_T = 0.9


@query(
    "docs_containment_pairs",
    f"""
    WITH sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents
        WHERE LENGTH(text) >= 5 AND doc_id < {_PJ_MAX_ID}
    ), d AS (
        SELECT doc_id, LIST_DISTINCT({_DUCK_SHINGLE_HASH}) AS s FROM sh
    ), scored AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               LEN(LIST_INTERSECT(a.s, b.s)) * 1.0 / LEN(a.s) AS c
        FROM d a JOIN d b
          ON a.doc_id <> b.doc_id
         AND LEN(b.s) >= CEIL({_CT_T} * LEN(a.s))
    )
    SELECT id_a, id_b, ROUND(c, 6) AS containment
    FROM scored WHERE c >= {_CT_T}
    """,
)
def docs_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import containment_prefix_join

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < _PJ_MAX_ID
    )
    return containment_prefix_join(
        docs, text_col="text", id_col="doc_id", shingle_k=_SHINGLE_K, threshold=_CT_T
    )


# --------------------------------------------------------------------------
# Q: embedding_topk — brute-force cosine top-k similarity search; the exact
# baseline (queries broadcast, corpus scanned once, two-window top-k cut
# — partition-local pre-cut, then a bounded per-query window).
# --------------------------------------------------------------------------
_TOPK = 5
_NQ = 10


def _topk_oracle(extra_q_cols: str = "", pair_where: str = "") -> str:
    """The brute-force cosine top-k oracle, shared by every filtered
    variant so the ROUND precision / tie-break / rank-cast convention
    cannot drift between them (``extra_q_cols`` extends the query-side
    projection; ``pair_where`` filters the scored cross join)."""
    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv{extra_q_cols}
        FROM embeddings WHERE vec_id < {_NQ}
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               ROUND(LIST_COSINE_SIMILARITY(
                   CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS cosine_sim
        FROM embeddings e CROSS JOIN q{pair_where}
    ), ranked AS (
        SELECT query_id, vec_id, cosine_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, cosine_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_TOPK}
    """


@query("embedding_topk", _topk_oracle())
def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = brute_force_topk(emb, queries_df, k=_TOPK)
    return out.withColumn("rank", F.col("rank").cast("long"))


# --------------------------------------------------------------------------
# Q: embedding_hard_negatives — hard-negative mining for contrastive
# training (operators/similarity_search.py::hard_negative_topk): per
# anchor vector, the top-k most-similar vectors of a DIFFERENT label —
# the negatives nearest the decision boundary (the DPR/SimCSE data-prep
# step). Anchors broadcast, label-mismatch filter map-side before the
# exact two-window top-k cut. Oracle: the same scored ranking with the
# label filter in SQL.
# --------------------------------------------------------------------------
@query(
    "embedding_hard_negatives",
    _topk_oracle(
        extra_q_cols=", label AS qlabel",
        pair_where="\n        WHERE e.label <> q.qlabel",
    ),
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.similarity_search import (
        hard_negative_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    out = hard_negative_topk(emb, anchors, k=_TOPK)
    return out.withColumn("rank", F.col("rank").cast("long"))


# --------------------------------------------------------------------------
# Q: embedding_label_centroids — per-label mean embedding summary (the
# aggregation side of embedding analytics; array-wise avg via posexplode).
# --------------------------------------------------------------------------
@query(
    "embedding_label_centroids",
    """
    SELECT label,
           COUNT(DISTINCT vec_id) AS n_vecs,
           ROUND(AVG(x), 6) AS mean_component,
           ROUND(MIN(x), 6) AS min_component,
           ROUND(MAX(x), 6) AS max_component
    FROM (SELECT label, vec_id, UNNEST(embedding)::DOUBLE AS x FROM embeddings)
    GROUP BY label
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select("label", "vec_id", F.explode("embedding").alias("x")).withColumn(
        "x", F.col("x").cast("double")
    )
    return exploded.groupBy("label").agg(
        F.countDistinct("vec_id").alias("n_vecs"),
        F.round(F.avg("x"), 6).alias("mean_component"),
        F.round(F.min("x"), 6).alias("min_component"),
        F.round(F.max("x"), 6).alias("max_component"),
    )


# --------------------------------------------------------------------------
# Q: embedding_neardup_exact — embedding-cosine near-duplicate pairs, exact
# baseline on a bounded slice (vec_id < 1000 both sides). Vectors are
# L2-normalized ONCE in a projection, so the pair stage is a plain dot
# product. The unbounded scale path is embedding_lsh_topk (sign-LSH).
# --------------------------------------------------------------------------
_NEARDUP_COS_T = 0.4
_NEARDUP_MAX_ID = 1000


@query(
    "embedding_neardup_exact",
    f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE vec_id < {_NEARDUP_MAX_ID}
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 6) AS cosine_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 6) >= {_NEARDUP_COS_T}
    """,
)
def embedding_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.partitioning import ensure_parallelism
    from pmp_analytics_spark.operators.similarity_search import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < _NEARDUP_MAX_ID)
    # Repartition the raw vectors BEFORE normalizing — a repartition on top
    # of the projection would run the transform on the single input split.
    unit = ensure_parallelism(emb.select("vec_id", "embedding")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") / l2_norm(F.col("embedding"))).alias("v"),
    )
    # NOTE the normalized-vector trap: dividing inside transform re-derives
    # the norm per component; let Catalyst CSE handle it or it is O(d^2).
    # Measured: fine at d=64; for large d precompute the norm column.
    a = unit.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = unit.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine_sim", F.round(dot(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine_sim") >= _NEARDUP_COS_T)
        .select("id_a", "id_b", "cosine_sim")
    )


# --------------------------------------------------------------------------
# Q: embedding_lsh_topk — approximate top-k via sign-LSH bucketing (the
# 100 TB scale path: bucket-pruned scan instead of full corpus per query).
# The hyperplanes are deterministic literals (make_planes LCG), so the
# oracle reproduces the exact bucket assignment via LIST_DOT_PRODUCT sign
# tests — a full independent check of an *approximate* operator.
# --------------------------------------------------------------------------
def _duck_sign_bucket(vcol: str, planes: list[list[float]]) -> str:
    return " || ".join(
        f"(CASE WHEN LIST_DOT_PRODUCT({vcol}, [{', '.join(repr(x) for x in plane)}]) >= 0 "
        "THEN '1' ELSE '0' END)"
        for plane in planes
    )


def _lsh_planes():
    from pmp_analytics_spark.operators.similarity_search import make_planes

    return make_planes(64, 6)


@query(
    "embedding_lsh_topk",
    f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cb AS (
        SELECT vec_id, v, {{bucket}} AS bucket FROM c
    ), q AS (
        SELECT vec_id AS query_id, v AS qv, bucket AS qb FROM cb WHERE vec_id < {_NQ}
    ), scored AS (
        SELECT q.query_id, cb.vec_id,
               ROUND(LIST_COSINE_SIMILARITY(cb.v, q.qv), 6) AS cosine_sim
        FROM cb JOIN q ON cb.bucket = q.qb
    ), ranked AS (
        SELECT query_id, vec_id, cosine_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, cosine_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_TOPK}
    """.format(bucket=_duck_sign_bucket("v", _lsh_planes())),
)
def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.similarity_search import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = lsh_topk(emb, queries_df, dim=64, k=_TOPK, n_planes=6)
    return out.withColumn("rank", F.col("rank").cast("long"))


# --------------------------------------------------------------------------
# Q: docs_simhash_pairs — SimHash near-dup candidates: 60-bit md5-family
# signature, banded into 4×15-bit keys (Hamming-LSH), verified with exact
# Hamming distance <= 6. The oracle recomputes the identical signature
# (hash each 4-shingle once, majority-vote each bit) and the identical
# banding — a full independent check of the sketch pipeline.
# --------------------------------------------------------------------------
_SIMHASH_BANDS = 4
_SIMHASH_HAMMING = 6

_DUCK_SH4 = (
    "LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LENGTH(LOWER(text)) - 3, 0)), "
    "i -> SUBSTRING(LOWER(text), CAST(i AS INT), 4))"
)
_DUCK_HS60 = "LIST_TRANSFORM(sh, s -> CAST(('0x' || SUBSTRING(MD5(s), 1, 15)) AS BIGINT))"
_DUCK_SIMHASH = " + ".join(
    f"(CASE WHEN 2 * LIST_SUM(LIST_TRANSFORM(hs, h -> (h >> {b}) & 1)) > LEN(hs) "
    f"THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
    for b in range(60)
)
_DUCK_SIM_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id, (sim >> {b * 15}) & 32767 AS band_key FROM sig"
    for b in range(_SIMHASH_BANDS)
)


@query(
    "docs_simhash_pairs",
    f"""
    WITH sh AS (
        SELECT doc_id, {_DUCK_SH4} AS sh FROM documents
    ), hashed AS (
        SELECT doc_id, {_DUCK_HS60} AS hs FROM sh
    ), sig AS (
        SELECT doc_id, CAST({_DUCK_SIMHASH} AS BIGINT) AS sim FROM hashed
    ), banded AS (
        {_DUCK_SIM_BANDS}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(BIT_COUNT(XOR(sa.sim, sb.sim)) AS INT) AS hamming
    FROM cand
    JOIN sig sa ON cand.id_a = sa.doc_id
    JOIN sig sb ON cand.id_b = sb.doc_id
    WHERE BIT_COUNT(XOR(sa.sim, sb.sim)) <= {_SIMHASH_HAMMING}
    """,
)
def docs_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    out = simhash_pairs(
        docs, text_col="text", id_col="doc_id", max_hamming=_SIMHASH_HAMMING, bands=_SIMHASH_BANDS
    )
    return out.withColumn("hamming", F.col("hamming").cast("int"))


# --------------------------------------------------------------------------
# Q: docs_payload_features — multimodal plumbing end-to-end: binary payload
# column + metadata struct → mapInPandas byte-feature extraction (the batch
# shape real media decode plugs into; decode itself is stubbed — no codecs
# in this environment). Features are deterministic byte math, so the whole
# Arrow round-trip is oracle-checked in SQL.
# --------------------------------------------------------------------------
@query(
    "docs_payload_features",
    """
    SELECT doc_id,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           MD5(text) AS payload_md5,
           LOWER(SUBSTRING(HEX(ENCODE(text)), 1, 16)) AS header_hex,
           CASE WHEN doc_id % 2 = 0 THEN 'image/fake' ELSE 'audio/fake' END AS content_type
    FROM documents
    """,
)
def docs_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.multimodal import attach_payload, extract_payload_features

    docs = load_table(spark, sf_dir, "documents")
    return extract_payload_features(attach_payload(docs))


# --------------------------------------------------------------------------
# Q: docs_frame_samples — the video-pipeline shape: payload → n equal
# byte-range "frames" per doc (mapInPandas fan-out, 1 row in → 4 rows
# out) → per-frame byte features. The deterministic frame slicing stands
# in for decoder output (codecs stubbed in this environment), so the
# whole Arrow fan-out round-trip is oracle-checked: the corpus text is
# ASCII, so VARCHAR slicing in SQL reproduces the byte slicing exactly.
# --------------------------------------------------------------------------
@query(
    "docs_frame_samples",
    """
    WITH p AS (
        SELECT doc_id, text, GREATEST(1, LENGTH(text) // 4) AS step
        FROM documents WHERE LENGTH(text) > 0
    ), f AS (
        SELECT doc_id, UNNEST(RANGE(0, 4)) AS frame_idx,
               SUBSTRING(text, CAST(UNNEST(RANGE(0, 4)) * step + 1 AS BIGINT),
                         CAST(step AS BIGINT)) AS frame
        FROM p
    )
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(LENGTH(frame) AS BIGINT) AS frame_bytes,
           MD5(frame) AS frame_md5
    FROM f
    """,
)
def docs_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.multimodal import attach_payload, sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_payload(docs), n_frames=4)


# --------------------------------------------------------------------------
# Q: docs_video_frame_dims — REAL video decode end-to-end: each doc
# (doc_id < 40) becomes a deterministic MJPEG-in-AVI container
# (2 + doc_id%5 flat-color JPEG frames at 16+8*(doc_id%3) square), the
# engine walks the RIFF container (multimodal.avi_mjpeg_frames),
# decodes every sampled frame with the from-the-spec JPEG codec, and
# reports the DECODED dimensions + sampled frame count. The oracle
# predicts those numbers arithmetically from the same fixture params —
# so a broken container walk, broken frame striding, or broken JPEG
# decode all hash-mismatch (wrong dims, wrong counts, or an error),
# while the frame BYTES stay real codec output (their md5s are pinned
# in pytest where Python can re-encode; SQL cannot build a JPEG).
# --------------------------------------------------------------------------
@query(
    "docs_video_frame_dims",
    """
    WITH p AS (
        SELECT doc_id, 2 + doc_id % 5 AS n_total,
               CAST(16 + 8 * (doc_id % 3) AS BIGINT) AS side
        FROM documents WHERE doc_id < 40
    )
    SELECT doc_id, UNNEST(RANGE(0, LEAST(n_total, 4))) AS frame_idx,
           side AS frame_w, side AS frame_h,
           CAST(n_total AS BIGINT) AS n_frames_total
    FROM p
    """,
)
def docs_video_frame_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pmp_analytics_spark.operators.partitioning import ensure_parallelism

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 40
    ).select("doc_id")

    def batches(it):
        from pmp_analytics_spark.jpeg import jpeg_decode, jpeg_encode
        from pmp_analytics_spark.multimodal import (
            avi_mjpeg_encode,
            frame_sample,
        )

        for pdf in it:
            out = {
                "doc_id": [], "frame_idx": [], "frame_w": [],
                "frame_h": [], "n_frames_total": [],
            }
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n_total = 2 + doc_id % 5
                side = 16 + 8 * (doc_id % 3)
                frames = [
                    jpeg_encode(
                        side, side,
                        [bytes([(doc_id * 7 + k * 31) % 256] * (3 * side))] * side,
                    )
                    for k in range(n_total)
                ]
                avi = avi_mjpeg_encode(side, side, frames)
                for i, fr in enumerate(frame_sample(avi, n_frames=4)):
                    w, h, _rows = jpeg_decode(fr)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_w"].append(w)
                    out["frame_h"].append(h)
                    out["n_frames_total"].append(n_total)
            yield pd.DataFrame(out)

    schema = (
        "doc_id long, frame_idx long, frame_w long, frame_h long, "
        "n_frames_total long"
    )
    return ensure_parallelism(docs).mapInPandas(batches, schema)


# --------------------------------------------------------------------------
# Q: docs_webp_decode_audit — the VP8L (WebP-lossless) codec behind the
# ORACLE GATE, not just pytest: each doc (doc_id < 60) becomes a
# deterministic flat-color WebP whose encoding path VARIES by doc
# (plain literals / subtract-green / a predictor mode / palette /
# LZ77 / color cache — six real bitstream shapes round-robin), the
# engine decodes through the full container+VP8L path inside
# mapInPandas, and reports decoded dims + the exact per-channel pixel
# sums. Flat color makes those sums pure arithmetic of the fixture
# params — so the oracle predicts them without being able to build a
# WebP: a wrong transform inverse, wrong Huffman table, or wrong LZ77
# copy shows up as a wrong sum or a decode error, at every doc.
# --------------------------------------------------------------------------
@query(
    "docs_webp_decode_audit",
    """
    SELECT doc_id,
           CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS w,
           CAST(6 + (doc_id % 3) * 4 AS BIGINT) AS h,
           doc_id % 6 AS variant,
           (8 + (doc_id % 5) * 4) * (6 + (doc_id % 3) * 4)
               * ((doc_id * 7) % 256) AS sum_r,
           (8 + (doc_id % 5) * 4) * (6 + (doc_id % 3) * 4)
               * ((doc_id * 13 + 40) % 256) AS sum_g,
           (8 + (doc_id % 5) * 4) * (6 + (doc_id % 3) * 4)
               * ((doc_id * 29 + 80) % 256) AS sum_b
    FROM documents WHERE doc_id < 60
    """,
)
def docs_webp_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pmp_analytics_spark.operators.partitioning import ensure_parallelism

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 60
    ).select("doc_id")

    def batches(it):
        from pmp_analytics_spark.webp import webp_decode, webp_encode

        for pdf in it:
            out = {
                "doc_id": [], "w": [], "h": [], "variant": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
            }
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + (doc_id % 5) * 4
                h = 6 + (doc_id % 3) * 4
                rgb = bytes(
                    (
                        (doc_id * 7) % 256,
                        (doc_id * 13 + 40) % 256,
                        (doc_id * 29 + 80) % 256,
                    )
                )
                rows = [rgb * w] * h
                variant = doc_id % 6
                kw = [
                    {},
                    {"subtract_green": True},
                    {"predictor_mode": doc_id % 14},
                    {"palette": True},
                    {"use_lz77": True},
                    {"cache_bits": 4, "use_lz77": True},
                ][variant]
                dw, dh, drows = webp_decode(webp_encode(w, h, rows, **kw))
                sr = sg = sb = 0
                for r in drows:
                    for x in range(dw):
                        sr += r[3 * x]
                        sg += r[3 * x + 1]
                        sb += r[3 * x + 2]
                out["doc_id"].append(doc_id)
                out["w"].append(dw)
                out["h"].append(dh)
                out["variant"].append(variant)
                out["sum_r"].append(sr)
                out["sum_g"].append(sg)
                out["sum_b"].append(sb)
            yield pd.DataFrame(out)

    schema = (
        "doc_id long, w long, h long, variant long, "
        "sum_r long, sum_g long, sum_b long"
    )
    return ensure_parallelism(docs).mapInPandas(batches, schema)


# --------------------------------------------------------------------------
# Q: docs_winnowing — rolling-hash (winnowing/MOSS) document fingerprints:
# md5 every k-gram, slide a window over the hash sequence, keep per-window
# minima, dedupe. Local-sampling guarantee: any shared substring of length
# >= k+window-1 yields a shared fingerprint. Exploded to (doc_id, fp) rows
# and fully oracle-checked (md5 is engine-independent).
# --------------------------------------------------------------------------
_WINNOW_K = 5
_WINNOW_W = 4


@query(
    "docs_winnowing",
    f"""
    WITH sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents WHERE LENGTH(text) >= {_WINNOW_K}
    ), h AS (
        SELECT doc_id, LIST_TRANSFORM(sh, s -> MD5(s)) AS hs FROM sh
    ), fps AS (
        SELECT doc_id,
               LIST_SORT(LIST_DISTINCT(LIST_TRANSFORM(
                   GENERATE_SERIES(1, LEN(hs) - {_WINNOW_W - 1}),
                   i -> LIST_MIN(hs[i:i+{_WINNOW_W - 1}])))) AS fps
        FROM h WHERE LEN(hs) >= {_WINNOW_W}
    )
    SELECT doc_id, UNNEST(fps) AS fp FROM fps
    """,
)
def docs_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.functions.text import winnow_fingerprints
    from pmp_analytics_spark.operators.partitioning import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return docs.select(
        "doc_id", F.explode(winnow_fingerprints("text", _WINNOW_K, _WINNOW_W)).alias("fp")
    )


# --------------------------------------------------------------------------
# Q: streaming_session_rollup — the Structured Streaming path as a declared
# query: drain the events file stream through a session_window aggregation
# (availableNow backfill into a memory sink) and hash-check the RESULT
# against the batch gaps-and-islands SQL oracle. Streaming and batch
# answers must be identical — that is the correctness contract for the
# engine's incremental path.
# --------------------------------------------------------------------------
@query(
    "streaming_session_rollup",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id,
           EPOCH_US(MIN(ts)) AS session_start_us,
           EPOCH_US(MAX(ts)) AS session_end_us,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def streaming_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from pmp_analytics_spark.streaming import read_event_stream, run_to_memory, streaming_sessions

    name = f"stream_sessions_{uuid.uuid4().hex[:12]}"
    stream = read_event_stream(spark, sf_dir)
    run_to_memory(streaming_sessions(stream, gap_seconds=1800), name, state_partitions=8)
    return spark.table(name).select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
    )


# --------------------------------------------------------------------------
# Q: docs_dedup_canonical — END-TO-END corpus cleaning: near-dup pairs →
# connected components (A~B, B~C must collapse {A,B,C} even without an
# A~C edge) → keep each component's min-id doc. Components run as
# iterative label propagation on Spark; the oracle closes the transitive
# hull with a recursive CTE — both sides must agree on the surviving set.
# --------------------------------------------------------------------------
@query(
    "docs_dedup_canonical",
    f"""
    WITH RECURSIVE pairs AS (
        {ORACLE["docs_neardup_pairs"]}
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ), walk(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src
    ), comp AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS component
        FROM walk GROUP BY src
    ), losers AS (
        SELECT id FROM comp WHERE id <> component
    )
    SELECT d.doc_id, d.source
    FROM documents d ANTI JOIN losers l ON d.doc_id = l.id
    """,
)
def docs_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import dedup_keep_canonical

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_dedup(
        docs,
        text_col="text",
        id_col="doc_id",
        shingle_k=_SHINGLE_K,
        threshold=_JACCARD_T,
        num_hashes=len(_SEEDS),
        bands=_BANDS,
    )
    return dedup_keep_canonical(docs, pairs, "doc_id").select("doc_id", "source")


# --------------------------------------------------------------------------
# Q: docs_leakage_free_split — GROUP-AWARE train/val/test splitting: the
# near-dup closure decides the split unit, so two near-duplicate
# documents can NEVER straddle a split boundary (the standard eval-
# leakage failure: a test doc whose near-twin sat in train). Every doc
# maps to its connected component (singletons are their own component),
# the COMPONENT id — not the doc id — md5-buckets into train(8)/val(1)/
# test(1), and the whole component lands together. Deterministic,
# re-run-stable (content-hash buckets, no rand()), and shuffle-shaped
# like docs_dedup_canonical: the corpus joins the TINY component map,
# never itself. Oracle: the recursive-CTE transitive closure over the
# replayed near-dup pairs + the identical md5 bucket arithmetic.
# --------------------------------------------------------------------------
@query(
    "docs_leakage_free_split",
    f"""
    WITH RECURSIVE pairs AS (
        {ORACLE["docs_neardup_pairs"]}
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ), walk(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src
    ), comp AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS component
        FROM walk GROUP BY src
    ), tagged AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    )
    SELECT doc_id, component,
           CASE WHEN CAST(('0x' || SUBSTRING(MD5(CAST(component AS VARCHAR)), 1, 15))
                          AS BIGINT) % 10 < 8 THEN 'train'
                WHEN CAST(('0x' || SUBSTRING(MD5(CAST(component AS VARCHAR)), 1, 15))
                          AS BIGINT) % 10 = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM tagged
    """,
)
def docs_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import connected_components
    from pmp_analytics_spark.operators.sample import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_dedup(
        docs,
        text_col="text",
        id_col="doc_id",
        shingle_k=_SHINGLE_K,
        threshold=_JACCARD_T,
        num_hashes=len(_SEEDS),
        bands=_BANDS,
    )
    labels = connected_components(pairs)
    tagged = (
        docs.select("doc_id")
        .join(
            F.broadcast(labels.withColumnRenamed("id", "doc_id")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
        )
    )
    b = hash_bucket("component", 10)
    return tagged.select(
        "doc_id",
        "component",
        F.when(b < 8, "train").when(b == 8, "val").otherwise("test").alias("split"),
    )


# --------------------------------------------------------------------------
# Q: docs_dedup_keep_best — quality-aware canonical selection: the same
# near-dup → connected-components closure as docs_dedup_canonical, but
# instead of keeping each component's min-id doc, keep its BEST doc
# (longest by n_chars, ties → min doc_id) — the policy real pipelines
# want (SemDeDup/RefinedWeb keep the highest-quality representative, not
# an arbitrary one). Singleton docs (no near-dup edge) form their own
# component. The winner pick reuses the keep_first operator (row_number
# over the component, ordered by quality desc) and component membership
# arrives by LEFT join of the corpus against the (tiny) component map —
# the closure output, not the corpus, is what shuffles.
# --------------------------------------------------------------------------
@query(
    "docs_dedup_keep_best",
    f"""
    WITH RECURSIVE pairs AS (
        {ORACLE["docs_neardup_pairs"]}
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ), walk(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src
    ), comp AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS component
        FROM walk GROUP BY src
    ), members AS (
        SELECT d.doc_id, d.n_chars,
               COALESCE(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    ), ranked AS (
        SELECT component, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY component
                   ORDER BY n_chars DESC, doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY component) AS n_members
        FROM members
    )
    SELECT component, doc_id AS keep_id,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_chars AS BIGINT) AS keep_chars
    FROM ranked WHERE rn = 1
    """,
)
def docs_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import connected_components, keep_first

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_dedup(
        docs,
        text_col="text",
        id_col="doc_id",
        shingle_k=_SHINGLE_K,
        threshold=_JACCARD_T,
        num_hashes=len(_SEEDS),
        bands=_BANDS,
    )
    comp = connected_components(pairs, "id_a", "id_b")
    members = (
        docs.select("doc_id", "n_chars")
        .join(comp, docs.doc_id == comp.id, "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
    )
    sizes = members.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    best = keep_first(members, ["component"], [F.desc("n_chars"), F.asc("doc_id")])
    return best.join(sizes, on="component").select(
        "component",
        F.col("doc_id").alias("keep_id"),
        "n_members",
        F.col("n_chars").alias("keep_chars"),
    )


# --------------------------------------------------------------------------
# Q: embedding_ivf_topk — IVF approximate nearest neighbor: seeded-numpy
# k-means coarse quantizer, probe the nprobe nearest cells, exact cosine
# rescore. The quantizer fit is deterministic (k-means++ with a fixed seed
# on the md5-ordered sample), so the oracle SNAPSHOTS the centroids the
# sf0.01 fit produces as literals and reproduces the ENTIRE downstream
# pipeline in SQL — argmin cell assignment, nprobe probing with the same
# (distance, cell) tie-break, cosine rescoring, ranking — the same
# replay-the-deterministic-preprocessing trick embedding_lsh_topk uses
# for its hyperplane buckets. (The oracle is built against the driver
# gate's fixed sf=0.01 tables; recall vs the exact baseline is separately
# asserted in tests/test_operators.py.)
# --------------------------------------------------------------------------
_IVF_N_CENTROIDS = 16
_IVF_NPROBE = 4


def _oracle_embedding_rows(n: int, keep=None) -> list:
    """The md5-ordered, truncated (vec_id, embedding) driver sample every
    SQL-replay oracle refit uses — ONE implementation of the protocol
    (same order and truncation as the Spark operators'
    ``orderBy(md5(vec_id)).limit(n)``), so the sampling contract cannot
    drift between the seven oracle builders that refit from it.
    ``keep`` filters vec_ids first (the CDC oracles fit on the OLD
    snapshot). Raises ImportError/OSError/KeyError upward: each oracle
    keeps its own warn-and-downgrade to a rows-only check."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    pairs = zip(tbl["vec_id"].to_pylist(), tbl["embedding"].to_pylist())
    if keep is not None:
        pairs = (p for p in pairs if keep(p[0]))
    return sorted(
        pairs, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest()
    )[:n]


def _ivf_oracle() -> str | None:
    """Snapshot the gate-SF IVF centroids and emit the full SQL replay.

    LAZY: registered as a callable and resolved by ``all_oracles()`` at
    check time, so module import stays cheap (no parquet read / k-means
    at import) and a broken oracle surfaces where the gate runs, not as
    a silent import-time downgrade.

    Reproduces ``ivf_topk``'s fit inputs exactly, without Spark: the
    training sample is every embedding row of the GATE's sf_dir
    (``$SPARK_GRAFT_ORACLE_SF_DIR``, exported by ``tools/check_oracle``
    so fit inputs cannot diverge from the compared tables) ordered by
    md5(vec_id) — the same engine-independent order the operator's
    driver-side ``orderBy(F.md5(...)).limit(...)`` produces — fed to the
    identical ``_kmeans_fit``. Returns None (→ rows-only driver check),
    WITH a visible warning, only when the gate tables are unavailable.
    """
    import warnings

    try:
        import numpy as np

        from pmp_analytics_spark.operators.similarity_search import _kmeans_fit

        rows = _oracle_embedding_rows(max(2000, 20 * _IVF_N_CENTROIDS))
        train = np.array([r[1] for r in rows], dtype=np.float64)
        cents = _kmeans_fit(train, _IVF_N_CENTROIDS, seed=42)
    except (ImportError, OSError, KeyError) as e:  # tables/deps unavailable here
        warnings.warn(
            f"embedding_ivf_topk oracle downgraded to rows-only check: {e!r}",
            stacklevel=2,
        )
        return None

    cent_rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    return f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent(cell, cv) AS (
        VALUES {cent_rows}
    ), assign AS (
        SELECT vec_id, v, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY LIST_DISTANCE(v, cv), cell) AS rn
        FROM c CROSS JOIN cent
    ), cells AS (
        SELECT vec_id, v, cell FROM assign WHERE rn = 1
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {_NQ}
    ), qprobe AS (
        SELECT query_id, qv, cell,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY LIST_DISTANCE(qv, cv), cell) AS rn
        FROM q CROSS JOIN cent
    ), scored AS (
        SELECT p.query_id, cells.vec_id,
               ROUND(LIST_COSINE_SIMILARITY(cells.v, p.qv), 6) AS cosine_sim
        FROM cells JOIN (SELECT * FROM qprobe WHERE rn <= {_IVF_NPROBE}) p
          ON cells.cell = p.cell
    ), ranked AS (
        SELECT query_id, vec_id, cosine_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, cosine_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_TOPK}
    """


@query("embedding_ivf_topk", _ivf_oracle)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.similarity_search import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_topk(emb, queries_df, n_centroids=_IVF_N_CENTROIDS, nprobe=_IVF_NPROBE, k=_TOPK)
    return out.withColumn("rank", F.col("rank").cast("long"))


# --------------------------------------------------------------------------
# Q: embedding_pq_topk — product-quantization ANN (Jégou et al., TPAMI
# 2011): per-subspace k-means codebooks, m-byte codes per vector, and
# Asymmetric Distance Computation — each query builds an exact
# (m x k_codes) subspace-distance table and every corpus vector is
# scored with m table LOOKUPS instead of D multiplies. The compression
# story at 100 TB: a 256 B float vector becomes m=8 codes, so the code
# table of a trillion-vector corpus fits in memory tiers the raw
# vectors never could. The oracle replays the deterministic fit the
# same way embedding_ivf_topk's does — per-subspace codebooks from the
# identical seeded k-means as SQL literals, argmin encoding with the
# same (dist, code) tie-break, the same left-to-right ADC fold order —
# resolved lazily against the gate's own sf_dir.
# --------------------------------------------------------------------------
_PQ_M = 8
_PQ_K = 16


def _pq_fit_snapshot(query_name: str):
    """Refit the gate-SF PQ codebooks exactly as ``pq_train`` does (same
    md5-ordered sample, same seeds) without Spark, and return
    ``(cb_rows, sub)`` — the VALUES literal for the codebook CTE and the
    subspace width. Returns None (with a visible warning naming
    ``query_name``) when the gate tables/deps are unavailable, which
    downgrades only that query to a rows-only check."""
    import warnings

    try:
        import numpy as np

        from pmp_analytics_spark.operators.similarity_search import _kmeans_fit

        rows = _oracle_embedding_rows(max(2000, 20 * _PQ_K))
        train = np.array([r[1] for r in rows], dtype=np.float64)
        d = train.shape[1]
        sub = d // _PQ_M
        books = [
            _kmeans_fit(train[:, j * sub : (j + 1) * sub], _PQ_K, 42 + j)
            for j in range(_PQ_M)
        ]
    except (ImportError, OSError, KeyError) as e:  # tables/deps unavailable here
        warnings.warn(
            f"{query_name} oracle downgraded to rows-only check: {e!r}",
            stacklevel=2,
        )
        return None

    cb_rows = ", ".join(
        f"({j}, {c}, [{', '.join(repr(float(x)) for x in books[j][c])}]::DOUBLE[])"
        for j in range(_PQ_M)
        for c in range(_PQ_K)
    )
    return cb_rows, sub


def _pq_replay_ctes(cb_rows: str, sub: int) -> str:
    """The shared CTE chain of the PQ oracles: codebook VALUES, argmin
    encoding with the (dist, code) tie-break, per-query ADC tables, and
    the ADC score — everything up to (and including) the ranked ADC
    relation ``ranked``."""
    return f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cb(j, code, cv) AS (
        VALUES {cb_rows}
    ), subdist AS (
        -- squared L2 of doc subvector j vs codebook entry (j, code);
        -- ascending-i fold matches the Spark HOF's left-to-right sum
        SELECT c.vec_id, cb.j, cb.code,
               LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {sub}), i ->
                   (v[cb.j * {sub} + i] - cv[i]) * (v[cb.j * {sub} + i] - cv[i]))) AS d2
        FROM c CROSS JOIN cb
    ), enc AS (
        SELECT vec_id, j, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS rn
        FROM subdist
    ), codes AS (
        SELECT vec_id, LIST(code ORDER BY j) AS codes
        FROM enc WHERE rn = 1 GROUP BY vec_id
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {_NQ}
    ), qtab0 AS (
        SELECT q.query_id, cb.j, cb.code,
               LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {sub}), i ->
                   (qv[cb.j * {sub} + i] - cv[i]) * (qv[cb.j * {sub} + i] - cv[i]))) AS t
        FROM q CROSS JOIN cb
    ), qtab1 AS (
        SELECT query_id, j, LIST(t ORDER BY code) AS trow
        FROM qtab0 GROUP BY query_id, j
    ), qtab AS (
        SELECT query_id, LIST(trow ORDER BY j) AS tbl
        FROM qtab1 GROUP BY query_id
    ), adc AS (
        -- ascending-j fold, code+1 into the 1-based (j+1)-th table row —
        -- exactly the Spark zip_with/element_at/aggregate shape
        SELECT qtab.query_id, codes.vec_id,
               ROUND(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {_PQ_M}), j ->
                   tbl[j][codes.codes[j] + 1])), 6) AS adc_dist
        FROM codes CROSS JOIN qtab
    ), ranked AS (
        SELECT query_id, vec_id, adc_dist,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_dist ASC, vec_id) AS rank
        FROM adc
    )"""


def _pq_oracle() -> str | None:
    """Full SQL replay for embedding_pq_topk (encoding + ADC + ranking).
    Same lazy/downgrade contract as ``_ivf_oracle``."""
    snap = _pq_fit_snapshot("embedding_pq_topk")
    if snap is None:
        return None
    cb_rows, sub = snap
    return _pq_replay_ctes(cb_rows, sub) + f"""
    SELECT query_id, vec_id, adc_dist, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_TOPK}
    """


@query("embedding_pq_topk", _pq_oracle)
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.similarity_search import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=_PQ_M, k_codes=_PQ_K)
    codes = pq_encode(emb, books)
    queries_df = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = pq_topk(codes, books, queries_df, k=_TOPK)
    return out.withColumn("rank", F.col("rank").cast("long"))


# --------------------------------------------------------------------------
# Q: embedding_pq_rerank — the production ANN shape: PQ/ADC retrieves a
# cheap shortlist (5x over-retrieval), exact cosine rescoring reranks it
# to the final top-k. This two-stage split is why PQ's coarse
# within-cluster ties don't matter in deployment — ADC only needs the
# true neighbors IN the shortlist; the exact metric orders them. The
# shortlist join touches _NQ x shortlist rows (bounded), never the
# corpus. Oracle = the shared PQ replay CTEs + cosine rescoring.
# --------------------------------------------------------------------------
_PQ_SHORTLIST = 5 * _TOPK


def _pq_rerank_oracle() -> str | None:
    snap = _pq_fit_snapshot("embedding_pq_rerank")
    if snap is None:
        return None
    cb_rows, sub = snap
    return _pq_replay_ctes(cb_rows, sub) + f"""
    , shortlist AS (
        SELECT query_id, vec_id FROM ranked WHERE rank <= {_PQ_SHORTLIST}
    ), rescored AS (
        SELECT s.query_id, s.vec_id,
               ROUND(LIST_COSINE_SIMILARITY(cv.v, qv.v), 6) AS cosine_sim
        FROM shortlist s
        JOIN c cv ON cv.vec_id = s.vec_id
        JOIN c qv ON qv.vec_id = s.query_id
    ), rr AS (
        SELECT query_id, vec_id, cosine_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, vec_id) AS rank
        FROM rescored
    )
    SELECT query_id, vec_id, cosine_sim, CAST(rank AS BIGINT) AS rank
    FROM rr WHERE rank <= {_TOPK}
    """


@query("embedding_pq_rerank", _pq_rerank_oracle)
def embedding_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.similarity_search import (
        cosine,
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=_PQ_M, k_codes=_PQ_K)
    codes = pq_encode(emb, books)
    queries_df = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()  # two consumers: the ADC table build and the rescore join
    shortlist = pq_topk(codes, books, queries_df, k=_PQ_SHORTLIST).select(
        "query_id", "vec_id"
    )
    rescored = (
        shortlist.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(queries_df), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("query_vec")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TOPK)
        .select("query_id", "vec_id", "cosine_sim", F.col("rank").cast("long").alias("rank"))
    )


# --------------------------------------------------------------------------
# Q: embedding_semantic_neardup — SemDeDup-shaped semantic dedup: k-means
# cluster the embedding space, exact cosine over pairs WITHIN a cluster
# only — the 100 TB scale path next to embedding_neardup_exact's bounded
# brute-force slice. The oracle replays the deterministic quantizer the
# same way embedding_ivf_topk's does: centroids from the identical
# seeded fit as SQL literals, argmin assignment with the same
# (distance, cell) tie-break, within-cell pair join, cosine filter.
# Lazy callable: resolved by all_oracles() at check time against the
# gate's own sf_dir.
# --------------------------------------------------------------------------
_SEM_CLUSTERS = 16
_SEM_COS_T = 0.4


def _semantic_oracle() -> str | None:
    import warnings

    try:
        import numpy as np

        from pmp_analytics_spark.operators.similarity_search import _kmeans_fit

        rows = _oracle_embedding_rows(max(2000, 20 * _SEM_CLUSTERS))
        train = np.array([r[1] for r in rows], dtype=np.float64)
        cents = _kmeans_fit(train, _SEM_CLUSTERS, seed=42)
    except (ImportError, OSError, KeyError) as e:  # tables/deps unavailable here
        warnings.warn(
            f"embedding_semantic_neardup oracle downgraded to rows-only check: {e!r}",
            stacklevel=2,
        )
        return None

    cent_rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    return f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent(cell, cv) AS (
        VALUES {cent_rows}
    ), assign AS (
        SELECT vec_id, v, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY LIST_DISTANCE(v, cv), cell) AS rn
        FROM c CROSS JOIN cent
    ), cells AS (
        SELECT vec_id, v, cell FROM assign WHERE rn = 1
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 6) AS cosine_sim
    FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 6) >= {_SEM_COS_T}
    """


@query("embedding_semantic_neardup", _semantic_oracle)
def embedding_semantic_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.similarity_search import semantic_neardup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_neardup(
        emb, threshold=_SEM_COS_T, n_clusters=_SEM_CLUSTERS
    )


# --------------------------------------------------------------------------
# Q: docs_bpe_token_stats — BPE-ish pre-tokenization counts (the GPT-2
# split regex: contractions, space-prefixed letter runs, digit runs,
# punctuation runs) — the token-budget estimator of a training-data
# pipeline, next to the whitespace tokenizer of docs_token_stats.
# --------------------------------------------------------------------------
_DUCK_BPE = (
    "LIST_FILTER(REGEXP_EXTRACT_ALL(LOWER(text), "
    "'''[a-z]+| ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9]+|\\s+'), "
    "t -> NOT REGEXP_MATCHES(t, '^\\s+$'))"
)


@query(
    "docs_bpe_token_stats",
    f"""
    WITH tk AS (SELECT doc_id, {_DUCK_BPE} AS toks FROM documents)
    SELECT doc_id,
           CAST(LEN(toks) AS BIGINT) AS n_bpe_tokens,
           CAST(LEN(LIST_DISTINCT(toks)) AS BIGINT) AS n_unique,
           ROUND(CASE WHEN LEN(toks) > 0
                 THEN LIST_SUM(LIST_TRANSFORM(toks, t -> LENGTH(t))) * 1.0 / LEN(toks)
                 ELSE 0.0 END, 4) AS mean_bpe_len
    FROM tk
    """,
)
def docs_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.functions.text import bpe_token_count, bpe_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = bpe_tokens("text")
    return docs.select(
        "doc_id",
        bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)).cast("double")
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("mean_bpe_len"),
    )


# --------------------------------------------------------------------------
# Q: embedding_label_affinity — grouped-map applyInPandas: per-label
# centroid + batched cosine of every member to it (one numpy matmul per
# group). Oracle recomputes the centroid with unnest/avg and
# LIST_COSINE_SIMILARITY — the Arrow round trip and the SQL must agree
# to 6 decimals.
# --------------------------------------------------------------------------
@query(
    "embedding_label_affinity",
    """
    WITH comp AS (
        SELECT label, vec_id, UNNEST(CAST(embedding AS DOUBLE[])) AS x,
               GENERATE_SUBSCRIPTS(embedding, 1) AS i
        FROM embeddings
    ), centroid AS (
        SELECT label, i, AVG(x) AS cx FROM comp GROUP BY label, i
    ), cent_vec AS (
        SELECT label, LIST(cx ORDER BY i) AS cv FROM centroid GROUP BY label
    )
    SELECT e.label, e.vec_id,
           ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]), c.cv), 6) AS affinity
    FROM embeddings e JOIN cent_vec c ON e.label = c.label
    """,
)
def embedding_label_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.similarity_search import label_affinity

    emb = load_table(spark, sf_dir, "embeddings")
    return label_affinity(emb)


# --------------------------------------------------------------------------
# Q: docs_bm25_retrieval — the LEXICAL retrieval baseline next to the ANN
# family: BM25(k1=1.2, b=0.75) top-5 per query doc (query terms = the
# doc's distinct tokens, the more-like-this shape), self-match excluded
# before ranking. Scale shape in operators/retrieval.py: tf/dl/df are
# one-shuffle aggregate trees, df computed only over the query-term
# universe, query terms broadcast into the posting-list join, two-window
# top-k cut. Oracle replays the exact formula (natural log both engines).
# --------------------------------------------------------------------------
_BM25_NQ = 10
_BM25_K = 5


@query(
    "docs_bm25_retrieval",
    f"""
    WITH tk AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
    occ AS (SELECT doc_id, UNNEST(toks) AS token FROM tk),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM occ GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM occ GROUP BY 1),
    corp AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    qt AS (SELECT DISTINCT doc_id AS query_id, token FROM occ WHERE doc_id < {_BM25_NQ}),
    dft AS (
        SELECT token, COUNT(*) AS df FROM tf
        WHERE token IN (SELECT DISTINCT token FROM qt) GROUP BY token
    ),
    scored AS (
        SELECT qt.query_id, tf.doc_id,
               ROUND(SUM(
                   LN((corp.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / corp.avgdl))
               ), 6) AS bm25
        FROM qt
        JOIN tf USING (token)
        JOIN dft USING (token)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN corp
        WHERE tf.doc_id <> qt.query_id
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, doc_id, bm25,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY bm25 DESC, doc_id) AS rank
        FROM scored
    )
    SELECT query_id, doc_id, bm25, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_BM25_K}
    """,
)
def docs_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.retrieval import bm25_topk

    # NOT wrapped in ensure_parallelism: this query re-derives the scan
    # in several independent subtrees; each wrapped branch paid its own
    # text repartition while the unwrapped branches' single-task
    # explodes already overlap across cores (measured +0.4..+1.1 s).
    occ = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    qterms = (
        occ.where(F.col("doc_id") < _BM25_NQ)
        .select(F.col("doc_id").alias("query_id"), "token")
        .distinct()
    )
    out = bm25_topk(occ, qterms, k=_BM25_K)
    return out.select(
        "query_id", "doc_id", "bm25", F.col("rank").cast("long").alias("rank")
    )


# --------------------------------------------------------------------------
# Q: docs_bm25_wand — the SAME retrieval task through the max-score/WAND
# pruned ranker (operators/retrieval.bm25_topk_wand): per-term score
# upper bounds → probe-pass threshold → essential-term candidate prune,
# with the scoring aggregation touching only docs that can still reach
# the top-k. Output is bit-identical to docs_bm25_retrieval by
# construction (1e-6 pruning margin under the rounding quantum), so the
# oracle IS that query's oracle — the strongest equivalence check the
# gate can express. Pruning on this corpus is weak (uniform synthetic
# vocabulary → flat idf spread; measured in PERFORMANCE.md) — the
# operator exists for the Zipfian corpora real retrieval serves, where
# max-score pruning is the standard way to not score every posting.
# --------------------------------------------------------------------------
@query("docs_bm25_wand", ORACLE["docs_bm25_retrieval"])
def docs_bm25_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.retrieval import bm25_topk_wand

    # NOT wrapped in ensure_parallelism: this query re-derives the scan
    # in several independent subtrees; each wrapped branch paid its own
    # text repartition while the unwrapped branches' single-task
    # explodes already overlap across cores (measured +0.4..+1.1 s).
    occ = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    qterms = (
        occ.where(F.col("doc_id") < _BM25_NQ)
        .select(F.col("doc_id").alias("query_id"), "token")
        .distinct()
    )
    out = bm25_topk_wand(occ, qterms, k=_BM25_K)
    return out.select(
        "query_id", "doc_id", "bm25", F.col("rank").cast("long").alias("rank")
    )


# --------------------------------------------------------------------------
# Q: docs_hybrid_rrf — hybrid retrieval: reciprocal-rank fusion of the
# BM25 lexical list and the dense cosine list (vec_id ≡ doc_id in the
# synthetic tables), top-20 each side, fused 1/(60+rank) top-5. RRF is
# the calibration-free fusion standard — an unbounded BM25 and a [-1,1]
# cosine combine through ranks alone. Fusion touches only the bounded
# per-query lists, never corpus-sized data.
# --------------------------------------------------------------------------
_RRF_EACH = 20


@query(
    "docs_hybrid_rrf",
    f"""
    WITH tk AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
    occ AS (SELECT doc_id, UNNEST(toks) AS token FROM tk),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM occ GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM occ GROUP BY 1),
    corp AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    qt AS (SELECT DISTINCT doc_id AS query_id, token FROM occ WHERE doc_id < {_BM25_NQ}),
    dft AS (
        SELECT token, COUNT(*) AS df FROM tf
        WHERE token IN (SELECT DISTINCT token FROM qt) GROUP BY token
    ),
    bm_scored AS (
        SELECT qt.query_id, tf.doc_id,
               ROUND(SUM(
                   LN((corp.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / corp.avgdl))
               ), 6) AS s
        FROM qt JOIN tf USING (token) JOIN dft USING (token)
        JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN corp
        WHERE tf.doc_id <> qt.query_id GROUP BY 1, 2
    ),
    bm_ranked AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) AS r
        FROM bm_scored
    ),
    cos_scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
               ROUND(LIST_COSINE_SIMILARITY(
                   CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS s
        FROM embeddings e
        CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_BM25_NQ}) q
        WHERE e.vec_id <> q.vec_id
    ),
    cos_ranked AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) AS r
        FROM cos_scored
    ),
    contrib AS (
        SELECT query_id, doc_id, 1.0 / (60 + r) AS c
        FROM bm_ranked WHERE r <= {_RRF_EACH}
        UNION ALL
        SELECT query_id, doc_id, 1.0 / (60 + r) AS c
        FROM cos_ranked WHERE r <= {_RRF_EACH}
    ),
    fused AS (
        SELECT query_id, doc_id, ROUND(SUM(c), 6) AS rrf_score
        FROM contrib GROUP BY 1, 2
    ),
    final AS (
        SELECT query_id, doc_id, rrf_score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rrf_score DESC, doc_id) AS rank
        FROM fused
    )
    SELECT query_id, doc_id, rrf_score, CAST(rank AS BIGINT) AS rank
    FROM final WHERE rank <= {_BM25_K}
    """,
)
def docs_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.retrieval import bm25_topk, rrf_fuse

    # NOT wrapped in ensure_parallelism: this query re-derives the scan
    # in several independent subtrees; each wrapped branch paid its own
    # text repartition while the unwrapped branches' single-task
    # explodes already overlap across cores (measured +0.4..+1.1 s).
    occ = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    qterms = (
        occ.where(F.col("doc_id") < _BM25_NQ)
        .select(F.col("doc_id").alias("query_id"), "token")
        .distinct()
    )
    bm = bm25_topk(occ, qterms, k=_RRF_EACH)

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _BM25_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cos = brute_force_topk(emb, queries_df, k=_RRF_EACH, exclude_self=True)

    fused = rrf_fuse(
        [bm, cos.withColumnRenamed("vec_id", "doc_id")], k=_BM25_K
    )
    return fused.select(
        "query_id", "doc_id", "rrf_score", F.col("rank").cast("long").alias("rank")
    )


# --------------------------------------------------------------------------
# Q: embedding_pca_project — PCA dimensionality reduction over the
# embedding column (operators/pca.py): fit the top-r principal
# components on the bounded md5-ordered driver sample (the pq_train /
# kmeans_assign training protocol — O(sample * d^2) regardless of corpus
# size), then project EVERY vector map-side: the (d x r) component
# matrix and mean ride the plan as literals, each coordinate is one
# left-to-right aggregate fold, the r rows per vector come from a
# single stack — zero shuffle, zero Python. The oracle replays the
# identical fold on the identical snapshot literals (same numpy fit via
# the shared _pca_fit_arrays), so every coordinate is engine-exact.
# --------------------------------------------------------------------------
_PCA_R = 4
_PCA_SAMPLE = 2000


def _pca_snapshot(query_name: str):
    """Refit the gate-SF components exactly as ``pca_fit`` does (same
    md5-ordered sample, shared numpy fit) without Spark. Same
    lazy/downgrade contract as ``_pq_fit_snapshot``."""
    import warnings

    try:
        from pmp_analytics_spark.operators.pca import _pca_fit_arrays

        rows = _oracle_embedding_rows(_PCA_SAMPLE)
        return _pca_fit_arrays([r[1] for r in rows], _PCA_R)
    except (ImportError, OSError, KeyError) as e:
        warnings.warn(
            f"{query_name} oracle downgraded to rows-only check: {e!r}",
            stacklevel=2,
        )
        return None


def _pca_oracle() -> str | None:
    snap = _pca_snapshot("embedding_pca_project")
    if snap is None:
        return None
    mu, W, lam, tot = snap
    d, r = len(mu), W.shape[1]
    mu_lit = "[" + ", ".join(repr(float(x)) for x in mu) + "]::DOUBLE[]"
    w_rows = ", ".join(
        f"({c + 1}, CAST({float(lam[c])!r} AS DOUBLE), CAST({float(lam[c] / tot)!r} AS DOUBLE), "
        f"[{', '.join(repr(float(x)) for x in W[:, c])}]::DOUBLE[])"
        for c in range(r)
    )
    return f"""
    WITH c AS (
        SELECT vec_id,
               LIST_TRANSFORM(GENERATE_SERIES(1, {d}), i ->
                   CAST(embedding[i] AS DOUBLE) - ({mu_lit})[i]) AS vc
        FROM embeddings
    ), w(comp, lam, vr, wv) AS (VALUES {w_rows})
    SELECT c.vec_id, CAST(comp AS BIGINT) AS comp,
           ROUND(lam, 6) AS eigenvalue,
           ROUND(vr, 6) AS var_ratio,
           ROUND(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {d}), i ->
               vc[i] * wv[i])), 6) AS coord
    FROM c CROSS JOIN w
    """


@query("embedding_pca_project", _pca_oracle)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.pca import pca_fit, pca_project_long

    emb = load_table(spark, sf_dir, "embeddings")
    mu, W, lam, tot = pca_fit(emb, r=_PCA_R, sample_n=_PCA_SAMPLE)
    out = pca_project_long(emb, mu, W, lam, tot)
    return out.select(
        "vec_id",
        "comp",
        F.round("eigenvalue", 6).alias("eigenvalue"),
        F.round("var_ratio", 6).alias("var_ratio"),
        F.round("coord", 6).alias("coord"),
    )


# --------------------------------------------------------------------------
# Q: docs_neardup_index_cdc — CDC maintenance of the persistable LSH
# band-bucket store (operators/dedup.py::lsh_index_refresh): the corpus
# moves old -> new (docs deleted, docs added, every doc_id % 17 = 2
# EDITED by an appended marker phrase), and the index follows by
# evicting touched ids and re-banding ONLY the changed docs' text —
# never re-shingling the corpus. Signatures are pure per-document
# functions, so the refreshed index must be BIT-IDENTICAL to a fresh
# rebuild on the new corpus: the oracle is exactly that rebuild through
# the same md5/minhash SQL chain as docs_neardup_pairs.
# --------------------------------------------------------------------------
_IDX_EDIT = " zz9xq zz9xq"


@query(
    "docs_neardup_index_cdc",
    f"""
    WITH newc AS (
        SELECT doc_id,
               CASE WHEN doc_id % 17 = 2 THEN text || '{_IDX_EDIT}'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 13 <> 4
    ), sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM newc
        WHERE LENGTH(text) >= 5
    ), hashed AS (
        SELECT doc_id, {_DUCK_SHINGLE_HASH} AS hs FROM sh
    ), sig AS (
        SELECT doc_id, {_DUCK_SIG} FROM hashed
    ), banded AS (
        {_DUCK_BAND_ROWS}
    )
    SELECT doc_id, band_id, band_key FROM banded
    """,
)
def docs_neardup_index_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import (
        band_key_frame,
        exploded_shingle_hashes,
        lsh_index_refresh,
        minhash_signatures,
    )
    from pmp_analytics_spark.operators.diff import snapshot_delta

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % 11 != 7)
    new = docs.where(F.col("doc_id") % 13 != 4).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 17 == 2, F.concat("text", F.lit(_IDX_EDIT))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    index0 = band_key_frame(
        minhash_signatures(
            exploded_shingle_hashes(old, "text", "doc_id", _SHINGLE_K),
            "doc_id",
            len(_SEEDS),
        ),
        "doc_id",
        len(_SEEDS),
        _BANDS,
    )
    delta = snapshot_delta(old, new, ["doc_id"])
    return lsh_index_refresh(
        index0,
        delta,
        "doc_id",
        "text",
        num_hashes=len(_SEEDS),
        bands=_BANDS,
        shingle_k=_SHINGLE_K,
    )


# --------------------------------------------------------------------------
# Q: embedding_ivf_cdc — CDC maintenance of the IVF assignment table
# under a FIXED quantizer (operators/similarity_search.py::
# ivf_index_refresh): the corpus moves old -> new (vectors deleted,
# added back, every vec_id % 17 = 2 NEGATED), the quantizer stays the
# one fitted on the OLD corpus (production posture: retrain rarely,
# maintain assignments continuously), and the refresh evicts touched
# ids + argmin-assigns only the changed vectors. Cell assignment is a
# pure per-vector function, so the refreshed table must equal a fresh
# assignment pass over the new corpus — the oracle snapshots the
# old-corpus centroids (lazy refit, same md5-ordered sample protocol as
# embedding_ivf_topk's oracle) and replays that pass in SQL.
# --------------------------------------------------------------------------
def _ivf_cdc_oracle() -> str | None:
    import warnings

    try:
        import numpy as np

        from pmp_analytics_spark.operators.similarity_search import _kmeans_fit

        # the OLD snapshot the quantizer is fitted on
        rows = _oracle_embedding_rows(
            max(2000, 20 * _IVF_N_CENTROIDS), keep=lambda i: i % 11 != 7
        )
        train = np.array([r[1] for r in rows], dtype=np.float64)
        cents = _kmeans_fit(train, _IVF_N_CENTROIDS, seed=42)
    except (ImportError, OSError, KeyError) as e:
        warnings.warn(
            f"embedding_ivf_cdc oracle downgraded to rows-only check: {e!r}",
            stacklevel=2,
        )
        return None

    cent_rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    return f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), newc AS (
        SELECT vec_id,
               CASE WHEN vec_id % 17 = 2 THEN LIST_TRANSFORM(v, x -> -x)
                    ELSE v END AS v
        FROM c WHERE vec_id % 13 <> 4
    ), cent(cell, cv) AS (
        VALUES {cent_rows}
    ), assign AS (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY LIST_DISTANCE(v, cv), cell) AS rn
        FROM newc CROSS JOIN cent
    )
    SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM assign WHERE rn = 1
    """


@query("embedding_ivf_cdc", _ivf_cdc_oracle)
def embedding_ivf_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.diff import snapshot_delta
    from pmp_analytics_spark.operators.similarity_search import (
        ivf_index_refresh,
        kmeans_assign,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = emb.where(F.col("vec_id") % 11 != 7)
    new = emb.where(F.col("vec_id") % 13 != 4).select(
        "vec_id",
        F.when(
            F.col("vec_id") % 17 == 2,
            F.transform("embedding", lambda x: -x),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    assigned0, cents = kmeans_assign(old, _IVF_N_CENTROIDS)
    index0 = assigned0.select("vec_id", F.col("__cell").alias("cell"))
    delta = snapshot_delta(old, new, ["vec_id"])
    return ivf_index_refresh(index0, delta, cents)


# --------------------------------------------------------------------------
# Q: embedding_pq_cdc — CDC maintenance of the PQ code table under FIXED
# codebooks (operators/similarity_search.py::pq_codes_refresh), the
# third index-maintenance sibling (LSH bands 169, IVF cells 170): the
# same old -> new corpus move as embedding_ivf_cdc, codebooks fitted on
# the OLD corpus, refresh evicts touched ids and re-encodes only the
# changed vectors. PQ codes are pure per-vector functions, so the oracle
# replays a fresh encode pass over the new corpus against the
# snapshot-refit codebooks (same argmin/tie-break SQL as the PQ ANN
# oracles).
# --------------------------------------------------------------------------
def _pq_cdc_oracle() -> str | None:
    import warnings

    try:
        import numpy as np

        from pmp_analytics_spark.operators.similarity_search import _kmeans_fit

        # the OLD snapshot the codebooks are fitted on
        rows = _oracle_embedding_rows(
            max(2000, 20 * _PQ_K), keep=lambda i: i % 11 != 7
        )
        train = np.array([r[1] for r in rows], dtype=np.float64)
        d = train.shape[1]
        sub = d // _PQ_M
        books = [
            _kmeans_fit(train[:, j * sub : (j + 1) * sub], _PQ_K, 42 + j)
            for j in range(_PQ_M)
        ]
    except (ImportError, OSError, KeyError) as e:
        warnings.warn(
            f"embedding_pq_cdc oracle downgraded to rows-only check: {e!r}",
            stacklevel=2,
        )
        return None

    cb_rows = ", ".join(
        f"({j}, {c}, [{', '.join(repr(float(x)) for x in books[j][c])}]::DOUBLE[])"
        for j in range(_PQ_M)
        for c in range(_PQ_K)
    )
    return f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), newc AS (
        SELECT vec_id,
               CASE WHEN vec_id % 17 = 2 THEN LIST_TRANSFORM(v, x -> -x)
                    ELSE v END AS v
        FROM c WHERE vec_id % 13 <> 4
    ), cb(j, code, cv) AS (
        VALUES {cb_rows}
    ), subdist AS (
        SELECT newc.vec_id, cb.j, cb.code,
               LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {sub}), i ->
                   (v[cb.j * {sub} + i] - cv[i]) * (v[cb.j * {sub} + i] - cv[i]))) AS d2
        FROM newc CROSS JOIN cb
    ), enc AS (
        SELECT vec_id, j, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS rn
        FROM subdist
    )
    SELECT vec_id,
           STRING_AGG(CAST(code AS VARCHAR), ',' ORDER BY j) AS codes
    FROM enc WHERE rn = 1 GROUP BY vec_id
    """


@query("embedding_pq_cdc", _pq_cdc_oracle)
def embedding_pq_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.diff import snapshot_delta
    from pmp_analytics_spark.operators.similarity_search import (
        pq_codes_refresh,
        pq_encode,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = emb.where(F.col("vec_id") % 11 != 7)
    new = emb.where(F.col("vec_id") % 13 != 4).select(
        "vec_id",
        F.when(
            F.col("vec_id") % 17 == 2,
            F.transform("embedding", lambda x: -x),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    books = pq_train(old, m=_PQ_M, k_codes=_PQ_K)
    codes0 = pq_encode(old, books)
    delta = snapshot_delta(old, new, ["vec_id"])
    # DECLARED output serializes the code list to a CSV string: the
    # driver's canonicalizer sorts result frames through pandas, where a
    # top-level list column is unhashable (r06 crash) — scalar columns
    # only at the query edge; the array stays the operator's native type.
    return pq_codes_refresh(codes0, delta, books).select(
        "vec_id",
        F.array_join(F.col("__codes").cast("array<string>"), ",").alias(
            "codes"
        ),
    )


# --------------------------------------------------------------------------
# Q: embedding_ivfpq_topk — the FAISS-standard "IVFx,PQy" composed index
# (Jégou et al., TPAMI 2011 §IV): coarse k-means cells + product
# quantization of the RESIDUAL x - cent[cell(x)], probed by nprobe cells
# per query with per-(query, cell) residual ADC tables. Residual PQ is
# what completes ivf_topk x pq_topk into the production ANN shape:
# residuals concentrate near zero whichever cell a vector lives in, so
# the same bit budget quantizes far more precisely than raw-coordinate
# PQ. The oracle refits both quantizers bit-identically (the shared
# md5-ordered sample protocol) and replays assignment, residual
# encoding, probing, residual tables, and ADC ranking in SQL.
# --------------------------------------------------------------------------
_IVFPQ_NPROBE = 4


def _ivfpq_oracle() -> str | None:
    """Full SQL replay for embedding_ivfpq_topk. Same lazy/downgrade
    contract as ``_ivf_oracle``/``_pq_fit_snapshot``."""
    import warnings

    try:
        import numpy as np

        from pmp_analytics_spark.operators.similarity_search import _kmeans_fit

        rows = _oracle_embedding_rows(
            max(2000, 20 * max(_IVF_N_CENTROIDS, _PQ_K))
        )
        train = np.array([r[1] for r in rows], dtype=np.float64)
        d = train.shape[1]
        sub = d // _PQ_M
        cents = _kmeans_fit(train, _IVF_N_CENTROIDS, seed=42)
        d2 = (
            (train**2).sum(axis=1)[:, None]
            + (cents**2).sum(axis=1)[None, :]
            - 2.0 * (train @ cents.T)
        )
        resid = train - cents[d2.argmin(axis=1)]
        books = [
            _kmeans_fit(resid[:, j * sub : (j + 1) * sub], _PQ_K, 42 + j)
            for j in range(_PQ_M)
        ]
    except (ImportError, OSError, KeyError) as e:  # tables/deps unavailable
        warnings.warn(
            f"embedding_ivfpq_topk oracle downgraded to rows-only check: {e!r}",
            stacklevel=2,
        )
        return None

    cent_rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    cb_rows = ", ".join(
        f"({j}, {c}, [{', '.join(repr(float(x)) for x in books[j][c])}]::DOUBLE[])"
        for j in range(_PQ_M)
        for c in range(_PQ_K)
    )
    return f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent(cell, cv) AS (
        VALUES {cent_rows}
    ), cb(j, code, ccv) AS (
        VALUES {cb_rows}
    ), assign AS (
        SELECT vec_id, v, cell, cv,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY LIST_DISTANCE(v, cv), cell) AS rn
        FROM c CROSS JOIN cent
    ), cells AS (
        -- residual against the winning cell's centroid
        SELECT vec_id, cell,
               LIST_TRANSFORM(GENERATE_SERIES(1, {d}), i -> v[i] - cv[i]) AS vr
        FROM assign WHERE rn = 1
    ), subdist AS (
        SELECT cells.vec_id, cb.j, cb.code,
               LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {sub}), i ->
                   (vr[cb.j * {sub} + i] - ccv[i])
                   * (vr[cb.j * {sub} + i] - ccv[i]))) AS d2
        FROM cells CROSS JOIN cb
    ), enc AS (
        SELECT vec_id, j, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                  ORDER BY d2, code) AS rn
        FROM subdist
    ), codes AS (
        SELECT e.vec_id, cl.cell, LIST(e.code ORDER BY e.j) AS codes
        FROM (SELECT vec_id, j, code FROM enc WHERE rn = 1) e
        JOIN cells cl USING (vec_id)
        GROUP BY e.vec_id, cl.cell
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {_NQ}
    ), qprobe AS (
        SELECT query_id, qv, cell, cv,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY LIST_DISTANCE(qv, cv), cell) AS rn
        FROM q CROSS JOIN cent
    ), probes AS (
        SELECT query_id, cell,
               LIST_TRANSFORM(GENERATE_SERIES(1, {d}), i -> qv[i] - cv[i]) AS qr
        FROM qprobe WHERE rn <= {_IVFPQ_NPROBE}
    ), qtab0 AS (
        SELECT p.query_id, p.cell, cb.j, cb.code,
               LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {sub}), i ->
                   (qr[cb.j * {sub} + i] - ccv[i])
                   * (qr[cb.j * {sub} + i] - ccv[i]))) AS t
        FROM probes p CROSS JOIN cb
    ), qtab1 AS (
        SELECT query_id, cell, j, LIST(t ORDER BY code) AS trow
        FROM qtab0 GROUP BY query_id, cell, j
    ), qtab AS (
        SELECT query_id, cell, LIST(trow ORDER BY j) AS tbl
        FROM qtab1 GROUP BY query_id, cell
    ), adc AS (
        SELECT qt.query_id, codes.vec_id,
               ROUND(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {_PQ_M}), j ->
                   tbl[j][codes.codes[j] + 1])), 6) AS adc_dist
        FROM codes JOIN qtab qt ON codes.cell = qt.cell
    ), ranked AS (
        SELECT query_id, vec_id, adc_dist,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_dist ASC, vec_id) AS rank
        FROM adc
    )
    SELECT query_id, vec_id, adc_dist, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_TOPK}
    """


@query("embedding_ivfpq_topk", _ivfpq_oracle)
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.similarity_search import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivfpq_topk(
        emb,
        queries_df,
        n_centroids=_IVF_N_CENTROIDS,
        nprobe=_IVFPQ_NPROBE,
        m=_PQ_M,
        k_codes=_PQ_K,
        k=_TOPK,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


# --------------------------------------------------------------------------
# Q: embedding_index_eval — the retrieval/ANN quality harness as a
# declared operator (VERDICT r7 #3): recall@5, MRR, and nDCG@5 of every
# approximate index family in the repo — sign-LSH, IVF, PQ-ADC, and the
# composed IVF-PQ — against the brute-force exact ground truth, plus the
# 'brute' sanity row (all metrics 1.0 by construction). The metrics are
# exact arithmetic over two bounded ranked lists, so the ENTIRE
# evaluation replays in SQL: each method's candidate list is its own
# full oracle replay (the registered oracle bodies, nested as
# subqueries), the DCG weights are shared Python-computed literals, and
# means divide by the fixed query count so empty-bucket queries score 0
# on both engines. Index tuning gets a measurable, oracle-checked
# target.
# --------------------------------------------------------------------------
def _index_eval_oracle() -> str | None:
    """Composes the already-registered per-method replays; downgrades
    (with the usual warning) if any component oracle is unavailable."""
    import warnings

    from pmp_analytics_spark.operators.similarity_search import ndcg_weights

    parts = {
        "brute": _topk_oracle(),
        "lsh": ORACLE["embedding_lsh_topk"],
        "ivf": _ivf_oracle(),
        "pq": _pq_oracle(),
        "ivfpq": _ivfpq_oracle(),
    }
    missing = [m for m, sql in parts.items() if not isinstance(sql, str)]
    if missing:
        warnings.warn(
            "embedding_index_eval oracle downgraded to rows-only check: "
            f"component oracles unavailable: {missing}",
            stacklevel=2,
        )
        return None
    w, idcg = ndcg_weights(_TOPK)
    wcase = " ".join(
        f"WHEN {i + 1} THEN {x!r}" for i, x in enumerate(w)
    )
    cand = "\n        UNION ALL ".join(
        f"SELECT '{m}' AS method, query_id, vec_id, rank FROM ({sql})"
        for m, sql in parts.items()
    )
    return f"""
    WITH truth AS (
        SELECT query_id, vec_id FROM ({parts['brute']})
    ), cand AS (
        {cand}
    ), hits AS (
        SELECT c.method, c.query_id, c.rank,
               CASE WHEN t.vec_id IS NULL THEN 0 ELSE 1 END AS rel
        FROM cand c LEFT JOIN truth t
          ON c.query_id = t.query_id AND c.vec_id = t.vec_id
    ), per_q AS (
        SELECT method, query_id,
               SUM(rel) * 1.0 / {_TOPK} AS recall,
               COALESCE(1.0 / MIN(CASE WHEN rel = 1 THEN rank END), 0.0)
                   AS mrr,
               SUM(rel * (CASE rank {wcase} END)) / {idcg!r} AS ndcg
        FROM hits GROUP BY method, query_id
    )
    SELECT method,
           ROUND(SUM(recall) / {_NQ}, 6) AS recall_at_k,
           ROUND(SUM(mrr) / {_NQ}, 6) AS mrr,
           ROUND(SUM(ndcg) / {_NQ}, 6) AS ndcg
    FROM per_q GROUP BY method
    """


@query("embedding_index_eval", _index_eval_oracle)
def embedding_index_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.similarity_search import (
        brute_force_topk,
        index_eval,
        ivf_topk,
        ivfpq_topk,
        lsh_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    from pmp_analytics_spark.operators.partitioning import ensure_parallelism

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()  # five consumers: one per candidate pipeline
    # ONE widened materialization of the (id, vec) corpus shared by all
    # five arms (guide §5): unfused, each arm's internal
    # ensure_parallelism re-scanned and re-repartitioned the corpus
    # independently (5 scans + 3 exchanges per eval); the arms'
    # ensure_parallelism wraps no-op on this frame (already at
    # defaultParallelism, no Exchange in its plan) and every pass reads
    # the checkpointed blocks.
    dense = ensure_parallelism(
        emb.select("vec_id", "embedding")
    ).localCheckpoint(eager=False)
    truth = brute_force_topk(dense, queries_df, k=_TOPK).localCheckpoint(
        eager=False
    )  # ground truth AND the 'brute' sanity arm: evaluate it once
    books = pq_train(dense, m=_PQ_M, k_codes=_PQ_K)
    methods = {
        "brute": truth,
        "lsh": lsh_topk(dense, queries_df, dim=64, k=_TOPK, n_planes=6),
        "ivf": ivf_topk(
            dense, queries_df, n_centroids=_IVF_N_CENTROIDS,
            nprobe=_IVF_NPROBE, k=_TOPK,
        ),
        "pq": pq_topk(pq_encode(dense, books), books, queries_df, k=_TOPK),
        "ivfpq": ivfpq_topk(
            dense, queries_df, n_centroids=_IVF_N_CENTROIDS,
            nprobe=_IVFPQ_NPROBE, m=_PQ_M, k_codes=_PQ_K, k=_TOPK,
        ),
    }
    return index_eval(truth, methods, k=_TOPK, n_queries=_NQ)


# --------------------------------------------------------------------------
# Q: embedding_ivfpq_cdc — CDC maintenance of the COMPOSED IVF-PQ index
# under fixed quantizers (operators/similarity_search.py::
# ivfpq_codes_refresh) — the index-maintenance QUARTET's last member
# (LSH bands, IVF cells, PQ codes, IVF-PQ cell+residual-codes): the same
# old -> new corpus move as the other CDC queries, both quantizers
# fitted on the OLD corpus, refresh evicts touched ids and re-runs the
# fused assign+residual+encode pass only on changed vectors. Cell and
# codes are pure per-vector functions, so the oracle replays a fresh
# encode of the NEW corpus against the snapshot-refit quantizers (the
# ivfpq oracle's assignment/residual/argmin SQL with the old-snapshot
# fit).
# --------------------------------------------------------------------------
def _ivfpq_cdc_oracle() -> str | None:
    import warnings

    try:
        import numpy as np

        from pmp_analytics_spark.operators.similarity_search import _kmeans_fit

        rows = _oracle_embedding_rows(
            max(2000, 20 * max(_IVF_N_CENTROIDS, _PQ_K)),
            keep=lambda i: i % 11 != 7,  # the OLD snapshot
        )
        train = np.array([r[1] for r in rows], dtype=np.float64)
        d = train.shape[1]
        sub = d // _PQ_M
        cents = _kmeans_fit(train, _IVF_N_CENTROIDS, seed=42)
        d2 = (
            (train**2).sum(axis=1)[:, None]
            + (cents**2).sum(axis=1)[None, :]
            - 2.0 * (train @ cents.T)
        )
        resid = train - cents[d2.argmin(axis=1)]
        books = [
            _kmeans_fit(resid[:, j * sub : (j + 1) * sub], _PQ_K, 42 + j)
            for j in range(_PQ_M)
        ]
    except (ImportError, OSError, KeyError) as e:
        warnings.warn(
            f"embedding_ivfpq_cdc oracle downgraded to rows-only check: {e!r}",
            stacklevel=2,
        )
        return None

    cent_rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    cb_rows = ", ".join(
        f"({j}, {c}, [{', '.join(repr(float(x)) for x in books[j][c])}]::DOUBLE[])"
        for j in range(_PQ_M)
        for c in range(_PQ_K)
    )
    return f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), newc AS (
        SELECT vec_id,
               CASE WHEN vec_id % 17 = 2 THEN LIST_TRANSFORM(v, x -> -x)
                    ELSE v END AS v
        FROM c WHERE vec_id % 13 <> 4
    ), cent(cell, cv) AS (
        VALUES {cent_rows}
    ), cb(j, code, ccv) AS (
        VALUES {cb_rows}
    ), assign AS (
        SELECT vec_id, v, cell, cv,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY LIST_DISTANCE(v, cv), cell) AS rn
        FROM newc CROSS JOIN cent
    ), cells AS (
        SELECT vec_id, cell,
               LIST_TRANSFORM(GENERATE_SERIES(1, {d}), i -> v[i] - cv[i]) AS vr
        FROM assign WHERE rn = 1
    ), subdist AS (
        SELECT cells.vec_id, cells.cell, cb.j, cb.code,
               LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {sub}), i ->
                   (vr[cb.j * {sub} + i] - ccv[i])
                   * (vr[cb.j * {sub} + i] - ccv[i]))) AS d2
        FROM cells CROSS JOIN cb
    ), enc AS (
        SELECT vec_id, cell, j, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                  ORDER BY d2, code) AS rn
        FROM subdist
    )
    SELECT vec_id, CAST(cell AS BIGINT) AS cell,
           STRING_AGG(CAST(code AS VARCHAR), ',' ORDER BY j) AS codes
    FROM enc WHERE rn = 1 GROUP BY vec_id, cell
    """


@query("embedding_ivfpq_cdc", _ivfpq_cdc_oracle)
def embedding_ivfpq_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.diff import snapshot_delta
    from pmp_analytics_spark.operators.similarity_search import (
        ivfpq_codes_refresh,
        ivfpq_encode,
        ivfpq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = emb.where(F.col("vec_id") % 11 != 7)
    new = emb.where(F.col("vec_id") % 13 != 4).select(
        "vec_id",
        F.when(
            F.col("vec_id") % 17 == 2,
            F.transform("embedding", lambda x: -x),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    cents, books = ivfpq_train(
        old, n_centroids=_IVF_N_CENTROIDS, m=_PQ_M, k_codes=_PQ_K
    )
    index0 = ivfpq_encode(old, cents, books)
    delta = snapshot_delta(old, new, ["vec_id"])
    # cell as BIGINT, codes as a CSV string: the driver canonicalizer
    # cannot hash top-level arrays (registry-wide gate)
    return ivfpq_codes_refresh(index0, delta, cents, books).select(
        "vec_id",
        F.col("__cell").alias("cell"),
        F.array_join(F.col("__codes").cast("array<string>"), ",").alias(
            "codes"
        ),
    )


# --------------------------------------------------------------------------
# Q: docs_dedup_eval — the dedup-quality harness as a declared operator
# (the pair-set sibling of embedding_index_eval): on the bounded exact
# slice (doc_id < 1000, the PPJoin regime note at docs_jaccard_exact_
# pairs), grade MinHash-LSH against the EXACT shingle-Jaccard ground
# truth at the MinHash family's threshold (0.6): raw band-bucket
# CANDIDATES (the recall/precision trade the banding parameters buy)
# and the VERIFIED pipeline (exact Jaccard over the same hashed shingle
# sets — precision 1.0 and recall = bucket recall BY CONSTRUCTION,
# which the harness proves rather than asserts), plus the truth sanity
# row. Counts and int/int ratios only, so the whole evaluation —
# signatures, banding, bucket join, verification, brute-force truth,
# metrics — replays in one SQL statement built from the same _DUCK_*
# machinery as the underlying queries.
# --------------------------------------------------------------------------
_DE_T = 0.6
_DE_MAX_ID = 1000


def _dedup_eval_frame(docs) -> DataFrame:
    """The dedup-eval body over any (doc_id, text) frame — shared by the
    declared query (bounded doc_id slice) and the scale soak (per-
    replica slice, so the graded problem grows with the corpus)."""
    from pmp_analytics_spark.operators.dedup import (
        dedup_pair_eval,
        exploded_shingle_hashes,
        lsh_candidates_from_sig,
        minhash_signatures,
    )

    ex = exploded_shingle_hashes(docs, "text", "doc_id", _SHINGLE_K).cache()
    # Exact Jaccard for BOTH the truth and the verified arm from ONE
    # exploded equi-join on the hashed gram (hash join — the plan gate's
    # zero-CartesianProduct rule holds): pair intersection sizes by
    # groupBy, set sizes joined back. On the bounded eval slice the
    # sum-of-df^2 join is the cheap exact path (and one shared `jac`
    # frame serves two arms); the open-corpus exact join remains
    # jaccard_prefix_join, whose prefix filter exists for exactly the
    # regime this slice excludes.
    d = ex.select("doc_id", "__h").distinct().cache()
    sz = d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
    inter = (
        d.select(F.col("doc_id").alias("id_a"), "__h")
        .join(d.select(F.col("doc_id").alias("id_b"), "__h"), "__h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    jac = (
        inter.join(sz.select(F.col("doc_id").alias("id_a"),
                             F.col("__n").alias("__na")), "id_a")
        .join(sz.select(F.col("doc_id").alias("id_b"),
                        F.col("__n").alias("__nb")), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i"))
             ).alias("__j"),
        )
        .localCheckpoint(eager=False)  # truth arm + verified join share it
    )
    truth = jac.where(F.col("__j") >= _DE_T).select("id_a", "id_b")
    sig = minhash_signatures(ex, "doc_id", len(_SEEDS))
    cand = lsh_candidates_from_sig(sig, "doc_id", len(_SEEDS), _BANDS).cache()
    verified = cand.join(jac, ["id_a", "id_b"]).where(
        F.col("__j") >= _DE_T
    ).select("id_a", "id_b")
    return dedup_pair_eval(
        truth,
        {
            "exact_truth": truth,
            "lsh_candidates": cand,
            "lsh_verified": verified,
        },
    )


@query(
    "docs_dedup_eval",
    f"""
    WITH sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents
        WHERE LENGTH(text) >= 5 AND doc_id < {_DE_MAX_ID}
    ), hashed AS (
        SELECT doc_id, {_DUCK_SHINGLE_HASH} AS hs FROM sh
    ), d AS (
        SELECT DISTINCT doc_id, UNNEST(hs) AS g FROM hashed
    ), sz AS (
        SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id
    ), inter AS (
        -- pairwise intersection sizes via the exploded equi-join (the
        -- per-pair LIST_INTERSECT form is quadratic in set width)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        FROM d a JOIN d b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), jac AS (
        SELECT id_a, id_b, i * 1.0 / (sa.n + sb.n - i) AS j
        FROM inter JOIN sz sa ON inter.id_a = sa.doc_id
                   JOIN sz sb ON inter.id_b = sb.doc_id
    ), truth AS (
        SELECT id_a, id_b FROM jac WHERE j >= {_DE_T}
    ), sig AS (
        SELECT doc_id, {_DUCK_SIG} FROM hashed
    ), banded AS (
        {_DUCK_BAND_ROWS}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
    ), verified AS (
        SELECT c.id_a, c.id_b
        FROM cand c JOIN jac USING (id_a, id_b) WHERE jac.j >= {_DE_T}
    ), m_all AS (
        SELECT 'exact_truth' AS method, id_a, id_b FROM truth
        UNION ALL SELECT 'lsh_candidates', id_a, id_b FROM cand
        UNION ALL SELECT 'lsh_verified', id_a, id_b FROM verified
    ), hits AS (
        SELECT m.method,
               CASE WHEN t.id_a IS NULL THEN 0 ELSE 1 END AS rel
        FROM m_all m LEFT JOIN truth t
          ON m.id_a = t.id_a AND m.id_b = t.id_b
    ), tot AS (SELECT COUNT(*) AS n_truth FROM truth)
    SELECT method,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(rel) AS BIGINT) AS n_true,
           ROUND(SUM(rel) * 1.0 / COUNT(*), 6) AS precision,
           ROUND(SUM(rel) * 1.0 / n_truth, 6) AS recall,
           CASE WHEN SUM(rel) = 0 THEN 0.0
                ELSE ROUND(2 * (SUM(rel) * 1.0 / COUNT(*))
                             * (SUM(rel) * 1.0 / n_truth)
                           / ((SUM(rel) * 1.0 / COUNT(*))
                              + (SUM(rel) * 1.0 / n_truth)), 6)
           END AS f1
    FROM hits, tot GROUP BY method, n_truth
    """,
)
def docs_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < _DE_MAX_ID
    )
    return _dedup_eval_frame(docs)


# --------------------------------------------------------------------------
# Q: docs_passage_bm25 — passage-level retrieval, the RAG index unit:
# the corpus (docs outside the query set) is chunked into overlapping
# 32-token windows at stride 16 (retrieval.passage_occurrences — pure
# map-side sequence+slice fan-out), and the UNCHANGED bm25_topk ranks
# PASSAGES per query, so a long document can no longer bury its one
# matching span under length normalization. Passage ids pack
# (doc+1)*2^32+pidx for the ranker (a 1000-wide pack would alias a
# >=1000-window document into its neighbor's id space; 32 bits of pidx
# cannot) and decode on output via shift/mask. The oracle
# replays the identical window arithmetic (GENERATE_SERIES + inclusive
# list slices) and the identical BM25 formula over passages.
# --------------------------------------------------------------------------
_PAS_NQ = 5
_PAS_K = 5
_PAS_W = 32
_PAS_S = 16


@query(
    "docs_passage_bm25",
    f"""
    WITH tk AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
    pas AS (
        SELECT doc_id, CAST((i - 1) // {_PAS_S} AS BIGINT) AS pidx,
               toks[i:i + {_PAS_W - 1}] AS ptoks
        FROM tk, LATERAL UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks), 1), {_PAS_S})) AS u(i)
        WHERE doc_id >= {_PAS_NQ}
    ),
    occ AS (
        SELECT (doc_id + 1) * 4294967296 + pidx AS pid, UNNEST(ptoks) AS token
        FROM pas
    ),
    tf AS (SELECT pid, token, COUNT(*) AS tf FROM occ GROUP BY 1, 2),
    dl AS (SELECT pid, COUNT(*) AS dl FROM occ GROUP BY 1),
    corp AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    qt AS (
        SELECT DISTINCT doc_id AS query_id, token
        FROM (SELECT doc_id, UNNEST(toks) AS token FROM tk WHERE doc_id < {_PAS_NQ})
    ),
    dft AS (
        SELECT token, COUNT(*) AS df FROM tf
        WHERE token IN (SELECT DISTINCT token FROM qt) GROUP BY token
    ),
    scored AS (
        SELECT qt.query_id, tf.pid,
               ROUND(SUM(
                   LN((corp.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / corp.avgdl))
               ), 6) AS bm25
        FROM qt
        JOIN tf USING (token)
        JOIN dft USING (token)
        JOIN dl ON dl.pid = tf.pid
        CROSS JOIN corp
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, pid, bm25,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY bm25 DESC, pid) AS rank
        FROM scored
    )
    SELECT query_id, pid // 4294967296 - 1 AS doc_id, pid % 4294967296 AS pidx,
           bm25, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_PAS_K}
    """,
)
def docs_passage_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.retrieval import (
        bm25_topk,
        passage_occurrences,
    )

    from pmp_analytics_spark.operators.partitioning import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    occ_p = passage_occurrences(
        docs.where(F.col("doc_id") >= _PAS_NQ),
        "doc_id",
        tokens("text"),
        width=_PAS_W,
        stride=_PAS_S,
    ).select(
        ((F.col("doc_id") + 1) * F.lit(4294967296) + F.col("pidx")).alias("pid"), "token"
    )
    qterms = (
        docs.where(F.col("doc_id") < _PAS_NQ)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(tokens("text")).alias("token"),
        )
        .distinct()
    )
    out = bm25_topk(occ_p, qterms, k=_PAS_K, id_col="pid")
    return out.select(
        "query_id",
        (F.shiftrightunsigned(F.col("pid"), 32) - 1).cast("long").alias("doc_id"),
        F.col("pid").bitwiseAND(F.lit(4294967295)).alias("pidx"),
        "bm25",
        F.col("rank").cast("long").alias("rank"),
    )


# --------------------------------------------------------------------------
# Q: docs_bm25_index_cdc — CDC maintenance of the BM25 LEXICAL index,
# completing the index-maintenance family (LSH bands 169, IVF cells
# 170, PQ codes 171) on the retrieval side: the corpus moves old -> new
# (docs deleted, added, every doc_id % 17 = 2 edited by an appended
# marker phrase) and the index follows in O(delta) — per-doc postings
# (tf, dl) ride the shared evict/recompute skeleton, while the
# CROSS-document df merges a decrement from the EVICTED posting rows
# with an increment from the fresh docs' distinct tokens (a token's row
# leaves the index exactly when its last document does). Both halves
# must be bit-identical to a fresh rebuild on the new corpus — the
# oracle IS that rebuild.
# --------------------------------------------------------------------------
@query(
    "docs_bm25_index_cdc",
    f"""
    WITH newc AS (
        SELECT doc_id,
               CASE WHEN doc_id % 17 = 2 THEN text || '{_IDX_EDIT}'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 13 <> 4
    ),
    occ AS (
        SELECT doc_id, UNNEST({_DUCK_TOKENS}) AS token FROM newc
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM occ GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM occ GROUP BY 1),
    dft AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token)
    SELECT tf.doc_id, tf.token, tf.tf, dl.dl, dft.df
    FROM tf JOIN dl USING (doc_id) JOIN dft USING (token)
    """,
)
def docs_bm25_index_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.diff import snapshot_delta
    from pmp_analytics_spark.operators.retrieval import (
        bm25_index_build,
        bm25_index_refresh,
    )

    from pmp_analytics_spark.operators.partitioning import ensure_parallelism

    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    old = docs.where(F.col("doc_id") % 11 != 7)
    new = docs.where(F.col("doc_id") % 13 != 4).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 17 == 2, F.concat("text", F.lit(_IDX_EDIT))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    postings0, df0 = bm25_index_build(old, tokens("text"))
    delta = snapshot_delta(old, new, ["doc_id"])
    postings2, df2 = bm25_index_refresh(
        postings0, df0, delta, lambda c: tokens(c)
    )
    return postings2.join(df2, "token").select(
        "doc_id", "token", "tf", "dl", "df"
    )


# --------------------------------------------------------------------------
# Q: docs_split_leakage — dedup-aware split hygiene: near-duplicate
# pairs that CROSS the deterministic train/eval hash split leak
# training text into evaluation (the contamination mode Dodge et al.
# 2021 measured in C4; the reason dedup must run BEFORE splitting).
# Composition, not new machinery: the docs_neardup_pairs LSH+verify
# chain supplies the pairs, sample.hash_bucket supplies the stable
# md5 split (rand() is retry-unstable; content hashing is), and two
# id-keyed joins attach the split labels — pairs within one side drop.
# Output: the offending pairs with both labels, ready to quarantine.
# --------------------------------------------------------------------------
_LEAK_MOD = 10
_LEAK_TRAIN = 8  # buckets 0-7 train, 8-9 eval


@query(
    "docs_split_leakage",
    f"""
    WITH sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents
        WHERE LENGTH(text) >= 5
    ), hashed AS (
        SELECT doc_id, {_DUCK_SHINGLE_HASH} AS hs FROM sh
    ), sig AS (
        SELECT doc_id, {_DUCK_SIG} FROM hashed
    ), banded AS (
        {_DUCK_BAND_ROWS}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
    ), dsh AS (
        SELECT doc_id, LIST_DISTINCT(hs) AS dsh FROM hashed
    ), scored AS (
        SELECT id_a, id_b,
               LEN(LIST_INTERSECT(a.dsh, b.dsh)) * 1.0 /
               (LEN(a.dsh) + LEN(b.dsh) - LEN(LIST_INTERSECT(a.dsh, b.dsh))) AS j
        FROM cand JOIN dsh a ON cand.id_a = a.doc_id
                  JOIN dsh b ON cand.id_b = b.doc_id
    ), pairs AS (
        SELECT id_a, id_b, ROUND(j, 6) AS jaccard
        FROM scored WHERE j >= {_JACCARD_T}
    ), split AS (
        SELECT doc_id,
               CASE WHEN CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                         % {_LEAK_MOD} < {_LEAK_TRAIN}
                    THEN 'train' ELSE 'eval' END AS split
        FROM documents
    )
    SELECT p.id_a, p.id_b, p.jaccard,
           sa.split AS split_a, sb.split AS split_b
    FROM pairs p
    JOIN split sa ON p.id_a = sa.doc_id
    JOIN split sb ON p.id_b = sb.doc_id
    WHERE sa.split <> sb.split
    """,
)
def docs_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.sample import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_dedup(
        docs,
        text_col="text",
        id_col="doc_id",
        shingle_k=_SHINGLE_K,
        threshold=_JACCARD_T,
        num_hashes=len(_SEEDS),
        bands=_BANDS,
    )
    split = docs.select(
        "doc_id",
        F.when(hash_bucket("doc_id", _LEAK_MOD) < _LEAK_TRAIN, "train")
        .otherwise("eval")
        .alias("split"),
    )
    sa = split.withColumnsRenamed({"doc_id": "id_a", "split": "split_a"})
    sb = split.withColumnsRenamed({"doc_id": "id_b", "split": "split_b"})
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "jaccard", "split_a", "split_b")
    )


# --------------------------------------------------------------------------
# Q: docs_curation_funnel — the END-TO-END curation pipeline as ONE
# auditable funnel (the per-stage yield table a dataset card publishes):
# raw corpus → C4 quality gate → near-dup canonical dedup (LSH + exact
# Jaccard + transitive closure, computed on the C4 SURVIVORS — dedup
# after filtering is the production order: fewer docs to shingle) →
# deterministic md5 train/eval split. Pure composition of declared
# stages; each stage count is a 1-row aggregate, unioned. The oracle
# re-derives every stage in SQL, including the recursive-CTE closure
# over the filtered corpus. (The Gopher gate is deliberately absent:
# its stopword rule keeps 0 synthetic docs — a degenerate funnel stage;
# docs_gopher_filters covers that operator.)
# --------------------------------------------------------------------------
def _curation_funnel_oracle() -> str:
    from pmp_analytics_spark.queries.corpus import DUCK_C4_KEEP, DUCK_C4_SCORED

    return """
    WITH {c4}

    , kept AS MATERIALIZED (
        SELECT d.doc_id, d.text FROM documents d
        JOIN c4_scored s ON s.doc_id = d.doc_id
        WHERE {c4keep}
    ), sh AS (
        SELECT doc_id, {shingles} AS sh FROM kept
        WHERE LENGTH(text) >= 5
    ), hashed AS (
        SELECT doc_id, {shash} AS hs FROM sh
    ), sig AS (
        SELECT doc_id, {sig} FROM hashed
    ), banded AS (
        {bands}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
    ), dsh AS (
        SELECT doc_id, LIST_DISTINCT(hs) AS dsh FROM hashed
    ), pairs AS (
        SELECT id_a, id_b FROM (
            SELECT id_a, id_b,
                   LEN(LIST_INTERSECT(a.dsh, b.dsh)) * 1.0 /
                   (LEN(a.dsh) + LEN(b.dsh) - LEN(LIST_INTERSECT(a.dsh, b.dsh))) AS j
            FROM cand JOIN dsh a ON cand.id_a = a.doc_id
                      JOIN dsh b ON cand.id_b = b.doc_id
        ) WHERE j >= {jt}
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), walk AS (
        WITH RECURSIVE w(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT w.src, e.dst FROM w JOIN edges e ON w.dst = e.src
        ) SELECT * FROM w
    ), losers AS (
        SELECT src AS id FROM walk GROUP BY src
        HAVING src <> LEAST(src, MIN(dst))
    ), surv AS MATERIALIZED (
        SELECT k.doc_id FROM kept k ANTI JOIN losers l ON k.doc_id = l.id
    ), split AS (
        SELECT doc_id,
               CASE WHEN CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                         % {mod} < {train}
                    THEN 'train' ELSE 'eval' END AS s
        FROM surv
    )
    SELECT 'raw' AS stage, (SELECT COUNT(*) FROM documents) AS n_docs
    UNION ALL SELECT 'c4', (SELECT COUNT(*) FROM kept)
    UNION ALL SELECT 'dedup', (SELECT COUNT(*) FROM surv)
    UNION ALL SELECT 'train', (SELECT COUNT(*) FROM split WHERE s = 'train')
    UNION ALL SELECT 'eval', (SELECT COUNT(*) FROM split WHERE s = 'eval')
    """.format(
        c4=DUCK_C4_SCORED,
        c4keep=DUCK_C4_KEEP,
        shingles=_DUCK_SHINGLES,
        shash=_DUCK_SHINGLE_HASH,
        sig=_DUCK_SIG,
        bands=_DUCK_BAND_ROWS,
        jt=_JACCARD_T,
        mod=10,
        train=8,
    )


@query("docs_curation_funnel", _curation_funnel_oracle)
def docs_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import dedup_keep_canonical
    from pmp_analytics_spark.operators.partitioning import ensure_parallelism
    from pmp_analytics_spark.operators.sample import hash_bucket
    from pmp_analytics_spark.queries.corpus import _c4_keep, _c4_scored

    # the C4 scoring pass (4 regex features per doc) is the expensive
    # projection — spread the narrow scan over the cores first (no-op on
    # an already-split scan)
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    kept = (
        docs.join(
            _c4_scored(docs).where(_c4_keep()).select("doc_id"), "doc_id"
        )
        .select("doc_id", "text")
        .localCheckpoint(eager=False)
    )
    pairs = ngram_jaccard_dedup(
        kept,
        text_col="text",
        id_col="doc_id",
        shingle_k=_SHINGLE_K,
        threshold=_JACCARD_T,
        num_hashes=len(_SEEDS),
        bands=_BANDS,
    )
    surv = dedup_keep_canonical(kept, pairs, "doc_id").select("doc_id")
    surv = surv.localCheckpoint(eager=False)
    split = surv.select(
        F.when(hash_bucket("doc_id", 10) < 8, "train")
        .otherwise("eval")
        .alias("s")
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    return (
        stage("raw", docs)
        .unionByName(stage("c4", kept))
        .unionByName(stage("dedup", surv))
        .unionByName(stage("train", split.where(F.col("s") == "train")))
        .unionByName(stage("eval", split.where(F.col("s") == "eval")))
    )


# --------------------------------------------------------------------------
_LSH_DIAG_T = 0.2  # diagnostics sweep the full S-curve, not the keep region


# Q: docs_lsh_diagnostics — LSH CALIBRATION: for every verified near-dup
# pair, how many of the 4 bands actually collided, bucketed by Jaccard
# and compared against the analytic expectation b*s^r (independent-band
# model, r=4 rows/band — the S-curve every (bands, rows) design choice
# is made on). A measured-vs-model gap flags a mis-tuned family (bad
# hash mixing, correlated bands) before it silently costs recall at
# 100 TB. Determinism: bands_hit is an exact integer count; the
# expectation rounds each pair's 4*j^4 term to integer NANOS and sums
# as BIGINT, so float summation order can never move the averages.
# --------------------------------------------------------------------------
@query(
    "docs_lsh_diagnostics",
    f"""
    WITH sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents
        WHERE LENGTH(text) >= 5
    ), hashed AS (
        SELECT doc_id, {_DUCK_SHINGLE_HASH} AS hs FROM sh
    ), sig AS (
        SELECT doc_id, {_DUCK_SIG} FROM hashed
    ), banded AS (
        {_DUCK_BAND_ROWS}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
    ), dsh AS (
        SELECT doc_id, LIST_DISTINCT(hs) AS dsh FROM hashed
    ), pairs AS (
        SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM (
            SELECT id_a, id_b,
                   LEN(LIST_INTERSECT(a.dsh, b.dsh)) * 1.0 /
                   (LEN(a.dsh) + LEN(b.dsh) - LEN(LIST_INTERSECT(a.dsh, b.dsh))) AS j
            FROM cand JOIN dsh a ON cand.id_a = a.doc_id
                      JOIN dsh b ON cand.id_b = b.doc_id
        ) WHERE j >= {_LSH_DIAG_T}
    ), hits AS (
        SELECT p.id_a, p.id_b, p.jaccard, COUNT(*) AS bands_hit
        FROM pairs p
        JOIN banded a ON a.doc_id = p.id_a
        JOIN banded b ON b.doc_id = p.id_b
             AND a.band_id = b.band_id AND a.band_key = b.band_key
        GROUP BY 1, 2, 3
    )
    SELECT ROUND(FLOOR(jaccard * 10) / 10, 1) AS j_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(bands_hit) AS BIGINT) AS bands_hit_total,
           ROUND(SUM(CAST(ROUND({_BANDS} * jaccard * jaccard * jaccard * jaccard * 1e9)
                          AS BIGINT)) / 1e9 / COUNT(*), 6) AS expected_bands_hit
    FROM hits GROUP BY 1
    """,
)
def docs_lsh_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import (
        band_key_frame,
        exploded_shingle_hashes,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    banded = band_key_frame(
        minhash_signatures(
            exploded_shingle_hashes(docs, "text", "doc_id", _SHINGLE_K),
            "doc_id",
            len(_SEEDS),
        ),
        "doc_id",
        len(_SEEDS),
        _BANDS,
    ).localCheckpoint(eager=False)
    pairs = ngram_jaccard_dedup(
        docs,
        text_col="text",
        id_col="doc_id",
        shingle_k=_SHINGLE_K,
        threshold=_LSH_DIAG_T,
        num_hashes=len(_SEEDS),
        bands=_BANDS,
    )
    a = banded.withColumnsRenamed({"doc_id": "id_a"})
    b = banded.withColumnsRenamed({"doc_id": "id_b"})
    j = F.col("jaccard")
    hits = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "band_id", "band_key"])
        .groupBy("id_a", "id_b", "jaccard")
        .agg(F.count(F.lit(1)).alias("bands_hit"))
    )
    exp_nanos = F.round(F.lit(float(_BANDS)) * j * j * j * j * 1e9).cast("long")
    return (
        hits.groupBy(F.round(F.floor(j * 10) / 10, 1).alias("j_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("bands_hit").alias("bands_hit_total"),
            F.round(
                F.sum(exp_nanos) / 1e9 / F.count(F.lit(1)), 6
            ).alias("expected_bands_hit"),
        )
    )


# --------------------------------------------------------------------------
# Q: docs_dedup_components_distributed — the DISTRIBUTED connected-
# components path (alternating large-star/small-star rounds, Kiveris
# et al. SoCC 2014; operators/dedup.py::_alternating_star_components),
# forced via driver_edge_limit=0 so the O(log n) star rounds — not the
# driver union-find fast path — produce the labels. The fixture graph
# is built to be adversarial for the O(diameter) min-label scheme this
# replaced: a 65-node CHAIN (diameter 64 — min-label would need 64
# rounds; the star rounds need ~7), an 8-CLIQUE, and a TRIANGLE, all
# derived arithmetically from documents.doc_id so both sides generate
# identical edges at any scale factor. The oracle computes the same
# closure with 8 unrolled pointer-doubling rounds (label <- min(label,
# min neighbor label, label[label]) reaches distance 2^k - 1 >= 64 at
# k = 8), each round MATERIALIZED (the k-core unrolled-CTE rule).
# --------------------------------------------------------------------------
def _cc_distributed_oracle() -> str:
    rounds = []
    prev = "l0"
    for k in range(1, 9):
        rounds.append(f"""
    l{k} AS MATERIALIZED (
        SELECT x.id,
               LEAST(x.lbl, COALESCE(nb.m, x.lbl), COALESCE(j.lbl, x.lbl))
               AS lbl
        FROM {prev} x
        LEFT JOIN (
            SELECT und.a AS id, MIN(p.lbl) AS m
            FROM und JOIN {prev} p ON p.id = und.b GROUP BY 1
        ) nb ON nb.id = x.id
        LEFT JOIN {prev} j ON j.id = x.lbl
    )""")
        prev = f"l{k}"
    return f"""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    chain AS (
        SELECT doc_id AS a, doc_id + 1 AS b FROM d WHERE doc_id < 64
    ),
    clique AS (
        SELECT doc_id AS a, UNNEST(GENERATE_SERIES(doc_id + 1, 107)) AS b
        FROM d WHERE doc_id >= 100 AND doc_id < 107
    ),
    tri AS (
        SELECT doc_id AS a, UNNEST(GENERATE_SERIES(doc_id + 1, 152)) AS b
        FROM d WHERE doc_id IN (150, 151)
    ),
    e AS MATERIALIZED (
        SELECT a, b FROM chain
        UNION ALL SELECT a, b FROM clique
        UNION ALL SELECT a, b FROM tri
    ),
    und AS MATERIALIZED (
        SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e
    ),
    l0 AS MATERIALIZED (
        SELECT DISTINCT a AS id, a AS lbl FROM und
    ),{",".join(rounds)}
    SELECT id, lbl AS component FROM {prev}
    """


@query("docs_dedup_components_distributed", _cc_distributed_oracle())
def docs_dedup_components_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import connected_components

    d = load_table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )
    chain = d.where(F.col("doc_id") < 64).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    # sequence(a+1, top) fan-out needs a strict a < top guard — Spark's
    # sequence(1, 0) DESCENDS instead of returning [].
    clique = (
        d.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 107))
        .select(
            F.col("doc_id").alias("id_a"),
            F.explode(F.sequence(F.col("doc_id") + 1, F.lit(107))).alias("id_b"),
        )
    )
    tri = d.where(F.col("doc_id").isin(150, 151)).select(
        F.col("doc_id").alias("id_a"),
        F.explode(F.sequence(F.col("doc_id") + 1, F.lit(152))).alias("id_b"),
    )
    pairs = chain.unionAll(clique).unionAll(tri)
    return connected_components(pairs, driver_edge_limit=0, max_iterations=20)


# --------------------------------------------------------------------------
# Q: docs_dedup_components_cdc — CDC maintenance of dedup GROUP LABELS,
# completing the index-maintenance family on the graph side (LSH bands
# 169, IVF 170, PQ 171, IVF-PQ, BM25 postings, substring grams): the
# pair graph moves (a BRIDGE edge merges the chain and the clique, a
# mid-chain deletion SPLITS what remains, a redundant triangle edge
# deletes WITHOUT splitting, brand-new nodes arrive) and the labels
# follow in O(delta + affected components) — only components touching a
# delta endpoint are re-closed by the O(log n) star rounds; untouched
# labels pass through verbatim (operators/dedup.py::
# connected_components_refresh). The oracle computes the FULL REBUILD
# closure over (old ∪ added) − deleted with 8 unrolled pointer-doubling
# rounds — exactly the equivalence the operator pins.
# --------------------------------------------------------------------------
def _cc_cdc_oracle() -> str:
    rounds = []
    prev = "l0"
    for k in range(1, 9):
        rounds.append(f"""
    l{k} AS MATERIALIZED (
        SELECT x.id,
               LEAST(x.lbl, COALESCE(nb.m, x.lbl), COALESCE(j.lbl, x.lbl))
               AS lbl
        FROM {prev} x
        LEFT JOIN (
            SELECT und.a AS id, MIN(p.lbl) AS m
            FROM und JOIN {prev} p ON p.id = und.b GROUP BY 1
        ) nb ON nb.id = x.id
        LEFT JOIN {prev} j ON j.id = x.lbl
    )""")
        prev = f"l{k}"
    return f"""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    chain AS (
        SELECT doc_id AS a, doc_id + 1 AS b FROM d WHERE doc_id < 64
    ),
    clique AS (
        SELECT doc_id AS a, UNNEST(GENERATE_SERIES(doc_id + 1, 107)) AS b
        FROM d WHERE doc_id >= 100 AND doc_id < 107
    ),
    tri AS (
        SELECT doc_id AS a, UNNEST(GENERATE_SERIES(doc_id + 1, 152)) AS b
        FROM d WHERE doc_id IN (150, 151)
    ),
    calm AS (
        -- a component the delta never touches: its labels must pass
        -- through the refresh verbatim
        SELECT doc_id AS a, UNNEST(GENERATE_SERIES(doc_id + 1, 193)) AS b
        FROM d WHERE doc_id >= 190 AND doc_id < 193
    ),
    old AS (
        SELECT a, b FROM chain
        UNION ALL SELECT a, b FROM clique
        UNION ALL SELECT a, b FROM tri
        UNION ALL SELECT a, b FROM calm
    ),
    added AS (
        SELECT 64 AS a, 100 AS b UNION ALL
        SELECT 150, 153 UNION ALL SELECT 180, 181
    ),
    deleted AS (
        SELECT 32 AS a, 33 AS b UNION ALL SELECT 150, 151
    ),
    e AS MATERIALIZED (
        SELECT a, b FROM (
            SELECT a, b FROM old UNION SELECT a, b FROM added
        ) EXCEPT SELECT a, b FROM deleted
    ),
    und AS MATERIALIZED (
        SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e
    ),
    l0 AS MATERIALIZED (
        SELECT DISTINCT a AS id, a AS lbl FROM und
    ),{",".join(rounds)}
    SELECT id, lbl AS component FROM {prev}
    """


@query("docs_dedup_components_cdc", _cc_cdc_oracle())
def docs_dedup_components_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pmp_analytics_spark.operators.dedup import (
        connected_components,
        connected_components_refresh,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )
    chain = d.where(F.col("doc_id") < 64).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    clique = (
        d.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 107))
        .select(
            F.col("doc_id").alias("id_a"),
            F.explode(F.sequence(F.col("doc_id") + 1, F.lit(107))).alias("id_b"),
        )
    )
    tri = d.where(F.col("doc_id").isin(150, 151)).select(
        F.col("doc_id").alias("id_a"),
        F.explode(F.sequence(F.col("doc_id") + 1, F.lit(152))).alias("id_b"),
    )
    calm = (
        d.where((F.col("doc_id") >= 190) & (F.col("doc_id") < 193))
        .select(
            F.col("doc_id").alias("id_a"),
            F.explode(F.sequence(F.col("doc_id") + 1, F.lit(193))).alias("id_b"),
        )
    )
    old = chain.unionAll(clique).unionAll(tri).unionAll(calm)
    from pmp_analytics_spark.sources.local import local_df

    added = local_df(
        spark, [(64, 100), (150, 153), (180, 181)], "id_a bigint, id_b bigint"
    )
    deleted = local_df(
        spark, [(32, 33), (150, 151)], "id_a bigint, id_b bigint"
    )
    # the OLD labels are the stored input state, not the operator under
    # test — build them on the driver fast path; the REFRESH always
    # re-closes its affected subgraph with the distributed star rounds
    labels = connected_components(old)
    # pin the refresh's re-closure onto the DISTRIBUTED star rounds —
    # this query is the family's distributed-path witness; the
    # streaming twin exercises the dispatch's driver path
    return connected_components_refresh(
        old, labels, added, deleted, driver_edge_limit=0
    )


# --------------------------------------------------------------------------
# Q: streaming_dedup_components — the SAME component labels maintained
# from an edge CDC STREAM (streaming/components.py::
# cdc_components_stream): three micro-batch file drops (a bridge-merge;
# a mid-chain split + a brand-new pair; a new triangle) each refresh
# the labels in O(delta + affected) and publish (labels, edges) under
# per-root batch markers — labels FIRST, which makes replay
# time-travel unnecessary (the refresh consumes only pre-batch state).
# Each edge appears in one batch, and per-batch refresh is pinned to
# rebuild semantics, so the final labels are slicing-independent: the
# oracle is the full pointer-doubling closure over the FINAL edge set.
# --------------------------------------------------------------------------
def _cc_stream_oracle() -> str:
    rounds = []
    prev = "l0"
    for k in range(1, 9):
        rounds.append(f"""
    l{k} AS MATERIALIZED (
        SELECT x.id,
               LEAST(x.lbl, COALESCE(nb.m, x.lbl), COALESCE(j.lbl, x.lbl))
               AS lbl
        FROM {prev} x
        LEFT JOIN (
            SELECT und.a AS id, MIN(p.lbl) AS m
            FROM und JOIN {prev} p ON p.id = und.b GROUP BY 1
        ) nb ON nb.id = x.id
        LEFT JOIN {prev} j ON j.id = x.lbl
    )""")
        prev = f"l{k}"
    return f"""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    chain AS (
        SELECT doc_id AS a, doc_id + 1 AS b FROM d WHERE doc_id < 8
    ),
    clique AS (
        SELECT doc_id AS a, UNNEST(GENERATE_SERIES(doc_id + 1, 103)) AS b
        FROM d WHERE doc_id >= 100 AND doc_id < 103
    ),
    calm AS (
        SELECT doc_id AS a, doc_id + 1 AS b FROM d WHERE doc_id = 190
    ),
    old AS (
        SELECT a, b FROM chain
        UNION ALL SELECT a, b FROM clique
        UNION ALL SELECT a, b FROM calm
    ),
    added AS (
        SELECT 8 AS a, 100 AS b
        UNION ALL SELECT 180, 181
        UNION ALL SELECT 150, 151 UNION ALL SELECT 151, 152
        UNION ALL SELECT 150, 152
    ),
    deleted AS (SELECT 3 AS a, 4 AS b),
    e AS MATERIALIZED (
        SELECT a, b FROM (
            SELECT a, b FROM old UNION SELECT a, b FROM added
        ) EXCEPT SELECT a, b FROM deleted
    ),
    und AS MATERIALIZED (
        SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e
    ),
    l0 AS MATERIALIZED (
        SELECT DISTINCT a AS id, a AS lbl FROM und
    ),{",".join(rounds)}
    SELECT id, lbl AS component FROM {prev}
    """


@query("streaming_dedup_components", _cc_stream_oracle())
def streaming_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pmp_analytics_spark.operators.dedup import connected_components
    from pmp_analytics_spark.sources.writers import (
        publish_versioned,
        read_latest,
    )
    from pmp_analytics_spark.streaming import stream_workdir
    from pmp_analytics_spark.streaming.components import (
        cdc_components_stream,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )
    chain = d.where(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    clique = (
        d.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 103))
        .select(
            F.col("doc_id").alias("id_a"),
            F.explode(F.sequence(F.col("doc_id") + 1, F.lit(103))).alias("id_b"),
        )
    )
    calm = d.where(F.col("doc_id") == 190).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    old = chain.unionAll(clique).unionAll(calm)

    work = stream_workdir("pmp_cc_stream")
    edges_root = os.path.join(work, "edges")
    labels_root = os.path.join(work, "labels")
    feed = os.path.join(work, "cdc")
    # two batches, each edge in exactly one; the MERGE and the SPLIT
    # land in different batches so both refresh shapes run under the
    # exactly-once markers (depth/scale of the star rounds themselves
    # is the batch CDC query's and the soak's job, not this one's)
    batches = [
        [("add", 8, 100), ("add", 180, 181)],
        [
            ("del", 3, 4),
            ("add", 150, 151), ("add", 151, 152), ("add", 150, 152),
        ],
    ]
    from pmp_analytics_spark.sources.local import local_df

    for i, rows in enumerate(batches):
        local_df(
            spark, rows, "op string, id_a bigint, id_b bigint"
        ).coalesce(1).write.parquet(os.path.join(feed, f"drop_{i}"))
    publish_versioned(old.coalesce(1), edges_root)
    publish_versioned(connected_components(old).coalesce(1), labels_root)
    schema = "op string, id_a bigint, id_b bigint"
    cdc_components_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(feed),
        edges_root,
        labels_root,
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    # the final read goes through the crash-consistency reader — after a
    # completed drain both roots sit at the last batch cut, so this equals
    # read_latest, but it exercises the torn-pair contract behind the gate
    from pmp_analytics_spark.sources.writers import read_consistent

    pair = read_consistent(spark, [labels_root, edges_root])
    return pair[labels_root].select("id", "component")
