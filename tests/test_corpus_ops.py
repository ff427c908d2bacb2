"""Round-2 corpus operators: repetition n-grams, PII scrub, deterministic
sampling, int8 quantization, and the stream-stream interval join."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmp_analytics_spark.functions.pii import scrub_pii
from pmp_analytics_spark.functions.text import tokens, word_ngrams
from pmp_analytics_spark.operators.quantize import quantize_embeddings
from pmp_analytics_spark.operators.sample import (
    hash_bucket,
    hash_decimate,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


def test_word_ngrams_basic_and_short(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",), ("solo",), ("",)], ["t"])
    out = [
        r.g
        for r in df.select(word_ngrams(tokens("t"), 3).alias("g"))
        .orderBy(F.length("t").desc())
        .collect()
    ]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == [] and out[2] == [] and out[3] == []


def test_scrub_pii_order_and_counts(spark):
    df = spark.createDataFrame(
        [
            ("mail bob9@corp.io now",),
            ("ssn 123-45-6789 ok",),
            ("call 480-555-1234 or 555-9876",),
            ("clean text, no pii",),
        ],
        ["t"],
    )
    got = [r.s for r in df.select(scrub_pii("t").alias("s")).collect()]
    assert got[0] == "mail [EMAIL] now"
    assert got[1] == "ssn [SSN] ok"
    assert got[2] == "call [PHONE] or [PHONE]"
    assert got[3] == "clean text, no pii"


def test_stratified_sample_exact_n_and_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = stratified_sample(docs, "source", "doc_id", 5)
    counts = {r.source: r.n for r in a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in counts.items():
        assert n == min(5, totals[src])
    ids_1 = sorted(r.doc_id for r in a.collect())
    ids_2 = sorted(r.doc_id for r in stratified_sample(docs, "source", "doc_id", 5).collect())
    assert ids_1 == ids_2
    # a different salt redraws
    ids_salted = sorted(
        r.doc_id for r in stratified_sample(docs, "source", "doc_id", 5, salt="x").collect()
    )
    assert ids_salted != ids_1


def test_hash_decimate_stable_and_bounded(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = hash_decimate(docs, "doc_id", keep=3, mod=10)
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == sorted(r.doc_id for r in hash_decimate(docs, "doc_id", 3, 10).collect())
    buckets = [r.b for r in docs.select(hash_bucket("doc_id", 10).alias("b")).collect()]
    assert all(0 <= b < 10 for b in buckets)
    # roughly 30% kept (uniform hash; loose bound)
    assert 0.1 < len(ids) / docs.count() < 0.5


def test_quantize_int8_codes_and_error(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = quantize_embeddings(emb).collect()
    assert len(out) == emb.count()
    for r in out[:50]:
        assert r.max_abs > 0 and r.rmse is not None
        # rmse bounded by half a quantization step
        assert r.rmse <= r.max_abs / 127.0
    # zero vector: null codes, not a crash
    z = spark.createDataFrame([(1, [0.0, 0.0]), (2, [1.0, -2.0])], ["vec_id", "embedding"])
    rows = {r.vec_id: r for r in quantize_embeddings(z).collect()}
    assert rows[1].q_sum is None and rows[1].rmse is None
    assert rows[2].q_sum is not None


def test_view_purchase_pairs_streaming_matches_batch(spark):
    from pmp_analytics_spark.streaming import (
        read_event_stream,
        run_to_memory,
        view_purchase_pairs,
    )

    from pmp_analytics_spark.sources.reader import load_table

    # Build the batch "expected" side through the same reader the engine
    # uses so the ts normalization (nanos-long vs TIMESTAMP_NTZ) can't
    # drift from read_event_stream's.
    batch = load_table(spark, SF, "events")
    bviews = batch.where(F.col("event_type") == "view")
    bbuys = batch.where(F.col("event_type") == "purchase")
    expected = sorted(
        (r.view_id, r.purchase_id)
        for r in view_purchase_pairs(bviews, bbuys, max_lag_minutes=240).collect()
    )

    sviews = read_event_stream(spark, SF).where(F.col("event_type") == "view")
    sbuys = read_event_stream(spark, SF).where(F.col("event_type") == "purchase")
    run_to_memory(
        view_purchase_pairs(sviews, sbuys, max_lag_minutes=240),
        "t_conv_pairs",
        output_mode="append",
    )
    got = sorted(
        (r.view_id, r.purchase_id) for r in spark.table("t_conv_pairs").collect()
    )
    assert got == expected and len(got) > 0


def test_view_purchase_pairs_multibatch_no_dropped_pairs(spark, tmp_path):
    """The single-file variant above drains in ONE micro-batch, which
    never exercises watermark eviction across batch boundaries. Here the
    events land as four time-ordered files consumed one per trigger
    (maxFilesPerTrigger=1), so views must SURVIVE in the join state
    across batches until their 240-minute lag window passes the
    watermark — a dropped in-bound pair would show up as a missing row
    vs the batch join."""
    import time

    from pmp_analytics_spark.sources.reader import load_table
    from pmp_analytics_spark.streaming import run_to_memory, view_purchase_pairs

    batch = load_table(spark, SF, "events")
    expected = sorted(
        (r.view_id, r.purchase_id)
        for r in view_purchase_pairs(
            batch.where(F.col("event_type") == "view"),
            batch.where(F.col("event_type") == "purchase"),
            max_lag_minutes=240,
        ).collect()
    )

    # four time-ordered drops: quartile chunks written oldest-first with
    # distinct mtimes so the file source replays them in arrival order
    # (the standard hourly-drop directory shape; a time-ordered feed is
    # the contract watermarks bound disorder AGAINST, not a shortcut)
    src = tmp_path / "events_drops"
    src.mkdir()
    rows = batch.orderBy("ts").collect()
    quarter = (len(rows) + 3) // 4
    for i in range(4):
        chunk = rows[i * quarter : (i + 1) * quarter]
        spark.createDataFrame(chunk, batch.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"drop_{i}"))
        time.sleep(1.1)  # distinct mtime seconds -> deterministic order

    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = run_to_memory(
        view_purchase_pairs(
            sdf.where(F.col("event_type") == "view"),
            sdf.where(F.col("event_type") == "purchase"),
            max_lag_minutes=240,
        ),
        "t_conv_pairs_mb",
        output_mode="append",
        state_partitions=8,
    )
    data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(data_batches) >= 2, "stream must span multiple micro-batches"
    got = sorted(
        (r.view_id, r.purchase_id) for r in spark.table("t_conv_pairs_mb").collect()
    )
    assert got == expected and len(got) > 0


def test_pretrain_pipeline_funnel_invariants(spark):
    """The funnel only narrows, and every surviving doc lands in exactly
    one bin: n_input >= n_quality >= n_unique == sum(bins.n_docs)."""
    from pmp_analytics_spark.queries.pretrain import docs_pretrain_pipeline

    rows = docs_pretrain_pipeline(spark, SF).collect()
    assert rows
    r0 = rows[0]
    assert r0["n_input"] >= r0["n_quality"] >= r0["n_unique"] > 0
    assert sum(r["n_docs"] for r in rows) == r0["n_unique"]


class TestGopherFilters:
    def test_line_rules_and_stop_presence(self, spark, tmp_path):
        import pmp_analytics_spark.queries.corpus as C

        bullet_text = "\n".join(["- item one"] * 9 + ["tail line"])
        ell_text = "\n".join(["keeps going..."] * 4 + ["plain"] * 6)
        stop_text = "the cat sat with all of that"
        rows = [
            (1, bullet_text),
            (2, ell_text),
            (3, stop_text),
            (4, ""),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in C.docs_gopher_filters(spark, str(tmp_path)).collect()
        }
        assert abs(out[1]["bullet_line_frac"] - 0.9) < 1e-9
        assert abs(out[2]["ellipsis_line_frac"] - 0.4) < 1e-9
        # 'the', 'with', 'of', 'that' present -> 4 distinct Gopher stops
        assert out[3]["n_stopwords_present"] == 4
        # empty doc: zero words, ratios zeroed, never kept
        assert out[4]["n_words"] == 0 and not out[4]["keep"]

    def test_alpha_and_symbol_ratios(self, spark, tmp_path):
        import pmp_analytics_spark.queries.corpus as C

        rows = [
            (1, "alpha beta 123 456"),          # 2/4 words alphabetic
            (2, "x # y ... z …"),               # 3 symbol hits / 6 words
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in C.docs_gopher_filters(spark, str(tmp_path)).collect()
        }
        assert abs(out[1]["alpha_word_frac"] - 0.5) < 1e-9
        assert abs(out[2]["symbol_ratio"] - 0.5) < 1e-9


class TestDsirSample:
    def test_target_like_docs_score_higher(self, spark, tmp_path):
        import pmp_analytics_spark.queries.corpus as C

        # target (en) docs are all about 'spark'; raw background (zh)
        # docs are about 'flink'; two probes: one spark-ish, one
        # flink-ish. The spark-ish probe must carry the higher log
        # importance weight.
        rows = (
            [(i, "spark spark shuffle broadcast", "en") for i in range(10)]
            + [(100 + i, "flink flink watermark operator", "zh") for i in range(10)]
            + [(900, "spark shuffle spark broadcast", "zh"),
               (901, "flink watermark flink operator", "zh")]
        )
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        out = C.docs_dsir_sample(spark, str(tmp_path))
        got = {r["doc_id"]: r["log_weight"] for r in out.collect()}
        assert got[900] > got[901]

    def test_deterministic_across_runs(self, spark, tmp_path):
        import pmp_analytics_spark.queries.corpus as C

        rows = [
            (i, f"tok{i % 7} tok{i % 3} common word", "en" if i % 2 else "zh")
            for i in range(80)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        a = sorted(map(tuple, C.docs_dsir_sample(spark, str(tmp_path)).collect()))
        b = sorted(map(tuple, C.docs_dsir_sample(spark, str(tmp_path)).collect()))
        assert a == b and len(a) == C._DSIR_N


def test_gopher_features_match_pure_python_reference(spark, tmp_path):
    """Cross-check the Spark Gopher features against an independent
    pure-Python implementation on adversarial strings: vertical tab
    (the Java-vs-RE2 \\s divergence the explicit class exists for),
    bullets, unicode ellipsis, hashes, and empty text."""
    import re

    from pmp_analytics_spark.queries import corpus as C

    texts = [
        "foo\x0bbar baz",              # \x0B splits words (Java \s semantics) on BOTH engines
        "alpha # beta ... gamma …",
        "- bullet one\n* bullet two\nplain tail...",
        "the of and that have with be to",
        "",
        "   ",
        "ab\tcd\nef\rgh",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r for r in C.docs_gopher_filters(spark, str(tmp_path)).collect()
    }

    ws = re.compile(r"[ \t\n\r\f\x0b]+")
    for i, t in enumerate(texts):
        words = [w for w in ws.split(t) if w]
        lines = t.split("\n")
        n = len(words)
        assert got[i]["n_words"] == n, (i, t)
        if n:
            mwl = sum(len(w) for w in words) / n
            # non-overlapping left-to-right '...' count, replace-style
            n_sym = (
                t.count("#")
                + (len(t) - len(t.replace("...", ""))) // 3
                + (len(t) - len(t.replace("…", "")))
            )
            alpha = sum(1 for w in words if re.search("[a-zA-Z]", w)) / n
            assert abs(got[i]["mean_word_len"] - round(mwl, 4)) < 1e-9, (i, t)
            assert abs(got[i]["symbol_ratio"] - round(n_sym / n, 6)) < 1e-9, (i, t)
            assert abs(got[i]["alpha_word_frac"] - round(alpha, 6)) < 1e-9, (i, t)
        stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
        assert got[i]["n_stopwords_present"] == len(
            {w.lower() for w in words} & stops
        ), (i, t)
        bullet = sum(
            1 for l in lines if re.match(r"[ \t\n\r\f\x0b]*[-*•]", l)
        ) / len(lines)
        assert abs(got[i]["bullet_line_frac"] - round(bullet, 6)) < 1e-9, (i, t)


def test_bpe_encode_consistent_with_tokenize_ids(spark, tmp_path):
    """Two declared queries, one tokenizer: the corpus-wide token
    frequency from docs_bpe_encode must equal the per-occurrence counts
    docs_tokenize_ids produces when summed over the corpus stream."""
    from collections import Counter

    from pmp_analytics_spark.queries.pretrain import (
        docs_bpe_encode,
        docs_tokenize_ids,
    )

    rows = [(1, "ab ab abc xy xy"), (2, "abc abc xy q"), (3, "q q ab")]
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    freq = {
        r["token"]: r["token_freq"]
        for r in docs_bpe_encode(spark, str(tmp_path)).collect()
    }
    stream = Counter(
        r["token"] for r in docs_tokenize_ids(spark, str(tmp_path)).collect()
    )
    assert freq == dict(stream)


def test_dsir_sample_invariant_to_input_file_layout(spark, tmp_path):
    """The published DSIR selection must not depend on how the input
    parquet is laid out: float sums accumulate in partition order, so
    rounded outputs + rounded-key selection are the invariance contract.
    Same rows written as 1 file and as 7 files must select identically."""
    from pmp_analytics_spark.queries import corpus as C

    rows = [
        (i, f"tok{i % 11} tok{i % 5} shared words here", "en" if i % 3 else "zh")
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    one = tmp_path / "one"
    many = tmp_path / "many"
    df.coalesce(1).write.parquet(str(one / "documents.parquet"))
    df.repartition(7).write.parquet(str(many / "documents.parquet"))

    a = sorted(map(tuple, C.docs_dsir_sample(spark, str(one)).collect()))
    b = sorted(map(tuple, C.docs_dsir_sample(spark, str(many)).collect()))
    assert a == b and len(a) == C._DSIR_N
