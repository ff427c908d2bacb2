"""Text-analysis expression library: tokenization, shingles, fingerprints,
MinHash, SimHash, language ID."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmp_analytics_spark.functions.text import (
    char_shingles,
    fingerprint,
    langid_guess,
    minhash_signature,
    simhash64,
    token_count,
    tokens,
)


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], ["t"]).select(expr.alias("v")).collect()[0]["v"]


def test_tokens(spark):
    assert _one(spark, "Hello,  World! 42", tokens("t")) == ["hello", "world", "42"]
    assert _one(spark, "", tokens("t")) == []
    assert _one(spark, "...", tokens("t")) == []


def test_token_count(spark):
    assert _one(spark, "a b  c", token_count("t")) == 3


def test_char_shingles(spark):
    assert _one(spark, "ABCDEF", char_shingles("t", 5)) == ["abcde", "bcdef"]
    assert _one(spark, "abcd", char_shingles("t", 5)) == []
    assert _one(spark, "abcde", char_shingles("t", 5)) == ["abcde"]


def test_fingerprint_normalization_invariance(spark):
    fp1 = _one(spark, "Hello, World!", fingerprint("t"))
    fp2 = _one(spark, "  hello   WORLD  ", fingerprint("t"))
    fp3 = _one(spark, "hello universe", fingerprint("t"))
    assert fp1 == fp2
    assert fp1 != fp3


def test_minhash_signature_properties(spark):
    sig_a = _one(spark, "the quick brown fox jumps over the lazy dog", minhash_signature(char_shingles("t", 5), 16))
    sig_b = _one(spark, "the quick brown fox jumps over the lazy cat", minhash_signature(char_shingles("t", 5), 16))
    sig_c = _one(spark, "entirely different content with no overlap!", minhash_signature(char_shingles("t", 5), 16))
    assert len(sig_a) == 16
    # near-identical docs agree on most components; unrelated docs on few
    agree_ab = sum(x == y for x, y in zip(sig_a, sig_b))
    agree_ac = sum(x == y for x, y in zip(sig_a, sig_c))
    assert agree_ab > agree_ac
    assert agree_ab >= 8


def test_simhash_hamming_locality(spark):
    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & (2**64 - 1)).count("1")

    h1 = _one(spark, "the quick brown fox jumps over the lazy dog", simhash64("t"))
    h2 = _one(spark, "the quick brown fox jumps over the lazy cat", simhash64("t"))
    h3 = _one(spark, "zzz completely unrelated string 12345 qqqq", simhash64("t"))
    assert hamming(h1, h2) < hamming(h1, h3)


def test_langid(spark):
    cases = {
        "the cat and the dog run in the park with a ball": "en",
        "el perro y la gata corren en los campos de la ciudad": "es",
        "le chien et les chats courent dans un parc du village": "fr",
        "der Hund und die Katze laufen mit dem Ball im Park": "de",
        "xyzzy plugh 12345": "und",
    }
    df = spark.createDataFrame([(t,) for t in cases], ["t"])
    rows = df.select("t", langid_guess("t").alias("lang")).collect()
    for r in rows:
        assert r["lang"] == cases[r["t"]], r["t"]


def test_winnowing_shared_substring_guarantee(spark):
    from pmp_analytics_spark.functions.text import winnow_fingerprints

    # two docs sharing a long substring must share a fingerprint
    # (guarantee window: k + w - 1 = 8 chars; shared run is much longer)
    a = "AAAA the common shared middle section here BBBB"
    b = "XXXX the common shared middle section here YYYY"
    c = "totally different content with no overlap at all"
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["id", "t"])
    rows = {r["id"]: set(r["fps"]) for r in df.select("id", winnow_fingerprints("t").alias("fps")).collect()}
    assert rows[1] & rows[2], "shared substring must produce shared fingerprints"
    assert not (rows[1] & rows[3])
    # deterministic + sorted + distinct
    again = {r["id"]: r["fps"] for r in df.select("id", winnow_fingerprints("t").alias("fps")).collect()}
    assert sorted(set(again[1])) == again[1]


def test_winnowing_short_doc_empty(spark):
    from pmp_analytics_spark.functions.text import winnow_fingerprints

    df = spark.createDataFrame([("ab",)], ["t"])
    assert df.select(winnow_fingerprints("t").alias("f")).collect()[0]["f"] == []


def test_bpe_tokens_gpt2_shapes(spark):
    from pmp_analytics_spark.functions.text import bpe_tokens

    df = spark.createDataFrame([("Hello, world! It's 42 degrees...",)], ["t"])
    got = df.select(bpe_tokens("t").alias("v")).collect()[0]["v"]
    assert got == ["hello", ",", " world", "!", " it", "'s", " 42", " degrees", "..."]
