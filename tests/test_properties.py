"""Property-based cross-engine checks (hypothesis): the Python JW kernel
must agree with DuckDB's native jaro_winkler_similarity on arbitrary
strings, and the Spark DEA/NPI checksum expressions with plain-Python
re-implementations, over a much wider input space than fixtures cover."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pmp_analytics_spark.functions.similarity import jaro_winkler

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, exclude_characters="'"),
    max_size=24,
)


@settings(max_examples=300, deadline=None)
@given(ascii_text, ascii_text)
def test_jw_matches_duckdb_on_arbitrary_strings(a, b):
    expected = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert jaro_winkler(a, b) == pytest.approx(expected, abs=1e-9)


def py_dea_valid(s: str) -> bool:
    s = s.strip().upper()
    if len(s) != 9 or s[0] not in "ABCFGHMPR" or not s[1].isalpha() or not s[2:].isdigit():
        return False
    d = [int(c) for c in s[2:]]
    return (d[0] + d[2] + d[4] + 2 * (d[1] + d[3] + d[5])) % 10 == d[6]


def test_dea_property_sweep(spark):
    """Exhaustive-ish sweep: all check digits for a sample of stems, plus
    malformed shapes — Spark expression vs plain Python."""
    from pmp_analytics_spark.functions.checksums import dea_is_valid

    values = [f"AB123456{c}" for c in "0123456789"]
    values += [f"{l}X765432{k}" for l in "ABCXZ" for k in "05"]
    values += ["", "AB12345", "AB1234567890", "9B1234563", "ABI234563"]
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    got = {r["s"]: r["ok"] for r in df.select("s", dea_is_valid("s").alias("ok")).collect()}
    for v in values:
        assert got[v] == py_dea_valid(v), v


# --------------------------------------------------------------------------
# Quota admission state machine (streaming/quota.py::_admit): for ANY
# slicing of a doc_id-ordered stream into micro-batches, the admitted set
# must be exactly the first-N doc_ids and ranks must be 1..N in order.
# Pure pandas-level property — the Spark harness equivalence is pinned in
# tests/test_streaming.py; this sweeps the slicings Spark can't enumerate.
# --------------------------------------------------------------------------
@given(
    n_docs=st.integers(min_value=0, max_value=60),
    cap=st.integers(min_value=0, max_value=20),
    cuts=st.sets(st.integers(min_value=1, max_value=59), max_size=8),
)
@settings(max_examples=200, deadline=None)
def test_quota_admit_slicing_invariant(n_docs, cap, cuts):
    import pandas as pd

    from pmp_analytics_spark.streaming.quota import _admit

    doc_ids = list(range(0, n_docs * 3, 3))  # sorted, gappy
    bounds = sorted({0, n_docs, *(c for c in cuts if c < n_docs)})
    batches = [doc_ids[a:b] for a, b in zip(bounds, bounds[1:])]

    n_state, out = 0, []
    for b in batches:
        pdf = pd.DataFrame({"doc_id": b})
        n_state, emitted = _admit("s", n_state, cap, iter([pdf]))
        if emitted is not None:
            out.append(emitted)
    got = (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame(columns=["doc_id", "source", "admit_rank"])
    )
    expect = doc_ids[:cap]
    assert list(got["doc_id"]) == expect
    assert list(got["admit_rank"]) == list(range(1, len(expect) + 1))
    assert n_state == min(cap, n_docs)


# --------------------------------------------------------------------------
# Codec round-trips (multimodal.py): any raster/PCM payload must survive
# encode→decode bit-exactly — the property that makes the stdlib codecs
# trustworthy as real pipeline stages rather than demo shims.
# --------------------------------------------------------------------------
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, seed):
    import random

    from pmp_analytics_spark.multimodal import _png_decode, _png_encode

    rng = random.Random(seed)
    rows = [bytes(rng.randrange(256) for _ in range(w * 3)) for _ in range(h)]
    assert _png_decode(_png_encode(w, h, rows)) == (w, h, rows)


@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(w, h, seed):
    import random

    from pmp_analytics_spark.multimodal import _bmp_decode, _bmp_encode

    rng = random.Random(seed)
    rows = [bytes(rng.randrange(256) for _ in range(w * 3)) for _ in range(h)]
    assert _bmp_decode(_bmp_encode(w, h, rows)) == (w, h, rows)


@given(
    n=st.integers(min_value=0, max_value=64),
    bits=st.sampled_from([8, 16]),
    channels=st.integers(min_value=1, max_value=2),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(n, bits, channels, seed):
    import random

    from pmp_analytics_spark.multimodal import _wav_decode, _wav_encode

    rng = random.Random(seed)
    lo, hi = (-128, 127) if bits == 8 else (-32768, 32767)
    samples = [rng.randint(lo, hi) for _ in range(n * channels)]
    got = _wav_decode(_wav_encode(samples, channels=channels, bits=bits))
    assert got["samples"] == samples and got["bits"] == bits


@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31),
    subsample=st.booleans(),
    restart=st.integers(min_value=0, max_value=3),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_roundtrip_property(w, h, seed, subsample, restart):
    """JPEG is lossy, so the property is: geometry round-trips exactly,
    decode is deterministic, and a SOLID image (DC-only energy) survives
    quantization to within rounding — for every (dims, subsampling,
    restart-interval) combination, not just the hand-picked unit cases."""
    import random

    from pmp_analytics_spark.jpeg import jpeg_decode, jpeg_encode

    rng = random.Random(seed)
    solid = bytes([rng.randrange(256) for _ in range(3)])
    rows = [solid * w for _ in range(h)]
    payload = jpeg_encode(
        w, h, rows, quality=92, subsample=subsample, restart_interval=restart
    )
    w2, h2, back = jpeg_decode(payload)
    assert (w2, h2) == (w, h)
    assert jpeg_decode(payload) == (w2, h2, back)  # deterministic
    maxerr = max(
        abs(a - b) for ra, rb in zip(rows, back) for a, b in zip(ra, rb)
    )
    assert maxerr <= 3, maxerr


# ---------------------------------------------------------------------------
# Round-8 additions: suffix machinery, unigram Viterbi, progressive JPEG
# ---------------------------------------------------------------------------

_sd_docs = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=24),
    min_size=1,
    max_size=8,
)


@given(_sd_docs, st.integers(2, 6))
@settings(max_examples=12, deadline=None)
def test_duplicate_positions_property(spark, texts, T):
    """Exact duplicate-position extraction == brute-force T-gram
    counting on arbitrary small-alphabet corpora (the 3-letter alphabet
    forces heavy collisions — the regime where an off-by-one in the
    overlapping-windows pair would show instantly)."""
    from collections import Counter

    from pmp_analytics_spark.operators.suffix_array import (
        duplicate_positions,
    )

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos) for r in duplicate_positions(df, T).collect()
    }
    grams = Counter(
        t[p : p + T] for _, t in docs for p in range(len(t) - T + 1)
    )
    want = {
        (d, p + 1)
        for d, t in docs
        for p in range(len(t) - T + 1)
        if grams[t[p : p + T]] >= 2
    }
    assert got == want


@given(_sd_docs)
@settings(max_examples=10, deadline=None)
def test_suffix_array_property(spark, texts):
    """Full suffix array == sorted-suffixes brute force on arbitrary
    small-alphabet corpora (duplicate suffixes, ties, empty docs)."""
    from pmp_analytics_spark.operators.suffix_array import suffix_array

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos): r.sa_rank
        for r in suffix_array(df, seed_level=4).collect()
    }
    sufs = sorted(
        (t[p:], d, p + 1) for d, t in docs for p in range(len(t))
    )
    want = {(d, p): i + 1 for i, (_, d, p) in enumerate(sufs)}
    assert got == want


@given(
    st.text(alphabet="ab", min_size=1, max_size=8),
    st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=3),
        st.integers(-(10**9), -1),
        min_size=1,
        max_size=12,
    ),
)
@settings(max_examples=300, deadline=None)
def test_viterbi_is_optimal_with_tie_rule(word, lp):
    """viterbi_segment_py returns THE maximum-score segmentation, and
    among equal-score ones the lexicographically-smallest split-point
    sequence (the smaller-j tie rule), verified by exhaustive
    enumeration of all 2^(n-1) segmentations."""
    from itertools import combinations

    from pmp_analytics_spark.operators.unigram import viterbi_segment_py

    lp = dict(lp) | {c: -(10**9) for c in set(word)}  # segmentability
    got = viterbi_segment_py(word, lp, 3)
    n = len(word)
    best = None
    for k in range(n):
        for cuts in combinations(range(1, n), k):
            bounds = [0, *cuts, n]
            pieces = [word[a:b] for a, b in zip(bounds, bounds[1:])]
            if any(len(p) > 3 or p not in lp for p in pieces):
                continue
            score = sum(lp[p] for p in pieces)
            # tie rule: Viterbi prefers the smaller j at every dp
            # cell, which globally selects the segmentation whose
            # REVERSED boundary sequence (n, j_last, ...) is
            # lexicographically smallest
            key = (-score, tuple(reversed(bounds)))
            if best is None or key < best[0]:
                best = (key, pieces)
    assert best is not None and got == best[1]


@given(st.integers(8, 40), st.integers(8, 32), st.integers(0, 10**6))
@settings(max_examples=10, deadline=None)
def test_progressive_jpeg_matches_baseline_property(w, h, seed):
    """Progressive encode->decode is pixel-identical to baseline
    encode->decode of the same input for arbitrary geometry/content."""
    import random

    from pmp_analytics_spark.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = random.Random(seed)
    rows = [
        bytes(min(255, (rng.randrange(256) // 32) * 32) for _ in range(3 * w))
        for _ in range(h)
    ]
    base = jpeg_decode(jpeg_encode(w, h, rows, quality=70))
    prog = jpeg_decode(jpeg_encode_progressive(w, h, rows, quality=70))
    assert base == prog


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_retention_property(stream, capacity, chunk):
    """The MG guarantee under arbitrary streams, capacities, and chunk
    boundaries: every item with true count > n/(capacity+1) survives,
    and no counter ever exceeds its item's true count."""
    from collections import Counter

    import pandas as pd

    from pmp_analytics_spark.operators.frequent import misra_gries_partial

    chunks = [
        pd.Series([str(x) for x in stream[i : i + chunk]])
        for i in range(0, len(stream), chunk)
    ]
    counters = misra_gries_partial(iter(chunks), capacity)
    truth = Counter(str(x) for x in stream)
    n = len(stream)
    assert len(counters) <= capacity
    for item, c in truth.items():
        if c * (capacity + 1) > n:
            assert item in counters, (item, c, n, capacity)
    for item, kept in counters.items():
        assert kept <= truth[item]


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_gif_roundtrip_property(w, h, seed, interlaced):
    """GIF encode->decode is pixel-identical for arbitrary geometry,
    palette size (via value quantization), and interlacing."""
    import random

    from pmp_analytics_spark.multimodal import _gif_decode, gif_encode

    rng = random.Random(seed)
    rows = [
        bytes((rng.randrange(256) // 52) * 52 for _ in range(3 * w))
        for _ in range(h)
    ]
    assert _gif_decode(gif_encode(w, h, rows, interlaced=interlaced)) == (w, h, rows)


# --------------------------------------------------------------------------
# VP8L (WebP-lossless) round-trip under RANDOM dimensions, palettes, and
# encoder option combinations: randomized pixels exercise arbitrary
# Huffman shapes; the option grid composes subtract-green, every
# predictor mode, color transforms with arbitrary signed 3.5 params,
# palette bundling at every width, LZ77, color cache, and meta-Huffman
# — the full decoder surface under fuzzing, not just the fixed unit
# fixtures.
# --------------------------------------------------------------------------
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=14),
    ncolors=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
    variant=st.integers(min_value=0, max_value=7),
)
@settings(max_examples=80, deadline=None)
def test_webp_vp8l_roundtrip_property(w, h, ncolors, seed, variant):
    import random

    from pmp_analytics_spark.webp import webp_decode, webp_encode

    rng = random.Random(seed)
    pal = [bytes(rng.randrange(256) for _ in range(3)) for _ in range(ncolors)]
    rows = [
        b"".join(pal[rng.randrange(ncolors)] for _ in range(w))
        for _ in range(h)
    ]
    kw = [
        {},
        {"subtract_green": True},
        {"predictor_mode": seed % 14},
        {"palette": True},
        {"use_lz77": True},
        {"cache_bits": 1 + seed % 11, "use_lz77": True},
        {
            "color_params": (seed % 256, (seed // 7) % 256, (seed // 11) % 256),
            "subtract_green": True,
        },
        {"meta_split": True, "use_lz77": True},
    ][variant]
    assert webp_decode(webp_encode(w, h, rows, **kw)) == (w, h, rows), kw


# --------------------------------------------------------------------------
# The byte-level pre-tokenizer must PARTITION its input: the extracted
# pre-tokens concatenate back to the exact original text (nothing
# dropped, nothing duplicated, no overlap) for arbitrary unicode, and
# the hex symbolization UNHEXes back to each pre-token's exact UTF-8
# bytes. Run ENGINE-side (Java regex) — the cross-engine pattern
# equivalence is covered by the docs_bpe_bytelevel oracle.
# --------------------------------------------------------------------------
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no surrogates
                blacklist_characters="\x0b\x0c\x85   ",
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=25, deadline=None)
def test_byte_pretokenizer_partitions_text(spark, texts):
    from pyspark.sql import functions as F

    from pmp_analytics_spark.operators.bpe import BYTE_PRETOKEN_RE

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(
        "text",
        F.concat_ws(
            "", F.regexp_extract_all(F.col("text"), F.lit(BYTE_PRETOKEN_RE), 0)
        ).alias("joined"),
    ).collect()
    for r in got:
        # exotic whitespace outside [ \t\n\r] is excluded from the
        # blacklist above: the pattern's punctuation branch captures it,
        # so the partition property holds for everything generated here
        assert r["joined"] == r["text"], repr(r["text"])


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=-30000, max_value=30000), min_size=8, max_size=96),
    st.sampled_from(["constant", "verbatim", "fixed", "lpc"]),
    st.integers(min_value=0, max_value=2),
    st.booleans(),
)
def test_flac_roundtrip_property(samples, subframe, partition_order, escape):
    """Property: ANY int16 sample run survives encode->decode bit-exact
    through every subframe family, Rice partition order, and the escape
    path — the FLAC analogue of the WebP round-trip fuzz."""
    from pmp_analytics_spark.flac import flac_decode, flac_encode

    n = len(samples)
    if subframe == "constant":
        samples = [samples[0]] * n
    bs = n  # one frame; partitions must divide the block
    while bs % (1 << partition_order):
        partition_order -= 1
    kw = dict(
        subframe=subframe,
        order=min(2, n - 1) if subframe in ("fixed", "lpc") else 0,
        partition_order=partition_order if subframe in ("fixed", "lpc") else 0,
        force_escape=escape,
        block_size=bs,
    )
    if subframe == "lpc":
        kw.update(lpc_coefs=[2, -1], lpc_shift=1)
    dec = flac_decode(flac_encode([list(samples)], **kw))
    assert dec["samples"] == list(samples)
