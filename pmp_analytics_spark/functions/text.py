"""Text-analysis expression library (LLM-data-pipeline extension surface).

Beyond reference parity (SURVEY.md §7.1): tokenization, character shingles,
md5-based MinHash primitives, language-ID heuristics, quality scoring, and
document fingerprinting — all built from JVM-side higher-order functions so
they run inside whole-stage codegen with zero Python in the hot path, and all
expressible in ANSI SQL for DuckDB oracle validation.

Design note for 100 TB: every function here is a narrow per-row expression
(no shuffle, no driver state). MinHash seeds are compile-time constants
folded into the plan; md5 is used as the hash family because it is
deterministic and identical across engines (same value in Spark, DuckDB,
and any verifier) — at cluster scale you'd swap in xxhash64 for speed, which
is also built-in (``F.xxhash64``) but engine-specific.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"[^a-z0-9]+"

# Tiny embedded stopword lists for the language-ID heuristic. Deliberately
# small: this is an n-gram/stopword heuristic, not a model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "du"],
    "de": ["der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "im"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(c: Column | str) -> Column:
    """Lowercased word tokens (whitespace+punct split), empties removed."""
    arr = F.split(F.lower(_col(c)), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda x: x != "")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def _let(bound: Column, body) -> Column:
    """Let-binding for expression trees: evaluate ``bound`` ONCE and feed
    the bound value to ``body``.

    Implemented as ``transform(array(bound), v -> body(v))[1]`` — lambda
    variables are evaluated values, so ``body`` referencing ``v`` n times
    costs one evaluation of ``bound``, not n. Embedding an expression
    directly in a per-element lambda re-evaluates it per element (e.g.
    lower(text) inside a shingle lambda turns shingling O(n²)).
    """
    return F.element_at(F.transform(F.array(bound), body), 1)


BPE_SPLIT_RE = r"'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+|\s+"


def bpe_tokens(c: Column | str) -> Column:
    """GPT-2-style pre-tokenization (the BPE-ish regex): contraction
    suffixes, space-prefixed letter runs, digit runs, punctuation runs,
    whitespace runs — the standard first pass of byte-pair tokenizers.
    Whitespace-only tokens are dropped from counts (they carry no BPE
    merges); leading spaces are kept on word tokens, as BPE does."""
    arr = F.regexp_extract_all(F.lower(_col(c)), F.lit(BPE_SPLIT_RE), 0)
    return F.filter(arr, lambda t: ~t.rlike(r"^\s+$"))


def bpe_token_count(c: Column | str) -> Column:
    return F.size(bpe_tokens(c))


def char_shingles(c: Column | str, k: int = 5) -> Column:
    """All k-character shingles of the lowercased text as an array.
    Built with sequence+transform (JVM-side); empty array for short docs.
    The lowercased text is let-bound so it is computed once per row, not
    once per shingle."""

    def build(t: Column) -> Column:
        n = F.length(t) - (k - 1)
        return F.when(
            n >= 1,
            F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(t, i, k)),
        ).otherwise(F.array().cast("array<string>"))

    return _let(F.lower(_col(c)), build)


def minhash_value(shingles: Column, seed: int) -> Column:
    """One MinHash component: min over md5(seed || shingle).

    md5 hex strings order lexicographically, which is a valid total order
    for min-hashing; identical in DuckDB (``min(md5(seed || s))``) so
    signatures are oracle-checkable.
    """
    return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s))))


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """Array of MinHash components (seeds 0..num_hashes-1)."""
    return F.array(*[minhash_value(shingles, i) for i in range(num_hashes)])


def simhash64(c: Column | str, k: int = 4) -> Column:
    """64-bit SimHash over k-shingles using xxhash64 bit-voting.

    Engine-specific hash (xxhash64) → validated by pytest, not the DuckDB
    oracle (rows-only check). Single-pass vote: aggregate over the hash
    array with a 64-wide accumulator (votes[b] += bit b of each hash),
    then fold the majority bits into one long. An earlier formulation did
    64 separate filter-and-count passes over the array — ~7× slower from
    the per-bit array allocations. The Python DSL's shiftright/shiftleft
    insist on an int shift amount; the underlying SQL expressions take any
    expression, so they are called by name for the column-valued bit
    index. The hash array is let-bound so it is hashed once, not once per
    consumer.
    """

    def vote(hashes: Column) -> Column:
        n = F.size(hashes)
        votes = F.aggregate(
            hashes,
            F.array_repeat(F.lit(0).cast("long"), 64),
            lambda acc, h: F.zip_with(
                acc,
                F.sequence(F.lit(0), F.lit(63)),
                lambda a, b: a + F.call_function("shiftright", h, b).bitwiseAND(F.lit(1)),
            ),
        )
        return F.aggregate(
            F.zip_with(
                votes,
                F.sequence(F.lit(0), F.lit(63)),
                lambda v, b: F.when(
                    v * 2 > n, F.call_function("shiftleft", F.lit(1).cast("long"), b)
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc.bitwiseOR(x),
        )

    return _let(F.transform(char_shingles(c, k), lambda s: F.xxhash64(s)), vote)


def stopword_hits(c: Column | str, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(c), lambda t: F.array_contains(sw, t)))


def langid_guess(c: Column | str) -> Column:
    """Heuristic language ID: the language whose stopword list hits most
    tokens; 'und' when nothing hits. Pure when-cascade over per-language
    hit counts (greatest-of with deterministic tie-break by language
    order en < es < fr < de via strictly-greater comparisons)."""
    hits = {lang: stopword_hits(c, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in STOPWORDS:  # first language attaining the max wins
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def punct_ratio(c: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    t = _col(c)
    total = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(0.0))


def stopword_ratio(c: Column | str, lang: str = "en") -> Column:
    n = token_count(c)
    return F.when(n > 0, stopword_hits(c, lang).cast("double") / n).otherwise(F.lit(0.0))


def mean_token_len(c: Column | str) -> Column:
    tk = tokens(c)
    total = F.aggregate(tk, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return F.when(F.size(tk) > 0, total.cast("double") / F.size(tk)).otherwise(F.lit(0.0))


def quality_score(c: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]: rewards moderate
    length, low punctuation density, and presence of stopwords — the
    standard cheap pre-filter shape for LLM corpus cleaning."""
    length_component = F.least(F.length(_col(c)).cast("double") / 500.0, F.lit(1.0))
    punct_component = 1.0 - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    sw_component = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    return F.round((length_component + punct_component + sw_component) / 3.0, 6)


def winnow_fingerprints(c: Column | str, k: int = 5, window: int = 4) -> Column:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme):
    hash every k-gram, slide a ``window`` over the hash sequence, keep
    each window's minimum, dedupe. Guarantees any shared substring of
    length >= k + window - 1 contributes a shared fingerprint — the
    local-sampling property plain min-hash lacks.

    All JVM HOFs (md5 as the engine-independent hash family; the hash
    array is let-bound so it is computed once, not once per window).
    """

    def build(hashes: Column) -> Column:
        n_windows = F.size(hashes) - (window - 1)
        return F.when(
            n_windows >= 1,
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), n_windows),
                        lambda i: F.array_min(F.slice(hashes, i, window)),
                    )
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return _let(F.transform(char_shingles(c, k), lambda s: F.md5(s)), build)


def ordinal_expr(n: Column) -> Column:
    """'1st'/'2nd'/'3rd'/'Nth' label — replaces the reference's one scalar
    Python UDF (mu_extras.py:140 ``map_elements(num_and_dt.ordinal)``) with
    a pure CASE expression (whole-stage codegen, no Python)."""
    s = n.cast("string")
    return (
        F.when((n % 100).isin(11, 12, 13), F.concat(s, F.lit("th")))
        .when(n % 10 == 1, F.concat(s, F.lit("st")))
        .when(n % 10 == 2, F.concat(s, F.lit("nd")))
        .when(n % 10 == 3, F.concat(s, F.lit("rd")))
        .otherwise(F.concat(s, F.lit("th")))
    )


def fingerprint(c: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the token-normalized
    text (casefolded, punctuation collapsed). Two documents differing only
    in whitespace/punct/case share a fingerprint — the exact-dedup key."""
    return F.md5(F.array_join(tokens(c), " "))
