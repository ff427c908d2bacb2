"""Distributed BPE merge learning — the first k merge rules of a
byte-pair-encoding tokenizer, learned from a corpus (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016).

The reference has no tokenizer surface (its text ops are normalization,
SURVEY.md §2.9); this is north-star LLM-pipeline extension: training a
tokenizer's merge table IS a corpus-scale aggregation problem.

Execution shape (why this scales to 100 TB of text):

- The corpus collapses ONCE to the word-type vocabulary (word, freq) —
  the classic BPE trick: merges depend only on type frequencies, so all
  further work is vocab-sized, not corpus-sized. The vocab frame stays
  DISTRIBUTED (at web scale it is 10-100M types — too big to collect,
  tiny compared to the corpus).
- Each iteration is one explode→groupBy over the vocab (adjacent symbol
  pairs weighted by word freq, map-side partial sums) and ONE 1-row
  collect: the argmax pair. The driver holds only the k merge rules —
  the sequential dependency between merges is inherent to BPE, and one
  scalar per round is the minimum possible driver traffic.
- The merge rewrite is a literal string REPLACE on the space-delimited
  symbol string (' l l ' -> ' ll '), left-to-right non-overlapping in
  every engine — map-side, no shuffle. Lineage is cut per iteration via
  localCheckpoint (the label-propagation pattern) so the plan does not
  grow with k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) type-frequency vocabulary over the standard tokenizer
    (lowercase [a-z0-9] runs — functions.text.tokens).

    The narrow text input is repartitioned up to the core count first
    (no-op once the scan has that many splits): tokenize+explode is the
    expensive projection, and an under-split scan (one small parquet
    file) would otherwise run it on one task — the exact pattern
    ``ensure_parallelism``'s docstring prescribes."""
    from pmp_analytics_spark.functions.text import tokens
    from pmp_analytics_spark.operators.partitioning import ensure_parallelism

    return (
        ensure_parallelism(docs.select(F.col(text_col)))
        .select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _symbolized(vocab: DataFrame) -> DataFrame:
    # ' h e l l o ' — leading/trailing spaces make ' a b ' a safe literal
    # replace boundary for every adjacent pair, including at word edges.
    sym = F.concat(
        F.lit(" "), F.concat_ws(" ", F.split(F.col("word"), "")), F.lit(" ")
    )
    return vocab.select("word", "freq", sym.alias("sym"))


def _pair_counts(symed: DataFrame) -> DataFrame:
    toks = F.split(F.trim(F.col("sym")), " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat(
            F.element_at(toks, i), F.lit("|"), F.element_at(toks, i + 1)
        ),
    )
    return (
        symed.where(F.size(toks) >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_freq"))
    )


def bpe_learn_merges(
    docs: DataFrame, text_col: str, n_merges: int
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules over the word-type
    vocabulary; returns a DataFrame (rank, lhs, rhs, merged, pair_freq)
    with rank 1..n_merges in merge order. Ties break deterministically
    by pair string ascending — the same total order the SQL replay
    oracle uses, so the learned table is engine-exact. Stops early if
    no pair remains (rank list shorter)."""
    symed = _symbolized(word_vocab(docs, text_col))
    return learn_merges_from_sym(symed, n_merges)


def learn_merges_from_sym(symed: DataFrame, n_merges: int) -> DataFrame:
    """The BPE merge loop itself, generic over the SYMBOL ALPHABET: the
    input frame carries (freq, sym) where ``sym`` is the canonical
    space-delimited, space-bounded symbol string. The word-level
    learner feeds character symbols; the byte-level learner feeds hex
    byte-pair symbols — one loop, one tie-break, one oracle shape."""
    spark = symed.sparkSession
    symed = symed.localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(symed)
            .orderBy(F.desc("pair_freq"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, pf = best[0]["pair"], int(best[0]["pair_freq"])
        lhs, rhs = pair.split("|", 1)
        merged = lhs + rhs
        merges.append((rank, lhs, rhs, merged, pf))
        symed = symed.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(f" {lhs} {rhs} "),
                F.lit(f" {merged} "),
            ),
        ).localCheckpoint(eager=False)
    from pmp_analytics_spark.sources.local import local_df

    return local_df(
        spark, merges, "rank long, lhs string, rhs string, merged string, pair_freq long"
    )


# ---------------------------------------------------------------------------
# Byte-level BPE with regex pre-tokenization — the GPT-2-style front end
# (Radford et al. 2019; the public tokenizer lineage behind tiktoken /
# HF byte-level BPE): text splits into PRE-TOKENS by an ordered-
# alternation regex that keeps one leading space attached to word and
# number runs, then each pre-token becomes its UTF-8 BYTE sequence, and
# BPE merges run over bytes — so the learned vocabulary covers ANY
# input (no unknown-token path), multi-byte UTF-8 splitting into
# multiple byte symbols until merges re-fuse it.
#
# Symbol alphabet: each byte is its 2-char uppercase hex pair ("C3",
# "A9"), the Spark/DuckDB-shared stand-in for GPT-2's printable
# byte-to-unicode table — space-safe in the canonical sym string,
# merge-concatenation = byte concatenation, and UNHEX of any merged
# symbol round-trips the exact bytes.
#
# The pre-token pattern uses explicit whitespace classes ([ \t\n\r])
# instead of \s: Java's \s is the ASCII set including \x0B while RE2's
# is not — the one place the two engines' regex dialects would
# silently diverge. No lookahead anywhere (RE2 has none), so the
# GPT-2 contraction branch and trailing-space lookahead are
# deliberately out of scope (documented simplification).
# ---------------------------------------------------------------------------

BYTE_PRETOKEN_RE = (
    " ?[\\p{L}]+| ?[\\p{N}]+| ?[^ \\t\\n\\r\\p{L}\\p{N}]+|[ \\t\\n\\r]+"
)


def byte_pretoken_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) type-frequency vocabulary over the byte-level
    pre-tokenizer — ordered leftmost alternation, identical in Java
    regex and RE2. Corpus collapses ONCE to pre-token types, same as
    the word-level trick."""
    from pmp_analytics_spark.operators.partitioning import ensure_parallelism

    return (
        ensure_parallelism(docs.select(F.col(text_col)))
        .select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BYTE_PRETOKEN_RE), 0
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def byte_symbolized(vocab: DataFrame) -> DataFrame:
    """' 48 C3 A9 ' — the canonical space-bounded symbol string over
    hex byte pairs: HEX of the pre-token's UTF-8 bytes, split every
    two chars. Pure JVM string ops, map-side."""
    sym = F.concat(
        F.lit(" "),
        F.regexp_replace(
            F.hex(F.encode(F.col("word"), "UTF-8")), "(..)", "$1 "
        ),
    )
    return vocab.select("word", "freq", sym.alias("sym"))


def bpe_learn_merges_bytes(
    docs: DataFrame, text_col: str, n_merges: int
) -> DataFrame:
    """Byte-level BPE learning: regex pre-tokens -> UTF-8 hex byte
    symbols -> the shared merge loop. Same output shape and tie-break
    as the word-level learner; symbols are hex strings whose UNHEX is
    the merged byte sequence."""
    return learn_merges_from_sym(
        byte_symbolized(byte_pretoken_vocab(docs, text_col)), n_merges
    )


def bpe_apply(vocab: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply learned merge rules to the word-type vocabulary: returns
    (word, freq, sym) where ``sym`` is the space-delimited subword
    segmentation after every merge has been applied in rank order.

    ``merges`` is the [(lhs, rhs), ...] rule list in rank order — the
    OUTPUT of ``bpe_learn_merges`` (k rows, bounded by n_merges — a
    tokenizer's merge table is driver-small by definition; at deployment
    it is a broadcast artifact, not corpus state). Each rule is one
    literal boundary-delimited replace, the exact rewrite the learner
    used, so learn-then-apply round-trips bit-identically. All k
    replaces fold into ONE map-side projection: no shuffle, no
    per-round lineage — encoding is embarrassingly parallel over word
    types (and the corpus encode is a broadcast join of corpus words
    against this vocab-sized frame)."""
    return apply_merges_to_sym(_symbolized(vocab), merges)


def apply_merges_to_sym(
    symed: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Fold every merge rule into ONE map-side projection over an
    already-symbolized (word, freq, sym) frame — shared by the word-
    and byte-level apply paths (the alphabets differ only upstream, in
    how ``sym`` was built)."""
    sym = F.col("sym")
    for lhs, rhs in merges:
        sym = F.replace(sym, F.lit(f" {lhs} {rhs} "), F.lit(f" {lhs}{rhs} "))
    return symed.select("word", "freq", sym.alias("sym"))


def bpe_token_stats(applied: DataFrame) -> DataFrame:
    """Subword-token statistics over an encoded vocabulary (the output
    of ``bpe_apply``): (token, token_freq, n_word_types) — corpus-wide
    occurrence count (word freq summed into each of its subword slots)
    and the number of distinct word types containing the token. One
    vocab-sized explode→groupBy; the frequency table IS the artifact a
    tokenizer trainer ships (vocab file + ranks)."""
    toks = F.split(F.trim(F.col("sym")), " ")
    return (
        applied.select("word", F.explode(toks).alias("token"), "freq")
        .groupBy("token")
        .agg(
            F.sum("freq").alias("token_freq"),
            F.countDistinct("word").alias("n_word_types"),
        )
    )


# ---------------------------------------------------------------------------
# WordPiece — the likelihood-gain merge family (Schuster & Nakajima 2012;
# the BERT tokenizer's trainer). Identical loop shape to BPE over the
# same canonical space-bounded symbol strings; the ONLY change is the
# merge-selection objective: instead of raw pair frequency, each round
# merges the pair maximizing
#
#     score(a, b) = count(ab) / (count(a) * count(b))
#
# — the unigram-LM likelihood gain of fusing the pair (pairs whose parts
# are rare but co-occur reliably win over merely-frequent pairs). Counts
# are over the CURRENT segmentation, weighted by word-type frequency.
# Determinism: the score is one double division of exact integers with
# an identical expression tree in the SQL replay oracle, tie-broken
# (score DESC, pair ASC) — the same engine-exact argmax contract as the
# BPE/byte-BPE learners. Scale shape: per round, one vocab-sized pair
# count and one vocab-sized unit count (both map-side combines over the
# TYPE table, corpus size enters only the initial vocab aggregate), a
# broadcast pair⋈unit join, and a 1-row argmax collect.
# ---------------------------------------------------------------------------


def wordpiece_learn_merges(
    docs: DataFrame, text_col: str, n_merges: int
) -> DataFrame:
    """Learn the first ``n_merges`` WordPiece merges over the word-type
    vocabulary; returns (rank, lhs, rhs, merged, pair_freq, score)
    with score the raw likelihood-gain double the pair won on."""
    symed = _symbolized(word_vocab(docs, text_col))
    return wordpiece_merges_from_sym(symed, n_merges)


def wordpiece_merges_from_sym(symed: DataFrame, n_merges: int) -> DataFrame:
    """The WordPiece merge loop, generic over the symbol alphabet (the
    ``learn_merges_from_sym`` contract with the likelihood-gain
    objective)."""
    spark = symed.sparkSession
    symed = symed.localCheckpoint(eager=False)
    merges: list[tuple] = []
    # pair and unit counts FUSE into one tagged aggregation per round
    # (units prefixed with a \x01 marker no symbol can start with):
    # the naive form scanned the vocab three times per round (pair agg
    # once, the unit agg once per join arm) — measured ~16 s for the
    # 8-round fit at sf0.1; one scan + a checkpointed split is ~2x.
    _U = "\x01"
    for rank in range(1, n_merges + 1):
        toks = F.split(F.trim(F.col("sym")), " ")
        pair_items = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat(
                    F.element_at(toks, i), F.lit("|"), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.expr("array()").cast("array<string>"))
        items = F.concat(
            pair_items, F.transform(toks, lambda t: F.concat(F.lit(_U), t))
        )
        counted = (
            symed.select(F.explode(items).alias("it"), "freq")
            .groupBy("it")
            .agg(F.sum("freq").alias("c"))
            .localCheckpoint(eager=False)
        )
        pairs = counted.where(~F.col("it").startswith(_U)).select(
            F.col("it").alias("pair"), F.col("c").alias("pair_freq")
        )
        units = counted.where(F.col("it").startswith(_U)).select(
            F.expr("substring(it, 2)").alias("unit"), "c"
        )
        lhs_c = units.select(
            F.col("unit").alias("__lu"), F.col("c").alias("cl")
        )
        rhs_c = units.select(
            F.col("unit").alias("__ru"), F.col("c").alias("cr")
        )
        best = (
            pairs.join(
                F.broadcast(lhs_c),
                F.split_part(F.col("pair"), F.lit("|"), F.lit(1))
                == F.col("__lu"),
            )
            .join(
                F.broadcast(rhs_c),
                F.split_part(F.col("pair"), F.lit("|"), F.lit(2))
                == F.col("__ru"),
            )
            .select(
                "pair",
                "pair_freq",
                (
                    F.col("pair_freq") * F.lit(1.0)
                    / (F.col("cl") * F.col("cr"))
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, pf, sc = best[0]["pair"], int(best[0]["pair_freq"]), float(best[0]["score"])
        lhs, rhs = pair.split("|", 1)
        # raw double: the harness canonicalizer rounds floats at 9 on
        # both engines, and the oracle computes the identical expression
        merges.append((rank, lhs, rhs, lhs + rhs, pf, sc))
        symed = symed.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(f" {lhs} {rhs} "),
                F.lit(f" {lhs}{rhs} "),
            ),
        ).localCheckpoint(eager=False)
    from pmp_analytics_spark.sources.local import local_df

    return local_df(
        spark,
        merges,
        "rank long, lhs string, rhs string, merged string, "
        "pair_freq long, score double",
    )


def wordpiece_vocab(applied: DataFrame) -> DataFrame:
    """(piece, initial, marked) inference vocabulary from a trained
    segmentation frame (word, freq, sym): the distinct subword pieces
    the training replay produced, POSITION-marked the BERT way — a
    piece seen word-initially is a plain entry, a piece seen
    word-internally is a ``##``-continuation entry (the same surface
    form can be both). Vocab-bounded by construction."""
    toks = F.split(F.trim(F.col("sym")), " ")
    return (
        applied.select(F.posexplode(toks).alias("idx", "piece"))
        .where(F.col("piece") != "")
        .select("piece", (F.col("idx") == 0).alias("initial"))
        .distinct()
        .withColumn(
            "marked",
            F.when(F.col("initial"), F.col("piece")).otherwise(
                F.concat(F.lit("##"), F.col("piece"))
            ),
        )
    )


def wordpiece_encode(
    words: DataFrame, vocab: DataFrame, max_word_len: int
) -> DataFrame:
    """BERT-style WordPiece INFERENCE: greedy longest-match-first
    segmentation of each word against a position-marked vocabulary —
    deliberately NOT the training merge replay (greedy munch over the
    final vocab is what ships in production, and it can segment a word
    differently than training did; a word with no match at some cursor
    becomes ``[UNK]`` whole, the real OOV semantics).

    Movement: ``max_word_len`` bounded rounds (each consumes >= 1
    char), each round one broadcast join of the live cursor frame
    against the vocab + a per-word longest-match argmax — every frame
    is word-type-table sized; the corpus never enters. Returns (word,
    freq, pieces, n_pieces, oov)."""
    state = words.select(
        "word",
        "freq",
        F.lit(1).alias("pos"),
        F.lit("").alias("out"),
        F.lit(False).alias("oov"),
        F.lit(False).alias("done"),
    ).localCheckpoint(eager=True)
    for _ in range(max_word_len):
        active = state.where(~F.col("done"))
        finished = state.where(F.col("done"))
        # early exit: most words finish in far fewer rounds than the
        # max-word-length bound (pieces are multi-char); the check is a
        # head(1) on an eagerly checkpointed frame, cheaper than the
        # join+window round it skips. A dry round is identity in the
        # unrolled SQL oracle (LEFT JOIN to an empty argmax), so engine
        # early-exit and the oracle's static unroll agree.
        if not active.head(1):
            break
        cand = active.join(
            F.broadcast(vocab),
            (F.col("initial") == (F.col("pos") == 1))
            & (
                F.expr("substring(word, pos, length(piece))")
                == F.col("piece")
            ),
            "left",
        )
        w = Window.partitionBy("word").orderBy(
            F.desc(F.length("piece")), F.asc("piece")
        )
        best = cand.withColumn("__rn", F.row_number().over(w)).where(
            F.col("__rn") == 1
        )
        miss = F.col("piece").isNull()
        stepped = best.select(
            "word",
            "freq",
            F.when(miss, F.col("pos"))
            .otherwise(F.col("pos") + F.length("piece"))
            .alias("pos"),
            F.when(miss, F.col("out"))
            .when(F.col("out") == "", F.col("marked"))
            .otherwise(F.concat_ws(" ", "out", "marked"))
            .alias("out"),
            F.when(miss, F.lit(True)).otherwise(F.col("oov")).alias("oov"),
            F.when(miss, F.lit(True))
            .otherwise(F.col("pos") + F.length("piece") > F.length("word"))
            .alias("done"),
        )
        state = finished.unionByName(stepped).localCheckpoint(eager=True)
    return state.select(
        "word",
        "freq",
        F.when(F.col("oov"), F.lit("[UNK]")).otherwise(F.col("out")).alias(
            "pieces"
        ),
        F.when(F.col("oov"), F.lit(1))
        .otherwise(F.size(F.split(F.col("out"), " ")))
        .cast("long")
        .alias("n_pieces"),
        F.col("oov").cast("int").alias("oov"),
    )
