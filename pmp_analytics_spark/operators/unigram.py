"""Distributed unigram-LM (SentencePiece-style) tokenizer learning.

Kudo 2018 ("Subword Regularization") unigram language model, the other
standard subword tokenizer next to BPE (operators/bpe.py) — here in its
deterministic hard-EM (Viterbi-EM) form with a fixed iteration count
and a pruning schedule:

1. SEED: all substrings (length <= ``max_piece_len``) of the word-type
   vocabulary, occurrence-counted with type frequencies; keep the top
   ``seed_multi`` multi-character pieces (count DESC, piece ASC) plus
   EVERY single character (the segmentability guarantee).
2. E-STEP: Viterbi-segment each word type under the current piece
   scores; M-STEP: piece counts re-estimate from the segmentations
   (weighted by type frequency); single characters floor at count 1
   (they must survive to keep every word segmentable), multi-char
   pieces prune to the top ``keep_multi``.
3. Repeat for ``iters`` rounds; the final piece table is the vocab.

Engine-exact determinism (the full-oracle contract every iterative
operator here carries): piece scores are INTEGER log-probs
``floor(ln(count / total) * 1e9)`` — computed once per round, so the
Viterbi DP is pure BIGINT addition/comparison (exactly associative; no
cross-engine float-summation order anywhere), with ties broken to the
SMALLER split point (longest last piece). The only float op per round
is that one ln per piece, immediately floored — the same
single-rounded-transcendental exposure the k-means family accepts.

Execution shape (the 100 TB story, BPE's exactly): the corpus collapses
ONCE to the word-type vocabulary; every EM round is one Arrow-batched
Viterbi pass over the DISTRIBUTED vocab (the piece table is
vocab_size-bounded — collected and broadcast, like BPE's merge table)
plus one explode->groupBy for the counts. Words longer than
``max_word_len`` are excluded from training on both engines (the SQL
replay unrolls the DP per position, so the cap bounds the unroll).

Reference analog: none (the reference has no tokenizer surface);
north-star extension per VERDICT r7 #5.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["unigram_fit", "unigram_segment", "viterbi_segment_py"]


def _seed_pieces(
    vocab: DataFrame, max_piece_len: int, seed_multi: int
) -> DataFrame:
    """(piece, cnt) seed table: top multi-char substrings + all single
    chars, substring occurrences weighted by word-type frequency."""
    grid = F.explode(
        F.expr(
            f"""flatten(transform(sequence(1, length(word)), i ->
                  transform(sequence(1, least({int(max_piece_len)},
                                              length(word) - i + 1)),
                            l -> substring(word, i, l))))"""
        )
    )
    counts = (
        vocab.select(grid.alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    multi = (
        counts.where(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(seed_multi)
    )
    single = counts.where(F.length("piece") == 1)
    return multi.unionByName(single)


def _lp_table(rows: list) -> dict[str, int]:
    """piece -> floor(ln(cnt/total) * 1e9); the one float op per round,
    done in driver Python (math.log = libm, same as DuckDB's LN) and
    floored to BIGINT so all downstream DP arithmetic is integer."""
    total = sum(r["cnt"] for r in rows)
    return {
        r["piece"]: math.floor(math.log(r["cnt"] / total) * 1e9)
        for r in rows
    }


def viterbi_segment_py(
    word: str, lp: dict[str, int], max_piece_len: int
) -> list[str]:
    """Reference Viterbi: maximize the integer score sum; ties prefer
    the SMALLER split point (ascending-j scan with strict >)."""
    n = len(word)
    best: list = [None] * (n + 1)
    best[0] = (0, None)
    for p in range(1, n + 1):
        for j in range(max(0, p - max_piece_len), p):
            if best[j] is None:
                continue
            s = lp.get(word[j:p])
            if s is None:
                continue
            cand = best[j][0] + s
            if best[p] is None or cand > best[p][0]:
                best[p] = (cand, j)
    if best[n] is None:  # unsegmentable (char outside the piece set)
        return []
    out, p = [], n
    while p > 0:
        j = best[p][1]
        out.append(word[j:p])
        p = j
    return out[::-1]


def unigram_segment(
    vocab: DataFrame, lp: dict[str, int], max_piece_len: int
) -> DataFrame:
    """(word, freq, seg): Viterbi segmentation of every word type under
    the broadcast integer score table — one Arrow-batched pass; ``seg``
    is the space-joined piece list."""
    import pandas as pd

    spark = vocab.sparkSession
    bc = spark.sparkContext.broadcast((lp, max_piece_len))

    def seg(batches):
        table, cap = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "freq": pdf["freq"],
                    "seg": [
                        " ".join(viterbi_segment_py(w, table, cap))
                        for w in pdf["word"]
                    ],
                }
            )

    return vocab.select("word", "freq").mapInPandas(
        seg, schema="word string, freq long, seg string"
    )


def unigram_fit(
    docs: DataFrame,
    text_col: str,
    iters: int = 2,
    max_piece_len: int = 6,
    max_word_len: int = 16,
    seed_multi: int = 64,
    keep_multi: int = 48,
) -> DataFrame:
    """Learn the unigram-LM piece table; returns (piece, n_uses) —
    final counts after the last E-step (single-char floor + prune
    applied). See module docstring for the algorithm and determinism
    contract."""
    from pmp_analytics_spark.operators.bpe import word_vocab

    vocab = (
        word_vocab(docs, text_col)
        .where(F.length("word") <= max_word_len)
        .localCheckpoint(eager=False)
    )
    pieces = _seed_pieces(vocab, max_piece_len, seed_multi)
    for _ in range(iters):
        lp = _lp_table(pieces.collect())  # vocab_size-bounded
        segged = unigram_segment(vocab, lp, max_piece_len)
        counts = (
            segged.select(
                F.explode(
                    F.filter(F.split("seg", " "), lambda x: x != "")
                ).alias("piece"),
                "freq",
            )
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
        )
        # singles floor at 1 (left join from the CURRENT single set —
        # an unused char must survive); multi-char prune to the top
        singles = (
            pieces.where(F.length("piece") == 1)
            .select("piece")
            .join(counts, "piece", "left")
            .select("piece", F.coalesce(F.col("cnt"), F.lit(1)).alias("cnt"))
        )
        multi = (
            counts.where(F.length("piece") >= 2)
            .orderBy(F.desc("cnt"), F.asc("piece"))
            .limit(keep_multi)
        )
        pieces = multi.unionByName(singles).localCheckpoint(eager=True)
    return pieces.select("piece", F.col("cnt").cast("long").alias("n_uses"))
