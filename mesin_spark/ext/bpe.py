"""Distributed BPE tokenizer training — byte-pair-encoding merges learned
from the corpus word-frequency table (Sennrich et al. 2016, the GPT-2
training recipe), expressed as iterated DataFrame aggregation.

Scale shape: training operates on the DISTINCT-WORD table (word, count) —
at 100 TB of text that is ~10^7-10^8 rows, 3-5 orders of magnitude smaller
than the corpus, and exactly how production BPE trainers batch it. Each
merge iteration is:
  1. explode each word's adjacent symbol pairs (map-side);
  2. ONE groupBy (pair) weighted count — the only shuffle;
  3. a 1-row bounded collect of the argmax pair (deterministic tie-break:
     count desc, then lexicographic);
  4. a map-side greedy left-to-right merge fold over every word's symbols.
The sequential dependency between iterations is inherent to BPE; the
per-iteration driver traffic is one row. Symbol frames are lazily
localCheckpoint'ed every round so plan lineage stays flat (growing
lineage costs seconds/round in planning alone) while each round still
runs a single job. Measured floor locally: ~0.8s/merge — fixed
plan+codegen cost per round, data-independent at small SF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mesin_spark.ext.ckpt import ckpt

from mesin_spark.ext.text import tokens

__all__ = ["word_counts", "train_bpe", "apply_merge", "encode_words"]


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount) over the tokenized corpus — one explode + one
    groupBy; the frequency table every later stage runs on."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def _chars(word: Column) -> Column:
    return F.filter(F.split(word, ""), lambda c: F.length(c) > 0)


def apply_merge(syms: Column, a: "Column | str", b: "Column | str") -> Column:
    """Greedy left-to-right merge of adjacent (a, b) -> ab in a symbol
    array — one aggregate fold, no Python. Matches reference BPE exactly:
    after a merge the scan continues AFTER the merged token (the fold's
    new tail is 'ab', which can never equal 'a' again since it is longer).

    ``a``/``b`` may be Columns or literal strings. (Feeding the pair as a
    broadcast 1-row column to reuse generated code was measured SLOWER
    than literals + per-round checkpoint — the join planning outweighed
    the codegen reuse — so the trainer uses literals.)"""
    a = F.lit(a) if isinstance(a, str) else a
    b = F.lit(b) if isinstance(b, str) else b
    merged = F.concat(a, b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 20,
    min_count: int = 2,
    text_col: str = "text",
    checkpoint_every: int = 1,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges; returns [{rank, left, right, merged,
    pair_count}, ...] in merge order. Stops early when the best remaining
    pair's weighted count drops below ``min_count``."""
    spark = docs.sparkSession
    wc = word_counts(docs, text_col)
    syms = wc.select(_chars(F.col("word")).alias("s"), "wcount").transform(ckpt, 
        eager=True
    )
    merges: list[dict] = []
    # the word table is orders of magnitude smaller than the corpus; the
    # per-iteration jobs are overhead-bound at full shuffle width, so run
    # the training loop narrow (and restore the session width after) —
    # at real scale pick ~table_size/128MB instead
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        merges = _train_loop(syms, n_merges, min_count, checkpoint_every)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    return merges


def _train_loop(
    syms: DataFrame, n_merges: int, min_count: int, checkpoint_every: int
) -> list[dict]:
    merges: list[dict] = []
    for rank in range(n_merges):
        pairs = syms.filter(F.size("s") >= 2).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("s") - 1),
                    lambda i: F.struct(
                        F.element_at("s", i).alias("l"),
                        F.element_at("s", i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
            "wcount",
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("wcount").alias("n"))
            .orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append(
            {"rank": rank, "left": l, "right": r, "merged": l + r, "pair_count": n}
        )
        syms = syms.select(apply_merge(F.col("s"), l, r).alias("s"), "wcount")
        if (rank + 1) % checkpoint_every == 0:
            # lazy: the NEXT iteration's pair-count job materializes the
            # checkpoint, so each round costs ONE job, not two
            syms = syms.transform(ckpt, eager=False)
    return merges


def encode_words(words: DataFrame, merges: list[dict], word_col: str = "word") -> DataFrame:
    """Apply a learned merge list to a word table -> (word, pieces). The
    merge chain is ``len(merges)`` nested folds over char arrays — run it
    on the DISTINCT-word table and join back to the corpus, never on raw
    text."""
    s = _chars(F.col(word_col))
    for mrec in merges:
        s = apply_merge(s, mrec["left"], mrec["right"])
    return words.select(word_col, s.alias("pieces"))
