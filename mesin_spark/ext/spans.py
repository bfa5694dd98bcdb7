"""Cross-document duplicated-span detection and removal — the
ExactSubstr-style dedup of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (2021), re-expressed as keyed DataFrame joins
instead of a suffix array.

Semantics: a w-token shingle *instance* is a duplicate when the same
shingle occurs in an earlier document (owner = min doc_id over the
shingle); every token covered by a duplicate instance is removed, tokens
in the owner document are kept. This keeps exactly one copy of every
duplicated span corpus-wide, which is the property that matters for
training data (memorization scales with duplicate count, not presence).

Scale design — no suffix array, no quadratic candidate step:
 1. shingle instances: map-side posexplode (w-fold row amplification of
    the token stream, the same cost as any shingling pass);
 2. ownership: ONE groupBy on the 64-bit shingle hash (min doc_id);
 3. duplicate marking: an equi-join back on the hash — AQE handles the
    skew of boilerplate shingles, and the join output is only the
    duplicate instances, not all pairs (contrast MinHash candidate
    generation: this path is exact, not probabilistic);
 4. covered-position expansion: explode of w ints per duplicate instance,
    dedup'd on (doc, position);
 5. rebuild: anti-join tokens against covered positions, then ONE
    groupBy(doc) reassembly with a sorted struct fold.
Everything shuffles on either the shingle hash or doc_id; both keys are
high-cardinality. Internal keys are xxhash64 longs (never the shingle
strings), per the measured 5x from ext/dedup's n-gram path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mesin_spark.ext.text import tokens

__all__ = ["shingle_instances", "duplicate_positions", "span_stats", "remove_spans"]


def _tokenized(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("w"))


def shingle_instances(
    docs: DataFrame, w: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, sh): one row per w-token shingle occurrence; ``sh`` is
    the xxhash64 of the space-joined shingle, ``pos`` the 0-based token
    index. Docs shorter than w yield no rows. Map-side only."""
    tk = _tokenized(docs, id_col, text_col)
    # sequence(0, size-w) would run DESCENDING for short docs — guard first
    starts = F.when(
        F.size("w") >= w, F.sequence(F.lit(0), F.size("w") - w)
    ).otherwise(F.array().cast("array<int>"))
    return tk.select(
        "doc_id",
        F.posexplode(
            F.transform(
                starts,
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice("w", i + 1, w))),
            )
        ).alias("pos", "sh"),
    )


def duplicate_positions(
    docs: DataFrame, w: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos) of every duplicate shingle instance (doc is not the
    shingle's owner). One hash groupBy + one equi-join."""
    inst = shingle_instances(docs, w, id_col, text_col)
    owners = inst.groupBy("sh").agg(F.min("doc_id").alias("owner"))
    return (
        inst.join(owners, "sh")
        .filter(F.col("doc_id") != F.col("owner"))
        .select("doc_id", "pos")
    )


def span_stats(
    docs: DataFrame, w: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document duplication profile: (doc_id, n_shingles, n_dup_spans,
    dup_ratio). Documents with no shingles report zeros — the corpus-health
    view to run BEFORE committing to span removal."""
    inst = shingle_instances(docs, w, id_col, text_col)
    owners = inst.groupBy("sh").agg(F.min("doc_id").alias("owner"))
    per_doc = (
        inst.join(owners, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("doc_id") != F.col("owner"), 1)).alias(
                "n_dup_spans"
            ),
        )
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.when(
            F.coalesce("n_shingles", F.lit(0)) > 0,
            F.col("n_dup_spans") / F.col("n_shingles"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ratio"),
    )


def remove_spans(
    docs: DataFrame, w: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rebuild each document with every duplicated span cut out:
    (doc_id, clean_text, n_tokens, n_removed). The owner document keeps
    its copy; later documents lose exactly the covered tokens. A document
    whose tokens are all covered comes back with empty clean_text.
    Documents with NOTHING removed keep their ORIGINAL text verbatim —
    only rebuilt documents are token-normalized (lowercased, whitespace
    collapsed: the rebuild concatenates the tokenizer's output, which is
    the Lee-et-al. convention for cut documents)."""
    dup = duplicate_positions(docs, w, id_col, text_col)
    covered = dup.select(
        "doc_id", F.explode(F.sequence("pos", F.col("pos") + (w - 1))).alias("wi")
    ).distinct()
    tk = _tokenized(docs, id_col, text_col)
    words = tk.select(
        "doc_id", F.posexplode("w").alias("wi", "word"), F.size("w").alias("n")
    )
    kept = words.join(covered, ["doc_id", "wi"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("wi", "word"))),
                lambda s: s["word"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    base = tk.select("doc_id", F.size("w").alias("n_tokens")).join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_orig")),
        "doc_id",
    )
    n_removed = (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).cast("long")
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        # untouched documents pass through VERBATIM (case, punctuation,
        # whitespace intact); only documents that actually lost spans get
        # the token-normalized rebuild
        F.when(n_removed == 0, F.col("_orig"))
        .otherwise(F.coalesce("clean_text", F.lit("")))
        .alias("clean_text"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        n_removed.alias("n_removed"),
    )
