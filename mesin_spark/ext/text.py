"""Text analysis operators for large-scale training-data pipelines:
tokenization, token counting, quality scoring, language ID, document
fingerprinting.

Everything here is built-in `pyspark.sql.functions` expressions (higher-
order array functions) — JVM-side, codegen'd, no Python in the hot path —
so the operators scale to 100 TB exactly like any other projection: pure
map-side work, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mesin_spark.functions import stable_round as R

#: Small multilingual marker-word profiles for the n-gram/stopword language
#: heuristic. Order fixes the argmax tie-break (first wins).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du"),
    "es": ("el", "de", "que", "y", "la", "en", "los", "se"),
    "de": ("der", "die", "und", "den", "das", "nicht", "von", "ist"),
    "zh": ("的", "了", "是", "在", "我", "有", "和", "不"),
}

#: English stopwords used by the quality score.
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 131


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, lowercased, empty tokens dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: F.length(t) > 0)


def let_bound(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE per row and hand it to ``fn`` as a bound
    lambda variable — the expression-level let binding.

    Why it exists (round 12): a higher-order lambda that CAPTURES an
    outer expression re-evaluates that expression on every element
    (Catalyst performs no loop-invariant hoisting out of lambda bodies),
    and sibling references outside the lambda each re-evaluate it too
    (no common-subexpression elimination across repeated non-cheap
    subtrees in one Project — the round-11 simhash lesson). Binding the
    value through a 1-element ``transform`` makes every use a lambda-
    variable read. shingles() measured 21.3 s → 0.94 s on ~540-token
    docs (the captured tokenize ran once per shingle position —
    O(tokens²) per row); same class fixed in word_ngrams/chunk_docs and
    the factor-k re-tokenize in the signal columns. Output values are
    bit-identical: the same subexpression evaluated once instead of
    k times.

    CAVEAT (Spark 4.1): do NOT feed a let-bound tree directly as a
    Python-UDF argument — the nested lambdas trip an order-dependent
    UDF-extraction fragility (``Cannot evaluate expression`` INTERNAL
    error) when CollapseProject inlines the projection into the UDF
    argument. Materialize the column first (eager ckpt — see
    dedup._hashed_shingle_frame) so the UDF sees a leaf attribute."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the cheap proxy; see bpe_token_estimate for
    the BPE-ish regex variant)."""
    return F.size(tokens(col))


#: BPE-ish token pattern: alphanumeric runs, or any single non-space
#: symbol. Plain RE2-compatible alternation (no lookaround), so the same
#: pattern runs in Spark, DuckDB, and most other engines.
BPE_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def bpe_token_estimate(col: Column | str) -> Column:
    """BPE-ish token estimate: count alphanumeric runs plus individual
    punctuation/symbol characters — the standard cheap stand-in for a real
    tokenizer in data pipelines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0)))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    # let-bound: n and hits both read the same tokenize (was 2x per row)
    def _ratio(t: Column) -> Column:
        n = F.size(t)
        hits = F.size(F.filter(t, lambda x: x.isin(*stopwords)))
        return F.when(n > 0, hits / n).otherwise(F.lit(0.0))

    return let_bound(tokens(col), _ratio)


def avg_token_len(col: Column | str) -> Column:
    # let-bound: size and the length fold share one tokenize (was 2x)
    def _avg(t: Column) -> Column:
        n = F.size(t)
        total = F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        return F.when(n > 0, total / n).otherwise(F.lit(0.0))

    return let_bound(tokens(col), _avg)


def _signal_fold(col: Column | str, finish) -> Column:
    """One-pass fold over the token array computing EVERY text signal at
    once — token count, per-language marker hits, stopword hits, total
    chars — then ``finish(acc)`` maps the accumulator struct to the final
    value inside the same expression.

    This shape exists because building the signals as separate Column
    expressions duplicates the tokenizer subtree per reference (lang_id's
    argmax references each score ~5×, ~25 split+filter copies per row —
    measured 3.3s for the pipeline filter at sf0.1 vs 1.1s for this fold;
    the same pitfall as the MinHash per-permutation form). The optimizer
    re-inlines projected aliases through filter pushdown, so a fold with a
    finish lambda is the only form that guarantees single evaluation."""
    zero = F.lit(0).cast("long")
    init = F.struct(
        zero.alias("n"),
        *[zero.alias(f"l_{lang}") for lang in LANG_PROFILES],
        zero.alias("stop"),
        zero.alias("chars"),
    )

    def inc(cond: Column) -> Column:
        return F.when(cond, F.lit(1).cast("long")).otherwise(zero)

    def merge(a: Column, x: Column) -> Column:
        return F.struct(
            (a["n"] + 1).alias("n"),
            *[
                (a[f"l_{lang}"] + inc(x.isin(*markers))).alias(f"l_{lang}")
                for lang, markers in LANG_PROFILES.items()
            ],
            (a["stop"] + inc(x.isin(*STOPWORDS))).alias("stop"),
            (a["chars"] + F.length(x)).alias("chars"),
        )

    return F.aggregate(tokens(col), init, merge, finish)


def _quality_from(a: Column) -> Column:
    """quality formula over a signal accumulator: 0.4·min(n/100, 1)
    + 0.3·(1 − stopword_ratio) + 0.3·min(avg_len/8, 1), rounded."""
    n = a["n"]
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    stop_term = F.lit(1.0) - F.when(n > 0, a["stop"] / n).otherwise(F.lit(0.0))
    len_term = F.least(
        F.when(n > 0, a["chars"] / n).otherwise(F.lit(0.0)) / F.lit(8.0), F.lit(1.0)
    )
    return R(0.4 * length_term + 0.3 * stop_term + 0.3 * len_term, 6)


def _lang_from(a: Column) -> Column:
    """argmax language over a signal accumulator, ties broken by profile
    order (chained WHEN evaluates in order, so '>= every other' makes the
    first maximal language win), 'und' when no marker matches."""
    langs = list(LANG_PROFILES)
    best = None
    for lang in langs:
        cond = a[f"l_{lang}"] > 0
        for other in langs:
            if other != lang:
                cond = cond & (a[f"l_{lang}"] >= a[f"l_{other}"])
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise("und")


def quality_score(col: Column | str) -> Column:
    """Composite document-quality score in [0,1]:
    0.4·min(n_tokens/100, 1) + 0.3·(1 − stopword_ratio) + 0.3·min(avg_len/8, 1).
    Deterministic closed-form — the oracle reproduces it exactly.
    Single-pass fold (see _signal_fold)."""
    return _signal_fold(col, _quality_from)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-token hit count per language."""
    t = tokens(col)
    return {
        lang: F.size(F.filter(t, lambda x: x.isin(*markers)))
        for lang, markers in LANG_PROFILES.items()
    }


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of marker-token hits, ties broken by
    the fixed profile order, 'und' (undetermined) when no marker matches.
    Single-pass fold (see _signal_fold)."""
    return _signal_fold(col, _lang_from)


def pipeline_keep(
    col: Column | str, lang: str = "en", min_quality: float = 0.5
) -> Column:
    """The pipeline gate `lang_id(col) == lang AND quality_score(col) ≥
    min_quality` as ONE fold — language and quality share the accumulator,
    so the tokenizer and the signal fold each run exactly once per row
    (3× faster than composing the two predicates; identical semantics)."""
    return _signal_fold(
        col,
        lambda a: (_lang_from(a) == lang) & (_quality_from(a) >= min_quality),
    )


def word_ngrams(col: Column | str, n: int = 2) -> Column:
    """Word n-grams of a text column (array<string>); empty array for docs
    with fewer than n tokens. Pure higher-order functions — map-side.

    Token array let-bound (see let_bound): the window lambda previously
    captured the tokenize expression and re-ran it per gram position —
    the same O(tokens²) class fixed in dedup.shingles this round."""

    def _grams(t: Column) -> Column:
        cnt = F.size(t)
        grams = F.transform(
            F.sequence(F.lit(1), cnt - n + 1),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
        return F.when(cnt >= n, grams).otherwise(F.array().cast("array<string>"))

    return let_bound(tokens(col), _grams)


def ngram_novelty(
    docs: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> "DataFrame":
    """Corpus-order n-gram novelty per document: the fraction of a
    document's DISTINCT word n-grams whose first appearance (smallest
    id) in the corpus is this document. Returns (id, n_grams, novelty).

    The curation metric behind 'is new data still adding content':
    boilerplate-saturated or templated documents score near 0 (their
    grams all debuted earlier), genuinely novel text near 1 — the
    corpus-level diversity diagnostic that motivates dedup-before-train
    (Lee et al. 2021's memorization analysis) without needing a
    pairwise dedup pass. Ordering is by id (ingestion order in this
    corpus); any monotone ingestion key works.

    Scale shape: ONE distinct-gram explode (map-side), one gram-keyed
    groupBy computing min(id) with map-side partial aggregation, one
    keyed join back, one id-keyed count — every exchange is keyed and
    linear in total distinct-gram postings; no pair space exists at all.
    Documents with fewer than n tokens carry no n-grams and are
    excluded (mirror the same filter in any oracle)."""
    g = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("_tok"),
    )
    first = g.groupBy("_tok").agg(F.min(id_col).alias("_first"))
    from mesin_spark.functions import stable_round as R

    return (
        g.join(first.hint("shuffle_hash"), "_tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            R(
                F.avg((F.col("_first") == F.col(id_col)).cast("double")), 6
            ).alias("novelty"),
        )
    )


def dup_token_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    1 − distinct/total (0 for empty docs). The cheap Gopher-style
    repetition signal — heavily templated/boilerplate text scores high."""
    # let-bound: size + array_distinct shared one tokenize (was 2x per row)
    def _ratio(t: Column) -> Column:
        n = F.size(t)
        return F.when(n > 0, 1.0 - F.size(F.array_distinct(t)) / n).otherwise(
            F.lit(0.0)
        )

    return let_bound(tokens(col), _ratio)


def top_ngram_ratio(col: Column | str, n: int = 2) -> Column:
    """Fraction of the document's word n-grams taken by the single most
    frequent n-gram (0 when fewer than n tokens) — the Gopher 'top n-gram
    coverage' repetition signal. Map-side, no shuffle.

    Shape matters: the count of the most frequent gram equals the longest
    equal-run in the SORTED gram array, so this is one array_sort plus one
    fold tracking (prev, run, best) — O(g log g) per row. The obvious
    `transform(distinct, x -> count of x in g)` form nests the gram-array
    expression inside the lambda, re-evaluating it per distinct element —
    O(g²·tokens) per row, measured 38s vs <1s for the whole documents
    table at sf0.01."""
    def merge(a: Column, x: Column) -> Column:
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(a["best"], run).alias("best")
        )

    # gram array let-bound: size + the sort/fold shared one evaluation
    # already costs 2x the (formerly quadratic) gram build per row
    def _ratio(g: Column) -> Column:
        total = F.size(g)
        top = F.aggregate(
            F.array_sort(g),
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best"),
            ),
            merge,
            lambda a: a["best"],
        )
        return F.when(total > 0, top / total).otherwise(F.lit(0.0))

    return let_bound(word_ngrams(col, n), _ratio)


def repetition_signals(col: Column | str, round_to: int = 6) -> list[Column]:
    """Both repetition-quality columns, rounded for oracle comparison:
    (dup_token_ratio, top_bigram_ratio). Compose with a threshold filter
    for the classic 'drop the most repetitious x%' pipeline gate."""
    return [
        R(dup_token_ratio(col), round_to).alias("dup_token_ratio"),
        R(top_ngram_ratio(col, 2), round_to).alias("top_bigram_ratio"),
    ]


def tf_idf(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
):
    """Per-(doc, token) TF-IDF over a corpus: tf = in-doc term count,
    idf = ln((N+1)/(df+1)) + 1 (smooth). Two shuffles total — one keyed on
    (doc, token) for tf, one on token for document frequency — both with
    map-side partial aggregation; the doc count N broadcasts as a scalar
    subquery. Deterministic closed form, fully oracle-checkable.

    Returns (id_col, tok, tf, tfidf)."""
    from pyspark.sql import functions as F

    toks = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_t = toks.distinct().groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.countDistinct(id_col).alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    # No broadcast hint on df_t: the token document-frequency relation is
    # vocabulary-sized (10^8–10^9 rows at 100 TB), so forcing a broadcast
    # would OOM the driver. It's a plain tok-keyed equi-join — AQE picks
    # broadcast at runtime when df_t is actually small. The scalar `total`
    # (one row) stays an explicit broadcast.
    return (
        tf.join(df_t, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            "tok",
            "tf",
            R(F.col("tf") * idf, round_to).alias("tfidf"),
        )
    )


def bigram_lm_scores(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    round_to: int = 6,
):
    """Perplexity-proxy quality scoring with a bigram LM trained on the
    corpus itself: score(doc) = mean over its bigram instances of
    ln((c(w1,w2) + α) / (c(w1,·) + α·V)) — add-α smoothing, V = distinct
    unigram vocabulary. The standard cheap stand-in for a real LM quality
    filter; docs of templated/garbled text score far below fluent text
    *from the same distribution*.

    Train and score in one plan: bigram counts (one keyed shuffle with
    map-side partials), context counts derived from them (second small
    shuffle), V as a broadcast scalar, then a join back to the exploded
    bigram stream and a per-doc average. Everything is counts + one log —
    deterministic and oracle-exact. Docs with <2 tokens have no bigrams
    and drop out (inner-join semantics). Returns (id, n_bigrams, lm_score)."""
    from pyspark.sql import functions as F

    bi = docs.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), 2)).alias("bg"),
    ).select(
        id_col,
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = docs.select(
        F.explode(tokens(F.col(text_col))).alias("tok")
    ).agg(F.countDistinct("tok").alias("v"))
    logp = F.log((F.col("c12") + alpha) / (F.col("c1") + alpha * F.col("v")))
    return (
        bi.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            R(F.avg(logp), round_to).alias("lm_score"),
        )
    )


def fingerprint(col: Column | str) -> Column:
    """Rolling polynomial hash over the document's characters:
    h ← (h·131 + code(char)) mod 1_000_000_007 — a portable document
    fingerprint (same arithmetic is expressible in any engine, unlike
    engine-native hash functions)."""
    c = F.col(col) if isinstance(col, str) else col
    # filter zero-length splits: Spark's split('','') yields [''] with
    # ascii('')=0 while DuckDB's unicode('')=-1 — dropping empties makes
    # fp('') = 0 in BOTH engines (portability contract)
    codes = F.transform(
        F.filter(F.split(c, ""), lambda ch: F.length(ch) > 0),
        lambda ch: F.ascii(ch).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda h, code: (h * FINGERPRINT_BASE + code) % FINGERPRINT_MOD,
    )


def bm25_scores(
    docs: "DataFrame",
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 relevance of every document to a bag of query terms —
    the retrieval scorer behind lexical RAG recall. One tokenize-explode
    keyed on term (filtered to the query's terms BEFORE the shuffle, so
    the exchange moves only matching postings, not the corpus), df/N/
    avgdl from broadcastable side aggregates, then the closed-form
    score folds map-side. idf = ln((N - df + .5)/(df + .5) + 1) (the
    Lucene non-negative form). Deterministic IEEE arithmetic →
    oracle-checkable. Returns (id, score) for docs matching ≥1 term."""
    from pyspark.sql import DataFrame  # noqa: F401

    toks = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    dl = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("dl"))
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    q = [t.lower() for t in query_terms]
    tf = (
        toks.filter(F.col("tok").isin(q))
        .groupBy("_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    joined = (
        tf.join(F.broadcast(df_t), "tok")
        .join(dl, "_id")
        .crossJoin(F.broadcast(scalars))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    return joined.groupBy("_id").agg(F.sum(term_score).alias("score"))


def nfc_normalize(col: Column | str) -> Column:
    """Unicode NFC normalization — the canonical-composition pass every
    multilingual ingest needs before exact/near dedup (decomposed
    'e'+U+0301 and composed U+00E9 must hash identically or dup pairs
    silently split). Spark has NO JVM builtin for unicode normalization,
    so this is the module's one deliberate exception to the
    zero-Python-in-hot-path rule: an Arrow-batched pandas_udf over
    pandas' vectorized ``Series.str.normalize`` (C-implemented ICU-free
    NFC via unicodedata) — map-side, no shuffle, scales like any other
    projection with the usual Arrow batch-transfer overhead. NULLs pass
    through. Matches DuckDB's ``nfc_normalize`` exactly (both implement
    Unicode canonical composition)."""
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf cannot resolve 'pd.Series' against a local
    # import; the returnType + default SCALAR eval type carry the schema
    @pandas_udf("string")
    def _nfc(s):
        return s.str.normalize("NFC")

    return _nfc(F.col(col) if isinstance(col, str) else col)


def tfidf_pair_sims(
    docs: "DataFrame",  # noqa: F821
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.85,
    max_df: int | None = None,
) -> "DataFrame":  # noqa: F821
    """Pairwise TF-IDF cosine similarity via an inverted-index join —
    the SPARSE sibling of embedding_neardup_pairs, and the scalable
    text-similarity path when no dense embeddings exist: documents
    never meet all-pairs, only through shared terms (postings join on
    the term), so the join fan-out is Σ df(t)² over terms, not n².

    One pass builds (doc, term, tf); idf = ln(N/df) with the corpus
    size broadcast as a 1-row frame (no driver collect); per-doc norms
    fold BEFORE the pair join so the per-pair work is one
    multiply-accumulate. ``max_df`` drops terms above a document
    frequency ceiling — the standard bound at 100 TB: an
    every-document term has idf ≈ 0 and contributes nothing but its
    df² join cost. Returns (id_a, id_b, sim ≥ threshold), sim rounded
    to 6 dp BEFORE thresholding (cross-engine exactness discipline)."""
    toks = (
        docs.select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("tok"))
        .groupBy("_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    nd = toks.agg(F.countDistinct("_id").cast("double").alias("nd"))
    dfq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    if max_df is not None:
        dfq = dfq.filter(F.col("df") <= max_df)
    w = (
        toks.join(dfq, "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "_id", "tok", (F.col("tf") * F.log(F.col("nd") / F.col("df"))).alias("wt")
        )
    )
    nrm = w.groupBy("_id").agg(F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nr"))
    a = w.select(F.col("tok"), F.col("_id").alias("id_a"), F.col("wt").alias("wa"))
    b = w.select(F.col("tok"), F.col("_id").alias("id_b"), F.col("wt").alias("wb"))
    dots = (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dp"))
    )
    sim = R(
        F.col("dp")
        / (F.col("na") * F.col("nb")),
        6,
    )
    return (
        dots.join(nrm.select(F.col("_id").alias("id_a"), F.col("nr").alias("na")), "id_a")
        .join(nrm.select(F.col("_id").alias("id_b"), F.col("nr").alias("nb")), "id_b")
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
