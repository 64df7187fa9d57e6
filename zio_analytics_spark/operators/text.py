"""[EXT] Text analysis operators for LLM-data pipelines (SURVEY.md §2.4 tail).

Everything here is built from JVM-side Column expressions (split / transform /
aggregate / regexp) so the hot path stays inside whole-stage codegen — no
Python per row. These run over the ``documents`` table but are
schema-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_stats",
    "bpe_token_stats",
    "BPE_TOKEN_PATTERN",
    "quality_stats",
    "readability",
    "char_entropy",
    "repetition_stats",
    "language_id",
    "fingerprint",
    "bigram_logprob",
    "trigram_logprob",
    "kneser_ney_logprob",
    "bm25_scores",
    "word_shingles",
    "char_shingles",
    "pack_sequences",
    "DEFAULT_STOPWORDS",
]

# A tiny language-marker table used by the heuristic language id. Real
# pipelines would plug a model here; the operator contract (detect per row,
# JVM-side scoring) is what matters.
DEFAULT_STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "dans"),
    "es": ("el", "la", "los", "y", "es", "en"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty tokens removed)."""
    c = F.col(text) if isinstance(text, str) else text
    arr = F.split(F.trim(c), r"\s+")
    return F.filter(arr, lambda x: x != F.lit(""))


#: GPT-2-flavored lexer: contraction suffix | letter run | digit run |
#: punctuation run. Deliberately restricted to constructs Java regex and
#: RE2 interpret identically (no \p classes, no lookaround) so the same
#: pattern is cross-engine-reproducible.
BPE_TOKEN_PATTERN = r"'[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-style token counting: a GPT-2-flavored regex lexer instead of
    whitespace splitting — punctuation and contractions count as their own
    tokens, the unit real tokenizer budgets are measured in.
    ``regexp_extract_all`` keeps it JVM-side/codegen like every other text
    op here."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), 0)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_bpe"),
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counting: total, unique, average token length."""
    w = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_unique"),
        F.try_divide(
            F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")),
            F.size(w),
        ).alias("avg_token_len"),  # NULL (not an ANSI error) for token-less docs
    )


def quality_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Per-document quality signals: length, stopword ratio, punctuation ratio.

    Classic pre-training quality filters (length/punct/stopword heuristics);
    all Column expressions, no UDF.
    """
    w = tokens(text_col)
    text = F.col(text_col)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    return df.select(
        F.col(id_col),
        F.length(text).cast("long").alias("n_chars"),
        F.size(w).cast("long").alias("n_tokens"),
        F.try_divide(n_stop, F.size(w)).alias("stopword_ratio"),
        F.try_divide(n_punct, F.length(text)).alias("punct_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language id: marker-word hit counts per language, argmax.

    N-gram-profile lite: good enough to route documents; swap the marker
    table for trained profiles without touching the plan shape.
    """
    w = tokens(text_col)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(F.struct(F.size(F.filter(w, lambda x: F.array_contains(arr, x))).alias("hits"), F.lit(lang).alias("lang")))
    # array_max on struct(hits, lang): max by hits, ties by lang string (desc
    # order picks the largest struct; lang is the deterministic tiebreak).
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("unknown")).alias("guessed_lang"),
        best.getField("hits").cast("long").alias("marker_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 of normalized text.

    Normalization = trim + lowercase + whitespace collapse; the digest is the
    dedup/content-addressing key.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/MassiveText-style repetition signals: the fraction of word
    2-grams and 3-grams that are duplicates of an earlier occurrence
    (``1 - distinct/total``). Machine-generated and boilerplate-heavy
    documents repeat phrases; these ratios are the standard quality filter
    for that. NULL for documents too short to have the n-gram at all.
    Pure Column expressions over the linear shingle builder."""
    out = [F.col(id_col)]
    for n in (2, 3):
        grams = word_shingles(text_col, n, distinct=False)
        frac = 1.0 - F.try_divide(F.size(F.array_distinct(grams)), F.size(grams))
        out.append(frac.alias(f"dup_{n}gram_frac"))
    return df.select(*out)


def char_shingles(text: Column | str, k: int = 5, distinct: bool = True) -> Column:
    """Character ``k``-gram shingles → array<string> — the shingling unit
    for text without whitespace segmentation (CJK, URLs, code), where
    ``word_shingles`` degenerates. Linear like its word twin: the source
    string binds once as the lambda variable, each gram is one substring.
    Texts shorter than ``k`` characters yield an empty array.
    """
    c = F.col(text) if isinstance(text, str) else text

    def build(s: Column) -> Column:
        idx = F.sequence(F.lit(1), F.length(s) - k + 1)
        grams = F.transform(idx, lambda i: s.substr(i, F.lit(k)))
        out = F.array_distinct(grams) if distinct else grams
        return F.when(F.length(s) >= k, out).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(c), build), 1)


def pack_sequences(
    df: DataFrame,
    max_len: int,
    order_by: str = "doc_id",
    partition_by: tuple[str, ...] = (),
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence packing (concat-then-chunk): documents are laid
    end-to-end in a deterministic order and cut into training sequences of
    ``max_len`` tokens; a document whose token span straddles a boundary
    contributes a fragment to each pack it touches — exactly the standard
    pre-training packing scheme (no padding waste, documents may split).

    One window cumsum + pure arithmetic, all JVM-side: a doc's span is
    ``[cum-n, cum)``; it touches packs ``floor((cum-n)/L) ..
    floor((cum-1)/L)`` and contributes ``min(cum, (p+1)·L) - max(cum-n,
    p·L)`` tokens to pack ``p``. With ``partition_by`` (e.g. language or a
    hash bucket) packing runs per key and fully parallel — the keyless form
    is a total order and inherits that scan's serialization, like any
    global sort.

    Output: input columns + ``pack_id`` (long) + ``n_frag_tokens`` (long),
    one row per (doc, touched pack); zero-token docs contribute nothing.
    """
    from pyspark.sql import Window as W

    L = F.lit(int(max_len))
    w = (W.partitionBy(*partition_by) if partition_by else W.partitionBy()).orderBy(
        order_by, id_col
    )
    cum = F.sum(n_tokens_col).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = (
        df.where(F.col(n_tokens_col) > 0)
        .withColumn("__end", cum)
        .withColumn("__start", F.col("__end") - F.col(n_tokens_col))
        .withColumn(
            "pack_id",
            F.explode(
                F.sequence(
                    F.floor(F.col("__start") / L), F.floor((F.col("__end") - 1) / L)
                )
            ),
        )
        .withColumn(
            "n_frag_tokens",
            F.least(F.col("__end"), (F.col("pack_id") + 1) * L)
            - F.greatest(F.col("__start"), F.col("pack_id") * L),
        )
    )
    return out.drop("__start", "__end")


def word_shingles(text: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """Distinct word n-gram shingles → array<string> (the MinHash/Jaccard unit).

    ``distinct=False`` skips the string-level ``array_distinct`` — pass it
    when the caller deduplicates AFTER hashing the shingles to longs
    (array_distinct over long arrays is much cheaper than over string
    arrays; measured ~45% of the whole shingle-build cost at sf0.1), as
    every dedup-tier consumer here does.

    Pure Column expression, LINEAR in document length: the token array is
    bound ONCE per row as a higher-order-function lambda variable (wrap it in
    a one-element array, ``transform`` over that), so every ``element_at``
    inside the shingle lambda is an O(1) access into the already-materialized
    array. The naive formulation — referencing the ``tokens(...)`` expression
    tree directly inside the per-shingle lambda — re-runs the whole regex
    tokenization for each of the L shingles (O(L²) per document: measured
    23.2 s vs 5.1 s to shingle 5k docs at sf0.1), which at web-document
    lengths is catastrophic regardless of cluster size.

    Documents with fewer than ``n`` tokens yield an empty array.
    """

    def build(w: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(w) - n)
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
        )
        out = F.array_distinct(grams) if distinct else grams
        return F.when(F.size(w) >= n, out).otherwise(F.array().cast("array<string>"))

    # transform([tokens], w -> build(w))[1]: binds the token array to the
    # lambda variable w, evaluated exactly once per row.
    return F.element_at(F.transform(F.array(tokens(text)), build), 1)


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document average negative log-probability under the corpus's OWN
    unigram language model — the classic cheap perplexity proxy for quality
    filtering (cf. CCNet/Wenzek et al.: filter by LM score; here the LM is
    the unigram MLE of the corpus itself, so no external model is needed).

    Low score = common words (boilerplate-ish); high score = rare-token
    soup (OCR noise, gibberish). Both tails are the usual cut candidates.

    Plan: one token scan builds the vocabulary (token → count), a second
    token scan joins each occurrence to its count and averages per doc.
    The vocabulary is tiny relative to the corpus (Heaps' law), so it
    BROADCASTS by default and the scoring pass is shuffle-free on the
    corpus side — also the skew escape: a shuffle join on the token key
    would put every 'the' occurrence in one task (Zipf). Set
    ``broadcast_vocab=False`` only when the vocab exceeds broadcast limits
    (then AQE's skew-join split handles the hot keys).

    Returns ``(id_col, n_tokens, avg_neg_logprob)`` with the score rounded
    to 6 dp (cross-engine float discipline — see catalog conventions).
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("__cnt"))
    total = vocab.agg(F.sum("__cnt").alias("__tot"))
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "tok", (-F.log(F.col("__cnt") / F.col("__tot"))).alias("__nlp")
    )
    if broadcast_vocab:
        scored = F.broadcast(scored)
    return (
        toks.join(scored, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("__nlp"), 6).alias("avg_neg_logprob"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document average negative log-probability under a Jelinek–Mercer
    interpolated BIGRAM model of the corpus itself — the next rung above
    :func:`unigram_logprob` on the cheap-perplexity ladder (CCNet-style
    LM quality filtering without an external model):

        P(wᵢ | wᵢ₋₁) = λ · c(wᵢ₋₁wᵢ)/c(wᵢ₋₁) + (1−λ) · c(wᵢ)/T

    Word-salad documents score high (fluent transitions are rare even when
    individual words are common — which the unigram score cannot see);
    boilerplate scores low on both.

    Plan: one positional token scan (posexplode), transitions via ``lag``
    over a per-document window (one shuffle on ``id_col``, linear); the
    unigram and bigram tables are vocabulary-sized (Heaps' law) and
    BROADCAST by default, so corpus-side scoring is shuffle-free — the
    same Zipf-skew escape as the unigram scorer ('the the' would otherwise
    hot-key a token-keyed shuffle join). Documents with < 2 tokens have no
    transitions and drop out (same convention as the oracle).

    Returns ``(id_col, n_bigrams, avg_neg_logprob)`` rounded to 6 dp.
    """
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    w = W.partitionBy(id_col).orderBy("pos")
    pairs = toks.select(
        id_col, "tok", F.lag("tok").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("c1"))
    total = uni.agg(F.sum("c1").alias("t"))
    bi = pairs.groupBy("prev", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("c2")
    )
    u_prev = uni.select(F.col("tok").alias("prev"), F.col("c1").alias("c1_prev"))
    u_tok = uni.select("tok", F.col("c1").alias("c1_tok"))
    if broadcast_vocab:
        bi, u_prev, u_tok = F.broadcast(bi), F.broadcast(u_prev), F.broadcast(u_tok)
    p = F.lit(lam) * (F.col("c2") / F.col("c1_prev")) + F.lit(1.0 - lam) * (
        F.col("c1_tok") / F.col("t")
    )
    return (
        pairs.join(bi, ["prev", "tok"])
        .join(u_prev, "prev")
        .join(u_tok, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("avg_neg_logprob"),
        )
    )


def trigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam3: float = 0.6,
    lam2: float = 0.3,
    lam1: float = 0.1,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document average negative log-probability under a Jelinek–Mercer
    interpolated TRIGRAM model of the corpus itself — rung three of the
    cheap-perplexity quality ladder after :func:`unigram_logprob` and
    :func:`bigram_logprob`:

        P(wᵢ | wᵢ₋₂wᵢ₋₁) = λ₃·c(wᵢ₋₂wᵢ₋₁wᵢ)/c(wᵢ₋₂wᵢ₋₁)
                         + λ₂·c(wᵢ₋₁wᵢ)/c(wᵢ₋₁) + λ₁·c(wᵢ)/T

    (the classic JM back-off mixture; every trigram scored HAS counts in
    all three tables because the model is the corpus's own MLE, so no
    zero-probability guard is needed). The extra order separates locally
    fluent bigram chains that never form real phrases — the next thing a
    quality filter misses after word salad.

    Plan: one positional token scan, transitions via TWO lag windows over
    the same (id, pos) sort — Catalyst computes both lags in ONE Window
    node, so the trigram model costs the same single shuffle as the
    bigram one; the trigram/bigram/unigram count tables are all
    vocabulary-sized (Heaps' law) and BROADCAST by default (the Zipf-skew
    escape). Documents with < 3 tokens have no trigram and drop out.

    Returns ``(id_col, n_trigrams, avg_neg_logprob)`` rounded to 6 dp.
    λ₁ is an explicit parameter (not ``1−λ₃−λ₂``, whose IEEE value differs
    from the literal 0.1 the SQL oracle writes); the three must sum to 1.
    """
    if abs(lam3 + lam2 + lam1 - 1.0) > 1e-9:
        raise ValueError(f"lambdas must sum to 1, got {lam3}+{lam2}+{lam1}")
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    w = W.partitionBy(id_col).orderBy("pos")
    seq = toks.select(
        id_col,
        "tok",
        F.lag("tok", 1).over(w).alias("prev"),
        F.lag("tok", 2).over(w).alias("prev2"),
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("c1"))
    total = uni.agg(F.sum("c1").alias("t"))
    pairs = seq.where(F.col("prev").isNotNull())
    bi = pairs.groupBy("prev", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("c2")
    )
    triples = seq.where(F.col("prev2").isNotNull())
    tri = triples.groupBy("prev2", "prev", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("c3")
    )
    # context table: c(wᵢ₋₂wᵢ₋₁) IS the bigram table under renamed keys
    ctx = bi.select(
        F.col("prev").alias("prev2"), F.col("tok").alias("prev"),
        F.col("c2").alias("c_ctx"),
    )
    u_prev = uni.select(F.col("tok").alias("prev"), F.col("c1").alias("c1_prev"))
    u_tok = uni.select("tok", F.col("c1").alias("c1_tok"))
    if broadcast_vocab:
        tri, bi, ctx = F.broadcast(tri), F.broadcast(bi), F.broadcast(ctx)
        u_prev, u_tok = F.broadcast(u_prev), F.broadcast(u_tok)
    p = (
        F.lit(lam3) * (F.col("c3") / F.col("c_ctx"))
        + F.lit(lam2) * (F.col("c2") / F.col("c1_prev"))
        + F.lit(lam1) * (F.col("c1_tok") / F.col("t"))
    )
    return (
        triples.join(tri, ["prev2", "prev", "tok"])
        .join(ctx, ["prev2", "prev"])
        .join(bi, ["prev", "tok"])
        .join(u_prev, "prev")
        .join(u_tok, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("avg_neg_logprob"),
        )
    )


def kneser_ney_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document average negative log-probability under an INTERPOLATED
    KNESER–NEY bigram model of the corpus itself (Kneser & Ney 1995; the
    Chen & Goodman 1998 interpolated formulation — public algorithm) —
    the OTHER production smoothing family beside Jelinek–Mercer
    (:func:`bigram_logprob` / :func:`trigram_logprob`):

        P(w | w') = max(c(w'w) − D, 0)/c(w'·)
                  + [D · N₁₊(w'·)/c(w'·)] · N₁₊(·w)/N₁₊(··)

    where ``N₁₊(w'·)`` counts DISTINCT followers of w', ``N₁₊(·w)``
    distinct predecessors of w, and ``N₁₊(··)`` distinct bigram types.
    The continuation probability is KN's insight: back-off weight goes to
    words that appear in MANY contexts ('Francisco' is frequent but
    follows only 'San' — KN discounts it, JM cannot). Every scored
    transition has c(w'w) ≥ 1 (corpus-self model), so no zero guard is
    needed.

    All model tables derive from the bigram-TYPE table: c(w'·) is the sum
    of follower counts, the N₁₊ terms are row counts per prev / per tok /
    total — three vocabulary-sized aggregates over one table, BROADCAST
    into the scoring pass (the Zipf-skew escape, as in the JM scorers).
    One positional scan + lag window; documents with < 2 tokens drop out.

    Returns ``(id_col, n_bigrams, avg_neg_logprob)`` rounded to 6 dp.
    ``discount`` must sit in (0, 1); the classic 0.75 default is written
    as the same short literal in both engines.
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    w = W.partitionBy(id_col).orderBy("pos")
    pairs = toks.select(
        id_col, "tok", F.lag("tok").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    bi = pairs.groupBy("prev", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("c2")
    )
    ctx = bi.groupBy("prev").agg(
        F.sum("c2").alias("c_ctx"),
        F.count(F.lit(1)).cast("double").alias("n_follow"),
    )
    pred = bi.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("n_pred")
    )
    total = bi.agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    if broadcast_vocab:
        bi, ctx, pred = F.broadcast(bi), F.broadcast(ctx), F.broadcast(pred)
    d = F.lit(discount)
    p = (
        F.greatest(F.col("c2") - d, F.lit(0.0)) / F.col("c_ctx")
        + (d * F.col("n_follow") / F.col("c_ctx"))
        * (F.col("n_pred") / F.col("n_types"))
    )
    return (
        pairs.join(bi, ["prev", "tok"])
        .join(ctx, "prev")
        .join(pred, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("avg_neg_logprob"),
        )
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    group_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "budget",
) -> DataFrame:
    """Greedy token-budget dataset assembly: per ``group_col`` stratum,
    take documents in seeded content-hash order until the running token
    total exceeds ``budget`` — how a fixed-size training mix is cut from
    an oversized corpus with reproducible, growth-stable membership (the
    hash order never reshuffles when new docs arrive; new docs slot in and
    can only push out docs hashed after them, never reorder the kept
    prefix arbitrarily).

    One window pass per stratum (strata run in parallel; the sort is per
    group, never global). Keeps rows while the cumulative count INCLUDING
    the current doc is ≤ budget (no partial documents).

    Returns ``(id_col, group_col, n_tokens, cum_tokens)``.
    """
    order = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    w = (
        W.partitionBy(group_col)
        .orderBy(order, F.col(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    base = df.select(
        F.col(id_col),
        F.col(group_col),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
    )
    return base.withColumn("cum_tokens", F.sum("n_tokens").over(w)).where(
        F.col("cum_tokens") <= budget
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic keyword/feature
    extraction: ``score = tf · (ln((N+1)/(df+1)) + 1)`` (smoothed idf, the
    scikit-learn convention).

    Plan shape mirrors :func:`unigram_logprob`: term frequencies are one
    hash aggregate on (doc, token); document frequencies and the corpus
    size are small aggregates BROADCAST into the scoring join (never a
    shuffle on the Zipf-skewed token key); the per-doc top-k is a ranked
    window over (doc) — one exchange on the doc id. Ties break on the
    token string for determinism.

    Returns ``(id_col, tok, score)`` rows, ``k`` per document.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("__tf"))
    dfreq = toks.groupBy("tok").agg(F.count_distinct(F.col(id_col)).alias("__df"))
    nd = df.agg(F.count_distinct(F.col(id_col)).alias("__n"))
    idf = F.log((F.col("__n") + 1.0) / (F.col("__df") + 1.0)) + 1.0
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(nd))
        .select(F.col(id_col), "tok", (F.col("__tf") * idf).alias("score"))
    )
    w = W.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(F.col(id_col), "tok", "score")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 scores for a fixed query — the standard keyword-
    retrieval ranking (the idf·saturated-tf·length-normalized sum):

        score(d) = Σ_t ln(1 + (N − df_t + ½)/(df_t + ½))
                       · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·|d|/avgdl))

    Two tiny prior aggregates (corpus size + avgdl, and one df per query
    term — |terms| numbers of driver state) inline as literals into ONE
    codegen'd projection: per-doc tf via ``size(filter(tokens, ...))``,
    no explode, no shuffle on the corpus side at all. Terms the doc
    lacks contribute exactly 0 (tf = 0 zeroes the numerator), so the
    term loop needs no join. Returns ``(id_col, bm25)`` rounded 6 dp for
    docs matching at least one term.

    Sums of integer counts are exact in doubles (every partial sum is an
    integer < 2⁵³), so N/avgdl/df are bit-identical in any engine and
    the whole score replays exactly.
    """
    import math

    def _term_tf(term: str) -> Column:
        # factory closure: a 2-arg lambda in F.filter would receive the
        # ELEMENT INDEX as its second argument (the HOF arity contract),
        # silently shadowing a default-bound term
        return F.size(F.filter("__L", lambda x: x == F.lit(term)))

    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("__L"))
    st = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size("__L").cast("double")).alias("avgdl"),
        *[
            F.sum((_term_tf(t) > 0).cast("int")).alias(f"df_{i}")
            for i, t in enumerate(query_terms)
        ],
    ).first()
    n, avgdl = float(st["n"]), float(st["avgdl"])
    dl = F.size("__L").cast("double")
    score = None
    for i, t in enumerate(query_terms):
        dft = float(st[f"df_{i}"])
        idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
        tf = _term_tf(t).cast("double")
        term = F.lit(idf) * (
            tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / F.lit(avgdl)))
        )
        score = term if score is None else score + term
    out = base.select(F.col(id_col), F.round(score, 6).alias("bm25"))
    return out.where(F.col("bm25") > 0)


def readability(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 4,
) -> DataFrame:
    """Flesch Reading Ease (Flesch 1948 — the standard readability signal
    a curation pipeline filters on: too-easy text is often boilerplate/
    spam, too-hard text is often OCR garbage or code):

        206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    All codegen Column regex — no UDF: words are the shared whitespace
    tokenization (:func:`tokens`), sentences count ``[.!?]+`` terminator
    runs (min 1), syllables approximate as VOWEL-GROUP runs per word
    (``[aeiouy]+``, min 1 per word — the classic heuristic; a dictionary
    syllabifier plugs into the same per-word slot) summed by an
    ``aggregate`` HOF over the token array. Every count is an exact
    integer, so cross-engine agreement reduces to two double divisions.
    Rows with zero words are dropped (the score is undefined)."""
    w = tokens(text_col)
    text = F.col(text_col)
    n_words = F.size(w)
    n_sent = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), 0))
    )
    n_syll = F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda acc, word: acc
        + F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(F.lower(word), F.lit(r"[aeiouy]+"), 0)),
        ).cast("long"),
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    return (
        df.select(
            id_col,
            n_words.cast("long").alias("n_words"),
            n_sent.cast("long").alias("n_sentences"),
            n_syll.alias("n_syllables"),
            F.round(score, round_dp).alias("flesch"),
        )
        .where(F.col("n_words") > 0)
    )


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 6,
) -> DataFrame:
    """Character-level Shannon entropy per document (bits/char) — the
    curation signal the length/stopword heuristics miss: near-zero
    entropy flags repetitive junk (scraped padding, base-cases of
    template spam), abnormally HIGH entropy flags base64/binary noise
    dressed as text; natural language sits in a stable mid band. The
    cheap stand-in for a compression-ratio filter (gzip ratio ≈ entropy),
    with an exact SQL replay instead of a codec dependency.

    Shape: explode to (doc, char) → one shuffle groupBy for counts →
    per-doc ``−Σ (n/t)·log₂(n/t)``. Alphabet size bounds the post-
    aggregate grain (≤ distinct chars per doc). Documents with no
    characters emit no row. Rounded — the Σ over the alphabet merges in
    engine-specific order."""
    ch = df.select(
        id_col,
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit("."), 0)).alias("__c"),
    )
    cnt = ch.groupBy(id_col, "__c").agg(F.count(F.lit(1)).cast("double").alias("__n"))
    tot = cnt.groupBy(id_col).agg(F.sum("__n").alias("__t"))
    p = F.col("__n") / F.col("__t")
    return (
        cnt.join(tot, id_col)
        .groupBy(id_col, "__t")
        .agg(F.round(-F.sum(p * F.log2(p)), round_dp).alias("entropy_bits"))
        .select(
            id_col,
            F.col("__t").cast("long").alias("n_chars"),
            "entropy_bits",
        )
    )
