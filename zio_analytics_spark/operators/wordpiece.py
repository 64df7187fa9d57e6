"""[EXT] WordPiece TRAINING — the third production tokenizer family.

BPE (operators/bpe.py, Sennrich 2016) merges the most FREQUENT adjacent
pair; unigram-LM (operators/unigram.py, Kudo 2018) prunes a superset
vocabulary by EM likelihood; WordPiece (Schuster & Nakajima 2012, "Japanese
and Korean Voice Search"; the BERT-lineage tokenizer — public algorithm)
sits between them: BPE's bottom-up merge loop, but the pair chosen each
round maximizes the LIKELIHOOD GAIN of a unigram language model,

    score(a, b) = count(ab) / (count(a) · count(b)),

i.e. frequent pairs are discounted by how frequent their parts already are
— the merge that most increases Σ freq·log P(word) under the unigram model.
Continuation symbols carry the ``##`` prefix (the BERT convention): the
initial alphabet is {first char} ∪ {##c for word-internal chars}, and
merging ``a`` + ``##b`` yields ``a b`` spelled ``a##b``-stripped → ``ab``,
while ``##a`` + ``##b`` yields ``##ab``.

Scale design (identical shape to bpe.py, and the reason all three trainers
share it): ONE corpus scan builds the Zipf-bounded ``(word, freq, syms)``
vocab; per merge round, pair counts AND symbol unigram counts are two
map-side-combinable aggregates over that vocab; the score argmax brings
ONE row to the driver; merge application is the same pure-Column
stack-scan HOF (no UDF). Iteration cost is corpus-size-independent — at
100 TB the distinct-word table is still broadcast-scale.

Determinism contract (what makes the DuckDB oracle exact): the score is
``cnt::double / (lhs_cnt · rhs_cnt)`` — one IEEE-double division of exact
integers, computed by the same expression in both engines — with
``(score DESC, lhs, rhs)`` tiebreak; symbol-count products stay far below
2^53 at any tested SF, so the double is exact anyway.

Reference parity: the reference engine has no tokenizer surface
(DataStream.scala:40-56) — this module is [EXT] for the LLM-pipeline
north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zio_analytics_spark.operators.bpe import WORD_PATTERN, _words

__all__ = ["wordpiece_train", "wordpiece_segment", "wordpiece_tokenize"]


def _strip_cont(sym: str) -> str:
    return sym[2:] if sym.startswith("##") else sym


def _wp_vocab(df: DataFrame, text_col: str, word_pattern: str) -> DataFrame:
    """One corpus scan → (word, freq, syms) with the ``##`` alphabet:
    first char bare, every word-internal char ##-prefixed."""
    chars = F.regexp_extract_all(F.col("word"), F.lit("."), 0)
    syms = F.concat(
        F.slice(chars, 1, 1),
        F.transform(
            F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0))),
            lambda c: F.concat(F.lit("##"), c),
        ),
    )
    return (
        df.select(F.explode(_words(text_col, word_pattern)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", syms)
    )


def _merge_expr_wp(lhs: str, rhs: str):
    """One greedy WordPiece merge as a Column HOF — bpe._merge_expr with
    the ``##``-stripping concat rule. The greedy-leftmost argument holds
    unchanged: a just-merged stack top spells ``lhs + strip(rhs)`` which is
    strictly longer than ``lhs`` (a bare ``##`` is never a symbol), so it
    can never re-match as ``lhs`` — except when lhs == rhs, where the same
    even-offset-within-run resolution as BPE applies."""
    merged = lhs + _strip_cont(rhs)
    empty = F.array().cast("array<string>")

    def step(acc, x):
        mergeable = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (x == F.lit(rhs))
        )
        return F.when(
            mergeable,
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(F.col("syms"), empty, step)


def _wp_train_loop(vocab: DataFrame, n_merges: int) -> tuple[list, DataFrame]:
    """The merge-learning loop; returns (rows, FINAL persisted vocab —
    caller unpersists). Driver state per round: one 5-number row."""
    cur = vocab.persist()
    results = []
    for it in range(n_merges):
        pairs = (
            cur.select(
                "freq",
                F.explode(
                    F.expr(
                        "zip_with(slice(syms, 1, size(syms) - 1),"
                        "         slice(syms, 2, size(syms) - 1),"
                        "         (a, b) -> struct(a AS lhs, b AS rhs))"
                    )
                ).alias("p"),
            )
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("cnt"))
        )
        sym_counts = (
            cur.select("freq", F.explode("syms").alias("sym"))
            .groupBy("sym")
            .agg(F.sum("freq").alias("scnt"))
        )
        scored = (
            pairs.join(
                sym_counts.select(
                    F.col("sym").alias("lhs"), F.col("scnt").alias("lhs_cnt")
                ),
                "lhs",
            )
            .join(
                sym_counts.select(
                    F.col("sym").alias("rhs"), F.col("scnt").alias("rhs_cnt")
                ),
                "rhs",
            )
            .withColumn(
                "score",
                F.col("cnt").cast("double") / (F.col("lhs_cnt") * F.col("rhs_cnt")),
            )
        )
        top = scored.orderBy(F.desc("score"), "lhs", "rhs").limit(1).collect()
        if not top:  # all-single-symbol vocabulary
            break
        best = top[0]
        nxt = cur.withColumn("syms", _merge_expr_wp(best["lhs"], best["rhs"])).persist()
        total = nxt.agg(F.sum(F.col("freq") * F.size("syms")).alias("t")).collect()[0]["t"]
        results.append(
            (
                it,
                best["lhs"],
                best["rhs"],
                int(best["cnt"]),
                int(best["lhs_cnt"]),
                int(best["rhs_cnt"]),
                int(total),
            )
        )
        cur.unpersist()
        cur = nxt
    return results, cur


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 4,
    word_pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Learn the first ``n_merges`` WordPiece merges from a text column.

    Returns one row per round:
    ``(iter, lhs, rhs, pair_count, lhs_count, rhs_count, total_syms)`` —
    the chosen pair, its frequency-weighted adjacent-pair count, BOTH
    unigram symbol counts entering the score denominator (so the oracle
    pins the score's inputs exactly, not just the winner), and
    Σ freq·|syms| over the vocab AFTER the merge (pins the application
    step, like bpe_train)."""
    spark: SparkSession = df.sparkSession
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    vocab = _wp_vocab(df, text_col, word_pattern).select("freq", "syms")
    results, cur = _wp_train_loop(vocab, n_merges)
    cur.unpersist()
    return spark.createDataFrame(
        results,
        "iter int, lhs string, rhs string, pair_count bigint, "
        "lhs_count bigint, rhs_count bigint, total_syms bigint",
    )


def wordpiece_segment(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 4,
    word_pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Apply side: segment every document with the learned merges →
    ``(id, n_words, n_tokens)``. Same shape as bpe_segment: the trained
    segmentation is computed ONCE on the Zipf-bounded vocab, materialized
    as a word → piece-count dimension, and the corpus pass is one explode
    + broadcast join + per-doc sum — corpus cost is one scan regardless
    of merge count. (This is the merge-consistent segmentation the
    trainer defines; serving stacks usually apply longest-match over the
    final vocab, which coincides on merge-closed vocabularies —
    :func:`wordpiece_tokenize` exposes the pieces themselves, ``##``
    prefixes included.) Wordless documents are excluded (inner join)."""
    from zio_analytics_spark.tmpdirs import materialize_table

    vocab = _wp_vocab(df, text_col, word_pattern)
    _, seg = _wp_train_loop(vocab, n_merges)
    dim = materialize_table(
        seg.select("word", F.size("syms").alias("n_sub")), prefix="zas_wp_dim_"
    )
    seg.unpersist()
    words = df.select(
        F.col(id_col), F.explode(_words(text_col, word_pattern)).alias("word")
    )
    return (
        words.join(F.broadcast(dim), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_tokens"),
        )
    )


def wordpiece_tokenize(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 4,
    word_pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Serving surface: the actual ``##``-prefixed piece sequence per
    document — ``(id, tokens array<string>, n_tokens)``. One corpus pass:
    posexplode → broadcast word→pieces dimension → ordered reassembly
    (array_sort over (pos, syms) structs + flatten), exactly
    bpe_tokenize's plan shape."""
    from zio_analytics_spark.tmpdirs import materialize_table

    vocab = _wp_vocab(df, text_col, word_pattern)
    _, seg = _wp_train_loop(vocab, n_merges)
    dim = materialize_table(seg.select("word", "syms"), prefix="zas_wp_tok_")
    seg.unpersist()
    words = df.select(
        F.col(id_col),
        F.posexplode(_words(text_col, word_pattern)).alias("pos", "word"),
    )
    assembled = (
        words.join(F.broadcast(dim), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                    lambda s: s["syms"],
                )
            ).alias("tokens")
        )
    )
    return assembled.select(id_col, "tokens", F.size("tokens").alias("n_tokens"))
