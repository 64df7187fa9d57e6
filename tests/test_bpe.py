"""BPE merge training (operators/bpe.py): the Spark trainer must reproduce
a naive in-memory greedy BPE trainer exactly — argmax selection with
(count DESC, lhs, rhs) tiebreak AND greedy leftmost-non-overlapping merge
application, including the lhs == rhs overlap runs."""

from __future__ import annotations

import collections
import random
import re

import pytest

from zio_analytics_spark.operators.bpe import bpe_train


def _naive_bpe(texts: list[str], n_merges: int) -> list[tuple]:
    words: collections.Counter = collections.Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            words[w] += 1
    vocab = {w: list(w) for w in words}
    out = []
    for it in range(n_merges):
        cnt: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += words[w]
        if not cnt:
            break
        (l, r), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            vocab[w] = merged
        total = sum(words[w] * len(s) for w, s in vocab.items())
        out.append((it, l, r, c, total))
    return out


def test_bpe_train_matches_naive_on_overlap_runs(spark):
    """Deliberate lhs == rhs overlap coverage: odd/even runs of the same
    character must merge greedily (floor(run/2) sites, leftmost-first)."""
    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "aaaa aaa aa banana bananas",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=6).collect()]
    assert got == _naive_bpe(texts, 6)


def test_bpe_train_randomized_equivalence(spark):
    """Randomized corpora over a 3-letter alphabet (maximizing overlap and
    tie pressure) must match the naive trainer for every merge."""
    rnd = random.Random(1234)
    for trial in range(3):
        texts = [
            " ".join(
                "".join(rnd.choice("aab") for _ in range(rnd.randint(1, 9)))
                for _ in range(rnd.randint(3, 25))
            )
            for _ in range(12)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = [tuple(r) for r in bpe_train(df, n_merges=5).collect()]
        assert got == _naive_bpe(texts, 5), (trial, texts[:2])


def test_bpe_train_single_char_vocab_stops_early(spark):
    """A vocabulary of single-symbol words has no pairs: the trainer
    returns an empty merge table instead of failing."""
    df = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    assert bpe_train(df, n_merges=3).count() == 0


def test_bpe_arbitrary_alphabet_apostrophes(spark):
    """The merge expression binds symbols as literals (Column API, no SQL
    interpolation), so alphabets with apostrophes/quotes train correctly —
    verified against the naive trainer with a [a-z']+ pre-tokenizer."""
    texts = ["don't don't can't won't", "it's don't o'clock 'tis", "a'a'a'a a'a'a"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        tuple(r)
        for r in bpe_train(df, n_merges=5, word_pattern="[a-z']+").collect()
    ]

    words = collections.Counter()
    for t in texts:
        for w in re.findall("[a-z']+", t.lower()):
            words[w] += 1
    vocab = {w: list(w) for w in words}
    expected = []
    for it in range(5):
        cnt = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += words[w]
        if not cnt:
            break
        (l, r), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            vocab[w] = merged
        total = sum(words[w] * len(s) for w, s in vocab.items())
        expected.append((it, l, r, c, total))
    assert got == expected
    assert any("'" in lhs or "'" in rhs for _, lhs, rhs, _, _ in got)


def test_bpe_segment_matches_naive_application(spark):
    """Per-document subword counts must equal naively training then
    segmenting each document's words with the learned merges."""
    texts = ["low lower lowest", "new newest low low", "aaaa banana"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from zio_analytics_spark.operators.bpe import bpe_segment

    got = {r.doc_id: (r.n_words, r.n_tokens) for r in bpe_segment(df, n_merges=4).collect()}

    # naive: train on full corpus, then segment each doc
    words = collections.Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            words[w] += 1
    vocab = {w: list(w) for w in words}
    for _ in range(4):
        cnt = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += words[w]
        if not cnt:
            break
        (l, r), _c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            vocab[w] = merged
    expected = {}
    for d, t in enumerate(texts):
        ws = re.findall("[a-z]+", t.lower())
        expected[d] = (len(ws), sum(len(vocab[w]) for w in ws))
    assert got == expected


def _naive_batched_bpe(texts: list[str], n_merges: int, batch: int) -> list[tuple]:
    """In-memory replay of the batched contract: static rounds, greedy
    compatible selection over the full ordered pair list, batch applied in
    selection order, one total per round."""
    from zio_analytics_spark.operators.bpe import _batch_compatible

    words: collections.Counter = collections.Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            words[w] += 1
    vocab = {w: list(w) for w in words}

    def apply_merge(l, r):
        for w, syms in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            vocab[w] = merged

    out = []
    n_rounds = -(-n_merges // batch)
    for rnd in range(n_rounds):
        target = min(batch, n_merges - rnd * batch)
        cnt: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += words[w]
        ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        used, concats, acc = set(), set(), []
        for (l, r), c in ordered:
            if _batch_compatible(l, r, used, concats):
                acc.append((l, r, c))
                used.update((l, r))
                concats.add(l + r)
                if len(acc) == target:
                    break
        if not acc:
            break
        for l, r, _c in acc:
            apply_merge(l, r)
        total = sum(words[w] * len(s) for w, s in vocab.items())
        for slot, (l, r, c) in enumerate(acc):
            out.append((rnd, slot, l, r, c, total))
    return out


def test_bpe_train_batched_matches_naive_replay(spark):
    """The Spark batched trainer must equal the in-memory replay of the
    batched contract — selection, compatibility filtering, application,
    and per-round totals — on corpora with heavy overlap pressure."""
    from zio_analytics_spark.operators.bpe import bpe_train_batched

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "aaaa aaa aa banana bananas",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for batch in (2, 3):
        got = [tuple(r) for r in bpe_train_batched(df, n_merges=6, batch=batch).collect()]
        assert got == _naive_batched_bpe(texts, 6, batch), batch


def test_bpe_train_batched_batch1_equals_sequential(spark):
    """batch=1 degenerates to the classic argmax: same merges, counts, and
    totals as bpe_train, with round == iter and slot == 0."""
    from zio_analytics_spark.operators.bpe import bpe_train_batched

    texts = ["low low low lower lowest", "new newer newest low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    seq = [tuple(r) for r in bpe_train(df, n_merges=5).collect()]
    bat = [tuple(r) for r in bpe_train_batched(df, n_merges=5, batch=1).collect()]
    assert [(r, s) for r, s, *_ in bat] == [(i, 0) for i in range(len(seq))]
    assert [(l, rh, c, t) for _r, _s, l, rh, c, t in bat] == [
        (l, rh, c, t) for _i, l, rh, c, t in seq
    ]


def test_bpe_batch_compatibility_predicate():
    """Unit coverage of the commutation conditions."""
    from zio_analytics_spark.operators.bpe import _batch_compatible

    # disjoint symbols, distinct concats: compatible
    assert _batch_compatible("c", "d", {"a", "b"}, {"ab"})
    # shares a symbol with the batch
    assert not _batch_compatible("b", "c", {"a", "b"}, {"ab"})
    # consumes a symbol an earlier merge creates
    assert not _batch_compatible("ab", "c", {"a", "b"}, {"ab"})
    # creates a symbol an earlier pair consumes
    assert not _batch_compatible("a", "b", {"ab", "x"}, {"abx"})
    # same concat from site-disjoint pairs is allowed
    assert _batch_compatible("a", "bc", {"ab", "c"}, {"abc"})


def test_bpe_segment_releases_cache(spark):
    """Round-7 advice fix: bpe_segment materializes its vocab dimension to a
    scratch parquet and unpersists the training cache — repeated calls in a
    long session must not accumulate cached tables."""
    from zio_analytics_spark.operators.bpe import bpe_segment

    df = spark.createDataFrame(
        [(0, "low lower lowest"), (1, "new newest low")], "doc_id long, text string"
    )
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    first = {tuple(r) for r in bpe_segment(df, n_merges=3).collect()}
    second = {tuple(r) for r in bpe_segment(df, n_merges=3).collect()}
    assert first == second
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after <= before, (before, after)


def test_bpe_tokenize_matches_naive(spark):
    """Token sequences (not just counts) must equal training + greedy
    segmentation per document, in word order."""
    from zio_analytics_spark.operators.bpe import bpe_tokenize

    texts = ["low lower lowest", "new newest low low", "aaaa banana"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (list(r.tokens), r.n_tokens)
        for r in bpe_tokenize(df, n_merges=4).collect()
    }

    words = collections.Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            words[w] += 1
    vocab = {w: list(w) for w in words}
    for _ in range(4):
        cnt = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += words[w]
        if not cnt:
            break
        (l, r), _c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            vocab[w] = merged
    expected = {}
    for d, t in enumerate(texts):
        ws = re.findall("[a-z]+", t.lower())
        toks = [s for w in ws for s in vocab[w]]
        expected[d] = (toks, len(toks))
    assert got == expected


def test_bpe_train_batched_randomized_equivalence(spark):
    """Randomized overlap-heavy corpora: the Spark batched trainer must
    equal the in-memory batched replay for every (corpus, batch) tried —
    the selection filter, application order, and totals all pinned."""
    rnd = random.Random(777)
    for trial in range(2):
        texts = [
            " ".join(
                "".join(rnd.choice("aabc") for _ in range(rnd.randint(1, 8)))
                for _ in range(rnd.randint(3, 20))
            )
            for _ in range(10)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        from zio_analytics_spark.operators.bpe import bpe_train_batched

        for batch in (2, 4):
            got = [
                tuple(r)
                for r in bpe_train_batched(df, n_merges=6, batch=batch).collect()
            ]
            assert got == _naive_batched_bpe(texts, 6, batch), (trial, batch)


# ---------------------------------------------------------------------
# byte-level BPE (round-10 verdict ask #3 — the GPT-2 lineage)
# ---------------------------------------------------------------------

def _naive_byte_bpe(texts, n_merges):
    """Sequential reference: GPT-2-style pre-tokenize (the documented
    no-lookahead variant), byte→unicode map, classic argmax merge loop."""
    import collections
    import re

    from zio_analytics_spark.operators.bpe import byte_to_unicode

    b2u = byte_to_unicode()
    # Python-re equivalent of BYTE_PRETOKEN_PATTERN for latin test data
    pat = re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+"
        r"| ?[^ \t\n\r\f\x0b\w]+|[ \t\n\r\f\x0b]+"
    )
    def words(t):
        return ["".join(b2u[b] for b in w.encode("utf-8")) for w in pat.findall(t)]

    vocab = collections.Counter()
    for t in texts:
        vocab.update(words(t))
    vocab = {w: (f, list(w)) for w, f in vocab.items()}
    merges = []
    for it in range(n_merges):
        pairs = collections.Counter()
        for _w, (f, syms) in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, (f, syms) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (f, out)
        total = sum(f * len(s) for f, s in vocab.values())
        merges.append((it, l, r, cnt, total))
    return merges


def test_byte_train_matches_naive(spark):
    from zio_analytics_spark.operators.bpe import bpe_train_bytes

    texts = [
        "the cat sat on the mat",
        "The theme of the thesis",
        "cats don't chat, that's that",
        "café society — the café crowd",   # multi-byte UTF-8 chars
        "  double  spaced  text",           # whitespace-run pre-tokens
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train_bytes(df, n_merges=6).collect()]
    assert got == _naive_byte_bpe(texts, 6)


def test_byte_to_unicode_bijection():
    from zio_analytics_spark.operators.bpe import byte_to_unicode

    m = byte_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    assert m[ord("A")] == "A" and m[ord("~")] == "~" and m[0xFF] == "ÿ"
    assert m[0x20] == "Ġ" and m[0x0A] == "Ċ"  # space / newline classics
    # every mapped char is a single printable codepoint
    assert all(len(u) == 1 and ord(u) >= 33 for u in m.values())


def test_byte_tokenize_open_vocab_no_unk(spark):
    """The property the byte alphabet buys: serving a corpus DISJOINT
    from training drops nothing — unseen words segment to byte symbols,
    and rejoining the tokens reproduces the byte-mapped input exactly."""
    from zio_analytics_spark.operators.bpe import (
        bpe_model_bytes,
        bpe_tokenize_bytes,
        byte_to_unicode,
    )

    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the mat that")], "doc_id long, text string"
    )
    merges, _seg = bpe_model_bytes(train, n_merges=3)
    serve_text = "zebra quixotic naïve — 日本語!"
    serve = spark.createDataFrame([(9, serve_text)], "doc_id long, text string")
    rows = bpe_tokenize_bytes(
        serve, [{"lhs": l, "rhs": r} for _i, l, r, _c, _t in merges]
    ).collect()
    b2u = byte_to_unicode()
    expect = "".join(b2u[b] for b in serve_text.encode("utf-8"))
    assert "".join(rows[0]["tokens"]) == expect  # lossless, no [UNK]
    assert rows[0]["n_tokens"] == len(rows[0]["tokens"])


def test_byte_pretokenizer_shape(spark):
    """Pre-tokens carry their leading space ('Ġhello'); contractions
    split; case is preserved; the documented no-lookahead deviation on
    double spaces holds (run lexes before the word)."""
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.bpe import BYTE_PRETOKEN_PATTERN

    df = spark.createDataFrame(
        [("He isn't Here  now",)], "text string"
    )
    toks = df.select(
        F.regexp_extract_all("text", F.lit(BYTE_PRETOKEN_PATTERN), 0).alias("t")
    ).collect()[0]["t"]
    assert toks == ["He", " isn", "'t", " Here", "  ", "now"]
