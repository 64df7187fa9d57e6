"""Text analysis operators on controlled inputs (the driver corpus is
same-vocabulary word soup, so language-id power needs real sentences)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_analytics_spark.operators import text


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "  aa bb  aa   cc ")], "doc_id long, text string")
    r = text.token_stats(df).collect()[0]
    assert (r.n_tokens, r.n_unique) == (4, 3)
    assert r.avg_token_len == 2.0


def test_quality_stats(spark):
    df = spark.createDataFrame([(1, "the cat, the hat!")], "doc_id long, text string")
    r = text.quality_stats(df).collect()[0]
    assert r.n_tokens == 4
    assert r.stopword_ratio == 0.5  # 'the' twice out of 4 tokens
    assert r.punct_ratio == 2 / 17


def test_language_id_real_sentences(spark):
    rows = [
        (1, "the cat is in the house and the dog is outside"),
        (2, "der hund ist nicht in das haus und die katze ist da"),
        (3, "le chat est dans la maison et les oiseaux sont dehors"),
        (4, "el gato es grande y los perros son pequeños"),
        (5, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.guessed_lang for r in text.language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "unknown"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "hello worlds")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fp for r in text.fingerprint(df).collect()}
    assert fp[1] == fp[2]  # case + whitespace normalized
    assert fp[1] != fp[3]


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], "doc_id long, text string")
    out = df.select("doc_id", text.word_shingles("text", 3).alias("sh")).collect()
    got = {r.doc_id: list(r.sh) for r in out}
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []  # fewer tokens than n


def test_tokens_strips_empties(spark):
    df = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    n = df.select(F.size(text.tokens("text")).alias("n")).collect()[0].n
    assert n == 0


def test_pack_sequences_straddle_and_partitions(spark):
    """Hand-checked concat-then-chunk: docs laid end-to-end per key, cut at
    max_len=10; doc C spans [7,22) and must fragment into packs 0/1/2 with
    3/10/2 tokens; zero-token docs vanish; a second key packs independently."""
    from zio_analytics_spark.operators.text import pack_sequences

    rows = [
        (1, "x", 4), (2, "x", 3), (3, "x", 15), (4, "x", 0), (5, "x", 3),
        (6, "y", 12),
    ]
    df = spark.createDataFrame(rows, "doc_id long, k string, n_tokens long")
    out = pack_sequences(df, max_len=10, order_by="doc_id", partition_by=("k",))
    got = {(r.k, r.doc_id, r.pack_id): r.n_frag_tokens for r in out.collect()}
    assert got == {
        ("x", 1, 0): 4,            # [0,4)
        ("x", 2, 0): 3,            # [4,7)
        ("x", 3, 0): 3, ("x", 3, 1): 10, ("x", 3, 2): 2,  # [7,22) straddles
        ("x", 5, 2): 3,            # [22,25)
        ("y", 6, 0): 10, ("y", 6, 1): 2,                  # own key, own packs
    }
    # conservation: fragments sum to doc token counts
    import collections
    per_doc = collections.Counter()
    for (k, d, p), n in got.items():
        per_doc[d] += n
    assert per_doc == {1: 4, 2: 3, 3: 15, 5: 3, 6: 12}


def test_bpe_token_stats_lexer(spark):
    """Punctuation/contractions count as their own tokens (tokenizer-budget
    units), unlike whitespace tokens."""
    from zio_analytics_spark.operators.text import bpe_token_stats

    df = spark.createDataFrame(
        [(1, "it's tokens-ish!"), (2, ""), (3, "abc abc 42")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_bpe_tokens, r.n_unique_bpe) for r in bpe_token_stats(df).collect()}
    # it | 's | tokens | - | ish | !  -> 6 tokens, all unique
    assert got[1] == (6, 6)
    assert got[2] == (0, 0)
    assert got[3] == (3, 2)  # abc abc 42


def test_char_shingles_and_linearity(spark):
    from zio_analytics_spark.operators.text import char_shingles

    df = spark.createDataFrame([(1, "abcdef"), (2, "abc"), (3, "ab")], "id long, t string")
    got = {r.id: r.sh for r in df.select("id", char_shingles("t", 4).alias("sh")).collect()}
    assert got[1] == ["abcd", "bcde", "cdef"]
    assert got[2] == []  # shorter than k
    assert got[3] == []
    # repeated grams dedupe by default, survive with distinct=False
    rep = spark.createDataFrame([(1, "ababab")], "id long, t string")
    d = rep.select(char_shingles("t", 2).alias("sh")).first().sh
    nd = rep.select(char_shingles("t", 2, distinct=False).alias("sh")).first().sh
    assert d == ["ab", "ba"] and len(nd) == 5
    # linear: source string bound once in the optimized plan
    plan = (
        df.select(char_shingles("t", 4).alias("sh"))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("t#") <= plan.count("lambda") + 4  # no per-gram re-inline blowup


def test_repetition_stats(spark):
    from zio_analytics_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),       # 3 bigrams, 1 distinct -> 2/3 dup
            (2, "all words here unique now"), # no repeats
            (3, "hi"),                        # too short for bigrams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.dup_2gram_frac, r.dup_3gram_frac) for r in repetition_stats(df).collect()}
    assert abs(got[1][0] - 2 / 3) < 1e-12 and abs(got[1][1] - 0.5) < 1e-12
    assert got[2] == (0.0, 0.0)
    assert got[3] == (None, None)


def test_unigram_logprob_orders_rarity(spark):
    from zio_analytics_spark.operators.text import unigram_logprob

    # 'common' appears 9x, 'rare' once: the rare-token doc must score higher
    df = spark.createDataFrame(
        [(i, "common common common") for i in range(3)] + [(9, "rare")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert out[9]["avg_neg_logprob"] > out[0]["avg_neg_logprob"]
    assert out[0]["n_tokens"] == 3 and out[9]["n_tokens"] == 1
    # identical docs score identically
    assert out[0]["avg_neg_logprob"] == out[1]["avg_neg_logprob"]
    # MLE check: p(common)=9/10, p(rare)=1/10
    import math

    assert abs(out[9]["avg_neg_logprob"] - (-math.log(0.1))) < 1e-6
    assert abs(out[0]["avg_neg_logprob"] - (-math.log(0.9))) < 1e-6


def test_token_budget_select_greedy_prefix(spark):
    from zio_analytics_spark.operators.text import token_budget_select

    df = spark.createDataFrame(
        [(i, "g", "w " * 10) for i in range(100)], "doc_id long, grp string, text string"
    )
    out = token_budget_select(df, budget=55, group_col="grp", text_col="text")
    rows = out.collect()
    # each doc is 10 tokens; budget 55 -> exactly 5 docs, no partials
    assert len(rows) == 5
    assert max(r["cum_tokens"] for r in rows) == 50
    # growth stability: doubling the corpus keeps the original winners
    # that still fit (hash order is content-determined, not positional)
    df2 = spark.createDataFrame(
        [(i, "g", "w " * 10) for i in range(200)], "doc_id long, grp string, text string"
    )
    kept1 = {r["doc_id"] for r in rows}
    kept2 = {r["doc_id"] for r in token_budget_select(df2, 55, "grp").collect()}
    # an original doc kept under the grown corpus (5 smallest hashes of
    # 200) was necessarily kept under the original (5 smallest of 100):
    # growth only ever evicts, never admits previously-rejected docs
    assert kept2 & set(range(100)) <= kept1


def test_tfidf_rare_term_wins(spark):
    from zio_analytics_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "common rare"),
            (2, "common common common"),
            (3, "common other other"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=1)
    top = {r["doc_id"]: r["tok"] for r in out.collect()}
    # doc 1 at equal tf: 'rare' (df=1, idf ln2+1) outranks 'common' (df=3, idf 1)
    assert top[1] == "rare"
    assert top[2] == "common"
    assert top[3] == "other"
    # exactly k rows per doc
    assert tfidf_top_terms(df, k=2).groupBy("doc_id").count().where("count > 2").count() == 0


def test_bigram_logprob_word_salad_scores_higher(spark):
    """Transition model property the unigram scorer cannot express: two
    documents with the SAME bag of words score differently when one has
    fluent (repeated) transitions and the other is shuffled word salad."""
    from zio_analytics_spark.operators.text import bigram_logprob

    fluent = "the cat sat on the mat " * 10
    salad = "mat the on sat cat the mat sat the on the cat " * 5
    df = spark.createDataFrame(
        [(1, fluent), (2, salad)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert out[1]["n_bigrams"] == 59 and out[2]["n_bigrams"] == 59
    assert out[2]["avg_neg_logprob"] > out[1]["avg_neg_logprob"]


def test_bigram_logprob_hand_computed(spark):
    """2-doc corpus small enough to compute the interpolated probability
    by hand: corpus = 'a b' and 'a b'; c(a)=c(b)=2, T=4, c(ab)=2.
    P(b|a) = 0.75*(2/2) + 0.25*(2/4) = 0.875 -> -ln(0.875)."""
    import math

    from zio_analytics_spark.operators.text import bigram_logprob

    df = spark.createDataFrame([(1, "a b"), (2, "a b")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    want = round(-math.log(0.875), 6)
    assert out[1]["n_bigrams"] == 1
    assert out[1]["avg_neg_logprob"] == want == out[2]["avg_neg_logprob"]


def test_bigram_logprob_short_docs_drop(spark):
    from zio_analytics_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "solo"), (2, "two tokens")], "doc_id long, text string"
    )
    out = {r["doc_id"] for r in bigram_logprob(df).collect()}
    assert out == {2}  # <2 tokens -> no transitions -> absent


def test_trigram_logprob_hand_computed(spark):
    """Corpus small enough to work every count by hand:
    docs 'a b c' ×2 and 'a b d'. T=9; c(a)=c(b)=3, c(c)=2, c(d)=1.
    Bigrams: c(ab)=3, c(bc)=2, c(bd)=1. Trigrams: c(abc)=2, c(abd)=1.
    Each doc has exactly ONE trigram (context ab, c_ctx=3):
      doc 1/2: P = 0.6*(2/3) + 0.3*(2/3) + 0.1*(2/9)
      doc 3:   P = 0.6*(1/3) + 0.3*(1/3) + 0.1*(1/9)."""
    import math

    from zio_analytics_spark.operators.text import trigram_logprob

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in trigram_logprob(df).collect()}
    p12 = 0.6 * (2 / 3) + 0.3 * (2 / 3) + 0.1 * (2 / 9)
    p3 = 0.6 * (1 / 3) + 0.3 * (1 / 3) + 0.1 * (1 / 9)
    assert out[1]["n_trigrams"] == 1
    assert out[1]["avg_neg_logprob"] == round(-math.log(p12), 6)
    assert out[2]["avg_neg_logprob"] == out[1]["avg_neg_logprob"]
    assert out[3]["avg_neg_logprob"] == round(-math.log(p3), 6)


def test_trigram_logprob_orders_fluency(spark):
    """The trigram score separates locally-fluent bigram chains from real
    phrases: both docs reuse the same BIGRAMS, but only one repeats full
    trigrams."""
    from zio_analytics_spark.operators.text import trigram_logprob

    phrases = "a b c a b c a b c a b c"
    chains = "a b c b c a c a b a b c"  # same bigram multiset flavor, mixed
    df = spark.createDataFrame(
        [(1, phrases), (2, chains)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in trigram_logprob(df).collect()}
    assert out[2]["avg_neg_logprob"] > out[1]["avg_neg_logprob"]


def test_trigram_logprob_short_docs_drop_and_validation(spark):
    import pytest

    from zio_analytics_spark.operators.text import trigram_logprob

    df = spark.createDataFrame(
        [(1, "one two"), (2, "one two three")], "doc_id long, text string"
    )
    assert {r["doc_id"] for r in trigram_logprob(df).collect()} == {2}
    with pytest.raises(ValueError, match="sum to 1"):
        trigram_logprob(df, lam3=0.5, lam2=0.3, lam1=0.1)


def test_kneser_ney_hand_computed(spark):
    """Corpus 'a b', 'a b', 'c b', 'a d' — every model quantity by hand:
    bigram types (a,b):2 (c,b):1 (a,d):1; c(a·)=3 N₁₊(a·)=2; c(c·)=1
    N₁₊(c·)=1; N₁₊(·b)=2 N₁₊(·d)=1; N₁₊(··)=3, D=0.75:
      P(b|a) = 1.25/3 + (0.75·2/3)·(2/3) = 0.75
      P(b|c) = 0.25/1 + (0.75·1/1)·(2/3) = 0.75
      P(d|a) = 0.25/3 + (0.75·2/3)·(1/3) = 0.25"""
    import math

    from zio_analytics_spark.operators.text import kneser_ney_logprob

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c b"), (4, "a d")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in kneser_ney_logprob(df).collect()}
    p_ab = max(2 - 0.75, 0.0) / 3 + (0.75 * 2 / 3) * (2 / 3)
    p_cb = max(1 - 0.75, 0.0) / 1 + (0.75 * 1 / 1) * (2 / 3)
    p_ad = max(1 - 0.75, 0.0) / 3 + (0.75 * 2 / 3) * (1 / 3)
    assert out[1]["avg_neg_logprob"] == round(-math.log(p_ab), 6)
    assert out[3]["avg_neg_logprob"] == round(-math.log(p_cb), 6)
    assert out[4]["avg_neg_logprob"] == round(-math.log(p_ad), 6)
    assert out[1]["n_bigrams"] == 1


def test_kneser_ney_continuation_beats_captive_frequency(spark):
    """The KN signature: 'francisco' is FREQUENT but follows only 'san';
    'lake' is rarer but follows many contexts. In a novel context, KN's
    continuation back-off must score the diverse word HIGHER than the
    captive one — the distinction a JM unigram back-off cannot make."""
    from zio_analytics_spark.operators.text import kneser_ney_logprob

    corpus = ["san francisco"] * 8 + ["blue lake", "cold lake", "deep lake"]
    # two probe docs: novel context 'the' followed by each word — appended
    # to the corpus so both probe bigrams exist exactly once
    docs = corpus + ["the francisco", "the lake"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["avg_neg_logprob"] for r in kneser_ney_logprob(df).collect()}
    i_fr, i_lk = len(docs) - 2, len(docs) - 1
    # same discounted count (1 each), same context 'the' — only the
    # continuation term differs: lake (3 predecessors incl 'the') beats
    # francisco (2) despite francisco's 8x unigram frequency
    assert out[i_lk] < out[i_fr]


def test_kneser_ney_validation_and_short_docs(spark):
    import pytest

    from zio_analytics_spark.operators.text import kneser_ney_logprob

    df = spark.createDataFrame(
        [(1, "solo"), (2, "two words")], "doc_id long, text string"
    )
    assert {r["doc_id"] for r in kneser_ney_logprob(df).collect()} == {2}
    for bad in (0.0, 1.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="discount"):
            kneser_ney_logprob(df, discount=bad)


def test_bm25_ranks_and_zero_excluded(spark):
    """Higher tf of a rare term scores higher; docs with no query term are
    absent; length normalization damps long documents."""
    from zio_analytics_spark.operators.text import bm25_scores

    df = spark.createDataFrame(
        [
            (1, "join join join filter"),
            (2, "join filter"),
            (3, "scan scan scan scan"),
            (4, "join " + "pad " * 50),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.bm25 for r in bm25_scores(df, ["join"]).collect()}
    assert 3 not in out                      # no query term -> excluded
    assert out[1] > out[2]                   # more tf -> higher
    assert out[2] > out[4]                   # same tf, longer doc -> damped


def test_readability_hand_computed(spark):
    from zio_analytics_spark.operators.text import readability

    # "the cat sat. it ran away!" -> 6 words, 2 sentences,
    # syllables: the=1 cat=1 sat=1 it=1 ran=1 away=2 (a, ay) -> 7
    df = spark.createDataFrame(
        [(1, "the cat sat. it ran away!"), (2, "   "), (3, "xyz")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in readability(df).collect()}
    assert 2 not in rows  # zero words dropped
    r1 = rows[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (6, 2, 7)
    expected = 206.835 - 1.015 * (6 / 2) - 84.6 * (7 / 6)
    assert abs(r1["flesch"] - expected) < 1e-3
    # no vowels: syllable floor of 1 per word, one sentence floor
    r3 = rows[3]
    assert (r3["n_words"], r3["n_sentences"], r3["n_syllables"]) == (1, 1, 1)


def test_readability_orders_simple_before_complex(spark):
    from zio_analytics_spark.operators.text import readability

    simple = "the dog ran. the cat sat. we go now."
    complex_ = "extraordinary bureaucratic installations necessitate comprehensive organizational responsibilities."
    df = spark.createDataFrame(
        [(1, simple), (2, complex_)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["flesch"] for r in readability(df).collect()}
    assert got[1] > 80 and got[2] < 10  # easy reads high, dense reads low


def test_char_entropy_hand_computed(spark):
    import math

    from zio_analytics_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert 4 not in got  # empty doc emits no row
    assert got[1]["entropy_bits"] == 0.0  # single symbol: zero entropy
    assert abs(got[2]["entropy_bits"] - 1.0) < 1e-9  # two equiprobable
    assert abs(got[3]["entropy_bits"] - 2.0) < 1e-9  # four equiprobable
    assert got[3]["n_chars"] == 4
    # skewed: p = (3/4, 1/4)
    df2 = spark.createDataFrame([(9, "aaab")], "doc_id long, text string")
    h = char_entropy(df2).collect()[0]["entropy_bits"]
    want = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert abs(h - want) < 1e-6


def test_char_entropy_separates_junk_from_language(spark):
    from zio_analytics_spark.operators.text import char_entropy

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs far away"),
        (2, "xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx"),
        (3, "aGVsbG8gd29ybGQhIHRoaXMgaXMgYmFzZTY0IG5vaXNlIDAxMjM0NTY3ODk="),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["entropy_bits"] for r in char_entropy(df).collect()}
    assert got[2] < 0.5          # repetitive junk
    assert 3.0 < got[1] < 4.8    # natural language band
    assert got[3] > got[1]       # base64 noise runs hotter
