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
