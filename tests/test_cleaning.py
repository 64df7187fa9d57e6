"""Corpus cleaning & composition operators (operators/cleaning.py,
sketch.equi_depth_bins) — crafted fixtures for the semantics the oracle
entries exercise statistically."""

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.operators import cleaning
from zio_analytics_spark.operators.sketch import equi_depth_bins


def test_redact_pii_counts_and_replacement(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org and 10.1.2.3 then 555-123-4567"),
            (2, "no pii here"),
            (3, "two mails x@y.io z@w.co one ip 8.8.8.8"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in cleaning.redact_pii(df).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 1, 1)
    assert out[1]["redacted"] == "mail <EMAIL> and <IP> then <PHONE>"
    assert out[2]["redacted"] == "no pii here"
    assert (out[3]["n_email"], out[3]["n_ipv4"]) == (2, 1)


def test_redact_pii_email_wins_over_inner_ip(spark):
    # An IPv4-shaped substring inside an email's domain must be swallowed
    # by the email redaction, not split by a later IP pass (_PII_ORDER).
    df = spark.createDataFrame(
        [(1, "u@10.0.0.1.example.com plus bare 10.0.0.2")], "id long, text string"
    )
    r = cleaning.redact_pii(df).collect()[0]
    assert r["redacted"] == "<EMAIL> plus bare <IP>"
    # counts are on the ORIGINAL text: the inner IP is still counted
    assert r["n_ipv4"] == 2 and r["n_email"] == 1
    # an @host with a numeric TLD is NOT an email (alpha TLD required):
    # the embedded IP is what gets redacted instead
    df2 = spark.createDataFrame([(2, "u@10.0.0.1 raw")], "id long, text string")
    assert cleaning.redact_pii(df2).collect()[0]["redacted"] == "u@<IP> raw"


def test_normalize_text(spark):
    df = spark.createDataFrame([(1, "  Foo\t BAR \n baz  ")], "id long, text string")
    r = cleaning.normalize_text(df).collect()[0]
    assert r["norm"] == "foo bar baz"
    # idempotent: normalizing a normal form is the identity
    df2 = spark.createDataFrame([(1, r["norm"])], "id long, text string")
    assert cleaning.normalize_text(df2).collect()[0]["norm"] == r["norm"]


def test_mix_sources_nesting_and_determinism(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("src"),
    )
    half = cleaning.mix_sources(df, {"a": 0.5, "b": 0.5}, "src", ["doc_id"], seed="t")
    quarter = cleaning.mix_sources(df, {"a": 0.25, "b": 0.25}, "src", ["doc_id"], seed="t")
    h = {r["doc_id"] for r in half.collect()}
    q = {r["doc_id"] for r in quarter.collect()}
    assert q <= h  # lower-rate mix nests inside the higher-rate one
    assert 0.4 < len(h) / 2000 < 0.6 and 0.17 < len(q) / 2000 < 0.33
    # deterministic: rerun is identical
    assert {r["doc_id"] for r in half.collect()} == h
    # unknown strata fail closed (default_rate=0)
    none = cleaning.mix_sources(df, {"a": 0.5}, "src", ["doc_id"], seed="t")
    assert all(r["src"] == "a" for r in none.collect())


def test_mix_sources_rate_one_keeps_everything(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"), F.lit("a").alias("src"))
    assert cleaning.mix_sources(df, {"a": 1.0}, "src", ["doc_id"]).count() == 100


def test_equi_depth_bins_uniform(spark):
    df = spark.range(1600).select(F.col("id").alias("v"))
    rows = equi_depth_bins(df, "v", n_bins=16).collect()
    assert len(rows) == 16
    assert sum(r["n"] for r in rows) == 1600
    # unique uniform values → bins within interpolation slack of equal depth
    assert all(95 <= r["n"] <= 105 for r in rows)
    # bucket ranges are disjoint and ordered
    by_bucket = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a["hi"] < b["lo"]


def test_equi_depth_bins_ties_share_bucket(spark):
    # one dominant value: ties must never split across buckets
    df = spark.createDataFrame([(5,)] * 90 + [(1,), (9,)] * 5, "v int")
    rows = equi_depth_bins(df, "v", n_bins=4).collect()
    buckets_with_5 = [r for r in rows if r["lo"] <= 5 <= r["hi"]]
    assert len(buckets_with_5) == 1
    assert buckets_with_5[0]["n"] >= 90


def test_equi_depth_bins_rejects_single_bin(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        equi_depth_bins(df, "v", n_bins=1)


def test_remove_boilerplate_lines(spark):
    from zio_analytics_spark.operators.cleaning import remove_boilerplate_lines

    rows = [(i, "COOKIE BANNER\ncontent %d\nFOOTER" % i) for i in range(5)] + [
        (99, "COOKIE BANNER\nFOOTER")  # pure boilerplate -> empty, not dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["cleaned"] for r in
           remove_boilerplate_lines(df, max_df=3).collect()}
    assert out[0] == "content 0" and out[4] == "content 4"
    assert out[99] == ""
    assert len(out) == 6  # nothing vanishes
    # order preserved when several rare lines survive
    df2 = spark.createDataFrame(
        [(1, "b\na\nc"), (2, "x")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["cleaned"] for r in
           remove_boilerplate_lines(df2, max_df=3).collect()}
    assert got[1] == "b\na\nc"  # document order, NOT sorted line order


def test_temperature_mix_alpha_extremes(spark):
    """alpha=1 -> natural distribution (every rate 1.0, nothing dropped);
    alpha=0 -> uniform (head strata cut toward the rarest stratum's
    count); alpha=0.5 keeps the rarest stratum complete."""
    rows = [(i, "big" if i < 400 else "small") for i in range(440)]
    df = spark.createDataFrame(rows, "doc_id long, src string")

    keep_all = cleaning.temperature_mix(df, "src", ["doc_id"], alpha=1.0)
    assert keep_all.count() == 440  # (nm/n)^0 == 1 for every stratum

    half = cleaning.temperature_mix(df, "src", ["doc_id"], alpha=0.5)
    by_src = {r["src"]: r["n"] for r in half.groupBy("src").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert by_src.get("small") == 40          # rarest keeps everything
    # big's rate is sqrt(40/400) ~= 0.316 -> acceptance is hash-random
    assert 80 <= by_src.get("big", 0) <= 180  # loose band around 126

    flat = cleaning.temperature_mix(df, "src", ["doc_id"], alpha=0.0)
    flat_counts = {r["src"]: r["n"] for r in flat.groupBy("src").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert flat_counts.get("small") == 40
    assert flat_counts.get("big", 0) <= 80  # cut toward n_min (rate 0.1)


def test_temperature_mix_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300)], "doc_id long, src string"
    )
    a = sorted(r["doc_id"] for r in cleaning.temperature_mix(df, "src", ["doc_id"]).collect())
    b = sorted(r["doc_id"] for r in cleaning.temperature_mix(df, "src", ["doc_id"]).collect())
    assert a == b and a  # same membership on re-run


# ---------------------------------------------------------------------------
# sliding_distinct (day-bitmap merge)
# ---------------------------------------------------------------------------


def test_sliding_distinct_matches_naive_window(spark):
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.sketch import sliding_distinct

    rng = random.Random(31)
    base = dt.datetime(2024, 3, 1)
    rows = [
        (base + dt.timedelta(days=rng.randrange(0, 20), seconds=rng.randrange(0, 86400)),
         rng.randrange(0, 40))
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, uid long")
    got = {
        r["day"]: r["n_distinct"]
        for r in sliding_distinct(df, "ts", "uid", window_days=7).collect()
    }
    days = sorted({t.date() for t, _ in rows})
    want = {}
    for d in days:
        lo = d - dt.timedelta(days=6)
        want[d] = len({u for t, u in rows if lo <= t.date() <= d})
    assert got == want


def test_sliding_distinct_window_one_is_daily_distinct(spark):
    import datetime as dt

    from zio_analytics_spark.operators.sketch import sliding_distinct

    rows = [
        (dt.datetime(2024, 3, 1, 5), 1),
        (dt.datetime(2024, 3, 1, 6), 1),
        (dt.datetime(2024, 3, 1, 7), 2),
        (dt.datetime(2024, 3, 3, 5), 1),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, uid long")
    got = {
        str(r["day"]): r["n_distinct"]
        for r in sliding_distinct(df, "ts", "uid", window_days=1).collect()
    }
    assert got == {"2024-03-01": 2, "2024-03-03": 1}


def test_sliding_distinct_validation(spark):
    import pytest

    from zio_analytics_spark.operators.sketch import sliding_distinct

    df = spark.createDataFrame([], "ts timestamp, uid long")
    with pytest.raises(ValueError):
        sliding_distinct(df, "ts", "uid", window_days=0)


def _mojibake(s: str) -> str:
    """UTF-8 bytes decoded as sloppy CP1252 — the corruption fix_encoding
    inverts (the five CP1252-undefined bytes best-fit to their C1
    codepoints, the Windows convention real mojibake exhibits)."""
    out = []
    for b in s.encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


def test_fix_encoding_planted_mojibake(spark):
    """Round-9 verdict #5: the CP1252-in-UTF-8 repair inverts planted
    corruption byte-for-byte across all three sequence classes (2-byte
    Latin-1, 3-byte general punctuation, the euro), counts repairs, and
    leaves legitimate text untouched."""
    from zio_analytics_spark.operators.cleaning import fix_encoding

    cases = [
        (1, _mojibake("café résumé naïve"), "café résumé naïve"),
        (2, _mojibake("it’s “quoted” – dashed… €5"), "it’s “quoted” – dashed… €5"),
        # conservative contract: marker chars with non-table followers
        # pass through — 'São' has ã (not Ã), lone markers stay
        (3, "São Paulo; Ã lone; â end", "São Paulo; Ã lone; â end"),
        (4, _mojibake("a b °C ±3"), "a b °C ±3"),
        (5, "plain ascii", "plain ascii"),
        (6, "", ""),
        # the markers THEMSELVES round-trip when mojibake-encoded
        (7, _mojibake("ÀÂÃ àâã ÿ"), "ÀÂÃ àâã ÿ"),
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c, _ in cases], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in fix_encoding(df).collect()}
    for i, corrupted, want in cases:
        assert got[i]["text"] == want, i
        assert got[i]["n_repaired"] == len(corrupted) - len(want), i
    assert got[2]["n_repaired"] > 0 and got[3]["n_repaired"] == 0


def test_fix_encoding_plan_is_map_only(spark):
    from zio_analytics_spark.operators.cleaning import fix_encoding

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = fix_encoding(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_fix_encoding_chain_evaluates_once_per_row(spark):
    """Round-16 expression-shape pin: the repair chain is CodegenFallback
    HOFs (aggregate), which Catalyst excludes from subexpression
    elimination — so every plan REFERENCE is a per-row re-evaluation. The
    single-reference _repair_class rewrite (first-element-flag aggregate
    instead of element_at + slice + size, which referenced the split 3x
    PER CLASS, compounding across the 3 chained classes) plus the
    two-step select in fix_encoding must leave exactly ONE copy of the
    chain in the optimized plan. The euro-shortcut literal is unique to
    the chain's innermost expression, so its count IS the number of
    chain evaluations per row."""
    from zio_analytics_spark.operators.cleaning import fix_encoding

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = fix_encoding(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("â‚¬") == 1


def test_fix_encoding_double_encoded_needs_two_passes(spark):
    """DOUBLE-encoded 2-byte mojibake ('ÃƒÂ©' — Latin-1 text mis-decoded
    twice) unpeels one layer per pass; extra passes on clean or
    singly-encoded text are no-ops (the conservative-follower contract
    makes iteration safe). Iterated 3-byte punctuation is the documented
    seam — pinned here as NOT fully repairing (the euro shortcut fires
    inside the outer layer, so the inner form is no longer canonical)."""
    from zio_analytics_spark.operators.cleaning import fix_encoding

    double = _mojibake(_mojibake("café résumé naïve ±3 °C"))
    single = _mojibake("café")
    seam = _mojibake(_mojibake("it’s"))  # 3-byte class, twice
    df = spark.createDataFrame(
        [(1, double), (2, single), (3, "plain"), (4, seam)],
        "doc_id long, text string",
    )
    one = {r["doc_id"]: r["text"] for r in fix_encoding(df).collect()}
    two = {r["doc_id"]: r["text"] for r in fix_encoding(df, passes=2).collect()}
    assert one[1] == _mojibake("café résumé naïve ±3 °C")  # one layer peeled
    assert two[1] == "café résumé naïve ±3 °C"             # both layers peeled
    assert one[2] == two[2] == "café"                       # pass 2 is a no-op
    assert one[3] == two[3] == "plain"
    assert two[4] != "it’s"  # the documented 3-byte iterated seam
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fix_encoding(df, passes=0).collect()


def test_decode_text_quarantine(spark):
    """Binary→text gate: valid UTF-8 decodes byte-exactly (multi-byte
    chars included), invalid payloads land in the quarantine lane with
    NULL text — never replacement characters, never task failure."""
    from zio_analytics_spark.operators.cleaning import decode_text_quarantine

    rows = [
        (1, bytearray("plain ascii".encode())),
        (2, bytearray("café — naïve".encode())),
        (3, bytearray(b"broken \xc3\x28 lead")),      # 2-byte lead + non-cont
        (4, bytearray(b"truncated tail \xe2\x82")),   # cut 3-byte sequence
        (5, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_text_quarantine(df).collect()}
    assert got[1]["ok"] and got[1]["text"] == "plain ascii"
    assert got[2]["ok"] and got[2]["text"] == "café — naïve"
    for i in (3, 4):
        assert not got[i]["ok"]
        assert got[i]["text"] is None and got[i]["error"] == "invalid UTF-8"
    assert got[5]["ok"] and got[5]["text"] == ""  # empty is valid UTF-8
