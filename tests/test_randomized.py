"""Seeded randomized equivalence tests: optimized operators vs their
straightforward definitions on random inputs (property-test style; seeds
fixed for reproducibility — Spark latency makes per-example hypothesis
generation impractical)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.operators import dedup
from zio_analytics_spark.operators.asof import asof_join

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta", "iota", "kappa"]


def _random_docs(seed: int, n_docs: int = 40):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        length = rng.randint(5, 30)
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(length)), "x"))
    # plant a few near-dups
    for i in range(3):
        base = docs[i][1].split()
        if len(base) > 6:
            base[rng.randrange(len(base))] = rng.choice(WORDS)
        docs.append((100 + i, " ".join(base), "x"))
    return docs


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_inverted_index_jaccard_equals_bruteforce(spark, seed):
    """The inverted-index set-similarity join must equal the brute-force
    definition (python sets over the same shingles) on random corpora."""
    docs = _random_docs(seed)
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in dedup.jaccard_pairs(df, block_cols=["lang"], n=3, threshold=0.2).collect()
    }

    def shingles(text):
        w = text.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    expect = {}
    for i, (ida, ta, _) in enumerate(docs):
        sa = shingles(ta)
        if not sa:
            continue
        for idb, tb, _ in docs[i + 1 :]:
            sb = shingles(tb)
            if not sb:
                continue
            a, b = (ida, idb) if ida < idb else (idb, ida)
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.2:
                expect[(a, b)] = round(j, 9)
    assert got == expect


@pytest.mark.parametrize("seed", [3, 41])
def test_asof_join_equals_pandas_merge_asof(spark, seed):
    """The union-merge as-of join must equal pandas.merge_asof per key."""
    import pandas as pd

    rng = random.Random(seed)
    left = [(i, rng.randint(0, 4), rng.randint(0, 1000)) for i in range(200)]
    right_raw = {(rng.randint(0, 4), rng.randint(0, 1000)) for _ in range(60)}
    right = [(k, t, float(i)) for i, (k, t) in enumerate(sorted(right_raw))]

    ldf = spark.createDataFrame(left, "eid long, k long, t long")
    rdf = spark.createDataFrame(right, "k long, t long, px double")
    got = {r.eid: r.px for r in asof_join(ldf, rdf, "k", "k", "t", "t", ["px"]).collect()}

    lp = pd.DataFrame(left, columns=["eid", "k", "t"]).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(right, columns=["k", "t", "px"]).sort_values("t", kind="mergesort")
    merged = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    expect = {
        int(r.eid): (None if pd.isna(r.px) else float(r.px)) for r in merged.itertuples()
    }
    assert got == expect


@pytest.mark.parametrize("seed", [11])
def test_cluster_duplicates_equals_union_find(spark, seed):
    """DataFrame connected components vs a driver-side union-find."""
    rng = random.Random(seed)
    nodes = list(range(60))
    pairs = sorted({(min(a, b), max(a, b)) for a, b in
                    ((rng.choice(nodes), rng.choice(nodes)) for _ in range(50)) if a != b})
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r.node: r.cluster for r in dedup.cluster_duplicates(df).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}
    assert got == expect


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_pack_sequences_invariants(spark, seed):
    """Packing invariants on random token counts: (a) fragments conserve
    every doc's tokens, (b) no pack exceeds max_len, (c) within a key,
    every pack except the last is exactly full (concat-then-chunk leaves
    no internal gaps), (d) zero-token docs vanish."""
    from collections import defaultdict

    from zio_analytics_spark.operators.text import pack_sequences

    rng = random.Random(seed)
    L = rng.choice([7, 16, 50])
    rows = [
        (i, rng.choice(["p", "q"]), rng.choice([0, 1, 2, 5, 13, 61, 200]))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, k string, n_tokens long")
    out = pack_sequences(df, max_len=L, order_by="doc_id", partition_by=("k",)).collect()

    per_doc, per_pack = defaultdict(int), defaultdict(int)
    for r in out:
        assert r.n_frag_tokens > 0
        per_doc[r.doc_id] += r.n_frag_tokens
        per_pack[(r.k, r.pack_id)] += r.n_frag_tokens
    want = {i: n for i, _, n in rows if n > 0}
    assert per_doc == want  # conservation; zero-token docs vanish
    last_pack = {}
    for (k, p), tot in per_pack.items():
        assert tot <= L
        last_pack[k] = max(last_pack.get(k, -1), p)
    for (k, p), tot in per_pack.items():
        if p < last_pack[k]:
            assert tot == L, f"internal pack ({k},{p}) not full: {tot}"


@pytest.mark.parametrize("seed", [11, 57])
@pytest.mark.parametrize("strategy", ["dense", "auto"])
def test_dense_jaccard_equals_bruteforce(spark, seed, strategy):
    """The dense incidence-matrix path (and whatever 'auto' picks) must
    equal the brute-force python-set definition on random corpora — same
    property the sparse path is held to, covering char-mode shingles and
    multi-block inputs."""
    rng = random.Random(seed)
    docs = []
    for i in range(30):
        length = rng.randint(6, 25)
        lang = rng.choice(["x", "y"])
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(length)), lang))
    for i in range(3):  # planted near-dups
        base = docs[i][1].split()
        base[rng.randrange(len(base))] = rng.choice(WORDS)
        docs.append((100 + i, " ".join(base), docs[i][2]))
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in dedup.jaccard_pairs(
            df, block_cols=["lang"], n=4, threshold=0.15,
            shingle_mode="char", strategy=strategy,
        ).collect()
    }

    def shingles(text):
        return {text[i : i + 4] for i in range(len(text) - 3)}

    expect = {}
    for i, (ida, ta, la) in enumerate(docs):
        sa = shingles(ta)
        if not sa:
            continue
        for idb, tb, lb in docs[i + 1 :]:
            sb = shingles(tb)
            if not sb or la != lb:
                continue
            a, b = (ida, idb) if ida < idb else (idb, ida)
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.15:
                expect[(a, b)] = round(j, 9)
    assert got == expect and expect


@pytest.mark.parametrize("seed", [11, 42])
def test_zorder_bijective_on_random_grids(spark, seed):
    """The Morton value must be a bijection on the [0,2^bits)^2 grid and
    monotone on each axis when the other is fixed at 0."""
    from zio_analytics_spark.operators.layout import zorder_value

    rng = random.Random(seed)
    bits = rng.choice([3, 4, 5])
    side = 1 << bits
    pts = [(x, y) for x in range(side) for y in range(side)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", zorder_value(["x", "y"], bits=bits).alias("z")).collect()
    zs = sorted(r["z"] for r in rows)
    assert zs == list(range(side * side))
    axis = {r["x"]: r["z"] for r in rows if r["y"] == 0}
    assert all(axis[i] < axis[i + 1] for i in range(side - 1))


@pytest.mark.parametrize("seed", [5, 77])
def test_interpolation_bounded_by_neighbors(spark, seed):
    """Interpolated values must lie within [min, max] of the two anchor
    neighbors, and anchors must pass through unchanged."""
    from zio_analytics_spark.operators.timeseries import interpolate_linear

    rng = random.Random(seed)
    ts = sorted(rng.sample(range(1000), 40))
    vals = {}
    rows = []
    for i, t in enumerate(ts):
        if i % 3 == 0:  # anchors at every 3rd point
            v = rng.uniform(-100, 100)
            vals[t] = v
            rows.append(("k", t, v))
        else:
            rows.append(("k", t, None))
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {r["t"]: r["v"] for r in interpolate_linear(df, "k", "t", "v").collect()}
    anchor_ts = sorted(vals)
    for t, v in out.items():
        if t in vals:
            assert v == vals[t]
        elif v is not None:
            prev = max(a for a in anchor_ts if a < t)
            nxt = min(a for a in anchor_ts if a > t)
            lo, hi = sorted((vals[prev], vals[nxt]))
            assert lo - 1e-9 <= v <= hi + 1e-9


@pytest.mark.parametrize("seed", [3, 31])
def test_table_diff_involution_and_symmetry(spark, seed):
    """diff(a, a) is all 'same'; swapping sides swaps only_left/only_right
    and preserves changed/same."""
    from zio_analytics_spark.operators.merge import table_diff

    rng = random.Random(seed)
    rows_a = [(i, rng.randint(0, 5) * 1.0) for i in range(50)]
    rows_b = [(i + rng.randint(0, 1) * 100, v + rng.randint(0, 1)) for i, v in rows_a]
    a = spark.createDataFrame(rows_a, "k long, v double")
    b = spark.createDataFrame(rows_b, "k long, v double").dropDuplicates(["k"])
    assert table_diff(a, a, ["k"]).where("diff != 'same'").count() == 0
    ab = {r["k"]: r["diff"] for r in table_diff(a, b, ["k"]).collect()}
    ba = {r["k"]: r["diff"] for r in table_diff(b, a, ["k"]).collect()}
    flip = {"only_left": "only_right", "only_right": "only_left",
            "same": "same", "changed": "changed"}
    assert ba == {k: flip[d] for k, d in ab.items()}


@pytest.mark.parametrize("seed", [13, 57])
def test_incremental_jaccard_equals_filtered_full(spark, seed):
    """Incremental (new batch vs corpus) must equal the FULL pair set
    restricted to pairs touching a new doc — for every threshold."""
    docs = _random_docs(seed, n_docs=30)
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    new_pred = F.col("doc_id") % 3 == 0
    for t in (0.2, 0.5):
        full = dedup.jaccard_pairs(df, block_cols=["lang"], n=3, threshold=t)
        expected = sorted(
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
            for r in full.collect()
            if r["doc_a"] % 3 == 0 or r["doc_b"] % 3 == 0
        )
        inc = dedup.jaccard_pairs_incremental(
            df.where(new_pred),
            df.where(~new_pred),
            block_cols=["lang"],
            n=3,
            threshold=t,
        )
        got = sorted(
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 9)) for r in inc.collect()
        )
        assert got == expected, (t, got, expected)
