"""Storage-layout operators (operators/layout.py): Z-order clustering and
distributed contiguous-id assignment."""

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from zio_analytics_spark.operators.layout import (
    assign_contiguous_ids,
    zorder_value,
    zorder_write,
)


def test_zorder_value_interleave(spark):
    # (x=0b11, y=0b01), 2 bits: z = y1 x1 y0 x0 = 0 1 1 1 = 7
    row = (
        spark.createDataFrame([(3, 1)], "x long, y long")
        .select(zorder_value(["x", "y"], bits=2).alias("z"))
        .collect()[0]
    )
    assert row["z"] == 0b0111
    # locality: close points in 2-D are close in z far more often than
    # lexicographic (x, y) order would give. Spot-check the classic square.
    vals = (
        spark.createDataFrame(
            [(x, y) for x in range(4) for y in range(4)], "x long, y long"
        )
        .select("x", "y", zorder_value(["x", "y"], bits=2).alias("z"))
        .collect()
    )
    z = {(r["x"], r["y"]): r["z"] for r in vals}
    assert sorted(z.values()) == list(range(16))  # bijective on the square
    assert z[(0, 0)] == 0 and z[(3, 3)] == 15


def test_zorder_value_clamps_and_guards(spark):
    import pytest

    with pytest.raises(ValueError):
        zorder_value(["a", "b"], bits=32)
    row = (
        spark.createDataFrame([(-5, 999)], "x long, y long")
        .select(zorder_value(["x", "y"], bits=2).alias("z"))
        .collect()[0]
    )
    # -5 clamps to 0, 999 clamps to 3: z = interleave(0, 3)
    assert row["z"] == 0b1010


def _file_rects(path, xcol, ycol):
    """Per-file (min, max) rectangles of two columns from parquet footers."""
    import pyarrow.parquet as pq

    rects = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        xmin = ymin = None
        xmax = ymax = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == xcol:
                    xmin = st.min if xmin is None else min(xmin, st.min)
                    xmax = st.max if xmax is None else max(xmax, st.max)
                if name == ycol:
                    ymin = st.min if ymin is None else min(ymin, st.min)
                    ymax = st.max if ymax is None else max(ymax, st.max)
        if xmin is not None and ymin is not None:
            rects.append((xmax - xmin, ymax - ymin))
    return rects


def test_zorder_write_tightens_file_stats(spark):
    n = 20_000
    df = spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(256)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(256)).alias("y"),
    )
    zdir = tempfile.mkdtemp(prefix="zas_z_")
    pdir = tempfile.mkdtemp(prefix="zas_p_")
    try:
        zorder_write(df, zdir, cols=["x", "y"], bits=8, n_files=16)
        df.repartition(16).write.mode("overwrite").parquet(pdir)
        zr = _file_rects(zdir, "x", "y")
        pr = _file_rects(pdir, "x", "y")
        assert len(zr) >= 8 and len(pr) >= 8
        area = lambda rs: sum(w * h for w, h in rs) / len(rs)
        # random layout: every file spans ~the whole 256x256 domain.
        # z-order: each file covers a small rectangle. Require 4x tighter
        # on average (measured ~10-30x).
        assert area(zr) < area(pr) / 4
        # and the data survives byte-exactly
        back = spark.read.parquet(zdir)
        assert back.count() == n
        assert back.agg(F.sum("x")).first()[0] == df.agg(F.sum("x")).first()[0]
    finally:
        shutil.rmtree(zdir, ignore_errors=True)
        shutil.rmtree(pdir, ignore_errors=True)


def test_contiguous_ids_match_global_row_number(spark):
    from pyspark.sql import Window as W

    df = spark.range(5000).select(
        F.col("id").alias("k"), F.pmod(F.xxhash64("id"), F.lit(1000)).alias("h")
    )
    out = assign_contiguous_ids(df, "h", tiebreak=["k"], n_buckets=16)
    naive = df.withColumn(
        "expected", F.row_number().over(W.orderBy("h", "k")) - 1
    )
    joined = out.join(naive, ["k", "h"])
    assert joined.where(F.col("seq_id") != F.col("expected")).count() == 0
    ids = [r["seq_id"] for r in out.select("seq_id").collect()]
    assert sorted(ids) == list(range(5000))  # gap-free bijection


def test_contiguous_ids_heavy_ties(spark):
    # one dominant key value: the tie group lands in ONE bucket and the
    # tiebreaker orders it; ids stay a bijection
    df = spark.createDataFrame(
        [(i, 7) for i in range(500)] + [(i, i) for i in range(500, 600)],
        "k long, h long",
    )
    out = assign_contiguous_ids(df, "h", tiebreak=["k"], n_buckets=8)
    ids = sorted(r["seq_id"] for r in out.collect())
    assert ids == list(range(600))


def test_contiguous_ids_empty(spark):
    df = spark.range(0).select(F.col("id").alias("h"))
    assert assign_contiguous_ids(df, "h").count() == 0


def test_zorder_value_three_dims(spark):
    # 3 dims x 2 bits: bijective on the 4x4x4 cube, 6-bit codomain
    pts = [(x, y, z) for x in range(4) for y in range(4) for z in range(4)]
    df = spark.createDataFrame(pts, "x long, y long, z long")
    vals = sorted(
        r["m"]
        for r in df.select(zorder_value(["x", "y", "z"], bits=2).alias("m")).collect()
    )
    assert vals == list(range(64))


def test_contiguous_ids_default_bucket_count_scales(spark):
    """Default n_buckets derives from input size (clamped [16, 4096]) and
    ids stay the exact global rank regardless of boundary placement —
    approx_percentile boundaries only affect balance, never correctness."""
    from pyspark.sql import functions as F

    df = spark.range(500).select(
        F.pmod(F.xxhash64("id"), F.lit(997)).cast("long").alias("h"),
        F.col("id").alias("k"),
    )
    out = assign_contiguous_ids(df, "h", tiebreak=["k"])  # default buckets
    rows = out.orderBy("h", "k").collect()
    assert [r["seq_id"] for r in rows] == list(range(500))


# --- hilbert_value / hilbert_write (round-7) ------------------------------


def _xy2d_ref(order: int, x: int, y: int) -> int:
    """Reference Hilbert xy2d (Wikipedia's C version, verbatim logic)."""
    n = 1 << order
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rot(n, ...)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_exhaustively(spark):
    from zio_analytics_spark.operators.layout import hilbert_value

    bits = 5  # full 32x32 grid = 1024 cells
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["d"]
        for r in df.select("x", "y", hilbert_value("x", "y", bits).alias("d")).collect()
    }
    for (x, y), d in got.items():
        assert d == _xy2d_ref(bits, x, y), (x, y)
    # bijectivity: every cell gets a distinct index covering 0..n²-1
    assert sorted(got.values()) == list(range(n * n))


def test_hilbert_consecutive_indices_are_grid_neighbors(spark):
    from zio_analytics_spark.operators.layout import hilbert_value

    bits = 4
    n = 1 << bits
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    pts = sorted(
        (r["d"], r["x"], r["y"])
        for r in df.select("x", "y", hilbert_value("x", "y", bits).alias("d")).collect()
    )
    for (d0, x0, y0), (d1, x1, y1) in zip(pts, pts[1:]):
        assert d1 == d0 + 1
        # THE Hilbert property: every step moves exactly one grid cell —
        # Z-order violates this at every power-of-two boundary
        assert abs(x1 - x0) + abs(y1 - y0) == 1, (d0, x0, y0, x1, y1)


def test_hilbert_clamps_and_validates(spark):
    import pytest

    from zio_analytics_spark.operators.layout import hilbert_value

    df = spark.createDataFrame([(-5, 999999)], "x long, y long")
    d = df.select(hilbert_value("x", "y", 4).alias("d")).collect()[0]["d"]
    ref = _xy2d_ref(4, 0, 15)  # clamped into range
    assert d == ref
    with pytest.raises(ValueError):
        hilbert_value("x", "y", 32)


def test_hilbert_deep_curve_plan_builds_fast(spark):
    """The FSM-fold keeps the expression O(bits): a 31-bit curve (a
    2-billion-cell-per-axis grid — the whole-int32 domain) must BUILD and
    RUN in seconds, where the old unrolled walk was already minutes at 8
    bits. Spot-check values against the reference xy2d at depth."""
    import time

    from zio_analytics_spark.operators.layout import hilbert_value

    pts = [(0, 0), (1, 0), ((1 << 31) - 1, (1 << 31) - 1), (123456789, 987654321)]
    df = spark.createDataFrame(pts, "x long, y long")
    t0 = time.monotonic()
    got = {
        (r["x"], r["y"]): r["d"]
        for r in df.select("x", "y", hilbert_value("x", "y", 31).alias("d")).collect()
    }
    assert time.monotonic() - t0 < 30
    for (x, y), d in got.items():
        assert d == _xy2d_ref(31, x, y), (x, y)


def test_hilbert_write_locality_beats_unsorted(spark, tmp_path):
    import json
    import random

    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.layout import hilbert_write

    rng = random.Random(9)
    rows = [(i, rng.randrange(256), rng.randrange(256)) for i in range(20_000)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    hpath = str(tmp_path / "hilbert")
    upath = str(tmp_path / "unsorted")
    hilbert_write(df, hpath, "a", "b", bits=8, n_files=8)
    df.repartition(8).write.mode("overwrite").parquet(upath)

    def mean_rect_area(path):
        import pyarrow.parquet as pq
        import glob
        import os

        areas = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo_a = hi_a = lo_b = hi_b = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    if st is None or name not in ("a", "b"):
                        continue
                    if name == "a":
                        lo_a = st.min if lo_a is None else min(lo_a, st.min)
                        hi_a = st.max if hi_a is None else max(hi_a, st.max)
                    else:
                        lo_b = st.min if lo_b is None else min(lo_b, st.min)
                        hi_b = st.max if hi_b is None else max(hi_b, st.max)
            areas.append((hi_a - lo_a + 1) * (hi_b - lo_b + 1))
        return sum(areas) / len(areas)

    clustered, unsorted = mean_rect_area(hpath), mean_rect_area(upath)
    # each hilbert file covers a small rectangle; unsorted files cover ~everything
    assert clustered < unsorted / 3, (clustered, unsorted)
    # values survive the re-layout exactly
    back = spark.read.parquet(hpath)
    assert back.count() == 20_000
    assert back.agg(F.sum("a")).collect()[0][0] == sum(r[1] for r in rows)


# --- global_cumsum / plan_compaction (round-7) -----------------------------


def test_global_cumsum_matches_naive_window(spark):
    import random

    from zio_analytics_spark.operators.layout import global_cumsum

    rng = random.Random(11)
    rows = [(i, rng.randrange(1, 500)) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, v long")
    # tiny bucket sketch to force the multi-bucket path
    out = global_cumsum(df, "k", "v", out_name="run", n_buckets=16)
    got = {r["k"]: r["run"] for r in out.collect()}
    acc = 0
    for k, v in sorted(rows):
        acc += v
        assert got[k] == acc, k


def test_global_cumsum_empty_input(spark):
    from zio_analytics_spark.operators.layout import global_cumsum

    df = spark.createDataFrame([], "k long, v long")
    assert global_cumsum(df, "k", "v").count() == 0


def test_plan_compaction_bins_respect_target(spark):
    import random

    from zio_analytics_spark.operators.layout import plan_compaction

    rng = random.Random(23)
    rows = [(i, rng.randrange(100, 3000)) for i in range(300)]
    df = spark.createDataFrame(rows, "file_id long, bytes long")
    target = 10_000
    plan = plan_compaction(df, target, n_buckets=16).collect()
    assert len(plan) == 300
    bins = {}
    for r in sorted(plan, key=lambda r: r["file_id"]):
        bins.setdefault(r["bin"], []).append(r["bytes"])
    # bins are contiguous 0..max and each overflows target by at most its
    # LAST file (the split-packing contract); all but the last bin reach it
    assert sorted(bins) == list(range(len(bins)))
    for b, sizes in bins.items():
        total = sum(sizes)
        assert total - sizes[-1] < target, b
        if b < len(bins) - 1:
            assert total >= target - 3000, b  # next file would have overflowed


def test_plan_compaction_validates(spark):
    import pytest

    from zio_analytics_spark.operators.layout import plan_compaction

    df = spark.createDataFrame([(1, 10)], "file_id long, bytes long")
    with pytest.raises(ValueError):
        plan_compaction(df, 0)
