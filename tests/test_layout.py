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
