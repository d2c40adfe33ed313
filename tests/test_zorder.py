"""Z-order layout: Morton math correctness + measured file skipping."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnarchive_spark.sources import zorder as Z
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 2, 7, 1000, 65535)],
        "x long, y long",
    )
    rows = df.select("x", "y", Z.z_value(F.col("x"), F.col("y")).alias("z")).collect()
    for r in rows:
        assert r.z == _morton_py(r.x, r.y), (r.x, r.y)


def test_z_value_preserves_locality_prefix(spark):
    """Points sharing high bits in both dims share the z high bits — the
    property that makes curve segments axis-aligned-ish boxes."""
    a = _morton_py(100, 200)
    b = _morton_py(101, 201)
    far = _morton_py(40000, 200)
    assert abs(a - b) < abs(a - far)


def _events_xy(spark):
    e = load(spark, SF, "events")
    day0 = e.agg(F.min(F.to_date("ts"))).collect()[0][0]
    return e.select(
        F.col("user_id").alias("x"),
        F.datediff(F.to_date("ts"), F.lit(day0)).cast("long").alias("y"),
        "event_id",
    )


def test_zorder_layout_skips_more_files_than_single_key(spark, tmp_path):
    """For an all-users x narrow-day box, a user-sorted layout matches every
    file (each spans all days); the z-ordered layout skips most."""
    df = _events_xy(spark)
    n_files = 16
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    Z.write_zordered(df, zpath, "x", "y", n_files)
    (
        df.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    ymax = df.agg(F.max("y")).collect()[0][0]
    box = {"x": (0, 10**9), "y": (0, max(1, ymax // 8))}  # all users, ~1/8 days
    z_hit, z_total = Z.files_matching_box(zpath, box)
    l_hit, l_total = Z.files_matching_box(lpath, box)
    assert l_hit == l_total, "single-key layout should match every file"
    assert z_hit < z_total, "z-order layout must skip files on the 2nd dim"
    assert z_hit <= l_hit // 2, (z_hit, l_hit)


def test_zordered_read_is_lossless(spark, tmp_path):
    df = _events_xy(spark)
    path = str(tmp_path / "z2")
    Z.write_zordered(df, path, "x", "y", 8)
    got = sorted(r.event_id for r in spark.read.parquet(path).collect())
    want = sorted(r.event_id for r in df.collect())
    assert got == want


def test_zorder_box_query_skips_files(spark, tmp_path):
    """The REGISTERED q_zorder_box box must touch a strict minority of the
    z-ordered files (footer-stats decision, no rows read) — locks the
    registered query's skipping claim, not just the synthetic-box one."""
    from hnarchive_spark.plans.analytics import (
        ZBOX_DAY_HI,
        ZBOX_DAY_LO,
        ZBOX_FILES,
        ZBOX_USER_HI,
        ZBOX_USER_LO,
    )
    from hnarchive_spark.tables import load

    e = load(spark, SF, "events").select(
        "event_id",
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    )
    path = str(tmp_path / "zbox")
    Z.write_zordered(e, path, "user_id", "day", ZBOX_FILES)
    box = {"user_id": (ZBOX_USER_LO, ZBOX_USER_HI), "day": (ZBOX_DAY_LO, ZBOX_DAY_HI)}
    hit, total = Z.files_matching_box(path, box)
    assert total == ZBOX_FILES
    assert hit < total // 2, (hit, total)
