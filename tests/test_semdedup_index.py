"""Frozen-centroid SemDeDup index (sources/semdedup_index.py): the probe
against persisted centroids must reproduce the inline retrain-per-query
form exactly, the frozen assignment must equal the trained one, and the
rebuild verb must retrain behind the atomic pointer."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from hnarchive_spark.operators.kmeans import kmeans_assign, kmeans_assign_frozen
from hnarchive_spark.plans.similarity import KMEANS_ITERS, KMEANS_K, SEMDEDUP_T_E6
from hnarchive_spark.sources.index_version import current_index_version, index_root
from hnarchive_spark.sources.semdedup_index import (
    build_semdedup_index,
    read_meta,
    rebuild_semdedup_index,
    semdedup_probe,
)
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_frozen_assignment_reproduces_training_assignment(spark):
    """kmeans_assign(return_centroids=True) hands back the centroids its
    FINAL pass scored against: one frozen pass with them must equal the
    trained assignment bit-for-bit (the identity the index rests on)."""
    e = load(spark, SF, "embeddings")
    trained, cents = kmeans_assign(e, KMEANS_K, KMEANS_ITERS, return_centroids=True)
    frozen = kmeans_assign_frozen(e, cents)
    a = sorted(tuple(r) for r in trained.collect())
    b = sorted(tuple(r) for r in frozen.collect())
    assert a == b and len(a) > 0


def test_probe_matches_inline_semdedup(spark, tmp_path):
    from hnarchive_spark.operators.similarity import semdedup_drops

    e = load(spark, SF, "embeddings")
    path = str(tmp_path / "sd")
    k_written = build_semdedup_index(spark, e, path, KMEANS_K, KMEANS_ITERS)
    assert 0 < k_written <= KMEANS_K
    assert read_meta(path) == {"k": KMEANS_K, "iters": KMEANS_ITERS}
    got = sorted(tuple(r) for r in semdedup_probe(spark, e, path, SEMDEDUP_T_E6).collect())
    want = sorted(
        tuple(r) for r in semdedup_drops(e, KMEANS_K, KMEANS_ITERS, SEMDEDUP_T_E6).collect()
    )
    assert got == want and len(got) > 0


def test_probe_does_no_training(spark, tmp_path):
    """The probe plan must contain no corpus-wide centroid aggregate —
    the centroid read is a k-row parquet scan feeding a broadcast."""
    e = load(spark, SF, "embeddings")
    path = str(tmp_path / "sd")
    build_semdedup_index(spark, e, path, KMEANS_K, KMEANS_ITERS)
    df = semdedup_probe(spark, e, path, SEMDEDUP_T_E6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # training would show iterated HashAggregate(avg(v[i])) chains; the
    # frozen probe assigns MAP-SIDE against the stored centroids (collected
    # k-row table — r18's literal argmin fold, r19's Arrow-vectorized numpy
    # argmin in ONE pandas-UDF stage), so the plan has only embeddings
    # scans, the argmin stage, and the prune — no aggregate, no per-vector
    # assignment Exchange
    assert "ArrowEvalPython" in plan, plan[:800]
    assert plan.count("avg(") == 0, plan[:800]


def test_capped_probe_matches_capped_inline(spark, tmp_path):
    """max_pivots plumbs identically through the frozen probe and the
    inline form (shared prune), and the cap binds (fewer or equal rows
    than uncapped, never more)."""
    from hnarchive_spark.operators.similarity import semdedup_drops
    from hnarchive_spark.plans.similarity import SEMDEDUP_MAX_PIVOTS

    e = load(spark, SF, "embeddings")
    path = str(tmp_path / "sd")
    build_semdedup_index(spark, e, path, KMEANS_K, KMEANS_ITERS)
    got = sorted(
        tuple(r)
        for r in semdedup_probe(
            spark, e, path, SEMDEDUP_T_E6, max_pivots=SEMDEDUP_MAX_PIVOTS
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in semdedup_drops(
            e, KMEANS_K, KMEANS_ITERS, SEMDEDUP_T_E6, max_pivots=SEMDEDUP_MAX_PIVOTS
        ).collect()
    )
    assert got == want and len(got) > 0


def test_cap_keeps_degenerate_cluster_coverage(spark):
    """The adversarial case the cap exists for: one cluster of
    near-identical vectors. Capped at P pivots, every non-pivot-#1 vector
    must STILL be dropped (pivot #1 is within threshold of all of them) —
    the cap bounds pair count, not dedup coverage."""
    from hnarchive_spark.operators.similarity import semdedup_prune

    n, p = 400, 8
    rows = [(i, [1.0, 0.0, 0.0, float(i) * 1e-9], 0) for i in range(n)]
    assign = spark.createDataFrame(
        rows, "vec_id long, v array<double>, list_id long"
    )
    drops = semdedup_prune(assign, 999_000, max_pivots=p).collect()
    # all but vec 0 drop, and every drop attributes to a pivot (< p)
    assert sorted(r["vec_id"] for r in drops) == list(range(1, n))
    assert all(r["dup_of"] < p for r in drops)


def test_capped_plan_uses_window_group_limit_and_no_training(spark, tmp_path):
    """Plan lock: the capped probe keeps the zero-training property AND
    the pivot restriction is planned as a WindowGroupLimit (per-partition
    top-P pushed below the full window sort — the property that makes the
    rank computation itself skew-safe)."""
    from hnarchive_spark.plans.similarity import SEMDEDUP_MAX_PIVOTS

    e = load(spark, SF, "embeddings")
    path = str(tmp_path / "sd")
    build_semdedup_index(spark, e, path, KMEANS_K, KMEANS_ITERS)
    df = semdedup_probe(
        spark, e, path, SEMDEDUP_T_E6, max_pivots=SEMDEDUP_MAX_PIVOTS
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan[:800]  # map-side frozen argmin (r18/r19)
    assert plan.count("avg(") == 0, plan[:800]
    assert "WindowGroupLimit" in plan, plan[:1200]


def test_incremental_probe_and_membership_appends(spark, tmp_path):
    """The batch probe: archive(even) trains + persists membership, the
    odd batch probes O(batch) — results must equal the direct cross-pair
    computation over frozen assignments; membership appends are
    presence-anti-joined idempotent (full re-delivery appends 0); the
    probe plan does no training and prunes the membership scan."""
    from hnarchive_spark.sources.semdedup_index import (
        append_semdedup_index,
        semdedup_probe_batch,
    )

    e = load(spark, SF, "embeddings")
    arch = e.filter(F.col("vec_id") % 2 == 0)
    batch = e.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "sd")
    build_semdedup_index(spark, arch, path, KMEANS_K, KMEANS_ITERS,
                         store_assignments=True)

    got = sorted(
        tuple(r)
        for r in semdedup_probe_batch(
            spark, batch, path, arch, SEMDEDUP_T_E6
        ).collect()
    )
    # reference: direct frozen assignment of both sides, cross pairs only
    trained, cents = kmeans_assign(arch, KMEANS_K, KMEANS_ITERS,
                                   return_centroids=True)
    ax = kmeans_assign_frozen(arch, cents, keep_vec=True)
    bx = kmeans_assign_frozen(batch, cents, keep_vec=True)
    from hnarchive_spark.operators.similarity import cosine

    x, y = ax.alias("x"), bx.alias("y")
    pairs = (
        x.join(y, F.col("x.list_id") == F.col("y.list_id"))
        .select(
            F.col("y.vec_id").alias("vec_id"),
            F.col("y.list_id").alias("list_id"),
            F.col("x.vec_id").alias("dup_of"),
            F.round(cosine(F.col("x.v"), F.col("y.v")) * 1_000_000, 0)
            .cast("long")
            .alias("cos_e6"),
        )
        .filter(F.col("cos_e6") >= SEMDEDUP_T_E6)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("cos_e6").desc(), "dup_of")
    want = sorted(
        tuple(r)
        for r in pairs.select("*", F.row_number().over(w).alias("rn"))
        .filter("rn = 1")
        .drop("rn")
        .collect()
    )
    assert got == want and len(got) > 0

    # membership append: the batch joins the archive; re-delivery is a no-op
    n = append_semdedup_index(spark, batch, path)
    assert n == batch.count()
    assert append_semdedup_index(spark, batch, path) == 0
    # after absorption, yesterday's batch IS archive: a fresh probe of the
    # same ids now pairs them against themselves too — exclude self-pairs
    got2 = semdedup_probe_batch(spark, batch, path, e, SEMDEDUP_T_E6)
    assert got2.filter(F.col("vec_id") == F.col("dup_of")).count() == 0

    # plan lock: no training aggregate, membership scan partition-pruned
    df = semdedup_probe_batch(spark, batch, path, arch, SEMDEDUP_T_E6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("avg(") == 0, plan[:800]
    assert "list_id" in plan


# multi-minute compaction/rebuild sweep -> round-closing run only
@pytest.mark.exhaustive
def test_rebuild_retrains_behind_pointer(spark, tmp_path):
    """Rebuild on a grown corpus publishes v1; the probe then reproduces
    the inline form over the grown corpus (i.e. the new centroids are
    live), and the old version directory is intact until pruned."""
    from hnarchive_spark.operators.similarity import semdedup_drops

    e = load(spark, SF, "embeddings")
    half = e.filter(F.col("vec_id") % 2 == 0)
    path = str(tmp_path / "sd")
    build_semdedup_index(spark, half, path, KMEANS_K, KMEANS_ITERS)

    vdir = rebuild_semdedup_index(spark, e, path)
    assert current_index_version(path) == 1 and index_root(path) == vdir
    assert read_meta(path) == {"k": KMEANS_K, "iters": KMEANS_ITERS}
    got = sorted(tuple(r) for r in semdedup_probe(spark, e, path, SEMDEDUP_T_E6).collect())
    want = sorted(
        tuple(r) for r in semdedup_drops(e, KMEANS_K, KMEANS_ITERS, SEMDEDUP_T_E6).collect()
    )
    assert got == want and len(got) > 0
    assert os.path.isdir(os.path.join(path, "centroids"))  # v0 retained


# multi-minute compaction/rebuild sweep -> round-closing run only
@pytest.mark.exhaustive
def test_rebuild_carries_membership_through(spark, tmp_path):
    """A membership-bearing index (store_assignments=True) rebuilt into
    v<N> must keep the batch probe working against the published root —
    the retrained assignment of the rebuild corpus lands in the new
    version's lists, so probe_batch never dangles on a pruned flat dir."""
    from hnarchive_spark.sources.semdedup_index import (
        _lists_path,
        semdedup_probe_batch,
    )
    from hnarchive_spark.sources.semdedup_index import rebuild_semdedup_index

    e = load(spark, SF, "embeddings")
    arch = e.filter(F.col("vec_id") % 2 == 0)
    path = str(tmp_path / "sd")
    build_semdedup_index(spark, arch, path, KMEANS_K, KMEANS_ITERS,
                         store_assignments=True)
    vdir = rebuild_semdedup_index(spark, arch, path)
    assert os.path.isdir(os.path.join(vdir, "lists"))
    got = semdedup_probe_batch(
        spark, e.filter(F.col("vec_id") % 2 == 1), path, arch, SEMDEDUP_T_E6
    )
    assert got.count() > 0


# multi-minute compaction/rebuild sweep -> round-closing run only
@pytest.mark.exhaustive
def test_redelivery_across_rebuild_never_duplicates(spark, tmp_path):
    """Fault injection (VERDICT r15 #4): deliver -> rebuild -> re-deliver
    must land ZERO duplicate membership rows, mechanically.  Membership is
    written as the FROZEN assignment against each version's centroids and
    stamped with the centroid version (cv), so the redelivered batch's
    cluster-pruned presence check provably probes the cluster any existing
    row sits in — including after the rebuild moved the centroids.  Also
    covers the lagging-rebuild variant: a rebuild whose corpus EXCLUDES
    the batch drops its rows (corpus-snapshot lag); redelivery then heals
    exactly once, and a third delivery is a no-op."""
    from hnarchive_spark.sources.semdedup_index import (
        _lists_path,
        append_semdedup_index,
    )

    e = load(spark, SF, "embeddings")
    arch = e.filter(F.col("vec_id") % 2 == 0)
    batch = e.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 80))
    path = str(tmp_path / "sd")
    build_semdedup_index(
        spark, arch, path, KMEANS_K, KMEANS_ITERS, store_assignments=True
    )

    n1 = append_semdedup_index(spark, batch, path)
    assert n1 == batch.count() > 0

    def members():
        return spark.read.parquet(_lists_path(path))

    # rebuild on the GROWN corpus (centroids move), then re-deliver
    rebuild_semdedup_index(spark, arch.unionByName(batch), path)
    assert append_semdedup_index(spark, batch, path) == 0  # no-op redelivery
    m = members()
    assert m.count() == m.select("vec_id").distinct().count()  # zero dups
    assert m.filter(F.col("cv") != 1).count() == 0  # all stamped v1

    # lagging rebuild: corpus EXCLUDES the batch -> its rows drop; the
    # redelivery self-heals exactly once; a third delivery is a no-op
    rebuild_semdedup_index(spark, arch, path)
    assert members().filter(F.col("vec_id") % 2 == 1).count() == 0
    assert append_semdedup_index(spark, batch, path) == n1
    assert append_semdedup_index(spark, batch, path) == 0
    m = members()
    assert m.count() == m.select("vec_id").distinct().count()
    assert m.filter(F.col("cv") == 2).count() == arch.count() + n1


def test_append_to_legacy_store_without_cv_column(spark, tmp_path):
    """A membership store written BEFORE the cv stamp existed must stay
    appendable (review r16: an unconditional cv read would crash the
    streaming maintenance path on upgrade): a legacy layout is treated
    as unverifiable — the presence check widens to the full anti-join —
    and appended rows stay cv-less so the store schema remains
    consistent."""
    from hnarchive_spark.sources.semdedup_index import (
        _lists_path,
        append_semdedup_index,
    )

    e = load(spark, SF, "embeddings")
    arch = e.filter(F.col("vec_id") % 2 == 0)
    batch = e.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 40))
    path = str(tmp_path / "sd")
    build_semdedup_index(
        spark, arch, path, KMEANS_K, KMEANS_ITERS, store_assignments=True
    )
    # strip the cv column in place: the pre-r16 on-disk layout
    lp = _lists_path(path)
    legacy = spark.read.parquet(lp).select("vec_id", "list_id").collect()
    import shutil

    shutil.rmtree(lp)
    spark.createDataFrame(legacy, "vec_id long, list_id long").repartition(
        "list_id"
    ).write.partitionBy("list_id").parquet(lp)

    n1 = append_semdedup_index(spark, batch, path)
    assert n1 == batch.count() > 0
    assert append_semdedup_index(spark, batch, path) == 0  # idempotent
    m = spark.read.parquet(lp)
    assert "cv" not in m.columns  # schema stayed legacy-consistent
    assert m.count() == m.select("vec_id").distinct().count()
