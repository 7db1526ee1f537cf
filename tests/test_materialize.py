"""pin() — the central materialization policy for pinned intermediates.

Covers the three modes (local / reliable / persist), the loop=True
lineage-truncation guarantee, and the lazy-builder contract: building a
plan that pins lazily must run ZERO Spark jobs (the r11 advice found
eager localCheckpoints in op builders running jobs for explain-only
consumers like the plan-shape audits).
"""

import threading

import pytest
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.ops.materialize import pin


@pytest.fixture()
def pin_mode(spark):
    """Set spark.counsel.pin.mode for one test and restore after."""

    def setter(mode):
        spark.conf.set("spark.counsel.pin.mode", mode)

    yield setter
    spark.conf.unset("spark.counsel.pin.mode")


def _df(spark):
    return spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).groupBy("k").agg(F.count(F.lit(1)).alias("c"))


class _JobCounter:
    """Counts jobs started on this SparkContext while attached."""

    def __init__(self, spark):
        self.spark = spark
        self.count = 0

    def __enter__(self):
        from pyspark import SparkContext

        self._before = int(self.spark.sparkContext._jsc.sc().dagScheduler().nextJobId())
        return self

    def __exit__(self, *exc):
        self._after = int(self.spark.sparkContext._jsc.sc().dagScheduler().nextJobId())
        self.count = self._after - self._before
        return False


def test_default_mode_truncates_lineage(spark):
    out = pin(_df(spark))
    # localCheckpoint replaces the plan with a scanned RDD
    assert "LogicalRDD" in out._jdf.queryExecution().optimizedPlan().toString()
    assert out.count() == 7


def test_lazy_pin_runs_no_job_at_build(spark):
    with _JobCounter(spark) as jc:
        out = pin(_df(spark), eager=False)
        out.explain("formatted")  # plan-only consumer
    try:
        assert jc.count == 0, "lazy pin must not run jobs at plan-build time"
        # lazy pin = cache, lineage intact (loss-safe by recomputation)
        assert out.storageLevel.useMemory and out.storageLevel.useDisk
        assert out.storageLevel.replication == 1
        assert out.count() == 7  # first action materializes it
    finally:
        out.unpersist()


def test_eager_pin_runs_job_at_build(spark):
    with _JobCounter(spark) as jc:
        pin(_df(spark))
    assert jc.count >= 1


def test_reliable_mode_checkpoints(spark, pin_mode, tmp_path):
    pin_mode("reliable")
    spark.conf.set("spark.counsel.pin.checkpointDir", str(tmp_path / "ckpt"))
    try:
        out = pin(_df(spark))
        assert out.count() == 7
        # a reliable checkpoint leaves files under the configured dir
        ckpt = list((tmp_path / "ckpt").rglob("*"))
        assert ckpt, "reliable mode must write checkpoint files"
    finally:
        spark.conf.unset("spark.counsel.pin.checkpointDir")


def test_persist_mode_replicates_without_truncation(spark, pin_mode):
    pin_mode("persist")
    out = pin(_df(spark), eager=False)
    try:
        assert out.storageLevel.replication == 2
        assert out.storageLevel.useDisk
        # lineage NOT truncated: original aggregate still in the plan
        assert "LogicalRDD" not in (
            out._jdf.queryExecution().optimizedPlan().toString()
        )
        assert out.count() == 7
    finally:
        out.unpersist()


def test_persist_mode_loops_upgrade_to_checkpoint(spark, pin_mode, tmp_path):
    pin_mode("persist")
    spark.conf.set("spark.counsel.pin.checkpointDir", str(tmp_path / "ckpt2"))
    try:
        out = pin(_df(spark), loop=True)
        # truncation is mandatory for loop states — must be a checkpoint,
        # not a replicated cache
        assert "LogicalRDD" in (
            out._jdf.queryExecution().optimizedPlan().toString()
        )
        assert out.count() == 7
    finally:
        spark.conf.unset("spark.counsel.pin.checkpointDir")


def test_bad_mode_rejected(spark, pin_mode):
    pin_mode("bogus")
    with pytest.raises(ValueError, match="bogus"):
        pin(_df(spark))


def test_connected_components_agree_across_modes(spark, pin_mode, tmp_path):
    """End-to-end: the iterative CC loop returns identical components in
    every pin mode (the modes may differ in fault tolerance, never in
    results)."""
    from counsel_data_pipeline_spark.ops.clusters import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
        "id_a bigint, id_b bigint",
    )
    expect = None
    spark.conf.set("spark.counsel.pin.checkpointDir", str(tmp_path / "cc"))
    try:
        for mode in ("local", "reliable", "persist"):
            pin_mode(mode)
            got = sorted(
                tuple(r) for r in connected_components(edges).collect()
            )
            if expect is None:
                expect = got
            assert got == expect, f"mode {mode} changed CC results"
    finally:
        spark.conf.unset("spark.counsel.pin.checkpointDir")
    assert expect[:3] == [(1, 1), (2, 1), (3, 1)]


def test_explicit_pin_checkpoint_dir_wins_over_preexisting(spark, pin_mode, tmp_path):
    """The documented spark.counsel.pin.checkpointDir conf must take
    precedence over a checkpoint dir the session already set for other
    purposes (r12 advice: it was silently ignored)."""
    from counsel_data_pipeline_spark.ops.materialize import _ensure_checkpoint_dir

    sc = spark.sparkContext
    other = str(tmp_path / "other")
    explicit = str(tmp_path / "pin")
    sc.setCheckpointDir(other)
    spark.conf.set("spark.counsel.pin.checkpointDir", explicit)
    try:
        _ensure_checkpoint_dir(_df(spark))
        current = sc._jsc.sc().getCheckpointDir().get()
        assert explicit.lstrip("/") in current, current
        assert "other" not in current, current
    finally:
        spark.conf.unset("spark.counsel.pin.checkpointDir")


def test_reliable_tempdir_fallback_refused_on_nonlocal_master(spark, tmp_path, monkeypatch):
    """With no checkpoint dir configured anywhere, 'reliable' mode must
    refuse a driver-local tempdir default on a non-local master: a
    tempdir is not shared storage, so executor loss would still lose
    checkpoint blocks and the mode's guarantee would silently not hold
    (r12 advice, medium)."""
    from counsel_data_pipeline_spark.ops import materialize as mat

    df = _df(spark)
    sc = spark.sparkContext
    # simulate an unset checkpoint dir + a cluster master without
    # touching the live session: stub the two lookups the guard reads
    class _NoneOpt:
        def isDefined(self):
            return False

    class _FakeScalaSc:
        def getCheckpointDir(self):
            return _NoneOpt()

    class _FakeJsc:
        def sc(self):
            return _FakeScalaSc()

    monkeypatch.setattr(sc, "_jsc", _FakeJsc(), raising=False)
    monkeypatch.setattr(sc, "master", "spark://host:7077", raising=False)
    with pytest.raises(ValueError, match="SHARED checkpoint directory"):
        mat._ensure_checkpoint_dir(df)
    # ...and an explicit conf satisfies the guard even on a cluster
    calls = []
    monkeypatch.setattr(sc, "setCheckpointDir", lambda d: calls.append(d))
    spark.conf.set("spark.counsel.pin.checkpointDir", str(tmp_path / "shared"))
    try:
        mat._ensure_checkpoint_dir(df)
        assert calls == [str(tmp_path / "shared")]
    finally:
        spark.conf.unset("spark.counsel.pin.checkpointDir")
