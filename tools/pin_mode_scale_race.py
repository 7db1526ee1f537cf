"""Pin-MODE race at scale for the pin-heaviest catalog query,
`graph_pagerank_copurchase` (three loop-pinned rank iterations over a
persisted edge list — the most pin traffic of any plan): wall-clock for
``spark.counsel.pin.mode`` ∈ {local, reliable, persist} at base input
and at a k×-replicated input, with rank vectors asserted IDENTICAL
across modes at both scales (the arithmetic is scaled-integer exact, so
equality is bitwise, not approximate).

The race calls the SHIPPED plan body (`plans/graph.
pagerank_copurchase_plan`) — not a copy — on a k×-grown lineitem laid
out exactly like a testdata sf dir. Growth model: k disjoint graph
copies (orderkey AND partkey shifted per copy), so nodes and edges both
grow k-fold — the pinned per-iteration rank frame grows k-fold too,
which is precisely the traffic the three modes price differently
(local = executor-local blocks, reliable = checkpoint-dir write+read,
persist = 2×-replicated cache build).

What this measures (and the docstring guidance it turns into numbers):
on one box a "reliable" checkpoint is a local-disk write, so its
single-node cost is the serialize+write of each node-sized rank frame;
persist pays a replicated cache build; local pays executor-block
storage only. On a real cluster reliable adds the HDFS/S3 round-trip —
that network tax is not measurable here, but the VOLUME it applies to
(node-sized frames, never the edge list) is what the k× run pins.

  python tools/pin_mode_scale_race.py [sf_dir] [k]
  # defaults: /root/testdata/sf0.1, k=10
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.plans.graph import pagerank_copurchase_plan
from counsel_data_pipeline_spark.session import get_spark

MODES = ("local", "reliable", "persist")


def replicate_lineitem(spark, sf_dir: str, k: int, out_dir: str) -> None:
    """Write a k×-replicated lineitem as <out_dir>/lineitem.parquet:
    copy i shifts l_orderkey and l_partkey by i*OFFSET, producing k
    DISJOINT co-purchase graphs (k× nodes, k× edges — duplicate edges
    would be collapsed by the plan's distinct and grow nothing)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    mx = li.agg(
        F.max("l_orderkey").alias("mo"), F.max("l_partkey").alias("mp")
    ).first()
    off_o, off_p = int(mx["mo"]) + 1, int(mx["mp"]) + 1
    copies = li.crossJoin(
        spark.range(k).select(F.col("id").alias("__copy"))
    ).select(
        (F.col("l_orderkey") + F.col("__copy") * off_o).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("__copy") * off_p).alias("l_partkey"),
    )
    copies.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))


def ranks(spark, sf_dir: str, mode: str, ckpt_dir: str) -> tuple[list, float]:
    spark.conf.set("spark.counsel.pin.mode", mode)
    spark.conf.set("spark.counsel.pin.checkpointDir", ckpt_dir)
    try:
        t0 = time.time()
        df = pagerank_copurchase_plan(spark, sf_dir)
        rows = [tuple(r) for r in df.orderBy(*df.columns).collect()]
        return rows, time.time() - t0
    finally:
        spark.conf.unset("spark.counsel.pin.mode")
        spark.conf.unset("spark.counsel.pin.checkpointDir")
        spark.catalog.clearCache()


def race(spark, sf_dir: str, label: str, ckpt_dir: str) -> None:
    # warm untimed (codegen/JIT + parquet footers), then two
    # alternation-cancelled timed rounds per mode; keep the best
    ranks(spark, sf_dir, "local", ckpt_dir)
    results: dict[str, list] = {}
    best: dict[str, float] = {m: float("inf") for m in MODES}
    for _ in range(2):
        for m in MODES:
            rows, t = ranks(spark, sf_dir, m, ckpt_dir)
            results[m] = rows
            best[m] = min(best[m], t)
    base = results["local"]
    for m in MODES[1:]:
        assert results[m] == base, (
            f"{label}: mode {m} diverged from local "
            f"({results[m][:2]} vs {base[:2]})"
        )
    n = len(base)
    print(
        f"{label}: {n} ranked nodes — "
        + "; ".join(f"{m} {best[m]:.2f}s" for m in MODES)
        + f"; reliable/local {best['reliable'] / best['local']:.2f}x, "
        f"persist/local {best['persist'] / best['local']:.2f}x; "
        "rank vectors identical across modes"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("pin-mode-race")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="pin-mode-race-")
    try:
        ckpt = os.path.join(tmp, "ckpt")
        race(spark, sf_dir, "base", ckpt)
        big = os.path.join(tmp, "big")
        replicate_lineitem(spark, sf_dir, k, big)
        race(spark, big, f"{k}x", ckpt)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
