"""Scale race for IVF ANN (`ops/similarity.ivf_topk`): pairs SCORED per
query vs exact brute force, under corpus replication, with recall@k
measured against the exact answer on the same corpus.

Growth model: k perturbed corpus copies (copy i gets fresh ids and a
deterministic per-component nudge, so clones are near- but not exact
duplicates). Per query:

  - brute force scores N-1 pairs — linear in the corpus, the 100 TB
    killer;
  - IVF with a FIXED cell count scores ~(n_probe/n_centroids)·N — a
    constant fraction, better but still linear;
  - IVF with sqrt(N)-scaled cells (the classic nlist ≈ √N rule) scores
    ~n_probe·√N — sublinear per-query work, the configuration that
    survives corpus growth.

The race prints, at base and replicated scale: pairs scored per query
for all three, wall times, and IVF recall@10 against the exact top-10
on the SAME corpus (computed Spark-vs-Spark; no oracle needed).

  python tools/ann_scale_race.py [sf_dir] [k]
  # defaults: /root/testdata/sf0.1, k=10
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops import similarity as sim
from counsel_data_pipeline_spark.session import get_spark

QUERY_IDS = [3, 17, 42, 99, 123, 256, 404, 512, 777, 901]


def replicate_perturbed(emb: DataFrame, k: int, n: int) -> DataFrame:
    """k corpus copies: copy i shifts ids by i*n and nudges every
    component by a deterministic, id-dependent epsilon."""
    copies = emb.crossJoin(
        emb.sparkSession.range(k).select(F.col("id").alias("__copy"))
    )
    return copies.select(
        (F.col("vec_id") + F.col("__copy") * n).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CAST(x AS DOUBLE)"
            " + __copy * 0.0003D * ((vec_id + i) % 5))"
        ).alias("embedding"),
    )


def ivf_candidates_per_query(
    emb: DataFrame, n_centroids: int, n_probe: int
) -> float:
    """Mean pairs an IVF query scores: sum of its probe cells' sizes."""
    e = emb.select(
        F.col("vec_id").alias("__id"),
        sim.as_double_array(F.col("embedding")).alias("__v"),
    ).withColumn("__norm", sim.l2_norm(F.col("__v")))
    cents = sim.lowest_id_centroids(e, n_centroids)
    sizes = (
        sim._nearest_cells(e, cents, 1, "__cell")
        .groupBy("__cell")
        .count()
        .withColumnRenamed("__cell", "cell")
    )
    probes = sim._nearest_cells(
        e.filter(F.col("__id").isin(QUERY_IDS)), cents, n_probe, "__qcell"
    ).select(F.col("__id"), F.col("__qcell").alias("cell"))
    tot = (
        probes.join(sizes, "cell")
        .groupBy("__id")
        .agg(F.sum("count").alias("c"))
        .agg(F.avg("c"))
        .collect()
    )[0][0]
    return float(tot)


def recall_at_k(exact: DataFrame, approx: DataFrame, k: int = 10) -> float:
    ex = {}
    for r in exact.collect():
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    ap = {}
    for r in approx.collect():
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    return sum(len(ex[q] & ap.get(q, set())) for q in ex) / (k * len(ex))


def run(emb: DataFrame, label: str) -> None:
    n = emb.count()
    sqrt_cells = max(16, 2 ** int(round(math.log2(math.sqrt(n)))))

    t0 = time.time()
    exact = sim.cosine_topk(emb, QUERY_IDS, k=10).persist()
    exact.count()
    t_exact = time.time() - t0

    results = [f"{label}: corpus {n} — brute force {n - 1} pairs/query "
               f"({t_exact:.2f}s)"]
    for cfg, cells in (("fixed 16 cells", 16), (f"sqrt-scaled {sqrt_cells} cells", sqrt_cells)):
        cands = ivf_candidates_per_query(emb, cells, 4)
        t0 = time.time()
        approx = sim.ivf_topk(emb, QUERY_IDS, k=10, n_centroids=cells, n_probe=4)
        rec = recall_at_k(exact, approx)
        t_ivf = time.time() - t0
        results.append(
            f"  IVF {cfg}, probe 4: {cands:.0f} pairs/query "
            f"({cands / max(n - 1, 1):.1%} of corpus), recall@10 "
            f"{rec:.2f} ({t_ivf:.2f}s)"
        )
    exact.unpersist()
    print("\n".join(results))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ann-scale-race")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()

    base = emb.persist()
    run(base, "base corpus")
    big = replicate_perturbed(base, k, n).persist()
    run(big, f"{k}x perturbed corpus")
    base.unpersist()
    big.unpersist()
    print(
        "# brute force is linear per query; fixed-cell IVF is a constant "
        "fraction (still linear); sqrt-scaled cells make per-query work "
        "~n_probe*sqrt(N) — the configuration that survives 100 TB"
    )
    spark.stop()


if __name__ == "__main__":
    main()
