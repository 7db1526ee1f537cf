"""Scale race for the blocked edit-distance dedup's 64-doc block cap on a
template-prefix-polluted corpus — the pathology the cap exists for.

Corpus: the sf documents table with a fixed 12+-char template PREFIX
prepended to every document ("FORM-LETTER: ..." — the mail-merge /
boilerplate-header reality). Every doc then lands in ONE normalized-
prefix block, so:

  - uncapped prefix blocking (max_block=None equivalent: cap set above
    the corpus size): the single block contributes C(n,2) candidate
    pairs, each paying a banded-DP verification — O(n^2) blow-up, the
    quadratic join the blocking was supposed to prevent;
  - capped (max_block=64, the query's default): the template block is
    dropped before the self-join — candidate count collapses to 0 on
    the polluted corpus, bounded at C(64,2) per block on ANY corpus.

The cap is part of the query semantics (the oracle mirrors it with a
HAVING count(*) <= 64 CTE), so capped vs uncapped differ in ANSWER as
well as cost on this corpus — the point is the COST boundary: candidate
volume, not wall time on a warm little box, is what kills the 100 TB
run. The script prints candidate-pair counts and wall times for both.

  python tools/levenshtein_scale_race.py [sf_dir]  # default /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops import text_dedup as td
from counsel_data_pipeline_spark.session import get_spark

TEMPLATE = "FORM-LETTER 2026 district office: "


def candidate_count(docs, max_block: int) -> int:
    """Candidate pairs AFTER blocking + length filter, BEFORE the DP —
    the quantity the cap bounds (computed without paying the DP)."""
    k = docs.select(
        F.col("doc_id").alias("id"),
        F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")).alias("nt"),
    ).select(
        "id",
        F.substring("nt", 1, 12).alias("bk"),
        F.length("nt").cast("bigint").alias("ln"),
    )
    small = (
        k.groupBy("bk")
        .agg(F.count(F.lit(1)).alias("n_blk"))
        .filter(F.col("n_blk") <= max_block)
        .select("bk")
    )
    k = k.join(F.broadcast(small), "bk")
    a = k.select(F.col("id").alias("id_a"), F.col("ln").alias("len_a"), "bk")
    b = k.select(F.col("id").alias("id_b"), F.col("ln").alias("len_b"), "bk")
    return (
        a.join(b, "bk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= 40)
        )
        .count()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("levenshtein-scale-race")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.concat(F.lit(TEMPLATE), F.col("text")).alias("text"))
        .persist()
    )
    n = docs.count()
    print(f"# corpus: {n} docs, every one behind the shared "
          f"{len(TEMPLATE)}-char template prefix", file=sys.stderr)

    for label, cap in (("capped (max_block=64)", 64),
                       ("uncapped (cap > corpus)", n + 1)):
        t0 = time.time()
        cands = candidate_count(docs, cap)
        t_c = time.time() - t0
        t0 = time.time()
        pairs = td.levenshtein_blocked_pairs(docs, max_block=cap).count()
        t_p = time.time() - t0
        print(
            f"{label}: {cands} candidate pairs ({t_c:.2f}s), "
            f"{pairs} qualifying pairs after the DP ({t_p:.2f}s)"
        )

    docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
