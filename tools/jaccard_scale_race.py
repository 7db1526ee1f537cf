"""Scale race for the three exact-Jaccard strategies on a boilerplate-
polluted corpus — the pathology that separates them.

Corpus: the sf documents table with a fixed 20-token boilerplate sentence
appended to EVERY document (the web-scrape reality: shared footers,
cookie banners, license blurbs). That plants ~19 shingles whose document
frequency is the corpus size n, so:

  - uncapped shingle self-join (`jaccard_pairs(max_shingle_df=None)`):
    each hot shingle contributes C(n,2) join rows — O(n^2) blow-up.
  - df-capped (`max_shingle_df=1000`): hot shingles dropped before the
    join — bounded, but the shingle universe changes (consistent-universe
    jaccard over rare shingles only).
  - prefix filter (`jaccard_prefix_pairs`): hot shingles sort LAST in
    every document's ascending-df order, so they never enter any prefix —
    bounded like the cap, EXACT like the uncapped join.

The script times all three (full evaluation via count()) and verifies the
prefix result equals the uncapped result pair-for-pair. Boilerplate
shifts true Jaccard DOWN for unrelated docs (shared shingles are a small
fraction of the union), so the qualifying pair set stays near the clean
corpus's — the race measures candidate-generation cost, not answer size.

  python tools/jaccard_scale_race.py [sf_dir]   # default /root/testdata/sf0.1
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

BOILER = (
    "this website uses cookies to improve your experience "
    "please review our privacy policy and terms of service before continuing"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("jaccard-scale-race")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.concat_ws(" ", "text", F.lit(BOILER)).alias("text"))
        .persist()
    )
    n = docs.count()
    print(f"# corpus: {n} docs, every one carrying the {len(BOILER.split())}-token boilerplate", file=sys.stderr)

    def race(label, fn):
        # collect the pair keys as the forcing action so the later
        # losslessness comparison reuses them — re-evaluating the
        # deliberately pathological uncapped join from cold just for the
        # comparison would roughly double the tool's wall time
        t0 = time.time()
        pairs = {
            (r.id_a, r.id_b) for r in fn().select("id_a", "id_b").collect()
        }
        dt = round(time.time() - t0, 2)
        print(f"{label}: {dt}s, {len(pairs)} pairs", file=sys.stderr)
        spark.catalog.clearCache()
        docs.persist().count()
        return dt, pairs

    t_un, un = race(
        "uncapped  (shingle self-join, O(n^2) on hot shingles)",
        lambda: td.jaccard_pairs(docs, n=3, threshold=0.5, max_shingle_df=None),
    )
    t_cap, cap = race(
        "df-capped (max_shingle_df=1000, rare-shingle universe)",
        lambda: td.jaccard_pairs(docs, n=3, threshold=0.5, max_shingle_df=1000),
    )
    t_pf, pf = race(
        "prefix    (AllPairs filter, exact)",
        lambda: td.jaccard_prefix_pairs(docs, n=3, t_num=1, t_den=2),
    )
    n_un, n_cap, n_pf = len(un), len(cap), len(pf)
    # losslessness on the polluted corpus too
    assert un == pf, f"prefix != uncapped: {len(un ^ pf)} differing pairs"
    print(
        '{"metric": "jaccard_scale_race", '
        f'"n_docs": {n}, '
        f'"uncapped_sec": {t_un}, "capped_sec": {t_cap}, "prefix_sec": {t_pf}, '
        f'"uncapped_pairs": {n_un}, "capped_pairs": {n_cap}, "prefix_pairs": {n_pf}, '
        '"prefix_equals_uncapped": true}'
    )


if __name__ == "__main__":
    main()
