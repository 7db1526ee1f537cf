"""Deduplication query plans over `documents` — ops/text_dedup.py surfaced
through the driver contract.

Every family is fully ORACLE-checked since round 2: MinHash-LSH and
SimHash moved from xxhash64 (no DuckDB twin — they registered rows-only
in round 1) to the md5-affine hash family in ops/text_dedup.py, whose
every step — md5 word extraction, affine mod-2^32 hashes, band keys,
tallies, popcounts — is exact integer arithmetic both engines reproduce
bit-for-bit. The SQL twins are generated below from the SAME coefficient
table the Spark plans use (td.mh_coeffs), so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.catalog import register
from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops import text_dedup as td

_SQL_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"


def _minhash_lsh_oracle(n_hashes: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    """DuckDB twin of td.minhash_lsh_pairs (3-gram shingles, md5-affine)."""
    rows = n_hashes // bands
    w1, w2 = td.sql_md5_words("shingle")
    hs = ",\n                 ".join(
        f"min(({a} * w1 + {b} * w2 + {c}) % 4294967296) AS h{i}"
        for i, (a, b, c) in enumerate(td.mh_coeffs(n_hashes))
    )
    band_rows = "\n          UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, concat_ws(','"
        + "".join(f", h{b * rows + r}" for r in range(rows))
        + f") AS bucket, {', '.join(f'h{i}' for i in range(n_hashes))} FROM sig"
        for b in range(bands)
    )
    est = " + ".join(
        f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(n_hashes)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex({_SQL_NORM}, ' ') AS t FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(t) - 1),
                        i -> array_to_string(t[i:i+2], ' '))) AS shingle
          FROM toks
        ),
        w AS (SELECT doc_id, {w1} AS w1, {w2} AS w2 FROM sh),
        sig AS (
          SELECT doc_id,
                 {hs}
          FROM w GROUP BY doc_id
        ),
        banded AS (
          {band_rows}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 ({est}) / {float(n_hashes)} AS est_jaccard
          FROM banded a JOIN banded b USING (band, bucket)
          WHERE a.doc_id < b.doc_id
        ),
        shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
        sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM shd a JOIN shd b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT c.id_a, c.id_b, c.est_jaccard,
               CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
        FROM cand c
        JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        JOIN sizes sa ON sa.doc_id = c.id_a
        JOIN sizes sb ON sb.doc_id = c.id_b
        WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= {threshold}
    """


def _simhash_oracle(max_hamming: int = 5) -> str:
    """DuckDB twin of td.simhash_pairs (1-gram tokens, md5-word voting)."""
    chunks = max_hamming + 1
    width = 64 // chunks
    w1, w2 = td.sql_md5_words("shingle")
    tallies = ",\n                 ".join(
        "sum(CASE WHEN ({src} >> {sh}) & 1 = 1 THEN 1 ELSE -1 END) AS t{b}".format(
            src="w1" if b < 32 else "w2", sh=b % 32, b=b
        )
        for b in range(64)
    )
    lo = " + ".join(f"(CASE WHEN t{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32))
    hi = " + ".join(
        f"(CASE WHEN t{32 + b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32)
    )

    def chunk_expr(c: int) -> str:
        lo_bit, hi_bit = c * width, (c + 1) * width
        mask = (1 << width) - 1
        if hi_bit <= 32:
            return f"(sig_lo >> {lo_bit}) & {mask}"
        if lo_bit >= 32:
            return f"(sig_hi >> {lo_bit - 32}) & {mask}"
        n_lo = 32 - lo_bit
        return (
            f"((sig_lo >> {lo_bit}) & {(1 << n_lo) - 1})"
            f" + ((sig_hi & {(1 << (width - n_lo)) - 1}) * {1 << n_lo})"
        )

    band_rows = "\n          UNION ALL ".join(
        f"SELECT doc_id, sig_lo, sig_hi, {c} AS chunk, {chunk_expr(c)} AS bucket FROM sig"
        for c in range(chunks)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex({_SQL_NORM}, ' ') AS t FROM documents
        ),
        sh AS (SELECT doc_id, unnest(t) AS shingle FROM toks),
        w AS (SELECT doc_id, {w1} AS w1, {w2} AS w2 FROM sh),
        t AS (
          SELECT doc_id,
                 {tallies}
          FROM w GROUP BY doc_id
        ),
        sig AS (SELECT doc_id, {lo} AS sig_lo, {hi} AS sig_hi FROM t),
        banded AS (
          {band_rows}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.sig_lo AS la, a.sig_hi AS ha, b.sig_lo AS lb, b.sig_hi AS hb
          FROM banded a JOIN banded b USING (chunk, bucket)
          WHERE a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, hamming FROM (
          SELECT id_a, id_b,
                 bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS hamming
          FROM cand
        ) WHERE hamming <= {max_hamming}
    """


@register(
    "dedup_exact_content_hash",
    oracle=f"""
        SELECT md5({_SQL_NORM}) AS content_hash,
               min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    description="exact dedup: md5 of normalized text, deterministic min-id survivor",
    tags=("llm", "dedup"),
    bench=True,
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return td.exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard_pairs",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex({_SQL_NORM}, ' ') AS t FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t) - 1),
                        i -> array_to_string(t[i:i+2], ' '))) AS shingle
          FROM toks
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, inter,
               sa.sz AS size_a, sb.sz AS size_b,
               CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
    """,
    description="exact 3-gram Jaccard near-dup pairs (shingle self-join, jaccard ≥ 0.5)",
    tags=("llm", "dedup"),
)
def jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_shingle_df=None: plain exact Jaccard, the exact-oracle twin of
    # dedup_ngram_jaccard_capped (the attested + benched production path).
    return td.jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.5, max_shingle_df=None
    )


@register(
    "dedup_ngram_jaccard_capped",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex({_SQL_NORM}, ' ') AS t FROM documents
        ),
        sh_all AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t) - 1),
                        i -> array_to_string(t[i:i+2], ' '))) AS shingle
          FROM toks
        ),
        rare AS (
          SELECT shingle FROM sh_all GROUP BY shingle HAVING count(*) <= 5
        ),
        sh AS (SELECT sh_all.* FROM sh_all JOIN rare USING (shingle)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, inter,
               sa.sz AS size_a, sb.sz AS size_b,
               CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
    """,
    description=(
        "df-capped 3-gram Jaccard near-dup pairs — the scale-safe production "
        "path: ubiquitous shingles (df > cap) are dropped before the shingle "
        "self-join, bounding the candidate blow-up a hot shingle causes at "
        "100 TB. The cap is deterministic (a plain HAVING over shingle df), "
        "so the full pipeline is hash-attested; the catalog pins cap=5 so "
        "the guard genuinely drops shingles at test scale (max df at sf0.01 "
        "is 7) — production default is 1000 (ops/text_dedup.jaccard_pairs)."
    ),
    tags=("llm", "dedup"),
    bench=True,
)
def jaccard_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return td.jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.5, max_shingle_df=5
    )


@register(
    "dedup_jaccard_prefix_filter",
    oracle=f"""
        -- DELIBERATELY the plain exact-Jaccard pipeline (same SQL as
        -- dedup_ngram_jaccard_pairs): the Spark side generates
        -- candidates from document PREFIXES only (rarest ceil-filtered
        -- slice under the global df order), so the green hash row
        -- attests the AllPairs prefix-filter completeness theorem
        -- itself — the pruned join provably drops no qualifying pair.
        WITH toks AS (
          SELECT doc_id, string_split_regex({_SQL_NORM}, ' ') AS t FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t) - 1),
                        i -> array_to_string(t[i:i+2], ' '))) AS shingle
          FROM toks
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, inter,
               sa.sz AS size_a, sb.sz AS size_b,
               CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
    """,
    description=(
        "exact 3-gram Jaccard pairs via PREFIX FILTERING (AllPairs/PPJoin "
        "family): shingles globally ordered by ascending document "
        "frequency, each doc indexes only its first |x|-ceil(t|x|)+1 — "
        "the LOSSLESS scale path between the uncapped join (exact, "
        "skew-fragile) and the df cap (bounded, drops pairs): candidates "
        "anchor on each doc's rarest shingles so hot-shingle blocks never "
        "enter the join, yet the theorem guarantees the full answer; the "
        "oracle recomputes with the naive all-shared-shingle join, so the "
        "green row certifies losslessness across engines"
    ),
    tags=("llm", "dedup"),
    bench=True,
)
def jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: three bounded shuffles (shingle df count, per-doc
    rank, prefix equi-join) replace the raw shingle self-join whose cost
    is sum(df^2) over ALL shingles — prefix blocks are capped by
    construction at the rare end of the df distribution, and the exact
    integer length filter (t*max <= min) prunes before verification.
    Verification joins only candidate pairs against the full shingle
    sets — O(candidates x doc size), the AllPairs bound. At 100 TB the
    df table is corpus metadata (shingle cardinality), the global order
    is a property of the corpus, and incremental ingest reuses it.
    Cites Bayardo et al., 'Scaling Up All Pairs Similarity Search',
    WWW 2007 (public algorithm)."""
    return td.jaccard_prefix_pairs(
        load_table(spark, sf_dir, "documents"), n=3, t_num=1, t_den=2
    )


@register(
    "dedup_minhash_lsh_pairs",
    oracle=_minhash_lsh_oracle(n_hashes=16, bands=4, threshold=0.5),
    description="MinHash(16)+LSH(4 bands) candidate pairs, exact-jaccard verified ≥ 0.5 (md5-affine family, full oracle)",
    tags=("llm", "dedup"),
    bench=True,
)
def minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return td.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        n=3, n_hashes=16, bands=4, verify_threshold=0.5,
    ).orderBy("id_a", "id_b")


@register(
    "dedup_simhash_pairs",
    oracle=_simhash_oracle(max_hamming=5),
    description="64-bit SimHash near-dup pairs within Hamming distance 5 (pigeonhole banding, md5-word voting, full oracle)",
    tags=("llm", "dedup"),
)
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return td.simhash_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=5
    ).orderBy("id_a", "id_b")


@register(
    "dedup_connected_clusters",
    oracle=f"""
        WITH RECURSIVE toks AS (
          SELECT doc_id, string_split_regex({_SQL_NORM}, ' ') AS t FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t) - 1),
                        i -> array_to_string(t[i:i+2], ' '))) AS shingle
          FROM toks
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT id_a, id_b
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs
          UNION SELECT id_a, id_a FROM pairs
          UNION SELECT id_b, id_b FROM pairs
        ),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        comp AS (
          SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
        )
        SELECT doc_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM comp
    """,
    description="near-dup pairs closed into dedup clusters: iterative min-label "
    "connected components (oracle: recursive-CTE transitive closure)",
    tags=("llm", "dedup", "iterative"),
)
def connected_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from counsel_data_pipeline_spark.ops.clusters import dedup_clusters

    pairs = td.jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.5, max_shingle_df=None
    ).select("id_a", "id_b")
    return dedup_clusters(pairs)


@register(
    "dedup_embedding_cosine_topn",
    oracle="""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
          -- zero-norm vectors excluded: cosine undefined (matches the
          -- Spark op's norm > 0 filter)
          SELECT vec_id, v, nrm FROM (
            SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
          ) WHERE nrm > 0
        ),
        s AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
          FROM n a JOIN n b ON a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, cosine, rank FROM (
          SELECT *, row_number() OVER (ORDER BY cosine DESC, id_a, id_b) AS rank
          FROM s
        ) WHERE rank <= 50
    """,
    description="embedding-cosine near-dup: top-50 most-similar pairs, exact all-pairs baseline",
    tags=("llm", "dedup", "similarity"),
    # benched since r2 so regressions in the exact fold are visible
    # per-query (r1 note: ~15 s at sf0.1 — the cost is the genuine
    # all-pairs O(n²·dim) fold; the gated LSH path is the scale answer)
    bench=True,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from counsel_data_pipeline_spark.ops import similarity as sim

    return sim.near_dup_pairs_topn(load_table(spark, sf_dir, "embeddings"), top_n=50)


@register(
    "dedup_fuzzy_fingerprint_block",
    oracle=f"""
        -- fuzzy dedup: winnowing-fingerprint blocking (docs sharing their
        -- minimum 5-gram md5) then exact edit-distance verification —
        -- blocking makes the quadratic levenshtein run on O(candidates).
        WITH t AS (
          SELECT doc_id, {_SQL_NORM} AS norm,
                 string_split_regex({_SQL_NORM}, ' ') AS tok
          FROM documents
        ),
        fp AS (
          SELECT doc_id, norm,
                 list_min(list_transform(range(1, len(tok) - 3),
                          i -> md5(array_to_string(tok[i:i+4], ' ')))) AS fp
          FROM t
        ),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.norm AS na, b.norm AS nb
          FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b,
               levenshtein(na, nb) AS edit_dist,
               length(na) AS len_a, length(nb) AS len_b
        FROM cand
        WHERE levenshtein(na, nb) <= 40
    """,
    description="fuzzy near-dup pairs: min-shingle fingerprint blocking + levenshtein verify",
    tags=("llm", "dedup", "fuzzy"),
)
def fuzzy_fingerprint_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    from counsel_data_pipeline_spark.ops import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    norm = ta.norm_text(F.col("text"))
    fp = docs.select(
        "doc_id",
        norm.alias("norm"),
        ta.shingle_fingerprint(norm, n=5).alias("fp"),
    )
    a = fp.select(
        F.col("doc_id").alias("id_a"), F.col("norm").alias("na"), "fp"
    )
    b = fp.select(
        F.col("doc_id").alias("id_b"), F.col("norm").alias("nb"), "fp"
    )
    cand = a.join(b, "fp").filter(F.col("id_a") < F.col("id_b"))
    return (
        cand.withColumn("edit_dist", F.levenshtein("na", "nb"))
        .filter(F.col("edit_dist") <= 40)
        .select(
            "id_a", "id_b", "edit_dist",
            F.length("na").alias("len_a"), F.length("nb").alias("len_b"),
        )
    )


@register(
    "llm_dedup_pipeline",
    oracle=f"""
        -- the complete dedup chain as one statement: exact dedup by
        -- normalized-content md5 (min-id survivor), then near-dup
        -- clustering (3-gram Jaccard >= 0.5, transitive closure) over the
        -- exact survivors, then per-lang corpus accounting.
        WITH RECURSIVE docs0 AS (
          SELECT doc_id, lang, {_SQL_NORM} AS nt FROM documents
        ),
        exact AS (
          SELECT min(doc_id) AS doc_id FROM docs0 GROUP BY md5(nt)
        ),
        surv AS (
          SELECT d.doc_id, d.lang, string_split_regex(d.nt, ' ') AS t
          FROM docs0 d JOIN exact USING (doc_id)
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t) - 1),
                        i -> array_to_string(t[i:i+2], ' '))) AS shingle
          FROM surv
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT id_a, id_b
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs
          UNION SELECT id_a, id_a FROM pairs
          UNION SELECT id_b, id_b FROM pairs
        ),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        comp AS (
          SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
        ),
        dropped AS (
          -- min-label cluster_id IS the component's min doc id, i.e. the
          -- canonical survivor; every other member is removed.
          SELECT s.lang, count(*) AS n_near_dropped
          FROM comp c JOIN surv s USING (doc_id)
          WHERE c.doc_id <> c.cluster_id
          GROUP BY s.lang
        ),
        base AS (
          SELECT lang, count(*) AS n_docs FROM docs0 GROUP BY lang
        ),
        ex AS (
          SELECT lang, count(*) AS n_exact_unique FROM surv GROUP BY lang
        )
        SELECT b.lang, b.n_docs, e.n_exact_unique,
               COALESCE(d.n_near_dropped, 0) AS n_near_dropped,
               e.n_exact_unique - COALESCE(d.n_near_dropped, 0) AS n_final
        FROM base b
        JOIN ex e ON e.lang = b.lang
        LEFT JOIN dropped d ON d.lang = b.lang
    """,
    description="end-to-end dedup pipeline: exact md5 dedup → 3-gram-Jaccard "
    "near-dup clusters over survivors → per-lang in/exact/final accounting "
    "(oracle: recursive-CTE transitive closure)",
    tags=("llm", "dedup", "iterative"),
)
def dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from counsel_data_pipeline_spark.ops.clusters import dedup_clusters
    from counsel_data_pipeline_spark.ops.text_analysis import content_md5

    docs = td._spread(load_table(spark, sf_dir, "documents"))
    # Exact dedup: min-id survivor per normalized-content hash. min(struct)
    # orders by the leading field (doc_id), so one aggregate carries the
    # survivor's payload — no join back to the corpus.
    # Persisted: surv feeds the near-dup pair join, the dropped-count
    # join, and the per-lang unique counts; unmaterialized, each consumer
    # re-runs the scan + dedup shuffle (r11 scan audit). Released by LRU
    # eviction / bench clearCache — the same per-invocation cache
    # lifecycle as the other dedup-family persists.
    surv = (
        docs.groupBy(content_md5(F.col("text")).alias("__h"))
        .agg(F.min(F.struct("doc_id", "lang", "text")).alias("s"))
        .select("s.doc_id", "s.lang", "s.text")
        .persist()
    )
    pairs = td.jaccard_pairs(
        surv, n=3, threshold=0.5, max_shingle_df=None
    ).select("id_a", "id_b")
    clusters = dedup_clusters(pairs)
    dropped = (
        clusters.filter(F.col("doc_id") != F.col("cluster_id"))
        .join(surv.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_near_dropped"))
    )
    base = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    ex = surv.groupBy("lang").agg(F.count(F.lit(1)).alias("n_exact_unique"))
    return (
        base.join(ex, "lang")
        .join(dropped, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "n_exact_unique",
            F.coalesce(F.col("n_near_dropped"), F.lit(0).cast("long")).alias(
                "n_near_dropped"
            ),
            (
                F.col("n_exact_unique")
                - F.coalesce(F.col("n_near_dropped"), F.lit(0).cast("long"))
            ).alias("n_final"),
        )
    )


def _incremental_oracle(n_hashes: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    """DuckDB twin of td.incremental_dedup with new = odd doc_id."""
    rows = n_hashes // bands
    w1, w2 = td.sql_md5_words("shingle")
    hs = ",\n                 ".join(
        f"min(({a} * w1 + {b} * w2 + {c}) % 4294967296) AS h{i}"
        for i, (a, b, c) in enumerate(td.mh_coeffs(n_hashes))
    )
    band_rows = "\n          UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, concat_ws(','"
        + "".join(f", h{b * rows + r}" for r in range(rows))
        + f") AS bucket, {', '.join(f'h{i}' for i in range(n_hashes))} FROM sig"
        for b in range(bands)
    )
    est = " + ".join(
        f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(n_hashes)
    )
    return f"""
        WITH docs0 AS (
          SELECT doc_id, {_SQL_NORM} AS nt FROM documents
        ),
        hashes AS (SELECT doc_id, md5(nt) AS h FROM docs0),
        nw AS (SELECT doc_id, h FROM hashes WHERE doc_id % 2 = 1),
        ex AS (SELECT doc_id, h FROM hashes WHERE doc_id % 2 = 0),
        exact_ex AS (
          SELECT n.doc_id, min(e.doc_id) AS p
          FROM nw n JOIN ex e USING (h) GROUP BY n.doc_id
        ),
        exact_nw AS (
          SELECT b.doc_id, min(a.doc_id) AS p
          FROM nw a JOIN nw b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY b.doc_id
        ),
        toks AS (
          SELECT doc_id, string_split_regex(nt, ' ') AS t FROM docs0
        ),
        sh AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(t) - 1),
                        i -> array_to_string(t[i:i+2], ' '))) AS shingle
          FROM toks
        ),
        w AS (SELECT doc_id, {w1} AS w1, {w2} AS w2 FROM sh),
        sig AS (
          SELECT doc_id,
                 {hs}
          FROM w GROUP BY doc_id
        ),
        banded AS (
          {band_rows}
        ),
        cand AS (
          SELECT DISTINCT b.doc_id AS doc_id, a.doc_id AS id_a,
                 ({est}) / {float(n_hashes)} AS est
          FROM banded a JOIN banded b USING (band, bucket)
          WHERE b.doc_id % 2 = 1
            AND ((a.doc_id % 2 = 0 AND a.doc_id <> b.doc_id)
                 OR (a.doc_id % 2 = 1 AND a.doc_id < b.doc_id))
        ),
        near AS (
          SELECT doc_id,
                 min(CASE WHEN id_a % 2 = 0 THEN id_a END) AS pex,
                 min(CASE WHEN id_a % 2 = 1 THEN id_a END) AS pnw
          FROM cand WHERE est >= {threshold} GROUP BY doc_id
        )
        SELECT n.doc_id,
               CASE WHEN ee.p IS NOT NULL THEN 'exact_existing'
                    WHEN en.p IS NOT NULL THEN 'exact_new'
                    WHEN nr.pex IS NOT NULL THEN 'near_existing'
                    WHEN nr.pnw IS NOT NULL THEN 'near_new'
                    ELSE 'unique' END AS verdict,
               COALESCE(ee.p, en.p, nr.pex, nr.pnw, -1) AS dup_of
        FROM nw n
        LEFT JOIN exact_ex ee ON ee.doc_id = n.doc_id
        LEFT JOIN exact_nw en ON en.doc_id = n.doc_id
        LEFT JOIN near nr ON nr.doc_id = n.doc_id
    """


@register(
    "dedup_incremental_batch",
    oracle=_incremental_oracle(n_hashes=16, bands=4, threshold=0.5),
    description="cross-batch incremental dedup: odd-id docs (the 'new batch') "
    "judged against even-id docs (the 'existing corpus') + lower-id batchmates "
    "— exact md5 + MinHash band candidates, per-batch cost, never existing x existing",
    tags=("llm", "dedup", "incremental"),
    bench=True,
)
def incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return td.incremental_dedup(
        docs, is_new=(F.col("doc_id") % 2 == 1),
        n=3, n_hashes=16, bands=4, est_threshold=0.5,
    ).orderBy("doc_id")


def _duplicate_spans_oracle(k: int = 8) -> str:
    """DuckDB twin of td.duplicate_span_coverage: same norm/tokenize/shingle
    conventions as the MinHash oracle, 1-based positions (coverage lengths
    are position-shift invariant), identical interval-merge windowing."""
    return f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex({_SQL_NORM}, ' ') AS t FROM documents
        ),
        spans AS (
          -- same 60-bit md5-prefix span key as the Spark side: the span
          -- string never reaches the count/join, only its 8-byte hash
          SELECT doc_id, u.pos AS pos,
                 CAST(concat('0x', substr(md5(u.span), 1, 15)) AS BIGINT) AS sh
          FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t) - {k} + 2),
                          i -> struct_pack(pos := i,
                                           span := array_to_string(t[i:i+{k - 1}], ' ')))) AS u
            FROM toks
          )
        ),
        dup AS (
          SELECT sh FROM spans GROUP BY sh HAVING count(*) >= 2
        ),
        hits AS (
          SELECT s.doc_id, s.pos AS st, s.pos + {k} AS en
          FROM spans s JOIN dup USING (sh)
        ),
        flagged AS (
          SELECT doc_id, st, en,
                 CASE WHEN max(en) OVER w IS NULL OR st > max(en) OVER w
                      THEN 1 ELSE 0 END AS new_grp
          FROM hits
          WINDOW w AS (PARTITION BY doc_id ORDER BY st
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        grouped AS (
          SELECT doc_id, st, en,
                 sum(new_grp) OVER (PARTITION BY doc_id ORDER BY st
                                    ROWS UNBOUNDED PRECEDING) AS grp
          FROM flagged
        ),
        cov AS (
          SELECT doc_id, CAST(sum(covered) AS BIGINT) AS dup_tokens FROM (
            SELECT doc_id, grp, max(en) - min(st) AS covered
            FROM grouped GROUP BY doc_id, grp
          ) GROUP BY doc_id
        )
        SELECT tk.doc_id,
               len(tk.t) AS n_tokens,
               COALESCE(c.dup_tokens, 0) AS dup_tokens,
               CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / len(tk.t) AS dup_ratio
        FROM toks tk LEFT JOIN cov c USING (doc_id)
    """


@register(
    "dedup_duplicate_spans",
    oracle=_duplicate_spans_oracle(k=8),
    description="substring-level dedup audit (Lee et al. 2107.06499 at token "
    "granularity): per-doc token positions covered by a corpus-duplicated "
    "8-token span, via sliding k-grams + window interval-merge",
    tags=("llm", "dedup", "spans"),
    bench=True,
)
def duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return td.duplicate_span_coverage(docs, k=8)


@register(
    "dedup_keep_list",
    oracle=f"""
        -- the actionable dedup artifact: per-doc keep/drop verdict with
        -- canonical pointer and reason. Edges = jaccard pairs ∪ exact-hash
        -- star edges (the explicit exact edges cover docs shorter than the
        -- shingle width, which produce no jaccard pair); docs outside
        -- every pair are their own singleton cluster.
        WITH RECURSIVE toks AS (
          SELECT doc_id, string_split_regex({_SQL_NORM}, ' ') AS t FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t) - 1),
                        i -> array_to_string(t[i:i+2], ' '))) AS shingle
          FROM toks
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        near_pairs AS (
          SELECT id_a, id_b
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
        ),
        hashes AS (
          SELECT doc_id, md5({_SQL_NORM}) AS h FROM documents
        ),
        exact_pairs AS (
          SELECT m.id_a, hh.doc_id AS id_b
          FROM hashes hh
          JOIN (SELECT h, min(doc_id) AS id_a FROM hashes GROUP BY h) m
            ON m.h = hh.h
          WHERE hh.doc_id <> m.id_a
        ),
        pairs AS (
          SELECT id_a, id_b FROM near_pairs
          UNION SELECT id_a, id_b FROM exact_pairs
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs
          UNION SELECT id_a, id_a FROM pairs
          UNION SELECT id_b, id_b FROM pairs
        ),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        comp AS (
          SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
        ),
        assigned AS (
          SELECT hh.doc_id, hh.h, COALESCE(c.cluster_id, hh.doc_id) AS cluster_id
          FROM hashes hh LEFT JOIN comp c USING (doc_id)
        )
        SELECT a.doc_id,
               CASE WHEN a.doc_id = a.cluster_id THEN 'keep' ELSE 'drop' END AS verdict,
               CASE WHEN a.doc_id = a.cluster_id THEN CAST(-1 AS BIGINT)
                    ELSE a.cluster_id END AS dup_of,
               CASE WHEN a.doc_id = a.cluster_id THEN 'canonical'
                    WHEN a.h = b.h THEN 'exact' ELSE 'near' END AS reason
        FROM assigned a JOIN assigned b ON b.doc_id = a.cluster_id
    """,
    description="per-doc keep/drop list with canonical pointer and exact/near "
    "reason — the applied output of the near-dup cluster family",
    tags=("llm", "dedup"),
)
def keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Body shared with tests via ops/clusters.keep_list_frame."""
    from counsel_data_pipeline_spark.ops.clusters import keep_list_frame

    return keep_list_frame(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_containment_pairs",
    # no df cap (mirrors the jaccard registration): the capped variant is
    # the production path; the oracle checks the exact uncapped score
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex({_SQL_NORM}, ' ') AS t FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t) - 1),
                        i -> array_to_string(t[i:i+2], ' '))) AS shingle
          FROM toks
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, inter,
               sa.sz AS size_a, sb.sz AS size_b,
               CAST(inter AS DOUBLE) / least(sa.sz, sb.sz) AS containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / least(sa.sz, sb.sz) >= 0.8
    """,
    description="asymmetric near-dup (Broder containment): pairs where the "
    "smaller 3-gram shingle set is >= 80% contained in the larger — catches "
    "sub-document duplication (a paragraph pasted into a longer doc) that "
    "Jaccard's inter/union score misses; same candidate machinery and skew "
    "guards as the jaccard path",
    tags=("llm", "dedup"),
)
def containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return td.containment_pairs(
        load_table(spark, sf_dir, "documents"),
        n=3,
        threshold=0.8,
        max_shingle_df=None,
    )


@register(
    "dedup_containment_prefix_filter",
    oracle=f"""
        -- DELIBERATELY the same naive shared-shingle pipeline as
        -- dedup_containment_pairs: the Spark side generates candidates
        -- from prefix(smaller) x FULL(larger) under the global df
        -- order, so the green hash row attests the one-sided prefix
        -- completeness theorem for the asymmetric measure.
        WITH toks AS (
          SELECT doc_id, string_split_regex({_SQL_NORM}, ' ') AS t FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t) - 1),
                        i -> array_to_string(t[i:i+2], ' '))) AS shingle
          FROM toks
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, inter,
               sa.sz AS size_a, sb.sz AS size_b,
               CAST(inter AS DOUBLE) / least(sa.sz, sb.sz) AS containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / least(sa.sz, sb.sz) >= 0.8
    """,
    description=(
        "exact containment pairs via one-sided prefix filtering — the "
        "lossless bounded path for the ASYMMETRIC near-dup measure: the "
        "smaller doc's rarest-shingle prefix must intersect the larger "
        "doc's full set (C >= t bounds overlap by the smaller side only), "
        "so candidates are prefix(smaller) x full(larger) with the "
        "positional filter carried over; hot corpus-wide shingles have "
        "~zero prefix-side df, bounding the join the way the df cap does "
        "WITHOUT dropping pairs — the oracle recomputes with the naive "
        "all-shared-shingle join, certifying losslessness across engines"
    ),
    tags=("llm", "dedup"),
    bench=True,
)
def containment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: join cost is sum over shingles of prefix_df x
    full_df — boilerplate shingles (df = n on the full side) carry ~0
    prefix-side df, so the product stays bounded where the naive join
    pays n^2; verification probes per-doc shingle-set arrays (doc-sized
    joins, no shingle re-explode). Same funnel discipline as
    jaccard_prefix_pairs (prefix -> positional -> distinct -> exact
    verify), adapted to the one-sided bound ceil(t * |smaller|).
    Cites Bayardo et al. WWW'07 for the prefix principle; the
    containment adaptation indexes the full set on the probe side."""
    return td.containment_prefix_pairs(
        load_table(spark, sf_dir, "documents"), n=3, t_num=4, t_den=5
    )


@register(
    "dedup_levenshtein_blocked",
    oracle=f"""
        -- Edit-distance near-dups over prefix-blocked candidates.
        -- The block (12-char normalized prefix, blocks capped at 64
        -- docs) and the twin thresholds (absolute lev <= 40, relative
        -- lev*5 <= min len — integer arithmetic, no float ratio) are
        -- the query semantics, mirrored exactly.
        WITH k AS (
          SELECT doc_id, {_SQL_NORM} AS nt,
                 substring({_SQL_NORM}, 1, 12) AS bk,
                 CAST(length({_SQL_NORM}) AS BIGINT) AS ln
          FROM documents
        ),
        small AS (
          SELECT bk FROM k GROUP BY bk HAVING count(*) <= 64
        ),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.nt AS ta, b.nt AS tb, a.ln AS len_a, b.ln AS len_b
          FROM k a JOIN k b USING (bk) JOIN small USING (bk)
          WHERE a.doc_id < b.doc_id AND abs(a.ln - b.ln) <= 40
        )
        SELECT id_a, id_b, CAST(levenshtein(ta, tb) AS BIGINT) AS dist,
               len_a, len_b
        FROM cand
        WHERE levenshtein(ta, tb) <= 40
          AND levenshtein(ta, tb) * 5 <= least(len_a, len_b)
    """,
    description=(
        "character-level edit-distance near-dups: candidates share a "
        "12-char normalized prefix (blocks capped at 64 docs — the "
        "template-prefix skew guard), survivors satisfy lev <= 40 AND "
        "lev*5 <= min(len) in exact integer arithmetic; complements the "
        "shingle family (bag-of-shingles overlap misses in-place "
        "character churn); Spark computes the banded O(k*n) DP via the "
        "levenshtein threshold argument"
    ),
    tags=("llm", "dedup"),
)
def levenshtein_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: equi-join on the prefix block key (hash join, never
    cartesian), broadcast block-count guard, |len| difference prunes
    before the DP, and the threshold-banded levenshtein bounds per-pair
    cost at O(max_dist * len). Block population is corpus-dependent:
    the 64-doc cap bounds any block's pair count at C(64,2) regardless
    of how templated the corpus is."""
    return td.levenshtein_blocked_pairs(load_table(spark, sf_dir, "documents"))


_DSB_BUCKETS = 8


def _dedup_store_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Bucketed store + batch signature tables for this testdata
    fingerprint (same session-catalog caching pattern as the bucketed
    order⋈lineitem tables in plans/maintenance.py). Batch = doc_id % 4
    == 0, store = the rest — the ingest split the oracle restates."""
    import os

    from counsel_data_pipeline_spark.io.fingerprint import (
        derived_cache_dir,
        table_fingerprint,
    )

    fp = table_fingerprint(sf_dir, "documents")[:8]
    names = (f"cdp_dedupstore_{fp}", f"cdp_dedupbatch_{fp}")
    base = derived_cache_dir("counsel_dedup_store", sf_dir, "documents")
    if not all(spark.catalog.tableExists(n) for n in names):
        docs = load_table(spark, sf_dir, "documents")
        is_new = F.col("doc_id") % 4 == 0
        for name, side in (
            (names[0], docs.filter(~is_new)),
            (names[1], docs.filter(is_new)),
        ):
            td.write_dedup_store_bucketed(
                td.build_dedup_store(side),
                name,
                os.path.join(base, name),
                n_buckets=_DSB_BUCKETS,
            )
    return names


def _reset_dedup_store(spark: SparkSession, sf_dir: str) -> None:
    """Drop the bucketed store/batch session tables + their parquet so
    bench.py can time the bucketed store BUILD cold (the one-time
    bucketBy write the zero-shuffle ingest amortizes)."""
    import shutil

    from counsel_data_pipeline_spark.io.fingerprint import (
        derived_cache_dir,
        table_fingerprint,
    )

    fp = table_fingerprint(sf_dir, "documents")[:8]
    for name in (f"cdp_dedupstore_{fp}", f"cdp_dedupbatch_{fp}"):
        if spark.catalog.tableExists(name):
            spark.sql(f"DROP TABLE {name}")
    shutil.rmtree(
        derived_cache_dir("counsel_dedup_store", sf_dir, "documents"),
        ignore_errors=True,
    )


@register(
    "dedup_store_bucketed_ingest",
    oracle=f"""
        -- Restates the zero-shuffle ingest audit: batch = doc_id %% 4 = 0
        -- judged against the persisted store (the other docs), grouped by
        -- exact content hash. Docs with fewer than 3 normalized tokens
        -- yield no 3-shingles and are absent from the store by design.
        WITH h0 AS (
          SELECT doc_id, md5({_SQL_NORM}) AS content_h,
                 len(string_split_regex({_SQL_NORM}, ' ')) AS n_tok
          FROM documents
        ),
        h AS (
          SELECT doc_id, content_h, (doc_id % 4 = 0) AS is_new
          FROM h0 WHERE n_tok >= 3
        ),
        b AS (
          SELECT content_h, CAST(count(*) AS BIGINT) AS n_batch,
                 min(doc_id) AS min_batch_id
          FROM h WHERE is_new GROUP BY 1
        ),
        s AS (
          SELECT content_h, CAST(count(*) AS BIGINT) AS n_store,
                 min(doc_id) AS min_store_id
          FROM h WHERE NOT is_new GROUP BY 1
        )
        SELECT b.content_h, b.n_batch, b.min_batch_id,
               COALESCE(s.n_store, 0) AS n_store,
               COALESCE(s.min_store_id, -1) AS min_store_id,
               CASE WHEN s.n_store IS NOT NULL THEN 'exact_existing'
                    WHEN b.n_batch > 1 THEN 'exact_new_class'
                    ELSE 'unique' END AS verdict
        FROM b LEFT JOIN s USING (content_h)
    """,
    description="zero-shuffle exact-dedup ingest attested end-to-end: the "
    "persisted dedup store AND the incoming batch's signature rows are "
    "both bucketed on content_h, so scans -> per-side aggregates -> "
    "store⋈batch join run with ZERO Exchange (the plan fn RAISES "
    "otherwise) — the production shape where the corpus-sized store "
    "never reshuffles on ingest",
    tags=("llm", "dedup", "bucketing", "incremental", "bench-write"),
    reset=_reset_dedup_store,
)
def dedup_store_bucketed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from counsel_data_pipeline_spark.ops.bucketing import plan_has_exchange

    store_t, batch_t = _dedup_store_tables(spark, sf_dir)
    out = td.exact_dup_classes_bucketed(spark, batch_t, store_t)
    if plan_has_exchange(out):
        raise RuntimeError(
            "bucketed dedup ingest plan contains an Exchange — co-location lost"
        )
    return out
