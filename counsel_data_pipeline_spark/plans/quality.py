"""Data-quality profiling plans — ops/profile.py surfaced through the
driver contract.

The oracle uses exact distinct counts (test scale); the production default
is HLL (see ops/profile.profile docstring). Profiled columns are limited
to int/string/small-double types whose string rendering is identical in
Spark and DuckDB (timestamps render differently and are excluded from the
oracle-checked set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from counsel_data_pipeline_spark.catalog import register
from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops.profile import profile

_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_returnflag",
    "l_linestatus",
]


def _col_sql(c: str) -> str:
    return (
        f"SELECT '{c}' AS col_name, n AS n_rows, null_{c} AS n_null, "
        f"round(CAST(null_{c} AS DOUBLE) / n, 6) AS null_frac, "
        f"dist_{c} AS n_distinct, min_{c} AS min_s, max_{c} AS max_s FROM a"
    )


@register(
    "quality_profile_lineitem",
    oracle=f"""
        WITH a AS (
          SELECT count(*) AS n,
                 {", ".join(
                     f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_{c}, "
                     f"count(DISTINCT {c}) AS dist_{c}, "
                     f"CAST(min({c}) AS VARCHAR) AS min_{c}, "
                     f"CAST(max({c}) AS VARCHAR) AS max_{c}"
                     for c in _COLS
                 )}
          FROM lineitem
        )
        {" UNION ALL ".join(_col_sql(c) for c in _COLS)}
    """,
    description="single-pass column profile of lineitem: null rate, distincts, extremes per column",
    tags=("quality", "profiling"),
    bench=True,
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(load_table(spark, sf_dir, "lineitem"), _COLS, exact=True)


@register(
    "quality_referential_integrity",
    oracle="""
        -- FK orphan audit across the star schema: one row per relation,
        -- counting child rows whose key has no parent (anti-join shape).
        SELECT 'lineitem.l_orderkey -> orders' AS relation,
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
               (SELECT count(*) FROM lineitem) AS n_child_rows
        UNION ALL
        SELECT 'lineitem.l_partkey -> part',
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM part p
                                  WHERE p.p_partkey = l.l_partkey)),
               (SELECT count(*) FROM lineitem)
        UNION ALL
        SELECT 'orders.o_custkey -> customer',
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey)),
               (SELECT count(*) FROM orders)
        UNION ALL
        SELECT 'customer.c_nationkey -> nation',
               (SELECT count(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM nation n
                                  WHERE n.n_nationkey = c.c_nationkey)),
               (SELECT count(*) FROM customer)
    """,
    description="FK orphan audit (anti-join counts) across the star schema",
    tags=("quality", "integrity"),
)
def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    def audit(child: DataFrame, ckey: str, parent: DataFrame, pkey: str, label: str) -> DataFrame:
        orphans = child.join(
            parent.select(F.col(pkey).alias(ckey)), ckey, "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        total = child.agg(F.count(F.lit(1)).alias("n_child_rows"))
        return (
            orphans.crossJoin(total)
            .select(
                F.lit(label).alias("relation"), "n_orphans", "n_child_rows"
            )
        )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    checks = [
        audit(li, "l_orderkey", orders, "o_orderkey", "lineitem.l_orderkey -> orders"),
        audit(li, "l_partkey", part, "p_partkey", "lineitem.l_partkey -> part"),
        audit(orders, "o_custkey", customer, "c_custkey", "orders.o_custkey -> customer"),
        audit(customer, "c_nationkey", nation, "n_nationkey", "customer.c_nationkey -> nation"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


_DOC_COLS = ["doc_id", "lang", "source", "n_chars"]


def _doc_col_sql(c: str) -> str:
    return (
        f"SELECT '{c}' AS col_name, n AS n_rows, null_{c} AS n_null, "
        f"round(CAST(null_{c} AS DOUBLE) / n, 6) AS null_frac, "
        f"dist_{c} AS n_distinct, min_{c} AS min_s, max_{c} AS max_s FROM a"
    )


@register(
    "quality_profile_documents",
    oracle=f"""
        WITH a AS (
          SELECT count(*) AS n,
                 {", ".join(
                     f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_{c}, "
                     f"count(DISTINCT {c}) AS dist_{c}, "
                     f"CAST(min({c}) AS VARCHAR) AS min_{c}, "
                     f"CAST(max({c}) AS VARCHAR) AS max_{c}"
                     for c in _DOC_COLS
                 )}
          FROM documents
        )
        {" UNION ALL ".join(_doc_col_sql(c) for c in _DOC_COLS)}
    """,
    description="column profile of the documents table (id/lang/source/n_chars: "
    "null rate, distincts, extremes) — the text-corpus twin of the lineitem profile",
    tags=("quality", "profiling", "llm"),
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same single-pass exact profile as lineitem's (ops/profile.py); the
    free-text column is excluded from the oracle-checked set (its min/max
    strings are corpus-sized and engine renderings of long strings are not
    worth pinning)."""
    return profile(load_table(spark, sf_dir, "documents"), _DOC_COLS, exact=True)


# ---------------------------------------------------------------------------
# Corpus drift monitoring: token-distribution PSI between two corpus halves
# ---------------------------------------------------------------------------


@register(
    "quality_token_drift_psi",
    oracle="""
        -- Population-stability-index drift check between the even-id and
        -- odd-id document halves (stand-ins for "corpus version N vs
        -- N+1"): per-term PSI contribution (p-q)·ln(p/q) over the top-50
        -- combined-count vocabulary, Laplace-smoothed so no term has a
        -- zero rate. p and q are int/int double divisions; the single
        -- ln() per term is parity-guarded by the 1e-6 rounding rule
        -- (plans/_parity.py). Σ|psi| > 0.2 is the classic "investigate"
        -- threshold — left to the consumer, the report is per-term.
        WITH tok AS (
          SELECT doc_id % 2 AS half,
                 unnest(string_split_regex(
                   lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS term
          FROM documents
        ),
        c AS (
          SELECT half, term, count(*) AS cnt FROM tok GROUP BY 1, 2
        ),
        vocab AS (
          SELECT term FROM (
            SELECT term, sum(cnt) AS tot FROM c GROUP BY 1
            ORDER BY tot DESC, term LIMIT 50
          )
        ),
        v AS (SELECT count(*) AS v FROM vocab),
        tots AS (
          SELECT half, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY 1
        ),
        m AS (
          SELECT vocab.term,
                 COALESCE(e.cnt, 0) AS cnt_even,
                 COALESCE(o.cnt, 0) AS cnt_odd
          FROM vocab
          LEFT JOIN (SELECT term, cnt FROM c WHERE half = 0) e USING (term)
          LEFT JOIN (SELECT term, cnt FROM c WHERE half = 1) o USING (term)
        ),
        rates AS (
          SELECT term, cnt_even, cnt_odd,
                 (CAST(cnt_even + 1 AS DOUBLE)) / (te.tot + v.v) AS p,
                 (CAST(cnt_odd + 1 AS DOUBLE)) / (tokd.tot + v.v) AS q
          FROM m
          CROSS JOIN (SELECT tot FROM tots WHERE half = 0) te
          CROSS JOIN (SELECT tot FROM tots WHERE half = 1) tokd
          CROSS JOIN v
        )
        SELECT term,
               CAST(cnt_even AS BIGINT) AS cnt_even,
               CAST(cnt_odd AS BIGINT) AS cnt_odd,
               CAST(round((p - q) * ln(p / q), 6) AS DOUBLE) AS psi_term
        FROM rates
    """,
    description="corpus-drift monitor: per-term PSI contribution between "
    "the even/odd doc halves over the top-50 combined vocabulary "
    "(Laplace-smoothed; two map-side-combined count aggregates, vocab and "
    "totals broadcast back — output is vocab-sized regardless of corpus)",
    tags=("llm", "quality", "drift"),
)
def token_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from counsel_data_pipeline_spark.ops import text_analysis as ta
    from counsel_data_pipeline_spark.ops.partitioning import spread as _spread

    docs = _spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split(ta.norm_text(F.col("text")), " ")).alias("term"),
    )
    c = tok.groupBy("half", "term").agg(F.count(F.lit(1)).alias("cnt")).persist()
    vocab = (
        c.groupBy("term")
        .agg(F.sum("cnt").alias("tot"))
        .orderBy(F.col("tot").desc(), "term")
        .limit(50)
        .select("term")
    )
    v = vocab.agg(F.count(F.lit(1)).alias("v"))
    tots = c.groupBy("half").agg(F.sum("cnt").cast("bigint").alias("tot"))
    te = tots.filter(F.col("half") == 0).select(F.col("tot").alias("tot_even"))
    to = tots.filter(F.col("half") == 1).select(F.col("tot").alias("tot_odd"))
    m = (
        vocab.join(
            c.filter(F.col("half") == 0).select("term", F.col("cnt").alias("cnt_even")),
            "term",
            "left",
        )
        .join(
            c.filter(F.col("half") == 1).select("term", F.col("cnt").alias("cnt_odd")),
            "term",
            "left",
        )
        .fillna(0, ["cnt_even", "cnt_odd"])
    )
    p = (F.col("cnt_even") + F.lit(1)).cast("double") / (F.col("tot_even") + F.col("v"))
    q = (F.col("cnt_odd") + F.lit(1)).cast("double") / (F.col("tot_odd") + F.col("v"))
    return (
        m.crossJoin(F.broadcast(te))
        .crossJoin(F.broadcast(to))
        .crossJoin(F.broadcast(v))
        .select(
            "term",
            F.col("cnt_even").cast("bigint").alias("cnt_even"),
            F.col("cnt_odd").cast("bigint").alias("cnt_odd"),
            F.round((p - q) * F.log(p / q), 6).cast("double").alias("psi_term"),
        )
    )


# ---------------------------------------------------------------------------
# Model-based quality filtering: hashing-trick linear classifier
# ---------------------------------------------------------------------------


@register(
    "quality_classifier_score",
    oracle="""
        -- Hashing-trick linear quality classifier (ops/text_analysis.
        -- hashed_linear_score): token -> md5 feature bucket (1024) ->
        -- md5-derived integer weight in [-1000, 1000]; document score =
        -- mean token weight / 1000. Pure integer arithmetic until the
        -- single final division, so the verdict hashes bit-for-bit.
        WITH t AS (
          SELECT doc_id,
                 string_split_regex(
                   lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS tok
          FROM documents
        ),
        s AS (
          SELECT doc_id, len(tok) AS n_tok,
                 CAST(list_sum(list_transform(tok, t ->
                   CAST(CAST(concat('0x', substr(md5(concat('202:', CAST(
                     CAST(concat('0x', substr(md5(concat('101:', t)), 1, 8))
                          AS UBIGINT) % 1024 AS VARCHAR))), 1, 8))
                        AS UBIGINT) % 2001 AS BIGINT) - 1000)) AS BIGINT) AS score_sum
          FROM t
        )
        -- score is the RAW quotient, not rounded: a ratio of integers can
        -- tie exactly at a rounding grid (doc 2764 at sf0.1:
        -- -1039/16000 = -0.0649375) and the engines' round() split ties
        -- differently; the single int/int IEEE division itself is
        -- bit-identical in both engines (plans/_parity.py rule)
        SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, score_sum,
               CAST(score_sum AS DOUBLE) / (n_tok * 1000) AS score,
               score_sum > 0 AS keep
        FROM s
    """,
    description="model-based corpus filter: fastText-style hashing-trick "
    "linear classifier (1024 md5 feature buckets, integer weights, "
    "mean-pooled score, keep = score > 0) — a map-only per-row array fold "
    "with no shuffle, no UDF, and no vocabulary broadcast",
    tags=("llm", "quality", "curation"),
    bench=True,
)
def classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-based sibling of the Gopher/C4 rule gates
    (ops/curation.gopher_flags / c4_flags): score every document with a
    hashed-feature linear model and emit the keep verdict. The scorer is a
    per-row fold over the token array — at 100 TB this fuses into the scan
    (zero shuffles); a trained variant swaps the md5 weight grid for a
    ≤1024-row broadcast weight table without changing the plan shape."""
    from pyspark.sql import functions as F

    from counsel_data_pipeline_spark.ops import text_analysis as ta
    from counsel_data_pipeline_spark.ops.partitioning import spread as _spread

    docs = _spread(load_table(spark, sf_dir, "documents"))
    tok = F.split(ta.norm_text(F.col("text")), " ")
    s = docs.select(
        "doc_id",
        F.size(tok).cast("bigint").alias("n_tok"),
        ta.hashed_linear_score(tok).alias("score_sum"),
    )
    return s.select(
        "doc_id",
        "n_tok",
        "score_sum",
        (F.col("score_sum").cast("double") / (F.col("n_tok") * 1000)).alias(
            "score"
        ),
        (F.col("score_sum") > 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# observe(): run-level quality counters recorded during the scan
# ---------------------------------------------------------------------------


@register(
    "quality_observe_scan_metrics",
    oracle="""
        -- the observation's counters, recomputed as a plain aggregate:
        -- the Spark side records these DURING the gated scan (zero extra
        -- pass), the oracle proves they equal a dedicated aggregation
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT)
                 AS n_high_discount,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS sum_price_c,
               CAST(min(l_quantity) AS BIGINT) AS min_qty,
               CAST(max(l_quantity) AS BIGINT) AS max_qty
        FROM lineitem WHERE l_returnflag = 'R'
    """,
    description="the Observation API attested: data-quality counters "
    "(row count, predicate count, exact money sum, quantity min/max) "
    "recorded by observe() DURING a gated scan whose downstream action "
    "consumes every row — the metrics channel a production pipeline "
    "uses for per-run accounting without a second pass; the oracle "
    "recomputes them as a dedicated aggregate",
    tags=("quality", "observe", "metrics"),
)
def observe_scan_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: observe() metrics are accumulator-style — collected
    per task alongside the real work and merged on the driver, so the
    quality counters of a 100 TB run cost zero extra scans and no
    shuffle (vs a dedicated aggregation job). The observed plan here
    feeds a real downstream aggregate (noop-sunk), so every row passes
    the metrics operator exactly once; AQE never re-executes a
    finished stage's accumulators into double counts."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    obs = Observation("quality_gate")
    gated = li.observe(
        obs,
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count(F.when(F.col("l_discount") > 0.05, 1))
        .cast("bigint")
        .alias("n_high_discount"),
        F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("sum_price_c"),
        F.min("l_quantity").cast("bigint").alias("min_qty"),
        F.max("l_quantity").cast("bigint").alias("max_qty"),
    )
    # downstream action that consumes every gated row
    gated.groupBy().sum("l_quantity").write.format("noop").mode(
        "overwrite"
    ).save()
    m = obs.get
    cols = ["n_rows", "n_high_discount", "sum_price_c", "min_qty", "max_qty"]
    return spark.createDataFrame(
        [tuple(int(m[c]) for c in cols)],
        ", ".join(f"{c} BIGINT" for c in cols),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

# Expected Benford shares log10(1 + 1/d) in ppm, precomputed once in
# Python and inlined as LITERALS in both engines — transcendental math
# never crosses the Spark/DuckDB boundary, so no libm-ulp parity risk.
import math as _math

_BENFORD_PPM = {d: round(_math.log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)}
_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    + " END"
)


@register(
    "quality_benford_first_digit",
    oracle=f"""
        -- First-significant-digit distribution of order totals vs the
        -- Benford expectation. The digit comes from the exact integer
        -- cents grid (first significant digit is invariant under the
        -- x100 scaling), extracted via bigint->string — no float log in
        -- the digit path; shares are integer ppm via floor division.
        WITH c AS (
          SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                     AS VARCHAR), 1, 1) AS INTEGER) AS digit
          FROM orders WHERE o_totalprice > 0
        ),
        g AS (SELECT digit, count(*) AS n_orders FROM c GROUP BY 1),
        t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM g)
        SELECT digit, n_orders,
               CAST((n_orders * 1000000) // total AS BIGINT) AS observed_ppm,
               CAST({_BENFORD_CASE} AS BIGINT) AS expected_ppm,
               CAST((n_orders * 1000000) // total - ({_BENFORD_CASE}) AS BIGINT)
                 AS deviation_ppm
        FROM g, t
    """,
    description=(
        "Benford's-law first-digit audit over order totals — the classic "
        "fabricated-numbers screen for a training-data/finance pipeline: "
        "digit from the exact cents grid (scale-invariant), observed "
        "share in integer ppm, expected share from precomputed "
        "log10(1+1/d) literals, deviation per digit"
    ),
    tags=("quality", "agg"),
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: one map-side-combinable count by digit (9 groups),
    grand total re-aggregated from the 9-row result and broadcast back —
    the fact table is scanned once, projected to one int column."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    g = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    total = g.agg(F.sum("n_orders").alias("total"))
    expected = F.expr(_BENFORD_CASE).cast("bigint")
    return (
        g.crossJoin(F.broadcast(total))
        .withColumn(
            "observed_ppm",
            F.expr("CAST((n_orders * 1000000) DIV total AS BIGINT)"),
        )
        .select(
            "digit",
            "n_orders",
            "observed_ppm",
            expected.alias("expected_ppm"),
            (F.col("observed_ppm") - expected).cast("bigint").alias("deviation_ppm"),
        )
    )
