"""Property-based tests (hypothesis) for the round-11 operators: on
ARBITRARY generated inputs — not just the committed testdata — the
Spark plans must agree with direct Python models of their semantics.

Covered here:
  - ops/curation.pii_scrub vs Python `re` with the identical patterns
    (the RE2-compatible subset is chosen so Java, RE2, and Python's
    engine agree; the model mirrors the sequential email-then-phone
    redaction order, which is part of the semantics);
  - the re-pointed sketch_value_quantiles (exact type-1 inverse-CDF
    quantiles over the distinct-value domain) vs sorted-multiset
    indexing at rank ceil(p*n).
"""

import math
import re
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from counsel_data_pipeline_spark.ops.curation import (
    PII_EMAIL_RE,
    PII_PHONE_RE,
    pii_scrub,
)


def _q(name):
    from counsel_data_pipeline_spark.catalog import all_queries

    return all_queries()[name]


# ---------------------------------------------------------------------------
# pii_scrub == Python re on adversarial near-PII text
# ---------------------------------------------------------------------------

# Alphabet dense in the regex's own structural characters, so generated
# strings constantly produce near-misses (bare @, trailing dots, short
# TLDs, wrong phone grouping) as well as real matches.
_pii_texts = st.lists(
    st.text(alphabet="ab1@.-_%+ 0", min_size=0, max_size=40),
    min_size=1,
    max_size=8,
)


def py_pii(t: str) -> tuple[int, int, str]:
    n_e = len(re.findall(PII_EMAIL_RE, t))
    n_p = len(re.findall(PII_PHONE_RE, t))
    red = re.sub(PII_PHONE_RE, "[PHONE]", re.sub(PII_EMAIL_RE, "[EMAIL]", t))
    return n_e, n_p, red


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_pii_texts)
def test_pii_scrub_matches_python_re(spark, texts):
    from pyspark.sql import functions as F

    # seed some guaranteed hits among the noise
    texts = texts + ["x user1@ab.com y", "z 02-555-010-1234 w"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i bigint, text string"
    )
    n_e, n_p, red = pii_scrub(F.col("text"))
    got = {
        r.i: (r.e, r.p, r.r)
        for r in df.select(
            "i", n_e.alias("e"), n_p.alias("p"), red.alias("r")
        ).collect()
    }
    want = {i: py_pii(t) for i, t in enumerate(texts)}
    assert got == want


# ---------------------------------------------------------------------------
# sketch_value_quantiles == sorted-multiset rank ceil(p*n)
# ---------------------------------------------------------------------------

# Values drawn from a small grid (quarters, signed) so duplicates are
# constant — the distinct-value collapse is the decomposition under test.
_events = st.lists(
    st.tuples(
        st.sampled_from(["t1", "t2"]),
        st.integers(min_value=-20, max_value=20),
    ),
    min_size=1,
    max_size=60,
)


def py_type1(xs: list[float], p: float) -> float:
    r = math.ceil(p * len(xs))
    return sorted(xs)[max(r, 1) - 1]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=_events)
def test_exact_value_quantiles_match_python(spark, events):
    rows = [(typ, q / 4.0) for typ, q in events]
    tmp = tempfile.mkdtemp(prefix="cdp_vq_prop_")
    try:
        spark.createDataFrame(
            rows, "event_type string, value double"
        ).write.parquet(f"{tmp}/events.parquet")
        got = {
            r.event_type: (r.n_rows, r.p50, r.p90, r.p99)
            for r in _q("sketch_value_quantiles").fn(spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    want = {}
    for typ in {t for t, _ in events}:
        xs = [v for t, v in rows if t == typ]
        want[typ] = (
            len(xs),
            py_type1(xs, 0.5),
            py_type1(xs, 0.9),
            py_type1(xs, 0.99),
        )
    assert got == want


# ---------------------------------------------------------------------------
# funnel chained-window rewrite == naive per-stage Python model
# ---------------------------------------------------------------------------

# Tight timestamp domain so equal-timestamp collisions (the strict-'after'
# boundary the windows must respect) occur constantly.
_funnel_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),                  # user
        st.sampled_from(["view", "click", "purchase", "other"]),
        st.integers(min_value=0, max_value=6),                  # minute
    ),
    min_size=1,
    max_size=30,
)


def py_funnel(rows):
    users = {u for u, _, _ in rows}
    n_v = n_c = n_p = 0
    for u in users:
        mine = [(t, ty) for uu, ty, t in rows if uu == u]
        views = [t for t, ty in mine if ty == "view"]
        if not views:
            continue
        n_v += 1
        t_view = min(views)
        clicks = [t for t, ty in mine if ty == "click" and t > t_view]
        if not clicks:
            continue
        n_c += 1
        t_click = min(clicks)
        if any(ty == "purchase" and t > t_click for t, ty in mine):
            n_p += 1
    return n_v, n_c, n_p


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=_funnel_events)
def test_funnel_chained_windows_match_python(spark, events):
    import datetime as dt

    base = dt.datetime(2026, 4, 1)
    rows = [
        (u, ty, base + dt.timedelta(minutes=m)) for u, ty, m in events
    ]
    tmp = tempfile.mkdtemp(prefix="cdp_funnel_prop_")
    try:
        spark.createDataFrame(
            rows, "user_id bigint, event_type string, ts timestamp"
        ).write.parquet(f"{tmp}/events.parquet")
        [r] = _q("events_funnel_view_click_purchase").fn(spark, tmp).collect()
        got = (r.n_view, r.n_view_click, r.n_view_click_purchase)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    want = py_funnel([(u, ty, m) for u, ty, m in events])
    assert got == want


# ---------------------------------------------------------------------------
# window-dedup (corpus_prep_v2's fused form) == exact_dedup survivors
# ---------------------------------------------------------------------------

_dup_texts = st.lists(
    # tiny alphabet + whitespace variants so normalized collisions are
    # constant (normalization equivalence is part of the contract)
    st.text(alphabet="ab \t", min_size=0, max_size=10),
    min_size=1,
    max_size=20,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_dup_texts)
def test_window_dedup_matches_exact_dedup_survivors(spark, texts):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from counsel_data_pipeline_spark.ops.text_dedup import (
        content_md5,
        exact_dedup,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    by_hash = Window.partitionBy("content_hash").orderBy("doc_id")
    windowed = {
        r.doc_id
        for r in df.withColumn("content_hash", content_md5(F.col("text")))
        .withColumn("__rn", F.row_number().over(by_hash))
        .filter(F.col("__rn") == 1)
        .select("doc_id")
        .collect()
    }
    canonical = {
        r.canonical_id for r in exact_dedup(df).select("canonical_id").collect()
    }
    assert windowed == canonical
