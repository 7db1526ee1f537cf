"""Property-based tests (hypothesis) for the round-10 operators: on
ARBITRARY generated inputs — not just the committed testdata — the
Spark plans must agree with direct Python brute-force models of their
semantics. Same discipline as tests/test_properties.py: each example
generates a whole dataset (one Spark job per example, small
max_examples).

Covered here:
  - ops/text_dedup.levenshtein_blocked_pairs vs a Python DP + the same
    blocking/threshold rules (blocking is part of the semantics, so the
    model mirrors it: norm -> prefix block -> block cap -> length
    filter -> absolute + relative edit-distance thresholds);
  - events_max_concurrent's per-day prefix-sum decomposition vs the
    naive single-pass Python sweep, on timestamp sets squeezed around
    day boundaries (the decomposition's seam);
  - agg_weighted_median_distributed vs a Python weighted-median over
    the raw (flag, cents, qty) rows;
  - agg_linear_trend_per_brand vs the exact-integer-moment formula
    (identical IEEE ops on identical operands -> bit-for-bit equality,
    not approx);
  - events_mad_robust_outliers vs statistics.median on the micro grid.
"""

import datetime as dt
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from counsel_data_pipeline_spark.ops.text_dedup import levenshtein_blocked_pairs


def _q(name):
    from counsel_data_pipeline_spark.catalog import all_queries

    return all_queries()[name]


# ---------------------------------------------------------------------------
# Python mirrors
# ---------------------------------------------------------------------------


def py_norm(t: str) -> str:
    return " ".join(t.split()).lower()


def py_lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def py_lev_blocked(docs, prefix_len, max_dist, rel_den, max_block):
    """The op's full candidate + verify semantics, brute-forced."""
    norm = {i: py_norm(t) for i, t in docs}
    blocks: dict[str, list[int]] = {}
    for i, nt in norm.items():
        blocks.setdefault(nt[:prefix_len], []).append(i)
    out = set()
    for ids in blocks.values():
        if len(ids) > max_block:
            continue
        ids = sorted(ids)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                la, lb = len(norm[a]), len(norm[b])
                if abs(la - lb) > max_dist:
                    continue
                d = py_lev(norm[a], norm[b])
                if d <= max_dist and d * rel_den <= min(la, lb):
                    out.add((a, b, d))
    return out


def py_sweep_peak(ts_list):
    """Naive global sweep: +1 at t, -1 at t+30min; ends (-1) sort before
    starts (+1) at the same instant (end-exclusive sessions)."""
    pts = [(t, 1) for t in ts_list] + [
        (t + dt.timedelta(minutes=30), -1) for t in ts_list
    ]
    pts.sort()
    run = peak = 0
    for _, d in pts:
        run += d
        peak = max(peak, run)
    return peak


# ---------------------------------------------------------------------------
# levenshtein_blocked_pairs == brute force on arbitrary corpora
# ---------------------------------------------------------------------------

_texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=24),
    min_size=0,
    max_size=12,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_texts)
def test_levenshtein_blocked_matches_bruteforce(spark, texts):
    # Tight params so every rule (block cap, length filter, absolute and
    # relative thresholds) actually bites on tiny generated corpora.
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id bigint, text string") \
        if docs else spark.createDataFrame([], "doc_id bigint, text string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in levenshtein_blocked_pairs(
            df, prefix_len=3, max_dist=4, rel_den=3, max_block=4
        ).collect()
    }
    want = py_lev_blocked(docs, prefix_len=3, max_dist=4, rel_den=3,
                          max_block=4)
    assert got == want


# ---------------------------------------------------------------------------
# events_max_concurrent decomposition == naive Python sweep
# ---------------------------------------------------------------------------

_stamps = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # day offset
        st.integers(min_value=0, max_value=1439),   # minute of day
        st.sampled_from(["click", "view"]),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(stamps=_stamps)
def test_sweep_line_decomposition_matches_python(spark, stamps):
    base = dt.datetime(2026, 3, 1)
    rows = [
        (i, base + dt.timedelta(days=d, minutes=m), 1, et, 0.0, "{}")
        for i, (d, m, et) in enumerate(stamps)
    ]
    tmp = tempfile.mkdtemp(prefix="cdp_sweep_prop_")
    try:
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.parquet(f"{tmp}/events.parquet")
        out = {
            r.event_type: (r.max_concurrent, r.n_sessions)
            for r in _q("events_max_concurrent").fn(spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    by_type: dict[str, list] = {}
    for _, ts, _, et, _, _ in rows:
        by_type.setdefault(et, []).append(ts)
    want = {et: (py_sweep_peak(v), len(v)) for et, v in by_type.items()}
    assert out == want


# ---------------------------------------------------------------------------
# agg_weighted_median_distributed == Python weighted median
# ---------------------------------------------------------------------------

_facts = st.lists(
    st.tuples(
        st.sampled_from(["A", "N", "R"]),
        st.integers(min_value=1, max_value=500),   # price cents
        st.integers(min_value=1, max_value=50),    # quantity
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(facts=_facts)
def test_weighted_median_matches_python(spark, facts):
    rows = [(f, c / 100.0, float(q)) for f, c, q in facts]
    tmp = tempfile.mkdtemp(prefix="cdp_wmed_prop_")
    try:
        spark.createDataFrame(
            rows, "l_returnflag string, l_extendedprice double, "
                  "l_quantity double",
        ).write.parquet(f"{tmp}/lineitem.parquet")
        out = {
            r.l_returnflag: (r.weighted_median_cents, r.total_weight, r.n_rows)
            for r in _q("agg_weighted_median_distributed").fn(spark, tmp)
            .collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    by_flag: dict[str, list] = {}
    for f, c, q in facts:
        by_flag.setdefault(f, []).append((c, q))
    want = {}
    for f, pairs in by_flag.items():
        agg: dict[int, int] = {}
        for c, q in pairs:
            agg[c] = agg.get(c, 0) + q
        total = sum(agg.values())
        cum = 0
        med = None
        for x in sorted(agg):
            cum += agg[x]
            if 2 * cum >= total:
                med = x
                break
        want[f] = (med, total, len(pairs))
    assert out == want


# ---------------------------------------------------------------------------
# agg_linear_trend_per_brand == exact-moment formula on arbitrary data
# ---------------------------------------------------------------------------

_parts = st.lists(
    st.tuples(
        st.sampled_from(["B1", "B2"]),
        st.integers(min_value=1, max_value=50),     # p_size
        st.integers(min_value=1, max_value=99999),  # price cents
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(parts=_parts)
def test_linear_trend_matches_exact_moments(spark, parts):
    rows = [(b, s, c / 100.0) for b, s, c in parts]
    tmp = tempfile.mkdtemp(prefix="cdp_ols_prop_")
    try:
        df = spark.createDataFrame(
            rows, "p_brand string, p_size int, p_retailprice double",
        ) if rows else spark.createDataFrame(
            [], "p_brand string, p_size int, p_retailprice double")
        df.write.parquet(f"{tmp}/part.parquet")
        out = {
            r.p_brand: (r.n_parts, r.slope_cents, r.intercept_cents)
            for r in _q("agg_linear_trend_per_brand").fn(spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    by_brand: dict[str, list] = {}
    for b, s, c in parts:
        by_brand.setdefault(b, []).append((s, c))
    want = {}
    for b, pts in by_brand.items():
        n = len(pts)
        sx = sum(s for s, _ in pts)
        sx2 = sum(s * s for s, _ in pts)
        sy = sum(c for _, c in pts)
        sxy = sum(s * c for s, c in pts)
        den = n * sx2 - sx * sx
        if n < 2 or den == 0:
            continue  # degenerate groups are filtered by the query
        # identical IEEE ops on identical exact-integer operands: the
        # floats must match BIT-FOR-BIT, not approximately
        slope = float(n * sxy - sx * sy) / float(den)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        want[b] = (n, slope, intercept)
    assert out == want


# ---------------------------------------------------------------------------
# events_mad_robust_outliers == Python median/MAD on arbitrary data
# ---------------------------------------------------------------------------

_vals = st.lists(
    st.tuples(
        st.sampled_from(["buy", "view"]),
        st.integers(min_value=-1000, max_value=1000),  # whole-unit values
    ),
    min_size=1,
    max_size=50,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=_vals)
def test_mad_matches_python_median(spark, vals):
    import statistics

    t0 = dt.datetime(2026, 3, 1, 12, 0)
    rows = [(i, t0, i, et, float(v), "{}") for i, (et, v) in enumerate(vals)]
    tmp = tempfile.mkdtemp(prefix="cdp_mad_prop_")
    try:
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.parquet(f"{tmp}/events.parquet")
        out = {
            r.event_type: (r.n_events, r.n_outliers, r.med_mi, r.mad_mi)
            for r in _q("events_mad_robust_outliers").fn(spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    by_type: dict[str, list] = {}
    for et, v in vals:
        by_type.setdefault(et, []).append(v * 1_000_000)  # exact micro grid
    want = {}
    for et, vs in by_type.items():
        med = statistics.median(vs)          # midpoint interpolation
        dev = [abs(float(v) - med) for v in vs]
        mad = statistics.median(dev)
        n_out = sum(1 for d in dev if d > 3 * mad)
        want[et] = (len(vs), n_out, float(med), float(mad))
    assert out == want
