"""Enrichment waterfall (ops/enrich.py) — cache probe, resolver waterfall,
fallback provenance, retry, cache upsert.

Golden anchor: the reference's committed geocode cache
(data/geocode-cache.json) joined against its published dataset — rows the
cache can serve must come back with the CACHED coordinates and never touch
the resolver.
"""

import json

import pytest
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.ops import enrich as E

CACHE = "/root/reference/data/geocode-cache.json"
PUB = "/root/reference/public/clinics.json"


def _cache_df(spark):
    raw = json.load(open(CACHE))
    rows = [
        {
            "query": k,
            "lat": v.get("lat"),
            "lng": v.get("lng"),
            "confidence": v.get("confidence"),
            "formatted": v.get("formatted"),
            "components": {
                str(ck): str(cv) for ck, cv in (v.get("components") or {}).items()
            },
            "source": v.get("source"),
            "approx": v.get("approx"),
        }
        for k, v in raw.items()
    ]
    return spark.createDataFrame(rows, E.CACHE_SCHEMA)


def _clean_rows(spark, n=40):
    rows = json.load(open(PUB))["rows"]
    picked = [
        {"county": r["county"], "org_name": r["org_name"], "address": r["address"],
         "expected_lat": r.get("lat"), "expected_lng": r.get("lng")}
        for r in rows
        if r.get("source") == "opencage" and not r.get("approx")
    ][:n]
    return spark.createDataFrame(picked)


def test_cache_hits_reproduce_reference_coordinates(spark):
    # Resolver refuses everything: any row NOT served by the cache falls
    # through to the county-centroid floor (source='centroid'), so cache
    # coverage and cache purity are both observable from provenance.
    rows = _clean_rows(spark)
    stub = E.StubResolver(accepts=lambda q: False)
    res = E.enrich(rows, _cache_df(spark), stub)
    got = res.enriched.collect()
    assert len(got) == rows.count()
    hits = [r for r in got if r.source is not None and r.source != "centroid"]
    # near-total cache coverage for rows geocoded by the current builder
    # (a few legacy rows hold queries an older builder revision produced)
    assert len(hits) / len(got) >= 0.9
    for r in hits:
        assert r.lat is not None and r.lng is not None
        assert r.note is None
        assert r.usedQuery  # provenance: which candidate hit
    # coordinates must be the CACHED ones == the published ones
    exact = sum(
        1 for r in hits if (r.lat, r.lng) == (r.expected_lat, r.expected_lng)
    )
    assert exact / len(hits) >= 0.9
    # nothing resolved by the stub → nothing to write back
    assert res.new_cache_entries.count() == 0


def test_miss_goes_through_resolver_and_writes_cache(spark):
    rows = spark.createDataFrame(
        [{"county": "臺北市", "org_name": "測試診所", "address": "臺北市中山區南京東路2段125號"}]
    )
    stub = E.StubResolver()
    res = E.enrich(rows, None, stub, min_interval_s=0.0)
    [r] = res.enriched.collect()
    assert r.source == "opencage" and r.approx is None
    assert r.lat is not None and 21.5 <= r.lat <= 25.5
    assert 119.5 <= r.lng <= 122.5
    assert r.usedQuery  # the winning candidate is recorded
    entries = res.new_cache_entries.collect()
    assert [e.query for e in entries] == [r.usedQuery]
    # determinism: same query → same coordinates
    r2 = E.enrich(rows, None, E.StubResolver()).enriched.collect()[0]
    assert (r2.lat, r2.lng) == (r.lat, r.lng)


def test_county_mismatch_cache_entry_is_rejected(spark):
    # cache has the exact candidate query but its components point at the
    # wrong county → must NOT be used (F24/E6), resolver resolves instead.
    addr = "臺北市中山區南京東路2段125號"
    from counsel_data_pipeline_spark.ops.text import build_query_candidates

    top = build_query_candidates(addr, "測試診所")[0]
    bad = spark.createDataFrame(
        [{"query": top, "lat": 1.0, "lng": 1.0, "confidence": 9,
          "formatted": "高雄市某處", "components": {"county": "高雄市"},
          "source": "opencage", "approx": None}],
        E.CACHE_SCHEMA,
    )
    rows = spark.createDataFrame(
        [{"county": "臺北市", "org_name": "測試診所", "address": addr}]
    )
    [r] = E.enrich(rows, bad, E.StubResolver()).enriched.collect()
    assert (r.lat, r.lng) != (1.0, 1.0)
    assert r.source == "opencage"


def test_street_fallback_provenance(spark):
    # primary candidates all rejected (stub refuses 號-bearing queries) →
    # street-centroid stage resolves road-only queries → approx='street'.
    stub = E.StubResolver(accepts=lambda q: "號" not in q and ("路" in q or "街" in q))
    rows = spark.createDataFrame(
        [{"county": "臺北市", "org_name": "測試診所", "address": "臺北市中山區南京東路2段125號"}]
    )
    res = E.enrich(rows, None, stub)
    [r] = res.enriched.collect()
    assert r.approx == "street" and r.source == "opencage"
    assert "號" not in r.usedQuery
    # street results are NOT cached (reference caches only primary hits)
    assert res.new_cache_entries.count() == 0


def test_county_table_fallback_when_nothing_resolves(spark):
    stub = E.StubResolver(accepts=lambda q: False)
    rows = spark.createDataFrame(
        [{"county": "臺北市", "org_name": "x", "address": "臺北市中山區南京東路2段125號"}]
    )
    [r] = E.enrich(rows, None, stub).enriched.collect()
    assert r.source == "centroid" and r.approx == "county_table"
    assert (r.lat, r.lng) == E.COUNTY_CENTROIDS["臺北市"]
    assert r.usedQuery == "county_table"


def test_no_result_note_when_no_county_either(spark):
    stub = E.StubResolver(accepts=lambda q: False)
    rows = spark.createDataFrame(
        [(None, "x", "somewhere 123")],
        "county string, org_name string, address string",
    )
    [r] = E.enrich(rows, None, stub).enriched.collect()
    assert r.lat is None and r.lng is None
    assert r.note == "No result"


def test_retry_gives_up_then_moves_on():
    calls = []

    def flaky():
        calls.append(1)
        raise E.Retryable("429")

    out = E.with_retry(flaky, attempts=3, sleep=lambda s: None)
    assert out is None and len(calls) == 3

    def permanent():
        raise E.NonRetryable("400")

    assert E.with_retry(permanent, sleep=lambda s: None) is None


def test_rate_limiter_spacing():
    now = [0.0]
    slept = []
    lim = E.RateLimiter(
        min_interval_s=1.2,
        clock=lambda: now[0],
        sleep=lambda s: (slept.append(s), now.__setitem__(0, now[0] + s)),
    )
    lim.wait()          # first call free
    lim.wait()          # must wait the full interval
    assert slept == [pytest.approx(1.2)]


def test_upsert_cache_last_write_wins(spark):
    old = spark.createDataFrame(
        [{"query": "q1", "lat": 1.0, "lng": 1.0, "confidence": 1,
          "formatted": "old", "components": {}, "source": "opencage", "approx": None}],
        E.CACHE_SCHEMA,
    )
    new = spark.createDataFrame(
        [{"query": "q1", "lat": 2.0, "lng": 2.0, "confidence": 2,
          "formatted": "new", "components": {}, "source": "opencage", "approx": None},
         {"query": "q2", "lat": 3.0, "lng": 3.0, "confidence": 3,
          "formatted": "n2", "components": {}, "source": "nominatim", "approx": None}],
        E.CACHE_SCHEMA,
    )
    merged = {r.query: r for r in E.upsert_cache(old, new).collect()}
    assert len(merged) == 2
    assert merged["q1"].formatted == "new"
    assert merged["q2"].source == "nominatim"


def test_enrichment_stage_is_single_partition(spark):
    # the rate-limited waterfall must not fan out (E4 design constraint)
    rows = spark.createDataFrame(
        [{"county": "臺北市", "org_name": f"o{i}",
          "address": f"臺北市中山區南京東路2段{i}號"} for i in range(1, 9)]
    ).repartition(8)
    res = E.enrich(rows, None, E.StubResolver())
    assert res.enriched.count() == 8
    # all misses resolved; every usedQuery distinct address → distinct query
    assert res.new_cache_entries.select("query").distinct().count() == 8


def test_nominatim_fallback_when_primary_dry(spark):
    # E2: primary resolves nothing; the secondary (nominatim) resolver
    # handles the primary candidate list and its hits are cached too.
    primary = E.StubResolver(name="opencage", accepts=lambda q: False)
    secondary = E.StubResolver(name="nominatim")
    rows = spark.createDataFrame(
        [{"county": "臺北市", "org_name": "測試診所", "address": "臺北市中山區南京東路2段125號"}]
    )
    res = E.enrich(rows, None, primary, nominatim=secondary)
    [r] = res.enriched.collect()
    assert r.source == "nominatim" and r.approx is None
    entries = res.new_cache_entries.collect()
    assert len(entries) == 1 and entries[0].source == "nominatim"
