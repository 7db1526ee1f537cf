"""Semantic tests for the retrieval/sampling plans added in round 5:
BM25 search, Efraimidis–Spirakis weighted sampling, source-mix entropy.

Each is cross-checked against an independent pure-Python recompute of the
same math over the collected table (tiny at sf0.001/sf0.01), not against
the plan's own expressions — the DuckDB oracle already covers cross-engine
parity; these cover the *math* being the intended algorithm.
"""

import hashlib
import math
from collections import Counter, defaultdict

from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.plans.llm_curation import _WS_SEED
from counsel_data_pipeline_spark.plans.llm_text import _BM25_TERMS

SF = "/root/testdata/sf0.001"


def _norm_tokens(text):
    return " ".join(text.strip().split()).lower().split(" ")


def test_bm25_matches_bruteforce(spark):
    from counsel_data_pipeline_spark.plans.llm_text import bm25_search

    rows = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: _norm_tokens(r["text"]) for r in rows}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    tf = defaultdict(Counter)
    for d, t in toks.items():
        for term in t:
            if term in _BM25_TERMS:
                tf[d][term] += 1
    df = Counter(term for d in tf for term in tf[d])
    idf = {
        t: round(math.log(1.0 + ((n - df[t]) + 0.5) / (df[t] + 0.5)), 6) for t in df
    }
    scores = {}
    for d, counts in tf.items():
        dl = len(toks[d])
        s = 0.0
        for t, f in counts.items():
            s += round(
                idf[t] * ((f * 2.2) / (f + (1.2 * (0.25 + ((0.75 * dl) / avgdl))))),
                6,
            )
        scores[d] = round(s, 6)
    expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:15]

    got = [
        (r["doc_id"], r["score"])
        for r in bm25_search(spark, SF).orderBy("score", ascending=False).collect()
    ]
    got = sorted(got, key=lambda kv: (-kv[1], kv[0]))
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (_, a), (_, b) in zip(got, expected):
        assert abs(a - b) < 1e-5


def test_weighted_sample_matches_bruteforce_and_orders(spark):
    from counsel_data_pipeline_spark.plans.llm_curation import weighted_sample

    rows = load_table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    keys = {}
    for r in rows:
        h = int(
            hashlib.md5(f"{_WS_SEED}:{r['doc_id']}".encode()).hexdigest()[:8], 16
        )
        u = (h + 0.5) / 4294967296.0
        keys[r["doc_id"]] = round(-math.log(u) / r["n_chars"], 9)
    expected = sorted(keys.items(), key=lambda kv: (kv[1], kv[0]))[:25]

    got = [(r["doc_id"], r["es_key"]) for r in weighted_sample(spark, SF).collect()]
    assert [d for d, _ in got] == [d for d, _ in expected]
    ks = [k for _, k in got]
    assert ks == sorted(ks)  # exponential-race keys ascending
    assert all(k >= 0 for k in ks)


def test_weighted_sample_prefers_heavy_docs(spark):
    """Inclusion must skew toward high weight: the sampled docs' mean
    n_chars should exceed the corpus mean (P[heavier] ∝ weight)."""
    from counsel_data_pipeline_spark.plans.llm_curation import weighted_sample

    corpus = load_table(spark, "/root/testdata/sf0.01", "documents")
    corpus_mean = corpus.groupBy().avg("n_chars").collect()[0][0]
    sample = weighted_sample(spark, "/root/testdata/sf0.01")
    sample_mean = sample.groupBy().avg("n_chars").collect()[0][0]
    assert sample_mean > corpus_mean


def test_source_entropy_bounds_and_values(spark):
    from counsel_data_pipeline_spark.plans.llm_text import source_entropy

    docs = load_table(spark, SF, "documents").select("lang", "source").collect()
    per_lang = defaultdict(Counter)
    for r in docs:
        per_lang[r["lang"]][r["source"]] += 1
    got = {r["lang"]: r for r in source_entropy(spark, SF).collect()}
    assert set(got) == set(per_lang)
    for lang, counts in per_lang.items():
        tot = sum(counts.values())
        h = round(
            sum(
                round(-((c / tot) * math.log(c / tot)), 6) for c in counts.values()
            ),
            6,
        )
        r = got[lang]
        assert r["n_docs"] == tot
        assert r["n_sources"] == len(counts)
        assert abs(r["source_entropy"] - h) < 1e-5
        # 0 <= H <= ln(#sources)
        assert -1e-9 <= r["source_entropy"] <= math.log(len(counts)) + 1e-6


def test_bigram_lm_score_matches_bruteforce(spark):
    from counsel_data_pipeline_spark.plans.llm_text import bigram_lm_score

    rows = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: _norm_tokens(r["text"]) for r in rows}
    uni = Counter(t for ts in toks.values() for t in ts)
    v = len(uni)
    bgc = Counter(
        f"{ts[i]} {ts[i+1]}" for ts in toks.values() for i in range(len(ts) - 1)
    )
    expected = {}
    for d, ts in toks.items():
        if len(ts) < 2:
            continue
        doc_bg = Counter(f"{ts[i]} {ts[i+1]}" for i in range(len(ts) - 1))
        s = 0.0
        n = 0
        for b, tf in doc_bg.items():
            w1 = b.split(" ")[0]
            s += tf * round(math.log((bgc[b] + 1) / (uni[w1] + v)), 6)
            n += tf
        expected[d] = (n, round(s, 6) / n)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in bigram_lm_score(spark, SF).collect()
    }
    assert set(got) == set(expected)
    for d, (n, avg) in expected.items():
        assert got[d][0] == n
        assert abs(got[d][1] - avg) < 1e-5
        assert got[d][1] < 0  # log-probabilities are negative


def test_ivf_persisted_query_matches_bruteforce(spark, tmp_path):
    """Build the parquet IVF store over the even half, query odd vectors,
    and check against a pure-Python IVF with the same seeding — proving
    the build→store→query lifecycle loses nothing to the round-trip."""
    from counsel_data_pipeline_spark.ops import similarity as sim

    rows = load_table(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}

    def nrm(v):
        s = 0.0
        for x in v:
            s += x * x
        return math.sqrt(s)

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    cents = [(i, vecs[i], nrm(vecs[i])) for i in sorted(vecs) if i % 2 == 0][:16]

    def probe(v, n, k):
        sims = sorted(
            ((dot(v, cv) / (n * cn), cid) for cid, cv, cn in cents),
            key=lambda t: (-t[0], t[1]),
        )
        return [cid for _, cid in sims[:k]]

    assigned = {
        i: probe(v, nrm(v), 1)[0] for i, v in vecs.items() if i % 2 == 0
    }
    expected = {}
    for qid in [i for i in sorted(vecs) if i % 2 == 1 and i < 16]:
        qv, qn = vecs[qid], nrm(vecs[qid])
        cells = set(probe(qv, qn, 4))
        cand = [
            (dot(qv, v) / (qn * nrm(v)), i)
            for i, v in vecs.items()
            if i % 2 == 0 and assigned[i] in cells
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        expected[qid] = [i for _, i in cand[:5]]

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    sim.build_ivf_index(emb.filter((emb.vec_id % 2) == 0), path, n_centroids=16)
    import os

    assert os.path.isdir(f"{path}/centroids")
    cells_on_disk = [d for d in os.listdir(f"{path}/lists") if d.startswith("cell=")]
    assert len(cells_on_disk) >= 2  # really partitioned by cell

    got_df = sim.query_ivf_index(
        spark, path, emb.filter((emb.vec_id % 2 == 1) & (emb.vec_id < 16)),
        k=5, n_probe=4,
    )
    got = defaultdict(list)
    for r in got_df.orderBy("query_id", "rank").collect():
        got[r["query_id"]].append(r["neighbor_id"])
    assert dict(got) == expected


def test_token_drift_psi_matches_bruteforce(spark):
    from counsel_data_pipeline_spark.plans.quality import token_drift_psi

    rows = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    halves = {0: Counter(), 1: Counter()}
    for r in rows:
        halves[r["doc_id"] % 2].update(_norm_tokens(r["text"]))
    combined = halves[0] + halves[1]
    vocab = sorted(combined, key=lambda t: (-combined[t], t))[:50]
    v = len(vocab)
    te, to = sum(halves[0].values()), sum(halves[1].values())
    expected = {}
    for t in vocab:
        p = (halves[0][t] + 1) / (te + v)
        q = (halves[1][t] + 1) / (to + v)
        expected[t] = (halves[0][t], halves[1][t], round((p - q) * math.log(p / q), 6))

    got = {
        r["term"]: (r["cnt_even"], r["cnt_odd"], r["psi_term"])
        for r in token_drift_psi(spark, SF).collect()
    }
    assert set(got) == set(expected)
    for t, (ce, co, psi) in expected.items():
        assert got[t][0] == ce and got[t][1] == co
        assert abs(got[t][2] - psi) < 1e-5
        assert got[t][2] >= -1e-12  # PSI contributions are non-negative


def test_stratified_weighted_sample_consistent_with_global(spark):
    """Same seed, same key: each source's 3 draws must be the 3 smallest
    keys of that source, and any sampled doc that also belongs to the
    global top-25 must carry the identical es_key there."""
    from counsel_data_pipeline_spark.plans.llm_curation import (
        weighted_sample,
        weighted_sample_stratified,
    )

    sfq = "/root/testdata/sf0.01"
    strat = weighted_sample_stratified(spark, sfq).collect()
    by_source = defaultdict(list)
    for r in strat:
        by_source[r["source"]].append(r)
    docs = load_table(spark, sfq, "documents").select("doc_id", "source").collect()
    n_sources = len({r["source"] for r in docs})
    assert set(by_source) == {f"src{i}" for i in range(n_sources)} or len(by_source) == n_sources
    for src, rows in by_source.items():
        assert sorted(r["rnk"] for r in rows) == [1, 2, 3]
        ks = [r["es_key"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert ks == sorted(ks)

    global_keys = {
        r["doc_id"]: r["es_key"] for r in weighted_sample(spark, sfq).collect()
    }
    for r in strat:
        if r["doc_id"] in global_keys:
            assert global_keys[r["doc_id"]] == r["es_key"]
