"""r16 optimization plan-shape pins.

Two Spark behaviors drove this round's shingle-family fixes; each pin
fails if a refactor silently reintroduces the pathology:

1. ``InferFiltersFromGenerate`` rewrites ``explode(attr)`` into a
   ``size(attr) > 0 AND isnotnull(attr)`` filter, and predicate pushdown
   then re-substitutes the alias chain — duplicating the whole
   tokenize+shingle expression into a Filter that runs below the
   ``spread`` repartition Exchange, serially on the one-file input
   partition (measured 11.8 s single-task at sf0.1). ``jaccard_pairs``
   blocks the pushdown with an eager cache boundary on the per-doc set
   table; the pin asserts no Filter below the repartition carries the
   tokenize chain.

2. Subexpression elimination skips lambda bodies, so a one-shot
   ``transform(..., lambda ... tokens(...))`` expression re-tokenizes per
   shingle wherever the plan is evaluated interpreted (cache builds,
   non-codegen projections). The staged builders bind each
   lambda-consumed input to its own projection; the pin asserts the
   MinHash signature projection consumes a BOUND md5-words column rather
   than inlining the md5 transform into the H array_min subtrees.
"""

import pyspark.sql.functions as F

from counsel_data_pipeline_spark.ops import text_dedup as td

_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),
    (3, "pack my box with five dozen liquor jugs for the long trip"),
    (4, "sphinx of black quartz judge my vow said the old teacher"),
]


def _optimized(df):
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_jaccard_pairs_no_inferred_tokenize_filter(spark):
    import re

    docs = spark.createDataFrame(_DOCS, "doc_id bigint, text string")
    out = td.jaccard_pairs(docs, n=3, threshold=0.5, max_shingle_df=5)
    plan = _optimized(out)
    for line in plan.splitlines():
        # match Filter nodes at ANY tree depth (the r16 prefix check
        # missed nodes nested past ~20 chars of tree prefix)
        if re.search(r"\bFilter\b", line):
            # the tokenize chain appearing inside ANY filter of this plan
            # means the inferred-generate filter escaped the cache
            # boundary and is re-deriving the shingle work per row
            assert "regexp_replace" not in line, (
                "tokenize chain duplicated into a Filter:\n"
                + line.strip()[:400]
            )


def test_signature_rows_stage_binds_md5_words_once(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id bigint, text string")
    sigs = td.minhash_signatures(docs, n=3, n_hashes=16)
    plan = _optimized(sigs)
    # The md5 transform must appear in its own (staged) projection, not
    # inlined 16x into the array_min subtrees: the staged words line
    # mentions md5( exactly twice (the w1/w2 slices of ONE digest, CSE'd
    # in codegen); the collapsed form mentions it 2 x n_hashes times.
    worst = max(line.count("md5(") for line in plan.splitlines())
    assert worst <= 2, (
        f"md5 transform inlined {worst}x into one projection - the "
        "staged words column collapsed back into the signature mins"
    )


def test_signature_values_unchanged_by_staging(spark):
    """The staged signature path must produce the exact r15 hash family:
    sig[i] = min over shingles of (A_i*w1 + B_i*w2 + C_i) mod 2^32 with
    (w1, w2) the two leading 32-bit md5 words — recomputed here from
    first principles per doc."""
    import hashlib

    docs = spark.createDataFrame(_DOCS, "doc_id bigint, text string")
    got = {
        r["id"]: list(r["sig"])
        for r in td.minhash_signatures(docs, n=3, n_hashes=16).collect()
    }

    def shingles(text):
        toks = text.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    coeffs = td.mh_coeffs(16)
    for doc_id, text in _DOCS:
        expect = []
        for i in range(16):
            a, b, c = coeffs[i]
            best = None
            for sh in shingles(text):
                h = hashlib.md5(sh.encode()).hexdigest()
                w1, w2 = int(h[:8], 16), int(h[8:16], 16)
                v = (a * w1 + b * w2 + c) % (1 << 32)
                best = v if best is None else min(best, v)
            expect.append(best)
        assert got[doc_id] == expect, f"doc {doc_id} signature drifted"
