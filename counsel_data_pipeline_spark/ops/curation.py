"""Training-data curation operators (north-star extension): deterministic
hash-based dataset splits, PII redaction, boilerplate/repetition scoring,
benchmark decontamination.

Scale design:
  - Splits are STATELESS functions of the document id (md5 bucket), so
    they need no shuffle, no global ordering, and stay stable when the
    corpus grows — a doc's split never changes as rows are added, which is
    the property a 100 TB incremental pipeline needs (random() or
    row_number() splits have neither).
  - PII redaction is pure regexp column work — whole-stage codegen, scales
    with the scan.
  - Repetition scoring is per-row array algebra (no shuffle at all).
  - Decontamination is the shingle-join pattern from ops/text_dedup: the
    benchmark side is tiny and broadcast, so contaminated docs are found
    without shuffling the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.ops.sketches import md5_bucket
from counsel_data_pipeline_spark.ops.text_analysis import (
    norm_text,
    token_count,
    tokens,
    word_shingles,
)

SPLIT_SEED = 42

# Conservative patterns that parse identically under Java regex (Spark) and
# RE2 (DuckDB): no backreferences, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"
DIGITS_RE = "[0-9]"


def split_assign(id_col: Column, train_pct: int = 80, val_pct: int = 10) -> Column:
    """Deterministic train/val/test label from a stable id hash.

    bucket = md5("42:<id>")[0:8] % 100 — reproducible in any engine (see
    ops/sketches.md5_bucket), independent of row order and partitioning.
    """
    b = md5_bucket(id_col, SPLIT_SEED, 100)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def email_count(c: Column) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))


def redact_pii(c: Column) -> Column:
    """Replace emails/phone-number-ish runs with fixed placeholders."""
    no_mail = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_mail, PHONE_RE, "<PHONE>")


def digit_scrub_stats(c: Column) -> tuple[Column, Column]:
    """(n_digit_chars, masked) — count of digit characters and the text with
    every digit RUN collapsed to '#' (shape-preserving mask)."""
    n_digits = F.length(c) - F.length(F.regexp_replace(c, DIGITS_RE, ""))
    masked = F.regexp_replace(c, "[0-9]+", "#")
    return n_digits, masked


def repetition_ratio(c: Column, n: int = 3) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier n-gram
    within the same document: 1 - distinct/total. 0 for docs shorter than
    n tokens; near-1 flags boilerplate/looping text."""
    sh = word_shingles(norm_text(c), n)
    return F.when(
        F.size(sh) > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(sh)).cast("double") / F.size(sh),
            6,
        ),
    ).otherwise(F.lit(0.0))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Find corpus docs that share ≥1 n-gram shingle with any benchmark doc
    (the standard train-set decontamination check).

    Returns (doc_id, n_shared_shingles, n_benchmark_docs). The benchmark
    side is assumed small (eval sets are) → broadcast; the corpus never
    shuffles, it only streams through the shingle join.
    """
    def shingled(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode_outer(word_shingles(norm_text(F.col(text_col)), n)).alias("shingle"),
        ).filter(F.col("shingle").isNotNull()).distinct()

    corpus_sh = shingled(corpus, "doc_id")
    bench_sh = shingled(benchmark, "bench_id")
    hits = corpus_sh.join(F.broadcast(bench_sh), "shingle")
    return hits.groupBy("doc_id").agg(
        F.countDistinct("shingle").alias("n_shared_shingles"),
        F.countDistinct("bench_id").alias("n_benchmark_docs"),
    )


def chunk_texts(c: Column, size: int = 40) -> Column:
    """Fixed-size token-window chunks of normalized text — the
    sub-document granularity for chunk-level dedup (RefinedWeb line-dedup
    generalized to token windows). Chunk i covers tokens
    [i·size, (i+1)·size); the last chunk keeps the remainder. Always ≥ 1
    chunk (split of '' yields ['']), mirroring the DuckDB twin's
    ``ceil(len/size)`` windows. Pure per-row array algebra — no shuffle."""
    tok = tokens(norm_text(c))
    n_chunks = F.ceil(F.size(tok) / F.lit(float(size))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(tok, i * size + 1, size)),
    )


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 7,
) -> DataFrame:
    """Sequence-packing audit: concat-and-chunk packing of tokenized docs
    into fixed ``ctx_len`` training windows, computed per shard.

    The pretraining dataloader shape: documents are concatenated in a
    deterministic order and the token stream is cut every ``ctx_len``
    tokens; a document whose span crosses a cut is split across two (or
    more) training sequences. This op reports, per shard: how many
    sequences the shard yields, how many documents get split by a cut,
    and how full the final ragged sequence is.

    Scale design: packing is per-shard by construction (exactly how real
    pipelines do it — each output file packs independently), so the
    running token sum is a window PARTITIONED by shard: no global
    ordering, no single-partition funnel, and the shard count scales with
    the cluster. Shard assignment is the stateless md5 bucket (stable
    under corpus growth); within a shard the order is the document id.
    The window shuffle and the following per-shard aggregate share the
    same hash partitioning, so Catalyst plans ONE exchange for both.

    Returns one row per shard:
      (shard, n_docs, total_tokens, n_sequences, n_split_docs,
       tail_tokens) — all BIGINT (exact cross-engine).
    """
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        md5_bucket(F.col(id_col), seed, n_shards).cast("bigint").alias("shard"),
        token_count(F.col(text_col)).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    # Doc spans tokens [cum - n_tok, cum); it is split iff its first and
    # last token land in different ctx_len windows. Every doc has ≥ 1
    # token (tokenizing "" yields [""]), so cum - 1 is well-defined.
    # Split iff the doc's offset within its window plus its length
    # overruns the window: (start % ctx) + n_tok > ctx.
    split = (
        ((F.col("cum") - F.col("n_tok")) % ctx_len) + F.col("n_tok")
        > F.lit(ctx_len)
    ).cast("bigint")
    total = F.sum("n_tok")
    tail = total % ctx_len
    # (total - tail) is an exact multiple of ctx_len, so the double
    # division below is exact for any ctx_len (no floor-of-inexact risk).
    n_seq = ((total - tail) / ctx_len).cast("bigint") + (tail > 0).cast("bigint")
    return (
        c.select("shard", "n_tok", "cum", split.alias("is_split"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            total.alias("total_tokens"),
            n_seq.alias("n_sequences"),
            F.sum("is_split").alias("n_split_docs"),
            tail.alias("tail_tokens"),
        )
    )


def temperature_resample(
    docs: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 29,
) -> DataFrame:
    """Language-rebalancing resampler (temperature / mixture weighting):
    every language is upsampled toward the largest one by the factor
    ``sqrt(max_count / count)`` — the α = 0.5 temperature commonly used to
    lift low-resource languages without flattening the distribution.

    A document with factor f is emitted ``floor(f)`` times, plus one more
    iff its md5 bucket falls below the fractional part — deterministic
    "repetition with stochastic rounding", stable under corpus growth and
    independent of scan order (no random(), no global sort).

    Scale design: the per-lang counts are a tiny aggregate (one row per
    language) broadcast back to the scan; copy expansion is a map-side
    ``explode(sequence(...))``. Nothing about the corpus itself shuffles.

    Returns the resampled corpus: input columns + ``copy_id`` (1-based).
    """
    # NULL language is its own stratum, not a dropped row: group and join
    # on a null-coalesced key (a plain equi-join would silently lose every
    # NULL-lang doc, violating the no-drop invariant).
    lang_key = F.coalesce(F.col(lang_col).cast("string"), F.lit("\x00<null>"))
    tagged = docs.withColumn("__lang_key", lang_key)
    # the max and the per-lang counts fold into ONE row (max +
    # collect_list over the lang-domain-bounded counts) and re-explode —
    # no counts self-join, so nothing to pin: the counts aggregate has a
    # single consumer and the corpus is scanned exactly twice (count,
    # then expand). This replaced an r12 lazy persist whose cache-build
    # constant cost ~25% on this sub-second query while saving nothing
    # (measured interleaved at sf0.1: one-row 0.602s vs pinned 0.732s vs
    # the pre-pin 3-scan form 0.614s).
    fac = (
        tagged.groupBy("__lang_key")
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.max("__n").alias("__mx"),
            F.collect_list(F.struct("__lang_key", "__n")).alias("__ps"),
        )
        .select("__mx", F.explode("__ps").alias("__p"))
        .select(
            F.col("__p.__lang_key").alias("__lang_key"),
            F.sqrt(
                F.col("__mx").cast("double") / F.col("__p.__n").cast("double")
            ).alias("__fac"),
        )
    )
    b = md5_bucket(F.col(id_col), seed, 1_000_000).cast("double")
    n_copies = (
        F.floor(F.col("__fac")).cast("long")
        + (b < (F.col("__fac") - F.floor(F.col("__fac"))) * F.lit(1_000_000.0)).cast(
            "long"
        )
    )
    return (
        tagged.join(F.broadcast(fac), "__lang_key")
        .withColumn("__copies", n_copies)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(1).cast("long"), F.col("__copies"))))
        .drop("__lang_key", "__fac", "__copies")
    )


def chunk_dedup_stats_frame(docs: DataFrame, size: int = 40) -> DataFrame:
    """Per-lang chunk-level dedup audit over fixed ``size``-token windows
    (the body behind the ``curation_chunk_dedup_stats`` catalog query —
    shared so tests exercise the registered plan, not a re-implementation).
    Two-level exact distinct (no Expand): chunk explode → (lang, chunk)
    count → per-lang totals."""
    chunks = docs.select(
        "lang", F.explode(chunk_texts(F.col("text"), size)).alias("chunk")
    )
    d = chunks.groupBy("lang", "chunk").agg(F.count(F.lit(1)).alias("n"))
    return d.groupBy("lang").agg(
        F.sum("n").alias("total_chunks"),
        F.count(F.lit(1)).alias("distinct_chunks"),
        (F.sum("n") - F.count(F.lit(1))).alias("dup_chunks"),
        (
            (F.sum("n") - F.count(F.lit(1))).cast("double") / F.sum("n")
        ).alias("dup_ratio"),
    )


# Rule set from the Gopher corpus-filtering appendix (Rae et al. 2021,
# arXiv:2112.11446 Table A1) — the de-facto-standard pre-training quality
# gate. Thresholds are the published ones; every feature is exact integer
# counting + one int/int→double division, so the DuckDB oracle reproduces
# the values bit-for-bit (see plans/_parity.py on why no rounding of
# float-valued intermediates is needed or wanted here).
GOPHER_REQUIRED_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MEAN_WL, GOPHER_MAX_MEAN_WL = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_RATIO = 0.9
GOPHER_MAX_ELLIPSIS_RATIO = 0.3
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOPS = 2


def gopher_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document Gopher quality-rule features + keep verdict.

    Pure per-row column algebra — no shuffle, no UDF; scales with the scan
    exactly like the PII/repetition ops above. Words = whitespace tokens of
    the trimmed text; lines = raw text split on newline (bullet/ellipsis
    rules are line-positional, so they must see the un-collapsed text).
    ``passthrough`` carries extra input columns into the output so a
    pipeline can chain gate→gate→dedup on one scan without join-backs.
    """
    t = F.trim(F.col(text_col))
    words = tokens(t)
    n_words = F.size(words)
    sum_wl = F.aggregate(F.transform(words, F.length), F.lit(0), lambda a, x: a + x)
    mean_wl = sum_wl.cast("double") / n_words
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    n_ellipsis = (
        (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / F.lit(3)
    ).cast("int") + (
        F.length(t) - F.length(F.regexp_replace(t, "…", ""))
    )
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda l: l.rlike("^[ \t]*[-*•]"))
    )
    # \r? : Java's bare $ matches before a trailing \r, RE2's does not —
    # the explicit \r? makes Spark and the DuckDB oracle agree on CRLF text.
    n_ell_end = F.size(
        F.filter(lines, lambda l: l.rlike("(\\.\\.\\.|…)[ \t]*\r?$"))
    )
    bullet_ratio = n_bullet.cast("double") / n_lines
    ellipsis_ratio = n_ell_end.cast("double") / n_lines
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = n_alpha.cast("double") / n_words
    n_stops = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPS]),
        )
    )
    keep = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_wl.between(GOPHER_MIN_MEAN_WL, GOPHER_MAX_MEAN_WL)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (bullet_ratio <= GOPHER_MAX_BULLET_RATIO)
        & (ellipsis_ratio <= GOPHER_MAX_ELLIPSIS_RATIO)
        & (alpha_ratio >= GOPHER_MIN_ALPHA_RATIO)
        & (n_stops >= GOPHER_MIN_STOPS)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_line_ratio"),
        ellipsis_ratio.alias("ellipsis_line_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        n_stops.alias("n_required_stops"),
        keep.alias("keep"),
        *[F.col(c) for c in passthrough],
    )


SHUFFLE_SEED = 17


def shuffle_order(
    docs: DataFrame,
    id_col: str = "doc_id",
    seed: int = SHUFFLE_SEED,
    n_buckets: int = 64,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic pseudo-random global training order WITHOUT a
    single-partition window.

    Training pipelines need a reproducible global shuffle of the corpus
    (position → example) that any worker can recompute. A global
    ``row_number() OVER (ORDER BY hash)`` funnels 100 TB through one task;
    instead:

    1. bucket = md5("seed:id") first-8-hex mod ``n_buckets`` — a
       deterministic function of the row, so (unlike repartitionByRange
       sampling) the counts job and the ranking job agree by construction,
       no checkpoint pinning needed;
    2. per-bucket ``row_number`` ordered by (md5, id) — ``n_buckets``
       independent sorts;
    3. bucket counts (``n_buckets`` rows) → driver prefix-sum → CASE
       offset map; global position = offset(bucket) + local rank.

    The md5 orders rows pseudo-randomly; bucket boundaries follow the
    SAME md5 prefix, so ordering by (bucket, md5, id) is exactly ordering
    by (md5-prefix-bucket, md5, id) — one global deterministic shuffle.
    Returns (doc_id, bucket, position, shard) with shard = position mod
    ``n_shards`` (round-robin over the shuffled order, the standard
    worker-interleave).
    """
    from functools import reduce

    payload = F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    h = F.md5(F.encode(payload, "UTF-8"))
    b = (
        docs.select(F.col(id_col).alias("doc_id"))
        .withColumn("__h", h)
        .withColumn(
            "bucket",
            (F.conv(F.substring(F.col("__h"), 1, 8), 16, 10).cast("bigint")
             % F.lit(n_buckets)),
        )
    )
    counts = sorted(
        (r["bucket"], r["cnt"])
        for r in b.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for bucket, c in counts:
        offsets[bucket] = acc
        acc += c
    w = Window.partitionBy("bucket").orderBy("__h", "doc_id")
    offset_col = reduce(
        lambda e, kv: e.when(F.col("bucket") == kv[0], F.lit(kv[1])),
        offsets.items(),
        F.when(F.lit(False), F.lit(0)),
    ).otherwise(F.lit(0)).cast("bigint")
    return (
        b.withColumn("position", offset_col + F.row_number().over(w) - F.lit(1))
        .select(
            "doc_id",
            "bucket",
            "position",
            (F.col("position") % F.lit(n_shards)).alias("shard"),
        )
    )


# Doc-level form of the C4 cleaning rules (Raffel et al. 2019,
# arXiv:1910.10683 §2.2): line-ending punctuation, minimum sentence count,
# lorem-ipsum / curly-brace / boilerplate-policy detection. (C4's
# line-DROPPING variant is a trivial filter over the same line features;
# the flags form keeps the query oracle-able row-per-doc.) All counting is
# exact integer work + one int/int division — bit-parity with the SQL twin.
C4_POLICY_PHRASES = ("terms of use", "privacy policy", "cookie policy", "uses cookies")
C4_MIN_SENTENCES = 3


def c4_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document C4 rule features + keep verdict. Pure per-row column
    algebra — no shuffle, no UDF; same scan-bound scaling as gopher_flags.
    ``passthrough`` as in gopher_flags."""
    t = F.col(text_col)
    low = F.lower(t)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    # \r? for CRLF parity with the oracle — see gopher_flags.
    n_terminal = F.size(
        F.filter(lines, lambda l: l.rlike('[.!?"][ \t]*\r?$'))
    )
    n_sentences = F.length(t) - F.length(F.regexp_replace(t, "[.!?]", ""))
    has_lorem = low.contains("lorem ipsum")
    has_curly = t.contains("{")
    has_policy = None
    for p in C4_POLICY_PHRASES:
        c = low.contains(p)
        has_policy = c if has_policy is None else (has_policy | c)
    keep = (
        (n_sentences >= C4_MIN_SENTENCES)
        & ~has_lorem
        & ~has_curly
        & ~has_policy
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_lines.alias("n_lines"),
        n_terminal.alias("n_terminal_lines"),
        (n_terminal.cast("double") / n_lines).alias("terminal_line_ratio"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_curly.alias("has_curly_brace"),
        has_policy.alias("has_policy_phrase"),
        keep.alias("keep"),
        *[F.col(c) for c in passthrough],
    )


def es_sample_key(id_col: Column, weight_col: Column, seed: int) -> Column:
    """Efraimidis–Spirakis exponential-race key: -ln(u)/w with a
    deterministic md5-derived uniform u in (0,1). The k SMALLEST keys are
    a weighted sample without replacement with inclusion ∝ w.

    Pure function of the row → reproducible under re-partitioning,
    retries, and streaming re-delivery, and the top-k of a union is the
    top-k of the per-part top-ks (the merge property streaming/sampling
    relies on). Rounded to the 1e-9 grid so a last-ulp libm-ln difference
    between engines cannot flip an oracle comparison (plans/_parity.py).
    """
    h32 = F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.lit(f"{seed}:"), id_col.cast("string")), "UTF-8")),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    return F.round((-F.log(u)) / weight_col, 9)


# ---------------------------------------------------------------------------
# PII scrub (emails / phone numbers) — map-side redaction
# ---------------------------------------------------------------------------

# RE2-compatible subset (no lookaround, no backrefs) so the DuckDB oracle
# evaluates the IDENTICAL pattern: Java (Spark) and RE2 (DuckDB) agree on
# character classes, bounded repetition, and alternation-free patterns.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"[0-9]{2,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}"


def pii_scrub(c: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, redacted): occurrence counts and the text with
    every email replaced by [EMAIL] and every phone by [PHONE]. Pure
    map-side expressions — precompiled regexes inside whole-stage codegen,
    no shuffle, no UDF; the 100 TB cost is one codegen'd projection."""
    n_emails = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(c, F.lit(PII_PHONE_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(c, PII_EMAIL_RE, "[EMAIL]"),
        PII_PHONE_RE,
        "[PHONE]",
    )
    return n_emails, n_phones, redacted
