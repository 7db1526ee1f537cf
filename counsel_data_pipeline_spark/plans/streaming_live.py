"""Driver-attestable Structured Streaming queries.

The streaming surface (windows, stateful dedup, reservoir sampling,
sketch maintenance) was previously verified only by batch≡stream pytest;
the external driver never executed a stream. The queries here EXECUTE a
real Structured Streaming job inside the plan function (the same
execute-inside-the-plan pattern sim_ivf_persisted_query proved out) and
return its final state, so a green CORRECTNESS row attests a value that
was actually computed by the streaming engine.

Oracle strategy: the streamed operator is the A-ES weighted reservoir
(streaming/sampling.py), whose exponential-race key is a pure function
of the row. The k-row reservoir folded across micro-batches therefore
equals the batch top-k over the union — the SAME DuckDB oracle as
curation_weighted_sample, now answered by foreachBatch state
maintenance instead of TakeOrdered.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from counsel_data_pipeline_spark.catalog import register
from counsel_data_pipeline_spark.io.fingerprint import derived_cache_dir
from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.streaming.sampling import run_weighted_sample_stream

_K = 25
_SEED = 777  # same seed as curation_weighted_sample → same sample
_N_FILES = 4  # staged input files → micro-batches (maxFilesPerTrigger=1)
_STREAM_COLS = "doc_id BIGINT, source STRING, n_chars BIGINT"


def _staged_input_dir(sf_dir: str) -> str:
    """Stage documents(doc_id, source, n_chars) as N parquet files so the
    file stream sees N micro-batches. Cached under a path keyed by the
    source file fingerprint (io/fingerprint.py — same pattern as the
    persisted IVF index): sweeps and bench reruns reuse one staging copy;
    a testdata regeneration changes the fingerprint and forces a restage.
    The file SPLIT need not be deterministic — the reservoir is the
    global top-k of a pure row function, invariant to how rows are
    batched."""
    return derived_cache_dir("counsel_stream_stage", sf_dir, "documents")


@register(
    "streaming_weighted_reservoir",
    # Identical oracle to curation_weighted_sample: the A-ES key is a pure
    # row function, so maintaining the k-row reservoir across micro-batches
    # (top-k of reservoir ∪ batch, per batch) equals the batch top-k.
    oracle=f"""
        WITH u AS (
          SELECT doc_id, source, n_chars,
                 (CAST(concat('0x', substr(md5(concat('{_SEED}:',
                        CAST(doc_id AS VARCHAR))), 1, 8)) AS UBIGINT) + 0.5)
                   / 4294967296.0 AS u
          FROM documents
        )
        SELECT doc_id, source, n_chars,
               round((-ln(u)) / n_chars, 9) AS es_key
        FROM u
        ORDER BY es_key, doc_id LIMIT {_K}
    """,
    description=f"A-ES weighted reservoir (k={_K}) maintained by a real "
    f"AvailableNow Structured Streaming job over {_N_FILES} micro-batches "
    "(foreachBatch folds each batch's top-k against the persisted "
    "reservoir); result computed BY the streaming engine, verified against "
    "the batch-sampling oracle",
    tags=("llm", "curation", "sampling", "streaming"),
)
def streaming_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    stage = _staged_input_dir(sf_dir)
    done = os.path.join(stage, "_SUCCESS")
    if not os.path.exists(done):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        )
        docs.repartition(_N_FILES).write.mode("overwrite").parquet(stage)
    # Fresh checkpoint + reservoir per invocation: the stream genuinely
    # re-executes every time this plan is built (no stale streaming state
    # can masquerade as a fresh computation). The final reservoir is k
    # rows — collecting it is bounded by construction — which lets the
    # scratch dir be deleted before returning.
    work = tempfile.mkdtemp(prefix="counsel_stream_reservoir_")
    try:
        final = run_weighted_sample_stream(
            spark,
            input_dir=stage,
            work_dir=work,
            schema=_STREAM_COLS,
            k=_K,
            seed=_SEED,
            id_col="doc_id",
            weight_col="n_chars",
            carry_cols=("source",),
            max_files_per_trigger=1,
        )
        rows = final.collect()
        schema = final.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, schema).select(
        "doc_id", "source", "n_chars", "es_key"
    )
