"""Query plan modules. Importing this package registers every query in
counsel_data_pipeline_spark.catalog.QUERIES."""

from counsel_data_pipeline_spark.plans import (  # noqa: F401
    events,
    graph,
    llm_curation,
    llm_dedup,
    llm_multimodal,
    llm_similarity,
    llm_text,
    maintenance,
    quality,
    reference_ops,
    rollup,
    setops,
    sketches,
    streaming_live,
    tpch,
    window,
)
