"""Custom stateful streaming operators (applyInPandasWithState).

The reference's first-wins dedup (``uniqByKey``, reference
src/index.js:89-98, SURVEY §2.4 A1) keeps the first arrival per key. In
batch that is a window over an explicit arrival-order column
(ops/dedup.first_wins); across an UNBOUNDED stream it needs per-key state:
"have I emitted this key yet?". That is exactly Spark's
``applyInPandasWithState`` — grouped Arrow batches plus a typed GroupState
per key.

Scale notes:
  - State per key is a single boolean + timestamp — the minimal footprint;
    the state store shards by the grouping key across
    ``spark.sql.shuffle.partitions`` tasks.
  - State is kept forever (NoTimeout) = exact global dedup. For unbounded
    key spaces the bounded-state variant swaps in EventTimeTimeout and
    drops keys past the watermark, accepting re-emission of very late
    duplicates — the standard exactness/state tradeoff.
  - Within one micro-batch the earliest row by (ts, event_id) wins, so
    re-ordering inside a batch cannot change the survivor — deterministic
    under replay, which exactly-once sinks require.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "seen boolean"


def first_seen_filter(
    events: DataFrame,
    key_cols: list[str],
    order_cols: list[str] = ("ts", "event_id"),
    watermark: tuple[str, str] | None = ("ts", "2 hours"),
) -> DataFrame:
    """Emit only the FIRST row ever seen per key (streaming A1 dedup).

    ``events`` must be a streaming DataFrame; output schema == input
    schema. Survivor within a micro-batch = min(order_cols).
    """
    if watermark is not None:
        events = events.withWatermark(*watermark)
    out_schema = events.schema
    order_list = list(order_cols)

    def dedup_fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # key already emitted in an earlier micro-batch — drop all
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            cand = pdf.sort_values(order_list).head(1)
            if first is None or (
                cand[order_list].iloc[0].tolist()
                < first[order_list].iloc[0].tolist()
            ):
                first = cand
        if first is not None:
            state.update((True,))
            yield first

    return events.groupBy(*key_cols).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
