"""Range (interval-containment) join via bucketization.

Spark's native answer to ``p.ts BETWEEN i.start AND i.end`` with no
equi-key is a broadcast-nested-loop or cartesian plan — O(|P|·|I|)
comparisons. The standard scale fix: quantize time into fixed-width
buckets, explode each interval to the buckets it covers, map each point
to its single bucket, equi-join on the bucket id, and re-check the exact
range predicate. Cost becomes one shuffle on the bucket key with
replication factor ≈ interval_length / bucket_width + 1, independent of
|P|·|I|.

Pick ``bucket_width_s`` near the typical interval length: wider buckets
replicate less but let more non-matching pairs through to the exact
filter; narrower buckets do the reverse. Hot buckets (many intervals AND
many points in the same window) are ordinary join skew — AQE or
ops/skew salting applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, width_s: int) -> Column:
    return F.floor(F.unix_timestamp(ts) / F.lit(width_s)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    bucket_width_s: int = 600,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval with ``start <= point_ts < end``.

    ``points`` and ``intervals`` must not share column names (alias
    upstream). ``how='left'`` keeps empty intervals (point columns null) —
    the shape aggregation queries want for zero-count groups.

    Each (interval, point) pair appears exactly once: a point lives in
    exactly one bucket, and the interval's explode covers that bucket
    exactly once — no distinct pass needed.
    """
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                _bucket(F.col(start), bucket_width_s),
                # end is exclusive: the bucket of the last contained instant
                _bucket(F.col(end) - F.expr("INTERVAL 1 MICROSECOND"), bucket_width_s),
            )
        ),
    )
    pt = points.withColumn("__b", _bucket(F.col(point_ts), bucket_width_s))
    cond = (
        (iv["__b"] == pt["__b"])
        & (pt[point_ts] >= iv[start])
        & (pt[point_ts] < iv[end])
    )
    joined = iv.join(pt, cond, how)
    return joined.drop(iv["__b"]).drop(pt["__b"])
