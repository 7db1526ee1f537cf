"""A Spark 4 Python Data Source for the clinic landing-zone JSON.

``read_clinic_json`` (io/sources.py) parses one wrapper file on the
driver — right for the reference's per-county documents, wrong for a
landing zone holding thousands of collector outputs. This module makes
the polymorphic wrapper/array JSON a FIRST-CLASS distributed source via
the Python Data Source API (new in Spark 4):

    from counsel_data_pipeline_spark.io.clinic_datasource import register
    register(spark)
    df = spark.read.format("clinicjson").load("/landing/2026-08-14/*.json")

One input partition per file (landing files are kilobyte-sized wrapper
documents — a file is the natural split unit), executed in parallel
across executors; each row carries ``ingest_order`` (position within
its file — the insertion-order column the dedup/merge semantics need)
and ``source_file`` (lineage). Count fields stay lossless STRINGS —
upstream emits numbers, numeric strings, '' and null interchangeably,
and the P5 lenient cast (ops/clean.js_to_int) is the single place that
coerces, at clean time, exactly like the reference's ``Number()``.

Shapes accepted per file mirror io/sources.extract_rows: a bare array,
or an object keyed rows/data/clinics (geocode.js:88-99); an empty
object is zero rows (the S5 empty default), matching
``extract_rows(default_empty=True)``.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA_DDL = (
    "countyName string, orgName string, phone string, address string, "
    "payDetail string, thisWeekRange string, thisWeekCount string, "
    "nextWeekRange string, nextWeekCount string, next2WeekRange string, "
    "next2WeekCount string, next3WeekRange string, next3WeekCount string, "
    "in4WeekTotleCount string, editDate string, strTeleconsultation string, "
    "ingest_order bigint, source_file string"
)

_FIELDS = [f.split()[0] for f in SCHEMA_DDL.split(", ")[:-2]]


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ClinicJsonReader(DataSourceReader):
    def __init__(self, options: dict):
        # Spark passes a single load("glob") through the 'path' option and
        # load(path1, path2, ...) as a JSON list under 'paths'. 'path' is
        # ONE glob — never comma-split it (a landing path may contain a
        # comma).
        if options.get("paths"):
            pats = [str(p) for p in json.loads(str(options["paths"]))]
        else:
            pats = [str(options.get("path", ""))]
        self.paths = sorted(
            p for pat in pats for p in _glob.glob(pat) if os.path.isfile(p)
        )
        if not self.paths:
            raise FileNotFoundError(f"clinicjson: no files match {pats!r}")

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in self.paths]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        # runs ON THE EXECUTOR: import inside so the cloudpickled reader
        # resolves the package through the executor's PYTHONPATH
        from counsel_data_pipeline_spark.io.sources import extract_rows

        with open(partition.path, encoding="utf-8") as f:
            rows = extract_rows(json.load(f), default_empty=True)
        for i, r in enumerate(rows):
            vals = tuple(
                None if r.get(k) is None else str(r.get(k)) for k in _FIELDS
            )
            yield vals + (i, partition.path)


class ClinicJsonDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "clinicjson"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> ClinicJsonReader:
        # The reader yields tuples in SCHEMA_DDL order; a user-supplied
        # .schema(...) would bind those values POSITIONALLY to different
        # names with no error. Reject anything but the declared schema.
        expected = [f.split()[0] for f in SCHEMA_DDL.split(", ")]
        got = [f.name for f in schema.fields]
        if got != expected:
            raise ValueError(
                "clinicjson does not support user-specified schemas; "
                f"remove .schema(...) (got fields {got[:4]}..., "
                f"expected {expected[:4]}...)"
            )
        return ClinicJsonReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ClinicJsonDataSource)
