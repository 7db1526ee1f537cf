"""Python DataSource batch WRITER: a JSON-lines sink with a real
two-phase commit.

The reader side of the Python DataSource API is attested by
``clinic_datasource`` (polymorphic county JSON) and
``range_stream_source`` (streaming replay); this module closes the
source/sink symmetry with the WRITE path: each task stages its rows as
an invisible file and returns a commit message carrying (path, row
count, value checksum); the DRIVER publishes staged files on commit
(rename into the final directory + a ``_SUCCESS`` manifest with the
job totals, written last and atomically) and clears staging on abort —
so a failed job leaves no published output, the exactly-once contract
object stores and downstream readers depend on.

Publication contract (single writer per path assumed): each part file
appears atomically (``os.replace``), but a multi-file commit is a
SEQUENCE of renames — a reader that globs ``part-*.jsonl`` mid-commit
can observe a prefix of the job's files. The ``_SUCCESS`` manifest is
therefore the integrity gate: it is written AFTER every rename, via
write-to-temp + atomic replace, and carries the directory's cumulative
(n_files, n_rows, value checksum) — a reader that requires exactly-once
keys on the manifest and verifies the totals (as the roundtrip catalog
query does), never on the bare file listing.

Save modes: ``overwrite`` removes previously published part files and
the manifest before publishing, so the directory holds exactly this
job's output; any other mode appends — new parts are numbered after the
existing ones and the manifest totals accumulate.

Scale notes: write() streams rows per executor task — no driver data
path; commit messages are O(tasks), the only driver-side state. The
manifest totals let a reader (or the roundtrip query) verify
publication integrity without re-listing file contents. Parity with the
reference's wrapped-JSON writer (K1, ``io/sinks.py``): same
dialect-exact JSON text discipline, but distributed and transactional.
"""

from __future__ import annotations

import json
import os
import shutil
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


def _part_index(name: str) -> int | None:
    # "part-00042.jsonl" -> 42; None for foreign part-*.jsonl files a
    # human or tool dropped in (they must neither crash a commit nor be
    # clobbered/deleted by one).
    mid = name[len("part-"):-len(".jsonl")]
    return int(mid) if mid.isdigit() else None


class JsonlSinkWriter(DataSourceWriter):
    """Stage-then-publish JSONL writer.

    Tasks write ``<path>/_staging/<uuid>.jsonl`` (invisible to readers,
    which look only at ``part-*.jsonl`` gated on ``_SUCCESS``); the
    driver's commit() renames staged files to ``part-NNNNN.jsonl`` in
    deterministic (sorted staged-name) order, rewrites the ``_SUCCESS``
    manifest atomically, and clears the staging directory — which also
    reaps orphan files from task attempts that died mid-write and so
    never produced a commit message. abort() clears staging wholesale
    for the same reason (single writer per path assumed).
    """

    def __init__(self, options: dict, overwrite: bool = False) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("counseljsonl sink requires option 'path'")
        self.path = path
        self.overwrite = overwrite
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

    def _published_parts(self) -> dict[int, str]:
        """index -> filename for the sink's own numbered parts only."""
        out: dict[int, str] = {}
        for f in os.listdir(self.path):
            if f.startswith("part-") and f.endswith(".jsonl"):
                i = _part_index(f)
                if i is not None:
                    out[i] = f
        return out

    def commit(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        commits = [m for m in messages if m is not None]
        manifest_path = os.path.join(self.path, "_SUCCESS")
        if self.overwrite:
            # This job's output replaces the directory's contents: drop
            # the old manifest FIRST (readers keyed on it stop trusting
            # the listing before any part file changes), then the parts.
            if os.path.exists(manifest_path):
                os.remove(manifest_path)
            for f in self._published_parts().values():
                os.remove(os.path.join(self.path, f))
            start = 0
            prev = {"n_files": 0, "n_rows": 0, "value_sum_mi": 0}
        else:
            prev = {"n_files": 0, "n_rows": 0, "value_sum_mi": 0}
            if os.path.exists(manifest_path):
                with open(manifest_path) as fh:
                    prev = json.load(fh)
            # Crash repair: the manifest is the publication gate, so any
            # numbered parts beyond its n_files are orphans of a commit
            # that died between its renames and its manifest write —
            # UNPUBLISHED by contract. Remove them; otherwise every later
            # append publishes a manifest whose totals exclude them and
            # the manifest/read-back integrity check fails forever.
            existing = self._published_parts()
            orphans = sorted(existing)[prev["n_files"]:]
            for i in orphans:
                os.remove(os.path.join(self.path, existing.pop(i)))
            start = (max(existing) + 1) if existing else 0
        for i, m in enumerate(sorted(commits, key=lambda c: c.staged_path)):
            final = os.path.join(self.path, f"part-{start + i:05d}.jsonl")
            os.replace(m.staged_path, final)
        manifest = {
            "n_files": prev["n_files"] + len(commits),
            "n_rows": prev["n_rows"] + sum(m.n_rows for m in commits),
            "value_sum_mi": prev["value_sum_mi"]
            + sum(m.value_sum_mi for m in commits),
        }
        tmp = manifest_path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, manifest_path)
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

    def abort(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        # Whole-directory clear, not just message-listed files: a task
        # that died mid-write staged a file but never returned a commit
        # message, and nothing else ever reaps it.
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "counseljsonl"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite=overwrite)


def register(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
