"""Object-store IO (SURVEY §2.1 S5 / §2.2 K3) behind a pluggable backend.

Reference behavior reproduced (``src/gcs-io.js:10-30`` +
``scripts/entrypoint.sh:31-57`` usage):

- ``download_or_empty``: fetch an object to a local landing path; a
  MISSING object writes the empty-JSON default (``'{}'``) instead of
  failing — the cold-start semantics the snapshot diff relies on (an
  absent previous snapshot means "everything is delta").
- ``upload``: publish a local file to the store (the reference sets
  content-type/no-cache metadata; backends may ignore hints they don't
  support).
- dated snapshots: the publish step writes both a stable "latest" key
  and a dated copy (``<prefix>/<YYYY-MM-DD>/<name>``, T5 retention);
  ``latest_dated`` resolves the newest dated copy by key order — dates
  are zero-padded ISO so lexicographic max IS the newest.

The backend protocol is three methods over bytes; :class:`LocalFSStore`
is the in-tree implementation (this container has no cloud SDK or
network). A GCS/S3 backend plugs in behind the same protocol without
touching callers — the pipeline code holds no ``gs://`` specifics,
exactly like the geocoder transports and the collector transport.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Protocol

EMPTY_JSON_DEFAULT = b"{}"


class ObjectStore(Protocol):
    def exists(self, key: str) -> bool: ...

    def get(self, key: str) -> bytes: ...

    def put(self, key: str, data: bytes, content_type: str = "application/json") -> None: ...

    def list(self, prefix: str) -> list[str]: ...


@dataclass
class LocalFSStore:
    """Filesystem-backed ObjectStore: key → ``<root>/<key>``. Used by
    tests and single-node runs; semantics (missing-object behavior, key
    listing, overwrite-on-put) mirror a cloud bucket."""

    root: str

    def _path(self, key: str) -> str:
        p = os.path.normpath(os.path.join(self.root, key))
        if not p.startswith(os.path.normpath(self.root) + os.sep):
            raise ValueError(f"key escapes store root: {key}")
        return p

    def exists(self, key: str) -> bool:
        return os.path.isfile(self._path(key))

    def get(self, key: str) -> bytes:
        with open(self._path(key), "rb") as f:
            return f.read()

    def put(self, key: str, data: bytes, content_type: str = "application/json") -> None:
        p = self._path(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)  # atomic publish, no torn reads

    def list(self, prefix: str) -> list[str]:
        base = os.path.normpath(self.root)
        out = []
        for dirpath, _, files in os.walk(base):
            for fn in files:
                key = os.path.relpath(os.path.join(dirpath, fn), base)
                key = key.replace(os.sep, "/")
                if key.startswith(prefix):
                    out.append(key)
        return sorted(out)


def download_or_empty(store: ObjectStore, key: str, local_path: str) -> bool:
    """S5: land ``key`` at ``local_path``; a missing object writes the
    empty-JSON default and returns False (gcs-io.js:10-21)."""
    os.makedirs(os.path.dirname(os.path.abspath(local_path)), exist_ok=True)
    if not store.exists(key):
        with open(local_path, "wb") as f:
            f.write(EMPTY_JSON_DEFAULT)
        return False
    with open(local_path, "wb") as f:
        f.write(store.get(key))
    return True


def upload(store: ObjectStore, local_path: str, key: str) -> None:
    """K3: publish a local file to the store (gcs-io.js:23-30)."""
    with open(local_path, "rb") as f:
        store.put(key, f.read())


_DATED_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def publish_snapshot(
    store: ObjectStore, local_path: str, prefix: str, name: str, date: str
) -> tuple[str, str]:
    """K3+T5: publish ``local_path`` as BOTH the stable latest key
    (``<prefix>/<name>``) and a dated retention copy
    (``<prefix>/<date>/<name>``). ``date`` must be ISO (zero-padded) so
    the dated keyspace sorts chronologically."""
    if not _DATED_RE.match(date):
        raise ValueError(f"date must be YYYY-MM-DD, got {date!r}")
    with open(local_path, "rb") as f:
        data = f.read()
    latest_key = f"{prefix}/{name}"
    dated_key = f"{prefix}/{date}/{name}"
    store.put(dated_key, data)   # retention copy first:
    store.put(latest_key, data)  # latest never points at missing history
    return latest_key, dated_key


def latest_dated(store: ObjectStore, prefix: str, name: str) -> str | None:
    """Newest dated snapshot key under ``prefix``, or None. ISO dates
    make lexicographic max the newest; non-dated keys are ignored."""
    best = None
    for key in store.list(prefix + "/"):
        rest = key[len(prefix) + 1 :]
        parts = rest.split("/")
        if len(parts) == 2 and parts[1] == name and _DATED_RE.match(parts[0]):
            if best is None or key > best:
                best = key
    return best
