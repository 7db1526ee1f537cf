"""Source-data fingerprinting for cached derived artifacts (persisted IVF
index, streaming input staging).

Plan builders that materialize a derived store want to reuse it across
correctness sweeps and bench reruns, but MUST rebuild when the driver
regenerates the testdata (as happened in round 4). The cache key is a
fingerprint of the source parquet's file names + sizes + mtimes.

Gotcha this module exists to fix: ``glob("<file>/**", recursive=True)``
on a plain FILE path returns ``['<file>/']`` — non-empty, but
``os.path.isfile`` is False for the trailing-slash form — so a naive
glob-then-filter hashes NOTHING and every scale factor collides on
md5("") (which silently served sf0.01's staged stream input to the
sf0.1 run). Fingerprinting an empty file set is therefore an error here,
never a silent empty hash.
"""

from __future__ import annotations

import glob
import hashlib
import os
import tempfile


def table_fingerprint(sf_dir: str, table: str) -> str:
    """Hex fingerprint of ``<sf_dir>/<table>.parquet`` (file or directory)."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isfile(src):
        files = [src]
    else:
        files = sorted(
            p
            for p in glob.glob(os.path.join(src, "**"), recursive=True)
            if os.path.isfile(p)
        )
    if not files:
        raise FileNotFoundError(f"no parquet files to fingerprint under {src}")
    h = hashlib.md5()
    for p in files:
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:16]


def derived_cache_dir(kind: str, sf_dir: str, table: str) -> str:
    """Deterministic scratch location for a derived artifact of ``table``:
    same source files → same dir (reuse); regenerated source → new dir
    (rebuild)."""
    return os.path.join(
        tempfile.gettempdir(), kind, table_fingerprint(sf_dir, table)
    )
