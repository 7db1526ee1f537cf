"""io/fingerprint.py: derived-artifact cache keys must track the source
files — the r6 bug this guards against was glob("<file>/**") returning
only the trailing-slash form, hashing nothing, and every scale factor
colliding on md5('') (sf0.1 silently reused sf0.01's staged stream
input)."""

import pytest

from counsel_data_pipeline_spark.io.fingerprint import (
    derived_cache_dir,
    table_fingerprint,
)


def test_fingerprint_differs_across_scale_factors():
    fps = {
        table_fingerprint(f"/root/testdata/sf{sf}", "documents")
        for sf in ("0.001", "0.01", "0.1")
    }
    assert len(fps) == 3


def test_fingerprint_never_silently_empty():
    with pytest.raises(FileNotFoundError):
        table_fingerprint("/root/testdata/sf0.01", "no_such_table")


def test_fingerprint_stable_and_table_scoped():
    a = derived_cache_dir("k", "/root/testdata/sf0.01", "documents")
    assert a == derived_cache_dir("k", "/root/testdata/sf0.01", "documents")
    assert a != derived_cache_dir("k", "/root/testdata/sf0.01", "embeddings")
