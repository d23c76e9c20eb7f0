"""The stale-layout guard (sources/sinks.py::derived_is_fresh).

Round-4 incident: the driver regenerated /root/testdata between rounds
while .derived/ persisted, and existence-only _SUCCESS checks would
have served STALE derived layouts silently. These tests pin the mtime
semantics that prevent that.
"""

from __future__ import annotations

import os
import time

from hadoop_cs4225_spark.sources.sinks import derived_is_fresh


def _touch(path: str, when: float | None = None) -> None:
    with open(path, "a"):
        pass
    if when is not None:
        os.utime(path, (when, when))


def test_missing_marker_is_stale(tmp_path):
    src = tmp_path / "src.parquet"
    _touch(str(src))
    assert not derived_is_fresh(str(tmp_path / "absent"), str(src))


def test_marker_older_than_source_is_stale(tmp_path):
    now = time.time()
    marker = tmp_path / "_SUCCESS"
    src = tmp_path / "src.parquet"
    _touch(str(marker), now - 100)
    _touch(str(src), now)  # source regenerated after derivation
    assert not derived_is_fresh(str(marker), str(src))


def test_marker_newer_than_all_sources_is_fresh(tmp_path):
    now = time.time()
    marker = tmp_path / "_SUCCESS"
    s1 = tmp_path / "a.parquet"
    s2 = tmp_path / "b.parquet"
    _touch(str(s1), now - 100)
    _touch(str(s2), now - 50)
    _touch(str(marker), now)
    assert derived_is_fresh(str(marker), str(s1), str(s2))


def test_missing_source_is_stale(tmp_path):
    marker = tmp_path / "_SUCCESS"
    _touch(str(marker))
    assert not derived_is_fresh(str(marker), str(tmp_path / "gone.parquet"))
