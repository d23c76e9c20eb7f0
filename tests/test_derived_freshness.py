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


def test_config_fingerprint_invalidates(tmp_path):
    """ADVICE r11: a derived layout is stale when its definition
    fingerprint changed, even if mtimes say fresh — a constant edit
    (N_PERMS, shingle width, tokenizer regex) must rebuild the index
    instead of silently serving signatures of the OLD definition."""
    from hadoop_cs4225_spark.sources.sinks import (
        derived_stale,
        write_derived_config,
    )

    now = time.time()
    sf = tmp_path / "sf"
    sf.mkdir()
    _touch(str(sf / "documents.parquet"), now - 100)
    layout = tmp_path / "layout"
    layout.mkdir()
    _touch(str(layout / "_SUCCESS"), now)

    # fresh mtimes but NO recorded config -> stale
    assert derived_stale(str(layout), str(sf), table="documents", config="v1")
    write_derived_config(str(layout), "v1")
    # matching config -> fresh
    assert not derived_stale(str(layout), str(sf), table="documents", config="v1")
    # definition changed -> stale again, mtimes untouched
    assert derived_stale(str(layout), str(sf), table="documents", config="v2")
    # config=None keeps the pure-mtime behavior for other layouts
    assert not derived_stale(str(layout), str(sf), table="documents")


def test_sig_index_config_covers_definition_constants():
    """The MinHash index fingerprint must move when any signature
    definition constant moves (the guard ADVICE r11 asked for) —
    INCLUDING the upstream shingle-set layout's full fingerprint
    (ADVICE r12): the signatures are built FROM that layout, so its
    min_toks/distinct eligibility constants must cascade into the
    signature config verbatim."""
    from hadoop_cs4225_spark.operators import dedup
    from hadoop_cs4225_spark.operators.wordcount import TOKEN_DELIM_RE

    cfg = dedup._sig_index_config()
    assert str(dedup.N_PERMS) in cfg
    assert str(dedup._PERM_MOD) in cfg
    assert TOKEN_DELIM_RE in cfg
    assert "shingle=3" in cfg
    assert dedup._shingle_sets_config() in cfg
