"""Bucketed-layout lifecycle tests (join-elimination is in test_plans).

The failure mode that matters operationally: the source parquet gets
REGENERATED (the driver rewrites testdata between rounds) while the
bucketed .derived copy and/or the session catalog entry survive. Serving
the stale copy silently would desynchronize query and oracle.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

from hadoop_cs4225_spark.operators import bucketed
from tests.conftest import SF_ORACLE


def test_bucketed_regenerates_on_stale_source(spark, tmp_path):
    sfd = tmp_path / "sfstale"
    sfd.mkdir()
    for t in ("orders", "customer"):
        shutil.copy(
            os.path.join(SF_ORACLE, f"{t}.parquet"), sfd / f"{t}.parquet"
        )
    try:
        name = bucketed.ensure_bucketed(spark, str(sfd), "orders", "o_custkey")
        n_full = spark.table(name).count()
        assert n_full == pq.read_table(sfd / "orders.parquet").num_rows

        # Regenerate the source SMALLER with a newer mtime — the stale
        # derived copy and the live catalog entry must both be replaced.
        tbl = pq.read_table(sfd / "orders.parquet")
        pq.write_table(tbl.slice(0, 100), sfd / "orders.parquet")
        name2 = bucketed.ensure_bucketed(spark, str(sfd), "orders", "o_custkey")
        assert name2 == name
        assert spark.table(name).count() == 100

        # And a fresh-catalog re-register (table dropped, files fresh)
        # is metadata-only: same rows, no rewrite (mtime unchanged).
        marker = os.path.join(
            bucketed._DERIVED_ROOT, "sfstale", "bucketed_orders", "_SUCCESS"
        )
        mtime = os.path.getmtime(marker)
        spark.sql(f"DROP TABLE {name}")
        bucketed.ensure_bucketed(spark, str(sfd), "orders", "o_custkey")
        assert spark.table(name).count() == 100
        assert os.path.getmtime(marker) == mtime

        # A bucket-spec change (N_BUCKETS or key) must force a rewrite
        # even though source mtimes are unchanged — the files' name-
        # encoded bucket mapping no longer matches the catalog DDL.
        spec_path = os.path.join(
            bucketed._DERIVED_ROOT, "sfstale", "bucketed_orders", ".bucketspec"
        )
        with open(spec_path, "w") as f:
            f.write("4:o_custkey")  # simulate files written under old spec
        bucketed.ensure_bucketed(spark, str(sfd), "orders", "o_custkey")
        assert open(spec_path).read().strip() == f"{bucketed.N_BUCKETS}:o_custkey"
        assert os.path.getmtime(marker) > mtime  # rewritten
    finally:
        spark.sql(f"DROP TABLE IF EXISTS bkt_orders_sfstale")
        shutil.rmtree(
            os.path.join(bucketed._DERIVED_ROOT, "sfstale"), ignore_errors=True
        )
