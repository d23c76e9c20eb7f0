"""Oracle output-type lint: no DuckDB HUGEINT/DECIMAL result columns.

Round-2 post-mortem: the driver fetches the oracle side via pandas,
where DuckDB widens SUM-over-int to HUGEINT (INT128) and keeps DECIMAL
precision, and its pandas conversion renders BOTH as float64 — so the
value hash compares Spark's `3`/`Decimal('1234.50')` against `3.0`/
`1234.5` and fails even when the values are equal. Six driver rows went
red for exactly this. This lint binds every registered oracle (no
execution needed) and rejects any result column whose DuckDB type would
take that lossy path, so a query can never rotate into the correctness
window with a latent type bug.
"""

from __future__ import annotations

import pytest

from hadoop_cs4225_spark import registry
from tests.conftest import assert_oracle_types_safe

registry.load_all()
_NAMES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_output_types_driver_safe(duck, name):
    assert_oracle_types_safe(duck.sql(registry.ORACLES[name]), name=name)
