"""Registry-wide guard for driver-canonicalizable output schemas.

The driver's CORRECTNESS comparator canonicalizes a result with pandas
``sort_values`` + ``factorize`` over every column — which throws
``TypeError: unhashable type`` on nested cells (list/dict/Row). The
round-5 ``topk_users_approx`` error was predictable from its
``array<struct>`` output column alone; this test makes that failure
class impossible to reintroduce: every registered query must emit only
flat scalar columns (serialize arrays with ``array_join``/``to_json``
or flatten with ``posexplode`` — both patterns are in-registry, see
``windows.py`` nation_customer_lists and ``sketches.py``
topk_users_approx).
"""

from __future__ import annotations

from pyspark.sql import types as T

from hadoop_cs4225_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()

_NESTED = (T.ArrayType, T.MapType, T.StructType)


def test_all_query_outputs_are_driver_hashable(spark):
    bad: list[str] = []
    for name, fn in registry.QUERIES.items():
        schema = fn(spark, SF_SMOKE).schema
        nested = [
            f.name for f in schema.fields if isinstance(f.dataType, _NESTED)
        ]
        if nested:
            bad.append(f"{name}: {nested}")
    assert not bad, (
        "queries emit nested top-level columns the driver canonicalizer "
        f"cannot hash/sort: {bad}"
    )
