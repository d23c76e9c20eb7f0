"""Unit tests for the cogrouped-map fill-gap audit.

The oracle parity test checks the end-to-end aggregate; these pin the
per-bucket pandas function's EDGE semantics directly (pure pandas, no
Spark session) — the cases a join can't express, which are the whole
reason the op is a cogroup:

- an order with no line items yields a row whose gap is the full total;
- line items with no header row in the bucket contribute nothing;
- an empty bucket side doesn't crash or emit phantom rows;
- arithmetic is integer end-to-end (no float drift by construction).
"""

from __future__ import annotations

import pandas as pd

from hadoop_cs4225_spark.operators.cogroup_ops import _GAP_BUCKET, _order_gap


def _orders(rows):
    return pd.DataFrame(
        rows, columns=["o_orderkey", "o_orderpriority", "total_cents", "kb"]
    )


def _items(rows):
    return pd.DataFrame(rows, columns=["l_orderkey", "item_cents", "kb"])


def test_itemless_order_keeps_full_gap():
    out = _order_gap(
        _orders([(7, "1-URGENT", 12345, 0)]),
        _items([]),
    )
    assert out.to_dict("records") == [
        {
            "o_orderkey": 7,
            "o_orderpriority": "1-URGENT",
            "gap_cents": 12345,
            "n_items": 0,
        }
    ]
    assert str(out["gap_cents"].dtype) == "int64"


def test_headerless_items_contribute_nothing():
    out = _order_gap(
        _orders([(7, "1-URGENT", 1000, 0)]),
        _items([(7, 400, 0), (7, 300, 0), (99, 123456, 0)]),  # 99 has no header
    )
    assert out.to_dict("records") == [
        {
            "o_orderkey": 7,
            "o_orderpriority": "1-URGENT",
            "gap_cents": 300,
            "n_items": 2,
        }
    ]


def test_empty_header_side_emits_nothing():
    out = _order_gap(_orders([]), _items([(1, 10, 0)]))
    assert len(out) == 0
    assert list(out.columns) == [
        "o_orderkey",
        "o_orderpriority",
        "gap_cents",
        "n_items",
    ]


def test_multi_order_bucket_is_per_order():
    out = _order_gap(
        _orders([(1, "A", 100, 0), (2, "B", 200, 0), (3, "C", 50, 0)]),
        _items([(1, 60, 0), (1, 40, 0), (3, 80, 0)]),
    )
    got = {r["o_orderkey"]: (r["gap_cents"], r["n_items"]) for r in out.to_dict("records")}
    assert got == {1: (0, 2), 2: (200, 0), 3: (-30, 1)}


def test_bucket_constant_sane():
    # the range bucket must be large enough to amortize the per-call
    # Python overhead and small enough to bound group memory
    assert 64 <= _GAP_BUCKET <= 65536
