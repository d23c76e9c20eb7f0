"""Round-11-batch-3 operator invariants: BFS hop histogram, banded
SimHash near-dup join, Parquet footer-statistics audit. All three are
oracled (test_oracle_parity.py hash-checks them each run); these pin
the algorithmic contracts against independent replicas."""

from __future__ import annotations

from collections import deque

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_bfs_replica_python(spark):
    """Plain-python BFS over the same symmetrized edge list."""
    import pandas as pd

    rows = _rows(spark, "trade_bfs_hop_histogram")
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    m = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    pairs = {
        (int(c) * 2, int(s) * 2 + 1)
        for c, s in zip(m.o_custkey, m.l_suppkey)
    }
    adj: dict = {}
    for c, s in pairs:
        adj.setdefault(c, set()).add(s)
        adj.setdefault(s, set()).add(c)
    seed = min(adj)
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if dist[u] >= 6:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    from collections import Counter

    hist = Counter(dist.values())
    got = {r.hop: r.n_nodes for r in rows}
    assert got == dict(hist)
    n_nodes = len(adj)
    for r in rows:
        assert abs(r.frac_nodes - r.n_nodes / n_nodes) < 1e-6
    assert got[0] == 1  # the seed shell
    # hops are contiguous from 0 (a BFS cannot skip a shell)
    hops = sorted(got)
    assert hops == list(range(len(hops)))


def test_simhash_band_pairs_invariants(spark):
    import pandas as pd

    rows = _rows(spark, "simhash_band_dup_pairs")
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    text = dict(zip(docs.doc_id, docs.text))
    assert rows, "synthetic corpus contains exact dups; join cannot be empty"
    seen = set()
    for r in rows:
        assert r.d1 < r.d2
        assert 0 <= r.hamming <= 3
        assert (r.d1, r.d2) not in seen  # distinct pairs
        seen.add((r.d1, r.d2))
        toks1 = [t for t in str(text[r.d1]).split() if t]
        toks2 = [t for t in str(text[r.d2]).split() if t]
        if toks1 == toks2:
            assert r.hamming == 0  # identical token streams, same fp
    # exact-duplicate texts (tokenizable) surface with hamming 0
    assert any(r.hamming == 0 for r in rows)


def test_parquet_footer_audit_replica(spark):
    import numpy as np
    import pandas as pd

    rows = _rows(spark, "parquet_footer_stats_audit")
    assert rows
    from hadoop_cs4225_spark.operators.formats import _FOOTER_COLS

    want = {(t, c) for t, cols in _FOOTER_COLS.items() for c in cols}
    assert {(r.tbl, r.column_name) for r in rows} == want
    frames = {
        t: pd.read_parquet(f"{SF_ORACLE}/{t}.parquet") for t in _FOOTER_COLS
    }
    for r in rows:
        col = frames[r.tbl][r.column_name]
        assert r.footer_min_match and r.footer_max_match, r
        assert r.n_values == len(col)
        assert r.data_min == float(np.min(col.to_numpy()))
        assert r.data_max == float(np.max(col.to_numpy()))
