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


def test_footer_fold_pins_missing_stats(tmp_path):
    """ADVICE r10 regression: a row group WITHOUT min/max statistics
    must poison the per-file fold permanently — a later stats-bearing
    group may not resurrect fmin/fmax — and the audit must see every
    part file of a directory table, not one hardcoded path."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_cs4225_spark.operators.formats import _footer_rows

    # file 1: first row group stats-less, second with stats
    p1 = str(tmp_path / "a.parquet")
    w = pq.ParquetWriter(
        p1,
        pa.schema([("o_orderkey", pa.int64())]),
        write_statistics=False,
    )
    w.write_table(pa.table({"o_orderkey": pa.array([5, 6], pa.int64())}))
    w.close()
    # append a second stats-bearing file in the same "table dir"
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, 2, 3], pa.int64())}), p2
    )
    out = pd.concat(
        list(
            _footer_rows(
                iter(
                    [
                        pd.DataFrame(
                            {
                                "tbl": ["orders", "orders"],
                                "path": [p1, p2],
                            }
                        )
                    ]
                )
            )
        )
    )
    by_path = {
        n: r
        for n, r in zip(["a", "b"], out.itertuples(index=False))
    }
    a, b = by_path["a"], by_path["b"]
    assert not a.has_stats and pd.isna(a.fmin) and pd.isna(a.fmax)
    assert a.n_values == 2  # counts still fold
    assert b.has_stats and b.fmin == 1.0 and b.fmax == 3.0


def test_footer_audit_lists_directory_tables(spark, tmp_path):
    """Directory-of-part-files tables must be fully audited: copy the
    sf table into a 2-part directory layout and re-run the query on
    the copied sf_dir — counts must equal the full table."""
    import shutil

    import pandas as pd

    from hadoop_cs4225_spark.operators.formats import _FOOTER_COLS

    sf2 = tmp_path / "sf"
    sf2.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        src = f"{SF_ORACLE}/{t}.parquet"
        if t == "orders":
            d = sf2 / "orders.parquet"
            d.mkdir()
            pdf = pd.read_parquet(src)
            half = len(pdf) // 2
            pdf.iloc[:half].to_parquet(d / "part-0.parquet", index=False)
            pdf.iloc[half:].to_parquet(d / "part-1.parquet", index=False)
        else:
            shutil.copy(src, sf2 / f"{t}.parquet")
    rows = _rows(spark, "parquet_footer_stats_audit", sf=str(sf2))
    full = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    got = {r.column_name: r for r in rows if r.tbl == "orders"}
    assert set(got) == set(_FOOTER_COLS["orders"])
    for c, r in got.items():
        assert r.n_values == len(full), (c, r.n_values)
        assert r.footer_min_match and r.footer_max_match, r


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


def test_footer_audit_fails_loud_when_no_part_files_listed(spark, tmp_path):
    """ADVICE r11: a table whose part files are all filtered by the
    listing's name/extension guards (e.g. extensionless part files —
    Spark scans them fine, the footer walk sees none) must surface as
    FAILED audit rows, never silently drop from the output. The data
    side is built from the expected (tbl, column) set, so the audit
    fails for exactly the layout-corruption case it exists to catch."""
    import shutil

    import pandas as pd

    from hadoop_cs4225_spark.operators.formats import _FOOTER_COLS

    sf2 = tmp_path / "sf"
    sf2.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        src = f"{SF_ORACLE}/{t}.parquet"
        if t == "orders":
            d = sf2 / "orders.parquet"
            d.mkdir()
            # extensionless part file: Spark's scan reads it, the
            # footer listing's name guard skips it
            pdf = pd.read_parquet(src)
            pdf.to_parquet(d / "part-0", index=False)
        else:
            shutil.copy(src, sf2 / f"{t}.parquet")
    rows = _rows(spark, "parquet_footer_stats_audit", sf=str(sf2))
    got = {r.column_name: r for r in rows if r.tbl == "orders"}
    # every expected column still present, each failing loud
    assert set(got) == set(_FOOTER_COLS["orders"])
    for c, r in got.items():
        assert r.n_values is None, (c, r.n_values)
        assert r.footer_min_match is False and r.footer_max_match is False, r
    # the untouched tables still audit green
    assert all(
        r.footer_min_match and r.footer_max_match
        for r in rows
        if r.tbl != "orders"
    )
