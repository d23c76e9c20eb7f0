"""Direct cross-engine parity battery for the ``quant`` primitive.

Every float-producing oracle relies on ``functions.numeric.quant`` (the
floor-multiply quantizer) producing BIT-IDENTICAL results in Spark and
DuckDB — the round-1/round-2 scale bugs were exactly engine-divergent
rounding. The 142 oracle comparisons test this indirectly on whatever
values the data happens to produce; this battery hits the adversarial
neighborhoods on purpose:

- exact decimal half-boundaries (x.xx5) where round() implementations
  disagree by design;
- values one ulp below/above those boundaries;
- negative halves (quant rounds toward +inf for both signs — the
  documented, consistent-but-not-HALF-UP choice);
- magnitudes approaching 2^53 where double loses integer resolution;
- powers-of-two divisions (the documented ravg failure mode).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from hadoop_cs4225_spark.functions.numeric import quant, quant_sql


def _battery() -> list[float]:
    vals: list[float] = []
    # exact decimal half-boundaries and their ulp neighbors, both signs
    for base in (0.005, 0.015, 0.125, 0.335, 1.005, 12.345, 99.995):
        for sign in (1.0, -1.0):
            v = sign * base
            vals += [v, math.nextafter(v, -math.inf), math.nextafter(v, math.inf)]
    # powers-of-two divisions (65.6534375 = the documented ravg case)
    vals += [2101.0 / 32.0, 65.6534375, 1.0 / 3.0, 2.0 / 3.0, -1.0 / 3.0]
    # large magnitudes near 2^53
    vals += [2.0**52 + 0.5, 2.0**53 - 1.0, -(2.0**52) - 0.5]
    # ordinary values
    vals += [0.0, 1.0, -1.0, 3.14159265358979, 123456.789012]
    return vals


@pytest.mark.parametrize("scale", [2, 4, 6, 9])
def test_quant_bit_identical_across_engines(spark, scale, tmp_path):
    """Values travel via parquet: SQL decimal literals are lossy in
    DuckDB (an 18-digit literal parses through DECIMAL and drops the
    last ulp before any CAST), which is an injection artifact — the
    real oracles read exact doubles from parquet, so the battery must
    too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = _battery()
    path = str(tmp_path / "battery.parquet")
    pq.write_table(pa.table({"x": pa.array(vals, type=pa.float64())}), path)

    sdf = spark.read.parquet(path).select("x", quant("x", scale).alias("q"))
    got = {repr(r["x"]): repr(r["q"]) for r in sdf.collect()}
    con = duckdb.connect()
    try:
        want = {
            repr(x): repr(q)
            for x, q in con.sql(
                f"SELECT x, {quant_sql('x', scale)} AS q "
                f"FROM read_parquet('{path}')"
            ).fetchall()
        }
    finally:
        con.close()
    assert len(got) == len(want) == len(set(map(repr, vals)))
    for k in got:
        assert got[k] == want[k], (k, scale, got[k], want[k])


def test_round_signed_zero_normalization(spark, tmp_path):
    """DuckDB ROUND preserves -0.0 on tiny negatives, Spark returns
    0.0 — bit-distinct under the driver's pandas hash. The rsum/
    rsum_sql helpers normalize with `+ 0.0`; this pins (a) the raw
    divergence exists (so the guard stays motivated) and (b) the
    normalized twins agree bit-for-bit, ties and dyadic .xx5 values
    included."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    vals = [-0.001, -0.0049, -0.0, 0.001, 0.125, -0.125, 2.125, -2.375]
    path = str(tmp_path / "round_battery.parquet")
    pq.write_table(pa.table({"x": pa.array(vals, type=pa.float64())}), path)

    con = duckdb.connect()
    try:
        # (a) raw divergence: DuckDB produces -0.0 for round(-0.001, 2)
        raw = con.sql(
            f"SELECT round(x, 2) FROM read_parquet('{path}') WHERE x = -0.001"
        ).fetchall()[0][0]
        assert repr(raw) == "-0.0"
        # (b) normalized per-value round parity (rsum is SUM-side; the
        # per-value probe isolates the rounding+normalization itself)
        want = {
            repr(x): repr(q)
            for x, q in con.sql(
                f"SELECT x, round(x, 2) + 0.0 FROM read_parquet('{path}')"
            ).fetchall()
        }
    finally:
        con.close()
    got = {
        repr(r["x"]): repr(r["q"])
        for r in spark.read.parquet(path)
        .select("x", (F.round("x", 2) + 0.0).alias("q"))
        .collect()
    }
    assert got == want


def test_hash60_bit_identical_across_engines(spark, tmp_path):
    """hash60 underpins every MinHash/SimHash/sampling oracle; its two
    renderings (Spark conv(md5), DuckDB '0x'||substr cast) must agree on
    adversarial strings: empty, whitespace/control chars, combining marks,
    non-BMP emoji, long repeats, hex-looking prefixes, and NULL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_cs4225_spark.functions.hashing import hash60, hash60_sql

    vals = [
        "", " ", "\t\n\r\x0c", "a", "A", "0xdeadbeef", "00000000",
        "héllo wörld", "naïve café", "日本語テキスト", "🚀🌍✨",
        "é vs é",  # combining acute vs precomposed
        "x" * 10_000, "word:1:suffix", "42:seeded", None,
    ]
    path = str(tmp_path / "hash_battery.parquet")
    pq.write_table(pa.table({"s": pa.array(vals, type=pa.string())}), path)

    got = {
        r["s"]: r["h"]
        for r in spark.read.parquet(path).select("s", hash60("s").alias("h")).collect()
    }
    con = duckdb.connect()
    try:
        want = {
            s: h
            for s, h in con.sql(
                f"SELECT s, {hash60_sql('s')} AS h FROM read_parquet('{path}')"
            ).fetchall()
        }
    finally:
        con.close()
    assert got == want
    assert got[None] is None
    # non-negative 60-bit range
    assert all(0 <= h < (1 << 60) for h in got.values() if h is not None)


def test_rsum_twins_agree_on_negative_sums(spark, tmp_path):
    """rsum / rsum_sql are the mandated pattern for NEGATIVE-capable
    rounded sums (no registry oracle needs them yet — every live sum is
    over a non-negative domain — but the pairing must stay correct for
    the first one that does). A sum of tiny negatives rounds to zero:
    the normalized twins must both produce +0.0, bit-identically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_cs4225_spark.functions.numeric import rsum, rsum_sql

    vals = [-0.001, -0.0005, -0.0002, 0.0003]  # sum = -0.0014 -> 0.0 at scale 2
    path = str(tmp_path / "negsum.parquet")
    pq.write_table(pa.table({"x": pa.array(vals, type=pa.float64())}), path)

    got = spark.read.parquet(path).agg(rsum("x", 2).alias("s")).collect()[0]["s"]
    con = duckdb.connect()
    try:
        want = con.sql(
            f"SELECT {rsum_sql('x', 2)} FROM read_parquet('{path}')"
        ).fetchall()[0][0]
        # and the raw (unnormalized) DuckDB ROUND really does produce
        # the divergent -0.0 here — the reason the helpers exist
        raw = con.sql(
            f"SELECT ROUND(SUM(x), 2) FROM read_parquet('{path}')"
        ).fetchall()[0][0]
    finally:
        con.close()
    assert repr(raw) == "-0.0"
    assert repr(got) == repr(want) == "0.0"


def test_hash60_three_implementations_agree(spark, duck):
    """hash60 exists three times — Spark (conv/substring/md5), DuckDB
    SQL fragment, and the pure-Python twin in the custom data source —
    and every operator's cross-engine determinism rests on them being
    bit-identical. Pin all three on adversarial strings: empty, every
    tokenizer delimiter, unicode, quotes, a 10k-char run, and hex-edge
    digests."""
    from hadoop_cs4225_spark.functions.hashing import hash60
    from hadoop_cs4225_spark.sources.pydatasource import _hash60_py

    cases = [
        "", " ", "\t", "a", "A", "0", "the quick brown fox",
        "naïve café über", "line\nbreak", "tab\tsep", "quote'q",
        'double"q', "back\\slash", "x" * 10_000,
        "v:0", "v:9999", "centroid:15:63", "7:seeded",
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got_spark = {
        r.s: r.h for r in df.select("s", hash60("s").alias("h")).collect()
    }
    for s in cases:
        want = _hash60_py(s)
        assert got_spark[s] == want, f"spark != python for {s!r}"
        # DuckDB side (parameterized to dodge quoting issues)
        duck_val = duck.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        assert duck_val == want, f"duckdb != python for {s!r}"


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @given(
        st.lists(
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            min_size=1,
            max_size=300,
        )
    )
    @settings(
        max_examples=3,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_quant_parity_on_arbitrary_doubles(spark, tmp_path_factory, vals):
        """Property extension of the deterministic battery: quant must
        be bit-identical across engines for ARBITRARY finite doubles —
        subnormals, huge magnitudes (passthrough branch), negative
        zeros, whatever hypothesis finds. Each example ships as one
        parquet batch (one Spark job), not one job per value."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = str(
            tmp_path_factory.mktemp("hyp") / "vals.parquet"
        )
        pq.write_table(
            pa.table({"x": pa.array(vals, type=pa.float64())}), path
        )
        sdf = spark.read.parquet(path).select(quant("x", 4).alias("q"))
        got = sorted(repr(r["q"]) for r in sdf.collect())
        con = duckdb.connect()
        try:
            want = sorted(
                repr(q)
                for (q,) in con.sql(
                    f"SELECT {quant_sql('x', 4)} AS q "
                    f"FROM read_parquet('{path}')"
                ).fetchall()
            )
        finally:
            con.close()
        assert got == want
