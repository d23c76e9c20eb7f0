"""Sinks (SURVEY.md §2.2): Parquet + the reference's text-KV format.

Reference parity: Hadoop ``TextOutputFormat`` writes ``key TAB value``
lines and fails when the output directory exists (``WordCount.java:61``,
``TopkCommonWords.java:174``); ``mode("error")`` reproduces the
exists-check, ``write_text_kv`` the format (TopkCommonWords emits
``count TAB word`` — key=count, ``TopkCommonWords.java:149``).

Scale: ``write_partitioned`` is the 100 TB layout primitive — partition
columns become directory pruning keys for every downstream scan
(e.g. ``events`` by day, ``documents`` by lang/source).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Repo-local root for derived layouts (gitignored; rebuilt on demand).
#: Single source of truth — operators import this (directly or via the
#: ``partitioned._DERIVED_ROOT`` alias) rather than re-deriving it.
DERIVED_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".derived",
)


def derived_path(sf_dir: str, leaf: str) -> str:
    """Canonical location of a derived layout: ``.derived/<sf-tag>/<leaf>``."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(DERIVED_ROOT, tag, leaf)


def derived_stale(
    path: str,
    sf_dir: str,
    table: str = "orders",
    marker: str = "_SUCCESS",
    config: str | None = None,
) -> bool:
    """Derived copy missing OR older than its source parquet (the driver
    regenerates testdata between rounds; see :func:`derived_is_fresh`).

    ``config`` (ADVICE r11): a definition fingerprint for the layout —
    e.g. the MinHash index folds in N_PERMS / the permutation modulus /
    shingle width / tokenizer regex. mtime alone cannot see a CODE
    change to the layout's definition, so a constant edit would leave a
    stale on-disk index that the Spark side silently consumes while the
    oracle recomputes inline — a latent parity divergence. When given,
    the layout is stale unless ``_DERIVED_CONFIG`` inside it matches
    byte-for-byte; the builder records it via
    :func:`write_derived_config` after a rebuild.
    """
    if not derived_is_fresh(
        os.path.join(path, marker), os.path.join(sf_dir, f"{table}.parquet")
    ):
        return True
    if config is not None:
        cfg = os.path.join(path, "_DERIVED_CONFIG")
        if not os.path.exists(cfg):
            return True
        with open(cfg) as f:
            if f.read() != config:
                return True
    return False


def write_derived_config(path: str, config: str) -> None:
    """Record a derived layout's definition fingerprint (see
    :func:`derived_stale`). Written AFTER the data so a failed build
    never leaves a fresh-looking fingerprint over partial data."""
    with open(os.path.join(path, "_DERIVED_CONFIG"), "w") as f:
        f.write(config)


#: Memoized derived-layout read plans:
#: ``(applicationId, normpath, _SUCCESS-mtime) -> DataFrame``. The twin
#: of ``sources/tables._DF_CACHE`` for ``.derived`` layouts (guide §6 /
#: §1.2: a repeated ``spark.read.parquet`` of an already-built layout
#: pays file listing + footer schema inference — ~0.1 s of driver-side
#: fixed cost per call, multiplied across the ~40 index-reading queries
#: of a suite run). A DataFrame is an immutable logical plan, so reuse
#: is always semantically safe. Keyed by the layout's ``_SUCCESS`` mtime
#: so an in-session rebuild (``ensure_*`` after the driver regenerates
#: the testdata) invalidates automatically, and by applicationId so a
#: fresh session never sees another session's plans.
_READ_CACHE: dict[tuple[str, str, float], DataFrame] = {}


def read_derived(spark: SparkSession, path: str) -> DataFrame:
    """Read a built ``.derived`` layout with plan memoization (callers
    must have run their ``ensure_*`` first — that is what guarantees
    ``_SUCCESS`` exists and is fresh).

    ADVICE r13: never cache under a missing ``_SUCCESS`` (every rebuild
    of a marker-less layout would map to the same -1.0 key and serve a
    stale file-listing plan forever), and fold the ``_DERIVED_CONFIG``
    mtime into the key — it is written LAST by ``write_derived_config``,
    so a same-second in-session rebuild that the marker's
    second-granularity mtime could miss still moves the key."""
    app = spark.sparkContext.applicationId
    norm = os.path.normpath(path)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        return spark.read.parquet(path)
    cfg = os.path.join(path, "_DERIVED_CONFIG")
    mtime = os.path.getmtime(marker) + (
        os.path.getmtime(cfg) if os.path.exists(cfg) else 0.0
    )
    key = (app, norm, mtime)
    df = _READ_CACHE.get(key)
    if df is None:
        # Evict entries from stopped SparkContexts and superseded
        # rebuilds of this same path (the tables._DF_CACHE discipline).
        for stale in [
            k
            for k in _READ_CACHE
            if k[0] != app or (k[1] == norm and k[2] != mtime)
        ]:
            del _READ_CACHE[stale]
        df = spark.read.parquet(path)
        _READ_CACHE[key] = df
    return df


def write_parquet(df: DataFrame, path: str, mode: str = "error") -> None:
    """Parquet sink; default errors if the path exists (Hadoop parity)."""
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...], mode: str = "error"
) -> None:
    """Partitioned Parquet layout (directory-pruning keys at scale)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_text_kv(
    df: DataFrame, path: str, key_col: str, value_col: str, mode: str = "error"
) -> None:
    """Hadoop TextOutputFormat-style ``key TAB value`` lines.

    ``coalesce(1)`` keeps the reference's single-file shape for
    golden-comparable outputs; drop it for large results (one file per
    partition, like part-r-NNNNN).
    """
    out = df.select(
        F.concat_ws("\t", F.col(key_col).cast("string"), F.col(value_col).cast("string")).alias(
            "value"
        )
    )
    out.coalesce(1).write.mode(mode).text(path)


def write_compacted(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    total_rows: int | None = None,
    mode: str = "error",
) -> None:
    """Small-file-safe Parquet sink: bound file count AND file size.

    The two small-file levers, composed:
    - ``repartition(ceil(n / target))`` sets the number of write tasks
      (without it, a 2000-task shuffle output writes 2000 files even
      when 10 would do — the classic metastore/namenode killer);
    - ``maxRecordsPerFile`` caps any single file so one skewed write
      task cannot emit a multi-GB file.

    ``total_rows`` avoids a count() job when the caller already knows
    the cardinality; at scale pass an estimate (row count from the
    shuffle stage, or bytes/avg-row-size).
    """
    n = total_rows if total_rows is not None else df.count()
    nfiles = max(1, -(-n // max(1, target_rows_per_file)))
    (
        df.repartition(nfiles)
        .write.option("maxRecordsPerFile", target_rows_per_file)
        .mode(mode)
        .parquet(path)
    )


def derived_is_fresh(marker: str, *sources: str) -> bool:
    """True iff ``marker`` exists and is newer than every source file.

    Guard for repo-local derived layouts (``.derived/``): the driver can
    regenerate the testdata parquet between rounds while the derived
    copies persist, and an existence-only check would then serve STALE
    data silently. mtime comparison makes re-derivation automatic.
    """
    import os

    if not os.path.exists(marker):
        return False
    m = os.path.getmtime(marker)
    return all(
        os.path.exists(s) and os.path.getmtime(s) < m for s in sources
    )
