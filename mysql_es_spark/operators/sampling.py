"""Deterministic dataset splitting for training pipelines.

A training-data engine must split corpora reproducibly across engines and
runs — ``df.randomSplit`` is seed- and partitioning-dependent, so the
canonical primitive is a *content-hash split*: bucket every row by a hash
of its id and threshold the bucket. The same row lands in the same split
on any engine, at any scale, under any repartitioning — and the split is
a pure projection (no shuffle, no state).

md5 is used (not xxhash64) because it is bit-identical across Spark,
DuckDB, Python, and virtually everything else — this function is part of
the cross-engine contract, checked by the driver's DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: str, n_buckets: int = 100):
    """Deterministic bucket in [0, n_buckets): first 8 hex chars of
    md5(cast(id as string)) as an int, mod n_buckets."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def hash_split(
    df: DataFrame, train_pct: int = 80, id_col: str = "doc_id", out: str = "split"
) -> DataFrame:
    """Tag each row 'train' or 'test' by content-hash bucket (<train_pct
    of 100 buckets → train). Stable under any row order or partitioning."""
    b = hash_bucket(id_col, 100)
    return df.withColumn(out, F.when(b < int(train_pct), F.lit("train")).otherwise(F.lit("test")))


def duckdb_hash_bucket(id_col: str, n_buckets: int = 100) -> str:
    """The DuckDB expression equal to :func:`hash_bucket`."""
    return f"(('0x' || substr(md5({id_col}::VARCHAR), 1, 8))::UBIGINT % {n_buckets})"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling: keep each row of stratum ``s``
    with probability ``fractions[s]`` (``default`` for unlisted strata),
    decided purely by a content hash of its id — never by a seeded RNG.

    ``df.sampleBy`` draws per-partition random numbers, so its output
    changes with seed, partitioning, and engine; a training pipeline
    needs the same rows selected on every engine and at every scale.
    Here row selection is ``md5(id) mod 2^32 < round(frac * 2^32)`` — an
    integer comparison (no float-boundary ambiguity) reproducible in
    Spark, DuckDB, and plain Python, and a pure projection+filter: no
    shuffle, no state, trivially pushed down next to the scan.
    """
    if not fractions and not default:
        raise ValueError("stratified_sample needs fractions and/or a default > 0")
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction out of range for stratum {s!r}: {f}")
    h = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % F.lit(2**32)
    )
    thr_map = F.create_map(
        *[x for s, f in sorted(fractions.items()) for x in (F.lit(s), F.lit(int(round(f * 2**32))))]
    )
    thr = F.coalesce(
        thr_map.getItem(F.col(strata_col)), F.lit(int(round(default * 2**32)))
    )
    return df.filter(h < thr)


def duckdb_stratified_predicate(
    strata_col: str, fractions: dict[str, float], id_col: str = "doc_id", default: float = 0.0
) -> str:
    """The DuckDB WHERE clause equal to :func:`stratified_sample`."""
    whens = "".join(
        f"WHEN '{s}' THEN {int(round(f * 2**32))} " for s, f in sorted(fractions.items())
    )
    return (
        f"(('0x' || substr(md5({id_col}::VARCHAR), 1, 8))::UBIGINT % 4294967296) "
        f"< (CASE {strata_col} {whens}ELSE {int(round(default * 2**32))} END)"
    )


def epoch_mix(
    df: DataFrame,
    strata_col: str,
    epochs: dict[str, float],
    id_col: str = "doc_id",
    default: float = 1.0,
    out: str = "epoch",
) -> DataFrame:
    """Deterministic domain mixing with UPSAMPLING: repeat each stratum's
    rows ``epochs[s]`` times (fractional part = an extra content-hash-
    selected pass) — how a training mix realizes per-source weights > 1
    when a source is smaller than its target share (e.g. wiki 3.2 epochs,
    web 0.7). Output adds an ``out`` column (0-based pass index), so the
    result is a flat list of training rows with provenance.

    floor(e) full passes emit every row; the fractional pass keeps row ←
    ``md5(id) mod 2^32 < frac·2^32`` — the same engine-portable integer
    threshold as :func:`stratified_sample`, so epochs ≤ 1 degenerate to
    it exactly. Pure projection + generator (one ``explode`` of a
    per-row int sequence): no shuffle, no RNG, stable at any scale and
    partitioning.
    """
    for s, e in epochs.items():
        if e < 0:
            raise ValueError(f"negative epochs for stratum {s!r}: {e}")
    if default is None or default < 0:
        raise ValueError(f"default epochs must be a non-negative number, got {default}")
    e_map = F.create_map(
        *[x for s, e in sorted(epochs.items()) for x in (F.lit(s), F.lit(float(e)))]
    )
    e_col = F.coalesce(e_map.getItem(F.col(strata_col)), F.lit(float(default)))
    # the one engine-portable hash contract (see hash_bucket): md5 first
    # 8 hex chars mod 2^32
    h = hash_bucket(id_col, 2**32)
    full = F.floor(e_col).cast("int")
    frac_thr = F.round((e_col - full) * F.lit(float(2**32))).cast("long")
    n_pass = full + F.when(h < frac_thr, 1).otherwise(0)
    return (
        df.withColumn("__n", n_pass)
        .filter(F.col("__n") > 0)
        .withColumn(out, F.explode(F.expr("sequence(0, __n - 1)")))
        .drop("__n")
    )


def duckdb_epoch_mix_sql(
    table: str,
    strata_col: str,
    epochs: dict[str, float],
    id_col: str = "doc_id",
    default: float = 1.0,
) -> str:
    """DuckDB query equal to :func:`epoch_mix` (columns: *, epoch)."""
    whens = "".join(f"WHEN '{s}' THEN {float(e)} " for s, e in sorted(epochs.items()))
    e = f"(CASE {strata_col} {whens}ELSE {float(default)} END)"
    h = duckdb_hash_bucket(id_col, 2**32)
    n = f"(floor({e})::BIGINT + CASE WHEN {h} < round(({e} - floor({e})) * 4294967296)::BIGINT THEN 1 ELSE 0 END)"
    return (
        f"SELECT t.*, CAST(g.epoch AS INT) AS epoch FROM {table} t, "
        f"unnest(range(0, {n})) AS g(epoch)"
    )
