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


def dsir_logweights(
    df: DataFrame,
    target,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, dsir_logw) — DSIR importance log-weights (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling") with the hashed-unigram feature space.

    ``target`` is a boolean Column over ``df`` marking the in-domain
    exemplar docs (e.g. ``F.col("source") == "src7"``). Every token is
    hashed into one of ``n_buckets`` feature buckets; the target and raw
    bag-of-buckets distributions are estimated with add-``alpha``
    smoothing, and a doc's weight is the sum over its tokens of
    ``ln p_target(bucket) − ln p_raw(bucket)`` — the log importance
    ratio under the hashed-unigram model. Docs with no tokens get 0.0.

    Scale shape: one Arrow tokenize pass feeds a persisted (doc, bucket,
    is-target) frame; bucket statistics are a ``n_buckets``-row groupBy
    (map-side combined — at most B rows per task reach the shuffle), the
    per-bucket weight table is broadcast, and the per-doc pass is one
    equi-join + groupBy on the doc id. No per-row Python, no driver
    materialization beyond the B-row weight table. The bucket hash is
    the engine-portable md5 contract (see :func:`hash_bucket`) so the
    DuckDB oracle can check values exactly.
    """
    from .textstats import with_tokens

    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be positive for smoothing, got {alpha}")
    b = float(n_buckets)
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long") % n_buckets
    )
    tokb = (
        with_tokens(df.withColumn("__tgt", target), text_col)
        .select(F.col(id_col), F.col("__tgt"), F.explode("toks").alias("term"))
        .select(id_col, "__tgt", bucket.alias("bucket"))
        .persist()
    )
    cb = tokb.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("ct"),
    )
    tot = cb.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))
    w = cb.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("ct") + alpha) / (F.col("tt") + alpha * b))
            - F.log((F.col("cr") + alpha) / (F.col("tr") + alpha * b))
        ).alias("lw"),
    )
    per = (
        tokb.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"), F.sum("lw").alias("lw"))
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("lw", F.lit(0.0)).alias("dsir_logw"),
        )
    )


def duckdb_dsir_sql(
    target_where: str,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    tok_expr: str = "regexp_extract_all(lower(strip_accents(text)), '[0-9a-z]+')",
) -> str:
    """DuckDB query equal to :func:`dsir_logweights` on ``documents``
    (columns: doc_id, n_tokens, dsir_logw — unrounded; wrap for 4dp)."""
    b = float(n_buckets)
    a = float(alpha)
    return f"""
WITH toks AS (SELECT doc_id, ({target_where}) AS tgt, {tok_expr} AS tl FROM documents),
tokb AS (SELECT toks.doc_id, tgt,
                CAST(('0x' || substr(md5(u.term), 1, 8))::UBIGINT % {n_buckets} AS BIGINT) AS bucket
         FROM toks, unnest(toks.tl) AS u(term)),
cb AS (SELECT bucket, count(*) AS cr,
              sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
       FROM tokb GROUP BY 1),
tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM cb),
w AS (SELECT bucket,
             ln((ct + {a}) / (tt + {a} * {b})) - ln((cr + {a}) / (tr + {a} * {b})) AS lw
      FROM cb CROSS JOIN tot),
per AS (SELECT tokb.doc_id, count(*) AS n_tokens, sum(w.lw) AS lw
        FROM tokb JOIN w USING (bucket) GROUP BY 1)
SELECT d.doc_id, CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
       coalesce(per.lw, 0.0) AS dsir_logw
FROM documents d LEFT JOIN per USING (doc_id)
"""


def dsir_select(
    weights: DataFrame,
    k: int,
    seed: str = "dsir",
    id_col: str = "doc_id",
    weight_col: str = "dsir_logw",
) -> DataFrame:
    """Top-``k`` Gumbel importance resample over DSIR log-weights.

    Adding an independent Gumbel(0,1) draw to each log-weight and taking
    the top k is exactly sampling k items WITHOUT replacement with
    probability ∝ exp(weight) (the Gumbel-top-k trick) — the resampling
    step of DSIR. The draw is derandomized through the engine-portable
    md5 contract: u = (md5(seed‖id) mod 2^32 + 0.5) / 2^32, g = −ln(−ln
    u), so the same rows are selected on any engine, at any scale, under
    any partitioning. Pure projection + TakeOrdered — no shuffle beyond
    the top-k reduction.
    """
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % F.lit(2**32)
    )
    u = (h.cast("double") + 0.5) / float(2**32)
    key = F.col(weight_col) + (-F.log(-F.log(u)))
    return (
        weights.withColumn("gumbel_key", key)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def duckdb_dsir_select_sql(
    inner_sql: str, k: int, seed: str = "dsir", id_col: str = "doc_id",
    weight_col: str = "dsir_logw",
) -> str:
    """DuckDB query equal to :func:`dsir_select` over ``inner_sql``."""
    u = (
        f"((('0x' || substr(md5('{seed}:' || {id_col}::VARCHAR), 1, 8))::UBIGINT % 4294967296)"
        f"::DOUBLE + 0.5) / 4294967296"
    )
    return (
        f"SELECT *, ({weight_col} + (-ln(-ln({u})))) AS gumbel_key "
        f"FROM ({inner_sql}) ORDER BY gumbel_key DESC, {id_col} ASC LIMIT {int(k)}"
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    tau: float = 0.7,
    budget: int | None = None,
    id_col: str = "doc_id",
    out: str = "epoch",
) -> DataFrame:
    """Temperature-based domain mixing (mT5 / multilingual-sampling
    style): resample strata so stratum ``s`` contributes ∝ n_s**tau of
    a ``budget``-row corpus (default budget = the input size, i.e. pure
    rebalancing). tau < 1 upweights small strata and downweights large
    ones; tau = 1 is the natural mix.

    Realized as data-derived fractional epochs e_s = budget·p_s / n_s
    (p_s ∝ n_s**tau) fed through the :func:`epoch_mix` mechanics —
    floor(e) full passes plus one md5-thresholded fractional pass — so
    the output is deterministic on every engine and the per-stratum
    expected count is round-exact. Scale shape: the strata-count frame
    is a tiny groupBy broadcast back onto the rows; everything else is
    projection + one explode. No RNG, no shuffle of the data rows.
    """
    if tau <= 0:
        raise ValueError(f"tau must be positive, got {tau}")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    tots = counts.agg(
        F.sum(F.pow(F.col("__n").cast("double"), F.lit(float(tau)))).alias("__z"),
        F.sum("__n").alias("__tot"),
    )
    e = counts.crossJoin(F.broadcast(tots)).select(
        strata_col,
        (
            (F.lit(float(budget)) if budget is not None else F.col("__tot").cast("double"))
            * F.pow(F.col("__n").cast("double"), F.lit(float(tau)))
            / F.col("__z")
            / F.col("__n").cast("double")
        ).alias("__e"),
    )
    h = hash_bucket(id_col, 2**32)
    full = F.floor("__e").cast("int")
    frac_thr = F.round((F.col("__e") - full) * F.lit(float(2**32))).cast("long")
    return (
        df.join(F.broadcast(e), strata_col)
        .withColumn("__np", full + F.when(h < frac_thr, 1).otherwise(0))
        .filter(F.col("__np") > 0)
        .withColumn(out, F.explode(F.expr("sequence(0, __np - 1)")))
        .drop("__e", "__np")
    )


def duckdb_temperature_mix_sql(
    table: str,
    strata_col: str,
    tau: float = 0.7,
    budget: int | None = None,
    id_col: str = "doc_id",
) -> str:
    """DuckDB query equal to :func:`temperature_mix` (columns: t.*, epoch)."""
    bud = f"{float(budget)}" if budget is not None else "(__tot::DOUBLE)"
    h = duckdb_hash_bucket(id_col, 2**32)
    return f"""
WITH __c AS (SELECT {strata_col}, count(*) AS __n FROM {table} GROUP BY 1),
__s AS (SELECT sum(pow(__n::DOUBLE, {float(tau)})) AS __z, sum(__n) AS __tot FROM __c),
__e AS (SELECT {strata_col},
               {bud} * pow(__n::DOUBLE, {float(tau)}) / __z / __n::DOUBLE AS __e
        FROM __c CROSS JOIN __s)
SELECT t.*, CAST(g.epoch AS INT) AS epoch
FROM {table} t JOIN __e USING ({strata_col}),
     unnest(range(0, floor(__e)::BIGINT
            + CASE WHEN {h} < round((__e - floor(__e)) * 4294967296)::BIGINT
                   THEN 1 ELSE 0 END)) AS g(epoch)
"""


def seeded_shuffle(df: DataFrame, seed: str, id_col: str = "doc_id", out: str = "shuffle_key") -> DataFrame:
    """Deterministic global shuffle for training-data ordering: attach
    ``out = md5(seed ':' id)``; the permutation is ``ORDER BY (out, id)``.

    ``df.orderBy(rand(seed))`` is partitioning- and engine-dependent; a
    training pipeline needs the SAME document order on every engine, at
    every scale, and a FRESH order per epoch. A content-hash sort key
    gives both: the key is a pure projection (no shuffle, no state), the
    order is total (id tiebreak), and a new ``seed`` (e.g. the epoch
    number) yields an independent permutation of the same corpus.

    Scale shape: consumers materialize the order with
    ``repartitionByRange(N, out, id).sortWithinPartitions(out, id)`` —
    one range shuffle, shard files globally ordered by filename, never a
    single-machine sort. :func:`write_shuffled` packages that.
    """
    key = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    return df.withColumn(out, key)


def write_shuffled(
    df: DataFrame, out_dir: str, seed: str, n_shards: int, id_col: str = "doc_id"
) -> None:
    """Write ``df`` as ``n_shards`` parquet shards in seeded-shuffle order:
    shard boundaries by range of the shuffle key (so concatenating shards
    in filename order replays the exact global permutation), rows sorted
    within each shard. One range shuffle; no driver materialization."""
    keyed = seeded_shuffle(df, seed, id_col)
    (
        keyed.repartitionByRange(int(n_shards), F.col("shuffle_key"), F.col(id_col))
        .sortWithinPartitions("shuffle_key", id_col)
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def duckdb_seeded_shuffle_key(seed: str, id_col: str = "doc_id") -> str:
    """The DuckDB expression equal to :func:`seeded_shuffle`'s key."""
    return f"md5('{seed}:' || {id_col}::VARCHAR)"
