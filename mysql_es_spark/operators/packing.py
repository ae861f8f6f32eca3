"""Sequence packing for LLM training pipelines (concat-and-chunk).

Pretraining consumes fixed-length token windows, not documents: the
corpus is concatenated in a deterministic order and chunked into
``budget``-token sequences (docs may straddle a chunk boundary — the
GPT-style "packed" layout). This operator computes, per document, where
it lands in that layout WITHOUT materializing token streams: everything
is arithmetic over per-doc token counts.

Scale design: a single global concatenation order would funnel the whole
corpus through one window partition, so the corpus is first sharded by a
content hash of the id (each shard is packed independently — exactly how
a multi-worker tokenizer job lays out its output files). Within a shard
the window is ``sum() over (order by id)``, a single shuffle by shard;
shard count is the parallelism knob. The md5-derived shard matches
operators/sampling.py's cross-engine hash contract so the driver's
DuckDB oracle reproduces the layout bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import duckdb_hash_bucket, hash_bucket
from .textstats import with_tokens


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 16,
    sep_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, shard, pack_id, pack_offset) — the packed-layout
    coordinates of each document.

    A doc occupies ``n_tokens + sep_tokens`` slots (the separator models
    the EOS token appended after every doc). ``pack_id`` is the chunk its
    FIRST token falls in; ``pack_offset`` the position within that chunk.
    Deterministic under any input partitioning or row order.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    t = with_tokens(df, text_col)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = F.size("toks").cast("long")
    return (
        t.select(
            F.col(id_col),
            n_tok.alias("n_tokens"),
            hash_bucket(id_col, n_shards).alias("shard"),
        )
        .withColumn(
            "cum_before",
            F.coalesce(F.sum(F.col("n_tokens") + F.lit(sep_tokens)).over(w), F.lit(0)),
        )
        .select(
            id_col,
            "n_tokens",
            "shard",
            (F.col("cum_before") / budget).cast("long").alias("pack_id"),
            (F.col("cum_before") % budget).alias("pack_offset"),
        )
    )


def duckdb_pack_sequences(
    budget: int = 2048,
    n_shards: int = 16,
    sep_tokens: int = 1,
    id_col: str = "doc_id",
    toks_expr: str = "regexp_extract_all(lower(strip_accents(text)), '[0-9a-z]+')",
    table: str = "documents",
) -> str:
    """The DuckDB query equal to :func:`pack_sequences`."""
    shard = duckdb_hash_bucket(id_col, n_shards)
    return f"""
WITH t AS (
  SELECT {id_col}, len({toks_expr}) AS n_tokens,
         {shard} AS shard
  FROM {table}
), c AS (
  SELECT {id_col}, n_tokens, shard,
         coalesce(sum(n_tokens + {sep_tokens}) OVER (
           PARTITION BY shard ORDER BY {id_col} ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT {id_col}, n_tokens, CAST(shard AS BIGINT) AS shard,
       CAST(floor(cum_before / {budget}) AS BIGINT) AS pack_id,
       CAST(cum_before % {budget} AS BIGINT) AS pack_offset
FROM c
"""


def chunk_documents(
    df: DataFrame,
    chunk: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document overlapping token windows (the RAG / context-window
    chunker): (id, chunk_idx, start_tok, n_tokens, chunk_text).

    Window i covers analyzer tokens [i*stride, i*stride + chunk); the
    last window may be short, windows overlap by ``chunk - stride``
    tokens, and a doc shorter than one chunk yields exactly one window.
    Zero-token docs yield none. Unlike :func:`pack_sequences` (corpus
    concat layout) this never crosses document boundaries.

    Scale shape: one Arrow tokenize pass, then pure JVM array expressions
    (sequence → slice → posexplode) — no shuffle at all; output
    partitioning follows the input."""
    if not (0 < stride <= chunk):
        raise ValueError("need 0 < stride <= chunk")
    starts = (
        f"CASE WHEN size(toks) = 0 THEN array() ELSE "
        f"sequence(0, CAST(greatest(0.0, ceil((size(toks) - {chunk}) / CAST({stride} AS DOUBLE))) AS INT)) END"
    )
    return (
        with_tokens(df, text_col)
        .select(
            F.col(id_col),
            F.posexplode(
                F.expr(f"transform({starts}, i -> slice(toks, i * {stride} + 1, {chunk}))")
            ).alias("chunk_idx", "w"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("chunk_idx") * stride).cast("int").alias("start_tok"),
            F.size("w").cast("int").alias("n_tokens"),
            F.array_join("w", " ").alias("chunk_text"),
        )
    )


def greedy_pack(
    df: DataFrame,
    budget: int = 2048,
    part_cols: tuple[str, ...] = (),
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Doc-ATOMIC greedy shard packing: assign each document to a
    bounded-token window WITHOUT ever splitting a document (the writer's
    counterpart to :func:`pack_sequences`, which deliberately straddles).
    Windows fill greedily in id order; a doc that would overflow the
    current window starts the next one; a doc larger than the whole
    budget gets a window of its own. Output: (id, part_cols..., shard,
    window_id, n_tokens).

    The greedy recurrence is inherently sequential, so the corpus is
    first split into (part_cols, md5-shard) groups — the same
    cross-engine hash contract as pack_sequences — and each group packs
    independently; ``n_shards`` is the parallelism knob and bounds the
    sequential span. The per-GROUP Python loop below iterates once per
    document (never per token) over shard-bounded batches; everything
    upstream (tokenize, shard, sort) is Arrow/JVM.
    """
    if budget <= 0:
        raise ValueError(f"greedy_pack: budget must be positive, got {budget}")
    import numpy as np
    import pandas as pd

    from .sampling import hash_bucket

    keys = [*part_cols, "shard"]
    base = (
        with_tokens(df, text_col)
        .select(
            F.col(id_col),
            *[F.col(c) for c in part_cols],
            hash_bucket(id_col, n_shards).cast("int").alias("shard"),
            F.size("toks").cast("int").alias("n_tokens"),
        )
    )
    out_schema = ", ".join(
        [f"{id_col} long"]
        + [f"{c} string" for c in part_cols]
        + ["shard int", "window_id int", "n_tokens int"]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        nt = pdf["n_tokens"].to_numpy(dtype=np.int64)
        win = np.zeros(len(nt), dtype=np.int32)
        acc = w = 0
        for i, t in enumerate(nt):
            if i and acc + t > budget:
                w += 1
                acc = 0
            win[i] = w
            acc += t
        pdf["window_id"] = win
        return pdf[[id_col, *part_cols, "shard", "window_id", "n_tokens"]]

    return base.groupBy(*keys).applyInPandas(pack, schema=out_schema)
