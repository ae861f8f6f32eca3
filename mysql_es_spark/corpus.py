"""Deterministic synthetic transcript corpus (FIXTURES.md §1-2).

Generates the engine's primary input shape from BASELINE.json input_hint:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)`` plus the parent tables ``conversations`` / ``owners`` that
mirror the reference's one-to-one relation/withs chains
(/root/reference/etc/river.json:76-110 — users / user_infos / comments).

Properties the generator guarantees (seed-stable, numpy only):
- Zipf(s=1.07) rank-frequency over a 50k-word vocabulary → heavy head-term
  skew, exercising the range-salted posting shuffle.
- ~2% empty strings and ~0.5% NULL text; a slice of accented/unicode
  tokens, exercising the ascii-fold analyzer (template.json T1).
- ~3% of transcript conv_ids absent from ``conversations`` and ~2% of
  owner_ids dangling, exercising left-outer null-padding
  (RelationRecords.fillRecords, RelationRecords.java:118-150).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB_SIZE = 50_000
ZIPF_S = 1.07
ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(
    ["search", "bash", "python", "browser", "sql", "edit", "read", "write",
     "fetch", "plan", "diff", "test"]
)
CHANNELS = np.array(["web", "api", "cli", "slack"])
EPOCH_2026 = np.datetime64("2026-01-01T00:00:00")

# a handful of accented word forms stitched into the vocab tail so folding
# matters; their folded forms collide with the plain head words on purpose.
_ACCENTED = ["café", "naïve", "résumé", "Ürün", "piñata", "déjà", "über", "señor"]


def _vocab() -> np.ndarray:
    base = np.array([f"w{i}" for i in range(VOCAB_SIZE)], dtype=object)
    base[VOCAB_SIZE - len(_ACCENTED):] = _ACCENTED
    return base


def _zipf_probs(n: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def transcripts_pdf(n_turns: int, seed: int = 42) -> pd.DataFrame:
    """Build ~n_turns transcript rows as a pandas DataFrame."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    probs = _zipf_probs(VOCAB_SIZE)

    # conversation lengths: 1 + geometric(p=0.15) or flat 2, capped 64
    avg_turns = 1 + 1 / 0.15
    n_convs = max(1, int(n_turns / avg_turns))
    geo = rng.geometric(0.15, size=n_convs)
    flat = np.full(n_convs, 2)
    lens = np.where(rng.random(n_convs) < 0.5, 1 + geo, 1 + flat)
    lens = np.minimum(lens, 64).astype(np.int64)

    conv_ids = np.repeat(np.array([f"c{i:08d}" for i in range(n_convs)], dtype=object), lens)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in lens])
    total = len(conv_ids)

    # roles: alternate user/assistant, 10% tool turns
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_mask = rng.random(total) < 0.10
    role[tool_mask] = "tool"
    tool = np.full(total, None, dtype=object)
    tool[tool_mask] = rng.choice(TOOLS, size=int(tool_mask.sum()))

    # text: 5-120 Zipf tokens; 2% empty, 0.5% null
    n_tok = rng.integers(5, 121, size=total)
    flat_tokens = vocab[rng.choice(VOCAB_SIZE, size=int(n_tok.sum()), p=probs)]
    bounds = np.cumsum(n_tok)[:-1]
    texts = np.array(
        [" ".join(chunk) for chunk in np.split(flat_tokens, bounds)], dtype=object
    )
    r = rng.random(total)
    texts[r < 0.02] = ""
    texts[r > 1 - 0.005] = None

    # ts: conv start = 2026-01-01 + conv_index minutes; +7s per turn
    conv_ordinal = np.repeat(np.arange(n_convs, dtype=np.int64), lens)
    ts = EPOCH_2026 + conv_ordinal * np.timedelta64(60, "s") + turn_idx.astype(np.int64) * np.timedelta64(7, "s")

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )


def bursty_pdf(
    n_docs: int, seed: int = 42, drift: tuple[float, float] = (0.0, 1.0)
) -> pd.DataFrame:
    """Skewed single-turn corpus: per-doc term BURSTINESS (repeated
    terms, tf ≫ 1) and doc length that DRIFT with corpus position — the
    tf/dl profile the uniform generator above deliberately lacks.

    Why it exists: block-max pruning keys off per-salt score upper
    bounds max(idf · tf/(tf+k1·(1−b+b·dl/avgdl))). With uniform tf≈1
    and dl in a narrow band every salt's bound is equal and WAND prunes
    nothing (BENCH.md §8a: pruned_salts=0 of 768 at 12M docs) — and
    burstiness ALONE doesn't fix that either: the per-salt max is an
    extreme statistic, so if heavy repeaters are sprinkled uniformly,
    every 16k-doc salt contains one and the bounds flatten again. Real
    block-max wins come from score-correlated docid ORDER (Lucene's
    index sort, reference T6): here burst intensity grows with the
    corpus ordinal (a corpus that drifted over ingestion time), and
    because docids sort by conv_id — which encodes the ordinal — each
    bucket's salt ranges segment that drift: early salts carry tf≈1-3
    bounds, late salts the heavy repeaters. Top-k concentrates in the
    late salts and the pruned path gets real work to skip.

    ``drift`` is this slice's (start, end) position in [0,1] of the
    global ordinal axis — bursty_df_dist wires it so the drift is
    continuous across slices. Seed-stable, numpy only."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    probs = _zipf_probs(VOCAB_SIZE)

    frac = np.linspace(drift[0], drift[1], num=n_docs, endpoint=False)
    n_distinct = rng.integers(4, 65, size=n_docs)
    # burst multiplier: quadratic in corpus position, up to ~60 extra
    # repetitions of the doc's head terms at the drift end
    burst = (rng.random(n_docs) < (0.02 + 0.38 * frac**2)) * (
        1.0 + 60.0 * frac**2 * rng.random(n_docs)
    )
    total_distinct = int(n_distinct.sum())
    flat_terms = vocab[rng.choice(VOCAB_SIZE, size=total_distinct, p=probs)]
    d_bounds = np.cumsum(n_distinct)[:-1]
    per_doc_terms = np.split(flat_terms, d_bounds)
    texts = np.empty(n_docs, dtype=object)
    for i, terms in enumerate(per_doc_terms):
        # base tf 1-3; bursty docs multiply their head terms' reps
        reps = rng.integers(1, 4, size=len(terms))
        if burst[i] > 0:
            head = max(1, len(terms) // 8)
            reps[:head] = (reps[:head] * burst[i]).astype(np.int64)
        texts[i] = " ".join(np.repeat(terms, reps))
    ts = EPOCH_2026 + np.arange(n_docs, dtype=np.int64) * np.timedelta64(13, "s")
    return pd.DataFrame(
        {
            "conv_id": np.array([f"d{i:09d}" for i in range(n_docs)], dtype=object),
            "turn_idx": np.zeros(n_docs, dtype=np.int32),
            "role": np.where(rng.random(n_docs) < 0.5, "user", "assistant").astype(object),
            "text": texts,
            "tool": np.full(n_docs, None, dtype=object),
            "ts": pd.Series(ts),
        }
    )


def bursty_df_dist(spark, n_docs: int, seed: int = 42, n_slices: int = 32):
    """Distributed bursty corpus (same slice scheme as
    transcripts_df_dist: per-slice seed, slice-unique id namespace).
    Slice s covers the global-ordinal drift window [s/n, (s+1)/n], and
    conv_ids are slice-major, so within every bucket docid order tracks
    the drift axis — the property the per-salt bounds need (see
    bursty_pdf)."""
    from pyspark.sql import functions as F

    per = int(np.ceil(n_docs / n_slices))

    def gen(batches):
        for pdf in batches:
            for s in pdf["slice"]:
                s = int(s)
                out = bursty_pdf(
                    per, seed=seed + s, drift=(s / n_slices, (s + 1) / n_slices)
                )
                out["conv_id"] = f"g{s:03d}" + out["conv_id"]
                yield out

    return (
        spark.range(n_slices)
        .withColumnRenamed("id", "slice")
        .repartition(n_slices, "slice")
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def conversations_pdf(n_convs: int, seed: int = 42) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Parent tables (conversations, owners) for relation-join fixtures."""
    rng = np.random.default_rng(seed + 1)
    vocab = _vocab()
    probs = _zipf_probs(VOCAB_SIZE)

    n_owners = max(4, n_convs // 8)
    owner_ids = np.array([f"u{i:06d}" for i in range(n_owners)], dtype=object)
    owners = pd.DataFrame(
        {
            "owner_id": owner_ids,
            "name": [f"owner {i}" for i in range(n_owners)],
            "org": rng.choice(np.array(["acme", "globex", "initech"]), size=n_owners),
        }
    )

    keep = rng.random(n_convs) >= 0.03  # ~3% conv_ids intentionally absent
    idx = np.arange(n_convs)[keep]
    n_title = rng.integers(3, 9, size=len(idx))
    flat_tokens = vocab[rng.choice(VOCAB_SIZE, size=int(n_title.sum()), p=probs)]
    bounds = np.cumsum(n_title)[:-1]
    titles = [" ".join(c) for c in np.split(flat_tokens, bounds)]
    owner_pick = rng.integers(0, n_owners + max(1, n_owners // 50), size=len(idx))
    owner_fk = np.where(
        owner_pick < n_owners,  # ~2% dangling FKs
        np.array([f"u{i % n_owners:06d}" for i in owner_pick], dtype=object),
        np.array([f"u9{i:05d}" for i in owner_pick], dtype=object),
    )
    convs = pd.DataFrame(
        {
            "conv_id": np.array([f"c{i:08d}" for i in idx], dtype=object),
            "title": titles,
            "channel": rng.choice(CHANNELS, size=len(idx)),
            "owner_id": owner_fk,
            "created_at": pd.Series(EPOCH_2026 + idx * np.timedelta64(60, "s")),
        }
    )
    return convs, owners


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def transcripts_df(spark, n_turns: int, seed: int = 42):
    return spark.createDataFrame(transcripts_pdf(n_turns, seed), schema=TRANSCRIPT_SCHEMA)


def transcripts_df_dist(spark, n_turns: int, seed: int = 42, n_slices: int = 32):
    """Distributed corpus generation for large stress runs.

    ``transcripts_pdf`` builds the whole corpus in driver pandas — fine to
    ~5M turns, but a 10^12-turn generator must itself be a Spark job. Each
    of ``n_slices`` tasks generates ~n_turns/n_slices turns with the same
    per-slice statistical profile (Zipf vocabulary, conv-length mix, null/
    empty rates) and a slice-unique conv_id namespace (``g<slice>c...``),
    seeded ``seed + slice`` so the output is deterministic for a given
    (n_turns, seed, n_slices) regardless of task placement.
    """
    from pyspark.sql import functions as F

    per = int(np.ceil(n_turns / n_slices))

    def gen(batches):
        for pdf in batches:
            for s in pdf["slice"]:
                s = int(s)
                out = transcripts_pdf(per, seed=seed + s)
                out["conv_id"] = f"g{s:03d}" + out["conv_id"]
                yield out

    return (
        spark.range(n_slices)
        .select(F.col("id").alias("slice"))
        .repartition(n_slices, "slice")
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def write_corpus(spark, out_dir: str, n_turns: int, seed: int = 42) -> dict[str, int]:
    """Write transcripts/conversations/owners parquet under out_dir."""
    tp = transcripts_pdf(n_turns, seed)
    n_convs = tp["conv_id"].nunique()
    cp, op = conversations_pdf(n_convs, seed)
    spark.createDataFrame(tp, schema=TRANSCRIPT_SCHEMA).write.mode("overwrite").parquet(
        f"{out_dir}/transcripts"
    )
    spark.createDataFrame(
        cp, schema="conv_id string, title string, channel string, owner_id string, created_at timestamp"
    ).write.mode("overwrite").parquet(f"{out_dir}/conversations")
    spark.createDataFrame(op, schema="owner_id string, name string, org string").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/owners")
    return {"turns": len(tp), "convs": n_convs, "owners": len(op)}
