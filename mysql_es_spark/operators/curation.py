"""End-to-end training-data curation — the composed pipeline an LLM data
team runs before tokenization, built entirely from this engine's audited
operators so every stage keeps its scale shape:

1. Gopher/C4 shape filters   (textstats.gopher_quality — one JVM tokenize
                              pass, no Python)
2. language allowlist        (plain pushed-down filter)
3. exact content dedup       (dedup.exact_dedup — md5 of the normalized
                              token stream, first id wins, hash groupBy)
4. deterministic train/test  (sampling.hash_split — content-hash bucket,
                              engine-portable, order-invariant)

The reference has no curation notion (it syncs rows verbatim); this is
the §"beyond the reference" training-pipeline surface. Each stage only
removes or tags rows, so the composition needs no barrier: Catalyst fuses
the quality filter, the lang filter and the split tag into the scan-side
stages around the one dedup shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dedup
from .sampling import hash_split
from .textstats import gopher_quality


def curate(
    df: DataFrame,
    langs: tuple[str, ...] = ("en",),
    train_pct: int = 80,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Curated corpus: one row per SURVIVING doc —
    (id, lang, n_tokens, split).

    Order of stages matters and is fixed: quality and language run before
    dedup (so a kept doc never loses to a junk duplicate), dedup runs
    before the split tag (so a duplicate pair can't straddle train/test —
    the contamination a naive pipeline invites). First-wins is by id
    ascending among surviving docs, deterministic under any partitioning.
    """
    q = gopher_quality(df, id_col, text_col)
    kept = (
        df.select(id_col, lang_col, text_col)
        .filter(F.col(lang_col).isin(list(langs)))
        .join(q.filter(F.col("keep")).select(id_col, "n_tokens"), id_col, "inner")
    )
    winners = exact_dedup(kept, id_col, text_col).select(id_col)
    return hash_split(kept.join(winners, id_col, "inner"), train_pct, id_col).select(
        id_col, lang_col, "n_tokens", "split"
    )
