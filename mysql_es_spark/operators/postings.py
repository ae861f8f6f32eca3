"""Posting-list construction — tokenize, explode, range-salted block encode.

This is the engine's analog of the reference's whole write path (records →
JSON docs → ES `_bulk` → Lucene segment build, Writer.java:106-144 +
template.json); here the index structures are built *by* Spark:

    transcripts(docid, text)
      → mapInPandas tokenize+tf          (one Arrow pass, no per-row Python)
      → (docid, term, tf, dl) + one null-term row per doc (carries dl)
      → groupBy(term_bucket, term, salt) applyInPandas encode
      → posting block rows (delta-gap + FOR bitpacked blobs, block-max
        ingredients max_tf / min_dl for pruned query eval)

**Skew handling (north_rule):** ``salt = docid // salt_docs`` is a *range*
salt, not a random one. Each (term, salt) group holds at most ``salt_docs``
postings, so a Zipf head term is split across ceil(N/salt_docs) reducers —
and because salts are disjoint docid ranges, the groups are already in
global docid order: **no second merge phase is needed**, blocks from
different salts are directly valid, globally-sorted segments of the term's
posting list. Term-level stats (df, total tf) that *would* have needed the
merge are instead a separate map-side-combined groupBy (term_stats), which
Spark partial-aggregates without skew issues.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..functions.analyze import tokenize_series
from ..functions.codecs import encode_block, encode_positions

TOKENIZED_SCHEMA = "docid long, term string, tf int, dl int"
TOKENIZED_POS_SCHEMA = TOKENIZED_SCHEMA + ", pos array<int>"
BLOCK_SCHEMA = (
    "term_bucket int, term string, salt long, start_docid long, "
    "n int, max_tf int, min_dl int, blob binary"
)
BLOCK_POS_SCHEMA = BLOCK_SCHEMA + ", pos_blob binary"


def tokenized(df: DataFrame, cfg: IndexConfig) -> DataFrame:
    """(docid, text) → exploded (docid, term, tf, dl).

    Emits one row per (doc, distinct term) plus one ``term IS NULL`` row
    per document carrying its token count ``dl`` — so a single tokenize
    pass feeds postings, doc_lens, and corpus stats. Zero-token docs
    (empty/null text) still get their null-term row (dl=0): BM25's N and
    avgdl count them (SURVEY.md §2.9 T5 / oracle.py contract).

    Default path is **mapInArrow with pyarrow C++ compute kernels**
    (utf8_normalize NFKD → strip U+0300-036F → utf8_lower →
    split_pattern_regex → C++ hash group-by for tf) — ~13× the docs/sec of
    the pandas ``str.findall`` chain, which loops Python per row. The
    pandas path remains for the edge-ngram analyzer variant (T1 with
    ngrams), which pyarrow can't express cleanly.
    """
    syn_map = None
    if cfg.synonyms:
        if cfg.edge_ngram:
            raise ValueError("index-time synonyms cannot combine with edge_ngram")
        from ..functions.analyze import parse_synonym_rules

        syn_map = parse_synonym_rules(cfg.synonyms)
    if cfg.edge_ngram:
        return _tokenized_pandas(df, cfg)
    with_pos = cfg.with_positions

    def explode_arrow(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            docid = batch.column("docid")
            x = pc.utf8_normalize(batch.column("text"), form="NFKD")
            x = pc.replace_substring_regex(x, "[̀-ͯ]", "")
            x = pc.utf8_lower(x)
            lists = pc.split_pattern_regex(x, "[^0-9a-z]+")
            flat = pc.list_flatten(lists)
            par = pc.list_parent_indices(lists)
            keep = pc.not_equal(flat, "")
            terms = pc.filter(flat, keep)
            par_kept = pc.filter(par, keep)
            doc_per_term = pc.take(docid, par_kept)

            # tf per (docid, term); dl per docid — both C++ hash aggs
            tok_cols = {"docid": doc_per_term, "term": terms}
            aggs = [("term", "count")]
            if with_pos:
                # position = ordinal of the occurrence among the doc's
                # *kept* tokens (Lucene's analyzed-stream positions);
                # par_kept is ascending, so a change-point scan yields
                # each occurrence's offset from its doc's first token
                pk = par_kept.to_numpy(zero_copy_only=False).astype(np.int64)
                idx = np.arange(len(pk), dtype=np.int64)
                if len(pk):
                    seg_start = np.empty(len(pk), dtype=bool)
                    seg_start[0] = True
                    np.not_equal(pk[1:], pk[:-1], out=seg_start[1:])
                    starts = idx[seg_start]
                    counts = np.diff(np.append(starts, len(pk)))
                    positions = idx - np.repeat(starts, counts)
                else:
                    positions = idx
                tok_cols["pos"] = pa.array(positions.astype(np.int32))
                aggs.append(("pos", "list"))
            if syn_map:
                # index-time synonym application on the analyzed stream.
                # Equivalence members are INJECTED at the source token's
                # position (Lucene posincr 0); explicit-rule LHS tokens are
                # REPLACED by their RHS. dl below still aggregates the
                # ORIGINAL doc_per_term: posincr-0 injections never count
                # toward field length (Lucene discountOverlaps) and
                # replacements keep the original's increment.
                t_np = terms.to_numpy(zero_copy_only=False)
                d_np = doc_per_term.to_numpy(zero_copy_only=False).astype(np.int64)
                p_np = positions.astype(np.int32) if with_pos else None
                keep_m = np.ones(len(t_np), dtype=bool)
                segs_t, segs_d, segs_p = [], [], []
                for src, (keep, targets) in syn_map.items():
                    m = t_np == src
                    if not m.any():
                        continue
                    if not keep:
                        keep_m &= ~m
                    for tgt in targets:
                        segs_t.append(np.full(int(m.sum()), tgt, dtype=object))
                        segs_d.append(d_np[m])
                        if with_pos:
                            segs_p.append(p_np[m])
                if segs_t or not keep_m.all():
                    t_np = np.concatenate([t_np[keep_m]] + segs_t) if segs_t else t_np[keep_m]
                    d_np = np.concatenate([d_np[keep_m]] + segs_d) if segs_d else d_np[keep_m]
                    if with_pos:
                        p_np = (
                            np.concatenate([p_np[keep_m]] + segs_p) if segs_p else p_np[keep_m]
                        )
                        # per-(doc,term) position lists must stay ascending
                        order = np.lexsort((p_np, d_np))
                        t_np, d_np, p_np = t_np[order], d_np[order], p_np[order]
                    tok_cols = {
                        "docid": pa.array(d_np),
                        "term": pa.array(t_np, type=pa.string()),
                    }
                    if with_pos:
                        tok_cols["pos"] = pa.array(p_np)
            tf = (
                pa.table(tok_cols)
                .group_by(["docid", "term"], use_threads=False)
                .aggregate(aggs)
            )
            dl = (
                pa.table({"docid": doc_per_term})
                .group_by(["docid"], use_threads=False)
                .aggregate([("docid", "count")])
            )
            dl_ids = dl.column("docid").to_numpy(zero_copy_only=False)
            dl_vals = dl.column("docid_count").to_numpy(zero_copy_only=False)
            order = np.argsort(dl_ids, kind="stable")
            dl_ids, dl_vals = dl_ids[order], dl_vals[order]

            def dl_for(ids: np.ndarray) -> np.ndarray:
                out = np.zeros(len(ids), dtype=np.int32)
                if len(dl_ids):
                    pos = np.searchsorted(dl_ids, ids)
                    pos_c = np.clip(pos, 0, len(dl_ids) - 1)
                    hit = dl_ids[pos_c] == ids
                    out[hit] = dl_vals[pos_c[hit]]
                return out

            all_ids = docid.to_numpy(zero_copy_only=False).astype(np.int64)
            tf_ids = tf.column("docid").to_numpy(zero_copy_only=False).astype(np.int64)
            n_doc, n_tf = len(all_ids), len(tf_ids)
            arrays = [
                pa.array(np.concatenate([all_ids, tf_ids]), type=pa.int64()),
                pa.concat_arrays(
                    [pa.nulls(n_doc, pa.string()), tf.column("term").combine_chunks()]
                ),
                pa.array(
                    np.concatenate(
                        [
                            np.zeros(n_doc, dtype=np.int32),
                            tf.column("term_count")
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int32),
                        ]
                    ),
                    type=pa.int32(),
                ),
                pa.array(
                    np.concatenate([dl_for(all_ids), dl_for(tf_ids)]), type=pa.int32()
                ),
            ]
            names = ["docid", "term", "tf", "dl"]
            if with_pos:
                plist = tf.column("pos_list").combine_chunks().cast(pa.list_(pa.int32()))
                arrays.append(
                    pa.concat_arrays([pa.nulls(n_doc, pa.list_(pa.int32())), plist])
                )
                names.append("pos")
            yield pa.record_batch(arrays, names=names)

    schema = TOKENIZED_POS_SCHEMA if with_pos else TOKENIZED_SCHEMA
    return df.select("docid", "text").mapInArrow(explode_arrow, schema=schema)


def _tokenized_pandas(df: DataFrame, cfg: IndexConfig) -> DataFrame:
    """pandas fallback supporting the edge-ngram index analyzer (T1).

    Two analyzer variants, matching ES's documented contracts:

    - positionless (default): grams pass through the stream-wide
      ``unique`` filter (template.json's chain) — dl counts distinct
      grams; tf is 0/1.
    - with_positions: ``unique`` runs only_on_same_position (the ES
      recommendation for phrase queries over ngram fields), so every
      occurrence survives; each gram's position is its source token's
      ordinal (Lucene EdgeNGramTokenFilter), dl is the full gram-stream
      length, and phrase adjacency means consecutive *source* tokens.
    """
    ngram, lo, hi = cfg.edge_ngram, cfg.edge_ngram_min, cfg.edge_ngram_max
    if ngram and cfg.with_positions:
        return _tokenized_pandas_ngram_pos(df, lo, hi)

    def explode_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = tokenize_series(pdf["text"], ngram, lo, hi)
            dl = toks.str.len().astype(np.int32)
            docids = pdf["docid"].to_numpy(dtype=np.int64)
            # per-doc row carrying dl (term NULL)
            doc_rows = pd.DataFrame(
                {"docid": docids, "term": None, "tf": np.int32(0), "dl": dl.to_numpy()}
            )
            total = int(dl.sum())
            if total:
                rep = np.repeat(docids, dl.to_numpy())
                rep_dl = np.repeat(dl.to_numpy(), dl.to_numpy())
                terms = np.concatenate([t for t in toks.to_numpy() if len(t)])
                long_form = pd.DataFrame({"docid": rep, "term": terms, "dl": rep_dl})
                tf = (
                    long_form.groupby(["docid", "term"], sort=False)
                    .agg(tf=("term", "size"), dl=("dl", "first"))
                    .reset_index()
                )
                tf["tf"] = tf["tf"].astype(np.int32)
                tf["dl"] = tf["dl"].astype(np.int32)
                yield pd.concat([doc_rows, tf[["docid", "term", "tf", "dl"]]], ignore_index=True)
            else:
                yield doc_rows

    return df.select("docid", "text").mapInPandas(explode_tokens, schema=TOKENIZED_SCHEMA)


def _tokenized_pandas_ngram_pos(df: DataFrame, lo: int, hi: int) -> DataFrame:
    """Edge-ngram T1 analyzer with positions (see _tokenized_pandas)."""
    from ..functions.analyze import edge_ngrams_with_positions

    def explode_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            base = tokenize_series(pdf["text"])  # source tokens, no ngram
            docids = pdf["docid"].to_numpy(dtype=np.int64)
            all_grams: list[str] = []
            all_pos: list[int] = []
            dl = np.zeros(len(pdf), dtype=np.int32)
            counts = np.zeros(len(pdf), dtype=np.int64)
            for i, toks in enumerate(base.to_numpy()):
                grams, gpos = edge_ngrams_with_positions(toks, lo, hi)
                all_grams.extend(grams)
                all_pos.extend(gpos)
                dl[i] = counts[i] = len(grams)
            doc_rows = pd.DataFrame(
                {"docid": docids, "term": None, "tf": np.int32(0), "dl": dl, "pos": None}
            )
            if not all_grams:
                yield doc_rows
                continue
            long_form = pd.DataFrame(
                {
                    "docid": np.repeat(docids, counts),
                    "term": all_grams,
                    "dl": np.repeat(dl, counts),
                    "pos": np.asarray(all_pos, dtype=np.int32),
                }
            )
            # emission order is stream order, so each group's pos list is
            # already ascending — the block encoder's contract
            tf = (
                long_form.groupby(["docid", "term"], sort=False)
                .agg(tf=("term", "size"), dl=("dl", "first"), pos=("pos", list))
                .reset_index()
            )
            tf["tf"] = tf["tf"].astype(np.int32)
            tf["dl"] = tf["dl"].astype(np.int32)
            yield pd.concat(
                [doc_rows, tf[["docid", "term", "tf", "dl", "pos"]]], ignore_index=True
            )

    return df.select("docid", "text").mapInPandas(explode_tokens, schema=TOKENIZED_POS_SCHEMA)


def _encode_batches(
    batches: Iterator[pd.DataFrame],
    block_size: int,
    salt_docs: int,
    with_pos: bool = False,
) -> Iterator[pd.DataFrame]:
    """Partition-sorted (term_bucket, term, docid, tf, dl) rows →
    block rows; ``salt = docid DIV salt_docs`` recomputed here rather
    than shuffled. Group boundaries found vectorized (one change-point
    scan per Arrow batch); the only per-group Python is numpy slice +
    encode.

    An Arrow batch boundary may split a (term, salt) group; that's fine —
    the split emits two shorter runs of blocks whose docid ranges are
    disjoint and ascending (the shuffle sorted the partition), which is all
    the decoder and block-max pruning require.
    """
    cols = ["term_bucket", "term", "salt", "start_docid", "n", "max_tf", "min_dl", "blob"]
    if with_pos:
        cols = cols + ["pos_blob"]
    for pdf in batches:
        m = len(pdf)
        if not m:
            continue
        terms = pdf["term"].to_numpy()
        docids = pdf["docid"].to_numpy(dtype=np.int64)
        # salt never rides the shuffle: it is pure math on docid
        # (round 5 bandwidth cut — the build's one big shuffle carried
        # a redundant 8-byte column per posting)
        salts = docids // salt_docs
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        tbs = pdf["term_bucket"].to_numpy(dtype=np.int64)
        if with_pos:
            flat_pos = (
                np.concatenate(pdf["pos"].to_numpy()).astype(np.int64)
                if tfs.sum()
                else np.zeros(0, dtype=np.int64)
            )
            cum = np.zeros(m + 1, dtype=np.int64)
            np.cumsum(tfs, out=cum[1:])
        change = np.empty(m, dtype=bool)
        change[0] = True
        np.not_equal(terms[1:], terms[:-1], out=change[1:])
        change[1:] |= salts[1:] != salts[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], m)
        rows = []
        for gs, ge in zip(starts, ends):
            for s in range(gs, ge, block_size):
                e = min(s + block_size, ge)
                row = (
                    int(tbs[gs]),
                    terms[gs],
                    int(salts[gs]),
                    int(docids[s]),
                    e - s,
                    int(tfs[s:e].max()),
                    int(dls[s:e].min()),
                    encode_block(docids[s:e], tfs[s:e], dls[s:e]),
                )
                if with_pos:
                    row = row + (
                        encode_positions(flat_pos[cum[s] : cum[e]], tfs[s:e]),
                    )
                rows.append(row)
        yield pd.DataFrame(rows, columns=cols)


def posting_blocks(tok: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Exploded postings → encoded block rows (see module docstring).

    Shuffle by (term_bucket, term, salt-expr) + sortWithinPartitions,
    then ONE vectorized mapInPandas encode pass per partition. (A
    per-group applyInPandas is pathological here: head-term corpora make
    millions of tiny groups and the per-group pandas overhead dominates
    the build.)

    Bandwidth note (round 5): this is the build's single big shuffle and
    the build is memory-bandwidth-bound at high core counts (BENCH.md
    §11), so the rows carry no derivable columns — ``salt`` is a
    partitioning EXPRESSION (hashed for routing, never materialized into
    the row) and the encode pass recomputes it from docid; the sort key
    drops it too, since salt = docid DIV c is monotone in docid, making
    (term, docid) order identical to (term, salt, docid). Output blocks
    are byte-identical to the prior layout.
    """
    block_size = cfg.block_size
    salt_docs = int(cfg.salt_docs)
    p = (
        tok.filter(F.col("term").isNotNull())
        .withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.term_buckets)).cast("int")
        )
    )
    # Explicit partition count: the encode stage is Python-CPU-bound, not
    # bytes-bound — AQE's coalescePartitions would see a few hundred MB of
    # shuffle data and squash it onto a handful of tasks, serializing the
    # encode. Pinning the count keeps one task per slot (AQE never
    # re-splits a user-specified repartition(n, ...)).
    spark = tok.sparkSession
    n_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        spark.sparkContext.defaultParallelism,
    )
    with_pos = cfg.with_positions
    schema = BLOCK_POS_SCHEMA if with_pos else BLOCK_SCHEMA
    return (
        p.repartition(
            n_parts, F.col("term_bucket"), F.col("term"),
            F.expr(f"docid DIV {salt_docs}"),
        )
        .sortWithinPartitions("term", "docid")
        .mapInPandas(
            lambda it: _encode_batches(it, block_size, salt_docs, with_pos),
            schema=schema,
        )
    )


def doc_lens(tok: DataFrame) -> DataFrame:
    """(docid, dl) — one row per document, including zero-token docs."""
    return tok.filter(F.col("term").isNull()).select("docid", "dl")


def term_stats(tok: DataFrame) -> DataFrame:
    """Per-term partials (df, ttf) — map-side combined, skew-immune."""
    return (
        tok.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf"))
    )
