"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), n-gram Jaccard (shingle self-join), MinHash+LSH
(shingle → signature → band-bucket join), SimHash (64-bit, banded), and
embedding-cosine near-dup. Exact and Jaccard are DuckDB-oracle-checkable;
MinHash is verified against a Python oracle in tests (xxhash64 isn't
SQL-portable). SimHash and winnowing take ``base_hash``: the default
"stable" pandas siphash is the fast path, "md5" (first 8 digest bytes,
little-endian == DuckDB ``md5_number_upper``) makes the whole pipeline
reproducible in ANSI SQL so the driver gate tri-checks the pair output.

Scale design notes (100 TB):
- every candidate generator is a *join on a short key* (fingerprint,
  shingle, band hash, LSH bucket) — never an O(n²) cross join; exact
  verification runs only on candidate pairs.
- frequent-shingle suppression (``max_shingle_df``) caps the fan-out of
  the shingle self-join: a stop-shingle shared by 10^6 docs would
  otherwise emit 10^12 pairs. Same idea as the head-term salting in the
  index build — skew is handled *before* the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import fingerprint, with_tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative of each normalized-text group.

    Output: (id, fp). Analog of the reference's idempotent upsert-by-_id
    (duplicate pk ⇒ one doc, Record.getID semantics)."""
    fp = fingerprint(df, id_col, text_col)
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    return (
        fp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "fp")
    )


def duplicate_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(fp, n_dups, keep_id) for groups with more than one member."""
    fp = fingerprint(df, id_col, text_col)
    return (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# n-gram (shingle) Jaccard
# ---------------------------------------------------------------------------


def _shingle_expr(n: int):
    """Total shingling expression over ``toks``: word n-grams, or an
    empty array for docs shorter than n tokens. The short-doc guard must
    live INSIDE the expression (not only in a separate filter): Catalyst
    infers predicates from downstream Generates and may evaluate this
    expression in a filter conjunct *before* any size(toks) >= n filter,
    where ``sequence(0, size - n)`` on a short doc counts DOWNWARD and
    ``toks[0]`` on an empty array throws under ANSI mode."""
    return F.expr(
        f"if(size(toks) >= {n}, transform(sequence(0, size(toks) - {n}), i -> "
        + "concat_ws(' ', "
        + ", ".join(f"toks[i + {j}]" for j in range(n))
        + ")), array())"
    )


def shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle) — distinct word n-grams per doc (the dedup unit set)."""
    t = with_tokens(df, text_col)
    sh = _shingle_expr(n)
    return (
        t.withColumn("sh", sh)
        .filter(F.size("toks") >= n)
        .select(F.col(id_col), F.explode(F.array_distinct("sh")).alias("shingle"))
    )


def shingle_sets(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = True,
) -> DataFrame:
    """(id, shs) — each doc's distinct shingle set as ONE array row.

    Zero-shuffle: shingling, set-dedup, and (with ``hashed``) xxhash64
    all run inside a single projection (SQL higher-order ``transform`` +
    ``array_distinct``), so a 10^12-turn corpus never materializes
    per-shingle ROWS. This is the form MinHash signatures and pairwise
    verify actually consume; the exploded row form (:func:`shingles`)
    remains for the frequency-based guards (``max_shingle_df`` needs a
    global per-shingle document count). Docs with fewer than ``n``
    tokens are dropped, matching :func:`shingles`."""
    t = with_tokens(df, text_col)
    sh = _shingle_expr(n)
    out = (
        t.filter(F.size("toks") >= n)
        .withColumn("shs", F.array_distinct(sh))
        .select(F.col(id_col), "shs")
    )
    if hashed:
        # distinct AFTER hashing: an intra-doc hash collision would
        # otherwise leave duplicate values in shs, making size(shs)
        # overcount the set while array_intersect dedups — hashing then
        # re-distincting keeps the array a true set of hashes for free.
        out = out.select(
            F.col(id_col),
            F.array_distinct(F.expr("transform(shs, s -> xxhash64(s))")).alias("shs"),
        )
    return out


def _collapse_by_text(df: DataFrame, id_col: str, text_col: str):
    """(reps, members): one representative row per *byte-identical* text.

    Fan-out guard #1 for every pair-generation dedup: m byte-identical
    copies of one page would otherwise flow through the shingle/band
    self-join as an m-wide hot key and emit O(m²) candidate rows through
    the shuffle. Collapsing first makes the expensive stages see each
    distinct text ONCE; :func:`_expand_pairs` restores the full pair set
    afterwards (identical text ⇒ identical shingle set ⇒ within-group
    Jaccard is exactly 1.0 and cross-group Jaccard equals the
    representatives'). Keyed on the raw text (not the normalized
    fingerprint) so the expansion is an *identity-preserving* rewrite.

    members: (_rep, _member) — every doc, including the rep itself."""
    keyed = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_ek"))
    reps_ids = keyed.groupBy("_ek").agg(F.min(id_col).alias("_rep"))
    members = keyed.join(reps_ids, "_ek").select("_rep", F.col(id_col).alias("_member"))
    reps = df.join(
        reps_ids.select(F.col("_rep").alias(id_col)), id_col, "left_semi"
    )
    return reps, members


def _expand_pairs(
    rep_pairs: DataFrame, members: DataFrame, threshold: float, eligible_reps: DataFrame
) -> DataFrame:
    """Re-expand representative-level (id_a, id_b, jaccard) pairs to the
    full doc-id pair set after :func:`_collapse_by_text`.

    Cross-group: every member of a's group × every member of b's group,
    same jaccard (identical shingle sets). Within-group: all unordered
    member pairs at jaccard 1.0 — but only for groups whose rep kept at
    least one shingle (``eligible_reps``: docs with an empty — or fully
    df-capped — shingle set never co-occur, so the uncollapsed algorithm
    emits no pair for them)."""
    cross = (
        rep_pairs.join(members.select(F.col("_rep").alias("id_a"), F.col("_member").alias("ma")), "id_a")
        .join(members.select(F.col("_rep").alias("id_b"), F.col("_member").alias("mb")), "id_b")
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            "jaccard",
        )
    )
    if threshold > 1.0:
        return cross
    m = members.join(
        eligible_reps.select(F.col(eligible_reps.columns[0]).alias("_rep")), "_rep", "left_semi"
    )
    within = (
        m.select("_rep", F.col("_member").alias("id_a"))
        .join(m.select("_rep", F.col("_member").alias("id_b")), "_rep")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(1.0).alias("jaccard"))
    )
    return cross.unionByName(within)


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 128,
    collapse_exact: bool = True,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with shingle-set Jaccard ≥ threshold.

    Candidate pairs come from co-occurring shingles (equi-join on the
    shingle string); Jaccard = |∩| / (|A| + |B| − |∩|) is then exact.

    Fan-out guards (both ON by default — web corpora are boilerplate
    heavy, and a single stop-shingle shared by 10^6 docs would emit
    10^12 candidate rows through the shuffle):

    - ``collapse_exact``: byte-identical texts are collapsed to one
      representative before the self-join and the pair set is expanded
      back afterwards — output-identical (within-group Jaccard is exactly
      1.0), but the quadratic stage sees each distinct text once.
    - ``max_shingle_df``: shingles appearing in more than this many
      *distinct texts* are dropped before pairing (df is computed after
      the collapse, i.e. over unique texts). ``None`` disables the cap.
    """
    if collapse_exact:
        reps, members = _collapse_by_text(df, id_col, text_col)
    else:
        reps, members = df, None
    # the shingle set feeds both join sides and the size agg — persist it
    # or the tokenize+explode subtree runs three times (Spark reuses plan
    # *nodes*, not computed results, across self-join branches). The cache
    # is reclaimed by the ContextCleaner once the returned frame (and with
    # it this reference) is GC'd; callers looping over many corpora in one
    # long-lived session should materialize each result promptly rather
    # than accumulating unevaluated frames.
    sh = shingles(reps, n, id_col, text_col).persist()
    if max_shingle_df is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
        sh = sh.join(freq.filter(F.col("sdf") <= max_shingle_df), "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    pairs = (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if not collapse_exact:
        return pairs
    return _expand_pairs(pairs, members, threshold, sizes.select(id_col))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _sig_from_sets(
    sets: DataFrame, num_perm: int, seed: int, id_col: str, use_md5: bool
) -> DataFrame:
    """Signatures from the set form (id, shs): one mapInPandas, NO
    shuffle — every row already holds its doc's complete shingle set, so
    there is no repartition+sort co-location step and no split-doc
    partial-merge aggregate. At web scale this removes the largest
    shuffle of the signature build (the 12M-turn stress shuffled ~15G of
    (id, h) rows through the old path)."""
    a, b = _perm_params(num_perm, seed)
    id_type = sets.schema[id_col].dataType.simpleString()

    def to_sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            arrs = pdf["shs"].to_numpy()
            lens = np.fromiter((len(x) for x in arrs), dtype=np.int64, count=len(arrs))
            keep = lens > 0
            arrs, lens = arrs[keep], lens[keep]
            if len(arrs) == 0:
                continue
            if use_md5:
                h = _md5_hash_array(np.concatenate(arrs))
            else:
                h = np.concatenate(arrs).astype(np.uint64)
            starts = np.r_[0, np.cumsum(lens)[:-1]]
            # one permutation at a time: a doc-batched Arrow batch holds
            # ~65k docs x ~60 shingles, so the full (num_perm, n_shingles)
            # matrix would be ~2G PER WORKER (x32 workers OOM-killed the
            # 12M-turn stress host); per-perm temporaries cap the peak at
            # ~3 x n_shingles x 8 bytes with identical results.
            mins = np.empty((len(lens), len(a)), dtype=np.int64)
            for j in range(len(a)):
                vals = (a[j] * h + b[j]) % np.uint64(_MERSENNE)
                mins[:, j] = np.minimum.reduceat(vals, starts).astype(np.int64)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy()[keep], "sig": list(mins)}
            )

    # id column type is carried through from the input schema (string or
    # any integral id works here; the exploded ROW path below still
    # requires a long id for its sorted-run change detection).
    return sets.mapInPandas(to_sig, schema=f"{id_col} {id_type}, sig array<long>")


def minhash_signatures(
    df: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles_df: DataFrame | None = None,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """(id, sig array<long>) — MinHash over the doc's shingle set.

    Base shingle hash is JVM xxhash64 (stable, no Python in the explode);
    ``base_hash="md5"`` computes first-8-bytes-little-endian md5 in the
    signature kernel instead — equal to DuckDB ``md5_number_upper``, so
    the whole LSH pipeline becomes reproducible in ANSI SQL (the same
    trade the simhash/winnowing operators offer). The num_perm
    universal-hash mins are one numpy reduction per group. ``shingles_df``
    (from :func:`shingles`) lets a pipeline that needs the shingle set
    elsewhere (e.g. the exact-verify stage) compute it once."""
    use_md5 = base_hash == "md5"
    # Default and set-form paths: signatures from (id, shs) arrays — no
    # repartition/sort shuffle at all (see _sig_from_sets). The exploded
    # row form below survives for callers that already hold a (persisted)
    # row-form shingle frame.
    if shingles_df is None:
        sets = shingle_sets(df, n, id_col, text_col, hashed=not use_md5)
        return _sig_from_sets(sets, num_perm, seed, id_col, use_md5)
    if "shs" in shingles_df.columns:
        # the shs element type encodes the frame's hashed state: md5 mode
        # hashes raw shingle STRINGS in the kernel; xxhash64 mode expects
        # pre-hashed LONGs from shingle_sets(hashed=True). A mismatch
        # would silently md5 stringified int64s (or crash obscurely the
        # other way), poisoning any signature store built from it.
        elem = shingles_df.schema["shs"].dataType.elementType.simpleString()
        if use_md5 and elem != "string":
            raise ValueError(
                "minhash_signatures(base_hash='md5') needs raw shingle "
                f"strings; got shs array<{elem}> — build the set frame "
                "with shingle_sets(..., hashed=False)"
            )
        if not use_md5 and elem == "string":
            raise ValueError(
                "minhash_signatures(base_hash='xxhash64') needs hashed "
                "shingles (array<bigint>); got array<string> — build the "
                "set frame with shingle_sets(..., hashed=True)"
            )
        return _sig_from_sets(shingles_df, num_perm, seed, id_col, use_md5)
    a, b = _perm_params(num_perm, seed)
    base = shingles_df
    # row form: hash BEFORE the shuffle and drop the shingle string — the
    # signature kernel only needs (id, h), and at web scale the string
    # column is ~4x the bytes of the hash. md5 keeps the string: the
    # oracle-reproducible hash is computed in the Python kernel.
    if use_md5:
        sh = base
    elif "h" in base.columns:
        sh = base.select(id_col, "h")
    else:
        sh = base.withColumn("h", F.xxhash64("shingle")).select(id_col, "h")

    def to_sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            if use_md5:
                h = _md5_hash_array(pdf["shingle"].to_numpy(dtype=object))
            else:
                h = pdf["h"].to_numpy().astype(np.uint64)
            # (num_perm, n_shingles) universal hashes mod Mersenne prime,
            # then a segment-min per doc (ids are sorted within the batch)
            vals = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)
            change = np.empty(len(ids), dtype=bool)
            change[0] = True
            np.not_equal(ids[1:], ids[:-1], out=change[1:])
            starts = np.flatnonzero(change)
            mins = np.minimum.reduceat(vals, starts, axis=1).astype(np.int64)
            yield pd.DataFrame(
                {id_col: ids[starts], "sig": [mins[:, j].tolist() for j in range(len(starts))]}
            )

    # repartition + sort co-locates and orders each doc's shingles; an
    # Arrow batch boundary may still split one doc across two batches,
    # yielding two partial signatures for that id — the elementwise-min
    # merge below makes that exact (min is associative).
    sig = (
        sh.repartition(id_col)
        .sortWithinPartitions(id_col)
        .mapInPandas(to_sig, schema=f"{id_col} long, sig array<long>")
    )
    # merge split-doc partials (elementwise min across the two partial sigs)
    return sig.groupBy(id_col).agg(
        F.aggregate(
            F.collect_list("sig"),
            F.array_repeat(F.lit(_MERSENNE), num_perm),
            lambda acc, s: F.zip_with(acc, s, lambda x, y: F.least(x, y)),
        ).alias("sig")
    )


def _banded_df(sig: DataFrame, bands: int, rows: int, id_col: str) -> DataFrame:
    """(id, sig) → (id, band_idx, band_hash): the LSH bucket keys."""
    return sig.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"struct(b as band_idx, xxhash64(concat_ws(',', slice(sig, b * {rows} + 1, {rows}))) as band_hash))"
            )
        ).alias("bb"),
    ).select(id_col, "bb.band_idx", "bb.band_hash")


def minhash_lsh_pairs(
    df: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_hash: str = "xxhash64",
    collapse_exact: bool = True,
    max_band_bucket: int | None = 4096,
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH, verified with exact Jaccard.

    rows/band = num_perm/bands; candidate pairs share ≥1 identical band
    (join on (band_idx, band_hash) — short keys, shuffle-friendly), then
    exact shingle Jaccard filters to ≥ threshold.

    Fan-out guards (see :func:`_collapse_by_text`):

    - ``collapse_exact`` (default on): byte-identical texts go through
      signatures/banding/verify ONCE; pairs are expanded back at the end
      (output-identical — within-group Jaccard is exactly 1.0). This
      kills the worst real-world case, mass-identical boilerplate pages.
    - ``max_band_bucket``: a band bucket holding more than this many
      *distinct* texts is excluded from pairwise candidate generation —
      an m-doc bucket emits m(m−1)/2 candidates, so one hot band at web
      scale can dominate the whole job. Use
      :func:`minhash_megaclusters` to retrieve the skipped buckets and
      treat each as a single dup cluster instead of pairing it out.
      ``None`` disables the guard."""
    assert num_perm % bands == 0
    rows = num_perm // bands
    if collapse_exact:
        reps, members = _collapse_by_text(df, id_col, text_col)
    else:
        reps, members = df, None
    # ONE zero-shuffle shingle-SET pass (id, shs array) feeds both the
    # signature build and the exact-verify stage. The set form is the
    # scale-critical choice: the old exploded row form shuffled ~700M
    # (id, shingle) rows through a repartition for signatures and TWICE
    # more through the verify joins — the 12M-turn stress peaked >150G of
    # scratch and died on ENOSPC. As arrays there is NO signature shuffle
    # (each row is a complete doc) and verify ships one ~0.5KB array per
    # candidate side. Jaccard over 64-bit-hashed shingle sets equals
    # string-set Jaccard up to negligible collision odds; md5 keeps
    # strings for the ANSI-SQL-reproducible oracle path. Persisted;
    # reclaimed by the ContextCleaner when the returned frame is GC'd.
    use_md5 = base_hash == "md5"
    sets = shingle_sets(reps, n, id_col, text_col, hashed=not use_md5).persist()
    sig = minhash_signatures(
        reps, n, num_perm, seed, id_col, text_col, shingles_df=sets, base_hash=base_hash
    )
    banded = _banded_df(sig, bands, rows, id_col)
    if max_band_bucket is not None:
        small = (
            banded.groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") <= max_band_bucket)
            .select("band_idx", "band_hash")
        )
        banded = banded.join(small, ["band_idx", "band_hash"], "left_semi")
    a = banded.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    cand = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verify: two id-keyed joins ship each side's shingle-hash set
    # once per candidate pair; the intersection is a JVM array_intersect,
    # never a per-shingle row fan-out (|cand| × avg-shingles rows).
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("shs").alias("_sa"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("shs").alias("_sb"))
    pairs = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("_i", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.round(F.col("_i") / (F.size("_sa") + F.size("_sb") - F.col("_i")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if not collapse_exact:
        return pairs
    eligible = sets.select(id_col)
    return _expand_pairs(pairs, members, threshold, eligible)


def minhash_megaclusters(
    df: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_hash: str = "xxhash64",
    max_band_bucket: int = 4096,
) -> DataFrame:
    """(band_idx, band_hash, n_docs, member ids) for LSH band buckets too
    large for pairwise candidate generation — the degrade-to-cluster path
    paired with ``minhash_lsh_pairs(max_band_bucket=...)``.

    At web scale a hot band bucket (near-identical boilerplate across
    millions of pages) is, for curation purposes, one duplicate cluster;
    enumerating its m(m−1)/2 pairs adds no information. Member ids are
    expanded back through the exact-text collapse, so mass-identical
    copies are included."""
    assert num_perm % bands == 0
    rows = num_perm // bands
    reps, members = _collapse_by_text(df, id_col, text_col)
    # no verify stage here — signatures take the zero-shuffle set path
    sig = minhash_signatures(
        reps, n, num_perm, seed, id_col, text_col, base_hash=base_hash
    )
    banded = _banded_df(sig, bands, rows, id_col)
    big = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") > max_band_bucket)
        .select("band_idx", "band_hash")
    )
    return (
        banded.join(big, ["band_idx", "band_hash"], "left_semi")
        .join(members.withColumnRenamed("_rep", id_col), id_col)
        .groupBy("band_idx", "band_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("_member")).alias("members"),
        )
    )


def exact_jaccard_for_pairs(
    df: DataFrame,
    pairs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle Jaccard for a given (id_a, id_b) candidate set only.

    Cost is |pairs| × avg-shingles (fan out id_a's shingles, semi-match
    against id_b's) — NOT the all-co-occurring-pairs self-join, which is
    quadratic in the df of every common shingle. This is the verify stage
    for every LSH-style candidate generator. ``shingles_df`` reuses a
    caller's (persisted) shingle frame instead of recomputing it: either
    the exploded row form from :func:`shingles` (column ``shingle``, or
    pre-hashed as ``h`` — set Jaccard is hash-invariant and the hashed
    form shuffles ~4x fewer bytes), or the set form from
    :func:`shingle_sets` (column ``shs``), which is exploded here.
    minhash_lsh_pairs itself no longer calls this — its verify is the
    in-place array_intersect over set frames."""
    # persisted: referenced by both join sides and the size agg (3×);
    # reclaimed by the ContextCleaner when the returned frame is GC'd
    sh = (
        shingles_df
        if shingles_df is not None
        else shingles(df, n, id_col, text_col).persist()
    )
    if "shs" in sh.columns:
        sh = sh.select(F.col(id_col), F.explode("shs").alias("shingle"))
    elif "shingle" not in sh.columns and "h" in sh.columns:
        sh = sh.withColumnRenamed("h", "shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # pairs with zero shingle overlap (possible band-hash collisions) get
    # jaccard 0 via the left join + coalesce.
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.coalesce(F.col("inter"), F.lit(0))
                / (F.col("sz_a") + F.col("sz_b") - F.coalesce(F.col("inter"), F.lit(0))),
                4,
            ),
        )
        .select("id_a", "id_b", "jaccard")
    )


MINHASH_STORE_META = (
    "n int, num_perm int, bands int, seed int, base_hash string, id_col string"
)


def build_minhash_store(
    spark,
    df: DataFrame,
    store_dir: str,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_hash: str = "xxhash64",
) -> dict:
    """Persist a corpus's near-dup identity — (id, sig) plus the banded
    LSH keys — so FUTURE batches dedup against it without ever touching
    the old documents again (the 100 TB ingest shape: the corpus is read
    once, forever after only its signatures are joined). The store is
    self-describing: (n, num_perm, bands, seed, base_hash) are persisted
    and later calls load them, so signature parameters can never silently
    drift between the corpus and an incremental batch.

    Layout: ``sigs/`` (id, sig) and ``bands/`` (id, band_idx, band_hash)
    partitioned by band_idx, plus a one-row ``store_meta``."""
    import os

    from ..sources.tables import local_rows_df

    assert num_perm % bands == 0
    sig = minhash_signatures(
        df, n, num_perm, seed, id_col, text_col, base_hash=base_hash
    )
    sig.write.mode("overwrite").parquet(os.path.join(store_dir, "sigs"))
    # band from the WRITTEN sigs: one signature computation total
    stored = spark.read.parquet(os.path.join(store_dir, "sigs"))
    _banded_df(stored, bands, num_perm // bands, id_col).write.partitionBy(
        "band_idx"
    ).mode("overwrite").parquet(os.path.join(store_dir, "bands"))
    local_rows_df(
        spark, [(n, num_perm, bands, seed, base_hash, id_col)], MINHASH_STORE_META
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(store_dir, "store_meta"))
    return {"docs": stored.count()}


def _store_meta(spark, store_dir: str) -> dict:
    import os

    return spark.read.parquet(os.path.join(store_dir, "store_meta")).collect()[0].asDict()


def extend_minhash_store(spark, df: DataFrame, store_dir: str, text_col: str = "text") -> dict:
    """Append a new batch's signatures/bands to an existing store using
    the store's own persisted parameters (call AFTER deduping the batch
    with :func:`store_near_dups` and dropping the dups)."""
    import os

    m = _store_meta(spark, store_dir)
    sig = minhash_signatures(
        df, m["n"], m["num_perm"], m["seed"], m["id_col"], text_col,
        base_hash=m["base_hash"],
    ).persist()
    sig.write.mode("append").parquet(os.path.join(store_dir, "sigs"))
    _banded_df(sig, m["bands"], m["num_perm"] // m["bands"], m["id_col"]).write.partitionBy(
        "band_idx"
    ).mode("append").parquet(os.path.join(store_dir, "bands"))
    added = sig.count()
    sig.unpersist()
    return {"docs_added": int(added)}


def store_near_dups(
    spark,
    df: DataFrame,
    store_dir: str,
    threshold: float = 0.5,
    text_col: str = "text",
    include_new_pairs: bool = False,
) -> DataFrame:
    """Incremental near-dup detection: which docs of the NEW batch ``df``
    duplicate something already in the store (and optionally each other).
    Returns (id, dup_of, est_jaccard) — ``dup_of`` is the stored (or
    earlier in-batch) id, ``est_jaccard`` the MinHash estimate
    |sig_a == sig_b| / num_perm (the store holds signatures, not texts,
    so verification is the estimator — its ±1/sqrt(num_perm) noise is the
    standard LSH ingest trade; raise num_perm for tighter gates).

    Scale shape: one signature pass over the batch, then equi-joins on
    (band_idx, band_hash) against the band table — batch-proportional
    work regardless of store size — and a signature compare on candidate
    pairs only. Ids must be globally unique across store and batch."""
    import os

    m = _store_meta(spark, store_dir)
    id_col, num_perm = m["id_col"], m["num_perm"]
    est = (
        f"aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, "
        f"(acc, v) -> acc + v) / {num_perm}"
    )
    new_sig = minhash_signatures(
        df, m["n"], num_perm, m["seed"], id_col, text_col, base_hash=m["base_hash"]
    ).persist()
    new_banded = _banded_df(new_sig, m["bands"], num_perm // m["bands"], id_col)
    old_banded = spark.read.parquet(os.path.join(store_dir, "bands"))
    old_sig = spark.read.parquet(os.path.join(store_dir, "sigs"))

    cand_old = (
        new_banded.join(
            old_banded.select(
                F.col(id_col).alias("dup_of"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .select(id_col, "dup_of")
        .distinct()
    )
    pairs = cand_old.join(
        new_sig.select(F.col(id_col), F.col("sig").alias("sig_a")), id_col
    ).join(
        old_sig.select(F.col(id_col).alias("dup_of"), F.col("sig").alias("sig_b")),
        "dup_of",
    )
    out = pairs.select(id_col, "dup_of", F.expr(est).alias("est_jaccard"))
    if include_new_pairs:
        a = new_banded.select(F.col(id_col), "band_idx", "band_hash")
        b = new_banded.select(
            F.col(id_col).alias("dup_of"), "band_idx", "band_hash"
        )
        cand_new = (
            a.join(b, ["band_idx", "band_hash"])
            .filter(F.col("dup_of") < F.col(id_col))  # first-wins: earlier id
            .select(id_col, "dup_of")
            .distinct()
        )
        new_pairs = cand_new.join(
            new_sig.select(F.col(id_col), F.col("sig").alias("sig_a")), id_col
        ).join(
            new_sig.select(F.col(id_col).alias("dup_of"), F.col("sig").alias("sig_b")),
            "dup_of",
        )
        out = out.unionByName(
            new_pairs.select(id_col, "dup_of", F.expr(est).alias("est_jaccard"))
        )
    return out.filter(F.col("est_jaccard") >= threshold)


def near_dup_clusters(
    ids: DataFrame, pairs: DataFrame, id_col: str = "doc_id", max_iter: int = 25
) -> DataFrame:
    """(id, cluster_id) — connected components of the near-dup pair graph;
    cluster_id = smallest reachable id; ids outside any pair are singleton
    clusters of themselves. The canonical last step of every near-dup
    pipeline (pick one representative per component).

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels — converges in O(component
    diameter) rounds, and near-dup components are shallow (quasi-cliques),
    so a handful of shuffles. ``localCheckpoint`` truncates the plan each
    round (an iterative join would otherwise grow the lineage
    exponentially); convergence is detected with a count of changed
    labels, which also materializes the checkpoint.
    """
    sym = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = ids.select(F.col(id_col).alias("id"), F.col(id_col).alias("lbl"))
    converged = False
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new = (
            labels.join(neigh, labels.id == neigh.src, "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
                (F.col("nlbl") < F.col("lbl")).alias("chg"),
            )
        ).localCheckpoint(eager=False)
        changed = new.filter(F.col("chg")).limit(1).count()
        labels = new.select("id", "lbl")
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        # an unconverged exit would silently report one component as
        # several clusters — fail loudly; callers raise max_iter for
        # unusually deep (chain-shaped) near-dup graphs
        raise RuntimeError(
            f"near_dup_clusters did not converge within max_iter={max_iter} "
            "rounds (component diameter exceeds it); raise max_iter"
        )
    return labels.select(F.col("id").alias(id_col), F.col("lbl").alias("cluster_id"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _md5_hash_array(terms: np.ndarray) -> np.ndarray:
    """uint64 hash = first 8 md5 digest bytes, little-endian — identical
    to DuckDB ``md5_number_upper``, so SQL oracles can reproduce it."""
    import hashlib

    return np.array(
        [
            int.from_bytes(hashlib.md5(str(t).encode()).digest()[:8], "little")
            for t in terms
        ],
        dtype=np.uint64,
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_hash: str = "stable",
) -> DataFrame:
    """(id, simhash long) — 64-bit SimHash over tf-weighted analyzer tokens.

    Vectorized: one tokenize pass, term hashes via pandas hash_array
    (stable siphash; ``base_hash="md5"`` for the SQL-reproducible
    variant), bit votes as a (terms × 64) numpy reduction."""
    from ..functions.analyze import tokenize_series

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            toks = tokenize_series(pdf[text_col])
            dl = toks.str.len().to_numpy()
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            out_ids, out_hash = [], []
            nz = dl > 0
            if nz.any():
                rep = np.repeat(ids[nz], dl[nz])
                terms = np.concatenate([t for t in toks.to_numpy() if len(t)])
                lf = pd.DataFrame({"id": rep, "term": terms})
                tf = lf.groupby(["id", "term"], sort=False).size().reset_index(name="tf")
                if base_hash == "md5":
                    h = _md5_hash_array(tf["term"].to_numpy(dtype=object))
                else:
                    h = pd.util.hash_array(tf["term"].to_numpy(dtype=object))
                votes = (((h[:, None] >> bits) & np.uint64(1)).astype(np.int64) * 2 - 1) * tf[
                    "tf"
                ].to_numpy()[:, None]
                vdf = pd.DataFrame(votes)
                vdf["id"] = tf["id"].to_numpy()
                summed = vdf.groupby("id", sort=False).sum()
                sign = (summed.to_numpy() > 0).astype(np.uint64)
                packed = (sign << bits[None, :]).sum(axis=1).astype(np.int64)
                out_ids.extend(summed.index.to_numpy().tolist())
                out_hash.extend(packed.tolist())
            # zero-token docs → simhash 0
            for i in ids[~nz]:
                out_ids.append(int(i))
                out_hash.append(0)
            yield pd.DataFrame({id_col: out_ids, "simhash": out_hash})

    return df.select(id_col, text_col).mapInPandas(batch, schema=f"{id_col} long, simhash long")


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_hash: str = "stable",
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with SimHash Hamming distance ≤ k.

    Candidates via 4×16-bit band join (any identical quarter ⇒ candidate —
    guaranteed complete for k ≤ 3 by pigeonhole), then exact popcount."""
    sh = simhash(df, id_col, text_col, base_hash=base_hash)
    banded = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.expr(
                "transform(sequence(0, 3), q -> struct(q as band_idx, "
                "shiftright(simhash, q * 16) & 65535 as band_val))"
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band_idx", "bb.band_val")
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band_idx", "band_val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "band_idx", "band_val"
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# winnowing (rolling-hash document fingerprints, Schleimer et al. 2003)
# ---------------------------------------------------------------------------

_WINNOW_BASE = np.uint64(1_000_003)
_WINNOW_SHIFT = 13


def _token_hashes(toks: np.ndarray) -> np.ndarray:
    return pd.util.hash_array(toks.astype(object)).astype(np.uint64)


def winnow_fingerprints(
    df: DataFrame,
    k: int = 4,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_hash: str = "stable",
) -> DataFrame:
    """(id, fp) — winnowing fingerprints: rolling polynomial hash over
    token k-grams, then the minimum hash of every ``window`` consecutive
    k-grams (rightmost-min tie-break), deduplicated. Guarantees every
    shared token run of length ≥ k + window − 1 contributes at least one
    *identical* fingerprint to both docs — the partial-overlap/containment
    detector (quote/boilerplate/plagiarism), where whole-doc md5 and
    set-Jaccard both fail. One Arrow pass; per-doc numpy (sliding-window
    min via stride tricks), no per-token Python.
    """
    from ..functions.analyze import tokenize_series

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = tokenize_series(pdf[text_col])
            out_ids, out_fps = [], []
            for did, ts in zip(pdf[id_col].to_numpy(), toks.to_numpy()):
                ts = np.asarray(ts, dtype=object)
                if len(ts) < k:
                    continue
                if base_hash == "md5":
                    # hash the joined k-gram string directly — exactly
                    # reproducible in SQL (md5_number_upper over
                    # string_agg of the token slice); slower than the
                    # rolling hash, used for cross-engine verification
                    m = len(ts) - k + 1
                    kg = _md5_hash_array(
                        np.array(
                            [" ".join(ts[i : i + k]) for i in range(m)], dtype=object
                        )
                    )
                else:
                    h = _token_hashes(ts)
                    # rolling polynomial k-gram hash, vectorized as a sum
                    # of shifted-and-scaled lanes (k is small)
                    m = len(h) - k + 1
                    kg = np.zeros(m, dtype=np.uint64)
                    for j in range(k):
                        kg = kg * _WINNOW_BASE + h[j : j + m]
                    kg ^= kg >> np.uint64(_WINNOW_SHIFT)
                if m <= window:
                    sel = np.array([kg.min()], dtype=np.uint64)
                else:
                    win = np.lib.stride_tricks.sliding_window_view(kg, window)
                    sel = win.min(axis=1)
                fps = np.unique(sel).astype(np.int64)
                out_ids.append(np.full(len(fps), did, dtype=np.int64))
                out_fps.append(fps)
            if out_ids:
                yield pd.DataFrame(
                    {id_col: np.concatenate(out_ids), "fp": np.concatenate(out_fps)}
                )

    return df.select(id_col, text_col).mapInPandas(batch, schema=f"{id_col} long, fp long")


def winnow_overlap_pairs(
    df: DataFrame,
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_fp_df: int | None = None,
    base_hash: str = "stable",
) -> DataFrame:
    """(id_a, id_b, n_shared) — doc pairs sharing ≥ min_shared winnowing
    fingerprints. Candidate generation is an equi-join on the fingerprint
    (short key, shuffle-friendly); ``max_fp_df`` drops boilerplate
    fingerprints before pairing (same fan-out cap as shingles/LSH).
    The persisted fingerprint frame is reclaimed by the ContextCleaner
    when the returned frame is GC'd (see ngram_jaccard_pairs note)."""
    fp = winnow_fingerprints(df, k, window, id_col, text_col, base_hash=base_hash).persist()
    if max_fp_df is not None:
        freq = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("fdf"))
        fp = fp.join(freq.filter(F.col("fdf") <= max_fp_df), "fp", "left_semi")
    a = fp.select(F.col(id_col).alias("id_a"), "fp")
    b = fp.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def cosine_expr(a: str, b: str):
    """Exact cosine similarity between two array<double> columns, fully
    JVM-side (zip_with + aggregate — whole-stage codegen, no UDF)."""
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
    broadcast: bool = False,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine ≥ threshold — **exact** all-pairs.

    Default path is fully distributed (no driver-side pass over the
    vectors): ids hash into ``n_blocks`` blocks; each of the
    n·(n+1)/2 unordered block pairs (i ≤ j) becomes one task key; each
    vector is shipped to the tasks its block participates in (×n_blocks
    replication — the classic triangle join); within a task one BLAS
    matmul scores the block pair and only over-threshold pairs are
    emitted. Exactness is structural: every unordered id pair lands in
    exactly one task. Size ``n_blocks`` ≈ √(cluster cores) so one task ≈
    two executor-RAM-sized matrices.

    ``broadcast=True`` is the small-data opt-in (≤ ~10^6 × 768): collect +
    broadcast the full normalized matrix, one matmul per input partition,
    no shuffle at all. Exact quadratic work is inherent to the *semantics*
    either way; for 10^11-vector corpora use the approximate candidates
    (similarity.hyperplane_buckets / ann_topk) instead of an exact join.
    """
    if broadcast:
        return _embedding_near_dups_broadcast(emb, threshold, id_col, vec_col)
    thr = float(threshold)
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    v = v.withColumn("blk", F.pmod(F.xxhash64("id"), F.lit(n_blocks)).cast("int"))
    spark = emb.sparkSession
    from ..sources.tables import local_rows_df

    tasks = local_rows_df(
        spark,
        [(i, j) for i in range(n_blocks) for j in range(n_blocks) if i <= j],
        "bi int, bj int",
    )
    # side A of task (i,j) = block i; side B = block j (same block twice
    # when i == j — the within-block triangle)
    side_a = v.join(F.broadcast(tasks), v.blk == tasks.bi).select(
        "bi", "bj", F.lit(0).alias("side"), "id", "v"
    )
    side_b = v.join(F.broadcast(tasks), v.blk == tasks.bj).select(
        "bi", "bj", F.lit(1).alias("side"), "id", "v"
    )

    def score(key, pdf):  # (tuple, pd.DataFrame) -> pd.DataFrame
        bi, bj = int(key[0]), int(key[1])
        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1] if bi != bj else a
        if a.empty or b.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "cos": np.float64}
            )
        ids_a = a["id"].to_numpy(dtype=np.int64)
        ids_b = b["id"].to_numpy(dtype=np.int64)
        A = np.stack(a["v"].map(np.asarray).to_numpy()).astype(np.float64)
        B = np.stack(b["v"].map(np.asarray).to_numpy()).astype(np.float64)
        A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
        B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        cos = np.round(A @ B.T, 4)
        # orient every pair id_a < id_b; the (i,j) task is the unique owner
        # of its id pairs, so no cross-task dedup is ever needed
        mask = (ids_a[:, None] < ids_b[None, :]) & (cos >= thr)
        ai, bj_ix = np.nonzero(mask)
        lo, hi = ids_a[ai], ids_b[bj_ix]
        if bi != bj:
            rmask = (ids_b[None, :] < ids_a[:, None]) & (cos >= thr)
            rai, rbj = np.nonzero(rmask)
            lo = np.concatenate([lo, ids_b[rbj]])
            hi = np.concatenate([hi, ids_a[rai]])
            cvals = np.concatenate([cos[ai, bj_ix], cos[rai, rbj]])
        else:
            cvals = cos[ai, bj_ix]
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": cvals})

    return (
        side_a.unionByName(side_b)
        .groupBy("bi", "bj")
        .applyInPandas(score, schema="id_a long, id_b long, cos double")
    )


def _embedding_near_dups_broadcast(
    emb: DataFrame, threshold: float, id_col: str, vec_col: str
) -> DataFrame:
    """Small-data exact path: broadcast the full normalized matrix, one
    matmul per input partition (no shuffle). Opt-in via broadcast=True."""
    spark = emb.sparkSession
    rows = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>")).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    sc = spark.sparkContext
    b_ids, b_M = sc.broadcast(ids), sc.broadcast(M)
    thr = float(threshold)

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_M = b_ids.value, b_M.value
        order = np.argsort(all_ids)
        for pdf in batches:
            if pdf.empty:
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            A = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
            cos = np.round(A @ all_M[order].T, 4)
            bi = all_ids[order]
            # keep id_a < id_b, cos >= threshold
            mask = (a_ids[:, None] < bi[None, :]) & (cos >= thr)
            ai, bj = np.nonzero(mask)
            yield pd.DataFrame(
                {"id_a": a_ids[ai], "id_b": bi[bj], "cos": cos[ai, bj]}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        block, schema="id_a long, id_b long, cos double"
    )


# ---------------------------------------------------------------------------
# Decontamination (train vs eval n-gram overlap)
# ---------------------------------------------------------------------------


def contamination_pairs(
    df: DataFrame,
    probes: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    broadcast_probes: bool = True,
) -> DataFrame:
    """(id, probe_id, n_shared) — corpus docs sharing ≥1 length-``n`` token
    shingle with a probe (benchmark/eval) document: the standard
    decontamination pass run before training, so eval answers leaking into
    the training set are dropped rather than memorized.

    Shape at scale: the probe side is a benchmark suite — thousands of
    docs against a 100 TB corpus — so its shingle set broadcasts and the
    corpus side stays a map-only scan + hash-probe (no shuffle of corpus
    shingles). Set ``broadcast_probes=False`` for a probe set too large to
    broadcast; the join then shuffles both sides on the shingle key, with
    fan-out bounded by probe-shingle df exactly like ngram_jaccard_pairs.
    """
    doc_sh = shingles(df, n, id_col, text_col)
    pr_sh = shingles(probes, n, probe_id_col, text_col)
    if broadcast_probes:
        pr_sh = F.broadcast(pr_sh)
    return (
        doc_sh.join(pr_sh, "shingle")
        .groupBy(id_col, probe_id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def dup_spans(
    df: DataFrame,
    n: int = 20,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring dedup (Lee et al. 2021 "Deduplicating Training
    Data"): find every n-token window whose exact token sequence occurs
    ``min_count``+ times in the corpus, keep the globally FIRST occurrence
    (lexicographic (id, start)), and emit the other occurrences as merged
    per-doc cut spans (id, start, end, n_windows) — end exclusive, token
    offsets, ready for span removal before training.

    Scale shape (no windows over the global occurrence list — a boiler-
    plate n-gram with 10^9 occurrences must not serialize through one
    task): occurrences explode from ONE tokenize pass; per-hash count and
    first-occurrence are map-side-combining aggregations (count +
    min(struct(id,start))); flagging is an equi-join of occurrences
    against that per-hash table; only the merge of a single doc's flagged
    windows uses a window function, partitioned by doc.
    """
    t = with_tokens(df, text_col)
    sh = F.expr(
        f"transform(sequence(0, size(toks) - {n}), i -> "
        f"struct(i AS start, xxhash64(concat_ws(' ', slice(toks, i + 1, {n}))) AS h))"
    )
    occ = (
        t.filter(F.size("toks") >= n)
        .select(F.col(id_col), F.explode(sh).alias("o"))
        .select(id_col, F.col("o.start").alias("start"), F.col("o.h").alias("h"))
    )
    per_h = occ.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("first_occ"),
    )
    flagged = (
        occ.join(per_h.filter(F.col("cnt") >= int(min_count)), "h")
        .filter(
            ~(
                (F.col(id_col) == F.col(f"first_occ.{id_col}"))
                & (F.col("start") == F.col("first_occ.start"))
            )
        )
        .select(id_col, "start", (F.col("start") + n).alias("end"))
    )
    w = Window.partitionBy(id_col).orderBy("start")
    prev_max = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = flagged.withColumn(
        "island",
        F.sum(
            F.when(prev_max.isNull() | (F.col("start") > prev_max), 1).otherwise(0)
        ).over(w),
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("start").alias("start"),
            F.max("end").alias("end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(id_col, "start", "end", "n_windows")
    )


# ---------------------------------------------------------------------------
# benchmark decontamination


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Flag training docs that share any word ``n``-gram with a held-out
    evaluation set (benchmark decontamination, the standard pre-training
    hygiene pass: an eval question leaking into the training corpus
    inflates downstream scores).

    Returns one row per input doc: (``id_col``, n_shingles, n_hits,
    contaminated) where n_shingles is the doc's distinct n-gram count,
    n_hits how many of those occur anywhere in the eval set, and
    contaminated = n_hits > 0. Docs shorter than ``n`` tokens have
    n_shingles = 0 and are clean by definition.

    Scale shape: the eval side reduces to a distinct-shingle set — eval
    suites are tiny next to a training corpus, so it is broadcast by
    default (``broadcast_eval=False`` falls back to a shuffle join for
    pathological eval sizes). The corpus side is one tokenize pass + an
    explode; the join is an equi-join on the shingle string with a
    map-side-combining count agg — no all-pairs stage anywhere.
    """
    ev = shingles(
        eval_df, n, eval_id_col or id_col, text_col
    ).select("shingle").distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    sh = shingles(docs, n, id_col, text_col)
    hits = (
        sh.join(ev.withColumn("__hit", F.lit(1)), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hits"),
        )
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.9,
    n_cells: int = 16,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup over an embedding column: spherical
    k-means cells (similarity.ivf_centroids — bounded driver sample),
    EXACT cosine pairs within each cell, connected components, keep the
    lowest id per component. Output: (id, cluster, keep boolean) for
    every vector.

    ``n_cells=1`` degenerates to exact corpus-wide semantic dedup (the
    oracle anchor); at scale ``n_cells ≈ sqrt(N)`` keeps each cell's
    all-pairs matmul executor-sized — the published SemDeDup recipe:
    near-duplicate semantics rarely cross k-means cells, and misses are
    the accepted approximation, not a correctness bug of the exact path.

    Scale shape: one Arrow assign pass, one shuffle on ``cell``, one BLAS
    matmul per cell, then min-label propagation over the (sparse) pair
    graph. No driver-side pass over the vectors.
    """
    from .similarity import ivf_assign, ivf_centroids

    cents = ivf_centroids(emb, n_cells=n_cells, seed=seed, vec_col=vec_col)
    assigned = ivf_assign(emb, cents, id_col=id_col, vec_col=vec_col)
    thr = float(threshold)
    idc = id_col

    def cell_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        out = []
        for _cell, grp in pdf.groupby("cell", sort=False):
            if len(grp) < 2:
                continue
            M = np.stack(grp["v"].map(np.asarray).to_numpy()).astype(np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            S = Mn @ Mn.T
            ids = grp[idc].to_numpy()
            iu, ju = np.triu_indices(len(ids), k=1)
            m = S[iu, ju] >= thr
            if m.any():
                a, b = ids[iu[m]], ids[ju[m]]
                out.append(
                    pd.DataFrame(
                        {
                            "id_a": np.minimum(a, b),
                            "id_b": np.maximum(a, b),
                            "cos": S[iu, ju][m],
                        }
                    )
                )
        if out:
            yield pd.concat(out, ignore_index=True)

    pairs = assigned.repartition("cell").mapInPandas(
        cell_pairs, schema="id_a long, id_b long, cos double"
    )
    comp = near_dup_clusters(
        emb.select(F.col(id_col).alias(idc)), pairs, id_col=idc
    )
    cluster_col = [c for c in comp.columns if c != idc][0]
    return comp.select(
        F.col(idc),
        F.col(cluster_col).alias("cluster"),
        (F.col(idc) == F.col(cluster_col)).alias("keep"),
    )


def dedup_keep_best(
    ids: DataFrame,
    pairs: DataFrame,
    priority_col: str,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup winner selection: one KEPT doc per connected component of
    the pair graph — the highest-``priority_col`` member, ties to the
    smallest id. Production curation keeps the best-quality duplicate
    (longest, highest LM score, freshest), not the smallest docid; this
    composes :func:`near_dup_clusters` with that policy. ``ids`` carries
    (id_col, priority_col); singletons keep themselves.

    Returns (id_col, cluster_id, kept) for every input id.

    Scale shape: components via min-label propagation (O(diameter)
    shuffles), then winner = one max_by((priority, -id)) hash agg keyed
    by cluster — never a global sort, nothing driver-side."""
    clusters = near_dup_clusters(
        ids.select(id_col), pairs, id_col=id_col, max_iter=max_iter
    )
    j = clusters.join(ids, id_col, "inner")
    # max_by on a struct orders lexicographically: (priority asc, -id asc)
    # → max = highest priority, smallest id on ties
    winners = j.groupBy("cluster_id").agg(
        F.max_by(
            id_col,
            F.struct(F.col(priority_col).alias("p"), (-F.col(id_col)).alias("ni")),
        ).alias("winner")
    )
    return (
        j.join(winners, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            (F.col(id_col) == F.col("winner")).alias("kept"),
        )
    )


def sequence_fingerprint(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    normalize: bool = True,
) -> DataFrame:
    """(key, fp, n_items): one md5 per GROUP over its members' values in
    a deterministic order — the unit-of-dedup raised from a row to a
    whole conversation / session / event history. A transcript pipeline
    dedups conversations, not turns: two convs whose turn texts are
    identical in order are the same training document even though every
    turn row differs in ids/timestamps.

    One hash aggregate: members pack into sorted (order, value) structs
    via collect_list + array_sort (per-group state = that group's rows,
    the same bound any conv-level operation has), values join with a
    separator, md5 over the result. ``normalize`` applies the exact-dedup
    text normalization (lower + whitespace collapse) to each member
    first."""
    val = F.col(value_col).cast("string")
    if normalize:
        val = F.lower(F.regexp_replace(F.trim(val), "\\s+", " "))
    member = F.struct(*[F.col(c) for c in order_cols], val.alias("_v"))
    packed = F.array_sort(F.collect_list(member))
    # unit-separator join: boundary ambiguity ("ab","c" vs "a","bc")
    # cannot alias two different sequences to one fingerprint
    joined = F.array_join(F.transform(packed, lambda s: s["_v"]), "\x1f")
    return df.groupBy(key_col).agg(
        F.md5(joined).alias("fp"), F.count(F.lit(1)).alias("n_items")
    )


def sequences_as_documents(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collapse each group to ONE document row (key → id, members joined
    in order with newlines) — the bridge that lets every document-level
    operator (MinHash-LSH near-dup, Jaccard, quality/LM filters, DSIR,
    decontamination) run at the conversation/session unit instead of the
    turn. Same one-aggregate shape as sequence_fingerprint."""
    member = F.struct(
        *[F.col(c) for c in order_cols], F.col(value_col).cast("string").alias("_v")
    )
    packed = F.array_sort(F.collect_list(member))
    return df.groupBy(F.col(key_col).alias(id_col)).agg(
        F.array_join(F.transform(packed, lambda s: s["_v"]), "\n").alias(text_col)
    )


def dedup_sequences(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Keep the lowest-key representative of each identical sequence —
    exact_dedup lifted to groups. Output: (key, fp, n_items)."""
    fps = sequence_fingerprint(df, key_col, order_cols, value_col, normalize)
    w = Window.partitionBy("fp").orderBy(F.col(key_col).asc())
    return (
        fps.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
