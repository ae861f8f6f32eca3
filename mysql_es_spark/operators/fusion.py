"""Hybrid retrieval — reciprocal rank fusion (ES 8.x ``rrf``).

Modern search (and every RAG stack) runs lexical BM25 and vector
similarity side by side and fuses the rankings; ES exposes exactly this
as the ``rrf`` retriever: score(d) = Σ_r 1/(rrf_k + rank_r(d)) over the
retrievers that returned d. Rank-based fusion needs no score
calibration between BM25 and cosine — which is why it is the default
hybrid combiner.

Scale shape: each retriever contributes a top-N frame (N = tens..
hundreds — already reduced by its own engine: block-max pruned BM25,
ANN probes); ranking those N rows uses a single-partition window, which
is bounded by construction (never applied to a corpus-sized frame), and
the fuse itself is a hash agg over ≤ Σ N rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_rank(df: DataFrame, order_by: list, id_col: str = "doc_id") -> DataFrame:
    """(id, rank) from a retriever's TOP-N output frame, rank 1-based in
    the given order. The global window is intentional and safe: inputs
    are top-N results, never corpus-sized — do not call this on an
    unreduced frame."""
    w = Window.orderBy(*order_by)
    return df.select(F.col(id_col), F.row_number().over(w).alias("rank"))


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    score_decimals: int | None = None,
) -> DataFrame:
    """Fuse (id, rank) frames: score = Σ 1/(rrf_k + rank), ties broken by
    id. Returns (id, score, n_retrievers), limit k — a doc surfaced by
    several retrievers beats one ranked similarly by a single retriever
    (the RRF property hybrid search exists for).

    ``score_decimals`` orders (and tie-breaks by id) on the ROUNDED fused
    score — set it when the output must rank identically across engines
    (the cross-engine determinism contract every oracle-checked path in
    this repo follows); the emitted score stays full precision."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked frame")
    parts = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank"))).alias("c"),
        )
        for df in ranked
    ]
    u = reduce(DataFrame.unionByName, parts)
    key = F.col("score") if score_decimals is None else F.round("score", score_decimals)
    return (
        u.groupBy(id_col)
        .agg(F.sum("c").alias("score"), F.count(F.lit(1)).alias("n_retrievers"))
        .orderBy(key.desc(), F.col(id_col).asc())
        .limit(k)
    )


def linear_fuse(
    scored: list[tuple[DataFrame, float]],
    k: int = 10,
    id_col: str = "doc_id",
    score_col: str = "s",
    score_decimals: int | None = None,
    normalize: str | None = None,
) -> DataFrame:
    """ES ``knn`` + query combination (pre-RRF hybrid): score(d) =
    Σ_i w_i · s_i(d), docs from the UNION of the retrievers' outputs, a
    retriever that missed d contributes 0 (exactly how an ES knn section
    adds ``boost × similarity`` onto the query score). Inputs are
    (frame, weight) with frames carrying (id_col, score_col).
    Returns (id, score, n_retrievers) top-k; ``score_decimals`` ranks on
    the rounded sum (cross-engine determinism contract).

    ``normalize`` is the ES ``linear`` retriever's normalizer, applied
    per retriever BEFORE weighting so BM25 and cosine land on one scale:
    ``"minmax"`` maps each frame's scores to [0,1] over its retrieved
    window ((s−min)/(max−min), 0 when the window is constant — ES's
    identical-scores case), ``"l2"`` divides by the window's L2 norm.
    The window stats are a one-row agg per frame broadcast back — frames
    are top-N by contract, so this never touches corpus-scale data."""
    if not scored:
        raise ValueError("linear_fuse needs at least one scored frame")
    if normalize not in (None, "minmax", "l2"):
        raise ValueError(f"unknown normalize {normalize!r}")

    def _norm(df: DataFrame) -> DataFrame:
        s = F.col(score_col).cast("double")
        if normalize == "minmax":
            st = df.agg(F.min(s).alias("_mn"), F.max(s).alias("_mx"))
            return (
                df.crossJoin(F.broadcast(st))
                .withColumn(
                    score_col,
                    F.coalesce(
                        F.try_divide(s - F.col("_mn"), F.col("_mx") - F.col("_mn")),
                        F.lit(0.0),
                    ),
                )
                .drop("_mn", "_mx")
            )
        if normalize == "l2":
            st = df.agg(F.sqrt(F.sum(s * s)).alias("_nrm"))
            return (
                df.crossJoin(F.broadcast(st))
                .withColumn(
                    score_col, F.coalesce(F.try_divide(s, F.col("_nrm")), F.lit(0.0))
                )
                .drop("_nrm")
            )
        return df

    parts = [
        _norm(df).select(
            F.col(id_col), (F.col(score_col) * F.lit(float(w))).alias("c")
        )
        for df, w in scored
    ]
    u = reduce(DataFrame.unionByName, parts)
    key = F.col("score") if score_decimals is None else F.round("score", score_decimals)
    return (
        u.groupBy(id_col)
        .agg(F.sum("c").alias("score"), F.count(F.lit(1)).alias("n_retrievers"))
        .orderBy(key.desc(), F.col(id_col).asc())
        .limit(k)
    )


def retriever_tree(
    node: dict,
    k: int = 10,
    id_col: str = "doc_id",
    score_decimals: int | None = None,
) -> DataFrame:
    """Compile an ES retriever tree (8.16+ ``retriever`` section) into one
    composed plan. Nodes are single-key dicts:

    - ``{"retriever": df}`` — leaf: an already-reduced top-N scored frame
      carrying ``(id_col, "s")`` (a BM25 top-k, an ANN top-k, …).
    - ``{"rrf": {"retrievers": [...], "rank_constant": 60,
      "rank_window_size": 50}}`` — reciprocal-rank fusion of child nodes:
      each child is evaluated to its top ``rank_window_size``, ranked, and
      fused with :func:`rrf_fuse`.
    - ``{"linear": {"retrievers": [...], "weights": [...],
      "normalize": None|"minmax"|"l2", "rank_window_size": 50}}`` —
      weighted-sum fusion via :func:`linear_fuse`.
    - ``{"rule": {"retriever": ..., "rules": [...], "metadata": {...},
      "corpus": df|None}}`` — ES's rule retriever: query-rules curation
      (operators/rules.py) over the child — matching pins first with
      deterministic scores, excluded ids dropped.
    - ``{"rescorer": {"retriever": ..., "rescore": fn,
      "rank_window_size": 50}}`` — ES's rescorer retriever: the child's
      top-window ids are re-scored by ``rescore`` (a callable taking the
      child's ``(id_col, "s")`` window frame and returning a frame with
      the same two columns — e.g. a phrase-precision pass); docs outside
      the window are dropped, exactly ES's window contract.

    Children compose to any depth (rrf of linear of rescorer of leaves).
    Every intermediate is a top-N frame by construction, so the whole
    tree stays in the bounded-window regime of this module: fusion cost
    is O(Σ windows), independent of corpus size.

    ``score_decimals`` applies the cross-engine determinism contract at
    every rank/cut boundary in the tree.
    """
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(f"retriever node must be a single-key dict, got {node!r}")
    kind, body = next(iter(node.items()))
    key = (lambda c: F.round(c, score_decimals)) if score_decimals is not None else (lambda c: c)
    order = [key(F.col("s")).desc(), F.col(id_col).asc()]

    if kind == "retriever":
        return body.select(F.col(id_col), F.col("s")).orderBy(*order).limit(k)

    if kind in ("rrf", "linear"):
        window = int(body.get("rank_window_size", max(k, 50)))
        children = [
            retriever_tree(c, k=window, id_col=id_col, score_decimals=score_decimals)
            for c in body["retrievers"]
        ]
        if kind == "rrf":
            ranked = [with_rank(c, order, id_col=id_col) for c in children]
            fused = rrf_fuse(
                ranked, k=k, rrf_k=int(body.get("rank_constant", 60)),
                id_col=id_col, score_decimals=score_decimals,
            )
        else:
            weights = body.get("weights") or [1.0] * len(children)
            if len(weights) != len(children):
                raise ValueError("linear retriever: len(weights) != len(retrievers)")
            fused = linear_fuse(
                list(zip(children, weights)), k=k, id_col=id_col,
                score_col="s", score_decimals=score_decimals,
                normalize=body.get("normalize"),
            )
        return fused.select(F.col(id_col), F.col("score").alias("s"))

    if kind == "rescorer":
        window = int(body.get("rank_window_size", max(k, 50)))
        child = retriever_tree(
            body["retriever"], k=window, id_col=id_col, score_decimals=score_decimals
        )
        rescored = body["rescore"](child).select(F.col(id_col), F.col("s"))
        # window contract: only ids the child surfaced may appear
        rescored = rescored.join(child.select(id_col), id_col, "inner")
        return rescored.orderBy(*order).limit(k)

    if kind == "rule":
        # ES 8.16 `rule` retriever: query-rules curation applied on top of
        # any organic child — matching rules' pins rank first with the
        # deterministic pinned_base - i scores (operators/rules.py
        # contract), excluded ids vanish. ``corpus`` (an id frame)
        # optionally drops pins that don't exist, as ES skips missing
        # pinned docs; without it, pin ids are trusted.
        from .rules import matching_actions, validate_ruleset

        window = int(body.get("rank_window_size", max(k, 50)))
        child = retriever_tree(
            body["retriever"], k=window, id_col=id_col, score_decimals=score_decimals
        )
        pins, excl = matching_actions(
            validate_ruleset(body["rules"]), body.get("metadata", {})
        )
        out = child
        if excl:
            out = out.filter(~F.col(id_col).cast("string").isin(sorted(excl)))
        if pins:
            base = float(body.get("pinned_base", 1.0e6))
            idt = child.schema[id_col].dataType
            spark = child.sparkSession
            pinned_df = spark.createDataFrame(
                [(p, base - i) for i, p in enumerate(pins)], "pid string, s double"
            ).select(F.col("pid").cast(idt).alias(id_col), "s")
            corpus = body.get("corpus")
            if corpus is not None:
                pinned_df = pinned_df.join(
                    corpus.select(F.col(id_col)), id_col, "left_semi"
                )
            out = out.join(pinned_df.select(id_col), id_col, "left_anti").unionByName(
                pinned_df
            )
        return out.orderBy(*order).limit(k)

    raise ValueError(f"unknown retriever kind {kind!r}")
