"""Text analysis operators for training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting, and
document fingerprinting over a (id, text) table. Every formula here is
deliberately expressible both as Spark expressions and as DuckDB SQL so
the driver's oracle can check it value-for-value; the shared tokenizer
contract is functions/analyze.py.

All heavy lifting is JVM expressions or one Arrow-vectorized tokenize
pass — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyze import tokenize_udf

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "los", "las"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "les", "des"],
}


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def with_tokens(df: DataFrame, text_col: str = "text", out: str = "toks") -> DataFrame:
    return df.withColumn(out, tokenize_udf()(F.col(text_col)))


def token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens) — analyzer token count per document."""
    return with_tokens(df, text_col).select(
        F.col(id_col), F.size("toks").cast("long").alias("n_tokens")
    )


def _stop_ratio(lang: str):
    return F.size(
        F.expr(f"filter(toks, x -> x in ({_sql_list(STOPWORDS[lang])}))")
    ) / F.greatest(F.size("toks"), F.lit(1))


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, lang_pred) — stopword-ratio heuristic over en/es/fr.

    Deterministic tie-break: en ≥ es ≥ fr; all-zero → 'und'.
    """
    t = with_tokens(df, text_col)
    r_en, r_es, r_fr = _stop_ratio("en"), _stop_ratio("es"), _stop_ratio("fr")
    pred = (
        F.when((r_en >= r_es) & (r_en >= r_fr) & (r_en > 0), F.lit("en"))
        .when((r_es >= r_fr) & (r_es > 0), F.lit("es"))
        .when(r_fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return t.select(F.col(id_col), pred.alias("lang_pred"))


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, quality) in [0,1]:
    0.4·min(1, n_tokens/100) + 0.4·min(1, 3·stopword_ratio)
    + 0.2·(1 − punct_ratio), rounded to 4 dp."""
    t = with_tokens(df, text_col)
    n_tok = F.size("toks")
    len_score = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    stop_score = F.least(F.lit(1.0), F.lit(3.0) * _stop_ratio("en"))
    clean_len = F.length(F.regexp_replace(F.col(text_col), "[^0-9a-zA-Z ]", ""))
    punct_ratio = (F.length(F.col(text_col)) - clean_len) / F.greatest(
        F.length(F.col(text_col)), F.lit(1)
    )
    q = F.round(
        F.lit(0.4) * len_score + F.lit(0.4) * stop_score + F.lit(0.2) * (F.lit(1.0) - punct_ratio),
        4,
    )
    return t.select(F.col(id_col), q.alias("quality"))


def quality_top_percent(
    df: DataFrame,
    p: float = 0.5,
    by: tuple[str, ...] = (),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-percentile curation: keep the top ``p`` fraction of docs
    by :func:`quality_score` WITHIN each ``by`` group (the standard
    "best X% per language/domain" filter — a per-group percentile, so a
    low-resource group is never starved by a high-quality majority
    group). Ties break deterministically by (quality desc, id asc); the
    cut is rank <= ceil(p * group_size). Returns (id, by..., quality,
    q_rank).

    Scale note: ranking partitions by ``by`` — one shuffle on the group
    key. With ``by=()`` the rank is a single global window; pass a group
    column for big corpora (or pre-shard, as greedy_pack does)."""
    if not (0 < p <= 1):
        raise ValueError(f"quality_top_percent: p must be in (0, 1], got {p}")
    from pyspark.sql import Window

    q = quality_score(df, id_col, text_col)
    keyed = df.select(id_col, *by).join(q, id_col)
    part = Window.partitionBy(*[F.col(c) for c in by]) if by else Window.partitionBy(F.lit(1))
    rnk = F.row_number().over(
        part.orderBy(F.col("quality").desc(), F.col(id_col).asc())
    )
    n = F.count(F.lit(1)).over(part)
    return (
        keyed.withColumn("q_rank", rnk)
        .withColumn("n_grp", n)
        .filter(F.col("q_rank") <= F.ceil(F.lit(float(p)) * F.col("n_grp")))
        .select(id_col, *by, "quality", F.col("q_rank").cast("int").alias("q_rank"))
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fp) — md5 over the analyzer-normalized token stream: robust to
    case/accents/punctuation, the canonical exact-dedup key."""
    t = with_tokens(df, text_col)
    return t.select(F.col(id_col), F.md5(F.concat_ws(" ", F.col("toks"))).alias("fp"))


def term_freq_topn(
    df: DataFrame, n: int = 20, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide top-N terms by total occurrences (term, n_occurrences,
    n_docs), a classic shuffle-light two-level agg: explode happens after
    the Arrow tokenize pass, the groupBy map-side combines."""
    t = with_tokens(df, text_col)
    ex = t.select(F.col(id_col), F.explode("toks").alias("term"))
    return (
        ex.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
        .limit(n)
    )


# BPE-ish subword chunking: ≤4-letter runs / single digits / single
# punctuation marks approximate a byte-pair-encoding token count without a
# merges table. The pattern is greedy-identical under Java regex and RE2,
# so Spark and DuckDB agree byte-for-byte.
BPE_ISH_RE = "[a-z]{1,4}|[0-9]|[^a-z0-9\\s]"


def bpe_token_estimate(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bpe_tokens) — BPE-like subword count, pure JVM expression."""
    return df.select(
        F.col(id_col),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_RE), F.lit(0))
        ).cast("long").alias("n_bpe_tokens"),
    )


# PII scrubbing patterns — shared Java-regex/RE2 subset so Spark and the
# DuckDB oracle replace byte-identically. Order matters: emails first
# (their local part may contain digits), then IPv4 (dots break the phone
# pattern anyway), then phone-like digit runs.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    ("phone", r"\+?[0-9][0-9() -]{6,}[0-9]", "[PHONE]"),
]


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, scrubbed, n_email, n_ip, n_phone) — regex redaction of emails,
    IPv4 addresses and phone-like digit runs, the standard pre-training
    scrub pass. Pure JVM regexp_replace/regexp_count chain; patterns are
    deliberately in the Java-regex ∩ RE2 subset so the DuckDB oracle
    reproduces the replacement byte-for-byte."""
    s = F.col(text_col)
    exprs = []
    for name, pat, repl in PII_PATTERNS:
        # count on the progressively-scrubbed text so overlapping classes
        # (an email's digits re-matching as a phone) are not double-counted
        exprs.append(
            F.size(F.regexp_extract_all(s, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        s = F.regexp_replace(s, pat, repl)
    return df.select(F.col(id_col), s.alias("scrubbed"), *exprs)


def gopher_quality(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition + shape filters, one row per doc:
    (id, n_tokens, mean_word_len, top_unigram_frac, dup_line_frac, keep).

    keep = 10 ≤ n_tokens, 2 ≤ mean_word_len ≤ 12, top_unigram_frac ≤ 0.2,
    dup_line_frac ≤ 0.3 — the Gopher-rules shape at demo thresholds.
    Everything is a JVM array expression over one tokenize pass (the
    per-row top-unigram scan is O(distinct·n) on short documents, still
    JVM-side); the DuckDB oracle mirrors each expression list-for-list."""
    t = with_tokens(df, text_col)
    n_tok = F.size("toks")
    mean_wl = F.expr(
        "aggregate(toks, 0L, (a, x) -> a + length(x))"
    ) / F.greatest(n_tok, F.lit(1))
    top_frac = F.expr(
        "array_max(transform(array_distinct(toks), d -> size(filter(toks, x -> x = d))))"
    ) / F.greatest(n_tok, F.lit(1))
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != "")
    dup_frac = (F.size(lines) - F.size(F.array_distinct(lines))) / F.greatest(
        F.size(lines), F.lit(1)
    )
    keep = (
        (n_tok >= 10)
        & (mean_wl >= 2)
        & (mean_wl <= 12)
        & (top_frac <= 0.2)
        & (dup_frac <= 0.3)
    )
    return t.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(F.coalesce(top_frac, F.lit(0.0)), 4).alias("top_unigram_frac"),
        F.round(dup_frac, 4).alias("dup_line_frac"),
        keep.alias("keep"),
    )


def duckdb_tokens(text_col: str = "text") -> str:
    """The DuckDB expression equal to with_tokens() for Latin-script text."""
    return f"regexp_extract_all(lower(strip_accents({text_col})), '[0-9a-z]+')"


def edge_ngram_tokens(
    df: DataFrame,
    lo: int = 2,
    hi: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_grams) — unique-token count under the reference's T1 *index*
    analyzer with front edge-ngrams on (template.json:9-19,30-36: standard
    → lowercase → asciifold → edge_ngram(lo..hi) → unique). The ngram
    expansion is the one analyzer step the pyarrow fast path can't express,
    so this runs the pandas tokenize path (functions/analyze.py T1)."""
    t = df.withColumn("toks", tokenize_udf(edge_ngram=True, ngram_min=lo, ngram_max=hi)(F.col(text_col)))
    return t.select(F.col(id_col), F.size("toks").cast("long").alias("n_grams"))


def phrase_search(
    df: DataFrame, phrase: str, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos) for docs containing the analyzer-token ``phrase`` as a
    consecutive token run; pos is the 1-based character offset of the first
    occurrence in the space-joined token stream (0 never appears — misses
    are filtered). Index-free analog of ES match_phrase: both engines
    normalize to the same token stream, so "Fast, TABLE value!" matches
    "fast table value". No positional postings needed for the batch form;
    the streamed form would reuse the same normalized-stream contract."""
    from ..functions.analyze import tokenize_text

    needle = " " + " ".join(tokenize_text(phrase)) + " "
    t = with_tokens(df, text_col)
    hay = F.concat(F.lit(" "), F.concat_ws(" ", F.col("toks")), F.lit(" "))
    return (
        t.select(F.col(id_col), F.instr(hay, needle).cast("long").alias("pos"))
        .filter(F.col("pos") > 0)
    )


def prefix_search(
    df: DataFrame, prefix: str, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_hits) for docs with ≥1 analyzer token starting with ``prefix``
    — search-as-you-type, the query the reference serves by edge-ngram
    indexing name/phone fields (template.json:74-96). Here it's a pure JVM
    expression (tokenize → filter → size); against the built index the same
    query is a term-dictionary range scan over [prefix, prefix+0xFF)."""
    from ..functions.analyze import tokenize_text

    toks = tokenize_text(prefix)
    norm = toks[0] if toks else ""
    t = with_tokens(df, text_col)
    # column-lambda filter: the prefix is passed as a literal, never
    # interpolated into SQL text (quotes in user input must not parse)
    hits = F.size(F.filter(F.col("toks"), lambda x: x.startswith(F.lit(norm))))
    return (
        t.select(F.col(id_col), hits.cast("long").alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )


def lm_quality(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, avg_logprob) — corpus unigram-LM quality score.

    CCNet-style LM filtering with the degenerate 1-gram model: for each
    doc, the mean over its tokens of ln p(t) where p(t) = corpus total
    term frequency / corpus token count. Rare-vocabulary docs score far
    negative; boilerplate scores near the corpus mode. (Production CCNet
    uses a 5-gram KenLM — the plumbing and the filtering contract are
    identical, only the probability table differs.)

    Scale shape: the corpus is tokenized ONCE into a persisted per-(doc,
    term) tf frame; vocab (term → ttf), the corpus total, and the per-doc
    score all derive from it, so the expensive Arrow pass never re-runs
    per plan branch. avg ln(tf/total) = Σ tf·ln(ttf)/n − ln(total), so
    the only join is tf ⋈ vocab — an equi-join on term that map-side
    combines; the total is a 1-row agg broadcast as a scalar subtraction.
    Zero-token docs surface with NULL avg_logprob. (The tf frame is
    persisted for the action and reclaimed by the ContextCleaner when the
    returned frame is GC'd — same contract as the dedup shingle frames.)
    """
    tf_df = (
        with_tokens(df, text_col)
        .select(F.col(id_col), F.explode("toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    vocab = tf_df.groupBy("term").agg(F.sum("tf").alias("ttf"))
    total = vocab.agg(F.sum("ttf").alias("t"))
    per = (
        tf_df.join(vocab, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (F.sum(F.col("tf") * F.log("ttf")) / F.sum("tf")).alias("mean_ln_ttf"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "n_tokens",
            (F.col("mean_ln_ttf") - F.log("t")).alias("avg_logprob"),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "avg_logprob",
        )
    )


def fit_log_odds(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Multinomial-NB log-odds term weights from two seed corpora — the
    distributable core of a CCNet/fastText-style quality classifier
    (LLaMA's wiki-ref filter, GPT-3's WebText classifier): "looks like
    the positive seed" becomes one number per document.

    Returns one row per term in pos ∪ neg::

        weight(t) = ln((tfp(t)+α)/(TP+αV)) − ln((tfn(t)+α)/(TN+αV))

    with tfp/tfn the term's total frequency in each corpus, TP/TN the
    corpus token totals, V the union vocabulary size — i.e. add-α
    smoothed class-conditional log-likelihood ratios. Training is two
    shuffles total (one groupBy(term) over the unioned token stream, one
    1-row total) regardless of corpus size; the scalars ride a broadcast
    cross-join so the whole fit stays lazy — no driver action, the
    weights frame composes straight into classifier_score at any scale.
    """
    toked = (
        with_tokens(pos.select(F.col(text_col)), text_col)
        .select(F.explode("toks").alias("term"), F.lit(1).alias("is_pos"))
        .unionByName(
            with_tokens(neg.select(F.col(text_col)), text_col).select(
                F.explode("toks").alias("term"), F.lit(0).alias("is_pos")
            )
        )
    )
    counts = toked.groupBy("term").agg(
        F.sum("is_pos").cast("long").alias("tfp"),
        F.sum(1 - F.col("is_pos")).cast("long").alias("tfn"),
    )
    totals = counts.agg(
        F.sum("tfp").alias("tp"),
        F.sum("tfn").alias("tn"),
        F.count(F.lit(1)).alias("v"),
    )
    a = float(alpha)
    return counts.crossJoin(F.broadcast(totals)).select(
        "term",
        (
            F.log((F.col("tfp") + a) / (F.col("tp") + a * F.col("v")))
            - F.log((F.col("tfn") + a) / (F.col("tn") + a * F.col("v")))
        ).alias("weight"),
    )


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, score, label) — apply fit_log_odds weights to a
    corpus: score = bias + mean over the doc's tokens of weight(token),
    label = score > 0. The mean (not NB's sum) is the fastText/CCNet
    convention — length-invariant, so a long doc can't buy its way past
    the threshold on volume. Out-of-vocabulary tokens contribute 0 (they
    say nothing about either class); they still count in the mean's
    denominator, diluting confidence exactly as fastText's missing-bucket
    average does. Zero-token docs get score = NULL, label = NULL.

    Scale shape: tokenize once (Arrow pass) → per-(doc, term) tf (map-side
    combined) → one equi-join with the weights on term → per-doc sum. The
    join key is a single short string; weights is vocabulary-sized, so no
    broadcast hint — AQE picks one when the vocab is small.
    """
    tf_df = (
        with_tokens(df.select(F.col(id_col), F.col(text_col)), text_col)
        .select(F.col(id_col), F.explode("toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    per = (
        tf_df.join(weights, "term", "left")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (
                float(bias)
                + F.sum(F.col("tf") * F.coalesce("weight", F.lit(0.0))) / F.sum("tf")
            ).alias("score"),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "score",
            (F.col("score") > 0).alias("label"),
        )
    )
