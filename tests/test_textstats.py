from __future__ import annotations

import pytest

from mysql_es_spark.operators import textstats

DOCS = [
    (0, "The cat sat on the mat and it was happy for a while"),
    (1, "el perro corre en la calle y la gente mira los arboles"),
    (2, "le chat dort dans la maison et les enfants jouent"),
    (3, "zxqv foo123 bar"),
    (4, ""),
    (5, None),
    (6, "Short! With, punctuation... everywhere??"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, schema="doc_id long, text string")


def test_token_count(spark, docs_df):
    got = {r.doc_id: r.n_tokens for r in textstats.token_count(docs_df).collect()}
    assert got[0] == 13
    assert got[3] == 3
    assert got[4] == 0 and got[5] == 0


def test_lang_id(spark, docs_df):
    got = {r.doc_id: r.lang_pred for r in textstats.lang_id(docs_df).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "fr"
    assert got[3] == "und" and got[4] == "und"


def test_quality_bounds_and_order(spark, docs_df):
    got = {r.doc_id: r.quality for r in textstats.quality_score(docs_df).collect()}
    assert all(q is None or 0.0 <= q <= 1.0 for q in got.values())
    # stopword-rich clean English beats punctuation soup
    assert got[0] > got[6]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello, World!"), (1, "hello world"), (2, "HELLO   world...")],
        schema="doc_id long, text string",
    )
    fps = {r.doc_id: r.fp for r in textstats.fingerprint(df).collect()}
    assert fps[0] == fps[1] == fps[2]
    assert len(fps[0]) == 32


def test_edge_ngram_tokens(spark):
    df = spark.createDataFrame(
        [(0, "spark io a"), (1, ""), (2, "spark spark")],
        schema="doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_grams
        for r in textstats.edge_ngram_tokens(df, lo=2, hi=4).collect()
    }
    # doc 0: spark → sp,spa,spar; io → io; a → a (short passthrough) = 5 unique
    assert got[0] == 5
    assert got[1] == 0
    assert got[2] == 3  # unique filter dedups the repeat


def test_prefix_search(spark, docs_df):
    got = {r.doc_id: r.n_hits for r in textstats.prefix_search(docs_df, "ca").collect()}
    assert got[0] == 1  # "cat"
    assert got[1] == 1  # "calle"
    assert 2 not in got  # no ca* token ("chat" starts with "ch")


def test_phrase_search(spark):
    df = spark.createDataFrame(
        [
            (0, "The CAT sat on the mat"),
            (1, "cat sat elsewhere"),
            (2, "the cat. Sat! yes"),  # punctuation-normalized match
            (3, "sat cat the"),  # right tokens, wrong order
            (4, "cat x sat"),  # not consecutive
        ],
        schema="doc_id long, text string",
    )
    got = {r.doc_id: r.pos for r in textstats.phrase_search(df, "Cat, SAT").collect()}
    assert set(got) == {0, 1, 2}
    assert got[1] == 1  # phrase at stream start → offset of leading space +1
    assert got[0] > 1


def test_term_freq_topn(spark, docs_df):
    rows = textstats.term_freq_topn(docs_df, 3).collect()
    assert rows[0].term == "la"  # 3 occurrences (es ×2, fr ×1)
    assert rows[0].n_occurrences == 3 and rows[0].n_docs == 2


def test_pii_scrub(spark):
    df = spark.createDataFrame(
        [
            (0, "mail john.doe+x@foo.co or ops@a.b.example.org, host 10.1.2.3, call +44 20 7946 0958"),
            (1, "digit-heavy email a12345678901@x.com only"),
            (2, "nothing sensitive here"),
        ],
        schema="doc_id long, text string",
    )
    got = {r.doc_id: r for r in textstats.pii_scrub(df).collect()}
    assert got[0].n_email == 2 and got[0].n_ip == 1 and got[0].n_phone == 1
    assert got[0].scrubbed == "mail [EMAIL] or [EMAIL], host [IP], call [PHONE]"
    # the email's digit run must not be double-counted as a phone
    assert got[1].n_email == 1 and got[1].n_phone == 0
    assert got[1].scrubbed == "digit-heavy email [EMAIL] only"
    assert got[2].scrubbed == "nothing sensitive here"
    assert got[2].n_email == got[2].n_ip == got[2].n_phone == 0


def test_gopher_quality(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
            (1, "spam spam spam spam spam spam spam spam spam ham filler words here"),
            (2, "tiny doc"),
            (3, "one two three four five six seven eight nine ten\none two three four five six seven eight nine ten\nunique line"),
        ],
        schema="doc_id long, text string",
    )
    got = {r.doc_id: r for r in textstats.gopher_quality(df).collect()}
    assert got[0].n_tokens == 12 and got[0].keep  # clean doc passes
    assert got[1].top_unigram_frac > 0.2 and not got[1].keep  # repetition fails
    assert got[2].n_tokens < 10 and not got[2].keep  # too short
    # duplicate line: 3 non-empty lines, 2 distinct -> dup_frac 1/3 > 0.3
    assert abs(got[3].dup_line_frac - round(1 / 3, 4)) < 1e-9 and not got[3].keep
    # mean word length is exact: sum(len)/n
    toks0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu".split()
    assert got[0].mean_word_len == round(sum(map(len, toks0)) / len(toks0), 4)


def test_quality_top_percent(spark):
    import math

    rows = [(i, "en" if i % 2 else "fr", f"word " * (5 + (i * 13) % 60) + ("!!!" * (i % 4))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    q = {r.doc_id: r.quality for r in textstats.quality_score(df).collect()}
    got = textstats.quality_top_percent(df, p=0.4, by=("lang",)).collect()
    # brute-force per group
    want = {}
    for lang in ("en", "fr"):
        members = sorted(
            ((i, l) for i, l, _t in rows if l == lang),
            key=lambda x: (-q[x[0]], x[0]),
        )
        keep = math.ceil(0.4 * len(members))
        for rank, (i, _l) in enumerate(members[:keep], 1):
            want[i] = (lang, q[i], rank)
    assert {r.doc_id: (r.lang, r.quality, r.q_rank) for r in got} == want
    # groups are filtered independently (both survive)
    assert {r.lang for r in got} == {"en", "fr"}
    # global variant (no by): top 25% of all docs
    g = textstats.quality_top_percent(df, p=0.25).collect()
    assert len(g) == math.ceil(0.25 * 40)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        textstats.quality_top_percent(df, p=0.0)
