"""ES|QL subset compiler: pipe semantics vs hand-built DataFrame ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.functions.esql import EsqlError, esql


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        (1, "en", "web", 100, ["a", "b"]),
        (2, "en", "book", 250, ["c"]),
        (3, "fr", "web", 50, []),
        (4, "fr", "web", 300, None),
        (5, "de", "book", 80, ["d", "e", "f"]),
        (6, None, "web", 10, ["g"]),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long, tags array<string>"
    )


def test_where_eval_keep_sort_limit(spark, tdf):
    out = esql(
        """FROM docs
           | WHERE n_chars >= 50 AND source == "web"
           | EVAL kb = n_chars / 100.0, label = concat(lang, "-", source)
           | KEEP doc_id, kb, label
           | SORT kb DESC, doc_id ASC
           | LIMIT 2""",
        {"docs": tdf},
    )
    got = [(r.doc_id, r.kb, r.label) for r in out.collect()]
    assert got == [(4, 3.0, "fr-web"), (1, 1.0, "en-web")]


def test_stats_by_matches_groupby(spark, tdf):
    out = esql(
        "FROM docs | STATS n = COUNT(*), total = SUM(n_chars), top = MAX(n_chars) BY lang"
        " | SORT lang",
        {"docs": tdf},
    ).collect()
    want = (
        tdf.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("total"),
            F.max("n_chars").alias("top"),
        )
        .orderBy(F.col("lang").asc_nulls_last())
        .collect()
    )
    assert [tuple(r) for r in out] == [tuple(r) for r in want]


def test_stats_global_and_by_expression(spark, tdf):
    row = esql(
        "FROM docs | STATS m = MEDIAN(n_chars), d = COUNT_DISTINCT(source)",
        {"docs": tdf},
    ).collect()[0]
    assert row.m == 90.0 and row.d == 2
    byexpr = esql(
        "FROM docs | STATS n = COUNT(*) BY big = n_chars >= 100 | SORT big NULLS FIRST",
        {"docs": tdf},
    ).collect()
    assert [(r.big, r.n) for r in byexpr] == [(False, 3), (True, 3)]


def test_sort_nulls_are_largest_by_default(spark, tdf):
    asc = [r.lang for r in esql("FROM docs | SORT lang, doc_id", {"docs": tdf}).collect()]
    assert asc[-1] is None  # ES|QL: null > any value → last on ASC
    desc = [r.lang for r in esql("FROM docs | SORT lang DESC, doc_id", {"docs": tdf}).collect()]
    assert desc[0] is None


def test_keep_drop_wildcards_and_rename(spark, tdf):
    out = esql(
        "FROM docs | RENAME n_chars AS nc | KEEP doc_*, n*", {"docs": tdf}
    )
    assert out.columns == ["doc_id", "nc"]
    out2 = esql("FROM docs | DROP t*, source", {"docs": tdf})
    assert out2.columns == ["doc_id", "lang", "n_chars"]


def test_mv_expand_null_keeps_row(spark, tdf):
    out = esql(
        "FROM docs | MV_EXPAND tags | KEEP doc_id, tags | SORT doc_id, tags",
        {"docs": tdf},
    ).collect()
    got = [(r.doc_id, r.tags) for r in out]
    assert (4, None) in got and (3, None) in got  # null + empty both survive
    assert [t for d, t in got if d == 5] == ["d", "e", "f"]


def test_from_multiple_tables_null_pads(spark, tdf):
    extra = tdf.sparkSession.createDataFrame([(7, "es")], "doc_id long, lang string")
    out = esql("FROM docs, extra | STATS n = COUNT(*)", {"docs": tdf, "extra": extra})
    assert out.collect()[0].n == 7


def test_row_source(spark, tdf):
    out = esql('ROW a = 1, b = "x" | EVAL c = a + 1', {}, spark=spark).collect()
    assert [tuple(r) for r in out] == [(1, "x", 2)]


def test_eval_sequential_references(spark, tdf):
    out = esql(
        "FROM docs | EVAL a = n_chars * 2, b = a + 1 | KEEP doc_id, b | SORT doc_id | LIMIT 1",
        {"docs": tdf},
    ).collect()
    assert out[0].b == 201


def test_validation_rejects(spark, tdf):
    with pytest.raises(EsqlError):
        esql("FROM docs | WHERE rand() > 0.5", {"docs": tdf})
    with pytest.raises(EsqlError):
        esql("FROM docs | EVAL x = (SELECT 1)", {"docs": tdf})
    with pytest.raises(EsqlError):
        esql("FROM docs | STATS x = FANCY_AGG(n_chars)", {"docs": tdf})
    with pytest.raises(EsqlError):
        esql("FROM nope | LIMIT 1", {"docs": tdf})
    with pytest.raises(EsqlError):
        esql("FROM docs | KEEP zz*", {"docs": tdf})
    with pytest.raises(EsqlError):
        esql("FROM docs | FROBNICATE x", {"docs": tdf})


def test_pipe_chars_inside_strings_survive(spark, tdf):
    out = esql(
        'FROM docs | EVAL s = concat(source, "|", lang) | KEEP s | SORT s | LIMIT 1',
        {"docs": tdf},
    ).collect()
    assert out[0].s == "book-de".replace("-", "|")


def test_single_plan_pushdown(spark, tdf, tmp_path):
    from tests.test_plan_audits import plan_of

    p = str(tmp_path / "docs")
    tdf.write.parquet(p)
    df = tdf.sparkSession.read.parquet(p)
    out = esql(
        'FROM docs | WHERE source == "web" | KEEP doc_id, n_chars | SORT n_chars DESC | LIMIT 3',
        {"docs": df},
    )
    plan = plan_of(out)
    # filter reaches the scan; projection prunes to 3 columns; TakeOrdered
    assert "PushedFilters" in plan and "EqualTo(source,web)" in plan
    assert "TakeOrderedAndProject" in plan
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "tags" not in read and "lang" not in read


def test_enrich_attaches_lookup_columns(spark, tdf):
    lk = spark.createDataFrame(
        [("en", "English", 1), ("fr", "French", 2)], "code string, name string, pop long"
    )
    out = esql(
        "FROM docs | ENRICH langs ON lang WITH name | KEEP doc_id, lang, name | SORT doc_id",
        {"docs": tdf},
        enrich={"langs": (lk, "code")},
    ).collect()
    assert out[0].name == "English" and out[4].name is None  # de → no policy row
    with pytest.raises(EsqlError):
        esql("FROM docs | ENRICH nope ON lang", {"docs": tdf})
    with pytest.raises(EsqlError):
        esql(
            "FROM docs | ENRICH langs ON lang WITH missing",
            {"docs": tdf},
            enrich={"langs": (lk, "code")},
        )


def test_dissect_extracts_fields(spark):
    s = spark.createDataFrame(
        [("alpha beta:7 rest of it",), ("x y:2 z",)], "line string"
    )
    out = esql(
        'FROM t | DISSECT line "%{a} %{b}:%{n} %{tail}" | KEEP a, b, n, tail',
        {"t": s},
    ).collect()
    assert tuple(out[0]) == ("alpha", "beta", "7", "rest of it")
    assert tuple(out[1]) == ("x", "y", "2", "z")
    with pytest.raises(EsqlError):
        esql('FROM t | DISSECT line "no fields"', {"t": s})


def test_match_against_index(spark, built_index):
    from collections import Counter

    from mysql_es_spark.functions.analyze import tokenize_text
    from mysql_es_spark.functions.esql import esql_search

    fwd = spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    want = sorted(
        r.docid
        for r in fwd
        if {"w1", "w3"} & set(tokenize_text(r.text))
    )
    out = esql_search(
        'FROM ix | WHERE match(text, "w1 w3") | KEEP docid | SORT docid',
        spark,
        {"ix": built_index},
    ).collect()
    assert [r.docid for r in out] == want

    # AND-combined with a scalar conjunct
    want2 = sorted(
        r.docid for r in fwd if "w1" in tokenize_text(r.text) and r.docid % 2 == 0
    )
    out2 = esql_search(
        'FROM ix | WHERE match(text, "w1") AND docid % 2 == 0 | KEEP docid | SORT docid',
        spark,
        {"ix": built_index},
    ).collect()
    assert [r.docid for r in out2] == want2


def test_match_restrictions(spark, built_index, tdf):
    from mysql_es_spark.functions.esql import esql_search

    with pytest.raises(EsqlError, match="AND"):
        esql_search(
            'FROM ix | WHERE match(text, "w1") OR docid == 1',
            spark,
            {"ix": built_index},
        )
    with pytest.raises(EsqlError, match="resolver"):
        esql('FROM docs | WHERE match(lang, "en")', {"docs": tdf})
    # unknown-term query → empty, not an error
    from mysql_es_spark.functions.esql import esql_search as es

    assert (
        es(
            'FROM ix | WHERE match(text, "zzzznotaterm")',
            spark,
            {"ix": built_index},
        ).count()
        == 0
    )


def test_stats_where_per_agg_filter(spark, tdf):
    out = esql(
        """FROM docs
           | STATS n_all = COUNT(*),
                   n_web = COUNT(*) WHERE source == "web",
                   big = SUM(n_chars) WHERE n_chars >= 100,
                   srcs = COUNT_DISTINCT(source) WHERE n_chars > 40
           BY lang
           | SORT lang""",
        {"docs": tdf},
    ).collect()
    byl = {r.lang: r for r in out}
    assert byl["en"].n_all == 2 and byl["en"].n_web == 1
    assert byl["en"].big == 350 and byl["fr"].big == 300
    assert byl["fr"].srcs == 1  # both fr docs are web, one above 40 chars
    assert byl[None].n_web == 1 and byl[None].big is None
    with pytest.raises(EsqlError):
        esql("FROM docs | STATS n = COUNT(*) WHERE a WHERE b", {"docs": tdf})


def test_lookup_join(spark, tdf):
    lk = tdf.sparkSession.createDataFrame(
        [("en", "English"), ("fr", "French"), ("fr", "Francais")],
        "lang string, lname string",
    )
    out = esql(
        "FROM docs | LOOKUP JOIN langs ON lang | KEEP doc_id, lname | SORT doc_id, lname",
        {"docs": tdf, "langs": lk},
    ).collect()
    got = [(r.doc_id, r.lname) for r in out]
    # duplicate lookup keys multiply rows (doc 3 and 4 are fr)
    assert got.count((3, "French")) == 1 and got.count((3, "Francais")) == 1
    assert (5, None) in got and (6, None) in got  # de/null: no lookup row
    with pytest.raises(EsqlError):
        esql("FROM docs | LOOKUP JOIN nope ON lang", {"docs": tdf})
    with pytest.raises(EsqlError):
        esql("FROM docs | LOOKUP JOIN langs ON zz", {"docs": tdf, "langs": lk})


def test_change_point_command(spark):
    # a clean step: level 10 for 12 buckets then level 50
    rows = [(i, 10.0 + (40.0 if i >= 12 else 0.0) + (i % 3) * 0.1) for i in range(24)]
    s = spark.createDataFrame(rows, "b long, v double")
    out = esql("FROM t | CHANGE_POINT v ON b", {"t": s}).collect()
    assert len(out) == 1 and out[0].b == 12 and out[0].type == "step_up"
    # identical to the shared detector the agg uses
    from mysql_es_spark.operators.aggs import change_point_series

    direct = change_point_series(s, "v", "b").collect()[0]
    assert (out[0].b, out[0].stat, out[0].type) == (direct.b, direct.stat, direct.type)
    with pytest.raises(EsqlError):
        esql("FROM t | CHANGE_POINT nope ON b", {"t": s})


def test_fork_branches_union_with_discriminator(spark, tdf):
    out = esql(
        """FROM docs
           | FORK (WHERE source == "web" | STATS n = COUNT(*))
                  (STATS n = COUNT(*) BY lang | SORT lang | LIMIT 2)
           | KEEP _fork, lang, n
           | SORT _fork, lang""",
        {"docs": tdf},
    ).collect()
    got = [(r._fork, r.lang, r.n) for r in out]
    assert got[0] == ("fork1", None, 4)  # branch 1 has no lang → null-padded
    assert [(f, l) for f, l, _ in got[1:]] == [("fork2", "de"), ("fork2", "en")]
    with pytest.raises(EsqlError):
        esql("FROM docs | FORK (LIMIT 1)", {"docs": tdf})
    with pytest.raises(EsqlError):
        esql("FROM docs | FORK (LIMIT 1) junk (LIMIT 2)", {"docs": tdf})


def test_fork_inherits_current_frame_not_source(spark, tdf):
    out = esql(
        """FROM docs
           | WHERE n_chars >= 100
           | FORK (STATS n = COUNT(*)) (STATS m = MAX(n_chars))""",
        {"docs": tdf},
    ).collect()
    by = {r._fork: r for r in out}
    assert by["fork1"].n == 3  # the WHERE upstream of FORK applies to branches
    assert by["fork2"].m == 300


def test_inlinestats_attaches_without_collapsing(spark, tdf):
    out = esql(
        """FROM docs
           | INLINESTATS mx = MAX(n_chars), n = COUNT(*) BY source
           | EVAL frac = n_chars / mx
           | KEEP doc_id, source, mx, n, frac
           | SORT doc_id""",
        {"docs": tdf},
    ).collect()
    assert len(out) == 6  # row count preserved
    web = [r for r in out if r.source == "web"]
    assert all(r.mx == 300 and r.n == 4 for r in web)
    assert next(r for r in out if r.doc_id == 4).frac == 1.0
    # global (no BY) + per-agg WHERE
    g = esql(
        'FROM docs | INLINESTATS total = SUM(n_chars) WHERE source == "web" | LIMIT 1',
        {"docs": tdf},
    ).collect()[0]
    assert g.total == 460
    # DISTINCT works globally (broadcast agg path) but not over a window
    with pytest.raises(EsqlError, match="window"):
        esql("FROM docs | INLINESTATS d = COUNT_DISTINCT(source) BY lang", {"docs": tdf})


def test_sample_deterministic_threshold(spark):
    rows = [(i, f"txt{i}") for i in range(2000)]
    s = spark.createDataFrame(rows, "id long, t string")
    a = esql("FROM x | SAMPLE 0.25", {"x": s}).count()
    b = esql("FROM x | SAMPLE 0.25", {"x": s}).count()
    assert a == b  # content-hash: identical across runs
    assert 0.15 * 2000 < a < 0.35 * 2000
    sub = {r.id for r in esql("FROM x | SAMPLE 0.25 | KEEP id", {"x": s}).collect()}
    sup = {r.id for r in esql("FROM x | SAMPLE 0.5 | KEEP id", {"x": s}).collect()}
    assert sub <= sup  # thresholds nest
    assert esql("FROM x | SAMPLE 0", {"x": s}).count() == 0
    assert esql("FROM x | SAMPLE 1.0", {"x": s}).count() == 2000
    with pytest.raises(EsqlError):
        esql("FROM x | SAMPLE 2.5", {"x": s})


def test_inlinestats_global_is_broadcast_not_single_partition(spark, tdf, tmp_path):
    from tests.test_plan_audits import plan_of

    p = str(tmp_path / "g")
    tdf.write.parquet(p)
    df = tdf.sparkSession.read.parquet(p)
    out = esql("FROM t | INLINESTATS total = SUM(n_chars)", {"t": df})
    plan = plan_of(out)
    assert "Window" not in plan  # no empty-partition window funnel
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # and COUNT_DISTINCT works globally (window path must reject it)
    g = esql(
        "FROM t | INLINESTATS d = COUNT_DISTINCT(source) | LIMIT 1", {"t": df}
    ).collect()[0]
    assert g.d == 2


def test_metadata_score_matches_bm25(spark, built_index):
    from mysql_es_spark.functions.esql import esql_search
    from mysql_es_spark.operators.query import bm25_topk

    out = esql_search(
        'FROM ix METADATA _score | WHERE match(text, "w0 w3") '
        "| KEEP docid, _score | SORT _score DESC, docid | LIMIT 8",
        spark,
        {"ix": built_index},
    ).collect()
    want = bm25_topk(spark, built_index, "w0 w3", k=8, mode="simple").collect()
    assert [(r.docid, round(r._score, 9)) for r in out] == [
        (r.docid, round(r.score, 9)) for r in want
    ]
    # scalar conjuncts compose with scoring
    half = esql_search(
        'FROM ix METADATA _score | WHERE match(text, "w0") AND docid % 2 == 0 '
        "| KEEP docid, _score | SORT _score DESC, docid | LIMIT 5",
        spark,
        {"ix": built_index},
    ).collect()
    assert all(r.docid % 2 == 0 and r._score > 0 for r in half)
    with pytest.raises(EsqlError, match="_score"):
        esql_search(
            "FROM ix METADATA _index | LIMIT 1", spark, {"ix": built_index}
        )


def test_metadata_score_without_match_is_zero(spark, built_index):
    """ES|QL: _score exists from FROM onward, 0 for unscored rows — a
    pipe with METADATA _score and no match() (or scalar-only WHERE)
    must not fail on KEEP/SORT _score."""
    from mysql_es_spark.functions.esql import esql_search

    out = esql_search(
        "FROM ix METADATA _score | WHERE docid % 2 == 0 "
        "| KEEP docid, _score | SORT _score DESC, docid | LIMIT 4",
        spark,
        {"ix": built_index},
    ).collect()
    assert len(out) == 4
    assert all(r._score == 0.0 for r in out)


def test_percentile_takes_0_to_100(spark, tdf):
    """ES|QL PERCENTILE(field, p) takes p in 0–100 (Spark wants 0–1)."""
    row = esql(
        "FROM docs | STATS p50 = PERCENTILE(n_chars, 50), p95 = PERCENTILE(n_chars, 95)",
        {"docs": tdf},
    ).collect()[0]
    want = tdf.agg(
        F.expr("percentile(n_chars, 0.5)").alias("p50"),
        F.expr("percentile(n_chars, 0.95)").alias("p95"),
    ).collect()[0]
    assert (row.p50, row.p95) == (want.p50, want.p95)


def test_enrich_and_lookup_override_same_named_columns(spark, tdf):
    lk = spark.createDataFrame(
        [("en", 111), ("fr", 222)], "lang string, n_chars long"  # collides
    )
    out = esql(
        "FROM docs | LOOKUP JOIN langs ON lang | KEEP doc_id, n_chars | SORT doc_id",
        {"docs": tdf, "langs": lk},
    ).collect()
    assert out[0].n_chars == 111  # lookup side wins, no ambiguity
    assert out[4].n_chars is None  # de: no lookup row → null, not the original
    out2 = esql(
        "FROM docs | ENRICH pol ON lang WITH n_chars | KEEP doc_id, n_chars | SORT doc_id",
        {"docs": tdf},
        enrich={"pol": (lk, "lang")},
    ).collect()
    assert out2[0].n_chars == 111 and out2[4].n_chars is None


def test_bucket_function(spark):
    from datetime import datetime, timedelta

    rows = [
        (i, datetime(2024, 3, 1) + timedelta(hours=7 * i), float(i % 37))
        for i in range(100)
    ]
    s = spark.createDataFrame(rows, "id long, ts timestamp, v double")
    out = esql(
        "FROM t | STATS n = COUNT(*) BY day = BUCKET(ts, 1 day) | SORT day",
        {"t": s},
    ).collect()
    want = (
        s.groupBy(F.date_trunc("DAY", "ts").alias("day"))
        .count()
        .orderBy("day")
        .collect()
    )
    assert [(r.day, r.n) for r in out] == [(r.day, r["count"]) for r in want]

    num = esql(
        "FROM t | STATS n = COUNT(*) BY b = BUCKET(v, 10) | SORT b", {"t": s}
    ).collect()
    assert [r.b for r in num] == [0.0, 10.0, 20.0, 30.0]
    assert sum(r.n for r in num) == 100

    with pytest.raises(EsqlError, match="calendar-unit"):
        esql("FROM t | STATS n = COUNT(*) BY b = BUCKET(ts, 6 hours)", {"t": s})


def test_to_conversion_functions(spark, tdf):
    out = esql(
        'FROM docs | EVAL s = TO_STRING(n_chars), d = TO_DOUBLE(n_chars), '
        "i = TO_LONG(doc_id) | KEEP s, d, i | SORT i | LIMIT 1",
        {"docs": tdf},
    ).collect()[0]
    assert out.s == "100" and out.d == 100.0 and out.i == 1
    assert [f.dataType.simpleString() for f in esql(
        "FROM docs | EVAL x = TO_INT(n_chars) | KEEP x", {"docs": tdf}
    ).schema.fields] == ["int"]


# ---------------------------------------------------------------------------
# round-3 function tail: MV_*, date functions, CIDR_MATCH, GROK,
# WEIGHTED_AVG / STD_DEV / TOP (VERDICT r2 next-round #4/#5)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mvdf(spark):
    rows = [
        (1, [3.0, 1.0, 2.0, 1.0], "10.1.2.3", "2024-03-05 10:30:00"),
        (2, [5.0], "192.168.1.77", "2024-03-06 23:59:59"),
        (3, [], "172.16.0.9", "2024-03-07 00:00:01"),
        (4, None, "8.8.8.8", "2024-04-01 12:00:00"),
    ]
    df = spark.createDataFrame(rows, "id long, vals array<double>, ip string, tss string")
    return df.withColumn("ts", F.to_timestamp("tss")).drop("tss")


def test_mv_functions(spark, mvdf):
    out = esql(
        """FROM t
           | EVAL c = MV_COUNT(vals), mn = MV_MIN(vals), mx = MV_MAX(vals),
                  s = MV_SUM(vals), a = MV_AVG(vals), md = MV_MEDIAN(vals),
                  f = MV_FIRST(MV_SORT(vals, "DESC")), l = MV_LAST(MV_SORT(vals)),
                  d = MV_COUNT(MV_DEDUPE(vals))
           | KEEP id, c, mn, mx, s, a, md, f, l, d
           | SORT id""",
        {"t": mvdf},
    )
    rows = {r.id: r for r in out.collect()}
    r1 = rows[1]
    assert (r1.c, r1.mn, r1.mx, r1.s, r1.a, r1.d) == (4, 1.0, 3.0, 7.0, 1.75, 3)
    assert r1.md == 1.5  # sorted [1,1,2,3] → (1+2)/2
    assert (r1.f, r1.l) == (3.0, 3.0)
    assert (rows[2].c, rows[2].md, rows[2].a) == (1, 5.0, 5.0)
    assert (rows[3].c, rows[3].s, rows[3].a) == (0, 0.0, None)  # empty array
    assert rows[4].c is None  # null multivalue → null count (ES contract)


def test_mv_concat_and_unsupported(spark, tdf):
    out = esql(
        'FROM d | WHERE tags IS NOT NULL AND MV_COUNT(tags) > 1 '
        '| EVAL j = MV_CONCAT(tags, "-") | KEEP doc_id, j | SORT doc_id',
        {"d": tdf},
    )
    assert [(r.doc_id, r.j) for r in out.collect()] == [(1, "a-b"), (5, "d-e-f")]
    with pytest.raises(EsqlError, match="MV_ZIP"):
        esql("FROM d | EVAL z = MV_ZIP(tags, tags)", {"d": tdf})
    with pytest.raises(EsqlError, match="MV_SORT"):
        esql('FROM d | EVAL z = MV_SORT(tags, "sideways")', {"d": tdf})


def test_date_functions_es_argument_order(spark, mvdf):
    out = esql(
        """FROM t
           | EVAL day = DATE_FORMAT("yyyy-MM-dd", ts),
                  back = DATE_PARSE("yyyy-MM-dd", day),
                  hrs = DATE_DIFF("hours", TO_TIMESTAMP("2024-03-05 00:00:00"), ts),
                  yr = DATE_EXTRACT("year", ts),
                  mon = DATE_EXTRACT("month", ts)
           | KEEP id, day, back, hrs, yr, mon | SORT id""",
        {"t": mvdf},
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].day == "2024-03-05" and rows[1].hrs == 10
    assert str(rows[1].back) == "2024-03-05 00:00:00"
    assert rows[2].hrs == 47  # 23:59:59 next day → 47 complete hours
    assert rows[3].hrs == 48
    assert (rows[4].yr, rows[4].mon) == (2024.0, 4.0)
    with pytest.raises(EsqlError, match="unit"):
        esql('FROM t | EVAL x = DATE_DIFF("fortnights", ts, ts)', {"t": mvdf})


def test_cidr_match(spark, mvdf):
    out = esql(
        'FROM t | WHERE CIDR_MATCH(ip, "10.0.0.0/8", "172.16.0.0/12") | KEEP id | SORT id',
        {"t": mvdf},
    )
    assert [r.id for r in out.collect()] == [1, 3]
    with pytest.raises(EsqlError, match="IPv4"):
        esql('FROM t | WHERE CIDR_MATCH(ip, "::1/128")', {"t": mvdf})
    with pytest.raises(EsqlError, match="literal"):
        esql("FROM t | WHERE CIDR_MATCH(ip, id)", {"t": mvdf})


def test_stats_weighted_avg_stddev_top(spark):
    df = spark.range(0).sparkSession.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, 3.0), ("a", 10.0, 0.0), ("b", 4.0, 2.0)],
        "k string, v double, w double",
    )
    out = esql(
        """FROM t
           | STATS wa = WEIGHTED_AVG(v, w), sd = STD_DEV(v),
                   t2 = TOP(v, 2, "desc"), b2 = TOP(v, 2, "asc")
             BY k | SORT k""",
        {"t": df},
    )
    rows = {r.k: r for r in out.collect()}
    assert rows["a"].wa == (1.0 * 1 + 2.0 * 3 + 10.0 * 0) / 4.0  # zero weight kept, value*0
    assert rows["a"].t2 == [10.0, 2.0] and rows["a"].b2 == [1.0, 2.0]
    assert rows["b"].sd == 0.0
    import math

    assert math.isclose(rows["a"].sd, math.sqrt(((1 - 13 / 3) ** 2 + (2 - 13 / 3) ** 2 + (10 - 13 / 3) ** 2) / 3))
    with pytest.raises(EsqlError, match="WEIGHTED_AVG"):
        esql("FROM t | STATS x = WEIGHTED_AVG(v) BY k", {"t": df})
    with pytest.raises(EsqlError, match="TOP"):
        esql('FROM t | STATS x = TOP(v, 2, "diagonal") BY k', {"t": df})


def test_grok_typed_captures_and_no_match(spark):
    df = spark.createDataFrame(
        [
            (1, '10.0.0.1 - GET /idx.html 1234 INFO "ua"'),
            (2, '192.168.7.9 - POST /api/v1 77 ERROR "x"'),
            (3, "not a log line at all"),
        ],
        "id long, line string",
    )
    out = esql(
        'FROM t | GROK line "%{IP:cip} - %{WORD:verb} %{URIPATH:path} '
        '%{INT:bytes:long} %{LOGLEVEL:lvl} %{QUOTEDSTRING:ua}" | SORT id',
        {"t": df},
    )
    rows = {r.id: r for r in out.collect()}
    assert (rows[1].cip, rows[1].verb, rows[1].bytes, rows[1].lvl) == ("10.0.0.1", "GET", 1234, "INFO")
    assert rows[2].path == "/api/v1" and rows[2].bytes == 77 and rows[2].ua == '"x"'
    assert rows[3].cip == "" and rows[3].bytes is None  # no match: "" strings, null typed
    with pytest.raises(EsqlError, match="unknown pattern"):
        esql('FROM t | GROK line "%{NOPE:x}"', {"t": df})
    with pytest.raises(EsqlError, match="conversion type"):
        esql('FROM t | GROK line "%{INT:x:decimal}"', {"t": df})
    with pytest.raises(EsqlError, match="no .*captures"):
        esql('FROM t | GROK line "%{INT} plain"', {"t": df})
