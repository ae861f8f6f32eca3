"""ES intervals query: delegation identity with the span machinery
(match / all_of / any_of shapes), dis-max combination exactness, and
unsupported-shape validation."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.operators.query import (
    intervals_topk,
    phrase_synonym_topk,
    phrase_topk,
)
from mysql_es_spark.plans.build import build_index

CFG = IndexConfig(
    n_buckets=4, wave_size=2, salt_docs=64, term_buckets=4, block_size=4,
    with_positions=True,
)

DOCS = [
    ("c0", "fast table scan with fast index merge"),
    ("c1", "the fast table"),
    ("c2", "fast x table scan"),
    ("c3", "table fast scan"),
    ("c4", "fast merge now"),
    ("c5", "completely unrelated words here"),
    ("c6", "fast window stream"),
    ("c7", "scan fast table scan"),
]


@pytest.fixture(scope="module")
def ivix(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivix") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, CFG)
    return d


def _rows(df):
    return [(r.docid, round(r.score, 9)) for r in df.collect()]


def test_match_delegates_to_phrase(spark, ivix):
    rule = {"match": {"query": "fast table", "max_gaps": 1, "ordered": True}}
    got = _rows(intervals_topk(spark, ivix, rule, k=10, cfg=CFG))
    want = _rows(
        phrase_topk(spark, ivix, "fast table", k=10, cfg=CFG, slop=1).select(
            "docid", "score"
        )
    )
    assert got == want and got  # non-empty


def test_all_of_single_tokens(spark, ivix):
    rule = {
        "all_of": {
            "intervals": [
                {"match": {"query": "fast"}},
                {"match": {"query": "scan"}},
            ],
            "max_gaps": 2,
            "ordered": False,
        }
    }
    got = _rows(intervals_topk(spark, ivix, rule, k=10, cfg=CFG))
    want = _rows(
        phrase_topk(
            spark, ivix, "fast scan", k=10, cfg=CFG, slop=2, ordered=False
        ).select("docid", "score")
    )
    assert got == want and got


def test_all_of_with_any_of_synonym_graph(spark, ivix):
    rule = {
        "all_of": {
            "intervals": [
                {"match": {"query": "fast"}},
                {
                    "any_of": {
                        "intervals": [
                            {"match": {"query": "table"}},
                            {"match": {"query": "merge"}},
                        ]
                    }
                },
            ],
            "ordered": True,
        }
    }
    got = _rows(intervals_topk(spark, ivix, rule, k=10, cfg=CFG))
    want = _rows(
        phrase_synonym_topk(
            spark, ivix, ["fast", ["table", "merge"]], k=10, cfg=CFG
        ).select("docid", "score")
    )
    assert got == want and got


def test_any_of_dismax_union(spark, ivix):
    a = {"match": {"query": "fast table", "max_gaps": 0}}
    b = {"match": {"query": "fast window"}}
    got = _rows(intervals_topk(spark, ivix, {"any_of": {"intervals": [a, b]}}, k=10, cfg=CFG))
    sa = dict(_rows(phrase_topk(spark, ivix, "fast table", k=100, cfg=CFG).select("docid", "score")))
    sb = dict(_rows(phrase_topk(spark, ivix, "fast window", k=100, cfg=CFG).select("docid", "score")))
    comb = {d: max(sa.get(d, -math.inf), sb.get(d, -math.inf)) for d in set(sa) | set(sb)}
    want = sorted(comb.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert math.isclose(g, w, rel_tol=1e-12)


def test_unsupported_shapes_raise(spark, ivix):
    with pytest.raises(ValueError):
        intervals_topk(spark, ivix, {"nope": {}}, cfg=CFG)
    with pytest.raises(ValueError):
        intervals_topk(spark, ivix, {"all_of": {"intervals": []}}, cfg=CFG)
    with pytest.raises(ValueError):
        # any_of alternatives need the consecutive ordered form
        intervals_topk(
            spark,
            ivix,
            {
                "all_of": {
                    "intervals": [
                        {"match": {"query": "fast"}},
                        {"any_of": {"intervals": [{"match": {"query": "table"}}]}},
                    ],
                    "max_gaps": 1,
                }
            },
            cfg=CFG,
        )
    with pytest.raises(ValueError):
        intervals_topk(
            spark,
            ivix,
            {"all_of": {"intervals": [{"match": {"query": "fast table"}},
                                      {"any_of": {"intervals": [{"match": {"query": "x y"}}]}}]}},
            cfg=CFG,
        )


def test_prefix_source_top_level(spark, ivix):
    from mysql_es_spark.operators.query import prefix_topk

    got = _rows(intervals_topk(spark, ivix, {"prefix": {"prefix": "sc"}}, k=10, cfg=CFG))
    want = _rows(prefix_topk(spark, ivix, "sc", k=10, cfg=CFG))
    assert got == want and got


def test_prefix_source_inside_all_of(spark, ivix):
    rule = {
        "all_of": {
            "intervals": [
                {"match": {"query": "fast"}},
                {"prefix": {"prefix": "ta"}},
            ],
            "ordered": True,
        }
    }
    got = _rows(intervals_topk(spark, ivix, rule, k=10, cfg=CFG))
    # "ta*" expands to exactly {"table"} in this corpus's dictionary
    want = _rows(
        phrase_synonym_topk(spark, ivix, ["fast", ["table"]], k=10, cfg=CFG).select(
            "docid", "score"
        )
    )
    assert got == want and got
    # a prefix with zero dictionary expansions can never match
    dead = {
        "all_of": {
            "intervals": [
                {"match": {"query": "fast"}},
                {"prefix": {"prefix": "zzz"}},
            ],
            "ordered": True,
        }
    }
    assert intervals_topk(spark, ivix, dead, k=10, cfg=CFG).count() == 0


def test_wildcard_and_fuzzy_sources(spark, ivix):
    from mysql_es_spark.operators.query import fuzzy_topk, wildcard_topk

    got = _rows(intervals_topk(spark, ivix, {"wildcard": {"pattern": "sc?n"}}, k=10, cfg=CFG))
    want = _rows(wildcard_topk(spark, ivix, "sc?n", k=10, cfg=CFG))
    assert got == want and got

    # classic Levenshtein: tabel->table is 2 edits (no transposition credit)
    got = _rows(intervals_topk(
        spark, ivix, {"fuzzy": {"term": "tabel", "fuzziness": 2}}, k=10, cfg=CFG))
    want = _rows(fuzzy_topk(spark, ivix, "tabel", k=10, fuzziness=2, cfg=CFG))
    assert got == want and got

    # inside all_of: "fast" then any term matching wildcard "ta?le"
    rule = {
        "all_of": {
            "intervals": [
                {"match": {"query": "fast"}},
                {"wildcard": {"pattern": "ta?le"}},
            ],
            "ordered": True,
        }
    }
    got = _rows(intervals_topk(spark, ivix, rule, k=10, cfg=CFG))
    want = _rows(
        phrase_synonym_topk(spark, ivix, ["fast", ["table"]], k=10, cfg=CFG).select(
            "docid", "score"
        )
    )
    assert got == want and got

    # fuzzy slot: "merge" within 1 edit of "merg"
    rule = {
        "all_of": {
            "intervals": [
                {"match": {"query": "fast"}},
                {"fuzzy": {"term": "merg", "fuzziness": 1}},
            ],
            "ordered": True,
        }
    }
    got = _rows(intervals_topk(spark, ivix, rule, k=10, cfg=CFG))
    want = _rows(
        phrase_synonym_topk(spark, ivix, ["fast", ["merge"]], k=10, cfg=CFG).select(
            "docid", "score"
        )
    )
    assert got == want and got
