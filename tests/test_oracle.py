import math

from mysql_es_spark.oracle import build_oracle_index, idf, score_query


def test_bm25_hand_computed():
    """Exact Lucene-default BM25 (k1=1.2, b=0.75) on a 3-doc corpus."""
    docs = [(0, "cat dog"), (1, "cat cat fish"), (2, "bird")]
    ix = build_oracle_index(docs)
    assert ix.n_docs == 3
    assert math.isclose(ix.avgdl, 2.0)
    # query "cat": df=2, idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    w = idf(3, 2)
    assert math.isclose(w, math.log(1.6), rel_tol=1e-12)
    # doc0: tf=1, dl=2 → tf_norm = 1/(1+1.2*(0.25+0.75*2/2)) = 1/2.2
    # doc1: tf=2, dl=3 → tf_norm = 2/(2+1.2*(0.25+0.75*3/2)) = 2/3.65
    got = dict(score_query(ix, "cat", 10))
    assert math.isclose(got[0], w * (1 / 2.2), rel_tol=1e-12)
    assert math.isclose(got[1], w * (2 / 3.65), rel_tol=1e-12)
    assert 2 not in got


def test_tie_break_docid_asc():
    docs = [(5, "x y"), (3, "x y"), (4, "z")]
    ranked = score_query(build_oracle_index(docs), "x", 10)
    assert [d for d, _ in ranked] == [3, 5]


def test_query_terms_deduped():
    docs = [(0, "a b"), (1, "a")]
    ix = build_oracle_index(docs)
    # "a a a" must score like "a" (search analyzer unique filter)
    assert score_query(ix, "a a a", 10) == score_query(ix, "a", 10)


def test_zero_token_docs_count_in_stats():
    docs = [(0, "a b c d"), (1, ""), (2, None)]
    ix = build_oracle_index(docs)
    assert ix.n_docs == 3
    assert math.isclose(ix.avgdl, 4 / 3)
