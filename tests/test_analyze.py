import pandas as pd

from mysql_es_spark.functions.analyze import (
    edge_ngrams,
    fold_text,
    tokenize_series,
    tokenize_text,
)


def test_fold_basic():
    assert fold_text("CAFÉ") == "cafe"
    assert fold_text("naïve Über") == "naive uber"
    assert fold_text("déjà-vu") == "deja-vu"


def test_tokenize_golden():
    # standard tokenize → lowercase → asciifold (template.json T2 contract)
    assert tokenize_text("Hello, World! 42") == ["hello", "world", "42"]
    assert tokenize_text("Résumé RÉSUMÉ resume") == ["resume", "resume", "resume"]
    assert tokenize_text("") == []
    assert tokenize_text(None) == []
    assert tokenize_text("  \t\n ") == []
    assert tokenize_text("a-b_c.d") == ["a", "b", "c", "d"]


def test_tokenize_series_matches_scalar():
    texts = pd.Series(["Hello World", "CAFÉ déjà", None, "", "w1 w2 w1"])
    out = tokenize_series(texts)
    assert out.tolist() == [
        ["hello", "world"],
        ["cafe", "deja"],
        [],
        [],
        ["w1", "w2", "w1"],
    ]


def test_edge_ngrams():
    # edge_ngram(2..25) + unique filter (template.json:30-36)
    assert edge_ngrams(["spark"], 2, 25) == ["sp", "spa", "spar", "spark"]
    assert edge_ngrams(["a"], 2, 25) == ["a"]  # short token passes through
    assert edge_ngrams(["ab", "ab"], 2, 25) == ["ab"]  # unique
    assert edge_ngrams(["abcdef"], 2, 3) == ["ab", "abc"]


def test_edge_ngram_series():
    out = tokenize_series(pd.Series(["spark sql"]), edge_ngram=True, ngram_min=2, ngram_max=3)
    assert out.tolist() == [["sp", "spa", "sq", "sql"]]
