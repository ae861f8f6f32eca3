"""_profile API: the execution breakdown must reflect the path actually
taken and never change the query result."""

from __future__ import annotations

from mysql_es_spark.operators.query import bm25_topk, profile_search
from tests.conftest import TEST_CFG

Q = "w0 w3"


def test_profile_pruned_driver_path(spark, built_index):
    prof = profile_search(spark, built_index, Q, k=5, cfg=TEST_CFG, mode="pruned")
    assert prof["path"] in ("pruned-driver", "pruned-distributed")
    assert prof["terms"] == ["w0", "w3"]
    assert prof["n_hits"] == 5 and len(prof["hits"]) == 5
    names = [p["name"] for p in prof["phases"]]
    if prof["path"] == "pruned-driver":
        assert names[0] == "block-metadata"
        assert prof["n_salts"] >= 1 and set(prof["df"]) == {"w0", "w3"}
        timed = [p for p in prof["phases"] if "wall_ms" in p]
        assert timed and all(p["wall_ms"] >= 0 for p in timed)
        assert prof["total_ms"] >= max(p["wall_ms"] for p in timed)
    # profiling must not perturb results
    plain = bm25_topk(spark, built_index, Q, k=5, cfg=TEST_CFG, mode="pruned").collect()
    assert prof["hits"] == [(r.docid, r.score) for r in plain]


def test_profile_simple_and_distributed(spark, built_index):
    prof = profile_search(spark, built_index, Q, k=5, cfg=TEST_CFG, mode="simple")
    assert prof["path"] == "simple" and prof["phases"][0]["lazy"]
    dcfg = TEST_CFG.with_(max_driver_salts=0)
    prof2 = profile_search(spark, built_index, Q, k=5, cfg=dcfg, mode="pruned")
    assert prof2["path"] == "pruned-distributed"
    assert prof["hits"] == prof2["hits"]


def test_profile_empty_query(spark, built_index):
    prof = profile_search(spark, built_index, "", k=5, cfg=TEST_CFG)
    assert prof["n_hits"] == 0 and prof["terms"] == []


def test_auto_mode_identity_and_choice(spark, built_index):
    """mode='auto' (round 4) picks simple vs pruned by Σ df from the
    term_meta job — results must be identical to both explicit modes on
    either side of the threshold, and the profile must record the
    choice."""
    for cf, want in [
        (TEST_CFG.with_(auto_pruned_min_postings=1 << 30), "simple"),
        (TEST_CFG.with_(auto_pruned_min_postings=0), "pruned"),
    ]:
        prof = {}
        got = bm25_topk(
            spark, built_index, Q, k=10, cfg=cf, mode="auto", profile=prof
        ).collect()
        assert prof["auto_chose"] == want and prof["auto_sum_df"] > 0
        for m in ("simple", "pruned"):
            ref = bm25_topk(spark, built_index, Q, k=10, cfg=cf, mode=m).collect()
            assert [tuple(r) for r in got] == [tuple(r) for r in ref], (want, m)
