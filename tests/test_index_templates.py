"""_index_template: pattern match, priority, composition, build wiring."""

from __future__ import annotations

import json

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.plans.index_templates import (
    config_for,
    put_component_template,
    put_index_template,
    resolve_index_template,
)


def test_pattern_priority_and_composition(tmp_path):
    repo = str(tmp_path / "tpl")
    put_component_template(repo, "phrases", {"with_positions": True})
    put_component_template(repo, "layout", {"term_buckets": 8, "block_size": 64})
    put_index_template(
        repo, "logs", ["logs-*"],
        settings={"n_buckets": 4},
        composed_of=["phrases", "layout"],
        priority=10,
    )
    put_index_template(repo, "catchall", ["*"], settings={"n_buckets": 2}, priority=0)

    eff = resolve_index_template(repo, "logs-2026.01")
    # components merge in order, template's own settings last
    assert eff == {
        "with_positions": True, "term_buckets": 8, "block_size": 64, "n_buckets": 4
    }
    assert resolve_index_template(repo, "other") == {"n_buckets": 2}
    assert resolve_index_template(str(tmp_path / "empty"), "x") is None

    cfg = config_for(repo, "logs-2026.01")
    assert cfg.with_positions and cfg.term_buckets == 8 and cfg.n_buckets == 4
    assert cfg.k1 == IndexConfig().k1  # untouched fields keep defaults


def test_component_override_order(tmp_path):
    repo = str(tmp_path / "tpl")
    put_component_template(repo, "a", {"block_size": 32})
    put_component_template(repo, "b", {"block_size": 256})
    put_index_template(repo, "t", ["x-*"], composed_of=["a", "b"])
    assert resolve_index_template(repo, "x-1")["block_size"] == 256  # later wins
    put_index_template(
        repo, "t", ["x-*"], settings={"block_size": 99}, composed_of=["a", "b"]
    )
    assert resolve_index_template(repo, "x-1")["block_size"] == 99  # own settings last


def test_equal_priority_overlap_rejected(tmp_path):
    repo = str(tmp_path / "tpl")
    put_index_template(repo, "t1", ["dup-*"], settings={"n_buckets": 2}, priority=5)
    put_index_template(repo, "t2", ["dup-*"], settings={"n_buckets": 4}, priority=5)
    with pytest.raises(ValueError, match="equal priority"):
        resolve_index_template(repo, "dup-1")


def test_validation(tmp_path):
    repo = str(tmp_path / "tpl")
    with pytest.raises(ValueError, match="unknown IndexConfig"):
        put_index_template(repo, "t", ["*"], settings={"shards": 5})
    with pytest.raises(ValueError, match="index_patterns"):
        put_index_template(repo, "t", [])
    with pytest.raises(ValueError, match="unknown component"):
        put_index_template(repo, "t", ["*"], composed_of=["ghost"])
    # synonyms arrive as JSON lists and normalize to tuples
    put_index_template(repo, "syn", ["s-*"], settings={"synonyms": ["car, auto"]})
    assert config_for(repo, "s-1").synonyms == ("car, auto",)


def test_cli_build_with_template_repo(spark, tmp_path, capsys):
    from mysql_es_spark.cli import main as cli_main
    from mysql_es_spark.operators.query import effective_config, phrase_topk

    repo = str(tmp_path / "tpl")
    put_index_template(
        repo, "convs", ["conv-*"],
        settings={"with_positions": True, "n_buckets": 4, "wave_size": 2,
                  "salt_docs": 256, "term_buckets": 8},
    )
    corpus = str(tmp_path / "corpus")
    assert cli_main(["gen", "--out", corpus, "--turns", "500", "--seed", "9"]) == 0
    capsys.readouterr()
    ix = str(tmp_path / "conv-main")
    assert (
        cli_main(
            ["build", "--input", f"{corpus}/transcripts", "--index-dir", ix,
             "--template-repo", repo]
        )
        == 0
    )
    capsys.readouterr()
    # the template's settings took effect AND persisted (self-describing)
    eff = effective_config(spark, ix, None)
    assert eff.with_positions and eff.n_buckets == 4 and eff.term_buckets == 8
    # positions really exist: a phrase query runs instead of raising
    phrase_topk(spark, ix, "w0 w1", k=3, cfg=eff).collect()
