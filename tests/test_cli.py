"""CLI / spark-submit surface: gen → build --enrich → resume no-op → query.

The north rule requires the engine to run "via spark-submit --py-files";
`mysql_es_spark.cli` is that entry point (cli_submit.py is the submit
driver file). These tests drive the same code path in-process against the
session fixture's SparkSession (cli attaches to the active session).
"""

from __future__ import annotations

import json
import os
import zipfile

from mysql_es_spark.cli import main as cli_main


def test_cli_end_to_end(spark, tmp_path, capsys):
    corpus_dir = str(tmp_path / "corpus")
    ix = str(tmp_path / "ix")

    assert cli_main(["gen", "--out", corpus_dir, "--turns", "800", "--seed", "7"]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the generator targets ~n_turns via sampled conversation lengths;
    # actual count lands below the target
    assert meta["turns"] >= 400

    common = ["--n-buckets", "4", "--wave-size", "2", "--salt-docs", "256"]
    assert (
        cli_main(
            [
                *common,
                "build",
                "--input", f"{corpus_dir}/transcripts",
                "--index-dir", ix,
                "--enrich",
                "--conversations", f"{corpus_dir}/conversations",
                "--owners", f"{corpus_dir}/owners",
            ]
        )
        == 0
    )
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_docs_built"] == meta["turns"]
    assert built["waves_run"] == [0, 1]

    # resume over a completed build skips every wave (lineage-driven)
    assert (
        cli_main(
            [*common, "build", "--input", f"{corpus_dir}/transcripts",
             "--index-dir", ix, "--resume"]
        )
        == 0
    )
    resumed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resumed["waves_run"] == [] and resumed["waves_skipped"] == [0, 1]

    assert (
        cli_main(
            [*common, "query", "--index-dir", ix, "--query", "w1 w2 w10",
             "-k", "5", "--mode", "pruned"]
        )
        == 0
    )
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(q["hits"]) == 5
    scores = [h["score"] for h in q["hits"]]
    assert scores == sorted(scores, reverse=True)


def test_cli_positional_phrase(spark, tmp_path, capsys):
    corpus_dir = str(tmp_path / "corpus")
    ix = str(tmp_path / "pix")
    assert cli_main(["gen", "--out", corpus_dir, "--turns", "600", "--seed", "11"]) == 0
    capsys.readouterr()
    common = ["--n-buckets", "2", "--wave-size", "2", "--salt-docs", "256",
              "--with-positions"]
    assert (
        cli_main(
            [*common, "build", "--input", f"{corpus_dir}/transcripts",
             "--index-dir", ix]
        )
        == 0
    )
    capsys.readouterr()
    assert (
        cli_main(
            [*common, "query", "--index-dir", ix, "--query", "w0 w1",
             "-k", "5", "--mode", "phrase"]
        )
        == 0
    )
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert q["mode"] == "phrase"
    assert all("n_hits" in h and h["n_hits"] >= 1 for h in q["hits"])
    assert (
        cli_main(
            [*common, "query", "--index-dir", ix, "--query", "w0 w1",
             "-k", "5", "--mode", "conjunctive"]
        )
        == 0
    )
    c = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # every phrase match contains both terms ⇒ subset of conjunctive corpus;
    # identical BM25 scoring on shared docs
    conj = {h["docid"]: h["score"] for h in c["hits"]}
    for h in q["hits"]:
        if h["docid"] in conj:
            assert abs(conj[h["docid"]] - h["score"]) < 1e-9


def test_package_pyfiles(tmp_path):
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "package_pyfiles.py")],
        capture_output=True, text=True, check=True,
    )
    zpath = out.stdout.strip()
    with zipfile.ZipFile(zpath) as z:
        names = z.namelist()
    assert "mysql_es_spark/cli.py" in names
    assert "mysql_es_spark/plans/build.py" in names


def test_cli_compact_and_filter(spark, tmp_path, capsys):
    corpus_dir = str(tmp_path / "corpus")
    ix = str(tmp_path / "ix")
    dst = str(tmp_path / "ix_compact")
    common = ["--n-buckets", "4", "--wave-size", "2", "--salt-docs", "256"]

    assert cli_main(["gen", "--out", corpus_dir, "--turns", "600", "--seed", "13"]) == 0
    capsys.readouterr()
    assert (
        cli_main(
            [*common, "build", "--input", f"{corpus_dir}/transcripts", "--index-dir", ix]
        )
        == 0
    )
    capsys.readouterr()

    assert cli_main(["compact", "--index-dir", ix, "--out", dst]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["blocks_after"] <= st["blocks_before"] and st["n_docs"] > 0

    # compacted index answers, and the filter-context path works via CLI
    # (cfg comes from the index's persisted index_meta, no flags needed)
    assert (
        cli_main(
            ["query", "--index-dir", dst, "--query", "w0 w1", "-k", "5",
             "--filter", "role = 'assistant'", "--with-keys"]
        )
        == 0
    )
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < len(q["hits"]) <= 5
    scores = [h["score"] for h in q["hits"]]
    assert scores == sorted(scores, reverse=True)


def test_cli_delete_suggest_explain_aggs(spark, tmp_path, capsys):
    corpus_dir = str(tmp_path / "corpus2")
    ix = str(tmp_path / "ix2")
    common = ["--n-buckets", "4", "--wave-size", "2", "--salt-docs", "256"]
    assert cli_main(["gen", "--out", corpus_dir, "--turns", "600", "--seed", "11"]) == 0
    capsys.readouterr()
    assert (
        cli_main(
            [*common, "build", "--input", f"{corpus_dir}/transcripts", "--index-dir", ix]
        )
        == 0
    )
    capsys.readouterr()

    # aggs over the match set
    assert cli_main(["aggs", "--index-dir", ix, "--query", "w0 w3",
                     "--agg", "extended_stats"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_before = stats["buckets"][0]["n_docs"]
    assert n_before > 0

    # explain the top doc
    assert cli_main(["query", "--index-dir", ix, "--query", "w0 w3", "-k", "1"]) == 0
    hit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["hits"][0]
    assert cli_main(["explain", "--index-dir", ix, "--query", "w0 w3",
                     "--docid", str(hit["docid"])]) == 0
    exp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(exp["score"] - round(hit["score"], 6)) < 1e-4 and exp["terms"]

    # suggest
    assert cli_main(["suggest", "--index-dir", ix, "--text", "w00", "--max-edits", "1"]) == 0
    sugg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sugg["suggestions"]

    # delete docs containing w0; match count must shrink
    assert cli_main(["delete", "--index-dir", ix, "--query", "w0"]) == 0
    dele = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dele["docs_deleted"] > 0
    assert cli_main(["aggs", "--index-dir", ix, "--query", "w0 w3",
                     "--agg", "extended_stats"]) == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["buckets"][0]["n_docs"] < n_before

    # purge on compact drops them physically
    out = str(tmp_path / "ix2_compacted")
    assert cli_main(["compact", "--index-dir", ix, "--out", out]) == 0
    comp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert comp["docs_purged"] == dele["docs_deleted"]


def test_cli_reindex(spark, tmp_path, capsys):
    corpus_dir = str(tmp_path / "corpus3")
    ix = str(tmp_path / "ix3")
    out = str(tmp_path / "ix3_sub")
    common = ["--n-buckets", "4", "--wave-size", "2", "--salt-docs", "256"]
    assert cli_main(["gen", "--out", corpus_dir, "--turns", "500", "--seed", "3"]) == 0
    capsys.readouterr()
    assert cli_main([*common, "build", "--input", f"{corpus_dir}/transcripts",
                     "--index-dir", ix]) == 0
    capsys.readouterr()
    assert cli_main([*common, "--with-positions", "reindex", "--index-dir", ix,
                     "--out", out, "--query", "w0"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_selected"] > 0
    # phrase works on the re-settings'd destination
    assert cli_main(["query", "--index-dir", out, "--query", "w0 w1",
                     "--mode", "phrase", "-k", "3"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["hits"]
    assert isinstance(hits, list)


def test_cli_stats(spark, tmp_path, capsys):
    corpus_dir = str(tmp_path / "corpus4")
    ix = str(tmp_path / "ix4")
    common = ["--n-buckets", "4", "--wave-size", "2", "--salt-docs", "256"]
    assert cli_main(["gen", "--out", corpus_dir, "--turns", "400", "--seed", "5"]) == 0
    capsys.readouterr()
    assert cli_main([*common, "build", "--input", f"{corpus_dir}/transcripts",
                     "--index-dir", ix]) == 0
    capsys.readouterr()
    assert cli_main(["stats", "--index-dir", ix]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["n_docs"] > 0 and st["n_terms"] > 0 and st["postings_bytes"] > 0
    assert st["n_deleted"] == 0 and st["n_live"] == st["n_docs"]


def test_cli_snapshot_restore(spark, built_index, tmp_path, capsys):
    repo = str(tmp_path / "repo")
    dest = str(tmp_path / "restored")

    assert cli_main(["snapshot", "create", "--repo", repo, "--name", "s1",
                     "--index-dir", built_index]) == 0
    created = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert created["files"] > 0 and created["blobs_added"] > 0

    assert cli_main(["snapshot", "list", "--repo", repo]) == 0
    listed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [s["name"] for s in listed["snapshots"]] == ["s1"]

    assert cli_main(["snapshot", "restore", "--repo", repo, "--name", "s1",
                     "--index-dir", dest]) == 0
    restored = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert restored["files"] == created["files"]

    assert cli_main(["query", "--index-dir", dest, "--query", "w0 w3", "-k", "3"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(hits["hits"]) == 3


def test_cli_multifield_and_percolate(spark, tmp_path, capsys):
    corpus_dir = str(tmp_path / "corpus5")
    root = str(tmp_path / "mf5")
    common = ["--n-buckets", "4", "--wave-size", "2", "--salt-docs", "256"]
    assert cli_main(["gen", "--out", corpus_dir, "--turns", "400", "--seed", "9"]) == 0
    capsys.readouterr()

    assert cli_main([*common, "build-mf", "--input", f"{corpus_dir}/transcripts",
                     "--root", root, "--fields", "text:1.0,tool:2.0"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["fields"] == ["text", "tool"] and built["n_docs"] > 0

    assert cli_main(["query-mf", "--root", root, "--query", "w1 bash",
                     "--type", "cross_fields", "--tie-breaker", "0.3", "-k", "5"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(hits["hits"]) == 5
    scores = [h["score"] for h in hits["hits"]]
    assert scores == sorted(scores, reverse=True)

    qf = str(tmp_path / "watches.json")
    with open(qf, "w") as f:
        json.dump([{"id": "a", "query": "w0 w1", "mode": "all"},
                   {"id": "b", "query": "w9", "mode": "any"}], f)
    assert cli_main(["percolate", "--input", f"{corpus_dir}/transcripts",
                     "--queries", qf, "--id-col", "conv_id"]) == 0
    pm = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pm["matches"] and {m["query_id"] for m in pm["matches"]} == {"a", "b"}


def test_cli_validate(spark, built_index, capsys):
    assert cli_main(["validate", "--index-dir", built_index,
                     "--query", "Hello WORLD"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"valid": True, "explanation": "text:hello text:world"}
    # phrase on a positionless index is flagged without running anything
    assert cli_main(["validate", "--index-dir", built_index,
                     "--type", "match_phrase", "--query", "w0 w3"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["valid"] is False and "with_positions" in out["error"]
    assert cli_main(["validate", "--index-dir", built_index,
                     "--type", "query_string", "--query", "a AND (b OR"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["valid"] is False


def test_cli_analyze(capsys):
    assert cli_main(["analyze", "--text", "CafÉ Spark-SQL!"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tokens"] == ["cafe", "spark", "sql"]
    assert cli_main(["--edge-ngram", "analyze", "--text", "spark"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tokens"] == ["sp", "spa", "spar", "spark"]


def test_cli_river_config(spark, tmp_path, capsys):
    """Declarative river.json: index settings + withs enrichment folded
    into the searchable text (the reference's joined-column sync)."""
    corpus_dir = str(tmp_path / "corpus6")
    ix = str(tmp_path / "ix6")
    assert cli_main(["gen", "--out", corpus_dir, "--turns", "400", "--seed", "21"]) == 0
    capsys.readouterr()

    river = {
        "index": {"n_buckets": 4, "wave_size": 2, "salt_docs": 256},
        "base_table": "transcripts",
        "relations": {
            "transcripts": {
                "conv": {"table": "conversations", "local": "conv_id",
                         "foreign": "conv_id",
                         "columns": ["title", "channel", "owner_id"]}
            },
            "conversations": {
                "owner": {"table": "owners", "local": "owner_id",
                          "foreign": "owner_id", "columns": ["name", "org"]}
            },
        },
        "withs": ["conv", "conv.owner"],
        "tables": {
            "conversations": f"{corpus_dir}/conversations",
            "owners": f"{corpus_dir}/owners",
        },
        "index_extra_text": ["conv_owner_org"],
    }
    rf = str(tmp_path / "river.json")
    with open(rf, "w") as f:
        json.dump(river, f)

    assert cli_main(["build", "--input", f"{corpus_dir}/transcripts",
                     "--index-dir", ix, "--river", rf]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_buckets"] == 4 and built["n_docs_built"] > 0

    # an owner's org token is now SEARCHABLE on the turns it was joined to
    orgs = spark.read.parquet(f"{corpus_dir}/owners").select("org").limit(1).collect()
    org_token = orgs[0].org.lower()
    assert cli_main(["query", "--index-dir", ix, "--query", org_token, "-k", "5",
                     "--mode", "simple"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hits["hits"], f"org token {org_token!r} not searchable after river build"


def test_cli_update_by_query(spark, tmp_path, capsys):
    corpus_dir = str(tmp_path / "corpus_u")
    ix = str(tmp_path / "ixu")
    common = ["--n-buckets", "4", "--wave-size", "2", "--salt-docs", "256"]
    assert cli_main(["gen", "--out", corpus_dir, "--turns", "400", "--seed", "13"]) == 0
    capsys.readouterr()
    assert cli_main(
        [*common, "build", "--input", f"{corpus_dir}/transcripts", "--index-dir", ix]
    ) == 0
    capsys.readouterr()

    # scripted text update over the w2 match set, then the new term hits
    assert cli_main(
        ["update", "--index-dir", ix, "--query", "w2",
         "--set", "text=concat(text, ' cliupdated')"]
    ) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["docs_updated"] > 0
    assert res["waves_rebuilt"] or res.get("waves_merged")

    assert cli_main(["query", "--index-dir", ix, "--query", "cliupdated",
                     "-k", "5", "--mode", "simple"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["hits"]) == 5

    # regexp mode rides the same CLI
    assert cli_main(["query", "--index-dir", ix, "--query", "cliupd.*",
                     "-k", "3", "--mode", "regexp"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["hits"]) == 3


def test_cli_new_query_modes(spark, tmp_path, capsys):
    corpus_dir = str(tmp_path / "corpus")
    ix = str(tmp_path / "nix")
    assert cli_main(["gen", "--out", corpus_dir, "--turns", "500", "--seed", "23"]) == 0
    capsys.readouterr()
    common = ["--n-buckets", "2", "--wave-size", "2", "--salt-docs", "256"]
    assert (
        cli_main(
            [*common, "build", "--input", f"{corpus_dir}/transcripts",
             "--index-dir", ix]
        )
        == 0
    )
    capsys.readouterr()

    # simple_query_string syntax (lenient: must not error on junk)
    for qs in ["w0 + (w1 | w2)", "w0 (( -broken +"]:
        assert (
            cli_main([*common, "query", "--index-dir", ix, "--query", qs,
                      "-k", "3", "--mode", "sqs"])
            == 0
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["mode"] == "sqs"

    # constant_score: all scores equal
    assert (
        cli_main([*common, "query", "--index-dir", ix, "--query", "w0 w1",
                  "-k", "4", "--mode", "constant"])
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len({h["score"] for h in out["hits"]}) == 1

    # match_bool_prefix
    assert (
        cli_main([*common, "query", "--index-dir", ix, "--query", "w0 w",
                  "-k", "4", "--mode", "mbp"])
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["hits"]) == 4

    # min_score floor drops rows
    assert (
        cli_main([*common, "query", "--index-dir", ix, "--query", "w0 w1",
                  "-k", "50", "--min-score", "1000.0"])
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["hits"] == []

    # ids query by doc_key
    assert (
        cli_main([*common, "query", "--index-dir", ix, "--query", "ignored",
                  "--ids", "c00000000:0,c00000001:0,nope:9", "-k", "10", "--with-keys"])
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {h["doc_key"] for h in out["hits"]} == {"c00000000:0", "c00000001:0"}


def test_cli_sparse_vector_mode(spark, tmp_path, capsys):
    corpus_dir = str(tmp_path / "corpus")
    ix = str(tmp_path / "svix")
    assert cli_main(["gen", "--out", corpus_dir, "--turns", "400", "--seed", "7"]) == 0
    capsys.readouterr()
    common = ["--n-buckets", "2", "--wave-size", "2", "--salt-docs", "256"]
    assert (
        cli_main(
            [*common, "build", "--input", f"{corpus_dir}/transcripts",
             "--index-dir", ix]
        )
        == 0
    )
    capsys.readouterr()
    # weighted tokens ("term:weight", bare term → 1.0): heavy w1, light w2
    assert (
        cli_main(
            [*common, "query", "--index-dir", ix, "--query", "w1:3.5 w2:0.2 w9",
             "-k", "5", "--mode", "sv"]
        )
        == 0
    )
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert q["mode"] == "sv" and len(q["hits"]) == 5
    scores = [h["score"] for h in q["hits"]]
    assert scores == sorted(scores, reverse=True)


def test_cli_transform(spark, tmp_path, capsys):
    import datetime

    src = str(tmp_path / "ev")
    dest = str(tmp_path / "tdest")
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), i % 4, float(i)) for i in range(40)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    ).write.parquet(src)
    cfg = json.dumps(
        {
            "mode": "pivot",
            "group_by": ["user_id"],
            "aggs": {"n": "count(*)", "total": "sum(value)"},
            "sync_field": "ts",
            "n_parts": 4,
        }
    )
    assert (
        cli_main(["transform", "run", "--source", src, "--dest", dest, "--config", cfg])
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "full" and out["watermark"] is not None

    # tick with no new data is a no-op
    assert (
        cli_main(["transform", "tick", "--source", src, "--dest", dest, "--config", cfg])
        == 0
    )
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["mode"] == "noop"

    from mysql_es_spark.plans.transform import read_transform

    got = {(r.user_id, r.n) for r in read_transform(spark, dest).collect()}
    assert got == {(u, 10) for u in range(4)}


def test_cli_esql_eql_datastream(spark, tmp_path, capsys):
    import datetime

    # shared event table
    ev = str(tmp_path / "evsrc")
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i * 5), i % 3,
         ["view", "click", "purchase"][(i * 7 + i // 3) % 3])
        for i in range(60)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.parquet(ev)

    assert cli_main([
        "esql", "--query",
        'FROM t | WHERE event_type == "view" | STATS n = COUNT(*) BY user_id | SORT user_id',
        "--table", f"t={ev}",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["columns"] == ["user_id", "n"] and len(out["rows"]) == 3

    assert cli_main([
        "eql", "sequence", "--source", ev, "--by", "user_id",
        "--step", "event_type = 'view'", "--step", "event_type = 'purchase'",
        "--tiebreak", "event_id", "--maxspan", "3600",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["rows"]) > 0

    # datastream lifecycle through the CLI
    corpus = str(tmp_path / "dscorpus")
    assert cli_main(["gen", "--out", corpus, "--turns", "400", "--seed", "3"]) == 0
    capsys.readouterr()
    stream = str(tmp_path / "dsx")
    common = ["--n-buckets", "4", "--wave-size", "4", "--salt-docs", "256"]
    assert cli_main([*common, "datastream", "create", "--stream", stream]) == 0
    capsys.readouterr()
    assert cli_main([
        "datastream", "append", "--stream", stream,
        "--input", f"{corpus}/transcripts",
    ]) == 0
    capsys.readouterr()
    assert cli_main([
        "datastream", "search", "--stream", stream, "--query", "w0 w1", "-k", "5",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["hits"]) == 5
    scores = [h["score"] for h in out["hits"]]
    assert scores == sorted(scores, reverse=True)


def test_cli_datastream_forcemerge(spark, tmp_path, capsys):
    corpus = str(tmp_path / "fmc")
    assert cli_main(["gen", "--out", corpus, "--turns", "300", "--seed", "4"]) == 0
    capsys.readouterr()
    stream = str(tmp_path / "fms")
    common = ["--n-buckets", "4", "--wave-size", "4", "--salt-docs", "256"]
    assert cli_main([*common, "datastream", "create", "--stream", stream]) == 0
    capsys.readouterr()
    for _ in range(2):
        assert cli_main([
            "datastream", "append", "--stream", stream,
            "--input", f"{corpus}/transcripts",
        ]) == 0
        capsys.readouterr()
    # two identical appends → duplicates → error policy surfaces; last wins
    assert cli_main([
        "datastream", "append", "--stream", stream,
        "--input", f"{corpus}/transcripts",
    ]) == 0
    capsys.readouterr()
    out = None
    assert cli_main([
        "datastream", "forcemerge", "--stream", stream, "--on-dup", "last",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["merged"] == 3 and out["dup_policy"] == "last"
    assert cli_main([
        "datastream", "search", "--stream", stream, "--query", "w0", "-k", "3",
    ]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["hits"]
    assert len(hits) == 3
