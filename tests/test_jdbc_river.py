"""JDBC river source (round 4, VERDICT r3 item 5): snapshot an RDBMS
over spark.read.jdbc into the forward table, diff snapshots for CDC, and
feed the existing incremental path. Fixture RDBMS is embedded Derby (on
Spark's classpath) — reference front door: mysql/Dumper.java:90-152
(bulk dump), MySql.java:370-414 (batched lookups), canal/Canal.java
:108-129 (binlog tail)."""

from __future__ import annotations

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.operators.query import bm25_topk, phrase_topk
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.sources.jdbc import (
    apply_derby_ops,
    derby_url,
    load_derby_fixture,
    read_snapshot,
    river_build,
    river_sync,
    snapshot_diff,
)

CFG = IndexConfig(n_buckets=2, wave_size=2, salt_docs=256, term_buckets=4, block_size=16)

ROWS = [
    (f"c{i:03d}", t, "user" if t % 2 == 0 else "assistant",
     f"turn {t} of conversation {i} about spark {'query engines' if i % 3 else 'posting lists'}",
     None if t % 3 else "search", "2026-01-01 00:00:00")
    for i in range(40)
    for t in range(3)
]


@pytest.fixture(scope="module")
def derby_db(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby") / "riverdb")
    n = load_derby_fixture(spark, db, ROWS)
    assert n == len(ROWS)
    return db


def _tops(spark, ix, q="spark posting", k=15):
    return [
        (r.docid, round(r.score, 6))
        for r in bm25_topk(spark, ix, q, k=k, cfg=CFG, mode="pruned").collect()
    ]


def test_snapshot_matches_source_rows(spark, derby_db):
    """Per-row text equality under stable (conv_id, turn_idx) ordering —
    the north-rule invariant, through the JDBC path."""
    snap = read_snapshot(spark, derby_url(derby_db), "transcripts")
    got = sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool) for r in snap.collect()
    )
    want = sorted((c, t, r, x, tl) for c, t, r, x, tl, _ in ROWS)
    assert got == want


def test_river_build_rank_identical_to_direct_build(spark, derby_db, tmp_path):
    """Index built through the JDBC river must answer queries exactly
    like one built from the same rows as a DataFrame."""
    ix_river = str(tmp_path / "ix_river")
    ix_direct = str(tmp_path / "ix_direct")
    m = river_build(spark, derby_url(derby_db), "transcripts", ix_river, CFG)
    assert m["river"]["table"] == "transcripts" and m["n_docs_built"] == len(ROWS)
    df = spark.createDataFrame(
        ROWS,
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).selectExpr(
        "conv_id", "turn_idx", "role", "text", "tool", "cast(ts as timestamp) ts"
    )
    build_index(spark, df, ix_direct, CFG)
    assert _tops(spark, ix_river) == _tops(spark, ix_direct)
    assert _tops(spark, ix_river, "query engines") == _tops(spark, ix_direct, "query engines")


def test_snapshot_diff_classifies_ops(spark, derby_db, tmp_path):
    ix = str(tmp_path / "ix")
    river_build(spark, derby_url(derby_db), "transcripts", ix, CFG)
    snap = read_snapshot(spark, derby_url(derby_db), "transcripts")
    ids, changes = snapshot_diff(spark, ix, snap)
    assert changes.count() == 0 and ids.count() == 0  # no drift yet
    # simulate drift WITHOUT touching the shared fixture: edit the frame
    from pyspark.sql import functions as F

    drifted = (
        snap.filter(~((F.col("conv_id") == "c000") & (F.col("turn_idx") == 2)))
        .withColumn(
            "text",
            F.when(
                (F.col("conv_id") == "c001") & (F.col("turn_idx") == 0),
                F.lit("rewritten text entirely"),
            ).otherwise(F.col("text")),
        )
        .unionByName(
            spark.createDataFrame(
                [("c999", 0, "user", "brand new conversation", None, None)],
                schema="conv_id string, turn_idx int, role string, "
                "text string, tool string, ts timestamp",
            )
        )
    )
    ids2, changes2 = snapshot_diff(spark, ix, drifted)
    ops = {(r.conv_id, r.turn_idx): r.op for r in changes2.collect()}
    assert ops == {
        ("c000", 2): "delete",
        ("c001", 0): "update",
        ("c999", 0): "insert",
    }
    assert {r.conv_id for r in ids2.collect()} == {"c000", "c001", "c999"}


def test_river_sync_end_to_end(spark, tmp_path):
    """Mutate the RDBMS (insert+update+delete), run river_sync, verify
    the index now answers exactly like a fresh build of the new state —
    and that a second sync is a no-op."""
    db = str(tmp_path / "db")
    load_derby_fixture(spark, db, ROWS)
    ix = str(tmp_path / "ix")
    river_build(spark, derby_url(db), "transcripts", ix, CFG)

    apply_derby_ops(
        spark, db,
        [
            ("insert", ("c900", 0, "user", "fresh spark conversation about indexes", None, "2026-02-01 00:00:00")),
            ("update", ("c001", 1, "assistant", "updated spark text with rare tokens", "search", "2026-02-01 00:00:00")),
            ("delete", ("c002", 0, None, None, None, None)),
        ],
    )
    res = river_sync(spark, ix, CFG)
    assert res["ops"] == {"insert": 1, "update": 1, "delete": 1}
    assert res["buckets"], res

    fresh_ix = str(tmp_path / "fresh")
    snap = read_snapshot(spark, derby_url(db), "transcripts")
    build_index(spark, snap, fresh_ix, CFG)
    for q in ("spark posting", "rare tokens", "fresh indexes"):
        assert _tops(spark, ix, q) == _tops(spark, fresh_ix, q), q

    res2 = river_sync(spark, ix, CFG)
    assert res2["ops"] == {} and res2["waves_rebuilt"] == []


def test_cli_build_with_jdbc_river(spark, tmp_path, capsys):
    """cli build --river with a jdbc section: end-to-end from a JDBC URL,
    then river-sync picks up a mutation."""
    import json

    from mysql_es_spark.cli import main as cli_main

    def run(argv):
        assert cli_main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    db = str(tmp_path / "db")
    load_derby_fixture(spark, db, ROWS)
    river_cfg = {
        "jdbc": {"url": derby_url(db), "table": "transcripts"},
        "index": {"n_buckets": 2, "wave_size": 2, "salt_docs": 256,
                  "term_buckets": 4, "block_size": 16},
    }
    rp = str(tmp_path / "river.json")
    with open(rp, "w") as f:
        json.dump(river_cfg, f)
    ix = str(tmp_path / "ix")
    out = run(["build", "--river", rp, "--index-dir", ix])
    assert out["n_docs_built"] == len(ROWS)
    hits = bm25_topk(spark, ix, "spark posting", k=5, cfg=CFG).collect()
    assert len(hits) == 5

    apply_derby_ops(
        spark, db,
        [("update", ("c003", 0, "user", "cli-sync sentinel text", None, "2026-03-01 00:00:00"))],
    )
    res = run(["river-sync", "--index-dir", ix])
    assert res["ops"] == {"update": 1}
    top = bm25_topk(spark, ix, "sentinel", k=3, cfg=CFG, with_keys=True).collect()
    assert [r.conv_id for r in top] == ["c003"]
