"""Posting-level incremental merge (small-CDC-batch fast path): an
update-only batch spliced into existing blocks must be indistinguishable
from a full rebuild — same tables, same ranks, same scores — and every
non-qualifying batch must fall back to the wave rebuild."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mysql_es_spark import corpus
from mysql_es_spark.config import IndexConfig
from mysql_es_spark.operators.query import bm25_topk, phrase_topk
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.streaming.incremental import incremental_update
from mysql_es_spark.streaming.posting_merge import MARKER, marker_buckets

CFG = IndexConfig(
    n_buckets=4, wave_size=2, salt_docs=256, term_buckets=8, block_size=64,
    with_positions=True,
)
UPD_CONVS = ["c00000002", "c00000009", "c00000014"]


def _fingerprints(spark, d):
    out = {}
    for table, cols in [
        ("forward", ["docid", "doc_key", "text"]),
        ("doc_lens", ["docid", "dl"]),
        ("term_dict", ["term", "df", "ttf"]),
        ("corpus_stats", ["n_docs", "sum_dl", "n_terms"]),
    ]:
        df = spark.read.parquet(f"{d}/{table}").select(*cols)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64(*cols), F.lit(2**31))).alias("h"),
        ).collect()[0]
        out[table] = (row["n"], row["h"])
    return out


def _results(spark, d, queries=("w0 w3", "w1", "w7 w11 w2")):
    out = []
    for q in queries:
        for mode in ("simple", "pruned"):
            rows = bm25_topk(spark, d, q, k=8, cfg=CFG, mode=mode).collect()
            out.append([(r["docid"], round(r["score"], 9)) for r in rows])
    rows = phrase_topk(spark, d, "w0 w1", k=8, cfg=CFG).collect()
    out.append([(r["docid"], round(r["score"], 9)) for r in rows])
    return out


@pytest.fixture(scope="module")
def snapshots(spark):
    v1 = corpus.transcripts_df(spark, 1500, seed=21).cache()
    # update-only change set: same (conv_id, turn_idx) keys, new text that
    # DROPS all original terms and ADDS fresh ones (exercises both the
    # mask-out and the splice-into-empty-group paths), with repeats so
    # positions/tf > 1 are covered
    upd = v1.filter(F.col("conv_id").isin(UPD_CONVS)).withColumn(
        "text",
        F.concat_ws(
            " ",
            F.lit("updx"),
            F.lit("updx"),
            F.concat(F.lit("uniq"), F.col("turn_idx").cast("string")),
            F.lit("w0"),
        ),
    )
    v2 = v1.filter(~F.col("conv_id").isin(UPD_CONVS)).unionByName(upd).cache()
    changed = v1.sparkSession.createDataFrame(
        [(c,) for c in UPD_CONVS], schema="conv_id string"
    )
    return v1, v2, changed


@pytest.fixture(scope="module")
def merged_and_full(spark, snapshots, tmp_path_factory):
    v1, v2, changed = snapshots
    root = tmp_path_factory.mktemp("pmerge")
    ix, full = str(root / "ix"), str(root / "full")
    build_index(spark, v1, ix, CFG)
    res = incremental_update(spark, v2, changed, ix, CFG, batch_id=7)
    build_index(spark, v2, full, CFG)
    return ix, full, res


def test_merge_path_taken(merged_and_full):
    _, _, res = merged_and_full
    assert res["mode"] == "posting_merge"
    assert res["docs_updated"] > 0 and res["buckets"]


def test_merge_equals_full_rebuild(spark, merged_and_full):
    ix, full, _ = merged_and_full
    assert _fingerprints(spark, ix) == _fingerprints(spark, full)


def test_merge_rank_and_score_identity(spark, merged_and_full):
    ix, full, _ = merged_and_full
    assert _results(spark, ix) == _results(spark, full)


def test_new_terms_searchable_old_terms_gone(spark, merged_and_full):
    ix, _, _ = merged_and_full
    hits = bm25_topk(spark, ix, "updx", k=50, cfg=CFG).collect()
    assert len(hits) > 0
    fwd = spark.read.parquet(f"{ix}/forward")
    n_upd = fwd.filter(F.col("conv_id").isin(UPD_CONVS)).count()
    assert len(hits) == n_upd  # every updated turn, nothing else


def test_replay_is_idempotent(spark, snapshots, merged_and_full):
    _, v2, changed = snapshots
    ix, full, _ = merged_and_full
    res = incremental_update(spark, v2, changed, ix, CFG, batch_id=8)
    assert res["mode"] == "posting_merge"
    assert _fingerprints(spark, ix) == _fingerprints(spark, full)


def test_insert_falls_back_to_rebuild(spark, snapshots, tmp_path):
    from datetime import datetime

    v1, _, _ = snapshots
    ix = str(tmp_path / "ix")
    build_index(spark, v1, ix, CFG)
    ins = v1.sparkSession.createDataFrame(
        [("c00000002", 99, "user", "a brand new turn", None, datetime(2026, 3, 1))],
        schema=corpus.TRANSCRIPT_SCHEMA,
    )
    v2 = v1.unionByName(ins)
    changed = v1.sparkSession.createDataFrame([("c00000002",)], schema="conv_id string")
    res = incremental_update(spark, v2, changed, ix, CFG)
    assert "mode" not in res and res["waves_rebuilt"]


def test_oversized_batch_falls_back(spark, snapshots, tmp_path):
    v1, v2, changed = snapshots
    ix = str(tmp_path / "ix")
    build_index(spark, v1, ix, CFG)
    res = incremental_update(spark, v2, changed, ix, CFG, merge_max_docs=1)
    assert "mode" not in res and res["waves_rebuilt"]


def test_merge_never_forces_rebuild(spark, snapshots, tmp_path):
    v1, v2, changed = snapshots
    ix = str(tmp_path / "ix")
    build_index(spark, v1, ix, CFG)
    res = incremental_update(spark, v2, changed, ix, CFG, merge="never")
    assert "mode" not in res and res["waves_rebuilt"]


def test_inflight_marker_heals_via_rebuild(spark, snapshots, tmp_path):
    """A marker left by an interrupted merge routes the NEXT update through
    the idempotent wave rebuild (covering the marker's buckets) and is
    cleared afterwards; results still equal a full rebuild."""
    v1, v2, changed = snapshots
    ix, full = str(tmp_path / "ix"), str(tmp_path / "full")
    build_index(spark, v1, ix, CFG)
    with open(os.path.join(ix, MARKER), "w") as fh:
        json.dump({"batch_id": 1, "buckets": [0]}, fh)
    assert marker_buckets(ix) == [0]
    res = incremental_update(spark, v2, changed, ix, CFG)
    assert "mode" not in res and res["waves_rebuilt"]
    assert 0 in res["buckets"]  # marker bucket folded into the rebuild set
    assert marker_buckets(ix) == []
    build_index(spark, v2, full, CFG)
    assert _fingerprints(spark, ix) == _fingerprints(spark, full)


def test_merge_revives_changed_deleted_doc_only(spark, snapshots, tmp_path):
    v1, v2, changed = snapshots
    ix = str(tmp_path / "ix")
    build_index(spark, v1, ix, CFG)
    fwd = spark.read.parquet(f"{ix}/forward")
    chg_id = int(
        fwd.filter(F.col("conv_id") == UPD_CONVS[0]).select("docid").head()["docid"]
    )
    other_id = int(
        fwd.filter(~F.col("conv_id").isin(UPD_CONVS)).select("docid").head()["docid"]
    )
    spark.createDataFrame([(chg_id,), (other_id,)], "docid long").write.mode(
        "overwrite"
    ).parquet(f"{ix}/deletes")
    res = incremental_update(spark, v2, changed, ix, CFG)
    assert res["mode"] == "posting_merge"
    left = {int(r["docid"]) for r in spark.read.parquet(f"{ix}/deletes").collect()}
    assert left == {other_id}  # re-indexed doc revived, unrelated mark kept


def test_merge_touches_only_affected_partitions(spark, snapshots, tmp_path):
    """Scale audit: the merge must rewrite only delta-proportional state —
    the untouched wave's forward/doc_lens dirs and every unaffected
    term_bucket partition keep their files byte-for-byte (mtime+size),
    proving directory pruning rather than a full-table rewrite."""
    v1, _, _ = snapshots
    ix = str(tmp_path / "ix")
    # wider term_buckets than CFG: one conversation's old vocabulary
    # (~30 distinct terms) must NOT cover every bucket, or the audit
    # can't distinguish pruning from a full rewrite
    cfg = IndexConfig(
        n_buckets=4, wave_size=2, salt_docs=256, term_buckets=64, block_size=64,
        with_positions=True,
    )
    build_index(spark, v1, ix, cfg)

    # single-conversation update → exactly one bucket/wave, few terms
    one = ["c00000002"]
    upd = v1.filter(F.col("conv_id").isin(one)).withColumn(
        "text", F.lit("solo0 solo1 solo2")
    )
    v2 = v1.filter(~F.col("conv_id").isin(one)).unionByName(upd)
    changed = v1.sparkSession.createDataFrame([(c,) for c in one], "conv_id string")

    def snap(d):
        out = {}
        for root, _dirs, files in os.walk(d):
            for f in files:
                p = os.path.join(root, f)
                st = os.stat(p)
                out[os.path.relpath(p, d)] = (st.st_mtime_ns, st.st_size)
        return out

    before = {t: snap(os.path.join(ix, t)) for t in ("forward", "doc_lens", "postings")}
    res = incremental_update(spark, v2, changed, ix, cfg)
    assert res["mode"] == "posting_merge"
    after = {t: snap(os.path.join(ix, t)) for t in ("forward", "doc_lens", "postings")}

    assert len(res["buckets"]) == 1
    wave = res["waves_merged"][0]
    for t in ("forward", "doc_lens"):
        untouched = {
            k: v for k, v in before[t].items() if not k.startswith(f"wave={wave}/")
        }
        assert untouched, "expected files outside the merged wave"
        assert all(after[t].get(k) == v for k, v in untouched.items()), (
            f"{t}: files outside wave={wave} were rewritten"
        )
    # postings: at least one term_bucket partition of the merged wave must
    # survive untouched (3 distinct new terms + a handful of old ones can't
    # cover all 8 term buckets), and every other wave entirely so
    same = [
        k for k, v in before["postings"].items() if after["postings"].get(k) == v
    ]
    assert any(k.startswith(f"wave={wave}/term_bucket=") for k in same), (
        "no term_bucket partition of the merged wave survived — merge is "
        "rewriting all postings instead of pruning to affected groups"
    )
    other_waves = {
        k: v for k, v in before["postings"].items() if not k.startswith(f"wave={wave}/")
    }
    assert all(after["postings"].get(k) == v for k, v in other_waves.items())
