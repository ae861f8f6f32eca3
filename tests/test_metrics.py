"""Durable metrics table (S13/ST8) — every wave build and incremental
batch appends queryable counters (the persisted analog of the
reference's Statistic + ReportAction log line)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from conftest import TEST_CFG
from mysql_es_spark import corpus
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.plans.metrics import metrics_summary, read_metrics
from mysql_es_spark.sources import tables as tbl
from mysql_es_spark.streaming.incremental import incremental_update


def test_metrics_build_and_incremental(spark, tmp_path):
    d = str(tmp_path / "ix")
    shutil.rmtree(d, ignore_errors=True)
    df = corpus.transcripts_df(spark, 600, seed=17)
    res = build_index(spark, df, d, TEST_CFG)

    m = read_metrics(spark, d)
    build_rows = m.filter(F.col("source") == "build")
    # one row per (wave, counter), every wave covered
    waves = {r.wave for r in build_rows.select("wave").distinct().collect()}
    assert waves == set(res["waves_run"])
    per_wave = {
        (r.wave, r.metric): r.value for r in build_rows.collect()
    }
    # docs_indexed totals must equal the lineage/docs built this run
    total_docs = sum(v for (w, k), v in per_wave.items() if k == "docs_indexed")
    assert total_docs == res["n_docs_built"]
    # counters agree with lineage rows wave by wave
    lineage = {
        r.wave: r for r in tbl.read(spark, d, "lineage").collect()
    }
    for w in waves:
        assert per_wave[(w, "docs_indexed")] == lineage[w].n_docs
        assert per_wave[(w, "postings_written")] == lineage[w].n_postings
        assert per_wave[(w, "blocks_written")] == lineage[w].n_blocks
        assert per_wave[(w, "wall_ms")] > 0
    # the corpus generator plants ~2% empty + ~0.5% null texts -> the
    # data-quality counter must be non-zero somewhere
    assert sum(v for (w, k), v in per_wave.items() if k == "empty_docs") > 0

    # incremental batch appends under its own source + batch id
    changed = df.select("conv_id").distinct().limit(3)
    inc = incremental_update(spark, df, changed, d, TEST_CFG, batch_id=17, merge="never")
    assert inc["waves_rebuilt"]
    inc_rows = read_metrics(spark, d).filter(F.col("source") == "incremental")
    got = inc_rows.select("batch_id").distinct().collect()
    assert [r.batch_id for r in got] == [17]
    inc_waves = {r.wave for r in inc_rows.select("wave").distinct().collect()}
    assert inc_waves == set(inc["waves_rebuilt"])

    # summary = ReportAction shape: cumulative totals by source/metric
    summ = {
        (r.source, r.metric): r.total for r in metrics_summary(spark, d).collect()
    }
    assert summ[("build", "docs_indexed")] == res["n_docs_built"]
    assert ("incremental", "docs_indexed") in summ

    # an update-only batch through the posting-merge fast path reports
    # under source='merge' with its own batch id
    v2 = df.withColumn(
        "text",
        F.when(
            F.col("conv_id").isin([r.conv_id for r in changed.collect()]),
            F.lit("metrics merge marker"),
        ).otherwise(F.col("text")),
    )
    mres = incremental_update(spark, v2, changed, d, TEST_CFG, batch_id=18)
    assert mres["mode"] == "posting_merge"
    mrows = read_metrics(spark, d).filter(F.col("source") == "merge")
    per = {r.metric: r.value for r in mrows.collect()}
    assert per["docs_updated"] == mres["docs_updated"]
    assert {r.batch_id for r in mrows.collect()} == {18}
