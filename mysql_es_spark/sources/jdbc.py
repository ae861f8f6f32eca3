"""JDBC river — the reference's actual front door, Spark-first.

mysql-es's pipeline starts at a live MySQL: a bulk dump
(``mysql/Dumper.java:90-152`` shells mysqldump and parses INSERT rows),
batched primary-key lookups for relation enrichment
(``mysql/MySql.java:370-414``), then a binlog tail for change data
capture (``canal/Canal.java:108-129``). This module is the Spark-native
equivalent over any JDBC RDBMS:

- **Snapshot** (:func:`read_snapshot`): ``spark.read.jdbc`` with
  partitioned range reads — ``numPartitions`` concurrent connections
  each scanning a ``partitionColumn`` slice, the distributed analog of
  the reference's single mysqldump stream. Identifier case is
  normalized (Derby/Oracle upper-case their column names) and the frame
  is projected onto the transcript schema.
- **CDC without binlog access** (:func:`snapshot_diff`): the previous
  snapshot already lives in the index's forward table; a full-outer
  null-safe join against the new snapshot classifies every row as
  insert / update / delete. The changed conv_ids feed the existing
  incremental path (``streaming/incremental.py``), which rebuilds only
  affected buckets — or takes the posting-merge fast path for small
  update-only deltas. At 10^12 turns the diff is one co-partitioned
  join on (conv_id, turn_idx); with a real binlog/CDC feed (Debezium →
  files) the same ``incremental_update`` consumes it directly and this
  diff is skipped.
- **River config** (:func:`river_build` / :func:`river_sync`): the
  connection lives in the index directory (``river_jdbc.json``) exactly
  like the reference keeps its MySQL coordinates in ``etc/river.json``,
  so a later sync needs only the index path.

The tests and the driver gate use an embedded Derby database (on
Spark's classpath) as the RDBMS fixture; against a real MySQL only the
``url``/``driver`` options change.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from . import fsio

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = "turn_idx",
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """A snapshot scan of a transcripts-shaped JDBC table.

    With ``partition_column`` the scan issues ``num_partitions`` parallel
    range queries (bounds probed with one MIN/MAX query when not given —
    the reference's Dumper likewise scans the pk range first). Column
    names are case-normalized and projected onto the transcript schema;
    extra columns are dropped, missing optional columns (tool) become
    NULL — the same forgiving mapping the reference applies to river
    tables.

    NOT point-in-time consistent under concurrent writes: the parallel
    range queries run as independent transactions (unlike the
    reference's ``mysqldump --single-transaction``), and the frame is
    lazy — every downstream action re-executes the scan. river_sync
    therefore STAGES the snapshot to parquet once per tick, giving each
    tick one frozen view; rows that move between range queries within
    that single staging pass surface as changes on the next tick
    (at-least-once, converges — the same guarantee the incremental path
    gives everywhere else, ST2)."""
    def base():
        r = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("fetchsize", str(fetchsize))
        )
        return r.option("driver", driver) if driver else r

    reader = base().option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            probe = (
                base()
                .option(
                    "dbtable",
                    f"(SELECT MIN({partition_column}) AS mn, "
                    f"MAX({partition_column}) AS mx FROM {table}) bounds",
                )
                .load()
                .collect()[0]
            )
            lower_bound = probe["MN"] if "MN" in probe else probe["mn"]
            upper_bound = probe["MX"] if "MX" in probe else probe["mx"]
        if lower_bound is not None and upper_bound is not None:
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("numPartitions", str(num_partitions))
                .option("lowerBound", str(lower_bound))
                .option("upperBound", str(int(upper_bound) + 1))
            )
    df = reader.load()
    lower = {c.lower(): c for c in df.columns}
    missing = [c for c in ("conv_id", "turn_idx", "text") if c not in lower]
    if missing:
        raise ValueError(
            f"JDBC table {table!r} lacks required transcript columns {missing}; "
            f"found {sorted(lower)}"
        )
    cast = {
        "conv_id": "string", "turn_idx": "int", "role": "string",
        "text": "string", "tool": "string", "ts": "timestamp",
    }
    return df.select(
        *[
            (
                F.col(lower[c]).cast(cast[c]) if c in lower
                else F.lit(None).cast(cast[c])
            ).alias(c)
            for c in TRANSCRIPT_COLS
        ]
    )


def snapshot_diff(
    spark: SparkSession,
    index_dir: str,
    new_snapshot: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """(changed_conv_ids, changes) between the index's forward table (the
    previous snapshot) and ``new_snapshot``.

    ``changes`` carries (conv_id, turn_idx, op) with op in
    insert/update/delete — the row-event classification the reference
    gets from binlog entries (canal EntryType ROWDATA insert/update/
    delete). One full-outer join keyed on (conv_id, turn_idx); value
    comparison is null-safe over every transcript column, so flipping a
    tool to NULL is an update, not a no-op."""
    from . import tables as tbl

    old = tbl.read(spark, index_dir, "forward").select(*TRANSCRIPT_COLS)
    o = old.select([F.col(c).alias(f"o_{c}") for c in TRANSCRIPT_COLS])
    n = new_snapshot.select([F.col(c).alias(f"n_{c}") for c in TRANSCRIPT_COLS])
    j = o.join(
        n,
        (F.col("o_conv_id").eqNullSafe(F.col("n_conv_id")))
        & (F.col("o_turn_idx").eqNullSafe(F.col("n_turn_idx"))),
        "full_outer",
    )
    same_vals = None
    for c in ("role", "text", "tool", "ts"):
        eq = F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))
        same_vals = eq if same_vals is None else (same_vals & eq)
    op = (
        F.when(F.col("o_conv_id").isNull() & F.col("o_turn_idx").isNull(), "insert")
        .when(F.col("n_conv_id").isNull() & F.col("n_turn_idx").isNull(), "delete")
        .when(~same_vals, "update")
    )
    changes = (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            F.coalesce(F.col("n_conv_id"), F.col("o_conv_id")).alias("conv_id"),
            F.coalesce(F.col("n_turn_idx"), F.col("o_turn_idx")).alias("turn_idx"),
            "op",
        )
    )
    return changes.select("conv_id").distinct(), changes


def _river_meta_path(index_dir: str) -> str:
    return fsio.join(index_dir, "river_jdbc.json")


def river_build(
    spark: SparkSession,
    url: str,
    table: str,
    index_dir: str,
    cfg: IndexConfig | None = None,
    driver: str | None = None,
    resume: bool = False,
    **reader_kw,
) -> dict:
    """Full river bootstrap: JDBC snapshot → index build → persist the
    river coordinates (the reference's river.json "my" section) next to
    the index so :func:`river_sync` needs only the index path."""
    from ..plans.build import build_index

    cfg = cfg or IndexConfig()
    df = read_snapshot(spark, url, table, driver=driver, **reader_kw)
    metrics = build_index(spark, df, index_dir, cfg, resume=resume)
    fsio.write_text(
        _river_meta_path(index_dir),
        json.dumps({"url": url, "table": table, "driver": driver, **reader_kw}),
    )
    metrics["river"] = {"url": url, "table": table}
    return metrics


def river_sync(
    spark: SparkSession,
    index_dir: str,
    cfg: IndexConfig | None = None,
    batch_id: int = -1,
    merge: str = "auto",
) -> dict:
    """One CDC tick: fresh snapshot, diff against the forward table, feed
    the incremental path (bucket rebuild, or posting-merge for small
    update-only deltas). Idempotent — re-running after success diffs to
    zero changes and does nothing; re-running after a crash mid-rebuild
    rebuilds the same buckets (at-least-once, ST2)."""
    from ..streaming.incremental import incremental_update

    mp = _river_meta_path(index_dir)
    if not fsio.exists(mp):
        raise ValueError(f"{index_dir} was not built by river_build (no river_jdbc.json)")
    meta = json.loads(fsio.read_text(mp))
    snap = read_snapshot(
        spark, meta["url"], meta["table"], driver=meta.get("driver"),
        **{k: v for k, v in meta.items() if k not in ("url", "table", "driver")},
    )
    # stage the snapshot ONCE per tick: the JDBC frame is lazy and this
    # tick takes several actions (ops count, affected-bucket collect,
    # per-wave rebuilds) — re-executing the scan under concurrent RDBMS
    # writes would let the reported ops and the indexed state disagree
    # within one tick (round 5, ADVICE r4). One frozen view instead.
    from ..sources import tables as tbl

    stage = fsio.join(tbl.resolve(index_dir), "_riverstage")
    snap.write.mode("overwrite").parquet(stage)
    staged = spark.read.parquet(stage)
    changed_ids, changes = snapshot_diff(spark, index_dir, staged)
    ops = {r["op"]: r["n"] for r in changes.groupBy("op").agg(F.count("*").alias("n")).collect()}
    if not ops:
        fsio.rmtree(stage)
        return {"ops": {}, "waves_rebuilt": [], "buckets": []}
    res = incremental_update(
        spark, staged, changed_ids, index_dir, cfg, batch_id=batch_id, merge=merge
    )
    fsio.rmtree(stage)
    res["ops"] = ops
    return res


# ---------------------------------------------------------------------------
# embedded-Derby fixture (tests / driver gate / CLI examples)
# ---------------------------------------------------------------------------


def derby_url(db_dir: str, create: bool = False) -> str:
    return f"jdbc:derby:{db_dir}" + (";create=true" if create else "")


def load_derby_fixture(
    spark: SparkSession, db_dir: str, rows, table: str = "transcripts"
) -> int:
    """Create an embedded Derby database holding transcript ``rows``
    ((conv_id, turn_idx, role, text, tool, ts_str) tuples) — the RDBMS
    stand-in for the reference's MySQL in this sandbox. Derby ships on
    Spark's classpath, so no extra jars are needed on driver or
    executors."""
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(derby_url(db_dir, create=True))
    try:
        st = conn.createStatement()
        try:
            st.execute(f"DROP TABLE {table}")
        except Exception:
            pass  # first run: table does not exist yet
        st.execute(
            f"CREATE TABLE {table} (conv_id VARCHAR(64) NOT NULL, "
            "turn_idx INT NOT NULL, role VARCHAR(32), text VARCHAR(8000), "
            "tool VARCHAR(64), ts TIMESTAMP, PRIMARY KEY (conv_id, turn_idx))"
        )
        ps = conn.prepareStatement(f"INSERT INTO {table} VALUES (?,?,?,?,?,?)")
        n = 0
        for conv_id, turn_idx, role, text, tool, ts in rows:
            ps.setString(1, str(conv_id))
            ps.setInt(2, int(turn_idx))
            ps.setString(3, role)
            ps.setString(4, text)
            ps.setString(5, tool)
            if ts is None:
                ps.setTimestamp(6, None)
            else:
                ps.setTimestamp(6, jvm.java.sql.Timestamp.valueOf(str(ts)))
            ps.executeUpdate()
            n += 1
        conn.commit()
        return n
    finally:
        conn.close()


def apply_derby_ops(spark: SparkSession, db_dir: str, ops, table: str = "transcripts"):
    """Apply (op, row) mutations to the fixture — op in insert/update/
    delete, row = (conv_id, turn_idx, role, text, tool, ts_str). The
    test-side stand-in for writes hitting the production RDBMS between
    river syncs."""
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(derby_url(db_dir))
    try:
        for op, (conv_id, turn_idx, role, text, tool, ts) in ops:
            if op == "insert":
                ps = conn.prepareStatement(f"INSERT INTO {table} VALUES (?,?,?,?,?,?)")
                ps.setString(1, str(conv_id)); ps.setInt(2, int(turn_idx))
                ps.setString(3, role); ps.setString(4, text); ps.setString(5, tool)
                ps.setTimestamp(6, jvm.java.sql.Timestamp.valueOf(str(ts)) if ts else None)
            elif op == "update":
                ps = conn.prepareStatement(
                    f"UPDATE {table} SET role=?, text=?, tool=?, ts=? "
                    "WHERE conv_id=? AND turn_idx=?"
                )
                ps.setString(1, role); ps.setString(2, text); ps.setString(3, tool)
                ps.setTimestamp(4, jvm.java.sql.Timestamp.valueOf(str(ts)) if ts else None)
                ps.setString(5, str(conv_id)); ps.setInt(6, int(turn_idx))
            elif op == "delete":
                ps = conn.prepareStatement(
                    f"DELETE FROM {table} WHERE conv_id=? AND turn_idx=?"
                )
                ps.setString(1, str(conv_id)); ps.setInt(2, int(turn_idx))
            else:
                raise ValueError(f"unknown op {op!r}")
            ps.executeUpdate()
        conn.commit()
    finally:
        conn.close()
