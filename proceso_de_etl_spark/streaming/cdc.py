"""Streaming CDC apply (SURVEY.md §2.5 + §2.1 E18 composed).

The batch twin ``operators/etl.py::etl_cdc_apply`` applies a whole
change feed in one pass; this job applies the SAME feed as it
*arrives* — one micro-batch per landed file — via a foreachBatch
merge into a persistent snapshot, the shape a production CDC
consumer runs forever (reference main.py:45-59 re-processes whole
files on every run; this is that loop done incrementally).

Correctness under streaming conditions comes from two properties of
the merge, not from delivery order:
- each change carries a monotone ``seq``; a change only wins against
  the snapshot when ``change.seq > snapshot.seq``, so replayed or
  out-of-order batches converge to the same state (idempotent
  upsert);
- deletes write TOMBSTONES (``deleted`` flag + seq) instead of
  removing rows, so a late lower-seq change cannot resurrect a
  deleted key. Readers filter tombstones out.

Scale: each micro-batch is one window (last change per key) + one
full-outer join against the snapshot — no per-event loop, no driver
state beyond the current-version pointer. On a cluster the snapshot
is a table (Delta/Iceberg MERGE); here it is a versioned parquet dir
with atomic rename promotion (sources/atomic.py's pattern).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from proceso_de_etl_spark.operators.etl import ORACLES as _ETL_ORACLES
from proceso_de_etl_spark.sources.catalog import load_table

ORACLES: dict[str, str] = {}

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("op", T.StringType()),
        T.StructField("seq", T.IntegerType()),
    ]
)

_CUTOFF = "TIMESTAMP '1999-01-01 00:00:00'"


def _change_feed(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, list[DataFrame]]:
    """(base snapshot, [change sets in seq order]) — the exact feed
    etl_cdc_apply synthesizes (etl.py::etl_cdc_apply), split into one
    DataFrame per sequence number so each lands as its own file."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    cutoff = F.expr(_CUTOFF)
    base = orders.filter(F.col("o_orderdate") < cutoff).drop("o_orderdate")
    inserts = orders.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.lit("I").alias("op"), F.lit(1).alias("seq"),
    )
    updates = base.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U-REV").alias("o_orderstatus"),
        (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
        F.lit("U").alias("op"), F.lit(2).alias("seq"),
    )
    deletes = base.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit("D").alias("op"), F.lit(3).alias("seq"),
    )
    return base, [inserts, updates, deletes]


def merge_cdc_batch(snapshot: DataFrame, changes: DataFrame) -> DataFrame:
    """One micro-batch merge: last change per key within the batch,
    then a seq-guarded full-outer upsert against the snapshot.
    Snapshot schema: (o_orderkey, o_orderstatus, o_totalprice,
    row_source, seq, deleted)."""
    w = W.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    last = (
        changes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("o_orderkey").alias("c_key"),
            F.col("o_orderstatus").alias("c_status"),
            F.col("o_totalprice").alias("c_price"),
            "op",
            F.col("seq").alias("c_seq"),
        )
    )
    merged = snapshot.join(last, snapshot.o_orderkey == last.c_key, "full_outer")
    change_wins = F.col("c_seq").isNotNull() & (
        F.col("c_seq") > F.coalesce(F.col("seq"), F.lit(-1))
    )
    return merged.select(
        F.coalesce(F.col("o_orderkey"), F.col("c_key")).alias("o_orderkey"),
        F.when(change_wins, F.col("c_status")).otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
        F.when(change_wins, F.col("c_price")).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        F.when(change_wins, F.col("op")).otherwise(F.col("row_source")).alias("row_source"),
        F.when(change_wins, F.col("c_seq")).otherwise(F.coalesce(F.col("seq"), F.lit(-1))).alias("seq"),
        F.when(change_wins, F.col("op") == "D")
        .otherwise(F.coalesce(F.col("deleted"), F.lit(False)))
        .alias("deleted"),
    )


def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query: land the three change sets as separate files,
    stream them one-file-per-trigger, merge each micro-batch into the
    versioned snapshot, return the final snapshot (tombstones
    filtered). Shares etl_cdc_apply's DuckDB oracle — the seq guard
    makes the final state independent of batch boundaries."""
    workdir = tempfile.mkdtemp(prefix="stream_cdc_")
    landing = os.path.join(workdir, "landing")
    os.makedirs(landing)

    base, change_sets = _change_feed(spark, sf_dir)
    snap0 = base.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.lit("base").alias("row_source"),
        F.lit(0).alias("seq"),
        F.lit(False).alias("deleted"),
    )
    state = {"cur": os.path.join(workdir, "snapshot_v0")}
    snap0.write.parquet(state["cur"])

    # land each change set as one plain parquet file (the file source
    # watches a flat dir; write-then-move keeps arrival atomic)
    for i, cs in enumerate(change_sets, 1):
        stage = os.path.join(workdir, f"_stage_{i}")
        cs.coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        shutil.move(os.path.join(stage, part), os.path.join(landing, f"changes_{i}.parquet"))
        shutil.rmtree(stage)

    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        snapshot = sess.read.parquet(state["cur"])
        nxt = os.path.join(workdir, f"snapshot_v{epoch_id + 1}")
        merge_cdc_batch(snapshot, batch_df).write.mode("overwrite").parquet(nxt)
        state["cur"] = nxt  # pointer flip = atomic promote

    q = stream.writeStream.outputMode("update").foreachBatch(apply_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    return (
        spark.read.parquet(state["cur"])
        .filter(~F.col("deleted"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "row_source")
    )


# Batch-boundary independence (the seq guard) means the streamed
# final state answers to the batch twin's oracle verbatim.
ORACLES["stream_cdc_apply"] = _ETL_ORACLES["etl_cdc_apply"]

QUERIES = {
    "stream_cdc_apply": stream_cdc_apply,
}
