#!/usr/bin/env python3
"""Phase decomposition of ST28 stream_data_vault_ingest (r13 verdict
item 4: the key read ~1.8x over its r11 floor in BOTH driver runs on
unchanged code — attribute the cost before touching anything).

Replays the operator body verbatim (same fixture, same stream, same
merge) with a timer around each phase:

  fixture   — land the 3 wave files (coalesce(1) writes + moves)
  store0    — write the empty store
  stream    — start -> processAllAvailable -> stop (3 micro-batches),
              with the merge+write time INSIDE each foreachBatch call
              timed separately (epoch_merge), so stream - sum(epochs)
              is pure micro-batch machinery (trigger latency, file
              listing, offset/commit log writes)
  report    — final store read + groupBy + orderBy under a noop sink

Also records per-version store file counts and the last merge's
executed-plan exchange count. Usage: python profile_vault_ingest.py
[reps]   (sf dir from $SPARK_GRAFT_SF_DIR, default sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from proceso_de_etl_spark.session import get_spark  # noqa: E402
from proceso_de_etl_spark.sources.catalog import load_table  # noqa: E402
from proceso_de_etl_spark.streaming.cdc import (  # noqa: E402
    _CUTOFF,
    INGEST_SCHEMA,
    merge_vault_batch,
)


def one_run(spark, sf_dir: str) -> dict:
    from proceso_de_etl_spark.operators.etl import _dv_digest_col

    t: dict[str, float] = {}
    workdir = tempfile.mkdtemp(prefix="profile_dv_")
    try:
        landing = os.path.join(workdir, "landing")
        os.makedirs(landing)
        t0 = time.perf_counter()
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
        )
        cutoff = F.expr(_CUTOFF)
        base = orders.filter(F.col("o_orderdate") < cutoff)
        waves = [
            base.select(
                "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                F.lit(1).alias("wave"),
            ),
            base.filter(F.col("o_orderkey") % 7 == 0).select(
                "o_orderkey", "o_custkey",
                F.lit("U-REV").alias("o_orderstatus"),
                (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
                F.lit(2).alias("wave"),
            ),
            orders.filter(F.col("o_orderdate") >= cutoff).select(
                "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                F.lit(3).alias("wave"),
            ),
        ]
        for i, wv in enumerate(waves, 1):
            stage = os.path.join(workdir, f"_stage_{i}")
            wv.coalesce(1).write.parquet(stage)
            part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
            shutil.move(
                os.path.join(stage, part), os.path.join(landing, f"wave_{i}.parquet")
            )
            shutil.rmtree(stage)
        t["fixture"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        empty = spark.createDataFrame(
            [], "vault_table string, hk bigint, hd bigint, load_epoch int"
        )
        state = {"cur": os.path.join(workdir, "store_v0")}
        empty.write.parquet(state["cur"])
        t["store0"] = round(time.perf_counter() - t0, 3)

        stream = (
            spark.readStream.schema(INGEST_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(landing)
        )
        epoch_secs: list[float] = []
        store_files: list[int] = []
        plan_exchanges: list[int] = []

        def apply_batch(batch_df, epoch_id: int) -> None:
            te = time.perf_counter()
            sess = batch_df.sparkSession
            store = sess.read.parquet(state["cur"])
            nxt = os.path.join(workdir, f"store_v{epoch_id + 1}")
            merged = merge_vault_batch(store, batch_df)
            merged.write.mode("overwrite").parquet(nxt)
            state["cur"] = nxt
            epoch_secs.append(round(time.perf_counter() - te, 3))
            store_files.append(
                sum(1 for f in os.listdir(nxt) if f.endswith(".parquet"))
            )
            plan_exchanges.append(
                merged._jdf.queryExecution()
                .executedPlan()
                .toString()
                .count("Exchange hashpartitioning")
            )

        t0 = time.perf_counter()
        q = stream.writeStream.outputMode("update").foreachBatch(apply_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        t["stream_total"] = round(time.perf_counter() - t0, 3)
        t["epoch_merge"] = epoch_secs
        t["machinery"] = round(t["stream_total"] - sum(epoch_secs), 3)
        t["store_files_per_version"] = store_files
        t["merge_plan_exchanges"] = plan_exchanges

        t0 = time.perf_counter()
        (
            spark.read.parquet(state["cur"])
            .groupBy("vault_table", "load_epoch")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                _dv_digest_col("hk").alias("hk_digest"),
                _dv_digest_col("hd").alias("hd_digest"),
            )
            .orderBy("vault_table", "load_epoch")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        t["report"] = round(time.perf_counter() - t0, 3)
        t["total"] = round(
            t["fixture"] + t["store0"] + t["stream_total"] + t["report"], 3
        )
        return t
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_vault_ingest")
    # warmup outside the timed region (bench discipline)
    load_table(spark, sf_dir, "orders").write.mode("overwrite").format("noop").save()
    for rep in range(reps):
        print(json.dumps({"rep": rep, "sf_dir": sf_dir, **one_run(spark, sf_dir)}), flush=True)


if __name__ == "__main__":
    main()
