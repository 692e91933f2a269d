#!/usr/bin/env python3
"""Stage-timing decomposition for the two r11 scale watch items
(r11 verdict items 2-3): etl_data_vault_bridge and text_quality_score
at the derived sf1.0 / sf10 tiers, recorded into SCALE_r{N}.json under
"stage_timings" so the third-decade ratio has a per-stage explanation
next to it, not just a wall number.

Bridge stages (etl.py:2935): the operator is
  events(orders scan) -> eff agg -> join lineitem-distinct -> report agg.
Each probe times a prefix of that plan (forced via noop write), so
stage cost = prefix[i] - prefix[i-1] up to plan-reuse noise.

text_quality_score stages: the operator is a pure scan-side projection;
the probes split scan+tokenize from the regexp/stop-hit scoring.

Usage: python profile_bridge.py [round]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from proceso_de_etl_spark.session import get_spark  # noqa: E402
from proceso_de_etl_spark.sources.catalog import load_table  # noqa: E402
from proceso_de_etl_spark.functions.text import tokens  # noqa: E402
from proceso_de_etl_spark.operators import etl  # noqa: E402
from proceso_de_etl_spark.operators import text_analysis  # noqa: E402

DERIVED = "/tmp/spark_graft_derived/sf1.0"
DERIVED10 = "/tmp/spark_graft_derived/sf10"
REPS = 3


def _force(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def bridge_prefixes(spark, sf_dir):
    """Prefix plans of etl_data_vault_bridge, same constants/paths."""
    h60 = lambda col: F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast(  # noqa: E731
        "bigint"
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    open1 = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        F.lit(etl.DV_EFF_D1).cast("date").alias("event_date"),
    )
    open2 = orders.filter(F.col("o_orderkey") % etl.DV_EFF_MOD == 0).select(
        "o_orderkey",
        (F.col("o_custkey") + 1).alias("custkey"),
        F.lit(etl.DV_EFF_D2).cast("date").alias("event_date"),
    )
    events = open1.unionByName(open2)
    snaps = spark.createDataFrame(
        [(s,) for s in etl.DV_EFF_SNAPSHOTS], "snapshot_date string"
    ).select(F.col("snapshot_date").cast("date"))
    eff = (
        events.join(F.broadcast(snaps), F.col("event_date") <= F.col("snapshot_date"))
        .groupBy("snapshot_date", "o_orderkey")
        .agg(F.max_by("custkey", "event_date").alias("custkey"))
        # mirrors the shipped operator's r12 hoist (hash at eff rows)
        .withColumn("hk_customer", h60(F.concat(F.lit("c"), F.col("custkey"))))
    )
    li_distinct = lineitem.select(
        F.col("l_orderkey").alias("o_orderkey"), "l_partkey", "l_linenumber"
    ).distinct()
    paths = eff.join(li_distinct, "o_orderkey").select(
        "snapshot_date", "custkey", "o_orderkey", "l_partkey", "l_linenumber",
        "hk_customer",
    )
    bridge = paths.select(
        "snapshot_date",
        (F.col("o_orderkey") % etl.DV_EFF_MOD == 0).alias("is_reassigned"),
        h60(
            F.concat(
                F.lit("br"),
                F.col("custkey"),
                F.lit("|"),
                F.col("o_orderkey"),
                F.lit("|"),
                F.col("l_partkey"),
                F.lit("|"),
                F.col("l_linenumber"),
            )
        ).alias("hk"),
        h60(F.concat(F.lit("c"), F.col("custkey"))).alias("hk_customer"),
    )
    return {
        "1_eff_agg": eff,
        "2_lineitem_distinct": li_distinct,
        "3_paths_join": paths,
        "4_full_report": etl.QUERIES["etl_data_vault_bridge"](spark, sf_dir)
        if "etl_data_vault_bridge" in getattr(etl, "QUERIES", {})
        else bridge,  # fallback: hash projection only
    }


def tqs_prefixes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return {
        "1_scan_only": docs.select("doc_id", F.length("text").alias("n")),
        "2_scan_tokenize": docs.select("doc_id", F.size(toks).alias("n_toks")),
        "3_full_score": text_analysis.text_quality_score(spark, sf_dir),
    }


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    spark = get_spark(app_name="profile_bridge")
    out: dict[str, dict] = {}
    for sf, d in (("1.0", DERIVED), ("10", DERIVED10)):
        if not os.path.exists(os.path.join(d, "lineitem.parquet")):
            print(f"skip sf{sf}: derived data missing at {d}")
            continue
        for fam, plans in (
            ("etl_data_vault_bridge", bridge_prefixes(spark, d)),
            ("text_quality_score", tqs_prefixes(spark, d)),
        ):
            for stage, df in plans.items():
                xs = [_force(df) for _ in range(REPS)]
                med = sorted(xs)[(len(xs) - 1) // 2]
                out.setdefault(fam, {}).setdefault(f"sf{sf}", {})[stage] = {
                    "median_sec": med,
                    "samples": xs,
                }
                print(f"sf{sf} {fam} {stage}: {med}s {xs}", flush=True)
            spark.catalog.clearCache()
    path = f"SCALE_r{rnd:02d}.json"
    payload = json.load(open(path)) if os.path.exists(path) else {"curves": {}}
    payload["stage_timings"] = out
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps({"artifact": path, "stage_timing_families": list(out)}))


if __name__ == "__main__":
    main()
