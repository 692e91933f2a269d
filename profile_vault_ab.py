#!/usr/bin/env python3
"""A/B probe for ST28's per-epoch store touch (r12 verdict item 5):
the shipped pointer-flip PLAIN-PARQUET store (each epoch reads the
full store, full_outer-merges the micro-batch candidates, writes the
next version) versus a HASH-BUCKETED external-table store (S9
machinery: bucketBy on hk + sortBy, so the merge join reads store
buckets in place — no Exchange/Sort on the store side).

The probe measures EXACTLY the contested cost — the store read →
merge → write cycle — by feeding the three ST28 waves' candidate
frames straight into merge_vault_batch, no stream plumbing (the
FileStreamSource side is identical under both layouts and already
timed by the bench/scale entries). Both variants run the same merge
logic; the final stores are asserted digest-equal before any number
is recorded.

Results merge into SCALE_r{N}.json under "vault_ingest_ab" so the
verdict's 100-TB store-layout question has measured numbers beside
the curve, whatever they say.

Usage: python profile_vault_ab.py [round] [tier ...]
       tiers default to sf1.0 + sf10 (derived; generated on demand)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from proceso_de_etl_spark.session import get_spark  # noqa: E402
from proceso_de_etl_spark.sources.catalog import load_table  # noqa: E402
from proceso_de_etl_spark.streaming.cdc import (  # noqa: E402
    _CUTOFF,
    merge_vault_batch,
)

N_BUCKETS = 32

TIERS = {
    "1.0": "/tmp/spark_graft_derived/sf1.0",
    "10": "/tmp/spark_graft_derived/sf10",
}


def wave_frames(spark, sf_dir: str) -> list[DataFrame]:
    """The three ST28 feed waves, identical to the operator's fixture
    (streaming/cdc.py::stream_data_vault_ingest)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    cutoff = F.expr(_CUTOFF)
    base = orders.filter(F.col("o_orderdate") < cutoff)
    return [
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


def store_report(spark, read_store) -> list[tuple]:
    from proceso_de_etl_spark.operators.etl import _dv_digest_col

    return sorted(
        tuple(r)
        for r in read_store()
        .groupBy("vault_table", "load_epoch")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            _dv_digest_col("hk").alias("hk_digest"),
            _dv_digest_col("hd").alias("hd_digest"),
        )
        .collect()
    )


def run_plain(spark, waves, workdir: str, tag: str) -> tuple[list[float], list[tuple], int]:
    """Variant A — the shipped layout: versioned plain-parquet dirs.
    Returns (per-epoch walls, final report, #shuffle exchanges in the
    last epoch's executed merge plan)."""
    empty = spark.createDataFrame(
        [], "vault_table string, hk bigint, hd bigint, load_epoch int"
    )
    cur = os.path.join(workdir, f"plain_{tag}_v0")
    empty.write.parquet(cur)
    epochs: list[float] = []
    n_exchanges = -1
    for i, wv in enumerate(waves, 1):
        t0 = time.perf_counter()
        store = spark.read.parquet(cur)
        nxt = os.path.join(workdir, f"plain_{tag}_v{i}")
        merged = merge_vault_batch(store, wv)
        merged.write.mode("overwrite").parquet(nxt)
        cur = nxt
        epochs.append(round(time.perf_counter() - t0, 3))
        if i == len(waves):
            plan = merged._jdf.queryExecution().executedPlan().toString()
            n_exchanges = plan.count("Exchange hashpartitioning")
    return epochs, store_report(spark, lambda: spark.read.parquet(cur)), n_exchanges


def run_bucketed(spark, waves, workdir: str, tag: str) -> tuple[list[float], list[tuple], int]:
    """Variant B — hash-bucketed external tables (bucketBy hk, sorted):
    the merge join's store side scans buckets in place — verified
    plan shape: SortMergeJoin with ZERO Exchange above the bucketed
    FileScan, one Exchange on the candidate side only. Returns (per-epoch walls, final report, #shuffle
    exchanges in the last epoch's executed merge plan — compare with
    variant A's count to see the eliminated store-side exchange)."""
    empty = spark.createDataFrame(
        [], "vault_table string, hk bigint, hd bigint, load_epoch int"
    )

    def write_store(df: DataFrame, name: str) -> None:
        # bucket by the FULL merge key triple: Spark requires
        # co-partitioning on all join keys by default
        # (requireAllClusterKeysForCoPartition), so a subset bucket
        # spec (hk alone) still reshuffles both sides — probed r13
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.repartition(
                N_BUCKETS, F.col("vault_table"), F.col("hk"), F.col("hd")
            )
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, "vault_table", "hk", "hd")
            .sortBy("vault_table", "hk", "hd")
            .option("path", os.path.join(workdir, name))
            .format("parquet")
            .saveAsTable(name)
        )

    write_store(empty, f"bkt_{tag}_store_v0")
    cur = f"bkt_{tag}_store_v0"
    epochs: list[float] = []
    n_exchanges = -1
    for i, wv in enumerate(waves, 1):
        t0 = time.perf_counter()
        store = spark.table(cur)
        merged = merge_vault_batch(store, wv)
        nxt = f"bkt_{tag}_store_v{i}"
        write_store(merged, nxt)
        cur = nxt
        epochs.append(round(time.perf_counter() - t0, 3))
        if i == len(waves):
            plan = merged._jdf.queryExecution().executedPlan().toString()
            n_exchanges = plan.count("Exchange hashpartitioning")
    return epochs, store_report(spark, lambda: spark.table(cur)), n_exchanges


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    tiers = sys.argv[2:] or ["1.0", "10"]
    spark = get_spark(app_name="vault_ab")
    out: dict[str, dict] = {}
    for tier in tiers:
        sf_dir = TIERS[tier]
        if not os.path.exists(os.path.join(sf_dir, "orders.parquet")):
            raise SystemExit(f"derived tier missing: {sf_dir} (run scale_curve first)")
        workdir = tempfile.mkdtemp(prefix=f"vault_ab_{tier.replace('.', '_')}_")
        try:
            waves = wave_frames(spark, sf_dir)
            # warm the source scans once so neither variant pays the
            # cold page cache (the first-run-vs-second-run bias the
            # r12 notes flag); then ALTERNATE A/B twice and keep the
            # per-variant MIN total — same-instant box conditions
            for wv in waves:
                wv.write.mode("overwrite").format("noop").save()
            runs: dict[str, list] = {"plain": [], "bucketed": []}
            reports = {}
            nx = {}
            for rep in ("r0", "r1"):
                a_epochs, a_report, a_nx = run_plain(spark, waves, workdir, rep)
                b_epochs, b_report, b_nx = run_bucketed(spark, waves, workdir, rep)
                runs["plain"].append(a_epochs)
                runs["bucketed"].append(b_epochs)
                reports[rep] = (a_report, b_report)
                nx = {"plain": a_nx, "bucketed": b_nx}
            equal = all(a == b for a, b in reports.values()) and (
                reports["r0"][0] == reports["r1"][0]
            )
            tot = lambda es: round(sum(es), 3)  # noqa: E731
            out[tier] = {
                "plain_epoch_sec": runs["plain"],
                "plain_total_sec": min(tot(e) for e in runs["plain"]),
                "bucketed_epoch_sec": runs["bucketed"],
                "bucketed_total_sec": min(tot(e) for e in runs["bucketed"]),
                "merge_plan_exchanges": nx,
                "reports_equal": equal,
                "n_buckets": N_BUCKETS,
            }
            print(json.dumps({"tier": tier, **out[tier]}), flush=True)
            if not equal:
                raise SystemExit(f"tier {tier}: A/B reports diverge — bug, not a timing")
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
            for rep in ("r0", "r1"):
                for i in range(4):
                    spark.sql(f"DROP TABLE IF EXISTS bkt_{rep}_store_v{i}")
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"SCALE_r{rnd:02d}.json"
    )
    payload = json.load(open(path)) if os.path.exists(path) else {}
    payload.setdefault("vault_ingest_ab", {}).update(out)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps({"artifact": os.path.basename(path), "tiers": list(out)}))


if __name__ == "__main__":
    main()
