#!/usr/bin/env python3
"""Full oracle-sweep artifact (r8 verdict item 5): replay EVERY
oracle-paired ``queries()`` key against its DuckDB oracle at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) and write the per-key result
ledger as ``SWEEP_r{N}.json`` — the same row shape as the driver's
CORRECTNESS_r*.json, so the "every oracle green at sf0.1" claim is an
auditable artifact instead of a build-log sentence.

Comparison is the STRICT local gate (tests/oracle_harness.py):
row count, column names, and exact-repr canonicalized values — a pass
here implies a pass under any order-insensitive value hash.

Usage: python sweep.py [round_number]   (default: next after the
highest existing SWEEP_r*/CORRECTNESS_r* file)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

from proceso_de_etl_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from oracle_harness import canonicalize, duckdb_con  # noqa: E402

# release shared persists every RELEASE_EVERY keys so the sweep's
# storage footprint stays bounded (the r6 full-sweep recipe)
RELEASE_EVERY = 40


def _next_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "*_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0) + 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else _next_round()
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"SWEEP_r{rnd:02d}.json"
    )
    spark = get_spark(app_name="sweep")
    con = duckdb_con(sf_dir)

    from proceso_de_etl_spark import cachereg
    from proceso_de_etl_spark.operators import dedup, ml

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    results: dict[str, dict] = {}
    t_start = time.time()
    n_pass = 0
    for i, (key, sql) in enumerate(osql.items()):
        if key not in qs:
            continue
        if i and i % RELEASE_EVERY == 0:
            dedup.unpersist_shingles()
            ml.unpersist_copurchase()
            cachereg.release_all()
            spark.catalog.clearCache()
        row = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        t0 = time.time()
        try:
            got = qs[key](spark, sf_dir).toPandas()
            want = con.sql(sql).df()
            row["spark_rows"], row["oracle_rows"] = len(got), len(want)
            row["rows_match"] = len(got) == len(want)
            row["schema_match"] = sorted(got.columns) == sorted(want.columns)
            if row["rows_match"] and row["schema_match"]:
                g, w = canonicalize(got), canonicalize(want)
                row["hash_match"] = g == w
        except Exception:
            row["err"] = traceback.format_exc(limit=3)
        row["sec"] = round(time.time() - t0, 3)
        results[key] = row
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
        n_pass += ok
        if not ok:
            print(f"FAIL {key}: {row['err'] or 'value/schema mismatch'}", flush=True)

    payload = {
        "sf_dir": sf_dir,
        "n_keys": len(results),
        "n_pass": n_pass,
        "wall_sec": round(time.time() - t_start, 1),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "artifact": os.path.basename(out_path),
                "sf_dir": sf_dir,
                "n_keys": len(results),
                "n_pass": n_pass,
                "wall_sec": payload["wall_sec"],
            }
        )
    )


if __name__ == "__main__":
    main()
