#!/usr/bin/env python3
"""Targeted oracle check: replay named queries() keys against their
DuckDB oracles at $SPARK_GRAFT_SF_DIR with the strict local gate
(sweep.py's comparison). Usage: python check_keys.py <key> [...]"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

from proceso_de_etl_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from oracle_harness import canonicalize, duckdb_con  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keys = sys.argv[1:]
    spark = get_spark(app_name="check_keys")
    con = duckdb_con(sf_dir)
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    n_pass = 0
    for key in keys:
        t0 = time.time()
        try:
            got = qs[key](spark, sf_dir).toPandas()
            want = con.sql(osql[key]).df()
            ok = (
                len(got) == len(want)
                and sorted(got.columns) == sorted(want.columns)
                and canonicalize(got) == canonicalize(want)
            )
        except Exception:
            ok = False
            print(traceback.format_exc(limit=3))
        n_pass += ok
        print(
            json.dumps(
                {"key": key, "ok": ok, "sec": round(time.time() - t0, 2), "sf_dir": sf_dir}
            ),
            flush=True,
        )
    print(json.dumps({"n": len(keys), "n_pass": n_pass}))
    sys.exit(0 if n_pass == len(keys) else 1)


if __name__ == "__main__":
    main()
