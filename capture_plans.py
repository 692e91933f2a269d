#!/usr/bin/env python3
"""Capture .explain("formatted") output for named queries() keys.

Usage: python capture_plans.py <outdir> <suffix> <key> [<key> ...]

Writes <outdir>/<key>_<suffix>.txt for each key. Used to produce the
plans/r13/<query>_before.txt / _after.txt deliverables: run it once
from a worktree of the round-12 close (suffix "before") and once from
HEAD (suffix "after").
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from proceso_de_etl_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    outdir, suffix, *keys = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_plans")
    queries = entrymod.queries()
    for key in keys:
        df = queries[key](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
