#!/usr/bin/env python3
"""Capture the PRE-checkpoint formatted plan of every
localCheckpoint site an iterative operator executes — the plan that
actually runs each round — instead of the vacuous 9-line
post-checkpoint plan of the final frame (the r13 verdict's item 6).

Works by wrapping DataFrame.localCheckpoint: each call first records
``self``'s formatted plan (exactly the plan whose materialization the
eager checkpoint triggers), then delegates. The final returned
frame's plan is appended last.

Usage: python capture_iter_plans.py <outdir> <suffix> <key> [...]
Writes <outdir>/<key>_<suffix>.txt with every round plan delimited.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Spark 4: pyspark.sql.DataFrame is the abstract facade; operators
# receive pyspark.sql.classic.dataframe.DataFrame instances, which
# OVERRIDE localCheckpoint — patch the concrete class.
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

from proceso_de_etl_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def fmt(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir, suffix, *keys = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_iter_plans")
    queries = entrymod.queries()
    orig = DataFrame.localCheckpoint

    for key in keys:
        captured: list[str] = []

        def spy(self, eager=True):  # noqa: ANN001
            captured.append(fmt(self))
            return orig(self, eager=eager)

        DataFrame.localCheckpoint = spy
        try:
            df = queries[key](spark, sf_dir)
        finally:
            DataFrame.localCheckpoint = orig
        parts = [
            f"==== checkpoint site {i + 1}/{len(captured)} (pre-checkpoint plan) ====\n{p}"
            for i, p in enumerate(captured)
        ]
        parts.append(f"==== final returned frame ====\n{fmt(df)}")
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write("\n".join(parts))
        nex = sum(p.count("Exchange") for p in captured)
        print(
            f"wrote {path}: {len(captured)} checkpoint sites, "
            f"{nex} Exchange nodes across round plans",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
