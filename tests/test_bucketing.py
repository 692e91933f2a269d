"""Bucketed co-located join: values equal the plain join (oracle
parity) AND the join itself moves no data — no Exchange under the
SortMergeJoin, which is the entire point of paying for bucketing at
write time."""

from proceso_de_etl_spark.sources import bucketing
from tests.oracle_harness import compare, duckdb_con

SF_SMOKE = "/root/testdata/sf0.001"


def test_bucketed_join_matches_oracle(spark):
    con = duckdb_con(SF_SMOKE)
    compare(
        bucketing.bucketed_colocated_join(spark, SF_SMOKE),
        con,
        bucketing.ORACLES["bucketed_colocated_join"],
        "bucketed_colocated_join",
    )


def test_bucketed_join_has_no_exchange(spark):
    """With broadcast off (the big-big regime bucketing exists for),
    the join must be a SortMergeJoin with NO Exchange and NO Sort on
    either side — bucket files align and are pre-sorted."""
    saved_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = bucketing.bucketed_colocated_join(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:1500]
        join_part = plan.split("SortMergeJoin", 1)[1]  # subtree below the join
        assert "Exchange" not in join_part, (
            "bucket-aligned join should read bucket i vs bucket i with no shuffle:\n"
            + join_part[:1500]
        )
        # a within-partition Sort remains: Spark only propagates the
        # within-bucket sort order behind the legacy flag
        # spark.sql.legacy.bucketedTableScan.outputOrdering (off by
        # default since 3.0) — the shuffle elimination is the scale
        # property; the partition-local sort is cheap by comparison
        assert join_part.count("Bucketed: true") == 2, join_part[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
