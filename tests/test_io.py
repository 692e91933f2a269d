"""Source/sink coverage (SURVEY.md §2.4): format roundtrips, schema'd
reads, malformed-row policies, partitioned writes with pruning."""

import pytest

from pyspark.sql import functions as F

from proceso_de_etl_spark.sources.catalog import load_table
from proceso_de_etl_spark.sources.io import (
    read_csv,
    read_json,
    read_orc,
    write_csv,
    write_orc,
    write_parquet,
)
from tests.conftest import SF_SMOKE


def _sample(spark):
    return load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )


def test_csv_roundtrip(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "csv")
    write_csv(df, p)
    back = read_csv(spark, p, "c_custkey bigint, c_name string, c_acctbal double")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_roundtrip(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "json")
    df.write.json(p)
    back = read_json(spark, p, "c_custkey bigint, c_name string, c_acctbal double")
    assert back.count() == df.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_roundtrip(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "orc")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_malformed_policies(spark, tmp_path):
    raw = tmp_path / "raw.csv"
    raw.write_text("id,v\n1,10\nbad-row,not-a-number\n3,30\n")
    schema = "id bigint, v bigint"

    permissive = read_csv(spark, str(raw), schema, mode="PERMISSIVE")
    rows = {r.id: r.v for r in permissive.collect()}
    assert rows[1] == 10 and rows[3] == 30 and rows[None] is None

    dropped = read_csv(spark, str(raw), schema, mode="DROPMALFORMED")
    # count() would prune every column and the parser would never see
    # the malformed cells — materialize the columns to apply the policy
    assert len(dropped.collect()) == 2

    with pytest.raises(Exception):
        read_csv(spark, str(raw), schema, mode="FAILFAST").collect()


def test_partitioned_write_prunes(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("int")
    )
    p = str(tmp_path / "fact")
    write_parquet(li, p, partition_by=["ship_year"])
    back = spark.read.parquet(p).filter(F.col("ship_year") == 1997)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ship_year" in plan.split("PartitionFilters")[1][:200]
    want = li.filter(F.col("ship_year") == 1997).count()
    assert back.count() == want


def test_avro_gated_with_actionable_error(spark):
    from proceso_de_etl_spark.sources.io import avro_available, read_avro

    assert not avro_available(spark)
    with pytest.raises(RuntimeError, match="spark-avro"):
        read_avro(spark, "/tmp/nope.avro")


def test_jdbc_gated_with_actionable_error(spark):
    from proceso_de_etl_spark.sources.jdbc import jdbc_available, read_jdbc_partitioned

    assert not jdbc_available(spark, "com.microsoft.sqlserver.jdbc.SQLServerDriver")
    with pytest.raises(RuntimeError, match="classpath"):
        read_jdbc_partitioned(
            spark, "jdbc:sqlserver://h;databaseName=OpinionDB", "Clientes",
            "IdCliente", 0, 1000, 8,
        )


def test_parquet_schema_evolution_merges_by_name(spark, tmp_path):
    """Files written before a column existed must read as NULL for
    it; filters on always-present columns still push down."""
    from proceso_de_etl_spark.sources.io import read_parquet_evolving

    old = str(tmp_path / "epoch_old")
    new = str(tmp_path / "epoch_new")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").write.parquet(old)
    spark.createDataFrame(
        [(3, "c", 0.5)], "id long, v string, quality double"
    ).write.parquet(new)

    df = read_parquet_evolving(spark, old, new)
    assert set(df.columns) == {"id", "v", "quality"}
    rows = {r.id: (r.v, r.quality) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 0.5)}

    plan = df.filter(df.id > 1)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,1)]" in plan


def test_compaction_reduces_files_losslessly(spark, tmp_path):
    """E21's claim: a 64-way fragmented table compacts to the
    byte-budgeted file count and loses nothing. Values are covered by
    the etl_compact_small_files oracle; this pins the file counts and
    row identity."""
    from proceso_de_etl_spark.sources.io import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    events = load_table(spark, SF_SMOKE, "events")
    events.repartition(64).write.parquet(src)

    before, after = compact_parquet(spark, src, dst, ["ts", "user_id"], 1 << 20)
    assert before == 64
    assert after < before
    back = spark.read.parquet(dst)
    assert back.count() == events.count()
    assert back.select(F.sum(F.hash(*sorted(back.columns)))).first()[0] == \
        events.select(F.sum(F.hash(*sorted(events.columns)))).first()[0]


def test_time_travel_retains_and_vacuums_versions(spark, tmp_path):
    """E22 mechanics: retained commits are listable newest-first,
    readable by txn id with exact old content, vacuum drops archived
    snapshots but never the current one, and a vacuumed txn fails
    loudly with the retrievable set."""
    import pytest as _pytest

    from proceso_de_etl_spark.sources.atomic import (
        atomic_write_tables,
        list_table_versions,
        read_table_version,
        vacuum_table_versions,
    )

    root = str(tmp_path / "versioned")
    for hi in (1, 2, 3):
        df = spark.createDataFrame([(i,) for i in range(hi + 1)], "id long")
        atomic_write_tables(root, {"t": df}, retain_history=True)

    versions = list_table_versions(root, "t")
    assert [kind for _, kind in versions] == ["current", "archived", "archived"]
    v1_txn = versions[2][0]  # oldest archived = the first commit
    assert {r.id for r in read_table_version(spark, root, "t", v1_txn).collect()} == {0, 1}
    assert {r.id for r in read_table_version(spark, root, "t").collect()} == {0, 1, 2, 3}

    assert vacuum_table_versions(root, "t", keep_last=1) == 1
    assert [kind for _, kind in list_table_versions(root, "t")] == ["current", "archived"]
    with _pytest.raises(KeyError, match="not retained"):
        read_table_version(spark, root, "t", v1_txn)
    assert vacuum_table_versions(root, "t") == 1
    assert {r.id for r in read_table_version(spark, root, "t").collect()} == {0, 1, 2, 3}


def test_load_table_fails_fast_with_actionable_errors(spark):
    """Misuse must fail loudly at the call site: an unknown table name
    raises a KeyError listing the known tables; a missing sf_dir
    surfaces Spark's AnalysisException naming the path (eager parquet
    existence check), not a later empty result."""
    from pyspark.errors import AnalysisException

    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, SF_SMOKE, "bogus")
    with pytest.raises(AnalysisException):
        load_table(spark, "/root/testdata/does_not_exist", "orders")


def test_dynamic_partition_overwrite_touches_only_batch_partitions(spark, tmp_path):
    """E25's physical claim: in dynamic mode an overwrite replaces
    ONLY the partitions present in the batch — other partition
    directories keep their exact files (same names, same bytes —
    no rewrite); in the default static mode the same write would
    have dropped them entirely."""
    import os

    root = str(tmp_path / "dpo")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)], "id long, part string, v double"
    )
    base.write.partitionBy("part").parquet(root)

    def listing(part: str) -> list[tuple[str, int]]:
        d = os.path.join(root, f"part={part}")
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    a_before = listing("a")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.createDataFrame([(9, "b", 99.0)], "id long, part string, v double").write.mode(
            "overwrite"
        ).partitionBy("part").parquet(root)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert listing("a") == a_before  # untouched partition: identical files
    got = {(r.id, r.part, r.v) for r in spark.read.parquet(root).collect()}
    assert got == {(1, "a", 10.0), (2, "a", 20.0), (9, "b", 99.0)}
