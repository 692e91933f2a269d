"""Slowly-changing-dimension (SCD2) merge — the warehouse-grade form
of the reference's idempotent dimension load (reference main.py:61-74
only ever appends new names; SCD2 also tracks attribute CHANGES with
validity intervals).

Without a transactional table format (Delta/Iceberg jars are not in
this image) MERGE is emulated the classic way: anti-join + union +
window — one pass, no driver loops:

    changed   = incoming ⋈ current where attributes differ
    closed    = current rows superseded by a change (valid_to set)
    carried   = current rows without a change
    new_rows  = incoming keys absent from current + changed (new version)

The whole merge is a single declarative plan over two inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from proceso_de_etl_spark.functions.columns import money
from proceso_de_etl_spark.sources.catalog import load_table

ORACLES: dict[str, str] = {}

FAR_FUTURE = "9999-12-31"


def scd2_merge(
    current: DataFrame,
    incoming: DataFrame,
    key: str,
    attrs: list[str],
    load_date: str,
) -> DataFrame:
    """Merge ``incoming`` (key + attrs) into the SCD2 ``current``
    (key + attrs + valid_from + valid_to + is_current)."""
    inc = incoming.select(key, *attrs)
    cur_open = current.filter(F.col("is_current"))
    cur_closed = current.filter(~F.col("is_current"))

    changed_keys = (
        cur_open.alias("c")
        .join(inc.alias("i"), key)
        .filter(" OR ".join(f"NOT (c.{a} <=> i.{a})" for a in attrs))
        .select(key)
    )
    # close superseded versions
    closed_now = (
        cur_open.join(changed_keys, key, "left_semi")
        .withColumn("valid_to", F.lit(load_date).cast("date"))
        .withColumn("is_current", F.lit(False))
    )
    untouched_open = cur_open.join(changed_keys, key, "left_anti")
    # new versions: changed keys + brand-new keys
    new_keys = inc.join(cur_open, key, "left_anti").select(key)
    version_keys = changed_keys.unionByName(new_keys)
    new_versions = (
        inc.join(version_keys, key, "left_semi")
        .withColumn("valid_from", F.lit(load_date).cast("date"))
        .withColumn("valid_to", F.lit(FAR_FUTURE).cast("date"))
        .withColumn("is_current", F.lit(True))
    )
    return (
        cur_closed.unionByName(closed_now)
        .unionByName(untouched_open)
        .unionByName(new_versions)
    )


def etl_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14 — SCD2 over the customer dimension: current state is the
    customer table as of an initial load; the incoming batch changes
    every 5th customer's segment and adds synthetic new customers.
    Output: the merged history with version accounting."""
    cust = load_table(spark, sf_dir, "customer")
    current = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal"),
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(FAR_FUTURE).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    incoming = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit("MOVED")).otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
        F.col("c_acctbal"),
    ).unionByName(
        cust.filter(F.col("c_custkey") % 100 == 0).select(
            (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
            F.lit("NEW").alias("c_mktsegment"),
            F.lit(0.0).alias("c_acctbal"),
        )
    )
    merged = scd2_merge(current, incoming, "c_custkey", ["c_mktsegment", "c_acctbal"], "2024-06-01")
    return merged.groupBy("c_mktsegment", "is_current").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("c_custkey").alias("n_keys"),
    )


ORACLES["etl_scd2_merge"] = """
WITH current AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         DATE '2024-01-01' AS valid_from, DATE '9999-12-31' AS valid_to,
         TRUE AS is_current
  FROM customer
),
incoming AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment,
         c_acctbal
  FROM customer
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW', 0.0 FROM customer WHERE c_custkey % 100 = 0
),
changed AS (
  SELECT c.c_custkey FROM current c JOIN incoming i USING (c_custkey)
  WHERE NOT (c.c_mktsegment IS NOT DISTINCT FROM i.c_mktsegment)
     OR NOT (c.c_acctbal IS NOT DISTINCT FROM i.c_acctbal)
),
merged AS (
  SELECT c_custkey, c_mktsegment, c_acctbal, DATE '2024-06-01' AS valid_to, FALSE AS is_current
  FROM current WHERE c_custkey IN (SELECT c_custkey FROM changed)
  UNION ALL
  SELECT c_custkey, c_mktsegment, c_acctbal, valid_to, is_current
  FROM current WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
  UNION ALL
  SELECT c_custkey, c_mktsegment, c_acctbal, DATE '9999-12-31', TRUE
  FROM incoming
  WHERE c_custkey IN (SELECT c_custkey FROM changed)
     OR c_custkey NOT IN (SELECT c_custkey FROM current)
)
SELECT c_mktsegment, is_current, COUNT(*) AS n_rows,
       COUNT(DISTINCT c_custkey) AS n_keys
FROM merged
GROUP BY 1, 2
"""

def etl_scd_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E31 — the three SCD disciplines over ONE shared change batch
    (E14's fixture: every 5th customer's segment changes, every 100th
    spawns a new key), summarized side by side so the cost/history
    trade is visible in data:

    - type 1 (overwrite): full-outer upsert, no history — row count
      stays keys-sized, changes vanish into the current value;
    - type 2 (validity intervals): the scd2_merge history — superseded
      versions survive as closed rows (n_changed = closed versions);
    - type 3 (previous-value column): one row per key with a
      ``prev_segment`` column — exactly ONE change deep.

    All three are single declarative plans over the same two inputs
    (anti/semi/full-outer joins — the MERGE emulation family); at
    100 TB the type choice is a storage/shuffle trade the matrix
    quantifies, not a code change. Extends main.py:61-74's
    append-only dimension load with the change-tracking forms."""
    cust = load_table(spark, sf_dir, "customer")
    current = cust.select("c_custkey", "c_mktsegment")
    incoming = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    ).unionByName(
        cust.filter(F.col("c_custkey") % 100 == 0).select(
            (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
            F.lit("NEW").alias("c_mktsegment"),
        )
    )
    c, i = current.alias("c"), incoming.alias("i")
    joined = c.join(i, "c_custkey", "full_outer").select(
        "c_custkey",
        F.col("c.c_mktsegment").alias("old_seg"),
        F.col("i.c_mktsegment").alias("new_seg"),
    )
    type1 = joined.agg(
        F.lit("type1_overwrite").alias("kind"),
        F.count("*").alias("n_rows"),
        F.sum(
            (
                F.col("old_seg").isNotNull()
                & F.col("new_seg").isNotNull()
                & (F.col("old_seg") != F.col("new_seg"))
            ).cast("bigint")
        ).alias("n_changed"),
        F.sum((F.coalesce("new_seg", "old_seg") == "MOVED").cast("bigint")).alias("n_moved"),
    ).select("kind", "n_rows", "n_changed", "n_moved")
    # type 2 numbers come from the real merge (full E14 machinery)
    cur2 = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(FAR_FUTURE).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    merged = scd2_merge(
        cur2, incoming, "c_custkey", ["c_mktsegment"], "2024-06-01"
    )
    type2 = merged.agg(
        F.lit("type2_history").alias("kind"),
        F.count("*").alias("n_rows"),
        F.sum((~F.col("is_current")).cast("bigint")).alias("n_changed"),
        F.sum(
            ((F.col("c_mktsegment") == "MOVED") & F.col("is_current")).cast("bigint")
        ).alias("n_moved"),
    ).select("kind", "n_rows", "n_changed", "n_moved")
    type3 = (
        joined.select(
            "c_custkey",
            F.coalesce("new_seg", "old_seg").alias("seg"),
            F.when(
                F.col("old_seg").isNotNull()
                & F.col("new_seg").isNotNull()
                & (F.col("old_seg") != F.col("new_seg")),
                F.col("old_seg"),
            ).alias("prev_seg"),
        )
        .agg(
            F.lit("type3_prev_column").alias("kind"),
            F.count("*").alias("n_rows"),
            F.sum(F.col("prev_seg").isNotNull().cast("bigint")).alias("n_changed"),
            F.sum((F.col("seg") == "MOVED").cast("bigint")).alias("n_moved"),
        )
        .select("kind", "n_rows", "n_changed", "n_moved")
    )
    return type1.unionByName(type2).unionByName(type3).orderBy("kind")


ORACLES["etl_scd_type_matrix"] = """
WITH current AS (SELECT c_custkey, c_mktsegment FROM customer),
incoming AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment
  FROM customer
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW' FROM customer WHERE c_custkey % 100 = 0
),
joined AS (
  SELECT COALESCE(c.c_custkey, i.c_custkey) AS c_custkey,
         c.c_mktsegment AS old_seg, i.c_mktsegment AS new_seg
  FROM current c FULL OUTER JOIN incoming i ON c.c_custkey = i.c_custkey
),
changed AS (SELECT c_custkey FROM joined
            WHERE old_seg IS NOT NULL AND new_seg IS NOT NULL AND old_seg <> new_seg),
merged AS (
  SELECT c_custkey, c_mktsegment, FALSE AS is_current
  FROM current WHERE c_custkey IN (SELECT c_custkey FROM changed)
  UNION ALL
  SELECT c_custkey, c_mktsegment, TRUE
  FROM current WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
  UNION ALL
  SELECT c_custkey, c_mktsegment, TRUE
  FROM incoming
  WHERE c_custkey IN (SELECT c_custkey FROM changed)
     OR c_custkey NOT IN (SELECT c_custkey FROM current)
)
SELECT kind, n_rows, n_changed, n_moved FROM (
  SELECT 'type1_overwrite' AS kind, COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN old_seg IS NOT NULL AND new_seg IS NOT NULL
                        AND old_seg <> new_seg THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         CAST(SUM(CASE WHEN COALESCE(new_seg, old_seg) = 'MOVED' THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
  FROM joined
  UNION ALL
  SELECT 'type2_history', COUNT(*),
         CAST(SUM(CASE WHEN NOT is_current THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN c_mktsegment = 'MOVED' AND is_current THEN 1 ELSE 0 END) AS BIGINT)
  FROM merged
  UNION ALL
  SELECT 'type3_prev_column', COUNT(*),
         CAST(SUM(CASE WHEN old_seg IS NOT NULL AND new_seg IS NOT NULL
                        AND old_seg <> new_seg THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN COALESCE(new_seg, old_seg) = 'MOVED' THEN 1 ELSE 0 END) AS BIGINT)
  FROM joined
)
ORDER BY kind
"""


def _versioned_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-version SCD2 customer dim used by E40/E41: every customer
    changes segment once on a per-key change date spread across the
    order span (1995-2001), so point-in-time lookups route orders to
    BOTH versions in bulk. Built scan-side — no driver data."""
    cust = load_table(spark, sf_dir, "customer")
    change = F.date_add(
        F.lit("1995-06-01").cast("date"), (F.col("c_custkey") % 2000).cast("int")
    )
    v1 = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        change.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    v2 = cust.select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("segment"),
        change.alias("valid_from"),
        F.lit(FAR_FUTURE).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return v1.unionByName(v2)


_VERSIONED_DIM_SQL = """
  SELECT c_custkey, c_mktsegment AS segment,
         DATE '1990-01-01' AS valid_from,
         DATE '1995-06-01' + CAST(c_custkey % 2000 AS INT) AS valid_to,
         FALSE AS is_current
  FROM customer
  UNION ALL
  SELECT c_custkey, c_mktsegment || '_V2' AS segment,
         DATE '1995-06-01' + CAST(c_custkey % 2000 AS INT) AS valid_from,
         DATE '9999-12-31' AS valid_to,
         TRUE AS is_current
  FROM customer
"""


def etl_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E40 — point-in-time (temporal) join: every order joined to the
    dimension version that was valid ON ITS ORDER DATE
    (valid_from ≤ o_orderdate < valid_to) — the lookup that makes
    SCD2 history worth keeping, and the one naive current-row joins
    silently get wrong for backdated facts. The join is an EQUI-join
    on the key with the validity interval as a post-join range
    predicate — per-key version chains are short (2 here; bounded in
    any sane dim), so the range filter scans a handful of rows per
    fact and never becomes the A32 big-big interval problem. The
    rollup pins routing exactly: per (version flag, segment-suffix)
    order counts + exact revenue, plus an every-order-matched-once
    reconciliation column."""
    orders = load_table(spark, sf_dir, "orders")
    dim = _versioned_dim(spark, sf_dir)
    j = orders.join(
        dim,
        (orders.o_custkey == dim.c_custkey)
        & (dim.valid_from <= F.to_date("o_orderdate"))
        & (F.to_date("o_orderdate") < dim.valid_to),
    )
    return j.groupBy("is_current").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_orderkey").alias("n_distinct_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.when(F.col("segment").endswith("_V2"), 1)).alias("n_v2_segment"),
    )


ORACLES["etl_scd2_point_in_time"] = f"""
WITH dim AS ({_VERSIONED_DIM_SQL})
SELECT d.is_current, COUNT(*) AS n_orders,
       COUNT(DISTINCT o.o_orderkey) AS n_distinct_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(CASE WHEN d.segment LIKE '%\\_V2' ESCAPE '\\' THEN 1 END) AS n_v2_segment
FROM orders o
JOIN dim d ON o.o_custkey = d.c_custkey
          AND d.valid_from <= CAST(o.o_orderdate AS DATE)
          AND CAST(o.o_orderdate AS DATE) < d.valid_to
GROUP BY d.is_current
"""


def etl_scd2_validity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E41 — SCD2 validity-chain integrity audit: the invariant
    checks every temporal dim needs before anyone trusts an E40
    lookup — per key, consecutive versions must TILE time (prev
    valid_to == next valid_from), exactly one current row, current
    row open-ended. Run against the clean dim with PLANTED defects:
    keys %97==0 get an overlapping second version (valid_from 10
    days early), keys %89==0 (and not %97) a coverage gap (5 days
    late). Classification is a lag window per key (version chains
    are short — bounded partitions) + one rollup with example keys;
    the oracle re-derives every class independently."""
    dim = _versioned_dim(spark, sf_dir)
    planted = dim.select(
        "c_custkey",
        "segment",
        F.when(
            F.col("is_current") & (F.col("c_custkey") % 97 == 0),
            F.date_sub("valid_from", 10),
        )
        .when(
            F.col("is_current")
            & (F.col("c_custkey") % 89 == 0)
            & (F.col("c_custkey") % 97 != 0),
            F.date_add("valid_from", 5),
        )
        .otherwise(F.col("valid_from"))
        .alias("valid_from"),
        "valid_to",
        "is_current",
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("c_custkey").orderBy("valid_from", "valid_to")
    flagged = planted.withColumn("prev_to", F.lag("valid_to").over(w)).withColumn(
        "chain",
        F.when(F.col("prev_to").isNull(), "first")
        .when(F.col("prev_to") == F.col("valid_from"), "tiled")
        .when(F.col("prev_to") > F.col("valid_from"), "overlap")
        .otherwise("gap"),
    )
    return flagged.groupBy("chain").agg(
        F.count("*").alias("n_versions"),
        F.countDistinct("c_custkey").alias("n_keys"),
        F.min("c_custkey").alias("example_key"),
    )


ORACLES["etl_scd2_validity_audit"] = f"""
WITH dim AS ({_VERSIONED_DIM_SQL}),
planted AS (
  SELECT c_custkey, segment,
         CASE WHEN is_current AND c_custkey % 97 = 0 THEN valid_from - 10
              WHEN is_current AND c_custkey % 89 = 0 AND c_custkey % 97 <> 0 THEN valid_from + 5
              ELSE valid_from END AS valid_from,
         valid_to, is_current
  FROM dim
),
flagged AS (
  SELECT c_custkey,
         lag(valid_to) OVER (PARTITION BY c_custkey ORDER BY valid_from, valid_to) AS prev_to,
         valid_from
  FROM planted
)
SELECT CASE WHEN prev_to IS NULL THEN 'first'
            WHEN prev_to = valid_from THEN 'tiled'
            WHEN prev_to > valid_from THEN 'overlap'
            ELSE 'gap' END AS chain,
       COUNT(*) AS n_versions,
       COUNT(DISTINCT c_custkey) AS n_keys,
       MIN(c_custkey) AS example_key
FROM flagged
GROUP BY 1
"""


BITEMPORAL_BELIEF_DATES = ("1997-01-01", "1998-01-01")
BITEMPORAL_VALID_AT = "1996-07-01"
CORRECTION_LAG_DAYS = 60


def etl_bitemporal_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E46 — bitemporal (system-time × valid-time) query matrix:
    "what did we BELIEVE on date B about the state valid on date V"
    — the two-axis temporal model behind restatements and audit
    replays, one step past E40's single-axis SCD2 (valid time only).
    The bitemporal order table is synthesized scan-side: every order
    is first RECORDED on its order date; every 5th order gets a
    CORRECTION (status → 'X') recorded 60 days later — the original
    version's system-time interval closes where the correction's
    opens, while VALID time is untouched (the correction restates
    history, it doesn't change when the order existed). For each
    belief date the report counts orders by believed status among
    those valid on V: the early belief date must still see the
    soon-to-be-corrected originals — bitemporal's whole point.
    Construction + query are one scan and one bounded union (2
    belief dates); the system/valid predicates are scan-side
    filters."""
    orders = load_table(spark, sf_dir, "orders")
    odate = F.to_date("o_orderdate")
    corrected = F.col("o_orderkey") % 5 == 0
    original = orders.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        money("o_totalprice").alias("price"),
        odate.alias("valid_from"),
        odate.alias("recorded_from"),
        F.when(
            corrected, F.date_add(odate, CORRECTION_LAG_DAYS)
        ).otherwise(F.lit("9999-12-31").cast("date")).alias("recorded_to"),
    )
    correction = orders.filter(corrected).select(
        "o_orderkey",
        F.lit("X").alias("status"),
        money("o_totalprice").alias("price"),
        odate.alias("valid_from"),
        F.date_add(odate, CORRECTION_LAG_DAYS).alias("recorded_from"),
        F.lit("9999-12-31").cast("date").alias("recorded_to"),
    )
    bitemporal = original.unionByName(correction)
    out = None
    v = F.lit(BITEMPORAL_VALID_AT).cast("date")
    for b in BITEMPORAL_BELIEF_DATES:
        bd = F.lit(b).cast("date")
        snap = (
            bitemporal.filter(
                (F.col("recorded_from") <= bd)
                & (bd < F.col("recorded_to"))
                & (F.col("valid_from") <= v)
            )
            .groupBy("status")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum("price").cast("double").alias("revenue"),
            )
            .select(F.lit(b).alias("belief_date"), "status", "n_orders", "revenue")
        )
        out = snap if out is None else out.unionByName(snap)
    return out


ORACLES["etl_bitemporal_matrix"] = f"""
WITH bitemporal AS (
  SELECT o_orderkey, o_orderstatus AS status,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         CAST(o_orderdate AS DATE) AS valid_from,
         CAST(o_orderdate AS DATE) AS recorded_from,
         CASE WHEN o_orderkey % 5 = 0
              THEN CAST(o_orderdate AS DATE) + {CORRECTION_LAG_DAYS}
              ELSE DATE '9999-12-31' END AS recorded_to
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'X', CAST(o_totalprice AS DECIMAL(18,2)),
         CAST(o_orderdate AS DATE),
         CAST(o_orderdate AS DATE) + {CORRECTION_LAG_DAYS},
         DATE '9999-12-31'
  FROM orders WHERE o_orderkey % 5 = 0
)
{" UNION ALL ".join(
    f'''SELECT '{b}' AS belief_date, status, COUNT(*) AS n_orders,
       CAST(SUM(price) AS DOUBLE) AS revenue
FROM bitemporal
WHERE recorded_from <= DATE '{b}' AND DATE '{b}' < recorded_to
  AND valid_from <= DATE '{BITEMPORAL_VALID_AT}'
GROUP BY status'''
    for b in BITEMPORAL_BELIEF_DATES)}
"""


QUERIES = {
    "etl_bitemporal_matrix": etl_bitemporal_matrix,
    "etl_scd2_point_in_time": etl_scd2_point_in_time,
    "etl_scd2_validity_audit": etl_scd2_validity_audit,
    "etl_scd2_merge": etl_scd2_merge,
    "etl_scd_type_matrix": etl_scd_type_matrix,
}
