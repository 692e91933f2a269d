"""End-to-end training-corpus cleaning pipeline — the flagship
composition of the training-data operators (SURVEY.md §2.3), the
document-side analogue of the reference's star ETL:

    quality gate → language gate → near-dup removal (keep lowest id)

Each stage is one of the already-verified operators; composing them
stays a single declarative plan (Catalyst fuses the scans), and the
whole chain is reproduced in the DuckDB oracle by the same CTE
composition — the pipeline's output is value-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from proceso_de_etl_spark.operators import dedup as dedup_ops
from proceso_de_etl_spark.operators.text_analysis import (
    ORACLES as TEXT_ORACLES,
    text_lang_id,
    text_quality_score,
)
from proceso_de_etl_spark.operators.dedup import ORACLES as DEDUP_ORACLES

ORACLES: dict[str, str] = {}

QUALITY_MIN = 0.5


def pipeline_clean_corpus(
    spark: SparkSession, sf_dir: str, near_dup: str = "lsh"
) -> DataFrame:
    """Quality ≥ 0.5, predicted language 'en', and from every 3-gram
    near-dup pair (j ≥ 0.8) only the lowest doc_id survives.

    The near-dup stage is parameterized: the REGISTERED path is the
    MinHash+LSH candidate generator (banded equi-join — linear, the
    only plan that survives 100 TB); ``near_dup="exact"`` swaps in
    the quadratic exact-Jaccard twin, which is what the DuckDB oracle
    computes. Both verify candidates with exact Jaccard at the same
    threshold, and tests/test_oracle_gate assert the two pair sets
    are identical at gate SF (LSH recall is deterministic here —
    xxhash signatures, no RNG — so gate-green is reproducible)."""
    quality = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    lang = text_lang_id(spark, sf_dir).select("doc_id", "predicted_lang")
    if near_dup == "lsh":
        dup_pairs = dedup_ops.dedup_minhash_lsh(spark, sf_dir)
    else:
        dup_pairs = dedup_ops.dedup_ngram_jaccard(spark, sf_dir)
    # drop the higher id of each pair: any doc appearing as `b` loses
    losers = dup_pairs.select(F.col("b").alias("doc_id")).distinct()
    return (
        quality.join(lang, "doc_id")
        .filter((F.col("quality_score") >= QUALITY_MIN) & (F.col("predicted_lang") == "en"))
        .join(losers, "doc_id", "left_anti")
        .select("doc_id", "quality_score")
    )


def _subquery(sql: str, name: str) -> str:
    return f"{name} AS (SELECT * FROM ({sql.strip().rstrip(';')}))"


ORACLES["pipeline_clean_corpus"] = f"""
WITH {_subquery(TEXT_ORACLES["text_quality_score"], "quality")},
{_subquery(TEXT_ORACLES["text_lang_id"], "lang")},
{_subquery(DEDUP_ORACLES["dedup_ngram_jaccard"], "dups")}
SELECT quality.doc_id, quality_score
FROM quality JOIN lang ON quality.doc_id = lang.doc_id
WHERE quality_score >= {QUALITY_MIN}
  AND predicted_lang = 'en'
  AND quality.doc_id NOT IN (SELECT b FROM dups)
"""

def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data preparation chain, end-to-end in ONE
    declarative plan: clean (quality + language + near-dup removal,
    = pipeline_clean_corpus) → leakage-safe split assignment (T48's
    dup-group hash keying) → per-split budget accounting (docs,
    whitespace tokens, chars). This is the workflow a reference user
    actually runs before training; every stage is an already-verified
    operator, and the composition itself is value-checked by the same
    CTE composition in DuckDB — so stage-boundary bugs (a filter
    applied after the split, a split keyed on the wrong column) can't
    hide. One corpus scan feeds the clean gates, one more computes
    token budgets on survivors only; the split adds no extra shuffle
    beyond T48's two keyed aggregations."""
    from proceso_de_etl_spark.functions.text import tokens
    from proceso_de_etl_spark.operators.sampling import (
        SPLIT_TRAIN_BOUND,
        SPLIT_VAL_BOUND,
    )
    from proceso_de_etl_spark.sources.catalog import load_table

    kept = pipeline_clean_corpus(spark, sf_dir).select("doc_id")
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.md5("text")), 1, 2)
    return (
        docs.join(kept, "doc_id", "left_semi")
        .select(
            F.when(bucket < SPLIT_TRAIN_BOUND, "train")
            .when(bucket < SPLIT_VAL_BOUND, "val")
            .otherwise("test")
            .alias("split"),
            F.size(tokens(F.col("text"))).cast("bigint").alias("ws_tokens"),
            F.col("n_chars"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


def _training_data_oracle() -> str:
    from proceso_de_etl_spark.functions.text import tokens_sql
    from proceso_de_etl_spark.operators.sampling import (
        SPLIT_TRAIN_BOUND,
        SPLIT_VAL_BOUND,
    )

    toks = tokens_sql("text")
    return f"""
WITH clean AS ({ORACLES["pipeline_clean_corpus"].strip()})
SELECT CASE WHEN substr(md5(md5(text)), 1, 2) < '{SPLIT_TRAIN_BOUND}' THEN 'train'
            WHEN substr(md5(md5(text)), 1, 2) < '{SPLIT_VAL_BOUND}' THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(len({toks})) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents d
WHERE EXISTS (SELECT 1 FROM clean WHERE clean.doc_id = d.doc_id)
GROUP BY 1
ORDER BY 1
"""


ORACLES["pipeline_training_data"] = _training_data_oracle()

def pipeline_analytics_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end analytics-mart chain (the consumption layer the
    reference's star schema exists to feed — README §2.3): three
    independently-verified insight operators (A71 RFM, A72
    Pareto/ABC, A73 growth) rolled up into ONE long-format mart
    table (mart, key, n, value) — the dashboard-feed shape a BI
    export job lands nightly. Each mart aggregates its operator's
    output (already exact-decimal); the oracle composes the SAME
    three oracle CTEs, so the whole chain is value-checked
    end-to-end, not just its parts. Three independent subplans, one
    bounded union."""
    from proceso_de_etl_spark.operators.insights import (
        customer_rfm_segments,
        pareto_abc_classes,
        sales_growth_report,
    )

    rfm = (
        customer_rfm_segments(spark, sf_dir)
        .groupBy(F.col("rfm").cast("string").alias("key"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("monetary").cast("decimal(18,2)"))
            .cast("double")
            .alias("value"),
        )
        .select(F.lit("rfm_segment").alias("mart"), "key", "n", "value")
    )
    abc = (
        pareto_abc_classes(spark, sf_dir)
        .groupBy(F.col("abc_class").alias("key"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("revenue").cast("decimal(18,4)"))
            .cast("double")
            .alias("value"),
        )
        .select(F.lit("abc_class").alias("mart"), "key", "n", "value")
    )
    growth = (
        sales_growth_report(spark, sf_dir)
        .groupBy(F.col("y").cast("string").alias("key"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("revenue").cast("decimal(18,2)"))
            .cast("double")
            .alias("value"),
        )
        .select(F.lit("yearly_revenue").alias("mart"), "key", "n", "value")
    )
    return rfm.unionByName(abc).unionByName(growth)


def _analytics_mart_oracle() -> str:
    from proceso_de_etl_spark.operators.insights import ORACLES as INSIGHT_ORACLES

    return f"""
WITH {_subquery(INSIGHT_ORACLES["customer_rfm_segments"], "rfm_src")},
{_subquery(INSIGHT_ORACLES["pareto_abc_classes"], "abc_src")},
{_subquery(INSIGHT_ORACLES["sales_growth_report"], "growth_src")}
SELECT 'rfm_segment' AS mart, CAST(rfm AS VARCHAR) AS key, COUNT(*) AS n,
       CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) AS value
FROM rfm_src GROUP BY 2
UNION ALL
SELECT 'abc_class', abc_class, COUNT(*),
       CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE)
FROM abc_src GROUP BY 2
UNION ALL
SELECT 'yearly_revenue', CAST(y AS VARCHAR), COUNT(*),
       CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE)
FROM growth_src GROUP BY 2
"""


ORACLES["pipeline_analytics_mart"] = _analytics_mart_oracle()


QUERIES = {
    "pipeline_analytics_mart": pipeline_analytics_mart,
    "pipeline_clean_corpus": pipeline_clean_corpus,
    "pipeline_training_data": pipeline_training_data,
}
