#!/usr/bin/env python3
"""Stage-timing decomposition for dedup_semantic_semdedup and
ann_lsh_bucketed (r13 verdict item 7): both carry "documented design
cost" explanations that were never stage-verified. Each probe times a
prefix of the operator's own plan via the noop sink, so stage cost =
prefix[i] - prefix[i-1] up to plan-reuse noise; results merge into
SCALE_r{N}.json under "stage_timings" (the profile_bridge.py
pattern).

semdedup stages (dedup.py:1349): count -> fit (wall around the
driver-side k-means fit; two-level at sf>=1.0) -> assignment (the
persisted assigned frame) -> pair join + threshold -> full operator
(CC + keeper selection).

ann_lsh stages (similarity.py:195): hash/bucket pass (80 plane dots
per vector) -> candidate join + distinct -> full re-rank.

Usage: python profile_semdedup_lsh.py [round] [tier ...]
       tiers default to sf1.0 (derived, must exist)
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

TIERS = {
    "0.1": "/root/testdata/sf0.1",
    "1.0": "/tmp/spark_graft_derived/sf1.0",
    "10": "/tmp/spark_graft_derived/sf10",
}
REPS = 3


def _force(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def semdedup_stages(spark, sf_dir: str) -> dict:
    from proceso_de_etl_spark.operators import dedup
    from proceso_de_etl_spark.operators.dedup import (
        _subsplit_pair_cells,
        dot_cosine,
        semdedup_k,
        with_norm,
        SEMDEDUP_K,
        SEMDEDUP_TAU,
    )
    from proceso_de_etl_spark.operators.ml import (
        assign_clusters,
        assign_clusters_lsh,
        kmeans_fit,
        kmeans_fit_two_level,
    )

    out: dict[str, float] = {}
    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    t0 = time.perf_counter()
    n = emb.count()
    out["count"] = round(time.perf_counter() - t0, 3)
    k = semdedup_k(n)
    out["n"] = n
    out["k"] = k
    t0 = time.perf_counter()
    if k == SEMDEDUP_K:
        centroids = kmeans_fit(emb, k=k)
    else:
        centroids = kmeans_fit_two_level(emb, k)
    out["fit"] = round(time.perf_counter() - t0, 3)
    if k == SEMDEDUP_K:
        assigned = assign_clusters(emb, centroids).withColumn(
            "subsig", F.lit(0).cast("bigint")
        )
    else:
        assigned = assign_clusters_lsh(emb, centroids, with_subsig=True)
    out["assign"] = _force(assigned.select("vec_id", "cluster", "subsig"))
    if k == SEMDEDUP_K:
        with_pcell = assigned.withColumn("pcell", F.col("cluster"))
    else:
        with_pcell = _subsplit_pair_cells(assigned, len(centroids))
    with_pcell = with_pcell.persist()
    a = with_pcell.select(
        F.col("vec_id").alias("a"), "pcell",
        F.col("embedding").alias("ea"), F.col("norm").alias("na"),
    )
    b = with_pcell.select(
        F.col("vec_id").alias("b"), "pcell",
        F.col("embedding").alias("eb"), F.col("norm").alias("nb"),
    )
    pairs = (
        a.join(b, "pcell")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cosine",
            dot_cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")),
        )
        .filter(F.col("cosine") >= SEMDEDUP_TAU)
        .select("a", "b")
    )
    out["pair_join"] = _force(pairs)
    with_pcell.unpersist()
    t0 = time.perf_counter()
    dedup.dedup_semantic_semdedup(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    out["full_operator"] = round(time.perf_counter() - t0, 3)
    return out


def lsh_stages(spark, sf_dir: str) -> dict:
    from proceso_de_etl_spark.operators import similarity
    from proceso_de_etl_spark.operators.similarity import (
        N_QUERIES,
        with_lsh_tables,
        with_norm,
    )

    out: dict[str, float] = {}
    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    tabled = with_lsh_tables(emb)
    out["hash_pass"] = _force(tabled.select("vec_id", "table_idx", "bucket"))
    queries = tabled.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table_idx", "bucket"
    )
    corpus = tabled.select(
        F.col("vec_id").alias("neighbor_id"), "table_idx", "bucket"
    )
    candidates = (
        corpus.join(F.broadcast(queries), ["table_idx", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    out["candidates"] = _force(candidates)
    t0 = time.perf_counter()
    similarity.ann_lsh_bucketed(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    out["full_operator"] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    tiers = sys.argv[2:] or ["1.0"]
    spark = get_spark(app_name="profile_semdedup_lsh")
    from proceso_de_etl_spark import cachereg
    from proceso_de_etl_spark.operators import dedup, ml

    results: dict[str, dict] = {}
    for tier in tiers:
        sf_dir = TIERS[tier]
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            raise SystemExit(f"tier missing: {sf_dir} (run scale_curve first)")
        # warmup scan outside the timed region
        load_table(spark, sf_dir, "embeddings").write.mode("overwrite").format(
            "noop"
        ).save()
        sem_reps, lsh_reps = [], []
        for _ in range(REPS):
            sem_reps.append(semdedup_stages(spark, sf_dir))
            lsh_reps.append(lsh_stages(spark, sf_dir))
            dedup.unpersist_shingles()
            ml.unpersist_copurchase()
            cachereg.release_all()
            spark.catalog.clearCache()
        med = lambda key, reps: sorted(r[key] for r in reps)[(len(reps) - 1) // 2]  # noqa: E731
        results[tier] = {
            "dedup_semantic_semdedup": {
                k: med(k, sem_reps) for k in sem_reps[0]
            },
            "ann_lsh_bucketed": {k: med(k, lsh_reps) for k in lsh_reps[0]},
            "samples": {"semdedup": sem_reps, "lsh": lsh_reps},
        }
        print(json.dumps({"tier": tier, **{k: results[tier][k] for k in ("dedup_semantic_semdedup", "ann_lsh_bucketed")}}), flush=True)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"SCALE_r{rnd:02d}.json"
    )
    payload = json.load(open(path)) if os.path.exists(path) else {}
    payload.setdefault("stage_timings", {})["semdedup_lsh"] = results
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps({"artifact": os.path.basename(path), "tiers": list(results)}))


if __name__ == "__main__":
    main()
