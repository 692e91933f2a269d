"""Similarity search over the embedding column (SURVEY.md §2.3
T6-T7): brute-force cosine top-k as the exactness baseline, and a
random-hyperplane LSH bucketed variant as the scale path.

Scale: brute force is O(queries × corpus) — fine for a small query
set against a broadcastable corpus, wrong for all-pairs at 100 TB.
The LSH variant hashes each vector once into a 16-bit bucket
(deterministic pseudo-hyperplanes), so candidate generation is an
equi-join on the bucket id; re-ranking touches only bucket-mates.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from proceso_de_etl_spark.operators.dedup import dot_cosine, lsh_bucket_ctes, with_norm
from proceso_de_etl_spark.sources.catalog import load_table

ORACLES: dict[str, str] = {}

N_QUERIES = 20  # vec_id < 20 act as the query set
TOP_K = 5


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 — exact cosine top-k: broadcast the (small) query set
    against the corpus, window-rank per query. The corpus side never
    shuffles — at scale this is one scan + a per-query heap."""
    from pyspark.sql import Window as W

    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), F.col("norm").alias("qn")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"), F.col("norm").alias("cn")
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot_cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


ORACLES["ann_cosine_topk"] = f"""
WITH elems AS (
  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS norm FROM elems GROUP BY vec_id),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         SUM(q.x * c.x) / (nq.norm * nc.norm) AS cosine
  FROM elems q
  JOIN elems c ON q.i = c.i AND q.vec_id <> c.vec_id
  JOIN norms nq ON nq.vec_id = q.vec_id
  JOIN norms nc ON nc.vec_id = c.vec_id
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY q.vec_id, c.vec_id, nq.norm, nc.norm
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""

N_TABLES = 16  # independent hash tables (union of candidates)
PLANES_PER_TABLE = 5  # 2^5 = 32 buckets per table
EMB_DIM = 64


def _plane_weights(table: int, n_planes: int = PLANES_PER_TABLE, dim: int = EMB_DIM) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes: sign of
    md5(table, plane, dim). Engine-independent and seed-free."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"plane:{table}:{j}:{i}".encode()).hexdigest()
            row.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def hyperplane_bucket(emb_col, planes: list[list[float]]):
    """Bucket id within one table: bit j = sign of <x, w_j>."""
    bucket = F.lit(0).cast("bigint")
    for j, w in enumerate(planes):
        warr = F.array(*[F.lit(v) for v in w])
        dot = F.aggregate(
            F.zip_with(emb_col, warr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return bucket


def with_lsh_tables(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """Explode each vector into (table_idx, bucket) rows — multi-table
    LSH: a close pair only needs to agree in ONE table, so recall
    compounds: miss = prod_t (1 - p_match^planes). One table with
    more bits has near-zero recall on sparse data (measured: 1/100
    at 12 bits / 500 vectors)."""
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("table_idx"),
                hyperplane_bucket(F.col(col), _plane_weights(t)).alias("bucket"),
            )
            for t in range(N_TABLES)
        ]
    )
    return emb.withColumn("tb", F.explode(buckets)).select(
        "*", F.col("tb.table_idx").alias("table_idx"), F.col("tb.bucket").alias("bucket")
    ).drop("tb")


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 — LSH-bucketed ANN: hash into N_TABLES independent bucket
    tables, equi-join per (table, bucket), dedup candidates, re-rank
    exactly within candidates. Value-oracled: the ±1 planes are
    md5-derived (portable), so DuckDB replays buckets → candidates →
    exact re-rank; recall stays probabilistic in general, but for
    the FIXED plane family the output is deterministic
    (ann_cosine_topk remains the exact-recall twin)."""
    from pyspark.sql import Window as W

    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    tabled = with_lsh_tables(emb)
    queries = tabled.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table_idx", "bucket"
    )
    corpus = tabled.select(F.col("vec_id").alias("neighbor_id"), "table_idx", "bucket")
    candidates = (
        corpus.join(F.broadcast(queries), ["table_idx", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), F.col("norm").alias("qn"))
    cv = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"), F.col("norm").alias("cn"))
    scored = (
        candidates.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", dot_cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


ORACLES["ann_lsh_bucketed"] = f"""
WITH {lsh_bucket_ctes(N_TABLES, PLANES_PER_TABLE, EMB_DIM)},
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM buckets q JOIN buckets c
    ON q.table_idx = c.table_idx AND q.bucket = c.bucket
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
scored AS (
  SELECT cd.query_id, cd.neighbor_id,
         SUM(q.x * c.x) / (nq.norm * nc.norm) AS cosine
  FROM cand cd
  JOIN elems q ON q.vec_id = cd.query_id
  JOIN elems c ON c.vec_id = cd.neighbor_id AND c.i = q.i
  JOIN norms nq ON nq.vec_id = cd.query_id
  JOIN norms nc ON nc.vec_id = cd.neighbor_id
  GROUP BY 1, 2, nq.norm, nc.norm
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""


N_LISTS = 16  # IVF coarse-quantizer cells (k-means centroids)
N_PROBE = 4  # cells scanned per query


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7b — IVF (inverted-file) ANN, the other standard scale path
    next to LSH: a k-means coarse quantizer (N_LISTS centroids, held
    on the driver — k × dim doubles) partitions the corpus into
    inverted lists with ONE assignment scan; each query probes only
    its N_PROBE nearest lists and re-ranks exactly inside them.

    Scale shape: the corpus is touched twice (assign once, then only
    ~N_PROBE/N_LISTS of it per query batch via the list_id equi-join)
    — never an all-pairs join; the probe set is queries × N_PROBE
    rows, broadcastable. Deterministic end-to-end: k-means init is
    the k lowest vec_ids and ties break on list id, so the same data
    always builds the same index. (Rows-only: recall is approximate
    by construction; ann_cosine_topk is the exact twin and the
    recall test pins this variant against it.)"""
    from proceso_de_etl_spark.operators.ml import assign_clusters, kmeans_fit

    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    centroids = kmeans_fit(emb, k=N_LISTS, n_iter=3)
    corpus = assign_clusters(emb, centroids).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cn"),
        F.col("cluster").alias("list_id"),
    )
    return ivf_search(corpus, emb.filter(F.col("vec_id") < N_QUERIES), centroids)


def ivf_search(
    corpus_assigned: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    n_probe: int = N_PROBE,
) -> DataFrame:
    """The probe-and-rerank half of IVF, shared by T7b and T50:
    queries (with ``norm``) explode to their n_probe nearest cells,
    the equi-join on list_id touches only those inverted lists, exact
    cosine re-ranks inside them. `corpus_assigned` carries
    (neighbor_id, ce, cn, list_id). Raising n_probe is the standard
    recall knob when the quantizer has drifted from the data (T50's
    report detects it; probing more cells buys recall at linear
    scan-cost until the scheduled refit)."""
    from pyspark.sql import Window as W

    from proceso_de_etl_spark.operators.ml import _sq_dist

    cells = F.array(
        *[
            F.struct(_sq_dist(F.col("embedding"), c).alias("d"), F.lit(i).cast("bigint").alias("c"))
            for i, c in enumerate(centroids)
        ]
    )
    probes = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("norm").alias("qn"),
            F.explode(F.slice(F.array_sort(cells), 1, n_probe)).alias("p"),
        )
        .select("query_id", "qe", "qn", F.col("p.c").alias("list_id"))
    )
    scored = (
        corpus_assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot_cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def ann_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T50 — incremental IVF index maintenance: a new embedding batch
    (odd vec_ids) joins an index whose coarse quantizer was fitted on
    the EXISTING corpus only (even vec_ids) — one assignment scan of
    the batch, NO refit, no touch of the already-indexed corpus. This
    is how a growing 100 TB corpus stays searchable between periodic
    re-trainings: batch inserts are O(batch), and the only global
    work ever needed is the scheduled quantizer refresh.

    The report is the index-health view that decides WHEN to refresh:
    per-list corpus/batch occupancy plus each side's mean distance to
    its centroid — batch mean-distance drifting above the corpus's
    means the quantizer no longer fits the data distribution.
    (Rows-only: float distances; the unit test pins that searching
    the MERGED index keeps recall vs the exact twin, i.e. new
    vectors are retrievable immediately.)"""
    from proceso_de_etl_spark.operators.ml import _sq_dist, assign_clusters, kmeans_fit

    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    centroids = kmeans_fit(corpus, k=N_LISTS, n_iter=3)
    dists = F.array(*[_sq_dist(F.col("embedding"), c) for c in centroids])

    def side_stats(df: DataFrame, label: str) -> DataFrame:
        return (
            assign_clusters(df, centroids)
            .withColumn("d", F.array_min(dists))
            .groupBy(F.col("cluster").alias("list_id"))
            .agg(
                F.count("*").alias(f"n_{label}"),
                F.round(F.avg("d"), 4).alias(f"mean_dist_{label}"),
            )
        )

    return (
        side_stats(corpus, "corpus")
        .join(side_stats(batch, "batch"), "list_id", "full_outer")
        .select(
            "list_id",
            F.coalesce("n_corpus", F.lit(0)).alias("n_corpus"),
            F.coalesce("n_batch", F.lit(0)).alias("n_batch"),
            "mean_dist_corpus",
            "mean_dist_batch",
        )
        .orderBy("list_id")
    )


PQ_M = 4  # subspaces (64-dim embedding → 16 dims each)
PQ_K = 16  # codebook size per subspace (4-bit codes)
PQ_RERANK = 80  # ADC candidates re-ranked exactly per query (recall 0.87 vs exact at gate SF; 50 gave 0.79)


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7c — product-quantization ANN (asymmetric distance
    computation), the compression-side scale path next to LSH (T7)
    and IVF (T7b): vectors are L2-normalized, each 64-dim vector is
    encoded as PQ_M 4-bit codes (argmin against a per-subspace
    k-means codebook), and candidate scoring reads PQ_M table lookups
    per pair instead of 64 multiplies — at 100 TB the encoded corpus
    is ~32× smaller than the float vectors (4 bytes of codes vs 256
    of floats) and the scan is memory-bandwidth-, not FLOP-, bound.
    Queries keep full precision: each computes its own K×M distance
    table (the "asymmetric" in ADC), candidates rank by summed
    lookups, and the top PQ_RERANK re-rank with exact cosine.

    All JVM-side: codebooks are driver-held literals
    (M × K × dim/M doubles), encoding is one scan of array
    expressions, the ADC scan joins the code table against the
    broadcast query set. Deterministic like IVF (k-means init =
    lowest vec_ids). (Rows-only: lossy by construction; the recall
    test pins it against ann_cosine_topk.)"""
    from pyspark.sql import Window as W

    from proceso_de_etl_spark.operators.ml import _sq_dist, kmeans_fit

    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    emb = emb.withColumn(
        "ne", F.transform(F.col("embedding"), lambda x: x.cast("double") / F.col("norm"))
    )
    dim = len(emb.select("embedding").first()[0])
    sub = dim // PQ_M
    subcol = lambda m: F.slice(F.col("ne"), m * sub + 1, sub)  # noqa: E731

    codebooks = [
        kmeans_fit(
            emb.select("vec_id", subcol(m).alias("sub")), k=PQ_K, n_iter=3, emb_col="sub"
        )
        for m in range(PQ_M)
    ]

    def _code(m: int) -> F.Column:
        dists = F.array(*[_sq_dist(subcol(m), c) for c in codebooks[m]])
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cn"),
        *[_code(m).alias(f"code{m}") for m in range(PQ_M)],
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
        *[
            F.array(*[_sq_dist(subcol(m), c) for c in codebooks[m]]).alias(f"qtab{m}")
            for m in range(PQ_M)
        ],
    )
    adc = sum(
        F.element_at(F.col(f"qtab{m}"), F.col(f"code{m}") + 1) for m in range(PQ_M)
    )
    cand_w = W.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    candidates = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc", adc)
        .withColumn("cand_rk", F.row_number().over(cand_w))
        .filter(F.col("cand_rk") <= PQ_RERANK)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        candidates.withColumn(
            "cosine", dot_cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


IVFPQ_N_PROBE = 6  # cells scanned per query (of N_LISTS; >T7b's 4 to offset PQ loss)
IVFPQ_RERANK = 120  # deeper than T7c's 80: the cell-pruned ADC ranking is noisier


def _ivfpq_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared builder for T7d (IVF×PQ): the ADC-scored candidate set
    read from the PROBED CELLS ONLY — split out so the scale test can
    count the rows the scan actually touches (must be well under
    queries × corpus, the plain-PQ scan size)."""
    from proceso_de_etl_spark.operators.ml import _sq_dist, assign_clusters, kmeans_fit

    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    emb = emb.withColumn(
        "ne", F.transform(F.col("embedding"), lambda x: x.cast("double") / F.col("norm"))
    )
    dim = len(emb.select("embedding").first()[0])
    sub = dim // PQ_M
    subcol = lambda m: F.slice(F.col("ne"), m * sub + 1, sub)  # noqa: E731

    centroids = kmeans_fit(emb, k=N_LISTS, n_iter=3)
    codebooks = [
        kmeans_fit(
            emb.select("vec_id", subcol(m).alias("sub")), k=PQ_K, n_iter=3, emb_col="sub"
        )
        for m in range(PQ_M)
    ]

    def _code(m: int) -> F.Column:
        dists = F.array(*[_sq_dist(subcol(m), c) for c in codebooks[m]])
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    corpus = assign_clusters(emb, centroids).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cn"),
        F.col("cluster").alias("list_id"),
        *[_code(m).alias(f"code{m}") for m in range(PQ_M)],
    )
    cells = F.array(
        *[
            F.struct(_sq_dist(F.col("embedding"), c).alias("d"), F.lit(i).cast("bigint").alias("c"))
            for i, c in enumerate(centroids)
        ]
    )
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("norm").alias("qn"),
            *[
                F.array(*[_sq_dist(subcol(m), c) for c in codebooks[m]]).alias(f"qtab{m}")
                for m in range(PQ_M)
            ],
            F.explode(F.slice(F.array_sort(cells), 1, IVFPQ_N_PROBE)).alias("p"),
        )
        .select(
            "query_id",
            "qe",
            "qn",
            *[f"qtab{m}" for m in range(PQ_M)],
            F.col("p.c").alias("list_id"),
        )
    )
    adc = sum(F.element_at(F.col(f"qtab{m}"), F.col(f"code{m}") + 1) for m in range(PQ_M))
    return (
        corpus.join(F.broadcast(probes), "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc", adc)
    )


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7d — IVF×PQ ANN, composing the two scale paths (the FAISS
    IVFPQ design point): the coarse quantizer prunes WHICH rows the
    scan touches (each query reads only its IVFPQ_N_PROBE nearest
    cells ≈ N_PROBE/N_LISTS of the corpus), and product quantization
    shrinks WHAT each touched row costs (PQ_M 4-bit codes, table
    lookups instead of float dot products). Plain PQ (T7c) still
    reads the full code table per query batch — that is ADC's design
    point, but at 100 TB the scan itself becomes the bottleneck;
    cell-pruned ADC cuts it by ~N_PROBE/N_LISTS while the exact
    re-rank of the top IVFPQ_RERANK keeps the output quality (recall vs
    the exact twin pinned ≥0.85 in tests, candidate-scan size pinned
    < queries × corpus). Same determinism as T7b/T7c (k-means init =
    lowest vec_ids, lexicographic ties)."""
    from pyspark.sql import Window as W

    candidates = _ivfpq_candidates(spark, sf_dir)
    cand_w = W.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    shortlist = candidates.withColumn("cand_rk", F.row_number().over(cand_w)).filter(
        F.col("cand_rk") <= IVFPQ_RERANK
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        shortlist.withColumn(
            "cosine", dot_cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T30 — symmetric int8 embedding quantization: per-vector scale
    = 127/max|x|, codes = round(x·scale) ∈ [−127,127] — 4× smaller
    embedding storage (the standard serving/index compression next to
    PQ's 32×, but losslessly re-rankable to ~1e-2 cosine error).
    Everything is JVM array expressions in ONE scan — transform /
    array_max / zip_with, no Python, no shuffle; the output here is
    the per-vector audit (scale + max reconstruction error), which is
    what a quantization job must emit so downstream consumers can
    gate on error. round() ties go away from zero in BOTH engines
    (Spark HALF_UP, DuckDB ties-away), which is what makes the codes
    — and therefore the error column — engine-identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    absmax = F.array_max(F.transform(xd, lambda x: F.abs(x)))
    scale = F.when(absmax > 0, F.lit(127.0) / absmax).otherwise(F.lit(1.0))
    staged = emb.select("vec_id", xd.alias("xd"), scale.alias("scale"))
    codes = F.transform(F.col("xd"), lambda x: F.round(x * F.col("scale")).cast("int"))
    staged = staged.withColumn("codes", codes)
    err = F.array_max(
        F.zip_with(
            F.col("xd"), F.col("codes"), lambda x, q: F.abs(x - q.cast("double") / F.col("scale"))
        )
    )
    return staged.select(
        "vec_id",
        F.size("xd").alias("n_dims"),
        F.round(F.col("scale"), 6).alias("scale_r6"),
        F.aggregate(
            F.col("codes"), F.lit(0).cast("bigint"), lambda acc, q: acc + q.cast("bigint")
        ).alias("code_checksum"),
        F.round(err, 8).alias("max_err"),
    )


ORACLES["embedding_int8_quantize"] = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS absmax
  FROM embeddings
),
s AS (
  SELECT vec_id, xd,
         CASE WHEN absmax > 0 THEN 127.0 / absmax ELSE 1.0 END AS scale
  FROM e
),
c AS (
  SELECT vec_id, xd, scale,
         list_transform(xd, x -> CAST(round(x * scale) AS INT)) AS codes
  FROM s
)
SELECT vec_id,
       CAST(len(xd) AS INT) AS n_dims,
       ROUND(scale, 6) AS scale_r6,
       CAST(list_sum(codes) AS BIGINT) AS code_checksum,
       ROUND(list_max(list_transform(range(1, len(xd) + 1),
             i -> abs(xd[i] - CAST(codes[i] AS DOUBLE) / scale))), 8) AS max_err
FROM c
"""


SPARSE_TOPK = 5
SPARSE_N_QUERIES = 5
SPARSE_W_SCALE = 1_000_000


def ann_sparse_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T43 — sparse lexical top-k via an INVERTED INDEX (the BM25/
    TF-IDF retrieval shape — the other half of hybrid search next to
    T6's dense path): score(q,d) = Σ_t tf_q·tf_d·w(t) over shared
    terms, where w(t) = floor(1e6 / df(t)) — integer df-damped
    weights, so scores are exact BIGINTs with deterministic
    accumulation on any engine (a float idf would make the sum
    order-dependent; ln() itself differs between libm and the JVM in
    the last ulp).

    The scale shape IS the inverted index: postings = (term, doc, tf)
    from one corpus scan; candidate generation is the postings
    equi-join on term restricted to query terms — documents sharing
    no term with a query are never touched, which is why sparse
    retrieval over a 10⁹-doc corpus is feasible where dense
    brute-force is not. Stop-term pressure is bounded by the same
    DF-cap idea as decontamination (w(t) → 0 for df > 1e6 — here the
    damping itself kills ubiquitous terms)."""
    from pyspark.sql import Window as W

    from proceso_de_etl_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    postings = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = postings.groupBy("t").agg(
        F.floor(F.lit(SPARSE_W_SCALE) / F.countDistinct("doc_id")).cast("bigint").alias("w")
    )
    weighted = postings.join(dfreq, "t")
    qside = weighted.filter(F.col("doc_id") < SPARSE_N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "t", F.col("tf").alias("qtf")
    )
    scored = (
        weighted.join(qside, "t")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("qtf") * F.col("tf") * F.col("w")).cast("bigint").alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= SPARSE_TOPK)
        .select("query_id", "rank", F.col("doc_id").alias("neighbor_id"), "score")
    )


ORACLES["ann_sparse_tfidf_topk"] = f"""
WITH postings AS (
  SELECT doc_id, t, COUNT(*) AS tf
  FROM (SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
        FROM documents)
  GROUP BY doc_id, t
),
dfreq AS (
  SELECT t, CAST(FLOOR({SPARSE_W_SCALE} / COUNT(DISTINCT doc_id)) AS BIGINT) AS w
  FROM postings GROUP BY t
),
weighted AS (SELECT p.doc_id, p.t, p.tf, d.w FROM postings p JOIN dfreq d USING (t)),
scored AS (
  SELECT q.doc_id AS query_id, c.doc_id AS doc_id,
         CAST(SUM(q.tf * c.tf * c.w) AS BIGINT) AS score
  FROM weighted q JOIN weighted c USING (t)
  WHERE q.doc_id < {SPARSE_N_QUERIES} AND c.doc_id <> q.doc_id
  GROUP BY q.doc_id, c.doc_id
)
SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id AS neighbor_id, score
FROM scored
QUALIFY rank <= {SPARSE_TOPK}
"""


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "ann_sparse_tfidf_topk": ann_sparse_tfidf_topk,
    "embedding_int8_quantize": embedding_int8_quantize,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_pq_topk": ann_pq_topk,
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "ann_ivf_incremental": ann_ivf_incremental,
}
