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




# Frozen coarse quantizer for the driver-verifiable IVF companion:
# fit ONCE by ml.kmeans_fit (k=N_LISTS, 3 iters — same recipe as
# ann_ivf_topk) on the sf0.01 embeddings, rounded to 6dp so the
# literals parse to identical doubles in Spark and DuckDB. Same
# freeze-the-geometry move as dedup.SEMDEDUP_PINNED_CENTROIDS: the
# k-means FIT stays rows-only in ann_ivf_topk; this pins the
# probe-and-rerank half (ivf_search) to a value oracle.
IVF_PINNED_CENTROIDS: list[list[float]] = [
    [0.019524, 0.025106, 0.050597, -0.106388, 0.027263, -0.009795, -0.035729, 0.001011, 0.043619, -0.057394, -0.041875, -0.01767, -0.048797, -0.003956, -0.019706, -0.006786, 0.04346, 0.060503, 0.041406, 0.051916, -0.09569, 0.018694, 0.024474, -0.016613, -0.006437, 0.052921, 0.094825, -0.006842, -0.007379, 0.090711, -0.005817, 0.042709, -0.041065, -0.032083, 0.009548, -0.029096, 0.013294, 0.016034, 0.029841, -0.010427, 0.00638, 0.015345, -0.01348, 0.022606, -0.023343, 0.046399, 0.022186, -0.073476, 0.012618, -0.021085, 0.00656, 0.014029, 0.00703, -0.037574, 0.064884, 0.005139, -0.014345, -0.011271, -0.08253, -0.033253, -0.016412, 0.01538, 0.035205, -0.053874],
    [-0.042974, 0.034698, 0.013603, -0.020418, -0.002822, -0.010402, -0.066478, -0.020484, -0.003278, -0.006862, -0.075064, 0.073309, 0.098382, -0.033414, 0.039219, 0.010503, -0.03814, -0.033773, 0.029224, -0.05062, 0.001704, 0.049023, 0.036174, -0.047504, 0.034528, 0.05562, -0.015432, -0.060309, 0.00887, 0.03514, -0.00161, -0.015455, -0.059988, -0.021081, -0.030103, 0.062478, -0.067459, -0.009962, 0.020955, -0.125774, -0.001787, -0.060388, 0.065797, 0.044299, 0.017649, 0.01027, -0.05122, -0.002962, -0.090271, -0.073005, -0.015397, 0.009057, 0.00291, 0.014697, -0.000823, 0.054055, 0.055748, -0.032064, -0.006407, 0.012128, -0.036614, -0.003601, -0.045204, -0.04261],
    [-0.007088, -0.005922, -0.023553, 0.061469, 0.044531, -0.033847, -0.000507, -0.03731, -0.016517, -0.100314, -0.010748, 0.028113, -0.036502, 0.072885, 0.027934, 0.036935, -0.003545, 0.064546, -0.047236, -0.041448, 0.02191, 0.037695, 0.050099, -0.018939, -0.002662, -0.05579, -0.00598, -0.027943, 0.027281, -0.004479, -0.002965, -0.04584, -0.01324, 0.00258, -0.000584, 0.01082, 0.021775, 0.062543, 0.029563, 0.075524, 0.038672, -0.00323, 0.035246, 0.007147, -0.002291, -0.007428, 0.000251, -0.006859, 0.052121, 0.026949, 0.0359, -0.017117, -0.01257, -0.053767, 0.026487, 0.06317, 0.030176, -0.058163, -0.009202, 0.067958, 0.029602, 0.036856, 0.016589, -0.012753],
    [-0.014841, 0.069213, 0.024891, 0.017049, 0.027268, -0.003339, 0.026019, -0.010579, -0.026293, 0.019942, 0.017667, 0.041952, 0.022049, 0.102264, 0.045558, 0.012622, -0.013745, 0.000257, -0.006473, 0.029732, -0.015008, 0.012907, -0.005976, 0.029208, -0.000814, 0.035468, -0.012187, -0.019187, -0.061251, -0.034596, -0.016675, -0.00477, 0.048842, 0.011114, -0.048747, -0.004964, -0.004954, 0.008051, -0.014283, -0.024985, -0.023631, -0.049941, -0.085837, -0.031799, -0.000198, -0.027135, -0.012615, -0.057124, 0.112258, -0.088358, -0.004501, -0.037161, -0.008317, 0.060714, -0.020541, -0.025981, 0.017526, -0.037944, 0.006298, -0.070798, 0.048205, -8e-05, -0.003873, -0.073352],
    [-0.010532, -0.025881, 0.065571, 0.007623, -0.035214, -0.122202, 0.070082, 0.058972, -0.019324, 0.038273, 0.064141, -0.033891, 0.013383, -0.057173, -0.015489, 0.002654, 0.026476, 0.017122, -0.018403, 0.057396, -0.039809, 0.012181, -0.017583, 0.000834, -0.042112, -0.020886, 0.031459, -0.011557, 0.022914, -0.015108, 0.02593, 0.015719, 0.050642, -0.002819, 0.001651, -0.02709, -0.003015, -0.053336, -0.042919, 0.033451, 0.014103, -0.013366, -0.080209, 0.050056, -0.033652, 0.03579, -0.059904, 0.093152, -0.068511, -0.020711, 0.037005, 0.039524, 0.029119, 0.025076, 0.097673, -0.024723, 0.025471, -0.046647, 0.021327, -0.016076, -0.041702, -0.000477, 0.024588, -0.028674],
    [0.003929, -0.053396, 0.052515, -0.003294, 0.074026, -0.036935, -0.037532, 0.105768, -0.042479, 0.049863, -0.02605, 0.02679, 0.025237, 0.046886, -0.009051, -0.002618, 0.028335, -0.074699, -0.075892, 0.046047, 0.000285, -0.007124, 0.032736, 0.023572, 0.035796, -0.006936, -0.054954, 0.008548, 0.010099, 0.034925, 0.067053, -0.035049, 0.016683, 0.000638, -0.00638, 0.043037, 0.020924, 0.064133, -0.035431, 0.008, -0.068945, 0.002068, -0.033804, 0.031346, -0.071589, -0.053044, -0.002192, -0.016525, -0.007844, 0.001813, 0.065566, 0.038632, -0.006472, 0.046464, -0.068028, -0.065572, 0.005772, -0.054277, -0.01632, 0.012376, -0.005596, 0.019315, -0.026456, 0.052842],
    [0.019433, -0.038333, -0.010362, -0.04242, 0.017574, 0.060309, -0.024778, -0.041768, -0.006616, 0.015941, 0.084868, -0.016734, 0.007655, 0.050497, -0.048831, 0.051931, 0.011606, 0.104353, -0.050758, -0.030553, -0.004768, -0.007602, -0.024538, -0.083503, -0.046872, -0.047486, -0.003219, 0.037014, 0.032105, -0.01859, -0.006174, 0.013866, -0.031887, -0.077368, -0.011684, 0.06199, 0.037098, -0.033546, 0.018712, -0.04235, 0.029585, -0.052935, 0.003211, -0.038907, 0.037388, 0.032979, 0.04544, 0.072461, 0.020151, 0.028, -0.007131, 0.008131, 0.054646, -0.034181, -0.007923, 0.051225, -0.039362, 0.038608, 0.013411, -0.046317, 0.041915, -0.004213, 0.013793, 0.017421],
    [0.109832, 0.024602, -0.006681, 0.05454, -0.030654, 0.023396, -0.008013, 0.096602, -0.038959, 0.009047, 0.048082, 0.036626, -0.033825, -0.080041, -0.01847, 0.003849, -0.023484, -0.00131, -0.007343, 0.029548, -0.021031, 0.007065, 0.005507, 0.024395, -0.002628, -0.03869, -0.049388, 0.061538, -0.017867, 0.0357, 0.098259, 0.047082, -0.034845, -1.1e-05, -0.015752, 0.03021, -0.059872, -0.037898, 0.023384, -0.018897, -0.006939, -0.028289, -0.001738, -0.035196, -0.013552, 0.051697, -0.005421, 0.090495, -0.040097, -0.002989, 0.062086, -0.000977, 0.003384, 0.005752, -0.014299, 0.024509, 0.008233, 0.001369, -0.120498, -0.004712, 0.020766, -0.025266, -0.002964, -0.103616],
    [-0.049492, -0.07951, -0.028592, 0.034046, 0.008504, 0.071928, -0.011697, 0.020485, 0.003208, 0.058431, -0.071118, 0.066633, -0.038022, 0.010873, 0.013574, 0.075127, 0.04419, -0.03833, 0.050055, 0.008174, 0.039799, -0.038248, -0.005975, -0.036887, -0.056515, 0.054944, 0.024868, 0.010711, 0.013557, -0.088952, -0.022917, -0.023877, 0.01009, -0.017801, 0.065299, -0.033185, 0.002352, 0.01882, 0.046705, 0.00962, -0.022238, -0.027036, -0.026934, 0.022617, -0.017156, -0.040849, 0.011897, -0.0253, -0.040771, -0.037255, 0.023409, -0.016468, -0.048101, 0.029586, 0.027248, -0.022345, -0.018803, 0.074945, 0.069913, -0.05437, -0.04865, 0.006214, -0.012675, -0.020023],
    [0.040425, -0.023501, -0.048704, 0.015981, 0.01035, 0.013709, -0.074173, 0.060905, -0.022171, 0.023641, 0.039553, -0.051775, -0.035931, 0.021439, -0.024837, -0.038578, -0.042183, 0.058574, -0.021086, -0.026791, 0.004425, -0.052984, 0.039255, 0.05965, -0.037786, -0.016091, -0.070569, 0.055621, -0.0259, 0.002579, -0.029831, -0.038008, -0.021818, 0.018817, 0.10887, 0.022511, -0.171209, 0.030027, 0.052652, 0.053941, -0.078949, 0.03329, 0.12724, 0.050092, 0.009592, 0.012866, -0.007238, -0.031392, -0.032334, -0.047285, 0.023875, 0.036952, -0.035693, 0.044059, 0.010119, 0.027323, 0.014644, -0.007227, -0.000801, -0.027425, -0.007912, -0.001186, -0.001068, 0.012305],
    [0.024004, -0.012596, -0.075409, -0.011625, -0.043227, 0.022315, -0.007218, 0.030376, 0.037237, -0.015064, 0.001669, -0.074845, -0.003215, -0.031501, 0.015165, -0.045905, -0.042386, 0.007496, 0.029904, -0.029785, -0.007851, 0.003228, -0.024914, 0.004429, 0.037943, 0.100436, -0.031797, 0.034212, -0.040301, 0.058669, -0.100302, 0.040972, 0.073872, -0.05946, -0.032831, -0.005346, 0.038358, 0.013715, -0.036374, 0.0428, -0.024867, -0.068905, -0.0278, 0.022463, -0.020015, 0.0208, 0.015342, -0.00641, 0.018999, 0.079146, 0.066899, -0.032498, 0.042473, -0.004703, -0.016203, -0.035466, 0.098444, 0.006391, 0.031149, -0.005861, 0.040799, -0.044246, -0.043479, -0.010589],
    [0.014719, -0.021641, -0.025138, 0.00617, 0.019909, 0.038366, -0.040283, -0.03885, 0.034903, -0.011209, 0.036056, -0.029413, 0.014441, 0.032947, -0.025369, -0.013112, 0.037338, 0.016664, 0.005283, 0.013519, -0.065292, -0.081098, 0.041102, -0.019777, 0.016474, -0.016681, 0.038665, 0.091913, -0.027376, -0.020671, 0.003505, -0.015727, 0.06076, -0.059624, 0.005843, -0.020686, -0.003515, -0.029322, -0.057487, -0.022168, 0.047002, 0.055149, 0.054776, -0.009691, 0.038317, -0.045759, -0.033566, -0.03053, 0.061226, 0.015534, -0.060969, -0.036251, 0.053866, 0.023105, 0.036407, -0.007688, -0.02688, 0.054054, -0.009395, -0.02193, 0.013225, 0.052834, 0.068129, 0.110776],
    [0.015259, -0.065645, 0.037551, -0.030618, 0.048543, 0.082203, -0.047363, -0.044604, 0.056537, 0.017247, 0.037059, 0.031955, 0.010658, 0.010312, 0.066365, -0.030828, 0.013078, -0.112579, -0.058648, -0.032604, 0.015606, 0.059474, -0.003123, -0.017879, 0.017001, 0.075869, 0.022642, 0.016754, -0.049658, -0.034583, 0.062962, -0.01583, -0.005959, 0.002558, 0.026144, -0.015326, -0.009849, -0.043909, 0.011174, 0.050964, 0.011215, 0.010479, -0.031609, 0.009079, 0.014385, 0.034168, -0.017987, 0.045859, -0.047687, -0.019475, -0.041236, -0.000884, 0.101271, -0.034578, -0.010709, 0.006355, -0.051502, -0.042065, 0.071415, -0.012943, 0.043184, 0.07417, -0.040208, -0.073125],
    [-0.004882, 0.028823, 0.043682, 0.002194, 0.047921, 0.043997, -0.07281, 0.010292, 0.003143, -0.061779, 0.059388, -0.000246, -0.009525, -0.077539, -0.026346, 0.010968, 0.009041, 0.026431, 0.026947, -0.059018, 0.073646, 0.033733, -0.026052, -0.026129, 0.022153, -0.018489, 0.032754, 0.052006, 0.066101, -0.014064, -0.025142, -0.003388, 0.014564, 0.071165, 0.020364, 0.004732, 0.010834, 0.080026, 0.0201, -0.025177, 0.000352, -0.032555, -0.004955, -0.072179, -0.077087, -0.011441, 0.034681, 0.001179, -0.023263, -0.058805, -0.026398, 0.00503, -0.054592, -0.034792, -0.024087, -0.020548, -0.042489, 0.022041, -0.003672, 0.036179, -0.010756, 0.005691, -0.030239, 0.053],
    [-0.041254, 0.06179, 0.003202, -0.047494, -0.050884, 0.023604, -0.019681, 0.019798, 0.004345, 0.12498, -0.052769, -0.023518, 0.03463, 0.003322, 0.026572, 0.073754, 0.007442, -0.015953, 0.036135, 0.005158, 0.035131, -0.019889, -0.043627, 0.067032, -0.023444, 0.040097, -0.021142, -0.01073, 0.01127, 0.006105, -0.014969, 0.007354, 0.034342, 0.089618, 0.049865, -0.018907, 0.059486, -0.12386, -0.079288, 0.014465, 0.012562, 0.049306, 0.092092, 0.039959, -0.064541, -0.041505, -0.005708, 0.024315, 0.00485, 0.00981, -0.008012, 0.019044, 0.038641, -0.030291, 0.049374, 0.020456, -0.022159, 0.048841, -0.084465, 0.036025, -0.065801, -0.061915, 0.024613, -0.003186],
    [-0.045673, 0.019684, -0.030644, -0.025971, -0.023336, -0.047689, 0.035309, -0.070028, -0.040336, -0.080539, -0.025885, -0.03195, -0.045094, -0.021648, -0.037163, -0.066846, -0.023563, 0.001843, 0.055477, 0.041603, -0.013049, -0.015397, 0.010436, -0.025487, 0.024173, 0.016906, -0.03584, -0.065978, -0.00424, -0.01611, 0.062688, -0.087178, 0.027376, -0.008167, -0.015093, -0.066496, -0.027268, -0.038181, -0.023179, -0.016242, 0.034376, 0.043569, 0.034755, -0.074558, 0.041272, 0.038, 0.026265, 0.009776, -0.007441, 0.045891, -0.030269, -0.03709, -0.018905, -0.079541, -0.051592, -0.081478, 0.040508, -0.002267, 0.0241, 0.008, -0.031316, 0.011603, 0.022506, -0.02239],
]


def ann_ivf_pinned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7b companion — IVF probe-and-rerank made driver-verifiable:
    identical plan to ``ann_ivf_topk`` (one assignment scan against
    broadcast centroids, per-query explode to the N_PROBE nearest
    cells, list_id equi-join, exact-cosine re-rank to TOP_K) but
    against the FROZEN quantizer ``IVF_PINNED_CENTROIDS``, so DuckDB
    can replay assignment, probe selection, and re-rank
    value-for-value. Cell-boundary float safety is measured, not
    assumed: tests/test_properties.py asserts the minimum gap
    between every query's N_PROBE-th and (N_PROBE+1)-th nearest cell
    distance and between corpus argmin gaps, orders above double
    reassociation error. The iterative FIT itself stays rows-only in
    the parent key — exactly the split the SemDeDup pair, so the
    quantizer-freshness question (T50) remains the operator family's
    own concern."""
    from proceso_de_etl_spark.operators.ml import assign_clusters

    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    corpus = assign_clusters(emb, IVF_PINNED_CENTROIDS).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cn"),
        F.col("cluster").alias("list_id"),
    )
    return ivf_search(
        corpus, emb.filter(F.col("vec_id") < N_QUERIES), IVF_PINNED_CENTROIDS
    )


def _ivf_pinned_oracle_sql() -> str:
    vals = ",\n         ".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join(repr(v) for v in c))
        for i, c in enumerate(IVF_PINNED_CENTROIDS)
    )
    return f"""
WITH elems AS (
  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS norm FROM elems GROUP BY vec_id),
cents(list_id, w) AS (
  VALUES {vals}
),
centel AS (SELECT list_id, unnest(range(1, len(w) + 1)) AS i, unnest(w) AS cx FROM cents),
dists AS (
  SELECT e.vec_id, ce.list_id, SUM((e.x - ce.cx) * (e.x - ce.cx)) AS d2
  FROM elems e JOIN centel ce ON ce.i = e.i GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, CAST(list_id AS BIGINT) AS list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
    FROM dists
  ) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS query_id, CAST(list_id AS BIGINT) AS list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
    FROM dists WHERE vec_id < {N_QUERIES}
  ) WHERE rn <= {N_PROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM qprobe p JOIN assign a ON a.list_id = p.list_id
  WHERE a.vec_id <> p.query_id
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


ORACLES["ann_ivf_pinned_topk"] = _ivf_pinned_oracle_sql()


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
    "ann_ivf_pinned_topk": ann_ivf_pinned_topk,
    "ann_pq_topk": ann_pq_topk,
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "ann_ivf_incremental": ann_ivf_incremental,
}
