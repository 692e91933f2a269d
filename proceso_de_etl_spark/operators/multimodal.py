"""Multimodal column plumbing (SURVEY.md §2.3 T12).

Images/audio/video are opaque ``binary`` columns plus a typed
metadata struct; per-batch feature extraction runs through
``mapInPandas`` (Arrow batches — the shape real multimodal decode
takes on Spark). The container has no image/audio libs, so the
decode step is STUBBED: a deterministic byte-level featureizer
stands in, and the real-codec branch raises NotImplementedError
loudly rather than faking support.

Scale: mapInPandas streams Arrow batches — constant memory per task
regardless of corpus size; binary payloads never pass through a
Python row object. Partitioning stays whatever the scan produced
(no shuffle is introduced).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from proceso_de_etl_spark.sources.catalog import load_table

ORACLES: dict[str, str] = {}

_FORMATS = ("png", "wav", "mp4")
_STUB_FORMATS = set(_FORMATS)  # formats the deterministic stub accepts

# The operator's natural schema: hist is a typed array<double>
# (mapInPandas ships it through Arrow natively; numeric consumers
# read it directly). Stringification for comparators that cannot
# hash list cells (the driver's gate canonicalizer — the landmine
# array_function_matrix hit in relational.py) happens ONLY in the
# registered contract query, at the boundary, not here.
FEATURE_SCHEMA = (
    "doc_id bigint, fmt string, n_bytes bigint, byte_mean double, hist array<double>"
)


def make_feature_extractor(stub_formats: frozenset[str]):
    """Build the per-Arrow-batch feature extractor as a CLOSURE so
    cloudpickle ships it by value — a module-level function would be
    pickled by reference and fail to import on workers whose
    PYTHONPATH the host session didn't set (e.g. an external driver
    process). Deterministic stand-in for decode: byte length, mean
    byte value, 8-bin byte histogram (normalized). A real deployment
    swaps the body per format (PIL/librosa/pyav) — the Spark-side
    contract stays identical."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # worker-side imports, self-contained
        import pandas as pd

        for pdf in batches:
            bad = set(pdf["fmt"]) - stub_formats
            if bad:
                raise NotImplementedError(
                    f"decode for formats {sorted(bad)!r} requires codec libs not in this image"
                )
            # vectorized per payload: the per-byte work runs in numpy C
            # loops (frombuffer is zero-copy; bincount is one pass), not
            # Python bytecode — ~100x over a per-byte Python loop, which
            # is the difference between plumbing and bottleneck at 100 TB
            # of media. Row iteration remains (payloads are ragged), but
            # per-row cost is O(1) Python + O(n_bytes) C.
            out = []
            for doc_id, fmt, payload in zip(pdf["doc_id"], pdf["fmt"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = arr.size
                total = float(n) if n else 1.0
                hist = np.bincount(arr >> 5, minlength=8).astype(np.float64) / total
                out.append(
                    {
                        "doc_id": doc_id,
                        "fmt": fmt,
                        "n_bytes": int(n),
                        # exact: integer byte sum, one float division
                        "byte_mean": (int(arr.sum(dtype=np.int64)) / total) if n else 0.0,
                        "hist": hist.tolist(),
                    }
                )
            yield pd.DataFrame(out, columns=["doc_id", "fmt", "n_bytes", "byte_mean", "hist"])

    return extract


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: binary payload (here: utf-8 text
    bytes standing in for media bytes) + typed metadata struct."""
    fmt = F.element_at(F.array(*[F.lit(f) for f in _FORMATS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        fmt.alias("fmt"),
        F.struct(
            F.length("text").cast("bigint").alias("n_chars"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def extract_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12 — binary column → Arrow-batched feature extraction, typed
    result (``hist`` is array<double>). This is the operator a
    downstream numeric consumer calls."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    return media.select("doc_id", "fmt", "payload").mapInPandas(
        make_feature_extractor(frozenset(_STUB_FORMATS)), schema=FEATURE_SCHEMA
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12 contract query — the typed operator with ``hist``
    stringified AT THE GATE BOUNDARY only (the driver's pandas
    canonicalizer cannot hash list cells). Java's double→string is
    shortest-round-trip, so the text is exact and deterministic; the
    unit test parses it back against the typed values. (Rows-only:
    the mapInPandas plumbing has no SQL equivalent.)"""
    return extract_media_features(spark, sf_dir).withColumn(
        "hist",
        F.array_join(F.transform("hist", lambda v: v.cast("string")), ","),
    )


FRAME_BYTES = 256  # stub "frame" size
FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, n_frames bigint, frame_bytes bigint, frame_md5 string"
)


def make_frame_sampler(frame_bytes: int, stride: int):
    """Per-Arrow-batch frame sampler (closure, shipped by value).
    Stands in for video/audio frame extraction: the payload is cut
    into fixed-size 'frames' and every ``stride``-th frame is kept —
    the 1-row-in, N-rows-out shape real frame sampling has. A real
    deployment swaps the slicer for pyav/ffmpeg frame decode; the
    Spark contract (mapInPandas, output cardinality > input, frame
    index + digest per row) is identical."""

    def sample(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, stride):
                    frame = data[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "n_frames": n_frames,
                            "frame_bytes": len(frame),
                            "frame_md5": hashlib.md5(frame).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "n_frames", "frame_bytes", "frame_md5"]
            )

    return sample


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12b — frame sampling plumbing: binary payload → every 4th
    256-byte 'frame' with a content digest. Exercises the expanding
    (1 → N rows) mapInPandas shape that real video frame extraction
    uses; partitioning stays whatever the scan produced. (Rows-only:
    byte-slice frames of multibyte text have no clean SQL twin; the
    unit test pins golden values.)"""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    return media.select("doc_id", "payload").mapInPandas(
        make_frame_sampler(FRAME_BYTES, FRAME_STRIDE), schema=FRAME_SCHEMA
    )


AUDIO_WIN = 1024  # samples per RMS window


def make_audio_featurizer(win: int):
    """Per-Arrow-batch audio featurizer (closure, shipped by value):
    payload bytes reinterpreted as 16-bit little-endian PCM (the
    codec-free stand-in for a real decode), then the classic
    windowed DSP features — per-window RMS energy, global peak
    amplitude, zero-crossing ratio — all numpy-vectorized (reshape +
    one reduction per feature; no Python per-sample loop). A real
    deployment swaps the frombuffer for librosa/soundfile decode;
    the Spark contract (mapInPandas batch shape, per-doc summary
    row) is identical."""

    def feats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n = len(data) // 2
                x = np.frombuffer(data[: n * 2], dtype="<i2").astype(np.float64) / 32768.0
                nwin = x.size // win
                rms = (
                    np.sqrt((x[: nwin * win].reshape(nwin, win) ** 2).mean(axis=1))
                    if nwin
                    else np.zeros(0)
                )
                zc = (
                    int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if x.size > 1
                    else 0
                )
                out.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": int(x.size),
                        "n_windows": int(nwin),
                        "mean_rms": round(float(rms.mean()), 6) if nwin else 0.0,
                        "peak": round(float(np.abs(x).max()), 6) if x.size else 0.0,
                        "zcr": round(zc / max(x.size - 1, 1), 6),
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_samples", "n_windows", "mean_rms", "peak", "zcr"]
            )

    return feats


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T33 — audio feature extraction plumbing: binary payload →
    int16-PCM reinterpret → windowed RMS / peak / zero-crossing
    ratio per document. The per-doc summary shape an audio-quality
    gate (silence or clipping filters) consumes. (Rows-only: DSP
    over byte-reinterpreted samples has no SQL twin; the unit test
    pins golden values on literal PCM.)"""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    return media.select("doc_id", "payload").mapInPandas(
        make_audio_featurizer(AUDIO_WIN),
        schema="doc_id bigint, n_samples bigint, n_windows bigint,"
        " mean_rms double, peak double, zcr double",
    )


IMG_W = 64  # stub image width (bytes per row)


def make_image_resizer(width: int):
    """Per-Arrow-batch 2× image downsampler (closure, shipped by
    value): payload bytes as a width×H uint8 grid (codec-free decode
    stand-in), 2×2 mean-pool via one reshape — the vectorized resize
    every vision-data pipeline runs before feature extraction. Emits
    dims + content digest so tests pin the exact output without
    shipping pixels around."""

    def resize(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                h = len(data) // width
                img = np.frombuffer(data[: h * width], dtype=np.uint8).reshape(h, width)
                oh, ow = h // 2, width // 2
                # 2x2 mean pool, floor back to uint8 — one reshape + one mean
                small = (
                    img[: oh * 2, : ow * 2]
                    .reshape(oh, 2, ow, 2)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                    if oh and ow
                    else np.zeros((0, 0), dtype=np.uint8)
                )
                out.append(
                    {
                        "doc_id": doc_id,
                        "in_w": int(width),
                        "in_h": int(h),
                        "out_w": int(ow if oh else 0),
                        "out_h": int(oh),
                        "out_md5": hashlib.md5(small.tobytes()).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "in_w", "in_h", "out_w", "out_h", "out_md5"]
            )

    return resize


def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T34 — image resize plumbing: binary payload as a 64-wide uint8
    grid, 2×2 mean-pooled (numpy reshape, no Python pixel loop),
    output dims + digest. (Rows-only: pixel pooling has no SQL twin;
    the unit test pins golden digests on literal grids.)"""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    return media.select("doc_id", "payload").mapInPandas(
        make_image_resizer(IMG_W),
        schema="doc_id bigint, in_w bigint, in_h bigint, out_w bigint,"
        " out_h bigint, out_md5 string",
    )


BLOB_N_FILES = 30
BLOB_N_UNIQUE = 10


def multimodal_blob_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T56 — content-addressed binary-blob dedup: the storage-side
    twin of T1 for raw media — a media drop with duplicated files
    (30 staged files carrying only 10 distinct contents, the shape a
    crawler produces when mirrors re-serve the same asset) is read
    via the ``binaryFile`` source and deduplicated by content digest
    computed SCAN-SIDE on the binary column (md5 over ``content``,
    no Python row objects). Report: files seen, unique blobs, bytes
    ingested vs bytes retained (the dedup savings a blob store
    realizes), and the deterministic keeper (lexicographic min path
    id) per decile of the digest space is summarized by the digest
    count itself. At 100 TB the digest groupBy is the only shuffle
    and its width is the digest, not the blob — content never moves
    twice. Oracle recomputes digests/sizes from the documents table
    with the same staging rule (file i carries doc i % 10's text)."""
    import os
    import tempfile

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < BLOB_N_UNIQUE)
        .select("doc_id", "text")
        .collect()
    }
    stage = tempfile.mkdtemp(prefix="blob_dedup_")
    for i in range(BLOB_N_FILES):
        with open(os.path.join(stage, f"{i:08d}.bin"), "wb") as f:
            f.write(docs[i % BLOB_N_UNIQUE].encode("utf-8"))
    files = spark.read.format("binaryFile").load(stage)
    per_blob = (
        files.select(
            F.md5("content").alias("digest"),
            F.col("length").cast("bigint").alias("n_bytes"),
        )
        .groupBy("digest")
        .agg(F.count("*").alias("n_copies"), F.min("n_bytes").alias("blob_bytes"))
    )
    return per_blob.agg(
        F.sum("n_copies").cast("bigint").alias("n_files"),
        F.count("*").alias("n_unique_blobs"),
        F.sum(F.col("n_copies") * F.col("blob_bytes")).cast("bigint").alias("bytes_ingested"),
        F.sum("blob_bytes").cast("bigint").alias("bytes_retained"),
    )


ORACLES["multimodal_blob_dedup"] = f"""
WITH staged AS (
  SELECT i, (SELECT text FROM documents WHERE doc_id = i % {BLOB_N_UNIQUE}) AS text
  FROM unnest(generate_series(0, {BLOB_N_FILES - 1})) AS t(i)
),
per_blob AS (
  SELECT md5(text) AS digest, COUNT(*) AS n_copies,
         MIN(octet_length(encode(text))) AS blob_bytes
  FROM staged GROUP BY 1
)
SELECT CAST(SUM(n_copies) AS BIGINT) AS n_files,
       COUNT(*) AS n_unique_blobs,
       CAST(SUM(n_copies * blob_bytes) AS BIGINT) AS bytes_ingested,
       CAST(SUM(blob_bytes) AS BIGINT) AS bytes_retained
FROM per_blob
"""


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_audio_energy": multimodal_audio_energy,
    "multimodal_image_resize": multimodal_image_resize,
    "multimodal_blob_dedup": multimodal_blob_dedup,
}
