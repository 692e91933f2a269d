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


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
}
