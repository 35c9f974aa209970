"""Multimodal column plumbing — images/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.  Training-data-pipeline extension (the reference is
text-only).

What is REAL here and tested: the Spark-side plumbing — binary column
schema, explicit output schema, Arrow batch iteration, partition-
preserving narrow execution.  What is STUBBED: actual codec work
(`decode_image` raises ``NotImplementedError`` — image/audio libs are
not in this environment); ``fake_decode_meta`` is the deterministic
stand-in wired into the pipeline so the plumbing is verifiable
end-to-end (its outputs are pure functions of the payload bytes, so
the DuckDB oracle can recompute them from ``octet_length``).

At 100 TB: payloads stay in executor memory one Arrow batch at a
time (bound with ``spark.sql.execution.arrow.maxRecordsPerBatch``);
the decode is a narrow map — no shuffle — and column pruning means a
metadata-only query never reads payload bytes from parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

MM_META_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, n_frames int"
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column.  In production this IS
    the stored image/audio bytes; here the utf-8 text bytes stand in
    (deterministic, so both engines agree on sizes)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """REAL decode stub — requires an image codec library, which this
    environment does not ship.  Raises until one is wired in."""
    raise NotImplementedError(
        "image decoding requires e.g. Pillow; not available in this "
        "environment — use fake_decode_meta for plumbing tests"
    )


def _fake_meta(n_bytes: int) -> tuple[int, int, int]:
    """Deterministic fake 'decode': metadata as pure functions of the
    payload size (stands in for width/height/frame-count probing)."""
    return (
        1 + n_bytes % 640,
        1 + (n_bytes // 640) % 480,
        1 + n_bytes % 10,
    )


def decode_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one metadata frame out.
    Payload bytes never leave the executor."""
    for pdf in batches:
        n = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n.astype("int64"),
                "width": (1 + n % 640).astype("int32"),
                "height": (1 + (n // 640) % 480).astype("int32"),
                "n_frames": (1 + n % 10).astype("int32"),
            }
        )


def q_mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(
        decode_meta_batches, schema=MM_META_SCHEMA
    )


MM_RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_width int, out_height int, "
    "out_bytes long"
)
TARGET_WIDTH = 224  # the ubiquitous vision-model input size


def resize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for the resize stage: aspect-preserving
    scale to TARGET_WIDTH.  The pixel work is where a codec library
    would run; the REAL and tested parts are the geometry arithmetic,
    the Arrow batch flow, and the output-size accounting (3 bytes/px
    RGB) that a capacity planner needs."""
    for pdf in batches:
        n = pdf["payload"].map(len)
        width = (1 + n % 640).astype("int64")
        height = (1 + (n // 640) % 480).astype("int64")
        out_w = pd.Series(TARGET_WIDTH, index=pdf.index, dtype="int64")
        # ceil-division keeps at least 1 px and rounds like a resampler
        out_h = ((height * TARGET_WIDTH + width - 1) // width).clip(lower=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": width.astype("int32"),
                "height": height.astype("int32"),
                "out_width": out_w.astype("int32"),
                "out_height": out_h.astype("int32"),
                "out_bytes": (3 * out_w * out_h).astype("int64"),
            }
        )


def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(
        resize_batches, schema=MM_RESIZE_SCHEMA
    )


MM_FRAMES_SCHEMA = "doc_id long, n_frames int, frame_idx int"
FRAME_STRIDE = 3  # keep every 3rd frame, always including frame 0


def frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for video frame sampling: one output row per
    KEPT frame (stride 3) — the row-exploding batch shape a real
    frame extractor has, with deterministic fake frame counts."""
    for pdf in batches:
        n = pdf["payload"].map(len)
        n_frames = (1 + n % 10).astype("int64")
        out = {"doc_id": [], "n_frames": [], "frame_idx": []}
        for doc_id, nf in zip(pdf["doc_id"], n_frames):
            for idx in range(0, int(nf), FRAME_STRIDE):
                out["doc_id"].append(doc_id)
                out["n_frames"].append(nf)
                out["frame_idx"].append(idx)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
            }
        )


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(
        frame_sample_batches, schema=MM_FRAMES_SCHEMA
    )


ORACLES: dict[str, str] = {
    # the fake decode is a pure function of payload size, so the oracle
    # recomputes it from octet_length of the utf-8 text
    "mm_decode_meta": (
        "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
        "CAST(1 + octet_length(encode(text)) % 640 AS INTEGER) AS width, "
        "CAST(1 + (octet_length(encode(text)) // 640) % 480 AS INTEGER) AS height, "
        "CAST(1 + octet_length(encode(text)) % 10 AS INTEGER) AS n_frames "
        "FROM documents"
    ),
    "mm_resize": (
        "WITH dims AS (SELECT doc_id, "
        "CAST(1 + octet_length(encode(text)) % 640 AS BIGINT) AS width, "
        "CAST(1 + (octet_length(encode(text)) // 640) % 480 AS BIGINT) AS height "
        "FROM documents) "
        "SELECT doc_id, CAST(width AS INTEGER) AS width, "
        "CAST(height AS INTEGER) AS height, "
        f"CAST({TARGET_WIDTH} AS INTEGER) AS out_width, "
        f"CAST(greatest((height * {TARGET_WIDTH} + width - 1) // width, 1) "
        "AS INTEGER) AS out_height, "
        f"CAST(3 * {TARGET_WIDTH} * "
        f"greatest((height * {TARGET_WIDTH} + width - 1) // width, 1) "
        "AS BIGINT) AS out_bytes FROM dims"
    ),
    "mm_frame_sample": (
        "WITH meta AS (SELECT doc_id, "
        "CAST(1 + octet_length(encode(text)) % 10 AS INTEGER) AS n_frames "
        "FROM documents) "
        "SELECT doc_id, n_frames, CAST(idx AS INTEGER) AS frame_idx "
        f"FROM meta, unnest(range(0, n_frames, {FRAME_STRIDE})) AS t(idx)"
    ),
}

QUERIES = {
    "mm_decode_meta": q_mm_decode_meta,
    "mm_resize": q_mm_resize,
    "mm_frame_sample": q_mm_frame_sample,
}
