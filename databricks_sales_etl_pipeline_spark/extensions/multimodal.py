"""Multimodal columns (BASELINE.json north star): image/audio/video as
opaque ``binary`` columns with typed metadata.

The container has no image/audio libraries, so the decode step is STUBBED
(SURVEY brief): ``decode_image_batch`` raises NotImplementedError unless a
real decoder import succeeds, and the tested path uses a deterministic fake
derived from the bytes. What IS real and tested is all the Spark-side
plumbing a 100 TB multimodal pipeline needs:

- binary payload column + typed metadata columns in one DataFrame,
- Arrow-batched ``mapInPandas`` with an explicit output schema (the decode /
  feature-extract / resize / frame-sample execution shape),
- partition sizing by byte volume, not row count (media rows are MBs —
  ``repartition`` on byte-weight before the UDF stage).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.registry import query

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def _have_real_decoder() -> bool:
    try:  # the real path: PIL/ffmpeg on a production cluster
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_batch(payload: bytes) -> tuple[int, int]:
    """Real decoder entry point — STUB: no imaging library in this
    container (SURVEY brief: stub the decode, keep the plumbing real)."""
    if not _have_real_decoder():
        raise NotImplementedError(
            "image decoding requires an imaging library (e.g. Pillow); "
            "this environment ships none — use fake_decode for tests"
        )
    raise NotImplementedError("real decoder wiring is cluster-specific")


def fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake 'decode': dimensions + mean byte derived purely
    from the payload bytes (reproducible in the SQL oracle)."""
    n = len(payload)
    width = n % 640 + 1
    height = (n * 7) % 480 + 1
    mean_byte = (sum(payload) / n) if n else 0.0
    return width, height, mean_byte


def decode_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas over (doc_id, payload) — the real multimodal execution
    shape: Arrow batches in, explicit schema out, one Python worker per
    partition, no driver round-trip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            decoded = payloads.map(fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "mean_byte": decoded.map(lambda t: t[2]),
                }
            )

    return binary_df.mapInPandas(run, DECODE_SCHEMA)


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           strlen(text) AS n_bytes,
           substring(text, 1, 8) AS head_chars
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing 1 — opaque binary payload + typed metadata.
    Documents' text is encoded to a real BinaryType column (the stand-in for
    image bytes); metadata is computed on the binary column itself."""
    d = load(spark, sf_dir, "documents")
    bin_df = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"), "text")
    return bin_df.select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.decode(F.substring("payload", 1, 8), "UTF-8").alias("head_chars"),
    )


FRAME_BYTES = 64
FRAME_STRIDE = 4

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(binary_df: DataFrame) -> DataFrame:
    """Frame-sampling stage: treat the payload as fixed-size frames, keep
    every FRAME_STRIDE-th, emit per-frame metadata + digest. mapInPandas →
    rows out ≠ rows in (the flatMap shape a video pipeline needs)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    frame = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(run, FRAME_SCHEMA)


@query(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(i * {FRAME_STRIDE} AS INT) AS frame_idx,
           CAST(length(substring(text, i * {FRAME_STRIDE} * {FRAME_BYTES} + 1,
                                 {FRAME_BYTES})) AS INT) AS frame_len,
           md5(substring(text, i * {FRAME_STRIDE} * {FRAME_BYTES} + 1,
                         {FRAME_BYTES})) AS frame_md5
    FROM documents,
         unnest(range(0, (CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS BIGINT)
                          + {FRAME_STRIDE} - 1) // {FRAME_STRIDE})) AS t(i)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing 3 — frame sampling over an opaque binary column
    (every {stride}-th 64-byte frame with its md5), executed as an
    Arrow-batched mapInPandas flatMap. ASCII text payloads make the digest
    oracle-checkable (bytes == chars); a real video decoder swaps into
    sample_frames without touching the dataflow."""
    d = load(spark, sf_dir, "documents")
    bin_df = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return sample_frames(bin_df)


RESIZE_STRIDE = 2

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.IntegerType()),
        T.StructField("resized_bytes", T.IntegerType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def resize_payloads(binary_df: DataFrame, stride: int = RESIZE_STRIDE) -> DataFrame:
    """'Resize' stage stub: byte-stride downsampling (every stride-th byte) —
    the shape of an image-resize / audio-downsample stage: payload in,
    smaller payload out, per-row, Arrow-batched. A real resampler replaces
    the slice; partitioning, schema, and batch flow are identical."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda b: bytes(b[::stride]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": pdf["payload"].map(len),
                    "resized_bytes": resized.map(len),
                    "resized_md5": resized.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return binary_df.mapInPandas(run, RESIZE_SCHEMA)


@query(
    "mm_resize_stub",
    oracle=f"""
    WITH r AS (
        SELECT doc_id, strlen(text) AS orig_bytes,
               array_to_string(list_transform(
                   range(1, strlen(text) + 1, {RESIZE_STRIDE}),
                   i -> substring(text, CAST(i AS INT), 1)), '') AS resized
        FROM documents
    )
    SELECT doc_id,
           CAST(orig_bytes AS INT) AS orig_bytes,
           CAST(strlen(resized) AS INT) AS resized_bytes,
           md5(resized) AS resized_md5
    FROM r
    """,
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing 4 — the resize/downsample stage over binary
    payloads (ASCII text bytes make the digest oracle-checkable)."""
    d = load(spark, sf_dir, "documents")
    bin_df = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return resize_payloads(bin_df)


@query(
    "mm_decode_stub",
    oracle="""
    SELECT doc_id,
           strlen(text) AS n_bytes,
           CAST(strlen(text) % 640 + 1 AS INT) AS width,
           CAST((strlen(text) * 7) % 480 + 1 AS INT) AS height
    FROM documents
    """,
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing 2 — the decode/feature-extract stage as an
    Arrow-batched mapInPandas with a deterministic fake decoder. The oracle
    reproduces the fake's integer arithmetic (mean_byte is excluded from the
    checked columns: summing bytes in SQL would need an unnest per byte)."""
    d = load(spark, sf_dir, "documents")
    bin_df = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return decode_features(bin_df).select("doc_id", "n_bytes", "width", "height")
