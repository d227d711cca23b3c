"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Container constraint: no image/audio codecs are installed, so the
actual decode is STUBBED (``decode_image`` raises NotImplementedError;
``fake_feature_extractor`` is the deterministic stand-in). Everything
Spark-side — schema, batch iteration, partitioning, output shape — is
real and tested; swapping the stub for PIL/torchvision changes one
function body, not the plan.

Scale notes: ``mapInPandas`` streams Arrow record batches through the
Python worker — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition size.
Payload-heavy tables should be repartitioned by size (bytes), not row
count, before the UDF stage so workers get even byte-loads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("media_type", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Treat each document's UTF-8 bytes as an opaque media payload with
    typed metadata — the exact layout an image/audio table would use."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("int").alias("n_bytes"),
            F.lit("text/plain").alias("media_type"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB — the container has no image codecs. A real deployment:
    ``PIL.Image.open(io.BytesIO(payload))``."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this container"
    )


def fake_feature_extractor(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode→featurize: buckets byte values
    into a fixed-dim histogram (pure function of the payload)."""
    counts = [0] * dim
    for b in payload:
        counts[b % dim] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in counts]


def extract_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas featurization: Arrow batches in, fixed-dim feature
    vectors out. The stub extractor stands in for the decode step.

    The UDF is fully self-contained (no module-level references):
    cloudpickle then ships it BY VALUE, so Python workers don't need
    this package on their PYTHONPATH — the portable choice when the
    driver-side package isn't distributed via --py-files.
    """
    dim = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def featurize(p: bytes) -> list[float]:
            counts = [0] * dim
            for b in p:
                counts[b % dim] += 1
            total = float(len(p)) or 1.0
            return [c / total for c in counts]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]).astype("int32"),
                    "features": pdf["payload"].map(lambda p: featurize(bytes(p))),
                }
            )

    return binary_df.mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(binary_df: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Image-resize plumbing: binary in → (dims, binary) out over
    mapInPandas. The resample kernel is STUBBED (deterministic byte
    striding standing in for ``PIL.Image.resize``) — the Spark-side
    contract (schema, Arrow batching, self-contained closure, 1:1 row
    shape) is the real deliverable; a deployment swaps the inner
    function for the codec call."""
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def stride_resize(p: bytes) -> bytes:
            if not p:
                return bytes(target)
            if len(p) >= target:
                step = len(p) / target
                return bytes(p[int(i * step)] for i in range(target))
            reps = (target + len(p) - 1) // len(p)
            return (p * reps)[:target]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(lambda p: stride_resize(bytes(p))),
                }
            )

    return binary_df.mapInPandas(run, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    binary_df: DataFrame, frame_bytes: int = 64, every_nth: int = 4
) -> DataFrame:
    """Video frame-sampling plumbing: one payload row fans out to N
    frame rows (every ``every_nth`` fixed-size chunk — the stub for a
    container demuxer like PyAV keyframe iteration). Demonstrates the
    1→N mapInPandas shape: the output batch length is decoupled from
    the input batch length, which is how decode-explode stages keep
    memory bounded at 100 TB (frames stream out per Arrow batch rather
    than materializing per-video lists)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                n_frames = max(1, len(p) // frame_bytes)
                for k in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(p[k * frame_bytes:(k + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return binary_df.mapInPandas(run, FRAMES_SCHEMA)


def extract_features_arrow(binary_df: DataFrame) -> DataFrame:
    """mapInArrow featurization — same contract as ``extract_features``
    but operating on raw ``pyarrow.RecordBatch``es: no pandas
    conversion at all, which matters when payloads are large binaries
    (pandas wraps each as a Python bytes object; Arrow keeps them in
    one contiguous buffer). Completes the Arrow-UDF API matrix
    (mapInPandas / applyInPandas / applyInPandasWithState / mapInArrow)."""
    dim = FEATURE_DIM

    def run(batches):
        import pyarrow as pa

        def featurize(p: bytes) -> list[float]:
            counts = [0] * dim
            for b in p:
                counts[b % dim] += 1
            total = float(len(p)) or 1.0
            return [c / total for c in counts]

        for batch in batches:
            doc_ids = batch.column("doc_id")
            metas = batch.column("meta")
            payloads = batch.column("payload")
            feats = [featurize(p.as_py()) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(
                        [m["n_bytes"] for m in metas.to_pylist()], pa.int32()
                    ),
                    pa.array(feats, pa.list_(pa.float64())),
                ],
                names=["doc_id", "n_bytes", "features"],
            )

    return binary_df.mapInArrow(run, FEATURES_SCHEMA)
