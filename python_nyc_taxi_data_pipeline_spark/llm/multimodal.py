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
