"""Streaming MinHash-LSH near-duplicate detection.

Extends the batch LSH family (``llm/dedup.py``) to Structured
Streaming: documents arrive in micro-batches, each is shingled,
minhash-signed, and banded with the SAME pure per-document expressions
as the batch path (band hashes carry no corpus statistics, so the
banding is stream-safe by construction — see
``minhash_band_index``), and a per-(band, band_hash) keyed state store
holds the signatures previously seen in that bucket. Every arriving
document emits a candidate pair against each prior bucket member, with
a signature-estimated Jaccard — the streaming analog of
``docs_minhash_incremental_pairs`` where the persisted band index is
the state store itself.

Semantics vs batch:
- Candidate recall: any pair the batch LSH query emits collides in at
  least one band, so replaying the same corpus through this stream
  yields a SUPERSET of the batch pair set (duplicate emits across
  bands included; consumers dedupe on (doc_a, doc_b)). The referee
  test pins this.
- Similarity is ESTIMATED from the signatures (matching-component
  fraction, the classic unbiased MinHash estimator) rather than
  exact-verified: the state holds 16 longs per doc, not the shingle
  set. An exact-verify stage would join candidates back to a document
  store — a downstream batch job, deliberately out of the stream.

Scale notes:
- State is sharded by (band_idx, band_hash) — with the stream, no
  driver involvement; each bucket's state is the docs that hashed
  there, which banded LSH keeps small BY DESIGN for non-boilerplate
  content.
- Hot buckets (boilerplate bands) are capped at ``BAND_STATE_CAP``
  members — the streaming twin of the batch path's DF_CEILING: beyond
  the cap a bucket stops accumulating and pairing (quadratic-emit
  guard); the cap and the drop are observable in the emitted
  ``bucket_size`` column.
- The Python surface is Arrow-batched (``applyInPandasWithState``),
  the one sanctioned worker path; shingling/signing stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

from ..llm.dedup import (
    LSH_BANDS,
    MINHASH_PERMS,
    minhash_signature,
    word_trigram_hashes,
)

BAND_STATE_CAP = 64

DOCUMENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("sigs_flat", T.ArrayType(T.LongType())),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_a", T.LongType()),
        T.StructField("doc_b", T.LongType()),
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("est_jaccard", T.DoubleType()),
        T.StructField("bucket_size", T.IntegerType()),
    ]
)


def read_document_stream(
    spark: SparkSession, src: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src)
    )


def band_rows(docs: DataFrame) -> DataFrame:
    """(band_idx, band_hash, doc_id, sig) — identical expressions to the
    batch ``minhash_band_index`` so stream and batch band identically."""
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    sig = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .select("doc_id", word_trigram_hashes(F.col("w")).alias("grams"))
        .filter(F.size("grams") >= 1)
        .select("doc_id", minhash_signature(F.col("grams")).alias("sig"))
    )
    return sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
                lambda band: F.struct(
                    band.cast("int").alias("band_idx"),
                    F.xxhash64(
                        F.slice(F.col("sig"), band * rows_per_band + 1, rows_per_band),
                        band,
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("band.band_idx", "band.band_hash", "doc_id", "sig")


def neardup_candidates(docs: DataFrame) -> DataFrame:
    """Streaming candidate pairs with estimated Jaccard.

    Pairs are emitted in ``doc_id`` order within a bucket (new docs
    sorted, then paired against state members then earlier arrivals in
    the same micro-batch), so a replay with the same micro-batch
    boundaries is deterministic.

    Bounded-recall contract under cap pressure: once a bucket holds
    ``BAND_STATE_CAP`` members it stops growing — later arrivals to
    that bucket emit NO pairs in it and are not remembered by it, so
    the batch-superset recall guarantee holds only for buckets below
    the cap (boilerplate-band overflow is an explicit, observable loss:
    ``bucket_size`` plateaus at the cap). A doc dropped from one hot
    bucket still pairs through its other, non-hot bands.
    """
    perms = MINHASH_PERMS
    cap = BAND_STATE_CAP

    def update(key, pdfs, state):
        import pandas as pd  # self-contained closure

        band_idx = int(key[0])
        if state.exists:
            doc_ids, sigs_flat = state.get
            doc_ids = list(doc_ids)
            sigs_flat = list(sigs_flat)
        else:
            doc_ids, sigs_flat = [], []
        members = [
            (doc_ids[i], sigs_flat[i * perms : (i + 1) * perms])
            for i in range(len(doc_ids))
        ]
        known = set(doc_ids)
        new = []
        for pdf in pdfs:
            for doc_id, sig in zip(pdf["doc_id"], pdf["sig"]):
                d = int(doc_id)
                if d not in known:  # replayed file → idempotent state
                    new.append((d, [int(x) for x in sig]))
                    known.add(d)
        new.sort()
        out = []
        for d, sig in new:
            if len(members) >= cap:  # hot-bucket guard: stop growing
                break
            for od, osig in members:
                est = sum(1 for a, b in zip(sig, osig) if a == b) / perms
                out.append(
                    (min(d, od), max(d, od), band_idx, est, len(members) + 1)
                )
            members.append((d, sig))
        state.update(
            (
                [d for d, _ in members],
                [x for _, s in members for x in s],
            )
        )
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_a",
                    "doc_b",
                    "band_idx",
                    "est_jaccard",
                    "bucket_size",
                ],
            )

    return (
        band_rows(docs)
        .groupBy("band_idx", "band_hash")
        .applyInPandasWithState(
            update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
