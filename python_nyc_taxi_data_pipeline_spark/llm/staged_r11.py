"""Round-11 registration candidates — seed slate started in round 7.

Same staging mechanism as ``staged_r8``/``staged_r9``/``staged_r10``;
see those docstrings for the evidence-window rotation math (after the
r8/r9/r10 registrations the window is comfortably self-sustaining, so
this slate can grow opportunistically). Promotion:
``staged_r11.promote_to_registry(R11_BATCH)``.

The slate:

- ``docs_frame_sample_contract``: the video frame-sampling plumbing
  (``multimodal.sample_frames`` — the 1→N mapInPandas demuxer stub),
  driver-checked end to end for the first time: a deterministic
  formulaic "video" payload is synthesized per doc, pushed through the
  REAL sampler, and reduced to exact integer frame features whose
  DuckDB oracle replays the synthesis formula in pure SQL — so the
  hash verifies the sampler's chunk geometry (which frames, which
  bytes), not just that rows came back. Completes the multimodal
  oracle story: decode (r5), resize (r7), frame-sample (this).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..registry import QueryFn


@dataclass(frozen=True)
class StagedQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()


STAGED: dict[str, StagedQuery] = {}

R11_BATCH: tuple[str, ...] = (
    "docs_frame_sample_contract",
)


def promote_to_registry(names: list[str]) -> list[str]:
    """Round-11 registration in one call; ``names`` is REQUIRED —
    whole-slate promotion must be spelled out (``list(STAGED)``)."""
    from ..registry import register

    if names is None:
        raise ValueError(
            "promote_to_registry requires an explicit name batch; "
            "spell out whole-slate promotion as list(STAGED)"
        )
    promoted = []
    for name in names:
        q = STAGED[name]
        register(name, q.oracle, q.tags)(q.fn)
        promoted.append(name)
    return promoted


def stage(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Mirror of ``registry.register`` that records into ``STAGED``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED:
            raise ValueError(f"duplicate staged query name {name!r}")
        STAGED[name] = StagedQuery(name, fn, oracle, tags)
        return fn

    return deco


# --------------------------------------------------------------------
# Frame-sample contract (the multimodal demuxer, oracle-checked)
# --------------------------------------------------------------------

FRAME_BYTES = 32
EVERY_NTH = 2
N_VIDEO_DOCS = 200  # bounded synthetic-video block (doc_id < 200)


def _frame_sample_oracle() -> str:
    return f"""
    WITH vids AS (
      SELECT doc_id, 4 + doc_id % 5 AS n_frames
      FROM documents WHERE doc_id < {N_VIDEO_DOCS}
    ), sampled AS (
      SELECT v.doc_id,
             CAST(k.k AS INT) AS frame_idx,
             (v.doc_id * 131 + k.k * 17) % 256 AS v
      FROM vids v, LATERAL (
        SELECT unnest(range(0, v.n_frames, {EVERY_NTH})) AS k
      ) k
    )
    SELECT doc_id, frame_idx,
           CAST({FRAME_BYTES} AS BIGINT) AS n_bytes,
           CAST(v * {FRAME_BYTES} AS BIGINT) AS byte_sum,
           CAST(v AS BIGINT) AS first_byte
    FROM sampled
    """


@stage(
    "docs_frame_sample_contract",
    oracle=_frame_sample_oracle(),
    tags=("llm", "multimodal", "contract"),
)
def docs_frame_sample_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling contract for the multimodal demuxer stub: each
    doc (bounded block, doc_id < {N_VIDEO_DOCS}) gets a deterministic
    formulaic "video" — (4 + id%5) fixed-size frames where frame k is
    {FRAME_BYTES} copies of byte (id·131 + k·17) mod 256 — pushed
    through the REAL ``multimodal.sample_frames`` (the 1→N mapInPandas
    demuxer: every {EVERY_NTH}ⁿᵈ frame, Arrow-batched, output length
    decoupled from input length) and reduced to exact integer frame
    features. The oracle replays the synthesis formula in pure SQL, so
    the driver hash pins the sampler's CHUNK GEOMETRY — which frame
    indexes are emitted and exactly which bytes each one carries — the
    part a real demuxer gets subtly wrong (off-by-one strides, short
    final frames).

    Exactness: all features are integers by construction (a constant
    frame is its byte value times its length).

    Scale (100 TB): synthesis + sampling + featurization are three
    chained Arrow map stages with ZERO shuffle (the real pipeline
    shape: payloads never leave the worker as anything bigger than
    their features); closures are self-contained (pickled by value —
    the driver-cwd-independence rule for Python-on-executor code)."""
    from .multimodal import sample_frames

    doc_ids = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < N_VIDEO_DOCS
    )

    synth_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    frame_bytes = FRAME_BYTES

    def synth(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n_frames = 4 + did % 5
                payloads.append(
                    b"".join(
                        bytes([(did * 131 + k * 17) % 256]) * frame_bytes
                        for k in range(n_frames)
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    vids = doc_ids.mapInPandas(synth, synth_schema)
    frames = sample_frames(vids, frame_bytes=FRAME_BYTES, every_nth=EVERY_NTH)

    feat_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("byte_sum", T.LongType()),
            T.StructField("first_byte", T.LongType()),
        ]
    )

    def featurize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for did, idx, frame in zip(
                pdf["doc_id"], pdf["frame_idx"], pdf["frame"]
            ):
                p = bytes(frame)
                rows.append(
                    (int(did), int(idx), len(p), sum(p), p[0] if p else -1)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "frame_idx",
                    "n_bytes",
                    "byte_sum",
                    "first_byte",
                ],
            )

    return frames.mapInPandas(featurize, feat_schema)
