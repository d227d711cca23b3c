"""Sub-document (segment-level) dedup APPLIED, with reassembly.

Whole-document dedup (``llm.dedup``) drops entire near-copies;
span-level *measurement* (``llm.spans``) reports how much of a doc is
boilerplate. This module closes the remaining gap in the dedup family:
it REMOVES duplicated sub-document segments and reassembles the cleaned
corpus — the CCNet / RefinedWeb "line-level dedup" stage. The fixture
corpus has no newlines, so the segmentation unit is a fixed window of
``SEG_WORDS`` words (the same aligned-window convention as a line or
paragraph split; the pipeline shape is identical).

Semantics (first-writer-wins, globally deterministic):
- each doc is cut into aligned ``SEG_WORDS``-word segments
  (last one may be short);
- for every distinct segment TEXT the single keeper is the minimum
  ``(doc_id, seg_idx)`` occurrence; all other occurrences are dropped
  (including repeats within one document);
- each doc is reassembled from its surviving segments in order. A doc
  that is an exact aligned duplicate of an earlier one collapses to
  the empty string (kept_segments = 0).

Scale design (100 TB corpus):
- segmentation is a per-row projection (no shuffle, whole-stage
  codegen); the word array is built once per row inside one
  ``transform`` lambda, so the doc is tokenized once;
- keeper election is a hash aggregate on the 16-byte md5 of the
  segment — the shuffle carries (hash, packed_key), never the segment
  text. The lexicographic (doc_id, seg_idx) priority is packed into
  ONE primitive long (``doc_id << 20 | seg_idx``) because ``min`` over
  a struct falls back to SortAggregate (sorts every segment within
  partitions) while a primitive-long ``min`` stays a HashAggregate
  with map-side partial combine. The 2^20 segments/doc packing bound
  (an 8.4M-word document) is enforced with ``raise_error``, not
  assumed;
- the keep join is a LEFT SEMI on (doc_id, seg_idx) — compact integer
  keys, and the keeper set is ≤ the segment count (it never expands);
- reassembly is one groupBy(doc_id) with an in-group sort of
  (seg_idx, text) structs — per-doc state is bounded by document
  length, not corpus size. No window over an unpartitioned key, no
  collect, no Python.

Reference parity: the reference pipeline dedups whole rows via
ROW_NUMBER (``src/sql/silver_full_refresh_transformation.sql``); this
is the LLM-corpus generalization of that keep-first contract to
sub-document granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

SEG_WORDS = 8
SEG_IDX_BITS = 20  # packed-keeper bound: ≤ 2^20 segments/doc (8.4M words)

_SEGDEDUP_ORACLE = f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), t AS (
      SELECT doc_id,
             CAST(ceil(len(ws) / {SEG_WORDS}.0) AS INT) AS total_segments,
             ws
      FROM w
    ), segs AS (
      SELECT doc_id,
             CAST(i AS INT) AS seg_idx,
             array_to_string(
               ws[i * {SEG_WORDS} + 1 : i * {SEG_WORDS} + {SEG_WORDS}],
               ' ') AS seg_text
      FROM t, unnest(range(total_segments)) AS u(i)
    ), ranked AS (
      SELECT doc_id, seg_idx, seg_text,
             row_number() OVER (
               PARTITION BY seg_text ORDER BY doc_id, seg_idx
             ) AS rn
      FROM segs
    ), agg AS (
      SELECT doc_id,
             array_to_string(list(seg_text ORDER BY seg_idx), ' ')
               AS clean_text,
             CAST(count(*) AS INT) AS kept_segments
      FROM ranked WHERE rn = 1
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           coalesce(a.kept_segments, 0) AS kept_segments,
           t.total_segments
    FROM t LEFT JOIN agg a USING (doc_id)
"""


@register(
    "docs_segment_dedup_apply",
    oracle=_SEGDEDUP_ORACLE,
    tags=("llm", "dedup", "segments"),
)
def docs_segment_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aligned 8-word-segment dedup applied corpus-wide over the
    fixture documents table (see ``segment_dedup_apply``)."""
    return segment_dedup_apply(load(spark, sf_dir, "documents"))


def segment_dedup_apply(d: DataFrame) -> DataFrame:
    """Aligned {SEG_WORDS}-word-segment dedup applied to a
    (doc_id, text) frame, keeper = min (doc_id, seg_idx) per distinct
    segment text, documents reassembled from survivors (see module
    docstring for the plan). Frame-in/frame-out so property tests can
    drive it with arbitrary corpora."""
    # One projection builds all segments for a row. Lambda bodies are
    # exempt from CSE (the spans.py hazard: an inlined split() would be
    # re-tokenized per segment), so the word array is bound ONCE as a
    # lambda variable via a single-element outer transform.
    w = d.select(
        "doc_id",
        F.expr(
            "transform(array(split(text, ' ')), ws ->"
            f"  transform(sequence(0, cast(ceil(size(ws) / {SEG_WORDS}.0)"
            "                            as int) - 1),"
            f"    i -> array_join(slice(ws, i * {SEG_WORDS} + 1,"
            f"                          {SEG_WORDS}), ' ')))[0]"
        ).alias("segs"),
    )
    segs = w.select(
        "doc_id",
        F.size("segs").cast("int").alias("total_segments"),
        F.posexplode("segs").alias("seg_idx", "seg_text"),
        # Two consumers (keeper election + the semi-join probe side):
        # pin the segmentation once instead of re-splitting the corpus
        # per branch (r11; MEMORY_AND_DISK, spills at size).
    ).localCheckpoint(eager=True)
    # doc_id must fit the remaining 63-SEG_IDX_BITS bits and be
    # non-negative: a doc_id >= 2^43 (or < 0) would overflow the bigint
    # shift and silently corrupt min() keeper election, so it fails
    # loudly alongside the seg_idx width check.
    packed = F.expr(
        f"if(seg_idx < {1 << SEG_IDX_BITS}"
        f"   and doc_id >= 0 and doc_id < {1 << (63 - SEG_IDX_BITS)},"
        f"   shiftleft(doc_id, {SEG_IDX_BITS}) + seg_idx,"
        "    raise_error('docs_segment_dedup_apply: doc_id outside"
        f" [0, 2^{63 - SEG_IDX_BITS}) or > 2^{SEG_IDX_BITS} segments in"
        " one document; repack keeper key'))"
    )
    keepers = (
        segs.select(F.md5("seg_text").alias("h"), packed.alias("pk"))
        .groupBy("h")
        .agg(F.min("pk").alias("pk"))
        .select(
            F.shiftright("pk", SEG_IDX_BITS).alias("doc_id"),
            F.expr(f"cast(pk & {(1 << SEG_IDX_BITS) - 1} as int)").alias("seg_idx"),
        )
    )
    kept = segs.join(keepers, ["doc_id", "seg_idx"], "left_semi")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg_text"))),
                lambda s: s["seg_text"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("int").alias("kept_segments"),
    )
    totals = w.select("doc_id", F.size("segs").cast("int").alias("total_segments"))
    return totals.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("kept_segments", F.lit(0)).alias("kept_segments"),
        "total_segments",
    )
