"""Tests for llm/overlap.py — containment pairs, winnowing
fingerprints, SimHash band-bucket search — and the BPE fertility
report. The driver's DuckDB oracle proves value equality per round;
these tests pin the algorithmic CONTRACTS (winnowing guarantee,
pigeonhole losslessness, containment asymmetry, cross-engine hash
agreement) on synthetic corpora where ground truth is constructed."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from python_nyc_taxi_data_pipeline_spark.llm.overlap import (
    _POS_BITS,
    _POS_CAP,
    SIMHASH_MAX_HAMMING,
    WINNOW_K,
    WINNOW_W,
)
from tests.conftest import SF_DIR

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows], DOC_SCHEMA
    ).write.parquet(str(path / "documents.parquet"))
    return str(path)


def test_cross_engine_md5_hash_agrees(spark):
    """The whole module rides on one identity: Spark
    conv(substr(md5(x),1,N),16,10)::long equals DuckDB
    ('0x'||substr(md5(x),1,N))::BIGINT for N=10 and N=15. Pin it on
    strings shaped like the grams we hash."""
    samples = ["a b c", "table scan slow", "x", "", "key agg row"]
    for n_hex in (10, 15):
        got = (
            spark.createDataFrame([(s,) for s in samples], "s string")
            .select(
                F.conv(F.substring(F.md5("s"), 1, n_hex), 16, 10)
                .cast("long")
                .alias("h")
            )
            .toPandas()["h"]
            .tolist()
        )
        want = [
            duckdb.sql(
                f"SELECT ('0x'||substr(md5(?),1,{n_hex}))::BIGINT", params=[s]
            ).fetchone()[0]
            for s in samples
        ]
        assert got == want


def test_winnowing_guarantee_shared_passage(spark, tmp_path):
    """The winnowing guarantee: a passage of ≥ w+k-1 words shared
    verbatim contributes ≥ 1 shared selected fingerprint. A 20-word
    shared run (15 windows) must push the pair over both report
    thresholds; two documents with no shared trigram must not pair."""
    shared = " ".join(f"s{i}" for i in range(20))
    a_only = " ".join(f"a{i}" for i in range(10))
    b_only = " ".join(f"b{i}" for i in range(10))
    c_only = " ".join(f"c{i}" for i in range(25))
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, shared + " " + a_only),
            (2, b_only + " " + shared),
            (3, c_only),
        ],
    )
    rows = E.queries()["docs_winnowing_fingerprints"](spark, sf).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in rows}
    assert (1, 2) in pairs
    got = pairs[(1, 2)]
    # 15 full shared windows minus boundary effects: well over the
    # shared_fps >= 2 floor, and both docs are small enough that the
    # overlap fraction clears 0.2 with margin.
    assert got.shared_fps >= 3
    assert got.overlap >= 0.2
    assert not any(3 in p for p in pairs)


def test_winnowing_density_on_fixture(spark):
    """Expected selection density is 2/(w+1) of the k-gram stream
    (Schleimer et al. §4). On the real fixture the per-corpus average
    must sit in a loose band around it — a selection bug (wrong frame,
    wrong tie-break, missing distinct) lands far outside."""
    sel = E.queries()["docs_winnowing_fingerprints"](spark, SF_DIR)
    # fp_a/fp_b carry per-doc fingerprint counts for every reported
    # doc; recompute the stream length from the fixture.
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            (F.size(F.split("text", " ")) - (WINNOW_K - 1)).alias("m"),
        )
        .filter(F.col("m") >= 1)
    )
    fps = sel.select(
        F.col("doc_a").alias("doc_id"), F.col("fp_a").alias("nfp")
    ).union(
        sel.select(F.col("doc_b").alias("doc_id"), F.col("fp_b").alias("nfp"))
    ).distinct()
    joined = fps.join(docs, "doc_id").select(
        (F.col("nfp") / F.col("m")).alias("density")
    )
    avg = joined.agg(F.avg("density")).first()[0]
    if avg is None:
        pytest.skip("no winnowing pairs at this SF")
    expected = 2.0 / (WINNOW_W + 1)
    assert 0.5 * expected <= avg <= 2.0 * expected


def test_winnowing_packing_tie_break():
    """The packed key h·2^POS_BITS + (2^POS_BITS-1-pos) orders by
    (hash asc, position desc): min over a window with equal hashes
    selects the RIGHTMOST — the winnowing tie-break that guarantees
    density. Pure arithmetic pin so a packing edit can't silently
    flip the tie direction."""

    def pack(h, pos):
        return h * _POS_CAP + (_POS_CAP - 1 - pos)

    def unpack_pos(key):
        return _POS_CAP - 1 - (key % _POS_CAP)

    # equal hash, later position wins the min
    assert pack(7, 5) < pack(7, 2)
    assert unpack_pos(min(pack(7, 2), pack(7, 5))) == 5
    # smaller hash beats any position
    assert pack(6, 0) < pack(7, _POS_CAP - 1)
    # positions stay below the packing capacity by construction
    assert _POS_CAP == 1 << _POS_BITS


def test_simhash_band_pairs_equals_bruteforce(spark):
    """Pigeonhole losslessness: with 4 bands over 60 bits, the banded
    candidate search must find EXACTLY the all-pairs Hamming ≤ 3 set.
    Rebuild the fingerprints here and brute-force the comparison on
    the small fixture."""
    from python_nyc_taxi_data_pipeline_spark.llm import overlap as O

    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in E.queries()["docs_simhash_band_pairs"](spark, SF_DIR).collect()
    }
    # brute force via the same fingerprint construction
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = d.select("doc_id", F.split("text", " ").alias("ws"))
    posts = w.select(
        "doc_id", F.explode(O.word_trigrams(F.col("ws"))).alias("gram")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(O.SIMHASH_BITS)
    ]
    agg = posts.groupBy("doc_id").agg(*votes)
    expr = None
    for b in range(O.SIMHASH_BITS):
        c = F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        expr = c if expr is None else expr + c
    fp = [(r.doc_id, r.fp) for r in agg.select("doc_id", expr.alias("fp")).collect()]
    brute = set()
    for i in range(len(fp)):
        for j in range(i + 1, len(fp)):
            a, b = sorted((fp[i], fp[j]))
            ham = bin(a[1] ^ b[1]).count("1")
            if ham <= SIMHASH_MAX_HAMMING:
                brute.add((a[0], b[0], ham))
    assert banded == brute


def test_simhash_band_pairs_finds_exact_duplicate(spark, tmp_path):
    """Identical texts have identical fingerprints: the banded search
    must report them at Hamming 0; an unrelated doc must not pair."""
    dup = " ".join(f"w{i % 7}" for i in range(30))
    other = " ".join(f"z{i}" for i in range(30))
    sf = _write_docs(spark, tmp_path, [(1, dup), (2, dup), (3, other)])
    rows = {
        (r.doc_a, r.doc_b): r.hamming
        for r in E.queries()["docs_simhash_band_pairs"](spark, sf).collect()
    }
    assert rows.get((1, 2)) == 0
    assert not any(3 in p for p in rows)


def test_containment_detects_embedded_doc(spark, tmp_path):
    """A short doc pasted verbatim inside a long one: containment of
    the short in the long is 1.0 while the reverse direction stays
    under threshold — the asymmetry symmetric Jaccard cannot see."""
    short = " ".join(f"q{i}" for i in range(12))
    long_ = short + " " + " ".join(f"r{i}" for i in range(60))
    sf = _write_docs(spark, tmp_path, [(1, short), (2, long_)])
    rows = {
        (r.doc_sub, r.doc_super): r
        for r in E.queries()["docs_shingle_containment_pairs"](spark, sf).collect()
    }
    assert (1, 2) in rows
    assert rows[(1, 2)].containment == 1.0
    # the long doc shares only ~10/70 of ITS shingles with the short
    assert (2, 1) not in rows


def test_fertility_report_consistency(spark):
    """The per-source rollup must reconcile with the corpus: source
    n_words sum to the corpus word count, fertility is exactly
    round(tokens/words, 4), and every token count is at least the
    word count (a word is ≥ 1 BPE token)."""
    rep = E.queries()["docs_bpe_fertility_report"](spark, SF_DIR).collect()
    assert rep
    total_words = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert sum(r.n_words for r in rep) == total_words
    for r in rep:
        assert r.n_bpe_tokens >= r.n_words
        assert r.fertility == round(r.n_bpe_tokens / r.n_words, 4)
        assert r.chars_per_token > 0


# ---------------------------------------------------------------------------
# Independent pure-Python replays on a randomized corpus
# ---------------------------------------------------------------------------

def _random_corpus():
    """Seeded corpus with the structures each op must detect: an exact
    duplicate pair, a near-dup (small edit), an embedded short doc, a
    shared-passage pair, plus unrelated noise docs."""
    import random

    rng = random.Random(420)
    vocab = [f"v{i}" for i in range(40)]

    def words(n):
        return [rng.choice(vocab) for _ in range(n)]

    docs = {}
    for i in range(12):
        docs[i] = words(rng.randint(0, 70))
    base = words(50)
    docs[20] = base[:]                       # exact dup pair
    docs[21] = base[:]
    edited = base[:]
    edited[10] = "EDIT"
    docs[22] = edited                        # near-dup of 20/21
    short = words(12)
    docs[23] = short
    docs[24] = short + words(55)             # 23 embedded in 24
    passage = words(25)
    docs[25] = words(15) + passage
    docs[26] = passage + words(18)           # shared passage pair
    return docs


def _h_md5(s: str, n_hex: int) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:n_hex], 16)


def _trigrams(ws):
    return [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]


def _py_winnow(ws):
    """Pure-Python winnowing selection (distinct selected 40-bit
    hashes) mirroring the documented spec, not the Spark code."""
    grams = _trigrams(ws)
    m = len(grams)
    if m < 1:
        return set()
    keys = [
        _h_md5(g, 10) * _POS_CAP + (_POS_CAP - 1 - p)
        for p, g in enumerate(grams)
    ]
    sel = set()
    for start in range(max(0, m - WINNOW_W) + 1):
        window = keys[start : start + WINNOW_W]
        sel.add(min(window) >> _POS_BITS)
    return sel


def test_winnowing_matches_python_replay(spark, tmp_path):
    docs = _random_corpus()
    sf = _write_docs(
        spark, tmp_path, [(i, " ".join(ws)) for i, ws in docs.items()]
    )
    got = {
        (r.doc_a, r.doc_b): (r.shared_fps, r.fp_a, r.fp_b, r.overlap)
        for r in E.queries()["docs_winnowing_fingerprints"](spark, sf).collect()
    }
    sel = {i: _py_winnow(ws) for i, ws in docs.items()}
    want = {}
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            shared = len(sel[a] & sel[b])
            if shared < 2 or not sel[a] or not sel[b]:
                continue
            ov = round(shared / min(len(sel[a]), len(sel[b])), 6)
            if ov >= 0.2:
                want[(a, b)] = (shared, len(sel[a]), len(sel[b]), ov)
    assert got == want
    assert (20, 21) in want  # the exact-dup pair must surface
    assert (25, 26) in want  # the shared-passage pair must surface


def test_simhash_band_pairs_matches_python_replay(spark, tmp_path):
    docs = _random_corpus()
    sf = _write_docs(
        spark, tmp_path, [(i, " ".join(ws)) for i, ws in docs.items()]
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in E.queries()["docs_simhash_band_pairs"](spark, sf).collect()
    }
    fps = {}
    for i, ws in docs.items():
        grams = set(_trigrams(ws))
        if not grams:
            continue
        votes = [0] * 60
        for g in grams:
            h = _h_md5(g, 15)
            for b in range(60):
                votes[b] += 1 if (h >> b) & 1 else -1
        fps[i] = sum(1 << b for b in range(60) if votes[b] > 0)
    want = {}
    ids = sorted(fps)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ham = bin(fps[a] ^ fps[b]).count("1")
            if ham <= SIMHASH_MAX_HAMMING:
                want[(a, b)] = ham
    assert got == want
    assert want.get((20, 21)) == 0  # exact dup at Hamming 0


def test_containment_matches_python_replay(spark, tmp_path):
    docs = _random_corpus()
    sf = _write_docs(
        spark, tmp_path, [(i, " ".join(ws)) for i, ws in docs.items()]
    )
    got = {
        (r.doc_sub, r.doc_super): (r.shared_grams, r.n_sub_grams, r.containment)
        for r in E.queries()["docs_shingle_containment_pairs"](
            spark, sf
        ).collect()
    }
    sets = {
        i: set(_trigrams(ws)) for i, ws in docs.items() if len(ws) >= 3
    }
    want = {}
    for a in sets:
        for b in sets:
            if a == b or not sets[a]:
                continue
            inter = len(sets[a] & sets[b])
            cont = round(inter / len(sets[a]), 6)
            if cont >= 0.5:
                want[(a, b)] = (inter, len(sets[a]), cont)
    assert got == want
    assert (23, 24) in want  # embedded doc detected
    assert want[(23, 24)][2] == 1.0


def test_simhash_bucket_cap_drops_hot_buckets_explicitly(spark, tmp_path, monkeypatch):
    """The hot-bucket cap's documented trade-off, pinned: a band
    bucket larger than SIMHASH_BUCKET_CAP is dropped BEFORE the
    quadratic emit, losing its pairs (unlike the shingle df-ceiling,
    these can be true pairs — the loss is explicit and bounded), while
    buckets at or under the cap still pair completely. Patch the cap
    tiny and build two exact-dup clusters straddling it."""
    from python_nyc_taxi_data_pipeline_spark.llm import overlap as O

    hot = " ".join(f"h{i % 11}" for i in range(40))
    cold = " ".join(f"c{i % 13}" for i in range(40))
    rows = [(i, hot) for i in range(5)] + [(100, cold), (101, cold)]
    sf = _write_docs(spark, tmp_path, rows)
    monkeypatch.setattr(O, "SIMHASH_BUCKET_CAP", 3)
    got = {
        (r.doc_a, r.doc_b)
        for r in E.queries()["docs_simhash_band_pairs"](spark, sf).collect()
    }
    # the 5-member hot cluster exceeds the cap in every band: all its
    # pairs are lost; the 2-member cluster pairs normally
    assert got == {(100, 101)}


def test_winnowing_selection_matches_python_replay(spark, tmp_path):
    """Full Python replay of the array-expression selection (packed
    keys -> w-wide sliding min -> distinct), including the m < w edge
    (document shorter than one window selects the single global min).
    Two identical docs pair with overlap 1.0, so the reported fp
    counts expose the per-doc selection size for comparison."""
    import hashlib

    def replay_fps(words):
        m = len(words) - (WINNOW_K - 1)
        keys = []
        for i in range(m):
            gram = " ".join(words[i : i + WINNOW_K])
            h = int(hashlib.md5(gram.encode()).hexdigest()[:10], 16)
            keys.append(h * _POS_CAP + (_POS_CAP - 1 - i))
        sel = {
            min(keys[i : i + WINNOW_W]) >> _POS_BITS
            for i in range(max(0, m - WINNOW_W) + 1)
        }
        return sel

    long_words = [f"w{i}" for i in range(30)]
    short_words = ["p", "q", "r", "s", "t"]  # m = 3 < WINNOW_W
    cases = [(long_words, (1, 2)), (short_words, (3, 4))]
    rows = []
    for words, (ida, idb) in cases:
        rows += [(ida, " ".join(words)), (idb, " ".join(words))]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        (r.doc_a, r.doc_b): r
        for r in E.queries()["docs_winnowing_fingerprints"](spark, sf).collect()
    }
    for words, (ida, idb) in cases:
        expected = replay_fps(words)
        if len(expected) < 2:
            # below WINNOW_MIN_SHARED: identical docs must NOT pair
            assert (ida, idb) not in got
            continue
        r = got[(ida, idb)]
        assert r.fp_a == r.fp_b == len(expected)
        assert r.shared_fps == len(expected)
        assert r.overlap == 1.0
    # the short pair shares every fingerprint it has; whether it
    # appears depends only on the floor — pin the m<w selection size
    assert len(replay_fps(short_words)) == 1
