"""q55 corpus-build pipeline: planted-docs value test.

The pipeline composes nine individually-oracled stages; composition is
where column contracts and row-identity bugs hide (a doc dropped by one
gate resurfacing downstream, a stage consuming the ORIGINAL text
instead of the retained text, the percentile ranking over the wrong
population). This test re-implements the whole arc as a ~60-line
driver-side Python reference over a planted 10-doc corpus in which
every stage has at least one designated victim, and asserts the Spark
pipeline's packed-chunk output matches the reference ROW FOR ROW —
ids, chunk boundaries, hashes, and pack assignment."""

from __future__ import annotations

import hashlib
import math
import re
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

from pyspark.sql import functions as F

from crab_spark.operators import scrub as SC
from crab_spark.operators.pipeline import corpus_build
from crab_spark.operators.sampling import _hex_threshold

PARAMS = dict(
    bench_rate=0.2, bench_salt="bench", window_words=3,
    rep_k=2, rep_max=0.5, contam_k=2, contam_max_frac=0.0,
    quality_cut=0.75, sample_rate=1.0, sample_salt="mix",
    chunk_words=4, stride=3, pack_budget=6,
)

# Planted fates (doc 8 hashes under bench_rate=0.2 with salt "bench";
# precomputed, asserted below against the same formula):
#  8 → benchmark (leaves the corpus; its 2-grams are the probes)
#  1, 2 → distinct emails that REDACT to the same text: doc 2 becomes a
#         full paragraph-dup of doc 1 and must retain '' (scrub→dedup)
#  3 → within-doc window dup ("spam spam spam" twice) — partial retain
#  5 → repetition-gate victim on its RETAINED text (dup 2-grams > 1/2)
#  4 → decontamination victim (quotes doc 8's phrases; survives dedup
#      and repetition first)
#  9 → quality-gate victim (rare-token soup = worst avg-NLL survivor)
#  0, 6, 7 → clean docs exercising 1/2/3-chunk shapes downstream
ROWS = [
    (0, "alpha bravo charlie delta echo foxtrot"),
    (1, "Bob@example.com gamma delta"),
    (2, "alice@wonder.land GAMMA   delta"),
    (3, "spam spam spam spam spam spam ham"),
    (4, "the secret eval answer key leaked here today now"),
    (5, "loop a loop a loop a loop b"),
    (6, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
    (7, "pp qq rr ss tt"),
    (8, "secret eval answer key leaked tokens"),
    (9, "zxqv wvut qpon mlkj hgfe dcba"),
]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.lower())


def _shingles(t: str, k: int) -> list[str]:
    ws = t.split(" ")
    return [" ".join(ws[j:j + k]) for j in range(max(len(ws) - k, 0) + 1)]


def _in_sample(i: int, rate: float, salt: str) -> bool:
    return rate >= 1.0 or _md5(salt + str(i)) < _hex_threshold(rate)


def _reference(rows, p):
    # 1. benchmark split
    bench_ids = {i for i, _ in rows if _in_sample(i, p["bench_rate"], p["bench_salt"])}
    corpus = [(i, t) for i, t in rows if i not in bench_ids]
    # 2. PII scrub (raw text; normalization happens at segmentation)
    scrubbed = []
    for i, t in corpus:
        for pat, tok in SC.REDACTIONS:
            t = re.sub(pat, tok, t)
        scrubbed.append((i, t))
    # 3. paragraph dedup, corpus-wide first-wins = min (doc_id, pos)
    ww = p["window_words"]
    segs_by_doc = {}
    for i, t in scrubbed:
        ws = _norm(t).split(" ")
        nseg = max(math.ceil(len(ws) / ww), 1)
        segs = [" ".join(ws[j * ww:(j + 1) * ww]) for j in range(nseg)]
        segs_by_doc[i] = [(pos, s) for pos, s in enumerate(segs) if s != ""]
    first: dict[str, tuple[int, int]] = {}
    for i in sorted(segs_by_doc):
        for pos, s in segs_by_doc[i]:
            first.setdefault(_md5(s), (i, pos))
    retained = {}
    for i, segs in segs_by_doc.items():
        txt = " ".join(s for pos, s in segs if first[_md5(s)] == (i, pos))
        if txt:
            retained[i] = txt
    # 4. repetition gate on the RETAINED text
    rfr = Fraction(str(p["rep_max"]))
    gated = {}
    for i, t in retained.items():
        sh = _shingles(t, p["rep_k"])
        n, d = len(sh), len(set(sh))
        if (n - d) * rfr.denominator <= rfr.numerator * n:
            gated[i] = t
    # 5. decontamination gate vs the benchmark's distinct k-grams
    cfr = Fraction(str(p["contam_max_frac"]))
    bench_sh = {
        s for i, t in rows if i in bench_ids
        for s in _shingles(_norm(t), p["contam_k"]) if s
    }
    survivors = {}
    for i, t in gated.items():
        sh = {s for s in _shingles(t, p["contam_k"]) if s}
        hits = len(sh & bench_sh)
        if hits * cfr.denominator <= cfr.numerator * len(sh):
            survivors[i] = t
    # 6. unigram-LM percentile gate over the survivor population
    freqs: dict[str, int] = {}
    for t in survivors.values():
        for w in t.split(" "):
            freqs[w] = freqs.get(w, 0) + 1
    tot = sum(freqs.values())
    nll = {}
    for i, t in survivors.items():
        ws = t.split(" ")
        raw = sum(-math.log(freqs[w] / tot) for w in ws) / len(ws)
        nll[i] = float(Decimal(repr(raw)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP))
    order = sorted(survivors, key=lambda i: (nll[i], i))
    n_keep = math.ceil(Fraction(str(p["quality_cut"])) * len(order))
    keepers = {i: survivors[i] for i in order[:n_keep]}
    # 7. mixture sample
    sampled = {i: t for i, t in keepers.items()
               if _in_sample(i, p["sample_rate"], p["sample_salt"])}
    # 8. chunk + 9. pack (greedy cumsum in (doc_id, chunk_id) order)
    cw, st, budget = p["chunk_words"], p["stride"], p["pack_budget"]
    out, cum = [], 0
    for i in sorted(sampled):
        ws = sampled[i].split(" ")
        n = len(ws)
        n_chunks = 1 if n <= cw else (n - cw + st - 1) // st + 1
        for c in range(n_chunks):
            chunk = ws[c * st:c * st + cw]
            out.append((i, c, len(chunk), _md5(" ".join(chunk)),
                        cum // budget))
            cum += len(chunk)
    return bench_ids, retained, gated, survivors, keepers, out


def test_corpus_build_planted_values(spark):
    bench_ids, retained, gated, survivors, keepers, expected = _reference(
        ROWS, PARAMS)
    # the planted fates actually hold in the reference — the corpus
    # exercises every stage, not just the happy path
    assert bench_ids == {8}
    assert 2 not in retained            # scrub→dedup: redacted full dup
    assert 1 in retained
    assert retained[3] == "spam spam spam ham"   # within-doc window dup
    assert 5 in retained and 5 not in gated      # repetition victim
    assert 4 in gated and 4 not in survivors     # decontamination victim
    assert 9 in survivors and 9 not in keepers   # quality victim
    assert {0, 6, 7} <= set(keepers)
    assert any(i == 6 and c == 2 for i, c, *_ in expected)  # 3-chunk doc

    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = corpus_build(docs, **PARAMS)
    rows = [(r["doc_id"], r["chunk_id"], r["n_words"], r["chunk_hash"],
             r["pack_id"]) for r in got.collect()]
    for df in got.df_pipeline_caches:
        df.unpersist()
    assert sorted(rows) == expected


def test_write_training_shards(spark, tmp_path):
    """The training-export sink: whole packs per shard, one file per
    shard dir, rows in exact packing order, and every line's text
    reconstructs to its chunk_hash — the layout a pretraining loader
    streams."""
    import json as J
    import os

    from crab_spark.operators.packing import (
        with_pack_ids,
        write_training_shards,
    )
    from crab_spark.operators.scrub import chunk_documents

    rows = [(i, " ".join(f"d{i}w{j}" for j in range(3 + 4 * i)))
            for i in range(6)]                     # 3..23 words each
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cw, st, budget, pps = 4, 3, 6, 2
    chunks = chunk_documents(docs, chunk_words=cw, stride=st)
    packed = with_pack_ids(chunks, budget=budget,
                           order_cols=["doc_id", "chunk_id"],
                           weight_col="n_words")
    out = str(tmp_path / "shards")
    n_shards = write_training_shards(
        packed, docs, out, packs_per_shard=pps,
        chunk_words=cw, stride=st)
    packed.df_ordered_cache.unpersist()

    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shard_dirs) == n_shards > 1
    seen = []
    for d in shard_dirs:
        k = int(d.split("=")[1])
        files = [f for f in os.listdir(os.path.join(out, d))
                 if f.endswith(".json")]
        assert len(files) == 1                     # ONE file per shard
        recs = [J.loads(l) for l in
                open(os.path.join(out, d, files[0]))]
        order = [(r["pack_id"], r["doc_id"], r["chunk_id"]) for r in recs]
        assert order == sorted(order)              # packing order
        for r in recs:
            assert r["pack_id"] // pps == k        # pack never splits
            assert _md5(r["text"]) == _find_hash(  # text ↔ hash round-trip
                rows, r["doc_id"], r["chunk_id"], cw, st)
            assert r["n_words"] == len(r["text"].split(" "))
        seen += [(r["doc_id"], r["chunk_id"]) for r in recs]
    # every chunk of every doc exported exactly once
    want = []
    for i, t in rows:
        n = len(t.split(" "))
        n_chunks = 1 if n <= cw else (n - cw + st - 1) // st + 1
        want += [(i, c) for c in range(n_chunks)]
    assert sorted(seen) == sorted(want)

    # integrity guard: the WRONG docs frame (text drifted from what the
    # chunks were cut from) fails the write instead of silently
    # exporting a corrupt corpus
    import pytest as _pt
    drifted = docs.withColumn("text", F.concat(F.col("text"), F.lit(" x")))
    with _pt.raises(Exception, match="chunk_hash mismatch"):
        write_training_shards(packed, drifted, str(tmp_path / "bad"),
                              packs_per_shard=pps,
                              chunk_words=cw, stride=st)


def _find_hash(rows, doc_id, chunk_id, cw, st):
    text = dict(rows)[doc_id]
    ws = text.split(" ")
    return _md5(" ".join(ws[chunk_id * st:chunk_id * st + cw]))


def test_corpus_build_custom_text_col(spark):
    """The caller's text column name must thread through EVERY stage —
    in particular the benchmark side of the contamination gate (a
    regression: bench kept the original column while the corpus side
    was aliased to "text", so any text_col != "text" raised, and a
    stray unrelated "text" column silently decontaminated against the
    wrong text)."""
    bench_ids, *_, expected = _reference(ROWS, PARAMS)
    docs = spark.createDataFrame(ROWS, "doc_id long, body string")
    # adversarial decoy: an unrelated column literally named "text"
    # must NOT be consulted by any stage
    docs = docs.withColumn("text", F.lit("decoy decoy decoy"))
    got = corpus_build(docs, text_col="body", **PARAMS)
    rows = [(r["doc_id"], r["chunk_id"], r["n_words"], r["chunk_hash"],
             r["pack_id"]) for r in got.collect()]
    for df in got.df_pipeline_caches:
        df.unpersist()
    assert sorted(rows) == expected
