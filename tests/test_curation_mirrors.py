"""Seeded-random cross-validation for the LLM-curation arc.

The session-10 protocol (crawl-analytics + sketch families) extended to
the curation operators (q21+ family): each test replays the operator's
exact arithmetic — md5 shingle hashing, banding, threshold comparisons,
cumsum packing — in plain Python over seeded-random corpora NOBODY
chose, and asserts full-result equality. The planted tests pin chosen
branches and the DuckDB parity pins one fixed corpus; this layer covers
the tie-break/NULL/boundary edges random inputs find.

Mirrors are written against the documented contracts (docstrings in
crab_spark/operators/*), re-deriving constants (hex thresholds, shingle
rules) independently rather than importing the module's private
helpers."""

from __future__ import annotations

import hashlib
import math
import random
import re
from collections import Counter

import pytest

from crab_spark.operators import dedup as D
from crab_spark.operators import packing as P
from crab_spark.operators import sampling as SA
from crab_spark.operators import scrub as SC


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _norm(text: str | None) -> str:
    # dedup.normalized: lower + collapse \s+ to one space
    return re.sub(r"\s+", " ", (text or "").lower())


def _shingles(text: str | None, k: int) -> list[str]:
    # dedup.word_shingles: split raw text on literal ' ' (NULL → ''),
    # sequence(0, max(n-k, 0)) starts, slice may run short at the tail
    ws = (text or "").split(" ")
    n = max(len(ws) - k, 0)
    return [" ".join(ws[i:i + k]) for i in range(n + 1)]


def _rand_text(rng: random.Random) -> str | None:
    """Messy small-vocab text: forces shingle collisions, exercises
    NULLs, empties, doubled spaces and newlines."""
    roll = rng.random()
    if roll < 0.06:
        return None
    if roll < 0.12:
        return ""
    n = rng.randint(1, 12)
    words = [rng.choice(["a", "b", "c", "ab", "Ca", "bC"]) for _ in range(n)]
    sep = [rng.choice([" ", " ", " ", "  ", "\n", "\t "]) for _ in range(n - 1)]
    return "".join(w + s for w, s in zip(words, sep + [""], strict=True))


def test_exact_dedup_random_crossvalidation(spark):
    """exact_dedup on random messy corpora == the md5(normalized) →
    (min id, count) groups replayed in Python — including
    case/whitespace collisions. NULL texts hash to a NULL
    content_hash (normalized() does not coalesce — the q21 oracle's
    md5(lower(regexp_replace(text,...))) is NULL too) and groupBy
    collects them into one NULL-key group, distinct from ''."""
    rng = random.Random(2101)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(5, 40))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.content_hash: (r.keeper, r.n_dups)
            for r in D.exact_dedup(docs).collect()
        }
        want: dict[str | None, list] = {}
        for i, t in rows:
            h = _md5(_norm(t)) if t is not None else None
            m = want.setdefault(h, [i, 0])
            m[0] = min(m[0], i)
            m[1] += 1
        assert got == {h: tuple(m) for h, m in want.items()}, f"trial {trial}"
        assert sum(v[1] for v in got.values()) == len(rows)


def test_minhash_lsh_jaccard_random_crossvalidation(spark):
    """The near-dup chain on random corpora == its Python replay at
    every stage: minhash signatures (seeded-md5 min per shingle set),
    LSH band buckets with the whole-bucket cap (kept pairs AND the
    dropped-bucket report), and the shingle-set Jaccard verify
    (6 dp round)."""
    rng = random.Random(2102)
    n_hashes, band_size, k = 4, 2, 2
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(6, 24))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        cap = rng.choice([2, 4, None])

        # stage 1: signatures
        sigs_df = D.minhash_signatures(docs, n_hashes=n_hashes, k=k)
        got_sigs = {
            r.doc_id: tuple(r[f"sig_{i}"] for i in range(n_hashes))
            for r in sigs_df.collect()
        }
        want_sigs = {
            i: tuple(
                min(_md5(f"{h}|{s}") for s in _shingles(t, k))
                for h in range(n_hashes)
            )
            for i, t in rows
        }
        assert got_sigs == want_sigs, f"trial {trial} sigs"

        # stage 2: banded candidate pairs + dropped buckets
        pairs_df = D.lsh_candidate_pairs(
            sigs_df, n_hashes=n_hashes, band_size=band_size, max_bucket=cap
        )
        got_pairs = {(r.id_a, r.id_b) for r in pairs_df.collect()}
        buckets: dict[tuple, set] = {}
        for i in want_sigs:
            for b in range(n_hashes // band_size):
                key = "#".join(
                    want_sigs[i][b * band_size + j] for j in range(band_size)
                )
                buckets.setdefault((b, key), set()).add(i)
        live = {
            bk: mem for bk, mem in buckets.items()
            if cap is None or len(mem) <= cap
        }
        want_pairs = {
            (a, b)
            for mem in live.values()
            for a in mem for b in mem if a < b
        }
        assert got_pairs == want_pairs, f"trial {trial} cap {cap} pairs"
        if cap is not None:
            got_drop = {
                (r.band_idx, r.band_key, r.n)
                for r in pairs_df.dropped_buckets.collect()
            }
            want_drop = {
                (b, key, len(mem))
                for (b, key), mem in buckets.items() if len(mem) > cap
            }
            assert got_drop == want_drop, f"trial {trial} dropped"

        # stage 3: Jaccard verify over the candidates
        if got_pairs:
            jac = D.ngram_jaccard(docs, pairs_df, k=k)
            got_j = {(r.id_a, r.id_b): r.jaccard for r in jac.collect()}
            for h in D.cache_handles(jac):
                h.unpersist()
            sets = {i: set(_shingles(t, k)) for i, t in rows}
            want_j = {
                (a, b): round(
                    len(sets[a] & sets[b]) / len(sets[a] | sets[b]), 6
                )
                for a, b in want_pairs
            }
            assert got_j == want_j, f"trial {trial} jaccard"


def _hex_threshold(rate: float) -> str:
    # sampling contract: 32-nibble hex of floor(rate · 2^128), clamped
    rate = min(max(rate, 0.0), 1.0)
    return format(min(int(rate * (1 << 128)), (1 << 128) - 1), "032x")


def test_hash_sample_random_crossvalidation(spark):
    """hash_sample + stratified_sample on random keys == the
    md5(salt‖key) < hex-threshold rule replayed exactly, across random
    rates, salts, NULL strata, and strata absent from the rate map."""
    rng = random.Random(2103)
    langs = ["en", "de", "fr", None]
    for trial in range(3):
        rows = [
            (rng.randint(0, 10_000), rng.choice(langs))
            for _ in range(rng.randint(10, 120))
        ]
        rows = [(i, lang) for i, (key, lang) in enumerate(rows)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        rate = rng.choice([0.0, 0.17, 0.5, 0.93, 1.0])
        salt = rng.choice(["", "s1", "round5"])

        got = {r.doc_id for r in SA.hash_sample(df, rate, salt=salt).collect()}
        thr = _hex_threshold(rate)
        want = {
            i for i, _ in rows
            if rate >= 1.0 or (rate > 0.0 and _md5(f"{salt}{i}") < thr)
        }
        assert got == want, f"trial {trial} rate {rate}"

        rates = {"en": rng.random(), "de": rng.choice([0.0, 1.0])}
        default = rng.choice([0.0, 0.4])
        got_s = {
            r.doc_id
            for r in SA.stratified_sample(
                df, rates, "lang", default_rate=default, salt=salt
            ).collect()
        }
        want_s = {
            i for i, lang in rows
            if _md5(f"{salt}{i}")
            < _hex_threshold(rates.get(lang, default) if lang else default)
        }
        assert got_s == want_s, f"trial {trial} stratified"


def test_chunk_documents_random_crossvalidation(spark):
    """chunk_documents on random messy docs == the integer chunk-count
    rule + slice geometry + md5 chunk hashes replayed in Python;
    NULL/empty/whitespace-only docs produce NO chunks."""
    rng = random.Random(2104)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(5, 30))]
        # a few long docs so multi-chunk paths fire
        for j in range(3):
            n = rng.randint(15, 40)
            rows.append((100 + j, " ".join(
                rng.choice("abc") for _ in range(n))))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        cw = rng.choice([4, 8])
        st = rng.choice([2, cw])

        got = {
            (r.doc_id, r.chunk_id): (r.n_words, r.chunk_hash)
            for r in SC.chunk_documents(
                docs, chunk_words=cw, stride=st
            ).collect()
        }
        want = {}
        for i, t in rows:
            norm = _norm(t)
            if norm.strip() == "":
                continue
            ws = norm.split(" ")
            n = len(ws)
            n_chunks = 1 if n <= cw else 1 + math.ceil((n - cw) / st)
            for c in range(n_chunks):
                sl = ws[c * st:c * st + cw]
                want[(i, c)] = (len(sl), _md5(" ".join(sl)))
        assert got == want, f"trial {trial} cw {cw} st {st}"


def test_with_pack_ids_random_crossvalidation(spark):
    """with_pack_ids on random docs == the doc_id-ordered running-sum
    replay: identical n_tokens (whitespace-collapse count, NULL → '')
    and identical pack_id = cum_before // budget for every row,
    across budgets and the two-level partitioned cumsum."""
    rng = random.Random(2105)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(8, 80))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        budget = rng.choice([5, 16, 64])

        packed = P.with_pack_ids(docs, budget=budget)
        got = {
            r.doc_id: (r.n_tokens, r.pack_id) for r in packed.collect()
        }
        for h in D.cache_handles(packed):
            h.unpersist()
        cum = 0
        want = {}
        for i, t in sorted(rows):
            n_tok = len(re.sub(r"\s+", " ", t or "").split(" "))
            want[i] = (n_tok, cum // budget)
            cum += n_tok
        assert got == want, f"trial {trial} budget {budget}"
        # pack ids are monotone in doc order and start at 0
        assert min(p for _, p in got.values()) == 0
