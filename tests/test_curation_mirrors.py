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
from pyspark.sql import functions as F

from crab_spark.operators import dedup as D
from crab_spark.operators import packing as P
from crab_spark.operators import sampling as SA
from crab_spark.operators import scrub as SC


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _rnd(x: float, nd: int) -> float:
    """Spark-compatible round: HALF_UP on the double's EXACT decimal
    value (BigDecimal(double) semantics). Python's built-in round is
    half-EVEN, so the two disagree precisely on dyadic midpoints —
    1/32 at 4 dp is 0.03125, which Spark rounds to 0.0313 and round()
    to 0.0312. Ratios of small integers hit those midpoints whenever
    the denominator is a power of two, so mirrors must round the
    Spark way."""
    import decimal

    return float(
        decimal.Decimal(x).quantize(
            decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP
        )
    )


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
                (a, b): _rnd(
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


# ── batch 2: scrub / decontamination ────────────────────────────────


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}"


def _pii_text(rng: random.Random) -> str | None:
    """Random word soup with planted PII and deliberate near-misses
    (1-char TLDs, 4-digit octet runs, phones missing a group)."""
    roll = rng.random()
    if roll < 0.05:
        return None
    if roll < 0.10:
        return ""
    parts = []
    for _ in range(rng.randint(1, 10)):
        parts.append(rng.choice([
            "plain", "words", "Fox9", "a.b", "x@y",
            "bob@mail.example.com", "a.b@c.de", "no@tld.x",
            "10.0.0.1", "1234.5.6.7", "1.2.3", "255.255.255.255",
            "+1 555 123 4567", "+49 123 456 7890", "+1 555 123",
            "1.2.3.4@host.org",
        ]))
    return " ".join(parts)


def test_pii_scrub_random_crossvalidation(spark):
    """pii_scrub on random PII-salted text == the sequential
    email→ip→phone redaction replayed with Python's re on the SAME
    RE2-safe patterns: every count, the redacted-text hash, and the
    any_pii verdict (NULL text scored as '')."""
    rng = random.Random(2106)
    for trial in range(3):
        rows = [(i, _pii_text(rng)) for i in range(rng.randint(8, 40))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_emails, r.n_ipv4, r.n_phones,
                       r.redacted_hash, r.any_pii)
            for r in SC.pii_scrub(docs).collect()
        }
        want = {}
        for i, t in rows:
            s = t or ""
            n_e = len(re.findall(EMAIL_RE, s))
            s = re.sub(EMAIL_RE, "<EMAIL>", s)
            n_i = len(re.findall(IPV4_RE, s))
            s = re.sub(IPV4_RE, "<IP>", s)
            n_p = len(re.findall(PHONE_RE, s))
            s = re.sub(PHONE_RE, "<PHONE>", s)
            want[i] = (n_e, n_i, n_p, _md5(s), (n_e + n_i + n_p) > 0)
        assert got == want, f"trial {trial}"


def _windows(text: str | None, ww: int) -> list[str]:
    """scrub.word_windows replay: fixed ww-word segments over the
    normalized text, last segment ragged, empty text → one '' segment."""
    ws = _norm(text).split(" ")
    n_seg = max(math.ceil(len(ws) / ww), 1)
    return [" ".join(ws[i * ww:(i + 1) * ww]) for i in range(n_seg)]


_PHRASES = ["nav bar home", "hot take one", "cold raw data",
            "the end now", "buy this now", "read me twice"]


def _phrase_doc(rng: random.Random) -> str | None:
    roll = rng.random()
    if roll < 0.06:
        return None
    if roll < 0.12:
        return "   "
    # concatenated 3-word phrases keep window boundaries aligned so
    # cross-document duplicate segments actually occur at ww=3
    return rng.choice(["", " "]) + "  ".join(
        rng.choice(_PHRASES) for _ in range(rng.randint(1, 5))
    )


def test_paragraph_dedup_random_crossvalidation(spark):
    """paragraph_dedup + paragraph_retained on random phrase-pool
    corpora == the corpus-wide first-wins replay: identical per-doc
    segment counts, duplicate counts, and the retained text (and
    md5(retained text) == retained_hash across the two ops)."""
    rng = random.Random(2107)
    ww = 3
    for trial in range(3):
        rows = [(i, _phrase_doc(rng)) for i in range(rng.randint(5, 25))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_segs, r.n_dup_segs, r.retained_hash)
            for r in SC.paragraph_dedup(docs, window_words=ww).collect()
        }
        got_text = {
            r.doc_id: r.text
            for r in SC.paragraph_retained(docs, window_words=ww).collect()
        }

        first: dict[str, tuple[int, int]] = {}
        segs: dict[int, list[tuple[int, str]]] = {}
        for i, t in sorted(rows):
            ss = [(p, s) for p, s in enumerate(_windows(t, ww)) if s != ""]
            segs[i] = ss
            for p, s in ss:
                h = _md5(s)
                if (i, p) < first.get(h, (1 << 60, 0)):
                    first[h] = (i, p)
        want, want_text = {}, {}
        for i, _ in rows:
            kept = [s for p, s in segs[i] if first[_md5(s)] == (i, p)]
            n_dup = len(segs[i]) - len(kept)
            want[i] = (len(segs[i]), n_dup, _md5(" ".join(kept)))
            want_text[i] = " ".join(kept)
        assert got == want, f"trial {trial}"
        assert got_text == want_text, f"trial {trial} retained text"
        for i in want:
            assert _md5(want_text[i]) == want[i][2]


def test_repetition_stats_random_crossvalidation(spark):
    """repetition_stats on random messy docs == the normalized-shingle
    total/distinct/ratio replay (NULL text → one '' shingle, ratio 0)."""
    from crab_spark.operators import decontam as DC

    rng = random.Random(2108)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(5, 40))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        k = rng.choice([2, 3])
        got = {
            r.doc_id: (r.n_ngrams, r.n_distinct, r.rep_ratio)
            for r in DC.repetition_stats(docs, k=k).collect()
        }
        want = {}
        for i, t in rows:
            sh = _shingles(_norm(t), k)
            n, d = len(sh), len(set(sh))
            want[i] = (n, d, _rnd(1.0 - d / max(n, 1), 4))
        assert got == want, f"trial {trial} k {k}"


def test_ngram_contamination_random_crossvalidation(spark):
    """Thresholded ngram_contamination on random corpus×benchmark
    pairs == the distinct-shingle intersection replay with the exact
    Fraction cutoff rule, across max_frac settings including the
    strict any-hit default."""
    from fractions import Fraction

    from crab_spark.operators import decontam as DC

    rng = random.Random(2109)
    k = 2
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(6, 30))]
        bench_rows = [(i, _rand_text(rng)) for i in range(rng.randint(2, 6))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
        max_frac = rng.choice([0.0, 0.25, 0.5])

        got = {
            r.doc_id: (r.n_contaminated, r.n_shingles, r.contam_frac,
                       r.contaminated)
            for r in DC.ngram_contamination(
                docs, bench, k=k, max_frac=max_frac
            ).collect()
        }
        bench_sh = {
            s for _, t in bench_rows for s in _shingles(_norm(t), k) if s != ""
        }
        frac = Fraction(str(max_frac))
        want = {}
        for i, t in rows:
            doc_sh = set(_shingles(_norm(t), k))
            n_c = len(doc_sh & bench_sh)
            n_s = len({s for s in doc_sh if s != ""})
            want[i] = (
                n_c, n_s, _rnd(n_c / max(n_s, 1), 4),
                n_c * frac.denominator > frac.numerator * n_s,
            )
        assert got == want, f"trial {trial} max_frac {max_frac}"


def test_cross_source_overlap_random_crossvalidation(spark):
    """cross_source_overlap on random phrase-pool corpora == the
    per-source distinct segment-set intersection counts (NULL sources
    never pair; zero-overlap pairs absent)."""
    rng = random.Random(2110)
    ww = 3
    for trial in range(3):
        rows = [
            (i, _phrase_doc(rng), rng.choice(["s0", "s1", "s2", None]))
            for i in range(rng.randint(6, 30))
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        ov = SC.cross_source_overlap(docs, window_words=ww)
        got = {
            (r.source_a, r.source_b): r.n_shared for r in ov.collect()
        }
        ov.df_ordered_cache.unpersist()
        per_src: dict[str, set] = {}
        for _, t, src in rows:
            if src is None:
                continue
            for s in _windows(t, ww):
                if s != "":
                    per_src.setdefault(src, set()).add(_md5(s))
        srcs = sorted(per_src)
        want = {}
        for x in range(len(srcs)):
            for y in range(x + 1, len(srcs)):
                n = len(per_src[srcs[x]] & per_src[srcs[y]])
                if n:
                    want[(srcs[x], srcs[y])] = n
        assert got == want, f"trial {trial}"


def test_source_mix_report_random_crossvalidation(spark):
    """source_mix_report on random corpora == the per-source rollup
    replay: doc counts, char sums/means (2 dp), language spread, and
    the exact-duplicate rate over md5(normalized) hashes — including
    NULL sources (their own group), NULL langs and NULL texts."""
    from crab_spark.operators import decontam as DC

    rng = random.Random(2111)
    for trial in range(3):
        rows = [
            (i, _rand_text(rng), rng.choice(["s0", "s1", None]),
             rng.choice(["en", "de", None]))
            for i in range(rng.randint(6, 50))
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string, lang string"
        )
        got = {
            r.source: (r.n_docs, r.total_chars, r.mean_chars, r.n_langs,
                       r.dup_rate)
            for r in DC.source_mix_report(docs).collect()
        }
        groups: dict[str | None, list] = {}
        for i, t, src, lang in rows:
            groups.setdefault(src, []).append((t, lang))
        want = {}
        for src, ms in groups.items():
            chars = [len(t) for t, _ in ms if t is not None]
            n = len(ms)
            # sum/avg skip NULL chars (NULL text → NULL length)
            total = sum(chars) if chars else None
            mean = _rnd(sum(chars) / len(chars), 2) if chars else None
            langs = len({lg for _, lg in ms if lg is not None})
            # countDistinct skips NULLs: a NULL-text doc contributes no
            # content hash, so it always reads as "duplicate mass"
            hashes = len({
                _md5(_norm(t)) for t, _ in ms if t is not None
            })
            want[src] = (n, total, mean, langs, _rnd(1.0 - hashes / n, 4))
        assert got == want, f"trial {trial}"


# ── batch 3: text scoring ───────────────────────────────────────────


def test_lang_id_random_crossvalidation(spark):
    """lang_id on random mixed-language soup == the distinct-token ∩
    stopword-profile argmax replay (ties → language-code order), on
    BOTH the expression path and the Arrow StopwordModel path; NULL
    text predicts NULL on both."""
    from crab_spark.operators.text import LANG_STOPWORDS, StopwordModel
    from crab_spark.operators import text as X

    rng = random.Random(2112)
    vocab = (
        LANG_STOPWORDS["en"][:6] + LANG_STOPWORDS["de"][:6]
        + LANG_STOPWORDS["fr"][:6] + ["zork", "blip", "Qux"]
    )
    langs = sorted(LANG_STOPWORDS)
    for trial in range(3):
        rows = []
        for i in range(rng.randint(6, 30)):
            if rng.random() < 0.08:
                rows.append((i, None))
            else:
                rows.append((i, "  ".join(
                    rng.choice(vocab)
                    for _ in range(rng.randint(1, 10)))))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got_expr = {
            r.doc_id: (r.pred_lang, r.hits)
            for r in X.lang_id(docs).collect()
        }
        got_model = {
            r.doc_id: (r.pred_lang, r.hits)
            for r in X.lang_id(docs, model=StopwordModel()).collect()
        }
        want = {}
        for i, t in rows:
            if t is None:
                want[i] = (None, None)
                continue
            toks = set(_norm(t).split(" "))
            scores = {
                lang: len(toks & set(LANG_STOPWORDS[lang])) for lang in langs
            }
            best = max(scores.values())
            pred = next(lang for lang in langs if scores[lang] == best)
            want[i] = (pred, best)
        assert got_expr == want, f"trial {trial} expr"
        assert got_model == want, f"trial {trial} model"


def test_fingerprint_random_crossvalidation(spark):
    """fingerprint on random messy docs == md5(normalized) identity +
    the min-shingle-hash structural print replay (NULL text → NULL
    content hash but a real structural hash over the '' shingle)."""
    from crab_spark.operators import text as X

    rng = random.Random(2113)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(5, 40))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        k = rng.choice([2, 3])
        got = {
            r.doc_id: (r.content_hash, r.structural_hash)
            for r in X.fingerprint(docs, k=k).collect()
        }
        want = {}
        for i, t in rows:
            ch = _md5(_norm(t)) if t is not None else None
            norm = _norm(t) if t is not None else ""
            sh = min(_md5(s) for s in _shingles(norm, k))
            want[i] = (ch, sh)
        assert got == want, f"trial {trial} k {k}"


def _lm_mirror(rows: list[tuple[int, str | None]]) -> dict[int, tuple]:
    """lm_score replay: corpus unigram LM over normalized tokens,
    per-doc mean negative log likelihood (4 dp), token-free docs → 0."""
    per_doc = {
        i: Counter(w for w in _norm(t).split(" ") if w != "")
        for i, t in rows
    }
    freqs = Counter()
    for c in per_doc.values():
        freqs.update(c)
    tot = sum(freqs.values())
    out = {}
    for i, _ in rows:
        c = per_doc[i]
        n = sum(c.values())
        if n == 0:
            out[i] = (0, 0.0)
        else:
            nll = sum(cnt * -math.log(freqs[w] / tot) for w, cnt in c.items())
            out[i] = (n, _rnd(nll / n, 4))
    return out


def test_lm_score_random_crossvalidation(spark):
    """lm_score on random corpora == the corpus-fit unigram-NLL replay
    (token counts from the SAME corpus, no smoothing; empty/NULL docs
    carried with n_words=0, avg_nll=0)."""
    from crab_spark.operators import text as X

    rng = random.Random(2114)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(6, 40))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        scored = X.lm_score(docs)
        got = {r.doc_id: (r.n_words, r.avg_nll) for r in scored.collect()}
        for h in D.cache_handles(scored):
            h.unpersist()
        assert got == _lm_mirror(rows), f"trial {trial}"


def test_quality_percentile_gate_random_crossvalidation(spark):
    """quality_percentile_gate on random corpora == the rank replay
    over the total order (empty-last, avg_nll, doc_id) with the exact
    Fraction keep boundary — keep counts, percentiles, and every
    verdict."""
    from fractions import Fraction

    from crab_spark.operators import text as X

    rng = random.Random(2115)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(6, 40))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        cut = rng.choice([0.5, 0.75, 0.9])
        gated = X.quality_percentile_gate(docs, cut=cut)
        got = {
            r.doc_id: (r.n_words, r.avg_nll, r.quality_pct, r.keep)
            for r in gated.collect()
        }
        for h in D.cache_handles(gated):
            h.unpersist()
        lm = _lm_mirror(rows)
        order = sorted(lm, key=lambda i: (lm[i][0] == 0, lm[i][1], i))
        n = len(order)
        boundary = math.ceil(Fraction(str(cut)) * n)
        want = {
            i: (
                lm[i][0], lm[i][1],
                _rnd(rk / max(n - 1, 1), 6), rk < boundary,
            )
            for rk, i in enumerate(order)
        }
        assert got == want, f"trial {trial} cut {cut}"
        assert sum(1 for v in got.values() if v[3]) == min(boundary, n)


def test_tfidf_topk_random_crossvalidation(spark):
    """tfidf_topk on random corpora == the tf·ln(N/df) replay with the
    (score desc, word asc) per-doc total order and the 4 dp round."""
    from crab_spark.operators import text as X

    rng = random.Random(2116)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(6, 30))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        k = rng.choice([2, 3])
        out = X.tfidf_topk(docs, k=k)
        got = {
            (r.doc_id, r.rank): (r.word, r.tf, r.df, r.score)
            for r in out.collect()
        }
        for h in D.cache_handles(out):
            h.unpersist()
        per_doc = {
            i: Counter(w for w in _norm(t).split(" ") if w != "")
            for i, t in rows
        }
        df_ = Counter()
        for c in per_doc.values():
            df_.update(set(c))
        n_docs = len(rows)
        want = {}
        for i, c in per_doc.items():
            scored = sorted(
                (
                    (-_rnd(tf * math.log(n_docs / df_[w]), 4), w, tf)
                    for w, tf in c.items()
                ),
            )
            for rk, (neg, w, tf) in enumerate(scored[:k], start=1):
                want[(i, rk)] = (w, tf, df_[w], -neg)
        assert got == want, f"trial {trial} k {k}"


def test_quality_features_random_crossvalidation(spark):
    """quality_features on random punctuation-salted text == the
    length/ratio replay (4 dp, HALF_UP); NULL text yields NULL
    features."""
    from crab_spark.operators import text as X

    rng = random.Random(2117)
    vocab = ["Hi!", "a.b", "X,Y", "low", "UP", "??", "x;y:z",
             "Mixed.Case", "plain", "A"]
    for trial in range(3):
        rows = []
        for i in range(rng.randint(6, 40)):
            roll = rng.random()
            if roll < 0.06:
                rows.append((i, None))
            elif roll < 0.12:
                rows.append((i, ""))
            else:
                sep = rng.choice([" ", "  ", "\n"])
                rows.append((i, sep.join(
                    rng.choice(vocab)
                    for _ in range(rng.randint(1, 10)))))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_chars, r.mean_word_len, r.punct_ratio,
                       r.upper_ratio, r.space_ratio)
            for r in X.quality_features(docs).collect()
        }
        want = {}
        for i, t in rows:
            if t is None:
                want[i] = (None, None, None, None, None)
                continue
            n = len(t)
            n_words = len(re.sub(r"[ \t\n\x0b\f\r]+", " ", t).split(" "))
            punct = sum(1 for ch in t if ch in ".,;:!?")
            upper = sum(1 for ch in t if "A" <= ch <= "Z")
            space = t.count(" ")
            want[i] = (
                n,
                _rnd(n / max(n_words, 1.0), 4),
                _rnd(punct / max(n, 1.0), 4),
                _rnd(upper / max(n, 1.0), 4),
                _rnd(space / max(n, 1.0), 4),
            )
        assert got == want, f"trial {trial}"


def test_word_freq_random_crossvalidation(spark):
    """word_freq on random corpora == the normalized-token Counter
    with the min_count floor."""
    from crab_spark.operators import text as X

    rng = random.Random(2118)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(6, 50))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        mc = rng.choice([1, 2, 4])
        got = {
            r.word: r.n for r in X.word_freq(docs, min_count=mc).collect()
        }
        cnt = Counter(
            w for _, t in rows for w in _norm(t).split(" ") if w != ""
        )
        want = {w: c for w, c in cnt.items() if c >= mc}
        assert got == want, f"trial {trial} mc {mc}"


# ── batch 4: simhash + vector similarity ────────────────────────────


def _dotf(a, b):
    # similarity._dot replay: left fold in index order, init 0.0 —
    # the EXACT same IEEE operation sequence as F.aggregate(zip_with)
    acc = 0.0
    for x, y in zip(a, b, strict=True):
        acc = acc + x * y
    return acc


def _cosf(a, b):
    if a is None or b is None:
        return None
    den = math.sqrt(_dotf(a, a)) * math.sqrt(_dotf(b, b))
    if den == 0.0:
        return None
    return _dotf(a, b) / den


def _dyadic_vec(rng: random.Random, dim: int = 4):
    """Multiples of 0.25: every product/sum in the cosine fold is an
    exactly-representable dyadic, so the mirror's doubles are
    bit-identical to Spark's regardless of aggregation order."""
    roll = rng.random()
    if roll < 0.08:
        return None
    if roll < 0.16:
        return [0.0] * dim
    return [rng.randint(-8, 8) * 0.25 for _ in range(dim)]


def test_simhash_random_crossvalidation(spark):
    """simhash + simhash_neardup_pairs on random small-vocab corpora ==
    the Charikar bit-vote replay (md5[:8] little-endian token hashes,
    signed votes, two's-complement int64) and the 8×8-bit banding with
    the hamming cap and whole-bucket drop."""
    rng = random.Random(2119)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for trial in range(3):
        rows = []
        for i in range(rng.randint(6, 20)):
            roll = rng.random()
            if roll < 0.08:
                rows.append((i, None))
            elif roll < 0.16:
                rows.append((i, ""))
            else:
                rows.append((i, " ".join(
                    rng.choice(vocab)
                    for _ in range(rng.randint(1, 10)))))
        # planted exact dup → hamming 0 pair
        rows.append((900, rows[-1][1]))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        sigs_df = D.simhash(docs)
        got_sigs = {r.doc_id: r.simhash for r in sigs_df.collect()}

        def sig_of(text):
            if not text:
                return 0
            toks = text.lower().split()
            if not toks:
                return 0
            votes = [0] * 64
            for t in toks:
                h = int.from_bytes(
                    hashlib.md5(t.encode()).digest()[:8], "little"
                )
                for b in range(64):
                    votes[b] += 1 if (h >> b) & 1 else -1
            sig = sum(1 << b for b in range(64) if votes[b] > 0)
            return sig - (1 << 64) if sig >= (1 << 63) else sig

        want_sigs = {i: sig_of(t) for i, t in rows}
        assert got_sigs == want_sigs, f"trial {trial} sigs"

        cap = rng.choice([3, None])
        mh = rng.choice([7, 64])
        pairs_df = D.simhash_neardup_pairs(
            sigs_df, max_hamming=mh, max_bucket=cap
        )
        got = {(r.id_a, r.id_b): r.hamming for r in pairs_df.collect()}
        u = {i: s & ((1 << 64) - 1) for i, s in want_sigs.items()}
        buckets: dict[tuple, set] = {}
        for i, s in u.items():
            for b in range(8):
                buckets.setdefault((b, (s >> (b * 8)) & 0xFF), set()).add(i)
        live = [m for m in buckets.values() if cap is None or len(m) <= cap]
        want = {}
        for mem in live:
            for x in mem:
                for y in mem:
                    if x < y:
                        h = bin(u[x] ^ u[y]).count("1")
                        if h <= mh:
                            want[(x, y)] = h
        assert got == want, f"trial {trial} cap {cap} mh {mh}"
        if cap is not None:
            got_drop = {
                (r.band_idx, r.band_key, r.n)
                for r in pairs_df.dropped_buckets.collect()
            }
            want_drop = {
                (b, key, len(m))
                for (b, key), m in buckets.items() if len(m) > cap
            }
            assert got_drop == want_drop, f"trial {trial} dropped"


def test_cosine_topk_random_crossvalidation(spark):
    """cosine_topk on random dyadic vectors == the exact fold replay
    with (score desc NULLS LAST, id asc) ordering — zero-norm and NULL
    embeddings score NULL and sort last, never crash the scan."""
    from crab_spark.operators import similarity as SI

    rng = random.Random(2120)
    for trial in range(3):
        rows = [(i, _dyadic_vec(rng)) for i in range(rng.randint(6, 30))]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = [rng.randint(-8, 8) * 0.25 for _ in range(4)]
        if all(x == 0.0 for x in q):
            q[0] = 1.0
        k = rng.choice([3, 5, 100])
        got = [
            (r.vec_id, r.score)
            for r in SI.cosine_topk(emb, q, k=k).collect()
        ]
        scored = [
            (i, None if _cosf(v, q) is None else _rnd(_cosf(v, q), 4))
            for i, v in rows
        ]
        scored.sort(key=lambda t: (t[1] is None, -(t[1] or 0.0), t[0]))
        assert got == scored[:k], f"trial {trial} k {k}"


def test_ivf_neardup_random_crossvalidation(spark):
    """ivf_assign + embedding_neardup_pairs on random dyadic vectors ==
    the argmax-bucket + in-bucket cosine-verify replay, with the bucket
    cap and dropped-bucket report; zero-norm/NULL vectors take a NULL
    bucket and never pair."""
    from crab_spark.operators import similarity as SI

    rng = random.Random(2121)
    for trial in range(3):
        rows = [(i, _dyadic_vec(rng)) for i in range(rng.randint(8, 30))]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = []
        for _ in range(3):
            c = [rng.randint(-8, 8) * 0.25 for _ in range(4)]
            if all(x == 0.0 for x in c):
                c[0] = 1.0
            cents.append(c)
        assigned = SI.ivf_assign(emb, cents)
        got_b = {r.vec_id: r.bucket for r in assigned.collect()}
        want_b = {}
        for i, v in rows:
            scores = [_cosf(v, c) for c in cents]
            if all(s is None for s in scores):
                want_b[i] = None
            else:
                m = max(s for s in scores if s is not None)
                want_b[i] = scores.index(m)
        assert got_b == want_b, f"trial {trial} buckets"

        thr, cap = 0.5, rng.choice([3, None])
        pairs_df = SI.embedding_neardup_pairs(
            assigned, threshold=thr, max_bucket=cap
        )
        got_p = {(r.id_a, r.id_b): r.score for r in pairs_df.collect()}
        vecs = dict(rows)
        members: dict[int, list] = {}
        for i, b in want_b.items():
            if b is not None:
                members.setdefault(b, []).append(i)
        want_p = {}
        for b, mem in members.items():
            if cap is not None and len(mem) > cap:
                continue
            for x in mem:
                for y in mem:
                    if x < y:
                        s = _cosf(vecs[x], vecs[y])
                        if s is not None and _rnd(s, 4) >= thr:
                            want_p[(x, y)] = _rnd(s, 4)
        assert got_p == want_p, f"trial {trial} cap {cap} pairs"


def test_label_centroid_random_crossvalidation(spark):
    """label_centroid_cosine on random dyadic labeled vectors == the
    per-label mean-centroid replay (exact dyadic cell sums, so
    aggregation order can't split the engines) with NULL labels
    dropped and NULL/zero-norm rows scoring NULL."""
    from crab_spark.operators import similarity as SI

    rng = random.Random(2122)
    for trial in range(3):
        rows = [
            (i, _dyadic_vec(rng), rng.choice(["x", "y", "z", None]))
            for i in range(rng.randint(8, 30))
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label string"
        )
        got = {
            r.vec_id: (r.label, r.centroid_cos)
            for r in SI.label_centroid_cosine(emb).collect()
        }
        cells: dict[tuple, list] = {}
        for _, v, lab in rows:
            if v is None:
                continue
            for pos, x in enumerate(v):
                cells.setdefault((lab, pos), []).append(x)
        cents = {}
        for (lab, pos), xs in cells.items():
            cents.setdefault(lab, {})[pos] = math.fsum(xs) / len(xs)
        want = {}
        for i, v, lab in rows:
            if lab is None:
                continue
            c = [cents[lab][p] for p in sorted(cents.get(lab, {}))]
            if not c:
                continue  # no non-null vec ever carried this label
            s = _cosf(v, c)
            want[i] = (lab, None if s is None else _rnd(s, 4))
        assert got == want, f"trial {trial}"


# ── batch 5: mixture / split / order sampling family ────────────────


def _nonempty_tokens(t: str | None) -> list[str]:
    # text.tokens over coalesced raw text, empties filtered
    return [
        w for w in re.sub(r"[ \t\n\x0b\f\r]+", " ", t or "").split(" ") if w
    ]


def test_temperature_mixture_random_crossvalidation(spark):
    """temperature_mixture_rates on random corpora == the p^α
    renormalization replay (6 dp): token shares, temp shares, boosts —
    including NULL sources (their own group) and 0-token sources
    (boost pinned 0)."""
    from crab_spark.operators import sampling as SAM

    rng = random.Random(2123)
    for trial in range(3):
        rows = [
            (i, _rand_text(rng), rng.choice(["s0", "s1", "s2", None]))
            for i in range(rng.randint(8, 50))
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        alpha = rng.choice([0.5, 0.7, 1.0])
        got = {
            r.source: (r.n_docs, r.n_tokens, r.token_share, r.temp_share,
                       r.boost)
            for r in SAM.temperature_mixture_rates(docs, alpha=alpha).collect()
        }
        per: dict[str | None, list] = {}
        for _, t, src in rows:
            m = per.setdefault(src, [0, 0])
            m[0] += 1
            m[1] += len(_nonempty_tokens(t))
        tot = sum(m[1] for m in per.values())
        pa = {s: math.pow(m[1] / tot, alpha) for s, m in per.items()}
        z = sum(pa.values())
        want = {}
        for s, (nd, nt) in per.items():
            p = nt / tot
            boost = _rnd(pa[s] / z / p, 6) if p > 0 else 0.0
            want[s] = (nd, nt, _rnd(p, 6), _rnd(pa[s] / z, 6), boost)
        assert got == want, f"trial {trial} alpha {alpha}"


def test_holdout_split_random_crossvalidation(spark):
    """holdout_split on random keys == the cumulative hash-interval
    replay — disjoint, exhaustive, and stable across salt choices;
    NULL keys hash as ''."""
    from crab_spark.operators import sampling as SAM

    rng = random.Random(2124)
    for trial in range(3):
        n = rng.randint(10, 120)
        rows = [(i if rng.random() > 0.05 else None, i) for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id long, row long")
        fracs = rng.choice([(0.9, 0.05, 0.05), (0.5, 0.5), (1.0,)])
        names = ("a", "b", "c")[: len(fracs)]
        salt = rng.choice(["", "e1"])
        got = {
            r.row: r.split
            for r in SAM.holdout_split(
                df, fractions=fracs, names=names, salt=salt
            ).collect()
        }
        want = {}
        for key, rowid in rows:
            h = _md5(f"{salt}{key if key is not None else ''}")
            cum, pick = 0.0, names[-1]
            for frac, name in zip(fracs[:-1], names[:-1]):
                cum += float(frac)
                if h < _hex_threshold(cum):
                    pick = name
                    break
            want[rowid] = pick
        assert got == want, f"trial {trial} fracs {fracs}"


def test_epoch_order_random_crossvalidation(spark):
    """epoch_order on random keys == the dense (md5(seed‖key), key)
    rank replay; a different seed is a different permutation of the
    same rows."""
    from crab_spark.operators import dedup as DD
    from crab_spark.operators import sampling as SAM

    rng = random.Random(2125)
    for trial in range(3):
        ids = rng.sample(range(10_000), rng.randint(8, 80))
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        seed = rng.choice(["", "ep1", "ep2"])
        out = SAM.epoch_order(df, seed=seed)
        got = {r.doc_id: (r.shuffle_key, r.epoch_pos) for r in out.collect()}
        for h in DD.cache_handles(out):
            h.unpersist()
        order = sorted(ids, key=lambda i: (_md5(f"{seed}{i}"), i))
        want = {
            i: (_md5(f"{seed}{i}"), pos) for pos, i in enumerate(order)
        }
        assert got == want, f"trial {trial} seed {seed!r}"


def test_apply_mixture_rates_random_crossvalidation(spark):
    """temperature_mixture_rates ∘ apply_mixture_rates composed on
    random corpora == the replay: rate = min(base·boost, 1), keep =
    first-48-bit hash fraction < rate; sources filtered out of the
    rates frame (and NULL-source rows when absent) rate 0."""
    from crab_spark.operators import sampling as SAM

    rng = random.Random(2126)
    for trial in range(3):
        rows = [
            (i, _rand_text(rng), rng.choice(["s0", "s1", "s2", None]))
            for i in range(rng.randint(8, 60))
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        rates = SAM.temperature_mixture_rates(docs, alpha=0.5)
        # drop one source from the rates frame → absent ⇒ rate 0.0
        rates = rates.filter(
            (F.col("source").isNull()) | (F.col("source") != "s2")
        )
        base = rng.choice([0.3, 0.8])
        salt = rng.choice(["", "mx"])
        got = {
            r.doc_id: (r.source, r.rate, r.keep)
            for r in SAM.apply_mixture_rates(
                docs, rates, base_rate=base, salt=salt
            ).collect()
        }
        boosts = {
            r.source: r.boost for r in rates.collect()
        }
        want = {}
        for i, _, src in rows:
            boost = boosts.get(src, 0.0)
            rate = min(base * boost, 1.0)
            frac = int(_md5(f"{salt}{i}")[:12], 16) / float(1 << 48)
            want[i] = (src, rate, frac < rate)
        assert got == want, f"trial {trial} base {base}"


# ── batch 6: incremental dedup / novelty / line dedup ───────────────


def test_dedup_incremental_random_crossvalidation(spark):
    """dedup_incremental on random batch×corpus pairs == the
    hash-membership + in-batch first-wins replay, identical on BOTH
    the broadcast-batch and shuffle paths; NULL text hashes as ''."""
    rng = random.Random(2127)
    for trial in range(3):
        pool = [_rand_text(rng) for _ in range(10)]
        corpus_rows = [
            (1000 + j, rng.choice(pool)) for j in range(rng.randint(3, 20))
        ]
        batch_rows = [
            (i, rng.choice(pool) if rng.random() < 0.7 else _rand_text(rng))
            for i in range(rng.randint(5, 30))
        ]
        batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
        corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")

        def h(t):
            return _md5(_norm(t)) if t is not None else _md5("")

        corpus_hashes = {h(t) for _, t in corpus_rows}
        keeper = {}
        for i, t in sorted(batch_rows):
            keeper.setdefault(h(t), i)
        want = {}
        for i, t in batch_rows:
            hh = h(t)
            in_c = hh in corpus_hashes
            bk = keeper[hh] == i
            want[i] = (hh, in_c, bk, not in_c and bk)
        for bb in (True, False):
            got = {
                r.doc_id: (r.content_hash, r.in_corpus, r.batch_keeper, r.keep)
                for r in D.dedup_incremental(
                    batch, corpus, broadcast_batch=bb
                ).collect()
            }
            assert got == want, f"trial {trial} broadcast {bb}"


def test_keep_corpus_random_crossvalidation(spark):
    """keep_corpus on random component labelings == the size +
    keeper-rule replay (keeper ⇔ id == cluster_id; sizes conserved)."""
    rng = random.Random(2128)
    for trial in range(3):
        ids = rng.sample(range(500), rng.randint(8, 60))
        labels = {}
        for i in ids:
            members = [j for j in ids if j <= i]
            labels[i] = rng.choice(members[-3:])  # min-ish labels
        # make labels valid component labels: root points to itself
        for i in ids:
            while labels[labels[i]] != labels[i]:
                labels[i] = labels[labels[i]]
        clusters = spark.createDataFrame(
            [(i, labels[i]) for i in ids], "doc_id long, cluster_id long"
        )
        got = {
            r.doc_id: (r.cluster_id, r.cluster_size, r.is_keeper)
            for r in D.keep_corpus(clusters).collect()
        }
        sizes = Counter(labels.values())
        want = {
            i: (labels[i], sizes[labels[i]], i == labels[i]) for i in ids
        }
        assert got == want, f"trial {trial}"
        assert sum(1 for v in got.values() if v[2]) == len(sizes)


def test_novelty_score_random_crossvalidation(spark):
    """novelty_score on random corpora == the distinct-shingle
    document-frequency replay: n_shingles, n_novel, 6 dp novelty,
    NULL verdict for shingle-free docs."""
    rng = random.Random(2129)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(6, 40))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        k = rng.choice([2, 3])
        out = D.novelty_score(docs, k=k)
        got = {
            r.doc_id: (r.n_shingles, r.n_novel, r.novelty)
            for r in out.collect()
        }
        for h in D.cache_handles(out):
            h.unpersist()
        per = {
            i: {s for s in _shingles(t, k) if s != ""} for i, t in rows
        }
        dfreq = Counter(s for ss in per.values() for s in ss)
        want = {}
        for i, ss in per.items():
            n = len(ss)
            novel = sum(1 for s in ss if dfreq[s] == 1)
            want[i] = (n, novel, _rnd(novel / n, 6) if n else None)
        assert got == want, f"trial {trial} k {k}"


def test_dedup_lines_random_crossvalidation(spark):
    """dedup_lines on random line-pool docs == the order-preserving
    first-occurrence replay (counts + reassembled text; NULL → '')."""
    rng = random.Random(2130)
    pool = ["nav menu", "cookie banner", "real content a",
            "real content b", "", "footer"]
    for trial in range(3):
        rows = []
        for i in range(rng.randint(5, 30)):
            if rng.random() < 0.06:
                rows.append((i, None))
            else:
                rows.append((i, "\n".join(
                    rng.choice(pool)
                    for _ in range(rng.randint(1, 8)))))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.text, r.n_lines, r.n_removed)
            for r in SC.dedup_lines(docs).collect()
        }
        want = {}
        for i, t in rows:
            lines = (t or "").split("\n")
            kept = list(dict.fromkeys(lines))
            want[i] = ("\n".join(kept), len(lines), len(lines) - len(kept))
        assert got == want, f"trial {trial}"


# ── batch 7: the composed corpus-build pipeline (q55 shape) ─────────


def test_corpus_build_random_crossvalidation(spark):
    """The END-TO-END corpus_build composition on random corpora == a
    full Python replay of every stage in sequence: benchmark split →
    PII scrub → corpus-wide first-wins paragraph dedup → exact-Fraction
    repetition and contamination gates → survivor-population LM
    percentile gate → hash sample → chunking → greedy packing. The
    step mirrors are each validated above; this pins the COMPOSITION —
    row identity across gates, retained-text propagation, and the
    percentile ranking over exactly the surviving population."""
    from fractions import Fraction

    from crab_spark.operators.pipeline import corpus_build

    rng = random.Random(2131)
    ww, rep_k, contam_k = 3, 2, 2
    rep_max, contam_max = 0.5, 0.25
    cut, bench_rate, sample_rate = 0.8, 0.2, 0.6
    cw, st, budget = 4, 2, 8

    def doc(rng):
        roll = rng.random()
        if roll < 0.05:
            return None
        if roll < 0.10:
            return ""
        if roll < 0.25:   # repetitive doc — trips the repetition gate
            w = rng.choice(["spam", "ham"])
            return " ".join([w] * rng.randint(4, 9))
        body = "  ".join(
            rng.choice(_PHRASES) for _ in range(rng.randint(1, 5))
        )
        if rng.random() < 0.2:  # PII-salted
            body += " bob@mail.example.com 10.0.0.1"
        return body

    for trial in range(3):
        rows = [(i, doc(rng)) for i in range(rng.randint(15, 45))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = corpus_build(
            docs,
            bench_rate=bench_rate, window_words=ww,
            rep_k=rep_k, rep_max=rep_max,
            contam_k=contam_k, contam_max_frac=contam_max,
            quality_cut=cut, sample_rate=sample_rate,
            chunk_words=cw, stride=st, pack_budget=budget,
        )
        got = {
            (r.doc_id, r.chunk_id): (r.n_words, r.chunk_hash, r.pack_id)
            for r in out.collect()
        }
        for h in D.cache_handles(out):
            h.unpersist()

        # 1. benchmark split (raw text)
        bench_thr = _hex_threshold(bench_rate)
        bench = {i: t for i, t in rows if _md5(f"bench{i}") < bench_thr}
        corpus = [(i, t) for i, t in rows if i not in bench]
        # 2. scrub (sequential redaction; NULL stays NULL)
        def scrub(t):
            if t is None:
                return None
            t = re.sub(EMAIL_RE, "<EMAIL>", t)
            t = re.sub(IPV4_RE, "<IP>", t)
            return re.sub(PHONE_RE, "<PHONE>", t)

        scrubbed = [(i, scrub(t)) for i, t in corpus]
        # 3. corpus-wide first-wins paragraph dedup on scrubbed text
        first: dict[str, tuple[int, int]] = {}
        segs: dict[int, list[tuple[int, str]]] = {}
        for i, t in sorted(scrubbed):
            ss = [(p, s) for p, s in enumerate(_windows(t, ww)) if s != ""]
            segs[i] = ss
            for p, s in ss:
                h = _md5(s)
                if (i, p) < first.get(h, (1 << 60, 0)):
                    first[h] = (i, p)
        retained = {}
        for i, _ in scrubbed:
            kept = [s for p, s in segs[i] if first[_md5(s)] == (i, p)]
            if kept:
                retained[i] = " ".join(kept)
        # 4. repetition gate (exact Fraction) on retained text
        rfr = Fraction(str(rep_max))
        gated = {}
        for i, rt in retained.items():
            sh = _shingles(_norm(rt), rep_k)
            n, d = len(sh), len(set(sh))
            if (n - d) * rfr.denominator <= rfr.numerator * n:
                gated[i] = rt
        # 5. contamination gate vs the benchmark's raw text
        cfr = Fraction(str(contam_max))
        bench_sh = {
            s for t in bench.values()
            for s in _shingles(_norm(t), contam_k) if s != ""
        }
        survivors = {}
        for i, rt in gated.items():
            dsh = set(_shingles(_norm(rt), contam_k))
            n_c = len(dsh & bench_sh)
            n_s = len({s for s in dsh if s != ""})
            if not (n_c * cfr.denominator > cfr.numerator * n_s):
                survivors[i] = rt
        # 6. LM percentile gate over the SURVIVOR population
        lm = _lm_mirror(sorted(survivors.items()))
        order = sorted(lm, key=lambda i: (lm[i][0] == 0, lm[i][1], i))
        boundary = math.ceil(Fraction(str(cut)) * len(order))
        keepers = {i: survivors[i] for i in order[:boundary]}
        # 7. decorrelated hash sample
        s_thr = _hex_threshold(sample_rate)
        sampled = {
            i: t for i, t in keepers.items() if _md5(f"mix{i}") < s_thr
        }
        # 8. chunk + 9. pack in (doc_id, chunk_id) order
        want = {}
        cum = 0
        for i in sorted(sampled):
            ws = _norm(sampled[i]).split(" ")
            n = len(ws)
            n_chunks = 1 if n <= cw else 1 + math.ceil((n - cw) / st)
            for c in range(n_chunks):
                sl = ws[c * st:c * st + cw]
                want[(i, c)] = (len(sl), _md5(" ".join(sl)), cum // budget)
                cum += len(sl)
        assert got == want, f"trial {trial}"


# ── batch 8: heuristic / reputation / linear-classifier gates ───────


def test_heuristic_quality_gate_random_crossvalidation(spark):
    """heuristic_quality_gate (the Gopher rule set) on random
    symbol-salted docs == the integer-exact rule replay: all five rule
    booleans, the composite keep, and the 4 dp mean word length."""
    from fractions import Fraction

    from crab_spark.operators import text as X

    rng = random.Random(2132)
    vocab = ["the", "a", "is", "of", "to", "zork", "##", "...",
             "x#", "12", "w", "longishword"]
    for trial in range(3):
        rows = []
        for i in range(rng.randint(8, 40)):
            roll = rng.random()
            if roll < 0.06:
                rows.append((i, None))
            else:
                rows.append((i, "  ".join(
                    rng.choice(vocab)
                    for _ in range(rng.randint(1, 12)))))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_words, r.mean_word_len, r.rule_word_count,
                       r.rule_mean_word_len, r.rule_symbol_ratio,
                       r.rule_alpha_words, r.rule_stopwords, r.keep)
            for r in X.heuristic_quality_gate(docs, min_words=2).collect()
        }
        a, b = Fraction("2"), Fraction("12")
        s, al = Fraction("0.1"), Fraction("0.8")
        from crab_spark.operators.text import LANG_STOPWORDS

        stops = set(LANG_STOPWORDS["en"])
        want = {}
        for i, t in rows:
            norm = _norm(t)
            ws = norm.split(" ")
            n_words = sum(1 for w in ws if w)
            word_chars = len(norm.replace(" ", ""))
            n_sym = norm.count("#") + norm.count("...")
            n_alpha = sum(1 for w in ws if re.search("[a-z]", w))
            hits = len(set(ws) & stops)
            r_w = 2 <= n_words <= 100_000
            r_m = (word_chars * a.denominator >= a.numerator * n_words
                   and word_chars * b.denominator <= b.numerator * n_words)
            r_s = n_sym * s.denominator <= s.numerator * n_words
            r_a = n_alpha * al.denominator >= al.numerator * n_words
            r_st = hits >= 2
            want[i] = (
                n_words, _rnd(word_chars / max(n_words, 1), 4),
                r_w, r_m, r_s, r_a, r_st,
                r_w and r_m and r_s and r_a and r_st,
            )
        assert got == want, f"trial {trial}"


def test_source_reputation_gate_random_crossvalidation(spark):
    """source_reputation_gate on random corpora == the per-source
    mean-length + dup-fraction replay with exact integer keep rules;
    NULL sources are a reputation group, NULL texts count as one
    distinct zero-word group."""
    from fractions import Fraction

    from crab_spark.operators import text as X

    rng = random.Random(2133)
    for trial in range(3):
        pool = [_rand_text(rng) for _ in range(8)]
        rows = [
            (i, rng.choice(pool), rng.choice(["s0", "s1", None]))
            for i in range(rng.randint(8, 50))
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        min_mean, max_dup = 2, "0.5"
        got = {
            r.doc_id: (r.source, r.src_n_docs, r.src_mean_words,
                       r.src_dup_frac, r.keep)
            for r in X.source_reputation_gate(
                docs, min_mean_words=min_mean, max_dup_frac=max_dup
            ).collect()
        }
        frac = Fraction(max_dup)
        groups: dict[str | None, list] = {}
        for _, t, src in rows:
            groups.setdefault(src, []).append(t)
        rep = {}
        for src, ts in groups.items():
            n = len(ts)
            words = sum(
                len(re.sub(r"[ \t\n\x0b\f\r]+", " ", t).split(" "))
                for t in ts if t is not None
            )
            distinct = len({_md5(t) if t is not None else None for t in ts})
            dups = n - distinct
            rep[src] = (
                n, _rnd(words / n, 4), _rnd(dups / n, 4),
                words >= min_mean * n
                and dups * frac.denominator <= frac.numerator * n,
            )
        want = {i: (src, *rep[src]) for i, _, src in rows}
        assert got == want, f"trial {trial}"


def test_linear_quality_score_random_crossvalidation(spark):
    """linear_quality_score on random docs with dyadic (1/256-grid)
    weights == the hashed-bucket bag-of-words fold replay — exact on
    BOTH the inline-literal and broadcast-join paths, any aggregation
    order."""
    from crab_spark.operators import text as X

    rng = random.Random(2134)
    for trial in range(3):
        d = rng.choice([7, 16])
        weights = [rng.randint(-64, 64) / 256 for _ in range(d)]
        bias = rng.choice([0.0, -0.125, 0.5])
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(6, 40))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        want = {}
        for i, t in rows:
            toks = [w for w in _norm(t).split(" ") if w]
            score = bias
            for w in toks:
                score += weights[int(_md5(w)[:4], 16) % d]
            want[i] = (len(toks), _rnd(score, 6), score > 0)
        for jw in (False, True):
            got = {
                r.doc_id: (r.n_tokens, r.score, r.keep)
                for r in X.linear_quality_score(
                    docs, weights, bias=bias, join_weights=jw
                ).collect()
            }
            assert got == want, f"trial {trial} join_weights {jw}"


# ── batch 9: CCNet buckets / source priors / BM25 / quotas ──────────


def _linear_scores(rows, weights, bias):
    d = len(weights)
    out = {}
    for i, *rest in rows:
        t = rest[0]
        toks = [w for w in _norm(t).split(" ") if w]
        s = bias
        for w in toks:
            s += weights[int(_md5(w)[:4], 16) % d]
        out[i] = s
    return out


def test_ccnet_buckets_random_crossvalidation(spark):
    """ccnet_buckets on random multi-language corpora == the
    per-language rank replay over (empty-last, avg_nll, doc_id) with
    the integer third-boundary rules; NULL languages are their own
    group."""
    from crab_spark.operators import text as X

    rng = random.Random(2135)
    for trial in range(3):
        rows = [
            (i, _rand_text(rng), rng.choice(["en", "de", None]))
            for i in range(rng.randint(8, 40))
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )
        out = X.ccnet_buckets(docs)
        got = {
            r.doc_id: (r.lang, r.n_words, r.avg_nll, r.lang_rank,
                       r.lang_n, r.bucket)
            for r in out.collect()
        }
        for h in D.cache_handles(out):
            h.unpersist()
        lm = _lm_mirror([(i, t) for i, t, _ in rows])
        langs: dict[str | None, list] = {}
        for i, _, lang in rows:
            langs.setdefault(lang, []).append(i)
        want = {}
        for lang, ids in langs.items():
            order = sorted(ids, key=lambda i: (lm[i][0] == 0, lm[i][1], i))
            n = len(order)
            for rk, i in enumerate(order):
                bucket = ("head" if rk * 3 < n
                          else "middle" if rk * 3 < 2 * n else "tail")
                want[i] = (lang, lm[i][0], lm[i][1], rk, n, bucket)
        assert got == want, f"trial {trial}"


def test_source_prior_gate_random_crossvalidation(spark):
    """source_prior_gate on random corpora with dyadic weights == the
    empirical-Bayes shrinkage replay: exact per-source sums, the
    global-mean pseudo-count prior, and the unrounded keep rule."""
    from crab_spark.operators import text as X

    rng = random.Random(2136)
    for trial in range(3):
        d = rng.choice([7, 16])
        weights = [rng.randint(-64, 64) / 256 for _ in range(d)]
        k = rng.choice([5, 20])
        min_prior = rng.choice([0.0, 0.05])
        rows = [
            (i, _rand_text(rng), rng.choice(["s0", "s1", "s2", None]))
            for i in range(rng.randint(8, 50))
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        got = {
            r.source: (r.n_docs, r.mean_score, r.prior_score, r.keep)
            for r in X.source_prior_gate(
                docs, weights, shrink_k=k, min_prior=min_prior
            ).collect()
        }
        scores = _linear_scores([(i, t) for i, t, _ in rows], weights, 0.0)
        per: dict[str | None, list] = {}
        for i, _, src in rows:
            per.setdefault(src, []).append(scores[i])
        ts = sum(s for ss in per.values() for s in ss)
        tn = sum(len(ss) for ss in per.values())
        mu = ts / float(tn)
        want = {}
        for src, ss in per.items():
            n, sm = len(ss), sum(ss)
            prior = (sm + float(k) * mu) / (float(n) + float(k))
            want[src] = (
                n, _rnd(sm / float(n), 6), _rnd(prior, 6),
                prior >= min_prior,
            )
        assert got == want, f"trial {trial}"


def test_bm25_topk_random_crossvalidation(spark):
    """bm25_topk on random corpora == the Lucene-idf BM25 replay with
    the (score desc, doc_id) total order at the cut."""
    from crab_spark.operators import text as X

    rng = random.Random(2137)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(8, 40))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        q = ["a", "ab"]
        k1, b, k = 1.2, 0.75, rng.choice([5, 100])
        got = [
            (r.doc_id, r.dl, r.score)
            for r in X.bm25_topk(docs, q, k=k, k1=k1, b=b).collect()
        ]
        toks = {
            i: [w for w in _norm(t).split(" ") if w] for i, t in rows
        }
        n_total = len(rows)
        sdl = float(sum(len(ts) for ts in toks.values()))
        avgdl = sdl / float(n_total)
        tf = {
            i: Counter(w for w in ts if w in q) for i, ts in toks.items()
        }
        df_ = Counter(w for i, c in tf.items() for w in c)
        scored = []
        for i, c in tf.items():
            if not c:
                continue
            dl = len(toks[i])
            s = 0.0
            for w in sorted(c):
                idf = math.log(
                    1.0 + ((n_total - df_[w]) + 0.5) / (df_[w] + 0.5)
                )
                s += idf * (
                    c[w] * (k1 + 1.0)
                    / (c[w] + k1 * ((1.0 - b) + (b * dl) / avgdl))
                )
            scored.append((i, dl, _rnd(s, 4)))
        scored.sort(key=lambda t: (-t[2], t[0]))
        assert got == scored[:k], f"trial {trial} k {k}"


def test_source_quota_random_crossvalidation(spark):
    """source_quota on random corpora with dyadic weights == the
    per-source (score desc, doc_id) rank replay with the quota rule;
    NULL sources are their own quota group."""
    from crab_spark.operators import text as X

    rng = random.Random(2138)
    for trial in range(3):
        d = rng.choice([7, 16])
        weights = [rng.randint(-64, 64) / 256 for _ in range(d)]
        quota = rng.choice([2, 5])
        rows = [
            (i, _rand_text(rng), rng.choice(["s0", "s1", None]))
            for i in range(rng.randint(8, 50))
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        out = X.source_quota(docs, weights, quota=quota)
        got = {
            r.doc_id: (r.source, r.score, r.src_rank, r.keep)
            for r in out.collect()
        }
        for h in D.cache_handles(out):
            h.unpersist()
        scores = _linear_scores([(i, t) for i, t, _ in rows], weights, 0.0)
        per: dict[str | None, list] = {}
        for i, _, src in rows:
            per.setdefault(src, []).append(i)
        want = {}
        for src, ids in per.items():
            order = sorted(ids, key=lambda i: (-scores[i], i))
            for rk, i in enumerate(order):
                want[i] = (src, _rnd(scores[i], 6), rk, rk < quota)
        assert got == want, f"trial {trial} quota {quota}"


# ── batch 10: bigram LM / dataset card / calibration / DSIR ─────────


def test_bigram_lm_score_random_crossvalidation(spark):
    """bigram_lm_score on random corpora == the add-α smoothed
    bigram-NLL replay: row-local pairing, corpus-fit model, the
    continuation-vocabulary normalizer, and the (0, 0.0) convention
    for <2-token docs."""
    from crab_spark.operators import text as X

    rng = random.Random(2139)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(6, 35))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        alpha = rng.choice([0.5, 1.0])
        out = X.bigram_lm_score(docs, alpha=alpha)
        got = {r.doc_id: (r.n_bigrams, r.avg_nll) for r in out.collect()}
        for h in D.cache_handles(out):
            h.unpersist()
        per = {}
        for i, t in rows:
            ws = _norm(t).split(" ")
            per[i] = Counter(
                (a, b) for a, b in zip(ws, ws[1:])
                if a != "" and b != ""
            )
        big = Counter()
        for c in per.values():
            big.update(c)
        ctx = Counter()
        for (w1, _), n12 in big.items():
            ctx[w1] += n12
        vocab = float(len({w2 for _, w2 in big}))
        want = {}
        for i, c in per.items():
            n = sum(c.values())
            if n == 0:
                want[i] = (0, 0.0)
                continue
            nll = sum(
                cnt * -math.log(
                    (big[bg] + alpha) / (ctx[bg[0]] + alpha * vocab)
                )
                for bg, cnt in c.items()
            )
            want[i] = (n, _rnd(nll / n, 4))
        assert got == want, f"trial {trial} alpha {alpha}"


def _gate_mirror(t: str | None, min_words: int = 5) -> tuple[int, bool]:
    """heuristic_quality_gate replay at DEFAULT params → (n_words, keep)."""
    from fractions import Fraction

    from crab_spark.operators.text import LANG_STOPWORDS

    a, b = Fraction("2"), Fraction("12")
    s, al = Fraction("0.1"), Fraction("0.8")
    stops = set(LANG_STOPWORDS["en"])
    norm = _norm(t)
    ws = norm.split(" ")
    n_words = sum(1 for w in ws if w)
    word_chars = len(norm.replace(" ", ""))
    n_sym = norm.count("#") + norm.count("...")
    n_alpha = sum(1 for w in ws if re.search("[a-z]", w))
    hits = len(set(ws) & stops)
    keep = (
        min_words <= n_words <= 100_000
        and word_chars * a.denominator >= a.numerator * n_words
        and word_chars * b.denominator <= b.numerator * n_words
        and n_sym * s.denominator <= s.numerator * n_words
        and n_alpha * al.denominator >= al.numerator * n_words
        and hits >= 2
    )
    return n_words, keep


def test_dataset_card_random_crossvalidation(spark):
    """dataset_card on random corpora == the per-source summary
    replay: volumes, duplicate fractions, gate pass rates, language
    spread and the (count desc, lang asc NULLS LAST) top-language
    pick."""
    from crab_spark.operators import text as X

    rng = random.Random(2140)
    vocab = ["the", "a", "is", "of", "to", "and", "zork", "data",
             "words", "here"]
    for trial in range(3):
        pool = [
            "  ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
            for _ in range(8)
        ] + [None, ""]
        rows = [
            (i, rng.choice(pool), rng.choice(["s0", "s1", None]),
             rng.choice(["en", "de", None]))
            for i in range(rng.randint(8, 60))
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string, lang string"
        )
        got = {
            r.source: (r.n_docs, r.n_distinct, r.dup_fraction,
                       r.n_words_total, r.mean_words, r.keep_rate,
                       r.n_langs, r.top_lang, r.top_lang_share)
            for r in X.dataset_card(docs).collect()
        }
        groups: dict[str | None, list] = {}
        for i, t, src, lang in rows:
            groups.setdefault(src, []).append((t, lang))
        want = {}
        for src, ms in groups.items():
            n = len(ms)
            distinct = len({_md5(_norm(t)) for t, _ in ms})
            gates = [_gate_mirror(t) for t, _ in ms]
            words = sum(g[0] for g in gates)
            keeps = sum(1 for g in gates if g[1])
            langs = len({lg for _, lg in ms if lg is not None})
            lc = Counter(lg for _, lg in ms)
            top_lang, top_n = sorted(
                lc.items(),
                key=lambda kv: (-kv[1], kv[0] is None, kv[0] or ""),
            )[0]
            want[src] = (
                n, distinct, _rnd(1.0 - distinct / n, 6),
                words, _rnd(words / n, 4), _rnd(keeps / n, 6),
                langs, top_lang, _rnd(top_n / n, 6),
            )
        assert got == want, f"trial {trial}"


def test_score_calibration_random_crossvalidation(spark):
    """score_calibration on random corpora with dyadic weights == the
    rank-bucket replay: integer decile boundaries over the (rounded
    score, doc_id) total order, per-bucket extrema/means and gate
    pass rates."""
    from crab_spark.operators import text as X

    rng = random.Random(2141)
    vocab = ["the", "a", "is", "of", "zork", "data", "##", "w"]
    for trial in range(3):
        d = rng.choice([7, 16])
        # 1/64 grid, NOT 1/256: k/64 is exact at 6 decimals, so the
        # rounded scores stay dyadic and the bucket SUM is
        # order-independent — on the 1/256 grid round(score, 6) lands
        # on decimal midpoints and Spark's partition-order sum vs the
        # mirror's differ by 1 ulp exactly there, flipping the mean's
        # last digit
        weights = [rng.randint(-16, 16) / 64 for _ in range(d)]
        nb = rng.choice([4, 10])
        rows = [
            (i, "  ".join(
                rng.choice(vocab) for _ in range(rng.randint(1, 12)))
             if rng.random() > 0.06 else None)
            for i in range(rng.randint(10, 60))
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = X.score_calibration(docs, weights, n_buckets=nb)
        got = {
            r.bucket: (r.n_docs, r.min_score, r.max_score, r.mean_score,
                       r.gate_keep_rate)
            for r in out.collect()
        }
        for h in D.cache_handles(out):
            h.unpersist()
        scores = {
            i: _rnd(_linear_scores([(i, t)], weights, 0.0)[i], 6)
            for i, t in rows
        }
        gate = {i: _gate_mirror(t)[1] for i, t in rows}
        order = sorted(scores, key=lambda i: (scores[i], i))
        n = len(order)
        buckets: dict[int, list] = {}
        for rk, i in enumerate(order):
            buckets.setdefault((rk * nb) // n, []).append(i)
        want = {}
        for bkt, ids in buckets.items():
            ss = [scores[i] for i in ids]
            want[bkt] = (
                len(ids), min(ss), max(ss), _rnd(sum(ss) / len(ss), 6),
                _rnd(sum(1 for i in ids if gate[i]) / len(ids), 6),
            )
        assert got == want, f"trial {trial} nb {nb}"


def test_dsir_importance_random_crossvalidation(spark):
    """dsir_importance on random corpus×target pairs == the hashed
    bucket log-ratio replay with add-α smoothing over the full-outer
    bucket model; token-free docs get (0, 0.0)."""
    from crab_spark.operators import text as X

    rng = random.Random(2142)
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(8, 40))]
        t_rows = [(i, _rand_text(rng)) for i in range(rng.randint(2, 8))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        target = spark.createDataFrame(t_rows, "doc_id long, text string")
        nb, alpha = rng.choice([8, 64]), 0.5
        out = X.dsir_importance(docs, target, n_buckets=nb, alpha=alpha)
        got = {r.doc_id: (r.n_tokens, r.importance) for r in out.collect()}
        for h in D.cache_handles(out):
            h.unpersist()

        def bkt(w):
            return int(_md5(w)[:4], 16) % nb

        per = {
            i: Counter(bkt(w) for w in _norm(t).split(" ") if w)
            for i, t in rows
        }
        src = Counter()
        for c in per.values():
            src.update(c)
        tgt = Counter(
            bkt(w) for _, t in t_rows for w in _norm(t).split(" ") if w
        )
        S, T = sum(src.values()), sum(tgt.values())
        want = {}
        for i, c in per.items():
            n = sum(c.values())
            if n == 0:
                want[i] = (0, 0.0)
                continue
            imp = sum(
                cnt * (
                    math.log((tgt[b] + alpha) / (T + alpha * nb))
                    - math.log((src[b] + alpha) / (S + alpha * nb))
                )
                for b, cnt in c.items()
            )
            want[i] = (n, _rnd(imp, 4))
        assert got == want, f"trial {trial} nb {nb}"


# ── batch 11: near-dup / semantic decontamination ───────────────────


def _mh_bands(texts: dict, n_hashes: int, band_size: int, sig_k: int):
    """Per-id MinHash band keys, replayed (batch-1 arithmetic)."""
    sigs = {
        i: [
            min(_md5(f"{h}|{s}") for s in _shingles(t, sig_k))
            for h in range(n_hashes)
        ]
        for i, t in texts.items()
    }
    return {
        i: [
            (b, "#".join(sig[b * band_size + j] for j in range(band_size)))
            for b in range(n_hashes // band_size)
        ]
        for i, sig in sigs.items()
    }


def _neardup_mirror(probe_texts, base_texts, cap, verify_k, min_j):
    """Shared replay for neardup_contamination (probe=corpus,
    base=benchmark) and dedup_incremental_neardup (probe=batch,
    base=corpus): the PROBE side gets the verdicts, the BASE side's
    buckets carry the cap. Returns (per-probe dict, dropped set)."""
    n_hashes, band_size, sig_k = 8, 2, 2
    pb = _mh_bands(probe_texts, n_hashes, band_size, sig_k)
    bb = _mh_bands(base_texts, n_hashes, band_size, sig_k)
    # bucket sizes count CAPPED-side rows (one per (id, band))
    capped_counts = Counter()
    for i, bands in pb.items():
        for key in bands:
            capped_counts[key] += 1
    live = {
        k for k, n in capped_counts.items() if cap is None or n <= cap
    }
    dropped = {
        (b, key, n) for (b, key), n in capped_counts.items()
        if cap is not None and n > cap
    }
    base_buckets: dict[tuple, set] = {}
    for i, bands in bb.items():
        for key in bands:
            base_buckets.setdefault(key, set()).add(i)
    cand: dict[int, set] = {}
    for i, bands in pb.items():
        for key in bands:
            if key in live and key in base_buckets:
                cand.setdefault(i, set()).update(base_buckets[key])
    want = {}
    for i, t in probe_texts.items():
        hits = cand.get(i, set())
        if not hits:
            want[i] = (0, 0.0, False)
            continue
        ssh = set(_shingles(t, verify_k))
        js = []
        for bidx in hits:
            bsh = set(_shingles(base_texts[bidx], verify_k))
            js.append(_rnd(len(ssh & bsh) / len(ssh | bsh), 6))
        n_nd = sum(1 for j in js if j >= min_j)
        want[i] = (n_nd, max(js), n_nd > 0)
    return want, dropped


def test_neardup_contamination_random_crossvalidation(spark):
    """neardup_contamination on random corpus×benchmark pairs == the
    banded MinHash probe replay: candidate generation with the
    corpus-side bucket cap, the Jaccard verify, and the per-doc
    verdict columns (docs with no candidates report (0, 0.0, False))."""
    from crab_spark.operators import decontam as DC

    rng = random.Random(2143)
    for trial in range(3):
        pool = [_rand_text(rng) for _ in range(8)]
        docs_rows = [
            (i, rng.choice(pool) if rng.random() < 0.5 else _rand_text(rng))
            for i in range(rng.randint(6, 25))
        ]
        bench_rows = [
            (i, rng.choice(pool)) for i in range(rng.randint(2, 6))
        ]
        docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
        bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
        cap = rng.choice([3, None])
        out = DC.neardup_contamination(docs, bench, max_bucket=cap)
        got = {
            r.doc_id: (r.n_neardup_bench, r.max_jaccard, r.contaminated)
            for r in out.collect()
        }
        want, want_drop = _neardup_mirror(
            dict(docs_rows), dict(bench_rows), cap, 3, 0.5
        )
        assert got == want, f"trial {trial} cap {cap}"
        if cap is not None:
            got_drop = {
                (r.band_idx, r.band_key, r.n)
                for r in out.dropped_buckets.collect()
            }
            assert got_drop == want_drop, f"trial {trial} dropped"
        for h in D.cache_handles(out):
            h.unpersist()


def test_dedup_incremental_neardup_random_crossvalidation(spark):
    """dedup_incremental_neardup on random batch×corpus pairs == the
    mirror-image replay (batch gets the verdicts, corpus buckets carry
    the cap)."""
    rng = random.Random(2144)
    for trial in range(3):
        pool = [_rand_text(rng) for _ in range(8)]
        batch_rows = [
            (i, rng.choice(pool) if rng.random() < 0.5 else _rand_text(rng))
            for i in range(rng.randint(4, 15))
        ]
        corpus_rows = [
            (100 + i, rng.choice(pool)) for i in range(rng.randint(3, 15))
        ]
        batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
        corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
        cap = rng.choice([3, None])
        out = D.dedup_incremental_neardup(batch, corpus, max_bucket=cap)
        got = {
            r.doc_id: (r.n_neardup_corpus, r.max_jaccard, r.is_neardup)
            for r in out.collect()
        }
        # here the CAP applies to the corpus side and the BATCH gets
        # the verdicts — swap roles in the shared mirror
        n_hashes, band_size = 8, 2
        cb = _mh_bands(dict(corpus_rows), n_hashes, band_size, 2)
        counts = Counter(k for bands in cb.values() for k in bands)
        live = {k for k, n in counts.items() if cap is None or n <= cap}
        corpus_buckets: dict[tuple, set] = {}
        for i, bands in cb.items():
            for key in bands:
                if key in live:
                    corpus_buckets.setdefault(key, set()).add(i)
        bb = _mh_bands(dict(batch_rows), n_hashes, band_size, 2)
        corpus_texts = dict(corpus_rows)
        want = {}
        for i, t in batch_rows:
            hits = set()
            for key in bb[i]:
                hits.update(corpus_buckets.get(key, set()))
            if not hits:
                want[i] = (0, 0.0, False)
                continue
            ssh = set(_shingles(t, 3))
            js = [
                _rnd(
                    len(ssh & set(_shingles(corpus_texts[c], 3)))
                    / len(ssh | set(_shingles(corpus_texts[c], 3))), 6,
                )
                for c in hits
            ]
            n_nd = sum(1 for j in js if j >= 0.5)
            want[i] = (n_nd, max(js), n_nd > 0)
        assert got == want, f"trial {trial} cap {cap}"
        for h in D.cache_handles(out):
            h.unpersist()


def test_embedding_decontamination_random_crossvalidation(spark):
    """embedding_decontamination on random dyadic vectors == the
    max-cosine-vs-benchmark fold replay; zero-norm/NULL corpus vectors
    report NULL verdicts, NULL bench vectors are skipped."""
    from crab_spark.operators import decontam as DC

    rng = random.Random(2145)
    for trial in range(3):
        corpus_rows = [
            (i, _dyadic_vec(rng)) for i in range(rng.randint(6, 30))
        ]
        bench_rows = [(i, _dyadic_vec(rng)) for i in range(rng.randint(2, 6))]
        corpus = spark.createDataFrame(
            corpus_rows, "vec_id long, embedding array<double>"
        )
        bench = spark.createDataFrame(
            bench_rows, "vec_id long, embedding array<double>"
        )
        thr = 0.8
        got = {
            r.vec_id: (r.max_bench_cos, r.is_contaminated)
            for r in DC.embedding_decontamination(
                corpus, bench, threshold=thr
            ).collect()
        }
        bvecs = [v for _, v in bench_rows if v is not None]
        want = {}
        for i, v in corpus_rows:
            scores = [_cosf(v, b) for b in bvecs]
            valued = [s for s in scores if s is not None]
            if not valued:
                want[i] = (None, None)
            else:
                best = _rnd(max(valued), 4)
                want[i] = (best, best >= thr)
        assert got == want, f"trial {trial}"


def test_contamination_attribution_random_crossvalidation(spark):
    """contamination_attribution on random corpus×benchmark pairs ==
    the argmax-overlap replay: per matched doc the single most-shared
    bench doc (ties → lowest bench id), shingle totals, and the 6 dp
    overlap fraction; unmatched docs absent."""
    from crab_spark.operators import decontam as DC

    rng = random.Random(2146)
    k = 2
    for trial in range(3):
        rows = [(i, _rand_text(rng)) for i in range(rng.randint(6, 30))]
        bench_rows = [(i, _rand_text(rng)) for i in range(rng.randint(2, 6))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
        out = DC.contamination_attribution(docs, bench, k=k)
        got = {
            r.doc_id: (r.bench_id, r.n_shared, r.n_shingles, r.overlap_frac)
            for r in out.collect()
        }
        for h in D.cache_handles(out):
            h.unpersist()
        bsh = {
            i: {s for s in _shingles(_norm(t), k) if s != ""}
            for i, t in bench_rows
        }
        want = {}
        for i, t in rows:
            dsh = {s for s in _shingles(_norm(t), k) if s != ""}
            overlaps = [
                (len(dsh & ss), b) for b, ss in bsh.items() if dsh & ss
            ]
            if not overlaps:
                continue
            overlaps.sort(key=lambda x: (-x[0], x[1]))
            n_shared, b = overlaps[0]
            want[i] = (b, n_shared, len(dsh), _rnd(n_shared / len(dsh), 6))
        assert got == want, f"trial {trial}"


# ── batch 12: semantic dedup / kNN vote / hyperplane LSH ────────────


def _ivf_buckets(rows, cents):
    out = {}
    for i, v in rows:
        scores = [_cosf(v, c) for c in cents]
        if all(s is None for s in scores):
            out[i] = None
        else:
            out[i] = scores.index(max(s for s in scores if s is not None))
    return out


def _union_find_clusters(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labels
    return {i: min(j for j in ids if find(j) == find(i)) for i in ids}


def test_semantic_dedup_random_crossvalidation(spark):
    """semantic_dedup on random dyadic vectors == the full replay —
    bucketed cosine pairs → union-find components → keeper — under
    BOTH keeper rules (min_id first-wins; SemDeDup farthest-from-
    centroid with the NULL-cos sentinel and id tie-break)."""
    from crab_spark.operators import similarity as SI

    rng = random.Random(2147)
    for trial in range(3):
        rows = [(i, _dyadic_vec(rng)) for i in range(rng.randint(8, 25))]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        cents = []
        for _ in range(2):
            c = [rng.randint(-8, 8) * 0.25 for _ in range(4)]
            if all(x == 0.0 for x in c):
                c[0] = 1.0
            cents.append(c)
        assigned = SI.ivf_assign(emb, cents)
        thr = 0.9

        # replayed pair + component structure
        buckets = _ivf_buckets(rows, cents)
        vecs = dict(rows)
        members: dict[int, list] = {}
        for i, b in buckets.items():
            if b is not None:
                members.setdefault(b, []).append(i)
        pairs = []
        for mem in members.values():
            for x in mem:
                for y in mem:
                    if x < y:
                        s = _cosf(vecs[x], vecs[y])
                        if s is not None and _rnd(s, 4) >= thr:
                            pairs.append((x, y))
        ids = [i for i, _ in rows]
        labels = _union_find_clusters(ids, pairs)
        sizes = Counter(labels.values())

        out = SI.semantic_dedup(assigned, threshold=thr, keeper="min_id")
        got = {
            r.vec_id: (r.cluster_id, r.cluster_size, r.is_keeper)
            for r in out.collect()
        }
        for h in D.cache_handles(out):
            h.unpersist()
        want = {
            i: (labels[i], sizes[labels[i]], i == labels[i]) for i in ids
        }
        assert got == want, f"trial {trial} min_id"

        out2 = SI.semantic_dedup(assigned, threshold=thr, keeper="farthest")
        got2 = {
            r.vec_id: (r.cluster_id, r.cluster_size, r.centroid_cos,
                       r.is_keeper)
            for r in out2.collect()
        }
        for h in D.cache_handles(out2):
            h.unpersist()
        clusters: dict[int, list] = {}
        for i in ids:
            clusters.setdefault(labels[i], []).append(i)
        want2 = {}
        for cid, mem in clusters.items():
            valued = [i for i in mem if vecs[i] is not None]
            if not valued:
                continue  # no centroid cells → inner join drops them
            dim = len(vecs[valued[0]])
            cent = [
                math.fsum(vecs[i][p] for i in valued) / len(valued)
                for p in range(dim)
            ]
            scored = {}
            for i in mem:
                s = _cosf(vecs[i], cent)
                scored[i] = None if s is None else _rnd(s, 4)
            keep_id = min(
                mem, key=lambda i: (
                    scored[i] if scored[i] is not None else 2.0, i
                )
            )
            for i in mem:
                want2[i] = (cid, len(mem), scored[i], i == keep_id)
        assert got2 == want2, f"trial {trial} farthest"


def test_knn_label_vote_random_crossvalidation(spark):
    """knn_label_vote on random dyadic train/test sets == the
    same-bucket top-k + majority-vote replay (cos desc / train-id
    tie-break; vote desc / label asc; bucketless test vectors predict
    NULL)."""
    from crab_spark.operators import similarity as SI

    rng = random.Random(2148)
    for trial in range(3):
        train_rows = [
            (i, _dyadic_vec(rng), rng.choice(["p", "q", "r"]))
            for i in range(rng.randint(6, 25))
        ]
        test_rows = [
            (100 + i, _dyadic_vec(rng)) for i in range(rng.randint(4, 15))
        ]
        train = spark.createDataFrame(
            train_rows, "vec_id long, embedding array<double>, label string"
        )
        test = spark.createDataFrame(
            test_rows, "vec_id long, embedding array<double>"
        )
        cents = []
        for _ in range(2):
            c = [rng.randint(-8, 8) * 0.25 for _ in range(4)]
            if all(x == 0.0 for x in c):
                c[0] = 1.0
            cents.append(c)
        k = rng.choice([3, 5])
        got = {
            r.vec_id: (r.pred_label, r.n_votes, r.n_neighbors)
            for r in SI.knn_label_vote(
                train, test, cents, k=k
            ).collect()
        }
        tb = _ivf_buckets([(i, v) for i, v, _ in train_rows], cents)
        teb = _ivf_buckets(test_rows, cents)
        tlabel = {i: lab for i, _, lab in train_rows}
        tvec = {i: v for i, v, _ in train_rows}
        want = {}
        for ti, tv in test_rows:
            b = teb[ti]
            cand = [i for i in tb if b is not None and tb[i] == b]
            if not cand:
                want[ti] = (None, None, 0)
                continue
            scored = [
                (i, None if _cosf(tv, tvec[i]) is None
                 else _rnd(_cosf(tv, tvec[i]), 4))
                for i in cand
            ]
            scored.sort(key=lambda t: (t[1] is None, -(t[1] or 0.0), t[0]))
            top = scored[:k]
            votes = Counter(tlabel[i] for i, _ in top)
            lab, nv = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            want[ti] = (lab, nv, len(top))
        assert got == want, f"trial {trial} k {k}"


def test_hyperplane_lsh_random_crossvalidation(spark):
    """hyperplane_lsh on random dyadic vectors == the quantized
    sign-projection replay with an independently re-derived md5 sign
    matrix; NULL embeddings keep NULL signatures."""
    from crab_spark.operators import similarity as SI

    rng = random.Random(2149)
    n_bits, dim = 8, 4
    signs = [
        [
            1.0 if int(_md5(f"hp|{k}|{i}")[:2], 16) % 2 == 0 else -1.0
            for i in range(dim)
        ]
        for k in range(n_bits)
    ]
    for trial in range(3):
        rows = [(i, _dyadic_vec(rng)) for i in range(rng.randint(6, 30))]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        got = {
            r.vec_id: r.sig
            for r in SI.hyperplane_lsh(emb, dim, n_bits=n_bits).collect()
        }
        want = {}
        for i, v in rows:
            if v is None:
                want[i] = None
                continue
            q = [math.floor(x * 4096) / 4096 for x in v]
            sig = 0
            for k in range(n_bits):
                acc = 0.0
                for x, s in zip(q, signs[k], strict=True):
                    acc = acc + x * s
                if acc > 0:
                    sig |= 1 << k
            want[i] = sig
        assert got == want, f"trial {trial}"


# ── batch 13: token budgets / BPE plumbing / cross-source near-dup ──


def test_token_budget_sample_random_crossvalidation(spark):
    """token_budget_sample on random corpora == the per-source
    md5-ordered running-sum replay: identical kept rows, token counts
    (NULL text → NULL count, contributing 0 to the cumsum) and
    cum_before values, across budget maps with absent/NULL sources."""
    rng = random.Random(2150)
    for trial in range(3):
        rows = [
            (i, _rand_text(rng), rng.choice(["s0", "s1", "s2", None]))
            for i in range(rng.randint(10, 60))
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        budgets = {"s0": rng.choice([5, 30]), "s1": 10_000}
        default = rng.choice([0, 8])
        salt = rng.choice(["", "tb"])
        out = SA.token_budget_sample(
            docs, budgets, default_budget=default, salt=salt
        )
        got = {
            r.doc_id: (r.source, r.n_tokens, r.cum_before)
            for r in out.collect()
        }
        for h in D.cache_handles(out):
            h.unpersist()
        per: dict[str | None, list] = {}
        for i, t, src in rows:
            n_tok = (
                None if t is None
                else len(re.sub(r"[ \t\n\x0b\f\r]+", " ", t).split(" "))
            )
            per.setdefault(src, []).append((_md5(f"{salt}{i}"), i, n_tok))
        want = {}
        for src, ms in per.items():
            budget = budgets.get(src, default) if src else default
            cum = 0
            for _, i, n_tok in sorted(ms):
                if cum < budget:
                    want[i] = (src, n_tok, cum)
                cum += n_tok or 0
        assert got == want, f"trial {trial} default {default}"


def test_bpe_token_count_random_crossvalidation(spark):
    """token_count with a trained BPE tokenizer: the distributed
    Arrow-batched count over random corpora == the driver-side
    tokenizer replay row-for-row, and every count == the length of the
    explicit encode() for that text."""
    from crab_spark.operators import text as X
    from crab_spark.operators.tokenizer import BPETokenizer

    rng = random.Random(2151)
    vocab = ["low", "lower", "lowest", "new", "newer", "wider", "wide"]
    for trial in range(3):
        rows = []
        for i in range(rng.randint(8, 30)):
            roll = rng.random()
            if roll < 0.06:
                rows.append((i, None))
            else:
                rows.append((i, "  ".join(
                    rng.choice(vocab)
                    for _ in range(rng.randint(1, 9)))))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        tok = BPETokenizer.train(
            (t for _, t in rows if t), n_merges=rng.choice([5, 20])
        )
        got = {
            r.doc_id: (r.n_tokens, r.n_bpe_est)
            for r in X.token_count(docs, tokenizer=tok).collect()
        }
        want = {}
        for i, t in rows:
            n_ws = (
                None if t is None
                else len(re.sub(r"[ \t\n\x0b\f\r]+", " ", t).split(" "))
            )
            n_bpe = tok.count(t)
            assert n_bpe == len(tok.encode(t))
            want[i] = (n_ws, n_bpe)
        assert got == want, f"trial {trial}"


def test_cross_source_neardup_random_crossvalidation(spark):
    """cross_source_neardup on random multi-source corpora == the
    LSH→cross-source-restrict→Jaccard-verify replay aggregated per
    unordered source pair; NULL-source docs never pair."""
    rng = random.Random(2152)
    for trial in range(3):
        pool = [_rand_text(rng) for _ in range(6)]
        rows = [
            (i,
             rng.choice(pool) if rng.random() < 0.6 else _rand_text(rng),
             rng.choice(["s0", "s1", "s2", None]))
            for i in range(rng.randint(8, 30))
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        out = SC.cross_source_neardup(docs, min_jaccard=0.5)
        got = {
            (r.source_a, r.source_b): r.n_neardup_pairs
            for r in out.collect()
        }
        for h in D.cache_handles(out):
            h.unpersist()
        texts = {i: t for i, t, _ in rows}
        srcs = {i: s for i, _, s in rows}
        bands = _mh_bands(texts, 8, 2, 2)
        buckets: dict[tuple, set] = {}
        for i, bs in bands.items():
            for key in bs:
                buckets.setdefault(key, set()).add(i)
        cand = {
            (a, b)
            for mem in buckets.values()
            for a in mem for b in mem if a < b
        }
        want: Counter = Counter()
        for a, b in cand:
            sa, sb = srcs[a], srcs[b]
            if sa is None or sb is None or sa == sb:
                continue
            A, B = set(_shingles(texts[a], 3)), set(_shingles(texts[b], 3))
            if _rnd(len(A & B) / len(A | B), 6) >= 0.5:
                want[(min(sa, sb), max(sa, sb))] += 1
        assert got == dict(want), f"trial {trial}"


# ── batch 14: multimodal plumbing (decode stub contract) ────────────


def test_multimodal_random_crossvalidation(spark):
    """The multimodal chain on random corpora == the md5 stub-decoder
    replay at every stage: media manufacture (kind routing, utf-8
    payloads, NULL id/text coalescing), Arrow decode features, exact
    aspect-fit resize geometry, strided frame sampling, and the
    metadata rollup — all compared as multisets (duplicate NULL ids
    legitimately collide on media_id)."""
    from crab_spark.operators import multimodal as MM

    rng = random.Random(2153)
    for trial in range(3):
        rows = [
            (i if rng.random() > 0.08 else None, _rand_text(rng))
            for i in range(rng.randint(6, 30))
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        media = MM.media_from_documents(docs)

        def mirror_media(i, t):
            did = str(i) if i is not None else ""
            txt = t or ""
            kind = ["image", "audio", "video"][int(_md5(did)[:2], 16) % 3]
            payload = txt.encode()
            return (f"m:{did}", did, kind, payload, len(payload))

        m_rows = [mirror_media(i, t) for i, t in rows]
        got_m = Counter(
            (r.media_id, r.doc_id, r.kind, bytes(r.payload), r.n_bytes)
            for r in media.collect()
        )
        assert got_m == Counter(m_rows), f"trial {trial} media"

        def decode(payload, kind):
            d = hashlib.md5(payload).digest()
            return (
                16 + d[0] % 64, 16 + d[1] % 64,
                1 if kind == "image" else 1 + d[2] % 8,
                tuple(float(b) for b in d[:8]),
            )

        feats = {
            (mid, kind, payload): decode(payload, kind)
            for mid, _, kind, payload, _ in m_rows
        }
        got_f = Counter(
            (r.media_id, r.kind, r.width, r.height, r.n_frames,
             tuple(r.feature))
            for r in MM.extract_features(media).collect()
        )
        want_f = Counter(
            (mid, kind, w, h, nf, feat)
            for (mid, kind, _), (w, h, nf, feat) in feats.items()
        )
        assert got_f == want_f, f"trial {trial} features"

        mw = mh = 32
        got_r = Counter(
            (r.media_id, r.src_w, r.src_h, r.out_w, r.out_h, r.scale)
            for r in MM.resize_plan(media, max_w=mw, max_h=mh).collect()
        )
        want_r = Counter()
        for (mid, kind, _), (w, h, nf, _) in feats.items():
            scale = _rnd(min(mw / w, mh / h, 1.0), 6)
            if w <= mw and h <= mh:
                ow, oh = w, h
            elif w * mh >= h * mw:
                ow, oh = mw, math.floor(h * float(mw) / w)
            else:
                ow, oh = math.floor(w * float(mh) / h), mh
            want_r[(mid, w, h, ow, oh, scale)] += 1
        assert got_r == want_r, f"trial {trial} resize"

        got_s = Counter(
            (r.media_id, r.frame_idx)
            for r in MM.sample_frames(media, stride=2).collect()
        )
        want_s = Counter(
            (mid, fi)
            for (mid, kind, _), (_, _, nf, _) in feats.items()
            for fi in range(0, nf, 2)
        )
        assert got_s == want_s, f"trial {trial} frames"

        got_st = {
            r.kind: (r.n, r.total_bytes, r.avg_bytes)
            for r in MM.media_stats(media).collect()
        }
        per_kind: dict[str, list] = {}
        for _, _, kind, _, nb in m_rows:
            per_kind.setdefault(kind, []).append(nb)
        want_st = {
            k: (len(v), sum(v), _rnd(sum(v) / len(v), 4))
            for k, v in per_kind.items()
        }
        assert got_st == want_st, f"trial {trial} stats"


# ── batch 15: range-bucket join ─────────────────────────────────────


def test_range_join_tiers_random_crossvalidation(spark):
    """range_join_tiers on random values == the [lo, hi) containment
    replay, with out-of-tier and NULL values keeping NULL tiers."""
    from crab_spark.operators import relational as R

    rng = random.Random(2154)
    for trial in range(3):
        tiers = [(0.0, 2.0, "low"), (2.0, 5.0, "mid"), (7.0, 9.0, "high")]
        rows = [
            (i, None if rng.random() < 0.08
             else rng.randint(-4, 40) * 0.25)
            for i in range(rng.randint(10, 60))
        ]
        df = spark.createDataFrame(rows, "doc_id long, value double")
        got = {
            r.doc_id: (r.tier_lo, r.tier_hi, r.tier)
            for r in R.range_join_tiers(df, tiers).collect()
        }
        want = {}
        for i, v in rows:
            hit = next(
                ((lo, hi, name) for lo, hi, name in tiers
                 if v is not None and lo <= v < hi),
                (None, None, None),
            )
            want[i] = hit
        assert got == want, f"trial {trial}"


# ── batch 16: robots.txt evaluator (north_rule path) ────────────────


def _robots_mirror_parse(body, agent):
    """Independent RFC 9309 replay: group split (consecutive UA runs),
    §2.2.1 most-specific named-group selection with merge, max-merged
    crawl delays."""
    groups, uas, rules, delay = [], [], [], None
    in_hdr = started = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_hdr:
                if started:
                    groups.append((uas, rules, delay))
                uas, rules, delay = [], [], None
                started = True
                in_hdr = True
            uas.append(val.lower())
            continue
        in_hdr = False
        if not started:
            continue
        if key == "disallow" and val:
            rules.append((False, val))
        elif key == "allow" and val:
            rules.append((True, val))
        elif key == "crawl-delay":
            try:
                d = float(val)
            except ValueError:
                continue
            delay = d if delay is None else max(delay, d)
    if started:
        groups.append((uas, rules, delay))
    token = agent.lower()
    winner = None
    if token != "*":
        for gu, _, _ in groups:
            for v in gu:
                if v and v != "*" and token.startswith(v):
                    if winner is None or len(v) > len(winner):
                        winner = v
    out_rules, out_delay = [], None
    for gu, gr, gd in groups:
        if (winner in gu) if winner is not None else ("*" in gu):
            out_rules.extend(gr)
            if gd is not None:
                out_delay = gd if out_delay is None else max(out_delay, gd)
    return out_rules, out_delay


def _pat_match(pattern, path):
    """Wildcard matcher via leftmost-feasible search (NOT regex — an
    independent implementation of the * / $ semantics)."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    segs = core.split("*")
    if not path.startswith(segs[0]):
        return False
    pos = len(segs[0])
    if len(segs) == 1:
        return path == core if anchored else True
    for seg in segs[1:-1]:
        i = path.find(seg, pos)
        if i < 0:
            return False
        pos = i + len(seg)
    last = segs[-1]
    if anchored:
        return len(path) - len(last) >= pos and path.endswith(last)
    return path.find(last, pos) >= 0


def test_robots_random_crossvalidation(spark):
    """The full Spark robots path (robots_from_bodies →
    with_robots_flag broadcast join + Arrow eval) on random robots.txt
    bodies and URLs == an independent Python RFC 9309 replay: group
    selection, longest-match-wins with the Allow tie-break, * / $
    wildcards, path?query targets, max-merged crawl delays, and the
    allow-all default for hosts absent from the cache."""
    import urllib.parse

    from crab_spark import robots as RB

    rng = random.Random(2155)
    pats = ["/a", "/b", "/a/b", "/*", "/a*", "*.x$", "/a$", "/b/*.x$",
            "/a/", ""]
    uas_pool = ["*", "crabbot", "crab", "botty"]
    paths = ["", "a", "a/b", "a/c.x", "b/z.x", "b?q=1", "a$b", "c"]

    def body(rng):
        lines = []
        for _ in range(rng.randint(1, 4)):  # groups
            for _ in range(rng.randint(1, 2)):
                lines.append(f"User-agent: {rng.choice(uas_pool)}")
            for _ in range(rng.randint(0, 5)):
                kind = rng.choice(["Disallow", "Allow", "Crawl-delay",
                                   "# note", "junkline"])
                if kind == "Crawl-delay":
                    lines.append(
                        f"Crawl-delay: {rng.choice(['1', '2.5', 'zzz'])}"
                    )
                elif kind.startswith("#") or kind == "junkline":
                    lines.append(kind)
                else:
                    lines.append(f"{kind}: {rng.choice(pats)}")
        return "\n".join(lines)

    for trial in range(3):
        hosts = ["h0", "h1", "h2"]
        bodies = {h: body(rng) for h in hosts}
        agent = rng.choice(["*", "crabbot-news"])
        bodies_df = spark.createDataFrame(
            list(bodies.items()), "host string, body string"
        )
        robots = RB.robots_from_bodies(bodies_df, agent=agent)
        batch_rows = [
            (i, rng.choice(hosts + ["h-missing"]), rng.choice(paths))
            for i in range(rng.randint(10, 40))
        ]
        batch = spark.createDataFrame(
            [(i, h, f"http://{h}/{p}") for i, h, p in batch_rows],
            "row long, host string, url string",
        )
        flagged = RB.with_robots_flag(batch, robots)
        got = {
            r.row: (r.robots_ok, r.crawl_delay) for r in flagged.collect()
        }
        want = {}
        for i, h, p in batch_rows:
            if h not in bodies:
                want[i] = (True, None)
                continue
            rules, delay = _robots_mirror_parse(bodies[h], agent)
            parts = urllib.parse.urlsplit(f"http://{h}/{p}")
            target = parts.path or "/"
            if parts.query:
                target = f"{target}?{parts.query}"
            best_len, best_allow = -1, True
            for allow, pat in rules:
                if _pat_match(pat, target) and (
                    len(pat) > best_len
                    or (len(pat) == best_len and allow and not best_allow)
                ):
                    best_len, best_allow = len(pat), allow
            want[i] = (best_allow, delay)
        assert got == want, f"trial {trial} agent {agent}"
