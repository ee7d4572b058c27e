"""Pluggable subword tokenizer for token budgeting.

token_count's default ``n_bpe_est = chars/4`` is an honest heuristic,
but pack budgets (packing.with_pack_ids) mean real tokens only with a
real tokenizer. This module implements classic byte-pair encoding
(Sennrich et al. 2016 — merge the most frequent adjacent symbol pair,
repeat) trained on a corpus sample, entirely from public knowledge and
stdlib — no downloaded vocabularies (the sandbox has no network; on a
real deployment you would load a published merges file into the same
``BPETokenizer(merges)`` object and nothing else changes).

Spark integration is one Arrow-batched pandas UDF (token_count_udf):
the merges table (a few KB) ships by closure, each worker memoizes the
ranks dict and a per-word encode cache. No per-row Python anywhere.

Scale note: training collects only a word-frequency Counter built from
a driver-side sample (use sampling.hash_sample for a deterministic
corpus sample); encoding is embarrassingly parallel.
"""

from __future__ import annotations

import uuid
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_END = "</w>"


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Merge every adjacent occurrence of ``pair`` in ``sym``, left to
    right (the standard BPE apply step)."""
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


class BPETokenizer:
    """merges: ordered list of (left, right) symbol pairs — the entire
    model state (JSON-serializable; a published GPT-2-style merges file
    maps 1:1 onto it)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}
        self._word_cache: dict[str, int] = {}

    @classmethod
    def train(cls, texts, n_merges: int = 200) -> "BPETokenizer":
        """Deterministic BPE training: count words, then repeatedly
        merge the globally most frequent adjacent pair (ties broken by
        the lexicographically largest pair — any fixed rule works, it
        just has to be a rule)."""
        words: Counter = Counter()
        for t in texts:
            if t:
                words.update(t.lower().split())
        vocab: dict[tuple[str, ...], int] = {
            tuple(w) + (_END,): c for w, c in words.items()
        }
        merges: list[tuple[str, str]] = []
        for _ in range(n_merges):
            pairs: Counter = Counter()
            for sym, c in vocab.items():
                for p in zip(sym, sym[1:]):
                    pairs[p] += c
            if not pairs:
                break
            best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
            merges.append(best)
            vocab = _apply_merge_to_vocab(vocab, best)
        return cls(merges)

    def encode_word(self, word: str) -> list[str]:
        sym: tuple[str, ...] = tuple(word) + (_END,)
        while len(sym) > 1:
            ranked = [
                (self.ranks[p], p)
                for p in set(zip(sym, sym[1:]))
                if p in self.ranks
            ]
            if not ranked:
                break
            sym = _merge_word(sym, min(ranked)[1])
        return list(sym)

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in (text or "").lower().split():
            out.extend(self.encode_word(w))
        return out

    def count(self, text: str) -> int:
        n = 0
        for w in (text or "").lower().split():
            c = self._word_cache.get(w)
            if c is None:
                if len(self._word_cache) > 200_000:
                    self._word_cache.clear()
                c = len(self.encode_word(w))
                self._word_cache[w] = c
            n += c
        return n


def _apply_merge_to_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    out: dict[tuple[str, ...], int] = {}
    for sym, c in vocab.items():
        k = _merge_word(sym, pair)
        out[k] = out.get(k, 0) + c
    return out


def train_from_docs(docs, text_col: str = "text", sample_rate: float = 1.0,
                    n_merges: int = 200, key_col: str = "doc_id") -> BPETokenizer:
    """Train on a (deterministic hash-)sample of a corpus DataFrame.
    Only the sampled text reaches the driver; at 100 TB you'd sample at
    1e-6 and still see millions of words. ``key_col`` names the id
    column the deterministic sample keys on (every operator in the
    package parameterizes it; a corpus without a 'doc_id' column used
    to raise at the hash_sample)."""
    df = docs.select(F.col(text_col).alias("t"))
    if sample_rate < 1.0:
        from .sampling import hash_sample

        df = hash_sample(docs, rate=sample_rate, key_col=key_col).select(
            F.col(text_col).alias("t")
        )
    return BPETokenizer.train(
        (r["t"] for r in df.collect()), n_merges=n_merges
    )


# worker-process memo: tokenizer rebuilt once per (UDF, worker), with
# its per-word cache surviving across Arrow batches
_TOK_CACHE: dict[str, BPETokenizer] = {}


def token_count_udf(tokenizer: BPETokenizer):
    """Arrow-batched exact-token-count UDF. The closure carries only
    the merges list (KBs)."""
    merges = list(tokenizer.merges)
    token = uuid.uuid4().hex

    @F.pandas_udf(T.LongType())
    def count(texts: pd.Series) -> pd.Series:
        tok = _TOK_CACHE.get(token)
        if tok is None:
            if len(_TOK_CACHE) > 8:
                _TOK_CACHE.clear()
            tok = BPETokenizer(merges)
            _TOK_CACHE[token] = tok
        return texts.map(tok.count).astype("int64")

    return count
