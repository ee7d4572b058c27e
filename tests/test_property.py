"""Property-based tests (hypothesis) for the driver-side kernels that
the distributed operators are built on — URL canonicalization (the
seen-set identity), the Bloom/cuckoo membership filters, and the
SimHash bag-of-words invariants. All spark-free, so hundreds of random
cases run in seconds."""

from __future__ import annotations

import numpy as np
from hypothesis import given
from hypothesis import settings as _settings
from hypothesis import strategies as st


def settings(**kw):
    # derandomized: identical cases every run — property regressions
    # fail deterministically instead of flaking in CI
    return _settings(derandomize=True, **kw)

from crab_spark.bloom import Bloom, BucketedBloom
from crab_spark.cuckoo import CuckooFilter
from crab_spark.urlnorm import absolutize, canonicalize

# --- URL canonicalization -------------------------------------------------

_hostname = st.from_regex(r"[a-z]([a-z0-9\-]{0,10}[a-z0-9])?(\.[a-z]{2,5}){1,2}",
                          fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,8}){0,4}/?", fullmatch=True)
_url = st.builds(
    lambda s, h, p, path, q: f"{s}://{h}{':' + str(p) if p else ''}{path}"
                             f"{'?' + q if q else ''}",
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    _hostname,
    st.one_of(st.none(), st.integers(1, 65535)),
    _path,
    st.one_of(st.none(), st.from_regex(r"[a-z]=[0-9]{1,3}", fullmatch=True)),
)


@settings(max_examples=300, deadline=None)
@given(_url)
def test_canonicalize_idempotent(url):
    """The stored form is a fixed point: canonicalizing twice changes
    nothing (otherwise the seen-set key would depend on how many hops a
    URL took through the engine)."""
    c = canonicalize(url)
    assert c is not None
    assert canonicalize(c) == c


@settings(max_examples=200, deadline=None)
@given(_url, st.from_regex(r"[A-Za-z0-9._\-]{1,12}(/[A-Za-z0-9._\-]{1,8}){0,3}",
                           fullmatch=True))
def test_absolutize_emits_canonical_form(base, rel):
    """Whatever absolutize returns must already be canonical — register
    hashes it directly."""
    b = canonicalize(base)
    out = absolutize(rel, b)
    if out is not None:
        assert canonicalize(out) == out


# --- membership filters ----------------------------------------------------

_key_arrays = st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=400,
                       unique=True).map(lambda xs: np.array(xs, dtype=np.uint64))


@settings(max_examples=50, deadline=None)
@given(_key_arrays)
def test_bloom_never_false_negative(keys):
    b = Bloom.sized_for(len(keys))
    b.add(keys)
    assert b.might_contain(keys).all()


@settings(max_examples=50, deadline=None)
@given(_key_arrays)
def test_bucketed_bloom_never_false_negative(keys):
    b = BucketedBloom.sized_for(max(len(keys), 32))
    b.add(keys)
    assert b.might_contain(keys).all()


@settings(max_examples=50, deadline=None)
@given(_key_arrays)
def test_cuckoo_never_false_negative_and_delete_inverts(keys):
    f = CuckooFilter.sized_for(max(len(keys) * 4, 256))
    f.add(keys)
    assert f.might_contain(keys).all()
    # delete every key → the filter is empty again (exact removal is
    # the cuckoo capability). Two keys CAN share a (bucket, fingerprint)
    # twin — the second insert dedups — so per-key removed flags aren't
    # asserted, the empty end state is.
    f.delete(keys)
    assert not f.might_contain(keys).any()
    assert not any(shard.table.any() for shard in f.shards.values())


# --- simhash kernel ---------------------------------------------------------

def _simhash_py(text: str) -> int:
    """Reference implementation of the UDF kernel (same math, scalar)."""
    import hashlib

    tokens = text.lower().split()
    if not tokens:
        return 0
    votes = [0] * 64
    for t in tokens:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    sig = sum(1 << i for i in range(64) if votes[i] > 0)
    return sig - (1 << 64) if sig >= (1 << 63) else sig


_words = st.lists(st.from_regex(r"[a-z]{1,8}", fullmatch=True), min_size=1,
                  max_size=30)


@settings(max_examples=100, deadline=None)
@given(_words, st.randoms())
def test_simhash_is_bag_of_words(words, rng):
    """Token order must not change the signature (votes are a bag), and
    case must not either (lowercased)."""
    base = _simhash_py(" ".join(words))
    shuffled = list(words)
    rng.shuffle(shuffled)
    assert _simhash_py(" ".join(shuffled)) == base
    assert _simhash_py(" ".join(w.upper() for w in words)) == base


@settings(max_examples=100, deadline=None)
@given(_words)
def test_simhash_batch_udf_matches_scalar(words):
    """The numpy-vectorized UDF kernel equals the scalar reference."""
    import pandas as pd

    from crab_spark.operators.dedup import simhash_udf

    text = " ".join(words)
    got = simhash_udf.func(pd.Series([text, "", text])).tolist()
    want = _simhash_py(text)
    assert got == [want, 0, want]
