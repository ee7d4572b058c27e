"""Proxy pool with saturating alive-counters — reference src/proxy.rs.

Semantics reproduced:
- each proxy carries a saturating counter in −2..=2 (proxy.rs:11):
  +1 on success (capped at 2), −1 on failure (floored at −2)
  (proxy.rs:120-137); dead ⇔ counter == −2 (SaturatedDown).
- selection (proxy.rs:79-111): random among non-dead proxies; if ALL
  are dead, random over the whole list (never give up).
- per-proxy stats: requests / successful_requests (proxy.rs:26-33).

Spark shape: counters are *driver-side* state (they're O(#proxies),
tiny); per-epoch fetch outcomes come back as a (proxy_id, ok) column in
the fetch-result DataFrame and are folded into the pool between epochs
with one small aggregation — the mutable per-request counter updates of
the reference become a per-epoch groupBy. For reproducibility the
engine replaces the reference's thread_rng choice with a seeded RNG (or
deterministic hash(seq) % n_alive assignment in the fetch UDF).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALIVE_MIN, ALIVE_MAX = -2, 2


@dataclass
class ProxyStat:
    requests: int = 0
    successful_requests: int = 0
    alive_counter: int = 0

    @property
    def dead(self) -> bool:
        return self.alive_counter == ALIVE_MIN


@dataclass
class ProxyPool:
    urls: list[str]
    stats: list[ProxyStat] = field(default_factory=list)
    rng: random.Random = field(default_factory=lambda: random.Random(42))

    def __post_init__(self) -> None:
        if not self.stats:
            self.stats = [ProxyStat() for _ in self.urls]

    @classmethod
    def from_lines(cls, text: str, seed: int = 42) -> "ProxyPool":
        """Parse a proxy-list file: one URL per line, blanks skipped
        (proxy.rs:37-48 from_file semantics)."""
        urls = [ln.strip() for ln in text.splitlines() if ln.strip()]
        return cls(urls, rng=random.Random(seed))

    def succeeded(self, proxy_id: int) -> None:
        if not (0 <= proxy_id < len(self.stats)):
            return
        s = self.stats[proxy_id]
        s.requests += 1
        s.successful_requests += 1
        s.alive_counter = min(ALIVE_MAX, s.alive_counter + 1)

    def failed(self, proxy_id: int) -> None:
        if not (0 <= proxy_id < len(self.stats)):
            return
        s = self.stats[proxy_id]
        s.requests += 1
        s.alive_counter = max(ALIVE_MIN, s.alive_counter - 1)

    def alive_ids(self) -> list[int]:
        """Ids eligible for dispatch this epoch: the non-dead proxies, or
        ALL of them when everything is dead (never give up,
        proxy.rs:79-111). The crawl assigns batch rows to these ids
        deterministically (hash(seq) % n_alive — the engine's seeded
        stand-in for the reference's thread_rng choice)."""
        alive = [i for i, s in enumerate(self.stats) if not s.dead]
        return alive if alive else list(range(len(self.urls)))

    def next(self) -> tuple[str, int] | None:
        """Random non-dead proxy; if all dead, random over all
        (proxy.rs:79-111)."""
        if not self.urls:
            return None
        alive = [i for i, s in enumerate(self.stats) if not s.dead]
        pool = alive if alive else range(len(self.urls))
        i = self.rng.choice(list(pool))
        return self.urls[i], i

    def fold_epoch_outcomes(self, outcomes: DataFrame) -> None:
        """Fold one epoch's (proxy_id, ok) fetch outcomes into the pool.
        One tiny aggregation, then O(1) driver work per proxy: applying
        k saturating +1s followed by m saturating −1s lands on
        ``max(floor, min(cap, c + k) − m)`` — identical to the unit
        loop, without O(epoch) iteration. Documented divergence from
        proxy.rs:116-122: the reference interleaves per-request, so a
        mixed-outcome epoch can end on a different counter; endpoints
        match whenever a proxy's epoch outcomes are single-signed, and
        the chosen successes-then-failures fold is pinned by
        test_aux's mixed-outcome test."""
        rows = (
            outcomes.groupBy("proxy_id")
            .agg(
                F.sum(F.col("ok").cast("int")).alias("n_ok"),
                F.sum((~F.col("ok")).cast("int")).alias("n_fail"),
            )
            .collect()
        )
        for r in rows:
            pid = int(r["proxy_id"])
            if not (0 <= pid < len(self.stats)):
                continue
            n_ok, n_fail = int(r["n_ok"] or 0), int(r["n_fail"] or 0)
            s = self.stats[pid]
            s.requests += n_ok + n_fail
            s.successful_requests += n_ok
            s.alive_counter = max(
                ALIVE_MIN, min(ALIVE_MAX, s.alive_counter + n_ok) - n_fail
            )

    def report(self) -> list[dict]:
        return [
            {
                "proxy": u,
                "requests": s.requests,
                "successful_requests": s.successful_requests,
                "alive_counter": s.alive_counter,
                "dead": s.dead,
            }
            for u, s in zip(self.urls, self.stats)
        ]
