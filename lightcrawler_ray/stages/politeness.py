"""Per-host politeness scheduling (T7 upgraded per the north_rule).

The reference serializes ALL requests behind one global last-request-time
with a spin-wait (PHPCrawler.class.php:906-925, 5 s default) — ≤0.2 req/s for
the whole job.  The north_rule upgrades this to per-host budgets: each host h
has a crawl delay d(h) (robots crawl-delay when present, else the spec
default), and fetches against h must be spaced ≥ d(h) apart while different
hosts proceed independently.

Deterministic virtual-clock formulation (recorded, replayable): walk the
round's frontier in pop order (priority desc, enqueue_seq asc); row i on host
h gets

    sched_ms[i] = max(clock[h], round_t0) + d(h);  clock[h] = sched_ms[i]

``clock`` persists across rounds (part of the epoch checkpoint), so budgets
carry over crawl-round boundaries exactly like the reference's global
timestamp carries over documents.  The schedule is a *budget ledger*: the
synthetic fetcher doesn't sleep (the sandbox has no wire), but the ledger is
what a production fetch worker would sleep against, and the recorded values
make politeness auditable (`assert_polite`) and replay-deterministic
(north_rule lineage).

Scale note: the ledger walk is O(round rows) over only (host, seq) — at
10^10-URL scale this state is hash(host)-partitioned with the frontier and
each partition walks its own hosts; a host never spans partitions, so the
per-partition walk is exact (the partitioning assumption this operator
relies on).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class HostClock:
    """The per-host virtual-time ledger (driver/partition-local state)."""

    def __init__(self, default_delay_ms: float = 0.0, robots: dict | None = None):
        self.default_delay_ms = default_delay_ms
        self.robots = robots or {}
        self.clock: dict[str, float] = {}

    def delay_of(self, host: str) -> float:
        r = self.robots.get(host)
        if r and r.get("delay_ms", 0):
            return float(r["delay_ms"])
        return self.default_delay_ms

    def schedule(self, hosts: list[str], round_t0: float = 0.0) -> np.ndarray:
        """sched_ms for rows already in pop order; mutates the ledger."""
        out = np.empty(len(hosts), dtype=np.float64)
        clock = self.clock
        for i, h in enumerate(hosts):
            t = max(clock.get(h, 0.0), round_t0) + self.delay_of(h)
            clock[h] = t
            out[i] = t
        return out

    def snapshot(self) -> dict[str, float]:
        return dict(self.clock)

    def restore(self, snap: dict[str, float]) -> None:
        self.clock = dict(snap)


def schedule_table(hosts: list[str], seqs: list[int], clock: HostClock,
                   round_t0: float = 0.0) -> pa.Table:
    """(enqueue_seq, host, sched_ms) sidecar rows for an epoch checkpoint."""
    sched = clock.schedule(hosts, round_t0)
    return pa.table(
        {
            "enqueue_seq": pa.array(seqs, pa.int64()),
            "host": pa.array(hosts, pa.string()),
            "sched_ms": pa.array(sched, pa.float64()),
        }
    )


def assert_polite(tables: list[pa.Table], clock: HostClock) -> None:
    """Audit: within each host, consecutive scheduled fetches are spaced by at
    least the host's delay (raises AssertionError otherwise)."""
    if not tables:
        return
    t = pa.concat_tables(tables)
    if t.num_rows == 0:
        return
    import pandas as pd

    df = t.to_pandas().sort_values(["host", "sched_ms"], kind="stable")
    for host, g in df.groupby("host", sort=False):
        d = clock.delay_of(host)
        if d <= 0 or len(g) < 2:
            continue
        gaps = np.diff(g["sched_ms"].to_numpy())
        assert (gaps >= d - 1e-6).all(), f"politeness violated for {host}"
