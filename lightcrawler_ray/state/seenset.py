"""Sharded URL-seen set — an actor pool holding cuckoo-filter shards.

Reference semantics: the frontier's UNIQUE ``distinct_hash`` makes enqueue
idempotent (T1/D1, PHPCrawlerSQLiteURLCache.class.php:107-138 `INSERT OR
IGNORE`).  Here that is K shard actors, shard = ``hash(url_md5) % K`` —
each shard holds a cuckoo filter (approximate, 10^10-scale steady state)
and optionally an exact md5 set (byte-for-byte parity mode for tests and
small crawls).  Shards serialize their own mutations (the actor mailbox is
the lock), so no cross-actor coordination is needed — the shard IS the
claim unit, replacing the reference's table-wide `LOCK TABLE urls WRITE`
(PHPCrawlerMySqlUrlCache.class.php:124,174).

Determinism contract (SURVEY.md §2.9): callers dedup *within* a round first
(groupby url_md5 → deterministic winner), so each shard sees each key at most
once per round and the final membership set is order-independent.

Snapshot/restore round-trips every shard's state for the per-epoch checkpoint
(T10 / north_rule resumability).
"""

from __future__ import annotations

import numpy as np
import ray

from .cuckoo import CuckooFilter, hashes_from_md5hex


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard. mode: 'exact' | 'cuckoo' | 'both' (both = cuckoo answers,
    exact audits — used by the membership-parity tests)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 20, mode: str = "both"):
        self.shard_id = shard_id
        self.mode = mode
        self.cuckoo = CuckooFilter(capacity) if mode != "exact" else None
        self.exact: set[str] | None = set() if mode != "cuckoo" else None
        # per-round two-phase dedup state: md5 → min (parent_seq, link_idx)
        self._round_min: dict[str, tuple[int, int]] = {}

    def check_and_add(self, md5s: list[str]) -> np.ndarray:
        """Bool mask: True = first sighting (now marked seen). Each key must
        appear at most once in a call (caller dedups within the round)."""
        if not md5s:
            return np.zeros(0, dtype=bool)
        if self.exact is not None:
            new = np.fromiter((m not in self.exact for m in md5s), dtype=bool, count=len(md5s))
            self.exact.update(md5s)
            if self.cuckoo is not None:
                h = hashes_from_md5hex(md5s)
                self.cuckoo.add_hashes(h[new & ~self.cuckoo.contains_hashes(h)])
            return new
        h = hashes_from_md5hex(md5s)
        new = ~self.cuckoo.contains_hashes(h)
        self.cuckoo.add_hashes(h[new])
        return new

    def contains(self, md5s: list[str]) -> np.ndarray:
        if not md5s:
            return np.zeros(0, dtype=bool)
        if self.exact is not None:
            return np.fromiter((m in self.exact for m in md5s), dtype=bool, count=len(md5s))
        return self.cuckoo.contains_hashes(hashes_from_md5hex(md5s))

    # -- two-phase within-round dedup + cross-round gate ---------------------
    # Replaces a whole groupby shuffle: blocks PROPOSE (md5, rank) pairs, the
    # shard keeps the min rank per unseen md5; after a barrier, blocks RESOLVE
    # and keep only the row holding the winning rank (which the shard then
    # marks seen).  Deterministic regardless of arrival order — the min is
    # order-free and resolution happens only after every propose landed.

    def begin_round(self) -> None:
        self._round_min.clear()

    def propose_parts(self, *parts: dict) -> int:
        """Each part: {"md5": [...], "seq": nd, "idx": nd, "row": nd} — this
        shard's keys from one candidate block (pre-partitioned by a
        _extract_keys task, so nothing blocks inside workers).  Keeps the min
        (parent_seq, link_idx) per unseen md5."""
        rm = self._round_min
        n = 0
        for p in parts:
            md5s = p["md5"]
            if not md5s:
                continue
            seen = self.contains(md5s)
            for m, s_, i_, was in zip(md5s, p["seq"], p["idx"], seen):
                if was:
                    continue
                r = (int(s_), int(i_))
                cur = rm.get(m)
                if cur is None or r < cur:
                    rm[m] = r
            n += len(md5s)
        return n

    def resolve_parts(self, *parts: dict) -> list[np.ndarray]:
        """Per part, the block-row indices whose rank won its md5; winners are
        marked seen on first resolution (ranks are unique → exactly once)."""
        rm = self._round_min
        out: list[np.ndarray] = []
        winners: list[str] = []
        for p in parts:
            wins: list[int] = []
            for m, s_, i_, row in zip(p["md5"], p["seq"], p["idx"], p["row"]):
                if rm.get(m) == (int(s_), int(i_)):
                    wins.append(int(row))
                    winners.append(m)
                    del rm[m]
            out.append(np.array(wins, dtype=np.int64))
        if winners:
            if self.exact is not None:
                self.exact.update(winners)
            if self.cuckoo is not None:
                h = hashes_from_md5hex(winners)
                self.cuckoo.add_hashes(h[~self.cuckoo.contains_hashes(h)])
        return out

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "exact_count": len(self.exact) if self.exact is not None else -1,
            "cuckoo_count": self.cuckoo.count if self.cuckoo else -1,
            "load_factor": self.cuckoo.load_factor if self.cuckoo else 0.0,
        }

    def snapshot(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "mode": self.mode,
            "cuckoo": self.cuckoo.snapshot() if self.cuckoo else None,
            "exact": sorted(self.exact) if self.exact is not None else None,
        }

    def restore(self, snap: dict) -> None:
        self.mode = snap["mode"]
        self.cuckoo = CuckooFilter.restore(snap["cuckoo"]) if snap["cuckoo"] else None
        self.exact = set(snap["exact"]) if snap["exact"] is not None else None

    def dump_members(self) -> list[str]:
        """Exact membership (parity tests only — not a scale path)."""
        if self.exact is None:
            raise RuntimeError("cuckoo-only shard has no exact membership")
        return sorted(self.exact)


def shard_of(md5s: list[str] | np.ndarray, k: int) -> np.ndarray:
    """Shard index per key — low 8 hex chars of the md5, mod K (independent of
    the cuckoo's own bucket hash which uses the top bits)."""
    out = np.empty(len(md5s), dtype=np.int64)
    for i, m in enumerate(md5s):
        out[i] = int(m[24:32], 16) % k
    return out


class SeenSet:
    """Driver-side facade over K SeenShard actors.

    Shards are ``num_cpus=0``: they are memory holders whose per-call work is
    microseconds per thousand keys — reserving whole CPUs for them starves the
    map stages (a 4-CPU test cluster deadlocks).  On a real cluster, shard
    placement follows object-store memory, not CPU."""

    def __init__(self, k: int = 4, capacity_per_shard: int = 1 << 20, mode: str = "both"):
        self.k = k
        self.mode = mode
        self.shards = [
            SeenShard.remote(i, capacity_per_shard, mode) for i in range(k)
        ]

    def check_and_add(self, md5s: list[str]) -> np.ndarray:
        """Scatter to shards, gather the first-sighting mask in input order."""
        n = len(md5s)
        if n == 0:
            return np.zeros(0, dtype=bool)
        sh = shard_of(md5s, self.k)
        mask = np.zeros(n, dtype=bool)
        futures, index_lists = [], []
        for s in range(self.k):
            idx = np.nonzero(sh == s)[0]
            if idx.size:
                futures.append(self.shards[s].check_and_add.remote([md5s[i] for i in idx]))
                index_lists.append(idx)
        for idx, res in zip(index_lists, ray.get(futures)):
            mask[idx] = res
        return mask

    def contains(self, md5s: list[str]) -> np.ndarray:
        n = len(md5s)
        if n == 0:
            return np.zeros(0, dtype=bool)
        sh = shard_of(md5s, self.k)
        mask = np.zeros(n, dtype=bool)
        futures, index_lists = [], []
        for s in range(self.k):
            idx = np.nonzero(sh == s)[0]
            if idx.size:
                futures.append(self.shards[s].contains.remote([md5s[i] for i in idx]))
                index_lists.append(idx)
        for idx, res in zip(index_lists, ray.get(futures)):
            mask[idx] = res
        return mask

    def members(self) -> list[str]:
        out: list[str] = []
        for part in ray.get([s.dump_members.remote() for s in self.shards]):
            out.extend(part)
        return sorted(out)

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def snapshot(self) -> list[dict]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: list[dict]) -> None:
        assert len(snaps) == self.k, "shard count mismatch on restore"
        ray.get([s.restore.remote(snap) for s, snap in zip(self.shards, snaps)])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
