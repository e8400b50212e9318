"""Cross-round document near-dup index (J3/D3 for docs).

Reference semantics: a doc whose content near-duplicates an already-stored
doc is "repeated" and skipped — UNLESS it carries an unseen ``doc_ori_no``
(the official document number overrides the near-dup verdict,
worker/SpiderFrame.class.php:281-293).  The similarity signal is the 64-bit
content simhash computed at extract time (stages/fetch.py).

Structure: P = 4 band shards, one per 16-bit simhash band (standard banded
LSH for hamming distance: any two hashes within hamming < 4 agree exactly on
at least one band — pigeonhole — so recall at the default threshold 3 is
guaranteed).  Each shard holds ``band_hash → (simhashes, doc_ids)`` in
insertion (= enqueue_seq) order; a query walks only its band's bucket and
verifies true hamming distance vectorized.

Scale: state is O(kept docs × 4/P) per shard — the same order as the
URL-seen set, sharded the same way; snapshot/restore rides the per-epoch
checkpoint like the seen shards (T10).  Calls are once per round with the
round's docs in seq order, so results are deterministic and the actor
mailbox serializes rounds.
"""

from __future__ import annotations

import numpy as np
import ray

from ..functions import hashing

N_BANDS = 4


@ray.remote(num_cpus=0)
class SimBandShard:
    """One band of the doc simhash index."""

    def __init__(self, band: int):
        self.band = band
        self.buckets: dict[int, tuple[list[int], list[str]]] = {}

    def query_insert(self, sims_i64: np.ndarray, ids: list[str], max_hamming: int) -> list[str]:
        """For each doc IN ORDER: earliest stored doc in this band's bucket
        within ``max_hamming`` (else "").  Every doc is then inserted, so a
        doc also matches earlier docs of the same call (within-round dups).
        """
        out: list[str] = []
        sims = np.asarray(sims_i64, dtype=np.int64).view(np.uint64)
        keys = hashing.simhash_bands(sims, N_BANDS)[:, self.band]
        for i in range(len(ids)):
            key = int(keys[i])
            bucket = self.buckets.get(key)
            hit = ""
            if bucket is not None:
                stored = np.array(bucket[0], dtype=np.uint64)
                d = hashing.hamming64(stored, np.full(stored.size, sims[i], dtype=np.uint64))
                m = np.nonzero(d <= max_hamming)[0]
                if m.size:
                    hit = bucket[1][int(m[0])]
            out.append(hit)
            if bucket is None:
                self.buckets[key] = ([int(sims[i])], [ids[i]])
            else:
                bucket[0].append(int(sims[i]))
                bucket[1].append(ids[i])
        return out

    def snapshot(self) -> dict:
        return {"band": self.band, "buckets": self.buckets}

    def restore(self, snap: dict) -> None:
        self.band = snap["band"]
        self.buckets = snap["buckets"]


class SimIndex:
    """Driver facade over the band shards."""

    def __init__(self):
        self.shards = [SimBandShard.remote(b) for b in range(N_BANDS)]

    def query_insert(self, sims_i64: np.ndarray, ids: list[str], max_hamming: int) -> list[str]:
        """Earliest near-dup id per doc across all bands ("" when none).
        Docs must arrive in enqueue_seq order (the determinism contract)."""
        if len(ids) == 0:
            return []
        per_band = ray.get([
            s.query_insert.remote(sims_i64, ids, max_hamming) for s in self.shards
        ])
        out = []
        for i in range(len(ids)):
            hits = [pb[i] for pb in per_band if pb[i]]
            out.append(min(hits) if hits else "")
        return out

    def snapshot(self) -> list[dict]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: list[dict]) -> None:
        ray.get([s.restore.remote(snap) for s, snap in zip(self.shards, snaps)])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
