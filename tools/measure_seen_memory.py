"""Measure per-key resident memory of the two URL-seen representations.

Reproduces the numbers quoted in BASELINE.md ("Cuckoo-only bench leg"):
RSS delta at 1M random 16-byte digest keys for

  * a Python exact set of ``bytes`` digests (what ``seen_mode="exact"`` /
    the exact half of ``"both"`` holds per shard), and
  * a properly-sized ``CuckooFilter`` (what ``seen_mode="cuckoo"`` holds).

Run standalone (no Ray needed):  python tools/measure_seen_memory.py
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lightcrawler_ray.state.cuckoo import CuckooFilter

N = 1_000_000


def rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1])
    raise RuntimeError("no VmRSS")


def main() -> None:
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, size=(N, 16), dtype=np.uint8)
    hashes = raw[:, :8].copy().view(np.uint64).ravel()

    base = rss_kb()
    exact: set[bytes] = set()
    for i in range(N):
        exact.add(raw[i].tobytes())
    per_exact = (rss_kb() - base) * 1024 / N
    print(
        f"exact set   : {per_exact:6.1f} B/key  "
        f"-> {per_exact * 1e10 / 2**40:.2f} TiB at 1e10 keys"
    )

    cf = CuckooFilter(capacity=N)
    for i in range(0, N, 100_000):
        cf.add_hashes(hashes[i : i + 100_000])
    # The filter's state is one flat numpy table; its nbytes is the
    # deterministic per-key cost (RSS deltas jitter with heap fragmentation).
    table_bytes = sum(v.nbytes for v in vars(cf).values() if isinstance(v, np.ndarray))
    per_cuckoo = table_bytes / N
    print(
        f"cuckoo      : {per_cuckoo:6.2f} B/key (load {cf.load_factor:.2f}, table nbytes)  "
        f"-> {per_cuckoo * 1e10 / 2**30:.1f} GiB at 1e10 keys"
    )


if __name__ == "__main__":
    main()
