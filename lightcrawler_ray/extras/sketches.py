"""Distributed sketches — HyperLogLog register construction for
approximate COUNT DISTINCT at 100 TB.

The register state (not just the estimate) is the deliverable: registers
merge with a plain MAX, so partial sketches combine associatively across
any block order / any number of nodes, and the final estimate is a pure
driver-side function of 2^p numbers.  Everything is deterministic
(md5-low64 key hashing, the exact value DuckDB's ``md5_number_lower``
computes), so the SQL oracle replays the register state bit-for-bit.

Design note (why min-remainder, not per-row rho): rho = 1 + leading zeros
of the 54-bit remainder is monotone decreasing in the remainder's bit
length, so ``max(rho) == rho(min(remainder))``.  Carrying min(remainder)
through the shuffle avoids any float log2 edge cases near 2^53 and lets
both sides compute rho exactly on the tiny final table (Python
``int.bit_length`` / DuckDB ``length(bin(x))``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min

P = 10                      # 2^10 = 1024 registers
M = 1 << P
REM_BITS = 64 - P           # remainder width; rho ∈ [1, REM_BITS+1]


def _low64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")


def hll_registers(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog(p=10) registers over distinct ``events.user_id``.

    Scale pattern: per batch, keys dedup locally (np.unique) before
    hashing, each batch emits ≤1024 (bucket, min_rem) partial rows, and the
    shuffle is a tiny groupby-min over ≤ blocks×1024 rows — the input never
    moves.  Output: (bucket, max_rho) for every non-empty register."""
    from .. import storage

    ds = storage.read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        uids = np.unique(t.column("user_id").to_numpy(zero_copy_only=False))
        h = np.fromiter(
            (_low64(str(int(u))) for u in uids), dtype=np.uint64, count=len(uids)
        )
        bucket = (h & np.uint64(M - 1)).astype(np.int64)
        rem = (h >> np.uint64(P)).astype(np.int64)  # < 2^54, fits signed
        t2 = pa.table({"bucket": pa.array(bucket), "rem": pa.array(rem)})
        g = pa.TableGroupBy(t2, "bucket").aggregate([("rem", "min")])
        return g.rename_columns(["bucket", "rem"])

    regs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Min("rem", alias_name="min_rem"))
        .to_pandas()  # ≤ 1024 rows
    )
    rho = [
        REM_BITS + 1 - int(r).bit_length() if r else REM_BITS + 1
        for r in regs["min_rem"]
    ]
    return (
        pd.DataFrame({"bucket": regs["bucket"].astype(np.int64), "max_rho": np.array(rho, np.int64)})
        .sort_values("bucket").reset_index(drop=True)
    )


def hll_estimate(registers: pd.DataFrame) -> float:
    """Flajolet et al. 2007 raw estimate with the small-range linear
    counting correction — a pure function of the register table."""
    rho = np.zeros(M, np.float64)
    rho[registers["bucket"].to_numpy()] = registers["max_rho"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / M)
    est = alpha * M * M / np.sum(np.exp2(-rho))
    zeros = M - len(registers)
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)
    return float(est)


def kmv_sketch(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002) over
    ``events.user_id``: the k smallest 63-bit key hashes.  Like the HLL
    registers, the SKETCH STATE is the deliverable — two partitions' states
    merge by keeping the k smallest of the union, so the global state is a
    tiny sort+limit over per-batch partials (each batch contributes ≤k
    rows; the input never shuffles).  63-bit values (h >> 1) so the state
    survives int64 columns everywhere.  SQL-oracled bit-exactly."""
    from .. import storage

    ds = storage.read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        uids = np.unique(t.column("user_id").to_numpy(zero_copy_only=False))
        h = np.fromiter(
            (_low64(str(int(u))) >> 1 for u in uids), dtype=np.int64, count=len(uids)
        )
        h = np.unique(h)[:k]  # local k-min partial
        return pa.table({"h": pa.array(h, pa.int64())})

    # a key seen in many batches emits its h from each, so dedup BEFORE the
    # k-cut (a sort+limit over raw partials could fill its k rows with
    # duplicates); the groupby input is ≤ blocks×k rows — a tiny shuffle
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("h", alias_name="hmin"))
        .sort("h")
        .limit(k)
        .to_pandas()
    )
    h = out["h"].to_numpy()
    return pd.DataFrame({"rank": np.arange(len(h), dtype=np.int64), "h": h})


def kmv_estimate(state: pd.DataFrame, k: int = 64) -> float:
    """(k-1) / normalized kth minimum — the standard KMV estimator."""
    if len(state) < k:
        return float(len(state))
    return (k - 1) / (float(state["h"].iloc[k - 1]) / float(1 << 63))


CMS_D = 4       # hash rows
CMS_W = 256     # buckets per row


def cms_counts(sf_dir: str) -> rd.Dataset:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of event frequency
    per user — the heavy-hitters sketch.  Register state = exact int counts
    per (row, bucket), which sum associatively across blocks (order-free),
    so the whole sketch is a per-batch partial count + a 1024-row groupby.
    SQL-oracled bit-exactly via the same md5 bucket rule."""
    from .. import storage

    ds = storage.read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        uids = t.column("user_id").to_numpy(zero_copy_only=False)
        # hash each DISTINCT key once per row-d, then count via inverse index
        uniq, inv = np.unique(uids, return_inverse=True)
        rows, buckets, counts = [], [], []
        binc = np.bincount(inv)
        for d in range(CMS_D):
            bk = np.fromiter(
                (_low64(f"{d}:{int(u)}") % CMS_W for u in uniq),
                dtype=np.int64, count=len(uniq),
            )
            t2 = np.zeros(CMS_W, np.int64)
            np.add.at(t2, bk, binc)
            nz = np.nonzero(t2)[0]
            rows.append(np.full(len(nz), d, np.int64))
            buckets.append(nz)
            counts.append(t2[nz])
        return pa.table({
            "row_d": pa.array(np.concatenate(rows)),
            "bucket": pa.array(np.concatenate(buckets)),
            "cnt": pa.array(np.concatenate(counts)),
        })

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["row_d", "bucket"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def cms_estimate(state: pd.DataFrame, key: int) -> int:
    """Point frequency estimate: min over rows of the key's bucket count."""
    est = None
    for d in range(CMS_D):
        b = _low64(f"{d}:{int(key)}") % CMS_W
        sub = state[(state["row_d"] == d) & (state["bucket"] == b)]["cnt"]
        c = int(sub.iloc[0]) if len(sub) else 0
        est = c if est is None else min(est, c)
    return int(est or 0)


BLOOM_M = 1 << 16   # bits (8 KiB packed)
BLOOM_K = 3         # hash functions


def bloom_decontaminate(sf_dir: str, n: int = 5) -> rd.Dataset:
    """Bloom-filter benchmark decontamination — the SKETCHED form of
    ``textstats.decontaminate``: instead of broadcasting the eval set's raw
    n-gram strings (gigabytes for a real benchmark suite), broadcast a
    fixed 2^16-bit Bloom filter (Bloom 1970) of them — 8 KiB per worker at
    ANY eval-set size — and flag training docs whose distinct 5-grams probe
    into it.  One-sided by construction: every truly contaminated doc is
    flagged (no false negatives); hash collisions can only ADD flags, and
    because the bit state and probes are deterministic (md5-low64 of
    ``"d:gram"``, the same ``md5_number_lower`` value DuckDB computes), the
    false positives are reproducible and the whole filter — bit build AND
    probe verdicts — replays bit-exactly in SQL.

    Scale shape: pass 1 streams the eval slice (doc_id % 97 == 0) into
    per-batch distinct bit partials (each batch emits ≤ 2^16 rows), one
    tiny groupby dedups them, and the driver packs ≤ 2^16 set bits into a
    numpy bool array broadcast via ``ray.put``; pass 2 streams the training
    corpus through one stateless map_batches probing each doc's distinct
    grams.  ZERO corpus shuffles, O(1) broadcast state."""
    import ray

    from .. import storage

    def grams_of(x: str) -> set[str]:
        toks = (x or "").lower().split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    def eval_bits(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        bits: set[int] = set()
        for did, x in zip(ids, texts):
            if did % 97:
                continue
            for g in grams_of(x):
                for d in range(BLOOM_K):
                    bits.add(_low64(f"{d}:{g}") % BLOOM_M)
        return pa.table({"b": pa.array(sorted(bits), pa.int64())})

    ds = storage.read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    set_bits = (
        ds.map_batches(eval_bits, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Min("b", alias_name="bmin"))
        .to_pandas()  # ≤ 2^16 rows
    )
    bits = np.zeros(BLOOM_M, dtype=bool)
    bits[set_bits["b"].to_numpy()] = True
    bits_ref = ray.put(bits)

    def probe(t: pa.Table) -> pa.Table:
        bv = ray.get(bits_ref)
        ids_out, hits = [], []
        for did, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            if did % 97 == 0:
                continue
            cnt = 0
            for g in grams_of(x):
                if all(bv[_low64(f"{d}:{g}") % BLOOM_M] for d in range(BLOOM_K)):
                    cnt += 1
            ids_out.append(did)
            hits.append(cnt)
        return pa.table({
            "doc_id": pa.array(ids_out, pa.int64()),
            "n_bloom_hits": pa.array(hits, pa.int64()),
            "flagged": pa.array([h > 0 for h in hits], pa.bool_()),
        })

    return ds.map_batches(probe, batch_format="pyarrow")


def kmv_per_group(sf_dir: str, k: int = 32) -> pd.DataFrame:
    """One KMV distinct sketch PER GROUP (event_type): the grouped
    cardinality-sketch shape a segmented corpus report needs (distinct
    users per event family without a distinct-shuffle).  Same 63-bit
    md5-low64 state as ``kmv_sketch``; per-batch partials keep ≤k rows per
    group present in the batch, the merge groupby is bounded by
    |groups| × blocks × k rows, and the final k-cut runs per group inside
    a map_groups bounded by the group domain.  Register-state SQL oracle
    (row_number over the distinct hash set)."""
    from .. import storage

    ds = storage.read_parquet_clean(f"{sf_dir}/events.parquet",
                                    columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.unique(np.stack([et.astype(str), uid.astype(str)], axis=1), axis=0)
        grp, us = key[:, 0], key[:, 1].astype(np.int64)
        h = np.fromiter((_low64(str(int(u))) >> 1 for u in us),
                        dtype=np.int64, count=us.size)
        order = np.lexsort((h, grp))
        grp, h = grp[order], h[order]
        new_g = np.ones(grp.size, dtype=bool)
        new_g[1:] = grp[1:] != grp[:-1]
        pos = np.arange(grp.size) - np.maximum.accumulate(
            np.where(new_g, np.arange(grp.size), 0))
        keep = pos < k
        return pa.table({
            "event_type": pa.array(grp[keep].astype(str), pa.string()),
            "h": pa.array(h[keep], pa.int64()),
        })

    def final_cut(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_pylist()[0]
        h = np.unique(g.column("h").to_numpy(zero_copy_only=False))[:k]
        return pa.table({
            "event_type": pa.array([et] * h.size, pa.string()),
            "rank": pa.array(np.arange(h.size, dtype=np.int64)),
            "h": pa.array(h, pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type").map_groups(final_cut, batch_format="pyarrow")
        .to_pandas()  # ≤ |groups| × k rows
        .sort_values(["event_type", "rank"]).reset_index(drop=True)
    )


_HH_DENOM = 200  # heavy hitter: count > total / 200 (0.5%)


def heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """EXACT heavy hitters over events.user_id: keys with more than
    total/200 of all events — the skew-detection primitive that decides
    which keys need salting before a shuffle.

    Scale shape: the grand total is parquet metadata (``ds.count()``, no
    scan); per-key partial counts combine per batch, one groupby, and the
    gate applies INSIDE a map_batches over the aggregated stream — by
    construction at most 200 keys can exceed total/200, so only that
    bounded set ever reaches the driver.  The gate compares in integers
    (200·cnt > total); ``share`` is the same int÷int double on both
    sides."""
    from .. import storage

    ds = storage.read_parquet_clean(f"{sf_dir}/events.parquet",
                                    columns=["user_id"])
    total = ds.count()  # parquet row-count metadata, no scan

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(uid, return_counts=True)
        return pa.table({"key": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum

    def gate(t: pa.Table) -> pa.Table:
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        m = _HH_DENOM * cnt > total
        key = t.column("key").to_numpy(zero_copy_only=False).astype(np.int64)[m]
        cnt = cnt[m]
        return pa.table({
            "user_id": pa.array(key, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
            "share": pa.array(cnt.astype(np.float64) / float(total), pa.float64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key").aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(gate, batch_format="pyarrow")
        .to_pandas()  # ≤ 200 rows by construction
        .sort_values("user_id").reset_index(drop=True))


def kmv_intersect(sf_dir: str, k: int = 32) -> pd.DataFrame:
    """θ-sketch set algebra over the per-group KMV registers: for every
    pair of event_types, estimate |users(A) ∩ users(B)| WITHOUT any
    distinct-shuffle — the cross-corpus overlap check a federated dedup
    pipeline runs before deciding to merge two shards (Dasgupta et al.,
    "Theta sketch framework", 2016).

    θ = min(θ_A, θ_B) (each group's k-th smallest 63-bit hash, or
    INT64_MAX when the group holds < k distinct keys — then it's exact);
    common registers below θ are unbiased samples of the intersection at
    rate θ/2^63.  The distributed work is exactly ``kmv_per_group``
    (≤ |groups|×k rows ever reach the driver); the pair algebra is
    driver-side over that bounded state.  SQL-oracled bit-exactly —
    register replay + the same integer/float arithmetic."""
    _EVERYTHING = (1 << 63) - 1  # θ when a group is exact (< k keys)

    regs = kmv_per_group(sf_dir, k)
    out = []
    groups = sorted(regs["event_type"].unique())
    by_g = {g: regs.loc[regs["event_type"] == g, "h"].to_numpy(np.int64)
            for g in groups}
    for i, ta in enumerate(groups):
        for tb in groups[i + 1:]:
            ha, hb = by_g[ta], by_g[tb]
            theta = min(int(ha[-1]) if len(ha) >= k else _EVERYTHING,
                        int(hb[-1]) if len(hb) >= k else _EVERYTHING)
            common = np.intersect1d(ha, hb)
            n_common = int((common < theta).sum())
            est = n_common * float(1 << 63) / theta
            out.append((ta, tb, theta, n_common, est))
    return pd.DataFrame(out, columns=["ta", "tb", "theta", "n_common",
                                      "est_common"])
