"""Similarity search over the embeddings table.

- ``topk_bruteforce`` — exact cosine top-k: the query matrix is broadcast
  once (ray.put), each batch computes a numpy matmul against it and emits a
  per-batch partial top-k; the driver merges partials (k × queries rows, not
  the corpus).  This is the scale baseline: corpus streams, queries ride the
  object store.
- ``topk_lsh`` — the scale path: random-hyperplane LSH buckets both sides;
  only colliding buckets are scored.  Approximate (rows-only check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    qids = df["vec_id"].to_numpy(dtype=np.int64)
    qm = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    return qids, qm


def topk_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 5) -> pd.DataFrame:
    """Exact top-k by cosine for the first ``n_queries`` vec_ids (self
    excluded).  Returns (query_id, neighbor_id, rank), rank 1-based, ties
    broken by neighbor_id asc — matching the SQL oracle's window order."""
    qids, qm = _load_queries(sf_dir, n_queries)
    q_ref = ray.put((qids, qm))
    from .. import storage

    ds = storage.read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, qm_ = ray.get(q_ref)
        ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = qm_ @ m.T  # (Q, B)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids_)):
            s = sims[qi]
            mask = ids != qids_[qi]
            cand_ids, cand_s = ids[mask], s[mask]
            # per-batch partial top-k (deterministic order: sim desc, id asc)
            order = np.lexsort((cand_ids, -cand_s))[:k]
            out_q.extend([qids_[qi]] * len(order))
            out_n.extend(cand_ids[order])
            out_s.extend(cand_s[order])
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "neighbor_id": pa.array(out_n, pa.int64()),
             "sim": pa.array(out_s, pa.float64())}
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out_rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="stable").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out_rows.append(g[["query_id", "neighbor_id", "rank"]])
    return (
        pd.concat(out_rows, ignore_index=True)
        if out_rows
        else pd.DataFrame({"query_id": [], "neighbor_id": [], "rank": []})
    )


def topk_lsh(sf_dir: str, k: int = 10, n_queries: int = 5, n_planes: int = 8, seed: int = 42) -> pd.DataFrame:
    """LSH-bucketed approximate top-k: 8 random hyperplanes → 256 buckets;
    a corpus row is scored only when it lands in a query's bucket (multi-probe
    distance-1 neighbors included for recall).  Approximate by design."""
    qids, qm = _load_queries(sf_dir, n_queries)
    rng = np.random.default_rng(seed)
    dim = qm.shape[1]
    planes = rng.standard_normal((n_planes, dim))

    def bucket_of(m: np.ndarray) -> np.ndarray:
        bits = (m @ planes.T) > 0
        return (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)

    qb = bucket_of(qm)
    probe: dict[int, list[int]] = {}
    for qi, b in enumerate(qb):
        probe.setdefault(int(b), []).append(qi)
        for p in range(n_planes):  # multi-probe: flip one bit
            probe.setdefault(int(b) ^ (1 << p), []).append(qi)
    state = ray.put((qids, qm, planes, probe))
    from .. import storage

    ds = storage.read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        qids_, qm_, planes_, probe_ = ray.get(state)
        ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        bits = (m @ planes_.T) > 0
        bk = (bits * (1 << np.arange(planes_.shape[0]))).sum(axis=1).astype(np.int64)
        out_q, out_n, out_s = [], [], []
        for row in range(len(ids)):
            for qi in probe_.get(int(bk[row]), ()):
                if ids[row] == qids_[qi]:
                    continue
                out_q.append(qids_[qi])
                out_n.append(ids[row])
                out_s.append(float(qm_[qi] @ m[row]))
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "neighbor_id": pa.array(out_n, pa.int64()),
             "sim": pa.array(out_s, pa.float64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out_rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.drop_duplicates("neighbor_id")
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="stable").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out_rows.append(g[["query_id", "neighbor_id", "rank"]])
    return (
        pd.concat(out_rows, ignore_index=True)
        if out_rows
        else pd.DataFrame({"query_id": [], "neighbor_id": [], "rank": []})
    )
