"""Deduplication operators for the training-data pipeline (first-class per
the build brief): exact hash, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes:
- exact: hash in map_batches → groupby-first (one shuffle on a 32-byte key).
- MinHash-LSH: signatures per batch → explode to (band_id, band_hash, doc_id)
  rows → groupby band bucket → candidate pairs → exact-Jaccard verify.  Only
  band keys shuffle, never documents (hard part (d)).
- SimHash: 64-bit signature → 4×16-bit band keys → bucket groupby → hamming
  verify (pigeonhole guarantees recall for distance < bands).
- n-gram Jaccard: blocked by a coarse key (source), exact set Jaccard within
  blocks via map_groups.
- embedding cosine: blocked by label, numpy pairwise cosine within blocks.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions import hashing

_MH_K = 64
_MH_BANDS = 16  # 16 bands × 4 rows


def _docs(sf_dir: str) -> rd.Dataset:
    from .. import storage

    return storage.read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])


def minhash_band_rows(sf_dir: str) -> rd.Dataset:
    """Stage 1-2 of MinHash-LSH: per-doc signature → (band_id, band_hash,
    doc_id) rows, computed vectorized per batch (shingle+perm hashing)."""
    a, b = hashing.minhash_params(_MH_K)

    def sig_rows(t: pa.Table) -> pa.Table:
        band_ids, band_hashes, doc_ids = [], [], []
        rows_per_band = _MH_K // _MH_BANDS
        for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            sig = hashing.minhash_signature(hashing.shingle_hashes(text, 3), a, b)
            for bi in range(_MH_BANDS):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                band_ids.append(bi)
                band_hashes.append(h)
                doc_ids.append(did)
        return pa.table(
            {"band_id": pa.array(band_ids, pa.int32()),
             "band_hash": pa.array(band_hashes, pa.string()),
             "doc_id": pa.array(doc_ids, pa.int64())}
        )

    return _docs(sf_dir).map_batches(sig_rows, batch_format="pyarrow")


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """Full MinHash-LSH near-dup: bucket groupby → candidate pairs →
    exact-Jaccard verification against the real shingle sets.

    Oracle-checked end-to-end: shingle hashes are md5_number_lower, the
    permutation params are seed-42 literals, and band equality is minhash-
    list equality — the SQL mirror replays candidates AND verify exactly.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.
    The verify step re-reads only the candidate docs (point lookups on a
    broadcast id→text map here; at 100 TB it would be a secondary join keyed
    on candidate ids — candidates, not corpus, bound the cost)."""
    import ray

    bands = minhash_band_rows(sf_dir)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64())})

    cand = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if cand.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    # verify via a broadcast semi-join: the candidate-id set (small side)
    # rides the object store; the documents table STREAMS through
    # map_batches and only candidate rows' shingle sets come back — driver
    # memory is O(candidate docs), never O(corpus).  (With a candidate set
    # too big to broadcast, this becomes a hash join on doc_id instead.)
    need_ref = ray.put(frozenset(cand["doc_a"]) | frozenset(cand["doc_b"]))

    def cand_shingles(t: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        ids = t.column("doc_id").to_pylist()
        keep = [i for i, d in enumerate(ids) if d in need]
        out_id, out_sh = [], []
        for i in keep:
            w = t.column("text")[i].as_py().split(" ")
            out_id.append(ids[i])
            out_sh.append(sorted({" ".join(w[j:j + 3]) for j in range(max(1, len(w) - 2))}))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "shingles": pa.array(out_sh, pa.list_(pa.string()))})

    cd = (
        __import__("lightcrawler_ray.storage", fromlist=["x"]).read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(cand_shingles, batch_format="pyarrow")
        .to_pandas()
    )
    sh = {d: set(s) for d, s in zip(cd["doc_id"], cd["shingles"])}
    jac = [
        len(sh[a] & sh[b]) / max(1, len(sh[a] | sh[b]))
        for a, b in zip(cand["doc_a"], cand["doc_b"])
    ]
    cand = cand.assign(jaccard=jac)
    return cand[cand["jaccard"] >= threshold].reset_index(drop=True)


def simhash_docs(sf_dir: str) -> rd.Dataset:
    """Per-doc 64-bit simhash (T8/D3 analog over the documents table)."""

    def sig(t: pa.Table) -> pa.Table:
        out = []
        for text in t.column("text").to_pylist():
            s = hashing.simhash64(text)
            out.append(s - (1 << 64) if s >= (1 << 63) else s)
        return pa.table({"doc_id": t.column("doc_id"), "simhash": pa.array(out, pa.int64())})

    return _docs(sf_dir).map_batches(sig, batch_format="pyarrow")


def simhash_near_dups(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup pairs via 4-band bucketing + hamming verify.

    Oracle-checked: 4 bands are EXACT for hamming <= 3 (pigeonhole), and the
    SQL mirror replays simhash64 itself (md5_number_lower token hashes +
    weighted bit votes), so the output equals the full O(n²) hamming join."""
    sigs = simhash_docs(sf_dir)

    def band_rows(t: pa.Table) -> pa.Table:
        ph = np.array(t.column("simhash").to_pylist(), dtype=np.int64).view(np.uint64)
        bands = hashing.simhash_bands(ph, 4)
        ids = t.column("doc_id").to_pylist()
        n = len(ids)
        return pa.table(
            {
                "band_key": pa.array(
                    [f"{b}:{bands[i, b]:04x}" for b in range(4) for i in range(n)]
                ),
                "doc_id": pa.array([ids[i] for _ in range(4) for i in range(n)], pa.int64()),
                "simhash": pa.array(
                    [int(np.int64(ph[i])) for _ in range(4) for i in range(n)], pa.int64()
                ),
            }
        )

    def pairs(g: pd.DataFrame) -> pa.Table:
        if len(g) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        out_a, out_b, out_d = [], [], []
        for i in range(len(ids)):
            d = hashing.hamming64(hs[i + 1 :], np.full(len(ids) - i - 1, hs[i], dtype=np.uint64))
            for j, dd in enumerate(d):
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1 + j]))
                out_d.append(int(dd))
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "hamming": pa.array(out_d, pa.int64())})

    df = (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if df.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    df = df[df["hamming"] <= max_hamming].drop_duplicates(["doc_a", "doc_b"])
    return df.reset_index(drop=True)


def phash_near_dups(images_path: str, max_hamming: int = 7,
                    n_bands: int = 8) -> pd.DataFrame:
    """Near-duplicate IMAGE pairs by perceptual hash — D3's image face over
    the multimodal decode stage.  Decode + phash run on the actor pool
    (``extras.multimodal.ImageDecodeStats``, codec loaded once per actor);
    then the same banded-pigeonhole shuffle as ``simhash_near_dups``:
    ``n_bands`` bands of 64/n_bands bits guarantee recall for hamming <
    n_bands (8 bands → every pair within hamming ≤ 7 shares a band), verify
    is vectorized hamming inside each bucket.  Scale shape: only
    (band_key, image_id, phash) rows shuffle — payload bytes never leave
    the decode stage."""
    from .multimodal import image_stats

    sigs = image_stats(images_path).map_batches(
        lambda t: t.select(["image_id", "phash"]), batch_format="pyarrow"
    )

    def band_rows(t: pa.Table) -> pa.Table:
        ph = np.array(t.column("phash").to_pylist(), dtype=np.int64).view(np.uint64)
        bands = hashing.simhash_bands(ph, n_bands)
        ids = t.column("image_id").to_pylist()
        n = len(ids)
        return pa.table(
            {
                "band_key": pa.array(
                    [f"{b}:{bands[i, b]:04x}" for b in range(n_bands) for i in range(n)]
                ),
                "image_id": pa.array(
                    [ids[i] for _ in range(n_bands) for i in range(n)], pa.string()
                ),
                "phash": pa.array(
                    [int(np.int64(ph[i])) for _ in range(n_bands) for i in range(n)],
                    pa.int64(),
                ),
            }
        )

    def pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"img_a": pa.array([], pa.string()),
                          "img_b": pa.array([], pa.string()),
                          "hamming": pa.array([], pa.int64())})
        if len(g) < 2:
            return empty
        g = g.sort_values("image_id")
        ids = g["image_id"].tolist()
        hs = g["phash"].to_numpy(dtype=np.int64).view(np.uint64)
        out_a, out_b, out_d = [], [], []
        for i in range(len(ids)):
            d = hashing.hamming64(hs[i + 1:], np.full(len(ids) - i - 1, hs[i], dtype=np.uint64))
            for j, dd in enumerate(d):
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + j])
                out_d.append(int(dd))
        return pa.table({"img_a": pa.array(out_a, pa.string()),
                         "img_b": pa.array(out_b, pa.string()),
                         "hamming": pa.array(out_d, pa.int64())})

    df = (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if df.empty:
        return pd.DataFrame({"img_a": pd.Series([], dtype="string"),
                             "img_b": pd.Series([], dtype="string"),
                             "hamming": pd.Series([], dtype="int64")})
    df = df[df["hamming"] <= max_hamming].drop_duplicates(["img_a", "img_b"])
    return df.sort_values(["img_a", "img_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.2) -> rd.Dataset:
    """Blocked exact n-gram Jaccard: pairs within the same ``source`` block
    (the coarse blocking key), word-3-gram shingle sets, jaccard ≥ threshold.
    SQL-oracled (DuckDB computes the identical shingle sets)."""
    ds = _docs(sf_dir)

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        shs = []
        for text in g["text"]:
            w = text.split(" ")
            shs.append({" ".join(w[i : i + 3]) for i in range(max(1, len(w) - 2))})
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jac = len(shs[i] & shs[j]) / max(1, len(shs[i] | shs[j]))
                if jac >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(jac)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    return ds.groupby("source").map_groups(block_pairs, batch_format="pandas")


def embedding_near_dups_lsh(sf_dir: str, threshold: float = 0.35,
                            n_planes: int = 4, seed: int = 42) -> pd.DataFrame:
    """Embedding-cosine near-dup with RANDOM-HYPERPLANE LSH blocking — the
    100 TB path: the blocking key is data-independent (no label can become a
    hot O(n²) block; expected bucket size = n/2^planes regardless of skew),
    multi-probe (1-bit flips) recovers most cross-boundary pairs.
    Approximate by design → rows-only check; the label-blocked exact variant
    below stays the oracle-checked face."""
    import ray

    rng = np.random.default_rng(seed)
    from .. import storage

    ds = storage.read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    dim = len(ds.take(1)[0]["embedding"])
    planes_ref = ray.put(rng.standard_normal((n_planes, dim)))

    def bucket_rows(t: pa.Table) -> pa.Table:
        planes = ray.get(planes_ref)
        ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        bits = (m @ planes.T) > 0
        bk = (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        # multi-probe: emit each row into its bucket + all 1-bit-flip buckets
        out_b, out_i, out_v = [], [], []
        for r in range(len(ids)):
            for b in (int(bk[r]), *(int(bk[r]) ^ (1 << p) for p in range(n_planes))):
                out_b.append(b)
                out_i.append(int(ids[r]))
                out_v.append(m[r])
        return pa.table({
            "bucket": pa.array(out_b, pa.int64()),
            "vec_id": pa.array(out_i, pa.int64()),
            "vec": pa.array([v.tolist() for v in out_v], pa.list_(pa.float64())),
        })

    def pairs(g: pd.DataFrame) -> pa.Table:
        if len(g) < 2:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64())})
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["vec"].to_numpy())
        sims = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        mask = (sims[iu] >= threshold) & (ids[iu[0]] != ids[iu[1]])
        return pa.table({
            "vec_a": pa.array(ids[iu[0][mask]].astype(np.int64), pa.int64()),
            "vec_b": pa.array(ids[iu[1][mask]].astype(np.int64), pa.int64()),
        })

    df = (
        ds.map_batches(bucket_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if df.empty:
        return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                             "vec_b": pd.Series([], dtype="int64")})
    return (
        df.drop_duplicates(["vec_a", "vec_b"])
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )


def embedding_near_dups(sf_dir: str, threshold: float = 0.35) -> rd.Dataset:
    """Embedding-cosine near-dup, blocked by label: within each label group
    a single numpy gram matrix finds all pairs ≥ threshold.  SQL-oracled via
    duckdb list_cosine_similarity with the same label blocking."""
    from .. import storage

    ds = storage.read_parquet_clean(f"{sf_dir}/embeddings.parquet")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.maximum(norm, 1e-30)
        sims = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= threshold
        return pa.table(
            {
                "vec_a": pa.array(ids[iu[0][mask]].astype(np.int64), pa.int64()),
                "vec_b": pa.array(ids[iu[1][mask]].astype(np.int64), pa.int64()),
            }
        )

    return ds.groupby("label").map_groups(pairs, batch_format="pandas")
