"""ANN query/seed loading must prune at the read (VERDICT r3 #2): the
driver may hold O(n_queries + n_lists) vectors plus one transient row group,
never the embeddings table.  Exactness is checked against a naive full read
on sorted, locally-shuffled, and globally-shuffled file layouts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(path, ids, dim=8, row_group_size=100):
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((len(ids), dim)).astype(np.float32)
    # embedding values keyed to vec_id so equality checks identify rows
    emb[:, 0] = np.asarray(ids, dtype=np.float32)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32(), dim)),
    })
    pq.write_table(t, path, row_group_size=row_group_size)


@pytest.fixture
def counting_reads(monkeypatch):
    """Count row-group reads + rows materialized through ParquetFile."""
    counts = {"groups": 0, "rows": 0, "full_reads": 0}
    orig_rg = pq.ParquetFile.read_row_group
    orig_read = pq.ParquetFile.read

    def spy_rg(self, i, **kw):
        t = orig_rg(self, i, **kw)
        counts["groups"] += 1
        counts["rows"] += t.num_rows
        return t

    def spy_read(self, **kw):
        counts["full_reads"] += 1
        return orig_read(self, **kw)

    monkeypatch.setattr(pq.ParquetFile, "read_row_group", spy_rg)
    monkeypatch.setattr(pq.ParquetFile, "read", spy_read)
    return counts


def test_load_queries_prunes_row_groups(tmp_path, counting_reads):
    from lightcrawler_ray.extras import ann

    n = 1200
    _write(tmp_path / "embeddings.parquet", np.arange(n))
    qids, qm = ann._load_queries(str(tmp_path), 5)
    assert qids.tolist() == [0, 1, 2, 3, 4]
    # sorted file: the 5 smallest live in row group 0 — exactly one read
    assert counting_reads["groups"] == 1 and counting_reads["full_reads"] == 0
    assert counting_reads["rows"] <= 100  # one row group, never the table


def test_load_queries_locally_shuffled_groups(tmp_path, counting_reads):
    """Row groups whose RANGES are disjoint but whose rows are unsorted
    inside — the pruned path must still return the exact smallest rows."""
    from lightcrawler_ray.extras import ann

    rng = np.random.default_rng(11)
    ids = np.arange(600)
    for lo in range(0, 600, 100):  # shuffle within each future row group
        seg = ids[lo:lo + 100].copy()
        rng.shuffle(seg)
        ids[lo:lo + 100] = seg
    _write(tmp_path / "embeddings.parquet", ids)
    qids, qm = ann._load_queries(str(tmp_path), 7)
    assert qids.tolist() == list(range(7))
    assert np.allclose(np.linalg.norm(qm, axis=1), 1.0)  # normalized rows
    assert counting_reads["rows"] <= 200


def test_smallest_rows_globally_shuffled(tmp_path):
    """Overlapping row-group ranges: pruning can't stop early, but the
    result must still be exact (reads until the stats prove coverage)."""
    from lightcrawler_ray.extras import ann

    rng = np.random.default_rng(5)
    ids = rng.permutation(500)
    _write(tmp_path / "embeddings.parquet", ids)
    t = ann._smallest_rows(str(tmp_path / "embeddings.parquet"), 9)
    assert t.column("vec_id").to_pylist() == list(range(9))


def test_evenly_spaced_rows_bounded_and_exact(tmp_path, counting_reads):
    from lightcrawler_ray.extras import ann

    n, k = 1100, 16
    _write(tmp_path / "embeddings.parquet", np.arange(n))
    m = ann._evenly_spaced_rows(str(tmp_path / "embeddings.parquet"), k)
    ranks = sorted({int(i * n / k) for i in range(k)})
    assert m[:, 0].astype(int).tolist() == ranks  # embedding[0] == vec_id
    assert counting_reads["full_reads"] == 0
    assert counting_reads["groups"] <= k
    assert counting_reads["rows"] <= k * 100  # only groups holding a pick


def test_evenly_spaced_rows_overlapping_fallback(tmp_path):
    from lightcrawler_ray.extras import ann

    rng = np.random.default_rng(6)
    ids = rng.permutation(300)
    _write(tmp_path / "embeddings.parquet", ids)
    m = ann._evenly_spaced_rows(str(tmp_path / "embeddings.parquet"), 8)
    ranks = sorted({int(i * 300 / 8) for i in range(8)})
    assert m[:, 0].astype(int).tolist() == ranks
