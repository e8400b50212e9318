"""Contract tests for the Lance branch of ``storage.py``.

The container has no ``lance`` wheel, so the Lance paths are normally dead
code (``pragma: no cover``).  VERDICT r4 #7: pin the seam's *call shape*
with a fake ``lance`` module so the branch can't rot — the fake implements
the public surface the seam relies on (``lance.write_dataset(table, uri)``
creates a dataset directory at ``uri``; ``lance.dataset(uri).to_table(
columns=...)`` reads it back with column pushdown) and the tests drive
``commit_table`` / ``load_table`` / ``write_dataset`` / ``read_dataset``
through it end to end.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lightcrawler_ray import storage


class _FakeLanceDataset:
    def __init__(self, uri):
        self.uri = uri

    def to_table(self, columns=None):
        t = pq.read_table(os.path.join(self.uri, "payload.parquet"))
        return t.select(columns) if columns is not None else t


class _FakeLance:
    """Mimics the lance module surface the seam calls (write_dataset /
    dataset), recording every call so tests can assert the shape."""

    def __init__(self):
        self.write_calls = []
        self.open_calls = []

    def write_dataset(self, table, uri, **kwargs):
        assert isinstance(table, pa.Table), "seam must pass an Arrow table"
        self.write_calls.append((uri, kwargs))
        os.makedirs(uri, exist_ok=True)  # lance datasets are directories
        pq.write_table(table, os.path.join(uri, "payload.parquet"))

    def dataset(self, uri, **kwargs):
        self.open_calls.append((uri, kwargs))
        return _FakeLanceDataset(uri)


@pytest.fixture()
def fake_lance(monkeypatch):
    fake = _FakeLance()
    monkeypatch.setattr(storage, "lance", fake)
    monkeypatch.setattr(storage, "HAVE_LANCE", True)
    return fake


def test_commit_and_load_roundtrip_via_lance(fake_lance, tmp_path):
    t = pa.table({"image_id": ["a", "b"], "w": pa.array([3, 4], pa.int32())})
    path = str(tmp_path / "tbl")
    storage.commit_table(t, path)
    # contract: commit writes <dir>/data.lance as a lance dataset dir, then
    # marks _SUCCESS and atomically renames — tmp dirs must be gone
    assert fake_lance.write_calls and fake_lance.write_calls[0][0].endswith("data.lance")
    assert storage.is_complete(path)
    assert not [p for p in os.listdir(tmp_path) if ".tmp-" in p]
    back = storage.load_table(path)
    assert back.equals(t)
    # column pushdown flows through lance.dataset(...).to_table(columns=...)
    only_w = storage.load_table(path, columns=["w"])
    assert only_w.column_names == ["w"]


def test_commit_overwrites_previous_lance_table(fake_lance, tmp_path):
    path = str(tmp_path / "tbl")
    storage.commit_table(pa.table({"x": [1]}), path)
    storage.commit_table(pa.table({"x": [2, 3]}), path)
    assert storage.load_table(path)["x"].to_pylist() == [2, 3]


def test_write_dataset_prefers_write_lance(fake_lance, tmp_path):
    calls = []

    class _DS:  # minimal Dataset stand-in exposing both writers
        def write_lance(self, path, **kw):
            calls.append(("lance", path, kw))
            fake_lance.write_dataset(pa.table({"x": [1]}), path)

        def write_parquet(self, path, **kw):  # pragma: no cover — must not run
            calls.append(("parquet", path, kw))

    path = str(tmp_path / "out")
    storage.write_dataset(_DS(), path)
    assert [c[0] for c in calls] == ["lance"], "lance branch must win when available"
    assert calls[0][1] == path
    assert storage.is_complete(path)


def test_read_dataset_routes_lance_suffix_to_read_lance(fake_lance, tmp_path, monkeypatch):
    import ray.data as rd

    seen = []
    monkeypatch.setattr(
        rd, "read_lance", lambda path, columns=None, **kw: seen.append((path, columns))
        or "DS", raising=False,
    )
    d = str(tmp_path / "imgs.lance")
    os.makedirs(d)
    out = storage.read_dataset(d, columns=["image_id", "caption"])
    assert out == "DS"
    # contract: the suffix routes to read_lance WITH the column pushdown
    assert seen == [(d, ["image_id", "caption"])]


def test_parquet_fallback_unchanged_when_lance_absent(tmp_path):
    # the shipped container path: HAVE_LANCE False → pure parquet round trip
    assert not storage.HAVE_LANCE
    t = pa.table({"k": [1, 2, 3]})
    path = str(tmp_path / "tbl")
    storage.commit_table(t, path)
    assert storage.load_table(path).equals(t)
