"""S10 — full-text index builder (read -> tokenize -> sort -> partitioned
postings sink, worker/IndexBuilder.class.php:20-85 restated)."""

from __future__ import annotations

import ray.data as rd

from lightcrawler_ray import storage
from lightcrawler_ray.pipelines import indexer


def _docs_ds():
    rows = [
        {"doc_id": 1, "text": "data engine for ray pipelines"},
        {"doc_id": 2, "text": "RAY data streams blocks"},
        {"doc_id": 3, "text": "politeness budget for crawl engine"},
        {"doc_id": 4, "text": ""},
    ]
    return rd.from_items(rows)


def test_build_and_lookup(ray_session, tmp_path):
    out = str(tmp_path / "idx")
    n = indexer.build_index(_docs_ds(), out)
    assert n > 0 and storage.is_complete(out)
    assert indexer.lookup(out, "ray") == [1, 2]        # case-folded
    assert indexer.lookup(out, "engine") == [1, 3]
    assert indexer.lookup(out, "absent") == []
    # token-ordered parts: postings arrive sorted
    assert indexer.lookup(out, "data") == [1, 2]


def test_completed_index_is_skipped(ray_session, tmp_path):
    out = str(tmp_path / "idx2")
    assert indexer.build_index(_docs_ds(), out) > 0
    assert indexer.build_index(_docs_ds(), out) == -1  # resume watermark


def test_term_df_matches_bruteforce(ray_session):
    df = indexer.term_df("/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    want: dict[str, int] = {}
    for text in t.column("text").to_pylist():
        for w in set((text or "").lower().split()):
            want[w] = want.get(w, 0) + 1
    got = dict(zip(df["token"], df["df"]))
    assert got == want
