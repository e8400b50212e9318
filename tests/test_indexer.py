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


# ---------------------------------------------------------------------------
# S10 streaming variant (worker/IndexManager.class.php:40-60): queue-driven
# increments through the same tokenize path, watermark exactly-once.


def _batch(rows):
    import pyarrow as pa

    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


def test_streaming_increments_visible_to_lookup(ray_session, tmp_path):
    import ray

    out = str(tmp_path / "sidx")
    ix = indexer.StreamingIndexer.remote(out)
    n1 = ray.get(ix.submit.remote(_batch([(1, "data engine for ray pipelines"),
                                          (2, "RAY data streams blocks")]), 0))
    assert n1 > 0
    assert indexer.lookup(out, "ray") == [1, 2]
    n2 = ray.get(ix.submit.remote(_batch([(3, "politeness budget for crawl engine")]), 1))
    assert n2 > 0
    # the second increment is visible WITH the first — lookup spans parts
    assert indexer.lookup(out, "engine") == [1, 3]
    assert indexer.lookup(out, "ray") == [1, 2]
    ray.kill(ix)


def test_streaming_replay_is_exactly_once_and_resumable(ray_session, tmp_path):
    import os

    import ray

    out = str(tmp_path / "sidx2")
    ix = indexer.StreamingIndexer.remote(out)
    assert ray.get(ix.submit.remote(_batch([(1, "alpha beta")]), 0)) > 0
    # a producer retry re-sends the same seq: skipped, index unchanged
    assert ray.get(ix.submit.remote(_batch([(1, "alpha beta")]), 0)) == 0
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(parts) == 1
    ray.kill(ix)
    # resume: a fresh actor re-attaches at the persisted watermark
    ix2 = indexer.StreamingIndexer.remote(out)
    assert ray.get(ix2.get_watermark.remote()) == 0
    assert ray.get(ix2.submit.remote(_batch([(2, "beta gamma")]), 0)) == 0  # old
    assert ray.get(ix2.submit.remote(_batch([(2, "beta gamma")]), 1)) > 0   # new
    assert indexer.lookup(out, "beta") == [1, 2]
    ray.kill(ix2)


def test_streaming_equals_batch_index(ray_session, tmp_path):
    """The same docs streamed in two increments answer every lookup the
    batch-built index answers — and term_df (the oracle face) is untouched
    by which path built the postings."""
    import ray

    batch_dir = str(tmp_path / "bidx")
    stream_dir = str(tmp_path / "sidx3")
    indexer.build_index(_docs_ds(), batch_dir)
    rows = [(1, "data engine for ray pipelines"), (2, "RAY data streams blocks"),
            (3, "politeness budget for crawl engine"), (4, "")]
    ix = indexer.StreamingIndexer.remote(stream_dir)
    ray.get(ix.submit.remote(_batch(rows[:2]), 0))
    ray.get(ix.submit.remote(_batch(rows[2:]), 1))
    for tok in ("ray", "data", "engine", "crawl", "absent"):
        assert indexer.lookup(stream_dir, tok) == indexer.lookup(batch_dir, tok)
    ray.kill(ix)


def test_bm25_matches_bruteforce(ray_session):
    """BM25 scoring face: two streaming passes must reproduce the plain
    full-corpus computation (same idf variant, constants, tie-break)."""
    import math

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    terms = ("query", "window", "scan")
    got = indexer.bm25_topk(sf, terms=terms, k=10)
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = {d: (x or "").lower().split()
            for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    df = {w: sum(w in set(v) for v in docs.values()) for w in terms}
    idf = {w: math.log((n - df[w] + 0.5) / (df[w] + 0.5) + 1.0) for w in terms}
    k1, b = 1.2, 0.75
    scores = {}
    for d, toks in docs.items():
        s = 0.0
        for w in terms:
            tf = toks.count(w)
            if tf:
                s += idf[w] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            scores[d] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["doc_id"]) == [d for d, _ in want]
    for (d, s), gs in zip(want, got["score"]):
        assert abs(s - gs) < 1e-9
