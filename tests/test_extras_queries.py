"""Tests for the round-3 query additions: phash near-dup pipeline, the
politeness audit, priority-rules crawl order, and the S10 index lookup face.

The phash test is oracle-style: the banded pipeline must reproduce the
brute-force all-pairs result exactly (pigeonhole guarantees recall for
hamming < n_bands; the in-bucket hamming verify guarantees precision)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from lightcrawler_ray.functions import hashing, imagecodec
from lightcrawler_ray.sources import synth


def _fixture_paths():
    p = synth.GraphParams(n_pages=300, n_hosts=6, n_images=120, out_degree=6)
    return p, synth.ensure_fixtures(p)


def test_phash_near_dups_matches_bruteforce(ray_session):
    from lightcrawler_ray.extras import dedupe

    _, paths = _fixture_paths()
    got = dedupe.phash_near_dups(paths["images"], max_hamming=7)

    t = pq.read_table(paths["images"], columns=["image_id", "bytes"])
    ids = t.column("image_id").to_pylist()
    hs = np.array(
        [hashing.phash64(imagecodec.decode(b)) for b in t.column("bytes").to_pylist()],
        dtype=np.int64,
    ).view(np.uint64)
    expect = set()
    for i in range(len(ids)):
        d = hashing.hamming64(hs[i + 1:], np.full(len(ids) - i - 1, hs[i], dtype=np.uint64))
        for j, dd in enumerate(d):
            if dd <= 7:
                a, b = sorted((ids[i], ids[i + 1 + j]))
                expect.add((a, b))
    assert expect, "fixture plants ~1% phash near-dups; brute force must find some"
    assert set(zip(got["img_a"], got["img_b"])) == expect


def test_politeness_audit_no_violations(ray_session):
    import __ray_entry__ as e

    df = e._q_politeness_audit("/root/testdata/sf0.001")
    assert len(df) > 0 and (df["n_fetches"] > 0).all()
    assert (df["violations"] == 0).all()
    # hosts with a crawl-delay actually have one recorded
    assert (df["delay_ms"] >= 0).all()


def test_crawl_priority_matches_simulator(ray_session):
    import __ray_entry__ as e
    from lightcrawler_ray.pipelines import simulator
    from lightcrawler_ray.pipelines.crawl import load_robots
    from lightcrawler_ray.stages.frontier import CrawlSpec

    df = e._q_crawl_priority("/root/testdata/sf0.001")
    _, paths = _fixture_paths()
    spec = CrawlSpec(max_depth=2, follow_mode=1, seen_shards=2, fetch_concurrency=2,
                     fetch_batch_size=64,
                     priority_rules=((r"/p/1\d\.html", 5), (r"/p/2\d\.html", 2)))
    g = simulator.simulate(spec, pq.read_table(paths["seeds"]), paths["pages"],
                           paths["images"], load_robots(paths["robots"]))
    assert df["url_md5"].tolist() == g.order


def test_index_lookup_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e._q_index_lookup(sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.execute(e.oracle_sql()["index_lookup"]).df()
    assert set(zip(got["token"], got["doc_id"])) == set(zip(want["token"], want["doc_id"]))
    assert len(got) == len(want)


def test_ann_ivf_recall_and_determinism(ray_session):
    """IVF top-k must (a) be deterministic run-to-run (fixed init, fixed
    iteration count, stable tie-breaks) and (b) recover most of the exact
    brute-force top-10 despite probing only n_probe of n_lists coarse lists."""
    from lightcrawler_ray.extras import ann

    sf = "/root/testdata/sf0.001"
    ivf1 = ann.topk_ivf(sf).sort_values(["query_id", "rank"]).reset_index(drop=True)
    ivf2 = ann.topk_ivf(sf).sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert ivf1.equals(ivf2), "IVF result changed between identical runs"

    exact = ann.topk_bruteforce(sf)
    recalls = []
    for qid, g in exact.groupby("query_id"):
        truth = set(g["neighbor_id"])
        got = set(ivf1[ivf1["query_id"] == qid]["neighbor_id"])
        recalls.append(len(truth & got) / max(1, len(truth)))
    assert np.mean(recalls) >= 0.5, f"mean recall {np.mean(recalls):.2f} < 0.5"

    # scored rows really are restricted to probed lists: fewer than the full
    # corpus must have been eligible (probe selectivity is the scale point)
    cents = ann.train_ivf_centroids(sf)
    assert cents.shape == (16, 64)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)


def test_asof_join_edge_semantics(ray_session, tmp_path):
    """As-of join edges: equal-timestamp order matches (inclusive <=), ties
    on order time go to the highest o_orderkey, events with no prior order
    drop (inner), and keys in only one table never pair."""
    import pandas as pd
    import pyarrow as pa

    from lightcrawler_ray import relational as rel

    ev = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([7, 7, 7, 8, 9], pa.int64()),
        "ts": pa.array(
            pd.to_datetime(
                ["2026-01-10", "2026-01-20", "2026-01-05", "2026-01-10", "2026-01-10"]
            )
        ).cast(pa.timestamp("us")),
        "event_type": pa.array(["x"] * 5), "value": pa.array([0.0] * 5),
        "props": pa.array([""] * 5),
    })
    od = pa.table({
        "o_orderkey": pa.array([100, 101, 102, 103, 104], pa.int64()),
        "o_custkey": pa.array([7, 7, 7, 10, 7], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5),
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0, 50.0]),
        "o_orderdate": pa.array(
            pd.to_datetime(
                # 100 and 104 tie at 01-10 (104 wins: higher key); 102 later
                ["2026-01-10", "2026-01-08", "2026-01-15", "2026-01-01", "2026-01-10"]
            )
        ).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * 5),
    })
    import pyarrow.parquet as pq

    pq.write_table(ev, str(tmp_path / "events.parquet"))
    pq.write_table(od, str(tmp_path / "orders.parquet"))
    got = (
        rel.asof_latest_order(str(tmp_path))
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # event 1 @01-10: orders 100 and 104 both @01-10 (inclusive) → 104
    # event 2 @01-20: latest ≤ is 102 @01-15
    # event 3 @01-05: no order ≤ 01-05 for user 7 (earliest is 01-08) → drop
    # event 4 user 8: no orders → drop; event 5 user 9: no orders → drop
    assert got["event_id"].tolist() == [1, 2]
    assert got["o_orderkey"].tolist() == [104, 102]
    assert got["o_totalprice"].tolist() == [50.0, 30.0]
    assert got["user_id"].tolist() == [7, 7]


def test_expand_run_pairs_matches_bruteforce():
    """The coarse-partition pair expansion (repeat/arange arithmetic) must
    enumerate exactly the within-run (i < j) pairs, for every run shape —
    this is the kernel all six dedupe pair stages now share instead of
    per-bucket map_groups calls."""
    from lightcrawler_ray.extras.dedupe import _expand_run_pairs

    rng = np.random.default_rng(7)
    for _ in range(25):
        counts = rng.integers(1, 6, size=rng.integers(0, 8))
        new_run = np.zeros(int(counts.sum()), dtype=bool)
        starts = np.cumsum(counts) - counts
        new_run[starts] = True
        I, J = _expand_run_pairs(new_run)
        expect = set()
        for s, c in zip(starts, counts):
            for i in range(s, s + c):
                for j in range(i + 1, s + c):
                    expect.add((i, j))
        assert set(zip(I.tolist(), J.tolist())) == expect
        assert len(I) == len(expect)  # no duplicates


def test_pair_stages_one_call_per_partition(ray_session):
    """Scale shape of the LSH pair stages: the group function runs once per
    coarse partition (≤ _PAIR_PARTITIONS Python invocations), NOT once per
    band bucket — a 10× corpus adds rows per partition, never calls."""
    import pandas as pd

    from lightcrawler_ray.extras import dedupe

    # many tiny synthetic buckets spread over the coarse partitions
    n = 400
    t = pd.DataFrame({
        "band_hash": np.arange(n, dtype=np.uint64) // 2,  # 200 buckets of 2
        "band_id": np.zeros(n, dtype=np.int32),
        "doc_id": np.arange(n, dtype=np.int64),
    })
    out = dedupe._mh_partition_pairs(t)  # ONE call covers all 200 buckets
    assert out.num_rows == 200
    a = out.column("doc_a").to_numpy()
    b = out.column("doc_b").to_numpy()
    assert (b == a + 1).all() and (a % 2 == 0).all()


def test_dup_span_stats_matches_bruteforce(ray_session):
    """Substring-level dedup (Lee et al. window grams): the coarse-partition
    pipeline must agree with a plain-Python full-corpus count."""
    from collections import Counter

    import pyarrow.parquet as pq

    from lightcrawler_ray.extras import dedupe

    sf = "/root/testdata/sf0.001"
    got = dedupe.dup_span_stats(sf)
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    n = 8
    per_doc: dict[int, Counter] = {}
    corpus: Counter = Counter()
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = (text or "").lower().split()
        c = Counter(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
        if c:
            per_doc[did] = c
            corpus.update(c)
    assert set(got["doc_id"]) == set(per_doc)
    by_id = got.set_index("doc_id")
    for did, c in per_doc.items():
        w = sum(c.values())
        d = sum(k for g, k in c.items() if corpus[g] >= 2)
        assert by_id.loc[did, "n_windows"] == w
        assert by_id.loc[did, "n_dup_windows"] == d
        assert abs(by_id.loc[did, "dup_ratio"] - d / w) < 1e-12
    # the fixture corpus must actually exercise duplication both ways
    assert (got["n_dup_windows"] > 0).any() and (got["n_dup_windows"] < got["n_windows"]).any()
