"""J3 — doc simhash near-dup gate with the doc_ori_no override
(worker/SpiderFrame.class.php:281-293): a reworded near-duplicate document is
dropped unless it carries an unseen official document number."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lightcrawler_ray import storage
from lightcrawler_ray.stages.frontier import CrawlSpec

_BASE = "本通知就全国范围内的数据要素流通与交易平台建设提出总体要求。" * 40


def _page(extra: str, title: str = "数据要素通知") -> bytes:
    return (
        f"<html><head><title>{title}</title></head><body>"
        f"<p>{_BASE}</p><p>{extra}</p></body></html>"
    ).encode("utf-8")


def _mini_fixture(tmp_path) -> dict[str, str]:
    host = "site.test"
    pages = {
        # canonical form: the root URL normalizes to no trailing slash
        f"http://{host}": (
            '<html><body><a href="/a.html">甲</a><a href="/b.html">乙</a>'
            '<a href="/c.html">丙</a><a href="/sub.html">列表</a></body></html>'
        ).encode(),
        f"http://{host}/a.html": _page("各地区各部门要认真贯彻执行。"),
        # near-dup of a.html, no document number → must be dropped
        f"http://{host}/b.html": _page("各地区各部门要严格贯彻执行。"),
        # near-dup of a.html WITH an unseen number → override keeps it
        f"http://{host}/c.html": _page("发文字号：国发〔2026〕99号 各地区各部门要认真贯彻执行。"),
        f"http://{host}/sub.html": (
            '<html><body><a href="/d.html">丁</a></body></html>'
        ).encode(),
        # near-dup discovered in a LATER round (cross-round index hit)
        f"http://{host}/d.html": _page("各地区各部门要切实贯彻执行。"),
    }
    urls = list(pages)
    pages_t = pa.table(
        {
            "url": pa.array(urls),
            "host": pa.array([host] * len(urls)),
            "status": pa.array([200] * len(urls), pa.int16()),
            "content_type": pa.array(["text/html"] * len(urls)),
            "body": pa.array(list(pages.values()), pa.large_binary()),
            "location": pa.array([""] * len(urls)),
            "fail_attempts": pa.array([0] * len(urls), pa.int32()),
        }
    )
    images_t = pa.table(
        {"image_id": pa.array([], pa.string()), "bytes": pa.array([], pa.large_binary()),
         "w": pa.array([], pa.int32()), "h": pa.array([], pa.int32()),
         "fmt": pa.array([], pa.string()), "caption": pa.array([], pa.string()),
         "phash": pa.array([], pa.int64())}
    )
    robots_t = pa.table(
        {"host": pa.array([], pa.string()), "delay_ms": pa.array([], pa.int64()),
         "disallow": pa.array([], pa.list_(pa.string()))}
    )
    seeds_t = pa.table(
        {"url": pa.array([f"http://{host}/"]), "depth": pa.array([0], pa.int32()),
         "priority": pa.array([0], pa.int32())}
    )
    paths = {}
    for name, t in (("pages", pages_t), ("images", images_t),
                    ("robots", robots_t), ("seeds", seeds_t)):
        p = os.path.join(tmp_path, f"{name}.parquet")
        pq.write_table(t, p)
        paths[name] = p
    return paths


def _kept_docs(job_dir: str) -> dict[str, str]:
    """url → doc_ori_no for every doc that survived the gates."""
    out = {}
    for d in sorted(os.listdir(job_dir)):
        p = os.path.join(job_dir, d, "docs")
        if d.startswith("epoch=") and os.path.isdir(p):
            t = storage.load_table(p)
            if t.num_columns:
                for r in t.select(["url", "doc_ori_no"]).to_pylist():
                    out[r["url"]] = r["doc_ori_no"]
    return out


@pytest.mark.parametrize("threshold", [0, 4096])
def test_near_dup_doc_dropped_unless_numbered(ray_session, tmp_path, threshold):
    """Covers both the local (threshold=4096) and distributed (threshold=0)
    round paths — they share _doc_verdicts."""
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    paths = _mini_fixture(tmp_path)
    spec = CrawlSpec(max_depth=2, follow_mode=2, seen_shards=2, fetch_concurrency=1,
                     local_round_threshold=threshold)
    job = CrawlJob(spec, pq.read_table(paths["seeds"]), paths["pages"],
                   paths["images"], paths["robots"], str(tmp_path / f"job{threshold}"))
    job.run(max_rounds=6)
    docs = _kept_docs(job.job_dir)
    job.shutdown()
    assert "http://site.test/a.html" in docs, "original doc must survive"
    assert "http://site.test/b.html" not in docs, "unnumbered near-dup must drop"
    assert "http://site.test/c.html" in docs, "numbered near-dup must survive (override)"
    assert docs["http://site.test/c.html"], "override doc carries its number"
    assert "http://site.test/d.html" not in docs, "cross-round near-dup must drop"


def test_gate_disabled_keeps_near_dups(ray_session, tmp_path):
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    paths = _mini_fixture(tmp_path)
    spec = CrawlSpec(max_depth=2, follow_mode=2, seen_shards=2, fetch_concurrency=1,
                     doc_near_dup_hamming=-1)
    job = CrawlJob(spec, pq.read_table(paths["seeds"]), paths["pages"],
                   paths["images"], paths["robots"], str(tmp_path / "job_off"))
    job.run(max_rounds=6)
    docs = _kept_docs(job.job_dir)
    job.shutdown()
    assert "http://site.test/b.html" in docs
    assert "http://site.test/d.html" in docs


def test_simindex_flood_stays_linear(ray_session):
    """A boilerplate corpus where EVERY doc is a near-dup of every other
    (the worst-case bucket skew for banded LSH): the index must stay exact
    — earliest witness, dup inheritance — without going quadratic.  20k
    docs, all within hamming 2 of one base value; pre-hardening this shape
    cost ~90 s inside a crawl round, post-hardening it is sub-second
    (identical-sim dominance bounds buckets at DISTINCT sims, the stored
    scan early-exits, and batch dups inherit their first occurrence's
    verdict)."""
    import time

    import numpy as np

    from lightcrawler_ray.state.simindex import SimIndex

    n = 20000
    base = np.uint64(0x123456789ABCDEF0)
    bits = np.random.default_rng(3).integers(0, 64, size=n).astype(np.uint64)
    sims = (base ^ (np.uint64(1) << bits)).view(np.int64)
    sims[0] = np.int64(base.view(np.int64))
    idx = SimIndex()
    try:
        t0 = time.perf_counter()
        out = idx.query_insert(sims, [f"d{i}" for i in range(n)], max_hamming=3)
        dt = time.perf_counter() - t0
    finally:
        idx.shutdown()
    assert out[0] == ""                       # the base doc has no witness
    # every later doc is hamming 1 from base → 3 of 4 bands collide with d0,
    # whose seq 0 is the global earliest witness
    assert all(o == "d0" for o in out[1:])
    assert dt < 10, f"flood went super-linear: {dt:.1f}s for {n} docs"
