"""S4 at scale — lazy per-host robots: hosts first seen MID-CRAWL get their
robots.txt fetched+parsed inside the politeness shard that owns them, with
Disallow gating the frontier and Crawl-delay feeding the ledger walk
(VERDICT r02 "What's missing" #2).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lightcrawler_ray import storage
from lightcrawler_ray.stages.frontier import CrawlSpec

HOST_A = "a.site.test"
HOST_B = "b.site.test"


def _html(links: list[str]) -> bytes:
    body = "".join(f'<a href="{u}">链接</a>' for u in links)
    return f"<html><body>{body}<p>页面正文内容。</p></body></html>".encode()


def _fixture(tmp_path) -> dict[str, str]:
    pages = {
        f"http://{HOST_A}": _html([
            "/one.html", "/private/z.html",
            f"http://{HOST_B}/x.html", f"http://{HOST_B}/private/y.html",
        ]),
        f"http://{HOST_A}/one.html": _html([]),
        f"http://{HOST_A}/private/z.html": _html([]),
        f"http://{HOST_A}/robots.txt": b"User-agent: *\nDisallow: /private/\n",
        f"http://{HOST_B}/x.html": _html([f"http://{HOST_B}/w.html"]),
        f"http://{HOST_B}/w.html": _html([]),
        f"http://{HOST_B}/private/y.html": _html([]),
        f"http://{HOST_B}/robots.txt": (
            b"User-agent: *\nCrawl-delay: 2\nDisallow: /private/\n"
        ),
    }
    urls = list(pages)
    ctypes = ["text/plain" if u.endswith("robots.txt") else "text/html" for u in urls]
    pages_t = pa.table({
        "url": pa.array(urls),
        "host": pa.array([u.split("/")[2] for u in urls]),
        "status": pa.array([200] * len(urls), pa.int16()),
        "content_type": pa.array(ctypes),
        "body": pa.array(list(pages.values()), pa.large_binary()),
        "location": pa.array([""] * len(urls)),
        "fail_attempts": pa.array([0] * len(urls), pa.int32()),
    })
    images_t = pa.table({
        "image_id": pa.array([], pa.string()), "bytes": pa.array([], pa.large_binary()),
        "w": pa.array([], pa.int32()), "h": pa.array([], pa.int32()),
        "fmt": pa.array([], pa.string()), "caption": pa.array([], pa.string()),
        "phash": pa.array([], pa.int64()),
    })
    robots_t = pa.table({
        "host": pa.array([], pa.string()), "delay_ms": pa.array([], pa.int64()),
        "disallow": pa.array([], pa.list_(pa.string())),
    })
    seeds_t = pa.table({
        "url": pa.array([f"http://{HOST_A}/"]), "depth": pa.array([0], pa.int32()),
        "priority": pa.array([0], pa.int32()),
    })
    paths = {}
    for name, t in (("pages", pages_t), ("images", images_t),
                    ("robots", robots_t), ("seeds", seeds_t)):
        p = os.path.join(tmp_path, f"{name}.parquet")
        pq.write_table(t, p)
        paths[name] = p
    return paths


def _run(tmp_path, threshold: int, tag: str):
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    paths = _fixture(tmp_path)
    spec = CrawlSpec(
        max_depth=3, follow_mode=1, robots_source="lazy", seen_shards=2,
        politeness_shards=2, fetch_concurrency=1, request_delay_ms=100.0,
        doc_near_dup_hamming=-1, local_round_threshold=threshold,
    )
    job = CrawlJob(spec, pq.read_table(paths["seeds"]), paths["pages"],
                   paths["images"], paths["robots"], str(tmp_path / f"job-{tag}"))
    job.run(max_rounds=6)
    fetched, sched = [], []
    for d in sorted(os.listdir(job.job_dir)):
        fdir = os.path.join(job.job_dir, d, "frontier")
        sdir = os.path.join(job.job_dir, d, "schedule")
        if d.startswith("epoch=") and os.path.isdir(fdir):
            t = storage.load_table(fdir)
            if t.num_columns:
                fetched.extend(t.column("url").to_pylist())
        if d.startswith("epoch=") and os.path.isdir(sdir):
            t = storage.load_table(sdir)
            if t.num_columns:
                sched.extend(t.to_pylist())
    job.shutdown()
    return fetched, sched


@pytest.mark.parametrize("threshold,tag", [(4096, "local"), (0, "dist")])
def test_lazy_robots_disallow_and_delay(ray_session, tmp_path, threshold, tag):
    fetched, sched = _run(tmp_path, threshold, tag)
    # mid-crawl host B discovered only via A's links: its Disallow applies
    assert f"http://{HOST_B}/x.html" in fetched
    assert f"http://{HOST_B}/w.html" in fetched
    assert not any("/private/" in u for u in fetched), fetched
    # seed host A's own robots are honored through the same lazy path
    assert f"http://{HOST_A}/one.html" in fetched
    # B's Crawl-delay (2 s) reached the ledger: consecutive B fetches are
    # spaced >= 2000 ms while A runs at the default 100 ms budget
    b_times = sorted(r["sched_ms"] for r in sched if r["host"] == HOST_B)
    assert len(b_times) >= 2
    assert all(b - a >= 2000.0 - 1e-6 for a, b in zip(b_times, b_times[1:]))
    a_times = sorted(r["sched_ms"] for r in sched if r["host"] == HOST_A)
    assert all(b - a >= 100.0 - 1e-6 for a, b in zip(a_times, a_times[1:]))
