"""M9 — redirect-only-until-first-content mode: a cross-host redirect chain
from the seed is followed (rules bypassed), the first 200 re-anchors the
follow scope, and the crawl then proceeds normally on the new host
(PHPCrawler.class.php:801-820, PHPCrawlerURLFilter.class.php:121-135)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from lightcrawler_ray import storage
from lightcrawler_ray.stages.frontier import CrawlSpec

_BODY = ("<html><body>" + "<p>落地页正文内容，足够长以形成文档记录。</p>" * 10
         + '<a href="/a.html">甲</a></body></html>').encode()
_A_BODY = ("<html><body>" + "<p>子页面正文内容，同样足够长以形成文档。</p>" * 10
           + "</body></html>").encode()


def _chain_fixture(tmp_path) -> dict[str, str]:
    rows = [
        # seed host A: two-hop redirect chain off-host
        ("http://a.test/entry", "a.test", 302, "text/html", b"", "http://a.test/hop"),
        ("http://a.test/hop", "a.test", 302, "text/html", b"", "http://b.test/real.html"),
        # content lands on host B
        ("http://b.test/real.html", "b.test", 200, "text/html", _BODY, ""),
        ("http://b.test/a.html", "b.test", 200, "text/html", _A_BODY, ""),
    ]
    pages_t = pa.table({
        "url": pa.array([r[0] for r in rows]),
        "host": pa.array([r[1] for r in rows]),
        "status": pa.array([r[2] for r in rows], pa.int16()),
        "content_type": pa.array([r[3] for r in rows]),
        "body": pa.array([r[4] for r in rows], pa.large_binary()),
        "location": pa.array([r[5] for r in rows]),
        "fail_attempts": pa.array([0] * len(rows), pa.int32()),
    })
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
    seeds_t = pa.table({"url": pa.array(["http://a.test/entry"]),
                        "depth": pa.array([0], pa.int32()),
                        "priority": pa.array([0], pa.int32())})
    paths = {}
    for name, t in (("pages", pages_t), ("images", images_t),
                    ("robots", robots_t), ("seeds", seeds_t)):
        p = os.path.join(tmp_path, f"{name}.parquet")
        pq.write_table(t, p)
        paths[name] = p
    return paths


def _run(paths, jd, **spec_kw):
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    spec = CrawlSpec(max_depth=2, follow_mode=2, seen_shards=2, fetch_concurrency=1,
                     **spec_kw)
    job = CrawlJob(spec, pq.read_table(paths["seeds"]), paths["pages"],
                   paths["images"], paths["robots"], jd)
    job.run(max_rounds=8)
    order = job.crawl_order()
    seen = job.seen.members()
    docs = []
    for d in sorted(os.listdir(jd)):
        p = os.path.join(jd, d, "docs")
        if d.startswith("epoch=") and os.path.isdir(p):
            t = storage.load_table(p)
            if t.num_columns:
                docs.extend(r["url"] for r in t.select(["url"]).to_pylist())
    job.shutdown()
    return order, seen, docs, spec


def test_redirect_chain_followed_and_scope_reanchored(ray_session, tmp_path):
    order, seen, docs, spec = _run(_chain_fixture(tmp_path), str(tmp_path / "on"))
    assert len(order) == 4, "chain + content + child page all fetched"
    assert "http://b.test/real.html" in docs and "http://b.test/a.html" in docs
    assert "b.test" in spec.seed_hosts, "first content URL re-anchors scope"


def test_mode_off_drops_cross_host_redirect(ray_session, tmp_path):
    order, seen, docs, _ = _run(_chain_fixture(tmp_path), str(tmp_path / "off"),
                                redirects_till_content=False)
    # same-host hop is followed (normal rules), the cross-host hop is not
    assert len(order) == 2
    assert docs == []


def _mixed_fixture(tmp_path) -> dict[str, str]:
    """Two seeds in ONE round: a redirect page (seq 0) and a content page
    (seq 1).  The redirect's cross-host target must be kept even though the
    round also delivered the first 200 — per-PAGE M9 granularity (the
    reference flips redirect-only per processed page, so the redirect popped
    BEFORE the first 200 keeps its target unconditionally)."""
    rows = [
        ("http://a.test/entry", "a.test", 302, "text/html", b"", "http://c.test/land.html"),
        ("http://b.test/home.html", "b.test", 200, "text/html", _BODY, ""),
        ("http://b.test/a.html", "b.test", 200, "text/html", _A_BODY, ""),
        ("http://c.test/land.html", "c.test", 200, "text/html", _A_BODY, ""),
    ]
    pages_t = pa.table({
        "url": pa.array([r[0] for r in rows]),
        "host": pa.array([r[1] for r in rows]),
        "status": pa.array([r[2] for r in rows], pa.int16()),
        "content_type": pa.array([r[3] for r in rows]),
        "body": pa.array([r[4] for r in rows], pa.large_binary()),
        "location": pa.array([r[5] for r in rows]),
        "fail_attempts": pa.array([0] * len(rows), pa.int32()),
    })
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
    seeds_t = pa.table({
        "url": pa.array(["http://a.test/entry", "http://b.test/home.html"]),
        "depth": pa.array([0, 0], pa.int32()),
        "priority": pa.array([0, 0], pa.int32()),
    })
    paths = {}
    for name, t in (("pages", pages_t), ("images", images_t),
                    ("robots", robots_t), ("seeds", seeds_t)):
        p = os.path.join(tmp_path, f"{name}.parquet")
        pq.write_table(t, p)
        paths[name] = p
    return paths


def test_mixed_round_per_page_granularity(ray_session, tmp_path):
    """ADVICE r02: a redirect whose parent precedes the first 200 in the SAME
    round keeps its target (engine ≡ simulator on both round paths)."""
    import pytest as _pt

    from lightcrawler_ray.pipelines.crawl import load_robots
    from lightcrawler_ray.pipelines.simulator import simulate

    paths = _mixed_fixture(tmp_path)
    golden = simulate(
        CrawlSpec(max_depth=2, follow_mode=2, seen_shards=2, fetch_concurrency=1),
        pq.read_table(paths["seeds"]), paths["pages"], paths["images"],
        load_robots(paths["robots"]),
    )
    assert "http://c.test/land.html" in golden.order_urls, "sanity: golden keeps it"
    for tag, threshold in (("local", 4096), ("dist", 0)):
        order, seen, docs, _ = _run(paths, str(tmp_path / f"mixed-{tag}"),
                                    local_round_threshold=threshold)
        assert order == golden.order, tag
        assert seen == sorted(golden.seen), tag
        assert "http://c.test/land.html" in docs, (
            f"{tag}: redirect target from a pre-200 parent must survive"
        )


def test_parity_with_simulator(ray_session, tmp_path):
    from lightcrawler_ray.pipelines.crawl import load_robots
    from lightcrawler_ray.pipelines.simulator import simulate

    paths = _chain_fixture(tmp_path)
    order, seen, _, spec = _run(paths, str(tmp_path / "par"))
    golden = simulate(spec, pq.read_table(paths["seeds"]), paths["pages"],
                      paths["images"], load_robots(paths["robots"]))
    assert order == golden.order
    assert seen == sorted(golden.seen)
