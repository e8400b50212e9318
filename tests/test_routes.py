"""M11 / §2.10 — per-route content dispatch (SpiderFrame::handleContent,
worker/SpiderFrame.class.php:155-178; route table shape e.g.
worker/SpiderGovCnZhengce.class.php:28-33): regex → list / detail /
attachment handlers, every match runs, no-match defaults to list."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from lightcrawler_ray import storage
from lightcrawler_ray.stages.frontier import CrawlSpec

_PDF = b"%PDF-1.4 fake-but-stable-bytes " * 20

ROUTES = (
    (r"^http://rt\.test/list/", "list"),
    (r"^http://rt\.test/content/\d+\.htm$", "detail"),
    (r"\.(pdf|docx?|xlsx?)$", "attachment"),
)


def _detail_body(i: int) -> bytes:
    return (
        f"<html><head><title>文件{i}_公报</title></head><body>"
        f"<p>发文字号：测发〔2026〕{i}号</p>"
        + "".join(f"<p>正文第{j}段：关于专项工作的安排与要求，持续推进落实。</p>" for j in range(8))
        + '<p>附件：<a href="/files/f1.pdf">附件一</a></p>'
        "</body></html>"
    ).encode("utf-8")


def _routed_fixture(tmp_path) -> dict[str, str]:
    host = "rt.test"
    pages: dict[str, tuple[str, bytes]] = {
        f"http://{host}/list/0.htm": (
            "text/html",
            (
                "<html><body><script>var countPage = 2;</script>"
                '<a href="/content/1.htm">文件一</a><a href="/content/2.htm">文件二</a>'
                '<a href="/other.html">其他</a></body></html>'
            ).encode(),
        ),
        f"http://{host}/content/1.htm": ("text/html", _detail_body(1)),
        f"http://{host}/content/2.htm": ("text/html", _detail_body(2)),
        # matches NO route → default list handling: links followed, NO doc
        f"http://{host}/other.html": (
            "text/html",
            ("<html><body>" + "<p>一篇足够长的页面，但不是详情路由。</p>" * 10 + "</body></html>").encode(),
        ),
        f"http://{host}/files/f1.pdf": ("application/pdf", _PDF),
    }
    urls = list(pages)
    pages_t = pa.table(
        {
            "url": pa.array(urls),
            "host": pa.array([host] * len(urls)),
            "status": pa.array([200] * len(urls), pa.int16()),
            "content_type": pa.array([pages[u][0] for u in urls]),
            "body": pa.array([pages[u][1] for u in urls], pa.large_binary()),
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
        {"url": pa.array([f"http://{host}/list/0.htm"]),
         "depth": pa.array([0], pa.int32()), "priority": pa.array([0], pa.int32())}
    )
    paths = {}
    for name, t in (("pages", pages_t), ("images", images_t),
                    ("robots", robots_t), ("seeds", seeds_t)):
        p = os.path.join(tmp_path, f"{name}.parquet")
        pq.write_table(t, p)
        paths[name] = p
    return paths


def _spec(**kw) -> CrawlSpec:
    return CrawlSpec(max_depth=2, follow_mode=2, seen_shards=2, fetch_concurrency=1,
                     routes=ROUTES, synthesize_pagination=True, **kw)


def _load(job_dir: str, sub: str) -> list[dict]:
    rows = []
    for d in sorted(os.listdir(job_dir)):
        p = os.path.join(job_dir, d, sub)
        if d.startswith("epoch=") and os.path.isdir(p):
            t = storage.load_table(p)
            if t.num_columns:
                rows.extend(t.to_pylist())
    return rows


def test_routed_crawl_engine_vs_simulator(ray_session, tmp_path):
    from lightcrawler_ray.pipelines.crawl import CrawlJob, load_robots
    from lightcrawler_ray.pipelines.simulator import simulate

    paths = _routed_fixture(tmp_path)
    seeds = pq.read_table(paths["seeds"])
    job = CrawlJob(_spec(), seeds, paths["pages"], paths["images"], paths["robots"],
                   str(tmp_path / "job"))
    job.run(max_rounds=6)
    docs = _load(job.job_dir, "docs")
    atts = _load(job.job_dir, "attachments")
    job.shutdown()

    # detail route → doc records; list + unrouted pages → none
    assert sorted(d["url"] for d in docs) == [
        "http://rt.test/content/1.htm", "http://rt.test/content/2.htm"
    ]
    assert all(d["doc_ori_no"] for d in docs)
    # M25: the doc records carry the harvested {title, url} attachment links
    for d in docs:
        assert d["attachments"] == [{"title": "附件一", "url": "http://rt.test/files/f1.pdf"}]
    # attachment route → ONE stored payload (content-dedup keep-first),
    # typed from the extension map
    assert len(atts) == 1
    a = atts[0]
    assert a["url"] == "http://rt.test/files/f1.pdf"
    assert a["att_ext"] == "pdf" and a["att_type"] == 6
    assert a["doc_id"] == hashlib.md5(_PDF).hexdigest()
    assert bytes(a["bytes"]) == _PDF

    # parity: the simulator (shared operator code, reference control flow)
    # produces the same doc/attachment url sets
    golden = simulate(_spec(), seeds, paths["pages"], paths["images"],
                      load_robots(paths["robots"]))
    assert sorted(d["url"] for d in docs) == sorted(
        {d["url"] for d in golden.docs}
    )
    assert {a["url"]} == {r["url"] for r in golden.attachments}


def test_pagination_file_series_e2e(ray_session, tmp_path):
    """M29 file-series variant through the routed engine: a list page whose
    JS pager is ``location.href = url+"index"+"."+"htm"`` with
    ``var countPage = 3`` reseeds ``index_1.htm`` / ``index_2.htm`` in its
    own directory (SpiderCsrcGov.class.php:205-258)."""
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    host = "fs.test"
    pager = (
        "<script>var countPage = 3;"
        'function t(){location.href = url+"index"+"."+"htm";}</script>'
    )

    def _list(links: str) -> bytes:
        return f"<html><body>{pager}{links}</body></html>".encode()

    pages = {
        f"http://{host}/zc/index.htm": _list('<a href="/c/1.htm">一</a>'),
        f"http://{host}/zc/index_1.htm": _list('<a href="/c/2.htm">二</a>'),
        f"http://{host}/zc/index_2.htm": _list(""),
        f"http://{host}/c/1.htm": _detail_body(11),
        f"http://{host}/c/2.htm": _detail_body(12),
    }
    urls = list(pages)
    pages_t = pa.table({
        "url": pa.array(urls), "host": pa.array([host] * len(urls)),
        "status": pa.array([200] * len(urls), pa.int16()),
        "content_type": pa.array(["text/html"] * len(urls)),
        "body": pa.array(list(pages.values()), pa.large_binary()),
        "location": pa.array([""] * len(urls)),
        "fail_attempts": pa.array([0] * len(urls), pa.int32()),
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
    paths = {}
    for name, t in (("pages", pages_t), ("images", images_t), ("robots", robots_t)):
        p = os.path.join(tmp_path, f"fs-{name}.parquet")
        pq.write_table(t, p)
        paths[name] = p
    seeds = pa.table({
        "url": pa.array([f"http://{host}/zc/index.htm"]),
        "depth": pa.array([0], pa.int32()), "priority": pa.array([0], pa.int32()),
    })
    spec = CrawlSpec(
        max_depth=2, follow_mode=2, seen_shards=2, fetch_concurrency=1,
        synthesize_pagination=True,
        routes=((r"/zc/", "list"), (r"/c/\d+\.htm$", "detail")),
    )
    job = CrawlJob(spec, seeds, paths["pages"], paths["images"], paths["robots"],
                   str(tmp_path / "fsjob"))
    job.run(max_rounds=6)
    fetched = {r["url"] for r in _load(job.job_dir, "frontier")}
    docs = {d["url"] for d in _load(job.job_dir, "docs")}
    job.shutdown()
    assert f"http://{host}/zc/index_1.htm" in fetched, "file series reseeded"
    assert f"http://{host}/zc/index_2.htm" in fetched
    assert docs == {f"http://{host}/c/1.htm", f"http://{host}/c/2.htm"}, (
        "details found only via the synthesized series pages"
    )


def test_pagination_only_on_list_routes(ray_session, tmp_path):
    """synthesize_pagination with routes present fires only on list pages."""
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    paths = _routed_fixture(tmp_path)
    job = CrawlJob(_spec(), pq.read_table(paths["seeds"]), paths["pages"],
                   paths["images"], paths["robots"], str(tmp_path / "job2"))
    job.run(max_rounds=6)
    frontier = _load(job.job_dir, "frontier")
    job.shutdown()
    urls = {r["url"] for r in frontier}
    assert "http://rt.test/list/0.htm?page=1" in urls, "list pagination synthesized"
    assert not any("content/1.htm?page=" in u for u in urls), "no pagination off detail pages"


def test_routed_site_fixture_full_discovery(ray_session, tmp_path):
    """The bench-scale routed site (synth.build_routed_site) at tiny size:
    every content page and attachment is reachable ONLY through the M29
    record-count ``index_{k}.htm`` file series, so full discovery proves
    list-route pagination + detail route + attachment route compose."""
    from lightcrawler_ray.pipelines.crawl import CrawlJob
    from lightcrawler_ray.sources import synth
    from lightcrawler_ray.stages.frontier import CrawlSpec

    p = synth.RoutedSiteParams(n_docs=100, n_hosts=2, page_size=5,
                               body_repeat=2, att_every=2, seed=7)
    paths = synth.ensure_routed_fixtures(p, root=str(tmp_path / "fx"))
    seeds = pq.read_table(paths["seeds"])
    assert seeds.num_rows == 2  # one section per host
    spec = CrawlSpec(max_depth=3, follow_mode=2, routes=synth.ROUTED_ROUTES,
                     synthesize_pagination=True, seen_shards=2,
                     fetch_concurrency=2)
    job = CrawlJob(spec, seeds, paths["pages"], paths["images"],
                   paths["robots"], str(tmp_path / "job"))
    summary = job.run(max_rounds=8)
    docs = _load(job.job_dir, "docs")
    atts = _load(job.job_dir, "attachments")
    job.shutdown()

    # 2 sections x (10 list pages + 50 content + 25 pdf) = 170 URLs
    assert summary["links_followed"] == 170
    assert sorted(d["url"] for d in docs) == sorted(
        f"http://{synth._routed_host(i // 50, p)}/content/{i}.htm"
        for i in range(100)
    )
    assert all(d["doc_ori_no"] for d in docs)
    # every even doc's PDF payload was fetched on the attachment route
    assert sorted(a["url"] for a in atts) == sorted(
        f"http://{synth._routed_host(i // 50, p)}/files/a{i}.pdf"
        for i in range(0, 100, 2)
    )
    assert all(a["att_ext"] == "pdf" for a in atts)
    # harvested {title,url} links on the doc records point at the same PDFs
    harvested = {l["url"] for d in docs for l in (d["attachments"] or [])}
    assert harvested == {a["url"] for a in atts}
