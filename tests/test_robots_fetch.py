"""S4 — robots.txt fetch+parse: the engine produces the SAME crawl when its
rules come from fetched robots.txt bodies as from the pre-parsed sidecar
(PHPCrawlerRobotsTxtParser.class.php:29-151)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from lightcrawler_ray.functions.robotstxt import parse_robots_txt, render_robots_txt
from lightcrawler_ray.sources import synth
from lightcrawler_ray.stages.frontier import CrawlSpec


class TestParser:
    def test_sections_and_wildcard(self):
        txt = (
            "User-agent: otherbot\nDisallow: /secret/\n\n"
            "User-agent: *\nDisallow: /private/\nDisallow: tmp/\nCrawl-delay: 1.5\n"
        )
        r = parse_robots_txt(txt, "lightcrawler")
        assert r["disallow"] == ("/private/", "/tmp/")  # leading slash enforced
        assert r["delay_ms"] == 1500.0

    def test_exact_agent_match_case_insensitive(self):
        txt = "User-agent: LightCrawler\nDisallow: /only-ours/\n"
        assert parse_robots_txt(txt, "lightcrawler")["disallow"] == ("/only-ours/",)
        assert parse_robots_txt(txt, "somebody")["disallow"] == ()

    def test_comments_and_empty_disallow(self):
        txt = "User-agent: * # all\nDisallow:   # allow everything\nDisallow: /x\n"
        assert parse_robots_txt(txt)["disallow"] == ("/x",)

    def test_roundtrip(self):
        rules = {"delay_ms": 2000.0, "disallow": ("/a/", "/b")}
        assert parse_robots_txt(render_robots_txt(rules)) == rules


def _with_robots_pages(paths: dict, tmp_path) -> str:
    """Pages table + one /robots.txt row per sidecar host, bodies rendered
    from the sidecar rules."""
    pages = pq.read_table(paths["pages"])
    robots = pq.read_table(paths["robots"])
    extra = {
        "url": [], "host": [], "status": [], "content_type": [], "body": [],
        "location": [], "fail_attempts": [],
    }
    for r in robots.to_pylist():
        extra["url"].append(f"http://{r['host']}/robots.txt")
        extra["host"].append(r["host"])
        extra["status"].append(200)
        extra["content_type"].append("text/plain")
        extra["body"].append(render_robots_txt(
            {"delay_ms": r["delay_ms"], "disallow": tuple(r["disallow"])}
        ).encode())
        extra["location"].append("")
        extra["fail_attempts"].append(0)
    cols = {}
    for name in pages.column_names:
        if name in extra:
            cols[name] = pa.concat_arrays(
                [pages.column(name).combine_chunks().cast(pages.schema.field(name).type),
                 pa.array(extra[name]).cast(pages.schema.field(name).type)]
            )
        else:
            n_extra = len(extra["url"])
            cols[name] = pa.concat_arrays(
                [pages.column(name).combine_chunks(),
                 pa.nulls(n_extra, pages.schema.field(name).type)]
            )
    out = str(tmp_path / "pages_with_robots.parquet")
    pq.write_table(pa.table(cols), out)
    return out


def test_fetched_robots_matches_sidecar_crawl(ray_session, tmp_path):
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    p = synth.GraphParams(n_pages=300, n_hosts=6, n_images=60)
    paths = synth.ensure_fixtures(p)
    seeds = pq.read_table(paths["seeds"])
    pages_plus = _with_robots_pages(paths, tmp_path)

    def run(jd, robots_source, pages_path):
        spec = CrawlSpec(max_depth=2, follow_mode=2, seen_shards=2, fetch_concurrency=1,
                         robots_source=robots_source)
        job = CrawlJob(spec, seeds, pages_path, paths["images"], paths["robots"], jd)
        job.run(max_rounds=8)
        order = job.crawl_order()
        seen = job.seen.members()
        robots = dict(job.robots)
        job.shutdown()
        return order, seen, robots

    o1, s1, r1 = run(str(tmp_path / "ja"), "sidecar", paths["pages"])
    o2, s2, r2 = run(str(tmp_path / "jb"), "fetch", pages_plus)
    # parsed-from-body rules must equal the sidecar's for every seed host
    for h, rules in r2.items():
        assert tuple(rules["disallow"]) == tuple(r1[h]["disallow"]), h
        assert rules["delay_ms"] == r1[h]["delay_ms"], h
    # the robots.txt fetches themselves are out-of-band (the reference
    # fetches them outside the page queue too) → identical crawl
    assert o1 == o2
    assert s1 == s2
