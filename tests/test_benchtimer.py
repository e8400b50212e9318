"""A4 — named accumulating timers (PHPCrawlerBenchmark semantics)."""

import time

from lightcrawler_ray.functions.benchtimer import Benchmark


def test_accumulates_across_cycles():
    b = Benchmark()
    for _ in range(3):
        b.start("x")
        time.sleep(0.01)
        assert b.stop("x") >= 0.01
    assert b.elapsed("x") >= 0.03
    assert b.call_count("x") == 3


def test_stop_without_start_returns_none():
    b = Benchmark()
    assert b.stop("never") is None
    assert b.elapsed("never") == 0.0


def test_temporary_excluded_from_summary():
    b = Benchmark()
    b.start("keep"); b.stop("keep")
    b.start("tmp", temporary=True); b.stop("tmp")
    assert "tmp" not in b.all() and "keep" in b.all()
    assert "keep" in b.report() and "sec" in b.report()


def test_reset_and_reset_all_retain():
    b = Benchmark()
    for n in ("a", "b", "c"):
        b.start(n); b.stop(n)
    b.reset("a")
    assert b.elapsed("a") == 0.0 and b.elapsed("b") > 0
    b.reset_all(retain=("c",))
    assert b.elapsed("b") == 0.0 and b.elapsed("c") > 0


def test_crawljob_exposes_phase_benchmarks(ray_session, tmp_path):
    """The crawl driver accumulates its phase marks into a Benchmark, so a
    whole-job decomposition is queryable without parsing profile output."""
    import pyarrow.parquet as pq

    from lightcrawler_ray.pipelines.crawl import CrawlJob
    from lightcrawler_ray.sources import synth
    from lightcrawler_ray.stages.frontier import CrawlSpec

    p = synth.GraphParams(n_pages=300, n_hosts=6, n_images=120, out_degree=6)
    paths = synth.ensure_fixtures(p)
    spec = CrawlSpec(max_depth=2, follow_mode=1, seen_shards=2,
                     fetch_concurrency=1, fetch_batch_size=64,
                     local_round_threshold=0)
    job = CrawlJob(spec, pq.read_table(paths["seeds"]), paths["pages"],
                   paths["images"], paths["robots"], str(tmp_path / "bm"))
    job.run(max_rounds=10)
    try:
        bm = job.benchmarks()
        assert bm.get("fetch+split", 0) > 0, bm
        assert bm.get("sinks", 0) > 0, bm
        # every distributed phase mark accumulated at least one cycle
        assert job.bench.call_count("fetch+split") >= 2
    finally:
        job.shutdown()
