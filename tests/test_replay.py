"""Lineage replay parity: with priority rules the engine's physical BFS order
differs from the reference queue, but the replay over checkpointed lineage
must reproduce the simulator's order exactly."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from lightcrawler_ray.pipelines import replay, simulator
from lightcrawler_ray.sources import synth
from lightcrawler_ray.stages.frontier import CrawlSpec


@pytest.fixture(scope="module")
def fixture_paths():
    p = synth.GraphParams(n_pages=300, n_hosts=6, n_images=120, out_degree=6)
    return p, synth.ensure_fixtures(p)


def _run(spec, paths, job_dir):
    from lightcrawler_ray.pipelines.crawl import CrawlJob, load_robots

    seeds = pq.read_table(paths["seeds"])
    job = CrawlJob(spec, seeds, paths["pages"], paths["images"], paths["robots"], job_dir)
    job.run(max_rounds=10)
    robots = load_robots(paths["robots"])
    golden = simulator.simulate(spec, seeds, paths["pages"], paths["images"], robots)
    rep = replay.replay_order(job_dir, spec, robots)
    job.shutdown()
    return job, golden, rep


def test_replay_matches_simulator_with_priorities(ray_session, fixture_paths, tmp_path):
    p, paths = fixture_paths
    spec = CrawlSpec(
        max_depth=2, follow_mode=1, seen_shards=2, fetch_concurrency=1,
        local_round_threshold=0,
        priority_rules=(("/p/1\\d\\.html", 5), ("/p/2\\d\\.html", 2)),
    )
    job, golden, rep = _run(spec, paths, str(tmp_path / "prio"))
    # physical epoch order ≠ reference order here (preemption), but:
    assert rep.order == golden.order
    assert rep.seen == golden.seen
    assert rep.missing == []


def test_replay_matches_simulator_uniform(ray_session, fixture_paths, tmp_path):
    p, paths = fixture_paths
    spec = CrawlSpec(max_depth=2, follow_mode=1, seen_shards=2, fetch_concurrency=1,
                     local_round_threshold=0)
    job, golden, rep = _run(spec, paths, str(tmp_path / "uni"))
    assert rep.order == golden.order == job.crawl_order()
    assert rep.missing == []
