"""Per-host politeness ledger (T7 upgraded): spacing invariant + determinism."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from lightcrawler_ray import storage
from lightcrawler_ray.sources import synth
from lightcrawler_ray.stages.frontier import CrawlSpec
from lightcrawler_ray.stages.politeness import HostClock, assert_polite, schedule_table


class TestHostClock:
    def test_spacing_and_independence(self):
        clock = HostClock(default_delay_ms=100.0)
        hosts = ["a", "b", "a", "a", "b"]
        sched = clock.schedule(hosts)
        assert list(sched) == [100.0, 100.0, 200.0, 300.0, 200.0]

    def test_robots_delay_overrides_default(self):
        clock = HostClock(10.0, {"slow": {"delay_ms": 500}})
        sched = clock.schedule(["slow", "fast", "slow"])
        assert list(sched) == [500.0, 10.0, 1000.0]

    def test_carries_across_rounds(self):
        clock = HostClock(100.0)
        clock.schedule(["a"])
        sched = clock.schedule(["a"], round_t0=50.0)  # round starts before a is free
        assert sched[0] == 200.0

    def test_snapshot_restore(self):
        c1 = HostClock(100.0)
        c1.schedule(["a", "a"])
        c2 = HostClock(100.0)
        c2.restore(c1.snapshot())
        assert c2.schedule(["a"])[0] == 300.0


def test_crawl_schedule_is_polite_and_deterministic(ray_session, tmp_path):
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    p = synth.GraphParams(n_pages=300, n_hosts=6, n_images=60)
    paths = synth.ensure_fixtures(p)
    seeds = pq.read_table(paths["seeds"])
    spec = CrawlSpec(max_depth=2, follow_mode=1, seen_shards=2, fetch_concurrency=1,
                     request_delay_ms=50.0, local_round_threshold=0)

    def run(jd):
        job = CrawlJob(spec, seeds, paths["pages"], paths["images"], paths["robots"], jd)
        job.run(max_rounds=10)
        tables = []
        for d in sorted(os.listdir(jd)):
            sp = os.path.join(jd, d, "schedule")
            if d.startswith("epoch=") and os.path.isdir(sp):
                t = storage.load_table(sp)
                if t.num_columns:
                    tables.append(t)
        clock = HostClock(spec.request_delay_ms, job.robots)
        job.shutdown()
        return tables, clock

    t1, clock = run(str(tmp_path / "j1"))
    assert t1, "no schedule sidecars written"
    assert_polite(t1, clock)
    t2, _ = run(str(tmp_path / "j2"))
    import pyarrow as pa

    a = pa.concat_tables(t1).to_pandas().sort_values("enqueue_seq").reset_index(drop=True)
    b = pa.concat_tables(t2).to_pandas().sort_values("enqueue_seq").reset_index(drop=True)
    assert a.equals(b), "politeness schedule must be deterministic"
