"""Skew (north_rule / SURVEY §4): a hot host owning most of the web must not
break parity, politeness, or the partitioned ledger — fetch work partitions
by row ranges (host-agnostic) and the one host-keyed structure, the
politeness ledger, keeps a host on exactly one shard."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from lightcrawler_ray import storage
from lightcrawler_ray.sources import synth
from lightcrawler_ray.stages.frontier import CrawlSpec
from lightcrawler_ray.stages.politeness import HostClock, assert_polite, host_shard


def test_hot_host_crawl_parity_and_politeness(ray_session, tmp_path):
    from lightcrawler_ray.pipelines.crawl import CrawlJob, load_robots
    from lightcrawler_ray.pipelines.simulator import simulate

    # 2 hosts, Zipf shares ∝ 1/(h+1): host 0 owns ~2/3 of all pages
    p = synth.GraphParams(n_pages=400, n_hosts=2, n_images=60, n_seeds=4)
    paths = synth.ensure_fixtures(p)
    seeds = pq.read_table(paths["seeds"])
    hosts = pq.read_table(paths["pages"], columns=["host"]).column("host").to_pylist()
    share = max(hosts.count(h) for h in set(hosts)) / len(hosts)
    assert share > 0.5, f"fixture must be genuinely skewed, hot share={share:.2f}"

    spec = CrawlSpec(max_depth=2, follow_mode=1, seen_shards=2, fetch_concurrency=2,
                     request_delay_ms=25.0, local_round_threshold=0)
    job = CrawlJob(spec, seeds, paths["pages"], paths["images"], paths["robots"],
                   str(tmp_path / "job"))
    job.run(max_rounds=8)
    order = job.crawl_order()
    seen = job.seen.members()

    # (a) parity under skew: byte-for-byte order + membership vs simulator
    golden = simulate(spec, seeds, paths["pages"], paths["images"],
                      load_robots(paths["robots"]))
    assert order == golden.order
    assert seen == sorted(golden.seen)

    # (b) politeness held for the hot host despite its volume
    tables = []
    for d in sorted(os.listdir(job.job_dir)):
        sp = os.path.join(job.job_dir, d, "schedule")
        if d.startswith("epoch=") and os.path.isdir(sp):
            t = storage.load_table(sp)
            if t.num_columns:
                tables.append(t)
    assert_polite(tables, HostClock(spec.request_delay_ms, job.robots))

    # (c) the partitioning assumption: every row of a host carries the same
    # schedule shard — a hot host lives on exactly one ledger partition
    import pyarrow as pa

    sched = pa.concat_tables(tables).to_pandas()
    for h, g in sched.groupby("host"):
        shard = host_shard(h, spec.politeness_shards)
        assert len({host_shard(x, spec.politeness_shards) for x in g["host"]}) == 1
        assert shard == host_shard(h, spec.politeness_shards)
    # and the hot host really is the volume leader in the schedule too
    counts = sched.groupby("host").size()
    assert counts.max() / counts.sum() > 0.5
    job.shutdown()


def test_fetch_work_is_row_partitioned_not_host_partitioned():
    """The fetch batches slice ROW RANGES, so a hot host spreads across the
    whole pool instead of serializing on one worker."""
    from lightcrawler_ray.stages.fetchpool import FetchPool

    # shape-only check on the dispatch plan: batches of a single-block round
    # are contiguous ranges regardless of host values
    tasks = [
        (None, s, min(s + 256, 10_000)) for s in range(0, 10_000, 256)
    ]
    sizes = [e - s for _, s, e in tasks]
    assert len(tasks) == -(-10_000 // 256)
    assert sum(sizes) == 10_000
    assert max(sizes) - min(sizes) <= 256
