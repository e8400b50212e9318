"""Cuckoo-only seen mode at scale: chained growth past filter-full, FPR
bound, and crawl-membership divergence vs the exact mode (north_rule's
10^10-URL steady state is cuckoo-only; exact mode is the parity harness)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from lightcrawler_ray.state.cuckoo import CuckooChain, item_hashes


class TestCuckooChain:
    def test_grows_past_capacity_without_error(self):
        ch = CuckooChain(capacity=256, bucket_size=2, max_kicks=32)
        keys = item_hashes([f"k{i}" for i in range(20000)])
        ch.add_hashes(keys)
        assert len(ch.filters) > 1, "chain must have grown"
        assert ch.contains_hashes(keys).all(), "no false negatives, ever"

    def test_fpr_stays_bounded_after_growth(self):
        ch = CuckooChain(capacity=512, bucket_size=2, max_kicks=32)
        ch.add_hashes(item_hashes([f"in{i}" for i in range(30000)]))
        probe = item_hashes([f"out{i}" for i in range(30000)])
        fpr = ch.contains_hashes(probe).mean()
        assert fpr < 0.01, fpr  # 16-bit fingerprints: ~1e-4 per link

    def test_snapshot_restore_roundtrip(self):
        ch = CuckooChain(capacity=256, bucket_size=2, max_kicks=32)
        keys = item_hashes([f"s{i}" for i in range(5000)])
        ch.add_hashes(keys)
        ch2 = CuckooChain.restore(ch.snapshot())
        assert len(ch2.filters) == len(ch.filters)
        assert ch2.contains_hashes(keys).all()
        assert ch2.count == ch.count

    def test_restores_legacy_single_filter_snapshot(self):
        from lightcrawler_ray.state.cuckoo import CuckooFilter

        f = CuckooFilter(capacity=1000)
        f.add([f"k{i}" for i in range(100)])
        ch = CuckooChain.restore(f.snapshot())
        assert ch.contains_hashes(item_hashes([f"k{i}" for i in range(100)])).all()


def test_cuckoo_only_crawl_matches_exact(ray_session, tmp_path):
    """Full crawl with seen_mode='cuckoo': fetch counts/order equal the
    exact-mode run at fixture scale (expected FP count ~ n²·2⁻ᶠᵖ ≈ 0), and
    the divergence measure itself is the quantity BASELINE.md reports."""
    from lightcrawler_ray.pipelines.crawl import CrawlJob
    from lightcrawler_ray.sources import synth
    from lightcrawler_ray.stages.frontier import CrawlSpec

    p = synth.GraphParams(n_pages=300, n_hosts=6, n_images=60)
    paths = synth.ensure_fixtures(p)
    seeds = pq.read_table(paths["seeds"])

    def run(jd, mode):
        spec = CrawlSpec(max_depth=2, follow_mode=1, seen_shards=2,
                         fetch_concurrency=1, seen_mode=mode)
        job = CrawlJob(spec, seeds, paths["pages"], paths["images"],
                       paths["robots"], jd)
        s = job.run(max_rounds=8)
        order = job.crawl_order()
        job.shutdown()
        return order, s

    o_exact, s_exact = run(str(tmp_path / "exact"), "exact")
    o_ck, s_ck = run(str(tmp_path / "cuckoo"), "cuckoo")
    # a cuckoo FP can only DROP a URL the exact run fetched, never add one
    assert set(o_ck) <= set(o_exact)
    missing = len(set(o_exact) - set(o_ck))
    assert missing == 0, f"unexpected cuckoo FP divergence at fixture scale: {missing}"
    assert o_ck == o_exact, "order must match when membership matches"
    assert s_ck["fetched"] == s_exact["fetched"]
