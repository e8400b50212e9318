"""End-to-end crawl parity: Ray engine vs reference-semantics simulator.

north_rule checks: (a) crawl ordering, (b) URL-seen membership equality,
(c) per-row image invariant (decoded-pixel allclose / PSNR≥40 + caption
equality), plus resume-from-checkpoint equivalence."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lightcrawler_ray.functions import imagecodec
from lightcrawler_ray.pipelines import simulator
from lightcrawler_ray.sources import synth
from lightcrawler_ray.stages.frontier import CrawlSpec


@pytest.fixture(scope="module")
def fixture_paths():
    p = synth.GraphParams(n_pages=300, n_hosts=6, n_images=120, out_degree=6)
    return p, synth.ensure_fixtures(p)


def make_spec(**kw) -> CrawlSpec:
    # local_round_threshold=0 forces every round through the distributed path
    # so parity tests cover the cluster code; the mixed-path test below uses
    # the default adaptive threshold
    base = dict(max_depth=2, follow_mode=1, seen_shards=2, fetch_concurrency=1,
                fetch_batch_size=64, local_round_threshold=0)
    base.update(kw)
    return CrawlSpec(**base)


@pytest.fixture(scope="module")
def golden(fixture_paths):
    from lightcrawler_ray.pipelines.crawl import load_robots

    p, paths = fixture_paths
    spec = make_spec()
    seeds = pq.read_table(paths["seeds"])
    robots = load_robots(paths["robots"])
    return simulator.simulate(spec, seeds, paths["pages"], paths["images"], robots)


@pytest.fixture(scope="module")
def engine_run(ray_session, fixture_paths, tmp_path_factory):
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    p, paths = fixture_paths
    job_dir = str(tmp_path_factory.mktemp("crawljob"))
    spec = make_spec()
    seeds = pq.read_table(paths["seeds"])
    job = CrawlJob(spec, seeds, paths["pages"], paths["images"], paths["robots"], job_dir)
    summary = job.run(max_rounds=10)
    yield job, summary
    job.shutdown()


def test_seen_membership_parity(engine_run, golden):
    job, _ = engine_run
    assert set(job.seen.members()) == golden.seen


def test_crawl_order_parity(engine_run, golden):
    job, _ = engine_run
    assert job.crawl_order() == golden.order


def test_fetch_metrics_sane(engine_run, golden):
    _, summary = engine_run
    assert summary["links_followed"] == len(golden.order)
    assert summary["errors"] > 0  # the 404/500 rows were exercised
    assert summary["retries"] > 0  # flaky rows retried
    assert summary["documents_received"] > 0


def test_image_invariant(engine_run, golden, fixture_paths):
    """north_rule (c): every engine image row decodes allclose to the fixture
    pixels (PSNR≥40 for lossy) and captions match the golden run."""
    import os

    from lightcrawler_ray import storage

    p, paths = fixture_paths
    job, _ = engine_run
    ref = pq.read_table(paths["images"])
    ref_bytes = dict(zip(ref.column("image_id").to_pylist(), ref.column("bytes").to_pylist()))
    golden_caps = {r["image_id"]: r["caption"] for r in golden.images}
    golden_ids = set(golden_caps)

    engine_rows = []
    for d in sorted(os.listdir(job.job_dir)):
        img_dir = os.path.join(job.job_dir, d, "images")
        if d.startswith("epoch=") and os.path.isdir(img_dir):
            t = storage.load_table(img_dir)
            engine_rows.extend(t.to_pylist())
    assert engine_rows, "no image rows written"
    seen_ids = set()
    for r in engine_rows:
        seen_ids.add(r["image_id"])
        px_engine = imagecodec.decode(r["bytes"])
        px_ref = imagecodec.decode(ref_bytes[r["image_id"]])
        if r["fmt"] in ("png", "bmp"):
            assert np.array_equal(px_engine, px_ref)
        else:
            assert imagecodec.psnr(px_engine, px_ref) >= 40.0
        assert r["caption"] == golden_caps[r["image_id"]]
    # engine image set ⊆ golden (exact-dup rows collapse in the engine sink)
    assert seen_ids <= golden_ids
    golden_unique_blobs = {ref_bytes[i] for i in golden_ids}
    assert len(seen_ids) == len(golden_unique_blobs)


def test_docs_extracted_with_metadata(engine_run):
    import os

    from lightcrawler_ray import storage

    job, _ = engine_run
    rows = []
    for d in sorted(os.listdir(job.job_dir)):
        doc_dir = os.path.join(job.job_dir, d, "docs")
        if d.startswith("epoch=") and os.path.isdir(doc_dir):
            rows.extend(storage.load_table(doc_dir).to_pylist())
    assert rows
    with_no = [r for r in rows if r["doc_ori_no"]]
    assert with_no, "detail pages should yield doc_ori_no"
    assert all(r["doc_id"] for r in rows)
    dated = [r for r in rows if r["publish_time"] > 0]
    assert dated
    negged = [r for r in rows if r["negs"]]
    assert negged and "中华人民共和国网络安全法" in negged[0]["negs"]


def test_resume_from_checkpoint(ray_session, fixture_paths, golden, tmp_path):
    """Kill after round 0, resume in a fresh job → same final state."""
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    p, paths = fixture_paths
    job_dir = str(tmp_path / "resumable")
    spec = make_spec()
    seeds = pq.read_table(paths["seeds"])
    j1 = CrawlJob(spec, seeds, paths["pages"], paths["images"], paths["robots"], job_dir)
    j1._round(j1._seed_table(), 0, j1.seeds.num_rows)  # only round 0, then "crash"
    j1.shutdown()

    j2 = CrawlJob(make_spec(), seeds, paths["pages"], paths["images"], paths["robots"], job_dir)
    j2.run(max_rounds=10)
    try:
        assert set(j2.seen.members()) == golden.seen
        assert j2.crawl_order() == golden.order
    finally:
        j2.shutdown()


def test_mixed_path_parity(ray_session, fixture_paths, golden, tmp_path):
    """The adaptive local/distributed dispatch must be semantically invisible:
    default threshold (small rounds on the driver) reproduces the same order
    and membership as the all-distributed run."""
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    p, paths = fixture_paths
    spec = make_spec(local_round_threshold=40)  # rounds straddle the threshold
    seeds = pq.read_table(paths["seeds"])
    job = CrawlJob(spec, seeds, paths["pages"], paths["images"], paths["robots"],
                   str(tmp_path / "mixed"))
    job.run(max_rounds=10)
    try:
        assert set(job.seen.members()) == golden.seen
        assert job.crawl_order() == golden.order
    finally:
        job.shutdown()


def test_resume_from_sparse_snapshot(ray_session, fixture_paths, golden, tmp_path):
    """snapshot_every>1: crash past the last snapshot → resume re-enters at
    the snapshotted epoch, deterministically re-crawls, same final state."""
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    p, paths = fixture_paths
    spec = make_spec(snapshot_every=2)
    seeds = pq.read_table(paths["seeds"])
    job_dir = str(tmp_path / "sparse")
    j1 = CrawlJob(spec, seeds, paths["pages"], paths["images"], paths["robots"], job_dir)
    cand, hint = j1._seed_table(), j1.seeds.num_rows
    for e in range(2):  # crash after epoch 1 (snapshot only at epoch 0)
        n, cand, hint = j1._round(cand, e, hint)
    j1._drain_pending()
    j1.shutdown()

    j2 = CrawlJob(make_spec(snapshot_every=2), seeds, paths["pages"], paths["images"],
                  paths["robots"], job_dir)
    j2.run(max_rounds=10)
    try:
        assert set(j2.seen.members()) == golden.seen
        assert j2.crawl_order() == golden.order
    finally:
        j2.shutdown()


def test_resume_mid_epoch_kill(ray_session, fixture_paths, golden, tmp_path):
    """Kill MID-epoch (between the split-sink writes and the drain): the
    next epoch dir holds stale un-blessed parts but no _EPOCH_DONE.  Resume
    must discard the stale parts (a shorter deterministic re-run must not
    bless leftovers from the longer interrupted one) and converge to the
    golden state."""
    import json

    from lightcrawler_ray.pipelines.crawl import CrawlJob

    p, paths = fixture_paths
    seeds = pq.read_table(paths["seeds"])
    job_dir = str(tmp_path / "midkill")
    j1 = CrawlJob(make_spec(), seeds, paths["pages"], paths["images"], paths["robots"], job_dir)
    cand, hint = j1._seed_table(), j1.seeds.num_rows
    for e in range(2):
        n, cand, hint = j1._round(cand, e, hint)
    j1._drain_pending()
    j1.shutdown()
    # fake a crash mid-epoch-2: partial links/docs parts on disk, no
    # _EPOCH_DONE, no seen.npz
    ed = os.path.join(job_dir, "epoch=0002")
    os.makedirs(os.path.join(ed, "links"))
    os.makedirs(os.path.join(ed, "docs"))
    stale = pa.table({"stale": pa.array([1, 2, 3], pa.int64())})
    pq.write_table(stale, os.path.join(ed, "links", "part-00007.parquet"))
    pq.write_table(stale, os.path.join(ed, "docs", "part-00007.parquet"))

    j2 = CrawlJob(make_spec(), seeds, paths["pages"], paths["images"],
                  paths["robots"], job_dir)
    j2.run(max_rounds=10)
    try:
        assert set(j2.seen.members()) == golden.seen
        assert j2.crawl_order() == golden.order
        # the stale parts were discarded, and epoch 2 was re-run cleanly
        assert not os.path.exists(os.path.join(ed, "links", "part-00007.parquet")) or \
            json.load(open(os.path.join(ed, "_EPOCH_DONE"))), "epoch 2 re-blessed"
        docs_dir = os.path.join(ed, "docs")
        if os.path.isdir(docs_dir):
            for f in os.listdir(docs_dir):
                if f.endswith(".parquet"):
                    assert "stale" not in pq.read_schema(os.path.join(docs_dir, f)).names
    finally:
        j2.shutdown()


@pytest.mark.parametrize("victim", ["fetch", "seen", "content", "sched"])
def test_resume_after_actor_death(ray_session, fixture_paths, golden, tmp_path, victim):
    """A job-lifetime ACTOR dying mid-crawl (node loss at cluster scale) —
    fetch worker, URL-seen shard, content-seen shard, or politeness shard —
    fails the in-flight round; a supervisor-style restart on the same job
    dir resumes from the last blessed epoch and converges to the golden
    state.  This drives the real failure path — ray.kill on a live actor,
    error propagation through the dispatch/split/gate chains — not just a
    synthesized crash dir."""
    import ray

    from lightcrawler_ray.pipelines.crawl import CrawlJob

    p, paths = fixture_paths
    seeds = pq.read_table(paths["seeds"])
    job_dir = str(tmp_path / f"actorkill_{victim}")
    j1 = CrawlJob(make_spec(), seeds, paths["pages"], paths["images"], paths["robots"], job_dir)
    cand, hint = j1._seed_table(), j1.seeds.num_rows
    for e in range(2):
        n, cand, hint = j1._round(cand, e, hint)
    j1._drain_pending()
    ray.kill(
        {
            "fetch": lambda: j1.fetch_pool.workers[0],
            "seen": lambda: j1.seen.shards[0],
            "content": lambda: j1.content_seen.shards[0],
            "sched": lambda: j1.sched.shards[0],
        }[victim]()
    )
    with pytest.raises(Exception):
        n, cand, hint = j1._round(cand, 2, hint)
        j1._drain_pending()
        j1._round(cand, 3, hint)  # belt-and-braces: error must surface by here
    # crashed-driver teardown: kill job actors without draining errored refs
    for comp in (j1.seen, j1.content_seen, j1.fetch_pool, j1.sched, j1.docsim):
        try:
            comp.shutdown()
        except Exception:
            pass

    j2 = CrawlJob(make_spec(), seeds, paths["pages"], paths["images"],
                  paths["robots"], job_dir)
    j2.run(max_rounds=10)
    try:
        assert set(j2.seen.members()) == golden.seen
        assert j2.crawl_order() == golden.order
    finally:
        j2.shutdown()


def test_traffic_limit_aborts(ray_session, fixture_paths, tmp_path):
    """A2 — cumulative-bytes abort stops the crawl early (round granular)."""
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    p, paths = fixture_paths
    spec = make_spec(traffic_limit_bytes=10_000)
    seeds = pq.read_table(paths["seeds"])
    job = CrawlJob(spec, seeds, paths["pages"], paths["images"], paths["robots"],
                   str(tmp_path / "traffic"))
    s = job.run(max_rounds=10)
    try:
        assert job.bytes_total >= 10_000  # crossed the limit...
        assert s["links_followed"] < 59   # ...and stopped before the full crawl
    finally:
        job.shutdown()


def test_request_limit_budget(ray_session, fixture_paths, golden, tmp_path):
    """A2/O3 — request budget caps fetches at exactly N, in pop order (the
    first N of the reference order)."""
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    p, paths = fixture_paths
    spec = make_spec(request_limit=10)
    seeds = pq.read_table(paths["seeds"])
    job = CrawlJob(spec, seeds, paths["pages"], paths["images"], paths["robots"],
                   str(tmp_path / "budget"))
    s = job.run(max_rounds=10)
    try:
        assert s["links_followed"] == 10
        assert job.crawl_order() == golden.order[:10]
    finally:
        job.shutdown()


def test_robots_disallow_respected(engine_run, golden):
    """host 0 disallows /private/ — nothing under it may be fetched."""
    job, _ = engine_run
    assert not any("/private/" in u for u in golden.order_urls)


def test_tail_collapse_parity(ray_session, fixture_paths, golden, tmp_path):
    """A distributed round whose seen gate leaves <= threshold winners must
    collapse to the local tail (skipping the rank/split/finalize machinery)
    WITHOUT changing order, membership, or sink contents — and the collapse
    must actually fire on this fixture (the BFS tail rounds have large raw
    link counts but tiny unseen remainders)."""
    from lightcrawler_ray.pipelines.crawl import CrawlJob

    p, paths = fixture_paths
    # threshold below the biggest round but above the gated tail rounds; the
    # raw-link hint routes mid-crawl rounds distributed, the gate then leaves
    # a driver-sized remainder
    spec = make_spec(local_round_threshold=60)
    seeds = pq.read_table(paths["seeds"])
    job = CrawlJob(spec, seeds, paths["pages"], paths["images"], paths["robots"],
                   str(tmp_path / "collapse"))
    job.run(max_rounds=10)
    try:
        assert job.tail_collapses > 0, "fixture never exercised the collapse path"
        assert set(job.seen.members()) == golden.seen
        assert job.crawl_order() == golden.order
    finally:
        job.shutdown()
