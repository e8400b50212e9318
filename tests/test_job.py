"""The `ray job submit` driver contract (lightcrawler_ray/job.py): one
module-level entrypoint builds/runs the crawl, prints a JSON summary, and
resubmitting with the same --job-dir resumes from checkpoint."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from lightcrawler_ray import job as jobmod
from lightcrawler_ray.pipelines import simulator
from lightcrawler_ray.sources import synth
from lightcrawler_ray.stages.frontier import CrawlSpec


@pytest.fixture(scope="module")
def fixture_dir():
    p = synth.GraphParams(n_pages=300, n_hosts=6, n_images=120, out_degree=6)
    paths = synth.ensure_fixtures(p)
    return os.path.dirname(paths["seeds"]), paths


SPEC_JSON = {
    "max_depth": 2, "follow_mode": 1, "seen_shards": 2,
    "fetch_concurrency": 1, "fetch_batch_size": 64,
    "local_round_threshold": 0,
}


def _golden(paths):
    from lightcrawler_ray.pipelines.crawl import load_robots

    spec = CrawlSpec(**SPEC_JSON)
    seeds = pq.read_table(paths["seeds"])
    return simulator.simulate(spec, seeds, paths["pages"], paths["images"],
                              load_robots(paths["robots"]))


def _order_from(job_dir: str) -> list[str]:
    """The claimed fetch order read back from the job dir (what a post-hoc
    auditor of a cluster run would do — no live job handle needed)."""
    from lightcrawler_ray import storage

    out: list[str] = []
    for d in sorted(os.listdir(job_dir)):
        p = os.path.join(job_dir, d, "frontier")
        if d.startswith("epoch=") and os.path.isdir(p):
            t = storage.load_table(p)
            if t.num_columns and t.num_rows:
                df = t.to_pandas().sort_values(
                    ["priority", "enqueue_seq"], ascending=[False, True], kind="stable"
                )
                out.extend(df["url_md5"].tolist())
    return out


def test_job_run_and_resume(ray_session, fixture_dir, tmp_path, capsys):
    fx, paths = fixture_dir
    spec_path = str(tmp_path / "spec.json")
    with open(spec_path, "w") as f:
        json.dump(SPEC_JSON, f)
    job_dir = str(tmp_path / "jobrun")

    # leg 1: "preempted" after one round
    jobmod.main(["--fixtures", fx, "--job-dir", job_dir,
                 "--spec", spec_path, "--max-rounds", "1"])

    # leg 2: resubmit verbatim — resumes from the checkpoint and converges
    out_path = str(tmp_path / "summary.json")
    summary = jobmod.main(["--fixtures", fx, "--job-dir", job_dir,
                           "--spec", spec_path, "--max-rounds", "10",
                           "--summary-out", out_path])

    golden = _golden(paths)
    assert _order_from(job_dir) == golden.order
    assert summary["epochs"] >= 2 and summary["documents_received"] > 0
    # the printed line IS the summary (driver contract: last stdout line)
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(printed) == json.loads(json.dumps(summary, default=str))
    with open(out_path) as f:
        assert json.loads(f.read()) == json.loads(printed)


def test_job_rejects_unknown_spec_field(tmp_path):
    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as f:
        json.dump({"not_a_field": 1}, f)
    with pytest.raises(SystemExit):
        jobmod._load_spec(bad)


def test_spec_json_tuples_roundtrip(tmp_path):
    p = str(tmp_path / "s.json")
    with open(p, "w") as f:
        json.dump({"routes": [["detail\\.html$", "detail"]],
                   "priority_rules": [["index", 2]]}, f)
    spec = jobmod._load_spec(p)
    assert spec.routes == (("detail\\.html$", "detail"),)
    assert spec.priority_rules == (("index", 2),)
