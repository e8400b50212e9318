"""The ``ray job submit`` entrypoint — the north rule's cluster run shape.

On a real cluster the whole engine ships as one driver script:

    ray job submit --working-dir . -- \\
        python -m lightcrawler_ray.job --fixtures /data/fixtures \\
            --job-dir /shared/jobs/run1 --spec spec.json

The driver connects to the submitting cluster (``ray.init(address="auto")``
inside a job; ``RAY_ADDRESS=local`` runs the same script single-node), builds
the ``CrawlJob`` round loop and prints one JSON summary line.  Resume is the
job-dir contract: re-submitting with the SAME ``--job-dir`` re-enters at the
last blessed epoch from the checkpointed seen/cuckoo shards + frontier
(pipelines/crawl.py), so a preempted cluster job is re-run verbatim — the
reference's restart-from-SQLite-cache loop (PHPCrawler.class.php resume path)
re-expressed as idempotent job submission.

Spec JSON: a flat object of ``CrawlSpec`` field overrides (lists become
tuples, nested lists become tuples of tuples).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_spec(path: str | None):
    from .stages.frontier import CrawlSpec

    if not path:
        return CrawlSpec()
    with open(path) as f:
        raw = json.load(f)

    def tupled(v):
        return tuple(tupled(x) for x in v) if isinstance(v, list) else v

    fields = {k: tupled(v) for k, v in raw.items()}
    unknown = set(fields) - set(CrawlSpec.__dataclass_fields__)
    if unknown:
        raise SystemExit(f"unknown CrawlSpec fields in {path}: {sorted(unknown)}")
    return CrawlSpec(**fields)


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(prog="lightcrawler_ray.job", description=__doc__)
    ap.add_argument("--fixtures", required=True,
                    help="dir holding seeds/pages/images/robots parquet "
                         "(sources/synth layout); on a live crawl, pages/"
                         "images are ignored when spec.fetcher='http'")
    ap.add_argument("--job-dir", required=True,
                    help="checkpoint + sink root; reuse to resume")
    ap.add_argument("--spec", default=None, help="CrawlSpec overrides (JSON)")
    ap.add_argument("--max-rounds", type=int, default=50)
    ap.add_argument("--summary-out", default=None,
                    help="also write the summary JSON to this path")
    args = ap.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        # inside `ray job submit` this attaches to the submitting cluster;
        # RAY_ADDRESS=local (the test/sandbox default) runs single-node
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    try:
        import pyarrow.parquet as pq

        from .pipelines.crawl import CrawlJob

        fx = args.fixtures
        spec = _load_spec(args.spec)
        seeds = pq.read_table(os.path.join(fx, "seeds.parquet"))
        job = CrawlJob(
            spec, seeds,
            os.path.join(fx, "pages.parquet"),
            os.path.join(fx, "images.parquet"),
            os.path.join(fx, "robots.parquet"),
            args.job_dir,
        )
        try:
            summary = job.run(max_rounds=args.max_rounds)
        finally:
            job.shutdown()
        line = json.dumps(summary, default=str)
        if args.summary_out:
            with open(args.summary_out, "w") as f:
                f.write(line + "\n")
        print(line)
        return summary
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
