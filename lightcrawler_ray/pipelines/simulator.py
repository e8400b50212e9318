"""Reference-semantics simulator — the golden oracle for crawl parity.

A pure-python, single-process replay of the reference engine's control flow
(PHPCrawler.class.php:632-695): ONE priority queue popped
max-priority-first / FIFO-within-level (O1), seen-set marked at enqueue
(T1, INSERT OR IGNORE), per-doc links enqueued immediately in extraction
order, retries consuming politeness slots, request budget aborts (A2).

It deliberately shares the *operator* code with the engine — the
CandidateFilter predicate and the SyntheticFetchExtract row processor — so
any order/membership mismatch against the engine isolates the DISTRIBUTION
(rounds, shuffles, shards), not the operators.  This is the test harness
design of SURVEY.md §5 ("reference-semantics simulator"), not a port of PHP.

Outputs (FIXTURES.md F5): golden_order (url_md5 pop order), golden_seen
(membership set), golden_images (image_id+caption in fetch order),
golden_docs.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import pyarrow as pa

from ..stages.fetch import SyntheticFetchExtract
from ..stages.frontier import CandidateFilter, CrawlSpec


@dataclass
class GoldenRun:
    order: list[str] = field(default_factory=list)          # url_md5 pop order
    order_urls: list[str] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)             # all enqueued url_md5
    images: list[dict] = field(default_factory=list)
    docs: list[dict] = field(default_factory=list)
    attachments: list[dict] = field(default_factory=list)
    fetches: list[dict] = field(default_factory=list)


class _DictRobotsFilter(CandidateFilter):
    """CandidateFilter with robots passed as a plain dict (no ray.get)."""

    def __init__(self, spec: CrawlSpec, robots: dict):
        import re

        self.spec = spec
        self.filter_res = [re.compile(r) for r in spec.url_filter_regexes]
        self.follow_res = [re.compile(r) for r in spec.url_follow_regexes]
        self.prio_res = [(re.compile(r), lvl) for r, lvl in spec.priority_rules]
        self.robots = robots


def simulate(
    spec: CrawlSpec,
    seeds: pa.Table,
    pages_path: str,
    images_path: str,
    robots: dict,
    max_pops: int = 1_000_000,
) -> GoldenRun:
    from dataclasses import replace as _replace

    spec = _replace(spec)  # M9 re-anchoring mutates scope; keep caller's spec
    filt = _DictRobotsFilter(spec, robots if spec.respect_robots else {})
    fetcher = SyntheticFetchExtract(
        pages_path,
        images_path,
        retry_limit=spec.retry_limit,
        content_size_limit=spec.content_size_limit,
        receive_rules=spec.receive_rules,
        min_doc_bytes=spec.min_doc_bytes,
        aggressive_links=spec.aggressive_links,
        synthesize_pagination=spec.synthesize_pagination,
        request_delay_ms=max(spec.request_delay_ms, 0.0),
        routes=spec.routes,
        auth_rules=spec.auth_rules,
        post_rules=spec.post_rules,
    )
    run = GoldenRun()
    heap: list[tuple[int, int, dict]] = []  # (-priority, seq, frontier row)
    next_seq = 0
    content_found = not spec.redirects_till_content  # M9 flag

    def try_enqueue(cand_rows: list[dict]) -> None:
        nonlocal next_seq
        if not cand_rows:
            return
        t = pa.Table.from_pylist(cand_rows)
        passed = filt(t, redirect_only=not content_found)
        for r in passed.to_pylist():
            if r["url_md5"] in run.seen:
                continue
            run.seen.add(r["url_md5"])
            row = dict(r)
            row["enqueue_seq"] = next_seq
            heapq.heappush(heap, (-row["priority"], next_seq, row))
            next_seq += 1

    seed_rows = []
    for i, r in enumerate(seeds.to_pylist()):
        seed_rows.append(
            {
                "url": r["url"], "depth": r["depth"], "priority": r.get("priority", 0),
                "linktext": "", "link_raw": r["url"], "referer": "",
                "is_redirect": False, "parent_seq": -1, "link_idx": i,
            }
        )
    try_enqueue(seed_rows)

    pops = 0
    while heap and pops < max_pops:
        if spec.request_limit and pops >= spec.request_limit:
            break
        _, seq, fr = heapq.heappop(heap)
        pops += 1
        run.order.append(fr["url_md5"])
        run.order_urls.append(fr["url"])
        out_rows = fetcher._process_one(
            {
                "url": fr["url"], "url_md5": fr["url_md5"], "host": fr["host"],
                "depth": fr["depth"], "priority": fr["priority"],
                "enqueue_seq": fr["enqueue_seq"], "referer": fr["referer"],
                "linktext": fr["linktext"],
            }
        )
        link_cands = []
        for r in out_rows:
            if r["kind"] == "fetch":
                run.fetches.append(r)
                # M9: first 200 flips redirect-only off and re-anchors scope
                # BEFORE this page's links are filtered (reference order)
                if not content_found and r["status"] == 200:
                    from ..stages.frontier import anchor_scope

                    content_found = True
                    anchor_scope(spec, r["url"])
            elif r["kind"] == "image":
                run.images.append(r)
            elif r["kind"] == "doc":
                run.docs.append(r)
            elif r["kind"] == "attach":
                run.attachments.append(r)
            elif r["kind"] == "link":
                link_cands.append(
                    {
                        "url": r["url"], "depth": r["depth"], "priority": 0,
                        "linktext": r["linktext"] or "", "link_raw": r["link_raw"],
                        "referer": r["referer"], "is_redirect": r["is_redirect"],
                        "parent_seq": r["parent_seq"], "link_idx": r["link_idx"],
                    }
                )
        try_enqueue(link_cands)
    return run
