"""Lineage replay — derive the reference's exact total crawl order from a
finished job's checkpoints (SURVEY.md §7 hard part (a)).

The engine fetches in BFS epochs for efficiency; the reference pops ONE queue
max-priority-first/FIFO, so with priority rules a high-priority deep URL
preempts shallow ones and the physical orders differ.  The ORDER is still a
deterministic function of (seed list, per-document link lists, filter rules)
— all of which the engine checkpoints (frontier + links lineage per epoch).
This replay re-runs the queue discipline over that lineage WITHOUT refetching
anything: per popped URL it looks up the recorded out-links (in link_idx
order), applies the same CandidateFilter, dedups at enqueue, and pops
(priority desc, seq asc).

Consumes only the small lineage columns; at 10^10-URL scale the replay is a
single sequential pass bounded by the frontier metadata (no payloads).

Divergence detection: if the replay pops a URL whose lineage is absent (the
reference would have fetched it at a depth the BFS engine filtered out), it
is reported in ``missing`` rather than silently skipped.
"""

from __future__ import annotations

import heapq
import os
from dataclasses import dataclass, field

import pyarrow as pa

from ..stages.frontier import CrawlSpec
from .. import storage
from .simulator import _DictRobotsFilter


@dataclass
class ReplayResult:
    order: list[str] = field(default_factory=list)   # url_md5 pop order
    seen: set[str] = field(default_factory=set)
    missing: list[str] = field(default_factory=list)  # popped but no lineage


def load_lineage(job_dir: str) -> tuple[dict[str, int], dict[int, list[dict]], list[dict]]:
    """(url_md5 → engine seq, engine parent seq → ordered link rows,
    epoch-0 frontier rows in seq order)."""
    md5_to_seq: dict[str, int] = {}
    links_by_parent: dict[int, list[dict]] = {}
    seeds: list[dict] = []
    for d in sorted(os.listdir(job_dir)):
        p = os.path.join(job_dir, d)
        if not d.startswith("epoch="):
            continue
        fdir = os.path.join(p, "frontier")
        if os.path.isdir(fdir):
            t = storage.load_table(fdir)
            if t.num_columns:
                for r in t.select(
                    ["url", "url_md5", "host", "depth", "priority", "enqueue_seq",
                     "referer", "linktext", "link_raw", "is_redirect",
                     "parent_seq", "link_idx"]
                ).to_pylist():
                    md5_to_seq[r["url_md5"]] = r["enqueue_seq"]
                    if d == "epoch=0000":
                        seeds.append(r)
        ldir = os.path.join(p, "links")
        if os.path.isdir(ldir):
            t = storage.load_table(ldir)
            if t.num_columns:
                for r in t.to_pylist():
                    links_by_parent.setdefault(r["parent_seq"], []).append(r)
    for rows in links_by_parent.values():
        rows.sort(key=lambda r: r["link_idx"])
    seeds.sort(key=lambda r: r["enqueue_seq"])
    return md5_to_seq, links_by_parent, seeds


def replay_order(job_dir: str, spec: CrawlSpec, robots: dict) -> ReplayResult:
    filt = _DictRobotsFilter(spec, robots if spec.respect_robots else {})
    md5_to_seq, links_by_parent, seeds = load_lineage(job_dir)
    res = ReplayResult()
    heap: list[tuple[int, int, str, int]] = []  # (-prio, replay_seq, md5, depth)
    next_seq = 0

    def enqueue(cands: list[dict]) -> None:
        nonlocal next_seq
        if not cands:
            return
        passed = filt(pa.Table.from_pylist(cands))
        for r in passed.to_pylist():
            if r["url_md5"] in res.seen:
                continue
            res.seen.add(r["url_md5"])
            heapq.heappush(heap, (-r["priority"], next_seq, r["url_md5"], r["depth"]))
            next_seq += 1

    enqueue(
        [
            {
                "url": r["url"], "depth": r["depth"], "priority": r["priority"],
                "linktext": r["linktext"] or "", "link_raw": r["link_raw"],
                "referer": r["referer"], "is_redirect": r["is_redirect"],
                "parent_seq": -1, "link_idx": i,
            }
            for i, r in enumerate(seeds)
        ]
    )
    while heap:
        if spec.request_limit and len(res.order) >= spec.request_limit:
            break
        _, _, md5, depth = heapq.heappop(heap)
        res.order.append(md5)
        eng_seq = md5_to_seq.get(md5)
        if eng_seq is None:
            res.missing.append(md5)
            continue
        children = links_by_parent.get(eng_seq, [])
        enqueue(
            [
                {
                    "url": c["url"],
                    # reference semantics: child depth follows the POPPING
                    # parent; redirects keep depth (M9)
                    "depth": depth if c["is_redirect"] else depth + 1,
                    "priority": 0, "linktext": c["linktext"] or "",
                    "link_raw": c["link_raw"], "referer": c["referer"],
                    "is_redirect": c["is_redirect"],
                    "parent_seq": eng_seq, "link_idx": c["link_idx"],
                }
                for c in children
            ]
        )
    return res
