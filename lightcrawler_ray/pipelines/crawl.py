"""The crawl round driver — iterative BFS over Dataset rounds with
per-epoch checkpointing (SURVEY.md §3 "Ray-Data restatement").

Each round (epoch):

  link block refs ─ _filter_extract tasks        canonicalize+filter (M1-M3, M8, O2,
                    (fused filter + key split)     T5) + per-seen-shard key parts
                  ─ seen-shard gate_parts        within-round dedup D1 + cross-round
                    (one fused call per shard)     gate T1, deterministic min-rank
                                                   winners; only COUNTS hit the driver
                  ─ _rank_sched_write_block      enqueue_seq = FIFO pop order (O1) —
                    (no sort: blocks arrive        link blocks are emitted in rank
                    in rank order by                order, so ranking is offset
                    construction)                  arithmetic; budget cap A2 likewise
                  ─ politeness shard pool        per-host crawl-delay schedule (T7),
                    (hash(host) partitions)        ledger walk off the driver
                  ─ persistent fetch pool        fused fetch+extract — bodies never
                    (plasma-shared page store)     leave the worker
                  ─ _split_sink tasks            links checkpoint + forward refs;
                                                   per-shard content-key parts
                  ─ content-shard gate_parts +   content dedup D2/D3/D4 + J3 sim
                    sim band shards + deferred     gate — sharded like the URL-seen
                    finalize writes                set; keep-rows travel by ref and
                                                   writes overlap the next round

Adaptive execution: a BFS crawl has a characteristic frontier profile — a few
huge middle rounds flanked by tiny head/tail rounds (seed fan-out, redirect
chains).  Distributed Dataset rounds carry a fixed scheduling cost
(executions, shuffles, actor-pool spin-up), so rounds below
``spec.local_round_threshold`` candidates run on the driver through the SAME
operator code (CandidateFilter / fetcher / seen shards / dedup rules) with
plain Arrow — identical semantics (the parity suite covers both paths), none
of the fixed cost.  At 10^10-URL scale the big rounds are the only ones that
matter; the threshold just stops the tail from paying cluster prices.

Checkpoint per epoch: frontier, links lineage, images, docs, metrics, seen
snapshot, then an atomic done-marker — resume restores the seen shards and
re-enters at the first incomplete epoch (T10 / north_rule).  All per-epoch
outputs are partitioned directories so a 256-node run can skip finished work.

Skew (SURVEY.md §4 / north_rule): hot hosts cannot unbalance this plan —
fetch work is partitioned by ROW RANGES (round-robin over the pool,
host-agnostic), the seen shards key on url_md5 (uniform by construction), the
rank sort keys on sequence numbers (uniform), and per-host rate is bounded by
the politeness ledger regardless of partition shape.  The one host-keyed
structure, the ledger, is O(#hosts) state, not O(rows).  The Zipf-skewed
fixture (host 0 owns ~1/H_n of pages) runs through the same parity suite.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions import hashing
from ..functions.benchtimer import Benchmark
from ..stages.fetch import OUT_SCHEMA, SyntheticFetchExtract, load_fixture_tables
from ..stages.frontier import CandidateFilter, CrawlSpec, _empty_candidates
from ..stages.politeness import HostClock, SchedulePool, split_sched_parts
from ..state.seenset import SeenSet
from .. import storage

_LINK_COLS = ["url", "link_raw", "linktext", "referer", "depth", "is_redirect",
              "parent_seq", "link_idx"]
_IMG_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
             "src_url", "referer", "enqueue_seq", "url_md5"]
_DOC_COLS = ["doc_id", "url", "doc_ori_no", "title", "author", "tags",
             "publish_time", "t_valid", "content", "negs", "simhash",
             "doc_lang", "doc_quality", "doc_tokens", "attachments",
             "enqueue_seq", "url_md5"]
_ATT_COLS = ["url", "url_md5", "referer", "att_ext", "att_type", "doc_id",
             "enqueue_seq", "received_to_file", "tmp_path"]


def load_robots(robots_path: str) -> dict[str, dict]:
    import pyarrow.parquet as pq

    t = pq.read_table(robots_path)
    return {
        h: {"delay_ms": d, "disallow": tuple(dis)}
        for h, d, dis in zip(
            t.column("host").to_pylist(),
            t.column("delay_ms").to_pylist(),
            t.column("disallow").to_pylist(),
        )
    }


class CrawlJob:
    def __init__(
        self,
        spec: CrawlSpec,
        seeds: pa.Table,
        pages_path: str,
        images_path: str,
        robots_path: str,
        job_dir: str,
    ):
        self.spec = spec
        self.seeds = seeds
        self.job_dir = job_dir
        # A4: named accumulating phase timers (PHPCrawlerBenchmark.class.php
        # :16-145 semantics) — every distributed-round phase mark adds its
        # inter-mark delta here, so benchmarks() yields the whole-job phase
        # decomposition without parsing LCRAY_PROFILE output
        self.bench = Benchmark()
        os.makedirs(job_dir, exist_ok=True)
        self.seen = SeenSet(spec.seen_shards, spec.seen_capacity, spec.seen_mode)
        self.content_seen = SeenSet(spec.seen_shards, spec.seen_capacity, "exact")
        self.next_seq = 0
        self.fetched = 0
        self.bytes_total = 0
        self._pending: dict | None = None
        # next-round filter tasks submitted against the in-flight round's
        # link refs (pure tasks — safe to speculate; the stateful gate is not)
        self._prefilter: dict | None = None
        self.tail_collapses = 0  # dist rounds that gated down to the local tail
        # M9: until the first 200-content fetch, candidate filtering keeps
        # only redirect links (mode off => treat content as already found)
        self._content_found = not spec.redirects_till_content
        # enqueue_seq of the first 200-content fetch: candidates with
        # parent_seq below it are filtered redirect-only (per-PAGE M9
        # granularity, matching the reference's per-processed-page flip)
        self._content_seq = -1 if self._content_found else (1 << 62)
        self._anchor_url = ""
        self._derive_seed_scope()
        # fixture stores: loaded once, broadcast once (the production analog
        # is the HTTP client config — per-actor state would be conn pools)
        pages, images = load_fixture_tables(pages_path, images_path)
        self.pages_ref = ray.put(pages)
        self.images_ref = ray.put(images)
        from ..stages.fetch import make_fetcher

        self._local_fetcher = make_fetcher(
            self.pages_ref, self.images_ref, self._fetch_kwargs()
        )
        # robots rules (T5/T7): pre-parsed sidecar, or fetched+parsed
        # robots.txt bodies through the same fetch primitive (S4)
        if not spec.respect_robots:
            self.robots = {}
        elif spec.robots_source == "fetch":
            self.robots = self._fetch_robots()
        elif spec.robots_source == "lazy":
            self.robots = {}  # discovered per host inside the politeness shards
        else:
            self.robots = load_robots(robots_path)
        self.robots_ref = ray.put(self.robots)
        self._local_filter = CandidateFilter(spec, self.robots_ref)
        # per-host politeness ledger (T7 upgraded: per-host, not global),
        # hash(host)-partitioned over a shard pool so no round's (host, seq)
        # rows ever gather on the driver; the driver-side HostClock is kept
        # for delay audits only (assert_polite), not ledger state
        self.host_clock = HostClock(spec.request_delay_ms, self.robots)
        lazy = spec.respect_robots and spec.robots_source == "lazy"
        self.sched = SchedulePool(
            spec.politeness_shards, spec.request_delay_ms, self.robots,
            fetch_ctx=(self.pages_ref, self.images_ref, self._fetch_kwargs()) if lazy else None,
            robots_ttl_s=spec.robots_ttl_s,
        )
        self._lazy_robots_handles = tuple(self.sched.shards) if lazy else ()
        if lazy:
            self._local_filter.robots_lookup = self.sched.robots_for
        from ..state.simindex import SimIndex

        self.docsim = SimIndex()
        from ..stages.fetchpool import FetchPool

        self.fetch_pool = FetchPool(
            spec.fetch_concurrency, self.pages_ref, self.images_ref, self._fetch_kwargs()
        )
        # pre-spawn the task workers the round tasks will run on, so the
        # first distributed round doesn't pay worker startup latency; ditto
        # the state shard actors (seen/content/schedule/sim) — a crawl
        # service initializes its pools at deploy time, not inside round 0
        n_task_cpus = max(1, int(ray.cluster_resources().get("CPU", 8)) - spec.fetch_concurrency)
        shard_actors = (
            list(self.seen.shards) + list(self.content_seen.shards)
            + list(self.sched.shards) + list(self.docsim.shards)
        )
        ray.get(
            [_noop.remote() for _ in range(n_task_cpus)]
            + [a.__ray_ready__.remote() for a in shard_actors]
        )
        # ... and the round-path task FUNCTIONS: the first execution of each
        # remote function pays a one-time registration/deserialization cost
        # (measured 0.43 s for _filter_extract at 32 CPUs vs 0.015 s warm)
        # that otherwise lands inside round 0 of the timed run.  Zero-row
        # calls exercise registration only; the scratch dir catches the
        # empty part files.
        warm_dir = os.path.join(job_dir, "_warmup")
        os.makedirs(warm_dir, exist_ok=True)
        k, P, kc = spec.seen_shards, self.sched.p, self.content_seen.k
        wf = _filter_extract.options(num_returns=1 + k).remote(
            spec, self.robots_ref, k, -1, (), _empty_links_table()
        )
        wm = _merge_winner_blocks.remote([0], [0], wf[0])
        wr = _rank_sched_write_block.options(num_returns=1 + P).remote(
            wm, 0, 0, warm_dir, 0, P
        )
        ws = _split_sink.options(num_returns=8 + 3 * kc).remote(
            OUT_SCHEMA.empty_table(), warm_dir, 0, kc
        )
        ray.get([wf[0], wm, wr[0], ws[0]])
        import shutil

        shutil.rmtree(warm_dir, ignore_errors=True)

    def _note_content(self, statuses, urls, seqs) -> None:
        """M9 — flip the redirect-only mode off at the first 200 fetch,
        recording its enqueue_seq (per-page filter granularity) and
        re-anchoring the follow scope on that URL (rows arrive in seq
        order)."""
        if self._content_found:
            return
        from ..stages.frontier import anchor_scope

        for st, u, sq in zip(statuses, urls, seqs):
            if st == 200:
                self._content_found = True
                self._content_seq = int(sq)
                self._anchor_url = u
                anchor_scope(self.spec, u)
                return

    def _fetch_robots(self) -> dict[str, dict]:
        """S4 — fetch + parse ``http://<host>/robots.txt`` for every seed
        host through the engine's own fetch primitive
        (PHPCrawlerRobotsTxtParser.class.php:29-151).  Hosts discovered
        mid-crawl would fetch lazily inside a per-host politeness stage at
        cluster scale; seed hosts cover the follow-mode-restricted crawls
        this engine runs."""
        from ..functions import robotstxt

        out: dict[str, dict] = {}
        for h, port in self._seed_hostports:
            hp = h if port in (0, 80, 443) else f"{h}:{port}"
            status, _, body, _, _ = self._local_fetcher._fetch_raw(f"http://{hp}/robots.txt")
            if status == 200 and body:
                rules = robotstxt.parse_robots_txt(str(body, "utf-8", "replace"))
                if rules["disallow"] or rules["delay_ms"]:
                    out[h] = rules
        return out

    def _fetch_kwargs(self) -> dict:
        s = self.spec
        return dict(
            fetcher=s.fetcher,
            user_agent=s.user_agent,
            connect_timeout_s=s.connect_timeout_s,
            stream_timeout_s=s.stream_timeout_s,
            proxy=s.proxy,
            retry_limit=s.retry_limit,
            content_size_limit=s.content_size_limit,
            receive_rules=s.receive_rules,
            min_doc_bytes=s.min_doc_bytes,
            aggressive_links=s.aggressive_links,
            synthesize_pagination=s.synthesize_pagination,
            request_delay_ms=max(s.request_delay_ms, 0.0),
            routes=s.routes,
            auth_rules=s.auth_rules,
            post_rules=s.post_rules,
            parse_mode=s.parse_mode,
            stream_to_file_rules=s.stream_to_file_rules,
            spill_dir=s.spill_dir,
        )

    def _derive_seed_scope(self) -> None:
        from ..functions import urltools as ut

        hosts, domains, paths, hostports = [], [], [], []
        for u in self.seeds.column("url").to_pylist():
            c = ut.canonicalize(u)
            p = ut.split_url(c) if c else None
            if p:
                hosts.append(str(p["host"]))
                domains.append(str(p["domain"]))
                paths.append(str(p["path"]))
                hostports.append((str(p["host"]), int(p["port"])))
        # (host, port) pairs for the robots fetch — the reference requests
        # {scheme}://{host}:{port}/robots.txt (PHPCrawlerRobotsTxtParser)
        self._seed_hostports = tuple(dict.fromkeys(hostports))
        self.spec.seed_hosts = tuple(dict.fromkeys(hosts))
        self.spec.seed_domains = tuple(dict.fromkeys(domains))
        self.spec.seed_paths = tuple(dict.fromkeys(paths))

    # ------------------------------------------------------------------
    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.job_dir, f"epoch={epoch:04d}")

    def _seed_table(self) -> pa.Table:
        t = self.seeds
        n = t.num_rows
        t = t.append_column("parent_seq", pa.array([-1] * n, pa.int64()))
        t = t.append_column("link_idx", pa.array(np.arange(n), pa.int64()))
        t = t.append_column("referer", pa.array([""] * n, pa.string()))
        t = t.append_column("link_raw", t.column("url"))
        t = t.append_column("linktext", pa.array([""] * n, pa.string()))
        t = t.append_column("is_redirect", pa.array([False] * n, pa.bool_()))
        return t

    def run(self, max_rounds: int = 50) -> dict:
        start_epoch, candidates, n_hint = self._resume_point()
        epoch = start_epoch
        while epoch < start_epoch + max_rounds:
            n_frontier, candidates, n_hint = self._round(candidates, epoch, n_hint)
            if n_frontier == 0:
                break
            epoch += 1
            if self.spec.request_limit and self.fetched >= self.spec.request_limit:
                break
            # A2 traffic abort: the reference compares cumulative bytes against
            # the limit continuously; round granularity is our batch analog
            if (
                self.spec.traffic_limit_bytes
                and self.bytes_total >= self.spec.traffic_limit_bytes
            ):
                break
        self.bench.start("final_drain")
        self._drain_pending()
        self.bench.stop("final_drain")
        if os.environ.get("LCRAY_PROFILE"):
            import sys as _sys

            print(f"    [job] phases: {self.bench.all()}", file=_sys.stderr, flush=True)
        return self.summary()

    def _resume_point(self) -> tuple[int, "rd.Dataset | pa.Table", int | None]:
        done = sorted(
            int(d.split("=")[1])
            for d in os.listdir(self.job_dir)
            if d.startswith("epoch=")
            and os.path.isfile(os.path.join(self.job_dir, d, "_EPOCH_DONE"))
            and os.path.isfile(os.path.join(self.job_dir, d, "seen.npz"))
        )
        if not done:
            return 0, self._seed_table(), self.seeds.num_rows
        last = done[-1]
        with open(os.path.join(self._epoch_dir(last), "_EPOCH_DONE")) as f:
            meta = json.load(f)
        self.next_seq = meta["next_seq"]
        self.fetched = meta["fetched"]
        self.bytes_total = meta.get("bytes_total", 0)
        if meta.get("content_found"):
            self._content_found = True
            self._content_seq = int(meta.get("content_seq", -1))
            self._anchor_url = meta.get("anchor_url", "")
            if self._anchor_url:
                from ..stages.frontier import anchor_scope

                anchor_scope(self.spec, self._anchor_url)
        snaps = _load_seen_snapshot(os.path.join(self._epoch_dir(last), "seen.npz"))
        self.seen.restore(snaps["seen"])
        self.content_seen.restore(snaps["content"])
        self.sched.restore(snaps.get("hosts", {}))
        if snaps.get("docsim"):
            self.docsim.restore(snaps["docsim"])
        links_dir = os.path.join(self._epoch_dir(last), "links")
        if storage.is_complete(links_dir):
            cand = storage.read_dataset(links_dir, empty_schema=_empty_links_table().schema)
        else:
            cand = _empty_links_table()
        return last + 1, cand, meta.get("links", None)

    # ------------------------------------------------------------------
    def _round(self, candidates, epoch: int, n_hint: int | None):
        """Dispatch a round: small candidate sets run on the driver (same
        operators, no cluster fixed costs), large ones run distributed.

        ``candidates`` may be an Arrow table (seeds / local-round links), a
        list of block ObjectRefs (the previous distributed round's link
        tables, carried in the object store — no re-read), or a Dataset
        (resume path)."""
        ed = self._epoch_dir(epoch)
        if os.path.isdir(ed):
            # (re)entering an epoch — a mid-epoch crash or sparse-snapshot
            # re-crawl may have left stale higher-index parts that a shorter
            # re-run would otherwise bless; start the epoch clean
            import shutil

            shutil.rmtree(ed)
        os.makedirs(ed, exist_ok=True)
        local = n_hint is not None and n_hint <= self.spec.local_round_threshold
        if isinstance(candidates, rd.Dataset):
            candidates = [r for r in candidates.to_arrow_refs()]
        if local:
            prefiltered = False
            if isinstance(candidates, list):
                pf = self._prefilter
                self._prefilter = None
                if pf is not None and pf["key"] == tuple(r.hex() for r in candidates):
                    candidates, prefiltered = pf["filt"], True
                parts = [t for t in ray.get(candidates) if t.num_rows > 0]
                candidates = (
                    pa.concat_tables(parts) if parts
                    else (_empty_candidates() if prefiltered else _empty_links_table())
                )
            self.bench.start("local_round")
            try:
                return self._round_local(candidates, epoch, ed, prefiltered)
            finally:
                self.bench.stop("local_round")
        if isinstance(candidates, pa.Table):
            candidates = [ray.put(candidates)]
        return self._round_dist(candidates, epoch, ed, n_hint)

    # -- local (driver) fast path -------------------------------------
    def _round_local(self, cand: pa.Table, epoch: int, ed: str,
                     prefiltered: bool = False):
        spec = self.spec
        if prefiltered:
            passed = cand  # filter already ran in the speculative tasks
        else:
            passed = (
                self._local_filter(cand, content_seq=self._content_seq)
                if cand.num_rows else cand
            )
        if passed.num_rows:
            df = passed.to_pandas()
            df = df.sort_values(["parent_seq", "link_idx"], kind="stable")
            df = df.drop_duplicates("url_md5", keep="first")
            new_mask = self.seen.check_and_add(df["url_md5"].tolist())
            df = df[new_mask]
            df = df.sort_values(["parent_seq", "link_idx"], kind="stable")
            df["enqueue_seq"] = np.arange(self.next_seq, self.next_seq + len(df))
            self.next_seq += len(df)
            df = df.sort_values(["priority", "enqueue_seq"], ascending=[False, True],
                                kind="stable")
            if spec.request_limit:
                df = df.head(max(0, spec.request_limit - self.fetched))
        else:
            df = passed.to_pandas()
            df["enqueue_seq"] = np.array([], dtype=np.int64)
        return self._local_tail(df, epoch, ed)

    def _local_tail(self, df, epoch: int, ed: str):
        """Fetch + sinks for a driver-sized round: ``df`` is the gated,
        budget-capped frontier with ``enqueue_seq`` assigned, sorted in pop
        order.  Shared by the local path and by ``_round_dist``'s tail
        collapse (a distributed round whose gate leaves only a handful of
        winners delegates here instead of paying the rank/split/finalize
        task machinery — the BFS tail's fixed cost at every pool size)."""
        spec = self.spec
        n_frontier = len(df)
        if n_frontier == 0:
            self._drain_pending()
            self._finish_epoch(ed, links=_empty_links_table(), rows=0)
            return 0, _empty_links_table(), 0
        self.fetched += n_frontier
        frontier_t = pa.Table.from_pandas(df, preserve_index=False)
        storage.commit_table(frontier_t, os.path.join(ed, "frontier"))
        # politeness ledger lives on the schedule shards (shared with the
        # distributed path so clocks stay consistent across path switches)
        sched_dir = os.path.join(ed, "schedule")
        parts = split_sched_parts(
            df["host"].tolist(), df["enqueue_seq"].to_numpy(),
            df["priority"].to_numpy(), self.sched.p,
        )
        ray.get(self.sched.schedule_round(sched_dir, bool(spec.priority_rules), [parts]))
        storage.mark_complete(sched_dir)

        frontier_cols = df[["url", "url_md5", "host", "depth", "priority",
                            "enqueue_seq", "referer", "linktext"]]
        if n_frontier > 64:
            # local frontier prep, pooled fetch: the round is small enough
            # that shuffles aren't worth it, but the fetch compute still is
            block = ray.put(pa.Table.from_pandas(frontier_cols, preserve_index=False))
            bpw = self.spec.fetch_batches_per_worker
            bs = max(16, min(self.spec.fetch_batch_size,
                             -(-n_frontier // (bpw * self.fetch_pool.k))))
            out_refs = self.fetch_pool.submit([block], [n_frontier], bs)
            out = pa.concat_tables(ray.get(out_refs))
        else:
            from ..stages.fetch import OutBuilder

            ob = OutBuilder()
            for fr in frontier_cols.to_dict("records"):
                self._local_fetcher._process_into(fr, ob)
            out = ob.build()
        kinds = {
            k: out.filter(pc.equal(out.column("kind"), k))
            for k in ("fetch", "link", "image", "doc", "attach")
        }
        self._note_content(kinds["fetch"].column("status").to_pylist(),
                           kinds["fetch"].column("url").to_pylist(),
                           kinds["fetch"].column("enqueue_seq").to_pylist())
        # content verdicts run through the SAME sharded flow as the
        # distributed path (a one-block round) — local/dist parity by
        # construction, and the content-shard / sim-shard state stays
        # consistent across path switches
        images = CrawlJob._image_rows(kinds["image"])
        docs = _doc_rows(kinds["doc"])
        atts = _att_rows(kinds["attach"])
        img_meta = images.select(["enqueue_seq", "url_md5", "image_id", "phash"]).cast(_IMG_META_SCHEMA)
        doc_meta = docs.select(["enqueue_seq", "doc_id", "doc_ori_no", "simhash"]).cast(_DOC_META_SCHEMA)
        att_meta = atts.select(["enqueue_seq", "doc_id"]).cast(_ATT_META_SCHEMA)
        kc = self.content_seen.k
        img_kept, dup_ref, doc_keep, att_w = self._content_flow(
            1, [img_meta], [doc_meta],
            [[p] for p in _content_key_parts(img_meta, "url_md5", kc)],
            [[p] for p in _content_key_parts(doc_meta, "doc_id", kc)],
            [[p] for p in _content_key_parts(att_meta, "doc_id", kc)],
        )
        images = _with_near_dup(images, ray.get(img_kept[0]), ray.get(dup_ref))
        storage.commit_table(images, os.path.join(ed, "images"))
        docs = docs.take(pa.array(ray.get(doc_keep[0]), pa.int64()))
        storage.commit_table(docs, os.path.join(ed, "docs"))
        arows = np.sort(np.concatenate(ray.get([att_w[s][0] for s in range(kc)])))
        storage.commit_table(_hydrate_spilled(atts.take(pa.array(arows, pa.int64()))),
                             os.path.join(ed, "attachments"))

        links = kinds["link"].select(_LINK_COLS)
        metrics = _metrics_from_table(kinds["fetch"], images.num_rows, epoch)
        self.bytes_total += int(metrics.column("bytes_received")[0].as_py())
        storage.commit_table(metrics, os.path.join(ed, "metrics"))
        self._drain_pending()
        self._finish_epoch(ed, links=links, rows=n_frontier)
        return n_frontier, links, links.num_rows

    # -- distributed path ----------------------------------------------
    def _round_dist(self, candidates: list, epoch: int, ed: str,
                    n_hint: int | None = None):
        """Block-graph round with NO Dataset execution and exactly TWO driver
        barriers before the fetch wave (winner counts + split metas):

        Link blocks arrive from the previous round's split tasks in fetch
        order, so every block is already sorted by (parent_seq, link_idx)
        and block ranges are disjoint ascending — the rank order is free
        and the former per-round Dataset sort is unnecessary.  Candidate
        filtering + per-shard key extraction run fused as one task per
        block; each seen shard answers the whole round in ONE ``gate_parts``
        call, returning only per-block winner COUNTS to the driver while
        the winner row arrays travel worker-to-worker into the rank tasks.
        Rank tasks write frontier parts AND emit hash(host) schedule parts
        consumed by the politeness shard pool (no per-row host/seq data on
        the driver, ever).  Fetch runs on the persistent worker pool; sink
        writes and the schedule futures drain during the next round."""
        spec = self.spec
        import time as _time

        _prof = os.environ.get("LCRAY_PROFILE")
        _t = _time.perf_counter()

        def _mark(label: str) -> None:
            nonlocal _t
            now = _time.perf_counter()
            # canonical phase name = label minus the per-round detail suffix
            self.bench.add(label.split(" ")[0], now - _t)
            if _prof:
                print(f"    [dist] {label}: {now - _t:.2f}s", flush=True)
            _t = now

        k, P = self.seen.k, self.sched.p
        if len(candidates) == 0:
            self._drain_pending()
            self._finish_epoch(ed, links=_empty_links_table(), rows=0)
            return 0, _empty_links_table(), 0
        # the previous round usually speculated these filter tasks against
        # its in-flight link refs — if so they are done (or finishing) by now
        pf = self._prefilter
        self._prefilter = None
        if pf is not None and pf["key"] == tuple(r.hex() for r in candidates):
            filt_refs, keymat = pf["filt"], pf["keymat"]
            B = len(filt_refs)
        else:
            grouped = _coalesce_groups(candidates, n_hint)
            B = len(grouped)
            filt_refs, keymat = [], []
            for grp in grouped:
                rets = _filter_extract.options(num_returns=1 + k).remote(
                    spec, self.robots_ref, k, self._content_seq,
                    self._lazy_robots_handles, *grp
                )
                filt_refs.append(rets[0])
                keymat.append(rets[1:])
        counts_refs = []
        winner_mat: list[list] = [[None] * k for _ in range(B)]
        for s in range(k):
            rets = self.seen.shards[s].gate_parts.options(num_returns=1 + B).remote(
                *[keymat[b][s] for b in range(B)]
            )
            counts_refs.append(rets[0])
            for b in range(B):
                winner_mat[b][s] = rets[1 + b]
        _mark(f"launch_filter+gate B={B}")
        counts = np.stack(ray.get(counts_refs)).sum(axis=0).astype(np.int64)
        _mark(f"gate_counts n={int(counts.sum())}")

        # request budget (A2): cap in seq order; with priority rules the cap
        # must take max-priority first → fall back to a Dataset sort+limit
        blocks: list = filt_refs
        take = counts.copy()
        if spec.request_limit:
            remaining = max(0, spec.request_limit - self.fetched)
            if spec.priority_rules:
                kept = [
                    _apply_winners.remote(filt_refs[b], *winner_mat[b]) for b in range(B)
                ]
                capped = (
                    rd.from_arrow_refs(kept)
                    .sort(["priority", "parent_seq", "link_idx"], descending=[True, False, False])
                    .limit(remaining)
                    .sort(["parent_seq", "link_idx"])
                )
                blocks = capped.to_arrow_refs()
                take = np.array(ray.get([_count_rows.remote(r) for r in blocks]), dtype=np.int64)
                winner_mat = [[] for _ in blocks]  # winners already applied
            else:
                cum = 0
                for b in range(take.size):
                    take[b] = min(take[b], max(0, remaining - cum))
                    cum += counts[b]
        sel = [b for b in range(len(blocks)) if take[b] > 0]
        blocks = [blocks[b] for b in sel]
        winner_mat = [winner_mat[b] for b in sel]
        take = take[sel]
        n_frontier = int(take.sum())
        if n_frontier == 0:
            self._drain_pending()
            self._finish_epoch(ed, links=_empty_links_table(), rows=0)
            return 0, _empty_links_table(), 0
        if n_frontier <= spec.local_round_threshold:
            # tail collapse: the gate left a driver-sized round (the raw
            # link count that routed us here was dominated by already-seen
            # URLs).  Gather the winner rows — tiny by construction — and
            # run the local tail; the seen/content/sched shard state is
            # shared, so path switches stay exact.
            kept = [
                blocks[b] if not winner_mat[b]
                else _apply_winners.remote(blocks[b], *winner_mat[b])
                for b in range(len(blocks))
            ]
            parts = [
                t.slice(0, int(take[b])) for b, t in enumerate(ray.get(kept))
            ]
            tbl = pa.concat_tables([t for t in parts if t.num_rows])
            df = tbl.to_pandas().sort_values(["parent_seq", "link_idx"], kind="stable")
            df["enqueue_seq"] = np.arange(self.next_seq, self.next_seq + len(df))
            self.next_seq += len(df)
            df = df.sort_values(["priority", "enqueue_seq"], ascending=[False, True],
                                kind="stable")
            _mark(f"tail_collapse n={n_frontier}")
            self.tail_collapses += 1
            return self._local_tail(df, epoch, ed)
        # re-coalesce tiny winner blocks (r5): a dedup-heavy gate after a
        # huge round can leave hundreds of blocks with a handful of winners
        # each (profile: 9,841 winners across 1,220 blocks ≈ 8/block) —
        # each would become its own rank task and a sub-minimum fetch
        # batch.  Contiguous groups keep (parent_seq, link_idx) order, so
        # rank order is preserved; the merge task applies each block's
        # winner mask and budget slice exactly as the rank task would have.
        if len(blocks) > 2 * max(1, -(-n_frontier // _COALESCE_ROWS)):
            groups: list[list[int]] = []
            cur: list[int] = []
            acc = 0
            for b in range(len(blocks)):
                cur.append(b)
                acc += int(take[b])
                if acc >= _COALESCE_ROWS or len(cur) >= 32:
                    groups.append(cur)
                    cur, acc = [], 0
            if cur:
                groups.append(cur)
            new_blocks, new_take = [], []
            for g in groups:
                takes = [int(take[b]) for b in g]
                nwin, flat = [], []
                for b in g:
                    win = [w for w in winner_mat[b] if w is not None]
                    nwin.append(len(win))
                    flat.append(blocks[b])
                    flat.extend(win)
                new_blocks.append(_merge_winner_blocks.remote(takes, nwin, *flat))
                new_take.append(sum(takes))
            blocks = new_blocks
            winner_mat = [[] for _ in blocks]
            take = np.asarray(new_take, dtype=np.int64)
        self.fetched += n_frontier

        frontier_dir = os.path.join(ed, "frontier")
        os.makedirs(frontier_dir, exist_ok=True)
        offsets = np.concatenate([[0], np.cumsum(take)[:-1]]) + self.next_seq
        self.next_seq += n_frontier
        ranked, sched_mat = [], []
        for i, (blk, win, off, tk) in enumerate(zip(blocks, winner_mat, offsets, take)):
            rets = _rank_sched_write_block.options(num_returns=1 + P).remote(
                blk, int(off), int(tk), frontier_dir, i, P, *[w for w in win if w is not None]
            )
            ranked.append(rets[0])
            sched_mat.append(rets[1:])

        # politeness ledger (T7): hash(host)-partitioned shard walk; futures
        # drain with the other deferred sinks (actor mailboxes keep rounds
        # ordered, so the next round may queue behind this one safely)
        sched_dir = os.path.join(ed, "schedule")
        sched_futs = self.sched.schedule_round(sched_dir, bool(spec.priority_rules), sched_mat)

        # fetch+extract on the persistent pool (plasma-shared blocks) with
        # work-stealing dispatch; each completed batch's split task (links
        # checkpoint + meta projection) launches immediately so the sink
        # wave pipelines inside the fetch wave
        _mark("rank+sched_launch")
        links_dir = os.path.join(ed, "links")
        os.makedirs(links_dir, exist_ok=True)
        # adaptive batch size: a small round must still spread across the
        # whole pool (at batch_size=256 a 469-URL round is TWO tasks no
        # matter how many workers exist) — target fetch_batches_per_worker
        # batches per worker so the depth-2 stealing queue stays non-empty
        bs = max(16, min(spec.fetch_batch_size,
                         -(-n_frontier
                           // (spec.fetch_batches_per_worker * self.fetch_pool.k))))
        take_l = [int(c) for c in take]
        nb = sum((c + bs - 1) // bs for c in take_l)
        split_refs: list = [None] * nb
        kc = self.content_seen.k
        # speculate the NEXT round's filter + key extraction INCREMENTALLY:
        # as each batch's split lands mid-wave, its link block goes straight
        # into a _filter_extract task, so the filter compute for round N+1
        # hides under round N's fetch wave on the otherwise-idle task CPUs.
        # (r5: the round-4 profile showed the old post-wave speculation
        # leaving a 5.4 s gate_counts wait at the next round's head — the
        # filters for ~3.3M links all launched after the 49.6 s wave ended.)
        # Pure tasks — safe to speculate; the stateful gate still waits for
        # the next round.  Per-block granularity ≈ _COALESCE_ROWS anyway
        # (256 URLs × ~12 links/URL), so no coalescing pass is needed.
        # M9 guard unchanged: never speculate while redirect-only may apply.
        speculate_next = self._content_found
        pf_filt: list = [None] * nb
        pf_keymat: list = [None] * nb

        def _on_batch_done(i: int, ref) -> None:
            rets = _split_sink.options(num_returns=8 + 3 * kc).remote(
                ref, links_dir, i, kc
            )
            split_refs[i] = rets
            if speculate_next:
                f = _filter_extract.options(num_returns=1 + k).remote(
                    spec, self.robots_ref, k, -1, self._lazy_robots_handles,
                    rets[7],  # this batch's link block
                )
                pf_filt[i] = f[0]
                pf_keymat[i] = f[1:]

        self.fetch_pool.submit_dynamic(ranked, take_l, bs, on_done=_on_batch_done)
        cols = list(zip(*split_refs))
        (fetch_metas, img_metas, doc_metas, att_metas,
         img_fulls, doc_fulls, att_fulls, link_refs) = cols[:8]
        img_parts = cols[8:8 + kc]            # [shard][block]
        doc_parts = cols[8 + kc:8 + 2 * kc]
        att_parts = cols[8 + 2 * kc:8 + 3 * kc]
        # content dedup verdicts (D2/D3/D4, J2/J3) — sharded off the driver:
        # key parts flow worker → content shard → finalize by ref; the driver
        # only wires the task graph (no verdict rows, no barrier)
        img_kept, dup_ref, doc_keep, att_w = self._content_flow(
            nb, img_metas, doc_metas, img_parts, doc_parts, att_parts
        )

        # the incremental speculation launched one filter per batch inside
        # _on_batch_done; register the completed set for the next round
        link_refs_l = list(link_refs)
        if speculate_next:
            self._prefilter = {
                "key": tuple(r.hex() for r in link_refs_l),
                "filt": pf_filt, "keymat": pf_keymat,
            }

        metas = ray.get(list(fetch_metas))
        fetch_small = _concat_nonempty(metas, _FETCH_META_SCHEMA)
        if fetch_small.num_rows:
            self.bytes_total += int(pc.sum(fetch_small.column("bytes_received")).as_py() or 0)
            self._note_content(fetch_small.column("status").to_pylist(),
                               fetch_small.column("url").to_pylist(),
                               fetch_small.column("enqueue_seq").to_pylist())
        _mark("fetch+split")
        # every rank task is transitively complete once the split metas landed
        storage.mark_complete(frontier_dir)
        storage.mark_complete(links_dir)
        n_links = int(pc.sum(fetch_small.column("n_links")).as_py() or 0)

        img_dir = os.path.join(ed, "images")
        doc_dir = os.path.join(ed, "docs")
        att_dir = os.path.join(ed, "attachments")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(doc_dir, exist_ok=True)
        os.makedirs(att_dir, exist_ok=True)
        # the previous epoch's deferred writes have had this whole round to
        # finish — drain them now, BEFORE stashing ours (done markers must
        # land in epoch order for resume correctness)
        self._drain_pending()
        writes = [
            _finalize_images.remote(img_fulls[b], img_kept[b], dup_ref, img_dir, b)
            for b in range(nb)
        ] + [
            _finalize_rows.remote(doc_fulls[b], doc_dir, b, doc_keep[b])
            for b in range(nb)
        ] + [
            _finalize_rows.remote(att_fulls[b], att_dir, b,
                                  *[att_w[s][b] for s in range(kc)])
            for b in range(nb)
        ]
        _mark("sinks")

        # state snapshots are SUBMITTED synchronously (actor mailboxes pin
        # them to exactly this epoch's position) but GATHERED in the next
        # round's drain — the payload writes + metrics + done marker defer
        # the same way, so nothing verdict-shaped blocks this round.
        # Snapshots every `snapshot_every` epochs: resume re-enters at the
        # last snapshotted epoch and deterministically re-crawls the rest.
        snap_refs = None
        if epoch % max(1, self.spec.snapshot_every) == 0:
            snap_refs = {
                "seen": self.seen.snapshot_refs(),
                "content": self.content_seen.snapshot_refs(),
                "hosts": self.sched.snapshot_refs(),
                "docsim": self.docsim.snapshot_refs(),
            }
        self._pending = dict(
            ed=ed, epoch=epoch, img_dir=img_dir, doc_dir=doc_dir, att_dir=att_dir,
            fetch_small=fetch_small, writes=writes, n_img=nb,
            sched_futs=sched_futs, sched_dir=sched_dir, snap_refs=snap_refs,
            snap_path=os.path.join(ed, "seen.npz"),
            meta={"next_seq": self.next_seq, "fetched": self.fetched,
                  "rows": n_frontier, "links": n_links,
                  "bytes_total": self.bytes_total,
                  "content_found": self._content_found,
                  "content_seq": self._content_seq,
                  "anchor_url": self._anchor_url},
        )
        return n_frontier, list(link_refs), n_links

    def _content_flow(self, nb: int, img_metas, doc_metas,
                      img_parts, doc_parts, att_parts):
        """Content-dedup verdicts (D2/D3/D4, J2/J3) with NO round-sized state
        on the driver — the SeenShard pattern applied to content keys.

        Per content shard s (one fused ``gate_parts`` call per kind per
        round, the actor mailbox keeping kinds in the reference's probe
        order images → doc_id → doc_ori_no → attachments,
        DaoXlegalLawContentRecord.class.php:98-101):

          images  key = content md5   → keep-first winners        (D2/J2)
          docs    key = doc_id        → stage-2 task extracts the
                  surviving rows' namespaced doc_ori_no keys      (D4)
                  → stage-3 task merges the ori winners and feeds
                  the sim band shards; a per-block resolve task
                  applies the near-dup + doc_ori_no-override rule (D3/J3)
          attach  key = content md5   → keep-first winners

        Everything returned is an ObjectRef: per-block kept-image metas, the
        round's image near-dup annotation map, per-block doc keep-row
        arrays, and per-shard-per-block attachment winner rows.  The caller
        wires them straight into the finalize writers."""
        kc = self.content_seen.k
        shards = self.content_seen.shards
        nr = 1 + nb

        def _gate(parts_by_shard):
            w = [[None] * nb for _ in range(kc)]
            for s in range(kc):
                rets = shards[s].gate_parts.options(num_returns=nr).remote(
                    *parts_by_shard[s]
                )
                for b in range(nb):
                    w[s][b] = rets[1 + b]
            return w

        img_w = _gate(img_parts)
        doc_w = _gate(doc_parts)
        surv, oparts = [None] * nb, [[None] * nb for _ in range(kc)]
        for b in range(nb):
            rets = _doc_stage2.options(num_returns=1 + kc).remote(
                doc_metas[b], kc, *[doc_w[s][b] for s in range(kc)]
            )
            surv[b] = rets[0]
            for s in range(kc):
                oparts[s][b] = rets[1 + s]
        ori_w = _gate(oparts)
        att_w = _gate(att_parts)
        sim_parts = [
            _doc_stage3.remote(surv[b], *[ori_w[s][b] for s in range(kc)])
            for b in range(nb)
        ]
        h = self.spec.doc_near_dup_hamming
        if h >= 0:
            band_hits = self.docsim.query_parts_refs(h, sim_parts)
            doc_keep = [
                _doc_resolve.remote(
                    sim_parts[b], *[band_hits[band][b] for band in range(len(band_hits))]
                )
                for b in range(nb)
            ]
        else:
            doc_keep = [_doc_resolve.remote(sim_parts[b]) for b in range(nb)]
        img_kept = [
            _img_kept.remote(img_metas[b], *[img_w[s][b] for s in range(kc)])
            for b in range(nb)
        ]
        dup_ref = _image_dup_task.remote(*img_kept)
        return img_kept, dup_ref, doc_keep, att_w

    def _drain_pending(self) -> None:
        """Complete the previous epoch's deferred sink writes: gather the
        finalize tasks, commit metrics, drop the done marker."""
        p = getattr(self, "_pending", None)
        if not p:
            return
        self._pending = None
        res = ray.get(p["writes"] + p["sched_futs"])
        n_images = int(sum(res[: p["n_img"]]))
        storage.mark_complete(p["img_dir"])
        storage.mark_complete(p["doc_dir"])
        storage.mark_complete(p["att_dir"])
        storage.mark_complete(p["sched_dir"])
        metrics = _metrics_from_table(p["fetch_small"], n_images, p["epoch"])
        storage.commit_table(metrics, os.path.join(p["ed"], "metrics"))
        if p.get("snap_refs"):
            # the refs were submitted during the epoch (mailbox-ordered), so
            # this gather observes exactly that epoch's state; the snapshot
            # must land before the done marker for resume correctness
            sr = p["snap_refs"]
            hosts: dict[str, float] = {}
            for part in ray.get(sr["hosts"]):
                hosts.update(part)
            _save_seen_snapshot(
                p["snap_path"],
                {"seen": ray.get(sr["seen"]), "content": ray.get(sr["content"]),
                 "hosts": hosts, "docsim": ray.get(sr["docsim"])},
            )
        _write_done(p["ed"], p["meta"])

    def _finish_epoch(self, ed: str, links, rows: int, n_links: int | None = None) -> None:
        if links is not None:  # local path: links still need their checkpoint
            storage.commit_table(links, os.path.join(ed, "links"))
            n_links = links.num_rows
        # honor the sparse-snapshot cadence here too (r5): the local/tail
        # path used to gather + savez the FULL seen state synchronously on
        # the driver at EVERY epoch — a width-independent cost the dist
        # path already skips on non-snapshot epochs (resume re-enters at
        # the last snapshotted epoch and re-crawls deterministically)
        epoch = int(os.path.basename(ed).split("=")[1])
        if epoch % max(1, self.spec.snapshot_every) == 0:
            _save_seen_snapshot(
                os.path.join(ed, "seen.npz"),
                {"seen": self.seen.snapshot(), "content": self.content_seen.snapshot(),
                 "hosts": self.sched.snapshot(), "docsim": self.docsim.snapshot()},
            )
        _write_done(ed, {"next_seq": self.next_seq, "fetched": self.fetched,
                         "rows": rows, "links": n_links,
                         "bytes_total": self.bytes_total,
                         "content_found": self._content_found,
                         "content_seq": self._content_seq,
                         "anchor_url": self._anchor_url})

    @staticmethod
    def _image_rows(t: pa.Table) -> pa.Table:
        """Project fused-output image rows to the IMAGES payload schema +
        content md5 as url_md5 for the content-seen gate."""
        if t.num_rows == 0:
            t = OUT_SCHEMA.empty_table()
        # md5 straight off the Arrow buffers — no per-payload bytes copy
        md5s = [hashlib.md5(s.as_buffer() if s.is_valid else b"").hexdigest()
                for s in t.column("image_bytes")]
        return pa.table(
            {
                "image_id": t.column("image_id"),
                "bytes": t.column("image_bytes"),
                "w": t.column("w"),
                "h": t.column("h"),
                "fmt": t.column("fmt"),
                "caption": t.column("caption"),
                "phash": t.column("phash"),
                "src_url": t.column("url"),
                "referer": t.column("referer"),
                "enqueue_seq": t.column("enqueue_seq"),
                "url_md5": pa.array(md5s, pa.string()),  # content hash for dedup gate
            }
        )

    def benchmarks(self) -> dict[str, float]:
        """A4 — whole-job phase decomposition: phase name → accumulated
        seconds across every distributed round (getAllBenchmarks analog)."""
        return self.bench.all()

    def shutdown(self) -> None:
        """Kill the seen-set shards and fetch workers (job-lifetime actors)."""
        self._drain_pending()
        self.seen.shutdown()
        self.content_seen.shutdown()
        self.fetch_pool.shutdown()
        self.sched.shutdown()
        self.docsim.shutdown()

    def summary(self) -> dict:
        metrics = self.metrics()
        return {
            "epochs": int(metrics.num_rows),
            "fetched": self.fetched,
            "next_seq": self.next_seq,
            "links_followed": int(pc.sum(metrics.column("links_followed")).as_py() or 0),
            "documents_received": int(pc.sum(metrics.column("documents_received")).as_py() or 0),
            "bytes_received": int(pc.sum(metrics.column("bytes_received")).as_py() or 0),
            "images_written": int(pc.sum(metrics.column("images_written")).as_py() or 0),
            "errors": int(pc.sum(metrics.column("errors")).as_py() or 0),
            "retries": int(pc.sum(metrics.column("retries")).as_py() or 0),
        }

    def metrics(self) -> pa.Table:
        parts = []
        for d in sorted(os.listdir(self.job_dir)):
            p = os.path.join(self.job_dir, d, "metrics")
            if d.startswith("epoch=") and os.path.isdir(p):
                parts.append(storage.load_table(p))
        if not parts:
            from ..schemas import METRICS

            return METRICS.empty_table()
        return pa.concat_tables(parts)

    def crawl_order(self) -> list[str]:
        """The engine's claimed total fetch order: per epoch, frontier rows in
        (priority desc, enqueue_seq asc) — the reference's pop order.

        Parity scope (SURVEY.md §7 hard part (a)): with uniform priorities the
        reference's single queue is exactly FIFO = BFS, and this order matches
        the simulator byte-for-byte (tested).  With priority *rules*, the
        reference pops a high-priority deep URL before exhausting shallow
        ones — membership still matches (verified), but total order requires
        the driver-side lineage replay over the recorded link lists rather
        than epoch concatenation; that replay consumes only the links/
        lineage tables, never refetches."""
        out: list[str] = []
        for d in sorted(os.listdir(self.job_dir)):
            p = os.path.join(self.job_dir, d, "frontier")
            if d.startswith("epoch=") and os.path.isdir(p):
                t = storage.load_table(p)
                if t.num_columns == 0 or t.num_rows == 0:
                    continue
                df = t.to_pandas().sort_values(
                    ["priority", "enqueue_seq"], ascending=[False, True], kind="stable"
                )
                out.extend(df["url_md5"].tolist())
        return out


# ---------------------------------------------------------------------------
# block tasks for the distributed round

_FETCH_META_SCHEMA = pa.schema(
    [("status", pa.int16()), ("bytes_received", pa.int64()), ("error", pa.string()),
     ("attempts", pa.int16()), ("fetch_ms", pa.float64()), ("n_links", pa.int64()),
     ("url", pa.string()), ("enqueue_seq", pa.int64())]
)
_IMG_META_SCHEMA = pa.schema(
    [("enqueue_seq", pa.int64()), ("url_md5", pa.string()),
     ("image_id", pa.string()), ("phash", pa.int64())]
)
_DOC_META_SCHEMA = pa.schema(
    [("enqueue_seq", pa.int64()), ("doc_id", pa.string()), ("doc_ori_no", pa.string()),
     ("simhash", pa.int64())]
)
_ATT_META_SCHEMA = pa.schema([("enqueue_seq", pa.int64()), ("doc_id", pa.string())])


def _limit_arrow_threads(n: int = 2) -> None:
    """Every Ray worker process gets its own Arrow thread pool sized to ALL
    cores by default — dozens of single-CPU workers each spawning 32 Arrow
    threads oversubscribe the node during the fetch wave.  Cap it."""
    try:
        if pa.cpu_count() > n:
            pa.set_cpu_count(n)
            pa.set_io_thread_count(n)
    except Exception:
        pass


_COALESCE_ROWS = 4096  # target candidate rows per filter task


def _coalesce_groups(refs: list, n_hint: int | None) -> list[list]:
    """Contiguous groups of link-block refs sized so each filter task sees
    ~_COALESCE_ROWS candidate rows (rank order is preserved because groups
    are contiguous ranges of the already-ordered block list)."""
    if not n_hint or len(refs) <= 1:
        return [[r] for r in refs]
    target = max(1, -(-n_hint // _COALESCE_ROWS))  # ceil
    groups = np.array_split(np.arange(len(refs)), min(len(refs), target))
    return [[refs[i] for i in g] for g in groups if g.size]


@ray.remote
def _noop() -> None:
    """Worker-pool warmup target (spawning task workers mid-crawl costs
    ~0.5 s on the first distributed round otherwise)."""


@ray.remote
def _filter_extract(spec: CrawlSpec, robots, k: int, content_seq: int,
                    sched_handles: tuple, *tables: pa.Table):
    """Fused CandidateFilter + per-seen-shard key extraction over one
    coalesced group of link blocks (one task hop instead of two).  Returns
    the filtered block followed by k key parts (``num_returns=1+k`` at the
    call site); concat + mask filter preserve (parent_seq, link_idx) order.

    ``sched_handles``: non-empty in lazy-robots mode — the politeness shard
    actors answering hosts → robots rules (fetched on first sight)."""
    _limit_arrow_threads()
    t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    filt = CandidateFilter.__new__(CandidateFilter)
    import re

    from ..state.cuckoo import md5hex_to_u64_pairs

    filt.spec = spec
    filt.filter_res = [re.compile(r) for r in spec.url_filter_regexes]
    filt.follow_res = [re.compile(r) for r in spec.url_follow_regexes]
    filt.prio_res = [(re.compile(r), lvl) for r, lvl in spec.priority_rules]
    filt.robots = robots if isinstance(robots, dict) else ray.get(robots)
    filt._robots_checked = set()
    if sched_handles:
        from ..stages.politeness import host_shard

        P = len(sched_handles)

        def _lookup(hosts: list[str]) -> dict:
            futs = []
            for s in range(P):
                hs = [h for h in hosts if host_shard(h, P) == s]
                if hs:
                    futs.append(sched_handles[s].robots_for.remote(hs))
            merged: dict = {}
            for d in ray.get(futs):
                merged.update(d)
            return merged

        filt.robots_lookup = _lookup
    else:
        filt.robots_lookup = None
    out = filt(t, content_seq=content_seq)
    md5s = out.column("url_md5").to_pylist()
    hi, lo = md5hex_to_u64_pairs(md5s)
    seq = np.asarray(out.column("parent_seq").to_numpy(zero_copy_only=False), dtype=np.int64)
    idx = np.asarray(out.column("link_idx").to_numpy(zero_copy_only=False), dtype=np.int64)
    # same mapping as seenset.shard_of: low 32 md5 bits mod k
    sh = ((lo & np.uint64(0xFFFFFFFF)) % np.uint64(k)).astype(np.int64)
    parts = []
    for s in range(k):
        rows = np.nonzero(sh == s)[0]
        parts.append(
            {"md5": [md5s[i] for i in rows], "hi": hi[rows], "lo": lo[rows],
             "seq": seq[rows], "idx": idx[rows], "row": rows}
        )
    return (out, *parts)


@ray.remote
def _apply_winners(t: pa.Table, *winner_rows: np.ndarray) -> pa.Table:
    if t.num_rows == 0:
        return t
    mask = np.zeros(t.num_rows, dtype=bool)
    for w in winner_rows:
        if w.size:
            mask[w] = True
    return t.filter(pa.array(mask))


@ray.remote
def _count_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _merge_winner_blocks(takes: list, nwin: list, *flat) -> pa.Table:
    """Coalesce a contiguous group of winner blocks into ONE ranked-order
    table: ``flat`` packs, per block, the link table followed by its
    ``nwin[i]`` per-shard winner row arrays.  Winner masks preserve row
    order and each block is sliced to its own budget take before concat,
    so the result is exactly the concatenation the per-block rank tasks
    would have produced."""
    out = []
    pos = 0
    for tk, nw in zip(takes, nwin):
        t = flat[pos]
        ws = flat[pos + 1 : pos + 1 + nw]
        pos += 1 + nw
        if nw and t.num_rows:
            mask = np.zeros(t.num_rows, dtype=bool)
            for w in ws:
                if w.size:
                    mask[w] = True
            t = t.filter(pa.array(mask))
        out.append(t.slice(0, tk))
    return pa.concat_tables(out)


@ray.remote
def _rank_sched_write_block(
    t: pa.Table, offset: int, take_n: int, frontier_dir: str, part: int,
    p_sched: int, *winner_rows: np.ndarray,
):
    """Apply this block's dedup winners (mask → order preserved), slice to
    the budget, assign contiguous enqueue_seq, write the frontier part, and
    emit hash(host) schedule parts for the politeness shards.  Returns the
    ranked block followed by the P schedule parts (``num_returns=1+P``)."""
    import pyarrow.parquet as pq

    if winner_rows:
        mask = np.zeros(t.num_rows, dtype=bool)
        for w in winner_rows:
            if w.size:
                mask[w] = True
        t = t.filter(pa.array(mask))
    t = t.slice(0, take_n)
    t = t.append_column("enqueue_seq", pa.array(np.arange(offset, offset + t.num_rows), pa.int64()))
    pq.write_table(t, os.path.join(frontier_dir, f"part-{part:05d}.parquet"))
    sched = split_sched_parts(
        t.column("host").to_pylist(),
        t.column("enqueue_seq").to_numpy(),
        np.asarray(t.column("priority").to_numpy(zero_copy_only=False), dtype=np.int64),
        p_sched,
    )
    return (t, *sched)


@ray.remote
def _split_sink(out: pa.Table, links_dir: str, part: int, kc: int):
    """Split a fetch-output block by kind: write the links checkpoint part,
    project the small per-kind metadata AND its per-content-shard gate parts
    (so the dedup verdicts never touch the driver), hand back the full
    image/doc/attachment tables for the finalize writers plus the links
    table itself (the next round consumes the ref directly — no re-read).
    ``num_returns=8 + 3*kc`` at the call site."""
    import pyarrow.parquet as pq

    _limit_arrow_threads()
    kinds = {
        k: out.filter(pc.equal(out.column("kind"), k))
        for k in ("fetch", "link", "image", "doc", "attach")
    }
    links = kinds["link"].select(_LINK_COLS)
    if links.num_rows:
        pq.write_table(links, os.path.join(links_dir, f"part-{part:05d}.parquet"))
    f = kinds["fetch"]
    fetch_meta = pa.table(
        {
            "status": f.column("status"),
            "bytes_received": f.column("bytes_received"),
            "error": f.column("error"),
            "attempts": f.column("attempts"),
            "fetch_ms": f.column("fetch_ms"),
            "n_links": pa.array([links.num_rows] + [0] * max(0, f.num_rows - 1), pa.int64())
            if f.num_rows
            else pa.array([], pa.int64()),
            "url": f.column("url"),
            "enqueue_seq": f.column("enqueue_seq"),
        },
        schema=_FETCH_META_SCHEMA,
    )
    images = CrawlJob._image_rows(kinds["image"])
    img_meta = images.select(["enqueue_seq", "url_md5", "image_id", "phash"]).cast(_IMG_META_SCHEMA)
    docs = _doc_rows(kinds["doc"])
    doc_meta = docs.select(["enqueue_seq", "doc_id", "doc_ori_no", "simhash"]).cast(_DOC_META_SCHEMA)
    atts = _att_rows(kinds["attach"])
    att_meta = atts.select(["enqueue_seq", "doc_id"]).cast(_ATT_META_SCHEMA)
    return (fetch_meta, img_meta, doc_meta, att_meta, images, docs, atts, links,
            *_content_key_parts(img_meta, "url_md5", kc),
            *_content_key_parts(doc_meta, "doc_id", kc),
            *_content_key_parts(att_meta, "doc_id", kc))


def _content_key_parts(meta: pa.Table, key_col: str, k: int) -> list[dict]:
    """Per-content-shard ``gate_parts`` inputs from a meta block: md5-hex key
    + its (hi, lo) u64 split, enqueue_seq as the winner order, block row
    index.  Same key→shard mapping as ``seenset.shard_of``."""
    from ..state.cuckoo import md5hex_to_u64_pairs

    md5s = meta.column(key_col).to_pylist()
    seqs = np.asarray(
        meta.column("enqueue_seq").to_numpy(zero_copy_only=False), dtype=np.int64
    )
    rows = np.arange(len(md5s), dtype=np.int64)
    hi, lo = md5hex_to_u64_pairs(md5s)
    sh = ((lo & np.uint64(0xFFFFFFFF)) % np.uint64(k)).astype(np.int64)
    parts = []
    for s in range(k):
        r = np.nonzero(sh == s)[0]
        parts.append({"md5": [md5s[i] for i in r], "hi": hi[r], "lo": lo[r],
                      "seq": seqs[r], "idx": rows[r], "row": rows[r]})
    return parts


def _merge_winner_rows(winners) -> np.ndarray:
    """Ascending union of per-shard winner row arrays (ascending row index ⇒
    enqueue_seq order is preserved downstream)."""
    arrs = [np.asarray(w, dtype=np.int64) for w in winners if np.asarray(w).size]
    if not arrs:
        return np.zeros(0, dtype=np.int64)
    return np.sort(np.concatenate(arrs))


@ray.remote
def _doc_stage2(doc_meta: pa.Table, kc: int, *winners):
    """Apply the doc_id stage winners, then emit the surviving rows'
    namespaced doc_ori_no gate parts (D4: ``md5("no:"+n)`` so the official
    number key space cannot collide with content md5s).  Returns the
    survivor projection followed by kc ori parts (``num_returns=1+kc``)."""
    rows = _merge_winner_rows(winners)
    t = doc_meta.take(pa.array(rows, pa.int64()))
    ori = t.column("doc_ori_no").to_pylist()
    seqs = np.asarray(t.column("enqueue_seq").to_numpy(zero_copy_only=False), dtype=np.int64)
    has = np.fromiter((o != "" for o in ori), dtype=bool, count=len(ori))
    widx = np.nonzero(has)[0]
    keys = [hashlib.md5(("no:" + ori[i]).encode()).hexdigest() for i in widx]
    from ..state.cuckoo import md5hex_to_u64_pairs

    hi, lo = md5hex_to_u64_pairs(keys)
    sh = ((lo & np.uint64(0xFFFFFFFF)) % np.uint64(kc)).astype(np.int64)
    parts = []
    for s in range(kc):
        r = np.nonzero(sh == s)[0]
        parts.append({
            "md5": [keys[i] for i in r], "hi": hi[r], "lo": lo[r],
            "seq": seqs[widx[r]], "idx": rows[widx[r]], "row": rows[widx[r]],
        })
    surv = {
        "row": rows, "seq": seqs, "has_ori": has,
        "sim": np.asarray(t.column("simhash").to_numpy(zero_copy_only=False), dtype=np.int64),
    }
    return (surv, *parts)


@ray.remote
def _doc_stage3(surv: dict, *ori_winners) -> dict:
    """Merge the ori-gate winners into the doc survivor set (a numbered doc
    must win its doc_ori_no gate; unnumbered docs pass) and emit the sim-gate
    part for the band shards."""
    wrows = _merge_winner_rows(ori_winners)
    mask = ~surv["has_ori"] | np.isin(surv["row"], wrows)
    return {
        "row": surv["row"][mask], "seq": surv["seq"][mask],
        "sim": surv["sim"][mask], "override": surv["has_ori"][mask],
    }


@ray.remote
def _doc_resolve(part: dict, *band_hits) -> np.ndarray:
    """J3: drop near-dups unless numbered (the doc_ori_no override) — a doc
    is a near-dup when ANY sim band reported a stored hit."""
    if not band_hits:
        return part["row"]
    h = np.stack([np.asarray(b, dtype=np.int64) for b in band_hits])
    is_dup = (h != -1).any(axis=0)
    return part["row"][~is_dup | part["override"]]


@ray.remote
def _img_kept(img_meta: pa.Table, *winners) -> dict:
    """Kept-image projection for the near-dup annotation + finalize write."""
    rows = _merge_winner_rows(winners)
    t = img_meta.take(pa.array(rows, pa.int64()))
    return {
        "row": rows,
        "id": t.column("image_id").to_pylist(),
        "phash": np.asarray(t.column("phash").to_numpy(zero_copy_only=False), dtype=np.int64),
        "seq": np.asarray(t.column("enqueue_seq").to_numpy(zero_copy_only=False), dtype=np.int64),
    }


@ray.remote
def _image_dup_task(*kept: dict) -> dict:
    """Round-level image near-dup ANNOTATION (D3 for the image sink): banded
    phash LSH over the round's kept images.  Per band bucket the earliest
    (min-seq) member is canonical; later members within hamming ≤ 8 of it
    map to it, multi-band hits resolving to the earliest canonical.  Blocks
    arrive in seq order so concatenation preserves it.  Pure within-round
    metadata → one task per round, never the driver; the cross-ROUND image
    dedup is the exact md5 content gate (images are annotated, not dropped,
    matching the sink's near_dup_of column contract)."""
    ids: list[str] = []
    for p in kept:
        ids.extend(p["id"])
    if not ids:
        return {}
    ph = np.concatenate([np.asarray(p["phash"], dtype=np.int64) for p in kept]).view(np.uint64)
    seqs = np.concatenate([np.asarray(p["seq"], dtype=np.int64) for p in kept])
    bands = hashing.simhash_bands(ph, 4)
    best_seq: dict[str, int] = {}
    best_id: dict[str, str] = {}
    for b in range(4):
        keys = bands[:, b]
        order = np.argsort(keys, kind="stable")  # stable: seq order per key
        bounds = np.nonzero(np.diff(keys[order]))[0] + 1
        for grp in np.split(order, bounds):
            if grp.size < 2:
                continue
            first = grp[0]
            d = hashing.hamming64(ph[grp[1:]], np.full(grp.size - 1, ph[first], dtype=np.uint64))
            fseq = int(seqs[first])
            for j in np.nonzero(d <= 8)[0]:
                i = ids[grp[1 + j]]
                if fseq < best_seq.get(i, np.iinfo(np.int64).max):
                    best_seq[i] = fseq
                    best_id[i] = ids[first]
    return best_id


def _with_near_dup(images: pa.Table, kept: dict, dup_map: dict) -> pa.Table:
    """Apply the keep rows then attach the near-dup verdict column — shared
    by the local round and the distributed finalize task."""
    t = images.take(pa.array(kept["row"], pa.int64()))
    col = pa.array([dup_map.get(i, "") for i in kept["id"]], pa.string())
    return t.append_column("near_dup_of", col)


@ray.remote
def _finalize_images(images: pa.Table, kept: dict, dup_map: dict, out_dir: str, part: int) -> int:
    import pyarrow.parquet as pq

    out = _with_near_dup(images, kept, dup_map)
    if out.num_rows == 0:
        return 0
    pq.write_table(out, os.path.join(out_dir, f"part-{part:05d}.parquet"))
    return out.num_rows


@ray.remote
def _finalize_rows(t: pa.Table, out_dir: str, part: int, *winners) -> int:
    """Write the block rows selected by the (per-shard) winner row arrays."""
    import pyarrow.parquet as pq

    rows = _merge_winner_rows(winners)
    if rows.size == 0:
        return 0
    kept = _hydrate_spilled(t.take(pa.array(rows, pa.int64())))
    pq.write_table(kept, os.path.join(out_dir, f"part-{part:05d}.parquet"))
    return kept.num_rows


def _hydrate_spilled(t: pa.Table) -> pa.Table:
    """O3 stream-to-file: rows whose payload was received to a spill file
    (``tmp_path`` set, ``bytes`` null) get the payload read back here — at
    the SINK, after dedup winner selection, one file at a time — so the
    fetch path never buffers an oversized body and losers are never read.
    Locality: spill files live where the fetch worker wrote them; single-node
    (and shared-scratch ``spill_dir``) reads them directly, a multi-node
    deployment points ``spill_dir`` at shared storage (CrawlSpec note).  A
    missing file keeps the row with null bytes — the path column still
    records where the payload was received."""
    if "tmp_path" not in t.column_names or "bytes" not in t.column_names or t.num_rows == 0:
        return t
    paths = t.column("tmp_path").to_pylist()
    if not any(paths):
        return t
    byts = t.column("bytes")
    vals = []
    for i, p in enumerate(paths):
        v = byts[i]
        if p and not v.is_valid:
            try:
                with open(p, "rb") as f:
                    vals.append(f.read())
            except OSError:
                vals.append(None)
        else:
            vals.append(v.as_py())
    idx = t.column_names.index("bytes")
    return t.set_column(idx, "bytes", pa.array(vals, byts.type))


def _concat_nonempty(tables: list[pa.Table], schema: pa.Schema) -> pa.Table:
    parts = [t for t in tables if t.num_rows > 0]
    return pa.concat_tables(parts) if parts else schema.empty_table()


def _att_rows(t: pa.Table) -> pa.Table:
    """Attachment payload rows (M11 attachment route): binary rides the
    fused output's image_bytes column."""
    if t.num_rows == 0:
        t = OUT_SCHEMA.empty_table()
    out = t.select(_ATT_COLS)
    return out.append_column("bytes", t.column("image_bytes"))


def _doc_rows(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        t = OUT_SCHEMA.empty_table()
    out = t.select([c for c in _DOC_COLS if c != "url_md5"])
    # content-seen gate keys on url_md5; for docs the key is doc_id (D2)
    return out.append_column("url_md5", t.column("doc_id"))


def _metrics_from_table(fetch: pa.Table, n_images: int, epoch: int) -> pa.Table:
    """A1 counters from the (small) fetch-metric columns, driver-side."""
    from ..schemas import METRICS

    n = fetch.num_rows
    if n:
        status = fetch.column("status").to_numpy(zero_copy_only=False)
        b = np.nan_to_num(
            fetch.column("bytes_received").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        err = np.array([e not in ("", None) for e in fetch.column("error").to_pylist()])
        att = fetch.column("attempts").to_numpy(zero_copy_only=False).astype(np.int64)
        fms = np.nan_to_num(
            fetch.column("fetch_ms").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        vals = dict(
            links_followed=n, documents_received=int((status == 200).sum()),
            bytes_received=int(b.sum()), errors=int(err.sum()),
            retries=int((att - 1).sum()), fetch_ms_sum=float(fms.sum()),
        )
    else:
        vals = dict(links_followed=0, documents_received=0, bytes_received=0,
                    errors=0, retries=0, fetch_ms_sum=0.0)
    return pa.table(
        {
            "epoch": pa.array([epoch], pa.int32()),
            "partition": pa.array([0], pa.int32()),
            "links_followed": pa.array([vals["links_followed"]], pa.int64()),
            "documents_received": pa.array([vals["documents_received"]], pa.int64()),
            "bytes_received": pa.array([vals["bytes_received"]], pa.int64()),
            "errors": pa.array([vals["errors"]], pa.int64()),
            "retries": pa.array([vals["retries"]], pa.int64()),
            "fetch_ms_sum": pa.array([vals["fetch_ms_sum"]], pa.float64()),
            "images_written": pa.array([n_images], pa.int64()),
            "urls_enqueued": pa.array([0], pa.int64()),
            "urls_deduped": pa.array([0], pa.int64()),
        },
        schema=METRICS,
    )


def _empty_links_table() -> pa.Table:
    return pa.schema(
        [
            ("url", pa.string()), ("link_raw", pa.string()), ("linktext", pa.string()),
            ("referer", pa.string()), ("depth", pa.int32()), ("is_redirect", pa.bool_()),
            ("parent_seq", pa.int64()), ("link_idx", pa.int32()),
        ]
    ).empty_table()


def _write_done(epoch_dir: str, meta: dict) -> None:
    tmp = os.path.join(epoch_dir, "_EPOCH_DONE.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(epoch_dir, "_EPOCH_DONE"))


def _save_seen_snapshot(path: str, snaps: dict) -> None:
    import pickle

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(snaps, f, protocol=4)
    os.replace(tmp, path)


def _load_seen_snapshot(path: str) -> dict:
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)
