"""The crawl round driver — iterative BFS over Dataset rounds with
per-epoch checkpointing (SURVEY.md §3 "Ray-Data restatement").

Each round (epoch):

  link block refs ─ _filter_block tasks          canonicalize+filter (M1-M3, M8, O2, T5)
                  ─ seen-shard two-phase         within-round dedup D1 + cross-round
                    propose/resolve protocol       gate T1, deterministic min-rank winners
                  ─ rank sort (the ONE Dataset   enqueue_seq = FIFO pop order (O1);
                    execution / genuine shuffle)   budget cap A2 in pop order
                  ─ politeness ledger walk       per-host crawl-delay schedule (T7)
                  ─ persistent fetch pool        fused fetch+extract — bodies never
                    (plasma-shared page store)     leave the worker
                  ─ _split_sink tasks            links checkpoint + forward refs;
                                                   small metas to driver
                  ─ driver verdicts + deferred   content dedup D2/D3/D4; image/doc
                    finalize writes                writes overlap the next round

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
from ..stages.fetch import OUT_SCHEMA, SyntheticFetchExtract, load_fixture_tables
from ..stages.frontier import CandidateFilter, CrawlSpec
from ..stages.politeness import HostClock, schedule_table
from ..state.seenset import SeenSet
from .. import storage

_LINK_COLS = ["url", "link_raw", "linktext", "referer", "depth", "is_redirect",
              "parent_seq", "link_idx"]
_IMG_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
             "src_url", "referer", "enqueue_seq", "url_md5"]
_DOC_COLS = ["doc_id", "url", "doc_ori_no", "title", "author", "tags",
             "publish_time", "t_valid", "content", "negs", "simhash",
             "doc_lang", "doc_quality", "doc_tokens", "enqueue_seq", "url_md5"]


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
        self.robots = load_robots(robots_path) if spec.respect_robots else {}
        self.job_dir = job_dir
        os.makedirs(job_dir, exist_ok=True)
        self.seen = SeenSet(spec.seen_shards, spec.seen_capacity, spec.seen_mode)
        self.content_seen = SeenSet(spec.seen_shards, spec.seen_capacity, "exact")
        self.next_seq = 0
        self.fetched = 0
        self.bytes_total = 0
        self._pending: dict | None = None
        self._derive_seed_scope()
        self.robots_ref = ray.put(self.robots)
        # fixture stores: loaded once, broadcast once (the production analog
        # is the HTTP client config — per-actor state would be conn pools)
        pages, images = load_fixture_tables(pages_path, images_path)
        self.pages_ref = ray.put(pages)
        self.images_ref = ray.put(images)
        self._local_fetcher = SyntheticFetchExtract(
            pages_ref=self.pages_ref, images_ref=self.images_ref,
            **self._fetch_kwargs(),
        )
        self._local_filter = CandidateFilter(spec, self.robots_ref)
        # per-host politeness ledger (T7 upgraded: per-host, not global)
        self.host_clock = HostClock(spec.request_delay_ms, self.robots)
        from ..stages.fetchpool import FetchPool

        self.fetch_pool = FetchPool(
            spec.fetch_concurrency, self.pages_ref, self.images_ref, self._fetch_kwargs()
        )

    def _fetch_kwargs(self) -> dict:
        s = self.spec
        return dict(
            retry_limit=s.retry_limit,
            content_size_limit=s.content_size_limit,
            receive_rules=s.receive_rules,
            min_doc_bytes=s.min_doc_bytes,
            aggressive_links=s.aggressive_links,
            synthesize_pagination=s.synthesize_pagination,
            request_delay_ms=max(s.request_delay_ms, 0.0),
        )

    def _derive_seed_scope(self) -> None:
        from ..functions import urltools as ut

        hosts, domains, paths = [], [], []
        for u in self.seeds.column("url").to_pylist():
            c = ut.canonicalize(u)
            p = ut.split_url(c) if c else None
            if p:
                hosts.append(str(p["host"]))
                domains.append(str(p["domain"]))
                paths.append(str(p["path"]))
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
        self._drain_pending()
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
        snaps = _load_seen_snapshot(os.path.join(self._epoch_dir(last), "seen.npz"))
        self.seen.restore(snaps["seen"])
        self.content_seen.restore(snaps["content"])
        self.host_clock.restore(snaps.get("hosts", {}))
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
        os.makedirs(ed, exist_ok=True)
        local = n_hint is not None and n_hint <= self.spec.local_round_threshold
        if isinstance(candidates, rd.Dataset):
            candidates = [r for r in candidates.to_arrow_refs()]
        if local:
            if isinstance(candidates, list):
                parts = [t for t in ray.get(candidates) if t.num_rows > 0]
                candidates = pa.concat_tables(parts) if parts else _empty_links_table()
            return self._round_local(candidates, epoch, ed)
        if isinstance(candidates, pa.Table):
            candidates = [ray.put(candidates)]
        return self._round_dist(candidates, epoch, ed)

    # -- local (driver) fast path -------------------------------------
    def _round_local(self, cand: pa.Table, epoch: int, ed: str):
        spec = self.spec
        passed = self._local_filter(cand) if cand.num_rows else cand
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
        n_frontier = len(df)
        if n_frontier == 0:
            self._drain_pending()
            self._finish_epoch(ed, links=_empty_links_table(), rows=0)
            return 0, _empty_links_table(), 0
        self.fetched += n_frontier
        frontier_t = pa.Table.from_pandas(df, preserve_index=False)
        storage.commit_table(frontier_t, os.path.join(ed, "frontier"))
        storage.commit_table(
            schedule_table(df["host"].tolist(), df["enqueue_seq"].tolist(), self.host_clock),
            os.path.join(ed, "schedule"),
        )

        frontier_cols = df[["url", "url_md5", "host", "depth", "priority",
                            "enqueue_seq", "referer", "linktext"]]
        if n_frontier > 64:
            # local frontier prep, pooled fetch: the round is small enough
            # that shuffles aren't worth it, but the fetch compute still is
            block = ray.put(pa.Table.from_pandas(frontier_cols, preserve_index=False))
            out_refs = self.fetch_pool.submit([block], [n_frontier], self.spec.fetch_batch_size)
            out = pa.concat_tables(ray.get(out_refs))
        else:
            rows: list[dict] = []
            for fr in frontier_cols.to_dict("records"):
                rows.extend(self._local_fetcher._process_one(fr))
            out = pa.Table.from_pylist(rows, schema=OUT_SCHEMA) if rows else OUT_SCHEMA.empty_table()
        kinds = {
            k: out.filter(pc.equal(out.column("kind"), k))
            for k in ("fetch", "link", "image", "doc")
        }
        images = CrawlJob._image_rows(kinds["image"])
        img_new = self.content_seen.check_and_add(images.column("url_md5").to_pylist())
        images = images.filter(pa.array(img_new)) if images.num_rows else images
        images = _flag_near_dups_local(images)
        storage.commit_table(images, os.path.join(ed, "images"))

        docs = _doc_rows(kinds["doc"])
        doc_new = self.content_seen.check_and_add(docs.column("url_md5").to_pylist())
        docs = docs.filter(pa.array(doc_new)) if docs.num_rows else docs
        docs = _dedup_doc_ori_no_local(docs)
        storage.commit_table(docs, os.path.join(ed, "docs"))

        links = kinds["link"].select(_LINK_COLS)
        metrics = _metrics_from_table(kinds["fetch"], images.num_rows, epoch)
        self.bytes_total += int(metrics.column("bytes_received")[0].as_py())
        storage.commit_table(metrics, os.path.join(ed, "metrics"))
        self._drain_pending()
        self._finish_epoch(ed, links=links, rows=n_frontier)
        return n_frontier, links, links.num_rows

    # -- distributed path ----------------------------------------------
    def _round_dist(self, candidates: list, epoch: int, ed: str):
        """Block-graph round: ONE Dataset execution (the rank sort — the only
        genuine shuffle); candidate filtering runs as raw tasks over the link
        block refs carried from the previous round, dedup+gate run as a
        two-phase protocol against the seen shards, fetch runs on the
        persistent worker pool, and sinks are per-block tasks.  Payload
        blocks never pass through the driver — only boundary keys, counts
        and the small metadata projections do."""
        spec = self.spec
        import time as _time

        _prof = os.environ.get("LCRAY_PROFILE")
        _t = _time.perf_counter()

        def _mark(label: str) -> None:
            nonlocal _t
            if _prof:
                now = _time.perf_counter()
                print(f"    [dist] {label}: {now - _t:.2f}s", flush=True)
                _t = now

        # candidate filter as one raw task per link block (no Dataset pass)
        refs = [
            _filter_block.remote(r, spec, self.robots_ref) for r in candidates
        ]
        _mark("filter")

        # two-phase dedup (D1 within-round) + seen gate (T1 cross-round):
        # propose min (parent_seq, link_idx) per md5 to the shards, barrier,
        # resolve winners — deterministic under any arrival order
        ray.get([s.begin_round.remote() for s in self.seen.shards])
        kept = _shard_dedup_gate(refs, self.seen.shards, self.seen.k)
        _mark("dedup_gate")

        # Execution 2: the rank sort (enqueue-seq order = FIFO pop order O1)
        sorted_ds = rd.from_arrow_refs(kept).sort(["parent_seq", "link_idx"])
        refs2 = sorted_ds.to_arrow_refs()
        _mark("rank_sort")
        counts = ray.get([_count_rows.remote(r) for r in refs2])
        refs2 = [r for r, c in zip(refs2, counts) if c > 0]
        counts = [c for c in counts if c > 0]
        # request budget (A2): cap in seq order; with priority rules the cap
        # must take max-priority first → fall back to a Dataset sort+limit
        if spec.request_limit:
            remaining = max(0, spec.request_limit - self.fetched)
            if spec.priority_rules:
                capped = (
                    rd.from_arrow_refs(refs2)
                    .sort(["priority", "parent_seq", "link_idx"], descending=[True, False, False])
                    .limit(remaining)
                    .sort(["parent_seq", "link_idx"])
                )
                refs2 = capped.to_arrow_refs()
                counts = ray.get([_count_rows.remote(r) for r in refs2])
                refs2 = [r for r, c in zip(refs2, counts) if c > 0]
                counts = [c for c in counts if c > 0]
            else:
                cum, cut = 0, []
                for c in counts:
                    cut.append(min(c, max(0, remaining - cum)))
                    cum += c
                counts = cut
        n_frontier = int(sum(counts))
        if n_frontier == 0:
            self._drain_pending()
            self._finish_epoch(ed, links=_empty_links_table(), rows=0)
            return 0, _empty_links_table(), 0
        self.fetched += n_frontier

        frontier_dir = os.path.join(ed, "frontier")
        os.makedirs(frontier_dir, exist_ok=True)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) + self.next_seq
        ranked = [
            _rank_and_write_block.remote(r, int(o), int(c), frontier_dir, i)
            for i, (r, o, c) in enumerate(zip(refs2, offsets, counts))
        ]
        self.next_seq += n_frontier

        # politeness ledger (T7): walk the round in pop order; blocks are in
        # seq order already, priorities reorder rarely (rules present)
        hs = ray.get([_host_seq_prio.remote(r) for r in ranked])
        hosts = [h for part in hs for h in part[0]]
        seqs = [q for part in hs for q in part[1]]
        if spec.priority_rules:
            prios = [x for part in hs for x in part[2]]
            order = sorted(range(len(seqs)), key=lambda i: (-prios[i], seqs[i]))
            hosts = [hosts[i] for i in order]
            seqs = [seqs[i] for i in order]
        storage.commit_table(
            schedule_table(hosts, seqs, self.host_clock), os.path.join(ed, "schedule")
        )

        # fetch+extract on the persistent pool (plasma-shared blocks)
        out_refs = self.fetch_pool.submit(ranked, counts, spec.fetch_batch_size)

        # sinks: one split task per fetch output block — writes links parts,
        # returns small metadata projections for driver-side dedup decisions
        links_dir = os.path.join(ed, "links")
        os.makedirs(links_dir, exist_ok=True)
        split_refs = [
            _split_sink.remote(o, links_dir, i) for i, o in enumerate(out_refs)
        ]
        fetch_metas, img_metas, doc_metas, img_fulls, doc_fulls, link_refs = zip(*split_refs)
        fetch_small = _concat_nonempty(ray.get(list(fetch_metas)), _FETCH_META_SCHEMA)
        if fetch_small.num_rows:
            self.bytes_total += int(pc.sum(fetch_small.column("bytes_received")).as_py() or 0)
        _mark("fetch+split")
        img_meta = _concat_nonempty(ray.get(list(img_metas)), _IMG_META_SCHEMA)
        doc_meta = _concat_nonempty(ray.get(list(doc_metas)), _DOC_META_SCHEMA)
        # every rank task is transitively complete once the split metas landed
        storage.mark_complete(frontier_dir)
        storage.mark_complete(links_dir)
        n_links = int(pc.sum(fetch_small.column("n_links")).as_py() or 0)

        # content dedup verdicts (D2/D3/D4), driver-side on small columns
        img_keep, dup_map = self._image_verdicts(img_meta)
        doc_keep = self._doc_verdicts(doc_meta)

        img_dir = os.path.join(ed, "images")
        doc_dir = os.path.join(ed, "docs")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(doc_dir, exist_ok=True)
        keep_ref = ray.put(img_keep)
        dup_ref = ray.put(dup_map)
        dkeep_ref = ray.put(doc_keep)
        # the previous epoch's deferred writes have had this whole round to
        # finish — drain them now, BEFORE stashing ours (done markers must
        # land in epoch order for resume correctness)
        self._drain_pending()
        writes = [
            _finalize_images.remote(f, keep_ref, dup_ref, img_dir, i)
            for i, f in enumerate(img_fulls)
        ] + [
            _finalize_docs.remote(f, dkeep_ref, doc_dir, i)
            for i, f in enumerate(doc_fulls)
        ]
        _mark("sinks")

        # seen snapshot is synchronous (it must reflect exactly this epoch);
        # the payload writes + metrics + done marker are deferred — they
        # overlap the next round's filter/sort/fetch and drain there.
        # Snapshots every `snapshot_every` epochs: resume re-enters at the
        # last snapshotted epoch and deterministically re-crawls the rest.
        if epoch % max(1, self.spec.snapshot_every) == 0:
            _save_seen_snapshot(
                os.path.join(ed, "seen.npz"),
                {"seen": self.seen.snapshot(), "content": self.content_seen.snapshot(),
                 "hosts": self.host_clock.snapshot()},
            )
        self._pending = dict(
            ed=ed, epoch=epoch, img_dir=img_dir, doc_dir=doc_dir,
            fetch_small=fetch_small, writes=writes, n_img=len(img_fulls),
            meta={"next_seq": self.next_seq, "fetched": self.fetched,
                  "rows": n_frontier, "links": n_links},
        )
        return n_frontier, list(link_refs), n_links

    def _image_verdicts(self, img_meta: pa.Table) -> tuple[set, dict]:
        """Round-level exact content dedup (min enqueue_seq per content md5)
        + cross-round content-seen gate + near-dup map.  Operates on the
        small (seq, md5, image_id, phash) projection only."""
        if img_meta.num_rows == 0:
            return set(), {}
        df = img_meta.to_pandas().sort_values("enqueue_seq", kind="stable")
        df = df.drop_duplicates("url_md5", keep="first")
        new = self.content_seen.check_and_add(df["url_md5"].tolist())
        df = df[new]
        keep = set(df["enqueue_seq"].tolist())
        dup_map = _near_dup_map(
            df["image_id"].tolist(),
            df["phash"].to_numpy(dtype=np.int64),
            df["enqueue_seq"].to_numpy(dtype=np.int64),
        )
        return keep, dup_map

    def _doc_verdicts(self, doc_meta: pa.Table) -> set:
        """doc_id exact dedup (D2) + doc_ori_no unique-when-present (D4)."""
        if doc_meta.num_rows == 0:
            return set()
        df = doc_meta.to_pandas().sort_values("enqueue_seq", kind="stable")
        df = df.drop_duplicates("doc_id", keep="first")
        new = self.content_seen.check_and_add(df["doc_id"].tolist())
        df = df[new]
        with_no = df[df["doc_ori_no"] != ""].drop_duplicates("doc_ori_no", keep="first")
        without = df[df["doc_ori_no"] == ""]
        return set(with_no["enqueue_seq"]) | set(without["enqueue_seq"])

    def _drain_pending(self) -> None:
        """Complete the previous epoch's deferred sink writes: gather the
        finalize tasks, commit metrics, drop the done marker."""
        p = getattr(self, "_pending", None)
        if not p:
            return
        self._pending = None
        res = ray.get(p["writes"])
        n_images = int(sum(res[: p["n_img"]]))
        storage.mark_complete(p["img_dir"])
        storage.mark_complete(p["doc_dir"])
        metrics = _metrics_from_table(p["fetch_small"], n_images, p["epoch"])
        storage.commit_table(metrics, os.path.join(p["ed"], "metrics"))
        _write_done(p["ed"], p["meta"])

    def _finish_epoch(self, ed: str, links, rows: int, n_links: int | None = None) -> None:
        if links is not None:  # local path: links still need their checkpoint
            storage.commit_table(links, os.path.join(ed, "links"))
            n_links = links.num_rows
        _save_seen_snapshot(
            os.path.join(ed, "seen.npz"),
            {"seen": self.seen.snapshot(), "content": self.content_seen.snapshot(),
             "hosts": self.host_clock.snapshot()},
        )
        _write_done(ed, {"next_seq": self.next_seq, "fetched": self.fetched,
                         "rows": rows, "links": n_links})

    @staticmethod
    def _image_rows(t: pa.Table) -> pa.Table:
        """Project fused-output image rows to the IMAGES payload schema +
        content md5 as url_md5 for the content-seen gate."""
        if t.num_rows == 0:
            t = OUT_SCHEMA.empty_table()
        md5s = ["" if b is None else hashlib.md5(b).hexdigest()
                for b in t.column("image_bytes").to_pylist()]
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

    def shutdown(self) -> None:
        """Kill the seen-set shards and fetch workers (job-lifetime actors)."""
        self._drain_pending()
        self.seen.shutdown()
        self.content_seen.shutdown()
        self.fetch_pool.shutdown()

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
     ("attempts", pa.int16()), ("fetch_ms", pa.float64()), ("n_links", pa.int64())]
)
_IMG_META_SCHEMA = pa.schema(
    [("enqueue_seq", pa.int64()), ("url_md5", pa.string()),
     ("image_id", pa.string()), ("phash", pa.int64())]
)
_DOC_META_SCHEMA = pa.schema(
    [("enqueue_seq", pa.int64()), ("doc_id", pa.string()), ("doc_ori_no", pa.string())]
)


@ray.remote
def _filter_block(t: pa.Table, spec: CrawlSpec, robots) -> pa.Table:
    """CandidateFilter over one link block (raw task — regex compile per task
    is microseconds; robots arrives auto-dereferenced)."""
    filt = CandidateFilter.__new__(CandidateFilter)
    import re

    filt.spec = spec
    filt.filter_res = [re.compile(r) for r in spec.url_filter_regexes]
    filt.follow_res = [re.compile(r) for r in spec.url_follow_regexes]
    filt.prio_res = [(re.compile(r), lvl) for r, lvl in spec.priority_rules]
    filt.robots = robots if isinstance(robots, dict) else ray.get(robots)
    return filt(t)


@ray.remote
def _extract_keys(t: pa.Table, k: int):
    """Partition a candidate block's (md5, rank, row) keys by seen-shard.
    Returns k parts (num_returns=k at the call site) — pure projection, no
    blocking calls inside the worker."""
    from ..state.seenset import shard_of

    md5s = t.column("url_md5").to_pylist()
    seq = np.asarray(t.column("parent_seq").to_numpy(zero_copy_only=False), dtype=np.int64)
    idx = np.asarray(t.column("link_idx").to_numpy(zero_copy_only=False), dtype=np.int64)
    sh = shard_of(md5s, k) if md5s else np.zeros(0, dtype=np.int64)
    parts = []
    for s in range(k):
        rows = np.nonzero(sh == s)[0]
        parts.append(
            {"md5": [md5s[i] for i in rows], "seq": seq[rows], "idx": idx[rows], "row": rows}
        )
    return tuple(parts) if k > 1 else parts[0]


@ray.remote
def _apply_winners(t: pa.Table, *winner_rows: np.ndarray) -> pa.Table:
    if t.num_rows == 0:
        return t
    mask = np.zeros(t.num_rows, dtype=bool)
    for w in winner_rows:
        if w.size:
            mask[w] = True
    return t.filter(pa.array(mask))


def _shard_dedup_gate(refs: list, shards: list, k: int) -> list:
    """Two-phase dedup+gate orchestration (driver-side): extract keys per
    block (num_returns=k), all shards propose, barrier, all shards resolve,
    winners filtered back into the blocks.  Only winner row-indices cross the
    driver; no worker ever blocks on a nested ray.get."""
    B = len(refs)
    if B == 0:
        return refs
    keyrefs = [
        _extract_keys.options(num_returns=k if k > 1 else 1).remote(r, k) for r in refs
    ]
    if k == 1:
        keymat = [[kr] for kr in keyrefs]
    else:
        keymat = [list(kr) for kr in keyrefs]
    ray.get([
        shards[s].propose_parts.remote(*[keymat[b][s] for b in range(B)])
        for s in range(k)
    ])
    winner_lists = ray.get([
        shards[s].resolve_parts.remote(*[keymat[b][s] for b in range(B)])
        for s in range(k)
    ])
    return [
        _apply_winners.remote(refs[b], *[winner_lists[s][b] for s in range(k)])
        for b in range(B)
    ]


@ray.remote
def _count_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _host_seq_prio(t: pa.Table):
    return (t.column("host").to_pylist(), t.column("enqueue_seq").to_pylist(),
            t.column("priority").to_pylist())


@ray.remote
def _rank_and_write_block(
    t: pa.Table, offset: int, take_n: int, frontier_dir: str, part: int
) -> pa.Table:
    import pyarrow.parquet as pq

    t = t.slice(0, take_n)
    t = t.append_column("enqueue_seq", pa.array(np.arange(offset, offset + t.num_rows), pa.int64()))
    pq.write_table(t, os.path.join(frontier_dir, f"part-{part:05d}.parquet"))
    return t


@ray.remote(num_returns=6)
def _split_sink(out: pa.Table, links_dir: str, part: int):
    """Split a fetch-output block by kind: write the links checkpoint part,
    project the small metadata for driver-side dedup verdicts, hand back the
    full image/doc tables for the finalize writers AND the links table itself
    (the next round consumes the ref directly — no parquet re-read)."""
    import pyarrow.parquet as pq

    kinds = {
        k: out.filter(pc.equal(out.column("kind"), k))
        for k in ("fetch", "link", "image", "doc")
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
        },
        schema=_FETCH_META_SCHEMA,
    )
    images = CrawlJob._image_rows(kinds["image"])
    img_meta = images.select(["enqueue_seq", "url_md5", "image_id", "phash"]).cast(_IMG_META_SCHEMA)
    docs = _doc_rows(kinds["doc"])
    doc_meta = docs.select(["enqueue_seq", "doc_id", "doc_ori_no"]).cast(_DOC_META_SCHEMA)
    return fetch_meta, img_meta, doc_meta, images, docs, links


@ray.remote
def _finalize_images(images: pa.Table, keep: set, dup_map: dict, out_dir: str, part: int) -> int:
    import pyarrow.parquet as pq

    if images.num_rows == 0:
        return 0
    seqs = images.column("enqueue_seq").to_pylist()
    mask = pa.array([s in keep for s in seqs])
    kept = images.filter(mask)
    if kept.num_rows == 0:
        return 0
    kept = kept.append_column(
        "near_dup_of",
        pa.array([dup_map.get(i, "") for i in kept.column("image_id").to_pylist()], pa.string()),
    )
    pq.write_table(kept, os.path.join(out_dir, f"part-{part:05d}.parquet"))
    return kept.num_rows


@ray.remote
def _finalize_docs(docs: pa.Table, keep: set, out_dir: str, part: int) -> int:
    import pyarrow.parquet as pq

    if docs.num_rows == 0:
        return 0
    seqs = docs.column("enqueue_seq").to_pylist()
    kept = docs.filter(pa.array([s in keep for s in seqs]))
    if kept.num_rows == 0:
        return 0
    pq.write_table(kept, os.path.join(out_dir, f"part-{part:05d}.parquet"))
    return kept.num_rows


def _concat_nonempty(tables: list[pa.Table], schema: pa.Schema) -> pa.Table:
    parts = [t for t in tables if t.num_rows > 0]
    return pa.concat_tables(parts) if parts else schema.empty_table()


def _doc_rows(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        t = OUT_SCHEMA.empty_table()
    out = t.select([c for c in _DOC_COLS if c != "url_md5"])
    # content-seen gate keys on url_md5; for docs the key is doc_id (D2)
    return out.append_column("url_md5", t.column("doc_id"))


def _dedup_doc_ori_no_local(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return t
    df_meta = t.select(["doc_ori_no", "enqueue_seq"]).to_pandas()
    df_meta["_i"] = np.arange(len(df_meta))
    keep_idx = []
    for no, g in df_meta.groupby("doc_ori_no", sort=False):
        if no == "":
            keep_idx.extend(g["_i"].tolist())
        else:
            keep_idx.append(int(g.sort_values("enqueue_seq", kind="stable")["_i"].iloc[0]))
    return t.take(pa.array(sorted(keep_idx), pa.int64()))


def _near_dup_map(ids: list, phashes: np.ndarray, seqs: np.ndarray) -> dict:
    """Banded near-dup detection on (id, phash, seq) triples — shared by the
    local and distributed paths (distributed runs it per band bucket)."""
    bands = hashing.simhash_bands(phashes.view(np.uint64), 4)
    buckets: dict[tuple, list[int]] = {}
    for i in range(len(ids)):
        for b in range(4):
            buckets.setdefault((b, int(bands[i, b])), []).append(i)
    dup: dict = {}
    for members in buckets.values():
        if len(members) < 2:
            continue
        members = sorted(members, key=lambda i: seqs[i])
        first = members[0]
        ph = phashes.view(np.uint64)
        d = hashing.hamming64(ph[members[1:]], np.full(len(members) - 1, ph[first], dtype=np.uint64))
        for j, dd in enumerate(d):
            if dd <= 8:
                dup.setdefault(ids[members[1 + j]], ids[first])
    return dup


def _flag_near_dups_local(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return t.append_column("near_dup_of", pa.array([], pa.string()))
    ids = t.column("image_id").to_pylist()
    ph = np.array(t.column("phash").to_pylist(), dtype=np.int64)
    seqs = np.array(t.column("enqueue_seq").to_pylist(), dtype=np.int64)
    dup = _near_dup_map(ids, ph, seqs)
    return t.append_column(
        "near_dup_of", pa.array([dup.get(i, "") for i in ids], pa.string())
    )


def _flag_phash_near_dups(ds: rd.Dataset) -> rd.Dataset:
    """D3 — phash near-dup flagging: ONLY the (image_id, phash, enqueue_seq)
    triple leaves the blocks (16 B + id per row — image bytes never move,
    hard part (d)); the banded-bucket hamming check runs on that projection
    and the verdict map is broadcast back into the payload blocks.

    The projection is per-round, so it is tiny relative to the payload; a
    round so large its triple projection cannot be gathered would band-
    partition the projection first (same _near_dup_map per partition)."""
    triple = pa.concat_tables(
        [t for t in ray.get(
            ds.map_batches(
                lambda t: t.select(["image_id", "phash", "enqueue_seq"]),
                batch_format="pyarrow",
            ).to_arrow_refs()
        ) if t.num_rows > 0] or [pa.table(
            {"image_id": pa.array([], pa.string()),
             "phash": pa.array([], pa.int64()),
             "enqueue_seq": pa.array([], pa.int64())})]
    )
    dup_map = _near_dup_map(
        triple.column("image_id").to_pylist(),
        np.array(triple.column("phash").to_pylist(), dtype=np.int64),
        np.array(triple.column("enqueue_seq").to_pylist(), dtype=np.int64),
    )
    dup_ref = ray.put(dup_map)

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(dup_ref)
        col = [m.get(i, "") for i in t.column("image_id").to_pylist()]
        return t.append_column("near_dup_of", pa.array(col, pa.string()))

    return ds.map_batches(attach, batch_format="pyarrow")


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
