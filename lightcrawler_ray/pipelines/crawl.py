"""The crawl round driver — iterative BFS over Dataset rounds with
per-epoch checkpointing (SURVEY.md §3 "Ray-Data restatement").

Each round (epoch):

  candidates ─ map_batches(CandidateFilter)      canonicalize+filter (M1-M3, M8, O2, T5)
             ─ groupby(url_md5) first-enqueuer   within-round dedup (D1)
             ─ map_batches(seen gate)            cuckoo/exact shard actors (T1)
             ─ assign_enqueue_seq                FIFO numbering (O1)
             ─ sort(priority desc, seq asc) [+ limit]   pop-order schedule (O1/A2)
             ─ map_batches(SyntheticFetchExtract, concurrency=N)   fused fetch+extract
             ─ split kinds → images (content dedup D2 via content-seen shards,
               phash band flag D3) / docs (doc_id + doc_ori_no dedup D2/D4) /
               links (next round) / fetch metrics (A1)

Checkpoint per epoch: frontier, links lineage, images, docs, metrics, seen
snapshot, then an atomic done-marker — resume restores the seen shards and
re-enters at the first incomplete epoch (T10 / north_rule).  All per-epoch
outputs are partitioned directories so a 256-node run can skip finished work.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions import hashing
from ..stages.fetch import OUT_SCHEMA, SyntheticFetchExtract
from ..stages.frontier import (
    CandidateFilter,
    CrawlSpec,
    assign_enqueue_seq,
    dedup_within_round,
    make_seen_gate,
)
from ..state.seenset import SeenSet
from .. import storage


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
        self.pages_path = pages_path
        self.images_path = images_path
        self.robots = load_robots(robots_path) if spec.respect_robots else {}
        self.job_dir = job_dir
        os.makedirs(job_dir, exist_ok=True)
        self.seen = SeenSet(spec.seen_shards, spec.seen_capacity, spec.seen_mode)
        self.content_seen = SeenSet(spec.seen_shards, spec.seen_capacity, "exact")
        self.next_seq = 0
        self.fetched = 0
        self._derive_seed_scope()
        self.robots_ref = ray.put(self.robots)

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

    def _seed_candidates(self) -> rd.Dataset:
        t = self.seeds
        n = t.num_rows
        t = t.append_column("parent_seq", pa.array([-1] * n, pa.int64()))
        t = t.append_column("link_idx", pa.array(np.arange(n), pa.int64()))
        t = t.append_column("referer", pa.array([""] * n, pa.string()))
        t = t.append_column("link_raw", t.column("url"))
        t = t.append_column("linktext", pa.array([""] * n, pa.string()))
        t = t.append_column("is_redirect", pa.array([False] * n, pa.bool_()))
        return rd.from_arrow(t)

    def run(self, max_rounds: int = 50) -> dict:
        start_epoch, candidates = self._resume_point()
        epoch = start_epoch
        while epoch < start_epoch + max_rounds:
            n_frontier, candidates = self._round(candidates, epoch)
            if n_frontier == 0:
                break
            epoch += 1
            if self.spec.request_limit and self.fetched >= self.spec.request_limit:
                break
        return self.summary()

    def _resume_point(self) -> tuple[int, rd.Dataset]:
        done = sorted(
            int(d.split("=")[1])
            for d in os.listdir(self.job_dir)
            if d.startswith("epoch=")
            and os.path.isfile(os.path.join(self.job_dir, d, "_EPOCH_DONE"))
        )
        if not done:
            return 0, self._seed_candidates()
        last = done[-1]
        with open(os.path.join(self._epoch_dir(last), "_EPOCH_DONE")) as f:
            meta = json.load(f)
        self.next_seq = meta["next_seq"]
        self.fetched = meta["fetched"]
        snaps = _load_seen_snapshot(os.path.join(self._epoch_dir(last), "seen.npz"))
        self.seen.restore(snaps["seen"])
        self.content_seen.restore(snaps["content"])
        links_dir = os.path.join(self._epoch_dir(last), "links")
        if storage.is_complete(links_dir):
            cand = storage.read_dataset(links_dir)
        else:
            cand = rd.from_arrow(OUT_SCHEMA.empty_table())
        return last + 1, cand

    # ------------------------------------------------------------------
    def _round(self, candidates: rd.Dataset, epoch: int) -> tuple[int, rd.Dataset]:
        ed = self._epoch_dir(epoch)
        os.makedirs(ed, exist_ok=True)
        spec = self.spec

        prepared = candidates.map_batches(
            CandidateFilter(spec, self.robots_ref), batch_format="pyarrow"
        )
        deduped = dedup_within_round(prepared)
        gated = deduped.map_batches(
            make_seen_gate(self.seen.shards, self.seen.k), batch_format="pyarrow"
        )
        frontier, self.next_seq = assign_enqueue_seq(gated, self.next_seq)
        # pop-order schedule; budget cap is deterministic because it follows the sort
        frontier = frontier.sort(["priority", "enqueue_seq"], descending=[True, False])
        if spec.request_limit:
            remaining = max(0, spec.request_limit - self.fetched)
            frontier = frontier.limit(remaining)
        frontier = frontier.materialize()
        n_frontier = frontier.count()
        if n_frontier == 0:
            storage.commit_table(_empty_links_table(), os.path.join(ed, "links"))
            _save_seen_snapshot(
                os.path.join(ed, "seen.npz"),
                {"seen": self.seen.snapshot(), "content": self.content_seen.snapshot()},
            )
            _write_done(ed, {"next_seq": self.next_seq, "fetched": self.fetched, "rows": 0})
            return 0, candidates
        self.fetched += n_frontier
        storage.write_dataset(frontier, os.path.join(ed, "frontier"))

        out = frontier.map_batches(
            SyntheticFetchExtract,
            fn_constructor_kwargs=dict(
                pages_path=self.pages_path,
                images_path=self.images_path,
                retry_limit=spec.retry_limit,
                content_size_limit=spec.content_size_limit,
                receive_rules=spec.receive_rules,
                min_doc_bytes=spec.min_doc_bytes,
                aggressive_links=spec.aggressive_links,
                synthesize_pagination=spec.synthesize_pagination,
                request_delay_ms=max(spec.request_delay_ms, 0.0),
            ),
            batch_format="pyarrow",
            batch_size=spec.fetch_batch_size,
            concurrency=spec.fetch_concurrency,
            num_cpus=1,
        ).materialize()

        kinds = {k: out.filter(expr=f"kind == '{k}'") for k in ("fetch", "link", "image", "doc")}

        # images: exact content dedup (D2) via content-seen shards, then phash
        # near-dup flagging (D3) within the round
        images = kinds["image"].map_batches(self._image_rows, batch_format="pyarrow")
        images = images.map_batches(
            make_seen_gate(self.content_seen.shards, self.content_seen.k),
            batch_format="pyarrow",
        ).materialize()  # the gate mutates shard state — run it exactly once
        images = _flag_phash_near_dups(images)
        storage.write_dataset(images, os.path.join(ed, "images"))

        # docs: doc_id exact dedup (D2) + doc_ori_no unique-when-present (D4)
        docs = kinds["doc"].map_batches(_doc_rows, batch_format="pyarrow")
        docs = docs.map_batches(
            make_seen_gate(self.content_seen.shards, self.content_seen.k),
            batch_format="pyarrow",
        )
        docs = _dedup_doc_ori_no(docs)
        storage.write_dataset(docs, os.path.join(ed, "docs"))

        # lineage: raw link rows (replay + next round input)
        links = kinds["link"].map_batches(
            lambda t: t.select(
                ["url", "link_raw", "linktext", "referer", "depth", "is_redirect",
                 "parent_seq", "link_idx"]
            ),
            batch_format="pyarrow",
        )
        storage.write_dataset(links, os.path.join(ed, "links"))

        # metrics (A1): per-partition partial sums → tiny global agg
        metrics = _metrics_table(kinds["fetch"], kinds["image"], epoch)
        storage.commit_table(metrics, os.path.join(ed, "metrics"))

        _save_seen_snapshot(
            os.path.join(ed, "seen.npz"),
            {"seen": self.seen.snapshot(), "content": self.content_seen.snapshot()},
        )
        _write_done(ed, {"next_seq": self.next_seq, "fetched": self.fetched, "rows": n_frontier})
        return n_frontier, storage.read_dataset(os.path.join(ed, "links"))

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
        """Kill the seen-set shard actors (jobs hold them for their lifetime)."""
        self.seen.shutdown()
        self.content_seen.shutdown()

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
                t = storage.load_table(p, columns=["url_md5", "priority", "enqueue_seq"])
                df = t.to_pandas().sort_values(
                    ["priority", "enqueue_seq"], ascending=[False, True], kind="stable"
                )
                out.extend(df["url_md5"].tolist())
        return out


# ---------------------------------------------------------------------------


def _doc_rows(t: pa.Table) -> pa.Table:
    cols = ["doc_id", "url", "doc_ori_no", "title", "author", "tags",
            "publish_time", "t_valid", "content", "negs", "simhash", "enqueue_seq"]
    out = t.select(cols)
    # content-seen gate keys on url_md5; for docs the key is doc_id (D2)
    return out.append_column("url_md5", t.column("doc_id"))


def _dedup_doc_ori_no(ds: rd.Dataset) -> rd.Dataset:
    """D4 — doc_ori_no unique-when-present: groupby keeps smallest seq;
    empty doc_ori_no rows pass through untouched (nulls pass)."""

    def first(g: pa.Table) -> pa.Table:
        # list-typed columns (negs) don't survive pandas → stay in Arrow
        if g.num_rows == 0 or g.column("doc_ori_no")[0].as_py() == "":
            return g
        order = pc.sort_indices(g, sort_keys=[("enqueue_seq", "ascending")])
        return g.take(order[:1])

    return ds.groupby("doc_ori_no").map_groups(first, batch_format="pyarrow")


def _flag_phash_near_dups(ds: rd.Dataset) -> rd.Dataset:
    """D3 — band the 64-bit phash into 4×16-bit keys; within each band
    bucket, rows whose hamming distance to the bucket's first row is ≤ 8 are
    flagged near_dup_of.  Groupby shuffle on the band key only — image bytes
    stay in their blocks (hard part (d): never shuffle blobs on hash keys)."""

    def band_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"band_key": pa.array([], pa.string()),
                             "image_id": pa.array([], pa.string()),
                             "phash": pa.array([], pa.int64()),
                             "enqueue_seq": pa.array([], pa.int64())})
        ph = np.array(t.column("phash").to_pylist(), dtype=np.int64).view(np.uint64)
        bands = hashing.simhash_bands(ph, 4)
        n = t.num_rows
        keys, ids, phs, seqs = [], [], [], []
        iid = t.column("image_id").to_pylist()
        seq = t.column("enqueue_seq").to_pylist()
        for b in range(4):
            for i in range(n):
                keys.append(f"{b}:{bands[i, b]:04x}")
                ids.append(iid[i])
                phs.append(int(np.int64(ph[i])))
                seqs.append(seq[i])
        return pa.table({"band_key": pa.array(keys), "image_id": pa.array(ids),
                         "phash": pa.array(phs, pa.int64()),
                         "enqueue_seq": pa.array(seqs, pa.int64())})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("enqueue_seq", kind="stable")
        if len(g) < 2:
            return pd.DataFrame({"image_id": [], "near_dup_of": []})
        ph = g["phash"].to_numpy(dtype=np.int64).view(np.uint64)
        first = ph[0]
        d = hashing.hamming64(ph[1:], np.full(len(g) - 1, first, dtype=np.uint64))
        dup_ids = g["image_id"].iloc[1:][d <= 8]
        return pd.DataFrame(
            {"image_id": dup_ids, "near_dup_of": g["image_id"].iloc[0]}
        )

    banded = ds.map_batches(band_rows, batch_format="pyarrow")
    dups = banded.groupby("band_key").map_groups(bucket_pairs, batch_format="pandas")
    dup_map: dict[str, str] = {}
    for row in dups.take_all():  # near-dup verdicts are tiny (candidate pairs only)
        dup_map.setdefault(row["image_id"], row["near_dup_of"])
    dup_ref = ray.put(dup_map)

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(dup_ref)
        col = [m.get(i, "") for i in t.column("image_id").to_pylist()]
        return t.append_column("near_dup_of", pa.array(col, pa.string()))

    return ds.map_batches(attach, batch_format="pyarrow")


def _metrics_table(fetch_ds: rd.Dataset, image_ds: rd.Dataset, epoch: int) -> pa.Table:
    from ray.data.aggregate import Count, Sum

    f = fetch_ds.map_batches(
        lambda t: pa.table(
            {
                "links": t.column("bytes_received").is_valid().cast(pa.int64()),
                "bytes_received": t.column("bytes_received").fill_null(0),
                "is_error": pc.cast(pc.not_equal(t.column("error"), ""), pa.int64()),
                "retries": pc.cast(pc.subtract(t.column("attempts"), 1), pa.int64()),
                "fetch_ms": t.column("fetch_ms").fill_null(0.0),
                "is_doc": pc.cast(pc.equal(t.column("status"), 200), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    agg = f.aggregate(
        Count(alias_name="links_followed"),
        Sum("bytes_received", alias_name="bytes_received"),
        Sum("is_error", alias_name="errors"),
        Sum("retries", alias_name="retries"),
        Sum("fetch_ms", alias_name="fetch_ms_sum"),
        Sum("is_doc", alias_name="documents_received"),
    )
    n_images = image_ds.count()
    from ..schemas import METRICS

    return pa.table(
        {
            "epoch": pa.array([epoch], pa.int32()),
            "partition": pa.array([0], pa.int32()),
            "links_followed": pa.array([int(agg.get("links_followed") or 0)], pa.int64()),
            "documents_received": pa.array([int(agg.get("documents_received") or 0)], pa.int64()),
            "bytes_received": pa.array([int(agg.get("bytes_received") or 0)], pa.int64()),
            "errors": pa.array([int(agg.get("errors") or 0)], pa.int64()),
            "retries": pa.array([int(agg.get("retries") or 0)], pa.int64()),
            "fetch_ms_sum": pa.array([float(agg.get("fetch_ms_sum") or 0.0)], pa.float64()),
            "images_written": pa.array([int(n_images)], pa.int64()),
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
