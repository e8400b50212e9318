"""S10 — full-text index builder as a Ray Data batch job.

Reference: worker/IndexBuilder.class.php:20-85 — paged scan of stored doc
records (resume watermark in ``indexed_id.txt``), each fed to a full-text
engine.  Ray-Data-first restatement: the docs table STREAMS through a
tokenize ``map_batches``, the (token, doc_id) posting rows go through ONE
global sort (the only all-to-all — index building is inherently a shuffle),
and the result lands as token-ordered parquet parts whose row-group stats
give min/max token pruning for lookups — i.e. the index IS the partitioned
sink, no external engine.  ``_SUCCESS`` marks a completed build (the
watermark analog: a resumed job skips a finished index).

Tokenizer: lowercase whitespace split — deliberately SQL-mirrorable so the
document-frequency aggregate (``term_df``) is DuckDB-oracle-checkable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count

from .. import storage


def tokenize_table(t: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(token, doc_id) posting rows for one Arrow batch, deduped WITHIN each
    doc (a posting lists a doc once per token) — the one tokenize path
    shared by the batch builder and the streaming indexer."""
    out_tok: list[str] = []
    out_id: list = []
    ids = t.column(id_col).to_pylist()
    for did, text in zip(ids, t.column(text_col).to_pylist()):
        seen = set()
        for w in (text or "").lower().split():
            if w and w not in seen:
                seen.add(w)
                out_tok.append(w)
                out_id.append(did)
    return pa.table({
        "token": pa.array(out_tok, pa.string()),
        "doc_id": pa.array(out_id, t.column(id_col).type),
    })


def token_rows(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """(token, doc_id) posting rows as a streaming Dataset transform."""

    def tok(t: pa.Table) -> pa.Table:
        return tokenize_table(t, text_col, id_col)

    return ds.map_batches(tok, batch_format="pyarrow")


def build_index(ds: rd.Dataset, out_dir: str,
                text_col: str = "text", id_col: str = "doc_id") -> int:
    """Build the token-ordered posting index under ``out_dir``; returns the
    number of postings.  A completed index (``_SUCCESS``) is skipped —
    the reference's resume-watermark behavior at whole-index granularity."""
    if storage.is_complete(out_dir):
        return -1
    rows = token_rows(ds, text_col, id_col).sort(["token", "doc_id"])
    storage.write_dataset(rows, out_dir)
    import pyarrow.parquet as pq
    import os

    n = 0
    for f in os.listdir(out_dir):
        if f.endswith(".parquet"):
            n += pq.read_metadata(os.path.join(out_dir, f)).num_rows
    return n


def lookup(out_dir: str, token: str) -> list:
    """doc_ids containing ``token`` — parquet predicate pushdown over the
    token-sorted parts (row-group stats prune everything else)."""
    import pyarrow.parquet as pq
    import os

    out = []
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(
            os.path.join(out_dir, f), columns=["token", "doc_id"],
            filters=[("token", "==", token)],
        )
        out.extend(t.column("doc_id").to_pylist())
    return sorted(out)


import ray


@ray.remote(num_cpus=1)
class StreamingIndexer:
    """S10 streaming variant — the reference's queue-driven IndexManager
    (worker/IndexManager.class.php:40-60: a redis ``blPop`` loop feeding
    freshly-stored doc records into the index as they arrive).

    Ray restatement: the actor's mailbox IS the queue — sink stages call
    ``submit(doc_batch, seq)`` as batches land, and each increment runs the
    SAME ``tokenize_table`` path as the batch builder, landing as a
    token-sorted parquet part in the index directory, so :func:`lookup`
    spans batch-built and streamed postings unchanged (row-group stats
    prune within each part).  The watermark (the reference's
    ``indexed_id.txt``) records the highest applied increment; replayed
    increments at or below it are skipped, making producer retries
    exactly-once.  Increments are assumed in-order per producer (Ray actor
    mailboxes preserve per-caller order, like the single blPop consumer).

    Scale note: one actor serializes index writes the way the reference's
    single IndexManager process does; shard by hash(doc_id) across K actors
    (each with its own directory) when ingest outruns one tokenizer."""

    def __init__(self, out_dir: str, text_col: str = "text", id_col: str = "doc_id"):
        import os

        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.text_col = text_col
        self.id_col = id_col
        self._wm_path = os.path.join(out_dir, "watermark.txt")
        self.watermark = -1
        if os.path.isfile(self._wm_path):  # resume: re-attach to the index
            with open(self._wm_path) as f:
                self.watermark = int(f.read().strip() or -1)

    def submit(self, t: pa.Table, seq: int) -> int:
        """Apply one doc-batch increment; returns postings written (0 for a
        replayed seq)."""
        import os
        import tempfile

        import pyarrow.parquet as pq

        if seq <= self.watermark:
            return 0
        rows = tokenize_table(t, self.text_col, self.id_col).sort_by(
            [("token", "ascending"), ("doc_id", "ascending")]
        )
        pq.write_table(rows, os.path.join(self.out_dir, f"incr-{seq:06d}.parquet"))
        # watermark moves only after the part is durable (crash between the
        # two re-applies the increment — same-name overwrite, idempotent)
        fd, tmp = tempfile.mkstemp(dir=self.out_dir)
        with os.fdopen(fd, "w") as f:
            f.write(str(seq))
        os.replace(tmp, self._wm_path)
        self.watermark = seq
        return rows.num_rows

    def get_watermark(self) -> int:
        return self.watermark


def bm25_topk(
    sf_dir: str,
    terms: tuple[str, ...] = ("query", "window", "scan"),
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> "pd.DataFrame":
    """BM25-ranked retrieval over the postings (Robertson/Okapi, the
    Lucene-variant idf ``ln((N - df + 0.5)/(df + 0.5) + 1)``) — the scoring
    face of the S10 index.  SQL-oracled end-to-end (same tokenizer, same
    constants, same tie-break).

    Scale shape: TWO streaming passes over the docs table, ZERO shuffles —
    pass 1 is a partial-aggregate map_batches (per-batch doc count, total
    length, per-query-term df) whose per-batch rows reduce driver-side to
    the global (N, avgdl, df_t); pass 2 re-streams the corpus emitting
    (doc_id, dl, tf_t...) ONLY for docs containing a query term (the
    candidate set — bounded by the posting lists, never the corpus), scored
    vectorized and top-k'd.  With a pre-built index the candidate pass
    would be ``lookup()`` point reads instead of a scan; the scan keeps the
    oracle replayable over the raw table."""
    import math

    import pandas as pd

    from .. import storage

    terms = tuple(terms)
    t_index = {t: i for i, t in enumerate(terms)}

    def stats_partial(t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        sum_dl = 0
        dfv = [0] * len(terms)
        for text in t.column("text").to_pylist():
            toks = (text or "").lower().split()
            sum_dl += len(toks)
            present = set(toks) & t_index.keys()
            for w in present:
                dfv[t_index[w]] += 1
        return pa.table({
            "n_docs": pa.array([n_docs], pa.int64()),
            "sum_dl": pa.array([sum_dl], pa.int64()),
            **{f"df_{i}": pa.array([dfv[i]], pa.int64()) for i in range(len(terms))},
        })

    ds = storage.read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    agg = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_total = int(agg["n_docs"].sum())
    avgdl = float(agg["sum_dl"].sum()) / max(1, n_total)
    df_t = [int(agg[f"df_{i}"].sum()) for i in range(len(terms))]
    idf = [math.log((n_total - d + 0.5) / (d + 0.5) + 1.0) for d in df_t]

    def candidate_rows(t: pa.Table) -> pa.Table:
        out_id, out_dl, out_tf = [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            toks = (text or "").lower().split()
            tf = [0] * len(terms)
            hit = False
            for w in toks:
                i = t_index.get(w)
                if i is not None:
                    tf[i] += 1
                    hit = True
            if hit:
                out_id.append(did)
                out_dl.append(len(toks))
                out_tf.append(tf)
        cols = {
            "doc_id": pa.array(out_id, pa.int64()),
            "dl": pa.array(out_dl, pa.int64()),
        }
        for i in range(len(terms)):
            cols[f"tf_{i}"] = pa.array([v[i] for v in out_tf], pa.int64())
        return pa.table(cols)

    cand = ds.map_batches(candidate_rows, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    import numpy as np

    dl = cand["dl"].to_numpy(dtype=np.float64)
    norm = k1 * (1.0 - b + b * dl / avgdl)
    score = np.zeros(len(cand))
    for i in range(len(terms)):
        tf = cand[f"tf_{i}"].to_numpy(dtype=np.float64)
        score += idf[i] * (tf * (k1 + 1.0)) / (tf + norm)
    out = pd.DataFrame({"doc_id": cand["doc_id"], "score": score})
    out = out.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)


def term_df(sf_dir: str) -> rd.Dataset:
    """Document frequency per token over the documents table — the
    oracle-checkable aggregation face of the index build (same posting rows,
    groupby-count instead of sort+write)."""
    ds = storage.read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return (
        token_rows(ds)
        .groupby("token")
        .aggregate(Count(alias_name="df"))
    )
