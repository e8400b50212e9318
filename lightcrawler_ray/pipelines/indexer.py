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


def token_rows(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """(token, doc_id) posting rows, deduped WITHIN each doc (a posting
    lists a doc once per token)."""

    def tok(t: pa.Table) -> pa.Table:
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
