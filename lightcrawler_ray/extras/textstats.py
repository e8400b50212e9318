"""Text-analysis operators over the documents table: token counting,
stopword ratio, language id, quality scoring, fingerprinting.

Each is a vectorized (or tight-python over batch) map_batches stage; the
SQL-oracled ones (token count, stopword ratio, lang id) use semantics chosen
to be expressible identically in DuckDB (split on single spaces, fixed
stopword list, substring windows) so the driver's value-hash comparison is
exact."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions import texttools

# fixed list shared with the SQL oracle (order irrelevant, membership exact)
STOPWORDS = ("the", "of", "and", "a", "to", "in", "is", "was", "it", "for")


def _docs(sf_dir: str, cols: list[str]) -> rd.Dataset:
    from .. import storage

    return storage.read_parquet_clean(f"{sf_dir}/documents.parquet", columns=cols)


def token_counts(sf_dir: str) -> rd.Dataset:
    """Whitespace token count per doc (SQL: len(string_split_regex(trim, '\\s+')))."""

    def f(t: pa.Table) -> pa.Table:
        n = [len(x.split()) if x.strip() else 0 for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"), "n_tokens": pa.array(n, pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def stopword_ratio(sf_dir: str) -> rd.Dataset:
    """Stopword fraction over single-space-split lowercase tokens — the
    quality-score ingredient, kept SQL-mirrorable."""
    sw = set(STOPWORDS)

    def f(t: pa.Table) -> pa.Table:
        out = []
        for x in t.column("text").to_pylist():
            toks = x.lower().split(" ")
            out.append(sum(tk in sw for tk in toks) / len(toks) if toks else 0.0)
        return pa.table({"doc_id": t.column("doc_id"), "stop_ratio": pa.array(out, pa.float64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def lang_id(sf_dir: str) -> rd.Dataset:
    """Heuristic language id (zh/en/other) on the first 2000 chars: CJK char
    ratio > 0.15 → zh; latin ratio > 0.4 AND a stopword present → en; else
    other.  Same arithmetic in the SQL oracle."""

    def f(t: pa.Table) -> pa.Table:
        out = []
        for x in t.column("text").to_pylist():
            out.append(texttools.lang_id(x))
        return pa.table({"doc_id": t.column("doc_id"), "lang_pred": pa.array(out, pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> rd.Dataset:
    """Composite quality heuristic (length/punct/stopword); oracle-checked —
    the SQL mirror replays the same double ops in the same order."""

    def f(t: pa.Table) -> pa.Table:
        out = [texttools.quality_score(x) for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"), "quality": pa.array(out, pa.float64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def fingerprints(sf_dir: str) -> rd.Dataset:
    """Rolling-hash winnowing fingerprint per doc; oracle-checked — the SQL
    mirror computes each window polynomial in HUGEINT mod 2^63."""

    def f(t: pa.Table) -> pa.Table:
        out = [texttools.fingerprint(x) for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"), "fingerprint": pa.array(out, pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")
