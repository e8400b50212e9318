"""Relational operator pipelines over the driver testdata — the DuckDB-
oracled face of SURVEY.md §2.

Every function takes ``sf_dir`` and returns a Dataset / pandas DataFrame /
Arrow table whose row-set matches the paired SQL in ``__ray_entry__.
oracle_sql()`` (column names included).  Each docstring names the SURVEY
operator(s) the pipeline exercises and the scale pattern it demonstrates
(broadcast vs shuffle, partial aggregation, pruned reads).

Ray is assumed initialised by the caller (driver contract) — nothing here
calls ray.init().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _pq(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    # prune at the read: only requested columns leave storage
    from . import storage

    return storage.read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------


def crawl_report(sf_dir: str) -> pd.DataFrame:
    """A1 — the crawler's global report (links_followed / bytes / averages) as
    a one-row aggregate; partial-per-block then tiny final combine is what
    ``Dataset.aggregate`` does internally.  Sums accumulate in integer cents
    (values are 2-decimal) so the result is block-order independent and
    bit-identical to the decimal oracle."""
    ds = _pq(sf_dir, "events", ["event_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"value_c": pa.array(v, pa.int64())})

    agg = ds.map_batches(cents, batch_format="pyarrow").aggregate(
        Count(alias_name="links_followed"),
        Sum("value_c", alias_name="sum_c"),
        Max("value_c", alias_name="max_c"),
    )
    n = agg["links_followed"]
    total = float(agg["sum_c"]) / 100.0
    return pd.DataFrame([{
        "links_followed": n,
        "bytes_received": total,
        "avg_ms": total / n,
        "max_ms": float(agg["max_c"]) / 100.0,
    }])


def status_gate(sf_dir: str) -> rd.Dataset:
    """M12/M8 — vectorized predicate filter inside map_batches (the
    status==200 && bytes>100 gate shape)."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["event_type"], "purchase"), pc.greater(t["value"], 50.0))
        ).select(["event_id", "user_id", "value"]),
        batch_format="pyarrow",
    )


def priority_topk(sf_dir: str) -> rd.Dataset:
    """O1 — pop-order sort: (value desc, event_id asc) top 100, the frontier
    max-priority-FIFO discipline as a distributed sort + limit."""
    ds = _pq(sf_dir, "events", ["event_id", "value"])
    return ds.sort(["value", "event_id"], descending=[True, False]).limit(100)


def exact_dedup_first(sf_dir: str) -> rd.Dataset:
    """D1/D2 — content-hash dedup keep-first: md5(text) added vectorized in
    map_batches, then a groupby-min shuffle keyed on the hash."""
    import hashlib

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(x.encode()).hexdigest() for x in t.column("text").to_pylist()]
        return pa.table({"doc_hash": pa.array(h), "doc_id": t.column("doc_id")})

    return ds.map_batches(add_hash, batch_format="pyarrow").groupby("doc_hash").aggregate(
        Min("doc_id", alias_name="first_doc")
    )


def anti_join_new(sf_dir: str) -> rd.Dataset:
    """J1 — frontier∖seen anti-join: the small side (supplier keys) is
    broadcast via ray.put once and probed per batch with searchsorted; no
    shuffle.  (Suppliers, not customers: the customer key space covers every
    event user at all scale factors, which would make the result empty.)"""
    import pyarrow.parquet as pq

    keys = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"]).column(
        "s_suppkey"
    )
    keys_ref = ray.put(np.unique(keys.to_numpy().astype(np.int64)))
    ds = _pq(sf_dir, "events", ["event_id", "user_id"])

    def probe(t: pa.Table) -> pa.Table:
        karr = ray.get(keys_ref)
        uid = t.column("user_id").to_numpy()
        idx = np.searchsorted(karr, uid)
        idx = np.clip(idx, 0, len(karr) - 1)
        hit = karr[idx] == uid
        return t.filter(pa.array(~hit))

    return ds.map_batches(probe, batch_format="pyarrow")


def dim_enrich(sf_dir: str) -> rd.Dataset:
    """J5 — dimension broadcast hash join (cause-of-action / court lookup
    analog): nation is tiny → dict in the object store, mapped per batch;
    aggregation is a partial sum inside map_batches before the key shuffle."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nmap_ref = ray.put(dict(zip(nation.column("n_nationkey").to_pylist(),
                                nation.column("n_name").to_pylist())))
    ds = _pq(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def enrich_partial(t: pa.Table) -> pa.Table:
        nmap = ray.get(nmap_ref)
        df = t.to_pandas()
        df["nation"] = df["c_nationkey"].map(nmap)
        g = df.groupby("nation", as_index=False).agg(
            n_customers=("c_acctbal", "size"), total_bal=("c_acctbal", "sum")
        )
        # strip the pandas schema metadata: its dict makes block schemas
        # unhashable and Ray Data logs a warning per reduce task
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    partial = ds.map_batches(enrich_partial, batch_format="pyarrow")
    return partial.groupby("nation").aggregate(
        Sum("n_customers", alias_name="n_customers"), Sum("total_bal", alias_name="total_bal")
    )


def pricing_summary(sf_dir: str) -> rd.Dataset:
    """A1 at TPC-H Q1 shape — pre-aggregate per batch inside map_batches
    (partial combiner), then groupby-sum over the tiny partials: the
    shuffle moves O(groups × blocks) rows instead of O(n).

    Numerics: TPC-H prices/discounts are 2-decimal decimals, so partial sums
    accumulate in exact integer units (cents for qty/base, 10^-4 dollars for
    disc_price) and convert to float only in the final projection — the
    result is block-order independent and bit-identical to the decimal
    oracle, where a float partial-sum tree would drift ~1e-5 across runs."""
    ds = _pq(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        if t.num_rows == 0:
            return pa.table(
                {"l_returnflag": pa.array([], pa.string()),
                 "l_linestatus": pa.array([], pa.string()),
                 "qty_u": pa.array([], pa.int64()),
                 "base_u": pa.array([], pa.int64()),
                 "disc_u": pa.array([], pa.int64()),
                 "count_order": pa.array([], pa.int64())}
            )
        df = t.to_pandas()
        qty_u = np.rint(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        base_u = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_h = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        df2 = pd.DataFrame({
            "l_returnflag": df["l_returnflag"], "l_linestatus": df["l_linestatus"],
            "qty_u": qty_u, "base_u": base_u, "disc_u": base_u * (100 - disc_h),
        })
        g = df2.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            qty_u=("qty_u", "sum"), base_u=("base_u", "sum"),
            disc_u=("disc_u", "sum"), count_order=("qty_u", "size"),
        )
        # strip the pandas schema metadata: its dict makes block schemas
        # unhashable and Ray Data logs a warning per reduce task
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_u", alias_name="qty_u"),
            Sum("base_u", alias_name="base_u"),
            Sum("disc_u", alias_name="disc_u"),
            Sum("count_order", alias_name="count_order"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"], "l_linestatus": t["l_linestatus"],
            "sum_qty": pc.divide(pc.cast(t["qty_u"], pa.float64()), 100.0),
            "sum_base": pc.divide(pc.cast(t["base_u"], pa.float64()), 100.0),
            "sum_disc_price": pc.divide(pc.cast(t["disc_u"], pa.float64()), 10000.0),
            "count_order": t["count_order"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def top_revenue(sf_dir: str) -> rd.Dataset:
    """O1+A1 — aggregate then top-k: revenue per customer, top 10
    (deterministic tie-break on the key).  Per-customer sums accumulate in
    integer cents (prices are 2-decimal) — block-order independent, matching
    the decimal oracle bit-for-bit."""
    ds = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.rint(t.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "rev_c": pa.array(v, pa.int64())})

    agg = (
        ds.map_batches(cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("rev_c", alias_name="rev_c"))
    )
    top = agg.sort(["rev_c", "o_custkey"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda t: pa.table({
            "o_custkey": t.column("o_custkey"),
            "revenue": pc.divide(pc.cast(t.column("rev_c"), pa.float64()), 100.0),
        }),
        batch_format="pyarrow",
    )


def union_seeds(sf_dir: str) -> rd.Dataset:
    """D5 — seed-list union (duplicates preserved, as UNION ALL)."""
    a = status_gate(sf_dir).map_batches(
        lambda t: t.select(["event_id"]), batch_format="pyarrow"
    )
    b = _pq(sf_dir, "events", ["event_id", "value"]).map_batches(
        lambda t: t.filter(pc.greater(t["value"], 90.0)).select(["event_id"]),
        batch_format="pyarrow",
    )
    return a.union(b)


def distinct_langs(sf_dir: str) -> pd.DataFrame:
    """A5 — distinct values of one column (shuffle on the column)."""
    vals = _pq(sf_dir, "documents", ["lang"]).unique("lang")
    return pd.DataFrame({"lang": sorted(vals)})


def tumbling_window(sf_dir: str) -> rd.Dataset:
    """Streaming shape (SURVEY.md §2.9) — tumbling 1-hour window per user as
    a derived-key groupby: bucket computed vectorized, then partial-agg +
    final combine exactly like pricing_summary."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "value"])

    def bucketize(t: pa.Table) -> pa.Table:
        secs = pc.cast(t["ts"], pa.int64())  # µs since epoch
        hour = pc.divide(secs, 3_600_000_000)
        return pa.table(
            {"user_id": t["user_id"], "hour_bucket": hour, "value": t["value"]}
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["user_id", "hour_bucket"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )


def sessionize(sf_dir: str) -> rd.Dataset:
    """Stateful per-key ordering (map_groups): sessions split at >30 min
    gaps; partition by user, sort by ts inside the group — the pattern for
    every 'ordered log per key' operator."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def count_sessions(g: pd.DataFrame) -> pa.Table:
        ts = g["ts"].sort_values()
        gaps = ts.diff().dt.total_seconds().fillna(1e18)
        return pa.table(
            {"user_id": pa.array([g["user_id"].iloc[0]], pa.int64()),
             "n_sessions": pa.array([int((gaps > 1800).sum())], pa.int64())}
        )

    return ds.groupby("user_id").map_groups(count_sessions, batch_format="pandas")
