"""Brute-force independent checks for the round-4 second-batch operators —
these recompute the semantics in plain Python/pandas (NOT SQL, NOT the
engine's vectorized arithmetic), so a shared engine/oracle bug can't hide."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def test_interval_overlap_join_bruteforce(ray_session):
    from lightcrawler_ray import relational as rel

    got = rel.interval_overlap_join(SF_DIR).to_pandas()
    pairs = set(zip(got["o_custkey"], got["a_orderkey"], got["b_orderkey"]))
    assert len(pairs) == len(got)  # no duplicate emissions

    o = pq.read_table(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"],
    ).to_pandas()
    o = o[o["o_orderstatus"].isin(["O", "F"])]
    o["s"] = o["o_orderdate"].astype("int64")
    o["e"] = o["s"] + (o["o_orderkey"] % 30 + 1) * DAY_US
    want = set()
    for _, grp in o.groupby("o_custkey"):
        a = grp[grp["o_orderstatus"] == "O"]
        b = grp[grp["o_orderstatus"] == "F"]
        for _, ra in a.iterrows():
            for _, rb in b.iterrows():
                if ra["s"] <= rb["e"] and rb["s"] <= ra["e"]:
                    want.add((ra["o_custkey"], ra["o_orderkey"], rb["o_orderkey"]))
    assert pairs == want


def test_outlier_flags_exact_integer_gate(ray_session):
    from lightcrawler_ray import relational as rel

    got = rel.outlier_flags(SF_DIR).to_pandas()
    o = pq.read_table(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    ).to_pandas()
    cents = {
        int(k): int(v)
        for k, v in zip(o["o_orderkey"], np.rint(o["o_totalprice"] * 100).astype(np.int64))
    }
    stats: dict[str, tuple[int, int, int]] = {}
    for p, grp in o.groupby("o_orderpriority"):
        xs = [cents[int(k)] for k in grp["o_orderkey"]]
        n, sx = len(xs), sum(xs)
        sxx = sum(x * x for x in xs)  # Python big ints — no limb tricks
        stats[p] = (n, sx, 9 * (n * sxx - sx * sx))
    assert got["is_outlier"].any() and not got["is_outlier"].all()
    for row in got.itertuples(index=False):
        n, sx, c = stats[row.o_orderpriority]
        dev = cents[int(row.o_orderkey)] * n - sx
        assert int(row.dev_scaled) == dev
        assert bool(row.is_outlier) == (4 * dev * dev > c), row


def test_order_line_concat_matches_pandas(ray_session):
    from lightcrawler_ray import relational as rel

    got = (
        rel.order_line_concat(SF_DIR).to_pandas().set_index("l_orderkey").sort_index()
    )
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    ).to_pandas()
    want = (
        li.sort_values(["l_orderkey", "l_linenumber"])
        .groupby("l_orderkey")["l_linenumber"]
        .apply(lambda s: "-".join(str(int(v)) for v in s))
    )
    assert got["line_sig"].to_dict() == want.to_dict()
    assert (got["n_lines"] == li.groupby("l_orderkey").size().sort_index()).all()


def test_bloom_decontaminate_one_sided(ray_session):
    """Every doc the EXACT gram-join contamination check flags must also be
    Bloom-flagged (no false negatives); extra Bloom flags are collision FPs.
    On this fixture the 2^16-bit filter is lightly loaded, so the FP excess
    must also stay small (< 5% of train docs)."""
    from lightcrawler_ray.extras import sketches

    got = sketches.bloom_decontaminate(SF_DIR).to_pandas()
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()

    def grams(x: str) -> set:
        t = (x or "").lower().split()
        return {" ".join(t[i : i + 5]) for i in range(len(t) - 4)}

    eval_grams: set = set()
    for r in docs.itertuples(index=False):
        if r.doc_id % 97 == 0:
            eval_grams |= grams(r.text)
    truly = {
        int(r.doc_id)
        for r in docs.itertuples(index=False)
        if r.doc_id % 97 and grams(r.text) & eval_grams
    }
    flagged = set(got.loc[got["flagged"], "doc_id"].astype(int))
    assert truly <= flagged  # one-sided by construction
    assert len(flagged - truly) <= max(2, int(0.05 * len(got)))
    assert set(got["doc_id"]) == {int(d) for d in docs["doc_id"] if d % 97}


def test_pmi_collocations_shape(ray_session):
    from lightcrawler_ray.extras import textstats

    got = textstats.pmi_collocations(SF_DIR, min_count=5, k=50)
    assert list(got.columns) == ["w1", "w2", "c12", "pmi"]
    assert (got["c12"] >= 5).all()
    assert (got["pmi"].to_numpy()[:-1] >= got["pmi"].to_numpy()[1:] - 1e-12).all()
    # independent spot-check of the top hit's PMI from raw corpus counts
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"]).to_pandas()
    from collections import Counter

    uc: Counter = Counter()
    bc: Counter = Counter()
    for x in docs["text"]:
        t = (x or "").lower().split()
        uc.update(t)
        bc.update(zip(t, t[1:]))
    top = got.iloc[0]
    u, b = sum(uc.values()), sum(bc.values())
    c12 = bc[(top.w1, top.w2)]
    assert c12 == top.c12
    want = math.log(c12 / b * u / uc[top.w1] * u / uc[top.w2])
    assert abs(want - top.pmi) < 1e-9


def test_profile_columns_matches_pandas(ray_session):
    from lightcrawler_ray import relational as rel

    got = rel.profile_columns(SF_DIR).set_index("col_name")
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
    ).to_pandas()
    n = len(li)
    cents = np.rint(li["l_extendedprice"] * 100).astype(np.int64)
    units = np.rint(li["l_quantity"]).astype(np.int64)
    ts = li["l_shipdate"].astype("int64")
    for col, series, lo, hi in [
        ("l_extendedprice", cents, cents.min(), cents.max()),
        ("l_quantity", units, units.min(), units.max()),
        ("l_shipdate", ts, ts.min(), ts.max()),
    ]:
        r = got.loc[col]
        assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (n, 0, series.nunique())
        assert (r["min_v"], r["max_v"]) == (float(lo), float(hi))
    for col in ("l_returnflag", "l_linestatus"):
        r = got.loc[col]
        assert (r["n_rows"], r["n_distinct"]) == (n, li[col].nunique())
        assert math.isnan(r["min_v"]) and math.isnan(r["max_v"])
