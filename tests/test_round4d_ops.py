"""Brute-force independent checks for the explicit-exchange-plan operators
(extras/joins.py): skew-salted join, Q5-shaped multiway join, EXISTS
semi-join, SCD2 intervals — recomputed in plain pandas so a shared
engine/oracle bug can't hide, plus salt-invariance (the property the
salted plan must preserve)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _read(table: str, cols=None) -> pd.DataFrame:
    return pq.read_table(f"{SF_DIR}/{table}.parquet", columns=cols).to_pandas()


def _rev_u(df: pd.DataFrame) -> np.ndarray:
    base = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    disc = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
    return base * (100 - disc)


def test_skew_salted_join_vs_pandas(ray_session):
    from lightcrawler_ray.extras.joins import skew_salted_join

    got = skew_salted_join(SF_DIR).to_pandas().sort_values("p_brand").reset_index(drop=True)

    li = _read("lineitem")
    part = _read("part", ["p_partkey", "p_brand"])
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j["rev_u"] = _rev_u(j)
    exp = (
        j.groupby("p_brand")
        .agg(n_lines=("rev_u", "size"), rev_u=("rev_u", "sum"))
        .reset_index()
    )
    exp["revenue"] = exp["rev_u"] / 10000.0
    exp = exp.drop(columns="rev_u").sort_values("p_brand").reset_index(drop=True)

    assert len(got) == len(exp)
    assert (got["p_brand"] == exp["p_brand"]).all()
    assert (got["n_lines"].to_numpy() == exp["n_lines"].to_numpy()).all()
    assert np.allclose(got["revenue"], exp["revenue"], rtol=0, atol=1e-9)


def test_skew_salted_join_salt_invariant(ray_session):
    """The whole point of salting: n_salts must never change the answer."""
    from lightcrawler_ray.extras.joins import skew_salted_join

    a = skew_salted_join(SF_DIR, n_salts=1).to_pandas().sort_values("p_brand").reset_index(drop=True)
    b = skew_salted_join(SF_DIR, n_salts=8).to_pandas().sort_values("p_brand").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_q5_local_supplier_vs_pandas(ray_session):
    from lightcrawler_ray.extras.joins import q5_local_supplier

    got = q5_local_supplier(SF_DIR).to_pandas().sort_values("n_name").reset_index(drop=True)

    cust = _read("customer", ["c_custkey", "c_nationkey"])
    orders = _read("orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read("lineitem")
    supp = _read("supplier", ["s_suppkey", "s_nationkey"])
    nat = _read("nation")
    reg = _read("region")
    rk = int(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    nat = nat[nat["n_regionkey"] == rk]

    o = orders[(orders["o_orderdate"] >= pd.Timestamp("1996-01-01"))
               & (orders["o_orderdate"] < pd.Timestamp("1998-01-01"))]
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    )
    j = j[j["c_nationkey"] == j["s_nationkey"]].copy()
    j["rev_u"] = _rev_u(j)
    exp = j.groupby("n_name")["rev_u"].sum().reset_index()
    exp["revenue"] = exp["rev_u"] / 10000.0
    exp = exp.drop(columns="rev_u").sort_values("n_name").reset_index(drop=True)

    assert len(got) == len(exp)
    assert (got["n_name"] == exp["n_name"]).all()
    assert np.allclose(got["revenue"], exp["revenue"], rtol=0, atol=1e-9)


def test_semi_join_parts_vs_pandas(ray_session):
    from lightcrawler_ray.extras.joins import semi_join_parts

    got = semi_join_parts(SF_DIR).to_pandas().sort_values("p_partkey").reset_index(drop=True)

    li = _read("lineitem", ["l_partkey", "l_discount", "l_shipdate"])
    part = _read("part", ["p_partkey", "p_brand", "p_size"])
    keep = li[(li["l_discount"] >= 0.05)
              & (li["l_shipdate"] >= pd.Timestamp("2000-01-01"))]
    keys = set(keep["l_partkey"].tolist())
    exp = part[part["p_partkey"].isin(keys)].sort_values("p_partkey").reset_index(drop=True)

    assert len(got) == len(exp)
    assert (got["p_partkey"].to_numpy() == exp["p_partkey"].to_numpy()).all()
    assert (got["p_brand"] == exp["p_brand"]).all()
    assert (got["p_size"].to_numpy().astype(np.int64)
            == exp["p_size"].to_numpy().astype(np.int64)).all()


def test_scd2_intervals_vs_pandas(ray_session):
    from lightcrawler_ray.extras.joins import scd2_intervals

    got = (scd2_intervals(SF_DIR).to_pandas()
           .sort_values(["o_custkey", "valid_from", "o_orderkey"])
           .reset_index(drop=True))

    orders = _read("orders", ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"])
    exp = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).copy()
    exp["valid_to"] = (exp.groupby("o_custkey")["o_orderdate"].shift(-1)
                       .fillna(pd.Timestamp("9999-12-31")))
    exp = exp.rename(columns={"o_orderdate": "valid_from"}).reset_index(drop=True)

    assert len(got) == len(exp)
    for c in ("o_custkey", "o_orderkey", "valid_from", "valid_to"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # exactly one open (sentinel-ended) interval per customer
    open_per_cust = (got[got["valid_to"] == pd.Timestamp("9999-12-31")]
                     .groupby("o_custkey").size())
    assert (open_per_cust == 1).all()
    assert open_per_cust.index.nunique() == got["o_custkey"].nunique()
