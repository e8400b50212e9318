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


def _fixture_images() -> pd.DataFrame:
    from lightcrawler_ray.sources import synth

    p = synth.GraphParams(n_pages=300, n_hosts=6, n_images=120, out_degree=6)
    paths = synth.ensure_fixtures(p)
    return pq.read_table(paths["images"]).to_pandas(), paths


def test_image_keep_best_vs_pandas(ray_session):
    from lightcrawler_ray.extras.multimodal import image_keep_best

    imgs, paths = _fixture_images()
    got = image_keep_best(paths["images"]).to_pandas().sort_values("phash").reset_index(drop=True)

    df = imgs.copy()
    df["px"] = df["w"].astype(np.int64) * df["h"].astype(np.int64)
    df = df.sort_values(["phash", "px", "image_id"],
                        ascending=[True, False, True])
    exp = df.groupby("phash", sort=True).agg(
        image_id=("image_id", "first"), w=("w", "first"), h=("h", "first"),
        n_dups=("image_id", "size")).reset_index()

    assert len(got) == len(exp)
    assert (got["image_id"].to_numpy() == exp["image_id"].to_numpy()).all()
    assert (got["n_dups"].to_numpy() == exp["n_dups"].to_numpy()).all()
    assert int(got["n_dups"].sum()) == len(imgs)  # every image accounted for


def test_image_shard_plan_vs_pandas(ray_session):
    from lightcrawler_ray.extras.multimodal import image_shard_plan

    imgs, paths = _fixture_images()
    got = image_shard_plan(paths["images"])

    w = imgs["w"].to_numpy(np.uint64)
    h = imgs["h"].to_numpy(np.uint64)
    z = np.zeros(len(imgs), np.uint64)
    for b in range(16):
        z |= ((w >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b)
        z |= ((h >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b + 1)
    df = pd.DataFrame({
        "image_id": imgs["image_id"], "zkey": z.astype(np.int64),
        "nbytes": imgs["bytes"].map(len).astype(np.int64),
    }).sort_values(["zkey", "image_id"]).reset_index(drop=True)
    df["byte_offset"] = df["nbytes"].cumsum() - df["nbytes"]
    df["shard"] = df["byte_offset"] // 262144

    assert len(got) == len(df)
    for c in ("image_id", "zkey", "nbytes", "byte_offset", "shard"):
        assert (got[c].to_numpy() == df[c].to_numpy()).all(), c
    # shard ids are non-decreasing in layout order and start at 0
    assert got["shard"].iloc[0] == 0
    assert (np.diff(got["shard"].to_numpy()) >= 0).all()


def test_mad_per_group_vs_pandas(ray_session):
    from lightcrawler_ray.relational import mad_per_group

    got = mad_per_group(SF_DIR).sort_values("l_returnflag").reset_index(drop=True)

    li = _read("lineitem", ["l_returnflag", "l_extendedprice"])
    li["cents"] = np.rint(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)

    def rank_stat(v: np.ndarray) -> int:
        v = np.sort(v)
        return int(v[int(np.ceil(0.5 * len(v))) - 1])

    rows = []
    for g, part in li.groupby("l_returnflag", sort=True):
        med = rank_stat(part["cents"].to_numpy())
        mad = rank_stat(np.abs(part["cents"].to_numpy() - med))
        rows.append((g, med / 100.0, mad / 100.0))
    exp = pd.DataFrame(rows, columns=["l_returnflag", "median", "mad"])

    assert len(got) == len(exp)
    assert (got["l_returnflag"] == exp["l_returnflag"]).all()
    assert np.allclose(got["median"], exp["median"], atol=1e-9)
    assert np.allclose(got["mad"], exp["mad"], atol=1e-9)


def test_robust_outliers_vs_pandas(ray_session):
    from lightcrawler_ray.relational import robust_outliers

    got = (robust_outliers(SF_DIR).to_pandas()
           .sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True))

    li = _read("lineitem", ["l_orderkey", "l_linenumber", "l_returnflag",
                            "l_extendedprice"])
    li["cents"] = np.rint(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)

    def rank_stat(v):
        v = np.sort(v)
        return int(v[int(np.ceil(0.5 * len(v))) - 1])

    keep = np.zeros(len(li), bool)
    for g, part in li.groupby("l_returnflag"):
        med = rank_stat(part["cents"].to_numpy())
        mad = rank_stat(np.abs(part["cents"].to_numpy() - med))
        keep[part.index] = 2 * np.abs(part["cents"].to_numpy() - med) > 3 * mad
    exp = (li[keep].drop(columns="cents")
           .sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True))

    assert len(got) == len(exp)
    for c in ("l_orderkey", "l_linenumber", "l_returnflag"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_kmv_intersect_vs_python(ray_session):
    from lightcrawler_ray.extras.sketches import kmv_intersect

    got = kmv_intersect(SF_DIR).sort_values(["ta", "tb"]).reset_index(drop=True)

    ev = _read("events", ["event_type", "user_id"])
    K = 32
    regs = {}
    import hashlib
    for g, part in ev.groupby("event_type"):
        hs = sorted({
            int.from_bytes(hashlib.md5(str(int(u)).encode()).digest()[8:],
                           "little") >> 1
            for u in part["user_id"].unique()
        })
        regs[g] = np.array(hs[:K], np.int64)
    groups = sorted(regs)
    rows = []
    EVERYTHING = (1 << 63) - 1
    for i, ta in enumerate(groups):
        for tb in groups[i + 1:]:
            ha, hb = regs[ta], regs[tb]
            theta = min(int(ha[-1]) if len(ha) >= K else EVERYTHING,
                        int(hb[-1]) if len(hb) >= K else EVERYTHING)
            common = np.intersect1d(ha, hb)
            n_common = int((common < theta).sum())
            rows.append((ta, tb, theta, n_common,
                         n_common * float(1 << 63) / theta))
    exp = pd.DataFrame(rows, columns=["ta", "tb", "theta", "n_common",
                                      "est_common"]).sort_values(["ta", "tb"]).reset_index(drop=True)

    assert len(got) == len(exp)
    for c in ("ta", "tb", "theta", "n_common"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert np.allclose(got["est_common"], exp["est_common"], rtol=0, atol=0)

    # the estimate must be in the right ballpark of the true overlap
    true = {}
    by_g = {g: set(p["user_id"].unique()) for g, p in ev.groupby("event_type")}
    for _, r in got.iterrows():
        t = len(by_g[r["ta"]] & by_g[r["tb"]])
        assert abs(r["est_common"] - t) <= max(10, 0.8 * t), (r["ta"], r["tb"], t, r["est_common"])
