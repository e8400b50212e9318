"""Brute-force independent checks for the round-4 third-batch operators
(journey analytics, Pareto frontier, distributed ntile, edit-distance join,
z-order keys, partition checksums) — recomputed in plain Python/pandas so a
shared engine/oracle bug can't hide."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _ref_lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


def test_lev_batch_matches_reference():
    from lightcrawler_ray.extras.dedupe import _lev_batch

    rng = np.random.default_rng(7)
    alpha = "abcde"
    pairs = [
        ("".join(rng.choice(list(alpha), rng.integers(0, 9))),
         "".join(rng.choice(list(alpha), rng.integers(0, 9))))
        for _ in range(200)
    ]
    pairs += [("", ""), ("", "abc"), ("abc", ""), ("same", "same")]
    got = _lev_batch([a for a, _ in pairs], [b for _, b in pairs])
    want = np.array([_ref_lev(a, b) for a, b in pairs])
    assert np.array_equal(got, want)


def test_pareto_frontier_ties_and_associativity():
    from lightcrawler_ray.extras.analytics import _frontier

    # duplicates on BOTH axes survive together; dominated-by-equal rows die
    price = np.array([10, 10, 10, 12, 12, 9], np.int64)
    size = np.array([5, 5, 4, 6, 5, 1], np.int64)
    key = np.arange(6, dtype=np.int64)
    keep = set(key[_frontier(price, size, key)])
    # (9,1) cheapest -> survives; both (10,5) survive (tie), (10,4) dominated
    # by (10,5); (12,6) survives; (12,5) dominated by (10,5)
    assert keep == {0, 1, 3, 5}

    rng = np.random.default_rng(11)
    p = rng.integers(0, 20, 400).astype(np.int64)
    s = rng.integers(0, 20, 400).astype(np.int64)
    k = np.arange(400, dtype=np.int64)
    whole = set(k[_frontier(p, s, k)])
    # frontier-of-frontiers over an arbitrary split equals the global one
    ia, ib = k[: 150], k[150:]
    ka = ia[_frontier(p[ia], s[ia], ia)]
    kb = ib[_frontier(p[ib], s[ib], ib)] - 150
    cand = np.concatenate([ka, kb + 150])
    merged = set(cand[_frontier(p[cand], s[cand], cand)])
    assert merged == whole


def test_ntile_boundary_rule_matches_duckdb():
    import duckdb

    from lightcrawler_ray.extras import analytics

    con = duckdb.connect()
    for n in (1, 2, 3, 4, 5, 7, 8, 9, 150):
        q, m = divmod(n, 4)
        r = np.arange(n, dtype=np.int64)
        head = m * (q + 1)
        tile = np.where(r < head, r // max(q + 1, 1) + 1,
                        m + (r - head) // max(q, 1) + 1)
        want = con.execute(
            f"SELECT ntile(4) OVER (ORDER BY x) FROM range({n}) t(x)"
        ).fetch_df().iloc[:, 0].to_numpy()
        assert np.array_equal(tile, want), n


def test_funnel_strictly_after_semantics(ray_session, tmp_path):
    from lightcrawler_ray.extras.analytics import funnel_steps

    us = 1_000_000
    rows = [
        # user 1: click at the SAME microsecond as the view -> not counted;
        # a later click and a purchase BEFORE that click -> stage stops at 2
        (1, 10 * us, "view"), (1, 10 * us, "click"),
        (1, 12 * us, "purchase"), (1, 20 * us, "click"),
        # user 2: full funnel out of order arrival
        (2, 30 * us, "purchase"), (2, 10 * us, "view"),
        (2, 20 * us, "click"),
        # user 3: never views -> stage 0 even though it clicks
        (3, 10 * us, "click"), (3, 20 * us, "purchase"),
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = (funnel_steps(str(tmp_path)).to_pandas()
           .set_index("user_id").sort_index())
    assert got.loc[1, "stage"] == 2
    assert got.loc[1, "first_click_us"] == 20 * us  # same-ts click skipped
    assert got.loc[1, "first_purchase_us"] == -1    # purchase predates click
    assert got.loc[2, "stage"] == 3
    assert got.loc[3, "stage"] == 0
    assert got.loc[3, "first_view_us"] == -1


def test_retention_weekly_bruteforce(ray_session):
    from lightcrawler_ray.extras.analytics import retention_weekly

    got = retention_weekly(SF_DIR).to_pandas().set_index("week").sort_index()
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["week"] = ev["ts"].astype("int64") // (7 * 86_400_000_000)
    aw = ev.drop_duplicates(["user_id", "week"])
    by_week = {}
    for w, grp in aw.groupby("week"):
        users = set(grp["user_id"])
        nxt = set(aw[aw["week"] == w + 1]["user_id"])
        by_week[w] = (len(users), len(users & nxt))
    for w, (na, nr) in by_week.items():
        assert got.loc[w, "n_active"] == na
        assert got.loc[w, "n_retained"] == nr


def test_pagerank_mass_and_order(ray_session):
    from lightcrawler_ray.extras.analytics import pagerank_transitions

    got = pagerank_transitions(SF_DIR)
    assert set(got.columns) == {"event_type", "rank_scaled"}
    total = int(got["rank_scaled"].sum())
    # floor divisions only LOSE mass: total ≤ SCALE, and not by much
    assert 0.98 * 10**12 < total <= 10**12
    assert (got["rank_scaled"] > 0).all()


def test_partition_checksums_split_invariant(ray_session, tmp_path):
    """The additive mod-prime checksum must be identical however the rows
    are blocked — write the same docs as 1 file and as 3 files and compare
    full tables."""
    from lightcrawler_ray.extras.analytics import partition_checksums

    docs = pq.read_table(f"{SF_DIR}/documents.parquet")
    one = tmp_path / "one"; one.mkdir()
    three = tmp_path / "three"; three.mkdir()
    pq.write_table(docs, one / "documents.parquet")
    n = docs.num_rows
    (three / "documents.parquet").mkdir()
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3),
                                  (2 * n // 3, n)]):
        pq.write_table(docs.slice(lo, hi - lo),
                       three / "documents.parquet" / f"part-{i}.parquet")
    a = partition_checksums(str(one))
    b = partition_checksums(str(three))
    assert a.equals(b)
    # spot-check one partition against a direct big-int recomputation
    p = (1 << 61) - 1
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    part0 = [
        (d, x) for d, x in zip(ids, texts)
        if int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:], "little") % 64
        == int(a["part"].iloc[0])
    ]
    ck = sum(
        int.from_bytes(hashlib.md5(f"{d}:{x}".encode()).digest()[8:], "little") % p
        for d, x in part0
    ) % p
    assert int(a["checksum"].iloc[0]) == ck and int(a["n_rows"].iloc[0]) == len(part0)


def test_image_zorder_interleave(ray_session):
    from lightcrawler_ray.extras import multimodal

    from __ray_entry__ import _fixture_paths

    _, paths = _fixture_paths()
    got = multimodal.image_zorder_keys(paths["images"]).to_pandas()

    def morton(w: int, h: int) -> int:
        z = 0
        for b in range(16):
            z |= ((w >> b) & 1) << (2 * b) | ((h >> b) & 1) << (2 * b + 1)
        return z

    for _, r in got.head(50).iterrows():
        assert int(r["zkey"]) == morton(int(r["w"]), int(r["h"]))
        assert int(r["zpart"]) == int(r["zkey"]) >> 24
    # locality: sorting by zkey keeps dimension-adjacent images adjacent
    s = got.sort_values("zkey")
    dw = np.abs(np.diff(s["w"].to_numpy()))
    assert np.median(dw) <= np.median(
        np.abs(np.diff(got.sort_values("image_id")["w"].to_numpy())))


def test_fuzzy_name_pairs_blocking_contract(ray_session):
    from lightcrawler_ray.extras.dedupe import fuzzy_name_pairs

    got = fuzzy_name_pairs(SF_DIR)
    part = pq.read_table(f"{SF_DIR}/part.parquet",
                         columns=["p_partkey", "p_name"]).to_pandas()
    name = dict(zip(part["p_partkey"], part["p_name"]))
    assert (got["a_key"] < got["b_key"]).all()
    for _, r in got.head(100).iterrows():
        assert name[r["a_key"]] == r["a_name"]
        assert name[r["b_key"]] == r["b_name"]
        assert r["a_name"] != r["b_name"]
        assert r["a_name"].rsplit(" ", 1)[-1] == r["b_name"].rsplit(" ", 1)[-1]
        assert 1 <= _ref_lev(r["a_name"], r["b_name"]) == r["dist"] <= 2


def test_q3_bruteforce_pandas(ray_session):
    from lightcrawler_ray import relational as rel

    got = rel.q3_shipping_priority(SF_DIR)
    CUT = 897_868_800_000_000
    cust = pq.read_table(f"{SF_DIR}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pandas()
    bk = set(cust[cust["c_mktsegment"] == "BUILDING"]["c_custkey"])
    orders["odate_us"] = orders["o_orderdate"].astype("int64")
    o = orders[(orders["o_custkey"].isin(bk)) & (orders["odate_us"] < CUT)]
    li = li[li["l_shipdate"].astype("int64") > CUT].copy()
    li["rev_u"] = (
        np.rint(li["l_extendedprice"] * 100).astype(np.int64)
        * (100 - np.rint(li["l_discount"] * 100).astype(np.int64))
    )
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    agg = m.groupby(["l_orderkey", "odate_us", "o_orderpriority"],
                    as_index=False)["rev_u"].sum()
    agg = agg.sort_values(["rev_u", "odate_us", "l_orderkey"],
                          ascending=[False, True, True]).head(10)
    assert list(got["l_orderkey"]) == list(agg["l_orderkey"])
    assert np.allclose(got["revenue"], agg["rev_u"].astype(np.int64) / 10000.0)
    assert list(got["o_orderdate_us"]) == list(agg["odate_us"])


def test_ohlc_open_close_tiebreak(ray_session, tmp_path):
    """Two events at the identical opening microsecond: the lower event_id
    must win open; same at the close."""
    from lightcrawler_ray.relational import ohlc_daily

    us = 1_000_000
    t = pa.table({
        "event_id": pa.array([5, 2, 9, 7], pa.int64()),
        "ts": pa.array([10 * us, 10 * us, 99 * us, 99 * us], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["view"] * 4, pa.string()),
        "value": pa.array([1.11, 2.22, 3.33, 4.44], pa.float64()),
        "props": pa.array(["{}"] * 4, pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = ohlc_daily(str(tmp_path))
    assert len(got) == 1
    assert got.loc[0, "open"] == 2.22   # event_id 2 beats 5 at the same ts
    assert got.loc[0, "close"] == 3.33  # event_id 7... no: 9>7, id 9 later
    assert got.loc[0, "high"] == 4.44 and got.loc[0, "low"] == 1.11
    assert got.loc[0, "n_events"] == 4


def test_weighted_sample_rule_and_bias(ray_session):
    from lightcrawler_ray.extras.sampling import weighted_sample

    got = weighted_sample(SF_DIR).to_pandas()
    orders = pq.read_table(f"{SF_DIR}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice"]).to_pandas()
    cents = np.rint(orders["o_totalprice"] * 100).astype(np.int64)
    keep = {
        int(k) for k, c in zip(orders["o_orderkey"], cents)
        if int.from_bytes(hashlib.md5(str(int(k)).encode()).digest()[8:],
                          "little") % 1_000_000_000 < int(c)
    }
    assert set(got["o_orderkey"]) == keep
    # Horvitz-Thompson: Σ ip_weight over the sample estimates N within 3σ
    n = len(orders)
    est = float(got["ip_weight"].sum())
    p = cents.to_numpy() / 1e9
    sigma = float(np.sqrt(np.sum((1 - p) / p)))
    assert abs(est - n) < 3 * sigma


def test_kmv_per_group_state(ray_session):
    from lightcrawler_ray.extras.sketches import kmv_per_group

    got = kmv_per_group(SF_DIR, k=32)
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    for et, grp in ev.groupby("event_type"):
        hs = sorted({
            int.from_bytes(hashlib.md5(str(int(u)).encode()).digest()[8:],
                           "little") >> 1
            for u in grp["user_id"].unique()
        })[:32]
        sub = got[got["event_type"] == et]
        assert list(sub["h"]) == hs
        assert list(sub["rank"]) == list(range(len(hs)))


def test_heavy_hitters_gate_is_exact(ray_session, tmp_path):
    """One dominant key over a 0.5% threshold, one key just under it."""
    from lightcrawler_ray.extras.sketches import heavy_hitters

    n_bg, n_hot, n_edge = 995, 600, 4  # total 1599; thr: 200*cnt > 1599
    uid = ([i % 500 + 1000 for i in range(n_bg)] + [7] * n_hot + [8] * n_edge)
    t = pa.table({"user_id": pa.array(uid, pa.int64())})
    pq.write_table(t, tmp_path / "events.parquet")
    got = heavy_hitters(str(tmp_path))
    assert 7 in set(got["user_id"])           # 600*200 > 1599
    assert 8 not in set(got["user_id"])       # 4*200 = 800 < 1599
    assert not (got["user_id"] >= 1000).any() # 2-3 repeats each, way under
    row = got[got["user_id"] == 7].iloc[0]
    assert row["cnt"] == n_hot and abs(row["share"] - n_hot / 1599) < 1e-12


def test_percent_rank_matches_window_semantics(ray_session):
    from lightcrawler_ray.extras.analytics import percent_rank_orders

    got = percent_rank_orders(SF_DIR).to_pandas()
    orders = pq.read_table(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"]).to_pandas()
    orders["cents"] = np.rint(orders["o_totalprice"] * 100).astype(np.int64)
    for pri, grp in orders.groupby("o_orderpriority"):
        grp = grp.sort_values(["cents", "o_orderkey"]).reset_index(drop=True)
        sub = (got[got["o_orderpriority"] == pri]
               .sort_values("rnk").reset_index(drop=True))
        assert list(sub["o_orderkey"]) == list(grp["o_orderkey"])
        assert list(sub["rnk"]) == list(range(1, len(grp) + 1))
        ng = len(grp)
        assert np.allclose(sub["pct"],
                           (sub["rnk"] - 1) / max(ng - 1, 1))
