"""Edge-semantics tests for the round-4 continuation batch: the HLL sketch
(estimate accuracy + merge associativity), the exact-corr limb math at
int64-overflow scale, the PII pattern single-source contract, and the
curation-funnel invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def test_hll_estimate_within_expected_error(ray_session):
    from lightcrawler_ray.extras import sketches

    regs = sketches.hll_registers(SF)
    est = sketches.hll_estimate(regs)
    truth = len(
        np.unique(pq.read_table(f"{SF}/events.parquet", columns=["user_id"])["user_id"])
    )
    # p=10 → std err ≈ 1.04/sqrt(1024) ≈ 3.3%; allow 3 sigma
    assert abs(est - truth) / truth < 0.10, (est, truth)


def test_hll_registers_merge_is_max(ray_session):
    """Register tables from disjoint partitions merge with a plain MAX to the
    full-corpus table — the associativity a multi-node run relies on."""
    from lightcrawler_ray.extras import sketches

    full = sketches.hll_registers(SF).set_index("bucket")["max_rho"]
    uids = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])["user_id"].to_numpy()
    merged: dict[int, int] = {}
    for part in (uids[: len(uids) // 2], uids[len(uids) // 2:]):
        for u in np.unique(part):
            h = sketches._low64(str(int(u)))
            b, rem = h & (sketches.M - 1), h >> sketches.P
            rho = sketches.REM_BITS + 1 - rem.bit_length() if rem else sketches.REM_BITS + 1
            merged[b] = max(merged.get(b, 0), rho)
    assert merged == full.to_dict()


def test_corr_limb_recombination_exact():
    """The hi/lo int64 limb split of Σy² recombines exactly past int64 range."""
    y = np.array([9_999_999] * 4096, np.int64)  # max-ish cents
    yy = y * y
    hi, lo = int((yy >> 30).sum()), int((yy & ((1 << 30) - 1)).sum())
    assert (hi << 30) + lo == int(yy.astype(object).sum())  # exact big-int truth
    # and 3000 such batch-partials still fit the int64 shuffle accumulators
    assert hi * 3000 < 2**63 and lo * 3000 < 2**63


def test_corr_matches_numpy(ray_session):
    from lightcrawler_ray import relational as rel

    df = rel.corr_qty_price(SF).set_index("l_returnflag")
    t = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    ).to_pandas()
    for flag, sub in t.groupby("l_returnflag"):
        ref = np.corrcoef(sub["l_quantity"], sub["l_extendedprice"])[0, 1]
        assert abs(df.loc[flag, "corr_qp"] - ref) < 1e-9
        assert df.loc[flag, "n_rows"] == len(sub)


def test_pii_patterns_single_source():
    """The SQL oracle embeds copies of the textstats patterns (to keep
    oracle_sql() import-light); this pins them identical."""
    import __ray_entry__ as e
    from lightcrawler_ray.extras import textstats

    assert e._PII_EMAIL == textstats.PII_EMAIL
    assert e._PII_IPV4 == textstats.PII_IPV4
    assert e._PII_PHONE == textstats.PII_PHONE


def test_pii_scrub_counts(ray_session):
    from lightcrawler_ray.extras import textstats

    df = textstats.pii_scrub(SF).to_pandas()
    # every doc gets exactly the one planted footer of each class
    assert (df["n_email"] == 1).all() and (df["n_ipv4"] == 1).all() and (df["n_phone"] == 1).all()
    assert (df["red_len"] > 0).all()


def test_curate_funnel_invariants(ray_session):
    from lightcrawler_ray.extras import textstats

    df = textstats.curate_corpus(SF).set_index("stage")["n_docs"]
    assert df["total"] >= df["len_gate"] >= df["lang_gate"] >= df["dedup"] > 0
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert df["total"] == n_docs
    # the prefix key actually collapses something on this corpus
    assert df["dedup"] < df["lang_gate"]


def test_kmv_estimate_accuracy(ray_session):
    from lightcrawler_ray.extras import sketches

    state = sketches.kmv_sketch(SF)
    assert len(state) == 64 and state["h"].is_unique and state["h"].is_monotonic_increasing
    est = sketches.kmv_estimate(state)
    truth = len(
        np.unique(pq.read_table(f"{SF}/events.parquet", columns=["user_id"])["user_id"])
    )
    # k=64 → std err ≈ 1/sqrt(62) ≈ 12.7%; allow 3 sigma
    assert abs(est - truth) / truth < 0.40, (est, truth)


def test_left_enrich_has_hits_and_misses(ray_session):
    from lightcrawler_ray import relational as rel

    df = rel.left_enrich_events(SF).to_pandas()
    assert (df["supp_name"] == "none").any(), "fixture must have unmatched users"
    assert (df["supp_name"] != "none").any(), "fixture must have matched users"
    n = pq.read_metadata(f"{SF}/events.parquet").num_rows
    assert len(df) == n, "LEFT join preserves every left row"


def test_running_total_last_equals_group_sum(ray_session):
    """The final running value per user equals the user's exact total."""
    from lightcrawler_ray import relational as rel

    df = rel.running_total(SF).to_pandas()
    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "value"]).to_pandas()
    t["cents"] = np.rint(t["value"] * 100).astype(np.int64)
    totals = t.groupby("user_id")["cents"].sum() / 100.0
    got = df.groupby("user_id")["running_value"].max()
    # for users whose values are all non-negative, max(running) == total
    nonneg = t.groupby("user_id")["cents"].min() >= 0
    users = nonneg[nonneg].index
    assert len(users) > 0
    assert np.allclose(got.loc[users], totals.loc[users])


def test_bpe_pattern_single_source():
    import __ray_entry__ as e
    from lightcrawler_ray.extras import textstats

    assert e._BPE_PATTERN_SQL == textstats.BPE_PATTERN.replace("'", "''")


def test_order_revenue_join_vs_pandas(ray_session):
    """The co-partitioned shuffle join equals a driver-side merge."""
    from lightcrawler_ray import relational as rel

    got = rel.order_revenue_join(SF).to_pandas().set_index("o_orderpriority").sort_index()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).to_pandas()
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).to_pandas()
    li["rev_u"] = (
        np.rint(li["l_extendedprice"] * 100).astype(np.int64)
        * (100 - np.rint(li["l_discount"] * 100).astype(np.int64))
    )
    m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    ref = m.groupby("o_orderpriority").agg(
        n_orders=("o_orderkey", "nunique"), rev_u=("rev_u", "sum")
    )
    assert (got["n_orders"] == ref["n_orders"]).all()
    assert np.allclose(got["revenue"], ref["rev_u"] / 10000.0)


def test_moving_avg_window_clamps_at_segment_start(ray_session):
    """First row of each user averages only itself; fifth row averages 5."""
    from lightcrawler_ray import relational as rel

    df = rel.moving_avg(SF).to_pandas()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).to_pandas().sort_values(["user_id", "ts", "event_id"])
    ev["cents"] = np.rint(ev["value"] * 100).astype(np.int64)
    first = ev.groupby("user_id").head(1)
    got = df.set_index("event_id")["mavg"]
    assert np.allclose(got.loc[first["event_id"]].to_numpy(),
                       first["cents"].to_numpy() / 100.0)


def test_cms_estimate_upper_bounds_truth(ray_session):
    """CMS never under-counts, and is near-exact for heavy keys at this load."""
    from lightcrawler_ray.extras import sketches

    state = sketches.cms_counts(SF).to_pandas()
    uids = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])["user_id"].to_numpy()
    truth = pd.Series(uids).value_counts()
    total = len(uids)
    for key in truth.index[:5].tolist() + truth.index[-3:].tolist():
        est = sketches.cms_estimate(state, int(key))
        assert est >= truth[key], "CMS must never undercount"
        # standard bound: overcount ≤ e/W * total with prob 1 - e^-D
        assert est - truth[key] <= (2.72 / sketches.CMS_W) * total * 3


def test_image_tile_plan_covers_exactly(ray_session):
    """Tiles partition each image exactly: areas sum to w*h, no overlap."""
    import __ray_entry__ as e

    df = e._q_image_tile_plan("unused").to_pandas()
    _, paths = e._fixture_paths()
    dims = pq.read_table(paths["images"], columns=["image_id", "w", "h"]).to_pandas()
    area = df.assign(a=df["tw"] * df["th"]).groupby("image_id")["a"].sum()
    for _, r in dims.iterrows():
        assert area[r["image_id"]] == r["w"] * r["h"]
    assert (df["tw"] > 0).all() and (df["th"] > 0).all()
    assert (df["x0"] + df["tw"] <= df.merge(dims, on="image_id")["w"]).all()
