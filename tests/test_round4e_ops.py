"""Unit guards for the fifth round-4 operator batch: the offset-shifted
segmented cummax (running_max_drawdown), the vectorized per-batch char
entropy, and the HUGEINT-OLS finalize — each checked against an
independent naive implementation (oracle parity is covered separately in
test_oracle_parity.py)."""

from __future__ import annotations

from collections import Counter

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_running_max_drawdown_matches_pandas(ray_session):
    from lightcrawler_ray import relational as rel

    got = (rel.running_max_drawdown(SF_DIR).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    ev["cents"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["rmax"] = ev.groupby("user_id")["cents"].cummax()
    exp = ev.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(ev)
    assert (got["event_id"].to_numpy() == exp["event_id"].to_numpy()).all()
    # same int64/100.0 division both sides → bit-exact
    assert np.array_equal(got["running_max"].to_numpy(),
                          exp["rmax"].to_numpy() / 100.0)
    assert np.array_equal(got["drawdown"].to_numpy(),
                          (exp["rmax"] - exp["cents"]).to_numpy() / 100.0)


def test_segmented_cummax_handles_negative_values(ray_session):
    """The offset-shift trick must reset at every segment even when values
    are negative (the shift rides ABOVE the span, not above zero)."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 5000
    users = rng.integers(0, 40, n).astype(np.int64)
    vals = rng.integers(-10_000_00, 10_000_00, n) / 100.0  # negative cents too
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.permutation(n), unit="s")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": users,
        "ts": ts,
        "value": vals,
    })
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df), f"{d}/events.parquet")
        from lightcrawler_ray import relational as rel

        got = (rel.running_max_drawdown(d).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
    cents = np.rint(vals * 100).astype(np.int64)
    exp = df.assign(cents=cents).sort_values(["user_id", "ts", "event_id"])
    exp["rmax"] = exp.groupby("user_id")["cents"].cummax()
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert np.array_equal(got["running_max"].to_numpy(),
                          exp["rmax"].to_numpy() / 100.0)
    assert (got["drawdown"].to_numpy() >= 0).all()


def test_char_entropy_matches_counter(ray_session):
    from lightcrawler_ray.extras import textstats

    got = (textstats.char_entropy(SF_DIR).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(docs)
    for did, text, n_cps, n_distinct, h in zip(
            docs["doc_id"], docs["text"], got["n_cps"], got["n_distinct"],
            got["entropy"]):
        c = Counter(text or "")
        n = len(text or "")
        assert n_cps == n
        assert n_distinct == len(c)
        exp_h = -sum((k / n) * math.log2(k / n) for k in c.values()) if n else 0.0
        assert h == pytest.approx(exp_h, rel=1e-12, abs=1e-12), did


def test_regression_by_group_matches_numpy(ray_session):
    from lightcrawler_ray import relational as rel

    got = rel.regression_by_group(SF_DIR).set_index("l_returnflag")
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"]).to_pandas()
    for flag, g in li.groupby("l_returnflag"):
        x = np.rint(g["l_quantity"].to_numpy()).astype(float)
        y = np.rint(g["l_extendedprice"].to_numpy() * 100).astype(float)
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        row = got.loc[flag]
        assert row["n_rows"] == len(g)
        assert row["slope"] == pytest.approx(slope, rel=1e-9)
        assert row["intercept"] == pytest.approx(intercept, rel=1e-9)
        assert row["r2"] == pytest.approx(r * r, rel=1e-9)
