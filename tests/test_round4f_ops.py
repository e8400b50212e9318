"""Unit guards for the sixth round-4 operator batch: the histogram-run
Gini finalize (key_skew_gini), the vectorized sentence segmentation
(sentence_stats), the ranked-log OLS fit (zipf_fit), and the composed
image-curation funnel (image_curate_manifest) — each checked against an
independent naive implementation (oracle parity is covered separately in
test_oracle_parity.py)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _brute_gini(sizes: np.ndarray) -> float:
    """Textbook rank-sum Gini over the raw (unhistogrammed) size vector."""
    x = np.sort(sizes.astype(np.int64))
    n = x.size
    i = np.arange(1, n + 1, dtype=np.int64)
    return float(((2 * i - n - 1) * x).sum()) / (n * int(x.sum()))


def test_key_skew_gini_matches_bruteforce(ray_session):
    from lightcrawler_ray import relational as rel

    got = rel.key_skew_gini(SF_DIR).set_index("key_name")
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey"])
    od = pq.read_table(f"{SF_DIR}/orders.parquet", columns=["o_custkey"])
    for key_name, col in [("lineitem.l_orderkey", li.column(0)),
                          ("orders.o_custkey", od.column(0))]:
        sizes = pd.Series(col.to_numpy()).value_counts().to_numpy()
        row = got.loc[key_name]
        assert row["n_keys"] == sizes.size
        assert row["total_rows"] == int(sizes.sum())
        # telescoped histogram finalize ≡ brute-force rank sum, bit-exact
        assert row["gini"] == pytest.approx(_brute_gini(sizes), abs=0, rel=0)
        assert 0.0 <= row["gini"] < 1.0


def test_sentence_stats_matches_naive_python(ray_session):
    from lightcrawler_ray.extras import textstats

    got = (textstats.sentence_stats(SF_DIR).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    assert (got["doc_id"].to_numpy() == docs["doc_id"].to_numpy()).all()
    for i in range(min(len(docs), 50)):
        pieces = [p.strip(" \t\n\r") for p in re.split(r"[.!?]+", docs["text"][i])]
        lens = [len(p) for p in pieces if p]
        assert got["n_sents"][i] == len(lens)
        assert got["total_sent_chars"][i] == sum(lens)
        assert got["max_sent_chars"][i] == (max(lens) if lens else 0)
        exp_avg = sum(lens) / len(lens) if lens else 0.0
        assert got["avg_sent_chars"][i] == exp_avg


def test_zipf_fit_matches_polyfit(ray_session):
    from lightcrawler_ray.extras import textstats

    got = textstats.zipf_fit(SF_DIR)
    assert len(got) == 1
    r = got.iloc[0]
    assert r["slope"] < 0  # frequencies fall with rank by construction
    assert 0.0 <= r["r2"] <= 1.0
    # independent fit: rebuild the ranked counts naively, np.polyfit
    from collections import Counter

    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    tf = Counter()
    for x in docs.column("text").to_pylist():
        tf.update((x or "").lower().split())
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:256]
    assert r["n_ranks"] == len(ranked)  # synthetic vocab is tiny (<256)
    x = np.log(np.arange(1, len(ranked) + 1, dtype=np.float64))
    y = np.log(np.array([c for _, c in ranked], dtype=np.float64))
    slope, intercept = np.polyfit(x, y, 1)
    assert r["slope"] == pytest.approx(slope, rel=1e-9)
    assert r["intercept"] == pytest.approx(intercept, rel=1e-9)


def test_image_curate_manifest_funnel_invariants(ray_session):
    import __ray_entry__ as e
    from lightcrawler_ray.extras import multimodal

    _, paths = e._fixture_paths()
    got = multimodal.image_curate_manifest(paths["images"])
    src = pq.read_table(paths["images"]).to_pandas()

    # independent funnel replay in plain pandas
    src["ncap"] = [len((c or "").split()) for c in src["caption"]]
    src["cmd5"] = [hashlib.md5(b.hex().encode()).hexdigest()
                   for b in src["bytes"]]
    src["nb"] = [len(b) for b in src["bytes"]]
    g = src[(np.minimum(src["w"], src["h"]) >= 64)
            & (src["w"] <= 3 * src["h"]) & (src["h"] <= 3 * src["w"])
            & (src["ncap"] >= 3) & (src["ncap"] <= 32)]
    ex = g.sort_values("image_id").drop_duplicates("cmd5", keep="first")
    ex = ex.assign(px=ex["w"].astype(np.int64) * ex["h"].astype(np.int64))
    best = (ex.sort_values(["px", "image_id"], ascending=[False, True])
              .drop_duplicates("phash", keep="first"))
    assert set(got["image_id"]) == set(best["image_id"])
    n_dups = ex.groupby("phash").size()
    for _, row in got.iterrows():
        ph = int(src.loc[src["image_id"] == row["image_id"], "phash"].iloc[0])
        assert row["n_dups"] == n_dups[ph]

    # shard layout: offsets are the exclusive running sum in (zkey, id)
    # order — contiguous end-to-end, shard = offset // budget
    m = got.sort_values(["zkey", "image_id"]).reset_index(drop=True)
    nb = m["nbytes"].to_numpy(np.int64)
    off = m["byte_offset"].to_numpy(np.int64)
    assert off[0] == 0
    assert (off[1:] == off[:-1] + nb[:-1]).all()
    assert (m["shard"].to_numpy(np.int64) == off // 262144).all()
    # payload sizes match the source blobs
    sizes = dict(zip(src["image_id"], src["nb"]))
    assert all(int(n) == sizes[i] for i, n in zip(m["image_id"], nb))


def test_ab_test_lift_matches_naive(ray_session):
    from lightcrawler_ray.extras import analytics

    got = analytics.ab_test_lift(SF_DIR).set_index("metric")
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["user_id", "event_type", "value"]).to_pandas()
    ev["arm"] = [
        int.from_bytes(hashlib.md5(str(u).encode()).digest()[8:16], "little") % 2
        for u in ev["user_id"]
    ]
    ev["v"] = np.rint(ev["value"].to_numpy() * 100) / 100.0
    for metric, g in ev.groupby("event_type"):
        c, t = g[g["arm"] == 0]["v"], g[g["arm"] == 1]["v"]
        if len(c) < 2 or len(t) < 2:
            assert metric not in got.index
            continue
        row = got.loc[metric]
        assert row["n_c"] == len(c) and row["n_t"] == len(t)
        assert row["mean_c"] == pytest.approx(c.mean(), rel=1e-12)
        assert row["mean_t"] == pytest.approx(t.mean(), rel=1e-12)
        lift = t.mean() - c.mean()
        assert row["lift_abs"] == pytest.approx(lift, rel=1e-9)
        se = np.sqrt(c.var(ddof=1) / len(c) + t.var(ddof=1) / len(t))
        assert row["t_welch"] == pytest.approx(lift / se, rel=1e-9)
