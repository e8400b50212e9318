"""Edge-semantics tests for the round-4 continuation operators (the oracle
parity suite covers value equality on the driver fixtures; these pin the
corner cases the fixtures may not exercise)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def tiny_sf(tmp_path):
    """A minimal sf_dir with hand-built events + documents tables."""
    ts = pa.array(
        np.array([1_000_000, 1_000_000, 2_000_000, 5_000_000_000, 1], dtype="int64"),
        pa.timestamp("us"),
    )
    events = pa.table({
        "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "ts": ts,
        "user_id": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "event_type": pa.array(["a", "b", "c", "d", "e"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
    })
    # doc 0 and 97 are the eval slice (doc_id % 97 == 0); doc 5 is a
    # near-dup of doc 97, doc 6 is unrelated
    base = "spark group query row data slow small filter customer line extra"
    docs = pa.table({
        "doc_id": pa.array([0, 97, 5, 6], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta eta theta",
            base + " tail one",
            base + " tail two",
            "completely different words nothing shared here at all",
        ], pa.string()),
        "lang": pa.array(["en", "en", "en", "en"], pa.string()),
        "source": pa.array(["src0", "src0", "src1", "src1"], pa.string()),
        "n_chars": pa.array([10, 20, 30, 1000], pa.int64()),
    })
    pq.write_table(events, os.path.join(tmp_path, "events.parquet"))
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_latest_per_key_tie_breaks_on_event_id(ray_session, tmp_path):
    from lightcrawler_ray import relational as rel

    # same user, same timestamp → highest event_id must win
    ts = pa.array(np.full(3, 7_000_000, dtype="int64"), pa.timestamp("us"))
    events = pa.table({
        "event_id": pa.array([5, 9, 7], pa.int64()),
        "ts": ts,
        "user_id": pa.array([42, 42, 42], pa.int64()),
        "event_type": pa.array(["x", "y", "z"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    pq.write_table(events, os.path.join(tmp_path, "events.parquet"))
    df = rel.latest_per_key(str(tmp_path)).to_pandas()
    assert len(df) == 1
    assert int(df["last_event_id"].iloc[0]) == 9
    assert df["last_event_type"].iloc[0] == "y"


def test_latest_per_key_partial_then_merge(ray_session, tiny_sf):
    from lightcrawler_ray import relational as rel

    df = rel.latest_per_key(tiny_sf).to_pandas().set_index("user_id")
    assert int(df.loc[1, "last_event_id"]) == 12  # newest ts wins
    assert int(df.loc[2, "last_event_id"]) == 13
    assert int(df.loc[3, "last_event_id"]) == 14
    assert int(df.loc[1, "last_ts_us"]) == 2_000_000


def test_decontaminate_fuzzy_flags_planted_near_dup(ray_session, tiny_sf):
    from lightcrawler_ray.extras import dedupe

    df = dedupe.decontaminate_fuzzy(tiny_sf)
    # doc 5 near-dups eval doc 97; doc 6 shares nothing
    assert list(df.columns) == ["doc_id", "eval_id", "jaccard"]
    assert (5, 97) in set(zip(df["doc_id"], df["eval_id"]))
    assert 6 not in set(df["doc_id"])
    assert (df["jaccard"] >= 0.5).all()


def test_decontaminate_fuzzy_empty_keeps_schema(ray_session, tmp_path):
    from lightcrawler_ray.extras import dedupe

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta",
                          "one two three four five six"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
        "source": pa.array(["src0", "src0"], pa.string()),
        "n_chars": pa.array([10, 10], pa.int64()),
    })
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    df = dedupe.decontaminate_fuzzy(str(tmp_path))
    assert df.empty
    assert list(df.columns) == ["doc_id", "eval_id", "jaccard"]


def test_length_gate_matches_rank_quantiles(ray_session):
    from lightcrawler_ray import relational as rel

    sf = "/root/testdata/sf0.001"
    df = rel.length_gate(sf).to_pandas()
    raw = pq.read_table(f"{sf}/documents.parquet", columns=["lang", "n_chars"]).to_pandas()
    for lang, part in raw.groupby("lang"):
        v = np.sort(part["n_chars"].to_numpy())
        lo = v[int(np.ceil(0.05 * len(v))) - 1]
        hi = v[int(np.ceil(0.95 * len(v))) - 1]
        sub = df[df["lang"] == lang]
        assert (sub["lo"] == lo).all() and (sub["hi"] == hi).all()
        assert (sub["keep"] == ((sub["n_chars"] >= lo) & (sub["n_chars"] <= hi))).all()
    assert not df["keep"].all(), "a 5/95 gate must drop some outliers"


def test_dedup_apply_consistent_with_components(ray_session):
    from lightcrawler_ray.extras import dedupe

    sf = "/root/testdata/sf0.001"
    comp = dedupe.dedup_components(sf).to_pandas()
    kept = set(dedupe.dedup_apply(sf).to_pandas()["doc_id"])
    # survivors are exactly the component representatives
    assert kept == set(comp.loc[comp["doc_id"] == comp["rep"], "doc_id"])
    assert len(kept) < len(comp), "fixture plants near-dups; some docs must drop"


def test_window_active_users_counts_distinct(ray_session, tiny_sf):
    from lightcrawler_ray import relational as rel

    df = rel.window_active_users(tiny_sf).to_pandas().set_index("win")
    # window 0 holds users {1, 3} (three user-1 events collapse to one)
    assert int(df.loc[0, "n_users"]) == 2
    assert int(df.loc[5_000_000_000 // 3_600_000_000, "n_users"]) == 1


def test_image_histogram_totals(ray_session):
    from lightcrawler_ray.extras import multimodal
    from lightcrawler_ray.sources import synth

    p = synth.GraphParams(n_pages=300, n_hosts=6, n_images=120, out_degree=6)
    paths = synth.ensure_fixtures(p)
    df = multimodal.image_histogram(paths["images"]).to_pandas()
    t = pq.read_table(paths["images"], columns=["fmt", "w", "h"]).to_pandas()
    px_cols = [c for c in df.columns if c.startswith("px_")]
    for _, row in df.iterrows():
        sub = t[t["fmt"] == row["fmt"]]
        assert row["n_img"] == len(sub)
        assert sum(row[c] for c in px_cols) == int((sub["w"] * sub["h"]).sum())
