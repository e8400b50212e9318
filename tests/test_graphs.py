"""Brute-force independent checks for the co-visitation graph operators
(co-occurrence edges / top-k, degree-oriented triangle counting, per-user
mode) — recomputed with plain Python sets/dicts so a shared engine/oracle
bug can't hide."""

from __future__ import annotations

import itertools
import json
from collections import Counter, defaultdict

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _user_items() -> dict[int, set[int]]:
    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id", "props"])
    by_user: dict[int, set[int]] = defaultdict(set)
    for u, p in zip(t["user_id"].to_pylist(), t["props"].to_pylist()):
        by_user[u].add(int(json.loads(p)["k"]))
    return by_user


def _brute_edges() -> Counter:
    pairs: Counter = Counter()
    for items in _user_items().values():
        for a, b in itertools.combinations(sorted(items), 2):
            pairs[(a, b)] += 1
    return pairs


def test_cooccur_edges_match_bruteforce(ray_session):
    from lightcrawler_ray.extras.graphs import cooccur_edges

    got = cooccur_edges(SF_DIR).to_pandas()
    want = _brute_edges()
    assert len(got) == len(want)
    for a, b, c in zip(got["a"], got["b"], got["cnt"]):
        assert want[(int(a), int(b))] == int(c)


def test_cooccurrence_topk_ranks_and_ties(ray_session):
    from lightcrawler_ray.extras.graphs import item_cooccurrence_topk

    got = item_cooccurrence_topk(SF_DIR, k=5).to_pandas()
    edges = _brute_edges()
    sym: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for (a, b), c in edges.items():
        sym[a].append((-c, b))
        sym[b].append((-c, a))
    for item, grp in got.groupby("item"):
        grp = grp.sort_values("rnk")
        assert list(grp["rnk"]) == list(range(1, len(grp) + 1))
        want_head = sorted(sym[int(item)])[: len(grp)]
        assert [(-c, o) for c, o in zip(grp["cnt"], grp["other"])] == want_head


def test_triangle_counts_match_bruteforce(ray_session):
    from lightcrawler_ray.extras.graphs import triangle_counts

    min_count = 3
    adj: dict[int, set[int]] = defaultdict(set)
    for (a, b), c in _brute_edges().items():
        if c >= min_count:
            adj[a].add(b)
            adj[b].add(a)
    want: Counter = Counter()
    nodes = sorted(adj)
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    want[a] += 1
                    want[b] += 1
                    want[c] += 1
    got = triangle_counts(SF_DIR, min_count=min_count).to_pandas()
    got_map = dict(zip(got["item"].astype(int), got["triangles"].astype(int)))
    assert got_map == dict(want)


def test_mode_per_group_tie_breaks_low_item(ray_session):
    from lightcrawler_ray.extras.graphs import mode_item_per_user

    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id", "props"])
    cnt: Counter = Counter()
    for u, p in zip(t["user_id"].to_pylist(), t["props"].to_pylist()):
        cnt[(u, int(json.loads(p)["k"]))] += 1
    best: dict[int, tuple[int, int]] = {}
    for (u, i), c in cnt.items():
        cand = (-c, i)
        if u not in best or cand < best[u]:
            best[u] = cand
    got = mode_item_per_user(SF_DIR).to_pandas()
    assert len(got) == len(best)
    for u, i, c in zip(got["user_id"], got["item"], got["cnt"]):
        assert best[int(u)] == (-int(c), int(i))


def test_basket_pairs_topk_matches_bruteforce(ray_session):
    from lightcrawler_ray.extras.graphs import basket_pairs_topk

    t = pq.read_table(f"{SF_DIR}/lineitem.parquet",
                      columns=["l_orderkey", "l_partkey"])
    by_order: dict[int, set[int]] = defaultdict(set)
    for o, p in zip(t["l_orderkey"].to_pylist(), t["l_partkey"].to_pylist()):
        by_order[o].add(p)
    pairs: Counter = Counter()
    for items in by_order.values():
        for a, b in itertools.combinations(sorted(items), 2):
            pairs[(a, b)] += 1
    sym: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for (a, b), c in pairs.items():
        sym[a].append((-c, b))
        sym[b].append((-c, a))
    got = basket_pairs_topk(SF_DIR, k=5).to_pandas()
    for item, grp in got.groupby("item"):
        grp = grp.sort_values("rnk")
        want_head = sorted(sym[int(item)])[: len(grp)]
        assert [(-c, o) for c, o in zip(grp["cnt"], grp["other"])] == want_head
    assert set(got["item"]) == set(sym)


def test_late_event_audit_matches_bruteforce(ray_session):
    import hashlib

    import numpy as np

    from lightcrawler_ray.extras.analytics import late_event_audit

    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_id", "ts"])
    eid = t["event_id"].to_numpy()
    tsu = t["ts"].to_numpy().astype("datetime64[us]").view("int64")
    delay = np.array([
        int.from_bytes(hashlib.md5(str(int(e)).encode()).digest()[8:], "little")
        % 172_800_000_000
        for e in eid
    ], dtype=np.int64)
    arr = tsu + delay
    order = np.lexsort((eid, arr))
    eid_s, tsu_s = eid[order], tsu[order]
    wm = np.empty_like(tsu_s)
    run = None
    for i, v in enumerate(tsu_s):
        wm[i] = v if run is None else run
        run = v if run is None else max(run, v)
    lateness = np.maximum(wm - tsu_s, 0)
    got = late_event_audit(SF_DIR).to_pandas().set_index("event_id")
    assert len(got) == len(eid)
    got = got.loc[eid_s]
    assert (got["wm_us"].to_numpy() == wm).all()
    assert (got["lateness_us"].to_numpy() == lateness).all()
    assert (got["is_late"].to_numpy() == (lateness > 86_400_000_000)).all()
    assert got["is_late"].any() and not got["is_late"].all()


def test_trending_items_matches_bruteforce(ray_session):
    from lightcrawler_ray.extras.analytics import trending_items

    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["ts", "props"])
    tsu = t["ts"].to_numpy().astype("datetime64[us]").view("int64")
    early: Counter = Counter()
    late: Counter = Counter()
    for u, p in zip(tsu, t["props"].to_pylist()):
        item = int(json.loads(p)["k"])
        (late if u >= 1_705_363_200_000_000 else early)[item] += 1
    items = sorted(set(early) | set(late))
    ranked = sorted(items, key=lambda i: (-(late[i] - early[i]), i))[:10]
    got = trending_items(SF_DIR, k=10)
    assert list(got["item"]) == ranked
    assert list(got["rnk"]) == list(range(1, 11))
    for i, ce, cl, d in zip(got["item"], got["cnt_early"],
                            got["cnt_late"], got["delta"]):
        assert (early[int(i)], late[int(i)]) == (int(ce), int(cl))
        assert int(d) == late[int(i)] - early[int(i)]


def test_snapshot_delta_matches_bruteforce(ray_session):
    from lightcrawler_ray.extras.dedupe import snapshot_delta

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        in_old, in_new = d % 10 < 8, d % 10 >= 1
        edited = in_new and d % 7 == 0
        if in_old and in_new:
            if edited:
                want[d] = "changed"
        elif in_new:
            want[d] = "added"
        elif in_old:
            want[d] = "removed"
    got = snapshot_delta(SF_DIR).to_pandas()
    assert dict(zip(got["doc_id"].astype(int), got["status"])) == want
    assert {"added", "removed", "changed"} == set(want.values())
