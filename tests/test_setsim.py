"""Brute-force independent check for the prefix-filtered set-similarity
join: the engine's PPJoin-lite output must equal the UNFILTERED O(n²)
Jaccard join recomputed with plain Python sets — this validates the
prefix-filter completeness guarantee, not just the arithmetic."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"
TAU100 = 50


def test_set_similarity_join_matches_bruteforce(ray_session):
    from lightcrawler_ray.extras.dedupe import set_similarity_join
    from lightcrawler_ray.functions import hashing

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    sets = {
        int(d): frozenset(np.unique(hashing.token_hashes(x)).tolist())
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a]) + len(sets[b]) - inter
        if 100 * inter >= TAU100 * uni:
            want[(a, b)] = (inter, uni)
    got = set_similarity_join(SF_DIR, tau100=TAU100).to_pandas()
    got_map = {
        (int(a), int(b)): (int(i), int(u))
        for a, b, i, u in zip(got["doc_a"], got["doc_b"],
                              got["inter_sz"], got["union_sz"])
    }
    assert got_map == want
    assert len(want) > 0


def test_image_dhash_topk_ranked(ray_session):
    """Ranked retrieval must equal a brute-force hamming scan over the
    recomputed dhash signatures (independent of the banded join path)."""
    from collections import defaultdict

    import __ray_entry__ as E
    from lightcrawler_ray.extras import multimodal
    from lightcrawler_ray.extras.dedupe import image_dhash_topk

    _, paths = E._fixture_paths()
    sigs = multimodal.image_stats(paths["images"]).to_pandas()
    sigs = sigs[sigs["decoded"]][["image_id", "dhash"]]
    ids = sigs["image_id"].to_list()
    dh = sigs["dhash"].to_numpy().astype("int64").view("uint64")
    neigh = defaultdict(list)
    for i in range(len(ids)):
        for j in range(len(ids)):
            if i == j:
                continue
            ham = int(bin(int(dh[i]) ^ int(dh[j])).count("1"))
            if ham <= 7:
                neigh[ids[i]].append((ham, ids[j]))
    want = {}
    for img, lst in neigh.items():
        want[img] = sorted(lst)[:3]
    got = image_dhash_topk(paths["images"], k=3)
    got_map = defaultdict(list)
    for img, other, ham, rnk in zip(got["image_id"], got["other"],
                                    got["hamming"], got["rnk"]):
        got_map[img].append((int(ham), other))
    assert {k: sorted(v) for k, v in got_map.items()} == want
