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
