"""Salted ``ngram_jaccard_pairs`` (VERDICT r4 #8): the blocking key
``source`` is data-dependent, so a hot source must be triangle-salted
across sub-blocks with exactly-once pair coverage — same output as the
unsalted semantics, bounded per-partition pair work."""

from __future__ import annotations

import itertools

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lightcrawler_ray.extras.dedupe import _triangle_cells, ngram_jaccard_pairs


def test_triangle_cells_exactly_once_coverage():
    for n_salts in (2, 4, 8):
        cells = {s: set(_triangle_cells(s, n_salts)) for s in range(n_salts)}
        for s, cs in cells.items():
            assert len(cs) == n_salts  # replication factor is exactly n_salts
            assert all(i <= j for i, j in cs)
        for a, b in itertools.combinations(range(n_salts), 2):
            shared = cells[a] & cells[b]
            # a cross-sub pair meets in exactly one cell: (min, max)
            assert shared == {(min(a, b), max(a, b))}
        for s in range(n_salts):
            assert (s, s) in cells[s]  # same-sub pairs meet on the diagonal


def _brute_pairs(docs: pd.DataFrame, threshold: float) -> set[tuple[int, int, float]]:
    grams = {}
    for _, r in docs.iterrows():
        w = r["text"].split(" ")
        grams[r["doc_id"]] = {" ".join(w[i : i + 3]) for i in range(max(1, len(w) - 2))}
    out = set()
    by_src = docs.groupby("source")["doc_id"].apply(list)
    for ids in by_src:
        for a, b in itertools.combinations(sorted(ids), 2):
            inter = len(grams[a] & grams[b])
            union = len(grams[a] | grams[b])
            j = inter / max(union, 1)
            if j >= threshold:
                out.add((a, b, round(j, 9)))
    return out


@pytest.fixture()
def skewed_docs(tmp_path):
    # one hot source owns 60 of 72 docs — the exact shape that used to
    # degrade to a single-partition O(n²) merge
    rows = []
    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
    for i in range(60):
        # overlapping rotations → plenty of real near-dup pairs inside the
        # hot block, crossing sub-block boundaries arbitrarily
        w = words[i % 5 :] + words[: i % 5] + [f"tail{i % 7}"]
        rows.append({"doc_id": i, "source": "hot", "text": " ".join(w)})
    for i in range(60, 72):
        rows.append({"doc_id": i, "source": f"cold{i % 3}",
                     "text": " ".join(words[: 4 + i % 3]) + f" uniq{i}"})
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return tmp_path, df


def test_salted_output_matches_brute_force(ray_session, skewed_docs):
    sf_dir, df = skewed_docs
    got = ngram_jaccard_pairs(str(sf_dir), threshold=0.2, n_salts=4,
                              sample_rows=4096, hot_frac=0.02)
    want = _brute_pairs(df, 0.2)
    got_set = {(int(a), int(b), round(float(j), 9))
               for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"])}
    assert len(got) == len(got_set), "salting must not emit duplicate pairs"
    assert got_set == want
    # sanity: the fixture actually exercises cross-sub pairs in the hot block
    assert sum(1 for a, b, _ in want if a < 60 and b < 60) > 50


def test_cold_only_corpus_unaffected_by_salting(ray_session, tmp_path):
    # no source crosses the hot threshold → single-cell path, same result
    df = pd.DataFrame({
        "doc_id": range(8),
        "source": [f"s{i}" for i in range(8)],
        "text": ["one two three four five six"] * 8,
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = ngram_jaccard_pairs(str(tmp_path), threshold=0.2, hot_frac=0.9)
    assert len(got) == 0  # all docs in distinct blocks → no pairs
