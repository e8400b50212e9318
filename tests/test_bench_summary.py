"""Scaling-headline selection (bench.summarize_pairs) — the measurement
discipline is load-bearing (ADVICE round 2: never headline best-of-N), so
the basis choice is pinned as a pure-function unit test."""

import bench


def _pair(eff, quiet, degraded):
    return {"scaling_efficiency": eff, "quiet": quiet, "host_degraded": degraded}


def test_graded_pairs_win():
    out = bench.summarize_pairs([
        _pair(0.70, True, True),    # quiet but below floor — deflated
        _pair(0.84, True, False),
        _pair(0.82, True, False),
        _pair(0.95, False, False),  # steal-polluted high outlier
    ])
    assert out["scaling_efficiency"] == 0.83  # median of the two graded
    assert "at-grade" in out["headline_basis"]
    # the inflated pair is visible but never the headline
    assert out["best_pair"]["scaling_efficiency"] == 0.95


def test_all_degraded_falls_back_with_label():
    out = bench.summarize_pairs([
        _pair(0.66, True, True),
        _pair(0.74, True, True),
        _pair(0.93, False, True),
    ])
    assert out["scaling_efficiency"] == 0.70
    assert "host-degraded" in out["headline_basis"]


def test_no_quiet_pair_label():
    out = bench.summarize_pairs([_pair(0.55, False, True), _pair(1.03, False, True)])
    assert "NO runtime-quiet" in out["headline_basis"]
    assert out["scaling_efficiency"] == 0.79
