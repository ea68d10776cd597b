"""robust_slope: the bench harness must reject tunnel slow-episodes.

Round 2's driver artifact recorded a 26x-off headline because a sustained tunnel
slow-episode poisoned every min-of-4 slope estimate. These tests drive the round-3
`robust_slope` harness with mocked timers reproducing that failure mode (and others)
and assert the recorded value is the true kernel slope, not the episode.
"""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import SlopeError, robust_slope  # noqa: E402

TRUE_MS = 0.092  # true per-iteration latency the timers simulate
OVERHEAD_S = 0.050  # constant launch/tunnel overhead per call


def _clean_timer():
    def t(iters: int) -> float:
        return OVERHEAD_S + iters * TRUE_MS / 1e3

    return t


def _run(t, **kw):
    kw.setdefault("floor_ms", 0.015)
    kw.setdefault("cap_ms", 0.5)
    return robust_slope(t, 500, 2500, 4500, **kw)


def test_clean_timer_recovers_true_slope():
    ms, info = _run(_clean_timer())
    assert ms == pytest.approx(TRUE_MS, rel=1e-6)
    assert info["attempts"] == 2  # two agreeing estimates, no retries
    assert not info.get("degraded")
    assert info["dispersion"] == 0


def test_point_spike_rejected_by_linearity():
    """A single slow call (one-off episode) bends the line; retry must reject it."""
    calls = [0]

    def t(iters: int) -> float:
        calls[0] += 1
        spike = 2.0 if calls[0] == 2 else 0.0  # poison the first attempt's mid point
        return OVERHEAD_S + spike + iters * TRUE_MS / 1e3

    ms, info = _run(t)
    assert ms == pytest.approx(TRUE_MS, rel=1e-6)
    assert info["rejects"][0][0] == "nonlinear"
    assert info["attempts"] == 3


def test_sustained_episode_rejected_by_cap():
    """Round 2's exact failure mode: a sustained episode scales the WHOLE line
    (linearity passes — 26x slower is still linear), so only the absolute roofline
    cap can reject it."""
    attempt = [0]

    def t(iters: int) -> float:
        attempt[0] += 1
        # first two attempts (6 calls) run inside the slow episode at 26x
        scale = 26.0 if attempt[0] <= 6 else 1.0
        return OVERHEAD_S + iters * TRUE_MS * scale / 1e3

    ms, info = _run(t)
    assert ms == pytest.approx(TRUE_MS, rel=1e-6)
    assert [r[0] for r in info["rejects"]] == ["tunnel_episode", "tunnel_episode"]
    assert info["attempts"] == 4


def test_impossibly_fast_rejected_by_floor():
    def t(iters: int) -> float:
        return OVERHEAD_S  # zero marginal cost: some layer replayed the execution

    with pytest.raises(SlopeError):
        _run(t, max_attempts=3)


def test_disagreeing_estimates_marked_degraded():
    """Valid-but-scattered estimates (within bounds, linear, never within 15% of
    each other) exhaust attempts and must be flagged, not silently recorded."""
    attempt = [0]

    def t(iters: int) -> float:
        attempt[0] += 1
        scale = 1.0 + 0.8 * ((attempt[0] - 1) // 3)  # 1.0x, 1.8x, 2.6x, ... per attempt
        return OVERHEAD_S + iters * TRUE_MS * scale / 1e3

    ms, info = _run(t, max_attempts=3)
    assert info["degraded"] is True
    assert ms == pytest.approx(TRUE_MS, rel=1e-6)  # min of the valid estimates


def test_all_episodes_raises():
    def t(iters: int) -> float:
        return OVERHEAD_S + iters * TRUE_MS * 26.0 / 1e3

    with pytest.raises(SlopeError) as ei:
        _run(t, max_attempts=4)
    assert ei.value.info["attempts"] == 4


def test_main_emits_degraded_json_on_total_episode(monkeypatch, capsys):
    """A fully-bad tunnel window must still produce ONE parseable JSON line."""
    import json

    import bench

    def bad_headline(*a, **k):
        err = bench.SlopeError("all episodes")
        err.info = {"attempts": 6, "rejects": [("tunnel_episode", 2.4)] * 6}
        raise err

    monkeypatch.setattr(bench, "bench_headline", bad_headline)
    monkeypatch.setattr("sys.argv", ["bench.py", "--fast"])
    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["value"] is None and "error" in rec and rec["timing"]["attempts"] == 6


def test_bench_synth_lex_resolves_to_candidate_lane(monkeypatch):
    """Regression: scripts/hybrid_scale.py once built a ShardedLexIndex without
    wnorm/reversed/forward arrays, so _resolve_lex_backend silently fell back to
    the scatter lane and the "candidate lane" measurement was off by 88x
    (1112.7 vs 12.65 ms/batch at 1M). The bench synthetic snapshot — now the one
    harness every hybrid measurement goes through — must carry everything the
    candidate pipeline needs on every path."""
    import jax as _jax

    from bench import _synth_sharded_lex
    from wax_tpu.parallel import sharded_hybrid as sh

    lex = _synth_sharded_lex(4096, 256, 64)
    assert lex.wnorm is not None
    assert lex.doc_rows_rev is not None and lex.wnorm_rev is not None
    # forward index present => the exact rescore engages (lex_rescore=True)
    assert lex.fwd_tids is not None and lex.fwd_wnorm is not None
    # off-TPU (CPU test mesh) resolution must pick the XLA candidate lane
    assert sh._resolve_lex_backend(lex, "auto", q2=16) == "candidates"
    # on TPU the same snapshot rides the Pallas kernel (plane fits VMEM here)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert sh._resolve_lex_backend(lex, "auto", q2=16) == "candidates_pallas"
