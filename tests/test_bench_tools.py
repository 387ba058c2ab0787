"""Bench-tooling regression tests (pure python — no Spark session).

Round 8 shipped two measurement-integrity provisions (the contention
sentinel and full-line persistence) and promptly grew a bug: the round
inference counted its OWN full-line artifacts, so a second bench run
within one round bumped itself forward and the committed r08 artifact
briefly held a smoke run. These tests pin the fixed semantics.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))


def test_next_round_ignores_own_full_artifacts(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda _p: str(tmp_path / "bench.py")
    )
    (tmp_path / "BENCH_r03.json").write_text("{}")
    (tmp_path / "BENCH_r07.json").write_text("{}")
    # our own full-line artifacts must NOT advance the round — only the
    # driver-written BENCH_r{N}.json records count
    (tmp_path / "BENCH_r07_full.json").write_text("{}")
    (tmp_path / "BENCH_r08_full.json").write_text("{}")
    assert bench._next_round() == 8
    # and a rerun within round 8 stays at 8 even after r08_full exists
    (tmp_path / "BENCH_r08_full.json").write_text('{"again": true}')
    assert bench._next_round() == 8


def test_next_round_empty_dir_starts_at_one(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda _p: str(tmp_path / "bench.py")
    )
    assert bench._next_round() == 1


def test_next_round_env_override_beats_inference(tmp_path, monkeypatch):
    """r8 ADVICE: once the driver's BENCH_r{N}.json is committed mid-round,
    any same-round re-run would infer N+1 and mislabel its artifact.
    SPARK_GRAFT_ROUND pins the round explicitly."""
    import pytest

    import bench

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda _p: str(tmp_path / "bench.py")
    )
    (tmp_path / "BENCH_r08.json").write_text("{}")  # would infer 9
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "8")
    assert bench._next_round() == 8
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "0")
    with pytest.raises(ValueError):
        bench._next_round()
    monkeypatch.delenv("SPARK_GRAFT_ROUND")
    assert bench._next_round() == 9


def test_heavy_queries_get_a_third_run(monkeypatch):
    """r8 verdict item 4: the >3 s tail carries a ~30% same-code noise band,
    so those queries earn one extra sample; fast queries stay best-of-2 (the
    frozen methodology). min stays the statistic either way."""
    import bench

    assert bench.BEST3_THRESHOLD_SEC == 3.0
    fake_now = [0.0]
    monkeypatch.setattr(bench.time, "time", lambda: fake_now[0])

    def runner(secs, counter):
        def run():
            counter[0] += 1
            fake_now[0] += secs
        return run

    fast_calls, slow_calls = [0], [0]
    assert bench._time_query(runner(1.0, fast_calls)) == 1.0
    assert fast_calls[0] == 2
    assert bench._time_query(runner(5.0, slow_calls)) == 5.0
    assert slow_calls[0] == 3


def _bench_line(sentinel, queries, **extra):
    d = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "sentinel_sec": sentinel,
        "loadavg_start": [1.0, 1.0, 1.0],
        "loadavg_end": [1.0, 1.0, 1.0],
        "queries": queries,
        "sf": 0.1,
    }
    d.update(extra)
    return d


def test_compare_bench_normalizes_uniform_contention_away(tmp_path, capsys):
    """A run that is uniformly 1.5x slower WITH a 1.5x sentinel is box
    contention, not an engine regression — nothing may be flagged.
    Exactly the r7 adjudication this tool exists to replace."""
    import compare_bench

    qa = {"q1": 2.0, "q2": 4.0, "q3": 1.0}
    qb = {k: v * 1.5 for k, v in qa.items()}
    a = _bench_line(0.15, qa, r01_subset_total=7.0)
    b = _bench_line(0.225, qb, r01_subset_total=10.5)
    (tmp_path / "a.json").write_text(json.dumps(a))
    (tmp_path / "b.json").write_text(json.dumps(b))
    argv = ["compare_bench", str(tmp_path / "a.json"), str(tmp_path / "b.json")]
    old = sys.argv
    sys.argv = argv
    try:
        assert compare_bench.main() == 0
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "box_ratio=1.500" in out
    assert "no query moved" in out
    assert "CHECK" not in out


def test_compare_bench_flags_a_real_regression_under_identical_sentinel(
    tmp_path, capsys
):
    import compare_bench

    qa = {"q1": 2.0, "q2": 4.0}
    qb = {"q1": 2.0, "q2": 8.0}  # q2 really doubled; box identical
    (tmp_path / "a.json").write_text(json.dumps(_bench_line(0.15, qa)))
    (tmp_path / "b.json").write_text(json.dumps(_bench_line(0.15, qb)))
    old = sys.argv
    sys.argv = ["compare_bench", str(tmp_path / "a.json"), str(tmp_path / "b.json")]
    try:
        compare_bench.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "q2" in out and "x 2.00".replace(" ", "") in out.replace(" ", "")
    assert "q1  " not in out.split("movers")[-1]
