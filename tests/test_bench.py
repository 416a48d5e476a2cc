"""bench.py resilience — regression for round 5, where a crash in the
first stream leg (NTZ watermark) zeroed out ALL bench evidence including
the already-computed batch timings."""

from __future__ import annotations

import bench


def test_stream_leg_failure_degrades_to_null(spark, monkeypatch):
    def boom(*a, **k):
        raise RuntimeError("synthetic leg failure")

    monkeypatch.setattr(bench, "_best_stream_rate", boom)
    out = bench._stream_metrics(spark, "/root/testdata/sf0.001")
    for metric in (
        "stream_events_per_sec",
        "stream_session_events_per_sec",
        "stream_anomaly_events_per_sec",
    ):
        assert out[metric] is None
        assert "synthetic leg failure" in out[metric + "_error"]


def test_stream_metrics_real_legs_report(spark):
    """All three legs produce a positive rate on the current Spark —
    the exact surface that silently broke in round 5.  reps=1: the
    goal is 'does each leg run at all', not a stable rate, so don't
    pay the bench's best-of-3 (9 streaming runs) in the unit suite."""
    out = bench._stream_metrics(spark, "/root/testdata/sf0.001", reps=1)
    for metric in (
        "stream_events_per_sec",
        "stream_session_events_per_sec",
        "stream_anomaly_events_per_sec",
    ):
        assert isinstance(out[metric], float) and out[metric] > 0, (metric, out)
