"""Fast (Spark-free) invariants for bench.py's contention guards — the
per-leg anomaly retry and the trailing quiet-median baseline added in
round 12 (VERDICT r11 ask #2). The r17 artifact proved one quiet
start-of-run control can coexist with 2-4x flapped individual legs, so
these semantics must not regress silently."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(HERE, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


BENCH = _load_bench()


def test_anomaly_retry_keeps_min_and_records_both():
    retries: dict = {}
    # 3.0s leg vs 1.0s median (> 2x) -> re-measure returns 1.1 -> keep min
    got = BENCH._anomaly_retry(
        "q_x", 3.0, 1.0, lambda: 1.1, retries, "sf0.1"
    )
    assert got == 1.1
    assert retries["q_x"]["readings"] == [3.0, 1.1]
    assert retries["q_x"]["trailing_median"] == 1.0
    assert retries["q_x"]["still_anomalous"] is False
    assert retries["q_x"]["scale"] == "sf0.1"


def test_anomaly_retry_flags_persistent_anomaly():
    retries: dict = {}
    got = BENCH._anomaly_retry("q_y", 3.0, 1.0, lambda: 2.9, retries, "sf1")
    assert got == 2.9
    assert retries["q_y"]["still_anomalous"] is True


def test_anomaly_retry_no_op_below_threshold_or_without_baseline():
    retries: dict = {}

    def boom():
        raise AssertionError("must not re-measure")

    assert BENCH._anomaly_retry("q_z", 1.9, 1.0, boom, retries, "sf0.1") == 1.9
    assert BENCH._anomaly_retry("q_w", 9.9, None, boom, retries, "sf0.1") == 9.9
    assert retries == {}


def test_anomaly_retry_survives_rerun_failure():
    retries: dict = {}

    def boom():
        raise RuntimeError("host hiccup")

    assert BENCH._anomaly_retry("q_e", 3.0, 1.0, boom, retries, "sf0.1") == 3.0
    assert retries == {}  # failure recorded nothing, original kept


def test_trailing_quiet_medians_skip_noisy_artifacts(tmp_path, monkeypatch):
    """Medians must come only from artifacts not stamped noisy, for both
    the headline and sf1 legs."""
    rows = [
        ("BENCH_LOCAL_r90.json",
         {"queries": {"q1": 1.0}, "sf1": {"h": {"sec": 10.0}}}),
        ("BENCH_LOCAL_r91.json",
         {"queries": {"q1": 2.0}, "sf1": {"h": {"sec": 20.0}}}),
        ("BENCH_LOCAL_r92.json",
         {"queries": {"q1": 50.0}, "sf1": {"h": {"sec": 500.0}},
          "noisy": True}),
        ("BENCH_LOCAL_r93.json",
         {"queries": {"q1": 3.0}, "sf1": {"h": {"error": "x"}}}),
    ]
    for name, payload in rows:
        (tmp_path / name).write_text(json.dumps(payload))
    monkeypatch.setattr(
        BENCH.os.path, "abspath", lambda _p, d=str(tmp_path): d + "/bench.py"
    )
    head, sf1 = BENCH._trailing_quiet_medians()
    assert head["q1"] == 2.0  # median of 1, 2, 3 — the noisy 50 excluded
    assert sf1["h"] == 15.0  # median of 10, 20 — error rows excluded
