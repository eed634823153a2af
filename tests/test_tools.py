"""Smoke tests for the tools/ scripts (pure-CPU parts)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_yaml_parser_round_trip(tmp_path):
    """Tracker YAML written by the library parses back via the tool."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from performance_tracker_yaml_parser import parse_tracking_file
    finally:
        sys.path.pop(0)

    from plssvm_tpu.utils.tracker import PerformanceTracker

    tracker = PerformanceTracker()
    tracker.add("cg", "iterations", 42)
    tracker.add("cg", "residuum", 1.5e-4)
    tracker.add("parameter", "kernel_type", "rbf")
    tracker.add("", "total_time", 123.4)
    f = str(tmp_path / "track.yaml")
    tracker.save(f)
    tracker.add("cg", "iterations", 7)
    tracker.save(f)  # appended second document

    docs = parse_tracking_file(f)
    assert len(docs) == 2
    assert docs[0]["cg.iterations"] == 42
    assert docs[0]["cg.residuum"] == 1.5e-4
    assert docs[0]["parameter.kernel_type"] == "rbf"
    assert docs[0]["total_time"] == 123.4
    assert docs[1]["cg.iterations"] == 7


def test_fit_emits_backend_and_transform_entries(tmp_path):
    """CSVM construction + fit emit the reference's init/transform tracker
    schema (CUDA/csvm.cu:48-86 backend entries, detail/layout.hpp:145-148
    transform entries) and round-trip through the YAML parser tool."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from performance_tracker_yaml_parser import parse_tracking_file
    finally:
        sys.path.pop(0)

    import numpy as np

    from plssvm_tpu import CSVM, DataSet
    from plssvm_tpu.utils.tracker import global_tracker

    global_tracker.clear()
    svm = CSVM(backend="xla", target="cpu", dtype=np.float64)
    X = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    svm.fit(DataSet(X, [-1, -1, 1, 1]), max_iter=10)
    f = str(tmp_path / "track.yaml")
    global_tracker.save(f)

    doc = parse_tracking_file(f)[0]
    assert doc["backend.backend"] == "xla"
    assert doc["backend.target_platform"] == "cpu"
    assert doc["backend.num_devices"] == 1
    assert doc["transform.num_data_points"] >= 3
    assert doc["transform.num_features"] == 2
    assert "transform.time" in doc
    assert doc["cg.iterations"] >= 1


def test_target_platforms_tool_runs():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plssvm_target_platforms.py"),
         "--quiet"],
        capture_output=True, text=True, timeout=120, cwd=REPO,
    )
    assert out.returncode == 0
    assert "--target_platform=" in out.stdout


def test_baseline_ladder_config1():
    if not os.path.isfile("/root/reference/tests/data/libsvm/5x4.libsvm"):
        pytest.skip("reference data not available")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "baseline_ladder.py"),
         "--configs", "1"],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert out.returncode == 0
    assert '"config": "tiny-linear"' in out.stdout


def test_scaling_projection_collective_counts():
    """The scaling projection's collective inventory comes from real
    compiled HLO: the linear solve must show all-reduces only (factored
    psum path), the rbf solve must add the ring's collective-permutes."""
    import sys

    sys.path.insert(0, "tools")
    import scaling_projection as sp

    rbf = sp.measure_collectives(4, 128, 64, "rbf")
    lin = sp.measure_collectives(4, 128, 64, "linear")
    assert rbf.get("collective-permute", {}).get("count", 0) > 0
    assert rbf.get("all-reduce", {}).get("count", 0) > 0
    assert "collective-permute" not in lin
    assert lin.get("all-reduce", {}).get("count", 0) > 0

    rows = [sp.ring_model(P, 1048576, 1024) for P in (2, 4, 8)]
    for row in rows:
        # the BASELINE north-star >= 80% bar, with margin, even serialized
        assert row["scaling_efficiency_serialized"] >= 0.9


def test_baseline_ladder_json_out(tmp_path):
    """--json-out (the retry_flagged adjudication channel) writes the rung
    results as JSON."""
    if not os.path.isfile("/root/reference/tests/data/libsvm/5x4.libsvm"):
        pytest.skip("reference data not available")
    import json

    out_path = str(tmp_path / "rungs.json")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "baseline_ladder.py"),
         "--configs", "1", "--json-out", out_path],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert out.returncode == 0
    rungs = json.load(open(out_path))
    assert rungs[0]["config"] == "tiny-linear"
    assert rungs[0]["accuracy"] == 1.0


class TestLadderRetryAdjudication:
    """The self-adjudicating gate: a flagged rung is re-run in a fresh
    subprocess and only a confirmed retry counts as a regression
    (round-4 verdict: the artifact must not need hand adjudication)."""

    def _call(self, monkeypatch, tmp_path, retry_value, returncode=0):
        import json
        from types import SimpleNamespace

        sys.path.insert(0, os.path.join(REPO, "tools"))
        try:
            import baseline_ladder
        finally:
            sys.path.pop(0)

        best_path = str(tmp_path / "best.json")
        with open(best_path, "w") as fh:
            json.dump({"rbf-10240x200": 3.0}, fh)

        def fake_run(cmd, capture_output, text, timeout):
            out_path = cmd[cmd.index("--json-out") + 1]
            with open(out_path, "w") as fh:
                json.dump(
                    [{"config": "rbf-10240x200", "it_per_s": retry_value}],
                    fh,
                )
            return SimpleNamespace(returncode=returncode, stdout="",
                                   stderr="")

        monkeypatch.setattr(subprocess, "run", fake_run)
        flagged = [{
            "config": "rbf-10240x200", "metric": "it_per_s",
            "value": 1.0, "best": 3.0, "ratio": 0.333,
        }]
        out = baseline_ladder.retry_flagged(flagged, best_path)
        return out, best_path

    def test_retry_inside_band_is_variance(self, monkeypatch, tmp_path):
        out, _ = self._call(monkeypatch, tmp_path, retry_value=2.9)
        (rec,) = out
        assert rec["verdict"] == "variance"
        assert rec["in_ladder"] == 1.0
        assert rec["retry"] == 2.9
        assert rec["retry_ratio"] == pytest.approx(2.9 / 3.0, abs=1e-3)

    def test_retry_below_band_is_confirmed(self, monkeypatch, tmp_path):
        out, _ = self._call(monkeypatch, tmp_path, retry_value=1.1)
        (rec,) = out
        assert rec["verdict"] == "confirmed_regression"
        assert rec["retry"] == 1.1

    def test_retry_failure_recorded(self, monkeypatch, tmp_path):
        out, _ = self._call(monkeypatch, tmp_path, retry_value=2.9,
                            returncode=1)
        (rec,) = out
        assert rec["verdict"] == "retry_failed"
        assert "retry" not in rec

    def test_retry_beating_best_improves_best_file(
        self, monkeypatch, tmp_path
    ):
        import json

        out, best_path = self._call(monkeypatch, tmp_path, retry_value=3.5)
        (rec,) = out
        assert rec["verdict"] == "variance"
        assert json.load(open(best_path))["rbf-10240x200"] == 3.5
