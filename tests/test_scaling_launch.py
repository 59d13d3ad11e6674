"""Smoke tests for the multi-host launcher and weak-scaling recorder
(parallel/launch.py, parallel/scaling.py) on the 8-fake-device CPU mesh."""

import numpy as np

from inverse_compositional_algorithm_tpu.parallel.scaling import (
    measure_weak_scaling,
)


def test_weak_scaling_runs_and_reports():
    rec = measure_weak_scaling(device_counts=(1, 2), pairs_per_device=1,
                               height=32, width=40, nscales=1, repeats=1)
    assert len(rec["rows"]) == 2
    for row in rec["rows"]:
        assert row["errors_finite"]
        assert row["pairs_per_sec"] > 0
    assert rec["weak_scaling_efficiency"] > 0


def test_launch_single_host_smoke(capsys):
    from inverse_compositional_algorithm_tpu.parallel.launch import main

    rec = main(["--no-distributed", "--batch-per-host", "2", "--height",
                "32", "--width", "40", "--nscales", "1", "--repeats", "1",
                "--transform", "euclidean"])
    assert rec["errors_finite"]
    assert rec["devices"] >= 1
    assert rec["pairs_per_sec_global"] > 0
    assert np.isfinite(rec["pairs_per_sec_per_device"])
