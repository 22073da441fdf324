"""bench.py parent-process logic, pinned with a mocked rung subprocess.

The ladder/wide-probe control flow only executes against the real TPU
(each rung is a subprocess holding the tunnel's single client slot), so
these tests fake ``subprocess.run`` and assert the decisions the driver's
round-end bench run depends on: headline shape selection, the wide-probe
failure path, segment-option fallback, and slope extrapolation labeling.
"""

import json
import subprocess
import types

import numpy as np
import pytest

import bench


class FakeProc:
    def __init__(self, stdout="", returncode=0, stderr=""):
        self.stdout = stdout
        self.returncode = returncode
        self.stderr = stderr


def _parse_cmd(cmd):
    n = int(cmd[cmd.index("--rung") + 1])
    segs = int(cmd[cmd.index("--segs") + 1]) if "--segs" in cmd else 0
    q = int(cmd[cmd.index("--qchip") + 1]) if "--qchip" in cmd else bench.Q_CHIP
    return n, segs, q


@pytest.fixture
def fast(monkeypatch):
    """No settles, TPU 'present', capture the emitted JSON line."""
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_tpu_available", lambda: True)
    monkeypatch.setattr(bench, "_tpu_preflight", lambda timeout_s=0: True)


def run_main(monkeypatch, capsys, rung_fn):
    def fake_run(cmd, capture_output=True, text=True, timeout=0):
        return rung_fn(*_parse_cmd(cmd))

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


class TestLadder:
    def test_direct_full_rung_wide_shape_wins(self, fast, monkeypatch, capsys):
        """8.8M measured; the Q=256 probe yields more QPS -> headline
        takes the wide shape and labels it."""
        def rung(n, segs, q):
            t = 1e-9 * n if q == bench.Q_CHIP else 1.5e-9 * n  # qps 256/1.5 > 128/1
            return FakeProc(stdout=f"RUNG {n} {t:.9f}\n")

        res = run_main(monkeypatch, capsys, rung)
        t_wide = 1.5e-9 * bench.N_FULL
        assert res["metric"].endswith("8.8M_docs_direct_q256_1chip")
        assert res["value"] == round(bench.WIDE_Q / t_wide, 1)
        assert res["vs_baseline"] == round(
            4 * bench.WIDE_Q / t_wide / 10_000.0, 3)

    def test_wide_probe_failure_keeps_q128(self, fast, monkeypatch, capsys):
        def rung(n, segs, q):
            if q != bench.Q_CHIP:
                return FakeProc(returncode=1, stderr="would not allocate")
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res = run_main(monkeypatch, capsys, rung)
        t = 1e-9 * bench.N_FULL
        assert res["metric"].endswith("8.8M_docs_direct_q128_1chip")
        assert res["value"] == round(bench.Q_CHIP / t, 1)
        assert res["vs_baseline"] == round(
            4 * bench.Q_CHIP / t / 10_000.0, 3)

    def test_wide_shape_slower_is_not_taken(self, fast, monkeypatch, capsys):
        def rung(n, segs, q):
            t = 1e-9 * n if q == bench.Q_CHIP else 2.5e-9 * n  # 256/2.5 < 128/1
            return FakeProc(stdout=f"RUNG {n} {t:.9f}\n")

        res = run_main(monkeypatch, capsys, rung)
        assert res["metric"].endswith("8.8M_docs_direct_q128_1chip")

    def test_segment_fallback_after_alloc_failure(self, fast, monkeypatch,
                                                  capsys):
        """The 4-seg 8.8M build fails to allocate; the ladder retries with
        the 8-seg option and the rung still lands."""
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            if n == bench.N_FULL and segs == 4:
                return FakeProc(returncode=1, stderr="would not allocate")
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res = run_main(monkeypatch, capsys, rung)
        assert res["metric"].startswith("exact_top1000_search_qps_8.8M_docs_direct")
        full = [c for c in calls if c[0] == bench.N_FULL and c[2] == bench.Q_CHIP]
        assert [c[1] for c in full] == [4, 8]
        # the wide probe reuses the segment count that actually worked
        wide = [c for c in calls if c[2] == bench.WIDE_Q]
        assert wide and wide[0][1] == 8

    def test_extrapolates_when_full_rung_fails(self, fast, monkeypatch,
                                               capsys):
        """8.8M never fits: the metric label says slope-extrapolated, the
        wide probe is skipped, vs_baseline uses the affine projection."""
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            if n == bench.N_FULL:
                return FakeProc(returncode=1, stderr="would not allocate")
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res = run_main(monkeypatch, capsys, rung)
        assert "slope_extrapolated" in res["metric"]
        assert all(q == bench.Q_CHIP for _, _, q in calls)
        n_meas = 7_736_595
        t_full = 1e-9 * bench.N_FULL  # exact affine data -> exact projection
        assert res["value"] == round(bench.Q_CHIP / (1e-9 * n_meas), 1)
        assert res["vs_baseline"] == round(
            bench.Q_GLOBAL / t_full / 10_000.0, 3)

    def test_no_rung_fits_raises(self, fast, monkeypatch, capsys):
        def rung(n, segs, q):
            return FakeProc(returncode=1, stderr="would not allocate")

        def fake_run(cmd, capture_output=True, text=True, timeout=0):
            return rung(*_parse_cmd(cmd))

        monkeypatch.setattr(subprocess, "run", fake_run)
        with pytest.raises(SystemExit):
            bench.main()
