"""bench.py parent-process logic, pinned with a mocked rung subprocess.

The ladder/wide-probe control flow only executes against the real TPU
(each rung is a subprocess holding the tunnel's single client slot), so
these tests fake ``subprocess.run`` and assert the decisions the driver's
round-end bench run depends on: headline shape selection, the wide-probe
failure path, proven-first segment ordering with upgrade attempts,
slope extrapolation labeling, provisional per-rung metric emission (the
driver parses the LAST json line — a later failure must never erase the
record), the persisted segment-count state file, and the wall-clock
budget caps (the r3 artifact was lost to a settle window that outlived
the driver's budget).
"""

import json
import os
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
def fast(monkeypatch, tmp_path):
    """No settles, TPU 'present', state file in tmp."""
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_tpu_available", lambda: True)
    monkeypatch.setattr(bench, "_tpu_preflight", lambda timeout_s=0: True)
    monkeypatch.setattr(bench, "STATE_PATH", str(tmp_path / "state.json"))


@pytest.fixture
def clock(monkeypatch, tmp_path):
    """Deterministic wall clock: sleeps advance it, each rung subprocess
    costs 90s. For testing the budget caps."""
    c = types.SimpleNamespace(t=0.0)
    monkeypatch.setattr(bench.time, "time", lambda: c.t)

    def sleep(s):
        c.t += s

    monkeypatch.setattr(bench.time, "sleep", sleep)
    monkeypatch.setattr(bench, "_tpu_available", lambda: True)
    monkeypatch.setattr(bench, "_tpu_preflight", lambda timeout_s=0: True)
    monkeypatch.setattr(bench, "STATE_PATH", str(tmp_path / "state.json"))
    return c


def install_rungs(monkeypatch, rung_fn, clock=None):
    def fake_run(cmd, capture_output=True, text=True, timeout=0):
        if clock is not None:
            clock.t += 90
        return rung_fn(*_parse_cmd(cmd))

    monkeypatch.setattr(subprocess, "run", fake_run)


def run_main(monkeypatch, capsys, rung_fn, clock=None):
    install_rungs(monkeypatch, rung_fn, clock)
    bench.main()
    out = [l for l in capsys.readouterr().out.strip().splitlines()
           if l.startswith("{")]
    assert out, "no metric JSON emitted"
    return json.loads(out[-1]), [json.loads(l) for l in out]


class TestLadder:
    def test_direct_full_rung_wide_shape_wins(self, fast, monkeypatch, capsys):
        """8.8M measured; the Q=256 probe yields more QPS -> headline
        takes the wide shape and labels it."""
        def rung(n, segs, q):
            t = 1e-9 * n if q == bench.Q_CHIP else 1.5e-9 * n  # qps 256/1.5 > 128/1
            return FakeProc(stdout=f"RUNG {n} {t:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
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

        res, _ = run_main(monkeypatch, capsys, rung)
        t = 1e-9 * bench.N_FULL
        assert res["metric"].endswith("8.8M_docs_direct_q128_1chip")
        assert res["value"] == round(bench.Q_CHIP / t, 1)
        assert res["vs_baseline"] == round(
            4 * bench.Q_CHIP / t / 10_000.0, 3)

    def test_wide_shape_slower_is_not_taken(self, fast, monkeypatch, capsys):
        def rung(n, segs, q):
            t = 1e-9 * n if q == bench.Q_CHIP else 2.5e-9 * n  # 256/2.5 < 128/1
            return FakeProc(stdout=f"RUNG {n} {t:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
        assert res["metric"].endswith("8.8M_docs_direct_q128_1chip")

    def test_proven_config_runs_first_then_upgrade(self, fast, monkeypatch,
                                                   capsys):
        """The full rung starts at the PROVEN 6 segments (the measured
        41.7 ms config), then attempts the faster 4-segment build (the
        single-buffer option pre-blocked, as on the real tunnel); when
        the upgrade is faster it becomes the headline and the new proven
        config."""
        with open(bench.STATE_PATH, "w") as f:
            json.dump({"upgrade_fails": {str(bench.N_FULL): {
                "1": bench.MAX_UPGRADE_FAILS}}}, f)
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            if q != bench.Q_CHIP:  # wide probe: slower per query, not taken
                return FakeProc(stdout=f"RUNG {n} {2.5e-9 * n:.9f}\n")
            t = 1e-9 * n * (1.1 if segs == 6 else 1.0)
            return FakeProc(stdout=f"RUNG {n} {t:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
        full = [c for c in calls
                if c[0] == bench.N_FULL and c[2] == bench.Q_CHIP]
        assert [c[1] for c in full] == [6, 4]
        assert res["metric"].startswith(
            "exact_top1000_search_qps_8.8M_docs_direct")
        # the faster 4-seg time is the headline
        assert res["value"] == round(bench.Q_CHIP / (1e-9 * bench.N_FULL), 1)
        state = json.load(open(bench.STATE_PATH))
        assert state["proven_segs"][str(bench.N_FULL)] == 4
        # the wide probe uses the upgraded config
        wide = [c for c in calls if c[2] == bench.WIDE_Q]
        assert wide and wide[0][1] == 4

    def test_single_buffer_upgrade_gates_wide_probe(self, fast, monkeypatch,
                                                    capsys):
        """The fastest upgrade is the SINGLE-BUFFER build (n_segs=1); when
        it lands, the Q=256 wide probe must be skipped — its extra
        [256, NB] f32 gmax resident on top of the one 12.65 GiB corpus
        buffer exceeds the chip's usable HBM, so the probe could only
        fail-and-leak after the best measurement of the run."""
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            t = 1e-9 * n * (1.2 if segs > 1 else 1.0)
            return FakeProc(stdout=f"RUNG {n} {t:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
        full = [c for c in calls
                if c[0] == bench.N_FULL and c[2] == bench.Q_CHIP]
        assert [c[1] for c in full] == [6, 1]
        assert not [c for c in calls if c[2] == bench.WIDE_Q]
        assert res["value"] == round(bench.Q_CHIP / (1e-9 * bench.N_FULL), 1)
        state = json.load(open(bench.STATE_PATH))
        assert state["proven_segs"][str(bench.N_FULL)] == 1

    def test_blocked_proven_config_never_runs_first(self, fast, monkeypatch,
                                                    capsys):
        """A state file whose proven config has since been fragmentation-
        blocked must not point the headline rung at the known-leaking
        build: the ladder starts at the next-safer unblocked option."""
        with open(bench.STATE_PATH, "w") as f:
            json.dump({"proven_segs": {str(bench.N_FULL): 4},
                       "upgrade_fails": {str(bench.N_FULL): {
                           "1": bench.MAX_UPGRADE_FAILS,
                           "4": bench.MAX_UPGRADE_FAILS}}}, f)
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
        full = [c for c in calls
                if c[0] == bench.N_FULL and c[2] == bench.Q_CHIP]
        assert full and full[0][1] == 6
        assert not [c for c in calls
                    if c[0] == bench.N_FULL and c[1] in (1, 4)]
        assert res["metric"].startswith(
            "exact_top1000_search_qps_8.8M_docs_direct")

    def test_all_configs_blocked_skips_headline_before_settle(
            self, fast, monkeypatch, capsys):
        """Every 8.8M segment config fragmentation-blocked: the headline
        rung is skipped entirely — no build attempt, no settle window
        spent — and the run finalizes on the insurance rungs'
        slope-extrapolated record."""
        with open(bench.STATE_PATH, "w") as f:
            json.dump({"proven_segs": {str(bench.N_FULL): 6},
                       "upgrade_fails": {str(bench.N_FULL): {
                           str(s): bench.MAX_UPGRADE_FAILS
                           for s in bench.N_SEGS[bench.N_FULL]}}}, f)
        calls, sleeps = [], []
        monkeypatch.setattr(bench.time, "sleep", sleeps.append)

        def rung(n, segs, q):
            calls.append((n, segs, q))
            return FakeProc(stdout=f"RUNG {n} {2e-9 * n:.9f}\n")

        install_rungs(monkeypatch, rung)
        bench.main()
        captured = capsys.readouterr()
        out = [json.loads(l) for l in captured.out.strip().splitlines()
               if l.startswith("{")]
        assert not [c for c in calls if c[0] == bench.N_FULL]
        assert "every segment config fragmentation-blocked" in captured.err
        # the skip is decided BEFORE the settle window: none burned
        assert not sleeps
        assert out and "slope_extrapolated" in out[-1]["metric"]

    def test_blocked_proven_no_safer_falls_back_safest_first(
            self, fast, monkeypatch, capsys):
        """Stale state: the proven config is blocked and nothing safer
        exists. The fallback must attempt the SAFEST (most-segment)
        unblocked option first — never ascend from the single-buffer
        build, the most fragmentation-prone config."""
        with open(bench.STATE_PATH, "w") as f:
            json.dump({"proven_segs": {str(bench.N_FULL): 16},
                       "upgrade_fails": {str(bench.N_FULL): {
                           "16": bench.MAX_UPGRADE_FAILS}}}, f)
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
        full = [c for c in calls
                if c[0] == bench.N_FULL and c[2] == bench.Q_CHIP]
        assert full and full[0][1] == 8
        assert res["metric"].startswith(
            "exact_top1000_search_qps_8.8M_docs_direct")

    def test_manual_rung_defaults_to_proven_not_single_buffer(
            self, fast, monkeypatch):
        """`bench.py --rung 8841823` without --segs must resolve the
        PROVEN segment count (or the safest option when nothing is
        proven), never options[0]: the full rung's tuple leads with the
        single-buffer build, which is fragmentation-blocked on this
        tunnel — a guaranteed fail-and-leak."""
        seen = {}

        def fake_slice(jax, jnp, n_docs, iters=8, n_segs=1,
                       q_chip=bench.Q_CHIP):
            seen["segs"] = n_segs
            return 1e-3

        monkeypatch.setattr(bench, "time_slice", fake_slice)
        with open(bench.STATE_PATH, "w") as f:
            json.dump({"proven_segs": {str(bench.N_FULL): 6},
                       "upgrade_fails": {}}, f)
        bench.run_rung(bench.N_FULL)
        assert seen["segs"] == 6
        # nothing proven anywhere: fall back to the SAFEST option
        os.remove(bench.STATE_PATH)
        monkeypatch.delitem(bench.PROVEN_SEGS, bench.N_FULL)
        bench.run_rung(bench.N_FULL)
        assert seen["segs"] == max(bench.N_SEGS[bench.N_FULL])

    def test_manual_rung_forced_blocked_config_warns(
            self, fast, monkeypatch, capsys):
        """An explicit `--segs` override of a recorded-blocked config is
        allowed (HBM probing needs it) but must print a loud stderr
        warning naming the hazard; a proven/unblocked override stays
        silent."""
        seen = {}

        def fake_slice(jax, jnp, n_docs, iters=8, n_segs=1,
                       q_chip=bench.Q_CHIP):
            seen["segs"] = n_segs
            return 1e-3

        monkeypatch.setattr(bench, "time_slice", fake_slice)
        with open(bench.STATE_PATH, "w") as f:
            json.dump({"proven_segs": {str(bench.N_FULL): 6},
                       "upgrade_fails": {str(bench.N_FULL): {
                           "4": bench.MAX_UPGRADE_FAILS}}}, f)
        bench.run_rung(bench.N_FULL, n_segs=4)
        assert seen["segs"] == 4
        assert "fragmentation-blocked" in capsys.readouterr().err
        bench.run_rung(bench.N_FULL, n_segs=6)
        assert "fragmentation-blocked" not in capsys.readouterr().err

    def test_default_order_is_insurance_then_headline(self, fast,
                                                      monkeypatch, capsys):
        """r5: the default run measures exactly 2.21M, 4.42M, then 8.8M —
        no settled mid-ladder rungs before the headline (the r4 rc=124
        root cause)."""
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        run_main(monkeypatch, capsys, rung)
        q128 = [c[0] for c in calls if c[2] == bench.Q_CHIP]
        # first-occurrence order (the headline repeats for the upgrade
        # attempt, which is fine)
        assert list(dict.fromkeys(q128)) == list(bench.MEASURE_ORDER)

    def test_full_ladder_env_restores_all_rungs(self, fast, monkeypatch,
                                                capsys):
        monkeypatch.setenv("OPENMATCH_BENCH_LADDER", "full")
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        run_main(monkeypatch, capsys, rung)
        q128 = [c[0] for c in calls if c[2] == bench.Q_CHIP]
        assert list(dict.fromkeys(q128)) == list(bench.LADDER)

    def test_transient_insurance_failure_does_not_kill_headline(
            self, fast, monkeypatch, capsys):
        """A tunnel flake (non-allocation failure) on a small insurance
        rung must not cost the 8.8M headline measurement."""
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            if n == 2_210_456:
                return FakeProc(returncode=1,
                                stderr="TPU backend setup failed")
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
        assert res["metric"].startswith(
            "exact_top1000_search_qps_8.8M_docs_direct")

    def test_insurance_allocation_failure_stops_escalation(
            self, fast, monkeypatch, capsys):
        """An ALLOCATION failure on an insurance rung means the tunnel
        cannot even hold 3 GiB — the 12.7 GiB headline build must not be
        attempted (it would stack a second leaked reservation)."""
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            if n == 4_420_911:
                return FakeProc(returncode=1, stderr="would not allocate")
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
        assert not [c for c in calls if c[0] == bench.N_FULL]
        assert "slope_extrapolated" in res["metric"]

    def test_failed_upgrade_keeps_record_and_skips_wide(self, fast,
                                                        monkeypatch, capsys):
        """An upgrade-attempt allocation failure cannot erase the direct
        measurement, keeps 6 as proven, and skips the wide probe (the
        leaked reservation would doom its build too)."""
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            if n == bench.N_FULL and segs == 1:
                return FakeProc(returncode=1, stderr="would not allocate")
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
        assert res["metric"].endswith("8.8M_docs_direct_q128_1chip")
        assert not [c for c in calls if c[2] == bench.WIDE_Q]
        state = json.load(open(bench.STATE_PATH))
        assert state["proven_segs"][str(bench.N_FULL)] == 6

    def test_failed_upgrades_persist_and_block(self, fast, monkeypatch,
                                               capsys):
        """An upgrade allocation failure increments a persisted per-config
        count; once the count reaches MAX_UPGRADE_FAILS the config is
        fragmentation-blocked and never attempted again (the 4-seg 8.8M
        story: each failure leaks HBM the round-end driver run cannot
        afford). The next run's upgrade falls through to the next-fastest
        unblocked config."""
        def rung(n, segs, q):
            if n == bench.N_FULL and segs == 1:
                return FakeProc(returncode=1, stderr="would not allocate")
            t = 1e-9 * n * (1.1 if segs == 6 else 1.0)
            return FakeProc(stdout=f"RUNG {n} {t:.9f}\n")

        for expect in range(1, bench.MAX_UPGRADE_FAILS + 1):
            run_main(monkeypatch, capsys, rung)
            state = json.load(open(bench.STATE_PATH))
            assert state["upgrade_fails"][str(bench.N_FULL)]["1"] == expect

        calls = []

        def counting_rung(n, segs, q):
            calls.append((n, segs, q))
            return rung(n, segs, q)

        res, _ = run_main(monkeypatch, capsys, counting_rung)
        # the blocked config is never attempted again; the upgrade slot
        # goes to the next-fastest unblocked config (4 segments), which
        # succeeds and becomes the new proven config
        assert not [c for c in calls if c[0] == bench.N_FULL and c[1] == 1]
        upgraded = [c for c in calls
                    if c[0] == bench.N_FULL and c[1] == 4
                    and c[2] == bench.Q_CHIP]
        assert upgraded
        assert res["metric"].startswith(
            "exact_top1000_search_qps_8.8M_docs_direct")
        state = json.load(open(bench.STATE_PATH))
        assert state["upgrade_fails"][str(bench.N_FULL)]["1"] == \
            bench.MAX_UPGRADE_FAILS
        assert state["proven_segs"][str(bench.N_FULL)] == 4

    def test_transient_upgrade_failure_not_counted(self, fast, monkeypatch,
                                                   capsys):
        """A clean non-allocation upgrade failure (tunnel flake) must NOT
        accrue toward the fragmentation block."""
        def rung(n, segs, q):
            if n == bench.N_FULL and segs == 1 and q == bench.Q_CHIP:
                return FakeProc(returncode=1, stderr="TPU backend setup "
                                "failed (transient)")
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        run_main(monkeypatch, capsys, rung)
        state = json.load(open(bench.STATE_PATH))
        assert "upgrade_fails" not in state

    def test_state_file_overrides_proven_order(self, fast, monkeypatch,
                                               capsys):
        """A state file naming 4 segments as proven makes 4 run first;
        when it fails, the next-safer (6-segment) option is retried."""
        with open(bench.STATE_PATH, "w") as f:
            json.dump({"proven_segs": {str(bench.N_FULL): 4}}, f)
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            if n == bench.N_FULL and segs == 4:
                return FakeProc(returncode=1, stderr="would not allocate")
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
        full = [c for c in calls
                if c[0] == bench.N_FULL and c[2] == bench.Q_CHIP]
        # proven-4 first, 6-segment fallback, then the upgrade slot still
        # tries the untested single-buffer config (same mock time -> not
        # promoted, so 6 stays proven)
        assert [c[1] for c in full] == [4, 6, 1]
        assert res["metric"].startswith(
            "exact_top1000_search_qps_8.8M_docs_direct")
        state = json.load(open(bench.STATE_PATH))
        assert state["proven_segs"][str(bench.N_FULL)] == 6

    def test_provisional_lines_after_every_rung(self, fast, monkeypatch,
                                                capsys):
        """Every successful rung emits a parseable metric line, each one a
        superset of the record before it (kill-at-any-point safety)."""
        def rung(n, segs, q):
            if n == bench.N_FULL:
                return FakeProc(returncode=1, stderr="would not allocate")
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res, lines = run_main(monkeypatch, capsys, rung)
        # 2 successful insurance rungs -> 2 provisionals + the final repeat
        assert len(lines) == 3
        for m in lines:
            assert set(m) == {"metric", "value", "unit", "vs_baseline"}
            assert m["unit"] == "qps"
        assert "slope_extrapolated" in res["metric"]

    def test_extrapolates_when_full_rung_fails(self, fast, monkeypatch,
                                               capsys):
        """8.8M never fits: the metric label says slope-extrapolated, the
        wide probe is skipped, vs_baseline uses the affine projection."""
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            if n == bench.N_FULL:
                return FakeProc(returncode=1, stderr="would not allocate")
            # 2e-9 s/doc sits above the HBM-peak slope floor (1.875e-9),
            # so the affine projection passes through unclamped
            return FakeProc(stdout=f"RUNG {n} {2e-9 * n:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
        assert "slope_extrapolated" in res["metric"]
        assert all(q == bench.Q_CHIP for _, _, q in calls)
        n_meas = 4_420_911
        t_full = 2e-9 * bench.N_FULL  # exact affine data -> exact projection
        assert res["value"] == round(bench.Q_CHIP / (2e-9 * n_meas), 1)
        assert res["vs_baseline"] == round(
            bench.Q_GLOBAL / t_full / 10_000.0, 3)

    def test_flat_slope_clamped_to_hbm_floor(self, fast, monkeypatch,
                                             capsys):
        """Two insurance rungs whose measured times are nearly equal (run
        variance ~1 ms exceeds their 2.2M-doc stream delta) must not
        project a faster-than-HBM 8.8M time: the extrapolation slope is
        floored at the D*2-bytes-per-doc / 819 GB/s physics bound."""
        def rung(n, segs, q):
            if n == bench.N_FULL:
                return FakeProc(returncode=1, stderr="would not allocate")
            return FakeProc(stdout=f"RUNG {n} 0.024000\n")  # flat slope

        res, _ = run_main(monkeypatch, capsys, rung)
        floor = bench.D * 2 / 819e9
        t_full = 0.024 + floor * (bench.N_FULL - 4_420_911)
        assert res["vs_baseline"] == round(
            bench.Q_GLOBAL / t_full / 10_000.0, 3)

    def test_top_rung_timeout_still_emits_metric(self, fast, monkeypatch,
                                                 capsys):
        """A hung/killed top-rung subprocess stops escalation but the
        record (extrapolated) still lands."""
        def rung(n, segs, q):
            if n == bench.N_FULL:
                raise subprocess.TimeoutExpired(cmd="rung", timeout=1)
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
        assert "slope_extrapolated" in res["metric"]

    def test_budget_exhaustion_finalizes_early(self, clock, monkeypatch,
                                               capsys):
        """The r3 failure mode: the top rung's proven build fails and the
        1200s reclaim settle no longer fits — the run must finalize with
        the extrapolated record instead of sleeping past the driver's
        wall clock."""
        with open(bench.STATE_PATH, "w") as f:
            json.dump({"proven_segs": {str(bench.N_FULL): 4}}, f)
        monkeypatch.setattr(bench, "BUDGET_S", 1800.0)
        calls = []

        def rung(n, segs, q):
            calls.append((n, segs, q))
            if n == bench.N_FULL and segs == 4:
                return FakeProc(returncode=1, stderr="would not allocate")
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung, clock)
        assert "slope_extrapolated" in res["metric"]
        # the 8-segment retry was skipped for budget, not attempted
        full = [c for c in calls if c[0] == bench.N_FULL]
        assert [c[1] for c in full] == [4]
        assert clock.t <= 1800.0 + bench.RUNG_TIMEOUT_S

    def test_budget_skips_unaffordable_rungs(self, clock, monkeypatch,
                                             capsys):
        """A tiny budget measures what fits and still emits a metric."""
        monkeypatch.setattr(bench, "BUDGET_S", 400.0)

        def rung(n, segs, q):
            return FakeProc(stdout=f"RUNG {n} {1e-9 * n:.9f}\n")

        res, lines = run_main(monkeypatch, capsys, rung, clock)
        assert "slope_extrapolated" in res["metric"]
        assert len(lines) >= 2  # at least one rung + final

    def test_no_rung_fits_raises(self, fast, monkeypatch, capsys):
        def rung(n, segs, q):
            return FakeProc(returncode=1, stderr="would not allocate")

        install_rungs(monkeypatch, rung)
        with pytest.raises(SystemExit):
            bench.main()


class TestWideTileDefaults:
    def test_default_tile_g_auto_grants_vmem(self):
        """The measured-optimum default (tile_g=512, 40.7 ms vs 41.4 at
        256 on the 8.8M 6-segment rung) needs a per-kernel scoped-VMEM
        grant; bench must have set OPENMATCH_VMEM_KIB at import so both
        --rung mode (in-process pallas import) and rung subprocesses
        (inherited env) compile the wide gmax kernels."""
        assert bench.TILE_G == 512
        assert int(os.environ.get("OPENMATCH_VMEM_KIB", "0")) >= 32 * 1024

    def test_rung_subprocess_inherits_tile_env(self, fast, monkeypatch,
                                               capsys):
        """Rung subprocesses get no explicit tile flag — the knob rides
        the environment, so a parent override reaches them."""
        seen_env = []

        def fake_run(n, segs, q):
            seen_env.append(os.environ.get("OPENMATCH_VMEM_KIB"))
            if n == bench.N_FULL:
                return FakeProc(stdout=f"RUNG {n} 0.041\n")
            return FakeProc(stdout=f"RUNG {n} {2e-9 * n:.9f}\n")

        install_rungs(monkeypatch, fake_run)
        bench.main()
        capsys.readouterr()
        assert seen_env and all(e and int(e) >= 32 * 1024
                                for e in seen_env)


class TestDirtyExitSettle:
    def test_unexplained_crash_settles_before_big_build(self, fast,
                                                        monkeypatch, capsys):
        """A rung that dies WITHOUT the clean allocation-failure marker may
        still hold HBM server-side; the next >=8 GiB build must wait most
        of a reclaim horizon instead of just the clean-exit lag."""
        sleeps = []
        monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))

        def rung(n, segs, q):
            if n == 4_420_911:
                return FakeProc(returncode=-9, stderr="Killed")  # OS kill
            return FakeProc(stdout=f"RUNG {n} {2e-9 * n:.9f}\n")

        res, _ = run_main(monkeypatch, capsys, rung)
        # the headline still ran (crash on an insurance rung must not
        # forfeit it) but only after the extended settle
        assert res["metric"].startswith("exact_top1000_search_qps_8.8M")
        assert any(s >= 600 for s in sleeps)
