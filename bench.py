"""Headline benchmark: exact top-1k retrieval throughput at MS MARCO scale.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}

Baseline (BASELINE.json): >=10k QPS exact top-1k over the 8.8M-doc MS MARCO
corpus on a v4-8 (4 chips).

Deployment shape measured: QUERY-SPLIT. The whole corpus (8,841,823 x 768
bf16 = 12.7 GiB) fits each chip's HBM (v4: 32 GiB per chip), so the index
is REPLICATED per chip and a query batch is split 4 ways — 128 queries per
chip, each chip searching the full corpus, ZERO cross-chip communication
(ops/mips.query_sharded_search). This beats the corpus-sharded shape
(r1 bench): per-query selection work scales with the local query count,
and the [devices, Q, k] all-gather merge disappears.

The 4-chip batch time IS the single-chip time for a 128-query slice — the
four slices run concurrently with no interaction — so one chip measures it
directly (VERDICT r1 weak #3):
  t_slice   — measured: full search pipeline, Q=128, all N docs, 1 chip.
  projected_qps = 512 / t_slice   (4 chips serve 4 slices in parallel)

HBM adaptivity: this v5e has 16 GiB (vs the v4's 32) and the axon tunnel
transiently holds leaked buffers from failed/killed clients (reclaimed on
a ~10-20 min horizon), so the full index may not fit at run time. The
script measures an ASCENDING ladder of corpus sizes, stopping at the
first build failure — at most one failed allocation per run, since failed
allocations themselves leak until reclaim. Each rung runs in its OWN
subprocess (``bench.py --rung N``): a fresh TPU client per size means the
previous rung's corpus is released by clean process exit rather than
relying on in-client frees propagating through the tunnel (r2's 6.63M
build failed exactly that way). Big rungs store the corpus as N_SEGS
tile-aligned SEGMENT arrays (BlockCorpus.plain tuple): the search is
identical (per-segment gmax into one global selection; DMAs routed by
block id), but no single allocation exceeds ~1/N_SEGS of the corpus —
the r3 ladder watched a 9.5 GiB single buffer fail while same-total
smaller buffers fit (fragmented tunnel free list). If 8.8M was measured
directly, vs_baseline uses it; otherwise t(8.8M) is extrapolated along
the affine slope fitted to the two largest measured sizes (and the
metric label says so).

"value" is the MEASURED single-chip QPS (128 / t_slice) at the largest
measured N. Exactness at scale is audited by scripts/perf/corpus_scale.py
(recall vs an independent chunked top-k pass).

BUDGET AWARENESS (r4): the r3 run measured every rung through 7.74M and
then emitted NO metric at all — the 4-segment 8.8M build failed on
fragmentation and the 1200 s reclaim settle blew the driver's ~45 min
wall clock before the known-good 8-segment retry ran. Three fixes:
  (a) a PROVISIONAL metric JSON line is printed after every successful
      rung (the driver parses the LAST json line of stdout, so a later
      timeout or failure can only improve on, never erase, the record);
  (b) last-known-good segment counts persist in bench_state.json
      (env OPENMATCH_BENCH_STATE) — each rung tries its PROVEN config
      first; the faster fewer-segment build runs only as an UPGRADE
      attempt afterwards, with budget to spare, where its failure
      cannot cost the already-recorded direct measurement. Upgrade
      failures also persist: a config that failed MAX_UPGRADE_FAILS
      times across runs is fragmentation-blocked and skipped (the
      4-seg 8.8M build failed three quiet-tunnel attempts in r3-r4);
  (c) every settle window and subprocess timeout is capped against a
      wall-clock budget (env OPENMATCH_BENCH_BUDGET_S, default 2100 s);
      a rung whose settle + estimated run does not fit the remaining
      budget is skipped and the run finalizes with what it has.

RUNG ORDER (r5): the r4 run still ended rc=124 — it re-measured all
seven settled rungs (~25 min of budget, mostly reclaim settles) before
the 8.8M headline, leaving the 6-segment upgrade attempt to collide
with the driver's external timeout, the exact hard-kill-a-live-client
hazard the HBM rules forbid. The default order is now MEASURE_ORDER:
two cheap single-buffer insurance rungs (2.21M, 4.42M — both finish in
under a minute warm and bank a two-point slope-extrapolated provisional
line), then the 8.8M headline directly at its proven segment count
(6 segments = the measured 41.7 ms config; 8 = the always-works
fallback). A successful run finalizes rc=0 in ~15 min with every term
measured. OPENMATCH_BENCH_LADDER=full restores the full 7-rung ladder
for re-derivation when the proven state is suspected stale.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

GROUP = 8
# gmax grid-step width (corpus blocks per step). 256 compiles inside the
# default scoped-VMEM budget; 512 cuts per-step DMA boundary overhead and
# measured FASTER at the full 8.8M 6-segment rung (40.7 vs 41.4 ms; 1024
# measured 42.6 — the isolated-probe ordering 1024 < 512 < 256 does not
# survive the segmented path, so 512 is the measured optimum). Wide tiles
# need a per-kernel scoped-VMEM grant (the scratch exceeds Mosaic's
# ~16 MiB default): when tile_g > 256 and OPENMATCH_VMEM_KIB is unset,
# it is set below BEFORE any pallas_mips import — in-process for --rung
# mode and inherited by rung subprocesses. Storage layout (segment
# padding) follows the same value; segment counts proven at 256 were
# re-proven at 512 directly (same ~2.1 GiB segment sizes).
TILE_G = int(os.environ.get("OPENMATCH_TILE_G", "512"))
if TILE_G > 256 and not os.environ.get("OPENMATCH_VMEM_KIB"):
    # 32 MiB covers tile_g=512 (needs ~18M); scale up for wider tiles
    # (1024 measured a 29.5M ask). ceil-scaled so 257..511 never floors
    # to a zero grant.
    os.environ["OPENMATCH_VMEM_KIB"] = str(32 * 1024 * max(1, -(-TILE_G // 512)))
TARGET_QPS = 10_000.0
N_FULL = 8_841_823
D = 768
Q_GLOBAL, Q_CHIP, K = 512, 128, 1000
# wide throughput shape probed at the largest direct rung: the corpus
# stream is query-count-independent, so a bigger per-chip batch amortizes
# it (2x the latency; BASELINE bounds QPS only). 256 = 2 query tiles;
# its gmax resident is [256, NB] f32 = 1.13 GiB at 8.8M — fits only now
# that the segmented path writes one aliased buffer instead of
# concatenating parts (no 2x transient).
WIDE_Q = 256
# ascending measurement ladder: kept coarse so a bench run compiles at
# most 5 shapes (each fresh shape costs minutes over the remote-compile
# tunnel on the first run; the persistent cache makes reruns cheap). The
# 6.63M rung (9.5 GiB) narrows the slope extrapolation to 1.33x when the
# full 12.7 GiB corpus does not fit the chip's currently-usable HBM.
LADDER = (276_306, 1_105_227, 2_210_456, 4_420_911, 6_631_367, 7_736_595,
          N_FULL)
# default rung order (r5): two cheap insurance rungs, then the headline.
# See RUNG ORDER in the module docstring; env OPENMATCH_BENCH_LADDER=full
# switches back to the full LADDER.
MEASURE_ORDER = (2_210_456, 4_420_911, N_FULL)
# corpus STORAGE segments per rung (fragmentation lever; 1 = single buffer).
# The segmented HBM probe (scripts/perf/hbm_probe.py --segmented) proved
# 14 GiB resident as 1 GiB segments on a quiet tunnel, so the full 12.65 GiB
# corpus fits when allocated fine-grained — the r3 3-segment build failed on
# fragmentation (4.2 GiB segment), not a hard ceiling. Per-segment cost is
# real (~1.2 ms/extra segment at 6.63M: 2 segs 32.3 ms vs 8 segs 39.7), so
# each big rung lists an ASCENDING tuple of segment counts: coarsest
# (fastest) first, finer (allocation-safer) retried after a reclaim-horizon
# settle if the coarse build fails.
N_SEGS = {N_FULL: (1, 4, 6, 8, 16), 7_736_595: (4,), 6_631_367: (2,)}
RETRY_SETTLE_S = 1200  # failed allocs leak until a ~10-20 min reclaim
RUNG_TIMEOUT_S = 2700  # last-resort bound; a clean failure exits long before
# wall-clock budget for the WHOLE run. The r4 driver run was externally
# killed (rc=124) somewhere past ~30 min while a rung subprocess was
# live, so the budget must land the run at rc=0 well before that: 2100 s
# leaves ~5+ min of headroom under the tightest observed allotment. The
# MEASURE_ORDER success path needs ~15 min total; the budget only binds
# on failure paths (a leaked allocation's 1200 s reclaim settle + retry
# fits 2100 s when the failure happens at the headline rung; anything
# that does not fit is skipped and the run finalizes with the insurance
# rungs' extrapolated record).
BUDGET_S = float(os.environ.get("OPENMATCH_BENCH_BUDGET_S", 2100))
# last-known-good segment counts per rung, learned across runs. Seeded
# from the r3/r4 hardware measurements when the file is absent: the
# 6-segment 8.8M build (2.1 GiB segments) allocated on a quiet tunnel
# and measured 41.7 ms direct (docs/performance.md); 8 segments is the
# always-works fallback (~44.6 ms).
STATE_PATH = os.environ.get(
    "OPENMATCH_BENCH_STATE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bench_state.json"))
PROVEN_SEGS = {6_631_367: 2, 7_736_595: 4, N_FULL: 6}


# an upgrade config (fewer segments than proven) that failed allocation
# this many times across runs is fragmentation-blocked on this tunnel —
# stop attempting it (the 4-segment 8.8M build failed three quiet-tunnel
# attempts in rounds 3-4; each failure leaks HBM until the server
# reclaim, which is exactly what the round-end driver run cannot afford)
MAX_UPGRADE_FAILS = 2


def _load_state():
    """Returns (proven_segs, upgrade_fails): {n: segs} and {n: {segs:
    fail count}} learned across runs."""
    try:
        with open(STATE_PATH) as f:
            raw = json.load(f)
        proven = {int(k): int(v)
                  for k, v in raw.get("proven_segs", {}).items()}
        fails = {int(n): {int(s): int(c) for s, c in per.items()}
                 for n, per in raw.get("upgrade_fails", {}).items()}
        return proven, fails
    except (OSError, ValueError):
        return {}, {}


def _save_state(proven, fails=None):
    try:
        state = {"proven_segs":
                 {str(k): v for k, v in sorted(proven.items())}}
        if fails:
            state["upgrade_fails"] = {
                str(n): {str(s): c for s, c in sorted(per.items())}
                for n, per in sorted(fails.items()) if per}
        tmp = STATE_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
            f.write("\n")
        os.replace(tmp, STATE_PATH)
    except OSError as e:
        print(f"bench state not saved: {e}", file=sys.stderr)


def default_segs(n_docs):
    """The segment count a manual/one-off measurement should use: the
    PROVEN count (state file first, then the baked-in table), falling
    back to the SAFEST (most segments) option when nothing is proven —
    never index 0 of the options tuple, which for the full rung is the
    fragmentation-blocked single-buffer build (a guaranteed
    fail-and-leak on this tunnel)."""
    state_proven, _ = _load_state()
    return (state_proven.get(n_docs) or PROVEN_SEGS.get(n_docs)
            or max(N_SEGS.get(n_docs, (1,))))


def _est_rung_s(n_docs):
    """Conservative estimate of one rung subprocess's wall time (corpus
    build dominates; measured r3 rungs ran 20-300 s warm-cache)."""
    return 90 + n_docs * D * 2 / 2**30 * 25


def _metric_dict(times, q_meas=Q_CHIP, t_meas=None):
    """The headline metric computed from what has been measured so far —
    used both for the per-rung PROVISIONAL lines and the final line."""
    n_chips = Q_GLOBAL // Q_CHIP
    n_meas = max(times)
    if t_meas is None:
        t_meas = times[n_meas]
    if n_meas == N_FULL:
        t_full, label = t_meas, f"8.8M_docs_direct_q{q_meas}"
    else:
        sizes = sorted(times)[-2:]
        if len(sizes) == 2:
            slope = (times[sizes[1]] - times[sizes[0]]) / (sizes[1] - sizes[0])
        else:  # single point: per-doc scaling upper bound
            slope = times[sizes[0]] / sizes[0]
        # physics floor: every extra doc must at least stream its D*2
        # bytes from HBM at the ~819 GB/s v5e peak. Two small rungs can
        # measure a near-zero slope (run variance ~1 ms exceeds their
        # 2.2M-doc stream delta), and extrapolating that flatness to 8.8M
        # would overstate the projection by ~60% vs the direct
        # measurement (41.7 ms) — the provisional record must never
        # claim more than the hardware could possibly do.
        slope = max(slope, D * 2 / 819e9)
        t_full = t_meas + slope * (N_FULL - n_meas)
        label = f"{n_meas / 1e6:.1f}M_docs_slope_extrapolated"
    projected = n_chips * q_meas / t_full
    return {
        "metric": f"exact_top{K}_search_qps_{label}_1chip",
        "value": round(q_meas / t_meas, 1),
        "unit": "qps",
        "vs_baseline": round(projected / TARGET_QPS, 3),
    }


def build_block_corpus(jax, jnp, n_docs, seed=0, n_segs=1):
    """Plain-layout BlockCorpus built directly via donated chunked writes
    (never 2x resident; ~210 MB RNG transient per step). The single
    doc-major copy serves both the gmax kernel and the DMA rescore;
    ``n_segs`` > 1 builds it as that many tile-aligned segment arrays
    (same search, friendlier allocations on a fragmented free list).

    Raises RuntimeError immediately when a buffer cannot be allocated
    (no retry: a failed allocation leaks its reservation server-side until
    a ~10-20 min reclaim, so in-run retries only stack leaks)."""
    from openmatch_tpu.ops.pallas_mips import BlockCorpus

    NB = n_docs // GROUP
    tail = n_docs - NB * GROUP
    NBp = -(-NB // TILE_G) * TILE_G
    chunk = 17_269 * GROUP  # doc rows per fill step

    from openmatch_tpu.ops.pallas_mips import split_tiles

    seg_tiles = split_tiles(NBp // TILE_G, n_segs)

    @partial(jax.jit, donate_argnums=(0,), static_argnames=("rows",))
    def fill(buf, key, start, rows):
        block = jax.random.normal(key, (rows, D), jnp.bfloat16)
        return jax.lax.dynamic_update_slice(buf, block, (start, 0))

    segs = []
    row_lo = 0
    key = jax.random.PRNGKey(seed)
    for si, nt in enumerate(seg_tiles):
        rows_here = nt * TILE_G * GROUP
        # fail fast: a FAILED allocation leaks its reservation until the
        # ~10-20 min server-side reclaim, so retrying within a run only
        # stacks a second leaked reservation — one attempt per run, period
        try:
            seg = jnp.zeros((rows_here, D), jnp.bfloat16)
            np.asarray(seg.ravel()[0:1])
        except Exception:
            seg = None
        if seg is None:
            raise RuntimeError(
                f"corpus segment {si} ({rows_here * D * 2 / 2**30:.1f} GiB "
                f"of {NBp * GROUP * D * 2 / 2**30:.1f}) would not allocate")
        # fill only the VALID doc rows (pad rows beyond NB*GROUP stay 0
        # and are masked by the search; they exist only in the last seg)
        valid_here = min(max(NB * GROUP - row_lo, 0), rows_here)
        n_chunks = -(-valid_here // chunk) if valid_here else 0
        if n_chunks:
            key, *keys = jax.random.split(key, n_chunks + 1)
            for i in range(n_chunks):
                rows = min(chunk, valid_here - i * chunk)
                seg = fill(seg, keys[i], i * chunk, rows=rows)
        np.asarray(seg.ravel()[0:1])
        segs.append(seg)
        row_lo += rows_here
    tail_rows = jax.random.normal(jax.random.PRNGKey(seed + 7), (tail, D),
                                  jnp.bfloat16)
    plain = tuple(segs) if n_segs > 1 else segs[0]
    return BlockCorpus(cb=None, tail=tail_rows, n_docs=n_docs, plain=plain)


def time_slice(jax, jnp, n_docs, iters=8, n_segs=1, q_chip=Q_CHIP):
    """Measured seconds per q_chip-query batch over n_docs on this chip.

    The batch runs ``iters`` times inside ONE dispatched on-device
    fori_loop with a value-dependence chain between iterations (the
    tunnel costs ~27 ms per dispatch, which would otherwise swamp the
    measurement; XLA cannot hoist the loop body because each iteration's
    queries depend on the previous scores)."""
    from openmatch_tpu.ops.pallas_mips import (BlockCorpus,
                                               pallas_plain_topk_prepared)

    prep = build_block_corpus(jax, jnp, n_docs, n_segs=n_segs)
    queries = jax.random.normal(jax.random.PRNGKey(1), (q_chip, D), jnp.bfloat16)

    @jax.jit
    def loop(qs, plain, tail_rows):
        # arrays enter as ARGUMENTS (closed-over arrays this big would be
        # serialized into the program upload by the remote-compile tunnel);
        # n_docs stays a static python int via the closure
        p = BlockCorpus(cb=None, tail=tail_rows, n_docs=n_docs, plain=plain)

        def body(i, carry):
            s, _ = pallas_plain_topk_prepared(qs + carry, p, k=K,
                                              tile_g=TILE_G)
            return carry + s[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

        return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0.0))

    np.asarray(loop(queries, prep.plain, prep.tail))  # warm + full execution
    t0 = time.time()
    r = loop(queries, prep.plain, prep.tail)
    np.asarray(r)  # host readback: device sync is unreliable via the tunnel
    return (time.time() - t0) / iters


def run_rung(n_docs: int, n_segs: int = 0, q_chip: int = Q_CHIP):
    """Subprocess entry: measure ONE ladder rung and print its time as
    the final stdout line (``RUNG <n> <seconds>``). A fresh process per
    rung gives each size a clean TPU client: the corpus is released by
    process exit, not by an in-client free racing the tunnel."""
    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    if not n_segs:
        n_segs = default_segs(n_docs)
    else:
        _, fails = _load_state()
        if fails.get(n_docs, {}).get(n_segs, 0) >= MAX_UPGRADE_FAILS:
            # forced override of a recorded-blocked config: allowed (HBM
            # probing needs it) but loudly flagged — on this tunnel the
            # allocation will fail and leak until the server reclaim
            print(f"WARNING: {n_segs}-segment config at N={n_docs} is "
                  "fragmentation-blocked in bench_state.json — expect an "
                  "allocation failure that leaks HBM", file=sys.stderr)
    t = time_slice(jax, jnp, n_docs, n_segs=n_segs, q_chip=q_chip)
    print(f"RUNG {n_docs} {t:.6f}", flush=True)


def _run_rung_subprocess(n, segs, q_chip, deadline):
    """One rung attempt in a fresh subprocess. Returns
    ``(t_or_None, leaked, timed_out)`` — ``leaked`` means the failure was
    an allocation failure whose reservation stays leaked server-side
    until the ~10-20 min reclaim (a kill may also leak)."""
    import subprocess

    timeout = min(RUNG_TIMEOUT_S, max(60.0, deadline - time.time()))
    cmd = [sys.executable, os.path.abspath(__file__),
           "--rung", str(n), "--segs", str(segs)]
    if q_chip != Q_CHIP:
        cmd += ["--qchip", str(q_chip)]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"N={n}: rung timed out after {timeout:.0f}s "
              "(killed — HBM may leak until server reclaim)",
              file=sys.stderr)
        return None, True, True
    sys.stderr.write(proc.stderr)
    line = next((l for l in proc.stdout.splitlines()
                 if l.startswith("RUNG ")), None)
    if line is not None and proc.returncode == 0:
        return float(line.split()[2]), False, False
    leaked = "would not allocate" in (proc.stderr + proc.stdout)
    print(f"N={n}: rung failed (rc={proc.returncode}, {segs} segments)",
          file=sys.stderr)
    return None, leaked, False


def _measure_ladder(deadline):
    """Parent: one subprocess per ascending rung, each rung at its PROVEN
    segment count first (safer higher counts as fallbacks), a provisional
    metric line after every success, every wait capped by the budget."""
    times, segs_used, failed = {}, {}, {}
    proven = dict(PROVEN_SEGS)
    state_proven, upgrade_fails = _load_state()
    proven.update(state_proven)
    order = LADDER if os.environ.get("OPENMATCH_BENCH_LADDER") == "full" \
        else MEASURE_ORDER
    prev_gib = 0.0
    dirty_exit = False  # previous rung died unexplained (may hold HBM)
    for n in order:
        gib = n * D * 2 / 2**30
        options = N_SEGS.get(n, (1,))
        first = proven.get(n, options[0])
        # proven first, then only SAFER (more-segment) fallbacks; faster
        # fewer-segment configs run later as upgrade attempts so their
        # failure cannot cost the direct measurement. Configs whose
        # persisted cross-run allocation-failure count reached
        # MAX_UPGRADE_FAILS are fragmentation-blocked everywhere — a
        # blocked config must never become the first attempt (a stale or
        # seeded state file could otherwise point the headline rung at a
        # known-leaking build). Decided BEFORE the settle window so a
        # fully-blocked rung costs no budget and does not inflate the
        # next rung's settle.
        per_fail = upgrade_fails.get(n, {})
        unblocked = [s for s in options
                     if per_fail.get(s, 0) < MAX_UPGRADE_FAILS]
        safer = [s for s in unblocked if s > first]
        if per_fail.get(first, 0) < MAX_UPGRADE_FAILS:
            attempt_order = [first] + safer
        elif safer:
            attempt_order = safer
        elif unblocked:
            # nothing safer than the (blocked) proven config survives:
            # fall back SAFEST first — most segments — never ascending,
            # which would lead with the most fragmentation-prone build
            attempt_order = sorted(unblocked, reverse=True)
        else:
            print(f"N={n}: every segment config fragmentation-blocked "
                  "— skipped", file=sys.stderr)
            continue
        settle = 0
        if times and gib >= 8.0:
            # a clean subprocess exit releases its corpus, but the release
            # propagates through the tunnel with a lag: the r3 ladder saw
            # 9.5 GiB fail 28 s after the 6.3 GiB rung exited, and the same
            # allocation succeed in a later isolated run. Give big rungs a
            # settle window scaled to what the previous rung held.
            settle = 60 + int(prev_gib * 15)
        if dirty_exit and gib >= 8.0:
            # the previous rung died WITHOUT the clean allocation-failure
            # marker (native abort, OS kill): its corpus may sit leaked
            # server-side, so a big build straight after would fail and
            # stack a second reservation — give it most of a reclaim
            # horizon, not just the clean-exit lag
            settle = max(settle, 600)
        if time.time() + settle + _est_rung_s(n) > deadline:
            print(f"N={n}: skipped — remaining budget "
                  f"({deadline - time.time():.0f}s) cannot fit the rung",
                  file=sys.stderr)
            break
        if settle:
            print(f"N={n}: settling {settle}s before a {gib:.1f} GiB build",
                  file=sys.stderr)
            time.sleep(settle)
        prev_gib = gib
        t, leaked, timed_out, segs = None, False, False, attempt_order[0]
        for attempt, segs in enumerate(attempt_order):
            if attempt:
                # a failed ALLOCATION leaked its reservation: wait past
                # the server's ~10-20 min reclaim horizon before the
                # finer-grained retry. Other failures (e.g. a transient
                # "TPU backend setup" tunnel flake) leak nothing — retry
                # after a short settle.
                retry_settle = RETRY_SETTLE_S if leaked else 120
                if time.time() + retry_settle + _est_rung_s(n) > deadline:
                    print(f"N={n}: no budget for the {segs}-segment retry",
                          file=sys.stderr)
                    break
                print(f"N={n}: settling {retry_settle}s before retry "
                      f"with {segs} segments", file=sys.stderr)
                time.sleep(retry_settle)
            t, leaked, timed_out = _run_rung_subprocess(n, segs, Q_CHIP,
                                                        deadline)
            if t is not None or timed_out:
                break
            failed.setdefault(n, set()).add(segs)
        if t is None:
            if leaked or timed_out:
                break  # capacity exhausted / hang: bigger builds hopeless
            dirty_exit = True  # unexplained death: may still hold HBM
            continue  # transient flake: later rungs may still run —
            # never let a tunnel hiccup on a 3 GiB insurance rung cost
            # the 12.7 GiB headline measurement (but see dirty_exit)
        dirty_exit = False
        times[n] = t
        segs_used[n] = segs
        proven[n] = segs
        _save_state(proven, upgrade_fails)
        print(f"t_slice(N={n}) = {t * 1e3:.1f} ms ({segs} seg)",
              file=sys.stderr)
        # PROVISIONAL metric: the driver parses the last JSON line of
        # stdout, so anything that goes wrong later can only improve on,
        # never erase, this record
        print(json.dumps(_metric_dict(times)), flush=True)
    return times, segs_used, proven, failed, upgrade_fails


def _try_upgrade(times, segs_used, proven, failed, upgrade_fails, deadline):
    """Attempt the fastest (fewest-segment) config for the largest
    measured rung, AFTER its proven config is already on record. Returns
    True when the attempt failed with a leaked allocation (callers should
    then skip further big builds until the server reclaim). Configs whose
    persisted cross-run failure count has reached MAX_UPGRADE_FAILS are
    fragmentation-blocked and never attempted again (clear the
    upgrade_fails entry in bench_state.json to re-enable)."""
    n = max(times)
    per_fail = upgrade_fails.get(n, {})
    blocked = sorted(s for s, c in per_fail.items()
                     if c >= MAX_UPGRADE_FAILS and s < segs_used[n])
    if blocked:
        print(f"N={n}: upgrade configs {blocked} fragmentation-blocked "
              f"({MAX_UPGRADE_FAILS}+ failed attempts on record) — skipped",
              file=sys.stderr)
    faster = sorted(s for s in N_SEGS.get(n, (1,))
                    if s < segs_used[n] and s not in failed.get(n, ())
                    and per_fail.get(s, 0) < MAX_UPGRADE_FAILS)
    if not faster:
        return False
    segs = faster[0]
    settle = 60 + int(n * D * 2 / 2**30 * 15)  # release lag for prev corpus
    if time.time() + settle + _est_rung_s(n) > deadline:
        print(f"N={n}: no budget for the {segs}-segment upgrade attempt",
              file=sys.stderr)
        return False
    print(f"N={n}: upgrade attempt with {segs} segments (current "
          f"{segs_used[n]} segs = {times[n] * 1e3:.1f} ms)", file=sys.stderr)
    time.sleep(settle)
    t, leaked, timed_out = _run_rung_subprocess(n, segs, Q_CHIP, deadline)
    if t is not None and t < times[n]:
        times[n] = t
        segs_used[n] = segs
        proven[n] = segs
        _save_state(proven, upgrade_fails)
        print(f"t_slice(N={n}) = {t * 1e3:.1f} ms ({segs} seg, upgraded)",
              file=sys.stderr)
        print(json.dumps(_metric_dict(times)), flush=True)
    elif t is None and leaked and not timed_out:
        # count only EXPLICIT allocation failures ("would not allocate")
        # toward the permanent block. Timeouts are ambiguous — a
        # budget-capped subprocess killed mid-compile (first compiles
        # cost minutes through the tunnel) would otherwise permanently
        # block a viable config — and transient tunnel flakes leak
        # nothing; neither should accrue
        per_fail = upgrade_fails.setdefault(n, {})
        per_fail[segs] = per_fail.get(segs, 0) + 1
        _save_state(proven, upgrade_fails)
    return leaked


def _tpu_available() -> bool:
    """Detect the axon tunnel WITHOUT initializing a jax client in this
    process: the parent must never claim the chip — the tunnel serves one
    client at a time, so a parent-held claim would deadlock the per-rung
    subprocesses."""
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")) or \
        "axon" in os.environ.get("JAX_PLATFORMS", "")


def _tpu_preflight(timeout_s: int = 420) -> bool:
    """Bounded live-ness check in a SUBPROCESS: when the tunnel is down,
    backend init HANGS rather than raising (observed during an r3
    outage), so without this every ladder rung would burn its full
    RUNG_TIMEOUT. A killed pre-allocation client leaks nothing."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('TPU_OK')"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"TPU preflight hung >{timeout_s}s (tunnel down?) — "
              "falling back to the CPU bench path", file=sys.stderr)
        return False
    if "TPU_OK" not in proc.stdout:
        print("TPU preflight failed — falling back to the CPU bench "
              f"path\n{proc.stderr[-500:]}", file=sys.stderr)
        return False
    return True


def main():
    n_chips = Q_GLOBAL // Q_CHIP
    deadline = time.time() + BUDGET_S

    tpu_configured = _tpu_available()
    if not (tpu_configured and _tpu_preflight()):
        # CPU fallback keeps the harness runnable anywhere; the label
        # distinguishes "no TPU configured" from "TPU configured but the
        # tunnel is unreachable" (an 8h relay outage hit round 3 — the
        # real measured numbers live in docs/performance.md)
        why = "_tunnel_down" if tpu_configured else ""
        from openmatch_tpu.drivers.common import enable_compilation_cache

        enable_compilation_cache()
        import jax

        # the axon plugin force-appends itself to jax_platforms, so when
        # the tunnel exists-but-is-down the CPU fallback must pin the
        # platform explicitly or backend init hangs anyway
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        from openmatch_tpu.ops.mips import Searcher

        N = 100_000
        rng = np.random.RandomState(0)
        corpus = jnp.asarray(rng.randn(N, D).astype(np.float32), jnp.bfloat16)
        queries = jnp.asarray(rng.randn(Q_CHIP, D).astype(np.float32), jnp.bfloat16)
        searcher = Searcher(corpus, k=K, method="auto")
        run = lambda: searcher.search(queries)[0]
        np.asarray(run().ravel()[0:1])
        t0 = time.time()
        for _ in range(3):
            out = run()
        np.asarray(out.ravel()[0:1])
        t = (time.time() - t0) / 3
        print(json.dumps({
            "metric": f"exact_top{K}_search_qps_{N / 1e6:.1f}M_docs_cpu{why}",
            "value": round(Q_CHIP / t, 1),
            "unit": "qps",
            "vs_baseline": round(Q_GLOBAL / t / TARGET_QPS, 3),
        }))
        return

    # ascending ladder, one subprocess per rung; a provisional metric line
    # is printed after every successful rung, so everything below can only
    # improve on the record already on stdout
    times, segs_used, proven, failed, upgrade_fails = _measure_ladder(deadline)
    if not times:
        raise SystemExit("no ladder size fit in HBM")

    leaked = _try_upgrade(times, segs_used, proven, failed, upgrade_fails,
                          deadline)
    n_meas = max(times)
    t_meas = times[n_meas]
    q_meas = Q_CHIP
    if n_meas == N_FULL and not leaked and segs_used.get(N_FULL, 0) > 1:
        # the Q=256 probe is gated off the SINGLE-BUFFER config: its gmax
        # resident ([256, NB] f32 = 1.13 GiB) on top of the one 12.65 GiB
        # corpus buffer exceeds the ~13 GiB this runtime exposes, so the
        # probe could only fail-and-leak right after the best headline
        # measurement of the run
        # wide-shape probe: the corpus stream (~15 ms at 8.8M) is
        # query-count-independent, so a 256-query per-chip batch amortizes
        # it — more QPS at 2x the latency (BASELINE has no latency bound).
        # Run it only when 8.8M measured directly, last, in its own
        # subprocess: a failed allocation here cannot hurt the already-
        # measured headline (it only leaks until the server reclaim);
        # skipped when the upgrade attempt just leaked a reservation.
        settle = 60 + int(n_meas * D * 2 / 2**30 * 15)  # release lag
        if time.time() + settle + _est_rung_s(n_meas) > deadline:
            print("wide-shape probe skipped: no budget", file=sys.stderr)
        else:
            time.sleep(settle)
            t_wide, _, _ = _run_rung_subprocess(
                N_FULL, segs_used[N_FULL], WIDE_Q, deadline)
            if t_wide is None:
                print("wide-shape probe failed; keeping the Q=128 result",
                      file=sys.stderr)
            else:
                print(f"wide shape Q={WIDE_Q}: t_slice={t_wide * 1e3:.1f} ms "
                      f"({WIDE_Q / t_wide:,.0f} qps/chip vs "
                      f"{Q_CHIP / t_meas:,.0f} at Q={Q_CHIP})",
                      file=sys.stderr)
                if WIDE_Q / t_wide > Q_CHIP / t_meas:
                    t_meas, q_meas = t_wide, WIDE_Q

    m = _metric_dict(times, q_meas=q_meas, t_meas=t_meas)
    projected = m["vs_baseline"] * TARGET_QPS
    print(
        f"t_slice={t_meas * 1e3:.1f}ms (Q={q_meas}, N={n_meas}, 1 chip); "
        f"projected {n_chips}-chip replicated-index 8.8M-doc qps={projected:,.0f}",
        file=sys.stderr,
    )
    print(json.dumps(m), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--rung":
        segs = int(sys.argv[sys.argv.index("--segs") + 1]) \
            if "--segs" in sys.argv else 0
        qchip = int(sys.argv[sys.argv.index("--qchip") + 1]) \
            if "--qchip" in sys.argv else Q_CHIP
        run_rung(int(sys.argv[2]), segs, qchip)
    else:
        main()
