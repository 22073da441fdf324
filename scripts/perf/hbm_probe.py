"""Probe usable HBM and jit buffer-donation behavior on this chip.

SAFETY: ascend and stop at the first failure. On the axon tunnel an
allocation beyond the physical ceiling can HANG (never raise), and a
FAILED allocation leaks its reservation server-side until a ~10-20 min
reclaim horizon — so never probe by failing repeatedly, and never start
near the top. (Observed on this v5e: largest proven resident 11.9 GiB;
the 16 GB part exposes ~13 GiB usable through this runtime.)

    python scripts/perf/hbm_probe.py              # single-buffer ladder
    python scripts/perf/hbm_probe.py --segmented  # 1 GiB segments, held
                                                  # resident: pins the
                                                  # usable ceiling to
                                                  # within 1 GiB with
                                                  # exactly ONE failed
                                                  # allocation
"""

from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    GB = 2**30

    # donation probe first (well below any plausible ceiling): two
    # resident 9 GiB buffers would exceed it, so the donated update below
    # only succeeds if donation is honored
    n = int(9.0 * GB // (6144 * 2))

    @partial(jax.jit, donate_argnums=(0,))
    def fill(buf, key):
        block = jax.random.normal(key, (1024, 6144), jnp.bfloat16)
        return jax.lax.dynamic_update_slice(buf, block, (0, 0))

    try:
        buf = jnp.zeros((n, 6144), jnp.bfloat16)
        np.asarray(buf.ravel()[0:1])
        print("alloc 9.0 GiB: OK", flush=True)
        buf = fill(buf, jax.random.PRNGKey(0))
        np.asarray(buf.ravel()[0:1])
        print("donated 9 GiB update: OK (donation honored)", flush=True)
        del buf
    except Exception as e:
        print(f"9 GiB phase failed: {type(e).__name__}", flush=True)

    for gb in (10.0, 11.0, 12.0, 12.7, 13.2):
        n = int(gb * GB // (6144 * 2))
        try:
            buf = jnp.zeros((n, 6144), jnp.bfloat16)
            np.asarray(buf.ravel()[0:1])
            print(f"alloc {gb:.1f} GiB: OK", flush=True)
            del buf
        except Exception as e:
            print(f"alloc {gb:.1f} GiB: FAIL {type(e).__name__} — stopping "
                  "(a failed allocation leaks until reclaim)", flush=True)
            break


def main_segmented():
    """Hold ascending 1 GiB segments resident until one fails.

    Mirrors how bench.py's segmented corpus allocates (many mid-size
    buffers instead of one giant one — immune to free-list
    fragmentation), so the total it reaches is the ceiling that matters
    for the biggest ladder rungs. Exactly one failed (leaked-until-
    reclaim) allocation at the end, by construction.
    """
    import jax
    import jax.numpy as jnp

    GB = 2**30
    rows_per_gib = GB // (6144 * 2)

    held = []
    total = 0
    for i in range(16):
        try:
            seg = jnp.zeros((rows_per_gib, 6144), jnp.bfloat16)
            np.asarray(seg.ravel()[0:1])
        except Exception as e:
            print(f"segment {i} (+1 GiB on {total} GiB resident): FAIL "
                  f"{type(e).__name__} — usable ceiling in "
                  f"[{total}, {total + 1}) GiB", flush=True)
            break
        held.append(seg)
        total += 1
        print(f"resident {total} GiB: OK", flush=True)
    else:
        print(f"resident {total} GiB: OK (probe exhausted)", flush=True)


if __name__ == "__main__":
    import sys

    if "--segmented" in sys.argv:
        main_segmented()
    else:
        main()
