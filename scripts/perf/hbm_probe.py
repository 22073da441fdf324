"""Probe usable HBM and jit buffer-donation behavior on this chip.

    python scripts/perf/hbm_probe.py
"""

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    GB = 2**30
    for gb in (15.0, 14.5, 14.0, 13.6, 13.0, 12.0):
        n = int(gb * GB // (6144 * 2))
        try:
            buf = jnp.zeros((n, 6144), jnp.bfloat16)
            np.asarray(buf.ravel()[0:1])
            print(f"alloc {gb:.1f} GB: OK", flush=True)
            del buf
            break
        except Exception as e:
            print(f"alloc {gb:.1f} GB: {type(e).__name__}", flush=True)
            del buf  # noqa: F821 -- may be unbound; best-effort
    time.sleep(1)

    # donation probe: two resident 9 GB buffers would exceed any answer
    # above, so the update below only succeeds if donation is honored
    n = int(9.0 * GB // (6144 * 2))

    @partial(jax.jit, donate_argnums=(0,))
    def fill(buf, key):
        block = jax.random.normal(key, (1024, 6144), jnp.bfloat16)
        return jax.lax.dynamic_update_slice(buf, block, (0, 0))

    try:
        buf = jnp.zeros((n, 6144), jnp.bfloat16)
        np.asarray(buf.ravel()[0:1])
        buf = fill(buf, jax.random.PRNGKey(0))
        np.asarray(buf.ravel()[0:1])
        print("donated 9 GB update: OK (donation honored)", flush=True)
    except Exception as e:
        print(f"donated 9 GB update: {type(e).__name__} "
              "(donation likely IGNORED)", flush=True)


if __name__ == "__main__":
    main()
