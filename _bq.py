import time, numpy as np, jax, jax.numpy as jnp
from openmatch_tpu.ops.mips import exact_search
rng = np.random.RandomState(0)
N, D, K = 1_000_000, 768, 1000
corpus = jnp.asarray(rng.randn(N, D).astype(np.float32), jnp.bfloat16)
for Q in [512, 1024]:
    queries = jnp.asarray(rng.randn(Q, D).astype(np.float32), jnp.bfloat16)
    fn = lambda: exact_search(queries, corpus, k=K, chunk_size=1_000_000, method="hier2")
    t0=time.time(); s,i=fn(); np.asarray(s.ravel()[0:1])
    print(f"Q={Q}: compile {time.time()-t0:.0f}s", flush=True)
    t0=time.time()
    for _ in range(3): s,i=fn()
    np.asarray(s.ravel()[0:1]); dt=(time.time()-t0)/3
    print(f"Q={Q}: {dt*1000:.1f} ms -> {Q/dt:,.0f} QPS @1M", flush=True)
