import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.RandomState(0)
N, D, K, Q, G = 1_000_000, 768, 1000, 256, 8
corpus = jnp.asarray(rng.randn(N, D).astype(np.float32), jnp.bfloat16)
queries = jnp.asarray(rng.randn(Q, D).astype(np.float32), jnp.bfloat16)

def t(name, f, *a):
    r = f(*a); np.asarray(jax.tree.leaves(r)[0].ravel()[0:1])
    t0 = time.time()
    for _ in range(5): r = f(*a)
    np.asarray(jax.tree.leaves(r)[0].ravel()[0:1])
    print(f"{name}: {(time.time()-t0)/5*1000:.1f} ms", flush=True)
    return r

CH = 250_000
@jax.jit
def phase_a(queries, corpus):
    chunks = corpus.reshape(4, CH, D)
    def step(c, chunk):
        s = jnp.dot(queries, chunk.T, preferred_element_type=jnp.float32)
        return c, s.reshape(Q, CH // G, G).max(axis=-1)
    _, g = jax.lax.scan(step, 0, chunks)
    return jnp.transpose(g, (1, 0, 2)).reshape(Q, N // G)
gmax = t("A: matmul+gmax scan", phase_a, queries, corpus)

@jax.jit
def phase_b(gmax):
    ng = gmax.shape[1]
    smax = gmax.reshape(Q, ng // 8, 8).max(axis=-1)
    _, si = jax.lax.top_k(smax, K)
    mg = jnp.take_along_axis(gmax.reshape(Q, ng // 8, 8), si[:, :, None], axis=1).reshape(Q, 8 * K)
    mi = (si[:, :, None] * 8 + jnp.arange(8, dtype=jnp.int32)).reshape(Q, 8 * K)
    _, pos = jax.lax.top_k(mg, K)
    return jnp.take_along_axis(mi, pos, axis=1)
gids = t("B: 2-level selection", phase_b, gmax)

@jax.jit
def phase_c(gids, queries, corpus):
    cand = (gids[:, :, None] * G + jnp.arange(G, dtype=jnp.int32)).reshape(Q, K * G)
    rows = jnp.take(corpus, cand.reshape(-1), axis=0).reshape(Q, K * G, D)
    s = jnp.einsum("qcd,qd->qc", rows, queries, preferred_element_type=jnp.float32)
    s2, p = jax.lax.top_k(s, K)
    return s2, jnp.take_along_axis(cand, p, axis=1)
t("C: gather+rescore+topk", phase_c, gids, queries, corpus)
