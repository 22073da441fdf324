"""Pallas TPU kernels for exact MIPS (faiss IndexFlatIP capability,
reference retriever/dense_retriever.py:40, rebuilt TPU-first).

PRODUCTION PATH — ``pallas_plain_topk_prepared`` over ONE prepared
doc-major corpus copy (``prepare_plain_corpus``; 12.7 GiB holds all 8.8M
MS MARCO passages on a chip):

  A. ``fused_plain_gmax`` streams the corpus once, emitting per-8-doc-
     block score maxima. Computed TRANSPOSED (docs on sublanes) so the
     member reduction is eight f32 sublane-strided loads —
     tpu.strided_load handles only 32-bit data with a 128-lane base, so
     neither the bf16 corpus nor lane-major scores can be member-sliced.
  B. ``_select_groups`` (ops/mips.py): exact max-pyramid top-k of blocks,
     planned from profiled TopK/slab-gather cost curves; the covering
     argument of hier2 applies per level, so no lax.top_k input is wider
     than fanout*k at any corpus size.
  C. ``pallas_gather_rescore``: the selected blocks' [8, D] doc slices —
     whole (8,128)-tile-aligned units — are fetched with explicit
     in-kernel async copies (8 queries x kt blocks in flight per grid
     step; block ids scalar-prefetched into SMEM) and re-scored on the
     MXU. Replaces an XLA row-gather that ran at ~137 GB/s.

Also here, kept as benchmarked alternatives: the block-row layout
(``fused_block_gmax`` over [NB, 8*D] rows + XLA row-gather rescore), the
score-materializing variant (``fused_scores`` doc-major [Q, N] store +
slab-gathered candidates), and the r1 strided-slab fused kernel
(``fused_score_gmax``). docs/performance.md has the measured comparison;
see /opt/skills/guides/pallas_guide.md for the hardware model.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mips import _plan_pyramid, _select_groups

GROUP = 8
# v5e scoped-vmem stack limit is 16 MiB; Mosaic adds ~1.4 MiB of overhead
# beyond the block buffers (measured: a 15.5 MiB block plan compiled to a
# 16.88 MiB allocation), so budget against 14.5 MiB.
# Mosaic's default scoped-VMEM budget is ~16 MB; kernels guard their
# double-buffered working sets against this slightly-conservative cap.
# OPENMATCH_VMEM_KIB raises the guard for wide-tile experiments AND is
# granted to the compiler per-kernel via CompilerParams.vmem_limit_bytes
# (the global --xla_tpu_scoped_vmem_limit_kib XLA flag hard-aborts on this
# jaxlib/libtpu build — "Unknown flag"; the per-kernel route is the one
# that works). Read at import, process-start only.
_SCOPED_VMEM = (int(os.environ["OPENMATCH_VMEM_KIB"]) * 1024
                if os.environ.get("OPENMATCH_VMEM_KIB")
                else int(14.5 * 2**20))
# only request a non-default compiler budget when the knob is set: the
# default None keeps production kernels byte-identical to r4's compiles
# (and their persistent-cache entries)
_VMEM_LIMIT_ARG = (int(os.environ["OPENMATCH_VMEM_KIB"]) * 1024
                   if os.environ.get("OPENMATCH_VMEM_KIB") else None)
# hard ceiling for any auto-granted budget: v5e VMEM is 128 MiB total and
# the compiler needs headroom for its own spills — a plan past this is a
# caller error, not something to grant
_VMEM_HARD_CAP = 96 * 2**20


def _gmax_vmem(need: int):
    """(grant_bytes_or_None, ) for a gmax block plan needing ``need``
    scoped-VMEM bytes. The env knob always wins when set; otherwise
    plans that fit Mosaic's default budget request nothing (None keeps
    production tile_g=256 compiles — and their persistent-cache entries
    — byte-identical), and wider plans are granted their computed need
    plus headroom automatically (a tile_g=512 caller shouldn't have to
    know the env knob). Raises past the physical ceiling."""
    if need > max(_VMEM_HARD_CAP, _SCOPED_VMEM):
        raise ValueError(f"block plan needs {need / 2**20:.1f} MB scoped "
                         f"VMEM, past the {_VMEM_HARD_CAP / 2**20:.0f} MB "
                         "physical ceiling — shrink tile_g or tile_q")
    if _VMEM_LIMIT_ARG is not None:
        if need > _VMEM_LIMIT_ARG:
            # fail with the actionable error, not a raw Mosaic scoped-vmem
            # stack OOM at compile time (an undersized knob left over from
            # a narrower experiment would otherwise abort mid-compile)
            raise ValueError(
                f"block plan needs {need / 2**20:.1f} MB scoped VMEM but "
                f"OPENMATCH_VMEM_KIB grants only "
                f"{_VMEM_LIMIT_ARG / 2**20:.1f} MB — raise the knob or "
                "shrink tile_g/tile_q")
        return _VMEM_LIMIT_ARG
    if need <= _SCOPED_VMEM:
        return None
    return need + 4 * 2**20


def _interpret_mode() -> bool:
    """Pallas kernels run the interpreter on CPU (tests and the CPU-mesh
    multichip dryrun) and compile via Mosaic on TPU. Evaluated at trace
    time, so a jitted caller bakes in the right mode per backend."""
    return jax.default_backend() == "cpu"


def split_tiles(total_tiles: int, n_segs: int) -> list:
    """Tile counts per corpus segment: ceil-split into ``n_segs``
    near-equal parts (the first total%n segments get one extra tile),
    clamped to at most one segment per tile. The ONE place the
    segmentation split policy lives — the bench corpus builder, library
    prepares, mesh replication, and perf phases must all agree or their
    storage layouts silently diverge."""
    n_segs = max(1, min(n_segs, total_tiles))
    seg_tiles = [total_tiles // n_segs] * n_segs
    for i in range(total_tiles % n_segs):
        seg_tiles[i] += 1
    return seg_tiles


def _check_vmem(tile: int, tile_q: int, D: int, with_scores: bool):
    """Every block is double-buffered by the Mosaic pipeline; the sum must
    fit the 16 MB scoped VMEM or compilation fails with a stack OOM."""
    per_step = tile * D * 2 + tile_q * D * 2 + tile_q * (tile // GROUP) * 4
    if with_scores:
        per_step += tile_q * tile * 4
    need = 2 * per_step
    if need > _SCOPED_VMEM:
        raise ValueError(
            f"tile={tile}, tile_q={tile_q} needs {need / 2**20:.1f} MB of "
            f"double-buffered VMEM (> {_SCOPED_VMEM // 2**20} MB scoped "
            "limit); shrink tile or tile_q"
        )


def _score_gmax_kernel(q_ref, c_ref, s_ref, g_ref):
    """q: [Q, D] bf16; c: [TILE, D] bf16; s: [Q, TILE] f32; g: [Q, TILE/8] f32."""
    scores = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s_ref[:] = scores
    gw = scores.shape[1] // GROUP
    g = scores[:, :gw]
    for m in range(1, GROUP):
        g = jnp.maximum(g, scores[:, m * gw : (m + 1) * gw])
    g_ref[:] = g


def _slab_gmax(scores_tile: jnp.ndarray) -> jnp.ndarray:
    """Reference (XLA) strided group max for one tile — used to patch the
    padded tail with identical semantics."""
    gw = scores_tile.shape[1] // GROUP
    g = scores_tile[:, :gw]
    for m in range(1, GROUP):
        g = jnp.maximum(g, scores_tile[:, m * gw : (m + 1) * gw])
    return g


@functools.partial(jax.jit, static_argnames=("tile", "tile_q"))
def fused_score_gmax(
    queries: jnp.ndarray, corpus: jnp.ndarray, tile: int = 2048, tile_q: int = 256
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(scores [Q, N] f32, gmax [Q, N/8] f32) with strided groups per tile.

    2D grid (corpus tile outer, query block inner): the corpus streams
    through VMEM exactly once while each [tile_q, D] query block revisits
    it; smaller per-step blocks leave room for Mosaic's double buffering
    (a Q=512-row score block at tile 2048 is 4 MB fp32 — two of those plus
    two corpus tiles overflow a 16 MB VMEM and serialize the pipeline,
    which is why the 1D-grid r1 kernel lost to XLA)."""
    Q, D = queries.shape
    N = corpus.shape[0]
    assert N % tile == 0 and tile % (GROUP * 128) == 0, (N, tile)
    _check_vmem(tile, tile_q, D, with_scores=True)
    q_pad = (-Q) % tile_q
    if q_pad:
        queries = jnp.pad(queries, ((0, q_pad), (0, 0)))
    Qp = Q + q_pad
    scores, gmax = pl.pallas_call(
        _score_gmax_kernel,
        grid=(N // tile, Qp // tile_q),
        in_specs=[
            pl.BlockSpec((tile_q, D), lambda n, qb: (qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda n, qb: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, tile), lambda n, qb: (qb, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, tile // GROUP), lambda n, qb: (qb, n), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, N), jnp.float32),
            jax.ShapeDtypeStruct((Qp, N // GROUP), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * N * D,
            bytes_accessed=Qp * D * 2 + N * D * 2 + Qp * N * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
    )(queries, corpus)
    if q_pad:
        scores, gmax = scores[:Q], gmax[:Q]
    return scores, gmax


@functools.partial(jax.jit, static_argnames=("k", "tile", "tile_q", "fanout"))
def pallas_hier2_search(
    queries: jnp.ndarray, corpus: jnp.ndarray, k: int = 1000, tile: int = 2048,
    tile_q: int = 256, fanout: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k: Pallas fused scoring + max-pyramid selection.

    Result set identical to exact_search(..., method="hier2") (ties aside).
    Corpus rows padded to a tile multiple internally.
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    k = min(k, N)
    pad = (-N) % tile
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    Np = N + pad
    gw = tile // GROUP  # groups per tile
    n_tiles = Np // tile
    n_groups = Np // GROUP

    scores, gmax = fused_score_gmax(queries, corpus, tile, tile_q)
    neg_inf = jnp.finfo(jnp.float32).min
    if pad:
        # zero-padded corpus rows score 0; mask them and re-derive the last
        # tile's group maxima from the masked scores (identical slab max).
        col = jax.lax.broadcasted_iota(jnp.int32, (Q, Np), 1)
        scores = jnp.where(col < N, scores, neg_inf)
        last = (n_tiles - 1) * tile
        gmax = gmax.at[:, (n_tiles - 1) * gw :].set(_slab_gmax(scores[:, last:]))

    if n_groups // 8 <= k or n_groups % 8:
        from .mips import _hier_topk

        # fall back to the plain exact path on the masked scores
        return _hier_topk(scores, k)

    gi = _select_groups(gmax, k, fanout)  # global group ids [Q, k]

    # strided-group member columns: tile_id*tile + within + m*gw
    tile_id = gi // gw
    within = gi % gw
    base = tile_id * tile + within  # [Q, k]
    cand_idx = (base[:, :, None] + jnp.arange(GROUP, dtype=jnp.int32) * gw).reshape(Q, k * GROUP)
    cand = jnp.take_along_axis(scores, cand_idx, axis=1)
    s, p = jax.lax.top_k(cand, k)
    return s, jnp.take_along_axis(cand_idx, p, axis=1)


def _gmax_only_kernel(q_ref, c_ref, g_ref):
    """Scoring epilogue WITHOUT storing scores: only strided group maxima
    leave the chip. Enables corpora whose [Q, N] score matrix cannot fit in
    HBM (e.g. 8.8M docs at Q=512 would need ~18 GB fp32)."""
    scores = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gw = scores.shape[1] // GROUP
    g = scores[:, :gw]
    for m in range(1, GROUP):
        g = jnp.maximum(g, scores[:, m * gw : (m + 1) * gw])
    g_ref[:] = g


@functools.partial(jax.jit, static_argnames=("tile", "tile_q"))
def fused_gmax_only(
    queries: jnp.ndarray, corpus: jnp.ndarray, tile: int = 2048, tile_q: int = 256
) -> jnp.ndarray:
    """gmax [Q, N/8] f32 with strided groups per tile; scores never stored.
    Same 2D (corpus tile, query block) grid as fused_score_gmax."""
    Q, D = queries.shape
    N = corpus.shape[0]
    assert N % tile == 0 and tile % (GROUP * 128) == 0, (N, tile)
    _check_vmem(tile, tile_q, D, with_scores=False)
    q_pad = (-Q) % tile_q
    if q_pad:
        queries = jnp.pad(queries, ((0, q_pad), (0, 0)))
    Qp = Q + q_pad
    gmax = pl.pallas_call(
        _gmax_only_kernel,
        grid=(N // tile, Qp // tile_q),
        in_specs=[
            pl.BlockSpec((tile_q, D), lambda n, qb: (qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda n, qb: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_q, tile // GROUP), lambda n, qb: (qb, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Qp, N // GROUP), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * N * D,
            bytes_accessed=Qp * D * 2 + N * D * 2 + Qp * (N // GROUP) * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
    )(queries, corpus)
    return gmax[:Q] if q_pad else gmax


@functools.partial(jax.jit, static_argnames=("k", "tile", "tile_q", "fanout"))
def pallas_hier2_rescore(
    queries: jnp.ndarray, corpus: jnp.ndarray, k: int = 1000, tile: int = 2048,
    tile_q: int = 256, fanout: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k WITHOUT materializing the score matrix.

    Phase A: Pallas gmax-only pass over the tile-ALIGNED corpus prefix (the
    only large intermediate is [Q, N/8] fp32, 8x smaller than scores); the
    sub-tile tail is scored in plain XLA with -inf masking so pad rows can
    never inflate a group max and steal a selection slot (adversarially
    tested). Phase B: max-pyramid exact selection on the group maxima.
    Phase C: gather the k*8 candidate corpus rows per query and rescore in
    fp32 (exact: bf16 inputs, fp32 accumulation like every other path).

    HBM for an 8.8M x 768 bf16 corpus at Q=256: corpus 13.5 GB +
    gmax 1.1 GB + candidates ~3 GB transient — fits one 16 GB v5e where
    the score-materializing paths cannot.
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    k = min(k, N)
    gw = tile // GROUP
    neg_inf = jnp.finfo(jnp.float32).min

    n_full = N // tile
    aligned = n_full * tile
    r = N - aligned  # tail rows (< tile)
    n_tiles = n_full + (1 if r else 0)
    Np = n_tiles * tile
    n_groups = Np // GROUP

    if n_groups // 8 <= k or n_full == 0:
        from .mips import exact_search

        return exact_search(queries, corpus, k=k)

    gmax = fused_gmax_only(queries, corpus[:aligned], tile, tile_q)
    if r:
        # tail tile in XLA: honest strided maxima over masked scores
        tail_scores = jnp.dot(queries, corpus[aligned:].T,
                              preferred_element_type=jnp.float32)
        tail_scores = jnp.pad(tail_scores, ((0, 0), (0, tile - r)),
                              constant_values=neg_inf)
        gmax = jnp.concatenate([gmax, _slab_gmax(tail_scores)], axis=1)
        corpus = jnp.pad(corpus, ((0, tile - r), (0, 0)))  # for the gather

    gi = _select_groups(gmax, k, fanout)

    tile_id = gi // gw
    within = gi % gw
    base = tile_id * tile + within
    cand_idx = (base[:, :, None] + jnp.arange(GROUP, dtype=jnp.int32) * gw).reshape(Q, k * GROUP)

    # rescore in query blocks: the [q, k*8, D] gathered-rows transient for
    # all queries at once (~3 GB at Q=256, k=1000, D=768 bf16) would not
    # coexist with a 13.5 GB corpus on a 16 GB chip
    QB = 32
    q_pad = (-Q) % QB
    cand_b = jnp.pad(cand_idx, ((0, q_pad), (0, 0))).reshape(-1, QB, k * GROUP)
    quer_b = jnp.pad(queries, ((0, q_pad), (0, 0))).reshape(-1, QB, D)

    def rescore_block(args):
        cidx, qb = args
        rows = jnp.take(corpus, cidx.reshape(-1), axis=0).reshape(QB, k * GROUP, D)
        sc = jnp.einsum("qcd,qd->qc", rows, qb, preferred_element_type=jnp.float32)
        sc = jnp.where(cidx < N, sc, neg_inf)
        sb, pb = jax.lax.top_k(sc, k)
        return sb, jnp.take_along_axis(cidx, pb, axis=1)

    s_blocks, i_blocks = jax.lax.map(rescore_block, (cand_b, quer_b))
    s = s_blocks.reshape(-1, k)[:Q]
    idx = i_blocks.reshape(-1, k)[:Q]
    return s, idx


# ---------------------------------------------------------------------------
# Block-layout path: contiguous 8-doc groups, gather-light selection.
#
# Measured on v5e (Q=512, k=1000, 1M docs): minor-axis gathers cost ~7 ms
# per [Q, k] descriptor set and scattered per-row gathers ~30 ns/row, which
# made the strided-group paths gather-bound (selection 28 ms, rescore >100).
# Viewing the corpus as [N/8, 8*D] block rows fixes the layout: the kernel
# contracts each of the 8 D-wide column slabs of a block tile against the
# queries (8 static-slice MXU matmuls) and maxes them, so a "group" is 8
# CONSECUTIVE docs and the rescore gather moves k contiguous 12 KB block
# rows per query instead of 8k scattered 1.5 KB rows.
# ---------------------------------------------------------------------------


class BlockCorpus(NamedTuple):
    """One-time prepared layout(s) of a corpus (see prepare_block_corpus /
    prepare_plain_corpus)."""

    # [NBp, GROUP*D] bf16 block rows, padded to tile_g — the operand of
    # fused_block_gmax. None in the plain-only regime (fused_plain_gmax
    # reads the plain layout directly; halves corpus HBM).
    cb: Optional[jnp.ndarray]
    tail: jnp.ndarray  # [N % GROUP, D] ragged tail docs
    n_docs: int        # true N (cb/plain hold the first N - N%GROUP docs)
    # [NBp*GROUP, D] plain doc-major padded corpus, or None. Serves the
    # DMA gather-rescore and the score-materializing path; the
    # (8,128)-tiled layouts of cb and plain differ, so holding both is a
    # real 2x corpus copy.
    plain: Optional[jnp.ndarray] = None


def prepare_block_corpus(
    corpus: jnp.ndarray, tile_g: int = 256, with_plain: Optional[bool] = None,
) -> BlockCorpus:
    """Reshape [N, D] into block rows [NB, GROUP*D] and pad to a tile_g
    multiple ONCE. Done per search call, the reshape and the pad each
    materialize a full corpus copy on TPU (~21 ms at 2.21M docs,
    profiled) — a Searcher holds the prepared layout instead.

    ``with_plain`` additionally keeps a padded doc-major copy for the
    score-materializing path; default: yes iff both copies fit comfortably
    (corpus < 4 GiB)."""
    N, D = corpus.shape
    NB = N // GROUP
    cb = corpus[: NB * GROUP].reshape(NB, GROUP * D)
    pad_b = (-NB) % tile_g
    if pad_b:
        cb = jnp.pad(cb, ((0, pad_b), (0, 0)))
    if with_plain is None:
        with_plain = N * D * 2 <= 4 * 2**30
    plain = None
    if with_plain:
        plain = jnp.pad(corpus[: NB * GROUP],
                        ((0, pad_b * GROUP), (0, 0))) if pad_b else corpus[: NB * GROUP]
    return BlockCorpus(cb=cb, tail=corpus[NB * GROUP:], n_docs=N, plain=plain)


def prepare_plain_corpus(corpus: jnp.ndarray, tile_g: int = 256,
                         n_segs: int = 1) -> BlockCorpus:
    """Prepared PLAIN-ONLY layout: one padded doc-major copy serves both
    the gmax kernel (fused_plain_gmax, D-chunked strided member loads)
    and the DMA gather-rescore — half the HBM of the cb+plain pair, which
    is what lets the whole 8.8M MS MARCO corpus fit one chip.

    ``n_segs`` > 1 stores the copy as that many tile-aligned SEGMENT
    arrays (BlockCorpus.plain becomes a tuple): same search cost, but
    each HBM allocation is 1/n_segs the size — for chips whose free HBM
    is large enough in total but fragmented (see _plain_topk_core).
    HBM-tight callers that cannot afford the transient doubled residency
    of preparing from a device-resident corpus should build the segment
    tuple directly (bench.py build_block_corpus does)."""
    N, D = corpus.shape
    NB = N // GROUP
    pad_b = (-NB) % tile_g
    plain = corpus[: NB * GROUP]
    if pad_b:
        plain = jnp.pad(plain, ((0, pad_b * GROUP), (0, 0)))
    if n_segs > 1:
        seg_tiles = split_tiles((NB + pad_b) // tile_g, n_segs)
        parts, lo = [], 0
        for nt in seg_tiles:
            parts.append(plain[lo * tile_g * GROUP:(lo + nt) * tile_g * GROUP])
            lo += nt
        plain = tuple(parts)
    return BlockCorpus(cb=None, tail=corpus[NB * GROUP:], n_docs=N,
                       plain=plain)


def _block_gmax_kernel(q_ref, cb_ref, g_ref):
    """q: [tq, D] bf16; cb: [tg, 8*D] bf16 (block row = 8 consecutive docs);
    g: [tq, tg] f32 per-block score max."""
    D = q_ref.shape[1]
    g = None
    for m in range(GROUP):
        sm = jax.lax.dot_general(
            q_ref[:], cb_ref[:, m * D:(m + 1) * D],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = sm if g is None else jnp.maximum(g, sm)
    g_ref[:] = g


def _check_vmem_block(tile_g: int, tile_q: int, D: int):
    need = 2 * (tile_g * GROUP * D * 2 + tile_q * D * 2 + tile_q * tile_g * 4)
    if need > _SCOPED_VMEM:
        raise ValueError(
            f"tile_g={tile_g}, tile_q={tile_q} needs {need / 2**20:.1f} MB "
            f"double-buffered VMEM (> {_SCOPED_VMEM / 2**20:.1f} MB budget); "
            "shrink tile_g or tile_q"
        )


@functools.partial(jax.jit, static_argnames=("tile_g", "tile_q"))
def fused_block_gmax(
    queries: jnp.ndarray, corpus_blocks: jnp.ndarray,
    tile_g: int = 256, tile_q: int = 512,
) -> jnp.ndarray:
    """Per-block score maxima [Q, NB] f32 from block rows [NB, 8*D] bf16."""
    Q, D = queries.shape
    NB = corpus_blocks.shape[0]
    assert corpus_blocks.shape[1] == GROUP * D
    assert NB % tile_g == 0, (NB, tile_g)
    _check_vmem_block(tile_g, tile_q, D)
    q_pad = (-Q) % tile_q
    if q_pad:
        queries = jnp.pad(queries, ((0, q_pad), (0, 0)))
    Qp = Q + q_pad
    gmax = pl.pallas_call(
        _block_gmax_kernel,
        grid=(NB // tile_g, Qp // tile_q),
        in_specs=[
            pl.BlockSpec((tile_q, D), lambda n, qb: (qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_g, GROUP * D), lambda n, qb: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_q, tile_g), lambda n, qb: (qb, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Qp, NB), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * NB * GROUP * D,
            bytes_accessed=Qp * D * 2 + NB * GROUP * D * 2 + Qp * NB * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
    )(queries, corpus_blocks)
    return gmax[:Q] if q_pad else gmax


def _plain_gmax_kernel(q_ref, c_ref, g_ref, s_scratch):
    """Per-block score maxima from the PLAIN doc-major corpus, computed
    TRANSPOSED (docs on sublanes).

    q: [tq, D] bf16; c: [tile_g*8, D] bf16 (tile_g blocks' doc rows);
    g: [tq, tile_g] f32 (block maxima, query-major — the kernel itself
    swaps axes before the store, so the wrapper output needs no XLA
    relayout pass); s_scratch: [tile_g*8, tq] f32.

    Member m's rows sit at sublane stride 8. tpu.strided_load handles
    only 32-bit data with a 128-lane base, so the bf16 corpus cannot be
    member-sliced directly; instead ONE [tile8, D] x [tq, D]^T dot puts
    the f32 scores doc-on-SUBLANE in scratch, and eight f32
    sublane-strided loads (stride 8, base last dim = tq = 128) reduce to
    the per-block max. Same FLOPs as the block-row kernel, but no
    [NB, 8*D] corpus copy — the single plain layout also serves the DMA
    gather-rescore."""
    st = jax.lax.dot_general(
        c_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tile8, tq] f32, docs on sublanes
    s_scratch[:] = st
    g = s_scratch[0::GROUP, :]
    for m in range(1, GROUP):
        g = jnp.maximum(g, s_scratch[m::GROUP, :])
    # transpose in-kernel (f32 transposes lower fine) so the [Q, NB]
    # output needs no XLA relayout pass — at 8.8M docs that pass costs
    # ~2 ms and a 0.53 GiB transient next to an already-full HBM
    g_ref[:] = jnp.swapaxes(g, 0, 1)


def _make_plain_gmax_l1_kernel(f1: int, tile_g: int, tile_lo: int,
                               nb_valid: Optional[int]):
    """_plain_gmax_kernel variant that ALSO emits the first selection-
    pyramid level (max over ``f1`` consecutive blocks) and, when
    ``nb_valid`` is given, masks pad blocks to -inf IN-KERNEL.

    Fusing the level-1 build here removes _select_groups' widest XLA
    reshape-max pass (a full read of the [Q, NB] f32 gmax — ~0.6 GiB at
    8.8M docs) and the separate pad-masking `where` pass over the same
    array (roadmap lever #1). The level-1 reduction reuses the sublane-
    strided-load pattern: g lands in a second f32 scratch and ``f1``
    stride-``f1`` sublane loads reduce it, so it needs tile_g % f1 == 0.
    """
    neg_inf = float(jnp.finfo(jnp.float32).min)  # python scalar: a traced
    # constant would be captured by the kernel closure, which pallas rejects

    def kernel(q_ref, c_ref, g_ref, l1_ref, s_scratch, g_scr):
        st = jax.lax.dot_general(
            c_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tile8, tq] f32, docs on sublanes
        s_scratch[:] = st
        g = s_scratch[0::GROUP, :]
        for m in range(1, GROUP):
            g = jnp.maximum(g, s_scratch[m::GROUP, :])
        if nb_valid is not None:
            # global block id of sublane r in this tile; pad blocks
            # (id >= nb_valid) must not win selection at ANY level
            base = (pl.program_id(1) + tile_lo) * tile_g
            row = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
            g = jnp.where(base + row < nb_valid, g, neg_inf)
        g_scr[:] = g
        l1 = g_scr[0::f1, :]
        for m in range(1, f1):
            l1 = jnp.maximum(l1, g_scr[m::f1, :])
        g_ref[:] = jnp.swapaxes(g, 0, 1)
        # l1 stays TRANSPOSED (level-1 maxima on sublanes): a query-major
        # block would be [tq, tile_g/f1] = 32 lanes, below Mosaic's
        # 128-lane output-block minimum; the wrapper transposes once in
        # XLA (8x smaller than gmax — ~0.1 ms at serving scale)
        l1_ref[:] = l1

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_g", "tile_q", "tile_lo",
                                             "n_tiles", "emit_l1",
                                             "nb_valid"))
def fused_plain_gmax(
    queries: jnp.ndarray, plain: jnp.ndarray,
    tile_g: int = 256, tile_q: int = 128,
    tile_lo: int = 0, n_tiles: Optional[int] = None,
    emit_l1: int = 0, nb_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Per-block score maxima [Q, n_tiles*tile_g] f32 from the plain
    [N, D] bf16 corpus (N % (tile_g*8) == 0). tile_q must be 128 on
    hardware (the strided member loads need a 128-lane base).

    ``tile_lo``/``n_tiles`` window the kernel onto corpus tiles
    [tile_lo, tile_lo + n_tiles) WITHOUT slicing the operand (a leading-
    dim slice of a 12.65 GiB corpus would materialize a copy; the
    BlockSpec index_map just offsets the DMA window) — the corpus-split
    lever that keeps the gmax resident at [Q, NB/split] when HBM is
    tight (roadmap lever #2).

    ``emit_l1`` = f > 0 (f must divide tile_g) additionally returns the
    first selection-pyramid level — maxima over f consecutive blocks,
    [Q, n_tiles*tile_g//f] f32 — built in-kernel while the scores are
    VMEM-resident, and ``nb_valid`` (a STATIC count of valid blocks)
    masks pad blocks to -inf in both outputs, replacing _select_groups'
    widest reshape-max and the caller's masking pass over the [Q, NB]
    array (roadmap lever #1). Returns (gmax, l1) in that mode."""
    Q, D = queries.shape
    N = plain.shape[0]
    NB = N // GROUP
    assert N % (tile_g * GROUP) == 0, (N, tile_g)
    assert emit_l1 == 0 or tile_g % emit_l1 == 0, (tile_g, emit_l1)
    assert nb_valid is None or emit_l1 > 0, \
        "in-kernel pad masking rides the emit_l1 kernel variant"
    total_tiles = NB // tile_g
    if n_tiles is None:
        n_tiles = total_tiles - tile_lo
    assert 0 <= tile_lo and tile_lo + n_tiles <= total_tiles, (
        tile_lo, n_tiles, total_tiles)
    # the strided member loads need a base whose last dim is EXACTLY 128
    # lanes, so the query tile is fixed there on hardware (tests pass
    # smaller tiles in interpret mode only)
    tile_q = min(tile_q, 128)
    need = 2 * (tile_g * GROUP * D * 2 + tile_q * D * 2
                + tile_g * tile_q * 4) + tile_g * GROUP * tile_q * 4
    if emit_l1:
        # g_scr scratch + double-buffered l1 out blocks
        need += tile_g * tile_q * 4 + 2 * tile_q * (tile_g // emit_l1) * 4
    vmem_arg = _gmax_vmem(need)
    q_pad = (-Q) % tile_q
    if q_pad:
        queries = jnp.pad(queries, ((0, q_pad), (0, 0)))
    Qp = Q + q_pad
    common = dict(
        grid=(Qp // tile_q, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_q, D), lambda qb, t: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_g * GROUP, D), lambda qb, t: (t + tile_lo, 0),
                         memory_space=pltpu.VMEM),
        ],
        compiler_params=pltpu.CompilerParams(
            # no grid step carries state, so "parallel" is semantically
            # valid for both dims; the default stays "arbitrary" because
            # the r4 roofline probe measured parallel as a wash (see
            # docs/performance.md). Like OPENMATCH_SEG_*, the env knob is
            # read at trace time — set it at process start only.
            dimension_semantics=(
                ("parallel", "parallel")
                if os.environ.get("OPENMATCH_GMAX_PARALLEL", "0") not in ("", "0")
                else ("arbitrary", "arbitrary")),
            # wide tiles (tile_g >= 512) need more scoped VMEM than
            # Mosaic's ~16 MiB default; the per-kernel limit is the only
            # granting route on this stack (the global XLA flag aborts).
            # None = compiler default, keeps cache keys stable.
            vmem_limit_bytes=vmem_arg,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * n_tiles * tile_g * GROUP * D,
            bytes_accessed=Qp * D * 2 + n_tiles * tile_g * GROUP * D * 2
            + Qp * n_tiles * tile_g * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
    )
    if emit_l1:
        w1 = tile_g // emit_l1
        gmax, l1t = pl.pallas_call(
            _make_plain_gmax_l1_kernel(emit_l1, tile_g, tile_lo, nb_valid),
            out_specs=[
                pl.BlockSpec((tile_q, tile_g), lambda qb, t: (qb, t),
                             memory_space=pltpu.VMEM),
                # transposed: query-major l1 blocks would be 32 lanes wide
                # (< the 128-lane Mosaic output-block minimum)
                pl.BlockSpec((w1, tile_q), lambda qb, t: (t, qb),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Qp, n_tiles * tile_g), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles * w1, Qp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_g * GROUP, tile_q), jnp.float32),
                pltpu.VMEM((tile_g, tile_q), jnp.float32),
            ],
            **common,
        )(queries, plain)
        l1 = jnp.swapaxes(l1t, 0, 1)
        return (gmax[:Q], l1[:Q]) if q_pad else (gmax, l1)
    gmax = pl.pallas_call(
        _plain_gmax_kernel,
        out_specs=pl.BlockSpec((tile_q, tile_g), lambda qb, t: (qb, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qp, n_tiles * tile_g), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_g * GROUP, tile_q), jnp.float32),
        ],
        **common,
    )(queries, plain)
    return gmax[:Q] if q_pad else gmax


@functools.partial(jax.jit, static_argnames=("tile_g", "tile_q", "emit_l1",
                                              "nb_valid"))
def fused_plain_gmax_segs(
    queries: jnp.ndarray, segs: Tuple[jnp.ndarray, ...],
    tile_g: int = 256, tile_q: int = 128,
    emit_l1: int = 8, nb_valid: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-segment gmax kernels writing into ONE [Q, NBp_total] output
    (and one level-1 array) — no XLA concat of per-segment pieces.

    The segmented-storage path used to run one fused_plain_gmax per
    segment and ``jnp.concatenate`` the [Q, nb_s] results: a full extra
    read+write of the gmax array (~1.4 ms at 8.8M docs) and, worse, a
    DOUBLED gmax transient (parts + concat output both live) — 1.13 GiB
    at Q=256/8.8M, which is what keeps the wider serving shape from
    fitting a 16 GiB chip next to the 12.65 GiB corpus. Here segment
    s's pallas_call windows its OUTPUT blocks at tile offset tile_lo_s
    (the out BlockSpec index_map adds the offset; the corpus index_map
    stays segment-local), and calls after the first alias the shared
    buffers via input_output_aliases, so every segment writes its
    columns in place. The first call allocates; its blocks outside
    segment 0's window hold garbage until the later calls overwrite
    them — the windows partition the tile range exactly.

    In-kernel pad masking (``nb_valid``) receives each segment's GLOBAL
    tile offset, so pad blocks in the last segment mask identically to
    the single-buffer kernel. Returns (gmax [Q, NBp], l1 [Q, NBp//emit_l1])
    — emit_l1 is required here (the segmented serving path always runs
    the fused selection; the non-fused fallback keeps the concat)."""
    assert emit_l1 > 0 and tile_g % emit_l1 == 0, (tile_g, emit_l1)
    Q, D = queries.shape
    # clamp BEFORE computing the pad: the strided member loads fix the
    # hardware query tile at 128 lanes, and padding Q to a multiple of an
    # unclamped caller default (512) would quadruple the gmax output
    tile_q = min(tile_q, 128)
    # same scoped-VMEM budget/grant policy as the single-buffer
    # fused_plain_gmax — the two are interchangeable storage layouts, and
    # an oversized block plan should fail with the same actionable error,
    # not a raw Mosaic scoped-vmem stack OOM
    need = 2 * (tile_g * GROUP * D * 2 + tile_q * D * 2
                + tile_g * tile_q * 4) + tile_g * GROUP * tile_q * 4
    need += tile_g * tile_q * 4 + 2 * tile_q * (tile_g // emit_l1) * 4
    vmem_arg = _gmax_vmem(need)
    q_pad = (-Q) % tile_q
    if q_pad:
        queries = jnp.pad(queries, ((0, q_pad), (0, 0)))
    Qp = Q + q_pad
    w1 = tile_g // emit_l1
    seg_tiles = []
    for s_arr in segs:
        assert s_arr.shape[0] % (tile_g * GROUP) == 0, s_arr.shape
        seg_tiles.append(s_arr.shape[0] // (GROUP * tile_g))
    total_tiles = sum(seg_tiles)

    big_g = big_l1t = None
    tile_lo = 0
    for s_arr, nt in zip(segs, seg_tiles):
        kernel = _make_plain_gmax_l1_kernel(emit_l1, tile_g, tile_lo,
                                            nb_valid)
        in_specs = [
            pl.BlockSpec((tile_q, D), lambda qb, t: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_g * GROUP, D), lambda qb, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [queries, s_arr]
        aliases = {}
        if big_g is not None:
            in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                         pl.BlockSpec(memory_space=pl.ANY)]
            operands += [big_g, big_l1t]
            aliases = {2: 0, 3: 1}
            base_kernel = kernel

            def kernel(q_ref, c_ref, _g_in, _l1_in, g_ref, l1_ref,
                       s_scratch, g_scr, base=base_kernel):
                # the aliased inputs arrive as refs; the kernel never
                # reads them — blocks it writes overwrite in place and
                # blocks outside this segment's window are never touched
                base(q_ref, c_ref, g_ref, l1_ref, s_scratch, g_scr)
        lo = tile_lo  # bind per-iteration for the index_map closures
        big_g, big_l1t = pl.pallas_call(
            kernel,
            grid=(Qp // tile_q, nt),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((tile_q, tile_g), lambda qb, t, lo=lo: (qb, t + lo),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w1, tile_q), lambda qb, t, lo=lo: (t + lo, qb),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Qp, total_tiles * tile_g), jnp.float32),
                jax.ShapeDtypeStruct((total_tiles * w1, Qp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_g * GROUP, tile_q), jnp.float32),
                pltpu.VMEM((tile_g, tile_q), jnp.float32),
            ],
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                # wide tiles (tile_g >= 512) need the same per-kernel
                # scoped-VMEM grant as the single-buffer kernel: the
                # segmented variant's scratch scales with tile_g too
                # (measured: tile_g=1024 at 8.8M/6-seg needs 29.5 MiB vs
                # the 16 MiB default). None = compiler default.
                vmem_limit_bytes=vmem_arg,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Qp * nt * tile_g * GROUP * D,
                bytes_accessed=Qp * D * 2 + nt * tile_g * GROUP * D * 2
                + Qp * nt * tile_g * 4,
                transcendentals=0,
            ),
            interpret=_interpret_mode(),
        )(*operands)
        tile_lo += nt
    l1 = jnp.swapaxes(big_l1t, 0, 1)
    return (big_g[:Q], l1[:Q]) if q_pad else (big_g, l1)


def _auto_qb(Q: int, N: int, D: int, k: int) -> int:
    """Rescore query-chunk size: as large as HBM headroom allows.

    The phase-C transient per query is the gathered [k*8, D] bf16 block
    rows plus the [k*8] fp32 score/id rows (~12.4 MB at k=1000, D=768),
    and XLA may hold a second copy of the rows for the dot operand layout
    — budget 2x. Chunking exists only to bound that transient next to the
    resident corpus; every extra chunk costs a serialized gather + sort,
    so pick the FEWEST chunks that fit a conservative budget: 10 GiB
    minus the corpus and group-max residents (v5e has 16 GiB; leave
    headroom for accumulators and XLA workspace).
    """
    per_q = 2 * k * GROUP * (2 * D + 12)
    resident = N * D * 2 + Q * (N // GROUP) * 4
    budget = 10 * 2**30 - resident
    # floor of 16 queries/chunk (~200 MB transient at k=1000, D=768): when
    # the corpus leaves less headroom than that, smaller chunks only add
    # serialized sort/gather overhead without making the program fit
    qb = max(min(Q, 16), min(Q, budget // max(per_q, 1)))
    n_chunks = -(-Q // qb)
    return -(-Q // n_chunks)  # equalize chunk sizes


@functools.partial(jax.jit, static_argnames=(
    "n_docs", "k", "tile_g", "tile_q", "qb", "rescore", "kt"))
def _block_topk_core(
    queries: jnp.ndarray, cb: jnp.ndarray, tail_rows: jnp.ndarray,
    n_docs: int, k: int, tile_g: int, tile_q: int, qb: int,
    rescore: str = "xla", plain: Optional[jnp.ndarray] = None,
    kt: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score-free block path over a prepared BlockCorpus (see
    pallas_block_topk for the algorithm)."""
    Q, D = queries.shape
    N = n_docs
    NB = N // GROUP
    tail = N - NB * GROUP
    if qb <= 0:
        qb = _auto_qb(Q, N, D, k)
    # don't pad small query batches up to a 512-row kernel tile (the
    # query-split serving shape runs Q=128 per chip)
    tile_q = min(tile_q, max(128, -(-Q // 128) * 128))

    gmax = fused_block_gmax(queries, cb, tile_g, tile_q)  # [Q, NBp]
    if cb.shape[0] != NB:
        col = jax.lax.broadcasted_iota(jnp.int32, gmax.shape, 1)
        gmax = jnp.where(col < NB, gmax, jnp.finfo(jnp.float32).min)

    bid = _select_groups(gmax, k)  # [Q, k] block ids, auto-planned pyramid

    if tail:
        tail_scores = jnp.dot(queries, tail_rows.T,
                              preferred_element_type=jnp.float32)  # [Q, tail]
        tail_ids = NB * GROUP + jnp.arange(tail, dtype=jnp.int32)

    if rescore == "dma":
        # in-kernel async-copy gather from the plain doc-major corpus:
        # all kt block DMAs of a grid step in flight at once (XLA's row
        # gather runs ~137 GB/s on random 12 KB rows); doc-major
        # [Q, k_pad*8] output with pad columns -inf-masked, no query
        # chunking needed (scratch is per-step)
        if plain is None:
            raise ValueError("rescore='dma' needs the plain doc-major "
                             "corpus (prepare with with_plain=True)")
        cand, bid_pad = pallas_gather_rescore(queries, plain, bid, kt=kt)
        k_pad = bid_pad.shape[1]
        ids = (bid_pad[:, :, None] * GROUP
               + jnp.arange(GROUP, dtype=jnp.int32)).reshape(Q, k_pad * GROUP)
        if tail:
            cand = jnp.concatenate([cand, tail_scores], axis=1)
            ids = jnp.concatenate(
                [ids, jnp.broadcast_to(tail_ids, (Q, tail))], axis=1)
        s, pos = jax.lax.top_k(cand, k)
        return s, jnp.take_along_axis(ids, pos, axis=1)

    q_pad = (-Q) % qb
    bid_c = jnp.pad(bid, ((0, q_pad), (0, 0))).reshape(-1, qb, k)
    quer_c = jnp.pad(queries, ((0, q_pad), (0, 0))).reshape(-1, qb, D)
    if tail:
        tail_c = jnp.pad(tail_scores, ((0, q_pad), (0, 0))).reshape(-1, qb, tail)

    m_offsets = jnp.arange(GROUP, dtype=jnp.int32)

    def rescore_chunk(args):
        if tail:
            bids, qs, ts = args
        else:
            bids, qs = args
        rows = jnp.take(cb, bids.reshape(-1), axis=0)  # [qb*k, 8*D] contiguous
        # layout-preserving views only ([qb*k, 8D] -> [qb, k*8, D]): a
        # [qb, k, 8, D] einsum operand cost a 9.5 ms transposed-layout
        # copy per chunk (profiled copy.92)
        sc = jnp.einsum(
            "qcd,qd->qc", rows.reshape(qb, k * GROUP, D), qs,
            preferred_element_type=jnp.float32)
        ids = (bids[:, :, None] * GROUP + m_offsets).reshape(qb, k * GROUP)
        if tail:
            sc = jnp.concatenate([sc, ts], axis=1)
            ids = jnp.concatenate(
                [ids, jnp.broadcast_to(tail_ids, (qb, tail))], axis=1)
        sb, pos = jax.lax.top_k(sc, k)
        return sb, jnp.take_along_axis(ids, pos, axis=1)

    chunks = (bid_c, quer_c, tail_c) if tail else (bid_c, quer_c)
    s_chunks, i_chunks = jax.lax.map(rescore_chunk, chunks)
    s = s_chunks.reshape(-1, k)[:Q]
    idx = i_chunks.reshape(-1, k)[:Q]
    return s, idx


_QT = 8  # queries per gather-rescore grid step (min tile-aligned rows)
# The gather-rescore block-id array rides scalar prefetch, i.e. the WHOLE
# [Q, k_pad] s32 array must fit SMEM (~1 MB total on v5e; Q=256, k=1000
# failed compile at exactly 1.00 MB). Budget half of it and chunk queries
# above that — measured safe at Q=128/k_pad=1024 (512 KB).
_SMEM_PREFETCH_BUDGET = 512 * 1024


def _gather_rescore_kernel(bids_ref, q_ref, p3_ref, out_ref, scratch, sems):
    """One grid step = 8 queries x kt selected 8-doc blocks each.

    bids: [Q, k_pad] int32 in SMEM (scalar-prefetched block ids);
    q: [8, D] VMEM (8 = the smallest tile-aligned row block; per-query
    rows are STATIC slices); p3: the plain corpus VIEWED as [N/8, 8, D],
    left in ANY (HBM) — block b's docs are the [8, D] slice p3[b], a
    whole (8,128)-tile-aligned unit, fetched with explicit async copies,
    all 8*kt in flight at once (multiple DMA queues drain them
    concurrently, where XLA's row gather ran at ~137 GB/s);
    scratch: [8*kt*8, D] VMEM — query qq's slot jj lands at rows
    (qq*kt + jj)*8, statically aligned; out: [8, kt*8] f32 DOC-major, one
    [1, D] x [kt*8, D]^T dot per query, rows concatenated for a single
    full-block store."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    kt = scratch.shape[0] // (GROUP * _QT)
    # one DMA semaphore per query row, shared by its kt equal-sized
    # copies (a per-copy semaphore array overflows the 2 KB sflag space)
    copies = []
    for qq in range(_QT):
        for jj in range(kt):
            row = bids_ref[i * _QT + qq, j * kt + jj]
            copies.append(pltpu.make_async_copy(
                p3_ref.at[row],
                scratch.at[pl.ds((qq * kt + jj) * GROUP, GROUP), :],
                sems.at[qq],
            ))
            copies[-1].start()
    for c in copies:
        c.wait()
    rows = [
        jax.lax.dot_general(
            q_ref[qq:qq + 1, :],
            scratch[qq * kt * GROUP:(qq + 1) * kt * GROUP, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, kt*8]
        for qq in range(_QT)
    ]
    out_ref[:] = jnp.concatenate(rows, axis=0)


def _make_gather_rescore_seg_kernel(cuts):
    """_gather_rescore_kernel variant over a SEGMENTED corpus: the plain
    doc-major array is held as ``len(cuts)`` separate HBM buffers (the
    12.65 GiB single buffer at 8.8M docs can fail to allocate when the
    tunnel's free HBM is fragmented, while same-total smaller buffers
    fit), and each block DMA is routed to its segment by a balanced
    BINARY TREE of scalar @pl.when guards on the prefetched block id.
    ``cuts``: static (lo, hi) global padded-block ranges per segment.

    Routing cost sits on the scalar core's critical path (no copy can
    start before its guard resolves, and the drain-mode dots wait on all
    copies) — but compare COUNT is not what costs: the r3 measurements
    below show the balanced tree (ceil(log2 S) compares per copy) lands
    at the same ~1.2 ms/extra-segment as the r2 linear scan (~2S
    compares per copy). What dominates is per-copy BRANCH DISPATCH on
    the scalar core (~0.5 us per data-dependent @pl.when resolution),
    which both forms pay once per emitted copy. The tree is kept for
    its shape (no leaf range test: the cuts partition [0, NBp)
    exhaustively — pad bids are block 0 → segment 0 — preserving the
    exactly-one-start-per-slot invariant), not for a measured win.

    Wait descriptors are issued unconditionally against segment 0 (a
    Mosaic DMA wait is a semaphore countdown of the descriptor's byte
    size, not an object handle — the pipelined kernel relies on the same
    property), so exactly one start and one wait run per slot.

    Routing cost, measured at 8 segs / 2.21M / Q=128 (rescseg phase;
    unsegmented floor 4.4 ms): unrolled tree 12.9 ms; a ``lax.fori_loop``
    form of the copy loop (code S leaves per query row, constant in kt —
    the i-cache hypothesis) measured 20.3 ms — per-iteration scalar loop
    overhead (~0.45 us/copy) exceeds any instruction-fetch win, so the
    UNROLLED tree stays the default and the ~0.5 us/copy branch cost is
    the price of fragmentation-tolerant storage (the bench ladder prefers
    the fewest segments that allocate for exactly this reason).
    OPENMATCH_SEG_LOOP=1 selects the loop form. Like
    OPENMATCH_SEG_CONCAT, the flag is read at TRACE time and is not
    part of the jit cache key — set it at process start only (flipping
    it mid-process silently reuses the previously traced form for
    already-seen shapes); '' and '0' both mean the unrolled default."""
    S = len(cuts)
    unroll = os.environ.get("OPENMATCH_SEG_LOOP", "0") in ("", "0")

    def kernel(bids_ref, q_ref, *rest):
        p3_refs, (out_ref, scratch, sems) = rest[:S], rest[S:]
        i = pl.program_id(0)
        j = pl.program_id(1)
        kt = scratch.shape[0] // (GROUP * _QT)

        def route(row, dst, qq, lo_s, hi_s):
            # dispatch row to its segment among cuts[lo_s:hi_s]
            if hi_s - lo_s == 1:
                pltpu.make_async_copy(
                    p3_refs[lo_s].at[row - cuts[lo_s][0]], dst,
                    sems.at[qq]).start()
                return
            mid = (lo_s + hi_s) // 2

            @pl.when(row < cuts[mid][0])
            def _left():
                route(row, dst, qq, lo_s, mid)

            @pl.when(row >= cuts[mid][0])
            def _right():
                route(row, dst, qq, mid, hi_s)

        if unroll:
            for qq in range(_QT):
                for jj in range(kt):
                    row = bids_ref[i * _QT + qq, j * kt + jj]
                    dst = scratch.at[pl.ds((qq * kt + jj) * GROUP, GROUP), :]
                    route(row, dst, qq, 0, S)
        else:
            for qq in range(_QT):
                def start_body(jj, carry, qq=qq):
                    row = bids_ref[i * _QT + qq, j * kt + jj]
                    dst = scratch.at[pl.ds((qq * kt + jj) * GROUP, GROUP), :]
                    route(row, dst, qq, 0, S)
                    return carry

                jax.lax.fori_loop(0, kt, start_body, 0)
        for qq in range(_QT):
            for jj in range(kt):
                pltpu.make_async_copy(
                    p3_refs[0].at[0],
                    scratch.at[pl.ds((qq * kt + jj) * GROUP, GROUP), :],
                    sems.at[qq],
                ).wait()
        rows = [
            jax.lax.dot_general(
                q_ref[qq:qq + 1, :],
                scratch[qq * kt * GROUP:(qq + 1) * kt * GROUP, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, kt*8]
            for qq in range(_QT)
        ]
        out_ref[:] = jnp.concatenate(rows, axis=0)

    return kernel


def _gather_rescore_kernel_pipelined(bids_ref, q_ref, p3_ref, out_ref,
                                     scratch, sems):
    """Software-pipelined variant of _gather_rescore_kernel: scratch is
    double-buffered ([2, QT*kt*8, D]) and the NEXT grid step's block
    copies are issued before this step's dots, so DMA latency overlaps
    the MXU work instead of serializing ahead of it (roadmap lever #3 /
    VERDICT r2 next #4).

    Scratch persists across grid steps on TPU (the grid is a sequential
    loop), which is what makes the handoff legal: step s's copies are
    started by step s-1 (step 0 starts its own in a prologue), waited at
    step s, into slot s % 2. Wait descriptors are reconstructed from the
    same (src, dst, sem) triple — a Mosaic wait is a semaphore countdown,
    not an object handle."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    n_steps = pl.num_programs(0) * nj
    kt = scratch.shape[1] // (GROUP * _QT)
    step = i * nj + j

    def issue(ii, jj, slot, do):
        for qq in range(_QT):
            for t in range(kt):
                row = bids_ref[ii * _QT + qq, jj * kt + t]
                c = pltpu.make_async_copy(
                    p3_ref.at[row],
                    scratch.at[slot, pl.ds((qq * kt + t) * GROUP, GROUP), :],
                    sems.at[slot, qq],
                )
                c.start() if do == "start" else c.wait()

    @pl.when(step == 0)
    def _prologue():
        issue(i, j, 0, "start")

    @pl.when(step + 1 < n_steps)
    def _prefetch_next():
        nxt = step + 1
        issue(nxt // nj, jax.lax.rem(nxt, nj), jax.lax.rem(nxt, 2), "start")

    slot = jax.lax.rem(step, 2)
    issue(i, j, slot, "wait")
    rows = [
        jax.lax.dot_general(
            q_ref[qq:qq + 1, :],
            scratch[slot, qq * kt * GROUP:(qq + 1) * kt * GROUP, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for qq in range(_QT)
    ]
    out_ref[:] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("kt", "pipeline"))
def pallas_gather_rescore(
    queries: jnp.ndarray, plain: jnp.ndarray, bids: jnp.ndarray, kt: int = 64,
    pipeline: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact candidate scores for selected blocks via an in-kernel DMA
    gather from the PLAIN doc-major corpus:
    out[q, j*8 + m] = <queries[q], doc bids_pad[q, j] * 8 + m>.

    k is padded up to a kt multiple (kt*8 must be a multiple of 128 for
    tile-aligned output blocks) and Q to a multiple of 8; returns
    (scores [Q, k_pad*8] f32 with pad columns set to -inf,
    bids_pad [Q_pad, k_pad]). Global doc ids in the matching doc-major
    layout are bids_pad[q, j] * 8 + m.

    ``pipeline=True`` double-buffers the scratch and overlaps the next
    grid step's copies with this step's dots. MEASURED A WASH on v5e
    (2.21M docs, Q=128, k=1000: 19.8 ms drain vs 19.9 ms pipelined
    end-to-end, rescore_compare.py) — the per-step copies already drain
    through multiple DMA queues concurrently with the MXU work of other
    queries, so prefetching a step ahead adds no bandwidth. Default
    False: same speed, half the VMEM scratch (headroom for the fused
    selection work).

    ``plain`` may be a TUPLE of doc-major segment arrays (see
    _make_gather_rescore_seg_kernel: fragmentation-tolerant corpus
    storage); bids stay global padded-block ids and each DMA is routed
    to its segment in-kernel. Drain mode only."""
    Q, D = queries.shape
    segs = plain if isinstance(plain, tuple) else (plain,)
    N = sum(s.shape[0] for s in segs)
    k = bids.shape[1]
    assert bids.shape[0] == Q and (kt * GROUP) % 128 == 0, (bids.shape, Q, kt)
    # SMEM guard: chunk queries so one kernel's prefetched id array stays
    # within _SMEM_PREFETCH_BUDGET (the array is [Q, k_pad] s32 and lives
    # whole in SMEM); chunks concat back losslessly — each row's scores
    # depend only on that row's queries/bids
    _k_pad = -(-k // kt) * kt
    max_q = max(_QT, (_SMEM_PREFETCH_BUDGET // (_k_pad * 4)) // _QT * _QT)
    if Q > max_q:
        outs, bps = [], []
        for lo in range(0, Q, max_q):
            o, bp = pallas_gather_rescore(
                queries[lo:lo + max_q], plain, bids[lo:lo + max_q],
                kt=kt, pipeline=pipeline)
            outs.append(o)
            bps.append(bp)
        return jnp.concatenate(outs, axis=0), jnp.concatenate(bps, axis=0)
    assert all(s.shape[0] % GROUP == 0 for s in segs), [s.shape for s in segs]
    k_pad = -(-k // kt) * kt
    q_pad = (-Q) % _QT
    bids_pad = jnp.pad(bids, ((0, q_pad), (0, k_pad - k)))  # blk 0; masked below
    if q_pad:
        queries = jnp.pad(queries, ((0, q_pad), (0, 0)))
    Qp = Q + q_pad
    p3 = tuple(s.reshape(s.shape[0] // GROUP, GROUP, D) for s in segs)
    grid = (Qp // _QT, k_pad // kt)
    if len(segs) > 1:
        assert not pipeline, "segmented corpus supports the drain kernel only"
        cuts, lo = [], 0
        for s in segs:
            cuts.append((lo, lo + s.shape[0] // GROUP))
            lo = cuts[-1][1]
        out = pl.pallas_call(
            _make_gather_rescore_seg_kernel(tuple(cuts)),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((_QT, D), lambda i, j, bids: (i, 0),
                                 memory_space=pltpu.VMEM),
                ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(segs),
                out_specs=pl.BlockSpec((_QT, kt * GROUP),
                                       lambda i, j, bids: (i, j),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((_QT * kt * GROUP, D), segs[0].dtype),
                    pltpu.SemaphoreType.DMA((_QT,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((Qp, k_pad * GROUP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=_interpret_mode(),
        )(bids_pad, queries, *p3)
        out = out[:Q]
        if k_pad != k:
            col = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
            out = jnp.where(col < k * GROUP, out, jnp.finfo(jnp.float32).min)
        return out, bids_pad[:Q]
    p3 = p3[0]
    if pipeline:
        kernel = _gather_rescore_kernel_pipelined
        scratch_shapes = [
            pltpu.VMEM((2, _QT * kt * GROUP, D), segs[0].dtype),
            pltpu.SemaphoreType.DMA((2, _QT)),
        ]
    else:
        kernel = _gather_rescore_kernel
        scratch_shapes = [
            pltpu.VMEM((_QT * kt * GROUP, D), segs[0].dtype),
            pltpu.SemaphoreType.DMA((_QT,)),
        ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_QT, D), lambda i, j, bids: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((_QT, kt * GROUP), lambda i, j, bids: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch_shapes,
        ),
        out_shape=jax.ShapeDtypeStruct((Qp, k_pad * GROUP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_interpret_mode(),
    )(bids_pad, queries, p3)
    out = out[:Q]
    if k_pad != k:
        col = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        out = jnp.where(col < k * GROUP, out, jnp.finfo(jnp.float32).min)
    return out, bids_pad[:Q]


def pallas_block_topk_prepared(
    queries: jnp.ndarray, prep: BlockCorpus, k: int = 1000,
    tile_g: int = 256, tile_q: int = 512, qb: int = 0,
    rescore: str = "xla", kt: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pallas_block_topk over a prepared BlockCorpus (serving path: the
    block layout is built once, not per query batch). ``rescore="dma"``
    uses the in-kernel async-copy candidate gather
    (pallas_gather_rescore); it needs prep.plain (with_plain=True)."""
    k = min(k, prep.n_docs)
    if (prep.n_docs // GROUP) // 2 <= k:
        from .mips import exact_search

        corpus = jnp.concatenate(
            [prep.cb[: prep.n_docs // GROUP].reshape(-1, queries.shape[1]),
             prep.tail]) if prep.tail.shape[0] else \
            prep.cb[: prep.n_docs // GROUP].reshape(-1, queries.shape[1])
        return exact_search(queries, corpus[: prep.n_docs], k=k)
    return _block_topk_core(queries, prep.cb, prep.tail, prep.n_docs, k,
                            tile_g, tile_q, qb, rescore, plain=prep.plain,
                            kt=kt)


@functools.partial(jax.jit, static_argnames=(
    "n_docs", "k", "tile_g", "tile_q", "pipeline", "c_split", "kt"))
def _plain_topk_core(
    queries: jnp.ndarray, plain: jnp.ndarray, tail_rows: jnp.ndarray,
    n_docs: int, k: int, tile_g: int, tile_q: int, pipeline: bool = False,
    c_split: int = 1, kt: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-layout exact top-k: plain-corpus gmax kernel + planned
    max-pyramid selection + DMA gather-rescore. The fastest measured path
    and the lowest-HBM one (one corpus copy).

    ``c_split`` > 1 processes the corpus in that many tile segments
    SEQUENTIALLY (gmax -> select -> rescore per segment, candidates
    merged at the end): the [Q, NB] f32 gmax resident shrinks to
    [Q, NB/c_split], which is what lets the 8.8M-doc corpus (12.65 GiB)
    plus its selection state fit a 16 GiB chip (roadmap lever #2 —
    note the original Q-split idea cannot work: the strided member loads
    pin the query tile at 128 lanes, so a 64-query pass still allocates
    128 gmax rows). Exact: any global top-k doc is top-k within its own
    segment, so the per-segment selections cover the global top-k.
    An optimization_barrier chains segment s+1's queries on segment s's
    candidates so XLA's buffer liveness lets the big gmax buffer be
    reused rather than held live for both segments.

    ``plain`` may instead be a TUPLE of doc-major segment arrays (each a
    tile_g*GROUP-row multiple): fragmentation-tolerant STORAGE — the
    segments feed ONE global selection (per-segment gmax concatenated,
    zero extra selection/rescore work vs a single buffer) and the
    rescore kernel routes each candidate DMA to its segment. Unlike
    ``c_split`` this does NOT shrink the [Q, NBp] gmax resident; it
    exists because a single 12.65 GiB buffer can fail to allocate on a
    fragmented chip while same-total smaller buffers fit."""
    Q, D = queries.shape
    NB = n_docs // GROUP
    storage_segs = plain if isinstance(plain, tuple) else None
    NBp = (sum(s.shape[0] for s in storage_segs) if storage_segs
           else plain.shape[0]) // GROUP
    tail = n_docs - NB * GROUP
    total_tiles = NBp // tile_g
    neg_inf = jnp.finfo(jnp.float32).min

    if storage_segs is not None:
        assert c_split == 1, \
            "segmented storage does global selection; c_split needs a " \
            "single-buffer corpus"
        fanouts = _plan_pyramid(NBp, k, Q)
        fused = bool(fanouts) and tile_g % fanouts[0] == 0
        if fused and not os.environ.get("OPENMATCH_SEG_CONCAT"):
            # per-segment kernels write ONE shared [Q, NBp] gmax (and l1)
            # via windowed out-spec index maps + input_output_aliases —
            # no concat copy, no doubled gmax transient
            gmax, l1 = fused_plain_gmax_segs(
                queries, storage_segs, tile_g, tile_q,
                emit_l1=fanouts[0], nb_valid=NB if NBp > NB else None)
        else:
            # OPENMATCH_SEG_CONCAT=1 escape hatch / non-fused fallback:
            # per-segment outputs concatenated in XLA
            g_parts, l1_parts = [], []
            blk_lo = 0
            for s_arr in storage_segs:
                assert s_arr.shape[0] % (tile_g * GROUP) == 0, s_arr.shape
                nb_here = s_arr.shape[0] // GROUP
                valid_here = min(max(NB - blk_lo, 0), nb_here)
                if fused:
                    g, l1p = fused_plain_gmax(
                        queries, s_arr, tile_g, tile_q, emit_l1=fanouts[0],
                        nb_valid=valid_here if valid_here < nb_here else None)
                    l1_parts.append(l1p)
                else:
                    g = fused_plain_gmax(queries, s_arr, tile_g, tile_q)
                    if valid_here < nb_here:
                        col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
                        g = jnp.where(col < valid_here, g, neg_inf)
                g_parts.append(g)
                blk_lo += nb_here
            gmax = jnp.concatenate(g_parts, axis=1) if len(g_parts) > 1 \
                else g_parts[0]
            l1 = None
            if fused:
                l1 = jnp.concatenate(l1_parts, axis=1) if len(l1_parts) > 1 \
                    else l1_parts[0]
        bid = _select_groups(gmax, k, fanout=fanouts, l1=l1)
        cand, bid_pad = pallas_gather_rescore(queries, storage_segs, bid,
                                              kt=kt)
        k_pad = bid_pad.shape[1]
        ids = (bid_pad[:, :, None] * GROUP
               + jnp.arange(GROUP, dtype=jnp.int32)).reshape(Q, k_pad * GROUP)
        if NBp > NB:
            cand = jnp.where(ids < NB * GROUP, cand, neg_inf)
        if tail:
            tail_scores = jnp.dot(queries, tail_rows.T,
                                  preferred_element_type=jnp.float32)
            tail_ids = NB * GROUP + jnp.arange(tail, dtype=jnp.int32)
            cand = jnp.concatenate([cand, tail_scores], axis=1)
            ids = jnp.concatenate(
                [ids, jnp.broadcast_to(tail_ids, (Q, tail))], axis=1)
        s, pos = jax.lax.top_k(cand, k)
        return s, jnp.take_along_axis(ids, pos, axis=1)

    if c_split > 1 and (total_tiles < c_split
                        or (NBp // c_split) // 2 <= k):
        c_split = 1  # segments too small to select k blocks from

    seg_tiles = split_tiles(total_tiles, c_split)

    cands, ids_list = [], []
    tile_lo = 0
    q_seg = queries
    for s in range(c_split):
        nt = seg_tiles[s]
        blk_lo = tile_lo * tile_g
        has_pad = blk_lo + nt * tile_g > NB  # segment contains pad blocks
        k_seg = min(k, nt * tile_g)
        fanouts = _plan_pyramid(nt * tile_g, k_seg, Q)
        if fanouts and tile_g % fanouts[0] == 0:
            # pyramid selection ahead: the gmax kernel emits level 1 for
            # free (and masks pad blocks in-kernel), skipping the widest
            # XLA reshape-max + masking passes over [Q, NB]
            gmax, l1 = fused_plain_gmax(
                q_seg, plain, tile_g, tile_q, tile_lo=tile_lo, n_tiles=nt,
                emit_l1=fanouts[0], nb_valid=NB if has_pad else None)
            bid = _select_groups(gmax, k_seg, fanout=fanouts, l1=l1) + blk_lo
        else:
            gmax = fused_plain_gmax(q_seg, plain, tile_g, tile_q,
                                    tile_lo=tile_lo, n_tiles=nt)
            if has_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, gmax.shape, 1)
                gmax = jnp.where(blk_lo + col < NB, gmax, neg_inf)
            bid = _select_groups(gmax, k_seg, fanout=fanouts) + blk_lo
        cand, bid_pad = pallas_gather_rescore(q_seg, plain, bid,
                                              pipeline=pipeline, kt=kt)
        k_pad = bid_pad.shape[1]
        ids = (bid_pad[:, :, None] * GROUP
               + jnp.arange(GROUP, dtype=jnp.int32)).reshape(Q, k_pad * GROUP)
        if blk_lo + nt * tile_g > NB:
            # pad-block candidates gathered zero rows; mask by id
            cand = jnp.where(ids < NB * GROUP, cand, neg_inf)
        cands.append(cand)
        ids_list.append(ids)
        tile_lo += nt
        if s + 1 < c_split:
            # serialize segments so the gmax buffer's live ranges don't
            # overlap (numerically a no-op: returns q_seg unchanged)
            q_seg, _ = jax.lax.optimization_barrier((queries, cand))

    cand = jnp.concatenate(cands, axis=1) if c_split > 1 else cands[0]
    ids = jnp.concatenate(ids_list, axis=1) if c_split > 1 else ids_list[0]
    if tail:
        tail_scores = jnp.dot(queries, tail_rows.T,
                              preferred_element_type=jnp.float32)
        tail_ids = NB * GROUP + jnp.arange(tail, dtype=jnp.int32)
        cand = jnp.concatenate([cand, tail_scores], axis=1)
        ids = jnp.concatenate(
            [ids, jnp.broadcast_to(tail_ids, (Q, tail))], axis=1)
    s, pos = jax.lax.top_k(cand, k)
    return s, jnp.take_along_axis(ids, pos, axis=1)


def pallas_plain_topk_prepared(
    queries: jnp.ndarray, prep: BlockCorpus, k: int = 1000,
    tile_g: int = 256, tile_q: int = 512, pipeline: bool = False,
    c_split: int = 1, kt: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a prepare_plain_corpus layout (plain-only: gmax
    kernel reads the doc-major corpus via strided member loads, rescore
    gathers whole blocks with in-kernel DMAs; ``pipeline`` selects the
    software-pipelined rescore kernel, ``c_split`` the sequential
    corpus-segment mode that shrinks the gmax HBM resident)."""
    if prep.plain is None:
        raise ValueError("prepare with prepare_plain_corpus "
                         "(prep.plain missing)")
    k = min(k, prep.n_docs)
    NB = prep.n_docs // GROUP
    if NB // 2 <= k:
        from .mips import exact_search

        body = jnp.concatenate(prep.plain) if isinstance(prep.plain, tuple) \
            else prep.plain
        corpus = jnp.concatenate([body[: NB * GROUP], prep.tail]) \
            if prep.tail.shape[0] else body[: NB * GROUP]
        return exact_search(queries, corpus, k=k)
    return _plain_topk_core(queries, prep.plain, prep.tail, prep.n_docs, k,
                            tile_g, tile_q, pipeline, c_split, kt=kt)


def pad_plain(corpus: jnp.ndarray, tile_g: int = 256) -> jnp.ndarray:
    """Zero-pad [N, D] rows up to a tile_g*GROUP multiple — the kernel
    operand layout for ``plain_topk_valid``. Unlike prepare_plain_corpus
    this keeps the ragged tail IN the array (the valid-count search core
    scores the partial block via a dynamic slice), so the result is a
    single array that shards/replicates cleanly over a mesh."""
    N = corpus.shape[0]
    pad = (-N) % (tile_g * GROUP)
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    return corpus


def plain_topk_valid(
    queries: jnp.ndarray, plain: jnp.ndarray, valid, k: int,
    tile_g: int = 256, tile_q: int = 128, kt: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a tile-aligned plain corpus whose count of valid
    leading rows is a TRACED scalar (rows >= valid are zero padding).

    The shard-local body of the mesh Searcher's kernel path (ops/mips.py
    Searcher, partitions "docs" and "queries"): the same fused pipeline as
    pallas_plain_topk_prepared — strided-member gmax kernel, planned
    max-pyramid selection, in-kernel DMA gather-rescore — but safe under
    ``shard_map`` where each device's valid-row count differs (the corpus
    row-shard boundary rarely lands on the true N). Replaces the silent
    method="pallas" -> "pyramid" downgrade (VERDICT r2 missing #1).

    Exactness with zero pad rows (which score 0 and could displace
    real negative-scoring docs — the classic pad bug, adversarially
    tested): full blocks (id < valid//8) keep honest maxima; the partial
    block and everything after are masked out of selection, candidate
    scores are re-masked by id, and the partial block's real docs are
    scored densely from an 8-row dynamic slice at the (aligned) block
    boundary and merged before the final top-k.

    queries [Q, D]; plain [Np, D] with Np % (tile_g*GROUP) == 0;
    valid: python int or traced int32 scalar <= Np. Returns
    (scores [Q, k] f32 desc-sorted with invalid slots at -inf,
    ids [Q, k] int32).
    """
    Q, D = queries.shape
    Np = plain.shape[0]
    NBp = Np // GROUP
    assert Np % (tile_g * GROUP) == 0, (Np, tile_g)
    k = min(k, Np)
    if NBp // 2 <= k:
        from .mips import exact_search

        return exact_search(queries, plain, k=k, valid_rows=valid)

    neg_inf = jnp.finfo(jnp.float32).min
    valid = jnp.asarray(valid, jnp.int32)
    nb_full = valid // GROUP  # fully-valid block count

    gmax = fused_plain_gmax(queries, plain, tile_g, tile_q)  # [Q, NBp]
    col = jax.lax.broadcasted_iota(jnp.int32, gmax.shape, 1)
    gmax = jnp.where(col < nb_full, gmax, neg_inf)

    bid = _select_groups(gmax, k)  # [Q, k]
    cand, bid_pad = pallas_gather_rescore(queries, plain, bid, kt=kt)
    k_pad = bid_pad.shape[1]
    ids = (bid_pad[:, :, None] * GROUP
           + jnp.arange(GROUP, dtype=jnp.int32)).reshape(Q, k_pad * GROUP)
    # selections can include -inf (pad) blocks when a shard has < k valid
    # blocks; their gathered zero-rows score 0, so mask by id
    cand = jnp.where(ids < nb_full * GROUP, cand, neg_inf)

    # partial tail block: the aligned 8-row slice at nb_full*8. When
    # valid == Np the start clamps to Np-8 and every tail id masks out.
    tail_rows = jax.lax.dynamic_slice(
        plain, (nb_full * GROUP, jnp.int32(0)), (GROUP, D))
    tail_scores = jnp.dot(queries, tail_rows.T,
                          preferred_element_type=jnp.float32)
    tail_ids = nb_full * GROUP + jnp.arange(GROUP, dtype=jnp.int32)
    tail_scores = jnp.where(tail_ids[None, :] < valid, tail_scores, neg_inf)
    cand = jnp.concatenate([cand, tail_scores], axis=1)
    ids = jnp.concatenate(
        [ids, jnp.broadcast_to(tail_ids[None, :], (Q, GROUP))], axis=1)
    s, pos = jax.lax.top_k(cand, k)
    return s, jnp.take_along_axis(ids, pos, axis=1)


def _score_only_kernel(q_ref, c_ref, s_ref):
    """q: [tq, D] bf16; c: [TILE, D] bf16; s: [tq, TILE] f32 doc-major."""
    s_ref[:] = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("tile", "tile_q"))
def fused_scores(
    queries: jnp.ndarray, corpus: jnp.ndarray, tile: int = 2048, tile_q: int = 256
) -> jnp.ndarray:
    """Doc-major scores [Q, N] f32 ([N, D] bf16 corpus, N % tile == 0).

    Doc-major matters: block b's 8 member scores land CONTIGUOUS, so the
    candidate fetch after block selection is a [Q, k] 32 B slice gather
    (~10 ms at Q=512/k=1000) instead of a 4M-scalar-descriptor gather
    (56 ms profiled for the member-major layout, + a 13 ms transpose)."""
    Q, D = queries.shape
    N = corpus.shape[0]
    assert N % tile == 0, (N, tile)
    per_step = 2 * (tile * D * 2 + tile_q * D * 2 + tile_q * tile * 4)
    if per_step > _SCOPED_VMEM:
        raise ValueError(f"tile={tile}, tile_q={tile_q} exceeds VMEM budget")
    q_pad = (-Q) % tile_q
    if q_pad:
        queries = jnp.pad(queries, ((0, q_pad), (0, 0)))
    Qp = Q + q_pad
    scores = pl.pallas_call(
        _score_only_kernel,
        grid=(N // tile, Qp // tile_q),
        in_specs=[
            pl.BlockSpec((tile_q, D), lambda n, qb: (qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda n, qb: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, tile), lambda n, qb: (qb, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qp, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * N * D,
            bytes_accessed=Qp * D * 2 + N * D * 2 + Qp * N * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
    )(queries, corpus)
    return scores[:Q] if q_pad else scores


@functools.partial(jax.jit, static_argnames=("n_docs", "k", "tile_g", "tile_q"))
def _block_score_topk_core(
    queries: jnp.ndarray, cb: jnp.ndarray, plain: jnp.ndarray,
    tail_rows: jnp.ndarray, n_docs: int, k: int, tile_g: int, tile_q: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score-materializing block path: the block kernel provides per-block
    maxima for selection while a score-only kernel stores every doc score
    DOC-MAJOR (f32 [Q, NBp*8]), so phase C is a [Q, k]-descriptor 32 B
    slice gather instead of the 12 KB/row block-row gather (~137 GB/s,
    46 ms per batch at 2.21M docs profiled). Only viable when Q*N*4 bytes
    plus a second corpus copy fit HBM — the Searcher picks this path for
    shard-sized corpora and the score-free core for bigger ones."""
    from .mips import gather_row_slices

    Q, D = queries.shape
    N = n_docs
    NB = N // GROUP
    NBp = cb.shape[0]
    tail = N - NB * GROUP
    tile_q = min(tile_q, max(128, -(-Q // 128) * 128))

    gmax = fused_block_gmax(queries, cb, tile_g, tile_q)  # [Q, NBp]
    if NBp != NB:
        col = jax.lax.broadcasted_iota(jnp.int32, gmax.shape, 1)
        gmax = jnp.where(col < NB, gmax, jnp.finfo(jnp.float32).min)
    # plain has NBp*8 rows = a multiple of tile_g*8, the score-tile width
    scores = fused_scores(queries, plain, tile=tile_g * GROUP,
                          tile_q=min(256, tile_q))  # [Q, NBp*8]

    bid = _select_groups(gmax, k)  # [Q, k]

    m_offsets = jnp.arange(GROUP, dtype=jnp.int32)
    cand = gather_row_slices(scores, bid * GROUP, GROUP).reshape(Q, k * GROUP)
    ids = (bid[:, :, None] * GROUP + m_offsets).reshape(Q, k * GROUP)
    if tail:
        tail_scores = jnp.dot(queries, tail_rows.T,
                              preferred_element_type=jnp.float32)
        cand = jnp.concatenate([cand, tail_scores], axis=1)
        tail_ids = NB * GROUP + jnp.arange(tail, dtype=jnp.int32)
        ids = jnp.concatenate([ids, jnp.broadcast_to(tail_ids, (Q, tail))], axis=1)
    s, pos = jax.lax.top_k(cand, k)
    return s, jnp.take_along_axis(ids, pos, axis=1)


def pallas_block_score_topk_prepared(
    queries: jnp.ndarray, prep: BlockCorpus, k: int = 1000,
    tile_g: int = 256, tile_q: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k via doc-major score materialization (fastest when the
    [Q, N] f32 score array and a second corpus copy fit HBM)."""
    k = min(k, prep.n_docs)
    if prep.plain is None:
        raise ValueError("BlockCorpus was prepared without the plain "
                         "doc-major copy (with_plain=False)")
    if (prep.n_docs // GROUP) // 2 <= k:
        return pallas_block_topk_prepared(queries, prep, k)
    if prep.cb.shape[0] % tile_g:
        raise ValueError(
            f"BlockCorpus padded to {prep.cb.shape[0]} blocks, not a "
            f"multiple of tile_g={tile_g}; prepare with a compatible tile_g")
    return _block_score_topk_core(queries, prep.cb, prep.plain, prep.tail,
                                  prep.n_docs, k, tile_g, tile_q)


def pallas_block_topk(
    queries: jnp.ndarray, corpus: jnp.ndarray, k: int = 1000,
    tile_g: int = 256, tile_q: int = 512, qb: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k, score-free, gather-light (the big-corpus path on TPU).

    Phase A: fused block-gmax kernel (corpus streamed once; only the
    [Q, N/8] maxima land in HBM). Phase B: planned max-pyramid selection
    (_select_groups) of the top-k blocks. Phase C: gather the k selected
    CONTIGUOUS 8-doc block rows per query, rescore in fp32, and rank with
    lax.top_k. The ragged tail (N % 8 docs) is scored densely in XLA and
    joined before the final ranking.

    Exact under bf16-input/fp32-accumulate scoring, like every other path
    (ties at the k-th score may resolve differently than faiss fp32).
    Builds the block layout per call — hold a prepared BlockCorpus and
    call pallas_block_topk_prepared when searching repeatedly.
    """
    N = corpus.shape[0]
    k = min(k, N)
    if (N // GROUP) // 2 <= k:
        from .mips import exact_search

        return exact_search(queries, corpus, k=k)
    prep = prepare_block_corpus(corpus, tile_g)
    return _block_topk_core(queries, prep.cb, prep.tail, N, k,
                            tile_g, tile_q, qb)
