"""Exact-MIPS engine vs numpy brute force, single-device and 8-way sharded."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmatch_tpu.ops.mips import Searcher, exact_search, sharded_search


def brute_topk(q, c, k):
    scores = q @ c.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    q = rng.randn(7, 16).astype(np.float32)
    c = rng.randn(1000, 16).astype(np.float32)
    return q, c


class TestExactSearch:
    def test_matches_numpy(self, data):
        q, c = data
        s, i = exact_search(jnp.array(q), jnp.array(c), k=10)
        es, ei = brute_topk(q, c, 10)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), ei)

    def test_chunked_matches(self, data):
        q, c = data
        s, i = exact_search(jnp.array(q), jnp.array(c), k=10, chunk_size=128)
        es, ei = brute_topk(q, c, 10)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), ei)

    def test_chunk_not_dividing_corpus(self, data):
        q, c = data
        # 1000 % 300 != 0 exercises the padding path
        s, i = exact_search(jnp.array(q), jnp.array(c), k=5, chunk_size=300)
        es, ei = brute_topk(q, c, 5)
        np.testing.assert_array_equal(np.asarray(i), ei)

    def test_k_larger_than_corpus(self):
        rng = np.random.RandomState(1)
        q = rng.randn(2, 8).astype(np.float32)
        c = rng.randn(5, 8).astype(np.float32)
        s, i = exact_search(jnp.array(q), jnp.array(c), k=50)
        assert s.shape == (2, 5)

    def test_sorted_descending(self, data):
        q, c = data
        s, _ = exact_search(jnp.array(q), jnp.array(c), k=20, chunk_size=256)
        s = np.asarray(s)
        assert (np.diff(s, axis=1) <= 1e-6).all()


class TestShardedSearch:
    def test_matches_numpy(self, data, mesh8):
        q, c = data
        # 1000 pads to 1000? 1000 % 8 = 0 -> fine
        s, i = sharded_search(jnp.array(q), jnp.array(c), k=10, mesh=mesh8)
        es, ei = brute_topk(q, c, 10)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), ei)

    def test_k_exceeds_shard_rows_returns_full_k(self, mesh8):
        """k larger than one shard's row count must still return min(k, N)
        results: per-shard depth is bounded by the shard but the merge
        keeps k of the gathered candidates (it used to truncate the whole
        result to shard_rows — [Q, 600] for k=1000 over 8x600 shards)."""
        rng = np.random.RandomState(5)
        q = rng.randn(3, 8).astype(np.float32)
        c = rng.randn(160, 8).astype(np.float32)  # 8 shards x 20 rows
        k = 50  # > shard_rows=20, < N=160
        # XLA scan path
        s, i = sharded_search(jnp.array(q), jnp.array(c), k=k, mesh=mesh8,
                              method="pyramid")
        es, ei = brute_topk(q, c, k)
        assert np.asarray(s).shape == (3, k)
        np.testing.assert_array_equal(np.asarray(i), ei)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5)
        # fused-kernel padded path (Searcher method="pallas" over the mesh)
        searcher = Searcher(c, k=k, mesh=mesh8, method="pallas")
        s2, i2 = searcher.search(q)
        assert np.asarray(s2).shape == (3, k)
        np.testing.assert_array_equal(np.asarray(i2), ei)

    def test_searcher_padded_corpus(self, mesh8):
        rng = np.random.RandomState(2)
        q = rng.randn(3, 8).astype(np.float32)
        c = rng.randn(1001, 8).astype(np.float32)  # pads to 1008
        searcher = Searcher(c, k=7, mesh=mesh8)
        s, i = searcher.search(q)
        es, ei = brute_topk(q, c, 7)
        np.testing.assert_array_equal(np.asarray(i), ei)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5)

    def test_searcher_single_device(self, data):
        q, c = data
        searcher = Searcher(c, k=10)
        s, i = searcher.search(q)
        es, ei = brute_topk(q, c, 10)
        np.testing.assert_array_equal(np.asarray(i), ei)

    def test_searcher_segmented_pallas_index(self):
        """n_segs holds the prepared pallas index as segment arrays; the
        search must be identical to the single-buffer index. Needs >= 2
        corpus tiles at the serving tile_g=256 (NB >= 257)."""
        rng = np.random.RandomState(4)
        q = rng.randn(7, 16).astype(np.float32)
        c = rng.randn(2061, 16).astype(np.float32)  # NB=257, tail of 5
        searcher = Searcher(c, k=10, method="pallas", n_segs=2)
        assert isinstance(searcher._prep.plain, tuple) \
            and len(searcher._prep.plain) == 2
        s, i = searcher.search(q)
        es, ei = brute_topk(q, c, 10)
        np.testing.assert_array_equal(np.asarray(i), ei)


class TestGatherRowSlices:
    def test_matches_numpy_slicing(self):
        from openmatch_tpu.ops.mips import gather_row_slices

        rng = np.random.RandomState(3)
        arr = rng.randn(5, 96).astype(np.float32)
        parents = rng.randint(0, 12, size=(5, 7))  # 96 / size(8) = 12
        out = gather_row_slices(jnp.array(arr), jnp.array(parents * 8), 8)
        assert out.shape == (5, 7, 8)
        for q in range(5):
            for j in range(7):
                s = parents[q, j] * 8
                np.testing.assert_array_equal(
                    np.asarray(out)[q, j], arr[q, s: s + 8])


class TestQueryShardedSearch:
    def test_matches_numpy(self, data, mesh8):
        from openmatch_tpu.ops.mips import query_sharded_search

        q, c = data
        q8 = np.concatenate([q, q[:1]])  # 8 rows, one per device
        s, i = query_sharded_search(jnp.array(q8), jnp.array(c), k=10,
                                    mesh=mesh8)
        es, ei = brute_topk(q8, c, 10)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), ei)

    def test_searcher_query_partition_pads_queries(self, data, mesh8):
        q, c = data  # 7 queries: pads to 8 internally, trimmed on return
        searcher = Searcher(c, k=10, mesh=mesh8, partition="queries")
        s, i = searcher.search(q)
        es, ei = brute_topk(q, c, 10)
        assert i.shape == (7, 10)
        np.testing.assert_array_equal(np.asarray(i), ei)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5)

    def test_matches_doc_partition(self, data, mesh8):
        q, c = data
        by_docs = Searcher(c, k=5, mesh=mesh8, partition="docs")
        by_queries = Searcher(c, k=5, mesh=mesh8, partition="queries")
        sd, idd = by_docs.search(q)
        sq, idq = by_queries.search(q)
        np.testing.assert_array_equal(np.asarray(idd), np.asarray(idq))
        np.testing.assert_allclose(np.asarray(sd), np.asarray(sq), rtol=1e-5)

    def test_searcher_accepts_host_bf16_numpy(self, mesh8):
        """serve.build_service hands the Searcher a HOST ml_dtypes
        bfloat16 numpy corpus (casting on-device first would stage the
        full index on one chip beside the mesh placement); every branch
        must accept it. Well-separated data so bf16 rounding cannot
        reorder the expected ids."""
        import ml_dtypes

        rng = np.random.RandomState(5)
        base = rng.randn(2048, 64).astype(np.float32)
        c = 0.01 * base
        c[100:103] += 8.0  # unambiguous winners for an all-positive query
        cb = c.astype(ml_dtypes.bfloat16)
        q = np.abs(rng.randn(8, 64)).astype(np.float32)
        want = {100, 101, 102}
        for s in (Searcher(cb, k=3, method="hier2"),
                  Searcher(cb, k=3, mesh=mesh8, partition="queries",
                           method="hier2"),
                  Searcher(cb, k=3, mesh=mesh8, partition="docs",
                           method="hier2")):
            _, ids = s.search(jnp.asarray(q))
            assert set(np.asarray(ids).ravel().tolist()) == want

    def test_searcher_query_partition_segmented_pallas(self, mesh8):
        """Replicated SEGMENTED corpus on the mesh (n_segs > 1 with
        partition="queries", method="pallas"): each chip holds the index
        as segment buffers and runs the full static-shape pipeline —
        per-segment gmax into one aliased buffer, segment-routed rescore
        — under shard_map. Exactness vs brute force incl. ragged tail."""
        rng = np.random.RandomState(21)
        N = 4100  # 2 segments x 1 tile of 256 blocks, ragged tail of 4
        c = rng.randn(N, 64).astype(np.float32)
        c[N - 2] += 9.0  # top doc in the ragged tail
        q = rng.randn(7, 64).astype(np.float32)
        searcher = Searcher(c, k=10, mesh=mesh8, partition="queries",
                            method="pallas", n_segs=2)
        assert isinstance(searcher._prep.plain, tuple)
        assert len(searcher._prep.plain) == 2
        s, i = searcher.search(q)
        assert searcher.last_dispatch == "pallas-mesh-queries-seg"
        es, ei = brute_topk(q, c, 10)
        np.testing.assert_array_equal(np.asarray(i), ei)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-4)


class TestHierMethod:
    def test_hier_matches_numpy_large(self):
        """hier path needs n_groups > k; use a corpus big enough to engage it."""
        rng = np.random.RandomState(3)
        q = rng.randn(4, 16).astype(np.float32)
        c = rng.randn(4096, 16).astype(np.float32)
        s, i = exact_search(jnp.array(q), jnp.array(c), k=16, method="hier")
        es, ei = brute_topk(q, c, 16)
        np.testing.assert_array_equal(np.asarray(i), ei)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5)

    def test_hier_adversarial_clustered(self):
        """all top-k packed into one group must still be found exactly."""
        q = np.ones((1, 4), dtype=np.float32)
        c = np.zeros((2048, 4), dtype=np.float32)
        c[100:108] = 5.0  # one full group of 8 holds the best docs
        c[500] = 4.0
        s, i = exact_search(jnp.array(q), jnp.array(c), k=9, method="hier")
        got = set(np.asarray(i)[0].tolist())
        assert got == set(range(100, 108)) | {500}

    def test_all_methods_agree_on_clear_winners(self):
        rng = np.random.RandomState(4)
        q = rng.randn(3, 8).astype(np.float32)
        c = rng.randn(8192, 8).astype(np.float32)
        ref_s, ref_i = brute_topk(q, c, 10)
        for method in ["topk", "hier"]:
            s, i = exact_search(jnp.array(q), jnp.array(c), k=10, method=method)
            np.testing.assert_array_equal(np.asarray(i), ref_i, err_msg=method)


class TestBf16Path:
    def test_bf16_corpus_high_recall(self, data):
        """bf16 scores reorder near-ties; require recall@10 vs fp32 ≥ 0.9."""
        q, c = data
        s, i = exact_search(
            jnp.array(q, jnp.bfloat16), jnp.array(c, jnp.bfloat16), k=10
        )
        _, ei = brute_topk(q, c, 10)
        got = np.asarray(i)
        recall = np.mean([
            len(set(got[r]) & set(ei[r])) / 10 for r in range(len(q))
        ])
        assert recall >= 0.9


class TestShardedPaddingExactness:
    def test_pad_rows_cannot_evict_negative_scores(self, mesh8):
        """All true scores negative + zero-padded shard rows scoring 0:
        padding must not steal top-k slots (code-review finding)."""
        rng = np.random.RandomState(7)
        q = -np.abs(rng.randn(3, 8)).astype(np.float32)
        c = np.abs(rng.randn(1001, 8)).astype(np.float32)  # pads to 1008
        # all inner products negative, pad rows would score 0.0 > all
        searcher = Searcher(c, k=7, mesh=mesh8)
        s, i = searcher.search(q)
        es, ei = brute_topk(q, c, 7)
        np.testing.assert_array_equal(np.asarray(i), ei)
        assert np.isfinite(np.asarray(s)).all()
