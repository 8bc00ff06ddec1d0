"""Exact k-smallest selection: tournament vs sort oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowing_tpu.ops.topk import (
    merge_min,
    topk_min,
    topk_min_checked,
    topk_min_sort,
)


def _oracle(x, k):
    idx = np.argsort(x, kind="stable")[:k]
    return x[idx], idx


@pytest.mark.parametrize("n,k", [(1000, 10), (100_000, 512), (262_144, 1024)])
def test_tournament_matches_sort(rng, n, k):
    x = rng.normal(size=n).astype(np.float32)
    v, i, ok = topk_min(jnp.asarray(x), k)
    assert bool(ok)
    ev, ei = _oracle(x, k)
    np.testing.assert_array_equal(np.asarray(v), ev)
    np.testing.assert_array_equal(np.sort(np.asarray(i)), np.sort(ei))
    # values at returned indices are the returned values
    np.testing.assert_array_equal(x[np.asarray(i)], np.asarray(v))


def test_clustered_winners(rng):
    """All winners in one block — the tournament must still certify."""
    x = rng.uniform(1.0, 2.0, size=65536).astype(np.float32)
    x[1000:1128] = rng.uniform(0.0, 0.1, size=128)
    v, i, ok = topk_min(jnp.asarray(x), 128)
    assert bool(ok)
    ev, _ = _oracle(x, 128)
    np.testing.assert_array_equal(np.asarray(v), ev)


def test_adversarial_spread_falls_back_correctly(rng):
    """Winners spread so that > cap blocks hold small values: the checked
    variant must still be exact (via the cond fallback)."""
    n, k = 1 << 16, 64
    x = rng.uniform(1.0, 2.0, size=n).astype(np.float32)
    # every block gets one tiny value -> far more candidate blocks than cap
    block = 128
    tiny_pos = np.arange(0, n, block)
    x[tiny_pos] = rng.uniform(0.0, 0.01, size=len(tiny_pos)).astype(np.float32)
    v, i, ok = topk_min_checked(jnp.asarray(x), k, block, 8)  # tiny cap
    ev, _ = _oracle(x, k)
    np.testing.assert_array_equal(np.asarray(v), ev)


def test_small_n_uses_sort():
    x = jnp.asarray(np.arange(32, dtype=np.float32)[::-1].copy())
    v, i, ok = topk_min(x, 4)
    np.testing.assert_array_equal(np.asarray(v), [0, 1, 2, 3])
    assert bool(ok)


def test_vmapped_tournament(rng):
    x = rng.normal(size=(4, 100_000)).astype(np.float32)
    v, i, ok = jax.vmap(lambda s: topk_min(s, 64))(jnp.asarray(x))
    assert np.asarray(ok).all()
    for b in range(4):
        ev, _ = _oracle(x[b], 64)
        np.testing.assert_array_equal(np.asarray(v[b]), ev)


def test_merge_exact_and_stable(rng):
    a = rng.normal(size=100).astype(np.float32)
    b = rng.normal(size=100).astype(np.float32)
    va, ia, _ = topk_min_sort(jnp.asarray(a), 16)
    vb, ib, _ = topk_min_sort(jnp.asarray(b), 16)
    vm, im = merge_min(va, ia, vb, ib + 100, 16)
    ev, ei = _oracle(np.concatenate([a, b]), 16)
    np.testing.assert_array_equal(np.asarray(vm), ev)
    np.testing.assert_array_equal(np.asarray(im), ei)


def test_split_invariance_of_chunked_selection(rng):
    """The reference's testing.ipynb cell-1 property, lifted to these ops:
    selecting per chunk then merging gives identical results for any
    chunking, and results for k1 < k2 are prefix-consistent."""
    x = rng.normal(size=4096).astype(np.float32)
    xj = jnp.asarray(x)

    def chunked(k, n_splits):
        c = 4096 // n_splits
        v = jnp.full((k,), jnp.inf)
        i = jnp.full((k,), np.iinfo(np.int32).max, jnp.int32)
        for s in range(n_splits):
            vv, ii, _ = topk_min_sort(xj[s * c : (s + 1) * c], k)
            v, i = merge_min(v, i, vv, ii + s * c, k)
        return np.asarray(v), np.asarray(i)

    v1, i1 = chunked(32, 32)
    v2, i2 = chunked(64, 64)
    np.testing.assert_array_equal(v1, v2[:32])
    np.testing.assert_array_equal(i1, i2[:32])


class TestTopkMinBatched:
    def test_matches_sort_oracle_rowwise(self, rng):
        from shadowing_tpu.ops.topk import topk_min_batched, topk_min_sort

        s = rng.normal(size=(3, 5000)).astype(np.float32)
        vals, idx, ok = topk_min_batched(jnp.asarray(s), 64)
        assert np.asarray(ok).all()
        for b in range(3):
            ref = topk_min_sort(jnp.asarray(s[b]), 64)
            np.testing.assert_array_equal(np.asarray(vals[b]),
                                          np.asarray(ref.values))
            np.testing.assert_array_equal(np.asarray(idx[b]),
                                          np.asarray(ref.indices))

    def test_small_n_fallback_and_ties(self, rng):
        from shadowing_tpu.ops.topk import topk_min_batched

        s = np.zeros((2, 300), np.float32)  # all ties: flat-order winners
        vals, idx, ok = topk_min_batched(jnp.asarray(s), 8)
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(idx),
                                      np.tile(np.arange(8), (2, 1)))

    def test_budget_chunked_gather_matches_sort(self, rng, monkeypatch):
        """The narrow-fold candidate gather chunks over batch rows when its
        padded source exceeds _GATHER_BUDGET (the k=16384 OOM fix) — the
        chunked path must stay bit-identical to the sort oracle.

        The budget is baked into each jit trace, so this test uses shapes
        no other test touches (n=65536 at B=5 / B=6).
        """
        from shadowing_tpu.ops import topk as topk_mod

        s = rng.normal(size=(5, 65536)).astype(np.float32)
        # small k -> narrow fold (block=8), n_blocks=8192, src 4 MB/row.
        # Budget 4 MB -> b_chunk=1 (5 chunks); 12 MB -> b_chunk=3 (2
        # chunks, one inf-padded row at B=5). k varies per case so each
        # case gets a fresh trace (the budget is baked in at trace time).
        for budget, B, k in [(4 << 20, 5, 512), (12 << 20, 5, 384),
                             (12 << 20, 6, 512)]:
            monkeypatch.setattr(topk_mod, "_GATHER_BUDGET", budget)
            sb = np.concatenate([s, s[:1]]) if B == 6 else s
            vals, idx, ok = topk_mod.topk_min_batched(jnp.asarray(sb), k)
            assert np.asarray(ok).all()
            for b in range(B):
                ref = topk_mod.topk_min_sort(jnp.asarray(sb[b]), k)
                np.testing.assert_array_equal(np.asarray(vals[b]),
                                              np.asarray(ref.values))
                np.testing.assert_array_equal(np.asarray(idx[b]),
                                              np.asarray(ref.indices))
