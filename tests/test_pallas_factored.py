"""Factored-E pass-1 (interpret mode on CPU) vs the XLA oracle and the
Toeplitz pallas path — exactness, certification, and engine routing."""
import jax.numpy as jnp
import numpy as np
import pytest

from shadowing_tpu import Identity, PathShadowing, PredictionContext, RelativeMSE
from shadowing_tpu.ops.pallas_factored import (
    TR,
    build_factored,
    e9_bytes,
    score_blockmin_factored,
    two_pass_search_factored,
)
from shadowing_tpu.ops.pallas_search import L, _pad_views
from shadowing_tpu.ops.sliding import sliding_dot


def make_problem(rng, R=256, T=700, w=24, d=12, B=9, C=1):
    """Embedding bank + contexts: g = x_emb @ kernel ties the two pass-1
    formulations to the same combined filters."""
    y = rng.normal(0, 0.02, size=(R, C, T)).astype(np.float32)
    kernel = rng.normal(size=(d, C, w)).astype(np.float32)
    x_emb = rng.normal(size=(B, d)).astype(np.float32)
    g = np.einsum("bd,dcw->bcw", x_emb, kernel).astype(np.float32)
    n_out = T - w + 1
    ones = np.ones((1, C, w), np.float32)
    norms = np.asarray(
        sliding_dot(jnp.asarray(y**2), jnp.asarray(ones), n_out=n_out)
    )[:, 0]
    return y, kernel, x_emb, g, norms, n_out


def oracle_scores(y, g, norms, n_out):
    cross = np.asarray(
        sliding_dot(jnp.asarray(y), jnp.asarray(g), n_out=n_out)
    )
    return norms[None] - 2 * np.moveaxis(cross, 1, 0)    # (B, R, n_out)


def build(y, kernel, norms, n_out, w):
    y3, n2 = _pad_views(jnp.asarray(y), jnp.asarray(norms), n_out, w)
    E9, n4 = build_factored(y3, n2, jnp.asarray(kernel))
    return y3, n2, E9, n4


def check_factored(rng_problem, k, rtol=1e-4):
    y, kernel, x_emb, g, norms, n_out = rng_problem
    w = kernel.shape[-1]
    y3, n2, E9, n4 = build(y, kernel, norms, n_out, w)
    vals, idx, ok = two_pass_search_factored(
        E9, n4, y3, n2, jnp.asarray(g), jnp.asarray(x_emb),
        k=k, n_out=n_out, interpret=True,
    )
    assert np.asarray(ok).all()
    s = oracle_scores(y, g, norms, n_out)
    flat = s.reshape(s.shape[0], -1)
    order = np.argsort(flat, axis=1)[:, :k]
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(flat, order, 1), rtol=rtol,
        atol=1e-6,
    )
    got_at = np.take_along_axis(flat, np.asarray(idx, np.int64), 1)
    np.testing.assert_allclose(got_at, np.asarray(vals), rtol=rtol, atol=1e-6)


def test_blockmin_matches_oracle(rng):
    y, kernel, x_emb, g, norms, n_out = make_problem(rng)
    w = kernel.shape[-1]
    y3, n2, E9, n4 = build(y, kernel, norms, n_out, w)
    Rp = y3.shape[0]
    assert Rp % TR == 0
    nblk = n2.shape[1] // L
    bmin = np.asarray(
        score_blockmin_factored(E9, n4, jnp.asarray(x_emb), interpret=True)
    ).transpose(0, 2, 1)                                 # -> (B, Rp, nblk)
    s = oracle_scores(y, g, norms, n_out)
    s_pad = np.pad(s, ((0, 0), (0, 0), (0, nblk * L - n_out)),
                   constant_values=np.inf)
    want = s_pad.reshape(s.shape[0], s.shape[1], nblk, L).min(axis=-1)
    # E hi/lo split + two bf16 dots: same error class as the Toeplitz
    # kernel's bf16x3 (~2^-18-relative residuals)
    np.testing.assert_allclose(bmin[:, : s.shape[1]], want,
                               rtol=1e-4, atol=2e-5)
    # padded rows fold +inf norms
    assert np.isinf(bmin[:, s.shape[1]:]).all() or (
        bmin[:, s.shape[1]:] > 1e20).all()


def test_two_pass_factored_exact(rng):
    check_factored(make_problem(rng), k=64)


def test_two_pass_factored_multichannel(rng):
    check_factored(make_problem(rng, T=500, w=40, C=3, d=10, B=8), k=48)


def test_two_pass_factored_uneven(rng):
    """R not a tile multiple and n_out not a block multiple: padded slots
    must never win."""
    y, kernel, x_emb, g, norms, n_out = make_problem(
        rng, R=293, T=400, w=21, d=7, B=8
    )
    y3, n2, E9, n4 = build(y, kernel, norms, n_out, kernel.shape[-1])
    vals, idx, ok = two_pass_search_factored(
        E9, n4, y3, n2, jnp.asarray(g), jnp.asarray(x_emb),
        k=32, n_out=n_out, interpret=True,
    )
    assert np.asarray(ok).all()
    traj = np.asarray(idx) // n_out
    t = np.asarray(idx) % n_out
    assert (traj < 293).all() and (t < n_out).all()
    assert np.isfinite(np.asarray(vals)).all()


def test_engine_routes_and_matches(rng, monkeypatch):
    """Engine-level: B >= FACTORED_MIN_B routes pass-1 through the factored
    kernel and returns results array-identical to fused and direct."""
    monkeypatch.setenv("SHADOWING_TPU_PALLAS_INTERPRET", "1")
    dataset = rng.normal(0, 0.02, size=(48, 1, 300)).astype(np.float32)
    dataset[11] = dataset[2]                 # force in-k distance ties
    starts = rng.integers(0, 200, size=9)
    ctx = np.stack([dataset[i % 48, :, s : s + 24]
                    for i, s in enumerate(starts)])
    obj = PathShadowing(Identity(24), RelativeMSE(), dataset,
                        PredictionContext(horizon=16))
    d_p, p_p, i_p = obj.shadow(ctx, k=40, method="pallas")
    assert obj._factored is not None, "factored cache not built at B=9"
    d_f, p_f, i_f = obj.shadow(ctx, k=40, method="fused")
    d_d, p_d, i_d = obj.shadow(ctx, k=40, method="direct")
    np.testing.assert_array_equal(i_p, i_f)
    np.testing.assert_array_equal(i_p, i_d)
    np.testing.assert_array_equal(d_p, d_f)
    np.testing.assert_array_equal(d_p, d_d)
    np.testing.assert_array_equal(p_p, p_f)

    # single-context searches keep the per-context Toeplitz kernel
    obj2 = PathShadowing(Identity(24), RelativeMSE(), dataset,
                         PredictionContext(horizon=16))
    obj2.shadow(ctx[:1], k=40, method="pallas")
    assert obj2._factored is None


def test_engine_imputation_context(rng, monkeypatch):
    """Context-adjusted plans (gap-padded kernel taps) build E from the SAME
    plan kernel as the combined filters — factored must match direct."""
    from shadowing_tpu import ImputationContext

    monkeypatch.setenv("SHADOWING_TPU_PALLAS_INTERPRET", "1")
    dataset = rng.normal(0, 0.02, size=(40, 1, 280)).astype(np.float32)
    ctx = np.stack([dataset[i, :, 50 : 50 + 24] for i in range(8)])
    obj = PathShadowing(Identity(24), RelativeMSE(), dataset,
                        ImputationContext((10, 6, 14)))
    d_p, p_p, i_p = obj.shadow(ctx, k=24, method="pallas")
    assert obj._factored is not None
    d_d, p_d, i_d = obj.shadow(ctx, k=24, method="direct")
    np.testing.assert_array_equal(i_p, i_d)
    np.testing.assert_array_equal(d_p, d_d)


def test_engine_kill_switch(rng, monkeypatch):
    monkeypatch.setenv("SHADOWING_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("SHADOWING_TPU_NO_FACTORED", "1")
    dataset = rng.normal(0, 0.02, size=(48, 1, 300)).astype(np.float32)
    ctx = np.repeat(dataset[[2], :, 30:54], 9, axis=0)
    obj = PathShadowing(Identity(24), RelativeMSE(), dataset,
                        PredictionContext(horizon=16))
    obj.shadow(ctx, k=8, method="pallas")
    assert obj._factored is None


def test_e9_bytes():
    # backtest config: 32768 rows, ~3.8k starts, d=20. The stacked-axis
    # padding grain (dp = multiple of 4, not 8) stores 40 rows, not 48:
    # 32768 * 30 blocks * 128 * 40 rows * 2 B = 10.07 GB — must fit a
    # 16 GB v5e next to the ~2.6 GB residents + 2 GB headroom
    assert e9_bytes(32768, 3825, 20) == 32768 * 30 * 128 * 2 * 20 * 2
    # a dim not on the 4-grain pads up (d=7 -> dp=8)
    assert e9_bytes(256, 3825, 7) == 256 * 30 * 128 * 2 * 8 * 2


def test_two_pass_factored_backtest_dim(rng):
    """d=20 (the backtest embedding dim): dp=20 exercises the 4-grain
    (non-8-multiple) padding path end to end."""
    check_factored(make_problem(rng, R=256, T=500, w=20, d=20, B=8), k=32)


def test_routing_log_reasons(rng, monkeypatch):
    """Auto-routing decisions leave one structured reason line each; a
    forced decline names the gate that declined (with its byte math)."""
    import shadowing_tpu.shadow.engine as eng

    monkeypatch.setenv("SHADOWING_TPU_PALLAS_INTERPRET", "1")
    dataset = rng.normal(0, 0.02, size=(48, 1, 300)).astype(np.float32)
    ctx = np.repeat(dataset[[2], :, 30:54], 9, axis=0)

    # small-B decline
    obj = PathShadowing(Identity(24), RelativeMSE(), dataset,
                        PredictionContext(horizon=16))
    obj.shadow(ctx[:1], k=8, method="pallas")
    assert any("factored declined: B=1 < FACTORED_MIN_B" in s
               for s in obj.routing_log), obj.routing_log

    # memory-gate decline: shrink the budget so E9 cannot fit
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(eng, "_memory_budget", lambda: 1 << 20)
        obj2 = PathShadowing(Identity(24), RelativeMSE(), dataset,
                             PredictionContext(horizon=16))
        obj2.shadow(ctx, k=8, method="pallas")
        assert obj2._factored is None
        assert any("factored declined: E9 needs" in s and "GB free" in s
                   for s in obj2.routing_log), obj2.routing_log

    # granted: the reason records the byte math; method line present
    obj3 = PathShadowing(Identity(24), RelativeMSE(), dataset,
                         PredictionContext(horizon=16))
    obj3.shadow(ctx, k=8, method="pallas")
    assert any(s.startswith("factored pass-1 routed:")
               for s in obj3.routing_log), obj3.routing_log
    assert any(s.startswith("method=pallas") for s in obj3.routing_log)


def test_scratch_budget(rng, monkeypatch):
    """With E9 resident the extraction scratch budget shrinks to the real
    headroom (floored at 256 MB); without it the default budget applies."""
    monkeypatch.setenv("SHADOWING_TPU_PALLAS_INTERPRET", "1")
    dataset = rng.normal(0, 0.02, size=(48, 1, 300)).astype(np.float32)
    ctx = np.repeat(dataset[[2], :, 30:54], 9, axis=0)
    obj = PathShadowing(Identity(24), RelativeMSE(), dataset,
                        PredictionContext(horizon=16))
    assert obj._scratch_budget() is None          # nothing resident yet
    obj.shadow(ctx, k=8, method="pallas")
    assert obj._factored is not None
    b = obj._scratch_budget()
    from shadowing_tpu.shadow.engine import _memory_budget
    assert b is not None and (256 << 20) <= b <= _memory_budget()


def test_engine_factored_runtime_failure_reroutes(rng, monkeypatch):
    """A JaxRuntimeError from the factored pass (e.g. a selection-temp HBM
    OOM at large k — on the remote platform the wrapped compile error does
    not even say "memory") must reroute to the Toeplitz kernel with the
    IDENTICAL certified result, log the reroute, and memoize the (B, k)
    shape so later calls skip the doomed attempt entirely."""
    import jax

    import shadowing_tpu.shadow.engine as eng

    monkeypatch.setenv("SHADOWING_TPU_PALLAS_INTERPRET", "1")
    dataset = rng.normal(0, 0.02, size=(48, 1, 300)).astype(np.float32)
    ctx = np.repeat(dataset[[2], :, 30:54], 9, axis=0)
    obj = PathShadowing(Identity(24), RelativeMSE(), dataset,
                        PredictionContext(horizon=16))

    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError(
            "INTERNAL: remote_compile: HTTP 500: tpu_compile_helper "
            "subprocess exit code 1")

    monkeypatch.setattr(eng.pallas_factored, "two_pass_search_factored",
                        boom)
    d_f, p_f, i_f = obj.shadow(ctx, k=8, method="pallas")
    assert calls["n"] == 1
    assert (9, 8) in obj._factored_failed
    assert any("factored FAILED at B=9, k=8" in s for s in obj.routing_log), \
        obj.routing_log
    # second identical call: the failed shape is memoized, no new attempt
    obj.shadow(ctx, k=8, method="pallas")
    assert calls["n"] == 1
    # results match the literal oracle
    d_d, p_d, i_d = obj.shadow(ctx, k=8, method="direct")
    np.testing.assert_array_equal(i_f, i_d)
    np.testing.assert_array_equal(p_f, p_d)


def test_engine_factored_build_failure_disables(rng, monkeypatch):
    """A runtime failure in build_factored (engine-static inputs) must
    disable the factored route engine-wide: a later call at a DIFFERENT
    (B, k) must not re-attempt the identical doomed multi-GB build."""
    import jax

    import shadowing_tpu.shadow.engine as eng

    monkeypatch.setenv("SHADOWING_TPU_PALLAS_INTERPRET", "1")
    dataset = rng.normal(0, 0.02, size=(48, 1, 300)).astype(np.float32)
    ctx = np.repeat(dataset[[2], :, 30:54], 9, axis=0)
    obj = PathShadowing(Identity(24), RelativeMSE(), dataset,
                        PredictionContext(horizon=16))

    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("")  # empty message: the handler
        # must not crash extracting its first line

    monkeypatch.setattr(eng.pallas_factored, "build_factored", boom)
    d_f, p_f, i_f = obj.shadow(ctx, k=8, method="pallas")
    assert calls["n"] == 1 and obj._factored_disabled
    assert any("factored FAILED at B=9, k=8 (build)" in s
               for s in obj.routing_log), obj.routing_log
    obj.shadow(ctx, k=12, method="pallas")   # different shape: no retry
    assert calls["n"] == 1
    d_d, p_d, i_d = obj.shadow(ctx, k=8, method="direct")
    np.testing.assert_array_equal(i_f, i_d)
    np.testing.assert_array_equal(p_f, p_d)
