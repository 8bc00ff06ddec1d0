"""Benchmark: end-to-end Path Shadowing Monte Carlo on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

* ``value``: warm end-to-end seconds for the driver target config
  (BASELINE.md): shadow search over R=32768 x 4096 (w=20, k=1024) +
  softmax realized-variance prediction (Ts=5/10/20) + conditional
  Hedged-MC smile (3 maturities x 9 moneyness) — target < 1 s.
* ``vs_baseline``: speedup on the reference's own published benchmark
  (testing.ipynb cell 3: predict() over 131072 x 4096, Foveal 126 -> 34-d,
  k=10000, horizon=252 — 2.65 s on the reference's CUDA GPU).

Extra context (generation throughput, phase timings) goes to stderr.
Env knobs: BENCH_SKIP_REF=1 skips the big reference config,
BENCH_SKIP_GEN=1 skips generation throughput.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REF_BASELINE_S = 2.65  # testing.ipynb cell 3 tqdm output (reference GPU)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def median_time(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_target_config():
    """Shadow + vol predict + smile, R=32768, w=20, k=1024 (< 1 s target)."""
    from shadowing_tpu import (
        Identity,
        PathShadowing,
        PredictionContext,
        PriceData,
        RelativeMSE,
        SPDaily,
        Softmax,
        compute_smile,
        realized_variance,
    )

    rng = np.random.default_rng(0)
    dataset = (rng.standard_normal((32768, 1, 4096)) * 0.011).astype(np.float32)
    ctx = SPDaily().dlnx[0, 0, -20:].astype(np.float32)
    Ts = np.array([5, 10, 20])
    Ms = np.linspace(-2, 2, 9)

    obj = PathShadowing(
        Identity(20), RelativeMSE(), dataset, PredictionContext(horizon=20)
    )
    to_predict = lambda x: realized_variance(x[:, :, 0, :], Ts=Ts, vol=False)

    def e2e():
        # device-resident: one search feeds both the vol prediction and the
        # conditional smile; only final grids reach the host
        d, p, _ = obj.shadow_device(ctx, k=1024)
        vars_, _ = obj.predict_from_paths(d, p, to_predict, "softmax", 0.1)
        import jax.numpy as jnp

        fut = obj.context.select_out_context(p)[0, :, 0, :]
        lnx = jnp.concatenate(
            [jnp.zeros((1024, 1)), jnp.cumsum(fut, axis=-1)], axis=-1
        )
        ave = Softmax(d[0], eta=0.075)
        smile = compute_smile(jnp.exp(lnx) * 100.0, Ts, Ms, 0.0, ave)
        return vars_, smile

    t0 = time.perf_counter()
    e2e()  # compile + norms cache
    log(f"[target] first call (compile + norms): {time.perf_counter()-t0:.1f}s")
    t = median_time(e2e, n=3)
    log(f"[target] warm e2e shadow+predict+smile: {t:.3f}s")
    return t


def bench_reference_config():
    """The reference's perf cell: 131072 x 4096, Foveal -> 34d, k=10000."""
    from shadowing_tpu import (
        Foveal,
        PathShadowing,
        PredictionContext,
        RelativeMSE,
        realized_variance,
    )

    rng = np.random.default_rng(1)
    dataset = (rng.standard_normal((131072, 1, 4096)) * 0.011).astype(np.float32)
    ctx = (rng.standard_normal((1, 1, 126)) * 0.011).astype(np.float32)
    emb = Foveal(alpha=1.15, beta=0.9, max_context=126)
    obj = PathShadowing(
        emb, RelativeMSE(), dataset, PredictionContext(horizon=252)
    )
    to_predict = lambda x: realized_variance(x, Ts=[2, 7, 252], vol=False)

    def predict():
        return obj.predict(ctx, k=10000, to_predict=to_predict, eta=0.1)

    t0 = time.perf_counter()
    predict()
    log(f"[ref-cfg] first call (compile + norms): {time.perf_counter()-t0:.1f}s")
    t = median_time(predict, n=3)
    log(f"[ref-cfg] warm predict(): {t:.3f}s  "
        f"(reference GPU: {REF_BASELINE_S:.2f}s -> {REF_BASELINE_S/t:.1f}x)")
    return t


def bench_generation():
    """Scattering-synthesis throughput (paths/s) on the bundled series."""
    from shadowing_tpu import SPDaily, generate

    snp = SPDaily(start="03-01-2000", end="31-12-2014")
    t0 = time.perf_counter()
    generate(x=snp, R=256, J=9, tol_optim=1e-2, max_iterations=300,
             seed=0, batch=256)
    dt = time.perf_counter() - t0
    log(f"[gen] 256 paths (J=9, T=4096, 300 iters): {dt:.1f}s "
        f"-> {256/dt:.1f} paths/s")
    return 256 / dt


def main():
    t_target = bench_target_config()
    vs = None
    if os.environ.get("BENCH_SKIP_REF") != "1":
        t_ref = bench_reference_config()
        vs = REF_BASELINE_S / t_ref
    if os.environ.get("BENCH_SKIP_GEN") != "1":
        bench_generation()
    print(json.dumps({
        "metric": "e2e shadow+vol-predict+smile, R=32768x4096 w=20 k=1024 "
                  "(vs_baseline: speedup on reference testing.ipynb cell-3 "
                  "config, 131072x4096 Foveal k=10000, 2.65s CUDA)",
        "value": round(t_target, 4),
        "unit": "s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
