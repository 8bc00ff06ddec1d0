"""Multi-chip sharding of the shadow search and synthesis training step.

The reference has no distributed layer at all (SURVEY.md §0: its only
multi-worker story is job-array generation sharding). The TPU-native design
is single-controller JAX over a 1-d device mesh:

* **Shadow search**: the dataset axis R is sharded across the mesh
  (``P("data")``); contexts and the embedding kernel are replicated. Each
  device runs the same fused scoring + tournament top-k on its local shard,
  then the per-device (value, global-index) candidates ride ICI through one
  ``all_gather`` and an exact k-way merge — exactness is the same
  streaming-merge property the single-chip engine tests (chunk invariance),
  lifted to devices, so mesh size 1 vs N give identical results.
* **Synthesis step**: scattering-spectra generation is data-parallel over
  seeds: each device Adam-steps its own seed shard against the replicated
  target statistics; only the scalar convergence metric is ``psum``-reduced.
  (Seeds are independent optimisations — the ideal dp workload.)

Everything here works on any backend; the tests exercise an 8-virtual-device
CPU mesh and the driver dry-runs the same code path.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shadowing_tpu.models.scattering.moments import _scattering_stats_flat
from shadowing_tpu.ops import topk as topk_ops

DATA_AXIS = "data"


def data_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-d mesh over (the first ``n_devices``) available devices."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def shard_dataset(y: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a ``(R, C, T)`` dataset with R sharded across the mesh."""
    return jax.device_put(y, NamedSharding(mesh, P(DATA_AXIS, None, None)))


@partial(
    jax.jit,
    static_argnames=("k", "n_out", "distance", "mesh", "block", "cap"),
)
def sharded_fused_search(
    y: jax.Array,          # (R, C, T), R sharded over mesh
    norms: jax.Array,      # (R, n_out), R sharded
    g: jax.Array,          # (B, C, Kw) combined filters, replicated
    x_norm2: jax.Array,    # (B,)
    k: int,
    n_out: int,
    distance,
    mesh: Mesh,
    block: int = 128,
    cap: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Mesh-sharded fused shadow search.

    Returns (values (B, k) ascending, global flat indices (B, k), ok (B,)).
    Per-device local top-k then one ICI ``all_gather`` of (B, k) candidate
    pairs and an exact merge — collective payload is O(B * k * devices),
    independent of R.
    """
    R = y.shape[0]
    n_dev = mesh.shape[DATA_AXIS]
    if R % n_dev:
        raise ValueError(f"R={R} must divide over {n_dev} devices")
    r_loc = R // n_dev

    def local_search(y_loc, nrm_loc):
        axis = jax.lax.axis_index(DATA_AXIS)
        cross = jax.lax.conv_general_dilated(
            y_loc, g, (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )[..., :n_out]
        cross = jnp.moveaxis(cross, 1, 0)              # (B, r_loc, n_out)
        s = distance.score(x_norm2[:, None, None], cross, nrm_loc[None])
        s = s.reshape(s.shape[0], -1)
        vals, idx, ok = jax.vmap(
            lambda row: topk_ops.topk_min(row, k, block, cap)
        )(s)
        idx = idx + axis.astype(jnp.int32) * (r_loc * n_out)

        # ride ICI: gather every device's k candidates, merge exactly
        vals_all = jax.lax.all_gather(vals, DATA_AXIS)   # (n_dev, B, k)
        idx_all = jax.lax.all_gather(idx, DATA_AXIS)
        vals_all = jnp.moveaxis(vals_all, 0, 1).reshape(vals.shape[0], -1)
        idx_all = jnp.moveaxis(idx_all, 0, 1).reshape(vals.shape[0], -1)
        neg, sel = jax.lax.top_k(-vals_all, k)
        merged_i = jnp.take_along_axis(idx_all, sel, axis=-1)
        ok_all = jax.lax.all_gather(ok, DATA_AXIS).all(axis=0)
        return -neg, merged_i, ok_all

    return jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None), P(DATA_AXIS, None)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(y, norms)


@partial(jax.jit, static_argnames=("J", "mesh", "lr"))
def sharded_synthesis_step(
    z: jax.Array,          # (R, T) seeds, R sharded over mesh
    m: jax.Array,          # Adam moments, same sharding
    v: jax.Array,
    step_idx: jax.Array,   # ()
    target: jax.Array,     # (n_stats,) replicated
    psi_hat: jax.Array,    # (J, T) replicated
    J: int,
    mesh: Mesh,
    lr: float = 0.03,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One data-parallel synthesis (training) step over the mesh.

    Each device updates its local seed shard; the scalar mean loss is
    ``psum``-averaged for logging/convergence. Returns (z, m, v, loss).
    """

    def local_step(z_loc, m_loc, v_loc):
        def loss_fn(zz):
            stats = _scattering_stats_flat(zz, psi_hat, J=J)
            # sum of per-seed means: each seed's gradient is independent of
            # how seeds are partitioned over devices (exact dp invariance)
            return ((stats - target[None]) ** 2).mean(axis=-1).sum()

        loss, grad = jax.value_and_grad(loss_fn)(z_loc)
        b1, b2, eps = 0.9, 0.999, 1e-8
        m_loc = b1 * m_loc + (1 - b1) * grad
        v_loc = b2 * v_loc + (1 - b2) * grad**2
        t = step_idx.astype(jnp.float32) + 1.0
        mh = m_loc / (1 - b1**t)
        vh = v_loc / (1 - b2**t)
        z_loc = z_loc - lr * mh / (jnp.sqrt(vh) + eps)
        gloss = jax.lax.psum(loss, DATA_AXIS) / z.shape[0]  # global mean
        return z_loc, m_loc, v_loc, gloss

    return jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS, None), P()),
        check_vma=False,
    )(z, m, v)
