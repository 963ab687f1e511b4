"""Parameter sweeps over (mu1, mu2): vmap on one chip, sharded vmap on a
device mesh.

The reference runs its parameter studies serially (run_tests.py:38 loops
over mu points, each a full Python time loop). Here the whole sweep is
one compiled program: `vmap` of the jitted stepper over the mu batch,
and for multi-chip the batch axis is sharded over the mesh's 'dp' axis so
XLA splits the sweep across chips with zero communication (embarrassingly
parallel — the BASELINE.md north-star workload).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from finitedifference_tpu.fom import (
    inviscid_burgers_implicit2d,
    inviscid_burgers_implicit2d_skewed,
)
from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.rom import lspg_prom


def make_sweep_mesh(devices=None, axis_name: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _shard_batch(mus, mesh: Optional[Mesh], axis_name: str = "dp"):
    mus = jnp.asarray(mus)
    if mesh is None:
        return mus
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(mus, sharding)


def sweep_fom(grid: Grid2D, w0, dt, num_steps, mus, *,
              mesh: Optional[Mesh] = None, engine: str = "standard",
              snaps_dtype=None, **kwargs):
    """Batched FOM trajectories for a (B, 2) array of (mu1, mu2).

    Returns snaps of shape (B, 2n, num_steps+1). With `mesh`, the batch
    axis is sharded across devices (pad B to a multiple of the mesh
    size). engine="skewed" uses the fast skewed-coordinate solver
    (Pallas on TPU).
    """
    mus = _shard_batch(mus, mesh)
    w0 = jnp.asarray(w0)

    def run(mu):
        if engine == "skewed":
            return inviscid_burgers_implicit2d_skewed(
                grid, w0, float(dt), num_steps, mu[0], mu[1],
                snaps_dtype=snaps_dtype, **kwargs).snaps
        return inviscid_burgers_implicit2d(
            grid, w0, dt, num_steps, mu[0], mu[1],
            snaps_dtype=snaps_dtype, **kwargs).snaps

    return jax.vmap(run)(mus)


def sweep_lspg(grid: Grid2D, w0, dt, num_steps, mus, basis, *,
               mesh: Optional[Mesh] = None, **kwargs):
    """Batched LSPG PROM: reduced coordinates (B, k, num_steps+1)."""
    mus = _shard_batch(mus, mesh)
    w0 = jnp.asarray(w0)
    basis = jnp.asarray(basis)

    def run(mu):
        return lspg_prom(grid, w0, dt, num_steps, mu[0], mu[1], basis,
                         **kwargs).red_coords

    return jax.vmap(run)(mus)


def sweep_hprom(grid: Grid2D, smesh, sample_weights, y0, basis_aug, dt,
                num_steps, mus, *, mesh: Optional[Mesh] = None,
                engine: str = "generic", **kwargs):
    """Batched ECSW HPROM: reduced coordinates (B, k, num_steps+1).

    The multi-query economics story of hyper-reduction on TPU: one
    offline weight solve amortized over a whole vmapped (mu1, mu2)
    sweep, each point a few hundred sampled cells instead of the full
    grid. smesh is the ops.sampled.SampledMesh (shared across the
    batch); `mesh` (optional) shards the mu batch over devices.

    engine="factored" runs the stencil-block engine (rom_factored.py):
    under vmap its per-iteration GEMV and Gram build become true batched
    MXU GEMMs, so the aggregate sweep rate improves over the
    gather-based generic path.
    """
    from finitedifference_tpu.rom import ecsw_hprom
    from finitedifference_tpu.rom_factored import (
        factored_hprom,
        precompute_factored_blocks,
    )

    mus = _shard_batch(mus, mesh)
    if engine == "factored":
        blocks = precompute_factored_blocks(smesh, basis_aug)

        def run(mu):
            return factored_hprom(grid, smesh, sample_weights, y0,
                                  blocks, dt, num_steps, mu[0], mu[1],
                                  **kwargs).red_coords
    else:
        def run(mu):
            return ecsw_hprom(grid, smesh, sample_weights, y0,
                              basis_aug, dt, num_steps, mu[0], mu[1],
                              **kwargs).red_coords

    return jax.vmap(run)(mus)


def sweep_manifold(grid: Grid2D, y0, decode, dec_jac, dt, num_steps, mus,
                   *, mesh: Optional[Mesh] = None, smesh=None,
                   sample_weights=None, **kwargs):
    """Batched nonlinear-manifold ROM (RNM / POD-RBF / POD-GP / AE),
    full or hyper-reduced: reduced coordinates (B, k, num_steps+1)."""
    from finitedifference_tpu.rom import manifold_rom

    mus = _shard_batch(mus, mesh)

    def run(mu):
        return manifold_rom(grid, y0, decode, dec_jac, dt, num_steps,
                            mu[0], mu[1], mesh=smesh,
                            sample_weights=sample_weights,
                            **kwargs).red_coords

    return jax.vmap(run)(mus)


def pad_to_multiple(mus, multiple: int):
    """Pad the batch with copies of the last row to a device-count multiple
    (XLA requires equal shards). Returns (padded, original_count)."""
    mus = np.asarray(mus)
    b = mus.shape[0]
    rem = (-b) % multiple
    if rem:
        mus = np.vstack([mus, np.repeat(mus[-1:], rem, axis=0)])
    return mus, b
