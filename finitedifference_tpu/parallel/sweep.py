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

    engine="pallas_traj" runs the whole-trajectory kernel
    (rom_factored.pallas_traj_hprom, f32 only): mu enters only through
    the per-cell source/BC input array, so the batch vmaps into the
    kernel's leading grid dimension — B trajectories, B dispatches
    total (unroll_its/solve_iters kwargs apply; ls_method does not).
    """
    from finitedifference_tpu.rom import ecsw_hprom
    from finitedifference_tpu.rom_factored import (
        factored_hprom,
        pallas_traj_hprom,
        precompute_factored_blocks,
        precompute_pallas_system,
    )

    mus = _shard_batch(mus, mesh)
    if engine == "pallas_traj":
        blocks = precompute_factored_blocks(smesh, basis_aug)
        p6p, wgt_p = precompute_pallas_system(blocks, sample_weights)
        kw = {k: v for k, v in kwargs.items() if k != "ls_method"}

        def run(mu):
            return pallas_traj_hprom(grid, smesh, p6p, wgt_p, y0, dt,
                                     num_steps, mu[0], mu[1],
                                     **kw).red_coords
    elif engine == "factored":
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


def sharded_factored_hprom(grid: Grid2D, smesh, sample_weights, y0,
                           basis_aug, dt, num_steps, mu1, mu2, *,
                           mesh: Mesh, axis_name: str = "sp",
                           **kwargs):
    """ONE HPROM solve sharded across devices along the SAMPLED-CELL
    axis (single-query scaling, complementing the mu-batch sharding of
    sweep_hprom): each device holds a slice of the factored stencil
    blocks and weights, evaluates its partial [W.JV | W.r]^T [W.JV | W.r],
    and one `psum` per Gauss-Newton iteration assembles the (k+1, k+1)
    Gram extension; y and the tiny reduced solve stay replicated. The
    reference's fine-grid HPROM died of single-node memory
    (BurgersFD_CleanFine/slurm-55470585.out) — this is the TPU answer:
    the per-device working set shrinks linearly with the mesh size.

    Trajectories are bitwise-independent of the device count up to f.p.
    reduction order (equality vs the unsharded engine is tested on the
    8-device virtual mesh).
    """
    try:
        from jax import shard_map
    except ImportError:        # older jax
        from jax.experimental.shard_map import shard_map

    from finitedifference_tpu.ops.sampled import SampledMesh
    from finitedifference_tpu.rom_factored import (
        FactoredBlocks,
        factored_hprom,
        precompute_factored_blocks,
    )

    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                         if a == axis_name]))
    blocks = precompute_factored_blocks(smesh, basis_aug)
    p6 = np.asarray(blocks.p6)
    wgt = np.asarray(sample_weights)
    n_s = p6.shape[1]
    pad = (-n_s) % n_dev

    def pad_n(x, value=0):
        x = np.asarray(x)
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], value, x.dtype)])

    p6 = np.concatenate(
        [p6, np.zeros((6, pad, p6.shape[2]), p6.dtype)], axis=1)
    wgt = pad_n(wgt)                 # zero weight -> padded rows vanish
    sm = SampledMesh(
        sample_cells=jnp.asarray(pad_n(smesh.sample_cells)),
        aug_cells=smesh.aug_cells,
        pos_self=jnp.asarray(pad_n(smesh.pos_self)),
        pos_west=jnp.asarray(pad_n(smesh.pos_west)),
        pos_south=jnp.asarray(pad_n(smesh.pos_south)),
        has_west=jnp.asarray(pad_n(smesh.has_west, False)),
        has_south=jnp.asarray(pad_n(smesh.has_south, False)),
        col_x=jnp.asarray(pad_n(smesh.col_x)),
        is_left=jnp.asarray(pad_n(smesh.is_left, False)),
    )

    sp = P(axis_name)
    mesh_specs = SampledMesh(
        sample_cells=sp, aug_cells=P(), pos_self=sp, pos_west=sp,
        pos_south=sp, has_west=sp, has_south=sp, col_x=sp, is_left=sp)

    def run(sm_l, wgt_l, p6_l, y0_l):
        res = factored_hprom(grid, sm_l, wgt_l, y0_l,
                             FactoredBlocks(p6=p6_l), dt, num_steps,
                             mu1, mu2, axis_name=axis_name, **kwargs)
        return res.red_coords, res.total_gn_its

    red, its = shard_map(
        run, mesh=mesh,
        in_specs=(mesh_specs, sp, P(None, axis_name, None), P()),
        out_specs=(P(), P()),
    )(sm, jnp.asarray(wgt), jnp.asarray(p6), jnp.asarray(y0))
    from finitedifference_tpu.rom import ROMResult

    return ROMResult(red_coords=red, total_gn_its=its)


def pad_to_multiple(mus, multiple: int):
    """Pad the batch with copies of the last row to a device-count multiple
    (XLA requires equal shards). Returns (padded, original_count)."""
    mus = np.asarray(mus)
    b = mus.shape[0]
    rem = (-b) % multiple
    if rem:
        mus = np.vstack([mus, np.repeat(mus[-1:], rem, axis=0)])
    return mus, b
