"""FOM snapshot generation at one (mu1, mu2) (reference run_fom.py)."""

import time

import numpy as np

from common import base_parser, default_config, make_problem, report, \
    setup_jax, sync, warm_enabled


def main(mu1=4.75, mu2=0.02, num_cells=None, num_steps=None, f32=False,
         engine=None, spatial_shard=0):
    setup_jax(f32, n_devices=spatial_shard or None)
    import jax
    import jax.numpy as jnp

    from finitedifference_tpu.fom import (
        FOMResult,
        inviscid_burgers_implicit2d,
        inviscid_burgers_implicit2d_skewed,
    )
    from finitedifference_tpu.snapshots import param_to_snap_fn

    cfg = default_config(num_cells, num_steps)
    grid, w0 = make_problem(cfg)
    dtype = jnp.float32 if f32 else jnp.float64
    if engine is None:
        engine = "skewed" if jax.default_backend() != "cpu" else "standard"
    w0_d = jnp.asarray(w0, dtype)

    mesh = None
    if spatial_shard:
        # spatially-sharded skewed engine over an sp mesh (VERDICT r3
        # #3b): on this box the devices are virtual CPU shards (the
        # driver validates real multi-chip via dryrun_multichip)
        from jax.sharding import Mesh

        from finitedifference_tpu.parallel.spatial import (
            sharded_skewed_fom,
        )
        devs = jax.devices()[:spatial_shard]
        if len(devs) < spatial_shard:
            raise SystemExit(
                f"--spatial-shard {spatial_shard}: only {len(devs)} "
                f"devices visible (run under JAX_PLATFORMS=cpu for "
                f"virtual shards)")
        mesh = Mesh(np.asarray(devs), ("sp",))
        print(f"spatial sharding: {spatial_shard}-way row shards "
              f"({jax.default_backend()} devices)")

    def solve():
        if mesh is not None:
            snaps, its = sharded_skewed_fom(
                mesh, grid, w0_d, float(cfg.dt), cfg.num_steps, mu1,
                mu2)
            res = FOMResult(snaps=snaps, total_newton_its=its,
                            max_final_relnorm=jnp.zeros((), dtype))
        elif engine == "skewed":
            res = inviscid_burgers_implicit2d_skewed(
                grid, w0_d, float(cfg.dt), cfg.num_steps, mu1, mu2)
        else:
            res = inviscid_burgers_implicit2d(
                grid, w0_d, cfg.dt, cfg.num_steps, mu1, mu2)
        # device-side checksum forces execution without dragging the
        # full trajectory over the slow dev tunnel inside the timer
        float(jnp.sum(res.snaps))
        return res

    if warm_enabled():
        solve()   # both engines are module-level jits: 2nd call cached
    t0 = time.time()
    res = solve()
    elapsed = time.time() - t0
    snaps = sync(res.snaps)
    rate = cfg.num_steps / elapsed
    print(f"Elapsed FOM time: {elapsed:.3e} s "
          f"({rate:.2f} timesteps/s, {int(res.total_newton_its)} Newton its)")
    print("Relative error: 0.00%")   # protocol line for run_point_subproc

    fn = param_to_snap_fn([mu1, mu2], snap_folder=cfg.snap_folder)
    import os
    os.makedirs(cfg.snap_folder, exist_ok=True)
    np.save(fn, snaps)
    print(f"Saved {fn}")
    return elapsed, 0.0


if __name__ == "__main__":
    p = base_parser(__doc__)
    p.add_argument("--engine", default=None,
                   choices=["standard", "skewed"])
    p.add_argument("--spatial-shard", type=int, default=0, metavar="N",
                   help="run the skewed engine spatially sharded over "
                        "an N-device sp mesh (row shards + ppermute "
                        "halos; use with JAX_PLATFORMS=cpu for N "
                        "virtual devices)")
    args = p.parse_args()
    main(args.mu1, args.mu2, args.num_cells, args.num_steps, args.f32,
         args.engine, args.spatial_shard)
