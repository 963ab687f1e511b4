"""A/B the Pallas wavefront solve variants + the restructured Newton
body on the real TPU at 750^2 (VERDICT r4 #5: break the latency wall).

Times, as scanned device loops with device-side consumption (this
backend's sync primitives are lazy — CLAUDE.md):
  - solve_skewed_pallas variant=scratch (the r4 kernel)
  - solve_skewed_pallas variant=reg, unroll in {1, 2, 4, 8}
  - the f64 skewed residual (old full form vs r5 iter form)
  - the full 500-step skewed FOM (the bench.py headline program)

Run: python scripts/time_wavefront.py [--reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fdtpu_jax_cache"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from finitedifference_tpu.grid import Grid2D  # noqa: E402
from finitedifference_tpu.ops import skewed as sk  # noqa: E402
from finitedifference_tpu.ops.pallas_wavefront import (  # noqa: E402
    solve_skewed_pallas,
)


def timed_loop(fn, n_inner, reps, *args):
    """Median wall of `reps` runs of a scanned n_inner-iteration loop,
    consumed via a device scalar fetch."""
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def loop(*a):
        def body(c, _):
            out = fn(*a, c)
            return out, None
        c0 = jnp.zeros((), jnp.float32)
        c, _ = jax.lax.scan(body, c0, None, length=n_inner)
        return c

    float(loop(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(loop(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts)) / n_inner


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--inner", type=int, default=200)
    p.add_argument("--skip-fom", action="store_true")
    a = p.parse_args()

    n = 750
    grid = Grid2D(nx=n, ny=n, x_up=100.0, y_up=100.0)
    lay = sk.make_layout(grid, block=128)
    rng = np.random.default_rng(0)
    f32 = jnp.float32

    shape = (lay.nd_pad, lay.ny_pad)
    vmask = sk.valid_mask(lay, f32)
    su = jnp.asarray(1 + rng.uniform(size=shape), f32) * vmask
    sv = jnp.asarray(1 + rng.uniform(size=shape), f32) * vmask
    sfu = jnp.asarray(rng.uniform(size=shape), f32) * vmask
    sfv = jnp.asarray(rng.uniform(size=shape), f32) * vmask

    # ---- solve kernels -------------------------------------------------
    def make_solver(**kw):
        def fn(su, sv, sfu, sfv, c):
            du, dv = solve_skewed_pallas(su, sv, sfu + c, sfv, 0.05,
                                         grid, lay, **kw)
            return c + du[7, 7] + dv[3, 3]
        return fn

    from finitedifference_tpu.ops.pallas_wavefront import (
        solve_skewed_pallas_seg,
    )

    def make_seg_solver(**kw):
        def fn(su, sv, sfu, sfv, c):
            du, dv = solve_skewed_pallas_seg(su, sv, sfu + c, sfv,
                                             0.05, grid, lay, **kw)
            return c + du[7, 7] + dv[3, 3]
        return fn

    for label, mk, kw in [
        ("scratch (r4)", make_solver, dict(variant="scratch")),
        ("reg unroll=8", make_solver, dict(variant="reg", unroll=8)),
        ("seg8/ov64", make_seg_solver, dict(n_seg=8, overlap=64)),
        ("seg8/ov96", make_seg_solver, dict(n_seg=8, overlap=96)),
        ("seg16/ov64", make_seg_solver, dict(n_seg=16, overlap=64)),
        ("seg8/ov64/u8", make_seg_solver,
         dict(n_seg=8, overlap=64, unroll=8)),
    ]:
        try:
            us = timed_loop(mk(**kw), a.inner, a.reps,
                            su, sv, sfu, sfv) * 1e6
            print(f"solve {label:14s}: {us:8.1f} us", flush=True)
        except Exception as e:
            print(f"solve {label:14s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # accuracy of the segmented solve vs the exact chain at 750^2
    try:
        du0, dv0 = solve_skewed_pallas(su, sv, sfu, sfv, 0.05, grid,
                                       lay, variant="scratch")
        for nsg, ov in [(8, 48), (8, 64), (8, 96), (16, 64)]:
            du1, dv1 = solve_skewed_pallas_seg(
                su, sv, sfu, sfv, 0.05, grid, lay, n_seg=nsg,
                overlap=ov)
            err = float(jnp.max(jnp.abs(du1 - du0))
                        + jnp.max(jnp.abs(dv1 - dv0)))
            sc = float(jnp.max(jnp.abs(du0)))
            print(f"seg{nsg}/ov{ov} max abs err vs exact: {err:.3e} "
                  f"(scale {sc:.3f})", flush=True)
    except Exception as e:
        print(f"seg accuracy check FAILED: {str(e)[:200]}", flush=True)

    # ---- residual forms (f64, the Newton dtype) ------------------------
    f64 = jnp.float64
    vmask64 = sk.valid_mask(lay, f64)
    src_sk = sk.skewed_source(lay, grid, 0.02, 0.05, f64)
    lbc_sk = sk.skewed_inflow_bc(lay, grid, 4.75, 0.05, f64)
    su64, sv64 = su.astype(f64), sv.astype(f64)
    sup, svp = sv64 * vmask64, su64 * vmask64

    def res_full(su64, sv64, sup, svp, c):
        ru, rv = sk.skewed_residual(su64 + c, sv64, sup, svp, 0.05,
                                    grid, lay, src_sk, lbc_sk, vmask64)
        return (c + ru[7, 7] + rv[3, 3]).astype(jnp.float32)

    cp_u, cp_v, _, _ = sk.skewed_step_constant(sup, svp, 0.05, grid,
                                               src_sk, lbc_sk, vmask64)

    def res_iter(su64, sv64, cp_u, cp_v, c):
        ru, rv = sk.skewed_residual_iter(su64 + c, sv64, cp_u, cp_v,
                                         0.05, grid, vmask64)
        return (c + ru[7, 7] + rv[3, 3]).astype(jnp.float32)

    us = timed_loop(res_full, a.inner, a.reps, su64, sv64, sup, svp) \
        * 1e6
    print(f"residual full (r4 form): {us:8.1f} us", flush=True)
    us = timed_loop(res_iter, a.inner, a.reps, su64, sv64, cp_u, cp_v) \
        * 1e6
    print(f"residual iter (r5 form): {us:8.1f} us", flush=True)

    # ---- full 500-step FOM (bench headline) ----------------------------
    if not a.skip_fom:
        from finitedifference_tpu.fom import (
            inviscid_burgers_implicit2d_skewed,
        )

        w0 = jnp.ones(grid.state_dim, f64)

        def run(**kw):
            r = inviscid_burgers_implicit2d_skewed(
                grid, w0, 0.05, 500, 4.75, 0.02, snaps_dtype=f32, **kw)
            return float(jnp.sum(r.snaps[::137, ::31])), \
                int(r.total_newton_its)

        for label, kw in [("exact chain", {}),
                          ("seg8/ov64", dict(seg=8, seg_overlap=64))]:
            chk, _ = run(**kw)
            ts = []
            for _ in range(a.reps):
                t0 = time.time()
                _, its = run(**kw)
                ts.append(time.time() - t0)
            el = float(np.median(ts))
            print(f"FOM 500 steps [{label}]: {el:.3f} s = "
                  f"{500 / el:.1f} steps/s ({its} Newton its, "
                  f"checksum {chk:.9e})", flush=True)


if __name__ == "__main__":
    main()
