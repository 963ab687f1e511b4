"""Shared runner plumbing: env setup, basis build-or-load, reporting.

The reference duplicates this block in every run_*.py (grid constants,
basis.npy load, snapshot collection, final error print). Runners here
are thin argparse CLIs over the library with the same artifact protocol:
basis.npy, ecsw_weights_*.npy, *_snaps_mu1_X_mu2_Y.npy files.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def setup_jax(f32: bool = False, platform: str | None = None,
              n_devices: int | None = None):
    """x64 is ALWAYS enabled: closure cores must be able to compute in
    f64 even when the online state runs f32 (their kernel-weight
    contractions cancel by ~5e5 — see closures/rbf.py). `f32` only
    selects the online state/solver dtype in the runners.

    platform: pin the jax backend ("cpu" to run a validation off-TPU,
    e.g. during a tunnel outage). Must be a config update, not
    JAX_PLATFORMS — jax is pre-imported by a site hook in this image.
    Falls back to the FDTPU_PLATFORM env var (set by the --platform
    runner flag, and inheritable by driver subprocesses)."""
    import jax

    platform = platform or os.environ.get("FDTPU_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if n_devices:
        # virtual device shards for --spatial-shard runs; must land
        # before the backend initializes (lazy), like the platform pin
        try:
            jax.config.update("jax_num_cpu_devices", n_devices)
        except Exception:
            pass
    jax.config.update("jax_enable_x64", True)
    # persistent compilation cache: repeated runner invocations (and the
    # run_tests drivers) skip the multi-minute XLA compiles
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "fdtpu_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def default_ls_dtype(f32: bool):
    """Mixed-precision least squares on TPU: f64 tall-skinny QR is ~30x
    slower than f32 there (and has crashed the axon worker under load);
    the f32 LS update error (~1e-7) is far below the GN stagnation
    threshold. CPU keeps full precision."""
    import jax

    if f32 or jax.default_backend() == "cpu":
        return None
    import jax.numpy as jnp

    return jnp.float32


def default_ls(f32: bool) -> dict:
    """Gauss-Newton least-squares kwargs for the current backend.

    On TPU: normal-equations solve (all-MXU — the tall-skinny QR that
    np.linalg.lstsq implies in the reference is the ROM online
    bottleneck there, ~10-30x slower) in f32 with HIGHEST-precision Gram
    matmuls. Safe because every LSPG system here is J@V = V + O(dt)
    with near-orthonormal V, so squaring the condition number costs a
    few digits of a very small number. CPU keeps tall-skinny QR in the
    run precision (reference-faithful)."""
    import jax

    if jax.default_backend() == "cpu":
        return {"ls_dtype": None, "ls_method": "qr"}
    return {"ls_dtype": default_ls_dtype(f32), "ls_method": "normal"}


def make_problem(cfg):
    from finitedifference_tpu.grid import grid_from_config

    grid = grid_from_config(cfg)
    w0 = np.ones(grid.state_dim)
    return grid, w0


def default_config(num_cells: int | None = None, num_steps: int | None = None):
    import dataclasses

    from finitedifference_tpu.config import DEFAULT_CONFIG

    cfg = DEFAULT_CONFIG
    if num_cells:
        cfg = cfg.with_cells(num_cells)
    if num_steps:
        cfg = dataclasses.replace(cfg, num_steps=num_steps)
    return cfg


def res_path(cfg, path: str) -> str:
    """Per-resolution artifact filename: 'x.npy' -> 'x_50x50.npy' at
    non-default resolutions. The reference keeps one directory tree per
    grid size; on the shared filename protocol a 12^2 model/weight file
    must never shadow the 250^2 one. Delegates 'what is the default
    resolution' to BurgersConfig.res_suffix (ADVICE r2)."""
    stem, ext = os.path.splitext(path)
    return f"{stem}{cfg.res_suffix}{ext}"


def get_or_build_basis(cfg, grid, w0, num_modes: int,
                       path: str = None, method: str = "rsvd",
                       load_basis: bool = True):
    """basis.npy protocol (reference run_prom.py:44-120): load if present,
    else collect the 9 training trajectories, rSVD, save. Non-default
    resolutions get their own basis file (the reference keeps one dir
    tree per resolution; a 750^2 basis must never shadow the 250^2 one).
    """
    from finitedifference_tpu.pod import pod
    from finitedifference_tpu.snapshots import collect_snapshots

    if path is None:
        path = res_path(cfg, "basis.npy")

    if load_basis and os.path.exists(path):
        full = np.load(path, allow_pickle=True)
        if full.shape[1] >= num_modes:
            return full[:, :num_modes]
        print(f"{path} has {full.shape[1]} modes < {num_modes}; rebuilding")

    snaps = collect_snapshots(cfg.mu_samples(), grid, w0, cfg.dt,
                              cfg.num_steps, snap_folder=cfg.snap_folder)
    t0 = time.time()
    # large snapshot matrices: the device rSVD would exceed HBM (the
    # same wall the reference hits — its fine-grid HPROM OOMs a node);
    # this is offline, so run it on the host CPU backend
    import jax as _jax
    if snaps.nbytes > 2e9:
        with _jax.default_device(_jax.devices("cpu")[0]):
            basis, sigma = pod(snaps, num_modes=num_modes, method=method,
                               random_state=cfg.seed)
    else:
        basis, sigma = pod(snaps, num_modes=num_modes, method=method,
                           random_state=cfg.seed)
    print(f"POD ({method}, {num_modes} modes): {time.time() - t0:.3e} s")
    basis = np.asarray(basis)
    np.save(path, basis)
    np.save(path.replace("basis", "sigma"), np.asarray(sigma))
    return basis


def report(name: str, rom_snaps, hdm_snaps, elapsed: float, mu,
           save_prefix: str | None = None):
    """Final error print + snapshot save, mirroring every reference
    runner's epilogue (e.g. run_prom.py:104-126)."""
    from finitedifference_tpu.snapshots import relative_error_pct

    rel = relative_error_pct(np.asarray(rom_snaps), np.asarray(hdm_snaps))
    print(f"Elapsed {name} time: {elapsed:.3e} s")
    print(f"Relative error: {rel:.2f}%")
    if save_prefix:
        fn = f"{save_prefix}_snaps_mu1_{mu[0]:.2f}_mu2_{mu[1]:.3f}.npy"
        np.save(fn, np.asarray(rom_snaps))
        print(f"Snapshot saved as {fn}")
    return elapsed, rel


def sync(x):
    """Force device->host materialization (axon block_until_ready can
    return early)."""
    return np.asarray(x)


def warm_enabled() -> bool:
    """Warm-timing protocol (VERDICT r2 #3): run the jitted online
    program once untimed (compile + cache settle), then time a second
    execution. Toggled by the runners' --warm flag via FDTPU_WARM so the
    regression drivers can enable it uniformly across subprocesses."""
    return os.environ.get("FDTPU_WARM", "") == "1"


def split_training(cfg, grid, w0, num_total: int, num_primary: int,
                   num_secondary: int | None = None, basis_path=None,
                   max_pairs: int = 1500, qcoords_dir: str | None = None):
    """POD split + projected training pairs for all closure ROMs.

    Returns (u_p, u_s, q_p, q_s): primary/secondary POD blocks and the
    (n_samples, n_p)/(n_samples, n_s) regression pairs (the shared
    offline recipe of train_reduced_manifold_autoencoder.py:86-219,
    POD-RBF_global/compute_global_weights_*.py and POD-GP/train_gp.py).

    qcoords_dir: directory of pre-projected (num_steps+1, num_total)
    coordinate files (scripts/gen_fine_qcoords.py) — the mu-DENSIFIED
    training set. When given, the pairs come from every file there
    (subsampled per-trajectory so max_pairs spreads across mu evenly)
    instead of projecting the 9 raw snapshot trajectories; the POD
    basis itself stays the on-disk one the qcoords were projected on.

    Pairs beyond `max_pairs` are stride-subsampled: kernel-method fits
    are cubic in the pair count, and ~1.5k well-spread points along the
    trajectories saturate interpolation accuracy (the reference instead
    burns SLURM hours on the full 4.5k-point grid searches).
    """
    from finitedifference_tpu.pod import split_basis
    from finitedifference_tpu.snapshots import collect_snapshots
    from finitedifference_tpu.training.rnm_train import project_snapshots

    basis = get_or_build_basis(cfg, grid, w0, num_total, path=basis_path)
    u_p, u_s = split_basis(basis, num_primary, num_secondary)
    if qcoords_dir:
        import glob as _glob

        files = sorted(
            f for f in _glob.glob(os.path.join(qcoords_dir, "*.npz"))
            if not os.path.basename(f).startswith("test_"))
        if not files:
            raise FileNotFoundError(
                f"--qcoords-dir {qcoords_dir}: no training *.npz "
                f"coordinate files (run scripts/gen_fine_qcoords.py)")
        per_traj = max(1, (max_pairs or 10 ** 9) // len(files))
        qs = []
        for f in files:
            q = np.load(f)["q"][:, :num_total]
            stride = max(1, -(-q.shape[0] // per_traj))
            qs.append(q[::stride])
        q = np.concatenate(qs, axis=0)
        n_s = (num_total - num_primary if num_secondary is None
               else num_secondary)
        q_p, q_s = q[:, :num_primary], q[:, num_primary:
                                         num_primary + n_s]
        return np.asarray(u_p), np.asarray(u_s), q_p, q_s
    snaps = collect_snapshots(cfg.mu_samples(), grid, w0, cfg.dt,
                              cfg.num_steps, snap_folder=cfg.snap_folder)
    q_p, q_s = project_snapshots(basis, snaps.T, num_primary,
                                 num_secondary)
    if max_pairs and q_p.shape[0] > max_pairs:
        stride = -(-q_p.shape[0] // max_pairs)
        q_p, q_s = q_p[::stride], q_s[::stride]
    return np.asarray(u_p), np.asarray(u_s), q_p, q_s


def run_manifold(cfg, grid, w0, u_p, u_s, closure, mu1=None, mu2=None, *,
                 f32=False, weights_full=None, label="ROM",
                 save_prefix=None, warm_q1=None, points=None):
    """Online manifold-ROM run (full or hyper-reduced) + report.

    warm_q1: optional projected coordinates of a training trajectory at
    t=1 used as the state after the first step. The reference's POD-RBF
    and POD-GP steppers overwrite their step-0 Gauss-Newton result with
    exactly this (hypernet2D.py:1100-1102, the `i % 258492480 == 0`
    quirk): the closure GN can diverge from the uniform cold start, and
    all trajectories begin at the same w0=1 regardless of mu, so the
    training trajectory's first step is a faithful warm start.

    points: optional list of (mu1, mu2) — all run through ONE compiled
    stepper ((mu1, mu2) are runtime args) and are reported/saved
    individually; returns a list of (elapsed, rel). On this
    environment's remote-compile service that turns 3 multi-minute
    compiles into 1. With (mu1, mu2) given instead, returns a single
    (elapsed, rel) as before.
    """
    import jax
    import jax.numpy as jnp

    from finitedifference_tpu.closures.common import (
        manifold_decoder,
        manifold_decoder_fused,
    )
    from finitedifference_tpu.ops.sampled import (
        augmented_state_indices,
        build_sampled_mesh,
    )
    from finitedifference_tpu.rom import make_manifold_stepper
    from finitedifference_tpu.snapshots import load_or_compute_snaps

    # On TPU a FULL-MESH online state runs f32 (f64 is emulated ~20x
    # slower and has crashed the axon worker on full-size programs); the
    # closure cores still evaluate in f64 through the precision bridge
    # (closures/rbf.py::global_rbf_closure — their contractions cancel
    # by ~5e5 and are meaningless in f32), and basis GEMMs force
    # true-f32 accumulation (precision.py). SAMPLED (hyper-reduced)
    # runs keep f64 everywhere: their whole program is a few thousand
    # gathered rows, and at 750^2 the f32 sampled state demonstrably
    # biases the Gauss-Newton trajectory (27% vs 9.9% at (5.19,0.026),
    # scripts/fine_closure_probe.py). CPU keeps full f64,
    # reference-faithful. Round-1's host-CPU fallback is gone.
    on_tpu = jax.default_backend() != "cpu"
    full_mesh = weights_full is None
    dtype = jnp.float32 if (f32 or (on_tpu and full_mesh)) \
        else jnp.float64
    if on_tpu and not f32 and full_mesh:
        print("note: online state in f32 on TPU (closure cores stay f64)")

    single = points is None
    if single:
        points = [(mu1, mu2)]

    u_p_d = u_p.astype(dtype)
    u_s_d = u_s.astype(dtype)
    decode_full, dec_jac_full = manifold_decoder(u_p_d, u_s_d, closure)
    y0 = jnp.asarray(u_p.T @ w0, dtype)
    num_steps = cfg.num_steps
    y_start = y0
    if warm_q1 is not None:
        y_start = jnp.asarray(warm_q1, dtype)
        num_steps = cfg.num_steps - 1

    ls_kw = default_ls(f32)
    if not full_mesh and dtype == jnp.float64 and on_tpu:
        # sampled f64 runs keep the LS in f64 as well — the system is
        # (N_e x n_p), tiny, and a Cholesky normal-equations solve is
        # axon-safe at f64 (the f64 restriction is LU/lstsq)
        ls_kw = {"ls_dtype": None, "ls_method": "normal"}
    if weights_full is None:
        fused = manifold_decoder_fused(u_p_d, u_s_d, closure)
        run = make_manifold_stepper(grid, decode_full, dec_jac_full,
                                    cfg.dt, num_steps,
                                    dtype=dtype, decode_and_jac=fused,
                                    **ls_kw)
    else:
        sample_inds = np.where(weights_full != 0)[0]
        mesh = build_sampled_mesh(grid, sample_inds)
        idx = np.asarray(augmented_state_indices(mesh, grid.n_cells))
        dec_s, jac_s = manifold_decoder(u_p_d[idx], u_s_d[idx], closure)
        fused_s = manifold_decoder_fused(u_p_d[idx], u_s_d[idx], closure)
        run = make_manifold_stepper(grid, dec_s, jac_s, cfg.dt,
                                    num_steps, dtype=dtype,
                                    mesh=mesh,
                                    sample_weights=jnp.asarray(
                                        weights_full[sample_inds], dtype),
                                    decode_and_jac=fused_s,
                                    **ls_kw)

    results = []
    for m1, m2 in points:
        def solve():
            red_d, its = run(y_start, m1, m2)
            return np.asarray(red_d), its

        # time the ONLINE solve only, to the materialized reduced coords
        # (a few-hundred-KB fetch). The full-state reconstruction below
        # moves ~250 MB over this environment's 24 MB/s device->host
        # tunnel — an environment artifact, not algorithmic cost
        # (RESULTS.md). The first point's untimed warm run absorbs the
        # one compile shared by every point.
        if warm_enabled():
            solve()
        t0 = time.time()
        red_h, total_its = solve()
        elapsed = time.time() - t0

        red = jnp.asarray(red_h)
        if warm_q1 is not None:
            red = jnp.concatenate((y0[:, None], red), axis=1)
        rom_snaps = sync(jax.vmap(decode_full, in_axes=1,
                                  out_axes=1)(red))
        print(f"Total GN iterations: {int(total_its)}")

        hdm = load_or_compute_snaps([m1, m2], grid, w0, cfg.dt,
                                    cfg.num_steps,
                                    snap_folder=cfg.snap_folder)
        results.append(report(label, rom_snaps, hdm, elapsed, (m1, m2),
                              save_prefix=save_prefix))
    return results[0] if single else results


def closure_ecsw_weights(cfg, grid, w0, u_p, u_s, closure, *,
                         weights_path, method="nnls", bc_w=10.0,
                         mu_train=(4.25, 0.0225), compute=False):
    """Compute-or-load ECSW weights for a nonlinear-closure ROM
    (reference compute_ECSW_training_matrix_2D_{rnm,rbf_*,gp} + runner
    NNLS/ECM recipes).

    mu_train: one (mu1, mu2) pair — the reference's single-trajectory
    recipe (run_HPROM_ecsw_joshua.py:55-66) — or a sequence of pairs:
    the same snapshot-row budget is then split evenly over the
    trajectories (stride scales with the count), so a sampled mesh can
    represent the whole training box instead of one corner of it. The
    spread matters at 750^2, where the test points sit far from
    (4.25, 0.0225) in mu (same rationale as
    scripts/build_fine_weights.py --mu-train spread)."""
    import jax.numpy as jnp

    from finitedifference_tpu.closures.common import manifold_decoder
    from finitedifference_tpu.ecsw import (
        compute_ecsw_weights,
        ecsw_training_matrix_closure,
    )
    from finitedifference_tpu.snapshots import load_or_compute_snaps

    if not compute and os.path.exists(weights_path):
        return np.load(weights_path)

    from finitedifference_tpu.solvers import fit_reduced_coords

    decode, dec_jac = manifold_decoder(u_p, u_s, closure)
    u_p_t = jnp.asarray(u_p.T)

    def fit_y0(snap):
        """Projection start + the reference's inner Gauss-Newton fit of
        q to the snapshot through the decoder (hypernet2D.py:2765-2773),
        replacing round 1's plain-projection shortcut."""
        return fit_reduced_coords(decode, dec_jac, u_p_t @ snap, snap).y
    mu_list = [tuple(mu_train)] if np.ndim(mu_train[0]) == 0 \
        else [tuple(m) for m in mu_train]
    stride = 10 * len(mu_list)
    t = cfg.num_steps
    blocks = []
    for m1, m2 in mu_list:
        snaps = load_or_compute_snaps([m1, m2], grid, w0, cfg.dt,
                                      cfg.num_steps,
                                      snap_folder=cfg.snap_folder)
        blocks.append(ecsw_training_matrix_closure(
            grid, snaps[:, 3:t:stride], snaps[:, 0:t - 3:stride],
            decode, dec_jac, fit_y0, m1, m2, cfg.dt))
        del snaps
    c = np.vstack(blocks)
    weights = compute_ecsw_weights(c, grid, bc_w=bc_w, method=method,
                                   rel_err_thresh=1e-4)
    np.save(weights_path, weights)
    return weights


def run_with_retry(fn, mu, retries: int = 2, backoff_s: float = 180.0):
    """Run one benchmark point with crash recovery.

    The TPU worker in this environment occasionally crashes under
    sustained load ("TPU worker process crashed or restarted") and
    recovers after a few minutes; the reference has no failure handling
    at all (SURVEY.md §5). Retry after a backoff; on repeated failure
    return (None, None) so the driver records the gap and continues.
    """
    for attempt in range(retries + 1):
        try:
            return fn(mu)
        except Exception as e:  # noqa: BLE001 — driver must survive
            print(f"  attempt {attempt + 1} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}")
            if attempt == retries:
                return None, None
            print(f"  waiting {backoff_s:.0f}s for the worker to recover")
            time.sleep(backoff_s)


def run_point_subproc(script: str, mu, extra_args=(), retries: int = 2,
                      backoff_s: float = 180.0, timeout_s: float = 3600.0):
    """Run one runner CLI in a fresh subprocess and parse its report.

    Crash isolation for the regression drivers: when the axon TPU worker
    dies it vanishes from the parent's jax backend registry for good
    ("Backend 'axon' is not in the list of known backends") and every
    in-process retry is doomed — a fresh interpreter re-initializes the
    backend after it recovers. Parses the `report()` epilogue lines
    ("Elapsed <name> time: X s" / "Relative error: Y%").
    """
    import re
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(here, script),
           "--mu1", str(mu[0]), "--mu2", str(mu[1]), *extra_args]
    env = dict(os.environ)
    # a PYTHONPATH override must not drop the axon site dir: that's
    # where this image's sitecustomize (TPU backend registration at
    # interpreter start) lives — without it the child runs with NO
    # usable TPU backend and fails as "Backend 'axon' is not in the
    # list of known backends"
    site_dir = "/root/.axon_site"
    if os.path.isdir(site_dir) and \
            site_dir not in env.get("PYTHONPATH", site_dir):
        env["PYTHONPATH"] = env["PYTHONPATH"] + os.pathsep + site_dir
    if env.get("FDTPU_PLATFORM") == "cpu":
        # CPU-pinned children must not claim an axon tunnel session:
        # this image's sitecustomize calls axon register() at EVERY
        # interpreter start when PALLAS_AXON_POOL_IPS is set, and
        # concurrent sessions starve TPU-needing processes (whose
        # registration then fails with "Backend 'axon' is not in the
        # list of known backends"). Clearing the var skips registration
        # entirely, and JAX_PLATFORMS=cpu then takes effect normally.
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
    for attempt in range(retries + 1):
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=timeout_s, env=env)
            out = proc.stdout
            print(out[-2000:], end="")
            el = re.findall(r"Elapsed .* time: ([\d.e+-]+) s", out)
            err = re.findall(r"Relative error: ([\d.e+-]+)%", out)
            if proc.returncode == 0 and el and err:
                return float(el[-1]), float(err[-1])
            print(f"  attempt {attempt + 1} failed (rc={proc.returncode}); "
                  f"stderr tail: {proc.stderr[-500:]}")
        except subprocess.TimeoutExpired:
            print(f"  attempt {attempt + 1} timed out after {timeout_s}s")
        if attempt == retries:
            return None, None
        print(f"  waiting {backoff_s:.0f}s for the worker to recover")
        time.sleep(backoff_s)


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--mu1", type=float, default=5.19)
    p.add_argument("--mu2", type=float, default=0.026)
    p.add_argument("--num-cells", type=int, default=None)
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--f32", action="store_true",
                   help="run in float32 (faster on TPU, ~1e-7 accuracy)")
    class _SetPlatform(argparse.Action):
        def __call__(self, parser, ns, value, option_string=None):
            os.environ["FDTPU_PLATFORM"] = value
            setattr(ns, self.dest, value)

    p.add_argument("--platform", default=None, action=_SetPlatform,
                   help="pin the jax backend (e.g. cpu); sets "
                        "FDTPU_PLATFORM, honored by setup_jax")

    class _SetWarm(argparse.Action):
        def __call__(self, parser, ns, values, option_string=None):
            os.environ["FDTPU_WARM"] = "1"
            setattr(ns, self.dest, True)

    p.add_argument("--warm", nargs=0, default=False, action=_SetWarm,
                   help="warm-timing protocol: compile + run once "
                        "untimed, report the second execution's time")
    return p
