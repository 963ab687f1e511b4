"""Render result plots from saved artifacts (role of the reference's
plot_snapshots_with_speedup_and_errors.py, plot_2d_burgers.py and the
midline-slice plots): FOM-vs-ROM midline slices for saved snapshot files
and speedup/error bars from rom_results*.npz."""

import argparse
import glob
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from common import default_config, make_problem, setup_jax  # noqa: E402


def plot_speedups(results_file: str, out: str,
                  fom_file: str = "rom_results.npz"):
    data = dict(np.load(results_file))
    # keys: "<model>_<mu1>_<mu2>" -> [elapsed, rel_err_pct]
    foms = {k.split("_", 1)[1]: v[0] for k, v in data.items()
            if k.startswith("fom_")}
    # the hprom results file has no FOM baselines of its own — pull them
    # from the main results file
    if os.path.exists(fom_file) and fom_file != results_file:
        for k, v in dict(np.load(fom_file)).items():
            if k.startswith("fom_"):
                foms.setdefault(k.split("_", 1)[1], v[0])
    models = sorted({k.split("_")[0] for k in data} - {"fom"})
    mus = sorted({k.split("_", 1)[1] for k in data if not
                  k.startswith("fom_")})
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    width = 0.8 / max(len(models), 1)
    for i, m in enumerate(models):
        xs, speedups, errs = [], [], []
        for j, mu in enumerate(mus):
            key = f"{m}_{mu}"
            if key in data and mu in foms and data[key][0] > 0:
                xs.append(j + i * width)
                speedups.append(foms[mu] / data[key][0])
                errs.append(data[key][1])
        ax1.bar(xs, speedups, width=width, label=m)
        ax2.bar(xs, errs, width=width, label=m)
    ax1.set_ylabel("speedup vs FOM")
    ax1.set_xticks(range(len(mus)), mus, rotation=20)
    ax1.axhline(1.0, color="gray", lw=0.8, ls="--")
    ax2.set_ylabel("relative error (%)")
    ax2.set_xticks(range(len(mus)), mus, rotation=20)
    ax1.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out, dpi=200)
    print(f"saved {out}")


def plot_slices(num_cells, num_steps, out_prefix: str):
    from finitedifference_tpu.snapshots import param_to_snap_fn
    from finitedifference_tpu.utils.plotting import plot_snaps

    cfg = default_config(num_cells, num_steps)
    grid, w0 = make_problem(cfg)
    for rom_file in sorted(glob.glob("*_snaps_mu1_*.npy")):
        # parse mu from "<prefix>_snaps_mu1_X.XX_mu2_Y.YYY.npy"
        stem = os.path.splitext(rom_file)[0]
        parts = stem.split("_")
        mu1 = float(parts[parts.index("mu1") + 1])
        mu2 = float(parts[parts.index("mu2") + 1])
        # find the matching cached FOM (exact float formatting may differ)
        cands = glob.glob(os.path.join(cfg.snap_folder, "*.npy"))
        hdm_file = None
        for c in cands:
            name = os.path.basename(c)
            try:
                m1 = float(name.split("+")[0].split("_")[1])
                m2 = float(name.split("+")[1].split("_")[1].replace(
                    ".npy", ""))
            except (IndexError, ValueError):
                continue
            if abs(m1 - mu1) < 5e-3 and abs(m2 - mu2) < 5e-4:
                hdm_file = c
                break
        if hdm_file is None:
            continue
        hdm = np.load(hdm_file)
        rom = np.load(rom_file)
        steps_to_plot = range(0, rom.shape[1], max(rom.shape[1] // 5, 1))
        fig, ax1, ax2 = plot_snaps(grid, hdm, steps_to_plot, label="HDM")
        plot_snaps(grid, rom, steps_to_plot, label=stem.split("_snaps")[0],
                   color="blue", linewidth=1, fig_ax=(fig, ax1, ax2))
        ax1.legend(fontsize=8)
        fig.tight_layout()
        out = f"{out_prefix}{stem}.png"
        fig.savefig(out, dpi=200)
        plt.close(fig)
        print(f"saved {out}")


def main(results=("rom_results.npz", "rom_results_hprom.npz"),
         num_cells=None, num_steps=None, slices=True):
    setup_jax()
    for rf in results:
        if os.path.exists(rf):
            plot_speedups(rf, rf.replace(".npz", "_speedup.png"))
    if slices:
        plot_slices(num_cells, num_steps, "slice_")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-cells", type=int, default=None)
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--no-slices", action="store_true")
    a = p.parse_args()
    main(num_cells=a.num_cells, num_steps=a.num_steps,
         slices=not a.no_slices)
