"""Record the AE-LSPG ROM rows (rom_results_ae.npz) at the reference's
TestAE scale (50^2, latent 10) — the reproducible form of the ad-hoc
round-2 recording (commit 26854ca). Trains the autoencoder if
ae_model_50x50.msgpack is missing (runners/run_ae_prom.py), then solves
the three canonical test points on the CPU backend (the 50^2 problem is
host-sized; reference TestAE/run_ae_prom.py role).

Run under: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/record_ae_rows.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(ROOT, "runners"))
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

os.environ.setdefault("FDTPU_PLATFORM", "cpu")

TEST_POINTS = [(5.19, 0.026), (4.56, 0.019), (4.75, 0.02)]
OUT = os.path.join(ROOT, "rom_results_ae.npz")


def main():
    import run_ae_prom

    redo = "--redo" in sys.argv
    rows = dict(np.load(OUT, allow_pickle=True)) if os.path.exists(OUT) \
        else {}
    for mu1, mu2 in TEST_POINTS:
        key = f"ae_prom_{mu1}_{mu2}"
        if key in rows and np.all(np.isfinite(rows[key])) and not redo:
            print(f"[skip] {key} = {rows[key]}")
            continue
        elapsed, rel = run_ae_prom.main(mu1, mu2, num_cells=50)
        rows[key] = np.array([elapsed, rel])
        np.savez(OUT, **rows)
        print(f"[record] {key} = [{elapsed:.4g} s, {rel:.4g}%]",
              flush=True)
        from check_claims import band_for
        band = band_for(OUT, "ae_prom")
        if band and not (band[0] <= rel <= band[1]):
            print(f"!!! BAND VIOLATION {key}: {rel}% outside "
                  f"{band}", flush=True)
            sys.exit(1)
    print("AE ROWS DONE")


if __name__ == "__main__":
    main()
