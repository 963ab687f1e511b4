"""Claims-vs-artifacts acceptance gate (VERDICT r3 #8, hardened r5).

Re-derives every RESULTS.md error table from the shipped/regenerated
rom_results*.npz archives and checks each recorded row against the
claimed accuracy band for its model family. This is the final stage of
scripts/regen_all.sh — after a clean-checkout regeneration, one command
answers "do the artifacts still support the README/RESULTS claims?" —
and scripts/record_tpu_rows.py re-runs it after every recording batch
(VERDICT r4 #2: a row can no longer land after the gate section was
written).

Bands are per EXACT model family (r5: the longest-prefix fallback let a
95-mode band silently apply to a 150-mode engine row, ADVICE r4), in
relative-% error, intentionally wider than the recorded digits: the
gate catches regressions (NaNs, blown-up trajectories, missing rows,
swapped artifacts), not hardware timing noise. A recorded family with
no claim is a WARN, never a silent inherit. Wall-clock is checked only
for finiteness — the shared dev chip varies run-to-run.

Exit code 0 = PASS (every expected family present and in band).
--write-report refreshes the "Acceptance gate" section of RESULTS.md.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
         python scripts/check_claims.py [--write-report]
"""

import argparse
import os
import re
import sys

import numpy as np

# (archive, EXACT family) -> (err_lo_pct, err_hi_pct). Bands bracket the
# recorded values (RESULTS.md) with margin for re-randomized offline
# fits (rSVD seeds, FISTA screening, GP restarts). Engine-suffixed
# families (tensor/factored/pallas[_traj]) get their OWN rows even when
# numerically equal to the generic engine's, so a regression in one
# engine names that engine.
CLAIMS = {
    "rom_results.npz": {
        "fom": (0.0, 0.0),
        "prom": (0.8, 1.5),
        "prom_pallas": (0.8, 1.5),   # r5: f64 Gram reduction closes the
                                     # r4 1.9% f32 normal-eq gap
        "rnm": (0.7, 2.5),
        "pod_rbf_global": (1.3, 2.8),
        "pod_rbf_searched": (0.9, 4.0),
        "pod_rbf": (0.9, 6.2),       # reference-hardcoded (eps, k) row
    },
    "rom_results_hprom.npz": {
        "hprom": (0.9, 2.0),
        "hprom_tensor": (0.9, 2.0),
        "hprom_factored": (0.9, 2.0),
        "hprom_pallas": (0.9, 2.0),
        "hprom_pallas_traj": (0.9, 2.0),
        "hprom_ecm": (0.9, 1.8),
        "hprom_multilevel": (0.9, 2.0),
        "hprom_sequential": (1.0, 2.2),
        "hrnm": (0.8, 3.6),
        "hrnm_ecm": (0.8, 3.8),
        "pod_rbf_hprom": (1.4, 3.9),
        "pod_rbf_hprom_knn": (3.0, 5.2),
        "pod_rbf_hprom_knn_searched": (2.2, 3.9),
        "pod_gp_hprom": (1.0, 3.8),
        "pod_gp_hprom_pm": (0.8, 2.4),
    },
    "rom_results_ae.npz": {
        "ae_prom": (0.2, 0.9),
    },
    "rom_results_fine.npz": {
        "fom": (0.0, 0.0),
        "prom": (2.8, 3.9),
        "prom_pallas": (2.8, 3.9),
        "prom150": (1.9, 2.6),
        "prom_pallas150": (1.9, 2.6),
        "hprom": (3.2, 4.2),
        "hprom_factored": (3.2, 4.2),
        "hprom_pallas": (3.2, 4.2),
        "hprom_pallas_traj": (3.2, 4.2),
        # r5: 150-mode weight sets are re-randomized offline fits (rSVD
        # seed + device LH column ordering); rounds 3/4 recorded
        # 2.31-3.05% across two derivations. Band brackets both; the
        # per-derivation provenance lives in RESULTS.md.
        "hprom150": (2.1, 3.1),
        "hprom_factored150": (2.1, 3.1),
        "hprom_pallas150": (2.1, 3.1),
        "hprom_pallas_traj150": (2.1, 3.1),
        # fine closures, 10+140 split: the round-3 honest state is
        # 11-27% (RESULTS.md records the failure mode: mu-space data
        # starvation at this split).
        "pod_rbf_hprom": (1.5, 30.0),
        "pod_gp_hprom_pm": (1.5, 30.0),
        # 20-primary campaign on the mu-densified 25-trajectory fits
        # (VERDICT r4 #3/#4; record_tpu_rows --num-primary 20
        # --fit-suffix _dense): offline floor 1.63-1.73%, target at or
        # better than the linear 150-mode row.
        "pod_rbf_hprom_p20_dense": (1.5, 2.6),
        "pod_gp_hprom_pm_p20_dense": (1.5, 3.0),
    },
}

# families that MUST be present (>= 1 row) for the archive to pass;
# others are checked only if recorded
REQUIRED = {
    "rom_results.npz": ["prom", "rnm", "pod_rbf_global",
                        "pod_rbf_searched"],
    "rom_results_hprom.npz": ["hprom", "hprom_ecm", "hrnm", "hrnm_ecm",
                              "pod_rbf_hprom", "pod_gp_hprom",
                              "pod_gp_hprom_pm"],
    "rom_results_ae.npz": ["ae_prom"],
    "rom_results_fine.npz": ["prom", "hprom", "prom150", "hprom150"],
}

KEY_RE = re.compile(r"^(?P<fam>.+?)_(?P<mu1>\d+\.\d+)_(?P<mu2>\d+\.\d+)$")


def family_of(key):
    """Exact family of a row key, or None for non-row keys."""
    m = KEY_RE.match(key)
    return m.group("fam") if m else None


def band_for(archive, family):
    """(lo, hi) claimed band for an EXACT family, or None if unclaimed.

    Exported for scripts/record_tpu_rows.py's record-time check
    (VERDICT r4 #7): a row whose error is outside its family band fails
    the recording run at record time, not at the end of the chain.
    """
    return CLAIMS.get(os.path.basename(archive), {}).get(family)


def check_archive(archive, lines):
    """Append per-row check lines for one archive; return ok."""
    bands = CLAIMS[os.path.basename(archive)]
    ok = True
    if not os.path.exists(archive):
        lines.append(f"| {archive} | — | MISSING ARCHIVE | FAIL |")
        return False
    rows = dict(np.load(archive, allow_pickle=True))
    for key in sorted(rows):
        fam = family_of(key)
        if fam is None:
            continue
        elapsed, err = (float(rows[key][0]), float(rows[key][1]))
        if not np.isfinite(elapsed) or not np.isfinite(err):
            lines.append(f"| {archive} | {key} | non-finite | FAIL |")
            ok = False
            continue
        band = bands.get(fam)
        if band is None:
            lines.append(f"| {archive} | {key} | {err:.2f}% "
                         f"(no claim) | WARN |")
            continue
        lo, hi = band
        good = lo <= err <= hi
        ok &= good
        lines.append(
            f"| {archive} | {key} | {err:.2f}% in [{lo}, {hi}] "
            f"| {'PASS' if good else 'FAIL'} |")
    recorded_fams = {family_of(k) for k in rows}
    for fam in REQUIRED.get(os.path.basename(archive), []):
        if fam not in recorded_fams:
            lines.append(f"| {archive} | {fam}_* | required family "
                         f"absent | FAIL |")
            ok = False
    return ok


def check(write_report=False):
    lines, ok = [], True
    for archive in CLAIMS:
        ok &= check_archive(archive, lines)

    verdict = "PASS" if ok else "FAIL"
    print("| archive | row | check | result |")
    print("|---|---|---|---|")
    for ln in lines:
        print(ln)
    print(f"\nACCEPTANCE GATE: {verdict}")

    if write_report:
        import datetime

        stamp = datetime.date.today().isoformat()
        n_pass = sum("| PASS |" in ln for ln in lines)
        n_fail = sum("| FAIL |" in ln for ln in lines)
        n_warn = sum("| WARN |" in ln for ln in lines)
        block = (f"\n## Acceptance gate (scripts/check_claims.py)\n\n"
                 f"Last run {stamp}: **{verdict}** — {n_pass} rows in "
                 f"band, {n_fail} failures, {n_warn} unclaimed-row "
                 f"warnings. This section is MACHINE-GENERATED by "
                 f"`check_claims.py --write-report`\n"
                 f"(never hand-edited; ADVICE r4) and re-written by "
                 f"every `scripts/record_tpu_rows.py` batch.\n"
                 f"Regenerate + re-check everything with "
                 f"`bash scripts/regen_all.sh --with-fine-closures` "
                 f"(the gate is its final stage).\n")
        text = open("RESULTS.md").read()
        marker = "\n## Acceptance gate (scripts/check_claims.py)"
        if marker in text:
            text = text[: text.index(marker)]
        open("RESULTS.md", "w").write(text + block)
        print(f"RESULTS.md acceptance-gate section refreshed ({stamp})")
    return ok


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--write-report", action="store_true")
    a = p.parse_args()
    sys.exit(0 if check(a.write_report) else 1)
