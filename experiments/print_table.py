"""Print the full Table-I reproduction and the repo-vs-reference parity
table from the .npz results on disk.

Counterpart of the reference's ``paper_plots_tables/print_rmse_table.py``
(14 single-chirp + 5 harmonic columns, RMSE x10 mean+-std / median / min
/ #NaN), plus a side-by-side comparison against the reference code's own
regenerated results (``experiments/run_reference_regen.py``) on the same
paired measurement data.

Usage:
    python experiments/print_table.py [--results ./results] [--markdown]
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np

# Reference column order (print_rmse_table.py:14-16 and :93-96); repo
# file-name stems.
SINGLE = ["hilbert", "spectrogram", "poly", "anf",
          "lascala_ekfs", "lascala_ghfs", "fastf0nls", "fhc", "kpt",
          "ekfs", "ghfs", "ckfs", "cd_ekfs", "cd_ghfs"]
HARMONIC = ["harmonic_fastf0nls", "harmonic_fhc", "harmonic_kpt",
            "harmonic_ekfs", "harmonic_ckfs"]
MAGS = ["const", "damped", "random"]


def _stats(path):
    if not os.path.exists(path):
        return None
    r = np.load(path)["rmse"] * 10.0
    ok = r[np.isfinite(r)]
    if ok.size == 0:
        return dict(mean=np.nan, std=np.nan, median=np.nan, mn=np.nan,
                    nan=int(np.sum(~np.isfinite(r))), n=len(r))
    return dict(mean=float(np.mean(ok)), std=float(np.std(ok)),
                median=float(np.median(ok)), mn=float(np.min(ok)),
                nan=int(np.sum(~np.isfinite(r))), n=len(r))


def print_block(methods, results_dir, title, markdown=False):
    print(f"\n## {title}" if markdown else f"\n=== {title} ===")
    for mag in MAGS:
        if markdown:
            print(f"\n**magnitude: {mag}** (RMSE x10)\n")
            print("| method | mean+-std | median | min | #NaN |")
            print("|---|---|---|---|---|")
        else:
            print(f"\n-- magnitude: {mag} (RMSE x10) --")
            print(f"{'method':22s} {'mean+-std':>18s} {'median':>8s} "
                  f"{'min':>8s} {'#NaN':>5s}")
        for m in methods:
            s = _stats(os.path.join(results_dir, f"{m}_{mag}.npz"))
            if s is None:
                row = (m, "MISSING", "", "", "")
            else:
                row = (m, f"{s['mean']:.3f}+-{s['std']:.3f}",
                       f"{s['median']:.3f}", f"{s['mn']:.3f}",
                       f"{s['nan']}")
            if markdown:
                print(f"| {row[0]} | {row[1]} | {row[2]} | {row[3]} "
                      f"| {row[4]} |")
            else:
                print(f"{row[0]:22s} {row[1]:>18s} {row[2]:>8s} "
                      f"{row[3]:>8s} {row[4]:>5s}")


def print_parity(results_dir, ref_dir, markdown=False):
    title = "Parity: this framework (TPU f32) vs reference code (CPU f64), same paired data"
    print(f"\n## {title}" if markdown else f"\n=== {title} ===")
    if markdown:
        print("\n| method | mag | ours mean / median / #NaN | "
              "reference mean / median / #NaN |")
        print("|---|---|---|---|")
    methods = sorted(set(
        f.rsplit("_", 1)[0] for f in os.listdir(ref_dir)
        if f.endswith(".npz"))) if os.path.isdir(ref_dir) else []
    for m in methods:
        for mag in MAGS:
            ours = _stats(os.path.join(results_dir, f"{m}_{mag}.npz"))
            ref = _stats(os.path.join(ref_dir, f"{m}_{mag}.npz"))
            if ours is None or ref is None:
                continue
            o = f"{ours['mean']:.3f} / {ours['median']:.3f} / {ours['nan']}"
            r = f"{ref['mean']:.3f} / {ref['median']:.3f} / {ref['nan']}"
            if markdown:
                print(f"| {m} | {mag} | {o} | {r} |")
            else:
                print(f"{m:16s} {mag:7s} ours {o:>24s}   ref {r:>24s}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="./results")
    ap.add_argument("--reference", default="./results/reference")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    print_block(SINGLE, args.results,
                "Table I, single chirp (14 methods)", args.markdown)
    print_block(HARMONIC, args.results,
                "Table I, harmonic chirp (5 methods)", args.markdown)
    print_parity(args.results, args.reference, args.markdown)


if __name__ == "__main__":
    main()
