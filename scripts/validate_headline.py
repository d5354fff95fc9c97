"""Headline-scale validation: batched-scanned vs parity, on the TPU.

VERDICT r2 item 4: the bench headline (batched all-views scanned mode
with frozen binnings, track_rebin_freq=25) was optimizer-validated only
on a tiny CPU fixture. This runs THREE full geometry-phase fits at
reference scale (8,280 Gaussians, 24 views, 375x512, the reference
iteration schedule) on the same fabricated dataset:

  A. headline  — views_per_step=0, track_rebin_freq=25 (the bench mode)
  B. batched0  — views_per_step=0, track_rebin_freq=0 (fresh binnings:
                 isolates the frozen-binning staleness from the batched
                 update rule)
  C. parity    — views_per_step=1, track_rebin_freq=0 (the reference's
                 one-random-view-per-step semantics)

and compares (1) per-frame final geometry losses A vs C under the
test_batched_parity criterion (batched <= 1.2x parity — the modes are
different optimizers, not different implementations), and (2) per-frame
exported means3D drift A vs B (pure frozen-binning effect) over >= 3
tracked frames.

Usage: python scripts/validate_headline.py <dataset_root> <out_root>
       [frames=4] — expects a fabricated reference-scale dataset
       (scripts/fabricate_dataset.py ... 92 90 375 512 2).
Writes <out_root>/headline_validation.json + a markdown table to stdout.
"""
import json
import os
import subprocess
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = {
    "headline": {"views_per_step": 0, "rebin": 25},
    "batched0": {"views_per_step": 0, "rebin": 0},
    "parity": {"views_per_step": 1, "rebin": 0},
}


def run_mode(name, spec, root, out_root, frames):
    out = os.path.join(out_root, name)
    cmd = [
        sys.executable, "-m", "topo4d_tpu.cli",
        "-id", root, "-s", "seq01", "-od", out, "-e", "val",
        "-fn", str(frames), "-ion", "7000", "-on", "1100",
        "-lf", "500", "-cf", "50", "--backend", "pallas", "--no_mask",
        "-dr", "2",
        "--views_per_step", str(spec["views_per_step"]),
        "--track_rebin_freq", str(spec["rebin"]),
    ]
    print(f"[validate] {name}: {' '.join(cmd)}", flush=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t = subprocess.run(cmd, env=env, cwd=REPO)
    if t.returncode != 0:
        raise RuntimeError(f"{name} run failed rc={t.returncode}")
    seq = os.path.join(out, "val", "seq01")
    rows = [json.loads(l) for l in open(os.path.join(seq, "metrics.jsonl"))]
    npz = np.load(os.path.join(seq, "params.npz"))
    return rows, npz


def frame_finals(rows, key="loss_total"):
    """Last logged geometry loss per frame (frame -> value)."""
    out = {}
    for r in rows:
        if key in r and "iter" in r:
            out[r["frame"]] = r[key]
    return out


def main():
    root = sys.argv[1]
    out_root = sys.argv[2]
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    os.makedirs(out_root, exist_ok=True)

    results = {}
    for name, spec in MODES.items():
        rows, npz = run_mode(name, spec, root, out_root, frames)
        results[name] = {
            "finals": frame_finals(rows),
            "psnr": frame_finals(rows, "psnr"),
            "max_dmeans3d": {
                r["frame"]: r["max_dmeans3d"]
                for r in rows if r.get("summary")
            },
            "means": {
                k: np.asarray(v) for k, v in npz.items()
                if k == "means3D"
            },
        }

    report = {"frames": frames, "modes": {}}
    for name in MODES:
        report["modes"][name] = {
            "final_loss_per_frame": results[name]["finals"],
            "final_psnr_per_frame": results[name]["psnr"],
            "max_dmeans3d_per_frame": results[name]["max_dmeans3d"],
        }

    # criterion 1: headline within 1.2x of parity per frame
    # (test_batched_parity's basin criterion at reference scale)
    ok_parity = {}
    for t, lp in results["parity"]["finals"].items():
        lh = results["headline"]["finals"].get(t)
        ok_parity[t] = (lh is not None) and (lh <= 1.2 * lp)
    report["headline_within_1p2x_parity"] = ok_parity

    # criterion 2: frozen-binning drift — exported means3D headline vs
    # batched0 per frame (identical optimizer, only binning staleness)
    mh = results["headline"]["means"]["means3D"]
    mb = results["batched0"]["means"]["means3D"]
    drift = {}
    for t in range(min(mh.shape[0], mb.shape[0])):
        drift[t] = float(
            np.max(np.linalg.norm(mh[t] - mb[t], axis=-1))
        )
    report["frozen_binning_means_drift"] = drift

    with open(os.path.join(out_root, "headline_validation.json"), "w") as fh:
        json.dump(report, fh, indent=2, default=float)

    print("\n| frame | parity loss | batched0 loss | headline loss | "
          "headline<=1.2x parity | bin-drift max|dv| |")
    print("|---|---|---|---|---|---|")
    for t in sorted(results["parity"]["finals"]):
        print(
            f"| {t} | {results['parity']['finals'][t]:.5f} "
            f"| {results['batched0']['finals'].get(t, float('nan')):.5f} "
            f"| {results['headline']['finals'].get(t, float('nan')):.5f} "
            f"| {ok_parity.get(t)} "
            f"| {drift.get(t, float('nan')):.2e} |"
        )
    print(f"\nreport: {os.path.join(out_root, 'headline_validation.json')}")


if __name__ == "__main__":
    main()
