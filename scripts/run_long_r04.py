"""Round-4 long-sequence run: the reference-default 800 frames, with a
headline-vs-batched0 exported-vertex drift bound (VERDICT r3 items 2+6).

Drives TWO full geometry-phase fits of the same fabricated 800-frame
sequence (reference train.py:767 default horizon) in the batched
all-views mode:

  A. headline — track_rebin_freq=25 (frozen-binning scan segments, the
     bench headline mode)
  B. batched0 — track_rebin_freq=0 (fresh binning every render)

The two trajectories differ ONLY in binning freshness (the batched mode
consumes all views every step, so the view schedule is deterministic and
identical), which makes the per-frame exported-OBJ vertex distance the
isolated long-horizon cost of the frozen-binning approximation — the
deliverable is the mesh, so the bound is stated on exported vertices,
not on losses (r03_headline measured 1.6e-4 -> 3.7e-3 over 3 frames;
this protocol extends it to the full horizon).

Per-run assertions (tightened vs r3 per ADVICE):
  - displacement bounded: max_dmeans3d < 3x the target's per-frame
    motion, and last-10 mean <= 1.5x first-10 mean (no ratchet)
  - iso stability: last-10 mean < 5x first-10 mean
  - topology byte-stable across all exported frames
Cross-run: the drift curve is recorded per frame; the loose hard bound
(< 5x per-frame motion) guards blow-up, and the saturation statistics
(windowed means over the sequence) are written for the README to state
the measured bound.

Usage: python scripts/run_long_r04.py <dataset_root> <out_root>
       [frames=800] [motion=0.004] [skip_modes=] [batched0_frames=frames]
(dataset: scripts/fabricate_fast.py <root> 24 800 92 90 375 512 2 0.004)

``batched0_frames`` < frames runs the comparison trajectory over a
prefix of the horizon (the drift curve then covers that prefix) while
the headline run and its verification keep the full horizon.
"""
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = {"headline": 25, "batched0": 0}


def run_mode(name, rebin, root, out_root, frames):
    out = os.path.join(out_root, name)
    cmd = [
        sys.executable, "-m", "topo4d_tpu.cli",
        "-id", root, "-s", "seq01", "-od", out, "-e", "long",
        "-fn", str(frames), "-ion", "7000", "-on", "1100",
        "-lf", "500", "-cf", "10", "--backend", "pallas", "--no_mask",
        "-dr", "2", "--views_per_step", "0",
        "--track_rebin_freq", str(rebin),
    ]
    print(f"[long800] {name}: {' '.join(cmd)}", flush=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    rc = subprocess.run(cmd, env=env, cwd=REPO)
    assert rc.returncode == 0, (name, rc.returncode)
    return os.path.join(out, "long", "seq01")


def load_metrics(seq):
    rows = [json.loads(l) for l in open(os.path.join(seq, "metrics.jsonl"))]
    summaries = {r["frame"]: r for r in rows if r.get("summary")}
    finals = {}
    for r in rows:
        if "loss_total" in r and "iter" in r:
            finals[r["frame"]] = r
    return summaries, finals


def verify_run(name, seq, frames, motion):
    summaries, finals = load_metrics(seq)
    tracked = sorted(t for t in summaries if t >= 1)
    assert len(tracked) >= frames - 1, (name, len(tracked))
    disp = [summaries[t]["max_dmeans3d"] for t in tracked]
    losses = [finals[t]["loss_total"] for t in tracked]
    iso = [finals[t].get("loss_iso", 0.0) for t in tracked]
    rigid = [finals[t].get("loss_rigid", 0.0) for t in tracked]
    walls = [summaries[t]["frame_seconds"] for t in tracked]
    n = len(tracked)

    def seg(xs, a, b):
        return float(sum(xs[a:b]) / max(b - a, 1))

    report = {
        "frames": frames, "tracked": n,
        "max_dmeans3d": {
            "min": min(disp), "max": max(disp),
            "first10_mean": seg(disp, 0, 10),
            "last10_mean": seg(disp, n - 10, n),
        },
        "final_loss_total": {
            "first10_mean": seg(losses, 0, 10),
            "last10_mean": seg(losses, n - 10, n), "max": max(losses),
        },
        "final_loss_iso": {
            "first10_mean": seg(iso, 0, 10),
            "last10_mean": seg(iso, n - 10, n), "max": max(iso),
        },
        "final_loss_rigid": {
            "first10_mean": seg(rigid, 0, 10),
            "last10_mean": seg(rigid, n - 10, n), "max": max(rigid),
        },
        "wall_s": {
            "median": float(np.median(walls)),
            "mean": float(np.mean(walls)),
        },
    }
    # tightened long-horizon checks (ADVICE r3): displacement must track
    # the known target motion, not merely stay under a loose cap.
    # Failures are RECORDED (the artifacts still get written/copied) and
    # raised collectively at the end of main().
    fails = []
    if not report["max_dmeans3d"]["max"] < 3 * motion:
        fails.append("displacement_max")
    if not (
        report["max_dmeans3d"]["last10_mean"]
        <= 1.5 * report["max_dmeans3d"]["first10_mean"]
    ):
        fails.append("displacement_ratchet")
    if not (
        report["final_loss_iso"]["last10_mean"]
        < 5 * max(report["final_loss_iso"]["first10_mean"], 1e-4)
    ):
        fails.append("iso_trend")
    f1 = topo_lines(seq, 1)
    for t in range(2, frames + 1):
        if topo_lines(seq, t) != f1:
            fails.append(f"topology_drift_frame_{t}")
            break
    report["topology_byte_stable"] = not any(
        f.startswith("topology") for f in fails
    )
    report["failed_checks"] = fails
    return report


def topo_lines(seq, t):
    path = os.path.join(seq, "%06d" % t, "face.obj")
    return [l for l in open(path) if l.startswith("f ")]


def obj_vertices(seq, t):
    path = os.path.join(seq, "%06d" % t, "face.obj")
    vs = [
        [float(x) for x in l.split()[1:4]]
        for l in open(path) if l.startswith("v ")
    ]
    return np.asarray(vs, np.float64)


def main():
    root, out_root = sys.argv[1], sys.argv[2]
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    motion = float(sys.argv[4]) if len(sys.argv) > 4 else 0.004
    skip = set((sys.argv[5] if len(sys.argv) > 5 else "").split(","))
    b0_frames = int(sys.argv[6]) if len(sys.argv) > 6 else frames
    mode_frames = {"headline": frames, "batched0": b0_frames}

    seqs = {}
    for name, rebin in MODES.items():
        if name in skip:
            seqs[name] = os.path.join(out_root, name, "long", "seq01")
            continue
        seqs[name] = run_mode(name, rebin, root, out_root, mode_frames[name])

    report = {
        name: verify_run(name, seqs[name], mode_frames[name], motion)
        for name in MODES
    }

    # headline-vs-batched0 exported-vertex drift, per frame. Three
    # curves: per-frame MAX over vertices (dominated by a small cluster
    # of underconstrained vertices that settle into different stable
    # basins between any two optimizer variants), per-frame P99 (the
    # mesh-at-large bound), and the outlier count (vertices beyond 5x
    # the per-frame target motion).
    nf = min(frames, b0_frames)
    d_max, d_p99, d_med, n_out = [], [], [], []
    for t in range(1, nf + 1):
        va = obj_vertices(seqs["headline"], t)
        vb = obj_vertices(seqs["batched0"], t)
        dv = np.linalg.norm(va - vb, axis=1)
        d_max.append(float(dv.max()))
        d_p99.append(float(np.percentile(dv, 99)))
        d_med.append(float(np.median(dv)))
        n_out.append(int((dv > 5 * motion).sum()))
    d = np.asarray(d_max)
    win = max(nf // 8, 1)
    windowed = [
        float(np.mean(d[i: i + win])) for i in range(0, nf, win)
    ]
    nverts = obj_vertices(seqs["headline"], 1).shape[0]
    dr = {
        "per_frame_max": float(d.max()),
        "argmax_frame": int(d.argmax()) + 1,
        "p99_max": float(max(d_p99)),
        "median_max": float(max(d_med)),
        "outliers_final": n_out[-1],
        "outliers_mid": n_out[nf // 2],
        "num_vertices": int(nverts),
        "windowed_means": windowed,
        "window": win,
        "last_window_over_three_quarters": float(
            windowed[-1] / max(windowed[max(len(windowed) * 3 // 4 - 1, 0)],
                               1e-12)
        ),
    }
    report["vertex_drift_headline_vs_batched0"] = dr
    # Bounds (directive r3#6): the MESH AT LARGE must stay within a few
    # frame-motions of the exact-binning trajectory (p99), the basin-
    # flip cluster must stay tiny and must not grow, and the max curve
    # must SATURATE (no terminal acceleration). The raw max is recorded
    # but not bounded: a handful of bistable vertices flip basins
    # between ANY two optimizer variants.
    fails = []
    if not dr["p99_max"] < 3 * motion:
        fails.append("drift_p99")
    if not dr["outliers_final"] <= max(10, int(0.005 * nverts)):
        fails.append("drift_outlier_count")
    if not dr["outliers_final"] <= 1.5 * max(dr["outliers_mid"], 4):
        fails.append("drift_outlier_growth")
    if not dr["last_window_over_three_quarters"] <= 1.1:
        fails.append("drift_saturation")
    if fails:
        dr["failed"] = fails

    dst = os.path.join(REPO, "docs", "runs", "r04_long800")
    os.makedirs(dst, exist_ok=True)
    for name in MODES:
        for art in ("metrics.jsonl", "timings.json", "config.json"):
            shutil.copy(
                os.path.join(seqs[name], art),
                os.path.join(dst, f"{name}_{art}"),
            )
    with open(os.path.join(dst, "drift_per_frame.json"), "w") as fh:
        json.dump({"max": d_max, "p99": d_p99, "median": d_med,
                   "outliers": n_out}, fh)
    with open(os.path.join(dst, "verification.json"), "w") as fh:
        json.dump(report, fh, indent=2, default=float)
    print(json.dumps(report, indent=2, default=float))
    print("[long800] artifacts copied to docs/runs/r04_long800/")
    all_fails = [
        f"{m}:{f}" for m in MODES for f in report[m].get("failed_checks", [])
    ]
    all_fails += report["vertex_drift_headline_vs_batched0"].get(
        "failed", [])
    assert not all_fails, all_fails


if __name__ == "__main__":
    main()
