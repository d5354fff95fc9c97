"""Round-3 long-sequence run: 100 tracked frames, geometry phase.

VERDICT r2 "what's missing" item 2: the reference default is 800 frames;
the longest committed run was 6 (r2) / 22 (r3 e2e). This drives a
100-frame geometry-only fit in the batched headline mode
(track_rebin_freq=25) and verifies the long-horizon properties the
short runs cannot: no drift blow-up of the frozen-binning
approximation, temporal-loss stability, bounded per-frame displacement
tracking a continuously moving target, and byte-stable topology across
the full sequence.

Usage: python scripts/run_long_r03.py <dataset_root> <out_root> [frames]
(dataset: scripts/fabricate_dataset.py <root> 24 100 92 90 375 512 2
0.004 dense_tree=False)
"""
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    root = sys.argv[1]
    out = sys.argv[2]
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [
        sys.executable, "-m", "topo4d_tpu.cli",
        "-id", root, "-s", "seq01", "-od", out, "-e", "long",
        "-fn", str(frames), "-ion", "7000", "-on", "1100",
        "-lf", "500", "-cf", "10", "--backend", "pallas", "--no_mask",
        "-dr", "2", "--views_per_step", "0",
    ]
    print("[long]", " ".join(cmd), flush=True)
    rc = subprocess.run(cmd, env=env, cwd=REPO)
    assert rc.returncode == 0, rc.returncode

    seq = os.path.join(out, "long", "seq01")
    rows = [json.loads(l) for l in open(os.path.join(seq, "metrics.jsonl"))]
    summaries = {r["frame"]: r for r in rows if r.get("summary")}
    tracked = sorted(t for t in summaries if t >= 1)
    assert len(tracked) >= frames - 1, len(tracked)

    disp = [summaries[t]["max_dmeans3d"] for t in tracked]
    # finals per frame: last logged loss rows
    finals = {}
    for r in rows:
        if "loss_total" in r and "iter" in r:
            finals[r["frame"]] = r
    losses = [finals[t]["loss_total"] for t in tracked]
    iso = [finals[t].get("loss_iso", 0.0) for t in tracked]
    rigid = [finals[t].get("loss_rigid", 0.0) for t in tracked]

    def seg(xs, a, b):
        return sum(xs[a:b]) / max(b - a, 1)

    n = len(tracked)
    report = {
        "frames": frames,
        "tracked": n,
        "max_dmeans3d": {
            "min": min(disp), "max": max(disp),
            "first10_mean": seg(disp, 0, 10),
            "last10_mean": seg(disp, n - 10, n),
        },
        "final_loss_total": {
            "first10_mean": seg(losses, 0, 10),
            "last10_mean": seg(losses, n - 10, n),
            "max": max(losses),
        },
        "final_loss_iso": {
            "first10_mean": seg(iso, 0, 10),
            "last10_mean": seg(iso, n - 10, n),
            "max": max(iso),
        },
        "final_loss_rigid": {
            "first10_mean": seg(rigid, 0, 10),
            "last10_mean": seg(rigid, n - 10, n),
            "max": max(rigid),
        },
    }
    # long-horizon health: displacement bounded (tracks the 4e-3 target
    # motion, does not ratchet), iso/rigid do not trend upward
    assert report["max_dmeans3d"]["max"] < 0.05, report["max_dmeans3d"]
    assert (
        report["final_loss_iso"]["last10_mean"]
        < 5 * max(report["final_loss_iso"]["first10_mean"], 1e-4)
    ), report["final_loss_iso"]

    def flines(t):
        path = os.path.join(seq, "%06d" % t, "face.obj")
        return [l for l in open(path) if l.startswith("f ")]

    f1 = flines(1)
    for t in range(2, frames + 1):
        assert flines(t) == f1, f"topology drift at frame {t}"
    report["topology_byte_stable"] = True

    dst = os.path.join(REPO, "docs", "runs", "r03_long")
    os.makedirs(dst, exist_ok=True)
    for name in ("metrics.jsonl", "timings.json", "config.json"):
        shutil.copy(os.path.join(seq, name), os.path.join(dst, name))
    with open(os.path.join(dst, "verification.json"), "w") as fh:
        json.dump(report, fh, indent=2, default=float)
    print(json.dumps(report, indent=2, default=float))
    print("[long] artifacts copied to docs/runs/r03_long/")


if __name__ == "__main__":
    main()
