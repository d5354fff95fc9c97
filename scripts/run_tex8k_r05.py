"""Round-5 full-texture-scale run: fixed-view PSNR + real UV seams.

Re-runs the r04 composed 8K protocol (>= 3 frames, `--gen_tex
--tex_res 8192 --density 30`, 24 full-res views, 301-iteration dense
loop, frozen bake binning) with the two r4 verifier weaknesses closed
(VERDICT r4 items 6 + 7):

  1. QUALITY IS MEASURED ON A FIXED VIEW: the trainer now logs
     ``tex_psnr_fixed`` (view 0, eval-only, trajectory-neutral) next to
     the per-step random-view ``tex_psnr`` — consecutive rows are
     comparable, so convergence vs divergence is decidable on tracked
     frames. Asserted: frame-1 trend up, every frame's final fixed PSNR
     above a floor, and tracked frames' final fixed PSNR >= frame 1's
     (warm start + soft_color anchor must not lose quality).
  2. THE MESH HAS A REAL UV SEAM: the fixture's UV map splits into two
     islands (seam column vertices carry 2 uv coords — multiplicity 2,
     reference helpers.py:930-941 seam machinery; seam-aware
     densification helpers.py:436-467), and a SEAM-CONTINUITY check
     compares baked texel colors at matched positions across the
     islands against a same-separation interior control line.

Dataset (TPU, ~10 min):
  python scripts/fabricate_fast.py <root> 24 3 92 90 375 512 8 0.004 dense,seam
Run:
  python scripts/run_tex8k_r05.py <root> <out_root> [frames=3]
"""
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fixture layout constants (fabricate_dataset.py uv_seam branch)
ROWS, COLS = 92, 90
CM = COLS // 2
U_LEFT_EDGE = 0.46  # left island's seam-side u
U_RIGHT_EDGE = 0.54  # right island's seam-side u
V_LO, V_HI = 0.05, 0.95


def sample_line(tex, u, n=400):
    """Bilinear-sample tex along the vertical line at texture-u ``u``."""
    res = tex.shape[0]
    vs = np.linspace(V_LO + 0.01, V_HI - 0.01, n)
    x = u * (res - 1)
    y = res - vs * (res - 1) - 1  # process_uv V flip
    x0 = int(np.floor(x))
    fx = x - x0
    y0 = np.floor(y).astype(int)
    fy = y - y0
    t = tex.astype(np.float32)
    c = (
        t[y0, x0] * (1 - fx) * (1 - fy)[:, None]
        + t[y0, x0 + 1] * fx * (1 - fy)[:, None]
        + t[y0 + 1, x0] * (1 - fx) * fy[:, None]
        + t[y0 + 1, x0 + 1] * fx * fy[:, None]
    )
    return c / 255.0


def seam_check(tex, inset_texels=3.0):
    """Color continuity across the UV seam vs an interior control.

    Samples the two islands' seam-side edges (inset a few texels so no
    background bleeds into the bilinear taps) and, as control, an
    interior line pair with the SAME texel separation deep inside the
    left island. Pairs where either side is background (unbaked) are
    dropped. Returns the stats dict; the caller asserts."""
    res = tex.shape[0]
    du = inset_texels / (res - 1)
    a = sample_line(tex, U_LEFT_EDGE - du)
    b = sample_line(tex, U_RIGHT_EDGE + du)
    lit = (a.sum(1) > 0.02) & (b.sum(1) > 0.02)
    seam_d = np.abs(a - b).mean(1)[lit]
    # control: same separation in texels, interior of the left island
    u0 = 0.25
    ca = sample_line(tex, u0 - du)
    cb = sample_line(tex, u0 + du)
    clit = (ca.sum(1) > 0.02) & (cb.sum(1) > 0.02)
    ctrl_d = np.abs(ca - cb).mean(1)[clit]
    return {
        "seam_pairs": int(lit.sum()),
        "seam_mean": float(seam_d.mean()) if lit.any() else None,
        "seam_p95": float(np.percentile(seam_d, 95)) if lit.any() else None,
        "ctrl_pairs": int(clit.sum()),
        "ctrl_mean": float(ctrl_d.mean()) if clit.any() else None,
        "ctrl_p95": float(np.percentile(ctrl_d, 95)) if clit.any() else None,
    }


def main():
    sys.path.insert(0, REPO)
    args = [a for a in sys.argv[1:] if a != "--verify-only"]
    verify_only = "--verify-only" in sys.argv
    root, out_root = args[0], args[1]
    frames = int(args[2]) if len(args) > 2 else 3
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    from topo4d_tpu.config import Config

    cfg = Config()
    cfg.raster.max_span = 2  # see run_tex8k_r04.py rationale
    # all-view PSNR at every dense log row: the saturation-curve
    # evidence for the reduced tracked-frame schedule (VERDICT r4 item 5)
    cfg.texture.allview_eval = True
    cfg_path = os.path.join(out_root, "tex8k_config.json")
    os.makedirs(out_root, exist_ok=True)
    with open(cfg_path, "w") as fh:
        fh.write(cfg.to_json())
    cmd = [
        sys.executable, "-m", "topo4d_tpu.cli",
        "--config", cfg_path,
        "-id", root, "-did", root + "_dense", "-s", "seq01",
        "-od", out_root, "-e", "tex8k",
        "-fn", str(frames), "-ion", "7000", "-on", "1100",
        "-t", "-tr", "8192", "-dn", "30", "-dr", "8", "-ddr", "1",
        "-don", "301", "-dlf", "100", "-lf", "500", "-cf", "1",
        "--backend", "pallas", "--no_mask", "--views_per_step", "0",
    ]
    if not verify_only:  # --verify-only re-checks an existing output tree
        print("[tex8k-r5]", " ".join(cmd), flush=True)
        rc = subprocess.run(cmd, env=env, cwd=REPO)
        assert rc.returncode == 0, rc.returncode

    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None
    seq = os.path.join(out_root, "tex8k", "seq01")
    rows = [json.loads(l) for l in open(os.path.join(seq, "metrics.jsonl"))]
    report = {"frames": frames, "per_frame": []}
    fixed_last = {}
    for t in range(1, frames + 1):
        path = os.path.join(seq, "%06d" % t, "face.png")
        assert os.path.exists(path), path
        tex = np.asarray(Image.open(path))
        assert tex.shape[:2] == (8192, 8192), tex.shape
        covered = np.any(tex > 0, axis=-1)
        coverage = float(covered.mean())
        cstd = float(tex[covered].std())
        assert coverage > 0.5, (t, coverage)
        assert cstd > 10.0, (t, cstd)
        tex_rows = [
            r for r in rows
            if r.get("frame") == t - 1 and "tex_psnr_fixed" in r
        ]
        fixed = [r["tex_psnr_fixed"] for r in tex_rows]
        allview = [r.get("tex_psnr_allview") for r in tex_rows]
        rand = [r.get("tex_psnr") for r in tex_rows]
        assert len(fixed) >= 3, (t, len(fixed))
        # the fixed/all-view series are comparable row to row — assert
        # real trends. Calibration note: this fixture's GT is itself a
        # sparse-vertex-color render, so the dense fit's ceiling above
        # its interpolated-color init is inherently small (measured
        # +0.08 dB fixed-view on frame 1) — but it must be positive and
        # monotone; the r4 "trend" (13.7 -> 16.4 on random views) was
        # view variance, which this metric exists to remove.
        if t == 1:
            assert fixed[-1] >= fixed[0] + 0.05, (t, fixed)
            assert allview[-1] >= allview[0], (t, allview)
        assert all(
            b >= a - 0.02 for a, b in zip(fixed, fixed[1:])
        ), (t, fixed)  # monotone non-decreasing (small eval jitter slack)
        assert fixed[-1] > 12.5, (t, fixed)
        fixed_last[t] = fixed[-1]
        # directive-5 saturation evidence: all-view PSNR at the log row
        # nearest iteration 150 vs the final row
        its = [r["iter"] for r in tex_rows]
        mid_i = min(range(len(its)), key=lambda i: abs(its[i] - 150))
        sat_gap = allview[-1] - allview[mid_i]
        seam = seam_check(tex)
        assert seam["seam_pairs"] > 100, seam
        # seam no worse than an equally-separated interior line (3x
        # slack for edge-texel rasterization asymmetry) and small in
        # absolute terms
        assert seam["seam_mean"] <= max(3.0 * seam["ctrl_mean"], 0.05), seam
        assert seam["seam_p95"] <= max(3.0 * seam["ctrl_p95"], 0.10), seam
        summary = next(
            r for r in rows if r.get("summary") and r["frame"] == t - 1
        )
        report["per_frame"].append({
            "frame": t,
            "coverage": coverage,
            "covered_std": cstd,
            "tex_psnr_fixed_first": fixed[0],
            "tex_psnr_fixed_last": fixed[-1],
            "tex_psnr_allview_first": allview[0],
            "tex_psnr_allview_last": allview[-1],
            "allview_gap_after_iter150": sat_gap,
            "tex_psnr_rand_first": rand[0],
            "tex_psnr_rand_last": rand[-1],
            "seam": seam,
            "wall_s": summary["frame_seconds"],
        })
    # tracked frames must end at least as good as frame 1 on the SAME
    # fixed view (warm start + anchor must not lose quality)
    for t in range(2, frames + 1):
        assert fixed_last[t] >= fixed_last[1] - 0.1, (t, fixed_last)

    timings = json.load(open(os.path.join(seq, "timings.json")))
    report["timings"] = {
        k: v for k, v in timings.items()
        if k in ("geometry", "texture", "export", "checkpoint")
    }
    cfgj = json.load(open(os.path.join(seq, "config.json")))
    report["tex_res"] = cfgj["texture"]["tex_res"]
    report["density"] = cfgj["texture"]["density"]

    dst = os.path.join(REPO, "docs", "runs", "r05_tex8k_seam")
    os.makedirs(dst, exist_ok=True)
    for art in ("metrics.jsonl", "timings.json", "config.json"):
        shutil.copy(os.path.join(seq, art), os.path.join(dst, art))
    tex = Image.open(os.path.join(seq, "%06d" % frames, "face.png"))
    tex.resize((512, 512), Image.LANCZOS).save(
        os.path.join(dst, "face_8k_downsampled_512.png")
    )
    arr = np.asarray(tex)
    # committable evidence: a 512-px crop CENTERED ON THE SEAM
    res = arr.shape[0]
    xs_seam = int(0.5 * (U_LEFT_EDGE + U_RIGHT_EDGE) * (res - 1))
    y0 = res // 2 - 256
    x0 = int(np.clip(xs_seam - 256, 0, res - 512))
    Image.fromarray(arr[y0:y0 + 512, x0:x0 + 512]).save(
        os.path.join(dst, "face_8k_seam_crop_512.png")
    )
    with open(os.path.join(dst, "verification.json"), "w") as fh:
        json.dump(report, fh, indent=2, default=float)
    print(json.dumps(report, indent=2, default=float))
    print("[tex8k-r5] artifacts copied to docs/runs/r05_tex8k_seam/")


if __name__ == "__main__":
    main()
