"""SSIM+L1 cost at 4K: banded-matmul vs shift-and-add window conv.

VERDICT r2 item 1: the dense-phase ledger claimed SSIM+L1 at 46.5 ms is
"near its f32 roofline (~570 GFLOP)". The arithmetic behind that number:
the 128-block banded matmul spends 3*128 MACs per output element per
pass for an 11-tap window — 2*3*128/11 = 70x the algorithmic FLOPs. A
shift-and-add form (11 shifted slices * taps, fused by XLA into one VPU
pass) costs the algorithmic ~16 GFLOP fwd and is bandwidth-bound:
15 stacked channels * 8.3 Mpix * 4 B * (read+write) * 2 passes ~ 2 GB
-> ~2.5 ms fwd at 819 GB/s, vs ~4 ms for the banded form's 192 GFLOP at
~50 TFLOP/s f32 IF the MXU ran at peak. This probe measures both, fwd
and value_and_grad under jax.checkpoint (exactly how the dense texture
loss runs), with carried state against the tunnel's result cache.
"""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.utils.profiling import sync_value

from topo4d_tpu.losses.image import (
    _gaussian_1d,
    _window_conv_banded,
    l1_loss,
)

T0 = time.perf_counter()


def note(msg):
    print(f"[+{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def marginal(run, n_small=5, n_big=25, reps=3):
    run(n_small)
    run(n_big)
    t_small = min(run(n_small) for _ in range(reps))
    t_big = min(run(n_big) for _ in range(reps))
    return (t_big - t_small) / (n_big - n_small)


# ---------------------------------------------------------------- shift form
def _shift_pass(x, axis, window_size=11, sigma=1.5):
    g = _gaussian_1d(window_size, sigma)
    half = window_size // 2
    pads = [(0, 0)] * x.ndim
    pads[axis] = (half, half)
    xp = jnp.pad(x, pads)
    n = x.shape[axis]
    out = None
    for k in range(window_size):
        sl = jax.lax.slice_in_dim(xp, k, k + n, axis=axis)
        term = float(g[k]) * sl
        out = term if out is None else out + term
    return out


def _window_conv_shift(img, window_size=11, sigma=1.5):
    out = _shift_pass(img, 1, window_size, sigma)
    return _shift_pass(out, 2, window_size, sigma)


def _ssim_from_conv(conv_fn, img1, img2, window_size=11, sigma=1.5):
    c = img1.shape[0]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0
    )
    conv = conv_fn(stacked, window_size, sigma)
    mu1 = conv[0:c]
    mu2 = conv[c : 2 * c]
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = conv[2 * c : 3 * c] - mu1_sq
    sigma2_sq = conv[3 * c : 4 * c] - mu2_sq
    sigma12 = conv[4 * c : 5 * c] - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def main(w=3840, h=2160):
    # tunnel compiles run ~8-16 min each today; "quick" measures only the
    # production quantity (fwd+bwd under remat) — banded vs shift at 4K,
    # shift at geometry res. Full mode adds fwd-only + value agreement
    # (agreement at 4K already recorded: banded 0.4639820 vs shift
    # 0.4649625, delta 9.8e-4 — the banded einsums' DEFAULT-precision
    # bf16 MXU inputs).
    quick = "full" not in sys.argv
    if "stack24" in sys.argv:
        # the batched geometry mode's photometric over all 24 views as
        # ONE stacked-channel loss (mathematically identical to the
        # per-view mean) — does the conv overhead amortize?
        note("==== stacked 24 views x 3ch @ 512x375 ====")
        run_res(512, 375, quick=True, variants_sel=("shift", "pallas"),
                channels=72)
        return
    sel = ("banded", "shift", "pallas")
    if "pallas_only" in sys.argv:
        sel = ("pallas",)
    run_res(w, h, quick=quick, variants_sel=sel)
    note("==== 512x375 ====")
    run_res(512, 375, quick=quick,
            variants_sel=("pallas",) if "pallas_only" in sys.argv
            else ("shift", "pallas"))


def run_res(w, h, quick=False, variants_sel=("banded", "shift"),
            channels=3):
    rng = np.random.default_rng(0)
    gt = jnp.asarray(
        rng.uniform(0, 1, (channels, h, w)).astype(np.float32)
    )
    im0 = jnp.asarray(
        rng.uniform(0, 1, (channels, h, w)).astype(np.float32)
    )

    def photom(fn):
        def loss(im, gt):
            return 0.8 * l1_loss(im, gt) + 0.2 * (1.0 - fn(im, gt))

        return loss

    from topo4d_tpu.losses.blur_pallas import gauss_blur_pallas

    variants = {
        "banded": photom(
            lambda a, b: _ssim_from_conv(_window_conv_banded, a, b)
        ),
        "shift": photom(
            lambda a, b: _ssim_from_conv(_window_conv_shift, a, b)
        ),
        "pallas": photom(
            lambda a, b: _ssim_from_conv(
                lambda x, ws, s: gauss_blur_pallas(x, ws, s), a, b
            )
        ),
    }
    variants = {k: v for k, v in variants.items() if k in variants_sel}
    import functools

    if not quick:
        # numerical agreement (same coefficients, different assoc.)
        note("compiling banded fwd...")
        v_banded = float(jax.jit(variants["banded"])(im0, gt))
        note("compiling shift fwd...")
        v_shift = float(jax.jit(variants["shift"])(im0, gt))
        note(f"values: banded {v_banded:.7f} shift {v_shift:.7f} "
             f"delta {abs(v_banded - v_shift):.2e}")
        # on TPU the banded einsums run at DEFAULT matmul precision (bf16
        # MXU inputs) — ~1e-3 drift vs the full-f32 VPU shift form (which
        # matches the torch reference); on CPU both agree to 2e-9
        assert abs(v_banded - v_shift) < 2e-3

    if "noremat" in sys.argv and "pallas" in variants:
        # without jax.checkpoint: the blur kernel's custom VJP saves no
        # residuals, so remat's re-forward may be pure overhead now
        variants = {"pallas_noremat": variants["pallas"]}

    for name, loss in variants.items():
        if not quick:
            @functools.partial(jax.jit, static_argnums=(2,))
            def fwd_n(im, gt, steps, loss=loss):
                def body(carry, _):
                    v = loss(carry, gt)
                    return carry * (1.0 + 1e-12 * v), v

                out, vs = jax.lax.scan(body, im, None, length=steps)
                return out, vs

            im = im0
            note(f"compiling {name} scan fwd...")

            def run_fwd(iters):
                nonlocal im
                t0 = time.perf_counter()
                im, vs = fwd_n(im, gt, iters)
                sync_value(vs)
                return time.perf_counter() - t0

            dt = marginal(run_fwd)
            note(f"{name:7s} fwd:      {dt * 1e3:7.2f} ms")

        # fwd+bwd with remat, like the dense loss
        if name.endswith("noremat"):
            vg = jax.value_and_grad(loss)
        else:
            vg = jax.value_and_grad(jax.checkpoint(loss))

        @functools.partial(jax.jit, static_argnums=(2,))
        def vg_n(im, gt, steps, vg=vg):
            def body(carry, _):
                v, g = vg(carry, gt)
                return carry - 1e-12 * g, v

            out, vs = jax.lax.scan(body, im, None, length=steps)
            return out, vs

        im = im0
        note(f"compiling {name} scan fwd+bwd...")

        def run_vg(iters):
            nonlocal im
            t0 = time.perf_counter()
            im, vs = vg_n(im, gt, iters)
            sync_value(vs)
            return time.perf_counter() - t0

        dt = marginal(run_vg)
        note(f"{name:7s} fwd+bwd:  {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
