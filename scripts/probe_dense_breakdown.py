"""Dense 4K texture-phase cost breakdown on the TPU.

Times the production scanned frozen-binning texture step plus its
components (pack gather, blend fwd+bwd, photometric loss) separately, so
the optimization ledger can attribute the per-iteration cost. Marginal
timing: min over repeated executions of scan(5) and scan(25); the
marginal (t25 - t5) / 20 cancels the tunnel's fixed sync cost. State is
carried through every run (distinct inputs defeat the tunnel's result
cache — see bench.py).
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

from topo4d_tpu.core.camera import make_camera
from topo4d_tpu.opt.adam import adam_init
from topo4d_tpu.rasterizer.pallas import (
    binning_for,
    render_gaussians_pallas,
)
from topo4d_tpu.texture.dense import (
    TextureState,
    dense_rendervars,
    make_texture_multi_step,
)

T0 = time.perf_counter()


def note(msg):
    print(f"[+{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def marginal(run, n_small=5, n_big=25, reps=3):
    """min-over-reps two-point marginal of run(iters) seconds."""
    run(n_small)  # compile + first (slow) execution
    run(n_big)
    t_small = min(run(n_small) for _ in range(reps))
    t_big = min(run(n_big) for _ in range(reps))
    return (t_big - t_small) / (n_big - n_small)


def main(n=300_000, w=3840, h=2160):
    rng = np.random.default_rng(0)
    # head-like footprint: ~1000 x 1700 px of the 4K frame (~27% of the
    # tile canvas), matching a framed head rather than full-frame spread
    pts = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    pts *= np.array([0.06, 0.1, 0.01], np.float32)
    params_np = {
        "dense_rgb_colors": rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32),
        "dense_unnorm_rotations": np.tile(
            np.array([1, 0, 0, 0], np.float32), (n, 1)
        ),
        "dense_logit_opacities": np.full((n, 1), 3.0, np.float32),
        "dense_log_scales": np.full((n, 3), np.log(0.0015), np.float32),
    }
    k = np.array(
        [[2.2 * w, 0, w / 2], [0, 2.2 * w, h / 2], [0, 0, 1]], np.float32
    )
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    cam = make_camera(k, w2c, w, h)
    cams = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], cam)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        opt = adam_init(params_np)
    params = {k2: jnp.asarray(v) for k2, v in params_np.items()}
    opt = jax.tree_util.tree_map(jnp.asarray, opt)
    state = TextureState(params=params, opt=opt)

    means = jnp.asarray(pts)
    gt = jnp.zeros((3, h, w), jnp.float32)
    anchor = jnp.asarray(params_np["dense_rgb_colors"])
    lr = {k2: jnp.asarray(0.002, jnp.float32) for k2 in params_np}
    weights = {"im": jnp.asarray(1.0), "soft_color": jnp.asarray(0.02)}

    rv = dense_rendervars(params, means)
    binning = sync_value(binning_for(rv, cam, max_span=2))
    nonempty = int(jnp.sum(binning.tile_count > 0))
    entries = int(jnp.sum(binning.entry_valid))
    note(
        f"binning ready: {entries} entries, {nonempty}/"
        f"{binning.tile_count.shape[0]} tiles non-empty"
    )

    # ---- production: scanned frozen-binning texture step ----------------
    multi = make_texture_multi_step(
        lambda rv, c, b: render_gaussians_pallas(
            rv, c, max_span=2, chunk=128, binning=b
        )
    )
    images = gt[None]
    binnings = jax.tree_util.tree_map(lambda x: x[None], binning)

    def run_scan(iters):
        nonlocal state
        vids = jnp.zeros((iters,), jnp.int32)
        t0 = time.perf_counter()
        state, losses = multi(
            state, means, images, cams, vids, anchor, (), lr, weights,
            binnings,
        )
        sync_value(losses)
        return time.perf_counter() - t0

    dt = marginal(run_scan)
    note(
        f"texture step (scan+frozen bin): {dt * 1e3:8.2f} ms "
        f"({dt * 301:.1f} s / 301-iter frame)"
    )

    # ---- split-pack: static frame-constant rows in the binning ----------
    binning_s = sync_value(
        binning_for(rv, cam, max_span=2, with_static=True)
    )
    binnings_s = jax.tree_util.tree_map(lambda x: x[None], binning_s)

    def run_scan_s(iters):
        nonlocal state
        vids = jnp.zeros((iters,), jnp.int32)
        t0 = time.perf_counter()
        state, losses = multi(
            state, means, images, cams, vids, anchor, (), lr, weights,
            binnings_s,
        )
        sync_value(losses)
        return time.perf_counter() - t0

    dt_s = marginal(run_scan_s)
    note(
        f"texture step (split-pack):      {dt_s * 1e3:8.2f} ms "
        f"({dt_s * 301:.1f} s / 301-iter frame)"
    )

    # ---- compact non-empty-tile mode ------------------------------------
    cap = int(-(-int(nonempty * 1.25) // 2048) * 2048)
    cap = min(cap, binning.tile_count.shape[0])
    multi_c = make_texture_multi_step(
        lambda rv, c, b: render_gaussians_pallas(
            rv, c, max_span=2, chunk=128, binning=b, tile_capacity=cap
        )
    )

    def run_scan_c(iters):
        nonlocal state
        vids = jnp.zeros((iters,), jnp.int32)
        t0 = time.perf_counter()
        state, losses = multi_c(
            state, means, images, cams, vids, anchor, (), lr, weights,
            binnings,
        )
        sync_value(losses)
        return time.perf_counter() - t0

    dt_c = marginal(run_scan_c)
    note(
        f"texture step (compact cap={cap}): {dt_c * 1e3:8.2f} ms "
        f"({dt_c * 301:.1f} s / 301-iter frame)"
    )

    # ---- render-only fwd+bwd (pack + blend + untile + sum) --------------
    def render_loss(params):
        rv = dense_rendervars(params, means)
        out = render_gaussians_pallas(
            rv, cam, max_span=2, chunk=128, binning=binning
        )
        return jnp.sum(out.image) * 1e-6

    @jax.jit
    def render_vg(params):
        val, grads = jax.value_and_grad(render_loss)(params)
        return val, jax.tree_util.tree_map(
            lambda p, g: p - 1e-12 * g, params, grads
        )

    p2 = params

    def run_render(iters):
        nonlocal p2
        t0 = time.perf_counter()
        for _ in range(iters):
            val, p2 = render_vg(p2)
        sync_value(val)
        return time.perf_counter() - t0

    dt_r = marginal(run_render)
    note(f"render fwd+bwd only:            {dt_r * 1e3:8.2f} ms")

    # ---- photometric loss fwd+bwd at 4K ---------------------------------
    from topo4d_tpu.losses.image import photometric_loss

    @jax.jit
    def photo_vg(im):
        val, g = jax.value_and_grad(
            lambda x: jax.checkpoint(photometric_loss)(x, gt)
        )(im)
        return val, im - 1e-12 * g

    im0 = jnp.zeros((3, h, w), jnp.float32) + 0.5

    def run_photo(iters):
        nonlocal im0
        t0 = time.perf_counter()
        for _ in range(iters):
            val, im0 = photo_vg(im0)
        sync_value(val)
        return time.perf_counter() - t0

    dt_p = marginal(run_photo)
    note(f"photometric(L1+SSIM) fwd+bwd:   {dt_p * 1e3:8.2f} ms")

    # ---- pack gather only (fwd + bwd scatter) ---------------------------
    from topo4d_tpu.core.gaussian import project_gaussians
    from topo4d_tpu.rasterizer.tiles import pack_with_binning

    proj = sync_value(project_gaussians(rv, cam))

    @jax.jit
    def pack_vg(colors):
        def f(c):
            bins = pack_with_binning(proj, c, rv.opacities, binning, 128)
            return jnp.sum(bins.packed) * 1e-6

        val, g = jax.value_and_grad(f)(colors)
        return val, colors - 1e-12 * g

    c0 = rv.colors

    def run_pack(iters):
        nonlocal c0
        t0 = time.perf_counter()
        for _ in range(iters):
            val, c0 = pack_vg(c0)
        sync_value(val)
        return time.perf_counter() - t0

    dt_k = marginal(run_pack)
    note(f"pack gather fwd+bwd:            {dt_k * 1e3:8.2f} ms")

    @jax.jit
    def pack_vg_s(colors):
        def f(c):
            bins = pack_with_binning(proj, c, rv.opacities, binning_s, 128)
            return jnp.sum(bins.packed) * 1e-6

        val, g = jax.value_and_grad(f)(colors)
        return val, colors - 1e-12 * g

    c0 = rv.colors

    def run_pack_s(iters):
        nonlocal c0
        t0 = time.perf_counter()
        for _ in range(iters):
            val, c0 = pack_vg_s(c0)
        sync_value(val)
        return time.perf_counter() - t0

    dt_ks = marginal(run_pack_s)
    note(f"pack gather fwd+bwd (split):    {dt_ks * 1e3:8.2f} ms")

    note(
        "summary: step={:.1f} render={:.1f} photo={:.1f} pack={:.1f} "
        "other={:.1f} (ms)".format(
            dt * 1e3, dt_r * 1e3, dt_p * 1e3, dt_k * 1e3,
            (dt - dt_r - dt_p) * 1e3,
        )
    )


if __name__ == "__main__":
    main()
