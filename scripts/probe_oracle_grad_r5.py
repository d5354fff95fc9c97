"""Root-cause probe for the r4 on-TPU numerics-gate gradient failure.

BENCH_r04: pallas AND tiled parameter gradients diverge from the banded
oracle by 1.05 at p99.9 (worst 1.58) ON TPU ONLY (CPU: worst 6.3e-4, and
pallas==tiled on TPU to 4 digits) — the deviant leg is the oracle band
path as compiled on TPU (VERDICT r4 item 1).

This probe computes every gradient leg on the ambient backend and dumps
them plus forward knife-edge statistics to an npz:

  legs: pallas, tiled, oracle_band64, oracle_band64b (repeat),
        oracle_band32, oracle_remat (render_gaussians remat=True)

  knife stats (from the oracle forward, per pixel): margin of the
  cumulative transmittance to the 1e-4 termination threshold, count of
  0.99-clamped alphas, |power| minima, alpha margins to 1/255 — the
  discrete blending rules (forward.cu semantics) whose one-ulp flips are
  the prime suspect.

Run once on TPU, once with JAX_PLATFORMS=cpu, then:
  python scripts/probe_oracle_grad_r5.py compare a.npz b.npz
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.perf_counter()


def note(msg):
    print(f"[probe +{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


LEAVES = ("means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
          "log_scales")


def leaf_table(name, ga, gb):
    """Per-leaf error rows between two grad dicts (numpy)."""
    rows = {}
    for k in LEAVES:
        a, b = np.asarray(ga[k]), np.asarray(gb[k])
        denom = max(float(np.max(np.abs(b))), 1e-12)
        err = np.abs(a - b)
        flat = err.reshape(-1)
        top = np.argsort(flat)[-10:][::-1]
        rows[k] = dict(
            p999=float(np.percentile(err, 99.9)) / denom,
            mx=float(np.max(err)) / denom,
            denom=denom,
            nbig=int(np.sum(err > 0.01 * denom)),
            top_idx=top.copy(),
            top_err=(flat[top] / denom).copy(),
            nan=int(np.sum(~np.isfinite(a))),
        )
    return rows


def print_table(title, rows):
    print(f"--- {title}")
    for k, r in rows.items():
        print(
            f"  {k:20s} p99.9 {r['p999']:.3e}  max {r['mx']:.3e}  "
            f"denom {r['denom']:.3e}  n>1% {r['nbig']:5d}  nan {r['nan']}"
        )


def main():
    import os

    import jax

    if os.environ.get("TOPO4D_PROBE_CPU"):
        # the axon sitecustomize force-selects the tunneled TPU; env vars
        # alone don't stick (tests/conftest.py has the same workaround)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from topo4d_tpu.core.gaussian import activate_params, project_gaussians
    from topo4d_tpu.rasterizer import reference as ref
    from topo4d_tpu.rasterizer.pallas import render_gaussians_pallas
    from topo4d_tpu.rasterizer.reference import render_gaussians
    from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
    from topo4d_tpu.testing import make_head_fixture
    from topo4d_tpu.utils.profiling import sync_value

    backend = jax.devices()[0].platform
    note(f"backend: {backend}")
    params_np, cams, _ = make_head_fixture()
    cam0 = cams[0]
    h, w = cam0.height, cam0.width
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    interpret = backend == "cpu"

    rv0 = activate_params(params)
    gt = sync_value(
        render_gaussians_pallas(rv0, cam0, max_span=2, chunk=128,
                                interpret=interpret).image
    )
    note("gt rendered")
    target = jnp.clip(0.8 * gt + 0.05, 0.0, 1.0)
    bg = jnp.zeros(3, jnp.float32)

    out = {"backend": backend}

    def grads_of(render):
        def loss(params):
            rv = activate_params(params)
            o = render(rv)
            return jnp.sum(jnp.square(o.image - target))

        g = jax.grad(loss)(params)
        return {k: np.asarray(v) for k, v in g.items()
                if k in LEAVES}

    g_p = grads_of(lambda rv: render_gaussians_pallas(
        rv, cam0, max_span=2, chunk=128, interpret=interpret))
    note("pallas grads done")
    g_t = grads_of(lambda rv: render_gaussians_tiled(
        rv, cam0, max_span=2, capacity=1024))
    note("tiled grads done")

    # banded oracle exactly as bench.py:250-276
    row_block = 64

    def make_band_vg(rb):
        @jax.jit
        def oracle_band_vg(params, ys, target_rows):
            def loss(params):
                rv = activate_params(params)
                proj = project_gaussians(rv, cam0)
                order = ref.depth_sorted_order(proj)
                rx0, ry0, rx1, ry1, _, _ = ref.tile_rect(proj, w, h)
                rgb, _, _ = ref._render_rows(
                    ys, w,
                    proj.means2d[order], proj.conics[order],
                    rv.colors[order], proj.depths[order],
                    rv.opacities[order], proj.mask[order], bg,
                    (rx0[order], ry0[order], rx1[order], ry1[order]),
                )
                return jnp.sum(jnp.square(rgb - target_rows))

            return jax.grad(loss)(params)

        return oracle_band_vg

    def band_grads(rb):
        vg = make_band_vg(rb)
        g_o = None
        for y0 in range(0, h, rb):
            ys = jnp.arange(y0, y0 + rb)
            t_rows = jnp.transpose(target[:, y0:y0 + rb, :], (1, 2, 0))
            g_band = vg(params, ys, t_rows)
            g_o = g_band if g_o is None else jax.tree_util.tree_map(
                jnp.add, g_o, g_band)
        return {k: np.asarray(v) for k, v in g_o.items() if k in LEAVES}

    g_o64 = band_grads(64)
    note("oracle band64 grads done")
    g_o64b = band_grads(64)
    note("oracle band64 repeat done")
    g_o32 = band_grads(32)
    note("oracle band32 grads done")

    g_rm = grads_of(lambda rv: render_gaussians(rv, cam0, remat=True))
    note("oracle remat grads done")

    for nm, g in [("pallas", g_p), ("tiled", g_t), ("o64", g_o64),
                  ("o64b", g_o64b), ("o32", g_o32), ("remat", g_rm)]:
        for k, v in g.items():
            out[f"g_{nm}_{k}"] = v

    # pairwise tables
    pairs = [
        ("o64 vs o64b (determinism)", g_o64, g_o64b),
        ("o64 vs o32 (band size)", g_o64, g_o32),
        ("o64 vs remat (formulation)", g_o64, g_rm),
        ("tiled vs o64", g_t, g_o64),
        ("tiled vs remat", g_t, g_rm),
        ("pallas vs tiled", g_p, g_t),
        ("pallas vs o64", g_p, g_o64),
    ]
    for title, a, b in pairs:
        print_table(title, leaf_table(title, a, b))

    # knife-edge forward statistics from the oracle's own quantities:
    # recompute per-band alpha/t_incl (no grad) and measure margins to
    # the discrete rules (termination 1e-4, cutoff 1/255, clamp 0.99,
    # power<=0 — forward.cu semantics)
    from topo4d_tpu.core.gaussian import (
        ALPHA_MAX, ALPHA_MIN, TRANSMITTANCE_MIN,
    )

    proj = project_gaussians(rv0, cam0)
    order = ref.depth_sorted_order(proj)
    rx0, ry0, rx1, ry1, _, _ = ref.tile_rect(proj, w, h)
    margs = (proj.means2d[order], proj.conics[order], rv0.opacities[order],
             proj.mask[order],
             (rx0[order], ry0[order], rx1[order], ry1[order]))

    @jax.jit
    def band_stats(ys, means2d, conics, opacities, valid, rect):
        xs = jnp.arange(w, dtype=jnp.float32)
        pix = jnp.stack(
            jnp.broadcast_arrays(xs[None, :], ys[:, None].astype(jnp.float32)),
            axis=-1,
        ).reshape(-1, 2)
        alpha = ref._alpha_at_pixels(pix, means2d, conics, opacities, valid,
                                     rect)
        one_m = 1.0 - alpha
        t_incl = jnp.cumprod(one_m, axis=-1)
        active = alpha > 0.0
        # per-pixel minimum |t_incl - 1e-4| over ACTIVE entries (others
        # repeat the same value; restrict to where it changes)
        m_term = jnp.min(
            jnp.where(active, jnp.abs(t_incl - TRANSMITTANCE_MIN), 1.0),
            axis=-1,
        )
        n_clamp = jnp.sum(alpha >= ALPHA_MAX, axis=-1)
        m_cut = jnp.min(
            jnp.where(active, jnp.abs(alpha - ALPHA_MIN), 1.0), axis=-1
        )
        n_active = jnp.sum(active, axis=-1)
        return m_term, n_clamp, m_cut, n_active

    m_terms, n_clamps, m_cuts, n_actives = [], [], [], []
    for y0 in range(0, h, row_block):
        ys = jnp.arange(y0, y0 + row_block)
        mt, nc, mc, na = band_stats(ys, *margs[:4], margs[4])
        m_terms.append(np.asarray(mt))
        n_clamps.append(np.asarray(nc))
        m_cuts.append(np.asarray(mc))
        n_actives.append(np.asarray(na))
    m_term = np.concatenate(m_terms)
    n_clamp = np.concatenate(n_clamps)
    m_cut = np.concatenate(m_cuts)
    n_active = np.concatenate(n_actives)
    out["m_term"] = m_term
    out["n_clamp"] = n_clamp
    out["m_cut"] = m_cut
    out["n_active"] = n_active
    print("--- knife stats (all pixels)")
    for thr in (1e-12, 1e-10, 1e-8, 1e-6):
        print(f"  pixels with |T - 1e-4| < {thr:.0e}: "
              f"{int(np.sum(m_term < thr))}")
    for thr in (1e-12, 1e-10, 1e-8, 1e-6):
        print(f"  pixels with |alpha - 1/255| < {thr:.0e}: "
              f"{int(np.sum(m_cut < thr))}")
    print(f"  pixels with >=1 clamped alpha: {int(np.sum(n_clamp > 0))} "
          f"(max clamps/pixel {int(np.max(n_clamp))})")
    print(f"  active entries/pixel: mean {float(np.mean(n_active)):.1f} "
          f"max {int(np.max(n_active))}")

    fn = f"/tmp/probe_oracle_grad_{backend}.npz"
    np.savez_compressed(fn, **out)
    note(f"saved {fn}")


def compare(fa, fb):
    a = np.load(fa, allow_pickle=True)
    b = np.load(fb, allow_pickle=True)
    ba, bb = str(a["backend"]), str(b["backend"])
    for leg in ("pallas", "tiled", "o64", "o32", "remat"):
        ga = {k: a[f"g_{leg}_{k}"] for k in LEAVES}
        gb = {k: b[f"g_{leg}_{k}"] for k in LEAVES}
        print_table(f"{leg}: {ba} vs {bb}", leaf_table(leg, ga, gb))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "compare":
        compare(sys.argv[2], sys.argv[3])
    else:
        main()
