"""Bisect the fused flatten loss cost."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def marginal(name, fn, *args, i1=25, i2=225):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(i1):
        out = fn(*args)
    jax.block_until_ready(out)
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(i2):
        out = fn(*args)
    jax.block_until_ready(out)
    tb = time.perf_counter() - t0
    print(f"{name:44s} {(tb - ta) / (i2 - i1) * 1e3:8.3f} ms", flush=True)
    return out


def main():
    from topo4d_tpu.config import Config
    from topo4d_tpu.pipeline.scene import build_scene
    from topo4d_tpu.testing import (
        make_grid_mesh,
        make_synthetic_regions,
    )
    from topo4d_tpu.topology.obj_io import MeshObj
    from topo4d_tpu.losses.flatten import (
        build_fused_flatten,
        build_fused_umbrella,
        dihedral_cos,
        fused_flatten_loss,
        fused_umbrella_loss,
    )
    from topo4d_tpu.opt.step import (
        HARD_FLATTEN_KEYS,
        SOFT_FLATTEN_KEYS,
        UMBRELLA_KEYS,
    )

    rows, cols = 92, 90
    verts, faces = make_grid_mesh(rows, cols, extent=0.5)
    n = verts.shape[0]
    uvs = np.stack(
        np.meshgrid(np.linspace(0.05, 0.95, cols),
                    np.linspace(0.05, 0.95, rows), indexing="xy"),
        -1,
    ).reshape(-1, 2).astype(np.float32)
    mesh = MeshObj(vertices=verts, uvs=uvs, faces=faces,
                   uv_faces=[list(f) for f in faces])
    regions = make_synthetic_regions(n, faces)
    cfg = Config()
    params_np, statics = build_scene(mesh, regions, cfg, num_views=2)

    fused = build_fused_flatten(
        statics.quadruples, HARD_FLATTEN_KEYS, SOFT_FLATTEN_KEYS)
    fused_umb = build_fused_umbrella(statics.umbrellas, UMBRELLA_KEYS)
    print(f"E total={fused.quads.v0.shape[0]} hard={fused.num_hard}",
          flush=True)

    x = jnp.asarray(params_np["means3D"])
    weights = {k: jnp.asarray(1e-3) for k in
               list(HARD_FLATTEN_KEYS) + list(SOFT_FLATTEN_KEYS)
               + list(UMBRELLA_KEYS)}
    cos0 = jax.block_until_ready(dihedral_cos(x, fused.quads))[
        fused.num_hard:]

    marginal("dihedral_cos fwd", jax.jit(
        lambda v: jnp.sum(dihedral_cos(v, fused.quads))), x)
    marginal("dihedral_cos fwd+bwd", jax.jit(jax.grad(
        lambda v: jnp.sum(dihedral_cos(v, fused.quads)))), x)

    e = int(fused.quads.v0.shape[0])
    ep = -(-e // 128) * 128
    idx = np.zeros(4 * ep, np.int32)
    for j, f in enumerate((fused.quads.v0, fused.quads.v1,
                           fused.quads.v2, fused.quads.v3)):
        idx[j * ep: j * ep + e] = f
    idxj = jnp.asarray(idx)
    marginal("combined gather only fwd", jax.jit(
        lambda v: jnp.sum(v[idxj])), x)
    marginal("combined gather fwd+bwd", jax.jit(jax.grad(
        lambda v: jnp.sum(v[idxj] ** 2))), x)

    marginal("fused_flatten fwd+bwd", jax.jit(jax.grad(
        lambda v: fused_flatten_loss(v, fused, weights,
                                     soft_cos_init=cos0)[0])), x)
    if fused_umb is not None:
        marginal("fused_umbrella fwd+bwd", jax.jit(jax.grad(
            lambda v: fused_umbrella_loss(v, fused_umb, weights))), x)


if __name__ == "__main__":
    main()
