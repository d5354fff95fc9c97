"""Bisect the temporal + flatten loss costs on the chip."""
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
    dt = (tb - ta) / (i2 - i1) * 1e3
    print(f"{name:46s} {dt:8.3f} ms", flush=True)
    return out


def main():
    from topo4d_tpu.core.quaternion import (
        quat_conjugate,
        quat_mult,
        quat_normalize,
        quat_to_rotmat,
    )
    from topo4d_tpu.losses.neighbors import gather_neighbors

    n, k = 8280, 9
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (n, k), dtype=np.int32))
    inv = jnp.asarray(rng.integers(0, k, (n, k), dtype=np.int32))
    w = jnp.asarray(rng.uniform(0, 1, (n, k)).astype(np.float32))

    marginal("gather x[idx] (N,K,3) fwd", jax.jit(lambda x: x[idx]), x)
    marginal("gather fwd+bwd (autodiff scatter)", jax.jit(jax.grad(
        lambda x: jnp.sum(x[idx]))), x)
    marginal("gather fwd+bwd (inv-slot)", jax.jit(jax.grad(
        lambda x: jnp.sum(gather_neighbors(x, idx, inv)))), x)

    qn = quat_normalize(q)
    marginal("quat_mult+rotmat fwd", jax.jit(
        lambda q: quat_to_rotmat(quat_mult(q, quat_conjugate(q)))), qn)

    rot = jax.block_until_ready(jax.jit(quat_to_rotmat)(qn))
    off = jnp.asarray(rng.normal(size=(n, k, 3)).astype(np.float32))
    marginal("einsum nji,nkj->nki fwd", jax.jit(
        lambda r, o: jnp.einsum("nji,nkj->nki", r, o)), rot, off)
    marginal("einsum fwd+bwd", jax.jit(jax.grad(
        lambda r, o: jnp.sum(jnp.einsum("nji,nkj->nki", r, o)), argnums=(0, 1))),
        rot, off)

    prev = jnp.asarray(rng.normal(size=(n, k, 3)).astype(np.float32))
    from topo4d_tpu.losses.image import weighted_l2_loss_v2
    marginal("weighted_l2_v2 fwd+bwd", jax.jit(jax.grad(
        lambda a: weighted_l2_loss_v2(a, prev, w))), off)

    # full temporal
    from topo4d_tpu.losses.temporal import TemporalPriors, rigid_rot_iso_losses
    pri = TemporalPriors(
        prev_inv_rot=quat_conjugate(qn).T,
        prev_offset=jnp.transpose(prev, (2, 1, 0)),
    )
    nd = jnp.asarray(rng.uniform(0.1, 1, (k, n)).astype(np.float32))
    idxT = idx.T
    wT = w.T

    def temporal(x, q):
        t = rigid_rot_iso_losses(x, quat_normalize(q), pri, idxT, nd,
                                 wT, wT, wT)
        return 3.5 * t["rigid"] + 20.0 * t["rot"] + 20.0 * t["iso"]

    marginal("temporal full fwd+bwd", jax.jit(jax.grad(
        temporal, argnums=(0, 1))), x, q)

    # flatten bits
    from topo4d_tpu.losses.flatten import (
        DihedralQuadruples,
        dihedral_cos,
    )
    es = 16000
    quads = DihedralQuadruples(
        v0=rng.integers(0, n, es).astype(np.int32),
        v1=rng.integers(0, n, es).astype(np.int32),
        v2=rng.integers(0, n, es).astype(np.int32),
        v3=rng.integers(0, n, es).astype(np.int32),
    )
    marginal("dihedral_cos 16k fwd+bwd", jax.jit(jax.grad(
        lambda v: jnp.sum(dihedral_cos(v, quads)))), x)


if __name__ == "__main__":
    main()
