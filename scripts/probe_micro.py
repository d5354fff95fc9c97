"""Micro-probes: where do project/bin actually spend time on the chip."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:8.3f} ms", flush=True)
    return out


def main():
    n = 8280
    e = n * 4
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 700 * n, e, dtype=np.int32))
    data = [jnp.asarray(rng.normal(size=e).astype(np.float32))
            for _ in range(10)]

    f1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
    timeit("sort 33k key only", f1, key)

    f2 = jax.jit(lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1))
    timeit("sort 33k key+2", f2, key, data[0], data[1])

    f3 = jax.jit(lambda k, *d: jax.lax.sort((k,) + d, num_keys=1))
    timeit("sort 33k key+10", f3, key, *data)

    # gather alternative: sort (key, gid) then gather a (N, 16) field table
    table = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    gid = jnp.asarray(rng.integers(0, n, e, dtype=np.int32))

    def sort_gather(k, g, tab):
        sk, sg = jax.lax.sort((k, g), num_keys=1)
        return tab[sg]

    timeit("sort key+gid, row-gather (E,16)", jax.jit(sort_gather),
           key, gid, table)

    ss = jax.jit(
        lambda s: jnp.searchsorted(s, jnp.arange(768, dtype=jnp.int32),
                                   side="left")
    )
    skey = jnp.sort(key)
    timeit("searchsorted 768 in 33k", ss, skey)

    # batched tiny matmul vs unrolled scalar ops
    a = jnp.asarray(rng.normal(size=(n, 3, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, 3, 3)).astype(np.float32))
    timeit("batched (N,3,3)@(N,3,3)", jax.jit(lambda a, b: a @ b), a, b)

    cols_a = [jnp.asarray(rng.normal(size=n).astype(np.float32))
              for _ in range(9)]
    cols_b = [jnp.asarray(rng.normal(size=n).astype(np.float32))
              for _ in range(9)]

    def unrolled(ca, cb):
        out = []
        for i in range(3):
            for j in range(3):
                acc = 0.0
                for k in range(3):
                    acc = acc + ca[3 * i + k] * cb[3 * k + j]
                out.append(acc)
        return out

    timeit("unrolled 9x (N,) matmul", jax.jit(unrolled), cols_a, cols_b)

    from topo4d_tpu.core.gaussian import build_cov3d
    q = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.5, 1, (n, 3)).astype(np.float32))
    timeit("build_cov3d (quat->R, RSS^TR^T)", jax.jit(build_cov3d), q, s)


if __name__ == "__main__":
    main()
