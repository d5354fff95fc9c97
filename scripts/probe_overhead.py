"""Isolate the fixed per-dispatch overhead seen in probe_stages."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from topo4d_tpu.core.gaussian import activate_params
from topo4d_tpu.testing import make_head_fixture


def timeit(name, fn, *args, iters=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:46s} {dt:8.3f} ms", flush=True)
    return out


def main():
    params_np, cams, _ = make_head_fixture()
    cam = cams[0]
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    rv = activate_params(params)
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.normal(size=(8280, 3)).astype(np.float32))
    w33 = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
    tiny = jnp.ones(8)

    timeit("tiny x+1", jax.jit(lambda x: x + 1.0), tiny)
    timeit("x3 @ w (args)", jax.jit(lambda x, w: x @ w), x3, w33)
    timeit("x3 @ w (closure)", jax.jit(lambda x: x @ w33), x3)

    w2c = cam.w2c

    def f_closure(x):
        return x @ w2c[:3, :3].T + w2c[:3, 3]

    timeit("view xform, cam closure", jax.jit(f_closure), x3)

    def f_arg(x, m):
        return x @ m[:3, :3].T + m[:3, 3]

    timeit("view xform, cam arg", jax.jit(f_arg), x3, w2c)

    def f_rv(rv):
        return rv.means3d @ w2c[:3, :3].T + w2c[:3, 3]

    timeit("view xform, rv pytree arg", jax.jit(f_rv), rv)

    timeit("sum only output", jax.jit(
        lambda x: jnp.sum(x @ w33)), x3)

    # many small fused ops, one output
    def chain(x):
        y = x
        for _ in range(40):
            y = y * 1.0001 + 0.001
        return y

    timeit("40-op elementwise chain (8280,3)", jax.jit(chain), x3)

    def chain1(x):
        y = x
        for _ in range(40):
            y = y * 1.0001 + 0.001
        return y

    xflat = x3.reshape(-1)
    timeit("40-op elementwise chain (24840,)", jax.jit(chain1), xflat)

    timeit("iters=200 x3 @ w (args)", jax.jit(lambda x, w: x @ w),
           x3, w33, iters=200)


if __name__ == "__main__":
    main()
