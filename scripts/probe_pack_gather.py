"""Dense split-pack gather floor probe (docs/PERFORMANCE.md headroom #1).

Measures the BARE cost of the per-step packed gather at the dense 4K
texture scale (1.19M sorted-entry indices into 300k Gaussians), isolated
from the rest of the step, and the layout lever: a (6, N) axis-1 take vs
a row-major (N, 6) axis-0 take.

Two measurements:
1. single-dispatch min-over-repeats (includes tunnel sync; upper bound),
2. in-program: a 50-iteration lax.scan of dependent gathers, so per-
   gather time excludes dispatch entirely (this is the ledger's cited
   number: ~4.5 ms/take on a v5e, ~6.4 GB/s effective — gather-
   throughput-bound; both layouts time IDENTICALLY because XLA
   canonicalizes them to the same gather).

Committed with its v5e output (ADVICE r3: the 4.52 ms / layout-
invariance claims previously had no reproducible artifact):
see docs/probe_outputs/pack_gather_v5e.txt.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

N, E, K = 300_000, 1_190_000, 50
Ep = ((E + 1023) // 1024) * 1024
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, N, Ep, dtype=np.int32))
rows = jnp.asarray(rng.standard_normal((6, N)).astype(np.float32))
cols = jnp.asarray(np.ascontiguousarray(np.asarray(rows).T))  # (N, 6)


@jax.jit
def g_rows(r, i):  # production form: (6, N) take along axis 1
    return jnp.take(r, i, axis=1)


@jax.jit
def g_cols(c, i):  # row-major alternative: (N, 6) take along axis 0
    return jnp.take(c, i, axis=0)


@jax.jit
def k_rows(r, i):  # dispatch-free: 50 dependent in-program gathers
    def body(c, _):
        o = jnp.take(r + c, i, axis=1)
        return c + o[0, 0] * 1e-20, None

    return jax.lax.scan(body, 0.0, None, length=K)[0]


@jax.jit
def k_cols(c0, i):
    def body(c, _):
        o = jnp.take(c0 + c, i, axis=0)
        return c + o[0, 0] * 1e-20, None

    return jax.lax.scan(body, 0.0, None, length=K)[0]


def timeit(f, *a, per=1):
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3 / per


def main():
    print("backend", jax.default_backend())
    print(f"N={N} E={Ep} rows of f32")
    r1 = timeit(g_rows, rows, idx)
    c1 = timeit(g_cols, cols, idx)
    print(f"single dispatch: (6,N) axis-1 take {r1:.2f} ms | "
          f"(N,6) axis-0 take {c1:.2f} ms (incl. sync)")
    rk = timeit(k_rows, rows, idx, per=K)
    ck = timeit(k_cols, cols, idx, per=K)
    gbs = Ep * 6 * 4 / (rk * 1e-3) / 1e9
    print(f"in-program (50-gather scan): (6,N) {rk:.2f} ms/take | "
          f"(N,6) {ck:.2f} ms/take -> {gbs:.1f} GB/s effective")


if __name__ == "__main__":
    main()
