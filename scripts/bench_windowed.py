"""Does gathering from a barriered WINDOW of a big table run at
small-table speed? Decides the windowed masked-shift design for the
decoder convs whose T3 exceeds the fast-table byte budget.

big_mono    : 8 take+dot groups over a (N, 288) 302 MB computed table
windowed    : same work split into 3 windows of ~110k rows (126 MB each),
              each window = optimization_barrier(static slice), anchors
              rebased, outputs written per window
small_param : control — 8 groups over a (110k, 288) parameter table
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 262144
G = 8
CW = 288
COUT = 96
M = 8192
S = 90112  # 3 windows: ceil(262144 / 90112) = 3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)

    def timeit(f, *args, iters=5):
        out = f(*args)
        _ = float(out.ravel()[0])
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        _ = float(out.ravel()[0])
        return (time.time() - t0) / iters

    x = jnp.asarray(rng.normal(size=(N, CW // 3)).astype(np.float32))
    # anchors local within +-M of the output row (the measured structure)
    base = np.arange(N)
    anchors = np.clip(
        base[None, :] + rng.integers(-M, M, (G, N)), 0, N - 1
    ).astype(np.int32)
    anchors_j = jnp.asarray(anchors)
    w = jnp.asarray((rng.normal(size=(G, CW, COUT)) * 0.05).astype(np.float32))

    def build(x):
        return jnp.concatenate(
            [jnp.roll(x, 1, axis=0), x, jnp.roll(x, -1, axis=0)], axis=1)

    @jax.jit
    def big_mono(x, idx, w):
        t = build(x)

        def body(acc, gw):
            i, wk = gw
            return acc + jnp.dot(jnp.take(t, i, axis=0), wk,
                                 preferred_element_type=jnp.float32), None

        acc, _ = lax.scan(body, jnp.zeros((N, COUT), jnp.float32), (idx, w))
        return acc

    n_win = -(-N // S)

    @jax.jit
    def windowed(x, idx, w):
        t = build(x)
        tpad = jnp.concatenate(
            [jnp.zeros((M, CW), t.dtype), t,
             jnp.zeros((n_win * S - N + M + 1, CW), t.dtype)], axis=0)
        outs = []
        for tw in range(n_win):
            lo = tw * S
            size = min(S, N - lo)
            win = lax.optimization_barrier(
                lax.slice_in_dim(tpad, lo, lo + S + 2 * M + 1, axis=0))
            rel = idx[:, lo:lo + size] - (lo - M)

            def body(acc, gw, win=win):
                i, wk = gw
                return acc + jnp.dot(jnp.take(win, i, axis=0), wk,
                                     preferred_element_type=jnp.float32), None

            acc, _ = lax.scan(body, jnp.zeros((size, COUT), jnp.float32),
                              (rel, w))
            outs.append(acc)
        return jnp.concatenate(outs, axis=0)

    small = jnp.asarray(rng.normal(size=(S + 2 * M + 1, CW)).astype(np.float32))
    idx_small = jnp.asarray(
        rng.integers(0, S + 2 * M, (G, N)).astype(np.int32))

    @jax.jit
    def small_param(t, idx, w):
        def body(acc, gw):
            i, wk = gw
            return acc + jnp.dot(jnp.take(t, i, axis=0), wk,
                                 preferred_element_type=jnp.float32), None

        acc, _ = lax.scan(body, jnp.zeros((N, COUT), jnp.float32), (idx, w))
        return acc

    a = np.asarray(big_mono(x, anchors_j, w))
    b = np.asarray(windowed(x, anchors_j, w))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    t1 = timeit(big_mono, x, anchors_j, w)
    t2 = timeit(windowed, x, anchors_j, w)
    t3 = timeit(small_param, small, idx_small, w)
    print(f"big_mono   : {t1*1e3:7.2f} ms ({t1/(G*N)*1e9:5.2f} ns/row)")
    print(f"windowed   : {t2*1e3:7.2f} ms ({t2/(G*N)*1e9:5.2f} ns/row)  err={err:.2e}")
    print(f"small_param: {t3*1e3:7.2f} ms ({t3/(G*N)*1e9:5.2f} ns/row)")


if __name__ == "__main__":
    main()
