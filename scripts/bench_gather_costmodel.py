"""Pin the XLA row-gather cost model: ns/row vs (row width, locality, fusion).

Each timed function does K=26 gathers of n rows INSIDE one jit call (scan),
mirroring the sparse-conv inner loop — single-op timings under the axon
relay sit on the ~7 ms dispatch floor and measure nothing.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 26
N = 262144


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

    idx_rand = jnp.asarray(rng.integers(0, N, (K, N)).astype(np.int32))
    idx_local = jnp.asarray(
        np.clip(np.arange(N)[None, :] + rng.integers(-64, 64, (K, N)), 0, N - 1).astype(np.int32)
    )

    @jax.jit
    def takes(t, idx):
        def body(acc, i):
            return acc + jnp.take(t, i, axis=0), None

        acc, _ = lax.scan(body, jnp.zeros((N, t.shape[1]), jnp.float32), idx)
        return acc

    for c in (32, 64, 96, 128, 256):
        tbl = jnp.asarray(rng.normal(size=(N, c)).astype(np.float32))
        tr = timeit(takes, tbl, idx_rand)
        tl = timeit(takes, tbl, idx_local)
        print(f"C={c:4d} ({c*4:5d}B/row): random {tr/(K*N)*1e9:6.2f} ns/row | "
              f"local {tl/(K*N)*1e9:6.2f} ns/row   [{tr*1e3:6.1f} / {tl*1e3:6.1f} ms]")

    # take+dot (conv inner loop): mono C=96 vs 3x32-chunked, local indices
    c = 96
    tbl = jnp.asarray(rng.normal(size=(N, c)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(K, c, c)) * 0.05).astype(np.float32))

    @jax.jit
    def conv_mono(t, idx, w):
        def body(acc, kw):
            i, wk = kw
            return acc + jnp.dot(jnp.take(t, i, axis=0), wk,
                                 preferred_element_type=jnp.float32), None

        acc, _ = lax.scan(body, jnp.zeros((N, c), jnp.float32), (idx, w))
        return acc

    @jax.jit
    def conv_chunked(t, idx, w):
        def body(acc, kw):
            i, wk = kw
            for q in range(3):
                g = jnp.take(lax.slice_in_dim(t, q * 32, (q + 1) * 32, axis=1), i, axis=0)
                acc = acc + jnp.dot(g, lax.slice_in_dim(wk, q * 32, (q + 1) * 32, axis=0),
                                    preferred_element_type=jnp.float32)
            return acc, None

        acc, _ = lax.scan(body, jnp.zeros((N, c), jnp.float32), (idx, w))
        return acc

    for name, i in (("random", idx_rand), ("local", idx_local)):
        t1 = timeit(conv_mono, tbl, i, w)
        t2 = timeit(conv_chunked, tbl, i, w)
        print(f"C=96 conv {name}: mono {t1*1e3:6.1f} ms ({t1/(K*N)*1e9:5.2f} ns/row) | "
              f"3x32-chunked {t2*1e3:6.1f} ms ({t2/(K*N)*1e9:5.2f} ns/row)")


if __name__ == "__main__":
    main()
