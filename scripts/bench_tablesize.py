"""Decompose the z-fused slowdown: table-size effect vs stack build cost.

Measures on the real chip:
  g_small : take 262k rows from a (262k, 96) table   — flat-path regime
  g_big   : take 262k rows from a (1.84M, 96) table  — 7-variant stack regime
  g_mid   : take 262k rows from a (340k, 96) table   — sentinel-stack regime
  build3  : materialize the 7-variant triple stack
  zf_fwd  : the full z-fused forward (9 triple groups)
  flat    : 27-slot flat conv for reference
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    cap = 262144
    c3 = 96

    def timeit(f, *args, iters=10):
        out = f(*args)
        _ = float(out.ravel()[0])
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        _ = float(out.ravel()[0])
        return (time.time() - t0) / iters

    idx = jnp.asarray(rng.integers(0, cap, cap).astype(np.int32))

    for rows, name in [(cap, "g_small(262k tbl)"), (cap * 7, "g_big  (1.8M tbl)"),
                       (int(cap * 1.3), "g_mid  (340k tbl)")]:
        tbl = jnp.asarray(rng.normal(size=(rows, c3)).astype(np.float32))
        ridx = jnp.asarray(rng.integers(0, rows, cap).astype(np.int32))
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = timeit(f, tbl, ridx)
        print(f"{name}: {dt*1e3:7.2f} ms  ({dt/cap*1e9:.2f} ns/row)")

    # stack build alone
    from languagegroundedsemseg_tpu.ops.zfused_conv import _triple_stack

    x = jnp.asarray(rng.normal(size=(cap, 32)).astype(np.float32))
    f_build = jax.jit(lambda x: _triple_stack(x))
    dt = timeit(f_build, x, iters=5)
    print(f"build triple stack: {dt*1e3:7.2f} ms")

    # gather+dot fused vs unfused from big table
    tbl = jnp.asarray(rng.normal(size=(cap * 7, c3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(c3, 32)).astype(np.float32))
    ridx = jnp.asarray(rng.integers(0, cap * 7, cap).astype(np.int32))
    f_gd = jax.jit(lambda t, i, w: jnp.dot(jnp.take(t, i, axis=0), w))
    dt = timeit(f_gd, tbl, ridx, w)
    print(f"take+dot big tbl  : {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
