"""Find what breaks take->dot fusion (4.4 ns/row vs 13-15 unfused).

All variants: scan of G take+dot groups, n=262k output rows, Cin=96 fused
width (3x32), Cout=96, G=9 (the z-fused triple-group count for k3).

  param_small : table (n, 96) jit parameter            — control (~4.4)
  param_big   : table (7n, 96) jit parameter           — size effect
  computed    : table = concat(roll,x,roll) inside jit — producer effect
  barriered   : same + lax.optimization_barrier        — forced buffer
  sentinel    : table (1.3n, 96) parameter             — sentinel-size
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 262144
G = 9
CIN = 32
CW = 96  # fused row width (3 * CIN)
COUT = 96


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

    w = jnp.asarray((rng.normal(size=(G, CW, COUT)) * 0.05).astype(np.float32))

    def scan_takes(tbl, idx, w):
        def body(acc, gw):
            i, wk = gw
            return acc + jnp.dot(jnp.take(tbl, i, axis=0), wk,
                                 preferred_element_type=jnp.float32), None

        acc, _ = lax.scan(body, jnp.zeros((N, COUT), jnp.float32), (idx, w))
        return acc

    for rows, name in ((N, "param_small(262k)"), (7 * N, "param_big (1.8M)"),
                       (int(1.3 * N), "sentinel  (340k)")):
        tbl = jnp.asarray(rng.normal(size=(rows, CW)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, rows, (G, N)).astype(np.int32))
        f = jax.jit(scan_takes)
        dt = timeit(f, tbl, idx, w)
        print(f"{name}: {dt*1e3:7.2f} ms ({dt/(G*N)*1e9:5.2f} ns/row)")

    x = jnp.asarray(rng.normal(size=(N, CIN)).astype(np.float32))
    idx3 = jnp.asarray(rng.integers(0, 3 * N, (G, N)).astype(np.int32))

    def build(x):
        xp = jnp.roll(x, 1, axis=0)
        xn = jnp.roll(x, -1, axis=0)
        return jnp.concatenate(
            [jnp.concatenate([xp, x, xn], 1),
             jnp.concatenate([x, xp, xn], 1),
             jnp.concatenate([xn, x, xp], 1)], axis=0)  # (3N, 96)

    @jax.jit
    def computed(x, idx, w):
        return scan_takes(build(x), idx, w)

    @jax.jit
    def barriered(x, idx, w):
        return scan_takes(lax.optimization_barrier(build(x)), idx, w)

    print(f"computed (3N tbl in-jit): {timeit(computed, x, idx3, w)*1e3:7.2f} ms "
          f"({timeit(computed, x, idx3, w)/(G*N)*1e9:5.2f} ns/row)")
    print(f"barriered(3N tbl in-jit): {timeit(barriered, x, idx3, w)*1e3:7.2f} ms "
          f"({timeit(barriered, x, idx3, w)/(G*N)*1e9:5.2f} ns/row)")


if __name__ == "__main__":
    main()
