"""Width ceiling of the fused take+dot gather (small table, G=9 groups).

If ~6 ns/row holds at 288-576 wide, the C=96..192 convs can z-fuse too.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 262144
G = 9


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

    def scan_takes(tbl, idx, w):
        def body(acc, gw):
            i, wk = gw
            return acc + jnp.dot(jnp.take(tbl, i, axis=0), wk,
                                 preferred_element_type=jnp.float32), None

        acc, _ = lax.scan(body, jnp.zeros((N, w.shape[2]), jnp.float32), (idx, w))
        return acc

    f = jax.jit(scan_takes)
    rows = int(1.3 * N)
    idx = jnp.asarray(rng.integers(0, rows, (G, N)).astype(np.int32))
    for cw, cout, dt_ in ((96, 96, "float32"), (192, 64, "float32"),
                          (288, 96, "float32"), (384, 128, "float32"),
                          (576, 192, "float32"), (288, 96, "bfloat16"),
                          (576, 192, "bfloat16")):
        tbl = jnp.asarray(rng.normal(size=(rows, cw)).astype(np.float32)).astype(dt_)
        w = jnp.asarray((rng.normal(size=(G, cw, cout)) * 0.05).astype(np.float32)).astype(dt_)
        dt = timeit(f, tbl, idx, w)
        mb = rows * cw * (2 if dt_ == "bfloat16" else 4) / 1e6
        print(f"width={cw:4d} ({dt_:8s}, {mb:5.0f} MB tbl): {dt*1e3:7.2f} ms "
              f"({dt/(G*N)*1e9:5.2f} ns/row)")


if __name__ == "__main__":
    main()
