"""A/B the masked-shift z-fused conv against the flat 27-gather conv.

Masked-shift design (candidate to replace the failed 7-variant stack):
  T3 = [x_prev * m_prev | x | x_next * m_next]   (N+1 rows, 3C, guard last)
  - 9 anchor-at-B triple gathers (weights stacked per column) cover every
    kernel pair whose center-z neighbor exists (~74% of valid pairs here)
  - B-missing leftovers: host-compacted COO sorted by output row:
    gather x[idx_in] (P rows) @ per-slot weights via segment-sorted tiles,
    then segment_sum into outputs.
Here the leftover matmul is approximated with a single shared weight (cost
model only — slot bucketing adds nothing to runtime shape); correctness of
the real implementation is tested separately on CPU.

Widths: C=32 (encoder) and C=96 (decoder L0 blocks). Also remeasures the
width ceiling incl. bf16.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 262144
P = int(1.5 * N)  # leftover pair capacity (measured 1.445/voxel on bench data)


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

    for c in (32, 96):
        x = jnp.asarray(rng.normal(size=(N, c)).astype(np.float32))
        mp = jnp.asarray((rng.random(N) < 0.3).astype(np.float32))[:, None]
        mn = jnp.asarray((rng.random(N) < 0.3).astype(np.float32))[:, None]
        anchors = jnp.asarray(rng.integers(0, N + 1, (9, N)).astype(np.int32))
        w3 = jnp.asarray((rng.normal(size=(9, 3 * c, c)) * 0.05).astype(np.float32))
        wf = jnp.asarray((rng.normal(size=(27, c, c)) * 0.05).astype(np.float32))
        idxf = jnp.asarray(rng.integers(0, N + 1, (26, N)).astype(np.int32))
        lo_in = jnp.asarray(np.sort(rng.integers(0, N, P)).astype(np.int32))
        lo_out = jnp.asarray(np.sort(rng.integers(0, N, P)).astype(np.int32))
        wl = jnp.asarray((rng.normal(size=(c, c)) * 0.05).astype(np.float32))

        @jax.jit
        def flat(x, idx, w):
            xg = jnp.concatenate([x, jnp.zeros((1, c), x.dtype)], axis=0)

            def body(acc, kw):
                i, wk = kw
                return acc + jnp.dot(jnp.take(xg, i, axis=0), wk,
                                     preferred_element_type=jnp.float32), None

            acc, _ = lax.scan(body, jnp.dot(x, w[13]), (idx, jnp.concatenate([w[:13], w[14:]])))
            return acc

        @jax.jit
        def masked_shift(x, mp, mn, anchors, w3, lo_in, lo_out, wl):
            xp = jnp.roll(x, 1, axis=0) * mp
            xn = jnp.roll(x, -1, axis=0) * mn
            t3 = jnp.concatenate([xp, x, xn], axis=1)
            t3 = jnp.concatenate([t3, jnp.zeros((1, 3 * c), x.dtype)], axis=0)

            def body(acc, gw):
                i, wk = gw
                return acc + jnp.dot(jnp.take(t3, i, axis=0), wk,
                                     preferred_element_type=jnp.float32), None

            acc, _ = lax.scan(body, jnp.zeros((N, c), jnp.float32), (anchors, w3))
            # leftover COO: gather + matmul + sorted segment-sum
            g = jnp.take(x, lo_in, axis=0)
            contrib = jnp.dot(g, wl, preferred_element_type=jnp.float32)
            acc = acc + jax.ops.segment_sum(contrib, lo_out, num_segments=N,
                                            indices_are_sorted=True)
            return acc

        t_flat = timeit(flat, x, idxf, wf)
        t_ms = timeit(masked_shift, x, mp, mn, anchors, w3, lo_in, lo_out, wl)
        print(f"C={c}: flat {t_flat*1e3:6.1f} ms | masked-shift {t_ms*1e3:6.1f} ms "
              f"| {t_flat/t_ms:4.2f}x")


if __name__ == "__main__":
    main()
