"""Validate the sentinel-shift conv design on the real chip.

Measures the full in-jit pipeline at the hot Res16UNet34C shapes:
  build T = [T3(roll+mask) ; SENT(3 gathers) ; guard]  ->
  8 fused anchor gathers + dots (+ center matmul),
windowed (static barriered slices + per-window sentinel block) when the
table exceeds the fast-table budget, monolithic otherwise.

Compares against the shipped paths' measured round-2 numbers.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAST_TABLE_BYTES = 140 * 1024 * 1024


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)

    def timeit(f, *args, iters=8):
        out = f(*args)
        _ = float(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        _ = float(out.ravel()[0])
        return (time.perf_counter() - t0) / iters

    # (label, cap, cin, cout, S) -- S = sentinel count ~ 25% of cap
    shapes = [
        ("L0 c96", 262144, 96, 96, 65536),
        ("L0 c3", 262144, 3, 32, 65536),
        ("L1 c32", 144384, 32, 32, 36096),
        ("L1 c128", 144384, 128, 96, 36096),
        ("L2 c32", 58368, 32, 64, 14592),
        ("L2 c64", 58368, 64, 64, 14592),
    ]
    M = 12288

    for label, cap, cin, cout, S in shapes:
        cw = 3 * cin
        table_bytes = (cap + S) * cw * 4
        x = jnp.asarray(rng.normal(size=(cap, cin)).astype(np.float32))
        mp = jnp.asarray((rng.random(cap) < 0.7).astype(np.float32))
        mn = jnp.asarray((rng.random(cap) < 0.7).astype(np.float32))
        base = np.arange(cap)
        anch = np.clip(base[None, :] + rng.integers(-M // 2, M // 2, (8, cap)),
                       0, cap - 1)
        # ~10% of anchors point into the sentinel region
        sent_mask = rng.random((8, cap)) < 0.10
        anch = np.where(sent_mask, cap + rng.integers(0, S, (8, cap)), anch)
        anchors = jnp.asarray(anch.astype(np.int32))
        sl = jnp.asarray(rng.integers(0, cap, S).astype(np.int32))
        sm = jnp.asarray(rng.integers(0, cap, S).astype(np.int32))
        sr = jnp.asarray(rng.integers(0, cap, S).astype(np.int32))
        w = jnp.asarray((rng.normal(size=(9, cw, cout)) * 0.05).astype(np.float32))

        def build_t3(x, mp, mn):
            xp = jnp.roll(x, 1, axis=0) * mp[:, None]
            xn = jnp.roll(x, -1, axis=0) * mn[:, None]
            return jnp.concatenate([xp, x, xn], axis=1)

        def build_sent(x, sl, sm, sr):
            xg = jnp.concatenate([x, jnp.zeros((1, cin), x.dtype)], axis=0)
            return jnp.concatenate(
                [jnp.take(xg, sl, axis=0), jnp.take(xg, sm, axis=0),
                 jnp.take(xg, sr, axis=0)], axis=1)

        @jax.jit
        def mono(x, mp, mn, anchors, sl, sm, sr, w):
            t3 = build_t3(x, mp, mn)
            sent = build_sent(x, sl, sm, sr)
            t = jnp.concatenate(
                [t3, sent, jnp.zeros((1, cw), x.dtype)], axis=0)
            acc = jnp.dot(t3, w[0], preferred_element_type=jnp.float32)

            def body(a, gw):
                i, wk = gw
                return a + jnp.dot(jnp.take(t, i, axis=0), wk,
                                   preferred_element_type=jnp.float32), None

            acc, _ = lax.scan(body, acc, (anchors, w[1:]))
            return acc

        # windowed: static slices of T3 with the sentinel block appended
        SW = 65536
        n_win = -(-cap // SW)

        @jax.jit
        def windowed(x, mp, mn, anchors, sl, sm, sr, w):
            t3 = build_t3(x, mp, mn)
            sent = build_sent(x, sl, sm, sr)
            t3pad = jnp.concatenate(
                [jnp.zeros((M, cw), x.dtype), t3,
                 jnp.zeros((n_win * SW - cap + M, cw), x.dtype)], axis=0)
            acc0 = jnp.dot(t3, w[0], preferred_element_type=jnp.float32)
            outs = []
            for wi in range(n_win):
                lo = wi * SW
                size = min(SW, cap - lo)
                wsize = SW + 2 * M
                win = lax.concatenate(
                    [lax.slice_in_dim(t3pad, lo, lo + wsize, axis=0),
                     sent, jnp.zeros((1, cw), x.dtype)], 0)
                win = lax.optimization_barrier(win)
                asl = lax.slice_in_dim(anchors, lo, lo + size, axis=1)
                rel = jnp.where(asl >= cap, asl - cap + wsize,
                                asl - (lo - M))

                def body(a, gw, win=win):
                    i, wk = gw
                    return a + jnp.dot(jnp.take(win, i, axis=0), wk,
                                       preferred_element_type=jnp.float32), None

                acc, _ = lax.scan(
                    body, lax.slice_in_dim(acc0, lo, lo + size, axis=0),
                    (rel, w[1:]))
                outs.append(acc)
            return jnp.concatenate(outs, axis=0)

        args = (x, mp, mn, anchors, sl, sm, sr, w)
        rows = 8 * cap
        t_mono = timeit(mono, *args)
        line = (f"{label:8s} cap={cap:7d} cw={cw:4d} tbl={table_bytes/2**20:6.1f}MB "
                f"mono {t_mono*1e3:7.2f} ms ({t_mono/rows*1e9:5.2f} ns/row)")
        if table_bytes > FAST_TABLE_BYTES or True:
            a = np.asarray(mono(*args))
            b = np.asarray(windowed(*args))
            # windowed must equal mono where anchors are in range
            err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
            t_win = timeit(windowed, *args)
            line += (f" | win {t_win*1e3:7.2f} ms ({t_win/rows*1e9:5.2f} ns/row)"
                     f" err={err:.1e}")
        print(line)


if __name__ == "__main__":
    main()
