"""Micro-ablate the selector-conv projection at L0 bench shapes.

Questions (PERF.md round 3): the fused projection measures 18.6 ms where
roofline says ~4.5 ms — is the gap in (a) the GEMM tiling at (590k, 288)
@ (288, 1152), (b) the T3 build, or (c) their composition through the
optimization_barrier? And does the selector kernel prefer a bigger tile?
Run on the real chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from languagegroundedsemseg_tpu.ops.msconv import _t3

    rng = np.random.default_rng(0)
    cap, c, n = 589824, 96, 1152
    cw = 3 * c
    x = jax.device_put(jnp.asarray(rng.standard_normal((cap, c)), jnp.float32))
    mp = jax.device_put(jnp.asarray(rng.integers(0, 2, cap), jnp.uint8))
    mn = jax.device_put(jnp.asarray(rng.integers(0, 2, cap), jnp.uint8))
    mc = jax.device_put(jnp.asarray(rng.integers(0, 2, cap), jnp.uint8))
    t3m = jax.device_put(
        jnp.asarray(rng.standard_normal((cap, cw)), jnp.bfloat16))
    wall = jax.device_put(
        jnp.asarray(0.05 * rng.standard_normal((cw, n)), jnp.bfloat16))

    def reps(fn):
        def run(*args):
            def step(carry, _):
                o = fn(*args)
                return carry + o.ravel()[0].astype(jnp.float32), None
            out, _ = lax.scan(step, jnp.float32(0), None, length=REPS)
            return out
        return jax.jit(run)

    def timeit(name, fn, *args):
        f = reps(fn)
        o = f(*args)
        float(o)
        t0 = time.perf_counter()
        o = f(*args)
        float(o)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:28s} {dt:7.2f} ms", flush=True)
        return dt

    # (a) GEMM alone on a pre-materialized T3 (bf16 out, as shipped)
    timeit("gemm 288x1152 bf16out", lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.bfloat16), t3m, wall)
    # f32 out for comparison (doubles the write)
    timeit("gemm 288x1152 f32out", lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.float32), t3m, wall)
    # split into 128-wide column GEMMs (9 narrow) — different tiling
    def gemm_split(a, b):
        outs = [jnp.dot(a, b[:, i * 128:(i + 1) * 128],
                        preferred_element_type=jnp.bfloat16)
                for i in range(n // 128)]
        return jnp.concatenate(outs, axis=1)
    timeit("gemm 9x(288x128)", gemm_split, t3m, wall)

    # (b) T3 build alone (bf16, as shipped)
    def t3_only(x, mp, mn, mc):
        return lax.optimization_barrier(
            _t3(x.astype(jnp.bfloat16), mp, mn, mc)[:-1])
    timeit("t3 build bf16", t3_only, x, mp, mn, mc)

    # (c) composition as shipped
    def proj(x, mp, mn, mc, wall):
        t3b = lax.optimization_barrier(
            _t3(x.astype(jnp.bfloat16), mp, mn, mc)[:-1])
        return jnp.dot(t3b, wall, preferred_element_type=jnp.bfloat16)
    timeit("proj (t3+gemm, barrier)", proj, x, mp, mn, mc, wall)

    def proj_nobar(x, mp, mn, mc, wall):
        t3b = _t3(x.astype(jnp.bfloat16), mp, mn, mc)[:-1]
        return jnp.dot(t3b, wall, preferred_element_type=jnp.bfloat16)
    timeit("proj (no barrier)", proj_nobar, x, mp, mn, mc, wall)

    # (d) 3-GEMM formulation: P = xp@W_A + xc@W_B + xn@W_C with K=96 each,
    # avoids materializing T3 entirely (x read 3x at C*cap f32, no 3C table)
    wA = wall[:c]
    wB = wall[c:2 * c]
    wC = wall[2 * c:]
    def proj3(x, mp, mn, mc, wA, wB, wC):
        xb = x.astype(jnp.bfloat16)
        xp = jnp.roll(xb, 1, axis=0) * mp[:, None].astype(jnp.bfloat16)
        xn = jnp.roll(xb, -1, axis=0) * mn[:, None].astype(jnp.bfloat16)
        xc = xb * mc[:, None].astype(jnp.bfloat16)
        return (jnp.dot(xp, wA, preferred_element_type=jnp.float32)
                + jnp.dot(xc, wB, preferred_element_type=jnp.float32)
                + jnp.dot(xn, wC, preferred_element_type=jnp.float32)
                ).astype(jnp.bfloat16)
    timeit("proj 3-gemm K=96", proj3, x, mp, mn, mc, wA, wB, wC)

    # (e) single wide-K GEMM from a shifted-stack: same as (a) but K=384
    # (pad K to lane-tile multiple) — checks K-padding sensitivity
    t3p = jnp.pad(t3m, ((0, 0), (0, 384 - cw)))
    wallp = jnp.pad(wall, ((0, 384 - cw), (0, 0)))
    timeit("gemm 384x1152 (K padded)", lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.bfloat16), t3p, wallp)


if __name__ == "__main__":
    main()
