"""Pallas one-hot gather-GEMM microbenchmark (single column).

Per 1024-row output tile: DMA a 2048-row window of the (N, 3C) table from
HBM, build the (1024, 2048) one-hot selector via iota-compare, and run
S @ win @ W on the MXU. Compares against the XLA fused take+dot for the
same shapes. Run with --interpret for a CPU correctness check.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 1024      # output tile rows
W = 2048      # window rows
CW = 384       # 3C padded to a multiple of 128 (Mosaic DMA tiling)
COUT = 96
N = 262144
M = 768       # anchor locality margin used for synthetic anchors


def build_fn(interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(wstart_ref, anchors_ref, t3_ref, w_ref, out_ref, win, sem):
        t = pl.program_id(0)
        ws = pl.multiple_of(wstart_ref[t], 8)
        dma = pltpu.make_async_copy(t3_ref.at[pl.ds(ws, W), :], win, sem)
        dma.start()
        rel = anchors_ref[:] - ws  # (B,) int32
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (B, W), 1) == rel[:, None]
        ).astype(jnp.bfloat16)
        dma.wait()
        g = jnp.dot(sel, win[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        out_ref[:] = jnp.dot(g.astype(jnp.bfloat16), w_ref[:],
                             preferred_element_type=jnp.float32)

    n_tiles = N // B
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B,), lambda t, *_: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # t3 stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
        ],
        out_specs=pl.BlockSpec((B, COUT), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W, CW), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def run(wstart, anchors, t3, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, COUT), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(wstart, anchors, t3, w)

    return jax.jit(run)


def main():
    import jax
    import jax.numpy as jnp

    interpret = "--interpret" in sys.argv
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if interpret:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    n_tiles = N // B
    t3 = rng.normal(size=(N, CW)).astype(np.float32)
    w = (rng.normal(size=(CW, COUT)) * 0.05).astype(np.float32)
    base = np.arange(N)
    anchors = np.clip(base + rng.integers(-M, M, N), 0, N - 1).astype(np.int32)
    wstart = np.clip(
        (np.arange(n_tiles) * B) - (W - B) // 2, 0, N - W
    ).astype(np.int32)
    wstart &= ~7  # HBM tiling: dynamic DMA slice starts must be 8-aligned
    # keep every anchor inside its tile's window (host guarantees this in
    # the real op by COO-routing outliers)
    for t in range(n_tiles):
        lo, hi = wstart[t], wstart[t] + W
        a = anchors[t * B:(t + 1) * B]
        anchors[t * B:(t + 1) * B] = np.clip(a, lo, hi - 1)
    anchors1d = anchors.copy()

    f = build_fn(interpret)
    out = np.asarray(f(jnp.asarray(wstart), jnp.asarray(anchors1d),
                       jnp.asarray(t3), jnp.asarray(w)))
    ref = t3[anchors] @ w
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"correctness vs gather oracle: rel err {err:.2e} (bf16 expected ~1e-2)")
    if interpret:
        return

    def timeit(fn, *args, iters=10):
        o = fn(*args)
        _ = float(o.ravel()[0])
        t0 = time.time()
        for _ in range(iters):
            o = fn(*args)
        _ = float(o.ravel()[0])
        return (time.time() - t0) / iters

    t3j, wj = jnp.asarray(t3), jnp.asarray(w)
    t_pallas = timeit(f, jnp.asarray(wstart), jnp.asarray(anchors1d), t3j, wj)

    av = jnp.asarray(anchors)
    xla = jax.jit(lambda t, i, w: jnp.dot(jnp.take(t, i, axis=0), w,
                                          preferred_element_type=jnp.float32))
    t_xla = timeit(xla, t3j, av, wj)
    print(f"pallas one-hot: {t_pallas*1e3:7.2f} ms ({t_pallas/N*1e9:5.2f} ns/row)")
    print(f"xla take+dot  : {t_xla*1e3:7.2f} ms ({t_xla/N*1e9:5.2f} ns/row)")


if __name__ == "__main__":
    main()
