"""Ablate the one-hot kernel's cost components on the real chip.

full    : DMA + sel build + sel matmul + proj matmul
no_dma  : skip the window DMAs (uninitialized scratch)
no_sel  : skip selector build+matmul (acc += proj[:TILE])
no_proj : skip the projection matmul (sel @ win[:, :c_out])
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE = 1024
WIN = 1536
NG = 3
CWP = 384
COUT = 96
CAP = 262144


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def kernel(mode, wstart_ref, anchors_ref, t3_ref, w_ref, out_ref, win, sem):
        t = pl.program_id(0)
        dmas = []
        if mode != "no_dma":
            for g in range(NG):
                ws = pl.multiple_of(wstart_ref[t * NG + g], 8)
                dma = pltpu.make_async_copy(
                    t3_ref.at[pl.ds(ws, WIN), :], win.at[g], sem.at[g])
                dma.start()
                dmas.append(dma)
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        col = 0
        for g in range(NG):
            ws = pl.multiple_of(wstart_ref[t * NG + g], 8)
            if mode != "no_dma":
                dmas[g].wait()
            wb = win[g].astype(jnp.bfloat16)
            for _ in range(3):
                rel = anchors_ref[min(col, 7), :] - ws
                if mode == "no_proj":
                    sel = (jax.lax.broadcasted_iota(jnp.int32, (TILE, WIN), 1)
                           == rel[:, None]).astype(jnp.bfloat16)
                    acc = acc + jnp.dot(sel, wb[:, :COUT],
                                        preferred_element_type=jnp.float32)
                else:
                    proj = jnp.dot(wb, w_ref[col],
                                   preferred_element_type=jnp.float32)
                    if mode == "no_sel":
                        acc = acc + proj[:TILE]
                    else:
                        sel = (jax.lax.broadcasted_iota(jnp.int32, (TILE, WIN), 1)
                               == rel[:, None]).astype(jnp.bfloat16)
                        acc = acc + jnp.dot(sel, proj.astype(jnp.bfloat16),
                                            preferred_element_type=jnp.float32)
                col += 1
        out_ref[:] = acc

    n_tiles = CAP // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, COUT), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NG, WIN, CWP), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((NG,)),
        ],
    )

    rng = np.random.default_rng(0)
    t3 = jnp.asarray(rng.normal(size=(CAP + WIN, CWP)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.normal(size=(9, CWP, COUT)) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    anchors = jnp.asarray(
        np.clip(np.arange(CAP)[None, :] + rng.integers(-400, 400, (8, CAP)),
                0, CAP - 1).astype(np.int32))
    wstart = np.clip((np.repeat(np.arange(n_tiles) * TILE, NG)) - 256, 0, CAP) & ~7
    wstart = jnp.asarray(wstart.astype(np.int32))

    def timeit(f, *args, iters=10):
        o = f(*args)
        _ = float(o.ravel()[0])
        t0 = time.time()
        for _ in range(iters):
            o = f(*args)
        _ = float(o.ravel()[0])
        return (time.time() - t0) / iters

    for mode in ("full", "no_dma", "no_sel", "no_proj"):
        f = jax.jit(lambda ws, a, t3, w, mode=mode: pl.pallas_call(
            functools.partial(kernel, mode),
            out_shape=jax.ShapeDtypeStruct((CAP, COUT), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
        )(ws, a, t3, w))
        try:
            dt = timeit(f, wstart, anchors, t3, w)
            print(f"{mode:8s}: {dt*1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{mode:8s}: FAIL {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
