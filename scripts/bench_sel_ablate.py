"""Ablate the selector-kernel conv pieces at real L0 bench shapes.

Times, with K reps amortized inside one jit (axon dispatch floor ~7 ms):
  proj    — the fused projection GEMM alone
  kern    — projection + selector kernel
  ov      — the overflow-COO pass alone
  full    — onehot_window_conv forward
  full+bw — forward + backward (dX + dW)
Run on the real chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

C = int(os.environ.get("ABL_C", "96"))
LEVEL = int(os.environ.get("ABL_LEVEL", "0"))
REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _voxelize_scene
    from languagegroundedsemseg_tpu.data.batching import BatchBuilder
    from languagegroundedsemseg_tpu.models.res16unet import res16unet_graph_spec
    from languagegroundedsemseg_tpu.ops import onehot_conv as oh
    from languagegroundedsemseg_tpu.ops.msconv import _t3, _wstack, _ov_fwd

    rng = np.random.default_rng(0)
    builder = BatchBuilder(spec=res16unet_graph_spec())
    scenes = [_voxelize_scene(rng, 180_000) for _ in range(4)]
    batch = builder.build(scenes)
    ms = batch.graph.gmaps[f"l{LEVEL}.k3"]
    cap = ms.mc.shape[0]
    print(f"L{LEVEL} cap={cap} tile={ms.tile} win={ms.win} C={C} "
          f"ov={ms.ov_in.shape[0]} ov_seg={ms.ov_seg}")

    x = jnp.asarray(rng.standard_normal((cap, C)), jnp.float32)
    w = jnp.asarray(0.05 * rng.standard_normal((27, C, C)), jnp.float32)
    ms = jax.device_put(ms)
    x = jax.device_put(x)
    w = jax.device_put(w)

    c_pad = (-C) % 128
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad))) if c_pad else w
    meta = oh.OHMeta(tuple(ms.cols), tuple(ms.mirror_perm), int(ms.ov_seg),
                     int(ms.dwov_seg), int(ms.tile), int(ms.win), False)

    def proj_only(x, w):
        wstk = _wstack(wp, meta.cols)
        t3b = _t3(x.astype(jnp.bfloat16), ms.mp, ms.mn, ms.mc)[:-1]
        wall = jnp.concatenate(list(wstk), axis=1).astype(jnp.bfloat16)
        return jnp.dot(t3b, wall,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def kern(x, w):
        pall = proj_only(x, w)
        return oh._run_sel_fwd(ms.wstart, ms.anchors, ms.mc, pall,
                               len(meta.cols) - 1, meta.tile, meta.win, False)

    def ov_only(x, w):
        wstk = _wstack(wp, meta.cols)
        return _ov_fwd(x, ms.mp, ms.mn, ms.mc, wstk, ms.ov_in, ms.ov_out,
                       ms.ov_off, cap, wp.shape[2], meta.ov_seg)

    def full(x, w):
        return oh.onehot_window_conv(x, w, ms)

    def fullbw(x, w):
        def loss(x, w):
            return jnp.sum(oh.onehot_window_conv(x, w, ms) ** 2)
        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        return gx[:, :1] + gw[0, :, :1].T

    def reps(fn, *args):
        def step(c, _):
            o = fn(c, *args[1:])
            # tiny data dependency to serialize reps
            return c + o[:1, :1].astype(c.dtype) * 0.0, None

        def run(x0, *rest):
            c, _ = lax.scan(lambda c, _: step(c, None), x0, None, length=REPS)
            return c

        return jax.jit(run)

    for name, fn in [("proj", proj_only), ("kern", kern), ("ov", ov_only),
                     ("full", full), ("full+bw", fullbw)]:
        f = reps(fn, x, w)
        out = f(x, w)
        float(np.asarray(out[0, 0]))  # compile+run
        t0 = time.perf_counter()
        out = f(x, w)
        float(np.asarray(out[0, 0]))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:8s} {dt:7.2f} ms")


if __name__ == "__main__":
    main()
