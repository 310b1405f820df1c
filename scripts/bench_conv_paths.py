"""A/B the three conv paths at production shapes on the real chip.

flat | masked-shift | one-hot windowed, forward and fwd+bwd, at the
Res16UNet34C hot shapes (L0 C=96 decoder, L1 C=32 encoder).
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

    from __graft_entry__ import _voxelize_scene
    from languagegroundedsemseg_tpu.sparse.graph_host import (
        GraphSpec, MapSpec, build_graph, pack_keys,
    )
    from languagegroundedsemseg_tpu.sparse.offsets import ConvKind
    from languagegroundedsemseg_tpu.ops.spconv import sparse_conv
    from languagegroundedsemseg_tpu.ops.msconv import masked_shift_conv
    from languagegroundedsemseg_tpu.ops.onehot_conv import onehot_window_conv

    rng = np.random.default_rng(0)
    scenes = [_voxelize_scene(rng, 180_000) for _ in range(4)]
    coords = []
    for b, (vc, _, _) in enumerate(scenes):
        coords.append(np.concatenate([np.full((len(vc), 1), b, np.int32), vc], axis=1))
    coords = np.concatenate(coords)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    cap = 262144
    coords = coords[:cap]

    spec = GraphSpec(num_levels=1, maps={"k3": MapSpec(0, 0, ConvKind(3), fuse_width=3)})
    g = build_graph(coords, spec, (cap,), drop_redundant=False)
    km, m = g.maps["k3"], g.gmaps["k3"]
    km_idx = jax.device_put(jnp.asarray(km.idx))
    m = jax.device_put(m)  # MaskedShiftMap is a pytree

    def timeit(f, *args, iters=10):
        out = f(*args)
        _ = float(out.ravel()[0] if not isinstance(out, tuple) else out[0].ravel()[0])
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        _ = float(out.ravel()[0] if not isinstance(out, tuple) else out[0].ravel()[0])
        return (time.time() - t0) / iters

    for cin, cout, name in ((96, 96, "L0-dec C=96"), (32, 32, "L0-enc C=32"),
                            (128, 96, "L0-dec in128")):
        x = jnp.asarray(rng.normal(size=(cap, cin)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(27, cin, cout)) * 0.05).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(cap, cout)).astype(np.float32))

        f_flat = jax.jit(lambda x, w: sparse_conv(
            x, w, km_idx, center_slot=km.center_slot, mirror_perm=km.mirror_perm))
        f_ms = jax.jit(lambda x, w: masked_shift_conv(x, w, m))
        f_oh = jax.jit(lambda x, w: onehot_window_conv(x, w, m, interpret=False))

        res = {}
        base = np.asarray(f_flat(x, w))
        n0 = int(g.levels[0].num)
        for nm, f in (("flat", f_flat), ("mshift", f_ms), ("onehot", f_oh)):
            try:
                out = f(x, w)
                if out is None:
                    res[nm] = ("n/a", "")
                    continue
                err = np.abs(np.asarray(out)[:n0] - base[:n0]).max() / (
                    np.abs(base[:n0]).max() + 1e-9)
                res[nm] = (f"{timeit(f, x, w)*1e3:7.2f} ms", f"err {err:.1e}")
            except Exception as e:  # noqa: BLE001
                res[nm] = (f"FAIL {type(e).__name__}", str(e)[:80])
        print(f"{name} fwd : " + " | ".join(f"{k} {v[0]} {v[1]}" for k, v in res.items()))

        def gradder(f):
            return jax.jit(jax.grad(lambda x, w: (f(x, w) * ct).sum(), (0, 1)))

        res = {}
        for nm, f in (("flat", f_flat), ("mshift", f_ms), ("onehot", f_oh)):
            try:
                gfn = gradder({"flat": lambda x, w: sparse_conv(
                    x, w, km_idx, center_slot=km.center_slot,
                    mirror_perm=km.mirror_perm),
                    "mshift": lambda x, w: masked_shift_conv(x, w, m),
                    "onehot": lambda x, w: onehot_window_conv(x, w, m, interpret=False),
                }[nm])
                out = gfn(x, w)
                res[nm] = (f"{timeit(gfn, x, w)*1e3:7.2f} ms", "")
            except Exception as e:  # noqa: BLE001
                res[nm] = (f"FAIL {type(e).__name__}", str(e)[:80])
        print(f"{name} grad: " + " | ".join(f"{k} {v[0]}" for k, v in res.items()))


if __name__ == "__main__":
    main()
