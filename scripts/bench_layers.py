"""Per-conv timing breakdown of the Res16UNet34C bench forward.

Enumerates every conv in the 34C graph at the bench shapes (262k voxels,
4 scenes), times each with its real kernel map through the same dispatch
as models/layers.py:SparseConv, and prints a table: path, per-call ms,
count, total ms. The sum vs the full jitted forward shows the fusion /
elementwise overhead. Run on the real chip.
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
    from languagegroundedsemseg_tpu.data.batching import BatchBuilder
    from languagegroundedsemseg_tpu.models.res16unet import (
        Res16UNet34C,
        res16unet_graph_spec,
    )
    from languagegroundedsemseg_tpu.models.layers import SparseConv
    from languagegroundedsemseg_tpu.sparse.types import (
        MaskedShiftMap,
        ParentMap,
        ChildSumMap,
    )
    from languagegroundedsemseg_tpu.ops.msconv import masked_shift_conv, FAST_TABLE_BYTES
    from languagegroundedsemseg_tpu.ops.onehot_conv import (
        onehot_window_conv,
        child_sum_conv,
    )
    from languagegroundedsemseg_tpu.ops.spconv import sparse_conv

    rng = np.random.default_rng(0)
    import os as _os
    if _os.environ.get("LGS_BENCH_FLEX", "1") == "1":
        builder = BatchBuilder(spec=res16unet_graph_spec())
    else:
        builder = BatchBuilder(
            spec=res16unet_graph_spec(),
            fixed_capacity=262144,
            level_ratios=(1, 0.55, 0.22, 0.08, 0.03),
        )
    scenes = [_voxelize_scene(rng, 180_000) for _ in range(4)]
    batch = builder.build(scenes)
    graph = jax.device_put(batch.graph)
    caps = [l.capacity for l in graph.levels]
    print("caps:", caps)

    # conv inventory: (label, map_name, in_level, out_level, cin, cout, count)
    P = (32, 64, 128, 256, 256, 128, 96, 96)
    L = (2, 3, 4, 6, 2, 2, 2, 2)
    inv = []
    inv.append(("conv0", "l0.k3", 0, 0, 3, 32, 1))
    # encoder: down conv to level l+1 then blocks
    cin = 32
    for s in range(4):
        lvl = s + 1
        inv.append((f"down{s+1}", f"down{s}", s, lvl, cin, cin, 1))
        # first block: cin->P[s], rest P[s]->P[s]
        inv.append((f"b{s+1}.c1a", f"l{lvl}.k3", lvl, lvl, cin, P[s], 1))
        inv.append((f"b{s+1}.rest", f"l{lvl}.k3", lvl, lvl, P[s], P[s], 2 * L[s] - 1))
        cin = P[s]
    # decoder
    skip = [32, 32, 64, 128]  # L0..L3 skip channels (conv0 out, b1, b2, b3)
    for d in range(4):
        lvl = 4 - d  # input level of transpose conv
        out_lvl = lvl - 1
        cout_tr = P[4 + d]
        inv.append((f"up{lvl}", f"up{lvl}", lvl, out_lvl, cin, cout_tr, 1))
        bc_in = cout_tr + skip[out_lvl]
        inv.append((f"b{5+d}.c1a", f"l{out_lvl}.k3", out_lvl, out_lvl, bc_in, P[4 + d], 1))
        inv.append((f"b{5+d}.rest", f"l{out_lvl}.k3", out_lvl, out_lvl, P[4 + d], P[4 + d], 2 * L[4 + d] - 1))
        cin = P[4 + d]
    inv.append(("final", None, 0, 0, P[7], 200, 1))

    def dispatch(map_name, x, w, b):
        """Mirror models/layers.py:SparseConv dispatch; returns (out, path)."""
        if map_name is None:
            return jnp.dot(x, w[0]), "k1"
        km = graph.maps[map_name]
        gm = graph.gmaps.get(map_name) if graph.gmaps else None
        if isinstance(gm, ChildSumMap):
            out = child_sum_conv(x, w, gm, b)
            if out is not None:
                return out, "csum"
        if isinstance(gm, ParentMap):
            from languagegroundedsemseg_tpu.ops.spconv import sparse_conv_parent
            comp = graph.maps.get(gm.companion) if gm.companion else None
            idx_down = comp.idx if comp is not None and comp.idx.shape[1] > 1 else None
            return sparse_conv_parent(x, w, gm, b, idx_down=idx_down), "parent"
        if isinstance(gm, MaskedShiftMap):
            paths = [(onehot_window_conv, "onehot"),
                     (masked_shift_conv, "mshift")]
            for fn, nm in paths:
                out = fn(x, w, gm, b)
                if out is not None:
                    return out, nm
        companion_parent = None
        if km.companion:
            cpm = graph.gmaps.get(km.companion)
            if isinstance(cpm, ParentMap):
                companion_parent = (cpm.parent, cpm.kslot)
        return sparse_conv(x, w, km.idx, b, center_slot=km.center_slot,
                           mirror_perm=km.mirror_perm,
                           companion_parent=companion_parent), "flat"

    def timeit(f, *args, iters=8):
        out = f(*args)
        _ = float(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        _ = float(out.ravel()[0])
        return (time.perf_counter() - t0) / iters

    total = 0.0
    rows = []
    key = jax.random.PRNGKey(0)
    for label, map_name, in_lvl, out_lvl, cin, cout, count in inv:
        if count <= 0:
            continue
        x = jax.device_put(jax.random.normal(key, (caps[in_lvl], cin), jnp.float32))
        if map_name is None:
            k = 1
        else:
            k = graph.maps[map_name].idx.shape[0]
        w = jax.device_put(0.05 * jax.random.normal(key, (k, cin, cout), jnp.float32))

        path_holder = {}

        def f(x, w):
            out, p = dispatch(map_name, x, w, None)
            path_holder["p"] = p
            return out

        jf = jax.jit(f)
        dt = timeit(jf, x, w)
        tot = dt * count * 1e3
        total += tot
        rows.append((label, path_holder.get("p", "?"), in_lvl, cin, cout, count, dt * 1e3, tot))
        print(f"... {label:12s} {rows[-1][1]:7s} {dt * 1e3:8.2f} ms/call",
              flush=True)

    print(f"{'layer':12s} {'path':7s} {'lvl':3s} {'cin':4s} {'cout':4s} {'n':2s} {'ms/call':>8s} {'total':>8s}")
    for r in rows:
        print(f"{r[0]:12s} {r[1]:7s} {r[2]:3d} {r[3]:4d} {r[4]:4d} {r[5]:2d} {r[6]:8.2f} {r[7]:8.2f}")
    print(f"sum of convs: {total:.1f} ms")


if __name__ == "__main__":
    main()
