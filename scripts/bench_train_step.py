"""Full train step (fwd + bwd + SGD) on the real chip, bench.py shapes.

Round-1 baseline: 2125 ms (scatter backward) / 1230 ms (gather-only flat
backward). The fused conv paths (masked-shift + one-hot) change both the
forward and the backward.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _voxelize_scene
    from languagegroundedsemseg_tpu.data.batching import BatchBuilder
    from languagegroundedsemseg_tpu.models.res16unet import (
        Res16UNet34C,
        res16unet_graph_spec,
    )
    from languagegroundedsemseg_tpu.losses.classification import cross_entropy_loss

    rng = np.random.default_rng(0)
    builder = BatchBuilder(
        spec=res16unet_graph_spec(), fixed_capacity=262144,
        level_ratios=(1, 0.55, 0.22, 0.08, 0.03),
    )
    scenes = [_voxelize_scene(rng, 180_000) for _ in range(4)]
    batch = builder.build(scenes)
    n_valid = int(np.asarray(batch.graph.levels[0].num))

    model = Res16UNet34C(out_channels=200)
    variables = model.init(jax.random.PRNGKey(0), batch.feats, batch.graph, train=True)
    tx = optax.sgd(0.1, momentum=0.9)
    params = variables["params"]
    stats = variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, feats, labels, graph):
        def loss_fn(p):
            out, new_vars = model.apply(
                {"params": p, "batch_stats": stats}, feats, graph,
                train=True, mutable=["batch_stats"],
            )
            logits = out[0]
            return cross_entropy_loss(logits, labels, ignore_index=255), new_vars

        (loss, new_vars), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_vars["batch_stats"], opt_state, loss

    feats = jax.device_put(batch.feats)
    labels = jax.device_put(batch.labels)
    graph = jax.device_put(batch.graph)

    params, stats, opt_state, loss = step(params, stats, opt_state, feats, labels, graph)
    _ = float(loss)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        params, stats, opt_state, loss = step(params, stats, opt_state, feats, labels, graph)
        _ = float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"train step: {dt*1e3:.1f} ms ({n_valid/dt/1e6:.3f} Mvox/s) "
          f"[r1: 1230 ms gather-only flat]")


if __name__ == "__main__":
    main()
