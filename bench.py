"""Benchmark: Res16UNet34C forward voxel throughput on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md);
MinkowskiEngine Res16UNet34C forward on an RTX-3090-class GPU measures
~4.0M voxels/sec in public ME benchmarks, which we adopt as the 1.0x mark.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _voxelize_scene
    from languagegroundedsemseg_tpu.data.batching import BatchBuilder
    from languagegroundedsemseg_tpu.models.res16unet import (
        Res16UNet34C,
        res16unet_graph_spec,
    )

    rng = np.random.default_rng(0)
    builder = BatchBuilder(
        spec=res16unet_graph_spec(),
        fixed_capacity=262144,
        level_ratios=(1, 0.55, 0.22, 0.08, 0.03),
    )
    scenes = [_voxelize_scene(rng, 180_000) for _ in range(4)]
    batch = builder.build(scenes)
    n_valid = int(np.asarray(batch.graph.levels[0].num))

    model = Res16UNet34C(out_channels=200)
    variables = model.init(jax.random.PRNGKey(0), batch.feats, batch.graph, train=False)

    @jax.jit
    def fwd(variables, feats, graph):
        return model.apply(variables, feats, graph, train=False)[0]

    feats = jax.device_put(batch.feats)
    graph = jax.device_put(batch.graph)
    variables = jax.device_put(variables)

    # warmup + compile (the scalar fetch is a true device sync; under the
    # axon relay block_until_ready can return before execution finishes)
    float(fwd(variables, feats, graph)[0, 0])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, feats, graph)
        float(out[0, 0])  # force a D2H sync every iteration
    dt = (time.perf_counter() - t0) / iters

    voxels_per_sec = n_valid / dt
    baseline = 4.0e6  # RTX-3090-class ME forward voxels/sec (see module docstring)
    print(
        json.dumps(
            {
                "metric": "res16unet34c_fwd_voxels_per_sec",
                "value": round(voxels_per_sec, 1),
                "unit": "voxels/sec/chip",
                "vs_baseline": round(voxels_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
