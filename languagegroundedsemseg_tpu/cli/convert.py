"""Torch-checkpoint converter CLI.

    python -m languagegroundedsemseg_tpu.cli.convert \
        --ckpt Res16UNet34C.pth --model Res16UNet34C --out-channels 200 \
        --out converted.ckpt

Imports a reference Model Zoo checkpoint (reference README.md:144-149) into
this framework's flax parameter tree — name translation, lenient
shape-matched loading (reference lib/utils.py:17-45), and the ME->canonical
kernel-slot permutation (train/checkpoints.py:me_kernel_permutation) — and
serializes {"params", "batch_stats"} with flax.serialization. The output
loads via Config.weights or restore into a TrainState template.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="torch .pth/.ckpt state dict")
    ap.add_argument("--model", default="Res16UNet34C")
    ap.add_argument("--out-channels", type=int, default=200)
    ap.add_argument("--in-channels", type=int, default=3)
    ap.add_argument("--out", required=True, help="output flax checkpoint path")
    ap.add_argument("--no-kernel-perm", action="store_true",
                    help="skip the ME->canonical kernel-slot permutation")
    args = ap.parse_args(argv)

    import jax
    from flax import serialization

    from languagegroundedsemseg_tpu.data.batching import BatchBuilder
    from languagegroundedsemseg_tpu.models import load_model
    from languagegroundedsemseg_tpu.models.res16unet import res16unet_graph_spec
    from languagegroundedsemseg_tpu.train.checkpoints import (
        load_torch_state_dict,
        torch_to_flax_params,
    )

    model_cls = load_model(args.model)
    model = model_cls(out_channels=args.out_channels)

    rng = np.random.default_rng(0)
    coords = rng.integers(0, 64, (512, 3)).astype(np.int32)
    feats = rng.normal(size=(512, args.in_channels)).astype(np.float32)
    spec_fn = getattr(model, "graph_spec", None) or res16unet_graph_spec
    builder = BatchBuilder(spec=spec_fn(), fixed_capacity=1024)
    batch = builder.build([(coords, feats, None)])
    variables = model.init(jax.random.PRNGKey(0), batch.feats, batch.graph, train=False)

    sd = load_torch_state_dict(args.ckpt)
    params, stats, skipped = torch_to_flax_params(
        sd, variables["params"], variables.get("batch_stats", {}),
        kernel_perm=None if args.no_kernel_perm else "me",
    )
    print(f"mapped {len(sd) - len(skipped)}/{len(sd)} tensors; skipped:")
    for s in skipped:
        print(f"  {s}")
    blob = serialization.to_bytes({"params": params, "batch_stats": stats})
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
