"""Dump reference per-voxel activations for the parity harness.

RUN THIS IN THE REFERENCE ENVIRONMENT (torch + MinkowskiEngine + the
RozDavid/LanguageGroundedSemseg repo on PYTHONPATH), not here:

    python dump_reference_acts.py --ply scene0000_00.ply \
        --ckpt Res16UNet34C.pth --out ref_acts.npz

It voxelizes one scene at 2 cm exactly as the reference eval path does
(no augmentation), runs the ME Res16UNet forward, and saves
{coords (N,4), feats (N,C), logits (N,L)} — the npz consumed by
tests/test_parity.py::test_per_voxel_logits_parity via LGS_REF_ACTS.
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--model", default="Res16UNet34C")
    ap.add_argument("--num-labels", type=int, default=200)
    ap.add_argument("--voxel-size", type=float, default=0.02)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import MinkowskiEngine as ME
    import torch
    from plyfile import PlyData

    ply = PlyData.read(args.ply)["vertex"]
    xyz = np.stack([ply["x"], ply["y"], ply["z"]], 1).astype(np.float32)
    rgb = np.stack([ply["red"], ply["green"], ply["blue"]], 1).astype(np.float32)

    coords = np.floor(xyz / args.voxel_size)
    coords, feats = ME.utils.sparse_quantize(coords, rgb)
    feats = feats / 255.0 - 0.5
    coords = ME.utils.batched_coordinates([coords])

    from models import load_model  # reference repo

    class Cfg:  # minimal reference config surface
        bn_momentum = 0.02
        conv1_kernel_size = 3
        weights_for_inner_model = False
        dilations = [1, 1, 1, 1]

    net = load_model(args.model)(3, args.num_labels, Cfg())
    sd = torch.load(args.ckpt, map_location="cpu")
    sd = sd.get("state_dict", sd)
    sd = {k.split("model.", 1)[-1] if k.startswith("model.") else k: v for k, v in sd.items()}
    net.load_state_dict(sd, strict=False)
    net.eval()

    with torch.no_grad():
        x = ME.SparseTensor(torch.as_tensor(np.asarray(feats), dtype=torch.float32),
                            torch.as_tensor(np.asarray(coords)))
        out, _ = net(x)
    np.savez(
        args.out,
        coords=np.asarray(coords),
        feats=np.asarray(feats, np.float32),
        logits=out.F.numpy(),
    )
    print(f"wrote {args.out}: {len(np.asarray(coords))} voxels")


if __name__ == "__main__":
    main()
