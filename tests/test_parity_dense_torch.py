"""Dense-torch oracle parity for Res16UNet34C (BASELINE.md parity check #1,
runnable with no external files).

An INDEPENDENT torch implementation of the reference network semantics —
dense ``F.conv3d`` / ``F.conv_transpose3d`` over per-level occupied-voxel
masks, MinkowskiEngine kernel-slot order (first spatial axis fastest,
kernel_region.hpp), eval-mode BatchNorm (eps 1e-5) — consumes a synthetic
reference-format state_dict (module paths exactly as the reference emits
them: conv0p1s1.kernel, bn0.bn.weight, block5.0.downsample.0.kernel, ...,
models/res16unet.py + models/modules/resnet_block.py) and produces
per-voxel logits. The same state_dict goes through our Model-Zoo import
path (train/checkpoints.py:torch_to_flax_params) into the flax model; the
two must agree per voxel.

What this pins down, independently of our sparse engine's own oracles:
  - the ME kernel-slot -> canonical-offset permutation on import,
  - stride-2 / transpose-conv coordinate semantics (out sets = downsample
    pyramid; children 2p+{0,1}^3),
  - BN/ReLU/skip-concat wiring and the converter's complete name coverage.

The oracle runs in float64 so the tolerance measures only our f32 error.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

G = 16  # dense grid edge (voxel coords in [0, G)^3); power of 2 (>= 2**4 levels)
PLANES = (32, 64, 128, 256, 256, 128, 96, 96)  # Res16UNet34C
LAYERS = (2, 3, 4, 6, 2, 2, 2, 2)
INIT = 32
C_IN, C_OUT = 3, 20


# ---- ME kernel-slot geometry (independent of sparse/offsets.py) ------------


def _me_slot_offsets(k: int):
    """ME enumerates hypercube offsets with the FIRST axis fastest; odd
    kernels span [-(k-1)/2, (k-1)/2], even kernels span [0, k)."""
    lo = 0 if k % 2 == 0 else -(k // 2)
    rng = [lo + i for i in range(k)]
    out = []
    for z in rng:
        for y in rng:
            for x in rng:
                out.append((x, y, z))
    # first axis fastest == x fastest given the (z, y, x) loop nesting above
    return out


def _w_conv3(w_me):
    """(27, Cin, Cout) ME-order -> torch conv3d weight (Cout, Cin, 3,3,3)."""
    c_in, c_out = w_me.shape[1], w_me.shape[2]
    w = torch.zeros((c_out, c_in, 3, 3, 3), dtype=w_me.dtype)
    for k, (x, y, z) in enumerate(_me_slot_offsets(3)):
        w[:, :, x + 1, y + 1, z + 1] = w_me[k].T
    return w


def _w_down(w_me):
    """(8, Cin, Cout) ME-order -> conv3d weight (Cout, Cin, 2,2,2), stride 2."""
    c_in, c_out = w_me.shape[1], w_me.shape[2]
    w = torch.zeros((c_out, c_in, 2, 2, 2), dtype=w_me.dtype)
    for k, (x, y, z) in enumerate(_me_slot_offsets(2)):
        w[:, :, x, y, z] = w_me[k].T
    return w


def _w_up(w_me):
    """(8, Cin, Cout) ME-order -> conv_transpose3d weight (Cin, Cout, 2,2,2):
    out(2p + d) += x(p) @ W[k(d)]."""
    c_in, c_out = w_me.shape[1], w_me.shape[2]
    w = torch.zeros((c_in, c_out, 2, 2, 2), dtype=w_me.dtype)
    for k, (x, y, z) in enumerate(_me_slot_offsets(2)):
        w[:, :, x, y, z] = w_me[k]
    return w


# ---- dense oracle ----------------------------------------------------------


class Oracle:
    """Dense-grid evaluation of the reference graph; tensors are
    (1, C, G_l, G_l, G_l) float64, masked to the level's occupied set after
    every op (a sparse tensor IS exactly that)."""

    def __init__(self, sd, coords):
        self.sd = {k: torch.as_tensor(v, dtype=torch.float64) for k, v in sd.items()}
        self.masks = []
        occ = np.unique(coords, axis=0)
        for lvl in range(5):
            g = G >> lvl
            m = torch.zeros((1, 1, g, g, g), dtype=torch.float64)
            m[0, 0, occ[:, 0], occ[:, 1], occ[:, 2]] = 1.0
            self.masks.append(m)
            occ = np.unique(occ // 2, axis=0)

    def conv3(self, x, name, lvl):
        # stride-1 k3 at level lvl: dilation on the ORIGINAL grid is the
        # tensor stride, but on the level's own downsampled grid it is 1
        w = _w_conv3(self.sd[f"{name}.kernel"])
        return F.conv3d(x, w, padding=1) * self.masks[lvl]

    def k1(self, x, name, lvl, bias=False):
        w = self.sd[f"{name}.kernel"]
        if w.ndim == 3:
            w = w[0]
        y = torch.einsum("bcxyz,co->boxyz", x, w)
        if bias:
            y = y + self.sd[f"{name}.bias"][None, :, None, None, None]
        return y * self.masks[lvl]

    def down(self, x, name, lvl_out):
        w = _w_down(self.sd[f"{name}.kernel"])
        return F.conv3d(x, w, stride=2) * self.masks[lvl_out]

    def up(self, x, name, lvl_out):
        w = _w_up(self.sd[f"{name}.kernel"])
        return F.conv_transpose3d(x, w, stride=2) * self.masks[lvl_out]

    def bn(self, x, name, lvl):
        g = self.sd[f"{name}.bn.weight"]
        b = self.sd[f"{name}.bn.bias"]
        m = self.sd[f"{name}.bn.running_mean"]
        v = self.sd[f"{name}.bn.running_var"]
        sh = (1, -1, 1, 1, 1)
        y = (x - m.view(sh)) / torch.sqrt(v.view(sh) + 1e-5)
        return (y * g.view(sh) + b.view(sh)) * self.masks[lvl]

    def relu(self, x):
        return F.relu(x)

    def block(self, x, name, lvl, c_in, c_out):
        res = x
        out = self.conv3(x, f"{name}.conv1", lvl)
        out = self.relu(self.bn(out, f"{name}.norm1", lvl))
        out = self.conv3(out, f"{name}.conv2", lvl)
        out = self.bn(out, f"{name}.norm2", lvl)
        if c_in != c_out:
            res = self.k1(x, f"{name}.downsample.0", lvl)
            res = self.bn(res, f"{name}.downsample.1", lvl)
        return self.relu(out + res)

    def forward(self, feats_grid):
        out = self.conv3(feats_grid, "conv0p1s1", 0)
        out_p1 = self.relu(self.bn(out, "bn0", 0))

        skips, out, c = [], out_p1, INIT
        for e in range(4):
            lvl = e + 1
            out = self.down(out, f"conv{lvl}p{1 << e}s2", lvl)
            out = self.relu(self.bn(out, f"bn{lvl}", lvl))
            for i in range(LAYERS[e]):
                out = self.block(out, f"block{lvl}.{i}", lvl, c, PLANES[e])
                c = PLANES[e]
            skips.append(out)

        dec_skips = [(skips[2], PLANES[2]), (skips[1], PLANES[1]),
                     (skips[0], PLANES[0]), (out_p1, INIT)]
        for d in range(4):
            lvl = 4 - d
            out = self.up(out, f"convtr{4 + d}p{1 << lvl}s2", lvl - 1)
            out = self.relu(self.bn(out, f"bntr{4 + d}", lvl - 1))
            skip, _ = dec_skips[d]
            out = torch.cat([out, skip], dim=1)
            c = out.shape[1]
            for i in range(LAYERS[4 + d]):
                out = self.block(out, f"block{5 + d}.{i}", lvl - 1, c, PLANES[4 + d])
                c = PLANES[4 + d]
        return self.k1(out, "final", 0, bias=True)


# ---- reference-format state_dict generator ---------------------------------


def make_state_dict(rng):
    sd = {}

    def conv(name, k, ci, co):
        sd[f"{name}.kernel"] = (rng.normal(size=(k, ci, co)) * (0.6 / np.sqrt(k * ci))).astype(np.float32)

    def k1(name, ci, co, bias=False):
        sd[f"{name}.kernel"] = (rng.normal(size=(ci, co)) * (0.6 / np.sqrt(ci))).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = (0.1 * rng.normal(size=(co,))).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.bn.weight"] = rng.uniform(0.6, 1.4, size=(c,)).astype(np.float32)
        sd[f"{name}.bn.bias"] = (0.1 * rng.normal(size=(c,))).astype(np.float32)
        sd[f"{name}.bn.running_mean"] = (0.1 * rng.normal(size=(c,))).astype(np.float32)
        sd[f"{name}.bn.running_var"] = rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32)

    def block(name, ci, co):
        conv(f"{name}.conv1", 27, ci, co)
        bn(f"{name}.norm1", co)
        conv(f"{name}.conv2", 27, co, co)
        bn(f"{name}.norm2", co)
        if ci != co:
            k1(f"{name}.downsample.0", ci, co)
            bn(f"{name}.downsample.1", co)

    conv("conv0p1s1", 27, C_IN, INIT)
    bn("bn0", INIT)
    c = INIT
    for e in range(4):
        lvl = e + 1
        conv(f"conv{lvl}p{1 << e}s2", 8, c, c)
        bn(f"bn{lvl}", c)
        for i in range(LAYERS[e]):
            block(f"block{lvl}.{i}", c, PLANES[e])
            c = PLANES[e]
    skip_c = [PLANES[2], PLANES[1], PLANES[0], INIT]
    for d in range(4):
        lvl = 4 - d
        conv(f"convtr{4 + d}p{1 << lvl}s2", 8, c, PLANES[4 + d])
        bn(f"bntr{4 + d}", PLANES[4 + d])
        c = PLANES[4 + d] + skip_c[d]
        for i in range(LAYERS[4 + d]):
            block(f"block{5 + d}.{i}", c, PLANES[4 + d])
            c = PLANES[4 + d]
    k1("final", c, C_OUT, bias=True)
    return sd


@pytest.mark.slow  # ~38 s: full-width 34C in f64 torch. The committed
# fixture tests (tests/test_parity.py tier 1) pin the same import path in
# the fast tier against this oracle's recorded activations.
def test_res16unet34c_matches_dense_torch_oracle():
    import jax

    from languagegroundedsemseg_tpu.data.batching import BatchBuilder
    from languagegroundedsemseg_tpu.models.res16unet import (
        Res16UNet34C,
        res16unet_graph_spec,
    )
    from languagegroundedsemseg_tpu.train.checkpoints import torch_to_flax_params

    rng = np.random.default_rng(3)
    n = 600
    coords = np.unique(rng.integers(0, G, size=(n, 3)).astype(np.int32), axis=0)
    feats = rng.normal(size=(len(coords), C_IN)).astype(np.float32)

    sd = make_state_dict(rng)

    # ---- ours: reference state_dict -> converter -> flax forward ----------
    builder = BatchBuilder(spec=res16unet_graph_spec())
    labels = np.zeros(len(coords), np.int32)
    batch, layout = builder.build([(coords, feats, labels)], return_layout=True)
    model = Res16UNet34C(out_channels=C_OUT)
    variables = model.init(jax.random.PRNGKey(0), batch.feats, batch.graph, train=False)
    params, stats, skipped = torch_to_flax_params(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    assert not skipped, f"converter skipped reference tensors: {skipped[:8]}"
    # full coverage the other way: every flax leaf got a reference tensor
    n_leaves = len(jax.tree_util.tree_leaves(variables["params"])) + len(
        jax.tree_util.tree_leaves(variables.get("batch_stats", {}))
    )
    assert len(sd) == n_leaves, (len(sd), n_leaves)

    logits, _ = model.apply(
        {"params": params, "batch_stats": stats}, batch.feats, batch.graph, train=False
    )
    got = np.asarray(logits)[layout["pos0"]]

    # ---- oracle: dense torch forward over the same state_dict -------------
    grid = torch.zeros((1, C_IN, G, G, G), dtype=torch.float64)
    grid[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = torch.as_tensor(
        feats.T, dtype=torch.float64
    )
    want_grid = Oracle(sd, coords).forward(grid)
    # builder kept-row i corresponds to original input row layout["order"][i]
    rows = coords[layout["order"]]
    want = want_grid[0, :, rows[:, 0], rows[:, 1], rows[:, 2]].T.numpy()

    assert got.shape == want.shape
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 1e-3, f"per-voxel logits relative error {err}"
