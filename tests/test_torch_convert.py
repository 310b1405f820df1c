"""Torch checkpoint -> flax parameter mapping (Model-Zoo import path)."""

import numpy as np
import jax
import jax.numpy as jnp

from languagegroundedsemseg_tpu.models.res16unet import Res16UNet14A, res16unet_graph_spec
from languagegroundedsemseg_tpu.sparse import build_graph
from languagegroundedsemseg_tpu.sparse.graph_host import default_capacities, pack_keys
from languagegroundedsemseg_tpu.train.checkpoints import (
    me_kernel_permutation,
    torch_to_flax_params,
)
from oracles import make_cloud


def test_me_kernel_permutation_is_axis_reversal():
    """ME enumerates cube offsets first-axis-fastest; ours last-axis-fastest
    (sparse/offsets.py itertools.product). The derived permutation must map
    slot k of an ME kernel onto the slot whose canonical offset matches."""
    import itertools

    from languagegroundedsemseg_tpu.sparse.offsets import hypercube_offsets

    for k in (2, 3, 5):
        ours = hypercube_offsets(k, d=3)  # (K, 3), z fastest
        per_axis = sorted(set(ours[:, 0].tolist()))
        # ME order: x fastest == product with reversed axis nesting
        me = np.array(
            [(x, y, z) for z, y, x in itertools.product(per_axis, per_axis, per_axis)],
            np.int32,
        )
        perm = me_kernel_permutation(k**3)
        assert perm is not None
        np.testing.assert_array_equal(me[perm], ours)
    assert me_kernel_permutation(7) is None  # hypercross: not a cube
    assert me_kernel_permutation(1) is None  # pointwise: identity anyway


def test_me_permutation_applied_to_3d_kernels():
    """torch_to_flax_params default ('me') reorders 27-slot kernels."""
    sd = {"conv0p1s1.kernel": np.arange(27, dtype=np.float32)[:, None, None] * np.ones((27, 3, 32), np.float32)}
    tmpl = {"conv0p1s1": {"kernel": np.zeros((27, 3, 32), np.float32)}}
    from flax.core import FrozenDict

    params, _, skipped = torch_to_flax_params(sd, FrozenDict(tmpl), FrozenDict({}))
    assert not skipped
    got = np.asarray(params["conv0p1s1"]["kernel"])[:, 0, 0]
    perm = me_kernel_permutation(27)
    np.testing.assert_array_equal(got, perm.astype(np.float32))


def test_torch_state_dict_maps_onto_flax_tree():
    rng = np.random.default_rng(0)
    coords = make_cloud(rng, n=200)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    spec = res16unet_graph_spec()
    g = build_graph(coords, spec, default_capacities(256, 5, ratios=[1] * 5))
    feats = jnp.zeros((256, 3))
    model = Res16UNet14A(out_channels=20)
    variables = model.init(jax.random.PRNGKey(0), feats, g, train=False)

    # A reference-style state dict subset (module paths as ME/torch emits them)
    sd = {
        "model.conv0p1s1.kernel": np.full((27, 3, 32), 0.5, np.float32),
        "bn0.bn.weight": np.full((32,), 2.0, np.float32),
        "bn0.bn.bias": np.full((32,), 3.0, np.float32),
        "bn0.bn.running_mean": np.full((32,), 4.0, np.float32),
        "bn0.bn.running_var": np.full((32,), 5.0, np.float32),
        "module.block1.0.conv1.kernel": np.full((27, 32, 32), 6.0, np.float32),
        "final.kernel": np.full((1, 96, 20), 7.0, np.float32),
        "final.bias": np.full((20,), 8.0, np.float32),
        "some.unmatched.tensor": np.zeros((9, 9), np.float32),
    }
    params, stats, skipped = torch_to_flax_params(
        sd, variables["params"], variables["batch_stats"]
    )
    assert "some.unmatched.tensor" in skipped

    assert float(np.asarray(params["conv0p1s1"]["kernel"]).mean()) == 0.5
    assert float(np.asarray(params["block1_0"]["conv1"]["kernel"]).mean()) == 6.0
    # BN affine + running stats routed through the Norm wrapper
    flat = jax.tree_util.tree_leaves_with_path(params)
    bn_scale = [v for p, v in flat if "bn0" in str(p) and "scale" in str(p)]
    assert bn_scale and float(np.asarray(bn_scale[0]).mean()) == 2.0
    flat_s = jax.tree_util.tree_leaves_with_path(stats)
    bn_mean = [v for p, v in flat_s if "bn0" in str(p) and "mean" in str(p)]
    assert bn_mean and float(np.asarray(bn_mean[0]).mean()) == 4.0
