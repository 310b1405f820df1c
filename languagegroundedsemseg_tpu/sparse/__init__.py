"""Sparse voxel grid engine: coordinates, quantization, kernel maps.

TPU-native replacement for the MinkowskiEngine coordinate manager
(reference: consumed throughout /root/reference, e.g. models/modules/common.py:192-203,
lib/voxelizer.py:142). Everything is fixed-capacity and static-shaped so the
compute graph compiles once per capacity bucket.
"""

from languagegroundedsemseg_tpu.sparse.offsets import (
    KernelRegion,
    hypercube_offsets,
    hypercross_offsets,
    region_offsets,
)
from languagegroundedsemseg_tpu.sparse.types import SparseLevel, KernelMap, ConvGraph
from languagegroundedsemseg_tpu.sparse.graph_host import (
    GraphSpec,
    MapSpec,
    build_graph,
    quantize,
    pack_keys,
)

__all__ = [
    "KernelRegion",
    "hypercube_offsets",
    "hypercross_offsets",
    "region_offsets",
    "SparseLevel",
    "KernelMap",
    "ConvGraph",
    "GraphSpec",
    "MapSpec",
    "build_graph",
    "quantize",
    "pack_keys",
]
