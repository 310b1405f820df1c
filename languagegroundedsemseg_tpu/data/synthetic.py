"""Synthetic indoor-scene point clouds for tests and benchmarks.

Produces ScanNet-like geometry (floor + walls + box 'furniture' with per-
surface colors and labels) so kernels and the input pipeline can be exercised
and benchmarked at realistic voxel occupancy without the dataset on disk.
"""

from __future__ import annotations

import numpy as np


def _surface_points(rng, n, origin, u_vec, v_vec):
    u = rng.random(n)[:, None]
    v = rng.random(n)[:, None]
    return origin[None, :] + u * u_vec[None, :] + v * v_vec[None, :]


def synthetic_scene(
    rng: np.random.Generator,
    num_points: int = 120_000,
    extent: float = 6.0,
    height: float = 2.6,
    num_objects: int = 12,
    num_classes: int = 200,
    noise: float = 0.005,
    return_instances: bool = False,
):
    """Returns (xyz float32 (N,3) meters, rgb float32 (N,3) in [0,255],
    labels int32 (N,)) and, if return_instances, per-point instance ids
    (walls/floor = -1, each furniture box its own id)."""
    ex = extent * (0.7 + 0.6 * rng.random())
    ey = extent * (0.7 + 0.6 * rng.random())
    parts = []

    # floor (label 0 ~ wall/floor head classes), walls
    wall_specs = [
        (np.array([0.0, 0.0, 0.0]), np.array([ex, 0, 0]), np.array([0, ey, 0]), 1),
        (np.array([0.0, 0.0, 0.0]), np.array([ex, 0, 0]), np.array([0, 0, height]), 0),
        (np.array([0.0, ey, 0.0]), np.array([ex, 0, 0]), np.array([0, 0, height]), 0),
        (np.array([0.0, 0.0, 0.0]), np.array([0, ey, 0]), np.array([0, 0, height]), 0),
        (np.array([ex, 0.0, 0.0]), np.array([0, ey, 0]), np.array([0, 0, height]), 0),
    ]
    areas = np.array([np.linalg.norm(np.cross(u, v)) for _, u, v, _ in wall_specs])
    wall_frac = 0.55
    wall_n = (areas / areas.sum() * num_points * wall_frac).astype(int)
    for (o, u, v, lab), n in zip(wall_specs, wall_n):
        pts = _surface_points(rng, n, o, u, v)
        col = np.full((n, 3), 140.0) + rng.normal(0, 12, (n, 3))
        labs = np.full(n, lab, dtype=np.int32)
        parts.append((pts, col, labs, np.full(n, -1, dtype=np.int32)))

    # furniture boxes
    remaining = num_points - int(wall_n.sum())
    per_obj = max(remaining // max(num_objects, 1), 1)
    for obj_id in range(num_objects):
        size = np.array([0.3, 0.3, 0.2]) + rng.random(3) * np.array([1.2, 1.2, 1.0])
        pos = np.array([rng.random() * (ex - size[0]), rng.random() * (ey - size[1]), 0.0])
        lab = int(rng.integers(2, num_classes))
        base_col = rng.random(3) * 255.0
        # sample the 5 visible faces of the box
        faces = [
            (pos + np.array([0, 0, size[2]]), np.array([size[0], 0, 0]), np.array([0, size[1], 0])),
            (pos, np.array([size[0], 0, 0]), np.array([0, 0, size[2]])),
            (pos + np.array([0, size[1], 0]), np.array([size[0], 0, 0]), np.array([0, 0, size[2]])),
            (pos, np.array([0, size[1], 0]), np.array([0, 0, size[2]])),
            (pos + np.array([size[0], 0, 0]), np.array([0, size[1], 0]), np.array([0, 0, size[2]])),
        ]
        n_face = max(per_obj // 5, 1)
        for o, u, v in faces:
            pts = _surface_points(rng, n_face, o, u, v)
            col = base_col[None, :] + rng.normal(0, 8, (n_face, 3))
            parts.append((pts, col, np.full(n_face, lab, dtype=np.int32),
                          np.full(n_face, obj_id, dtype=np.int32)))

    xyz = np.concatenate([p[0] for p in parts]).astype(np.float32)
    rgb = np.clip(np.concatenate([p[1] for p in parts]), 0, 255).astype(np.float32)
    labels = np.concatenate([p[2] for p in parts]).astype(np.int32)
    inst = np.concatenate([p[3] for p in parts]).astype(np.int32)
    xyz += rng.normal(0, noise, xyz.shape).astype(np.float32)

    perm = rng.permutation(len(xyz))[:num_points]
    if return_instances:
        return xyz[perm], rgb[perm], labels[perm], inst[perm]
    return xyz[perm], rgb[perm], labels[perm]
