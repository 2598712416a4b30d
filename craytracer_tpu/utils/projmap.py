"""Projection maps for point-light culling (projmap.h:20-220).

The reference's photon-mapping leftover: for each point light, find the
bounding spheres of caustic-generating (specular/glass/mirror) objects and
rasterize their angular footprints into a lat-long visibility bitmask, so
photon emission can be restricted to directions that can produce caustics.
Grid: THETA_ROW x PHI_COLUMN (26 x 52, util/constants.h:53-54).

Vectorized re-design: sphere footprints are tested analytically against the
cell-center directions in one [cells, spheres] computation instead of the
reference's per-cell scanline walk.
"""

from __future__ import annotations

import numpy as np

from craytracer_tpu.scene import types as T

THETA_ROW = 26
PHI_COLUMN = 52


def caustic_bounding_spheres(scene: T.Scene) -> np.ndarray:
    """[K, 4] (center, radius) of specular-material objects
    (calcCausticBoundingSpheres, projmap.h:20-120)."""
    mats = np.asarray(scene.materials.mat_type)
    caustic_types = {T.MAT_MIRROR, T.MAT_TRANSPARENT, T.MAT_GLASS, T.MAT_METAL}

    def is_caustic(mat_id):
        return int(mats[mat_id]) in caustic_types

    out = []
    sp = scene.spheres
    for i in range(sp.mat_id.shape[0]):
        if is_caustic(int(sp.mat_id[i])):
            out.append([*np.asarray(sp.center[i]), float(sp.radius[i])])
    tr = scene.triangles
    tri_mat = np.asarray(tr.mat_id)
    caustic_tris = np.array([is_caustic(int(m)) for m in tri_mat], bool)
    if caustic_tris.any():
        v = np.stack([np.asarray(tr.v0)[caustic_tris],
                      np.asarray(tr.v1)[caustic_tris],
                      np.asarray(tr.v2)[caustic_tris]], axis=1).reshape(-1, 3)
        c = v.mean(axis=0)
        r = float(np.linalg.norm(v - c, axis=-1).max())
        out.append([*c, r])
    inst = scene.instanced
    for i in range(inst.mat_id.shape[0]):
        if is_caustic(int(inst.mat_id[i])):
            # conservative: invert the affine on the canonical unit bound
            a = np.asarray(inst.inv_transform[i])
            fwd = np.linalg.inv(a[:, :3])
            center = fwd @ (-a[:, 3])
            scale = float(np.linalg.norm(fwd, 2))
            p = np.asarray(inst.params[i])
            canon_r = float(max(p[0], p[1], 1.0)) * np.sqrt(3.0)
            out.append([*center, scale * canon_r])
    return np.asarray(out, np.float32).reshape(-1, 4)


def build_proj_map(light_pos, spheres: np.ndarray):
    """(mask[THETA_ROW * PHI_COLUMN] bool, coverage fraction) — buildProjMap
    (projmap.h:187-220) for one point light."""
    if spheres.shape[0] == 0:
        return np.zeros(THETA_ROW * PHI_COLUMN, bool), 0.0
    light_pos = np.asarray(light_pos, np.float64)
    theta = (np.arange(THETA_ROW) + 0.5) / THETA_ROW * np.pi
    phi = (np.arange(PHI_COLUMN) + 0.5) / PHI_COLUMN * 2.0 * np.pi
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    dirs = np.stack([np.sin(tt) * np.cos(pp), np.cos(tt), np.sin(tt) * np.sin(pp)],
                    axis=-1).reshape(-1, 3)

    to_c = spheres[None, :, :3].astype(np.float64) - light_pos  # [1, K, 3]
    dist = np.linalg.norm(to_c, axis=-1)  # [1, K]
    safe = np.maximum(dist, 1e-9)
    cos_to_center = (dirs[:, None, :] * (to_c / safe[..., None])).sum(-1)  # [C, K]
    sin_half = np.clip(spheres[None, :, 3] / safe, 0.0, 1.0)
    cos_half = np.sqrt(1.0 - sin_half * sin_half)
    inside = dist < spheres[None, :, 3]  # light inside a sphere: everything
    # pad by one cell diagonal so footprints cover partially-touched cells
    pad = np.pi / THETA_ROW
    hit = (cos_to_center >= np.cos(np.minimum(np.arccos(np.clip(cos_half, -1, 1)) + pad,
                                              np.pi))) | inside
    mask = hit.any(axis=1)
    return mask, float(mask.mean())
