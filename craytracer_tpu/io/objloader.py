"""Wavefront OBJ/MTL loader (numpy host-side).

Functional replacement for the reference's 953-line C parser
(`objloader/objloader.h:738-936`): groups split on `g`/`usemtl`/`o`,
per-group vertex dedup (the HashIndex+VertexIndex cache becomes np.unique
over (v, vt, vn) index triples), faces triangulated fan-wise, MTL materials
parsed into dicts. A C++ fast path can be slotted under the same interface.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class OBJShape:
    name: str = ""
    mat_name: str = ""
    positions: np.ndarray = None  # [V, 3]
    normals: np.ndarray = None  # [V, 3] or None
    texcoords: np.ndarray = None  # [V, 2] or None
    indices: np.ndarray = None  # [F, 3] int32


@dataclass
class OBJMaterial:
    name: str = ""
    ka: tuple = (0.0, 0.0, 0.0)
    kd: tuple = (0.5, 0.5, 0.5)
    ks: tuple = (0.0, 0.0, 0.0)
    ke: tuple = (0.0, 0.0, 0.0)
    ns: float = 0.0
    ni: float = 1.0
    d: float = 1.0
    illum: int = 2
    map_kd: str = ""
    map_bump: str = ""


def load_mtl(path: str) -> dict[str, OBJMaterial]:
    mats: dict[str, OBJMaterial] = {}
    cur = None
    if not os.path.exists(path):
        return mats
    with open(path, errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                cur = OBJMaterial(name=parts[1] if len(parts) > 1 else "")
                mats[cur.name] = cur
            elif cur is None:
                continue
            elif key in ("Ka", "Kd", "Ks", "Ke") and len(parts) >= 4:
                val = tuple(float(x) for x in parts[1:4])
                setattr(cur, key.lower(), val)
            elif key == "Ns":
                cur.ns = float(parts[1])
            elif key == "Ni":
                cur.ni = float(parts[1])
            elif key == "d":
                cur.d = float(parts[1])
            elif key == "illum":
                cur.illum = int(parts[1])
            elif key == "map_Kd":
                cur.map_kd = parts[-1]
            elif key in ("map_bump", "bump"):
                cur.map_bump = parts[-1]
    return mats


def _parse_face_vert(tok: str):
    """'v', 'v/vt', 'v//vn', 'v/vt/vn' -> (v, vt, vn) with -1 for absent."""
    parts = tok.split("/")
    v = int(parts[0]) if parts[0] else 0
    vt = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    vn = int(parts[2]) if len(parts) > 2 and parts[2] else 0
    return v, vt, vn


def load_obj(path: str, split_groups: bool = True, use_native: bool = True):
    """Returns (shapes: list[OBJShape], materials: dict[str, OBJMaterial]).

    Uses the C++ scanner (native/craynative.cpp) when available — the
    counterpart of the reference's C parser hot loop — and finishes
    group assembly + vertex dedup in numpy."""
    if use_native:
        try:
            from craytracer_tpu.native import load_obj_native

            nat = load_obj_native(path)
        except Exception:
            nat = None
        if nat is not None:
            return _assemble_native(path, nat, split_groups)
    return _load_obj_py(path, split_groups)


def _assemble_native(path, nat, split_groups):
    positions, texcoords, normals, corners, group_rows, mtllib = nat
    base_dir = os.path.dirname(os.path.abspath(path))
    materials = load_mtl(os.path.join(base_dir, mtllib)) if mtllib else {}
    shapes: list[OBJShape] = []
    if not split_groups and group_rows:
        group_rows = [(0, corners.shape[0], group_rows[0][2], group_rows[0][3])]

    for begin, end, name, mat in group_rows:
        tri = corners[begin:end].astype(np.int64)
        if tri.shape[0] == 0:
            continue
        has_vt = texcoords is not None and bool((tri[:, :, 1] >= 0).any())
        has_vn = normals is not None and bool((tri[:, :, 2] >= 0).any())
        v_idx = np.maximum(tri[:, :, 0], 0)
        vt_idx = np.maximum(tri[:, :, 1], 0)
        vn_idx = np.maximum(tri[:, :, 2], 0)
        key = np.stack([v_idx, vt_idx if has_vt else np.zeros_like(v_idx),
                        vn_idx if has_vn else np.zeros_like(v_idx)], axis=-1).reshape(-1, 3)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        shapes.append(OBJShape(
            name=name, mat_name=mat,
            positions=positions[uniq[:, 0]],
            normals=normals[uniq[:, 2]] if has_vn else None,
            texcoords=texcoords[uniq[:, 1]] if has_vt else None,
            indices=inv.reshape(-1, 3).astype(np.int32),
        ))
    return shapes, materials


def _load_obj_py(path: str, split_groups: bool = True):
    """Pure-python fallback parser."""
    positions, texcoords, normals = [], [], []
    materials: dict[str, OBJMaterial] = {}
    shapes: list[OBJShape] = []
    cur_faces: list[tuple] = []  # (v, vt, vn) triples per triangle corner
    cur_name = ""
    cur_mat = ""
    base_dir = os.path.dirname(os.path.abspath(path))

    def flush():
        nonlocal cur_faces
        if not cur_faces:
            return
        tri = np.asarray(cur_faces, np.int64).reshape(-1, 3, 3)

        def resolve(idx, count):
            # OBJ is 1-based; negatives are relative (objloader.h handles both)
            return np.where(idx > 0, idx - 1, np.where(idx < 0, count + idx, 0))

        v_idx = resolve(tri[:, :, 0], len(positions))
        vt_idx = resolve(tri[:, :, 1], len(texcoords))
        vn_idx = resolve(tri[:, :, 2], len(normals))
        has_vt = bool((tri[:, :, 1] != 0).any()) and len(texcoords) > 0
        has_vn = bool((tri[:, :, 2] != 0).any()) and len(normals) > 0

        # Vertex dedup over the used (v, vt, vn) triples — the HashIndex
        # open-addressing cache (objloader/hashindex.h) as np.unique.
        key = np.stack([v_idx, vt_idx if has_vt else np.zeros_like(v_idx),
                        vn_idx if has_vn else np.zeros_like(v_idx)], axis=-1).reshape(-1, 3)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        pos_arr = np.asarray(positions, np.float32)[uniq[:, 0]]
        tex_arr = np.asarray(texcoords, np.float32)[uniq[:, 1]] if has_vt else None
        nrm_arr = np.asarray(normals, np.float32)[uniq[:, 2]] if has_vn else None
        shapes.append(OBJShape(
            name=cur_name, mat_name=cur_mat, positions=pos_arr,
            normals=nrm_arr, texcoords=tex_arr,
            indices=inv.reshape(-1, 3).astype(np.int32),
        ))
        cur_faces = []

    with open(path, errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                positions.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif key == "vt":
                texcoords.append([float(parts[1]), float(parts[2])])
            elif key == "vn":
                normals.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif key == "f":
                verts = [_parse_face_vert(p) for p in parts[1:]]
                for i in range(1, len(verts) - 1):  # fan triangulation
                    cur_faces.extend([verts[0], verts[i], verts[i + 1]])
            elif key in ("g", "o"):
                if split_groups:
                    flush()
                    cur_name = parts[1] if len(parts) > 1 else ""
            elif key == "usemtl":
                if split_groups:
                    flush()
                cur_mat = parts[1] if len(parts) > 1 else ""
            elif key == "mtllib" and len(parts) > 1:
                materials.update(load_mtl(os.path.join(base_dir, parts[1])))
    flush()
    return shapes, materials


def compute_vertex_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (calcTriangleNormals, buildscene.h:28-99)."""
    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)  # length ~ 2*area -> area weighting
    normals = np.zeros_like(positions)
    for k in range(3):
        np.add.at(normals, indices[:, k], fn)
    lens = np.linalg.norm(normals, axis=-1, keepdims=True)
    return (normals / np.where(lens > 0, lens, 1.0)).astype(np.float32)
