"""Wavefront OBJ/MTL loader producing SoA ``jnp`` scene buffers.

Feature parity with the reference's fscanf parser (CLOBJloader.cpp:10-176):

* ``v`` / ``vt`` / ``vn`` records (CLOBJloader.cpp:47-64);
* ``usemtl`` selects a material by name (CLOBJloader.cpp:65-78);
* ``f`` faces are fan-triangulated — the reference emits a triangle per
  consecutive vertex pair plus a closing triangle (CLOBJloader.cpp:101-126;
  note its loop emits (n-2)+1 triangles for an n-gon, so a quad becomes
  3 triangles with one duplicated — we emit the standard n-2 fan, which
  covers the same surface without the duplicate);
* indices are 1-based; the ``.mtl`` path is derived from the ``.obj`` name
  (CLOBJloader.cpp:18-23);
* MTL records ``newmtl``/``Kd``/``Ks``/``Ke``/``Ns``/``Ni``
  (CLOBJloader.cpp:140-175); ``Ns`` lands in ``roughness``, ``Ni`` in
  ``ior``, matching CLMaterial field use.

Extensions over the reference: negative (relative) indices, ``v//vn`` and
bare ``v`` face forms, missing normals (computed from the face plane), and
missing texcoords (zeros) are all handled instead of crashing.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .scene import Geometry, Lights, Materials, Scene


def _parse_index(token: str, count: int) -> Optional[int]:
    """1-based OBJ index -> 0-based; negatives are relative to end."""
    if not token:
        return None
    i = int(token)
    return i - 1 if i > 0 else count + i


def load_mtl(path: str) -> Tuple[List[str], dict]:
    """Parse an MTL file -> (ordered material names, name -> fields dict).

    Mirrors CLOBJloader::LoadMaterials (CLOBJloader.cpp:131-176): only
    newmtl/Kd/Ks/Ke/Ns/Ni are read; unknown keys are skipped.
    """
    names: List[str] = []
    mats: dict = {}
    cur = None
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                cur = parts[1]
                names.append(cur)
                mats[cur] = {
                    "diffuse": np.zeros(3, np.float32),
                    "specular": np.zeros(3, np.float32),
                    "emission": np.zeros(3, np.float32),
                    "roughness": np.float32(1.0),
                    "ior": np.float32(1.0),
                }
            elif cur is None:
                continue
            elif key == "Kd":
                mats[cur]["diffuse"] = np.array(parts[1:4], np.float32)
            elif key == "Ks":
                mats[cur]["specular"] = np.array(parts[1:4], np.float32)
            elif key == "Ke":
                mats[cur]["emission"] = np.array(parts[1:4], np.float32)
            elif key == "Ns":
                mats[cur]["roughness"] = np.float32(parts[1])
            elif key == "Ni":
                mats[cur]["ior"] = np.float32(parts[1])
    return names, mats


def _native_triangles(path: str, name_to_idx: dict):
    """Parse triangles with the C++ parser (native/objparse.cpp) and remap
    its usemtl-appearance-order material slots to MTL declaration order by
    *name* (the Python/MTL convention). Returns (v, n, uv, mat_idx) numpy
    arrays, or None when the native library is unavailable or a usemtl
    name is not in the MTL table (then the Python parser's keep-previous
    semantics can't be reproduced post-hoc, so we fall back)."""
    from .. import native
    res = native.parse_obj_native(path)
    if res is None:
        return None
    v, n, uv, mat, nat_names = res
    if not all(nm in name_to_idx for nm in nat_names):
        return None
    # Slot -1 = face before any usemtl -> material 0 (Python default).
    remap = np.zeros((len(nat_names) + 1,), np.int32)
    for i, nm in enumerate(nat_names):
        remap[i] = name_to_idx[nm]
    mat_idx = remap[mat]  # mat==-1 indexes the trailing 0 entry
    return v, n, uv, mat_idx


def load_obj(
    path: str,
    mtl_path: Optional[str] = None,
    dtype=np.float32,
    use_native: bool = True,
) -> Tuple[Geometry, Materials, List[str]]:
    """Parse an OBJ file into SoA triangle buffers.

    Returns (geometry, materials, material_names). If no MTL file is found
    a single default grey material is used (the reference would crash;
    CLOBJloader.cpp:133-138). Geometry parsing uses the native C++ parser
    (native/objparse.cpp — the analog of the reference's C++ host loader,
    CLOBJloader.cpp:16-129) when available; materials always parse in
    Python (MTL files are tiny).
    """
    if mtl_path is None:
        guess = os.path.splitext(path)[0] + ".mtl"
        mtl_path = guess if os.path.exists(guess) else None

    if mtl_path is not None:
        names, mat_table = load_mtl(mtl_path)
    else:
        names, mat_table = ["default"], {
            "default": {
                "diffuse": np.array([0.7, 0.7, 0.7], np.float32),
                "specular": np.zeros(3, np.float32),
                "emission": np.zeros(3, np.float32),
                "roughness": np.float32(1.0),
                "ior": np.float32(1.0),
            }
        }
    name_to_idx = {n: i for i, n in enumerate(names)}

    nat = (_native_triangles(path, name_to_idx)
           if (use_native and dtype == np.float32) else None)
    if nat is not None:
        v, n, uv, tri_mats = nat
        return (_build_geometry(v, n, uv, tri_mats),
                _build_materials(mat_table, names), names)

    positions: List[np.ndarray] = []
    normals: List[np.ndarray] = []
    texcoords: List[np.ndarray] = []
    # Per-triangle corner records: (pos idx, uv idx or None, n idx or None)
    tri_corners: List[tuple] = []
    tri_mats: List[int] = []
    cur_mat = 0

    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                positions.append(np.array(parts[1:4], dtype))
            elif key == "vn":
                normals.append(np.array(parts[1:4], dtype))
            elif key == "vt":
                texcoords.append(np.array(parts[1:3], dtype))
            elif key == "usemtl":
                cur_mat = name_to_idx.get(parts[1], cur_mat)
            elif key == "f":
                corners = []
                for tok in parts[1:]:
                    sub = tok.split("/")
                    vi = _parse_index(sub[0], len(positions))
                    ti = _parse_index(sub[1], len(texcoords)) if len(sub) > 1 else None
                    ni = _parse_index(sub[2], len(normals)) if len(sub) > 2 else None
                    corners.append((vi, ti, ni))
                # Standard fan triangulation (reference fan:
                # CLOBJloader.cpp:101-126).
                for i in range(1, len(corners) - 1):
                    tri_corners.append((corners[0], corners[i], corners[i + 1]))
                    tri_mats.append(cur_mat)

    T = len(tri_corners)
    P = np.asarray(positions, dtype) if positions else np.zeros((0, 3), dtype)
    N = np.asarray(normals, dtype) if normals else np.zeros((0, 3), dtype)
    UV = np.asarray(texcoords, dtype) if texcoords else np.zeros((0, 2), dtype)

    v = np.zeros((3, T, 3), dtype)
    n = np.zeros((3, T, 3), dtype)
    uv = np.zeros((3, T, 2), dtype)
    for t, tri in enumerate(tri_corners):
        for c, (vi, ti, ni) in enumerate(tri):
            v[c, t] = P[vi]
            if ti is not None and ti < len(UV):
                uv[c, t] = UV[ti]
            if ni is not None and ni < len(N):
                n[c, t] = N[ni]
        # Faces without normals: use the geometric plane normal.
        if tri[0][2] is None or not np.any(n[:, t]):
            e1 = v[1, t] - v[0, t]
            e2 = v[2, t] - v[0, t]
            gn = np.cross(e1, e2)
            norm = np.linalg.norm(gn)
            gn = gn / norm if norm > 0 else np.array([0.0, 0.0, 1.0], dtype)
            n[0, t] = n[1, t] = n[2, t] = gn

    return (_build_geometry(v, n, uv, tri_mats),
            _build_materials(mat_table, names), names)


def _build_geometry(v, n, uv, tri_mats) -> Geometry:
    return Geometry(
        v0=jnp.asarray(v[0]), v1=jnp.asarray(v[1]), v2=jnp.asarray(v[2]),
        n0=jnp.asarray(n[0]), n1=jnp.asarray(n[1]), n2=jnp.asarray(n[2]),
        uv0=jnp.asarray(uv[0]), uv1=jnp.asarray(uv[1]), uv2=jnp.asarray(uv[2]),
        mat_idx=jnp.asarray(np.asarray(tri_mats, np.int32)),
    )


def _build_materials(mat_table: dict, names: List[str]) -> Materials:
    return Materials(
        diffuse=jnp.asarray(np.stack([mat_table[m]["diffuse"] for m in names])),
        specular=jnp.asarray(np.stack([mat_table[m]["specular"] for m in names])),
        emission=jnp.asarray(np.stack([mat_table[m]["emission"] for m in names])),
        roughness=jnp.asarray(np.stack([mat_table[m]["roughness"] for m in names])),
        ior=jnp.asarray(np.stack([mat_table[m]["ior"] for m in names])),
    )


def load_scene(path: str, lights: Optional[Lights] = None) -> Scene:
    """OBJ file -> complete Scene (default light mirrors the reference's
    effective in-kernel point light, kernel_bvh.cl:322-336)."""
    geometry, materials, _ = load_obj(path)
    if lights is None:
        lights = Lights.default_point()
    return Scene(geometry=geometry, materials=materials, lights=lights)
