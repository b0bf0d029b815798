"""Procedural benchmark scenes at bunny / sponza scale.

BASELINE.json configs 3 and 5 call for a ~70k-triangle 'Stanford bunny'
scene (stresses LBVH build + deep traversal) and a ~260k-triangle
'Sponza-scale' scene. We ship no third-party assets; these generators
produce meshes with equivalent stress characteristics — high triangle
counts, uneven spatial density, deep BVHs — inside the same Cornell room
so lighting/camera defaults keep working.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .cornell import CORNELL_MATERIAL_NAMES, cornell_geometry, cornell_materials
from .scene import Geometry, Lights, Materials, Scene


def _concat_geometry(a: Geometry, b: Geometry) -> Geometry:
    cat = lambda x, y: jnp.concatenate([x, y], axis=0)
    return Geometry(
        v0=cat(a.v0, b.v0), v1=cat(a.v1, b.v1), v2=cat(a.v2, b.v2),
        n0=cat(a.n0, b.n0), n1=cat(a.n1, b.n1), n2=cat(a.n2, b.n2),
        uv0=cat(a.uv0, b.uv0), uv1=cat(a.uv1, b.uv1), uv2=cat(a.uv2, b.uv2),
        mat_idx=cat(a.mat_idx, b.mat_idx),
    )


def _sphere_mesh(center, radius: float, n_theta: int, n_phi: int,
                 mat: int, bump: float = 0.0,
                 seed: int = 0) -> Geometry:
    """UV-sphere triangle mesh with optional radial noise ('bunny-like'
    surface detail). 2 * n_theta * n_phi triangles."""
    rng = np.random.default_rng(seed)
    th = np.linspace(0.0, math.pi, n_theta + 1)
    ph = np.linspace(0.0, 2 * math.pi, n_phi + 1)
    tt, pp = np.meshgrid(th, ph, indexing="ij")  # [n_theta+1, n_phi+1]
    r = radius * (1.0 + bump * rng.standard_normal((n_theta + 1, n_phi + 1))
                  .astype(np.float32))
    # Seam + poles keep consistent radius.
    r[:, -1] = r[:, 0]
    x = (r * np.sin(tt) * np.cos(pp) + center[0]).astype(np.float32)
    y = (r * np.sin(tt) * np.sin(pp) + center[1]).astype(np.float32)
    z = (r * np.cos(tt) + center[2]).astype(np.float32)
    P = np.stack([x, y, z], axis=-1)  # [T+1, P+1, 3]
    n_out = P - np.asarray(center, np.float32)
    n_out /= np.maximum(np.linalg.norm(n_out, axis=-1, keepdims=True), 1e-9)

    quads_a, quads_b = [], []
    for i in range(n_theta):
        for j in range(n_phi):
            p00, p01 = P[i, j], P[i, j + 1]
            p10, p11 = P[i + 1, j], P[i + 1, j + 1]
            n00, n01 = n_out[i, j], n_out[i, j + 1]
            n10, n11 = n_out[i + 1, j], n_out[i + 1, j + 1]
            quads_a.append((p00, p10, p11, n00, n10, n11))
            quads_b.append((p00, p11, p01, n00, n11, n01))

    tris = quads_a + quads_b
    T = len(tris)
    v = np.zeros((3, T, 3), np.float32)
    n = np.zeros((3, T, 3), np.float32)
    for t, (a, b, c, na, nb, nc) in enumerate(tris):
        v[0, t], v[1, t], v[2, t] = a, b, c
        n[0, t], n[1, t], n[2, t] = na, nb, nc
    uv = np.zeros((3, T, 2), np.float32)
    return Geometry(
        v0=jnp.asarray(v[0]), v1=jnp.asarray(v[1]), v2=jnp.asarray(v[2]),
        n0=jnp.asarray(n[0]), n1=jnp.asarray(n[1]), n2=jnp.asarray(n[2]),
        uv0=jnp.asarray(uv[0]), uv1=jnp.asarray(uv[1]), uv2=jnp.asarray(uv[2]),
        mat_idx=jnp.full((T,), mat, jnp.int32),
    )


def bunny_scene(target_tris: int = 70_000,
                lights: Optional[Lights] = None) -> Scene:
    """~70k-triangle organic blob ('bunny-scale') inside the Cornell room
    (BASELINE.json config 3)."""
    room = cornell_geometry()
    # 2 * n^2/2 ... choose n_theta x n_phi so 2*nt*np ~= target.
    nt = int(math.sqrt(target_tris / 4.0))
    npphi = max(2 * nt, 4)
    blob = _sphere_mesh(center=(0.0, 12.0, 5.0), radius=4.0,
                        n_theta=nt, n_phi=npphi,
                        mat=CORNELL_MATERIAL_NAMES.index("Material"),
                        bump=0.03, seed=1)
    geo = _concat_geometry(room, blob)
    return Scene(geometry=geo, materials=cornell_materials(),
                 lights=lights or Lights.default_point())


def sponza_scene(target_tris: int = 260_000,
                 n_objects: int = 24,
                 lights: Optional[Lights] = None) -> Scene:
    """~260k-triangle multi-object hall ('Sponza-scale'): many detailed
    blobs scattered through an elongated room (BASELINE.json config 5).
    Stresses LBVH quality (uneven density) and traversal depth."""
    room = cornell_geometry()
    rng = np.random.default_rng(3)
    per_obj = target_tris // n_objects
    nt = int(math.sqrt(per_obj / 4.0))
    npphi = max(2 * nt, 4)
    geo = room
    mats = [CORNELL_MATERIAL_NAMES.index(nm)
            for nm in ("Material", "BloodyRed", "DarkGreen", "LargerBox")]
    for k in range(n_objects):
        c = (float(rng.uniform(-6.5, 6.5)),
             float(rng.uniform(2.0, 18.5)),
             float(rng.uniform(1.5, 15.0)))
        blob = _sphere_mesh(center=c, radius=float(rng.uniform(0.7, 1.6)),
                            n_theta=nt, n_phi=npphi,
                            mat=mats[k % len(mats)],
                            bump=0.05, seed=10 + k)
        geo = _concat_geometry(geo, blob)
    return Scene(geometry=geo, materials=cornell_materials(),
                 lights=lights or Lights.default_point())
