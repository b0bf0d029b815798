"""Pallas TPU panel-intersection kernel: dense Moller-Trumbore over
[triangle x ray] panels with the triangle set resident in VMEM.

This is the TPU-native replacement for the hot path of ``Intersect`` +
``RayTriangle`` (kernel_bvh.cl:98-153, 171-219). Design rationale
(SURVEY.md section 7, step 4):

* The reference gives each ray its own thread and a divergent per-thread
  BVH stack — the worst shape for a vector machine. Here the panel is
  laid out **triangles on sublanes x 128 rays on lanes**: triangle
  constants are [T_pad, 1] columns broadcast across lanes, ray components
  are [1, 128] rows broadcast across sublanes, so every instruction in
  the Moller-Trumbore sequence is a full [T_pad, 128] VPU op — no scalar
  loads inside the hot loop at all.
* The closest hit is a sublane min-reduction; the winning triangle index
  is recovered with a masked iota min (both cheap VPU reductions).
* The kernel returns only (t_best, tri_idx); it is wrapped in
  ``stop_gradient`` and the *differentiable* hit attributes are
  recomputed in jnp on the single winning triangle per ray
  (ops/intersect.shading_point), so backward cost is O(R), not O(R*T).
* Triangle sets larger than one VMEM-friendly panel run as a fori loop
  over [TRI_BLOCK, 128] sub-panels of the same layout.

The pure-jnp equivalent of this kernel (intersect_brute) hits ~27 Mrays/s
on a v5e chip because XLA materializes [R, T] panels through HBM; keeping
the panel in registers/VMEM makes the loop compute-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RenderConfig
from ...models.scene import Geometry
from ..intersect import Hit

_LANES = 128
# Ray rows per grid step (each row = 128 rays processed as one panel).
_ROWS = 8
_TILE = _LANES * _ROWS
# Triangle sub-panel height (sublane dimension). 512 rows x 128 lanes of
# f32 = 256 KB per intermediate panel — comfortably inside VMEM with the
# ~12 live panels of the M-T sequence.
_TRI_BLOCK = 512

_BIG = 3.0e38


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_triangles(geometry: Geometry) -> jax.Array:
    """[T_pad, 16] f32 triangle constants: columns 0-2 v0, 3-5 e1 = v1-v0,
    6-8 e2 = v2-v0 (rest zero). Component k of a triangle block is then a
    [tb, 1] sublane-column slice that broadcasts across ray lanes for
    free — no transposes anywhere in the kernel. Padded rows have
    e1 = e2 = 0 -> det == 0 -> never hit."""
    v0 = jax.lax.stop_gradient(geometry.v0).astype(jnp.float32)
    v1 = jax.lax.stop_gradient(geometry.v1).astype(jnp.float32)
    v2 = jax.lax.stop_gradient(geometry.v2).astype(jnp.float32)
    T = v0.shape[0]
    if T <= _TRI_BLOCK:
        Tp = _ceil_to(max(T, 8), 8)
    else:
        Tp = _ceil_to(T, _TRI_BLOCK)
    rec = jnp.zeros((Tp, 16), jnp.float32)
    rec = rec.at[:T, 0:3].set(v0)
    rec = rec.at[:T, 3:6].set(v1 - v0)
    rec = rec.at[:T, 6:9].set(v2 - v0)
    return rec


def _panel_kernel(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  tin_ref, tout_ref, idx_ref, *, num_tris_padded: int,
                  backface_cull: bool):
    """One grid step: closest hit of ROWS x 128 rays against all triangles.

    tri_ref block: [T_pad, 16] (v0/e1/e2 component columns).
    Ray refs: [ROWS, 128] panels; outputs the same.
    """
    tb = min(num_tris_padded, _TRI_BLOCK)
    n_blocks = num_tris_padded // tb

    # Triangle index panel for argmin recovery, built once per grid step.
    tri_iota = jax.lax.broadcasted_iota(
        jnp.int32, (tb, _LANES), 0).astype(jnp.float32)

    def ray_row(r):
        def comp(ref):
            return ref[pl.ds(r, 1), :]  # [1, 128]
        return (comp(ox_ref), comp(oy_ref), comp(oz_ref),
                comp(dx_ref), comp(dy_ref), comp(dz_ref))

    def tri_block(b):
        def col(k):
            return tri_ref[pl.ds(b * tb, tb), k:k + 1]  # [tb, 1]
        return tuple(col(k) for k in range(9))

    def process_row(r, _):
        ox, oy, oz, dx, dy, dz = ray_row(r)
        t_init = tin_ref[pl.ds(r, 1), :]

        def block_body(b, carry):
            t_best, i_best = carry  # [1,128] each
            (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = tri_block(b)

            # pvec = d x e2 (kernel_bvh.cl:112) — [tb, 128] panels.
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            if backface_cull:
                dvalid = det > 1e-10
            else:
                dvalid = jnp.abs(det) > 1e-10
            inv_det = 1.0 / jnp.where(dvalid, det, 1.0)

            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det

            # qvec = tvec x e1 (kernel_bvh.cl:130)
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det

            ok = (dvalid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (tt > 0.0) & (tt < t_best))
            tt = jnp.where(ok, tt, _BIG)

            # Closest hit within the block: sublane min + masked-iota argmin.
            t_blk = jnp.min(tt, axis=0, keepdims=True)          # [1,128]
            win = tt <= t_blk                                    # [tb,128]
            i_blk = jnp.min(jnp.where(win, tri_iota, _BIG),
                            axis=0, keepdims=True)               # [1,128]
            better = t_blk < t_best
            t_best = jnp.where(better, t_blk, t_best)
            i_best = jnp.where(
                better, i_blk + jnp.float32(b * tb), i_best)
            return t_best, i_best

        t0 = t_init
        i0 = jnp.full((1, _LANES), -1.0, jnp.float32)
        t_best, i_best = jax.lax.fori_loop(0, n_blocks, block_body, (t0, i0))
        tout_ref[pl.ds(r, 1), :] = t_best
        idx_ref[pl.ds(r, 1), :] = i_best.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, _ROWS, process_row, 0)


def _run_panel(tri_packed: jax.Array, o: jax.Array, d: jax.Array,
               t_init: jax.Array, backface_cull: bool):
    """Launch the kernel over all rays. o/d: [R, 3]; t_init: [R].
    Returns (t_best [R], idx [R] int32, -1 where miss)."""
    R = o.shape[0]
    Tp = tri_packed.shape[0]
    pad = (-R) % _TILE
    Rp = R + pad

    def panels(a, fill=0.0):
        a = jnp.pad(a, (0, pad), constant_values=fill)
        return a.reshape(Rp // _LANES, _LANES)

    comps = [panels(o[:, 0]), panels(o[:, 1]), panels(o[:, 2]),
             panels(d[:, 0]), panels(d[:, 1]), panels(d[:, 2], fill=1.0),
             panels(t_init, fill=0.0)]

    grid = (Rp // _TILE,)
    ray_spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((Tp, 16), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_panel_kernel, num_tris_padded=Tp,
                               backface_cull=backface_cull)
    t_out, idx_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tri_spec] + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Rp // _LANES, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((Rp // _LANES, _LANES), jnp.int32),
        ),
        interpret=_interpret(),
    )(tri_packed, *comps)
    return t_out.reshape(-1)[:R], idx_out.reshape(-1)[:R]


def intersect_panel(o: jax.Array, d: jax.Array, geometry: Geometry,
                    tri_packed: jax.Array, t_max: float,
                    backface_cull: bool = False) -> Hit:
    """Closest hit via the Pallas panel kernel."""
    o = jax.lax.stop_gradient(o).astype(jnp.float32)
    d = jax.lax.stop_gradient(d).astype(jnp.float32)
    t_init = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_best, idx = _run_panel(tri_packed, o, d, t_init, backface_cull)
    hit = idx >= 0
    return Hit(t=jnp.where(hit, t_best, t_max),
               tri_idx=jnp.where(hit, idx, 0),
               hit=hit)


def occluded_panel(o: jax.Array, d: jax.Array, t_limit: jax.Array,
                   geometry: Geometry, tri_packed: jax.Array,
                   backface_cull: bool = False) -> jax.Array:
    """Shadow-ray occlusion via the panel kernel (any hit below t_limit)."""
    o = jax.lax.stop_gradient(o).astype(jnp.float32)
    d = jax.lax.stop_gradient(d).astype(jnp.float32)
    t_init = jnp.where(jnp.isfinite(t_limit), t_limit, _BIG)
    t_init = jax.lax.stop_gradient(t_init).astype(jnp.float32)
    _, idx = _run_panel(tri_packed, o, d, t_init, backface_cull)
    return idx >= 0


def make_intersectors(geometry: Geometry, cfg: RenderConfig):
    """Backend factory for render.make_intersectors."""
    tri_packed = pack_triangles(geometry)
    closest = functools.partial(
        intersect_panel, geometry=geometry, tri_packed=tri_packed,
        t_max=cfg.t_max, backface_cull=cfg.backface_cull)
    any_hit = functools.partial(
        occluded_panel, geometry=geometry, tri_packed=tri_packed,
        backface_cull=cfg.backface_cull)
    return closest, any_hit
