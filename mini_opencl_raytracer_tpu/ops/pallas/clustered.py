"""Two-level cluster-culled Pallas intersection kernel for large scenes.

TPU re-design of the reference's per-thread BVH traversal (``Intersect``,
kernel_bvh.cl:171-219) for triangle counts far beyond what the flat panel
kernel (ops/pallas/panel.py) should brute-force. The divergent per-ray
stack is replaced by a *packet* scheme shaped for the VPU:

* Triangles are Morton-sorted (same ordering as ops/bvh.py) and grouped
  into **clusters** of ``CLUSTER`` consecutive triangles; clusters are
  grouped into **super-clusters** of ``SUPER`` consecutive clusters.
  Both levels carry AABBs — a 3-level implicit hierarchy with fanouts
  (SUPER, CLUSTER), built with pure jnp sorts/reductions on device.
* The kernel runs ONE descent per grid step of _ROWS x 128 rays
  (flattened into lanes). It slab-tests *all* super-cluster AABBs as a
  dense [S, TILE] panel with per-lane current-best t bounds, reduces to
  a per-super "any ray hits" mask, and only descends into supers the
  tile touches; the same predicated descent happens for clusters, and
  each surviving cluster is DMA'd from HBM as its limb-packed M-T row
  block (megakernel.mt_limb_rows) and intersected with ONE
  [4*CLUSTER, 128] @ [128, TILE] MXU pass — f32-accurate
  Moller-Trumbore determinants at single-pass cost, with only the sign
  tests and the closest reduction on the VPU.
* Control flow is scalar (fori + pl.when on mask scalars read back from
  VMEM scratch) — the TPU analog of the reference's stack, except one
  decision serves a whole ray tile instead of one ray.

Coherent tiles (primary rays, shadow rays to one light) visit few
clusters; incoherent bounce wavefronts are re-sorted by direction
octant + origin Morton key between bounces (ops/integrator, enabled by
cfg.sort_rays) so their tiles stay compact too.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RenderConfig
from ...models.scene import Geometry
from ..bvh import morton3d
from ..intersect import Hit
from . import megakernel as mk

_LANES = 128
# Ray rows per grid step (one descent per _ROWS*128 rays; env override
# for benchmark sweeps only).
_ROWS = int(os.environ.get("MRT_CLUSTER_ROWS", "16"))
_TILE = _LANES * _ROWS
# Triangles per cluster (M-T matmul block) and clusters per
# super-cluster. Bigger clusters trade wasted M-T lanes (cheap, MXU)
# for fewer per-cluster scalar descent decisions (expensive, serial) —
# swept on v5e via the env overrides (benchmarks only; read at import).
CLUSTER = int(os.environ.get("MRT_CLUSTER", "128"))
SUPER = int(os.environ.get("MRT_SUPER", "64"))
_MTG_LANES = 128     # limb-table lanes (96 used, padded to a lane tile)

_BIG = 3.0e38
_DET_EPS = 1e-10


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


class ClusteredGeometry(NamedTuple):
    """Device-resident, Morton-ordered, padded acceleration layout."""

    mtg: jax.Array          # [4*T_pad, 128] bf16 limb-packed M-T rows
                            # (megakernel.mt_limb_rows, block = CLUSTER)
    cl_aabb: jax.Array      # [C_pad, 8] cluster lo.xyz, hi.xyz
    sup_aabb: jax.Array     # [S_pad, 8] super-cluster lo.xyz, hi.xyz
    slot_to_tri: jax.Array  # [T_pad] int32 -> original triangle index
    # [T_pad, ATTR_COLS] f32 shading rows (ops/shading.ShadingTable
    # layout) in cluster-slot order, or None when the accel was built
    # without materials. Lets the kernel return the WINNER'S shading
    # row from the cluster block it already has in VMEM — replacing the
    # per-bounce XLA row gather (hit_attributes take_rows), which moves
    # only ~17M rows/s on TPU. Snapshot values (stop-grad), like every
    # accel field; gradients flow through the take_rows-equivalent
    # custom VJP at ops/shading.hit_attributes.
    attrs: jax.Array = None
    # [T_pad] int32 material index per slot — lets make_intersectors
    # refresh the attrs' material columns from LIVE material arrays when
    # a prebuilt accel is reused across optimizer steps (otherwise
    # Hit.rows would return the values snapshotted at build time while
    # the VJP sends gradients to the live table — the image would stop
    # responding to material updates). Geometry columns are snapshot by
    # nature: an accel must be rebuilt after vertex changes, exactly as
    # the reference rebuilds its BVH (CLBVHnode.cpp:185-207).
    slot_mat: jax.Array = None

    @property
    def num_supers(self) -> int:
        return self.sup_aabb.shape[0]


# Shading-row columns carried by ``attrs``: ops/shading.ShadingTable
# COLS (34), padded to a full lane tile — HBM->VMEM DMA slices must be
# 128-aligned in the minor dimension (Mosaic tiling constraint).
ATTR_COLS = 128


def _slots_from_leaf_info(leaf_info, T):
    """Host-side (numpy) slot layout from the native SAH leaf ranges:
    scatter each SAH leaf into its own CLUSTER-slot block. Returns
    (order [T_pad] int32 — original tri index per slot, 0 on padding;
    valid [T_pad] bool)."""
    import numpy as np
    order_np, starts, counts = leaf_info
    C = max(len(starts), 1)
    S = max(-(-C // SUPER), 1)
    T_pad = S * SUPER * CLUSTER
    slot_src = np.full((T_pad,), -1, np.int32)
    if len(starts):
        leaf_ids = np.repeat(np.arange(C, dtype=np.int64), counts)
        within = np.arange(T, dtype=np.int64) - np.repeat(
            starts.astype(np.int64), counts)
        slot_src[leaf_ids * CLUSTER + within] = order_np
    return np.maximum(slot_src, 0), slot_src >= 0


def build_clusters(geometry: Geometry,
                   leaf_info=None, materials=None) -> ClusteredGeometry:
    """Cluster the triangle soup and build the two AABB levels.

    ``leaf_info`` is an optional host-side (numpy) SAH layout from
    ``native.sah_order`` — (order, leaf_starts, leaf_counts), one SAH
    leaf per cluster block, DFS order (spatially tight clusters; the
    analog of the reference's SAH build, CLBVHnode.cpp:76-134, feeding
    this kernel instead of a node array). When None — or when tracing
    under jit, where host callbacks are unavailable — triangles are
    Morton-sorted into fixed-size range clusters with pure jnp ops.

    With ``materials`` the accel also carries the per-triangle shading
    rows in slot order (see ClusteredGeometry.attrs) so the kernel can
    return winner attributes directly.
    """
    v0 = jax.lax.stop_gradient(geometry.v0).astype(jnp.float32)
    v1 = jax.lax.stop_gradient(geometry.v1).astype(jnp.float32)
    v2 = jax.lax.stop_gradient(geometry.v2).astype(jnp.float32)
    T = v0.shape[0]

    st = None
    if materials is not None:
        from ..shading import build_shading_table
        st = jax.lax.stop_gradient(
            build_shading_table(geometry, materials).table)
    mat_idx = geometry.mat_idx if materials is not None else None

    if leaf_info is not None:
        order, valid = _slots_from_leaf_info(leaf_info, T)
        return _assemble(v0, v1, v2, jnp.asarray(order),
                         jnp.asarray(valid), st, mat_idx)
    cent = (v0 + v1 + v2) / 3.0
    lo = jnp.min(cent, axis=0)
    hi = jnp.max(cent, axis=0)
    codes = morton3d((cent - lo) / jnp.maximum(hi - lo, 1e-12))
    _, morder = jax.lax.sort_key_val(codes,
                                     jnp.arange(T, dtype=jnp.int32))
    C = max(-(-T // CLUSTER), 1)
    S = max(-(-C // SUPER), 1)
    T_pad = S * SUPER * CLUSTER
    order = jnp.pad(morder, (0, T_pad - T))
    valid = jnp.arange(T_pad) < T
    return _assemble(v0, v1, v2, order, valid, st, mat_idx)


def _assemble(v0, v1, v2, order, valid, st, mat_idx) -> ClusteredGeometry:
    """Pure-jnp accel assembly from a slot layout (the under-jit path
    when no prebuilt accel is supplied): gather triangles into slot
    order, build the limb-packed M-T rows and both AABB levels (and the
    shading-row table when ``st`` is given). build_accel does the
    gathers host-side instead (numpy) and jits only _device_tables —
    XLA:TPU row gathers are slow and eager dispatch pays the rig
    round-trip per op."""
    real = valid[:, None]

    def take_pad(a):
        g = jnp.take(a, order, axis=0)
        return jnp.where(real, g, _BIG)

    pv0, pv1, pv2 = take_pad(v0), take_pad(v1), take_pad(v2)
    slot_to_tri = jnp.where(valid, order, 0)

    # Padding rows: e1 = e2 = 0 -> zero M-T rows -> det == 0 -> no hit.
    # (v0 is also zeroed so the v0 x e / v0 . n products stay finite.)
    e1 = jnp.where(real, pv1 - pv0, 0.0)
    e2 = jnp.where(real, pv2 - pv0, 0.0)
    mtg = mk.mt_limb_rows(jnp.where(real, pv0, 0.0), e1, e2,
                          tb=CLUSTER, lane_pad=_MTG_LANES)
    cl_aabb, sup_aabb = _aabb_levels(pv0, pv1, pv2, real)

    attrs = None
    slot_mat = None
    if st is not None:
        rows_ = jnp.take(st, order, axis=0)          # [T_pad, 34]
        rows_ = jnp.where(real, rows_, 0.0)
        attrs = jnp.pad(rows_, ((0, 0), (0, ATTR_COLS - rows_.shape[1])))
        slot_mat = jnp.where(valid, jnp.take(mat_idx, order),
                             0).astype(jnp.int32)

    return ClusteredGeometry(
        mtg=mtg,
        cl_aabb=cl_aabb,
        sup_aabb=sup_aabb,
        slot_to_tri=slot_to_tri.astype(jnp.int32),
        attrs=attrs,
        slot_mat=slot_mat,
    )


def _aabb_levels(pv0, pv1, pv2, real):
    """Cluster + super AABB levels from slot-ordered corners."""
    T_pad = pv0.shape[0]
    C_pad = T_pad // CLUSTER
    S = C_pad // SUPER
    t_lo = jnp.where(real, jnp.minimum(jnp.minimum(pv0, pv1), pv2), _BIG)
    t_hi = jnp.where(real, jnp.maximum(jnp.maximum(pv0, pv1), pv2), -_BIG)

    def fix_empty(lo_, hi_):
        # Empty boxes come out of the reduction inverted (lo > hi); the
        # min/max slab test would read an inverted box as an *infinite*
        # box, so normalize empties to a far-away point box that every
        # slab test rejects.
        empty = jnp.any(lo_ > hi_, axis=1, keepdims=True)
        return (jnp.where(empty, _BIG, lo_), jnp.where(empty, _BIG, hi_))

    # Reduce with inverted-box neutral elements (+BIG/-BIG) so partially
    # padded groups stay tight, then normalize empties at each level.
    cl_lo = jnp.min(t_lo.reshape(C_pad, CLUSTER, 3), axis=1)
    cl_hi = jnp.max(t_hi.reshape(C_pad, CLUSTER, 3), axis=1)
    sup_lo = jnp.min(cl_lo.reshape(S, SUPER, 3), axis=1)
    sup_hi = jnp.max(cl_hi.reshape(S, SUPER, 3), axis=1)
    cl_lo, cl_hi = fix_empty(cl_lo, cl_hi)
    sup_lo, sup_hi = fix_empty(sup_lo, sup_hi)

    def pack_aabb(lo_, hi_):
        n = lo_.shape[0]
        rows = max(_ceil_to(n, 8), 8)
        # Padding rows are far-away point boxes (slab test always fails).
        out = jnp.full((rows, 8), _BIG, jnp.float32)
        out = out.at[:n, 0:3].set(lo_)
        out = out.at[:n, 3:6].set(hi_)
        return out

    return pack_aabb(cl_lo, cl_hi), pack_aabb(sup_lo, sup_hi)


def _device_tables(pv0, pv1, pv2, valid):
    """Device stage of build_accel: limb-packed M-T rows + both AABB
    levels from PRE-GATHERED slot-ordered corners (one jitted
    dispatch; corners arrive flat — see build_accel)."""
    pv0 = pv0.reshape(-1, 3)
    pv1 = pv1.reshape(-1, 3)
    pv2 = pv2.reshape(-1, 3)
    real = valid[:, None]
    e1 = jnp.where(real, pv1 - pv0, 0.0)
    e2 = jnp.where(real, pv2 - pv0, 0.0)
    mtg = mk.mt_limb_rows(jnp.where(real, pv0, 0.0), e1, e2,
                          tb=CLUSTER, lane_pad=_MTG_LANES)
    cl_aabb, sup_aabb = _aabb_levels(pv0, pv1, pv2, real)
    return mtg, cl_aabb, sup_aabb


_device_tables_jit = jax.jit(_device_tables)
_pad_attrs_jit = jax.jit(
    lambda r: jnp.pad(r, ((0, 0), (0, ATTR_COLS - r.shape[1]))))


def _slab_panel(aabb_cols, ox, oy, oz, ix, iy, iz, t_far,
                with_tmin: bool = False):
    """[N, 128] slab test: AABB column slices ([N,1]) vs a ray row
    ([1,128] origin + inverse-direction components). Returns hit mask
    (and, with ``with_tmin``, the per-pair clamped entry distance,
    _BIG where missed). Matches RayBounds semantics (kernel_bvh.cl:
    156-169) with min/max instead of sign indexing. ``t_far`` is a
    per-lane [1, 128] bound — each ray culls against its OWN current
    closest hit (the reference's ``min(tmax, t)``, kernel_bvh.cl:167),
    so one far ray no longer disables culling for the other 127 lanes."""
    lox, loy, loz, hix, hiy, hiz = aabb_cols
    tx1 = (lox - ox) * ix
    tx2 = (hix - ox) * ix
    ty1 = (loy - oy) * iy
    ty2 = (hiy - oy) * iy
    tz1 = (loz - oz) * iz
    tz2 = (hiz - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                   jnp.minimum(ty1, ty2)),
                       jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                   jnp.maximum(ty1, ty2)),
                       jnp.maximum(tz1, tz2))
    entry = jnp.maximum(tmin, 0.0)
    hit = jnp.minimum(tmax, t_far) >= entry
    if with_tmin:
        return hit, jnp.where(hit, entry, _BIG)
    return hit


def _aabb_cols(ref, start, n):
    return tuple(ref[pl.ds(start, n), k:k + 1] for k in range(6))


# Concurrent cluster-DMA slots per super visit. All hit clusters' copies
# launch before the first intersection waits on one — full copy/compute
# overlap within a super (NSLOTS x [CLUSTER, 128] f32 = 512 KB VMEM).
NSLOTS = int(os.environ.get("MRT_CLUSTER_NSLOTS", "16"))

# Ray-compaction granularity: the 2048-lane tile is split into _GROUPS
# static sub-tiles of _GLANES lanes; each visited cluster's MXU pass and
# closest-hit epilogue run ONLY for sub-tiles whose slab test hit that
# cluster (per-cluster ray compaction, the packet analog of the
# reference's per-ray traversal early-out, kernel_bvh.cl:199-208).
# Static split because Mosaic cannot slice the lane axis dynamically;
# tile-swizzled coherent packets concentrate each cluster's rays in one
# or two sub-tiles, so most visits skip 3/4 of the tile. (Env override
# for benchmark sweeps only; 1 = compaction off.)
_GROUPS = int(os.environ.get("MRT_CLUSTER_GROUPS", "4"))
# The sub-tile split must cover the tile exactly and keep each sub-tile
# lane-aligned, or sub-tiles silently overlap / miss lanes (e.g.
# _GROUPS=3 gives 682-lane groups). ValueError, not assert: env
# validation must survive python -O.
if _TILE % _GROUPS:
    raise ValueError(
        f"MRT_CLUSTER_GROUPS={_GROUPS} must divide the {_TILE}-lane tile")
_GLANES = _TILE // _GROUPS
if _GLANES % _LANES:
    raise ValueError(
        f"MRT_CLUSTER_GROUPS={_GROUPS} gives {_GLANES}-lane sub-tiles; "
        f"must be a multiple of {_LANES}")

# mask_scratch column of the per-super packet entry distance (doubles
# as the visited flag: set to _BIG once visited). Columns 1/2 hold the
# per-cluster hit/slot data of the super being visited; 3..3+_GROUPS-1
# the sub-tile compaction masks.
_COL_TMIN = 3 + _GROUPS
_MASK_COLS = max(8, _COL_TMIN + 1)


def _clustered_kernel(*refs, num_supers: int, backface_cull: bool,
                      with_rows: bool):
    """Grid step: ONE descent for the whole _ROWS x 128 ray tile (rays
    flattened into 2048 lanes), Moller-Trumbore determinants on the MXU.

    ``mtg_ref`` (the limb-packed M-T table, megakernel.mt_limb_rows)
    lives in HBM — a large scene cannot be VMEM-resident. Supers are
    visited FRONT TO BACK by packet entry distance (argmin loop over
    the recorded slab tmin column — the packet analog of the
    reference's near-child-first stack order, kernel_bvh.cl:200-207)
    and each visit re-slabs the super against the current per-lane
    best t, so occluded supers cost one [1, TILE] slab and no DMA.
    Per live super the kernel (a) slab-tests all SUPER cluster AABBs as
    one [SUPER, TILE] panel, (b) assigns DMA slots to hit clusters with
    a vector cumsum, (c) launches up to NSLOTS async copies
    back-to-back, then (d) drains them in order; each landed
    [4*CLUSTER, 128] bf16 block is one K=128 MXU pass per hit sub-tile
    (ray compaction, see _GROUPS) against the tile's limb-packed ray
    features, leaving the VPU the sign tests + closest reduction
    (exactly megakernel._mt_closest's epilogue). Scalar descent
    decisions are amortized over 2048 rays instead of 128.

    mask_scratch column map: 1 = cluster any-hit masks (current super),
    2 = cluster DMA slot ids, 3..3+G-1 = per-sub-tile cluster hit masks
    (_GROUPS), _COL_TMIN = per-super packet entry distance / visited
    flag; ``slot_tbl`` (SMEM) maps DMA slot -> cluster index within the
    super. Note on ties: visit order is distance-sorted, so exact-t
    ties across supers resolve to the nearer-entry super's triangle
    rather than the global smallest index.

    ``with_rows``: additionally DMA each visited cluster's shading-row
    block (ClusteredGeometry.attrs) and keep the winner's row per lane
    (one [CLUSTER, ATTR_COLS] x winner-one-hot contraction per updated
    sub-tile) — the in-traversal attribute fetch that replaces the
    XLA row gather downstream.
    """
    if with_rows:
        (sup_ref, cl_ref, mtg_ref, atr_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tin_ref,
         tout_ref, idx_ref, rows_ref,
         mask_scratch, best_scratch, blk_scratch, slot_tbl, dma_sems,
         abuf_scratch, abest_scratch, dma_sems2) = refs
    else:
        (sup_ref, cl_ref, mtg_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tin_ref,
         tout_ref, idx_ref,
         mask_scratch, best_scratch, blk_scratch, slot_tbl,
         dma_sems) = refs
    tri_iota = jax.lax.broadcasted_iota(
        jnp.int32, (CLUSTER, _GLANES), 0).astype(jnp.float32)

    o3 = (ox_ref[:], oy_ref[:], oz_ref[:])       # [ROWS, 128] tiles
    d3 = (dx_ref[:], dy_ref[:], dz_ref[:])
    F_limbs = mk._mt_features(o3, d3, k_pad=_MTG_LANES)  # [128, TILE]

    def flat(ref):
        return ref[:].reshape(1, _TILE)

    ox, oy, oz = flat(ox_ref), flat(oy_ref), flat(oz_ref)
    dx, dy, dz = flat(dx_ref), flat(dy_ref), flat(dz_ref)
    eps = 1e-20
    ix = 1.0 / jnp.where(jnp.abs(dx) > eps, dx, eps)
    iy = 1.0 / jnp.where(jnp.abs(dy) > eps, dy, eps)
    iz = 1.0 / jnp.where(jnp.abs(dz) > eps, dz, eps)

    t_init = flat(tin_ref)
    best_scratch[0:1, :] = t_init
    best_scratch[1:2, :] = jnp.full((1, _TILE), -1.0, jnp.float32)
    if with_rows:
        abest_scratch[:, :] = jnp.zeros((ATTR_COLS, _TILE), jnp.float32)

    def intersect_block(buf, abuf, base_f, j):
        """One cluster's M-T, ray-compacted: per static _GLANES-lane
        sub-tile, run the [4*CLUSTER, 128] @ [128, _GLANES] MXU pass and
        the masked closest update of best_scratch (rows 0 = t, 1 =
        winner slot index) ONLY when that sub-tile slab-hit cluster
        ``j`` (mask_scratch[j, 3+g]). With ``with_rows``, lanes the
        cluster improved also take its winner's shading row from
        ``abuf`` (one-hot contraction into abest_scratch)."""
        for g in range(_GROUPS):
            @pl.when(mask_scratch[j, 3 + g] > 0.0)
            def _(g=g):
                lo = g * _GLANES
                res = jax.lax.dot_general(
                    buf, F_limbs[:, lo:lo + _GLANES],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [4*C, GLANES]
                det = res[0 * CLUSTER:1 * CLUSTER]
                ud = res[1 * CLUSTER:2 * CLUSTER]
                vd = res[2 * CLUSTER:3 * CLUSTER]
                td = res[3 * CLUSTER:4 * CLUSTER]
                if backface_cull:
                    det_s, ud_s, vd_s, td_s = det, ud, vd, td
                else:
                    sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                    det_s, ud_s, vd_s, td_s = (det * sgn, ud * sgn,
                                               vd * sgn, td * sgn)
                dvalid = det_s > _DET_EPS
                # Approx-reciprocal SELECTION + exact winner
                # re-division (mk._sel_recip): the per-candidate divide
                # only orders candidates; t > 0 is tested division-free
                # (det_s > 0) and the one winner per sub-tile gets one
                # exact [1, _GLANES] divide below, so the stored t —
                # which feeds the slab-culling bound and Hit.t — never
                # carries the ~2^-12 approximation error.
                tt = td_s * mk._sel_recip(jnp.where(dvalid, det_s, 1.0))
                t_best = best_scratch[0:1, lo:lo + _GLANES]
                ok = (dvalid & (ud_s >= 0.0) & (vd_s >= 0.0)
                      & (ud_s + vd_s <= det_s) & (td_s > 0.0)
                      & (tt < t_best))
                tt = jnp.where(ok, tt, _BIG)
                t_blk = jnp.min(tt, axis=0, keepdims=True)
                win = tt <= t_blk
                i_blk = jnp.min(jnp.where(win, tri_iota, _BIG),
                                axis=0, keepdims=True)
                sel = tri_iota == i_blk       # unique winner one-hot
                det_w = jnp.sum(jnp.where(sel, det_s, 0.0),
                                axis=0, keepdims=True)
                td_w = jnp.sum(jnp.where(sel, td_s, 0.0),
                               axis=0, keepdims=True)
                t_w = td_w / jnp.where(det_w > _DET_EPS, det_w, 1.0)
                better = (t_blk < _BIG) & (t_w < t_best)
                best_scratch[0:1, lo:lo + _GLANES] = jnp.where(
                    better, t_w, t_best)
                best_scratch[1:2, lo:lo + _GLANES] = jnp.where(
                    better, i_blk + base_f,
                    best_scratch[1:2, lo:lo + _GLANES])
                if with_rows:
                    # Winner-row fetch from the resident attribute
                    # block: one [CLUSTER, ATTR_COLS] x one-hot f32
                    # contraction per improved sub-tile.
                    oh = (sel & better).astype(
                        jnp.float32)                 # [CLUSTER, GLANES]
                    # HIGHEST precision: a DEFAULT f32 dot rounds the
                    # operands to bf16 (kd 0.1 came back as bf16(0.1));
                    # the one-hot copy must be exact.
                    newrows = jax.lax.dot_general(
                        abuf, oh, (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
                    abest_scratch[:, lo:lo + _GLANES] = jnp.where(
                        better, newrows,
                        abest_scratch[:, lo:lo + _GLANES])

    # Level 0: all super-cluster AABBs vs the tile, each lane bounded by
    # its own t_init (per-ray culling), PLUS the packet's entry distance
    # per super — the visit loop below walks supers FRONT TO BACK by
    # that distance (the packet analog of the reference's
    # near-child-first stack order, kernel_bvh.cl:200-207). Without the
    # ordering, index-order visits defeat occlusion culling entirely on
    # deep scenes: every tile streams nearly the whole M-T table before
    # its closest hits tighten t_far. With it, the first supers resolve
    # most lanes and the RE-slab at each later visit (against the
    # updated per-lane best t) skips everything behind them.
    sup_hit, sup_tmin = _slab_panel(
        _aabb_cols(sup_ref, 0, num_supers),
        ox, oy, oz, ix, iy, iz, t_init, with_tmin=True)   # [S, TILE]
    any_hit = jnp.max(sup_hit.astype(jnp.float32), axis=1, keepdims=True)
    entry = jnp.min(sup_tmin, axis=1, keepdims=True)      # [S, 1]
    mask_scratch[pl.ds(0, num_supers), _COL_TMIN:_COL_TMIN + 1] = (
        jnp.where(any_hit > 0.0, entry, _BIG))
    sup_iota = jax.lax.broadcasted_iota(
        jnp.int32, (num_supers, 1), 0).astype(jnp.float32)

    def visit_body(step, _):
        # Nearest unvisited super (visited = entry column set to _BIG).
        tcol = mask_scratch[pl.ds(0, num_supers), _COL_TMIN:_COL_TMIN + 1]
        tm = jnp.min(tcol)
        s = jnp.min(jnp.where(tcol <= tm, sup_iota, _BIG)).astype(
            jnp.int32)

        @pl.when(tm < 0.5 * _BIG)
        def _():
            # Mark visited.
            mask_scratch[pl.ds(s, 1), _COL_TMIN:_COL_TMIN + 1] = (
                jnp.full((1, 1), _BIG, jnp.float32))
            # Re-slab this super against the CURRENT per-lane best —
            # supers behind every lane's closest hit vanish here,
            # before any cluster work or DMA.
            t_far = best_scratch[0:1, :]
            s_live = _slab_panel(_aabb_cols(sup_ref, s, 1),
                                 ox, oy, oz, ix, iy, iz, t_far)
            live_f = jnp.max(s_live.astype(jnp.float32))

            @pl.when(live_f > 0.0)
            def _():
                _visit_super(s)
        return 0

    def _visit_super(s):
            # Per-lane current-best bound (kernel_bvh.cl:167): rays that
            # already found a nearer hit stop opening clusters behind
            # it, independently of the other lanes.
            t_far = best_scratch[0:1, :]
            cl_hit = _slab_panel(
                _aabb_cols(cl_ref, s * SUPER, SUPER),
                ox, oy, oz, ix, iy, iz, t_far)       # [SUPER, TILE]
            cl_hit_f = cl_hit.astype(jnp.float32)
            # Per-sub-tile hit masks for ray compaction (intersect_block
            # skips sub-tiles whose 1/0 never set).
            gms = []
            for g in range(_GROUPS):
                gm = jnp.max(cl_hit_f[:, g * _GLANES:(g + 1) * _GLANES],
                             axis=1, keepdims=True)
                mask_scratch[pl.ds(0, SUPER), 3 + g:4 + g] = gm
                gms.append(gm)
            hits_f = jnp.minimum(sum(gms), 1.0)
            mask_scratch[pl.ds(0, SUPER), 1:2] = hits_f
            # Vector slot assignment: slot_j = #hits before j —
            # exclusive prefix sum as a strictly-lower-triangular
            # matmul (cumsum has no Mosaic lowering).
            row = jax.lax.broadcasted_iota(jnp.int32, (SUPER, SUPER), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (SUPER, SUPER), 1)
            tril = (row > col).astype(jnp.float32)
            slots = jnp.dot(tril, hits_f,
                            preferred_element_type=jnp.float32)
            mask_scratch[pl.ds(0, SUPER), 2:3] = jnp.where(
                hits_f > 0.0, slots, -1.0)
            # Vectorized slot -> cluster inversion: s2c[k] = the cluster
            # whose slot is k (one [NSLOTS, SUPER] compare + contraction)
            # so the launch loop below iterates NSLOTS times instead of
            # SUPER — per-visit scalar control is the serial tax of the
            # packet scheme, and the SUPER-long scalar scan dominated it
            # (measured +32% coherent / +23% incoherent on bunny when
            # replaced by this; column 0 of mask_scratch holds the
            # table so the slot column stays intact for the overflow
            # pass).
            slot_row = jnp.where(hits_f > 0.0, slots, -1.0)  # [SUPER,1]
            k_iota = jax.lax.broadcasted_iota(
                jnp.int32, (NSLOTS, SUPER), 0).astype(jnp.float32)
            j_iota = jax.lax.broadcasted_iota(
                jnp.int32, (NSLOTS, SUPER), 1).astype(jnp.float32)
            is_k = (k_iota == slot_row.reshape(1, SUPER)).astype(
                jnp.float32)
            s2c = jnp.sum(is_k * j_iota, axis=1, keepdims=True)
            mask_scratch[pl.ds(0, NSLOTS), 0:1] = s2c

            # Pass A: launch DMAs for slotted hit clusters; record
            # slot -> cluster id. (Static trip count + pl.when guards:
            # a DYNAMIC fori bound of min(n_hit, NSLOTS) was measured a
            # wash on incoherent wavefronts and -9% on coherent ones —
            # Mosaic's dynamic while-loop costs more than the skipped
            # guarded iterations save.)
            n_hit = jnp.sum(hits_f).astype(jnp.int32)
            def launch(k, _):
                @pl.when(k < n_hit)
                def _():
                    j = mask_scratch[k, 0].astype(jnp.int32)
                    base = (s * SUPER + j) * 4 * CLUSTER
                    pltpu.make_async_copy(
                        mtg_ref.at[pl.ds(base, 4 * CLUSTER), :],
                        blk_scratch.at[k],
                        dma_sems.at[k]).start()
                    if with_rows:
                        abase = (s * SUPER + j) * CLUSTER
                        pltpu.make_async_copy(
                            atr_ref.at[pl.ds(abase, CLUSTER), :],
                            abuf_scratch.at[k],
                            dma_sems2.at[k]).start()
                    slot_tbl[k] = j
                return 0
            jax.lax.fori_loop(0, min(NSLOTS, SUPER), launch, 0)

            # Pass B: drain slots in order, intersecting as copies land.
            def drain(k, _):
                @pl.when(k < n_hit)
                def _():
                    j = slot_tbl[k]
                    base = (s * SUPER + j) * 4 * CLUSTER
                    pltpu.make_async_copy(
                        mtg_ref.at[pl.ds(base, 4 * CLUSTER), :],
                        blk_scratch.at[k],
                        dma_sems.at[k]).wait()
                    if with_rows:
                        abase = (s * SUPER + j) * CLUSTER
                        pltpu.make_async_copy(
                            atr_ref.at[pl.ds(abase, CLUSTER), :],
                            abuf_scratch.at[k],
                            dma_sems2.at[k]).wait()
                        abuf = abuf_scratch[k]
                    else:
                        abuf = None
                    intersect_block(blk_scratch[k], abuf,
                                    jnp.float32((s * SUPER + j) * CLUSTER),
                                    j)
                return 0
            jax.lax.fori_loop(0, min(NSLOTS, SUPER), drain, 0)

            # Pass C: slot overflow (> NSLOTS hit clusters) — serial
            # fetch + intersect; rare for coherent packets.
            @pl.when(n_hit > NSLOTS)
            def _():
                def leftover(j, _):
                    @pl.when(mask_scratch[j, 2] >= float(NSLOTS))
                    def _():
                        base = (s * SUPER + j) * 4 * CLUSTER
                        dma = pltpu.make_async_copy(
                            mtg_ref.at[pl.ds(base, 4 * CLUSTER), :],
                            blk_scratch.at[0],
                            dma_sems.at[0])
                        dma.start()
                        if with_rows:
                            abase = (s * SUPER + j) * CLUSTER
                            adma = pltpu.make_async_copy(
                                atr_ref.at[pl.ds(abase, CLUSTER), :],
                                abuf_scratch.at[0],
                                dma_sems2.at[0])
                            adma.start()
                        dma.wait()
                        if with_rows:
                            adma.wait()
                            abuf = abuf_scratch[0]
                        else:
                            abuf = None
                        intersect_block(
                            blk_scratch[0], abuf,
                            jnp.float32((s * SUPER + j) * CLUSTER), j)
                    return 0
                jax.lax.fori_loop(0, SUPER, leftover, 0)

    jax.lax.fori_loop(0, num_supers, visit_body, 0)

    tout_ref[:] = best_scratch[0:1, :].reshape(_ROWS, _LANES)
    idx_ref[:] = (best_scratch[1:2, :].reshape(_ROWS, _LANES)
                  .astype(jnp.int32))
    if with_rows:
        rows_ref[:] = abest_scratch[:, :].reshape(ATTR_COLS, _ROWS,
                                                  _LANES)


def _run_clustered(cg: ClusteredGeometry, o, d, t_init, backface_cull,
                   with_rows: bool = False):
    R = o.shape[0]
    pad = (-R) % _TILE
    Rp = R + pad

    def panels(a, fill=0.0):
        a = jnp.pad(a, (0, pad), constant_values=fill)
        return a.reshape(Rp // _LANES, _LANES)

    comps = [panels(o[:, 0]), panels(o[:, 1]), panels(o[:, 2]),
             panels(d[:, 0]), panels(d[:, 1]), panels(d[:, 2], fill=1.0),
             panels(t_init, fill=0.0)]

    S_rows = cg.sup_aabb.shape[0]
    num_supers = cg.num_supers
    grid = (Rp // _TILE,)
    n_rows = Rp // _LANES
    ray_spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)

    with_rows = with_rows and cg.attrs is not None
    kernel = functools.partial(_clustered_kernel, num_supers=num_supers,
                               backface_cull=backface_cull,
                               with_rows=with_rows)
    in_specs = [full(cg.sup_aabb.shape), full(cg.cl_aabb.shape),
                # M-T limb rows stay in HBM; clusters are DMA'd on
                # demand.
                pl.BlockSpec(memory_space=pl.ANY)]
    inputs = [cg.sup_aabb, cg.cl_aabb, cg.mtg]
    if with_rows:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # attrs, HBM
        inputs.append(cg.attrs)
    in_specs += [ray_spec] * 7
    out_specs = [ray_spec, ray_spec]
    out_shape = [
        jax.ShapeDtypeStruct((n_rows, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows, _LANES), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((max(S_rows, SUPER), _MASK_COLS),
                   jnp.float32),                           # masks
        pltpu.VMEM((8, _TILE), jnp.float32),               # best t/idx
        pltpu.VMEM((NSLOTS, 4 * CLUSTER, _MTG_LANES),
                   jnp.bfloat16),                          # M-T blocks
        pltpu.SMEM((NSLOTS,), jnp.int32),                  # slot table
        pltpu.SemaphoreType.DMA((NSLOTS,)),
    ]
    if with_rows:
        out_specs.append(pl.BlockSpec((ATTR_COLS, _ROWS, _LANES),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((ATTR_COLS, n_rows, _LANES),
                                 jnp.float32))
        scratch += [
            pltpu.VMEM((NSLOTS, CLUSTER, ATTR_COLS), jnp.float32),
            pltpu.VMEM((ATTR_COLS, _TILE), jnp.float32),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*inputs, *comps)
    t_out, idx_out = outs[0], outs[1]
    rows = None
    if with_rows:
        from ..shading import ShadingTable
        rows = (outs[2].reshape(ATTR_COLS, -1)[:ShadingTable.COLS, :R]
                .T)                                     # [R, 34]
    return t_out.reshape(-1)[:R], idx_out.reshape(-1)[:R], rows


def intersect_clustered(o: jax.Array, d: jax.Array,
                        cg: ClusteredGeometry, t_max: float,
                        backface_cull: bool = False) -> Hit:
    """Closest hit via the clustered kernel (original triangle ids).
    When the accel carries shading attrs, the Hit also returns the
    winner's shading row per ray (Hit.rows — zeros for misses),
    fetched in-traversal from the resident cluster block."""
    o = jax.lax.stop_gradient(o).astype(jnp.float32)
    d = jax.lax.stop_gradient(d).astype(jnp.float32)
    t_init = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_best, slot, rows = _run_clustered(cg, o, d, t_init, backface_cull,
                                        with_rows=True)
    hit = slot >= 0
    tri_idx = jnp.take(cg.slot_to_tri, jnp.maximum(slot, 0))
    return Hit(t=jnp.where(hit, t_best, t_max),
               tri_idx=jnp.where(hit, tri_idx, 0),
               hit=hit, rows=rows)


def occluded_clustered(o: jax.Array, d: jax.Array, t_limit: jax.Array,
                       cg: ClusteredGeometry,
                       backface_cull: bool = False) -> jax.Array:
    o = jax.lax.stop_gradient(o).astype(jnp.float32)
    d = jax.lax.stop_gradient(d).astype(jnp.float32)
    t_init = jnp.where(jnp.isfinite(t_limit), t_limit, _BIG)
    t_init = jax.lax.stop_gradient(t_init).astype(jnp.float32)
    _, slot, _ = _run_clustered(cg, o, d, t_init, backface_cull)
    return slot >= 0


def build_accel(geometry: Geometry, materials=None) -> ClusteredGeometry:
    """Host-side accel build: SAH clusters via the native C++ builder
    when available (mini_opencl_raytracer_tpu.native), else Morton.
    Call OUTSIDE jit with concrete arrays; pass the result through
    ``accel`` parameters. With ``materials`` the accel carries shading
    rows so closest hits return winner attributes in-traversal."""
    import numpy as np
    from ... import native
    # NOTE: fetch WITHOUT a dtype argument, then cast —
    # np.asarray(jax_array, np.float32) takes a pathological
    # per-element conversion path through the tunneled runtime
    # (measured 162 s for three [260k, 3] arrays; plain fetch: 0.7 s).
    import time as _time
    timing = os.environ.get("MRT_BUILD_TIMING")
    marks = [("start", _time.perf_counter())]

    def mark(name):
        if timing:
            marks.append((name, _time.perf_counter()))

    def fetch_f32(a):
        return np.asarray(a).astype(np.float32, copy=False)

    g = geometry
    v0, v1, v2 = fetch_f32(g.v0), fetch_f32(g.v1), fetch_f32(g.v2)
    mark("fetch corners")
    leaf_info = None
    if native.available():
        leaf_info = native.sah_order(v0, v1, v2, leaf_size=CLUSTER)
    mark("native SAH")
    if leaf_info is None:
        return build_clusters(geometry, materials=materials)
    # Host-side (numpy) gathers + ONE jitted device dispatch. XLA:TPU
    # row gathers move <1M narrow rows/s and eager dispatch pays the
    # rig round-trip per op, so the slot reordering, the shading-row
    # snapshot, and the slot tables are plain numpy indexing here
    # (milliseconds); the device stage only does the layout-friendly
    # math (limb-packed M-T rows + AABB reductions).
    order, valid = _slots_from_leaf_info(leaf_info, v0.shape[0])
    real = valid[:, None]

    def take_pad(a):
        return np.where(real, a[order], _BIG).astype(np.float32)

    pv0, pv1, pv2 = take_pad(v0), take_pad(v1), take_pad(v2)
    mark("slot gathers")
    mtg, cl_aabb, sup_aabb = _device_tables_jit(
        jnp.asarray(pv0.ravel()), jnp.asarray(pv1.ravel()),
        jnp.asarray(pv2.ravel()), jnp.asarray(valid))
    mark("device tables")
    attrs = None
    slot_mat = None
    if materials is not None:
        # Host-side shading table (ops/shading.build_shading_table's
        # exact column layout, assembled in numpy — building it on
        # device eagerly + fetching measured 3.2 s at sponza scale).
        mi = np.asarray(g.mat_idx)
        st = np.concatenate([
            v0, v1, v2,
            fetch_f32(g.n0), fetch_f32(g.n1), fetch_f32(g.n2),
            fetch_f32(g.uv0), fetch_f32(g.uv1), fetch_f32(g.uv2),
            fetch_f32(materials.diffuse)[mi],
            fetch_f32(materials.specular)[mi],
            fetch_f32(materials.emission)[mi],
            fetch_f32(materials.roughness)[mi][:, None]], axis=1)
        mark("host shading table")
        rows_ = np.where(real, st[order], 0.0).astype(np.float32)
        # Upload the 34 real columns and pad to the 128-lane tile on
        # device: uploading the padded [T_pad, 128] f32 table costs 4x
        # the bytes over the tunnel (measured 5 s for sponza).
        attrs = _pad_attrs_jit(jnp.asarray(rows_))
        slot_mat = jnp.asarray(np.where(valid, mi[order], 0)
                               .astype(np.int32))
        mark("attrs upload")
    out = ClusteredGeometry(
        mtg=mtg, cl_aabb=cl_aabb, sup_aabb=sup_aabb,
        slot_to_tri=jnp.asarray(
            np.where(valid, order, 0).astype(np.int32)),
        attrs=attrs, slot_mat=slot_mat)
    if timing:
        jax.block_until_ready(out.mtg)
        marks.append(("sync", _time.perf_counter()))
        for (a, ta), (b, tb) in zip(marks, marks[1:]):
            print(f"build_accel {b}: {(tb - ta) * 1e3:.0f} ms",
                  flush=True)
    return out


def _check_layout(cg: ClusteredGeometry) -> None:
    """Fail loudly when an accel was built under different
    MRT_CLUSTER/MRT_SUPER env settings than this process: the slot
    layout (cluster size, supers-per-level) is baked into the accel's
    array shapes, and a mismatch silently mis-indexes triangles."""
    T_pad = cg.mtg.shape[0] // 4
    C_pad = T_pad // CLUSTER
    S = max(C_pad // SUPER, 1)
    if (T_pad % CLUSTER or C_pad % SUPER
            or cg.cl_aabb.shape[0] != max(_ceil_to(C_pad, 8), 8)
            or cg.sup_aabb.shape[0] != max(_ceil_to(S, 8), 8)):
        raise ValueError(
            f"accel layout mismatch: accel has T_pad={T_pad}, "
            f"cl_rows={cg.cl_aabb.shape[0]}, sup_rows="
            f"{cg.sup_aabb.shape[0]}, but this process expects "
            f"CLUSTER={CLUSTER}, SUPER={SUPER} (MRT_CLUSTER/MRT_SUPER "
            f"env) — rebuild the accel under the current settings")


def _refresh_attrs(cg: ClusteredGeometry, materials) -> ClusteredGeometry:
    """Replace the attrs' material columns (kd/ks/ke/ns) with the LIVE
    material values so a prebuilt accel keeps tracking material updates
    during optimization (see ClusteredGeometry.slot_mat). One small
    [M, 10] one-hot fetch + one attrs copy — ~0.3 ms at sponza scale."""
    from ..shading import ShadingTable, take_rows
    mat_tab = jnp.concatenate([
        materials.diffuse, materials.specular, materials.emission,
        materials.roughness[:, None]], axis=1)        # [M, 10]
    live = jax.lax.stop_gradient(
        take_rows(mat_tab.astype(jnp.float32), cg.slot_mat))
    attrs = jnp.concatenate([
        cg.attrs[:, :ShadingTable.KD], live,
        cg.attrs[:, ShadingTable.NS + 1:]], axis=1)
    return cg._replace(attrs=attrs)


def make_intersectors(geometry: Geometry, cfg: RenderConfig, accel=None,
                      materials=None):
    if accel is not None:
        _check_layout(accel)
        cg = accel
        if (materials is not None and cg.attrs is not None
                and cg.slot_mat is not None):
            cg = _refresh_attrs(cg, materials)
    else:
        cg = build_clusters(geometry, materials=materials)
    closest = functools.partial(intersect_clustered, cg=cg, t_max=cfg.t_max,
                                backface_cull=cfg.backface_cull)
    any_hit = functools.partial(occluded_clustered, cg=cg,
                                backface_cull=cfg.backface_cull)
    return closest, any_hit
