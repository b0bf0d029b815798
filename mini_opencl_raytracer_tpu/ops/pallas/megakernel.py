"""Fused Pallas TPU bounce megakernel: one kernel per bounce, the whole
bounce fused (intersect + gather + BRDF + lights + throughput update).

This is the TPU analog of the reference's single-kernel frame
(``KernelEntry``, kernel_bvh.cl:415-456). The round-1 profile
(benchmarks/PROFILE.md) showed the per-bounce jnp pipeline spending ~70%
of the differentiable step shuttling dozens of [2M,3] intermediates
through HBM; here each bounce is ONE ``pallas_call`` whose only HBM
traffic is the compact ray state (o, d, beta, alive — 10 floats/ray),
the per-bounce radiance contribution and a hit-index record.

Why per-bounce rather than all bounces in one kernel: Mosaic compile
time explodes superlinearly when the gathered-attribute dataflow chains
across unrolled bounces inside one kernel (2 fused bounces already
compile for >8 minutes; one bounce compiles in ~15 s). The bounce chain
is therefore composed at the host level, which also means ONE compiled
kernel serves every bounce: the per-bounce RNG counters enter as data
(pre-mixed constants), not as baked kernel constants.

Layout: rays are processed in groups of ``_ROWS`` x 128 (one grid step),
every per-ray scalar is a full [_ROWS, 128] f32 tile so each VPU
instruction runs at full width. Vectors are SoA component tuples
(x, y, z) of such tiles; between kernels the state rides in stacked
[3, R/128, 128] panel arrays. Intersection is dense Moller-Trumbore with
the four M-T determinants computed on the MXU as one limb-packed bf16
matmul per triangle block (see build_mt_table — f32-accurate at
single-pass cost), leaving the VPU only the sign tests and the closest
reduction (the megakernel targets VMEM-resident scenes, T <= _MAX_TRIS;
larger scenes stay on the clustered kernel). Hit attributes are fetched
with per-row one-hot MXU matmuls against a [C, T] shading table — the
TPU-native gather.

Differentiability (custom VJP per bounce, SURVEY.md section 7 step 5):

* forward kernel: hard closest hits; records the winning triangle index
  ([R] int32 — the only residual beyond the bounce inputs);
* backward kernel: replays the bounce as a *pure* function with the
  recorded indices frozen (one-hot constants) and runs ``jax.vjp`` of
  that function **inside the kernel** — per-bounce intermediates never
  touch HBM. Gradients w.r.t. the shading table and lights accumulate
  across grid steps in VMEM-resident accumulator outputs; gradients
  w.r.t. the ray state stream out per block. JAX's autodiff chains the
  per-bounce VJPs in reverse order automatically.

RNG is the same counter-based lowbias32 hash as ops/rng.py with the
identical draw-site layout, so the megakernel's radiance matches the
jnp integrator (ops/integrator.trace_paths) to float tolerance on every
backend — the basis of the cross-backend allclose tests.

Numerical error model of the MXU M-T path: the limb split carries the
full f32 product, so det/ud/vd/td match an f32 evaluation to ~1 ulp,
but the derived ``t = td/det`` carries an ABSOLUTE error of roughly
``2^-24 * |o . n| / det`` — for hits at tiny t the *relative* t error
can be large when the scene's world coordinates are big. Winner
*selection* is unaffected in practice (all candidates share the error
scale) and shading recomputes (t, u, v) exactly on the winner
(_winner_point), so images are exact-f32; only raw ``t`` consumers see
the absolute tolerance (tests use atol 5e-4 at Cornell world scale).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RenderConfig
from ...models.scene import Lights, Materials, Geometry, Scene

_LANES = 128
# Ray rows per grid step (rays = _ROWS*128). Swept 16/32/64/128 on v5e
# at 1080p: 387/402/409/407 Mrays/s fwd+bwd — 64 is the plateau. The
# env override exists for benchmarking sweeps only (read once at import).
_ROWS = int(os.environ.get("MRT_MEGA_ROWS", "64"))
_TILE = _ROWS * _LANES
_MAX_TRIS = 2048               # VMEM-resident scene limit for this path
_TRI_BLOCK = 64                # triangles per [TB, ROWS, 128] M-T panel
_BIG = 3.0e38
_DET_EPS = 1e-10
_TWO_PI = 2.0 * np.pi
_INV_PI = 1.0 / np.pi

# Shading-table row layout ([C_PAD, T_pad], attribute rows x triangles).
_V0, _E1, _E2 = 0, 3, 6
_N0, _N1, _N2 = 9, 12, 15
_KD, _KS, _KE = 18, 21, 24
_NS = 27
_C = 28
_C_PAD = 32
# lights vector column layout ([L, 16]).
_LPOS, _LDIR, _LTYPE, _LINT, _LATT, _LCUT = 0, 3, 6, 7, 8, 9
_LCOLS = 16


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# Approximate-reciprocal candidate SELECTION (compiled TPU only;
# MRT_APPROX_SELECT=0 restores the exact divide, =force enables it even
# under interpret for tests). The closest-hit divide only ORDERS
# candidates: _mt_closest returns the winner INDEX and _winner_point
# recomputes (t, u, v) with an exact divide, so the ~2^-12-relative
# `pl.reciprocal(approx=True)` can only flip winners between triangles
# separated by < ~2.4e-4 relative in t — knife edges where either
# winner shades the same to float tolerance (the clustered kernel
# additionally re-divides its stored winner t exactly; see
# clustered.intersect_block). Exact under interpret so the CPU
# equivalence suite keeps its tight tolerances; the compiled path is
# gated on device by benchmarks/verify_tpu.py.
_APPROX_SELECT = os.environ.get("MRT_APPROX_SELECT", "1")


def _sel_recip(x):
    """Reciprocal used only to ORDER closest-hit candidates."""
    if _APPROX_SELECT == "force" or (
            _APPROX_SELECT != "0" and not _interpret()):
        return pl.reciprocal(x, approx=True)
    return 1.0 / x


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _tri_pad(T: int) -> int:
    if T <= _TRI_BLOCK:
        return _ceil_to(max(T, 8), 8)
    return _ceil_to(T, _TRI_BLOCK)


# ---------------------------------------------------------------------------
# SoA float3 helpers over [_ROWS, 128] tiles (the in-kernel analog of
# ops/linalg.py; reference float3, CLmathlib.hpp:18-118).

def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _mul3(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _neg3(a):
    return (-a[0], -a[1], -a[2])


def _where3(m, a, b):
    return (jnp.where(m, a[0], b[0]),
            jnp.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]))


def _normalize3(a, eps=1e-20):
    inv = jax.lax.rsqrt(jnp.maximum(_dot3(a, a), eps))
    return _scale3(a, inv)


def _reflect3(v, n):
    """Reference convention (kernel_bvh.cl:74-77): -v + 2 (v.n) n."""
    s = 2.0 * _dot3(v, n)
    return (-v[0] + s * n[0], -v[1] + s * n[1], -v[2] + s * n[2])


# ---------------------------------------------------------------------------
# Known-value residual channel: the backward kernel's bounce replay with
# every transcendental removed.
#
# The forward kernel (VJP mode) EMITS each expensive intermediate it
# computes (exp/log/sqrt/rsqrt/sincos outputs — ~17 f32 rows per ray) as
# an extra kernel output; the backward kernel's replay READS them back
# and substitutes the first-order known-value node
#
#     _lin(x, y0, dy0) = y0 + dy0 * (x - stop_gradient(x))
#
# whose runtime VALUE is exactly the recorded forward value y0 (the
# bracket is identically zero) and whose VJP w.r.t. x is the closed-form
# local derivative dy0 (built from y0 with at most one division). Since
# the replay runs on the same inputs as the forward, y0 IS f(x), so
# jax.vjp through the substituted graph produces the exact same
# gradients as differentiating the original — with zero transcendental
# recomputation, and (because every RNG draw feeds only such recorded
# constants) zero RNG hashing in the backward kernel.

def _lin(x, y0, dy0):
    return y0 + dy0 * (x - jax.lax.stop_gradient(x))


class _Resid:
    """Writer (forward kernel) / reader (backward replay) of the
    known-value rows, in one fixed emission order enforced by the shared
    code path through the _k_* helpers."""

    def __init__(self, rows=None):
        self._rows = [] if rows is None else None
        self._read = rows
        self._i = 0

    @property
    def writing(self) -> bool:
        return self._rows is not None

    def emit(self, v):
        self._rows.append(v)
        return v

    def take(self):
        v = self._read[self._i]
        self._i += 1
        return v

    @property
    def rows(self):
        return self._rows

    @property
    def taken(self) -> int:
        return self._i


def _k_exp(kn, x):
    if kn is None:
        return jnp.exp(x)
    if kn.writing:
        return kn.emit(jnp.exp(x))
    y0 = kn.take()
    return _lin(x, y0, y0)


def _k_sqrt(kn, x):
    if kn is None:
        return jnp.sqrt(x)
    if kn.writing:
        return kn.emit(jnp.sqrt(x))
    y0 = kn.take()
    return _lin(x, y0, 0.5 / jnp.maximum(y0, 1e-20))


def _k_recip(kn, x):
    """1/x with known-value support (x bounded away from 0 by caller)."""
    if kn is None:
        return 1.0 / x
    if kn.writing:
        return kn.emit(1.0 / x)
    y0 = kn.take()
    return _lin(x, y0, -y0 * y0)


def _k_const(kn, fn):
    """A value independent of every differentiable input (pure RNG
    function): the reader returns the recorded tile without evaluating
    ``fn`` at all — this is what removes RNG hashing from the backward
    kernel."""
    if kn is None:
        return fn()
    if kn.writing:
        return kn.emit(fn())
    return kn.take()


def _k_normalize3(kn, a, eps=1e-20):
    if kn is None:
        return _normalize3(a, eps)
    q = jnp.maximum(_dot3(a, a), eps)
    if kn.writing:
        inv = kn.emit(jax.lax.rsqrt(q))
    else:
        y0 = kn.take()
        inv = _lin(q, y0, -0.5 * y0 * y0 * y0)
    return _scale3(a, inv)


def _k_pow(kn, base, e):
    """base**e (both differentiable; base > 0 ensured by caller)."""
    if kn is None:
        return jnp.power(base, e)
    if kn.writing:
        y = kn.emit(jnp.power(base, e))
        kn.emit(jnp.log(jnp.maximum(base, 1e-20)))
        return y
    y0 = kn.take()
    log_b = kn.take()
    d_base = e * y0 / jnp.maximum(base, 1e-20)
    return (y0 + d_base * (base - jax.lax.stop_gradient(base))
            + (y0 * log_b) * (e - jax.lax.stop_gradient(e)))


def _k_sigmoid(kn, x):
    if kn is None:
        return jax.nn.sigmoid(x)
    if kn.writing:
        return kn.emit(jax.nn.sigmoid(x))
    y0 = kn.take()
    return _lin(x, y0, y0 * (1.0 - y0))


# ---------------------------------------------------------------------------
# Counter-based RNG (bit-identical to ops/rng.py).

_GOLDEN = np.uint32(0x9E3779B9)
_M1 = np.uint32(0x7FEB352D)
_M2 = np.uint32(0x846CA68B)


def _mix_u32(x):
    """lowbias32 mixer; works on panels and traced scalars alike."""
    x = x ^ (x >> 16)
    x = x * _M1
    x = x ^ (x >> 15)
    x = x * _M2
    x = x ^ (x >> 16)
    return x


# raygen consumes sites 0-1 (ops/rng.py RAYGEN_DRAWS); bounce sites follow.
_RAYGEN_DRAWS = 2
_DRAWS_PER_BOUNCE = 8
_SITE_LOBE, _SITE_DIFF_PHI, _SITE_DIFF_R2 = 0, 1, 2
_SITE_SPEC_PHI, _SITE_SPEC_COS = 3, 4
_NUM_SITES = 5


def _bounce_site(bounce, site):
    return int(_RAYGEN_DRAWS + bounce * _DRAWS_PER_BOUNCE + site)


def _premixed_counter(counter: int) -> int:
    """Host-side half of ops/rng.hash_combine: mix(counter) + GOLDEN."""
    m = 0xFFFFFFFF
    c = int(counter) & m
    c = c ^ (c >> 16)
    c = (c * int(_M1)) & m
    c = c ^ (c >> 15)
    c = (c * int(_M2)) & m
    c = c ^ (c >> 16)
    return (c + int(_GOLDEN)) & m


def _bounce_cms(bounce: int) -> jax.Array:
    """[_NUM_SITES, _ROWS, _LANES] u32 of pre-mixed per-site counters for
    ``bounce`` — passed to the kernels as data so one compiled kernel
    serves every bounce."""
    vals = np.array([_premixed_counter(_bounce_site(bounce, s))
                     for s in range(_NUM_SITES)], np.uint32)
    return jnp.asarray(np.broadcast_to(
        vals[:, None, None], (_NUM_SITES, _ROWS, _LANES)))


def _uniform_cm(seeds, cm):
    """[0,1) f32 tile from the pre-mixed counter tile ``cm`` — the
    in-kernel half of ops/rng.uniform (bit-identical)."""
    bits = _mix_u32(seeds ^ cm)
    # Mosaic has no u32->f32 cast; bits >> 8 < 2^24 fits i32 exactly.
    return ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(1.0 / (1 << 24)))


# ---------------------------------------------------------------------------
# In-kernel building blocks (all pure functions of values).

# MXU Moller-Trumbore: the four M-T determinants are bilinear forms in
# per-ray features F = [d, o x d, o, 1] and per-triangle constants
# (triple-product expansion of kernel_bvh.cl:98-153):
#   det    = d . (e2 x e1)
#   u*det  = (o x d) . e2 + d . (v0 x e2)
#   v*det  = -(o x d) . e1 - d . (v0 x e1)
#   t*det  = o . n - v0 . n,   n = e1 x e2
# so one [4*TB, K] @ [K, rays] matmul computes every ray-triangle pair's
# det/ud/vd/td on the MXU, leaving the VPU only the cheap epilogue
# (sign tests + closest reduction). f32 accuracy at one-pass cost: both
# operands are split into 3 bf16 limbs and the six significant limb
# products are packed along K (6 x 16 = 96 <= 128), which the MXU
# accumulates in f32 in a single pass — the manual equivalent of
# Precision.HIGHEST without its 6 separate passes.
_MT_K = 16          # feature columns (10 used, padded to sublane tile)
_MT_LIMB_K = 6 * _MT_K
_MT_BLOCK = 128     # triangles per matmul block (VMEM: [4*TB, R] f32)

# (G limb, F limb) significance pairs covering products down to 2^-24.
_LIMB_PAIRS = ((0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0))


def _split3_bf16(x, barrier: bool = False):
    """3-limb bf16 decomposition: x ~= l0 + l1 + l2 exactly to f32.

    ``barrier=True`` wraps each rounding step in an optimization barrier:
    under jit, XLA's algebraic simplifier otherwise cancels the
    ``x - f32(bf16(x))`` residuals (treating the down-up cast as exact),
    silently zeroing the l1/l2 limbs and degrading the split to plain
    bf16 — measured as coplanar-surface misordering at render time.
    Inside Pallas kernels Mosaic performs no such rewrite (and does not
    support the barrier), so kernel-side splits pass ``False``.
    """
    def snap(v):
        return jax.lax.optimization_barrier(v) if barrier else v

    l0 = snap(x.astype(jnp.bfloat16))
    r1 = x - l0.astype(jnp.float32)
    l1 = snap(r1.astype(jnp.bfloat16))
    l2 = (r1 - l1.astype(jnp.float32)).astype(jnp.bfloat16)
    return l0, l1, l2


def _mt_block_pad(T: int) -> int:
    if T <= _MT_BLOCK:
        return _ceil_to(max(T, 8), 8)
    return _ceil_to(T, _MT_BLOCK)


def mt_limb_rows(v0: jax.Array, e1: jax.Array, e2: jax.Array,
                 tb: int, lane_pad: int = _MT_LIMB_K) -> jax.Array:
    """[4 * T, lane_pad] bf16 limb-packed M-T rows from (already padded
    and ordered) triangle arrays; T must be a multiple of ``tb``.

    Row layout is block-major so a kernel slices one triangle block's
    4*tb rows contiguously: for each block of tb triangles — tb det
    rows, tb ud rows, tb vd rows, tb td rows. Degenerate (all-zero or
    zero-edge) padding triangles produce all-zero rows -> det == 0 ->
    rejected by the epilogue's |det| test. Columns beyond _MT_LIMB_K are
    zero so callers may pad K to a full lane tile and matmul with a
    zero-extended feature matrix."""
    T = v0.shape[0]
    n = jnp.cross(e1, e2)
    # Build in TRANSPOSED [4, K, T] layout: with T (large, 128-tileable)
    # as the minor dim every op here is layout-friendly. The obvious
    # [4, T, 16] ``.at[...].set`` construction puts a 16-wide minor dim
    # on every tensor, which XLA:TPU stores one padded tile per row —
    # measured 68 s for a 266k-triangle build (this form: <1 s).
    z = jnp.zeros((T,), jnp.float32)

    def c3(a):
        return (a[:, 0], a[:, 1], a[:, 2])

    zeros = (z,) * 3
    det_rows = (*c3(-n), *zeros, *zeros, *((z,) * 7))
    ud_rows = (*c3(jnp.cross(v0, e2)), *c3(e2), *zeros, *((z,) * 7))
    vd_rows = (*c3(-jnp.cross(v0, e1)), *c3(-e1), *zeros, *((z,) * 7))
    td_rows = (*zeros, *zeros, *c3(n), -jnp.sum(v0 * n, axis=1),
               *((z,) * 6))
    A = jnp.stack([jnp.stack(det_rows), jnp.stack(ud_rows),
                   jnp.stack(vd_rows), jnp.stack(td_rows)])  # [4, K, T]
    g0, g1, g2 = _split3_bf16(A, barrier=True)
    limbs = [g0, g1, g2]
    out = jnp.concatenate([limbs[i] for i, _ in _LIMB_PAIRS],
                          axis=1)                     # [4, 6K, T] bf16
    if lane_pad > _MT_LIMB_K:
        out = jnp.pad(out, ((0, 0), (0, lane_pad - _MT_LIMB_K), (0, 0)))
    # One tile-friendly transpose into row-major, then the block-major
    # interleave (minor dim is lane_pad=96/128 from here on).
    outT = jnp.transpose(out, (0, 2, 1))              # [4, T, lane_pad]
    return (outT.reshape(4, T // tb, tb, lane_pad)
            .transpose(1, 0, 2, 3).reshape(4 * T, lane_pad))


def build_mt_table(geometry: Geometry) -> jax.Array:
    """[4 * T_pad, 96] bf16 limb-packed M-T table (non-differentiable;
    closest-hit selection is a discrete choice — gradients flow through
    the winner replay, not the selection, SURVEY.md section 7 step 5)."""
    g = geometry
    v0 = jax.lax.stop_gradient(g.v0).astype(jnp.float32)
    e1 = jax.lax.stop_gradient(g.v1).astype(jnp.float32) - v0
    e2 = jax.lax.stop_gradient(g.v2).astype(jnp.float32) - v0
    T = v0.shape[0]
    T_pad = _mt_block_pad(T)
    tb = min(T_pad, _MT_BLOCK)
    pad = ((0, T_pad - T), (0, 0))
    return mt_limb_rows(jnp.pad(v0, pad), jnp.pad(e1, pad),
                        jnp.pad(e2, pad), tb)


def _mt_features(o3, d3, k_pad: int = _MT_LIMB_K):
    """Limb-packed ray-feature matrix [k_pad, tile] bf16 for the M-T
    matmul; rays arrive as [rows, 128] component tiles and are flattened
    into lanes. Rows beyond _MT_LIMB_K are zero (for K padded to a full
    lane tile)."""
    tile = o3[0].shape[0] * o3[0].shape[1]

    def flat(x):                       # [rows, 128] -> [1, rows*128]
        return x.reshape(1, tile)

    c3 = _cross3(o3, d3)
    one = jnp.ones((1, tile), jnp.float32)
    zero6 = jnp.zeros((_MT_K - 10, tile), jnp.float32)
    F = jnp.concatenate(
        [flat(d3[0]), flat(d3[1]), flat(d3[2]),
         flat(c3[0]), flat(c3[1]), flat(c3[2]),
         flat(o3[0]), flat(o3[1]), flat(o3[2]), one, zero6], axis=0)
    fl = _split3_bf16(F)
    out = jnp.concatenate([fl[j] for _, j in _LIMB_PAIRS], axis=0)
    if k_pad > _MT_LIMB_K:
        out = jnp.concatenate(
            [out, jnp.zeros((k_pad - _MT_LIMB_K, tile), jnp.bfloat16)],
            axis=0)
    return out


def _mt_block_dets(g_ref, b: int, tb: int, F_limbs, backface_cull: bool):
    """One triangle block's sign-adjusted (det_s, ud_s, vd_s, td_s)
    panels [tb, _TILE] from a single MXU pass (see build_mt_table)."""
    g_blk = g_ref[pl.ds(b * 4 * tb, 4 * tb), :]
    res = jax.lax.dot_general(
        g_blk, F_limbs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [4*tb, TILE]
    det = res[0 * tb:1 * tb]
    ud = res[1 * tb:2 * tb]
    vd = res[2 * tb:3 * tb]
    td = res[3 * tb:4 * tb]
    if backface_cull:
        return det, ud, vd, td
    s = jnp.where(det >= 0.0, 1.0, -1.0)
    return det * s, ud * s, vd * s, td * s


def _mt_closest(g_ref, o3, d3, t_max: float, backface_cull: bool,
                T_pad: int):
    """Dense closest-hit Moller-Trumbore over all triangles, det/ud/vd/td
    on the MXU (see build_mt_table). ``g_ref``: [4 * T_pad, 96] bf16 VMEM
    ref. Rays as [_ROWS, 128] component tiles. Returns the winning
    triangle index [_ROWS, 128] i32 (-1 = miss). Non-differentiable
    (forward only)."""
    tb = min(T_pad, _MT_BLOCK)
    n_blocks = T_pad // tb
    F_limbs = _mt_features(o3, d3)
    iota_t = jax.lax.broadcasted_iota(
        jnp.int32, (tb, _TILE), 0).astype(jnp.float32)

    def block_body(b, carry):
        t_best, i_best = carry         # [1, TILE] f32 each
        det_s, ud_s, vd_s, td_s = _mt_block_dets(g_ref, b, tb, F_limbs,
                                                 backface_cull)
        dvalid = det_s > _DET_EPS
        # Selection-only reciprocal (see _sel_recip): t > 0 is tested
        # division-free (det_s > 0, so sign(tt) == sign(td_s)).
        tt = td_s * _sel_recip(jnp.where(dvalid, det_s, 1.0))
        ok = (dvalid & (ud_s >= 0.0) & (vd_s >= 0.0)
              & (ud_s + vd_s <= det_s) & (td_s > 0.0) & (tt < t_best))
        tt = jnp.where(ok, tt, _BIG)

        t_blk = jnp.min(tt, axis=0, keepdims=True)   # [1, TILE]
        win = tt <= t_blk
        i_blk = jnp.min(jnp.where(win, iota_t, _BIG), axis=0, keepdims=True)
        better = t_blk < t_best
        t_best = jnp.where(better, t_blk, t_best)
        i_best = jnp.where(better, i_blk + jnp.float32(b * tb), i_best)
        return t_best, i_best

    t0 = jnp.full((1, _TILE), min(t_max, _BIG), jnp.float32)
    i0 = jnp.full((1, _TILE), -1.0, jnp.float32)
    if n_blocks == 1:
        t_best, i_best = block_body(0, (t0, i0))
    else:
        t_best, i_best = jax.lax.fori_loop(0, n_blocks, block_body, (t0, i0))
    return i_best.reshape(_ROWS, _LANES).astype(jnp.int32)


def _mt_anyhit(g_ref, o3, d3, t_limit, backface_cull: bool, T_pad: int):
    """Any-hit (shadow) query: True where some triangle lies at
    0 < t < t_limit (occluded_brute semantics, ops/intersect.py:168).
    ``t_limit``: [_ROWS, 128] per-ray bound. No winner tracking — just a
    masked any-reduction per block, so a shadow pass costs one MXU pass
    plus ~half the closest-hit epilogue."""
    tb = min(T_pad, _MT_BLOCK)
    n_blocks = T_pad // tb
    F_limbs = _mt_features(o3, d3)
    tlim = t_limit.reshape(1, _TILE)

    def block_body(b, occ):
        det_s, ud_s, vd_s, td_s = _mt_block_dets(g_ref, b, tb, F_limbs,
                                                 backface_cull)
        dvalid = det_s > _DET_EPS
        # Division-free and EXACT (modulo one product rounding): with
        # det_s > 0, 0 < td_s/det_s < tlim  <=>  td_s > 0 and
        # td_s < tlim * det_s — an any-hit query needs no t value at
        # all, so the per-candidate divide is gone entirely.
        ok = (dvalid & (ud_s >= 0.0) & (vd_s >= 0.0)
              & (ud_s + vd_s <= det_s) & (td_s > 0.0)
              & (td_s < tlim * det_s))
        return occ | jnp.any(ok, axis=0, keepdims=True)

    occ0 = jnp.zeros((1, _TILE), jnp.bool_)
    if n_blocks == 1:
        occ = block_body(0, occ0)
    else:
        occ = jax.lax.fori_loop(0, n_blocks, block_body, occ0)
    # Mosaic cannot reshape i1 vectors; round-trip through f32.
    return occ.astype(jnp.float32).reshape(_ROWS, _LANES) > 0.0


class _Attrs(NamedTuple):
    """Winning-triangle attributes as [_ROWS, 128] component tiles."""

    v0: tuple
    e1: tuple
    e2: tuple
    n0: tuple
    n1: tuple
    n2: tuple
    kd: tuple
    ks: tuple
    ke: tuple
    ns: jax.Array


# One-hot gather/scatter NOTE (round-4 measurement): batched
# alternatives — row-flattened 2-D one-hots and relayout-free 3-D
# dot_generals — were implemented and measured SLOWER on v5e than this
# per-row loop (fwd 2.15 -> 2.47 ms/bounce, bwd 2.66 -> 2.98; Mosaic
# pipelines the small dots and the batched forms pay relayouts), and
# Mosaic rejects the two-dim-contraction scatter outright. Keep the loop.
def _gather_stacked_impl(tableT, i_best):
    """One-hot MXU gather: per ray row r, attrs_r = tableT @ onehot_r.

    f32 accuracy at single-pass MXU cost: the table is split into 3 bf16
    limbs concatenated along K with the (bf16-exact) onehot tiled to
    match, so one DEFAULT-precision matmul sums all three limb products
    — the one-hot structure means no accumulation error beyond the limb
    decomposition itself. Misses (idx == -1) produce all-zero columns.
    """
    T_pad = tableT.shape[1]
    t0, t1, t2 = _split3_bf16(tableT)
    tab3 = jnp.concatenate([t0, t1, t2], axis=1)          # [C, 3T] bf16
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (T_pad, _LANES), 0)
    per_row = []
    for r in range(_ROWS):
        onehot = (iota2 == i_best[r:r + 1, :]).astype(jnp.bfloat16)
        oh3 = jnp.concatenate([onehot, onehot, onehot], axis=0)
        per_row.append(jax.lax.dot(tab3, oh3,
                                   preferred_element_type=jnp.float32))
    return jnp.stack(per_row, axis=1)             # [C_PAD, ROWS, 128]


@jax.custom_vjp
def _gather_stacked(tableT, i_best):
    return _gather_stacked_impl(tableT, i_best)


def _gather_stacked_fwd(tableT, i_best):
    return _gather_stacked_impl(tableT, i_best), (i_best, tableT.shape)


# bf16 limbs of the COTANGENT in the scatter-add VJP. The one-hot side
# is bf16-exact, so limb count sets only the cotangent's own precision:
# 2 limbs give ~2^-16 relative error on table gradients — far below
# what any optimizer or the FD tests (atol 1e-4, scaled) resolve — at
# 2/3 the contraction width of the full 3-limb f32 reconstruction.
# (Round-5 lever: the scatter was 1.28 ms of the 2.66 ms backward
# bounce, 3.5x its forward twin; env override for sweeps only.)
_BWD_COT_LIMBS = int(os.environ.get("MRT_BWD_COT_LIMBS", "2"))


def _gather_stacked_bwd(res, cot):
    """d_tableT = sum_r cot_r @ onehot_r^T — the scatter-add matmul,
    limb-packed like the forward (_BWD_COT_LIMBS bf16 limbs of the f32
    cotangent along K). The contraction runs over the lane (ray) axis of
    both operands, so no transpose is materialized. The limb split is
    hoisted OUT of the row loop (one vectorized 3-D split instead of
    _ROWS small ones — the forward splits its table once too) and the
    row partials reduce as a binary tree so the small dots pipeline
    instead of serializing on one accumulator."""
    i_best, tab_shape = res
    T_pad = tab_shape[1]
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (T_pad, _LANES), 0)
    # Contract the lane (ray) axes of both operands directly — measured
    # faster than materializing a transposed one-hot.
    dims = (((1,), (1,)), ((), ()))
    nl = _BWD_COT_LIMBS
    limbs = _split3_bf16(cot)[:nl]            # each [C, ROWS, 128] bf16
    parts = []
    for r in range(_ROWS):
        onehot = (iota2 == i_best[r:r + 1, :]).astype(jnp.bfloat16)
        ohn = (jnp.concatenate([onehot] * nl, axis=1) if nl > 1
               else onehot)                              # [T, nl*128]
        cotn = (jnp.concatenate([l[:, r, :] for l in limbs], axis=1)
                if nl > 1 else limbs[0][:, r, :])        # [C, nl*128]
        parts.append(jax.lax.dot_general(
            cotn, ohn, dims, preferred_element_type=jnp.float32))
    while len(parts) > 1:
        odd = parts.pop() if len(parts) % 2 else None
        parts = [parts[i] + parts[i + 1] for i in range(0, len(parts), 2)]
        if odd is not None:
            parts.append(odd)
    d_tab = parts[0]
    d_idx = np.zeros(i_best.shape, dtype=jax.dtypes.float0)
    return d_tab, d_idx


_gather_stacked.defvjp(_gather_stacked_fwd, _gather_stacked_bwd)


def _gather_attrs(tableT, i_best) -> _Attrs:
    """Winning-triangle attribute fetch as [_ROWS, 128] component tiles
    (see _gather_stacked). Differentiable w.r.t. ``tableT``."""
    stacked = _gather_stacked(tableT, i_best)

    def c3(off):
        return (stacked[off], stacked[off + 1], stacked[off + 2])

    return _Attrs(v0=c3(_V0), e1=c3(_E1), e2=c3(_E2),
                  n0=c3(_N0), n1=c3(_N1), n2=c3(_N2),
                  kd=c3(_KD), ks=c3(_KS), ke=c3(_KE),
                  ns=stacked[_NS])


def _winner_point(at: _Attrs, o3, d3, hit, backface_cull: bool, kn=None):
    """Differentiable (t, u, v) recompute on the winning triangle and the
    interpolated shading point — exactly ops/shading.hit_attributes
    (kernel_bvh.cl:144-147)."""
    pvec = _cross3(d3, at.e2)
    det = _dot3(at.e1, pvec)
    if backface_cull:
        dvalid = det > _DET_EPS
    else:
        dvalid = jnp.abs(det) > _DET_EPS
    inv_det = jnp.where(dvalid,
                        _k_recip(kn, jnp.where(dvalid, det, 1.0)), 0.0)
    tvec = _sub3(o3, at.v0)
    u = _dot3(tvec, pvec) * inv_det
    qvec = _cross3(tvec, at.e1)
    v = _dot3(d3, qvec) * inv_det
    t = _dot3(at.e2, qvec) * inv_det
    valid = dvalid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    t = jnp.where(valid, t, _BIG)

    t = jnp.where(hit, t, 0.0)
    u = jnp.where(hit, u, 0.0)
    v = jnp.where(hit, v, 0.0)
    w = 1.0 - u - v
    pos = _add3(o3, _scale3(d3, t))
    normal = _k_normalize3(kn, (
        u * at.n1[0] + v * at.n2[0] + w * at.n0[0],
        u * at.n1[1] + v * at.n2[1] + w * at.n0[1],
        u * at.n1[2] + v * at.n2[2] + w * at.n0[2],
    ))
    return pos, normal, u, v


def _build_onb(n, kn=None):
    """SampleHemisphereCosine's frame (kernel_bvh.cl:85-87), SoA."""
    use_y = jnp.abs(n[0]) > 1e-3
    ax = jnp.where(use_y, 0.0, 1.0)
    ay = jnp.where(use_y, 1.0, 0.0)
    axis = (ax, ay, jnp.zeros_like(ax))
    t = _k_normalize3(kn, _cross3(axis, n))
    s = _cross3(n, t)
    return s, t


def _k_dir(kn, s, t, n, cp, sp, ct):
    """_spherical_dir with pre-multiplied azimuth terms: normalize
    (s*cp + t*sp + n*ct) — cp/sp already include the sin_theta factor."""
    return _k_normalize3(kn, (
        s[0] * cp + t[0] * sp + n[0] * ct,
        s[1] * cp + t[1] * sp + n[1] * ct,
        s[2] * cp + t[2] * sp + n[2] * ct,
    ))


def _sample_brdf(wo, normal, kd, ks, ns, seeds, cms, specular_prob,
                 specular_model: str = "blinn", kn=None):
    """ops/brdf.sample_brdf (kernel_bvh.cl:221-302), SoA in-kernel.
    ``cms``: [_NUM_SITES, ROWS, 128] pre-mixed counter tiles (unused —
    and may be None — when ``kn`` is a reader: every RNG-derived value
    is a recorded known-value constant)."""
    replay = kn is not None and not kn.writing
    if replay:
        u_lobe = du1 = du2 = su1 = su2 = None
    else:
        u_lobe = _uniform_cm(seeds, cms[_SITE_LOBE])
        du1 = _uniform_cm(seeds, cms[_SITE_DIFF_PHI])
        du2 = _uniform_cm(seeds, cms[_SITE_DIFF_R2])
        su1 = _uniform_cm(seeds, cms[_SITE_SPEC_PHI])
        su2 = _uniform_cm(seeds, cms[_SITE_SPEC_COS])
    pick_spec = _k_const(kn, lambda: jnp.where(
        u_lobe > (1.0 - specular_prob), 1.0, 0.0)) > 0.5

    s, t = _build_onb(normal, kn)

    # Diffuse lobe (SampleDiffuse, kernel_bvh.cl:264-269). The azimuth/
    # elevation terms are pure RNG functions -> recorded constants.
    d_cp = _k_const(kn, lambda: jnp.cos(_TWO_PI * du1) * jnp.sqrt(du2))
    d_sp = _k_const(kn, lambda: jnp.sin(_TWO_PI * du1) * jnp.sqrt(du2))
    d_ct = _k_const(kn, lambda: jnp.sqrt(jnp.maximum(1.0 - du2, 0.0)))
    d_wi = _k_dir(kn, s, t, normal, d_cp, d_sp, d_ct)
    d_pdf = _dot3(d_wi, normal) * _INV_PI
    d_f = _scale3(kd, jnp.float32(_INV_PI))
    d_valid = d_pdf > 0.0

    alpha = jnp.maximum(ns, 0.0)
    if specular_model == "ggx":
        # True GGX lobe (ops/brdf.sample_specular_ggx; D from
        # DistributionGGX, kernel_bvh.cl:221-225).
        rr = _k_sqrt(kn, 2.0 / (alpha + 2.0))
        ag = rr * rr
        a2 = jnp.maximum(ag * ag, 1e-12)
        u2c = _k_const(kn, lambda: jnp.clip(su2, 0.0, 1.0 - 1e-7))
        cos_h2 = (1.0 - u2c) / (1.0 + (a2 - 1.0) * u2c)
        cos_h = _k_sqrt(kn, jnp.clip(cos_h2, 0.0, 1.0))
        sin_h = _k_sqrt(kn, jnp.maximum(1.0 - cos_h2, 0.0))
        s_cp = _k_const(kn, lambda: jnp.cos(_TWO_PI * su1))
        s_sp = _k_const(kn, lambda: jnp.sin(_TWO_PI * su1))
        wh = _k_dir(kn, s, t, normal, s_cp * sin_h, s_sp * sin_h, cos_h)
        s_wi = _reflect3(wo, wh)
        cos_i = _dot3(s_wi, normal)
        cos_o = _dot3(wo, normal)
        same_hemi = (cos_i * cos_o) >= 1e-6
        dd = cos_h2 * (a2 - 1.0) + 1.0
        d_ndf = a2 * jnp.float32(_INV_PI) / jnp.maximum(dd * dd, 1e-12)
        pdf_h = d_ndf * cos_h
        wo_dot_wh = jnp.maximum(_dot3(wo, wh), 0.0)
        s_pdf = pdf_h / jnp.maximum(4.0 * wo_dot_wh, 1e-8)
        r = rr + 1.0
    else:
        # Blinn specular lobe (SampleSpecular/SampleGGX,
        # kernel_bvh.cl:227-292, spec-cleaned per ops/brdf.py).
        log_u2 = _k_const(kn, lambda: jnp.log(jnp.clip(su2, 1e-12, 1.0)))
        cos_h = _k_exp(kn, log_u2 / (alpha + 1.0))
        sin_h = _k_sqrt(kn, jnp.maximum(1.0 - cos_h * cos_h, 0.0))
        s_cp = _k_const(kn, lambda: jnp.cos(_TWO_PI * su1))
        s_sp = _k_const(kn, lambda: jnp.sin(_TWO_PI * su1))
        wh = _k_dir(kn, s, t, normal, s_cp * sin_h, s_sp * sin_h, cos_h)
        s_wi = _reflect3(wo, wh)
        cos_i = _dot3(s_wi, normal)
        cos_o = _dot3(wo, normal)
        same_hemi = (cos_i * cos_o) >= 1e-6
        # exp-reuse of the sampling log (see ops/brdf.sample_specular).
        cosn = _k_exp(kn, log_u2 * (alpha / (alpha + 1.0)))
        d_ndf = (alpha + 2.0) * jnp.float32(0.5 * _INV_PI) * cosn
        pdf_h = (alpha + 1.0) * jnp.float32(0.5 * _INV_PI) * cosn
        wo_dot_wh = jnp.maximum(_dot3(wo, wh), 0.0)
        s_pdf = pdf_h / jnp.maximum(4.0 * wo_dot_wh, 1e-8)
        r = _k_sqrt(kn, 2.0 / (alpha + 2.0)) + 1.0
    # Smith G with the reference's k mapping (kernel_bvh.cl:241-257).
    k = (r * r) / 8.0
    ndotv = jnp.maximum(cos_o, 0.0)
    ndotl = jnp.maximum(cos_i, 0.0)
    g = (ndotv / (ndotv * (1.0 - k) + k)) * (ndotl / (ndotl * (1.0 - k) + k))
    frx = jnp.maximum(1.0 - wo_dot_wh, 0.0)
    frx2 = frx * frx
    fr = 0.04 + 0.96 * (frx2 * frx2 * frx)
    denom = 4.0 * ndotl * ndotv + 1e-3
    s_scale = d_ndf * g * fr / denom
    s_valid = same_hemi & (s_pdf > 0.0) & (wo_dot_wh > 0.0)
    s_scale = jnp.where(s_valid, s_scale, 0.0)
    s_f = _scale3(ks, s_scale)

    wi = _where3(pick_spec, s_wi, d_wi)
    f = _where3(pick_spec, s_f, d_f)
    pdf = jnp.where(pick_spec, s_pdf, d_pdf)
    # Mosaic cannot select_n between i1 vectors; use logical ops.
    valid = (pick_spec & s_valid) | (~pick_spec & d_valid)
    return wi, f, pdf, valid


def _direct_light(lv, num_lights: int, pos, normal, wo, ns,
                  direct_specular: bool, shadow_fn=None, occ_bits=None,
                  shadow_eps: float = 1e-2, kn=None):
    """ops/lights.direct_light (lightPixel, kernel_bvh.cl:304-347), SoA.
    ``lv``: [L, 16] lights value (see _L* column layout).

    Shadow rays: ``shadow_fn(o3, d3, t_limit) -> bool [ROWS, 128]`` casts
    the occlusion query in-kernel (forward pass); ``occ_bits`` replays
    recorded per-light occlusion (bit li) instead — the backward kernel
    freezes the visibility decision exactly like the winner indices.
    Returns (diffuse, specular, occ_bits_out)."""
    zero = jnp.zeros_like(pos[0])
    diff_total, spec_total = zero, zero
    occ_out = jnp.zeros_like(pos[0], dtype=jnp.int32)
    for li in range(num_lights):
        lpx, lpy, lpz = lv[li, _LPOS], lv[li, _LPOS + 1], lv[li, _LPOS + 2]
        ldx, ldy, ldz = lv[li, _LDIR], lv[li, _LDIR + 1], lv[li, _LDIR + 2]
        ltype = lv[li, _LTYPE]
        intensity = lv[li, _LINT]
        falloff = lv[li, _LATT]
        cos_cut = lv[li, _LCUT]

        dn = jax.lax.rsqrt(jnp.maximum(ldx * ldx + ldy * ldy + ldz * ldz,
                                       1e-20))
        ldx, ldy, ldz = ldx * dn, ldy * dn, ldz * dn

        to_l = (lpx - pos[0], lpy - pos[1], lpz - pos[2])
        dist = _k_sqrt(kn, jnp.maximum(_dot3(to_l, to_l), 1e-12))
        inv_dist = 1.0 / dist
        l_point = _scale3(to_l, inv_dist)
        is_dir = ltype <= 0.5          # LIGHT_DIRECTIONAL == 0
        l_unit = _where3(is_dir, (-ldx + zero, -ldy + zero, -ldz + zero),
                         l_point)
        ndotl = jnp.maximum(_dot3(normal, l_unit), 0.0)

        attn_point = 1.0 / jnp.maximum(falloff * dist * dist, 1e-6)
        attn = jnp.where(is_dir, jnp.ones_like(attn_point), attn_point)

        cos_angle = _dot3(_neg3(l_unit), (ldx + zero, ldy + zero, ldz + zero))
        spot_w = jnp.clip((cos_angle - cos_cut)
                          / jnp.maximum(1.0 - cos_cut, 1e-6), 0.0, 1.0)
        attn = jnp.where(ltype >= 1.5, attn * spot_w, attn)

        weight = attn * intensity * ndotl

        if shadow_fn is not None or occ_bits is not None:
            if occ_bits is not None:
                blocked = ((occ_bits >> li) & 1) > 0
            else:
                so3 = _add3(pos, _scale3(l_unit, jnp.float32(shadow_eps)))
                t_lim = jnp.where(is_dir, jnp.full_like(dist, _BIG),
                                  dist - 2.0 * jnp.float32(shadow_eps))
                blocked = shadow_fn(so3, l_unit, t_lim)
            occ_out = occ_out | jnp.where(blocked, jnp.int32(1 << li),
                                          jnp.int32(0))
            weight = jnp.where(blocked, 0.0, weight)

        diff_total = diff_total + weight

        if direct_specular:
            h = _k_normalize3(kn, _add3(l_unit, wo))
            ndoth = jnp.maximum(_dot3(normal, h), 0.0)
            spec = _k_pow(kn, jnp.maximum(ndoth, 1e-6),
                          jnp.maximum(ns, 1.0))
            spec = jnp.where(ndotl > 0.0, spec, 0.0)
            spec_w = attn * intensity * spec
            if shadow_fn is not None or occ_bits is not None:
                spec_w = jnp.where(blocked, 0.0, spec_w)
            spec_total = spec_total + spec_w
    return diff_total, spec_total, occ_out


def _shade_bounce(at: _Attrs, i_best, o3, d3, beta3, rad3, alive, seeds,
                  cms, lv, num_lights: int, cfg: RenderConfig,
                  shadow_fn=None, occ_bits=None, kn=None):
    """One bounce of the reference recurrence (Render, kernel_bvh.cl:
    349-384) on [_ROWS, 128] tiles — the exact per-bounce math of
    ops/integrator.trace_paths.bounce_step. ``shadow_fn`` / ``occ_bits``
    select in-kernel shadow casting vs frozen-mask replay (see
    _direct_light); the per-light occlusion bitmask is returned last.
    ``kn``: known-value residual channel (None = plain compute)."""
    hit = i_best >= 0
    sky = tuple(jnp.float32(c * cfg.skybox_intensity) for c in cfg.sky_color)

    pos, normal, uu, vv = _winner_point(at, o3, d3, hit, cfg.backface_cull,
                                        kn=kn)

    miss = alive & ~hit
    rad3 = _add3(rad3, _where3(miss,
                               (beta3[0] * sky[0], beta3[1] * sky[1],
                                beta3[2] * sky[2]),
                               (jnp.zeros_like(rad3[0]),) * 3))

    live = alive & hit
    # Soft-visibility coverage (ops/shading.soft_coverage; 1.0 when hard).
    if cfg.soft_edge_sigma > 0.0:
        margin = jnp.minimum(jnp.minimum(uu, vv), 1.0 - uu - vv)
        cov = _k_sigmoid(kn, margin / jnp.float32(cfg.soft_edge_sigma))
        rad3 = _add3(rad3, _where3(
            live,
            (beta3[0] * ((1.0 - cov) * sky[0]),
             beta3[1] * ((1.0 - cov) * sky[1]),
             beta3[2] * ((1.0 - cov) * sky[2])),
            (jnp.zeros_like(rad3[0]),) * 3))
    else:
        cov = jnp.float32(1.0)
    es = jnp.float32(cfg.emission_scale)
    rad3 = _add3(rad3, _where3(live, _mul3(beta3, _scale3(at.ke, es * cov)),
                               (jnp.zeros_like(rad3[0]),) * 3))

    wo = _neg3(d3)
    wi, f, pdf, valid = _sample_brdf(wo, normal, at.kd, at.ks, at.ns,
                                     seeds, cms, cfg.specular_prob,
                                     specular_model=cfg.specular_model,
                                     kn=kn)
    cos_i = _dot3(wi, normal)
    pdf_safe = jnp.where(pdf > 0.0, pdf, 1.0)
    scale = cos_i / pdf_safe
    mul = _scale3(f, scale)
    ok = (valid & (pdf > 0.0)
          & jnp.isfinite(mul[0]) & jnp.isfinite(mul[1])
          & jnp.isfinite(mul[2]))
    lo = live & ok
    beta_new = _where3(lo, _mul3(beta3, mul), beta3)

    dl_diff, dl_spec, occ_out = _direct_light(
        lv, num_lights, pos, normal, wo, at.ns, cfg.direct_specular,
        shadow_fn=shadow_fn, occ_bits=occ_bits,
        shadow_eps=cfg.ray_epsilon, kn=kn)
    direct = _scale3(at.kd, dl_diff * cov)
    if cfg.direct_specular:
        direct = _add3(direct, _scale3(at.ks, dl_spec * cov))
    rad3 = _add3(rad3, _where3(lo, _mul3(direct, beta_new),
                               (jnp.zeros_like(rad3[0]),) * 3))

    alive_next = lo
    eps = jnp.float32(cfg.ray_epsilon)
    o_next = _where3(alive_next, _add3(pos, _scale3(wi, eps)), o3)
    d_next = _where3(alive_next, wi, d3)
    return o_next, d_next, beta_new, rad3, alive_next, occ_out


# ---------------------------------------------------------------------------
# Forward bounce kernel: one fused bounce
# (intersect -> gather -> shade -> next-ray state).

def _num_resid_rows(cfg: RenderConfig, num_lights: int) -> int:
    """Known-value rows emitted per ray by the forward kernel, in
    _shade_bounce's emission order (asserted against the actual count at
    kernel trace time)."""
    n = 2                                  # winner inv_det + normal norm
    if cfg.soft_edge_sigma > 0.0:
        n += 1                             # coverage sigmoid
    n += 1                                 # pick_spec
    n += 1                                 # ONB normalize
    n += 4                                 # diffuse cp/sp/ct + d_wi norm
    n += 7 if cfg.specular_model == "ggx" else 8
    n += num_lights                        # per-light dist
    if cfg.direct_specular:
        n += 3 * num_lights                # h-norm + pow value + log base
    return n


def _bounce_fwd_kernel(tab_ref, mt_ref, lv_ref, cms_ref,
                       o_ref, d_ref, beta_ref, af_ref, seed_ref,
                       no_ref, nd_ref, nbeta_ref, naf_ref, rad_ref, idx_ref,
                       occ_ref, *maybe_resid,
                       cfg: RenderConfig, num_lights: int, mt_T_pad: int,
                       save_resid: bool = False):
    tableT = tab_ref[:]
    lv = lv_ref[:]
    cms = cms_ref[:]
    seeds = seed_ref[:]
    o3 = (o_ref[0], o_ref[1], o_ref[2])
    d3 = (d_ref[0], d_ref[1], d_ref[2])
    beta3 = (beta_ref[0], beta_ref[1], beta_ref[2])
    alive = af_ref[:] > 0.0
    zeros = jnp.zeros((_ROWS, _LANES), jnp.float32)

    i_best = _mt_closest(mt_ref, o3, d3, cfg.t_max, cfg.backface_cull,
                         mt_T_pad)
    idx_ref[:] = i_best
    at = _gather_attrs(tableT, i_best)
    if cfg.shadow_rays:
        shadow_fn = lambda so3, sd3, tlim: _mt_anyhit(
            mt_ref, so3, sd3, tlim, cfg.backface_cull, mt_T_pad)
    else:
        shadow_fn = None
    kn = _Resid() if save_resid else None
    o3n, d3n, beta3n, rad3, alive_n, occ = _shade_bounce(
        at, i_best, o3, d3, beta3, (zeros, zeros, zeros), alive, seeds,
        cms, lv, num_lights, cfg, shadow_fn=shadow_fn, kn=kn)

    for i in range(3):
        no_ref[i] = o3n[i]
        nd_ref[i] = d3n[i]
        nbeta_ref[i] = beta3n[i]
        rad_ref[i] = rad3[i]
    naf_ref[:] = jnp.where(alive_n, 1.0, 0.0)
    occ_ref[:] = occ
    if save_resid:
        (resid_ref,) = maybe_resid
        assert len(kn.rows) == resid_ref.shape[0], \
            (len(kn.rows), resid_ref.shape)
        for i, row in enumerate(kn.rows):
            resid_ref[i] = row


# ---------------------------------------------------------------------------
# Raygen-fused bounce 0: camera rays + per-pixel seeds generated INSIDE
# the first bounce kernel (the reference does raygen in-kernel too —
# CreateRay from get_global_id, kernel_bvh.cl:386-403, 441-447). Kills
# the separate XLA raygen/seed-hash kernels and the o/d/seeds HBM round
# trip into bounce 0 — the whole cost of a 1-bounce frame becomes one
# pallas_call (the round-3 'config 1 is launch-bound' fix).

# raygen constant-tile rows ([3, ROWS, 128] u32): premixed jitter-site
# counters and the premixed frame term of ops/rng.pixel_seeds.
_RG_JX, _RG_JY, _RG_FRAME = 0, 1, 2
# camera vector columns ([1, 16] f32).
_CAM_POS, _CAM_RIGHT, _CAM_UP, _CAM_FRONT = 0, 3, 6, 9


def _raygen_tiles(pxy, camv, rgcm, cfg: RenderConfig):
    """In-kernel jittered pinhole raygen — bit-identical math to
    ops/camera.generate_rays + ops/rng.pixel_seeds over [ROWS, 128]
    tiles. ``pxy``: (px, py) f32 tiles; ``camv``: [1, 16] traced camera
    vector (differentiable); ``rgcm``: [3, ROWS, 128] u32 constants.
    Returns (o3, d3, seeds)."""
    px, py = pxy
    pid = (py.astype(jnp.int32) * cfg.width
           + px.astype(jnp.int32)).astype(jnp.uint32)
    seeds = _mix_u32(pid ^ rgcm[_RG_FRAME])
    jx = _uniform_cm(seeds, rgcm[_RG_JX])
    jy = _uniform_cm(seeds, rgcm[_RG_JY])

    inv_w = 1.0 / float(cfg.width)
    inv_h = 1.0 / float(cfg.height)
    aspect = float(cfg.width) / float(cfg.height)
    angle = float(np.tan(np.float32(0.5 * cfg.fov_deg * np.pi / 180.0)))
    x = (2.0 * (px + jx) * inv_w - 1.0) * angle * aspect
    y = (1.0 - 2.0 * (py + jy) * inv_h) * angle

    def c3(off):
        return (camv[0, off], camv[0, off + 1], camv[0, off + 2])

    right, up, front = c3(_CAM_RIGHT), c3(_CAM_UP), c3(_CAM_FRONT)
    d3 = _normalize3((x * right[0] + y * up[0] + front[0],
                      x * right[1] + y * up[1] + front[1],
                      x * right[2] + y * up[2] + front[2]))
    pos = c3(_CAM_POS)
    zero = jnp.zeros_like(px)
    o3 = (pos[0] + zero, pos[1] + zero, pos[2] + zero)
    return o3, d3, seeds


def _bounce0_fwd_kernel(tab_ref, mt_ref, lv_ref, cms_ref, cam_ref,
                        pxy_ref, rgcm_ref,
                        no_ref, nd_ref, nbeta_ref, naf_ref, rad_ref,
                        idx_ref, occ_ref, seed_ref,
                        *, cfg: RenderConfig, num_lights: int,
                        mt_T_pad: int):
    tableT = tab_ref[:]
    lv = lv_ref[:]
    cms = cms_ref[:]
    o3, d3, seeds = _raygen_tiles((pxy_ref[0], pxy_ref[1]), cam_ref[:],
                                  rgcm_ref[:], cfg)
    ones = jnp.ones((_ROWS, _LANES), jnp.float32)
    beta3 = (ones, ones, ones)
    alive = ones > 0.0
    zeros = jnp.zeros((_ROWS, _LANES), jnp.float32)

    i_best = _mt_closest(mt_ref, o3, d3, cfg.t_max, cfg.backface_cull,
                         mt_T_pad)
    idx_ref[:] = i_best
    at = _gather_attrs(tableT, i_best)
    if cfg.shadow_rays:
        shadow_fn = lambda so3, sd3, tlim: _mt_anyhit(
            mt_ref, so3, sd3, tlim, cfg.backface_cull, mt_T_pad)
    else:
        shadow_fn = None
    o3n, d3n, beta3n, rad3, alive_n, occ = _shade_bounce(
        at, i_best, o3, d3, beta3, (zeros, zeros, zeros), alive, seeds,
        cms, lv, num_lights, cfg, shadow_fn=shadow_fn)

    for i in range(3):
        no_ref[i] = o3n[i]
        nd_ref[i] = d3n[i]
        nbeta_ref[i] = beta3n[i]
        rad_ref[i] = rad3[i]
    naf_ref[:] = jnp.where(alive_n, 1.0, 0.0)
    occ_ref[:] = occ
    seed_ref[:] = seeds


def _bounce0_bwd_kernel(tab_ref, lv_ref, cms_ref, cam_ref, pxy_ref,
                        rgcm_ref, idx_ref, occ_in_ref,
                        co_ref, cd_ref, cbeta_ref, crad_ref,
                        dtab_ref, dlv_ref, dcam_ref,
                        *, cfg: RenderConfig, num_lights: int):
    """Backward of the raygen-fused bounce: replay raygen + shading with
    the recorded winner indices / occlusion bits frozen; jax.vjp w.r.t.
    (table, lights, camera vector) — camera gradients flow through the
    in-kernel raygen chain."""
    tableT = tab_ref[:]
    lv = lv_ref[:]
    cms = cms_ref[:]
    camv = cam_ref[:]
    pxy = (pxy_ref[0], pxy_ref[1])
    rgcm = rgcm_ref[:]
    i_best = idx_ref[:]
    occ_bits = occ_in_ref[:] if cfg.shadow_rays else None
    ones = jnp.ones((_ROWS, _LANES), jnp.float32)
    zeros = jnp.zeros((_ROWS, _LANES), jnp.float32)

    def replay(tabv, lvv, camvv):
        o3, d3, seeds = _raygen_tiles(pxy, camvv, rgcm, cfg)
        at = _gather_attrs(tabv, i_best)
        o3n, d3n, beta3n, rad3, _, _ = _shade_bounce(
            at, i_best, o3, d3, (ones, ones, ones), (zeros,) * 3,
            ones > 0.0, seeds, cms, lvv, num_lights, cfg,
            occ_bits=occ_bits)
        return o3n, d3n, beta3n, rad3

    _, vjp_fn = jax.vjp(replay, tableT, lv, camv)
    cot = ((co_ref[0], co_ref[1], co_ref[2]),
           (cd_ref[0], cd_ref[1], cd_ref[2]),
           (cbeta_ref[0], cbeta_ref[1], cbeta_ref[2]),
           (crad_ref[0], crad_ref[1], crad_ref[2]))
    d_tab, d_lv, d_cam = vjp_fn(cot)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dtab_ref[:] = jnp.zeros_like(dtab_ref)
        dlv_ref[:] = jnp.zeros_like(dlv_ref)
        dcam_ref[:] = jnp.zeros_like(dcam_ref)

    dtab_ref[:] += d_tab
    dlv_ref[:] += d_lv
    dcam_ref[:] += d_cam


def _run_bounce0_fwd(tableT, lv, mt_table, camv, pxy, rgcms, cms,
                     cfg: RenderConfig):
    T_pad = tableT.shape[1]
    mt_T_pad = mt_table.shape[0] // 4
    num_lights = lv.shape[0]
    n_rows = pxy.shape[1]
    grid = (n_rows // _ROWS,)

    kernel = functools.partial(_bounce0_fwd_kernel, cfg=cfg,
                               num_lights=num_lights, mt_T_pad=mt_T_pad)
    vec_shape = jax.ShapeDtypeStruct((3, n_rows, _LANES), jnp.float32)
    scal_shape = jax.ShapeDtypeStruct((n_rows, _LANES), jnp.float32)
    pxy_spec = pl.BlockSpec((2, _ROWS, _LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_const_spec((_C_PAD, T_pad)),
                  _const_spec(mt_table.shape),
                  _const_spec((num_lights, _LCOLS)),
                  _const_spec((_NUM_SITES, _ROWS, _LANES)),
                  _const_spec((1, 16)),
                  pxy_spec,
                  _const_spec((3, _ROWS, _LANES))],
        out_specs=(_vec_spec(), _vec_spec(), _vec_spec(),
                   _scalar_spec(), _vec_spec(), _scalar_spec(),
                   _scalar_spec(), _scalar_spec()),
        out_shape=(vec_shape, vec_shape, vec_shape, scal_shape, vec_shape,
                   jax.ShapeDtypeStruct((n_rows, _LANES), jnp.int32),
                   jax.ShapeDtypeStruct((n_rows, _LANES), jnp.int32),
                   jax.ShapeDtypeStruct((n_rows, _LANES), jnp.uint32)),
        interpret=_interpret(),
    )(tableT, mt_table, lv, cms, camv, pxy, rgcms)


def _run_bounce0_bwd(tableT, lv, camv, pxy, rgcms, cms, idx, occ, cot,
                     cfg: RenderConfig):
    T_pad = tableT.shape[1]
    num_lights = lv.shape[0]
    n_rows = pxy.shape[1]
    grid = (n_rows // _ROWS,)
    co, cd, cbeta, crad = cot

    kernel = functools.partial(_bounce0_bwd_kernel, cfg=cfg,
                               num_lights=num_lights)
    pxy_spec = pl.BlockSpec((2, _ROWS, _LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_const_spec((_C_PAD, T_pad)),
                  _const_spec((num_lights, _LCOLS)),
                  _const_spec((_NUM_SITES, _ROWS, _LANES)),
                  _const_spec((1, 16)),
                  pxy_spec,
                  _const_spec((3, _ROWS, _LANES)),
                  _scalar_spec(), _scalar_spec(),
                  _vec_spec(), _vec_spec(), _vec_spec(), _vec_spec()],
        out_specs=(_const_spec((_C_PAD, T_pad)),
                   _const_spec((num_lights, _LCOLS)),
                   _const_spec((1, 16))),
        out_shape=(jax.ShapeDtypeStruct((_C_PAD, T_pad), jnp.float32),
                   jax.ShapeDtypeStruct((num_lights, _LCOLS), jnp.float32),
                   jax.ShapeDtypeStruct((1, 16), jnp.float32)),
        interpret=_interpret(),
    )(tableT, lv, cms, camv, pxy, rgcms, idx, occ, co, cd, cbeta, crad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _bounce0(tableT, lv, mt_table, camv, pxy, rgcms, cms,
             cfg: RenderConfig):
    """Differentiable raygen-fused first bounce: (pixels, camera) ->
    next ray state + bounce-0 radiance + the per-pixel seed panel the
    remaining bounces consume."""
    no, nd, nbeta, naf, rad, _, _, seeds = _run_bounce0_fwd(
        tableT, lv, mt_table, camv, pxy, rgcms, cms, cfg)
    return no, nd, nbeta, naf, rad, seeds


def _bounce0_fwd(tableT, lv, mt_table, camv, pxy, rgcms, cms, cfg):
    no, nd, nbeta, naf, rad, idx, occ, seeds = _run_bounce0_fwd(
        tableT, lv, mt_table, camv, pxy, rgcms, cms, cfg)
    res = (tableT, lv, camv, pxy, rgcms, cms, idx, occ, mt_table.shape)
    return (no, nd, nbeta, naf, rad, seeds), res


def _bounce0_bwd(cfg, res, cots):
    tableT, lv, camv, pxy, rgcms, cms, idx, occ, mt_shape = res
    co, cd, cbeta, _caf, crad, _cseeds = cots
    d_tab, d_lv, d_cam = _run_bounce0_bwd(
        tableT, lv, camv, pxy, rgcms, cms, idx, occ,
        (co, cd, cbeta, crad), cfg)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    d_mt = jnp.zeros(mt_shape, jnp.bfloat16)
    return (d_tab, d_lv, d_mt, d_cam, jnp.zeros_like(pxy), f0(rgcms),
            f0(cms))


_bounce0.defvjp(_bounce0_fwd, _bounce0_bwd)


# ---------------------------------------------------------------------------
# Backward bounce kernel: replay ONE bounce with the recorded winner
# indices frozen and run jax.vjp of the replay inside the kernel. The
# replay substitutes recorded known-values for every transcendental
# (see _Resid), so this kernel contains no exp/log/trig/rsqrt and no
# RNG hashing — only the gather/scatter matmuls and the (mostly
# mul/add) VJP arithmetic of the shading chain.

def _bounce_bwd_kernel(tab_ref, lv_ref, *refs,
                       cfg: RenderConfig, num_lights: int):
    if cfg.bwd_residuals:
        (o_ref, d_ref, beta_ref, af_ref, idx_ref, occ_in_ref, resid_ref,
         co_ref, cd_ref, cbeta_ref, crad_ref,
         do_ref, dd_ref, dbeta_ref, dtab_ref, dlv_ref) = refs
        seeds = cms = None
    else:
        (cms_ref, o_ref, d_ref, beta_ref, af_ref, seed_ref, idx_ref,
         occ_in_ref,
         co_ref, cd_ref, cbeta_ref, crad_ref,
         do_ref, dd_ref, dbeta_ref, dtab_ref, dlv_ref) = refs
        seeds = seed_ref[:]
        cms = cms_ref[:]
    tableT = tab_ref[:]
    lv = lv_ref[:]
    i_best = idx_ref[:]
    occ_bits = occ_in_ref[:] if cfg.shadow_rays else None
    alive = af_ref[:] > 0.0
    o3 = (o_ref[0], o_ref[1], o_ref[2])
    d3 = (d_ref[0], d_ref[1], d_ref[2])
    beta3 = (beta_ref[0], beta_ref[1], beta_ref[2])
    zeros = jnp.zeros((_ROWS, _LANES), jnp.float32)
    if cfg.bwd_residuals:
        n_res = resid_ref.shape[0]
        resid_rows = [resid_ref[i] for i in range(n_res)]

    def replay(tabv, lvv, o3v, d3v, beta3v):
        kn = _Resid(rows=resid_rows) if cfg.bwd_residuals else None
        at = _gather_attrs(tabv, i_best)      # frozen hit record
        o3n, d3n, beta3n, rad3, _, _ = _shade_bounce(
            at, i_best, o3v, d3v, beta3v, (zeros, zeros, zeros), alive,
            seeds, cms, lvv, num_lights, cfg, occ_bits=occ_bits, kn=kn)
        if cfg.bwd_residuals:
            assert kn.taken == n_res, (kn.taken, n_res)
        return o3n, d3n, beta3n, rad3

    _, vjp_fn = jax.vjp(replay, tableT, lv, o3, d3, beta3)
    cot = ((co_ref[0], co_ref[1], co_ref[2]),
           (cd_ref[0], cd_ref[1], cd_ref[2]),
           (cbeta_ref[0], cbeta_ref[1], cbeta_ref[2]),
           (crad_ref[0], crad_ref[1], crad_ref[2]))
    d_tab, d_lv, d_o3, d_d3, d_beta3 = vjp_fn(cot)

    for i in range(3):
        do_ref[i] = d_o3[i]
        dd_ref[i] = d_d3[i]
        dbeta_ref[i] = d_beta3[i]

    # Accumulate table/light grads across sequential grid steps.
    @pl.when(pl.program_id(0) == 0)
    def _():
        dtab_ref[:] = jnp.zeros_like(dtab_ref)
        dlv_ref[:] = jnp.zeros_like(dlv_ref)

    dtab_ref[:] += d_tab
    dlv_ref[:] += d_lv


# ---------------------------------------------------------------------------
# Host-side wiring.

def _to_panels(a: jax.Array, R: int, fill: float = 0.0) -> jax.Array:
    pad = (-R) % _TILE
    a = jnp.pad(a, (0, pad), constant_values=fill)
    return a.reshape((R + pad) // _LANES, _LANES)


def _ray_specs(n: int):
    return [pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)] * n


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _vec_spec():
    """[3, n_rows, 128] stacked xyz panels, ray-blocked on dim 1."""
    return pl.BlockSpec((3, _ROWS, _LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def _scalar_spec():
    return pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _run_bounce_fwd(tableT, lv, mt_table, o, d, beta, aliveF, seeds, cms,
                    cfg: RenderConfig, save_resid: bool = False):
    """One fused bounce over the whole wavefront. All ray state is in
    stacked-panel layout ([3, n_rows, 128] / [n_rows, 128]). With
    ``save_resid`` (the VJP forward) the kernel additionally streams out
    the known-value residual rows the backward replay consumes."""
    T_pad = tableT.shape[1]
    mt_T_pad = mt_table.shape[0] // 4
    num_lights = lv.shape[0]
    n_rows = aliveF.shape[0]
    grid = (n_rows // _ROWS,)

    kernel = functools.partial(_bounce_fwd_kernel, cfg=cfg,
                               num_lights=num_lights, mt_T_pad=mt_T_pad,
                               save_resid=save_resid)
    vec_shape = jax.ShapeDtypeStruct((3, n_rows, _LANES), jnp.float32)
    scal_shape = jax.ShapeDtypeStruct((n_rows, _LANES), jnp.float32)
    out_specs = [_vec_spec(), _vec_spec(), _vec_spec(),
                 _scalar_spec(), _vec_spec(), _scalar_spec(),
                 _scalar_spec()]
    out_shape = [vec_shape, vec_shape, vec_shape, scal_shape, vec_shape,
                 jax.ShapeDtypeStruct((n_rows, _LANES), jnp.int32),
                 jax.ShapeDtypeStruct((n_rows, _LANES), jnp.int32)]
    if save_resid:
        n_res = _num_resid_rows(cfg, num_lights)
        out_specs.append(pl.BlockSpec((n_res, _ROWS, _LANES),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_res, n_rows, _LANES), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_const_spec((_C_PAD, T_pad)),
                  _const_spec(mt_table.shape),
                  _const_spec((num_lights, _LCOLS)),
                  _const_spec((_NUM_SITES, _ROWS, _LANES)),
                  _vec_spec(), _vec_spec(), _vec_spec(),
                  _scalar_spec(), _scalar_spec()],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(tableT, mt_table, lv, cms, o, d, beta, aliveF, seeds)


def _run_bounce_bwd(tableT, lv, o, d, beta, aliveF, seeds, idx, occ,
                    cms, resid, cot, cfg: RenderConfig):
    """Backward bounce kernel launch. ``resid`` carries the known-value
    rows when cfg.bwd_residuals (then seeds/cms are unused); the default
    recompute mode re-derives the forward intermediates in-kernel from
    seeds/cms — measured faster end-to-end at 1080p because the
    residual stream's per-bounce HBM stacking costs more than the
    recompute it saves (benchmarks/PROFILE.md round 4)."""
    T_pad = tableT.shape[1]
    num_lights = lv.shape[0]
    n_rows = aliveF.shape[0]
    grid = (n_rows // _ROWS,)
    co, cd, cbeta, crad = cot

    kernel = functools.partial(_bounce_bwd_kernel, cfg=cfg,
                               num_lights=num_lights)
    vec_shape = jax.ShapeDtypeStruct((3, n_rows, _LANES), jnp.float32)
    if cfg.bwd_residuals:
        n_res = resid.shape[0]
        resid_spec = pl.BlockSpec((n_res, _ROWS, _LANES),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)
        extra_specs = [_vec_spec(), _vec_spec(), _vec_spec(),
                       _scalar_spec(), _scalar_spec(), _scalar_spec(),
                       resid_spec]
        extra_args = (o, d, beta, aliveF, idx, occ, resid)
    else:
        extra_specs = [_const_spec((_NUM_SITES, _ROWS, _LANES)),
                       _vec_spec(), _vec_spec(), _vec_spec(),
                       _scalar_spec(), _scalar_spec(), _scalar_spec(),
                       _scalar_spec()]
        extra_args = (cms, o, d, beta, aliveF, seeds, idx, occ)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_const_spec((_C_PAD, T_pad)),
                  _const_spec((num_lights, _LCOLS))] + extra_specs
                 + [_vec_spec(), _vec_spec(), _vec_spec(), _vec_spec()],
        out_specs=(_vec_spec(), _vec_spec(), _vec_spec(),
                   _const_spec((_C_PAD, T_pad)),
                   _const_spec((num_lights, _LCOLS))),
        out_shape=(vec_shape, vec_shape, vec_shape,
                   jax.ShapeDtypeStruct((_C_PAD, T_pad), jnp.float32),
                   jax.ShapeDtypeStruct((num_lights, _LCOLS), jnp.float32)),
        interpret=_interpret(),
    )(tableT, lv, *extra_args, co, cd, cbeta, crad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _bounce(tableT, lv, mt_table, o, d, beta, aliveF, seeds, cms,
            cfg: RenderConfig):
    """Differentiable fused bounce: (o, d, beta, aliveF) -> next state +
    this bounce's radiance contribution. JAX chains the per-bounce VJPs
    in reverse automatically, so the full path gradient needs no
    trace-level custom machinery."""
    no, nd, nbeta, naf, rad, _, _ = _run_bounce_fwd(
        tableT, lv, mt_table, o, d, beta, aliveF, seeds, cms, cfg)
    return no, nd, nbeta, naf, rad


def _bounce_fwd(tableT, lv, mt_table, o, d, beta, aliveF, seeds, cms, cfg):
    out = _run_bounce_fwd(
        tableT, lv, mt_table, o, d, beta, aliveF, seeds, cms, cfg,
        save_resid=cfg.bwd_residuals)
    if cfg.bwd_residuals:
        no, nd, nbeta, naf, rad, idx, occ, resid = out
    else:
        no, nd, nbeta, naf, rad, idx, occ = out
        resid = None
    res = (tableT, lv, o, d, beta, aliveF, seeds, idx, occ, cms, resid,
           mt_table.shape)
    return (no, nd, nbeta, naf, rad), res


def _bounce_bwd(cfg, res, cots):
    (tableT, lv, o, d, beta, aliveF, seeds, idx, occ, cms, resid,
     mt_shape) = res
    co, cd, cbeta, _caf, crad = cots   # alive mask carries no gradient
    d_o, d_d, d_beta, d_tab, d_lv = _run_bounce_bwd(
        tableT, lv, o, d, beta, aliveF, seeds, idx, occ, cms, resid,
        (co, cd, cbeta, crad), cfg)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    d_mt = jnp.zeros(mt_shape, jnp.bfloat16)
    return (d_tab, d_lv, d_mt, d_o, d_d, d_beta,
            jnp.zeros_like(aliveF), f0(seeds), f0(cms))


_bounce.defvjp(_bounce_fwd, _bounce_bwd)


# ---------------------------------------------------------------------------
# Public API.

def build_mega_table(geometry: Geometry, materials: Materials) -> jax.Array:
    """[C_PAD, T_pad] differentiable shading table (rows per _V0.._NS).

    The megakernel analog of the device-resident scene buffers
    (CLBVHScene::SetupBuffers, CLBVHnode.cpp:209-236): geometry corners
    as (v0, e1, e2), per-corner normals, and the triangle's material —
    gradients flow back to vertices and to the [M]-row material arrays
    through the per-triangle take.
    """
    g, m = geometry, materials
    T = g.num_triangles
    T_pad = _tri_pad(T)
    mi = g.mat_idx
    rows = jnp.concatenate([
        g.v0.T, (g.v1 - g.v0).T, (g.v2 - g.v0).T,
        g.n0.T, g.n1.T, g.n2.T,
        jnp.take(m.diffuse, mi, axis=0).T,
        jnp.take(m.specular, mi, axis=0).T,
        jnp.take(m.emission, mi, axis=0).T,
        jnp.take(m.roughness, mi, axis=0)[None, :],
    ], axis=0).astype(jnp.float32)
    return jnp.pad(rows, ((0, _C_PAD - _C), (0, T_pad - T)))


def pack_lights(lights: Lights) -> jax.Array:
    """[L, 16] differentiable lights vector (see _L* column layout)."""
    cols = [lights.position, lights.direction,
            lights.light_type.astype(jnp.float32)[:, None],
            lights.intensity[:, None], lights.attenuation[:, None],
            lights.cos_cutoff[:, None]]
    lv = jnp.concatenate(cols, axis=1).astype(jnp.float32)
    return jnp.pad(lv, ((0, 0), (0, _LCOLS - lv.shape[1])))


def eligible(scene: Scene, cfg: RenderConfig) -> bool:
    """The megakernel serves VMEM-resident scenes (shadow rays included
    — in-kernel any-hit passes); everything else falls back to the
    wavefront pipeline."""
    return (scene.num_triangles <= _MAX_TRIS
            and scene.lights.count <= 30   # occlusion bitmask is int32
            and cfg.jnp_dtype() == jnp.float32)


_build_mt_jit = jax.jit(lambda g: build_mt_table(g))


def build_accel(geometry: Geometry) -> jax.Array:
    """Prebuilt mega-backend acceleration data: the limb-packed MXU M-T
    table ([4*T_pad, 96] bf16, build_mt_table). The table is
    non-differentiable BY DESIGN (closest-hit selection is discrete;
    gradients flow through the winner replay), so prebuilding it loses
    nothing — and its 3-limb bf16 split is pinned by optimization
    barriers that block XLA's loop-invariant hoisting, so building it
    per frame costs ~1.6 ms of tiny-kernel launches inside every frame
    loop (measured; the whole 512x512 1-bounce kernel is ~0.3 ms).
    Build once per geometry, outside jit, like the reference's one-time
    scene upload (CLRaytracer.cpp setup); REBUILD after vertex changes.
    The differentiable tables (materials/lights) stay live per frame."""
    # One jitted dispatch: the limb split is ~30 barrier-pinned ops that
    # would each pay the rig's per-dispatch round-trip eagerly. The jit
    # wrapper is module-level so repeat builds don't re-trace.
    return _build_mt_jit(geometry)


def _check_mt(mt: jax.Array, geometry: Geometry) -> jax.Array:
    expect = (4 * _mt_block_pad(geometry.v0.shape[0]), _MT_LIMB_K)
    if tuple(mt.shape) != expect:
        raise ValueError(
            f"mega accel shape {tuple(mt.shape)} does not match this "
            f"scene (expect {expect}) — rebuild with "
            f"megakernel.build_accel")
    return mt


def trace_paths_mega_cam(scene: Scene, cfg: RenderConfig, camera,
                         pixel_ids: jax.Array, frame,
                         accel: jax.Array = None) -> jax.Array:
    """trace_paths_mega with raygen fused into the first bounce kernel:
    (camera, pixel ids, frame) -> radiance [R, 3], no host-side
    generate_rays / pixel_seeds and no o/d/seeds HBM round trip into
    bounce 0 (the reference's in-kernel CreateRay, kernel_bvh.cl:
    441-447). Differentiable w.r.t. the scene AND the camera (the
    bounce-0 VJP carries d_camera through the in-kernel raygen)."""
    if not eligible(scene, cfg):
        raise ValueError(
            "megakernel backend requires <= %d triangles and float32 "
            "(got T=%d, dtype=%s)"
            % (_MAX_TRIS, scene.num_triangles, cfg.dtype))
    from ..linalg import cross
    tableT = build_mega_table(scene.geometry, scene.materials)
    lv = pack_lights(scene.lights)
    mt_table = (build_mt_table(scene.geometry) if accel is None
                else _check_mt(accel, scene.geometry))
    R = pixel_ids.shape[0]

    px = (pixel_ids % jnp.uint32(cfg.width)).astype(jnp.float32)
    py = (pixel_ids // jnp.uint32(cfg.width)).astype(jnp.float32)
    pxy = jnp.stack([_to_panels(px, R), _to_panels(py, R)])
    n_rows = pxy.shape[1]

    camv = jnp.concatenate([
        camera.position, cross(camera.front, camera.up), camera.up,
        camera.front, jnp.zeros((4,))]).astype(jnp.float32)[None, :]

    premix = (_mix_u32(jnp.uint32(frame)) + _GOLDEN).astype(jnp.uint32)
    jx = np.uint32(_premixed_counter(0))   # rng.SITE_JITTER_X
    jy = np.uint32(_premixed_counter(1))   # rng.SITE_JITTER_Y
    tile = np.ones((_ROWS, _LANES), np.uint32)
    rgcms = jnp.stack([jnp.asarray(tile * jx), jnp.asarray(tile * jy),
                       jnp.broadcast_to(premix, (_ROWS, _LANES))])

    o, d, beta, aliveF, rad, seeds_p = _bounce0(
        tableT, lv, mt_table, camv, pxy, rgcms, _bounce_cms(0), cfg)

    if cfg.bounces > 1:
        cms_all = jnp.stack([_bounce_cms(b)
                             for b in range(1, cfg.bounces)])

        def body(carry, cms):
            o, d, beta, aliveF, rad = carry
            o, d, beta, aliveF, rad_add = _bounce(
                tableT, lv, mt_table, o, d, beta, aliveF, seeds_p, cms,
                cfg)
            return (o, d, beta, aliveF, rad + rad_add), None

        (_, _, _, _, rad), _ = jax.lax.scan(
            body, (o, d, beta, aliveF, rad), cms_all)

    rad = jnp.maximum(rad, 0.0)
    return jnp.stack([rad[0].reshape(-1)[:R], rad[1].reshape(-1)[:R],
                      rad[2].reshape(-1)[:R]], axis=-1)


def trace_paths_mega(scene: Scene, cfg: RenderConfig, origins: jax.Array,
                     directions: jax.Array, seeds: jax.Array,
                     accel: jax.Array = None) -> jax.Array:
    """Drop-in replacement for ops/integrator.trace_paths running each
    bounce fused in one Pallas kernel. Returns radiance [R, 3]."""
    if not eligible(scene, cfg):
        raise ValueError(
            "megakernel backend requires <= %d triangles and float32 "
            "(got T=%d, dtype=%s)"
            % (_MAX_TRIS, scene.num_triangles, cfg.dtype))
    tableT = build_mega_table(scene.geometry, scene.materials)
    lv = pack_lights(scene.lights)
    R = origins.shape[0]
    # Non-differentiable limb-packed MXU M-T table (see build_mt_table).
    mt_table = (build_mt_table(scene.geometry) if accel is None
                else _check_mt(accel, scene.geometry))

    def vec_panels(a, zfill=0.0):
        return jnp.stack([_to_panels(a[:, 0], R), _to_panels(a[:, 1], R),
                          _to_panels(a[:, 2], R, fill=zfill)])

    o = vec_panels(origins.astype(jnp.float32))
    d = vec_panels(directions.astype(jnp.float32), zfill=1.0)
    seeds_p = _to_panels(seeds.astype(jnp.uint32), R)
    n_rows = seeds_p.shape[0]
    beta = jnp.ones((3, n_rows, _LANES), jnp.float32)
    aliveF = jnp.ones((n_rows, _LANES), jnp.float32)
    rad = jnp.zeros((3, n_rows, _LANES), jnp.float32)

    # The bounce chain is a lax.scan at the XLA level (NOT inside the
    # kernel — see module docstring) so the bounce kernel pair lowers
    # and Mosaic-compiles exactly once; a python loop would lower nine
    # separate (identical) kernels, paying ~15 s of remote compile each.
    cms_all = jnp.stack([_bounce_cms(b) for b in range(cfg.bounces)])

    def body(carry, cms):
        o, d, beta, aliveF, rad = carry
        o, d, beta, aliveF, rad_add = _bounce(
            tableT, lv, mt_table, o, d, beta, aliveF, seeds_p, cms, cfg)
        return (o, d, beta, aliveF, rad + rad_add), None

    (_, _, _, _, rad), _ = jax.lax.scan(
        body, (o, d, beta, aliveF, rad), cms_all)

    # Final clamp (kernel_bvh.cl:383).
    rad = jnp.maximum(rad, 0.0)
    return jnp.stack([rad[0].reshape(-1)[:R], rad[1].reshape(-1)[:R],
                      rad[2].reshape(-1)[:R]], axis=-1)
