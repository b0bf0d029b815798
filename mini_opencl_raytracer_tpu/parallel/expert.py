"""Expert-parallel (EP) material routing: MoE-style all-to-all ray
binning by material class.

The EP row of SURVEY.md section 2's parallelism inventory — the MoE
analog of the reference's per-ray BRDF lobe switch (SampleBrdf,
kernel_bvh.cl:294-302). Materials are partitioned over the ``ep`` mesh
axis (material m lives on device m % ep); each device's resident rays
are binned by their hit material's owner, all-to-all'd to that owner
with fixed per-peer capacity (the standard MoE dispatch), shaded there
against the owner's *local* material shard only, and all-to-all'd back.

On a lane-select SIMD machine the single-kernel path already evaluates
both lobes for every lane, so EP routing buys nothing for the built-in
BRDF — this module exists for material systems whose per-class shading
is too heavy or too divergent to evaluate everywhere (many-BSDF scenes,
measured materials), and as the routing fabric those systems need. The
capacity-overflow convention is also MoE's: overflowing rays are
dropped by the dispatch and report ``routed=False`` so the caller can
shade them locally (the test sizes capacity so none drop).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


class EpResult(NamedTuple):
    values: jax.Array   # [R_local, F_out] routed computation results
    routed: jax.Array   # [R_local] bool — False where capacity dropped


def ep_route(payload: jax.Array, owner: jax.Array, ep_axis: str,
             capacity: int, eval_fn: Callable[[jax.Array], jax.Array],
             out_features: int) -> EpResult:
    """Inside shard_map: send each row of ``payload`` [R, F] to device
    ``owner[r]`` over ``ep_axis`` (capacity-padded all-to-all), apply
    ``eval_fn`` ([ep * capacity, F] -> [ep * capacity, F_out]) on the
    owning device, and return results to the rows' home device."""
    ep = jax.lax.axis_size(ep_axis)
    R = payload.shape[0]
    F = payload.shape[1]

    order = jnp.argsort(owner, stable=True)
    sorted_owner = owner[order]
    group_start = jnp.searchsorted(sorted_owner,
                                   jnp.arange(ep, dtype=owner.dtype))
    pos = jnp.arange(R) - group_start[sorted_owner]
    ok = pos < capacity
    # Flat dispatch buffer with one trash slot for overflow rows.
    slot = jnp.where(ok, sorted_owner * capacity + pos, ep * capacity)
    send = jnp.zeros((ep * capacity + 1, F), payload.dtype)
    send = send.at[slot].set(payload[order])
    send = send[:-1].reshape(ep, capacity, F)

    recv = jax.lax.all_to_all(send, ep_axis, split_axis=0, concat_axis=0,
                              tiled=False)
    out = eval_fn(recv.reshape(ep * capacity, F))
    out = out.reshape(ep, capacity, out_features)
    back = jax.lax.all_to_all(out, ep_axis, split_axis=0, concat_axis=0,
                              tiled=False)

    flat = jnp.concatenate(
        [back.reshape(ep * capacity, out_features),
         jnp.zeros((1, out_features), back.dtype)], axis=0)
    res_sorted = flat[slot]
    values = jnp.zeros((R, out_features), back.dtype).at[order].set(
        res_sorted)
    routed = jnp.zeros((R,), bool).at[order].set(ok)
    return EpResult(values=values, routed=routed)


def ep_shade_demo(positions: jax.Array, normals: jax.Array,
                  mat_idx: jax.Array, materials_diffuse: jax.Array,
                  light_pos: jax.Array, mesh: Mesh,
                  ep_axis: str = "ep", capacity: int = None) -> jax.Array:
    """Reference EP pipeline: Lambert direct shading where material m's
    diffuse row lives ONLY on device m % ep — rays are routed to their
    material's owner, shaded against the local shard, and routed home.

    Inputs are full (unsharded) arrays; rays are pixel-sharded over the
    ep axis for the demo. Returns [R, 3] shaded colors, equal to the
    local computation (tests assert equality).
    """
    ep = mesh.shape[ep_axis]
    R = positions.shape[0]
    M = materials_diffuse.shape[0]
    M_per = -(-M // ep)
    if capacity is None:
        capacity = -(-R // ep)  # ample for the demo

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(ep_axis), P(ep_axis), P(ep_axis), P(), P()),
        out_specs=P(ep_axis),
        check_vma=False)
    def body(pos_s, n_s, mi_s, mats, lpos):
        my = jax.lax.axis_index(ep_axis)
        # This device's resident material shard (m owned by m % ep).
        local_ids = my + ep * jnp.arange(M_per)
        local_kd = jnp.take(mats, jnp.minimum(local_ids, M - 1), axis=0)

        owner = (mi_s % ep).astype(jnp.int32)
        payload = jnp.concatenate(
            [pos_s, n_s, (mi_s // ep).astype(jnp.float32)[:, None]],
            axis=1)

        def shade_local(rows):
            p, n, mrow = rows[:, 0:3], rows[:, 3:6], rows[:, 6]
            kd = jnp.take(local_kd,
                          jnp.clip(mrow.astype(jnp.int32), 0, M_per - 1),
                          axis=0)
            to_l = lpos[None, :] - p
            dist2 = jnp.maximum(jnp.sum(to_l * to_l, axis=1), 1e-12)
            l_unit = to_l / jnp.sqrt(dist2)[:, None]
            ndotl = jnp.maximum(jnp.sum(n * l_unit, axis=1), 0.0)
            return kd * (ndotl / dist2)[:, None]

        res = ep_route(payload, owner, ep_axis, capacity, shade_local, 3)
        # Capacity-overflow fallback (module docstring contract): rays
        # the dispatch dropped are shaded locally against the replicated
        # table instead of silently going black.
        kd_full = jnp.take(mats, jnp.clip(mi_s.astype(jnp.int32), 0, M - 1),
                           axis=0)
        to_l = lpos[None, :] - pos_s
        dist2 = jnp.maximum(jnp.sum(to_l * to_l, axis=1), 1e-12)
        l_unit = to_l / jnp.sqrt(dist2)[:, None]
        ndotl = jnp.maximum(jnp.sum(n_s * l_unit, axis=1), 0.0)
        local = kd_full * (ndotl / dist2)[:, None]
        return jnp.where(res.routed[:, None], res.values, local)

    return body(positions, normals, mat_idx, materials_diffuse, light_pos)
