"""Sharded rendering: DP over pixel tiles + geometry-sharded ring traversal.

TPU re-design of the reference's only parallelism — the flat
one-work-item-per-pixel launch (CLRaytracer.cpp:53-54) — as first-class
multi-chip strategies (SURVEY.md section 2 'Parallelism & distributed-
communication inventory'):

* **DP**: the H*W ray grid is sharded over the ``dp`` mesh axis with
  ``shard_map``; scene/BVH replicated; zero communication until the
  final image assembly (the sharded axis IS the output layout).
* **TP (geometry-parallel ring)**: triangle buffers are sharded over the
  ``tp`` axis. Each chip intersects its resident triangle shard, then the
  *ray wavefront state* (o, d, best-hit) ring-rotates via ``ppermute``
  until every ray has visited every shard — the renderer's equivalent of
  ring attention (blockwise context parallelism): geometry stays put,
  activations (rays) move over ICI.
* Gradients: ``psum`` over replicated scene params happens automatically
  via shard_map's reverse-mode transfer; see tests/test_sharding.py.

All functions work under ``jit`` with a Mesh from parallel/mesh.py and
are exercised on 8 virtual CPU devices in tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import MeshConfig, RenderConfig
from ..models.scene import Camera, Scene
from ..ops import rng
from ..ops.camera import generate_rays
from ..ops.integrator import trace_paths
from ..ops.intersect import Hit, intersect_brute, occluded_brute
from ..render import make_intersectors


def render_sample_dp(scene: Scene, camera: Camera, cfg: RenderConfig,
                     mesh: Mesh, frame=0,
                     mesh_cfg: MeshConfig = MeshConfig()) -> jax.Array:
    """One progressive sample, pixels sharded over the ``dp`` axis,
    geometry replicated -> linear radiance [H, W, 3].

    The per-shard body is identical to render.render_sample — the same
    integrator and intersector run on a pixel slice; the flat pixel-id
    vector is what gets sharded (row-major, so shards are image rows).
    """
    R = cfg.num_pixels
    dp = mesh.shape[mesh_cfg.dp_axis]
    if R % dp:
        raise ValueError(f"pixels {R} not divisible by dp={dp}")
    pixel_ids = jnp.arange(R, dtype=jnp.uint32)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(mesh_cfg.dp_axis), P(), P()),
        out_specs=P(mesh_cfg.dp_axis),
        check_vma=False)
    def body(ids_shard, scene_rep, camera_rep):
        closest, any_hit = make_intersectors(scene_rep, cfg)
        seeds = rng.pixel_seeds(ids_shard, jnp.uint32(frame))
        o, d = generate_rays(camera_rep, cfg, ids_shard, seeds)
        return trace_paths(scene_rep, cfg, o, d, seeds, closest, any_hit)

    radiance = body(pixel_ids, scene, camera)
    return radiance.reshape(cfg.height, cfg.width, 3)


def _shard_geometry(geometry, tp: int, index: jax.Array):
    """Slice a triangle range for shard ``index`` (static equal split)."""
    T = geometry.v0.shape[0]
    per = -(-T // tp)

    def pad_take(a):
        pad = per * tp - T
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                    constant_values=1e30 if a.dtype != jnp.int32 else 0)
        return jax.lax.dynamic_slice_in_dim(a, index * per, per, axis=0)

    return jax.tree_util.tree_map(pad_take, geometry), per


def ring_intersect(o: jax.Array, d: jax.Array, scene: Scene,
                   cfg: RenderConfig, tp_axis: str) -> Hit:
    """Closest hit with geometry sharded over ``tp_axis``.

    Called *inside* shard_map. Each chip intersects the triangle shard it
    owns against its resident rays, then rotates the ray state (o, d,
    best t/idx) one hop around the ring with ``ppermute``; after tp hops
    every ray has met every triangle and is back home. Triangle indices
    are globalized with the owning shard's offset so shading gathers work
    on the replicated shading table.
    """
    tp = jax.lax.axis_size(tp_axis)
    my = jax.lax.axis_index(tp_axis)

    def local_hit(o_, d_, shard_idx):
        geo_shard, per = _shard_geometry(scene.geometry, tp, shard_idx)
        h = intersect_brute(o_, d_, geo_shard, t_max=cfg.t_max,
                            backface_cull=cfg.backface_cull,
                            ray_chunk=cfg.ray_chunk)
        return Hit(t=h.t, tri_idx=h.tri_idx + shard_idx * per, hit=h.hit)

    # Hop 0: intersect the shard we own.
    best = local_hit(o, d, my)
    state = (o, d, best.t, best.tri_idx, best.hit.astype(jnp.int32))

    perm = [(i, (i + 1) % tp) for i in range(tp)]

    def hop(k, state):
        o_, d_, t_, idx_, hit_ = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, tp_axis, perm), state)
        # After k+1 rotations these rays originated at my - (k+1); they
        # now get intersected against MY shard.
        h = local_hit(o_, d_, my)
        better = h.hit & (h.t < t_)
        return (o_, d_,
                jnp.where(better, h.t, t_),
                jnp.where(better, h.tri_idx, idx_),
                jnp.maximum(hit_, h.hit.astype(jnp.int32)))

    state = jax.lax.fori_loop(0, tp - 1, hop, state)
    # One final rotation brings every ray home.
    o_, d_, t_, idx_, hit_ = jax.tree_util.tree_map(
        lambda x: jax.lax.ppermute(x, tp_axis, perm), state)
    return Hit(t=t_, tri_idx=idx_, hit=hit_ > 0)


def render_sample_ring(scene: Scene, camera: Camera, cfg: RenderConfig,
                       mesh: Mesh, frame=0,
                       mesh_cfg: MeshConfig = MeshConfig()) -> jax.Array:
    """One progressive sample with pixels sharded over ``dp`` AND
    geometry sharded over ``tp`` (ring traversal) -> [H, W, 3].

    Shadow rays use the same ring (occlusion = ring closest-hit below the
    light distance).
    """
    R = cfg.num_pixels
    dp = mesh.shape[mesh_cfg.dp_axis]
    if R % dp:
        raise ValueError(f"pixels {R} not divisible by dp={dp}")
    pixel_ids = jnp.arange(R, dtype=jnp.uint32)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(mesh_cfg.dp_axis), P(), P()),
        out_specs=P(mesh_cfg.dp_axis),
        check_vma=False)
    def body(ids_shard, scene_rep, camera_rep):
        closest = functools.partial(ring_intersect, scene=scene_rep,
                                    cfg=cfg, tp_axis=mesh_cfg.tp_axis)

        def any_hit(o, d, t_limit):
            h = closest(o, d)
            return h.hit & (h.t < t_limit)

        seeds = rng.pixel_seeds(ids_shard, jnp.uint32(frame))
        o, d = generate_rays(camera_rep, cfg, ids_shard, seeds)
        return trace_paths(scene_rep, cfg, o, d, seeds, closest, any_hit)

    radiance = body(pixel_ids, scene, camera)
    return radiance.reshape(cfg.height, cfg.width, 3)
