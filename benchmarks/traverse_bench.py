"""Clustered-kernel traversal microbench: coherent / incoherent /
real-secondary-bounce closest hit on the bunny-scale scene.

    python benchmarks/traverse_bench.py [--tris 70000] [--rays 262144]

Isolates the cluster-culled traversal kernel (ops/pallas/clustered.py)
from the integrator so the MRT_CLUSTER* env knobs can be swept:

  coherent    camera primaries in tile-swizzled packet order
  incoherent  uniform random origins in the scene AABB, random unit
              directions — the worst case, the floor under diffuse
              bounces (VERDICT r4 weak #4)
  secondary   the REAL bounce-1 wavefront: diffuse directions sampled
              at the primary hit points, coherence-sorted exactly like
              _trace_paths_sorted (octant + origin Morton key) — what
              config 3's second bounce actually traverses

Timing is rig-proof (utils.metrics.time_scan_fn): 4 distinct ray sets
per jitted scan, host-fetch synchronized, median over iters.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mini_opencl_raytracer_tpu as mrt
from mini_opencl_raytracer_tpu.models.procedural import bunny_scene
from mini_opencl_raytracer_tpu.ops import rng as rnglib
from mini_opencl_raytracer_tpu.ops.camera import generate_rays
from mini_opencl_raytracer_tpu.ops.integrator import (_ray_sort_keys,
    DEAD_KEY)
from mini_opencl_raytracer_tpu.ops.pallas import clustered
from mini_opencl_raytracer_tpu.utils.metrics import time_scan_fn


def _bounds(geo):
    pts = jnp.concatenate([geo.v0, geo.v1, geo.v2], axis=0)
    return jnp.min(pts, axis=0), jnp.max(pts, axis=0)


def _rand01(seed, n, salt):
    h = rnglib.mix_u32(jnp.arange(n, dtype=jnp.uint32)
                       + jnp.uint32(salt) * jnp.uint32(0x9E3779B9)
                       + jnp.uint32(seed) * jnp.uint32(0x85EBCA6B))
    return h.astype(jnp.float32) / 4294967296.0


def _rand_dirs(seed, n, salt):
    u = _rand01(seed, n, salt)
    v = _rand01(seed, n, salt + 7)
    z = 2.0 * u - 1.0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * v
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def main() -> int:
    from mini_opencl_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=70000)
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    scene = bunny_scene(target_tris=args.tris)
    geo = scene.geometry
    cfg = mrt.RenderConfig(width=512, height=512)
    accel = clustered.build_accel(geo, materials=scene.materials)
    lo, hi = _bounds(geo)
    R = args.rays
    cam = mrt.Camera.default()

    from mini_opencl_raytracer_tpu.render import _swizzled_ids
    ids = _swizzled_ids(cfg)
    seeds0 = rnglib.pixel_seeds(ids, jnp.uint32(0))
    o_cam, d_cam = generate_rays(cam, cfg, ids, seeds0)

    def measure(name, make_rays):
        def frame(fr, acc):
            o, d = make_rays(fr)
            h = clustered.intersect_clustered(o, d, acc, cfg.t_max)
            return jnp.mean(jnp.where(h.hit, h.t, 0.0))
        sec = time_scan_fn(frame, inner=4, iters=args.iters, data=accel)
        print(json.dumps({
            "case": name, "ms": sec * 1e3,
            "mrays_per_second": R / sec / 1e6,
            "cluster": clustered.CLUSTER, "super": clustered.SUPER,
            "groups": clustered._GROUPS, "rows": clustered._ROWS,
            "nslots": clustered.NSLOTS}), flush=True)
        return sec

    # 1. coherent camera primaries (jitter varies per frame).
    def coherent(fr):
        s = rnglib.pixel_seeds(ids, fr)
        return generate_rays(cam, cfg, ids, s)
    measure("coherent-primary", coherent)

    # 2. incoherent random rays.
    def incoherent(fr):
        o = jnp.stack([_rand01(fr, R, k) for k in range(3)], axis=-1)
        o = lo + o * (hi - lo)
        return o, _rand_dirs(fr, R, 11)
    measure("incoherent-random", incoherent)

    # 3. real secondary bounce, coherence-sorted like the integrator.
    h0 = clustered.intersect_clustered(o_cam, d_cam, accel, cfg.t_max)
    pos = o_cam + d_cam * jnp.where(h0.hit, h0.t, 1.0)[:, None]

    def secondary(fr):
        d = _rand_dirs(fr, R, 23)
        o = pos + d * 1e-3
        # Shared key/DEAD_KEY with the integrator; dead lanes are NOT
        # parked here (a deliberate overstatement of the real secondary
        # cost — the integrator additionally parks them outside the
        # AABB, see _trace_paths_sorted).
        keys = jnp.where(h0.hit, _ray_sort_keys(o, d, lo, hi),
                         jnp.uint32(DEAD_KEY))
        out = jax.lax.sort(
            (keys, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]),
            num_keys=1)
        return (jnp.stack(out[1:4], axis=-1), jnp.stack(out[4:7], axis=-1))
    measure("secondary-sorted", secondary)
    return 0


if __name__ == "__main__":
    sys.exit(main())
