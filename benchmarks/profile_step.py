"""Per-stage timing breakdown of the 1080p Cornell differentiable step.

VERDICT round-1 asked: "Profile the 1080p Cornell differentiable step ...
and publish the per-stage breakdown". This script times each stage of the
pipeline in isolation (forward render, fwd+bwd, intersection only,
shading only, with/without remat) so the dominant cost is identified by
measurement, not guesswork. Results go into benchmarks/PROFILE.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mini_opencl_raytracer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import mini_opencl_raytracer_tpu as mrt
from mini_opencl_raytracer_tpu import grad as gradlib
from mini_opencl_raytracer_tpu.render import make_intersectors, render_sample
from mini_opencl_raytracer_tpu.ops import rng
from mini_opencl_raytracer_tpu.ops.camera import generate_rays
from mini_opencl_raytracer_tpu.ops.integrator import trace_paths
import dataclasses


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:55s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    W, H, B = 1920, 1080, 9
    scene = mrt.cornell_scene()
    camera = mrt.Camera.default()
    cfg = mrt.RenderConfig(width=W, height=H, bounces=B, backend="pallas")
    R = W * H

    print(f"== {W}x{H}, {B} bounces, backend=pallas, "
          f"{scene.geometry.v0.shape[0]} tris ==")

    # 1. Forward render only.
    fwd = jax.jit(lambda s: render_sample(s, camera, cfg))
    t_fwd = bench("forward render_sample", fwd, scene)

    # 2. Full fwd+bwd (the bench.py step).
    def loss(s):
        return jnp.mean(render_sample(s, camera, cfg))
    step = jax.jit(lambda s: gradlib.grad_float_leaves(loss, s))
    t_step = bench("fwd+bwd grad_float_leaves", step, scene)

    # 3. fwd+bwd without remat (OOMs at 1080p — 32.5 GB of residuals,
    # dominated by the per-bounce one-hot [R, T] gather panels).
    t_step_nr = float("nan")
    try:
        cfg_nr = dataclasses.replace(cfg, remat=False)
        def loss_nr(s):
            return jnp.mean(render_sample(s, camera, cfg_nr))
        step_nr = jax.jit(lambda s: gradlib.grad_float_leaves(loss_nr, s))
        t_step_nr = bench("fwd+bwd no-remat", step_nr, scene)
    except Exception as e:  # noqa: BLE001
        print(f"fwd+bwd no-remat: FAILED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:90]})")

    # 4. Intersection only: 9x the panel kernel on the primary wavefront.
    closest, _ = make_intersectors(scene, cfg)
    seeds = rng.pixel_seeds(jnp.arange(R, dtype=jnp.uint32), jnp.uint32(0))
    o, d = jax.jit(lambda: generate_rays(camera, cfg,
                                         jnp.arange(R, dtype=jnp.uint32),
                                         seeds))()
    jax.block_until_ready((o, d))

    def isect9(o, d):
        def body(i, acc):
            h = closest(o, d)
            return acc + h.t
        return jax.lax.fori_loop(0, B, body, jnp.zeros((R,), jnp.float32))
    t_isect = bench("9x panel intersect (primary rays)",
                    jax.jit(isect9), o, d)

    # 5. Forward trace_paths only (no raygen/unswizzle).
    def tp_only(o, d):
        return trace_paths(scene, cfg, o, d, seeds, closest, None)
    t_tp = bench("forward trace_paths (scan of 9 bounces)",
                 jax.jit(tp_only), o, d)

    # 6. Shading-only scan: replace intersect with a fixed dummy hit.
    from mini_opencl_raytracer_tpu.ops.intersect import Hit
    def dummy_intersect(o_, d_):
        return Hit(t=jnp.full((R,), 10.0, jnp.float32),
                   tri_idx=jnp.zeros((R,), jnp.int32),
                   hit=jnp.ones((R,), bool))
    def tp_shade(o, d):
        return trace_paths(scene, cfg, o, d, seeds, dummy_intersect, None)
    t_shade = bench("forward scan, shading only (dummy hits)",
                    jax.jit(tp_shade), o, d)

    # 7. fwd+bwd of the shading-only scan.
    def loss_shade(s):
        def di(o_, d_):
            return dummy_intersect(o_, d_)
        return jnp.mean(trace_paths(s, cfg, o, d, seeds, di, None))
    step_shade = jax.jit(lambda s: gradlib.grad_float_leaves(loss_shade, s))
    t_shade_bwd = bench("fwd+bwd shading-only scan", step_shade, scene)

    rays = R * B
    print()
    print(f"rays/step = {rays/1e6:.1f} M")
    for name, t in [("forward", t_fwd), ("fwd+bwd", t_step),
                    ("fwd+bwd no-remat", t_step_nr),
                    ("intersect x9", t_isect),
                    ("trace_paths fwd", t_tp),
                    ("shade-only fwd", t_shade),
                    ("shade-only fwd+bwd", t_shade_bwd)]:
        print(f"{name:25s} {rays / t / 1e6:9.1f} Mrays/s")


if __name__ == "__main__":
    main()
