"""Run the five BASELINE.json benchmark configs and emit a results table.

Usage:
    python benchmarks/run_all.py            # all configs on default device
    python benchmarks/run_all.py --quick    # smaller iteration counts
    python benchmarks/run_all.py --configs 1 2 4

Writes JSON lines to stdout (one per config) and a markdown table to
benchmarks/RESULTS.md.
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
from mini_opencl_raytracer_tpu import grad as gradlib
from mini_opencl_raytracer_tpu.models.procedural import (bunny_scene,
                                                         sponza_scene)
from mini_opencl_raytracer_tpu.utils.metrics import render_metrics, time_fn


def _measure_forward(scene, cfg, camera, iters):
    # frame varies per timed iteration so every execution is distinct,
    # and the jitted fn returns a SCALAR mean: on the remote-TPU rig,
    # block_until_ready on a large image buffer can return before the
    # compute that fills it (observed 0.2 ms "frames" of 10+ ms of real
    # work), while a scalar's readiness requires the whole render.
    f = jax.jit(lambda s, c, fr: jnp.mean(
        mrt.render_sample(s, c, cfg, frame=fr)))
    sec = time_fn(lambda i: f(scene, camera, jnp.uint32(i)), iters=iters)
    return render_metrics(sec, cfg.width, cfg.height, cfg.bounces, cfg.spp)


def _measure_fwd_bwd(scene, cfg, camera, iters):
    def loss(s, fr):
        return jnp.mean(mrt.render_sample(s, camera, cfg, frame=fr))
    step = jax.jit(lambda s, fr: gradlib.grad_float_leaves(
        lambda s_: loss(s_, fr), s))
    sec = time_fn(lambda i: step(scene, jnp.uint32(i)), iters=iters)
    return render_metrics(sec, cfg.width, cfg.height, cfg.bounces, cfg.spp)


def config_1(iters, backend):
    """Cornell 512x512, primary rays + point light (CPU-runnable)."""
    scene = mrt.cornell_scene()
    cfg = mrt.RenderConfig(width=512, height=512, bounces=1, backend=backend)
    m = _measure_forward(scene, cfg, mrt.Camera.default(), iters)
    m["config"] = "1: cornell 512x512 primary+point"
    return m


def config_2(iters, backend):
    """Cornell 1080p, shadow rays + Phong direct specular, multi-light."""
    lights = mrt.Lights(
        position=jnp.array([[0.0, -10.0, 16.0], [4.0, 2.0, 14.0]]),
        direction=jnp.array([[-0.5, 0.4, -0.1], [0.0, 0.5, -1.0]]),
        light_type=jnp.array([mrt.LIGHT_POINT, mrt.LIGHT_POINT], jnp.int32),
        intensity=jnp.array([16.0, 8.0]),
        attenuation=jnp.array([0.8, 0.8]),
        cos_cutoff=jnp.array([0.9, 0.9]))
    scene = mrt.cornell_scene(lights=lights)
    cfg = mrt.RenderConfig(width=1920, height=1080, bounces=2,
                           backend=backend, shadow_rays=True,
                           direct_specular=True)
    m = _measure_forward(scene, cfg, mrt.Camera.default(), iters)
    m["config"] = "2: cornell 1080p shadows+phong multi-light"
    return m


def config_3(iters, backend):
    """Bunny-scale (~70k tris): LBVH build + deep traversal."""
    scene = bunny_scene()
    cfg = mrt.RenderConfig(width=512, height=512, bounces=2, backend=backend)
    m = _measure_forward(scene, cfg, mrt.Camera.default(), iters)
    m["config"] = f"3: bunny-scale ({scene.num_triangles} tris) 512x512"
    return m


def config_4(iters, backend):
    """4-bounce differentiable Cornell: fwd+bwd step."""
    scene = mrt.cornell_scene()
    cfg = mrt.RenderConfig(width=512, height=512, bounces=4, backend=backend)
    m = _measure_fwd_bwd(scene, cfg, mrt.Camera.default(), iters)
    m["config"] = "4: cornell 512x512 4-bounce fwd+bwd"
    return m


def config_5(iters, backend):
    """Sponza-scale (~260k tris) at 4K (single chip here; multi-host via
    parallel/shard.py on real slices)."""
    scene = sponza_scene()
    cfg = mrt.RenderConfig(width=3840, height=2160, bounces=1,
                           backend=backend)
    m = _measure_forward(scene, cfg, mrt.Camera.default(), iters)
    m["config"] = f"5: sponza-scale ({scene.num_triangles} tris) 4K"
    return m


CONFIGS = {1: config_1, 2: config_2, 3: config_3, 4: config_4, 5: config_5}


def main() -> int:
    from mini_opencl_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, nargs="*",
                    default=[1, 2, 3, 4, 5])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args()
    iters = 2 if args.quick else args.iters

    rows = []
    for c in args.configs:
        try:
            m = CONFIGS[c](iters, args.backend)
        except Exception as e:  # record failures instead of dying
            m = {"config": f"{c}: FAILED", "error": str(e)[:300]}
        rows.append(m)
        print(json.dumps(m), flush=True)

    path = os.path.join(os.path.dirname(__file__), "RESULTS.md")
    with open(path, "w") as f:
        f.write("# Benchmark results\n\n")
        f.write(f"Device: {jax.devices()[0].device_kind}, "
                f"backend: {args.backend}\n\n")
        f.write("| Config | ms/frame | Mrays/s |\n|---|---|---|\n")
        for m in rows:
            if "error" in m:
                f.write(f"| {m['config']} | error | {m['error'][:60]} |\n")
            else:
                f.write(f"| {m['config']} | "
                        f"{m['seconds_per_frame']*1e3:.1f} | "
                        f"{m['mrays_per_second']:.1f} |\n")
        f.write(
            "\nTiming method: median of per-frame times, each frame on a"
            " distinct seed and\nhard-synchronized by a host fetch "
            "(utils.metrics.time_fn — `block_until_ready`\nis not a "
            "reliable barrier on the tunneled-TPU rig, and "
            "identical-argument calls\ncan be served cached). The rig "
            "adds a per-call round-trip floor that varies by\nsession "
            "(measured 2.5-33 ms for the same 512x512 frame hours "
            "apart); small-frame\nrows are therefore dominated by rig "
            "latency in bad windows — compare rows within\none run, "
            "not across runs.\n")
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
