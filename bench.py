"""Benchmark harness: one JSON line for the driver.

Primary metric (BASELINE.json): rays/s/chip forward+backward at 1080p
Cornell box. 'rays' = width * height * bounces per frame (one ray per
pixel per bounce, the reference's work-item-per-pixel workload,
CLRaytracer.cpp:53, extended over the bounce loop). The measured step is
jit(value_and_grad) of the mean rendered radiance w.r.t. the float scene
leaves — a full differentiable render step on the auto-resolved backend
(the fused bounce megakernel for Cornell), not just forward.

Rig-proof slope timing (round 5): the same jitted frame-step scan runs
at two lengths (4 and 12 steps), interleaved, and the metric is the
median SLOPE (T_hi - T_lo) / 8 — the marginal cost of one step
(utils.metrics.time_scan_slope). The slope cancels the tunneled rig's
per-dispatch round-trip constant exactly (measured 2.5-33 ms for the
same call within hours) while keeping everything a step really costs;
this is the analog of the reference timing its frame loop rather than
its dispatch (CLEngineBase.cpp:193-196). Each scanned step uses a
distinct seed and the timed scalar sums every gradient leaf, so nothing
is cached or dead-code-eliminated.

vs_baseline is measured against the driver-set north-star target of
1e9 rays/s/chip (the reference publishes no numbers — BASELINE.md).
"""

import json
import sys

import jax
import jax.numpy as jnp


def main() -> int:
    from mini_opencl_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import mini_opencl_raytracer_tpu as mrt
    from mini_opencl_raytracer_tpu import grad as gradlib
    from mini_opencl_raytracer_tpu.render import resolve_backend
    from mini_opencl_raytracer_tpu.utils.metrics import time_scan_slope

    W, H, B = 1920, 1080, 9
    scene = mrt.cornell_scene()
    camera = mrt.Camera.default()
    cfg = mrt.RenderConfig(width=W, height=H, bounces=B, backend="auto")
    backend = resolve_backend(scene, cfg)  # Cornell is mega-eligible
    # Build-once accel (the non-differentiable limb-packed M-T table;
    # gradient-safe — scene gradients flow through the live shading
    # tables), like the reference's one-time scene upload.
    accel = mrt.build_accel(scene, cfg)

    def loss(s, fr):
        return jnp.mean(mrt.render_sample(s, camera, cfg, frame=fr,
                                          accel=accel))

    def step_scalar(fr, s):
        g = gradlib.grad_float_leaves(lambda s_: loss(s_, fr), s)
        # Sum EVERY gradient leaf: the timed scalar must depend on all
        # backward work or XLA dead-code-eliminates it.
        return sum(jnp.sum(l).astype(jnp.float32)
                   for l in jax.tree_util.tree_leaves(g))

    dt = time_scan_slope(step_scalar, inner_lo=4, inner_hi=12, iters=7,
                         data=scene)

    rays = W * H * B
    rays_per_s = rays / dt
    target = 1.0e9
    print(json.dumps({
        "metric": "rays/s/chip fwd+bwd, 1080p Cornell, 9 bounces (%s)"
                  % backend,
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / target,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
