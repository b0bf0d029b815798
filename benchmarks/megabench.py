"""Forward / forward+backward timing of the configured backend on the
1080p Cornell workload (the BASELINE.json primary metric shape).

    python benchmarks/megabench.py [backend]

Prints compile + steady-state times and Mrays/s for the forward render
and the full differentiable step. Default backend "auto" resolves to the
fused bounce megakernel on Cornell (ops/pallas/megakernel.py).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..'))
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main() -> int:
    backend = sys.argv[1] if len(sys.argv) > 1 else "auto"
    from mini_opencl_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import mini_opencl_raytracer_tpu as mrt
    from mini_opencl_raytracer_tpu import grad as gradlib
    from mini_opencl_raytracer_tpu.render import resolve_backend

    scene = mrt.cornell_scene()
    cam = mrt.Camera.default()
    W, H, B = 1920, 1080, 9
    cfg = mrt.RenderConfig(width=W, height=H, bounces=B, backend=backend)
    log(f"backend={backend} -> {resolve_backend(scene, cfg)}, "
        f"platform={jax.default_backend()}")

    fwd = jax.jit(lambda s: mrt.render_sample(s, cam, cfg))
    t0 = time.perf_counter()
    img = fwd(scene)
    jax.block_until_ready(img)
    log(f"fwd compile+run {time.perf_counter() - t0:.1f} s, "
        f"mean {float(img.mean()):.4f}")
    t0 = time.perf_counter()
    for _ in range(5):
        img = fwd(scene)
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / 5
    log(f"fwd      {dt * 1e3:8.2f} ms  {W * H * B / dt / 1e6:8.1f} Mrays/s")

    def loss(s):
        return jnp.mean(mrt.render_sample(s, cam, cfg))

    step = jax.jit(lambda s: gradlib.grad_float_leaves(loss, s))
    t0 = time.perf_counter()
    g = step(scene)
    jax.block_until_ready(g)
    log(f"fwd+bwd compile+run {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    for _ in range(5):
        g = step(scene)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / 5
    log(f"fwd+bwd  {dt * 1e3:8.2f} ms  {W * H * B / dt / 1e6:8.1f} Mrays/s"
        f"  vs_baseline {W * H * B / dt / 1e9:.3f}")
    log("kd grad max", float(jnp.abs(g.materials.diffuse).max()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
