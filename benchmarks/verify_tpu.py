"""Compiled-on-TPU correctness artifact.

The CI suite runs every kernel in interpret mode on CPU
(tests/conftest.py); this script is the durable record that the SAME
code paths, Mosaic-COMPILED on a real TPU chip, match the pure-XLA
brute-force oracle. It renders each backend compiled (no interpret) and
writes the max |err| per config to benchmarks/VERIFY_TPU.md.

Run: PYTHONPATH=. python benchmarks/verify_tpu.py   (on a TPU host)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp


TOL = 1e-3   # linear-radiance max-err budget per VERDICT round-3 ask #5


def render_lin(scene, camera, cfg, accel=None):
    import mini_opencl_raytracer_tpu as mrt
    out = mrt.render_radiance(scene, camera, cfg, frames=1, accel=accel)
    return jax.block_until_ready(out)


def main() -> int:
    from mini_opencl_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import dataclasses

    import mini_opencl_raytracer_tpu as mrt
    from mini_opencl_raytracer_tpu.models import procedural
    from mini_opencl_raytracer_tpu.render import resolve_backend

    dev = jax.devices()[0]
    rows = []

    def check(name, scene, camera, cfg, backends, oracle_backend="bruteforce"):
        oracle = render_lin(scene, camera,
                            dataclasses.replace(cfg,
                                                backend=oracle_backend))
        for b in backends:
            c = dataclasses.replace(cfg, backend=b)
            resolved = resolve_backend(scene, c)
            accel = mrt.build_accel(scene, c)
            t0 = time.perf_counter()
            img = render_lin(scene, camera, c, accel=accel)
            dt = time.perf_counter() - t0
            err = float(jnp.max(jnp.abs(img - oracle)))
            ok = "PASS" if err <= TOL else "FAIL"
            rows.append((name, f"{b} ({resolved})", err, ok, dt))
            print(f"{name:34s} {b:10s} -> {resolved:9s} "
                  f"max|err|={err:.2e} {ok}", flush=True)

    camera = mrt.Camera.default()
    cornell = mrt.cornell_scene()

    cfg = mrt.RenderConfig(width=512, height=512, bounces=9)
    check("cornell 512x512 9b", cornell, camera, cfg,
          ["bvh", "pallas", "mega"])

    cfg_sh = mrt.RenderConfig(width=512, height=512, bounces=4,
                              shadow_rays=True, direct_specular=True,
                              specular_model="ggx")
    check("cornell 512x512 shadows+ggx", cornell, camera, cfg_sh,
          ["bvh", "pallas", "mega"])

    # Large-scene row: the all-pairs oracle OOMs at this size on TPU
    # (XLA hoists the [R, T, 3] broadcast out of the ray-chunk map), so
    # the pure-XLA LBVH backend — itself brute-verified in the CPU
    # suite — serves as the compiled oracle for the clustered kernel.
    bunny = procedural.bunny_scene(target_tris=20_000)
    cfg_b = mrt.RenderConfig(width=256, height=256, bounces=2)
    check("bunny-20k 256x256 2b", bunny, camera, cfg_b,
          ["pallas"], oracle_backend="bvh")

    path = os.path.join(os.path.dirname(__file__), "VERIFY_TPU.md")
    with open(path, "w") as f:
        f.write("# Compiled-on-TPU verification\n\n")
        f.write(f"Device: {dev.device_kind}; oracle: `bruteforce` "
                f"backend (pure XLA, no Pallas), same chip. Linear\n"
                f"radiance max-abs-err per backend, tolerance "
                f"{TOL:.0e}.\n\n")
        f.write("| Config | Backend | max abs err | status | s/frame |\n")
        f.write("|---|---|---|---|---|\n")
        for name, b, err, ok, dt in rows:
            f.write(f"| {name} | {b} | {err:.2e} | {ok} | {dt:.2f} |\n")
    print(f"wrote {path}")
    return 0 if all(r[3] == "PASS" for r in rows) else 1


if __name__ == "__main__":
    sys.exit(main())
