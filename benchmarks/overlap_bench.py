"""Measure the bucketed (overlap-placed) gradient all-reduce vs the
single end-of-backward psum (parallel/shard.train_step_dp) on the
8-virtual-device CPU mesh, and append the table to SCALING.md.

On this mesh collectives are shared-memory copies, so the numbers bound
the *placement overhead* of bucketing (the structure XLA's latency-
hiding scheduler needs for real ICI overlap), not the ICI win itself.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def timeit(fn, iters=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import mini_opencl_raytracer_tpu as mrt
    from mini_opencl_raytracer_tpu.config import MeshConfig
    from mini_opencl_raytracer_tpu.parallel import mesh as mesh_mod
    from mini_opencl_raytracer_tpu.parallel.shard import train_step_dp

    scene = mrt.cornell_scene()
    cam = mrt.Camera.default()
    cfg = mrt.RenderConfig(width=128, height=128, bounces=3,
                           backend="bruteforce", ray_chunk=2048)
    mesh_cfg = MeshConfig(dp=8, tp=1)
    mesh = mesh_mod.make_mesh(mesh_cfg)

    rows = []
    for buckets in (1, 2, 4):
        dt = timeit(lambda: train_step_dp(scene, cam, cfg, mesh,
                                          mesh_cfg=mesh_cfg,
                                          grad_buckets=buckets))
        rows.append((buckets, dt * 1e3))
        print(f"grad_buckets={buckets}: {dt*1e3:8.2f} ms/step", flush=True)

    path = os.path.join(os.path.dirname(__file__), "SCALING.md")
    with open(path, "a") as f:
        f.write("\n## Overlapped gradient all-reduce "
                "(train_step_dp, dp=8 virtual CPU)\n\n")
        f.write("Manual psum placement inside shard_map: `grad_buckets=1`"
                " = one all-reduce\nafter the full backward (nothing to"
                " hide it behind); `k>1` = DDP-style\nbucketing — bucket"
                " i's psum issues before bucket i+1's fwd+bwd, giving\n"
                "XLA's latency-hiding scheduler independent compute to"
                " overlap each\ncollective with on real chips. On this"
                " shared-memory mesh the psums are\nmemcpys, so the table"
                " bounds bucketing's placement overhead rather than\n"
                "demonstrating the ICI win (single-chip round: no real"
                " multi-chip rig).\nCornell 128x128, 3 bounces,"
                " bruteforce backend, full scene-grad step.\n\n")
        f.write("| grad_buckets | ms/step |\n|---|---|\n")
        for b, ms in rows:
            f.write(f"| {b} | {ms:.1f} |\n")

        # ---- Placement evidence (round-5 ask): show, from the LOWERED
        # (pre-optimization) program — the order this build actually
        # emits — that bucket i's all-reduce issues BEFORE bucket i+1's
        # compute rather than after the full backward. The lowered
        # order is what we control; whether the backend scheduler keeps
        # the interleave is its own choice per target (the CPU backend
        # sinks all sync collectives to the end, measured here; the TPU
        # backend's async-collective + latency-hiding passes consume
        # exactly this placement to overlap them with compute on ICI).
        def prog(buckets):
            return jax.jit(
                lambda: train_step_dp(scene, cam, cfg, mesh,
                                      mesh_cfg=mesh_cfg,
                                      grad_buckets=buckets)
            ).lower().as_text()

        def ar_positions(text):
            # Find the function holding the bucketed psums and locate
            # each all-reduce relative to its op count.
            best = None
            for fn in text.split("\n  func.func"):
                lines = [l for l in fn.splitlines() if "=" in l]
                pos = [i for i, l in enumerate(lines)
                       if "all_reduce" in l or "all-reduce" in l]
                if pos and (best is None or len(pos) > len(best[0])):
                    best = (pos, len(lines))
            if best is None:
                return [], 0
            return best

        pos4, n4 = ar_positions(prog(4))
        rel4 = [p / max(n4 - 1, 1) for p in pos4]
        spread = (len(rel4) >= 4 and min(rel4) < 0.7
                  and (max(rel4) - min(rel4)) > 0.1)
        q = lambda rs: ", ".join(f"{r:.2f}" for r in rs)
        verdict = (
            "SPREAD through the step: each bucket's gradient "
            "all-reduce issues before the\nnext bucket's "
            "forward+backward, which is the placement XLA's "
            "async-collective and\nlatency-hiding-scheduler passes "
            "need to overlap communication with compute on\nreal ICI."
            if spread else
            "CLUMPED: the all-reduces do NOT interleave with bucket "
            "compute in the emitted\norder — the bucketing placement "
            "has REGRESSED and real-ICI overlap cannot\nhappen; "
            "investigate before trusting the bucketed path.")
        f.write(
            "\n### Placement evidence (grad_buckets=4, lowered "
            "program)\n\n"
            f"In the emitted (pre-optimization) program order, the "
            f"bucketed step's all-reduces\nsit at relative positions "
            f"[{q(sorted(set(round(r, 2) for r in rel4)))}] of the "
            f"{n4}-op function that contains them\n(0 = entry, 1 = "
            f"exit) — {verdict} (On "
            "this CPU mesh the backend then sinks the sync collectives "
            "to the end\nof the schedule — collectives here are "
            "memcpys with nothing to hide — so the\ntable above bounds "
            "placement overhead; the overlap itself is a real-chip "
            "effect.)\n")
        print(f"lowered all-reduce rel positions: "
              f"{[f'{r:.2f}' for r in rel4]} -> "
              f"{'SPREAD' if spread else 'CLUMPED'}")
    print(f"appended to {path}")


if __name__ == "__main__":
    main()
