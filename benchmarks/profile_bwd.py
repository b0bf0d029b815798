"""Backward-kernel microprofile: isolate the fused-bounce backward
kernel's device time from the rest of the differentiable step.

Times, on the headline workload (1080p Cornell, 9 bounces, mega
backend):
  1. forward-only render_sample                       (the fwd chain)
  2. jit(grad) full step                              (fwd + bwd chain)
  3. _run_bounce_fwd alone x bounces                  (fwd kernel only)
  4. _run_bounce_bwd alone x bounces                  (bwd kernel only)

(3)/(4) run the kernels directly on synthetic ray state so the numbers
exclude scan/residual-stacking/grad-unpack overhead at the XLA level.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..'))
import time

import jax
import jax.numpy as jnp


def timeit(fn, iters=5):
    fn()  # compile + warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from mini_opencl_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import mini_opencl_raytracer_tpu as mrt
    from mini_opencl_raytracer_tpu import grad as gradlib
    from mini_opencl_raytracer_tpu.ops.pallas import megakernel as mk

    W, H, B = 1920, 1080, 9
    scene = mrt.cornell_scene()
    camera = mrt.Camera.default()
    cfg = mrt.RenderConfig(width=W, height=H, bounces=B, backend="auto")

    # 1. forward only
    fwd = jax.jit(lambda s: mrt.render_sample(s, camera, cfg))
    t_fwd = timeit(lambda: fwd(scene))
    print(f"forward-only render_sample: {t_fwd*1e3:8.2f} ms")

    # 2. full step
    def loss(s):
        return jnp.mean(mrt.render_sample(s, camera, cfg))
    step = jax.jit(lambda s: gradlib.grad_float_leaves(loss, s))
    t_step = timeit(lambda: step(scene))
    print(f"fwd+bwd step:               {t_step*1e3:8.2f} ms  "
          f"({W*H*B/t_step/1e6:.1f} Mrays/s)")

    # 3/4. kernels alone on synthetic state
    R = W * H
    n_rows = -(-R // mk._LANES)
    n_rows = -(-n_rows // mk._ROWS) * mk._ROWS
    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (3, n_rows, mk._LANES), jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(1),
                          (3, n_rows, mk._LANES), jnp.float32)
    beta = jnp.ones((3, n_rows, mk._LANES), jnp.float32)
    aliveF = jnp.ones((n_rows, mk._LANES), jnp.float32)
    seeds = jnp.arange(n_rows * mk._LANES, dtype=jnp.uint32).reshape(
        n_rows, mk._LANES)
    cms = mk._bounce_cms(0)
    tableT = mk.build_mega_table(scene.geometry, scene.materials)
    lv = mk.pack_lights(scene.lights)
    mt = mk.build_mt_table(scene.geometry)
    idx = jnp.zeros((n_rows, mk._LANES), jnp.int32)
    occ = jnp.zeros((n_rows, mk._LANES), jnp.int32)
    cot = (o, d, beta, o)

    @jax.jit
    def fwd_kernels(o, d, beta, aliveF):
        out = o
        for _ in range(B):
            no, nd, nbeta, naf, rad, i, oc = mk._run_bounce_fwd(
                tableT, lv, mt, o, d, beta, aliveF, seeds, cms, cfg)
            out = out + rad
            o, d, beta, aliveF = no, nd, nbeta, naf
        return out
    t_f = timeit(lambda: fwd_kernels(o, d, beta, aliveF))
    print(f"fwd kernel x{B}:             {t_f*1e3:8.2f} ms "
          f"({t_f*1e3/B:.2f} ms/bounce)")

    @jax.jit
    def fwd_resid_kernels(o, d, beta, aliveF):
        out = o
        for _ in range(B):
            no, nd, nbeta, naf, rad, i, oc, rs = mk._run_bounce_fwd(
                tableT, lv, mt, o, d, beta, aliveF, seeds, cms, cfg,
                save_resid=True)
            out = out + rad
            o, d, beta, aliveF = no, nd, nbeta, naf
        return out, rs
    t_fr = timeit(lambda: fwd_resid_kernels(o, d, beta, aliveF))
    print(f"fwd+resid kernel x{B}:       {t_fr*1e3:8.2f} ms "
          f"({t_fr*1e3/B:.2f} ms/bounce)")

    n_res = mk._num_resid_rows(cfg, lv.shape[0])
    resid = (jnp.full((n_res, n_rows, mk._LANES), 0.5, jnp.float32)
             if cfg.bwd_residuals else None)

    @jax.jit
    def bwd_kernels(o, d, beta, aliveF):
        acc = o
        for _ in range(B):
            d_o, d_d, d_beta, d_tab, d_lv = mk._run_bounce_bwd(
                tableT, lv, o, d, beta, aliveF, seeds, idx, occ, cms,
                resid, cot, cfg)
            acc = acc + d_o
            o, d, beta = d_o, d_d, d_beta
        return acc, d_tab, d_lv
    t_b = timeit(lambda: bwd_kernels(o, d, beta, aliveF))
    print(f"bwd kernel x{B}:             {t_b*1e3:8.2f} ms "
          f"({t_b*1e3/B:.2f} ms/bounce)")

    print(f"unaccounted (step - fwdk+resid - bwdk): "
          f"{(t_step - t_fr - t_b)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
