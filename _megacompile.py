import time, sys
def log(*a): print(*a, flush=True)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 9
W = int(sys.argv[2]) if len(sys.argv) > 2 else 128
H = int(sys.argv[3]) if len(sys.argv) > 3 else 8
import jax, jax.numpy as jnp
import mini_opencl_raytracer_tpu as mrt
from mini_opencl_raytracer_tpu.ops.pallas import megakernel as mk
from mini_opencl_raytracer_tpu.ops import rng
from mini_opencl_raytracer_tpu.ops.camera import generate_rays
log("imported, backend:", jax.default_backend(), "B", B, "W", W, "H", H)
scene = mrt.cornell_scene()
cam = mrt.Camera.default()
cfg = mrt.RenderConfig(width=W, height=H, bounces=B, backend="mega")
R = cfg.num_pixels
pix = jnp.arange(R, dtype=jnp.uint32)
seeds = rng.pixel_seeds(pix, jnp.uint32(0))
o, d = generate_rays(cam, cfg, pix, seeds)
t0 = time.perf_counter()
f = jax.jit(lambda o, d, s: mk.trace_paths_mega(scene, cfg, o, d, s))
rad = f(o, d, seeds)
jax.block_until_ready(rad)
log("fwd compile+run", time.perf_counter()-t0, "mean", float(rad.mean()))
t0 = time.perf_counter()
for _ in range(5):
    rad = f(o, d, seeds)
jax.block_until_ready(rad)
dt = (time.perf_counter()-t0)/5
log(f"fwd {dt*1e3:.2f} ms {R*B/dt/1e6:.1f} Mrays/s")
