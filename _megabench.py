import time, sys
def log(*a):
    print(*a, flush=True)
log("start")
import jax, jax.numpy as jnp
log("jax imported, backend:", jax.default_backend())
from mini_opencl_raytracer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
log("cache enabled")
import mini_opencl_raytracer_tpu as mrt
from mini_opencl_raytracer_tpu import grad as gradlib
log("mrt imported")

scene = mrt.cornell_scene()
cam = mrt.Camera.default()
W, H, B = 1920, 1080, 9
cfg = mrt.RenderConfig(width=W, height=H, bounces=B, backend="mega")
log("scene built")

fwd = jax.jit(lambda s: mrt.render_sample(s, cam, cfg))
t0 = time.perf_counter()
img = fwd(scene); jax.block_until_ready(img)
log("fwd compile+run", time.perf_counter()-t0, "mean", float(img.mean()))
t0 = time.perf_counter()
for _ in range(5): img = fwd(scene)
jax.block_until_ready(img)
dt = (time.perf_counter()-t0)/5
log(f"fwd {dt*1e3:.2f} ms  {W*H*B/dt/1e6:.1f} Mrays/s")

def loss(s): return jnp.mean(mrt.render_sample(s, cam, cfg))
step = jax.jit(lambda s: gradlib.grad_float_leaves(loss, s))
t0 = time.perf_counter()
g = step(scene); jax.block_until_ready(g)
log("fwd+bwd compile+run", time.perf_counter()-t0)
t0 = time.perf_counter()
for _ in range(5): g = step(scene)
jax.block_until_ready(g)
dt = (time.perf_counter()-t0)/5
log(f"fwd+bwd {dt*1e3:.2f} ms  {W*H*B/dt/1e6:.1f} Mrays/s  vs_baseline {W*H*B/dt/1e9:.3f}")
log("kd grad max", float(jnp.abs(g.materials.diffuse).max()))
