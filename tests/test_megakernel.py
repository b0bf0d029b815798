"""Megakernel (fused single-Pallas-kernel path) tests.

The megakernel must reproduce the jnp wavefront integrator exactly:
same RNG draw sites, same per-bounce recurrence (kernel_bvh.cl:349-384),
same accumulation — so forward radiance and every gradient matches the
brute-force oracle path to float32 tolerance. Runs in interpret mode on
CPU (tests/conftest.py forces JAX_PLATFORMS=cpu).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mini_opencl_raytracer_tpu as mrt
from mini_opencl_raytracer_tpu import grad as gradlib
from mini_opencl_raytracer_tpu.models.scene import Camera, Lights
from mini_opencl_raytracer_tpu.ops import rng
from mini_opencl_raytracer_tpu.ops.camera import generate_rays
from mini_opencl_raytracer_tpu.ops.pallas import megakernel as mk
from mini_opencl_raytracer_tpu.render import render_sample

CAM = Camera.default()


@pytest.fixture(scope="module")
def cornell():
    return mrt.cornell_scene()


def _cfg(backend, **kw):
    kw.setdefault("width", 32)
    kw.setdefault("height", 32)
    kw.setdefault("bounces", 3)
    return mrt.RenderConfig(backend=backend, **kw)


def test_forward_matches_bruteforce(cornell):
    """Full multi-bounce radiance must match the oracle path closely
    (identical math + RNG; differences are op-ordering float noise)."""
    img_b = np.asarray(render_sample(cornell, CAM, _cfg("bruteforce")))
    img_m = np.asarray(render_sample(cornell, CAM, _cfg("mega")))
    np.testing.assert_allclose(img_m, img_b, atol=2e-5, rtol=1e-4)


def test_forward_nonsquare_padding(cornell):
    """Ray counts that don't fill the last [ROWS,128] tile pad correctly."""
    cfg_b = _cfg("bruteforce", width=40, height=30, bounces=2)
    cfg_m = _cfg("mega", width=40, height=30, bounces=2)
    img_b = np.asarray(render_sample(cornell, CAM, cfg_b))
    img_m = np.asarray(render_sample(cornell, CAM, cfg_m))
    np.testing.assert_allclose(img_m, img_b, atol=2e-5, rtol=1e-4)


def test_forward_directional_and_multi_light(cornell):
    """Light-type select and the multi-light sum must match."""
    two = Lights(
        position=jnp.array([[0.0, -10.0, 16.0], [5.0, -5.0, 10.0]]),
        direction=jnp.array([[-0.5, 0.4, -0.1], [0.0, 0.3, -1.0]]),
        light_type=jnp.array([0, 1], jnp.int32),
        intensity=jnp.array([1.0, 8.0]),
        attenuation=jnp.array([0.8, 0.5]),
        cos_cutoff=jnp.array([0.9, 0.9]),
    )
    scene = cornell.replace(lights=two)
    img_b = np.asarray(render_sample(scene, CAM, _cfg("bruteforce", bounces=2)))
    img_m = np.asarray(render_sample(scene, CAM, _cfg("mega", bounces=2)))
    np.testing.assert_allclose(img_m, img_b, atol=2e-5, rtol=1e-4)


def test_ggx_specular_matches_bruteforce(cornell):
    """specular_model='ggx' (the reference's true GGX D-term,
    kernel_bvh.cl:221-225) must agree across backends and differ from
    the Blinn default."""
    kw = dict(bounces=2, specular_model="ggx", specular_prob=0.7)
    img_b = np.asarray(render_sample(cornell, CAM, _cfg("bruteforce", **kw)))
    img_m = np.asarray(render_sample(cornell, CAM, _cfg("mega", **kw)))
    np.testing.assert_allclose(img_m, img_b, atol=2e-5, rtol=1e-4)
    img_blinn = np.asarray(render_sample(
        cornell, CAM, _cfg("bruteforce", bounces=2, specular_prob=0.7)))
    assert np.abs(img_b - img_blinn).mean() > 1e-4


def test_eligibility_gate(cornell):
    assert mk.eligible(cornell, _cfg("mega"))
    assert mk.eligible(cornell, _cfg("mega", shadow_rays=True))
    assert not mk.eligible(cornell, _cfg("mega", dtype="bfloat16"))
    with pytest.raises(ValueError):
        cfg = _cfg("mega", dtype="bfloat16")
        o = jnp.zeros((4, 3))
        mk.trace_paths_mega(cornell, cfg, o, o, jnp.zeros((4,), jnp.uint32))


def test_shadow_rays_match_bruteforce(cornell):
    """In-kernel any-hit shadow passes (occluded_brute semantics) against
    the oracle, including the recorded-occlusion replay in backward."""
    cfg_b = _cfg("bruteforce", bounces=2, shadow_rays=True,
                 direct_specular=True)
    cfg_m = _cfg("mega", bounces=2, shadow_rays=True, direct_specular=True)
    img_b = np.asarray(render_sample(cornell, CAM, cfg_b))
    img_m = np.asarray(render_sample(cornell, CAM, cfg_m))
    np.testing.assert_allclose(img_m, img_b, atol=2e-5, rtol=1e-4)


def test_shadow_grads_match_bruteforce(cornell):
    """Gradients with frozen-occlusion replay vs the autodiff oracle."""
    cfg_b = _cfg("bruteforce", width=16, height=16, bounces=1,
                 shadow_rays=True)
    cfg_m = _cfg("mega", width=16, height=16, bounces=1, shadow_rays=True)
    loss = lambda img: jnp.mean(img)
    g_b = gradlib.scene_grad(cornell, CAM, cfg_b, loss)
    g_m = gradlib.scene_grad(cornell, CAM, cfg_m, loss)
    for a, b in zip(jax.tree_util.tree_leaves(g_b),
                    jax.tree_util.tree_leaves(g_m)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-4)


def test_scene_grads_match_bruteforce(cornell):
    """Custom-VJP gradients (in-kernel replay) vs the autodiff oracle
    path, for every float leaf of the scene pytree."""
    cfg_b = _cfg("bruteforce", width=16, height=16, bounces=1)
    cfg_m = _cfg("mega", width=16, height=16, bounces=1)
    loss = lambda img: jnp.mean(img)
    g_b = gradlib.scene_grad(cornell, CAM, cfg_b, loss)
    g_m = gradlib.scene_grad(cornell, CAM, cfg_m, loss)
    for a, b in zip(jax.tree_util.tree_leaves(g_b),
                    jax.tree_util.tree_leaves(g_m)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-4)


def test_bwd_residuals_match_recompute(cornell):
    """cfg.bwd_residuals=True (known-value residual replay — zero
    transcendentals/RNG in the backward kernel) must produce the same
    gradients as the default in-kernel recompute, for every float leaf,
    across both specular models and shadow rays."""
    for kw in ({}, {"specular_model": "ggx"}, {"shadow_rays": True}):
        cfg_r = _cfg("mega", width=16, height=16, bounces=2, **kw)
        cfg_s = _cfg("mega", width=16, height=16, bounces=2,
                     bwd_residuals=True, **kw)
        loss = lambda img: jnp.mean(img)
        g_r = gradlib.scene_grad(cornell, CAM, cfg_r, loss)
        g_s = gradlib.scene_grad(cornell, CAM, cfg_s, loss)
        for a, b in zip(jax.tree_util.tree_leaves(g_r),
                        jax.tree_util.tree_leaves(g_s)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            scale = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(b / scale, a / scale, atol=1e-5)


def test_camera_grads_match_bruteforce(cornell):
    """d loss / d camera chains through generate_rays via the megakernel's
    d_origin / d_direction outputs."""
    cfg_b = _cfg("bruteforce", width=16, height=16, bounces=1)
    cfg_m = _cfg("mega", width=16, height=16, bounces=1)
    loss = lambda img: jnp.mean(img)
    g_b = gradlib.camera_grad(cornell, CAM, cfg_b, loss)
    g_m = gradlib.camera_grad(cornell, CAM, cfg_m, loss)
    for a, b in zip(jax.tree_util.tree_leaves(g_b),
                    jax.tree_util.tree_leaves(g_m)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-4)


def test_multibounce_kd_grad_fd(cornell):
    """FD validation of a multi-bounce megakernel gradient (the oracle
    backward at bounces >= 2 is impractically slow on CPU, so validate
    against finite differences of the mega forward itself)."""
    cfg = _cfg("mega", width=16, height=16, bounces=2)
    R = cfg.num_pixels
    pix = jnp.arange(R, dtype=jnp.uint32)
    seeds = rng.pixel_seeds(pix, jnp.uint32(0))
    o, d = generate_rays(CAM, cfg, pix, seeds)
    base = cornell.materials.diffuse

    def f(val):
        mats = cornell.materials.replace(diffuse=base.at[0, 0].set(val))
        scene = cornell.replace(materials=mats)
        return jnp.sum(mk.trace_paths_mega(scene, cfg, o, d, seeds))

    v0 = base[0, 0]
    ad = jax.grad(f)(v0)
    eps = 1e-2
    fd = (f(v0 + eps) - f(v0 - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(ad), np.asarray(fd),
                               rtol=5e-2, atol=1e-3)


def test_mega_rng_matches_reference_sites():
    """The in-kernel counter hash (_uniform_cm over host-premixed
    counters, the draw path the kernels actually use) must equal
    ops/rng.uniform bit-for-bit."""
    seeds = jnp.arange(256, dtype=jnp.uint32) * jnp.uint32(2654435761)
    for bounce in (0, 3):
        for site in (0, 4):
            counter = int(rng.bounce_site(bounce, site))
            ref = rng.uniform(seeds, counter)
            cm = jnp.full_like(seeds, np.uint32(
                mk._premixed_counter(counter)))
            got = mk._uniform_cm(seeds, cm)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_mega_spp_and_frames_match_bruteforce(cornell):
    """Multi-spp/multi-frame accumulation through the raygen-fused
    bounce-0 kernel (per-sample frame seeds hashed in-kernel) must
    match the oracle path exactly."""
    cfg_b = _cfg("bruteforce", width=16, height=16, bounces=2, spp=2)
    cfg_m = _cfg("mega", width=16, height=16, bounces=2, spp=2)
    i_b = np.asarray(mrt.render_radiance(cornell, CAM, cfg_b, frames=2))
    i_m = np.asarray(mrt.render_radiance(cornell, CAM, cfg_m, frames=2))
    np.testing.assert_allclose(i_m, i_b, atol=2e-5, rtol=1e-4)


def test_mega_prebuilt_accel_identical(cornell):
    """The mega accel (prebuilt limb-packed M-T table) must be
    bit-identical to the per-frame build: it is a pure hoist of
    non-differentiable selection data (megakernel.build_accel)."""
    import mini_opencl_raytracer_tpu as mrt
    cam = mrt.Camera.default()
    cfg = mrt.RenderConfig(width=32, height=32, bounces=3)
    accel = mrt.build_accel(cornell, cfg)
    assert accel is not None
    a = np.asarray(mrt.render_sample(cornell, cam, cfg, frame=2))
    b = np.asarray(mrt.render_sample(cornell, cam, cfg, frame=2,
                                     accel=accel))
    np.testing.assert_array_equal(a, b)


def test_mega_approx_select_forced(cornell, monkeypatch):
    """MRT_APPROX_SELECT=force (the compiled-TPU default) under
    interpret: approximate-reciprocal selection may flip knife-edge
    winners only — the full multi-bounce image must still match the
    exact-selection oracle to a mean-based gate, because _winner_point
    recomputes (t, u, v) exactly on whichever winner was picked."""
    cfg = _cfg("mega", width=24, height=24, bounces=2, shadow_rays=True)
    img_exact = np.asarray(render_sample(cornell, CAM, cfg))
    monkeypatch.setattr(mk, "_APPROX_SELECT", "force")
    img_approx = np.asarray(render_sample(cornell, CAM, cfg))
    diff = np.abs(img_approx - img_exact)
    assert diff.mean() < 1e-4
    assert (diff > 1e-2).mean() < 0.02
