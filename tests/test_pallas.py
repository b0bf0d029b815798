"""Pallas kernel tests in interpret mode vs the jnp oracle (SURVEY.md
section 4: 'each Pallas kernel tested in interpret=True mode vs its jnp
reference')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mini_opencl_raytracer_tpu as mrt
from mini_opencl_raytracer_tpu.ops.pallas import panel


def _random_rays(n, seed=0):
    r = np.random.default_rng(seed)
    o = r.uniform([-7, -20, 1], [7, 19, 16], size=(n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _tri_t(geo, idx, o, d):
    """Scalar Moller-Trumbore t of ray (o, d) against triangle idx (numpy
    oracle for tie adjudication)."""
    v0 = np.asarray(geo.v0)[idx]
    e1 = np.asarray(geo.v1)[idx] - v0
    e2 = np.asarray(geo.v2)[idx] - v0
    p = np.cross(d, e2)
    det = float(np.dot(e1, p))
    if abs(det) < 1e-10:
        return np.inf
    tv = o - v0
    u = float(np.dot(tv, p)) / det
    q = np.cross(tv, e1)
    v = float(np.dot(d, q)) / det
    t = float(np.dot(e2, q)) / det
    if u < 0 or v < 0 or u + v > 1 or t <= 0:
        return np.inf
    return t


def test_panel_matches_bruteforce(cornell):
    geo = cornell.geometry
    tri = panel.pack_triangles(geo)
    o, d = _random_rays(2048)
    brute = mrt.intersect_brute(o, d, geo, t_max=1e5)
    ph = panel.intersect_panel(o, d, geo, tri, t_max=1e5)
    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(ph.hit))
    m = np.asarray(brute.hit)
    np.testing.assert_allclose(np.asarray(brute.t)[m], np.asarray(ph.t)[m],
                               rtol=1e-5)
    # Winner indices may legitimately differ where two triangles tie at
    # the same t (e.g. a ray hitting a shared edge); require that any
    # mismatched winner achieves the same closest t.
    ib, ip = np.asarray(brute.tri_idx), np.asarray(ph.tri_idx)
    on, dn = np.asarray(o), np.asarray(d)
    for r in np.nonzero(m & (ib != ip))[0]:
        tb = _tri_t(geo, ib[r], on[r], dn[r])
        tp = _tri_t(geo, ip[r], on[r], dn[r])
        np.testing.assert_allclose(tp, tb, rtol=1e-5,
                                   err_msg=f"ray {r}: non-tie index mismatch")


def test_panel_ragged_ray_count(cornell):
    """Ray counts that are not a multiple of the tile size are padded."""
    geo = cornell.geometry
    tri = panel.pack_triangles(geo)
    o, d = _random_rays(100, seed=5)
    brute = mrt.intersect_brute(o, d, geo, t_max=1e5)
    ph = panel.intersect_panel(o, d, geo, tri, t_max=1e5)
    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(ph.hit))


def test_panel_occlusion(cornell):
    geo = cornell.geometry
    tri = panel.pack_triangles(geo)
    o, d = _random_rays(1024, seed=2)
    limit = jnp.full((1024,), 6.0)
    brute = mrt.occluded_brute(o, d, limit, geo)
    pocc = panel.occluded_panel(o, d, limit, geo, tri)
    np.testing.assert_array_equal(np.asarray(brute), np.asarray(pocc))


def test_pallas_render_matches_oracle(cornell):
    cfg_p = mrt.RenderConfig(width=32, height=32, bounces=2,
                             backend="pallas")
    cfg_o = mrt.RenderConfig(width=32, height=32, bounces=2,
                             backend="bruteforce")
    cam = mrt.Camera.default()
    img_p = np.asarray(mrt.render_sample(cornell, cam, cfg_p))
    img_o = np.asarray(mrt.render_sample(cornell, cam, cfg_o))
    np.testing.assert_allclose(img_p, img_o, rtol=1e-4, atol=1e-4)


def _soup(n, seed=7):
    r = np.random.default_rng(seed)
    base = r.uniform([-8, 0, 0], [8, 20, 17], size=(n, 3)).astype(np.float32)
    e1 = r.normal(scale=0.8, size=(n, 3)).astype(np.float32)
    e2 = r.normal(scale=0.8, size=(n, 3)).astype(np.float32)
    return mrt.Geometry(
        v0=jnp.asarray(base), v1=jnp.asarray(base + e1),
        v2=jnp.asarray(base + e2),
        n0=jnp.zeros((n, 3)), n1=jnp.zeros((n, 3)), n2=jnp.zeros((n, 3)),
        uv0=jnp.zeros((n, 2)), uv1=jnp.zeros((n, 2)), uv2=jnp.zeros((n, 2)),
        mat_idx=jnp.zeros((n,), jnp.int32))


def test_clustered_matches_bruteforce():
    """Cluster-culled kernel (morton layout) vs oracle on a random soup
    big enough to span multiple supers."""
    from mini_opencl_raytracer_tpu.ops.pallas import clustered
    geo = _soup(3000)
    cg = clustered.build_clusters(geo)
    o, d = _random_rays(512, seed=11)
    brute = mrt.intersect_brute(o, d, geo, t_max=1e5, ray_chunk=256)
    ch = clustered.intersect_clustered(o, d, cg, t_max=1e5)
    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(ch.hit))
    m = np.asarray(brute.hit)
    # The MXU bilinear M-T's t error is absolute (~2^-24 * |o.n| / det),
    # so tiny-t hits need an atol; selection uses the same values on
    # both sides and shading recomputes t on the winner exactly.
    np.testing.assert_allclose(np.asarray(brute.t)[m], np.asarray(ch.t)[m],
                               rtol=1e-5, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(brute.tri_idx)[m],
                                  np.asarray(ch.tri_idx)[m])


def test_clustered_sah_layout_matches():
    """Same kernel with the native SAH cluster layout (skips if the C++
    builder is unavailable)."""
    from mini_opencl_raytracer_tpu import native
    from mini_opencl_raytracer_tpu.ops.pallas import clustered
    if not native.available():
        pytest.skip("native SAH builder unavailable")
    geo = _soup(3000, seed=9)
    cg = clustered.build_accel(geo)
    o, d = _random_rays(512, seed=12)
    brute = mrt.intersect_brute(o, d, geo, t_max=1e5, ray_chunk=256)
    ch = clustered.intersect_clustered(o, d, cg, t_max=1e5)
    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(ch.hit))
    m = np.asarray(brute.hit)
    np.testing.assert_allclose(np.asarray(brute.t)[m], np.asarray(ch.t)[m],
                               rtol=1e-5, atol=5e-4)


def test_clustered_occlusion():
    from mini_opencl_raytracer_tpu.ops.pallas import clustered
    geo = _soup(3000)
    cg = clustered.build_clusters(geo)
    o, d = _random_rays(256, seed=13)
    limit = jnp.full((256,), 8.0)
    brute = mrt.occluded_brute(o, d, limit, geo, ray_chunk=256)
    occ = clustered.occluded_clustered(o, d, limit, cg)
    np.testing.assert_array_equal(np.asarray(brute), np.asarray(occ))


def test_clustered_winner_rows_match_take_rows():
    """Hit.rows fetched in-traversal must equal take_rows(st, tri_idx)
    on hits and zeros on misses (ops/intersect.Hit contract)."""
    import mini_opencl_raytracer_tpu as mrt
    from mini_opencl_raytracer_tpu.models.procedural import bunny_scene
    from mini_opencl_raytracer_tpu.ops import rng
    from mini_opencl_raytracer_tpu.ops.camera import generate_rays
    from mini_opencl_raytracer_tpu.ops.pallas import clustered
    from mini_opencl_raytracer_tpu.ops.shading import (build_shading_table,
                                                       take_rows)

    scene = bunny_scene(target_tris=4000)
    cfg = mrt.RenderConfig(width=32, height=32)
    ids = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)
    seeds = rng.pixel_seeds(ids, jnp.uint32(0))
    o, d = generate_rays(mrt.Camera.default(), cfg, ids, seeds)
    cg = clustered.build_accel(scene.geometry,
                               materials=scene.materials)
    h = clustered.intersect_clustered(o, d, cg, cfg.t_max)
    assert h.rows is not None
    st = build_shading_table(scene.geometry, scene.materials)
    want = np.asarray(take_rows(st.table, h.tri_idx))
    got = np.asarray(h.rows)
    hitm = np.asarray(h.hit)
    np.testing.assert_allclose(got[hitm], want[hitm], atol=1e-6)
    np.testing.assert_array_equal(got[~hitm], 0.0)


def test_clustered_rows_gradients_match_bvh():
    """Material gradients through the in-traversal rows (custom VJP
    scatter) must match the bvh/take_rows autodiff path."""
    import mini_opencl_raytracer_tpu as mrt
    from mini_opencl_raytracer_tpu.models.procedural import bunny_scene

    scene = bunny_scene(target_tris=4000)
    cam = mrt.Camera.default()
    kw = dict(width=16, height=16, bounces=2)

    def loss(kd, backend):
        s = scene.replace(materials=scene.materials.replace(diffuse=kd))
        cfg = mrt.RenderConfig(backend=backend, **kw)
        return jnp.mean(mrt.render_sample(s, cam, cfg))

    kd = scene.materials.diffuse
    g_bvh = np.asarray(jax.grad(loss)(kd, "bvh"))
    g_cl = np.asarray(jax.grad(loss)(kd, "pallas"))
    scale = max(np.abs(g_bvh).max(), 1e-6)
    np.testing.assert_allclose(g_cl / scale, g_bvh / scale, atol=1e-4)


def test_prebuilt_accel_tracks_material_updates():
    """A prebuilt accel must keep responding to LIVE material updates:
    make_intersectors refreshes the attrs' material columns from the
    scene's current materials (ClusteredGeometry.slot_mat), so the
    documented build-once flow stays correct for material optimization
    (round-4 advisor finding)."""
    import mini_opencl_raytracer_tpu as mrt
    from mini_opencl_raytracer_tpu.models.procedural import bunny_scene

    scene = bunny_scene(target_tris=4000)
    cam = mrt.Camera.default()
    cfg = mrt.RenderConfig(width=16, height=16, bounces=2,
                           backend="pallas")
    accel = mrt.build_accel(scene, cfg)

    s2 = scene.replace(materials=scene.materials.replace(
        diffuse=scene.materials.diffuse * 0.25))
    # Ground truth: fresh accel built from the updated scene.
    want = np.asarray(mrt.render_sample(s2, cam, cfg))
    # Stale-risk path: accel built from the ORIGINAL materials.
    got = np.asarray(mrt.render_sample(s2, cam, cfg, accel=accel))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # And it must differ from the original-materials image.
    base = np.asarray(mrt.render_sample(scene, cam, cfg, accel=accel))
    assert np.abs(base - want).max() > 1e-3


def test_clustered_approx_select_forced(monkeypatch):
    """MRT_APPROX_SELECT=force path (the compiled-TPU default) under
    interpret: selection uses the ~2^-12-relative approximate
    reciprocal but the stored winner t is re-divided exactly, so t
    keeps the EXACT-path tolerances; winner indices may flip only
    between candidates tied in t to the approximation band."""
    from mini_opencl_raytracer_tpu.ops.pallas import clustered
    from mini_opencl_raytracer_tpu.ops.pallas import megakernel as mk
    monkeypatch.setattr(mk, "_APPROX_SELECT", "force")
    geo = _soup(3000, seed=21)
    cg = clustered.build_clusters(geo)
    o, d = _random_rays(512, seed=22)
    brute = mrt.intersect_brute(o, d, geo, t_max=1e5, ray_chunk=256)
    ch = clustered.intersect_clustered(o, d, cg, t_max=1e5)
    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(ch.hit))
    m = np.asarray(brute.hit)
    np.testing.assert_allclose(np.asarray(brute.t)[m], np.asarray(ch.t)[m],
                               rtol=1e-5, atol=5e-4)
    ib, ic = np.asarray(brute.tri_idx), np.asarray(ch.tri_idx)
    on, dn = np.asarray(o), np.asarray(d)
    for r in np.nonzero(m & (ib != ic))[0]:
        tb = _tri_t(geo, ib[r], on[r], dn[r])
        tc = _tri_t(geo, ic[r], on[r], dn[r])
        np.testing.assert_allclose(tc, tb, rtol=1e-3)
    # Occlusion query (same kernel, t_limit entry) under approx.
    limit = jnp.full((512,), 8.0)
    occ_b = mrt.occluded_brute(o, d, limit, geo, ray_chunk=256)
    occ_c = clustered.occluded_clustered(o, d, limit, cg)
    assert np.mean(np.asarray(occ_b) != np.asarray(occ_c)) < 0.005
