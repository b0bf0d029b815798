"""OBJ/MTL loader unit tests (SURVEY.md section 4: 'OBJ/MTL parse counts +
material table vs known cornell values')."""

import os

import numpy as np
import pytest

import mini_opencl_raytracer_tpu as mrt


@pytest.fixture(scope="module")
def cornell_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("cornell_obj")
    return mrt.write_cornell_obj(str(d))


def test_mtl_parse(cornell_files):
    _, mtl_path = cornell_files
    names, mats = mrt.load_mtl(mtl_path)
    assert names == mrt.CORNELL_MATERIAL_NAMES
    assert len(names) == 6
    np.testing.assert_allclose(mats["BloodyRed"]["diffuse"],
                               [0.445, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(mats["Light"]["emission"],
                               [1.0, 1.0, 1.0], atol=1e-6)
    assert mats["LargerBox"]["roughness"] == pytest.approx(9999.0)
    assert mats["Material"]["ior"] == pytest.approx(1.0)


def test_obj_roundtrip_matches_procedural(cornell_files):
    obj_path, _ = cornell_files
    geo, mats, names = mrt.load_obj(obj_path)
    ref = mrt.cornell_geometry()
    assert geo.num_triangles == ref.num_triangles
    np.testing.assert_allclose(np.asarray(geo.v0), np.asarray(ref.v0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(geo.v1), np.asarray(ref.v1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(geo.v2), np.asarray(ref.v2),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(geo.mat_idx),
                                  np.asarray(ref.mat_idx))
    # Normals: OBJ stores one normal per corner; the procedural builder
    # uses flat face normals, so they should match exactly.
    np.testing.assert_allclose(np.asarray(geo.n0), np.asarray(ref.n0),
                               atol=1e-5)


def test_fan_triangulation(tmp_path):
    """A pentagon face must fan into 3 triangles (reference fan:
    CLOBJloader.cpp:101-126)."""
    obj = tmp_path / "pent.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0.5 1.5 0\nv 0 1 0\n"
        "f 1 2 3 4 5\n")
    geo, _, _ = mrt.load_obj(str(obj))
    assert geo.num_triangles == 3
    # All fan triangles share corner 0.
    np.testing.assert_allclose(np.asarray(geo.v0),
                               np.zeros((3, 3)), atol=1e-6)


def test_missing_normals_get_face_normal(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    geo, _, _ = mrt.load_obj(str(obj))
    np.testing.assert_allclose(np.asarray(geo.n0), [[0, 0, 1]], atol=1e-6)


def test_negative_indices(tmp_path):
    obj = tmp_path / "neg.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    geo, _, _ = mrt.load_obj(str(obj))
    assert geo.num_triangles == 1
    np.testing.assert_allclose(np.asarray(geo.v1), [[1, 0, 0]], atol=1e-6)


def test_native_parser_matches_python(cornell_files):
    """The C++ OBJ parser must produce the same buffers as the Python
    parser (skips without a compiler)."""
    from mini_opencl_raytracer_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    obj_path, _ = cornell_files
    res = native.parse_obj_native(obj_path)
    assert res is not None
    v, n, uv, mat, names = res
    geo, _, pynames = mrt.load_obj(obj_path)
    assert v.shape[1] == geo.num_triangles
    np.testing.assert_allclose(v[0], np.asarray(geo.v0), atol=1e-5)
    np.testing.assert_allclose(v[1], np.asarray(geo.v1), atol=1e-5)
    np.testing.assert_allclose(v[2], np.asarray(geo.v2), atol=1e-5)
    np.testing.assert_allclose(n[0], np.asarray(geo.n0), atol=1e-5)
    np.testing.assert_allclose(uv[2], np.asarray(geo.uv2), atol=1e-5)
    # usemtl appearance order matches the MTL-declared order for cornell.
    np.testing.assert_array_equal(mat, np.asarray(geo.mat_idx))
