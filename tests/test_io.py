"""IO round-trip and format tests (the rebuild analog of the reference's
file-format contract, ref:doc/File-formats.md, ref:src/super4pcs/io/)."""

import numpy as np
import pytest

from super4pcs_tpu.cloud import PointCloud
from super4pcs_tpu.io import (read_object, write_object, read_ply,
                              write_ply, read_obj, write_obj, read_ptx,
                              write_matrix, format_polyworks_matrix, Mesh)


def cloud(rng, n=50, normals=True, colors=False):
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    nrm = None
    if normals:
        nrm = rng.normal(size=(n, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    rgb = None
    if colors:
        rgb = rng.integers(0, 256, (n, 3)).astype(np.float32)
    return PointCloud(pos=pos, normal=nrm, rgb=rgb)


def test_ply_roundtrip(tmp_path, rng):
    c = cloud(rng, colors=True)
    path = str(tmp_path / "c.ply")
    write_ply(path, c)
    back = read_ply(path)
    np.testing.assert_allclose(back.pos, c.pos, atol=1e-6)
    np.testing.assert_allclose(back.normal, c.normal, atol=1e-6)
    np.testing.assert_allclose(back.rgb, c.rgb, atol=1.0)


def test_obj_roundtrip_with_faces(tmp_path, rng):
    c = cloud(rng, n=12)
    tris = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    mesh = Mesh(tris=tris, tri_norm=tris)
    path = str(tmp_path / "m.obj")
    write_obj(path, c, mesh)
    back_c, back_m = read_obj(path)
    np.testing.assert_allclose(back_c.pos, c.pos, atol=1e-5)
    np.testing.assert_array_equal(back_m.tris, tris)
    # face-bound normals transfer onto the referenced vertices
    assert back_c.normal is not None
    np.testing.assert_allclose(back_c.normal[tris.reshape(-1)],
                               c.normal[tris.reshape(-1)], atol=1e-5)


def test_obj_no_faces_one_to_one_normals(tmp_path, rng):
    """Vertex/normal 1:1 binding without faces (ref:io.cc:201-205)."""
    c = cloud(rng, n=8)
    path = str(tmp_path / "nf.obj")
    write_obj(path, c, None)
    back, _ = read_obj(path)
    np.testing.assert_allclose(back.normal, c.normal, atol=1e-5)


def test_ptx_read(tmp_path, rng):
    pos = rng.uniform(-1, 1, (6, 3))
    lines = ["3", "2"] + ["0 0 0"] * 8
    for p in pos:
        lines.append(f"{p[0]} {p[1]} {p[2]} 0.5 10 20 30")
    path = tmp_path / "scan.ptx"
    path.write_text("\n".join(lines) + "\n")
    c = read_ptx(str(path))
    assert len(c) == 6
    np.testing.assert_allclose(c.pos, pos, atol=1e-5)
    np.testing.assert_allclose(c.rgb[0], [10, 20, 30])


def test_ptx_truncated_fails(tmp_path):
    path = tmp_path / "bad.ptx"
    path.write_text("\n".join(["2", "2"] + ["0 0 0"] * 8
                              + ["1 2 3 0.5"]) + "\n")
    with pytest.raises(ValueError):
        read_ptx(str(path))


def test_write_object_dispatch(tmp_path, rng):
    """Clouds go to .ply, meshes to .obj regardless of requested
    extension (ref:io.cc:273-302)."""
    c = cloud(rng)
    out = write_object(str(tmp_path / "thing.xyz"), c, None)
    assert out.endswith(".ply")
    mesh = Mesh(tris=np.array([[0, 1, 2]], np.int32))
    out = write_object(str(tmp_path / "thing2.xyz"), c, mesh)
    assert out.endswith(".obj")


def test_unsupported_extension(tmp_path):
    with pytest.raises(ValueError):
        read_object(str(tmp_path / "x.stl"))


def test_polyworks_format():
    mat = np.eye(4)
    mat[0, 3] = -2.5
    text = format_polyworks_matrix(mat)
    lines = text.splitlines()
    assert lines[0] == "VERSION\t=\t1"
    assert lines[1] == "MATRIX\t="
    assert lines[2].split()[-1] == "-2.500000"
    # positives carry the leading-space padding
    assert lines[2].startswith(" 1.000000")


def test_native_parser_parity(tmp_path, rng):
    """The C++ parser and the numpy parser must produce identical
    clouds/meshes (skipped when no toolchain can build the library)."""
    import super4pcs_tpu.io.native as native_mod
    from super4pcs_tpu.io import obj as obj_mod
    from super4pcs_tpu.io import ply as ply_mod
    if native_mod.get_lib() is None:
        pytest.skip("native library unavailable")

    c = cloud(rng, n=40, colors=True)
    tris = np.array([[0, 1, 2], [5, 6, 7]], np.int32)
    mesh = Mesh(tris=tris, tri_norm=tris)
    obj_path = str(tmp_path / "m.obj")
    write_obj(obj_path, c, mesh)
    ply_path = str(tmp_path / "c.ply")
    write_ply(ply_path, c)

    c_native, m_native = obj_mod.read_obj(obj_path)
    p_native = ply_mod.read_ply(ply_path)

    import os
    os.environ["SUPER4PCS_TPU_NO_NATIVE"] = "1"
    native_mod._LIB, native_mod._TRIED = None, False
    try:
        c_py, m_py = obj_mod.read_obj(obj_path)
        p_py = ply_mod.read_ply(ply_path)
    finally:
        del os.environ["SUPER4PCS_TPU_NO_NATIVE"]
        native_mod._LIB, native_mod._TRIED = None, False

    np.testing.assert_allclose(c_native.pos, c_py.pos)
    np.testing.assert_allclose(c_native.normal, c_py.normal)
    np.testing.assert_array_equal(m_native.tris, m_py.tris)
    np.testing.assert_allclose(p_native.pos, p_py.pos)
    np.testing.assert_allclose(p_native.rgb, p_py.rgb)


def test_obj_negative_indices(tmp_path):
    """Relative (negative) face indices resolve against the running
    vertex count — identically in both parser tiers."""
    import super4pcs_tpu.io.native as native_mod
    from super4pcs_tpu.io import obj as obj_mod
    import os
    path = tmp_path / "neg.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "f -3 -2 -1\n"
        "v 2 2 2\nv 3 2 2\nv 2 3 2\n"
        "f -3 -2 -1\n")
    expected = np.array([[0, 1, 2], [3, 4, 5]], np.int32)

    # python fallback
    os.environ["SUPER4PCS_TPU_NO_NATIVE"] = "1"
    native_mod._LIB, native_mod._TRIED = None, False
    try:
        _, mesh_py = obj_mod.read_obj(str(path))
    finally:
        del os.environ["SUPER4PCS_TPU_NO_NATIVE"]
        native_mod._LIB, native_mod._TRIED = None, False
    np.testing.assert_array_equal(mesh_py.tris, expected)

    if native_mod.get_lib() is not None:
        _, mesh_nat = obj_mod.read_obj(str(path))
        np.testing.assert_array_equal(mesh_nat.tris, expected)


def test_ply_truncated_body_rejected(tmp_path):
    """A PLY whose body is shorter than the declared vertex count must
    fail loudly in both parser tiers, never yield phantom points."""
    import super4pcs_tpu.io.native as native_mod
    from super4pcs_tpu.io import ply as ply_mod
    import os
    path = tmp_path / "trunc.ply"
    path.write_text(
        "ply\nformat ascii 1.0\nelement vertex 10\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n"
        "0 0 0\n1 1 1\n2 2 2\n")

    if native_mod.get_lib() is not None:
        assert native_mod.native_parse_ply(str(path)) is None

    os.environ["SUPER4PCS_TPU_NO_NATIVE"] = "1"
    native_mod._LIB, native_mod._TRIED = None, False
    try:
        with pytest.raises(ValueError):
            ply_mod.read_ply(str(path))
    finally:
        del os.environ["SUPER4PCS_TPU_NO_NATIVE"]
        native_mod._LIB, native_mod._TRIED = None, False


def test_ply_pre_vertex_element_ascii(tmp_path):
    """An element (e.g. camera) declared before the vertex element must
    not be misread as vertex data — ascii rows are skipped (both the
    native parser, which bails to this fallback, and the numpy path)."""
    path = tmp_path / "cam.ply"
    path.write_text(
        "ply\nformat ascii 1.0\n"
        "element camera 1\n"
        "property float view_px\nproperty float view_py\n"
        "property float view_pz\n"
        "element vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n"
        "9 9 9\n"            # camera row: must be skipped
        "0 0 0\n1 0 0\n0 1 0\n")
    c = read_ply(str(path))
    np.testing.assert_allclose(
        c.pos, [[0, 0, 0], [1, 0, 0], [0, 1, 0]], atol=0)


def test_ply_pre_vertex_element_binary(tmp_path):
    path = tmp_path / "camb.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        "element camera 1\n"
        "property float view_px\nproperty float view_py\n"
        "element vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n")
    cam = np.asarray([9.0, 9.0], "<f4").tobytes()
    verts = np.asarray([[1, 2, 3], [4, 5, 6]], "<f4").tobytes()
    path.write_bytes(header.encode() + cam + verts)
    c = read_ply(str(path))
    np.testing.assert_allclose(c.pos, [[1, 2, 3], [4, 5, 6]], atol=0)


def test_obj_mixed_face_normal_indices(tmp_path):
    """Faces without a normal index must not bind vn[0] to their
    vertices (round-1 advisor finding: the absent-index 0 was clamped
    to vn[0])."""
    path = tmp_path / "mixed.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\nv 1 1 0\nv 1 0 1\n"
        "vn 1 0 0\nvn 0 1 0\nvn 0 0 1\n"
        "f 1//1 2//2 3//3\n"
        "f 4 5 6\n")          # no normal indices: vertices 4-6 unset
    c, _ = read_obj(str(path))
    np.testing.assert_allclose(c.normal[0], [1, 0, 0], atol=0)
    np.testing.assert_allclose(c.normal[1], [0, 1, 0], atol=0)
    np.testing.assert_allclose(c.normal[2], [0, 0, 1], atol=0)
    # faces without normal indices leave their vertices' normals zero,
    # NOT bound to vn[0]
    np.testing.assert_allclose(c.normal[3:], np.zeros((3, 3)), atol=0)
