"""UV-space / 3D geometry utilities (reference dva/geom.py parity)."""

import jax.numpy as jnp
import numpy as np

from topiaxl.render import geom


def _quad():
    # two triangles forming the unit square in xy
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    vt = v[:, :2].copy()
    return v, f, vt


def test_normals_and_tbn():
    v, f, vt = _quad()
    fn = np.asarray(geom.face_normals(jnp.asarray(v)[None], jnp.asarray(f)))
    np.testing.assert_allclose(fn[0], [[0, 0, 1], [0, 0, 1]], atol=1e-6)
    vn = np.asarray(geom.vert_normals(jnp.asarray(v), jnp.asarray(f)))
    np.testing.assert_allclose(vn, np.tile([0, 0, 1.0], (4, 1)), atol=1e-6)
    t, b, n = geom.compute_tbn(jnp.asarray(v), jnp.asarray(vt),
                               jnp.asarray(f), jnp.asarray(f))
    # uv == xy => tangent along +x, bitangent along +y
    np.testing.assert_allclose(np.asarray(t), [[1, 0, 0]] * 2, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(b)), [[0, 1, 0]] * 2,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(n), [[0, 0, 1]] * 2, atol=1e-5)


def test_axisangle_roundtrip():
    rng = np.random.default_rng(0)
    rvec = rng.standard_normal((8, 3)).astype(np.float32)
    rvec *= (rng.uniform(0.1, 3.0, (8, 1)) /
             np.linalg.norm(rvec, axis=1, keepdims=True)).astype(np.float32)
    R = np.asarray(geom.axisangle_to_matrix(jnp.asarray(rvec)))
    # orthonormal, det +1
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    axis, theta = geom.matrix_to_axisangle(jnp.asarray(R))
    back = np.asarray(axis) * np.asarray(theta)
    np.testing.assert_allclose(back, rvec, atol=1e-4)


def test_rotation_interp_endpoints_and_midpoint():
    rv = np.array([0.0, 0.0, np.pi / 2], np.float32)
    r0 = np.eye(3, dtype=np.float32)
    r1 = np.asarray(geom.axisangle_to_matrix(jnp.asarray(rv)))
    mid = np.asarray(geom.rotation_interp(jnp.asarray(r0), jnp.asarray(r1),
                                          0.5))
    expect = np.asarray(geom.axisangle_to_matrix(jnp.asarray(rv / 2)))
    np.testing.assert_allclose(mid, expect, atol=1e-5)


def test_uv_barys_sample_and_values_to_uv():
    v, f, vt = _quad()
    idx_img, bary = geom.make_uv_barys(vt, f, 32)
    covered = idx_img >= 0
    assert covered.mean() > 0.9  # the quad fills the atlas
    np.testing.assert_allclose(bary[covered].sum(-1), 1.0, atol=1e-5)

    # values_to_uv with per-vertex value = x coordinate reproduces u
    vals = jnp.asarray(v[:, :1])
    img = np.asarray(geom.values_to_uv(vals, idx_img, bary, jnp.asarray(f)))
    ys, xs = np.nonzero(covered)
    expect_u = (xs + 0.5) / 32
    np.testing.assert_allclose(img[ys, xs, 0], expect_u, atol=0.03)

    # sample_uv reads back the same field
    pts = jnp.asarray(np.random.default_rng(1).uniform(0.15, 0.85, (64, 2))
                      .astype(np.float32))
    got = np.asarray(geom.sample_uv(jnp.asarray(img), pts))
    np.testing.assert_allclose(got[:, 0], np.asarray(pts)[:, 0], atol=0.05)

    # impaint fills the few empty border texels
    filled = geom.index_image_impaint(idx_img)
    assert (filled >= 0).all()


def test_project_points_multi():
    # camera at +z looking down -z (Rt maps world -> cam)
    Rt = np.zeros((2, 3, 4), np.float32)
    Rt[:, :3, :3] = np.diag([1.0, -1.0, -1.0])  # flip y/z for cam frame
    Rt[:, 2, 3] = 5.0  # world origin at depth 5
    K = np.tile(np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]],
                         np.float32), (2, 1, 1))
    p = jnp.asarray(np.array([[[0, 0, 0], [0.5, 0, 0]]], np.float32))
    pix, depth = geom.project_points_multi(p, jnp.asarray(Rt),
                                           jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(depth), 5.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pix)[0, 0, 0], [32, 32], atol=1e-4)
    np.testing.assert_allclose(np.asarray(pix)[0, 0, 1], [42, 32], atol=1e-4)
