"""glm-convention matrix math tests (SURVEY.md §4.1: TRS composition,
lookAtRH / perspectiveFovRH conventions, normal matrix)."""

import numpy as np
import jax.numpy as jnp

from gpupathtracer_tpu.core import mat4


def np_rot_x(deg):
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    m = np.eye(4)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def np_rot_y(deg):
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    m = np.eye(4)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


def np_rot_z(deg):
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    m = np.eye(4)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return m


def test_trs_composition_matches_glm_order():
    """Model matrix must be T @ Rx @ Ry @ Rz @ S (utilities.h:180-189)."""
    pos = (1.0, -2.0, 3.0)
    rot = (10.0, 20.0, 30.0)
    scl = (2.0, 3.0, 4.0)
    t = np.eye(4)
    t[:3, 3] = pos
    s = np.diag([*scl, 1.0])
    expected = t @ np_rot_x(rot[0]) @ np_rot_y(rot[1]) @ np_rot_z(rot[2]) @ s
    got = np.asarray(mat4.trs(pos, rot, scl))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_rotation_direction_right_handed():
    # +90deg about z maps +x to +y (right-handed, glm convention).
    m = mat4.rotate_z_deg(90.0)
    v = mat4.transform_vectors(m, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-6)


def test_look_at_rh():
    """Camera at +z origin looking down -z: view = identity rotation, -eye translation."""
    m = np.asarray(mat4.look_at_rh((0, 0, 5), (0, 0, 4), (0, 1, 0)))
    expected = np.eye(4)
    expected[2, 3] = -5.0
    np.testing.assert_allclose(m, expected, atol=1e-6)


def test_look_at_rh_general_properties():
    m = np.asarray(mat4.look_at_rh((1, 2, 3), (4, 5, 6), (0, 1, 0)))
    # Rotation block orthonormal.
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    # Eye maps to origin.
    eye_h = m @ np.asarray([1, 2, 3, 1.0])
    np.testing.assert_allclose(eye_h[:3], 0.0, atol=1e-5)
    # Forward maps to -z.
    f = np.asarray([1, 1, 1], np.float64) / np.sqrt(3)
    fv = r @ f
    np.testing.assert_allclose(fv, [0, 0, -1], atol=1e-5)


def test_perspective_fov_rh_glm_values():
    """Check against glm perspectiveFovRH closed form (NEGATIVE_ONE_TO_ONE)."""
    fov, w, h, near, far = np.deg2rad(70.0), 800.0, 800.0, 0.1, 1000.0
    m = np.asarray(mat4.perspective_fov_rh(fov, w, h, near, far))
    ct = 1.0 / np.tan(fov / 2)
    assert np.isclose(m[1, 1], ct, rtol=1e-6)
    assert np.isclose(m[0, 0], ct * h / w, rtol=1e-6)
    assert np.isclose(m[2, 2], -(far + near) / (far - near), rtol=1e-6)
    assert np.isclose(m[2, 3], -2 * far * near / (far - near), rtol=1e-4)
    assert m[3, 2] == -1.0
    assert m[3, 3] == 0.0


def test_inverse_and_normal_matrix():
    m = mat4.trs((1, 2, 3), (30, 40, 50), (2, 2, 2))
    mi = np.asarray(mat4.inverse(m))
    np.testing.assert_allclose(mi @ np.asarray(m), np.eye(4), atol=1e-4)
    nm = np.asarray(mat4.normal_matrix(m))
    np.testing.assert_allclose(nm, np.linalg.inv(np.asarray(m).T), atol=1e-5)


def test_transform_points_and_vectors():
    m = mat4.translate((1, 2, 3))
    p = mat4.transform_points(m, jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(p), [[1, 2, 3], [2, 3, 4]], atol=1e-6)
    v = mat4.transform_vectors(m, jnp.asarray([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(v), [[1, 0, 0]], atol=1e-6)
