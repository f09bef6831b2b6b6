"""Camera ray generation vs a closed-form numpy replication of the
reference's NDC conventions (kernel.cu:197-205) — SURVEY.md §4.1."""

import numpy as np

from gpupathtracer_tpu.models.camera import Camera, camera_basis, generate_rays


def np_reference_rays(pos, yaw, pitch, world_up, fov_deg, w, h, near, far):
    """Independent numpy implementation of kernel.cu:197-205 + glm matrices."""
    yaw_r, pitch_r = np.deg2rad(yaw), np.deg2rad(pitch)
    front = np.asarray(
        [np.cos(yaw_r) * np.cos(pitch_r), np.sin(pitch_r), np.sin(yaw_r) * np.cos(pitch_r)]
    )
    forward = front / np.linalg.norm(front)
    right = np.cross(forward, world_up)
    right /= np.linalg.norm(right)
    up = np.cross(right, forward)
    up /= np.linalg.norm(up)

    # lookAtRH
    view = np.eye(4)
    view[0, :3], view[1, :3], view[2, :3] = right, up, -forward
    view[0, 3] = -right @ pos
    view[1, 3] = -up @ pos
    view[2, 3] = forward @ pos

    fov = np.deg2rad(fov_deg)
    ct = 1 / np.tan(fov / 2)
    proj = np.zeros((4, 4))
    proj[0, 0] = ct * h / w
    proj[1, 1] = ct
    proj[2, 2] = -(far + near) / (far - near)
    proj[2, 3] = -2 * far * near / (far - near)
    proj[3, 2] = -1

    inv = np.linalg.inv(view) @ np.linalg.inv(proj)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = (xs / w) * 2 - 1
    py = 1 - (ys / h) * 2
    clip = np.stack([px, py, np.ones_like(px), np.ones_like(px)], -1) * far
    look = clip.reshape(-1, 4) @ inv.T
    d = look[:, :3] - pos
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return d


def test_rays_match_reference_formula():
    cam = Camera.create(width=16, height=16)
    o, d = generate_rays(cam)
    d_ref = np_reference_rays(
        np.asarray([0.0, 0.0, 15.0]), -90.0, 0.0, np.asarray([0.0, 1.0, 0.0]),
        70.0, 16, 16, 0.1, 1000.0,
    )
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o), np.tile([0, 0, 15.0], (256, 1)), atol=1e-6)


def test_default_basis():
    """yaw=-90, pitch=0 → forward = -z (reference default, kernel.cu:320-322)."""
    cam = Camera.create()
    f, r, u = camera_basis(cam)
    np.testing.assert_allclose(np.asarray(f), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(u), [0, 1, 0], atol=1e-6)


def test_ray_directions_forward_hemisphere():
    cam = Camera.create(width=8, height=8, fov_deg=70.0)
    _, d = generate_rays(cam)
    # All rays should point into the forward (-z) hemisphere.
    assert (np.asarray(d)[:, 2] < 0).all()


def test_jitter_shifts_rays():
    import jax.numpy as jnp

    cam = Camera.create(width=4, height=4)
    _, d0 = generate_rays(cam)
    _, d1 = generate_rays(cam, jitter_uv=jnp.full((16, 2), 0.5))
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    # Half-pixel jitter of pixel (0,0) equals the center between pixels.
    assert np.isfinite(np.asarray(d1)).all()
