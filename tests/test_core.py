"""Unit tests for the L1 math core against closed-form / independently
derived numpy values (SURVEY.md §4: quat<->rot round trips, ray gen vs
intrinsics, compositing vs hand-computed alphas, sample_pdf CDF property)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf_slam_tpu.core import (
    quat_to_rot, rot_to_quat, camera_from_tensor, tensor_from_camera,
    to_homogeneous, inv_T, pose_rt,
    ray_dirs_from_uv, rays_from_uv, get_rays,
    sample_uv_uniform, sample_uv_valid, gather_pixels,
    raw2outputs, sample_pdf, stratified_zvals, surface_zvals, ray_far_bound,
    normalize_3d_coordinate,
)


def rotmat_from_axis_angle(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


class TestSE3:
    def test_quat_identity(self):
        R = quat_to_rot(jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_quat_90z(self):
        # 90 deg about z: q = (cos45, 0, 0, sin45)
        q = jnp.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
        R = quat_to_rot(q)
        expect = rotmat_from_axis_angle([0, 0, 1], np.pi / 2)
        np.testing.assert_allclose(R, expect, atol=1e-6)

    def test_quat_non_unit_invariance(self):
        q = jnp.array([0.3, -0.5, 0.7, 0.1])
        np.testing.assert_allclose(
            quat_to_rot(q), quat_to_rot(3.7 * q), atol=1e-5)

    def test_round_trip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            axis = rng.normal(size=3)
            angle = rng.uniform(-np.pi, np.pi)
            R = rotmat_from_axis_angle(axis, angle).astype(np.float32)
            q = rot_to_quat(jnp.asarray(R))
            R2 = quat_to_rot(q)
            np.testing.assert_allclose(R2, R, atol=1e-5)
            assert float(q[0]) >= 0

    def test_rot_to_quat_near_pi(self):
        # 180-degree rotations stress the trace-based branch
        for axis in ([1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]):
            R = rotmat_from_axis_angle(axis, np.pi).astype(np.float32)
            q = rot_to_quat(jnp.asarray(R))
            np.testing.assert_allclose(quat_to_rot(q), R, atol=1e-5)

    def test_camera_tensor_round_trip(self):
        rng = np.random.default_rng(1)
        R = rotmat_from_axis_angle(rng.normal(size=3), 0.7)
        t = rng.normal(size=3)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        cam = tensor_from_camera(jnp.asarray(T, dtype=jnp.float32))
        T2 = camera_from_tensor(cam)
        np.testing.assert_allclose(T2, T[:3], atol=1e-5)

    def test_inv_T(self):
        rng = np.random.default_rng(2)
        R = rotmat_from_axis_angle(rng.normal(size=3), 1.2)
        t = rng.normal(size=3)
        T = pose_rt(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
        np.testing.assert_allclose(inv_T(T) @ T, np.eye(4), atol=1e-5)

    def test_batched(self):
        q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (5, 1))
        assert quat_to_rot(q).shape == (5, 3, 3)
        cams = jnp.tile(jnp.array([1.0, 0, 0, 0, 1, 2, 3]), (5, 1))
        assert camera_from_tensor(cams).shape == (5, 3, 4)


class TestRays:
    H, W = 8, 10
    fx, fy, cx, cy = 5.0, 5.0, 4.5, 3.5

    def test_dirs_center_pixel(self):
        d = ray_dirs_from_uv(jnp.array(4.5), jnp.array(3.5),
                             self.fx, self.fy, self.cx, self.cy)
        np.testing.assert_allclose(d, [0, 0, -1], atol=1e-7)

    def test_dirs_convention(self):
        # +i (right in image) -> +x ; +j (down in image) -> -y ; forward -> -z
        d = ray_dirs_from_uv(jnp.array(9.5), jnp.array(8.5),
                             self.fx, self.fy, self.cx, self.cy)
        np.testing.assert_allclose(d, [1.0, -1.0, -1.0], atol=1e-6)

    def test_identity_pose_full_image(self):
        c2w = jnp.eye(4)
        rays_o, rays_d = get_rays(self.H, self.W, self.fx, self.fy,
                                  self.cx, self.cy, c2w)
        assert rays_o.shape == (self.H, self.W, 3)
        np.testing.assert_allclose(rays_o, 0.0, atol=1e-7)
        np.testing.assert_allclose(
            rays_d[3, 4], [(4 - self.cx) / self.fx, -(3 - self.cy) / self.fy, -1],
            atol=1e-6)

    def test_rotated_pose(self):
        R = rotmat_from_axis_angle([0, 1, 0], 0.3).astype(np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = R
        c2w[:3, 3] = [1, 2, 3]
        o, d = rays_from_uv(jnp.array(2.0), jnp.array(5.0),
                            jnp.asarray(c2w), self.fx, self.fy, self.cx, self.cy)
        local = np.array([(2 - self.cx) / self.fx, -(5 - self.cy) / self.fy, -1])
        np.testing.assert_allclose(d, R @ local, atol=1e-6)
        np.testing.assert_allclose(o, [1, 2, 3], atol=1e-6)

    def test_sample_uniform_bounds(self):
        idx = sample_uv_uniform(jax.random.PRNGKey(0), self.W, 2, 6, 1, 9, 500)
        jj = idx // self.W
        ii = idx % self.W
        assert int(jj.min()) >= 2 and int(jj.max()) < 6
        assert int(ii.min()) >= 1 and int(ii.max()) < 9

    def test_sample_valid_only_hits_valid(self):
        mask = np.zeros((self.H, self.W), bool)
        mask[2, 3] = mask[5, 7] = True
        idx, n_valid = sample_uv_valid(jax.random.PRNGKey(1),
                                       jnp.asarray(mask), 64)
        assert int(n_valid) == 2
        flat_ok = {2 * self.W + 3, 5 * self.W + 7}
        assert set(np.asarray(idx).tolist()) <= flat_ok

    def test_sample_valid_uniform_and_fallback(self):
        # uniformity: with-replacement draws hit each valid pixel with
        # ~equal frequency (guards the CDF+searchsorted implementation
        # against off-by-one rank bugs — e.g. side='left' would starve the
        # first valid pixel entirely)
        mask = np.zeros((self.H, self.W), bool)
        valid = [(1, 2), (3, 4), (6, 1), (7, 8)]
        for r, c in valid:
            mask[r, c] = True
        idx, n_valid = sample_uv_valid(jax.random.PRNGKey(3),
                                       jnp.asarray(mask), 4000)
        assert int(n_valid) == 4
        counts = np.bincount(np.asarray(idx), minlength=self.H * self.W)
        flat = [r * self.W + c for r, c in valid]
        assert counts.sum() == 4000 and counts[flat].sum() == 4000
        assert counts[flat].min() > 800  # expect ~1000; binomial 3s ~ 41
        # nothing valid -> uniform over all pixels, finite, in range
        idx2, nv2 = sample_uv_valid(jax.random.PRNGKey(4),
                                    jnp.zeros((self.H, self.W), bool), 256)
        assert int(nv2) == 0
        a2 = np.asarray(idx2)
        assert a2.min() >= 0 and a2.max() < self.H * self.W

    def test_gather_pixels(self):
        depth = jnp.arange(self.H * self.W, dtype=jnp.float32).reshape(self.H, self.W)
        color = jnp.stack([depth, depth + 1, depth + 2], -1)
        ii, jj, d, c = gather_pixels(jnp.array([13, 77]), self.W, depth, color)
        np.testing.assert_allclose(d, [13, 77])
        np.testing.assert_allclose(ii, [13 % self.W, 77 % self.W])
        np.testing.assert_allclose(jj, [13 // self.W, 77 // self.W])
        np.testing.assert_allclose(c[:, 1], [14, 78])


class TestCompositing:
    def test_single_opaque_sample(self):
        # One very dense sample at z=2 -> depth=2, color = that sample's rgb
        z = jnp.array([[1.0, 2.0, 3.0]])
        raw = jnp.array([[[0.0, 0, 0, 0], [0.9, 0.1, 0.2, 1e8], [0, 0, 1, 0]]])
        rays_d = jnp.array([[0.0, 0.0, -1.0]])
        depth, var, rgb, w = raw2outputs(raw, z, rays_d)
        np.testing.assert_allclose(depth, [2.0], atol=1e-5)
        np.testing.assert_allclose(rgb, [[0.9, 0.1, 0.2]], atol=1e-5)
        np.testing.assert_allclose(var, [0.0], atol=1e-6)

    def test_hand_computed_density(self):
        # Two samples, unit-norm ray. dists = [1, 1e10].
        z = jnp.array([[1.0, 2.0]])
        sigma = np.array([0.5, 0.25])
        raw = jnp.array([[[1.0, 0, 0, sigma[0]], [0, 1, 0, sigma[1]]]])
        rays_d = jnp.array([[0.0, 0.0, 1.0]])
        depth, var, rgb, w = raw2outputs(raw, z, rays_d)
        a0 = 1 - np.exp(-0.5 * 1.0)
        a1 = 1 - np.exp(-0.25 * 1e10)  # == 1
        w0 = a0
        w1 = a1 * (1 - a0 + 1e-10)
        np.testing.assert_allclose(w[0], [w0, w1], rtol=1e-5)
        np.testing.assert_allclose(depth, [w0 * 1 + w1 * 2], rtol=1e-5)
        np.testing.assert_allclose(rgb[0], [w0, w1, 0], rtol=1e-5)

    def test_ray_norm_scales_dists(self):
        z = jnp.array([[1.0, 2.0]])
        raw = jnp.array([[[1.0, 0, 0, 0.5], [0, 1, 0, 0.5]]])
        d1 = jnp.array([[0.0, 0.0, 1.0]])
        d2 = jnp.array([[0.0, 0.0, 2.0]])
        _, _, _, w1 = raw2outputs(raw, z, d1)
        _, _, _, w2 = raw2outputs(raw, z, d2)
        np.testing.assert_allclose(
            w2[0, 0], 1 - np.exp(-0.5 * 2.0), rtol=1e-5)
        assert w2[0, 0] > w1[0, 0]

    def test_occupancy_mode(self):
        z = jnp.array([[1.0, 2.0]])
        raw = jnp.array([[[1.0, 0, 0, 0.3], [0, 1, 0, -0.3]]])
        rays_d = jnp.array([[0.0, 0.0, 1.0]])
        _, _, _, w = raw2outputs(raw, z, rays_d, occupancy=True)
        a0 = 1 / (1 + np.exp(-3.0))
        np.testing.assert_allclose(w[0, 0], a0, rtol=1e-5)


class TestSampling:
    def test_far_bound_axis_aligned(self):
        bound = jnp.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        far = ray_far_bound(o, d, bound)
        np.testing.assert_allclose(far, [1.01], atol=1e-6)

    def test_far_bound_diagonal(self):
        bound = jnp.array([[-1.0, 1.0], [-2.0, 2.0], [-1.0, 1.0]])
        o = jnp.zeros((1, 3))
        d = jnp.array([[1.0, 1.0, 0.0]])
        far = ray_far_bound(o, d, bound)
        np.testing.assert_allclose(far, [1.01], atol=1e-6)  # x slab exits first

    def test_stratified_endpoints(self):
        z = stratified_zvals(None, jnp.array([[0.5]]), jnp.array([[2.5]]), 5)
        np.testing.assert_allclose(z[0], [0.5, 1.0, 1.5, 2.0, 2.5], atol=1e-6)

    def test_stratified_perturb_stays_in_intervals(self):
        key = jax.random.PRNGKey(0)
        z = stratified_zvals(key, jnp.array([[0.0]]), jnp.array([[1.0]]), 16,
                             perturb=1.0)
        assert float(z.min()) >= 0.0 and float(z.max()) <= 1.0
        assert bool(jnp.all(jnp.diff(z[0]) > -1e-6))

    def test_surface_band(self):
        d = jnp.array([2.0, 0.0])
        z = surface_zvals(d, 4)
        np.testing.assert_allclose(z[0], [1.9, 1.9 + 0.2 / 3, 1.9 + 0.4 / 3, 2.1],
                                   atol=1e-5)
        # zero-depth ray: 0.001 .. max depth
        np.testing.assert_allclose(z[1, 0], 0.001, atol=1e-6)
        np.testing.assert_allclose(z[1, -1], 2.0, atol=1e-6)

    def test_sample_pdf_det_uniform_weights(self):
        bins = jnp.linspace(0, 1, 11)[None].repeat(2, 0)   # (2, 11)
        w = jnp.ones((2, 10))
        s = sample_pdf(None, bins, w, 5, det=True)
        # uniform weights -> inverse CDF is ~identity on [0, 1]
        np.testing.assert_allclose(s[0], [0.0, 0.25, 0.5, 0.75, 1.0], atol=0.02)

    def test_sample_pdf_concentrates(self):
        bins = jnp.linspace(0, 1, 11)[None]
        w = jnp.zeros((1, 10)).at[0, 7].set(100.0)
        s = sample_pdf(jax.random.PRNGKey(0), bins, w, 64)
        frac_in_bin = float(jnp.mean((s >= 0.7) & (s <= 0.8)))
        assert frac_in_bin > 0.9

    def test_sample_pdf_monotone_det(self):
        bins = jnp.linspace(0, 2, 9)[None]
        w = jax.random.uniform(jax.random.PRNGKey(3), (1, 8))
        s = sample_pdf(None, bins, w, 16, det=True)
        assert bool(jnp.all(jnp.diff(s[0]) >= -1e-6))


class TestCoords:
    def test_normalize(self):
        bound = jnp.array([[0.0, 2.0], [-1.0, 1.0], [10.0, 20.0]])
        p = jnp.array([[0.0, -1.0, 10.0], [2.0, 1.0, 20.0], [1.0, 0.0, 15.0]])
        out = normalize_3d_coordinate(p, bound)
        np.testing.assert_allclose(out[0], [-1, -1, -1], atol=1e-6)
        np.testing.assert_allclose(out[1], [1, 1, 1], atol=1e-6)
        np.testing.assert_allclose(out[2], [0, 0, 0], atol=1e-6)


class TestDifferentiability:
    def test_pose_gradient_flows_to_camera_tensor(self):
        """Gradient of a rendered-point loss must reach the quat+t leaf —
        this is the tracking path's core requirement."""
        cam = jnp.array([1.0, 0.0, 0.0, 0.0, 0.1, 0.2, 0.3])

        def loss(cam):
            c2w = camera_from_tensor(cam)
            o, d = rays_from_uv(jnp.array(3.0), jnp.array(2.0), c2w,
                                5.0, 5.0, 4.5, 3.5)
            pts = o + d * 1.7
            return jnp.sum(pts ** 2)

        g = jax.grad(loss)(cam)
        assert jnp.all(jnp.isfinite(g))
        assert float(jnp.abs(g).sum()) > 0


class TestSE3NumpyTwins:
    def test_numpy_matches_jax(self):
        from pointnerf_slam_tpu.core.se3_np import (
            quat_to_rot_np, rot_to_quat_np, camera_from_tensor_np,
            tensor_from_camera_np, to_homogeneous_np)
        rng = np.random.default_rng(0)
        for _ in range(10):
            q = rng.normal(size=4).astype(np.float32)
            np.testing.assert_allclose(quat_to_rot_np(q),
                                       quat_to_rot(jnp.asarray(q)), atol=1e-6)
            R = rotmat_from_axis_angle(rng.normal(size=3),
                                       rng.uniform(-3, 3)).astype(np.float32)
            np.testing.assert_allclose(rot_to_quat_np(R),
                                       rot_to_quat(jnp.asarray(R)), atol=1e-5)
            cam = rng.normal(size=7).astype(np.float32)
            cam[:4] /= np.linalg.norm(cam[:4])
            np.testing.assert_allclose(
                camera_from_tensor_np(cam),
                camera_from_tensor(jnp.asarray(cam)), atol=1e-6)
            T = to_homogeneous_np(camera_from_tensor_np(cam))
            np.testing.assert_allclose(
                tensor_from_camera_np(T),
                tensor_from_camera(jnp.asarray(T)), atol=1e-5)
