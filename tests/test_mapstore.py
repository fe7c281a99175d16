"""Map bookkeeping + projection search + rotation histogram + dyn config
tests (pyslam capability layer)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf_slam_tpu.frontend.mapstore import (Map, MapPoint, KeyFrame,
                                                  KeyFrameGraph)
from pointnerf_slam_tpu.frontend.search import (
    search_frame_by_projection, search_frame_for_triangulation,
    propagate_map_point_matches, search_and_fuse)
from pointnerf_slam_tpu.frontend.rotation_histogram import \
    filter_matches_with_histogram_orientation
from pointnerf_slam_tpu.frontend.dyn_config import (SLAMDynamicConfig,
                                                    descriptor_sigma_mad)
from pointnerf_slam_tpu.utils import Timer, TimerFps, MovingAverage, Printer


def make_kf(frame_idx, n=50, seed=0, Tcw=None):
    rng = np.random.default_rng(seed)
    kps = rng.uniform(0, 100, (n, 2))
    desc = rng.normal(size=(n, 16))
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return KeyFrame(frame_idx, kps, desc, np.ones(n, bool),
                    np.eye(4) if Tcw is None else Tcw)


class TestMapStore:
    def test_observations_and_covisibility(self):
        m = Map()
        kf1 = make_kf(0, seed=1)
        kf2 = make_kf(5, seed=2)
        m.add_keyframe(kf1)
        pts = np.random.default_rng(0).uniform(-1, 1, (20, 3)) + [0, 0, 5]
        n = m.add_points(pts, np.ones(20, bool), kf2, kf1,
                         np.arange(20), np.arange(20))
        assert n == 20
        m.add_keyframe(kf2)
        assert kf2.id in m.graph.covisibility[kf1.id] or \
            kf1.id in m.graph.covisibility[kf2.id]
        cov = m.graph.get_covisible(kf2)
        assert kf1 in cov
        assert m.graph.parent[kf2.id] == kf1.id

    def test_best_descriptor_update(self):
        mp = MapPoint(np.zeros(3))
        kfs = [make_kf(i, seed=i + 10) for i in range(4)]
        base = np.zeros(16)
        base[0] = 1.0
        descs = [base, base.copy(), np.roll(base, 1)]
        for kf, d, i in zip(kfs, descs, range(3)):
            mp.add_observation(kf, i, d)
        # best descriptor = min median distance to the others -> the
        # duplicated one
        np.testing.assert_allclose(mp.des, descs[0])

    def test_cull_points(self):
        m = Map()
        kf = make_kf(0, n=4, seed=3)
        kf.kps = np.array([[0.0, 0.0]] * 4)  # normalized obs at origin
        m.add_keyframe(kf)
        good = MapPoint([0, 0, 5.0])
        good.add_observation(kf, 0, kf.desc[0])
        bad = MapPoint([3.0, 3.0, 5.0])  # projects far from (0,0)
        bad.add_observation(kf, 1, kf.desc[1])
        m.points = [good, bad]
        removed = m.cull_points(max_reproj_err_n=0.01)
        assert removed == 1
        assert good in m.points and bad.is_bad


class TestSearch:
    def test_projection_match_recovers_identity(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform([-1, -1, 4], [1, 1, 8], (30, 3))
        fx = fy = 100.0
        cx = cy = 50.0
        pc = pts  # Tcw = I
        u = pc[:, 0] / pc[:, 2] * fx + cx
        v = pc[:, 1] / pc[:, 2] * fy + cy
        kps = np.stack([u, v], -1)
        desc = rng.normal(size=(30, 16))
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        kp_idx, ok = search_frame_by_projection(
            jnp.asarray(pts, jnp.float32), jnp.asarray(desc, jnp.float32),
            jnp.ones(30, bool), jnp.eye(4), jnp.asarray(kps, jnp.float32),
            jnp.asarray(desc, jnp.float32), jnp.ones(30, bool),
            fx, fy, cx, cy, radius_px=5.0, max_desc_dist=0.3)
        assert bool(jnp.all(ok))
        np.testing.assert_array_equal(np.asarray(kp_idx), np.arange(30))

    def test_epipolar_search(self):
        from tests.test_frontend import make_two_view
        kpn_ref, kpn_cur, Trc, _, _ = make_two_view(n=40)
        R, t = Trc[:3, :3], Trc[:3, 3]
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                       [-t[1], t[0], 0]])
        E = tx @ R  # x_ref^T E x_cur = 0
        rng = np.random.default_rng(1)
        desc = rng.normal(size=(40, 16))
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        idx2, ok = search_frame_for_triangulation(
            jnp.asarray(kpn_cur), jnp.asarray(desc, jnp.float32),
            jnp.ones(40, bool), jnp.asarray(kpn_ref),
            jnp.asarray(desc, jnp.float32), jnp.ones(40, bool),
            jnp.asarray(E, jnp.float32))
        assert float(ok.mean()) > 0.9
        np.testing.assert_array_equal(np.asarray(idx2)[np.asarray(ok)],
                                      np.flatnonzero(np.asarray(ok)))

    def test_propagate(self):
        has_pt = jnp.asarray([True, False, True, False])
        idx_ref = jnp.asarray([2, 0, 1, 3])
        idx_cur = jnp.asarray([0, 1, 2, 3])
        valid = jnp.asarray([True, True, True, False])
        src, ok = propagate_map_point_matches(has_pt, idx_ref, idx_cur,
                                              valid)
        np.testing.assert_array_equal(np.asarray(ok),
                                      [True, True, False, False])
        assert int(src[0]) == 2 and int(src[1]) == 0

    def test_search_and_fuse(self):
        m = Map()
        rng = np.random.default_rng(0)
        fx = fy = 100.0
        cx = cy = 50.0
        pts = rng.uniform([-1, -1, 4], [1, 1, 8], (10, 3))
        u = pts[:, 0] / pts[:, 2] * fx + cx
        v = pts[:, 1] / pts[:, 2] * fy + cy
        desc = rng.normal(size=(10, 16))
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        kf = KeyFrame(0, np.stack([u, v], -1), desc, np.ones(10, bool),
                      np.eye(4))
        kf0 = make_kf(1, n=10, seed=5)
        for i in range(10):
            mp = MapPoint(pts[i])
            mp.add_observation(kf0, i, desc[i])
            m.points.append(mp)
        fused = search_and_fuse(m, kf, fx, fy, cx, cy, radius_px=3.0,
                                max_desc_dist=0.3)
        assert fused == 10
        assert all(kf.points[i] is not None for i in range(10))


class TestRotationHistogram:
    def test_consistent_rotation_survives(self):
        rng = np.random.default_rng(0)
        n = 100
        a_ref = rng.uniform(0, 2 * np.pi, n)
        a_cur = a_ref + 0.3  # consistent delta
        bad = rng.choice(n, 15, replace=False)
        a_cur[bad] = rng.uniform(0, 2 * np.pi, 15)
        ok = filter_matches_with_histogram_orientation(
            jnp.asarray(a_ref, jnp.float32), jnp.asarray(a_cur, jnp.float32),
            jnp.ones(n, bool))
        ok = np.asarray(ok)
        good = np.setdiff1d(np.arange(n), bad)
        assert ok[good].mean() > 0.95
        # reference keeps the top-3 bins unconditionally, so outliers that
        # land in the 2nd/3rd most-populated bin survive
        assert ok[bad].mean() < 0.8
        assert ok[bad].mean() < ok[good].mean()


class TestDynConfigAndUtils:
    def test_sigma_mad(self):
        d = np.array([1.0, 1.1, 0.9, 1.0, 5.0])
        s = descriptor_sigma_mad(d)
        assert 0 < s < 1.0  # robust to the outlier

    def test_ewma_updates(self):
        c = SLAMDynamicConfig()
        d0 = c.max_descriptor_distance
        c.update_descriptor_stat(np.full(100, 0.2))
        assert c.max_descriptor_distance < d0

    def test_timers(self):
        t = Timer("t")
        t.pause()
        e1 = t.elapsed()
        t.resume()
        assert t.elapsed() >= e1
        fps = TimerFps("f", average_width=3)
        for _ in range(3):
            fps.refresh()
        assert fps._avg.average() > 0
        ma = MovingAverage(2)
        ma.add(1.0)
        assert ma.add(3.0) == 2.0
        Printer.green("printer ok")
