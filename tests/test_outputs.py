"""Mesher (native marching tetrahedra), BVH ray-caster, PLY IO, checkpoint
logger, and eval-tool tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf_slam_tpu.outputs.mesher import (marching_tets, write_ply,
                                               read_ply, vertex_normals,
                                               filter_mesh, Mesher)
from pointnerf_slam_tpu.outputs.logger import Logger, load_checkpoint
from pointnerf_slam_tpu.tools.eval_ate import align_horn, evaluate_ate
from pointnerf_slam_tpu.tools.eval_recon import (sample_mesh_surface,
                                                 icp_align, calc_3d_metric,
                                                 calc_2d_metric)
from pointnerf_slam_tpu.tools.raycast import MeshRaycaster


def sphere_grid(n=40, r=12.0):
    ax = np.arange(n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    c = (n - 1) / 2
    return np.sqrt((gx - c) ** 2 + (gy - c) ** 2 + (gz - c) ** 2), c, r


class TestMarchingTets:
    def test_sphere_geometry(self):
        grid, c, r = sphere_grid()
        verts, tris = marching_tets(grid, r)
        assert len(verts) > 1000
        rad = np.linalg.norm(verts - c, axis=1)
        assert float(np.abs(rad - r).max()) < 0.05
        a, b, cc = (verts[tris[:, i]] for i in range(3))
        area = 0.5 * np.linalg.norm(np.cross(b - a, cc - a), axis=1).sum()
        assert abs(area - 4 * np.pi * r * r) / (4 * np.pi * r * r) < 0.02

    def test_empty_when_no_crossing(self):
        verts, tris = marching_tets(np.ones((8, 8, 8), np.float32), 5.0)
        assert len(verts) == 0 and len(tris) == 0

    def test_mesh_is_connected_watertightish(self):
        grid, c, r = sphere_grid(24, 7.0)
        verts, tris = marching_tets(grid, r)
        # every edge shared by exactly 2 faces on a closed surface
        edges = {}
        for t in tris:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edges[k] = edges.get(k, 0) + 1
        counts = np.array(list(edges.values()))
        assert (counts == 2).mean() > 0.99


class TestPLY:
    def test_round_trip(self, tmp_path):
        grid, c, r = sphere_grid(16, 5.0)
        verts, tris = marching_tets(grid, r)
        colors = np.random.randint(0, 255, (len(verts), 3), np.uint8)
        p = str(tmp_path / "m.ply")
        write_ply(p, verts, tris, colors)
        v, t, col = read_ply(p)
        np.testing.assert_allclose(v, verts, atol=1e-6)
        assert (t == tris).all() and (col == colors).all()


class TestRaycaster:
    def test_sphere_depths(self):
        grid, c, r = sphere_grid(40, 12.0)
        verts, tris = marching_tets(grid, r)
        rc = MeshRaycaster(verts, tris)
        # rays from outside toward the center hit at distance dist-r
        eye = np.array([c - 30.0, c, c])
        o = np.tile(eye, (3, 1)).astype(np.float32)
        d = np.array([[1.0, 0, 0], [1.0, 0.02, 0], [0, 0, 1.0]], np.float32)
        t = rc.cast(o, d)
        assert abs(t[0] - (30.0 - r)) < 0.1
        assert t[1] > 0  # slightly off-axis still hits
        assert t[2] == -1.0  # parallel ray misses

    def test_miss_returns_negative(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        tris = np.array([[0, 1, 2]], np.int64)
        rc = MeshRaycaster(verts, tris)
        t = rc.cast(np.array([[0.2, 0.2, -1.0]], np.float32),
                    np.array([[0.0, 0.0, 1.0]], np.float32))
        assert abs(t[0] - 1.0) < 1e-5
        t2 = rc.cast(np.array([[5.0, 5.0, -1.0]], np.float32),
                     np.array([[0.0, 0.0, 1.0]], np.float32))
        assert t2[0] == -1.0


class TestEvalATE:
    def test_horn_alignment_exact(self):
        rng = np.random.default_rng(0)
        from tests.test_core import rotmat_from_axis_angle
        R = rotmat_from_axis_angle(rng.normal(size=3), 0.8)
        t = rng.normal(size=3)
        model = rng.normal(size=(3, 50))
        data = R @ model + t[:, None]
        rot, trans, err = align_horn(model, data)
        np.testing.assert_allclose(rot, R, atol=1e-8)
        assert err.max() < 1e-8

    def test_evaluate_ate_stats(self):
        n = 20
        gt = np.tile(np.eye(4), (n, 1, 1))
        gt[:, :3, 3] = np.random.default_rng(1).normal(size=(n, 3))
        est = gt.copy()
        est[:, 0, 3] += 0.05  # uniform offset is absorbed by alignment
        stats = evaluate_ate(gt, est)
        assert stats["compared_pose_pairs"] == n
        assert stats["absolute_translational_error.rmse"] < 1e-6


class TestEvalRecon:
    def test_3d_metrics_identical_mesh(self, tmp_path):
        grid, c, r = sphere_grid(32, 9.0)
        verts, tris = marching_tets(grid, r)
        p = str(tmp_path / "a.ply")
        write_ply(p, verts, tris)
        out = calc_3d_metric(p, p, n_samples=5000, align=False)
        assert out["accuracy"] < 0.5  # cm-scale sampling noise only
        assert out["completion ratio"] > 99.0

    def test_3d_metrics_detect_deficit(self, tmp_path):
        grid, c, r = sphere_grid(32, 9.0)
        verts, tris = marching_tets(grid, r)
        pa = str(tmp_path / "full.ply")
        write_ply(pa, verts, tris)
        # half sphere: cut z > c
        keep = verts[:, 2] <= c
        v2, t2 = filter_mesh(verts, tris, keep)
        pb = str(tmp_path / "half.ply")
        write_ply(pb, v2, t2)
        out = calc_3d_metric(pb, pa, n_samples=5000, align=False)
        # completion suffers (gt regions unexplained); accuracy stays good
        assert out["completion"] > out["accuracy"]
        assert out["completion ratio"] < 80.0

    def test_icp_recovers_offset(self):
        rng = np.random.default_rng(2)
        pts = rng.normal(size=(2000, 3))
        T = icp_align(pts + [0.1, -0.05, 0.02], pts, iters=20)
        np.testing.assert_allclose(T[:3, 3], [-0.1, 0.05, -0.02], atol=0.02)

    def test_2d_depth_l1_identical(self, tmp_path):
        grid, c, r = sphere_grid(32, 9.0)
        verts, tris = marching_tets(grid, r)
        p = str(tmp_path / "a.ply")
        write_ply(p, verts, tris)
        out = calc_2d_metric(p, p, n_imgs=3, H=60, W=80, fx=40.0)
        assert out["n_views"] >= 1
        assert out["depth l1"] < 1e-3

    def test_2d_unseen_region_view_rejection(self, tmp_path):
        """Reference parity (eval_recon.py:158-175): a view is redrawn
        while ANY unseen-gt point projects into it; with a point cloud
        covering every direction no view survives, and reject_unseen=False
        bypasses the loop."""
        grid, c, r = sphere_grid(32, 9.0)
        verts, tris = marching_tets(grid, r)
        p = str(tmp_path / "a.ply")
        write_ply(p, verts, tris)
        rng = np.random.default_rng(3)
        dirs = rng.normal(size=(500, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        surround = (c + 100.0 * dirs).astype(np.float32)
        out = calc_2d_metric(p, p, n_imgs=2, H=24, W=32, fx=16.0,
                             unseen_pc=surround)
        assert out["n_views"] == 0
        out2 = calc_2d_metric(p, p, n_imgs=2, H=24, W=32, fx=16.0,
                              unseen_pc=surround, reject_unseen=False)
        assert out2["n_views"] == 2
        assert out2["depth l1"] < 1e-3


class TestLoggerRoundTrip:
    def test_checkpoint_round_trip(self, tmp_path):
        from tests.test_engine import tiny_cfg
        from pointnerf_slam_tpu.engine import PointNeRFSLAM
        cfg = tiny_cfg(tracking={"gt_camera": True},
                       data={"n_frames": 3, "output": str(tmp_path)},
                       mapping={"iters_first": 5, "iters": 3,
                                "ckpt_freq": 2})
        slam = PointNeRFSLAM(cfg)
        slam.logger = Logger(str(tmp_path), 2, slam.n_img)
        slam.run()
        slam.logger.log(slam, 2)
        params, est, gt, kfs, idx = load_checkpoint(
            str(tmp_path / "ckpts" / "00002.npz"), slam.params)
        assert idx == 2
        np.testing.assert_allclose(est, slam.estimate_c2w_list)
        leaves_a = jax.tree_util.tree_leaves(params)
        leaves_b = jax.tree_util.tree_leaves(slam.params)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_allclose(a, b)


class TestAsyncMeshing:
    def test_incremental_job_snapshot_matches_sync(self, tmp_path):
        """maybe_mesh schedules an incremental MeshJob instead of building
        inline (VERDICT r2 #2: meshing off the critical path); the job runs
        from a state snapshot, so mutating the live system mid-build does
        not change the result, which must equal the synchronous build."""
        import jax.numpy as jnp
        from tests.test_engine import tiny_cfg
        from pointnerf_slam_tpu.engine import PointNeRFSLAM, KeyframeBuffer
        from pointnerf_slam_tpu.io.synthetic import SyntheticScene
        from pointnerf_slam_tpu.outputs.mesher import read_ply
        import pointnerf_slam_tpu.render.renderer as R

        cfg = tiny_cfg(tracking={"gt_camera": True},
                       meshing={"resolution": 24, "level_set": 30,
                                "color_mesh_extraction_method":
                                    "direct_point_query",
                                "chunks_per_frame": 2},
                       mapping={"mesh_freq": 2, "every_frame": 2},
                       data={"output": str(tmp_path)})
        slam = PointNeRFSLAM(cfg)
        for idx in (0, 4, 8):
            _, color, depth, gt = slam.frame_reader[idx]
            slam.estimate_c2w_list[idx] = gt
            slam._maybe_insert_keyframe(idx, color, depth, gt)

        sc = SyntheticScene()

        def analytic_eval(params, model_cfg, pts, bound, c_grid=None,
                          stage="color"):
            box_sdf = jnp.full(pts.shape[:-1], 1e9)  # scene v3: all boxes
            for lo, hi in sc.boxes:
                sdf = jnp.max(jnp.maximum(jnp.asarray(lo) - pts,
                                          pts - jnp.asarray(hi)), -1)
                box_sdf = jnp.minimum(box_sdf, sdf)
            room_sdf = sc.room_half - jnp.max(jnp.abs(pts), -1)
            sigma = 60.0 * (jax.nn.sigmoid(-box_sdf * 40)
                            + jax.nn.sigmoid(-room_sdf * 40))
            rgb = jnp.clip(pts * 0.2 + 0.5, 0, 1)
            raw = jnp.concatenate([rgb, sigma[..., None]], -1)
            inside = jnp.all((pts > bound[:, 0]) & (pts < bound[:, 1]), -1)
            return raw.at[..., 3].set(jnp.where(inside, raw[..., 3], 100.0))

        orig = R.eval_points
        R.eval_points = analytic_eval
        try:
            mesher = Mesher(cfg, slam, points_batch_size=8192)
            # reference result: synchronous build from the current state
            sync = mesher.get_mesh(slam, str(tmp_path / "sync.ply"))
            assert sync is not None

            mesher.maybe_mesh(slam, 2)  # mesh frame -> schedules async job
            assert mesher._job is not None, "job should not finish inline"

            # corrupt the LIVE state: the job must not observe this
            slam.keyframes = KeyframeBuffer(4, slam.H, slam.W)
            slam.estimate_c2w_list[:] = 0

            for idx in range(3, 40):
                mesher.maybe_mesh(slam, idx if idx % 2 else idx + 1)
                if mesher._job is None:
                    break
            mesher.flush(slam)
        finally:
            R.eval_points = orig

        va, _, _ = read_ply(str(tmp_path / "sync.ply"))
        vb, _, _ = read_ply(str(tmp_path / "mesh" / "00002_mesh.ply"))
        np.testing.assert_allclose(va, vb, atol=1e-6)


class TestMesherEndToEnd:
    def test_mesh_pipeline_on_analytic_field(self, tmp_path):
        """Full mesher pipeline (grid eval -> native marching tets ->
        frustum+TSDF-hull cleaning -> coloring -> PLY) against the smooth
        analytic room field, so geometry is exact and independent of
        training budgets."""
        import jax.numpy as jnp
        from tests.test_engine import tiny_cfg
        from pointnerf_slam_tpu.engine import PointNeRFSLAM
        from pointnerf_slam_tpu.io.synthetic import SyntheticScene
        import pointnerf_slam_tpu.render.renderer as R

        cfg = tiny_cfg(tracking={"gt_camera": True},
                       meshing={"resolution": 48, "level_set": 30,
                                "color_mesh_extraction_method":
                                    "direct_point_query"},
                       data={"output": str(tmp_path)})
        slam = PointNeRFSLAM(cfg)
        # keyframes with gt poses (for seen-mask + TSDF hull)
        for idx in (0, 4, 8):
            _, color, depth, gt = slam.frame_reader[idx]
            slam.estimate_c2w_list[idx] = gt
            slam._maybe_insert_keyframe(idx, color, depth, gt)

        sc = SyntheticScene()

        def analytic_eval(params, model_cfg, pts, bound, c_grid=None,
                          stage="color"):
            box_sdf = jnp.full(pts.shape[:-1], 1e9)  # scene v3: all boxes
            for lo, hi in sc.boxes:
                sdf = jnp.max(jnp.maximum(jnp.asarray(lo) - pts,
                                          pts - jnp.asarray(hi)), -1)
                box_sdf = jnp.minimum(box_sdf, sdf)
            room_sdf = sc.room_half - jnp.max(jnp.abs(pts), -1)
            sigma = 60.0 * (jax.nn.sigmoid(-box_sdf * 40)
                            + jax.nn.sigmoid(-room_sdf * 40))
            rgb = jnp.clip(pts * 0.2 + 0.5, 0, 1)
            raw = jnp.concatenate([rgb, sigma[..., None]], -1)
            inside = jnp.all((pts > bound[:, 0]) & (pts < bound[:, 1]), -1)
            return raw.at[..., 3].set(jnp.where(inside, raw[..., 3], 100.0))

        orig = R.eval_points
        R.eval_points = analytic_eval
        try:
            mesher = Mesher(cfg, slam, points_batch_size=65536)
            out = mesher.get_mesh(slam, str(tmp_path / "mesh.ply"))
        finally:
            R.eval_points = orig
        assert out is not None
        verts, tris, colors = out
        assert len(verts) > 500
        assert os.path.exists(tmp_path / "mesh.ply")
        # vertices on real geometry: room walls (|max coord| ~ 2) or any
        # furniture box (scene v3)
        near = np.abs(2.0 - np.abs(verts).max(axis=1))
        for lo, hi in sc.boxes:
            d_box = np.abs(np.maximum(np.asarray(lo) - verts,
                                      verts - np.asarray(hi)).max(axis=1))
            near = np.minimum(near, d_box)
        assert float(np.median(near)) < 0.1, float(np.median(near))
        # the out-of-bound sentinel shell (at the enlarged bound) must have
        # been culled by the TSDF hull
        assert float(np.abs(verts).max()) < 2.15


class TestPointMasks:
    """Seen/forecast/unseen frustum masks (reference Mesher.py:53-212)."""

    def _slam(self, depth_fill=3.0, n_kf=1):
        from types import SimpleNamespace
        from pointnerf_slam_tpu.engine.state import KeyframeBuffer
        H, W = 24, 32
        buf = KeyframeBuffer(8, H, W)
        for k in range(n_kf):
            cam = np.array([1.0, 0, 0, 0, 0, 0, 0], np.float32)
            buf.insert(k, np.zeros((H, W, 3), np.uint8),
                       np.full((H, W), depth_fill, np.float32), cam, cam)
        est = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
        return SimpleNamespace(keyframes=buf, H=H, W=W, fx=20.0, fy=20.0,
                               cx=15.5, cy=11.5, estimate_c2w_list=est)

    def _mesher(self, **over):
        import copy
        from pointnerf_slam_tpu.io.config import DEFAULT_CONFIG, \
            update_recursive
        cfg = copy.deepcopy(DEFAULT_CONFIG)
        update_recursive(cfg, {"meshing": over})
        return Mesher(cfg, None, points_batch_size=4096)

    def test_seen_forecast_unseen_split(self):
        slam = self._slam(depth_fill=3.0)
        m = self._mesher()
        pts = np.array([
            [0.0, 0.0, -2.0],    # center of frustum, proj 2 < 3.3 -> seen
            [0.0, 0.0, 2.0],     # behind the camera -> unseen
            [3.0, 0.0, -2.0],    # u = cx + 20*3/2 = 45 > W, < W+1000 -> forecast
            [0.0, 0.0, -5.0],    # in image, proj 5 > 3.3 -> fails depth -> unseen
            [300.0, 0.0, -2.0],  # u ~ 3015 > W + 1000 -> unseen
        ], np.float32)
        seen, forecast, unseen = m.point_masks(slam, pts)
        np.testing.assert_array_equal(seen, [True, False, False, False,
                                             False])
        np.testing.assert_array_equal(forecast, [False, False, True, False,
                                                 False])
        np.testing.assert_array_equal(
            unseen, ~(seen | forecast))
        assert unseen[1] and unseen[3] and unseen[4]

    def test_depth_test_band(self):
        slam = self._slam(depth_fill=2.0)
        m = self._mesher(depth_test=True)
        pts = np.array([
            [0.0, 0.0, -2.1],   # |2.1 - 2.0| < 2.4 -> seen
            [0.0, 0.0, -4.6],   # |4.6 - 2.0| = 2.6 > 2.4 -> not seen
        ], np.float32)
        seen, forecast, unseen = m.point_masks(slam, pts)
        assert seen[0] and not seen[1]
        # 4.6 > max sampled depth 2.0 -> fails the forecast gate too
        assert unseen[1]

    def test_use_all_frames_no_depth_constraint(self):
        slam = self._slam(depth_fill=0.5)
        m = self._mesher()
        # identity pose at estimate_c2w_list[0]; depth never constrains
        pts = np.array([[0.0, 0.0, -50.0]], np.float32)
        seen, forecast, unseen = m.point_masks(slam, pts,
                                               use_all_frames=True,
                                               cur_idx=0)
        assert seen[0]
        # keyframe path WOULD reject it (0.5 * 1.1 max depth)
        seen_kf, _, _ = m.point_masks(slam, pts)
        assert not seen_kf[0]


class TestMeshCleanup:
    def _two_spheres(self):
        """One big + one small sphere in a single grid -> 2 components."""
        n = 48
        ax = np.arange(n, dtype=np.float32)
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        d1 = np.sqrt((gx - 14) ** 2 + (gy - 24) ** 2 + (gz - 24) ** 2)
        d2 = np.sqrt((gx - 38) ** 2 + (gy - 24) ** 2 + (gz - 24) ** 2)
        grid = np.minimum(d1 - 10.0, d2 - 3.0)  # sdf-ish, level 0
        return marching_tets(grid, 0.0)

    def test_largest_component(self):
        from pointnerf_slam_tpu.outputs.mesher import clean_components
        verts, tris = self._two_spheres()
        v2, t2 = clean_components(verts, tris, get_largest=True,
                                  area_threshold=0.0)
        assert len(t2) < len(tris)
        # everything kept is on the big sphere (center x=14)
        assert np.abs(np.linalg.norm(
            v2 - np.array([14, 24, 24]), axis=1) - 10.0).max() < 0.5

    def test_small_component_threshold(self):
        from pointnerf_slam_tpu.outputs.mesher import clean_components, \
            face_areas
        verts, tris = self._two_spheres()
        small_area = 4 * np.pi * 3.0 ** 2
        # threshold between the small and big sphere areas
        v2, t2 = clean_components(verts, tris, get_largest=False,
                                  area_threshold=small_area * 2)
        assert np.abs(np.linalg.norm(
            v2 - np.array([14, 24, 24]), axis=1) - 10.0).max() < 0.5
        # tiny threshold keeps both
        v3, t3 = clean_components(verts, tris, get_largest=False,
                                  area_threshold=1e-6)
        assert len(t3) == len(tris)

    def test_cull_faces_partial_seen_survives(self):
        from pointnerf_slam_tpu.outputs.mesher import cull_faces
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                         np.float32)
        tris = np.array([[0, 1, 3], [1, 3, 2]], np.int64)
        # drop verts 1 and 3: both faces keep a seen vertex -> both survive
        drop = np.array([False, True, False, True])
        v2, t2 = cull_faces(verts, tris, drop)
        assert len(t2) == 2
        # drop 0,1,3: face (0,1,3) is all-dropped -> culled; (1,3,2) keeps
        # its seen vertex 2 -> survives (reference all(axis=1) semantics)
        drop_all = np.array([True, True, False, True])
        v3, t3 = cull_faces(verts, tris, drop_all)
        assert len(t3) == 1
        v4, t4 = cull_faces(verts, tris, np.ones(4, bool))
        assert len(t4) == 0


class TestAttachOutputs:
    def test_full_output_stack_writes_artifacts(self, tmp_path):
        """attach_outputs wires logger + mesher + all visualizers; a short
        engine run must produce checkpoints, mapping/trajectory/loss
        artifacts (the offline stand-ins for the reference's interactive
        viewer windows)."""
        from tests.test_engine import tiny_cfg
        from pointnerf_slam_tpu.engine import PointNeRFSLAM
        from pointnerf_slam_tpu.outputs import attach_outputs

        cfg = tiny_cfg(
            data={"output": str(tmp_path), "n_frames": 7},
            mapping={"vis_freq": 3, "ckpt_freq": 1, "mesh_freq": 10_000},
            tracking={"vis_freq": 3, "gt_camera": True},
            meshing={"eval_rec": False},
        )
        slam = PointNeRFSLAM(cfg)
        slam.mesher = None          # meshing covered elsewhere; keep fast
        attach_outputs(slam)
        slam.mesher = None
        slam.run()
        assert any((tmp_path / "ckpts").iterdir())
        assert (tmp_path / "traj_vis" / "00003.png").exists()
        assert (tmp_path / "loss_vis" / "loss_curves.png").exists()
        assert any((tmp_path / "mapping_vis").iterdir())
