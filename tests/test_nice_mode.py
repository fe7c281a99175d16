"""NICE mode end-to-end: hierarchical feature grids, staged mapping
(middle/fine/color with per-stage lrs), occupancy rendering, overlap
keyframe selection, BA. Capability of configs/nice_slam.yaml."""

import numpy as np

from pointnerf_slam_tpu.engine import PointNeRFSLAM
from tests.test_engine import tiny_cfg


def nice_cfg(**over):
    cfg = tiny_cfg(**over)
    from pointnerf_slam_tpu.io.config import update_recursive
    update_recursive(cfg, {
        "nice": True,
        "coarse": True,
        "occupancy": True,
        "weak_depth": False,
        "grid_len": {"coarse": 1.2, "middle": 0.6, "fine": 0.4,
                     "color": 0.4, "bound_divisible": 0.4},
        "model": {"c_dim": 8, "hidden_size": 8},
        "rendering": {"N_samples": 10, "N_surface": 6, "N_importance": 0},
        "mapping": {"BA": True, "keyframe_selection_method": "overlap",
                    "iters": 30, "iters_first": 60,
                    "fix_fine": True, "fix_color": False},
        "tracking": {"gt_camera": False, "iters": 6, "lr": 2e-3,
                     "handle_dynamic": True},
    })
    return cfg


class TestGrids:
    def test_init_shapes(self):
        import jax
        from pointnerf_slam_tpu.models.grids import init_grids
        cfg = nice_cfg()
        bound = np.array(cfg["mapping"]["bound"], np.float32)
        grids = init_grids(jax.random.PRNGKey(0), cfg, bound)
        assert set(grids) == {"grid_coarse", "grid_middle", "grid_fine",
                              "grid_color"}
        # extent 4.4 / grid_len 0.4 -> 12 voxels (+1 node)
        assert grids["grid_fine"].shape == (12, 12, 12, 8)
        assert grids["grid_coarse"].shape[0] > grids["grid_middle"].shape[0] \
            or grids["grid_coarse"].shape[0] >= 4  # enlarged coarse bound
        assert float(np.abs(np.asarray(grids["grid_middle"])).mean()) < 0.05


class TestNICEEndToEnd:
    def test_runs_and_optimizes_grids(self):
        cfg = nice_cfg(data={"n_frames": 7, "orbit": 0.04})
        slam = PointNeRFSLAM(cfg)
        g0 = {k: np.asarray(v).copy() for k, v in slam.c_grid.items()}
        est, gt = slam.run()
        assert np.isfinite(est).all()
        # grids must have been optimized (middle + color at least)
        moved = {k: float(np.abs(np.asarray(slam.c_grid[k]) - g0[k]).max())
                 for k in g0}
        assert moved["grid_middle"] > 1e-5, moved
        assert moved["grid_fine"] > 1e-6, moved
        assert moved["grid_color"] > 1e-6, moved
        # coarse level is only optimized by the (dormant) coarse mapper —
        # reference parity: the main mapper never trains it
        # fix_fine=True: the fine decoder params must be untouched is hard to
        # check here (init params not kept); grid movement suffices

    def test_overlap_selection_prefers_covisible(self):
        cfg = nice_cfg(data={"n_frames": 7, "orbit": 0.04})
        slam = PointNeRFSLAM(cfg)
        # two keyframes: one at the current pose, one far away/behind
        _, color, depth, c2w = slam.frame_reader[0]
        color_u8 = (np.asarray(color) * 255).astype(np.uint8)
        far_c2w = c2w.copy()
        far_c2w[:3, 3] += 50.0  # far outside the room
        slam.keyframes.insert(0, color_u8, depth, slam._cam7(c2w),
                              slam._cam7(c2w))
        slam.keyframes.insert(1, color_u8, depth, slam._cam7(far_c2w),
                              slam._cam7(far_c2w))
        slam.keyframes.insert(2, color_u8, depth, slam._cam7(c2w),
                              slam._cam7(c2w))
        chosen = slam._overlap_select(color, depth, c2w, n_candidates=2, k=1)
        assert chosen == [0]  # covisible keyframe wins over the far one


class TestFrustumFeatureSelection:
    def test_out_of_frustum_cells_frozen(self):
        """frustum_feature_selection: grid cells outside the current frame's
        frustum must be untouched by a mapping call (reference
        Mapper.py:129-200, 395-460)."""
        import jax.numpy as jnp
        cfg = nice_cfg(data={"n_frames": 3, "orbit": 0.0})
        from pointnerf_slam_tpu.io.config import update_recursive
        update_recursive(cfg, {
            "mapping": {"frustum_feature_selection": True, "BA": False},
            "coarse": False,
            # static camera (orbit 0) + gt poses: every mapping call sees the
            # identical frustum, so the frame-0 mask is THE mask
            "tracking": {"gt_camera": True},
        })
        slam = PointNeRFSLAM(cfg)
        assert slam._use_grid_masks
        _, color, depth, gt_c2w = slam.frame_reader[0]
        slam.step(0, color, depth, gt_c2w)

        masks = slam._frustum_masks(0, jnp.asarray(depth))
        g0 = {k: np.asarray(v) for k, v in slam.c_grid.items()}
        _, color1, depth1, gt1 = slam.frame_reader[1]
        slam.step(1, color1, depth1, gt1)
        slam.step(2, *slam.frame_reader[2][1:])

        for name in ("grid_middle", "grid_fine", "grid_color"):
            m = np.asarray(masks[name])[..., 0] > 0
            delta = np.abs(np.asarray(slam.c_grid[name]) - g0[name]).max(-1)
            out_moved = float(delta[~m].max()) if (~m).any() else 0.0
            assert out_moved == 0.0, (name, out_moved)
            # camera looks at the scene: a decent share of cells is in
            # frustum, and some cells are out (mask is non-trivial)
            assert m.any() and (~m).any(), name
        # in-frustum cells did move for the trained levels
        m_mid = np.asarray(masks["grid_middle"])[..., 0] > 0
        d_mid = np.abs(np.asarray(slam.c_grid["grid_middle"])
                       - g0["grid_middle"]).max(-1)
        assert float(d_mid[m_mid].max()) > 1e-6
