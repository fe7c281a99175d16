"""NMS zoo tests (utils_features filter-family capability)."""

import numpy as np

from pointnerf_slam_tpu.frontend.nms import (grid_nms, kdt_nms, ssc_nms,
                                             octree_nms)


def cloud(n=300, seed=0, H=100, W=100):
    rng = np.random.default_rng(seed)
    kps = rng.uniform(0, [W, H], (n, 2))
    scores = rng.uniform(0, 1, n)
    return kps, scores, np.ones(n, bool), H, W


class TestNMS:
    def test_grid_one_per_cell(self):
        kps, scores, valid, H, W = cloud()
        keep = grid_nms(kps, scores, valid, H, W, cell=20)
        assert keep.sum() <= 25
        cid = (kps[:, 1].astype(int) // 20) * 5 + kps[:, 0].astype(int) // 20
        for c in np.unique(cid[keep]):
            members = keep & (cid == c)
            assert members.sum() == 1
            # the kept one is the cell's best
            assert scores[members].max() == scores[cid == c].max()

    def test_kdt_radius(self):
        kps, scores, valid, H, W = cloud()
        keep = kdt_nms(kps, scores, valid, radius=10.0)
        pts = kps[keep]
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 10.0

    def test_ssc_hits_target(self):
        kps, scores, valid, H, W = cloud(n=500)
        keep = ssc_nms(kps, scores, valid, H, W, k=50)
        assert 25 <= keep.sum() <= 100

    def test_octree_target(self):
        kps, scores, valid, H, W = cloud(n=400)
        keep = octree_nms(kps, scores, valid, H, W, k=40)
        assert 20 <= keep.sum() <= 80

    def test_invalid_never_kept(self):
        kps, scores, valid, H, W = cloud()
        valid[:150] = False
        for fn in (lambda: grid_nms(kps, scores, valid, H, W),
                   lambda: kdt_nms(kps, scores, valid),
                   lambda: ssc_nms(kps, scores, valid, H, W, 30),
                   lambda: octree_nms(kps, scores, valid, H, W, 30)):
            keep = fn()
            assert not keep[:150].any()
