"""Pluggable feature-stack facade tests (pyslam alt-stack capability)."""

import numpy as np

from pointnerf_slam_tpu.frontend.feature_stack import (
    FeatureManager, FeatureManagerConfig, FeatureMatcher, MatcherConfig,
    FeatureTracker, SuperPointFeature2D)


def checker(H=96, W=96, sq=12, shift=0):
    y, x = np.mgrid[0:H, 0:W]
    return ((((y + shift) // sq) + ((x + shift) // sq)) % 2
            ).astype(np.float32)


class TestFeatureStack:
    def test_manager_filters(self):
        img = checker()
        for filt in ("none", "grid", "kdt", "ssc", "octree"):
            m = FeatureManager(FeatureManagerConfig(
                num_features=128, keypoint_filter=filt))
            kps, desc, valid = m.detect_and_compute(img)
            assert valid.sum() > 5, filt

    def test_feature2d_adapter(self):
        f2d = SuperPointFeature2D()
        kps, desc = f2d.detectAndCompute(checker())
        assert len(kps) == len(desc) > 5
        assert np.allclose(np.linalg.norm(desc, axis=1), 1.0, atol=1e-4)

    def test_matcher_ratio_and_crosscheck(self):
        rng = np.random.default_rng(0)
        d1 = rng.normal(size=(30, 16))
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        d2 = np.roll(d1, 3, axis=0)  # permuted copy
        for cfg in (MatcherConfig(), MatcherConfig(ratio_test=0.9),
                    MatcherConfig(cross_check=False)):
            i1, i2 = FeatureMatcher(cfg).match(d1, d2)
            assert len(i1) == len(i2) >= 25
            np.testing.assert_array_equal((i1 + 3) % 30, i2)

    def test_tracker_facade(self):
        # distinctive random texture (checker corners are ambiguous for
        # mutual-NN matching — every corner looks identical)
        rng = np.random.default_rng(0)
        big = rng.normal(size=(80, 80)).astype(np.float32)
        for _ in range(3):  # cheap blur -> smooth distinctive blobs
            big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
                   + np.roll(big, -1, 0) + np.roll(big, -1, 1)) / 5
        img_ref = big[2:66, 2:66]
        img_cur = big[3:67, 2:66]  # 1 px vertical shift
        t = FeatureTracker()
        res = t.track(img_ref, img_cur)
        assert len(res["idxs_ref"]) == len(res["idxs_cur"]) > 5
        d = np.linalg.norm(res["kps_ref_matched"] - res["kps_cur_matched"],
                           axis=1)
        assert float(np.median(d)) < 3.0
