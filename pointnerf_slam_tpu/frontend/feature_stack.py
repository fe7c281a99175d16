"""Pluggable feature stack: the pyslam-style manager/matcher/tracker API.

Capability of the reference's alternative feature stack (mostly dormant but
part of its surface — SURVEY §2.2): src/superpoint_manager.py (pyramids +
keypoint-filter selection), src/superpoint_matcher.py (BF/FLANN matcher
factory with ratio test + cross-check), src/superpoint_tracker.py (the
track(image_ref, image_cur) facade), src/feature_superpoint.py
(cv2-Feature2D-style detectAndCompute adapter).

All compute routes through the batched device implementations
(frontend.features / frontend.matching / frontend.nms).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .features import HarrisExtractor, SuperPointExtractor
from .matching import match_two_way
from .nms import grid_nms, kdt_nms, octree_nms, ssc_nms


@dataclasses.dataclass
class FeatureManagerConfig:
    detector: str = "harris"          # 'harris' | 'superpoint'
    num_features: int = 1000
    keypoint_filter: str = "none"     # 'none'|'grid'|'kdt'|'ssc'|'octree'
    superpoint_weights: Optional[str] = None


class FeatureManager:
    """Detector + keypoint-filter selection (superpoint_manager.py:347-378
    capability)."""

    def __init__(self, cfg: FeatureManagerConfig = FeatureManagerConfig()):
        self.cfg = cfg
        if cfg.detector == "superpoint":
            self.extractor = SuperPointExtractor(
                cfg.superpoint_weights, max_kps=cfg.num_features)
        else:
            self.extractor = HarrisExtractor(max_kps=cfg.num_features)

    def detect_and_compute(self, img_gray: np.ndarray):
        """(kps (K,2), desc (K,D), valid (K,)) with the configured filter."""
        kps, desc, valid, _ = self.extractor.extract(jnp.asarray(img_gray))
        kps = np.asarray(kps)
        desc = np.asarray(desc)
        valid = np.asarray(valid)
        f = self.cfg.keypoint_filter
        if f != "none" and valid.any():
            H, W = img_gray.shape
            scores = -np.arange(len(kps), dtype=np.float64)  # top-k order
            if f == "grid":
                keep = grid_nms(kps, scores, valid, H, W)
            elif f == "kdt":
                keep = kdt_nms(kps, scores, valid)
            elif f == "ssc":
                keep = ssc_nms(kps, scores, valid, H, W,
                               self.cfg.num_features // 2)
            elif f == "octree":
                keep = octree_nms(kps, scores, valid, H, W,
                                  self.cfg.num_features // 2)
            else:
                raise ValueError(f)
            valid = valid & keep
        return kps, desc, valid


class SuperPointFeature2D:
    """cv2.Feature2D-style adapter (feature_superpoint.py:72-133)."""

    def __init__(self, manager: Optional[FeatureManager] = None):
        self.manager = manager or FeatureManager(
            FeatureManagerConfig(detector="harris"))

    def detectAndCompute(self, img, mask=None):  # noqa: N802 (cv2 API)
        gray = img if img.ndim == 2 else img.mean(-1)
        kps, desc, valid = self.manager.detect_and_compute(
            np.asarray(gray, np.float32))
        return kps[valid], desc[valid]

    def detect(self, img, mask=None):
        return self.detectAndCompute(img, mask)[0]


@dataclasses.dataclass
class MatcherConfig:
    ratio_test: Optional[float] = None   # Lowe ratio (None = off)
    cross_check: bool = True             # mutual-NN
    nn_thresh: float = 0.7


class FeatureMatcher:
    """Matcher 'factory' (superpoint_matcher.py:35-193 capability): the
    reference's BF/FLANN variants collapse to one dense device matmul with
    optional ratio test and cross-check."""

    def __init__(self, cfg: MatcherConfig = MatcherConfig()):
        self.cfg = cfg

    def match(self, desc1: np.ndarray, desc2: np.ndarray,
              valid1=None, valid2=None):
        """Returns (idx1, idx2) match index arrays."""
        v1 = np.ones(len(desc1), bool) if valid1 is None else valid1
        v2 = np.ones(len(desc2), bool) if valid2 is None else valid2
        idx2, mvalid, scores = match_two_way(
            jnp.asarray(desc1, jnp.float32), jnp.asarray(v1),
            jnp.asarray(desc2, jnp.float32), jnp.asarray(v2),
            self.cfg.nn_thresh)
        idx2 = np.asarray(idx2)
        mvalid = np.asarray(mvalid)
        if not self.cfg.cross_check:
            # plain NN with threshold (match_two_way always computes the
            # mutual check; relax by recomputing the forward-only argmin)
            sim = np.clip(desc1 @ desc2.T, -1, 1)
            d = np.sqrt(np.maximum(2 - 2 * sim, 0))
            d[:, ~v2] = 1e6
            idx2 = d.argmin(1)
            mvalid = v1 & (d[np.arange(len(desc1)), idx2]
                           < self.cfg.nn_thresh)
        if self.cfg.ratio_test is not None:
            sim = np.clip(desc1 @ desc2.T, -1, 1)
            d = np.sqrt(np.maximum(2 - 2 * sim, 0))
            d[:, ~v2] = 1e6
            part = np.partition(d, 1, axis=1)
            ok = part[:, 0] < self.cfg.ratio_test * part[:, 1]
            mvalid = mvalid & ok
        idx1 = np.flatnonzero(mvalid)
        return idx1, idx2[mvalid]


class FeatureTracker:
    """track(image_ref, image_cur) facade (superpoint_tracker.py:118-237)."""

    def __init__(self, manager: Optional[FeatureManager] = None,
                 matcher: Optional[FeatureMatcher] = None):
        self.manager = manager or FeatureManager()
        self.matcher = matcher or FeatureMatcher()

    def track(self, image_ref, image_cur, kps_ref=None, des_ref=None):
        gray_r = image_ref if image_ref.ndim == 2 else image_ref.mean(-1)
        gray_c = image_cur if image_cur.ndim == 2 else image_cur.mean(-1)
        if kps_ref is None or des_ref is None:
            kr, dr, vr = self.manager.detect_and_compute(
                np.asarray(gray_r, np.float32))
            kps_ref, des_ref = kr[vr], dr[vr]
        kc, dc, vc = self.manager.detect_and_compute(
            np.asarray(gray_c, np.float32))
        kps_cur, des_cur = kc[vc], dc[vc]
        i1, i2 = self.matcher.match(des_ref, des_cur)
        return {
            "kps_ref": kps_ref, "des_ref": des_ref,
            "kps_cur": kps_cur, "des_cur": des_cur,
            "idxs_ref": i1, "idxs_cur": i2,
            "kps_ref_matched": kps_ref[i1],
            "kps_cur_matched": kps_cur[i2],
        }
