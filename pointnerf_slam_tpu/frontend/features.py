"""Keypoint detection + description, fully on-device.

Two extractors behind one interface
`extract(gray) -> (kps, desc, valid, angles)`:

  - `SuperPointExtractor`: the SuperPoint CNN (shared VGG encoder, 65-channel
    detector head, 256-d descriptor head — capability of
    src/demo_superpoint.py:78-293) re-implemented in JAX as batched XLA conv
    inference, with a converter for the public MagicLeap checkpoint
    (pretrained/superpoint_v1.pth). One model instance, jitted once — not the
    reference's new-network-per-frame (frame.py:271; PARITY.md #4).
  - `HarrisExtractor`: classical Harris corners + normalized-patch
    descriptors, pure JAX. Default when no SuperPoint weights are available
    (this image ships none); exercises the identical downstream geometry.

Both use static top-K outputs with validity masks and grid NMS (the
reference's nms_fast, demo_superpoint.py:158-221, is a serial greedy
suppression; a max-pool equality test is its data-parallel equivalent).

Both also return per-keypoint ORB-style intensity-centroid ORIENTATIONS
(`angles`, radians): the reference's rotation-histogram match gate
(src/rotation_histogram.py:24-88, applied in src/search_points.py behind
`Frame.oriented_features`) is dead code there because SuperPoint provides
no orientations — computing them here makes the gate live (see
frontend.py / fused_twoview.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _maxpool_nms(score: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Keep local maxima within a (2r+1)^2 window."""
    w = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (w, w), (1, 1), "SAME")
    return score == pooled


def _topk_keypoints(score: jnp.ndarray, k: int, border: int,
                    min_conf: float, rel_conf: float = 0.0):
    """Static top-k (x, y) keypoints from a score map.

    A keypoint is valid when its score exceeds max(min_conf,
    rel_conf * strongest_score) — the relative term adapts to low-contrast
    images (smooth synthetic textures)."""
    H, W = score.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = ((yy >= border) & (yy < H - border) & (xx >= border)
          & (xx < W - border))
    s = jnp.where(ok, score, -jnp.inf)
    vals, idx = jax.lax.top_k(s.reshape(-1), k)
    kx = (idx % W).astype(jnp.float32)
    ky = (idx // W).astype(jnp.float32)
    thresh = jnp.maximum(min_conf, rel_conf * vals[0])
    valid = vals > thresh
    return jnp.stack([kx, ky], -1), valid, vals


def _gather_patches(img: jnp.ndarray, kps: jnp.ndarray, size: int):
    """(K, size*size) normalized patches around integer keypoints."""
    half = size // 2
    H, W = img.shape
    off = jnp.arange(-half, size - half)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")
    y = jnp.clip(kps[:, 1:2].astype(jnp.int32) + oy.reshape(1, -1), 0, H - 1)
    x = jnp.clip(kps[:, 0:1].astype(jnp.int32) + ox.reshape(1, -1), 0, W - 1)
    p = img[y, x]
    p = p - p.mean(axis=1, keepdims=True)
    n = jnp.linalg.norm(p, axis=1, keepdims=True)
    return p / jnp.maximum(n, 1e-8)


def intensity_centroid_angles(img: jnp.ndarray, kps: jnp.ndarray,
                              radius: int = 7) -> jnp.ndarray:
    """ORB-style intensity-centroid keypoint orientations (radians).

    theta = atan2(m01, m10) with moments m10 = sum(x * I), m01 = sum(y * I)
    over a circular patch of the given radius (Rublee et al., ORB 2011 —
    the orientation the reference's pyslam ORB path feeds its
    rotation-histogram gate). Image y grows downward; the convention only
    needs to be consistent between the two matched frames."""
    H, W = img.shape
    off = jnp.arange(-radius, radius + 1)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")
    circ = (ox * ox + oy * oy <= radius * radius).astype(jnp.float32)
    oy = oy.reshape(1, -1)
    ox = ox.reshape(1, -1)
    y = jnp.clip(kps[:, 1:2].astype(jnp.int32) + oy, 0, H - 1)
    x = jnp.clip(kps[:, 0:1].astype(jnp.int32) + ox, 0, W - 1)
    p = img[y, x] * circ.reshape(1, -1)
    m10 = jnp.sum(p * ox, axis=1)
    m01 = jnp.sum(p * oy, axis=1)
    return jnp.arctan2(m01, m10)


class HarrisExtractor:
    """Harris corners + 11x11 normalized patch descriptors."""

    def __init__(self, max_kps: int = 1000, nms_radius: int = 3,
                 border: int = 6, k: float = 0.04, min_conf: float = 0.0,
                 rel_conf: float = 1e-6, patch: int = 11):
        self.max_kps = max_kps
        self._fn = jax.jit(partial(
            _harris_extract, max_kps=max_kps, nms_radius=nms_radius,
            border=border, k=k, min_conf=min_conf, rel_conf=rel_conf,
            patch=patch))

    def extract(self, gray: jnp.ndarray):
        return self._fn(gray)


def _sep_conv(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable 2-D convolution (SAME) with a 1-D kernel."""
    pad = len(k) // 2
    xp = jnp.pad(x, ((pad, pad), (0, 0)), mode="edge")
    x = sum(xp[i:i + x.shape[0]] * k[i] for i in range(len(k)))
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    x = sum(xp[:, i:i + x.shape[1]] * k[i] for i in range(len(k)))
    return x


def harris_score(gray: jnp.ndarray, k: float = 0.04) -> jnp.ndarray:
    """Raw Harris corner response map (the detector teacher for the
    distilled SuperPoint checkpoint, tools/train_superpoint.py)."""
    g = gray.astype(jnp.float32)
    gb = _sep_conv(g, jnp.array([0.25, 0.5, 0.25]))
    dy = jnp.gradient(gb, axis=0)
    dx = jnp.gradient(gb, axis=1)
    blur = jnp.array([1., 4., 6., 4., 1.]) / 16.0
    ixx = _sep_conv(dx * dx, blur)
    iyy = _sep_conv(dy * dy, blur)
    ixy = _sep_conv(dx * dy, blur)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    return det - k * tr * tr


def _harris_extract(gray, *, max_kps, nms_radius, border, k, min_conf,
                    rel_conf, patch):
    g = gray.astype(jnp.float32)
    gb = _sep_conv(g, jnp.array([0.25, 0.5, 0.25]))
    score = harris_score(gray, k)
    nms_score = jnp.where(_maxpool_nms(score, nms_radius), score, -jnp.inf)
    kps, valid, _ = _topk_keypoints(nms_score, max_kps, border, min_conf,
                                    rel_conf)
    kps = _subpixel_refine(score, kps)
    desc = _gather_patches(gb, kps, patch)
    angles = intensity_centroid_angles(gb, kps)
    return kps, desc, valid, angles


def _subpixel_refine(score: jnp.ndarray, kps: jnp.ndarray) -> jnp.ndarray:
    """Quadratic (parabola) sub-pixel peak refinement on the raw score map."""
    H, W = score.shape
    x = kps[:, 0].astype(jnp.int32)
    y = kps[:, 1].astype(jnp.int32)
    xm = jnp.clip(x - 1, 0, W - 1)
    xp = jnp.clip(x + 1, 0, W - 1)
    ym = jnp.clip(y - 1, 0, H - 1)
    yp = jnp.clip(y + 1, 0, H - 1)

    def off(sm, s0, sp):
        denom = sm - 2 * s0 + sp
        d = 0.5 * (sm - sp) / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        return jnp.clip(d, -0.5, 0.5)

    dx = off(score[y, xm], score[y, x], score[y, xp])
    dy = off(score[ym, x], score[y, x], score[yp, x])
    return kps + jnp.stack([dx, dy], -1)


# ---------------------------------------------------------------------------
# SuperPoint
# ---------------------------------------------------------------------------

_SP_LAYERS = [  # (name, in, out, kernel)
    ("conv1a", 1, 64, 3), ("conv1b", 64, 64, 3),
    ("conv2a", 64, 64, 3), ("conv2b", 64, 64, 3),
    ("conv3a", 64, 128, 3), ("conv3b", 128, 128, 3),
    ("conv4a", 128, 128, 3), ("conv4b", 128, 128, 3),
]


def init_superpoint(key):
    """Random-init SuperPoint params (He init); same pytree layout the
    torch-checkpoint converter fills."""
    params = {}
    names = _SP_LAYERS + [("convPa", 128, 256, 3), ("convPb", 256, 65, 1),
                          ("convDa", 128, 256, 3), ("convDb", 256, 256, 1)]
    keys = jax.random.split(key, len(names))
    for kk, (name, cin, cout, ks) in zip(keys, names):
        fan_in = cin * ks * ks
        w = jax.random.normal(kk, (cout, cin, ks, ks)) * np.sqrt(2.0 / fan_in)
        params[name] = {"w": w, "b": jnp.zeros((cout,))}
    return params


def load_superpoint_torch(path: str):
    """Convert the public superpoint_v1.pth (torch state dict) to our pytree."""
    import torch
    sd = torch.load(path, map_location="cpu")
    params = {}
    for name in [n for n, *_ in _SP_LAYERS] + ["convPa", "convPb", "convDa",
                                               "convDb"]:
        params[name] = {
            "w": jnp.asarray(sd[f"{name}.weight"].numpy()),
            "b": jnp.asarray(sd[f"{name}.bias"].numpy()),
        }
    return params


def save_superpoint_npz(path: str, params):
    """Save SuperPoint params as a flat npz (the distilled-checkpoint
    format; no torch needed to load it back)."""
    flat = {}
    for name, p in params.items():
        flat[f"{name}.w"] = np.asarray(p["w"])
        flat[f"{name}.b"] = np.asarray(p["b"])
    np.savez_compressed(path, **flat)


def load_superpoint_npz(path: str):
    z = np.load(path)
    params = {}
    for k in z.files:
        name, kind = k.rsplit(".", 1)
        params.setdefault(name, {})[kind] = jnp.asarray(z[k])
    return params


def _conv(p, x, stride=1):
    """x: (1, C, H, W) NCHW conv + bias."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"][None, :, None, None]


def superpoint_forward(params, gray: jnp.ndarray):
    """gray (H, W) in [0,1] -> (heatmap (H, W), desc_coarse (256, H/8, W/8)).

    Mirrors SuperPointNet.forward + the frontend's softmax/reshape
    (demo_superpoint.py:101-131, 240-263). H, W must be multiples of 8.
    """
    relu = jax.nn.relu
    x = gray[None, None, :, :]
    x = relu(_conv(params["conv1a"], x))
    x = relu(_conv(params["conv1b"], x))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2),
                              (1, 1, 2, 2), "VALID")
    x = relu(_conv(params["conv2a"], x))
    x = relu(_conv(params["conv2b"], x))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2),
                              (1, 1, 2, 2), "VALID")
    x = relu(_conv(params["conv3a"], x))
    x = relu(_conv(params["conv3b"], x))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2),
                              (1, 1, 2, 2), "VALID")
    x = relu(_conv(params["conv4a"], x))
    x = relu(_conv(params["conv4b"], x))

    cPa = relu(_conv(params["convPa"], x))
    semi = _conv(params["convPb"], cPa)[0]          # (65, Hc, Wc)
    cDa = relu(_conv(params["convDa"], x))
    desc = _conv(params["convDb"], cDa)[0]          # (256, Hc, Wc)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=0, keepdims=True), 1e-10)

    dense = jax.nn.softmax(semi, axis=0)[:-1]       # drop dustbin
    Hc, Wc = dense.shape[1], dense.shape[2]
    heat = dense.reshape(8, 8, Hc, Wc).transpose(2, 0, 3, 1).reshape(
        Hc * 8, Wc * 8)
    return heat, desc


def _sample_desc(desc_coarse: jnp.ndarray, kps: jnp.ndarray, H: int, W: int):
    """Bilinear-sample the coarse descriptor map at keypoints, renormalize
    (demo_superpoint.py:276-289)."""
    D, Hc, Wc = desc_coarse.shape
    # map pixel coords to coarse-grid coords (align_corners=True on [-1,1])
    sx = (kps[:, 0] / (W - 1)) * (Wc - 1)
    sy = (kps[:, 1] / (H - 1)) * (Hc - 1)
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, Wc - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, Hc - 1)
    x1 = jnp.minimum(x0 + 1, Wc - 1)
    y1 = jnp.minimum(y0 + 1, Hc - 1)
    fx = (sx - x0)[:, None]
    fy = (sy - y0)[:, None]
    d = desc_coarse.transpose(1, 2, 0)  # (Hc, Wc, D)
    v = (d[y0, x0] * (1 - fx) * (1 - fy) + d[y0, x1] * fx * (1 - fy)
         + d[y1, x0] * (1 - fx) * fy + d[y1, x1] * fx * fy)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-10)


class SuperPointExtractor:
    """SuperPoint inference (one jitted instance for the whole run)."""

    def __init__(self, weights_path: str | None = None, max_kps: int = 3000,
                 conf_thresh: float = 0.015, nms_dist: int = 4,
                 border: int = 4, key=None):
        if weights_path is not None and weights_path.endswith(".npz"):
            self.params = load_superpoint_npz(weights_path)
        elif weights_path is not None:
            self.params = load_superpoint_torch(weights_path)
        else:
            self.params = init_superpoint(
                key if key is not None else jax.random.PRNGKey(0))
        self.max_kps = max_kps

        @jax.jit
        def _extract(params, gray):
            H, W = gray.shape
            heat, desc_c = superpoint_forward(params, gray)
            keep = _maxpool_nms(heat, nms_dist)
            score = jnp.where(keep, heat, 0.0)
            kps, valid, _ = _topk_keypoints(score, max_kps, border,
                                            conf_thresh)
            # 3x3 quadratic subpixel peak (same refinement Harris gets):
            # the semi head localizes to integer pixels; triangulation
            # accuracy needs better than cell-grid corners
            kps = _subpixel_refine(heat, kps)
            desc = _sample_desc(desc_c, kps, H, W)
            angles = intensity_centroid_angles(gray, kps)
            return kps, desc, valid, angles

        self._fn = _extract

    def extract(self, gray: jnp.ndarray):
        H, W = gray.shape
        assert H % 8 == 0 and W % 8 == 0, \
            f"SuperPoint needs H,W divisible by 8, got {H}x{W}"
        return self._fn(self.params, gray)
