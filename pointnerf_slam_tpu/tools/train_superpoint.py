"""Distill a SuperPoint checkpoint on the synthetic corpus.

The reference's flagship extractor is the SuperPoint CNN loaded from the
public 5 MB MagicLeap checkpoint (src/demo_superpoint.py:101-293, loaded at
src/frame.py:271). This image has no network egress, so the public weights
cannot be fetched; instead we TRAIN a compatible checkpoint (same
architecture, same npz/pth-loadable layout) on procedurally-rendered
synthetic frames:

  - detector head: distilled from the Harris teacher with the MagicPoint
    recipe — per 8x8 cell a 65-way cross-entropy (64 in-cell positions +
    dustbin); a cell's label is the position of the strongest NMS'd Harris
    corner inside it when one exists, else dustbin.
  - descriptor head: the SuperPoint paper's self-supervised homography
    hinge loss — cell pairs related by a known random homography are
    positives (margin 1.0), all others negatives (margin 0.2), weighted
    lambda_d inside, lambda overall.

Output: pretrained/superpoint_synthetic.npz (features.load_superpoint_npz
format). The torch-checkpoint converter for the public weights remains in
features.load_superpoint_torch for when egress allows.

Run: python -m pointnerf_slam_tpu.tools.train_superpoint --steps 2000
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..frontend.features import (_maxpool_nms, harris_score, init_superpoint,
                                 save_superpoint_npz, superpoint_forward)

H_IMG, W_IMG = 120, 160
HC, WC = H_IMG // 8, W_IMG // 8


# --------------------------------------------------------------------------
# corpus
# --------------------------------------------------------------------------

def render_corpus(n_images: int, seed: int = 0,
                  match_run_scale: bool = True) -> np.ndarray:
    """(N, H', W') grayscale synthetic room renders from random in-room
    views; training crops H_IMG x W_IMG windows from these.

    match_run_scale=True renders at the LIVE pipeline's angular resolution
    (fx/W = 600/1200, the room_bench camera) at half size (340x600,
    fx=300 — same px-frequency statistics, 4x cheaper), so the distilled
    net sees the texture scale the extractor meets at run time. The
    original 100px-focal 120x160 full-frame corpus (match_run_scale=False)
    trained on ~3x coarser texture — a domain gap that cost descriptor
    precision (round-3 0.28 vs Harris 0.12 median triangulation error)."""
    from ..io.synthetic import SyntheticDataset

    if match_run_scale:
        Hr, Wr, f = 340, 600, 300.0
    else:
        Hr, Wr, f = H_IMG, W_IMG, 100.0
    cfg = {"cam": {"H": Hr, "W": Wr, "fx": f, "fy": f,
                   "cx": (Wr - 1) / 2, "cy": (Hr - 1) / 2,
                   "crop_edge": 0},
           "data": {"n_frames": 2, "output": "/tmp/sp_corpus"}}
    ds = SyntheticDataset(cfg)
    rng = np.random.default_rng(seed)
    out = np.empty((n_images, Hr, Wr), np.float32)
    for i in range(n_images):
        eye = rng.uniform(-1.2, 1.2, 3)
        target = rng.uniform(-1.8, 1.8, 3)
        while np.linalg.norm(target - eye) < 0.5:
            target = rng.uniform(-1.8, 1.8, 3)
        from ..io.synthetic import _lookat_c2w
        c2w = _lookat_c2w(eye, target)
        color, _ = ds.render_frame(c2w)
        out[i] = np.asarray(color, np.float32).mean(-1)
    return out


def crop_batch(corpus: np.ndarray, rng, batch: int) -> np.ndarray:
    """(B, H_IMG, W_IMG) random windows; identity when corpus is full-frame."""
    N, Hr, Wr = corpus.shape
    if (Hr, Wr) == (H_IMG, W_IMG):
        return corpus[rng.integers(0, N, batch)]
    out = np.empty((batch, H_IMG, W_IMG), corpus.dtype)
    for b in range(batch):
        i = rng.integers(0, N)
        y = rng.integers(0, Hr - H_IMG + 1)
        x = rng.integers(0, Wr - W_IMG + 1)
        out[b] = corpus[i, y:y + H_IMG, x:x + W_IMG]
    return out


def photometric_aug(imgs: np.ndarray, rng) -> np.ndarray:
    """Per-image gain/bias + gaussian noise (descriptor lighting
    invariance; the SuperPoint paper's photometric augmentation set)."""
    gain = rng.uniform(0.7, 1.3, (len(imgs), 1, 1)).astype(np.float32)
    bias = rng.uniform(-0.08, 0.08, (len(imgs), 1, 1)).astype(np.float32)
    noise = rng.normal(0.0, rng.uniform(0.0, 0.02),
                       imgs.shape).astype(np.float32)
    return np.clip(imgs * gain + bias + noise, 0.0, 1.0)


def sample_homography(rng, mag: float = 0.15) -> np.ndarray:
    """Random perspective homography by 4-corner jitter (output px -> source
    px), DLT-solved."""
    W, H = float(W_IMG), float(H_IMG)
    src = np.array([[0, 0], [W, 0], [0, H], [W, H]], np.float64)
    dst = src + rng.uniform(-mag, mag, (4, 2)) * [W, H]
    A = []
    for (x, y), (u, v) in zip(dst, src):  # maps output (dst) -> source
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
    _, _, Vt = np.linalg.svd(np.asarray(A))
    Hm = Vt[-1].reshape(3, 3)
    return (Hm / Hm[2, 2]).astype(np.float32)


def warp_image(img: jnp.ndarray, Hm: jnp.ndarray) -> jnp.ndarray:
    """Inverse-warp: output pixel p samples source at Hm @ p (bilinear,
    zeros outside)."""
    Hh, Ww = img.shape
    j, i = jnp.meshgrid(jnp.arange(Hh, dtype=jnp.float32),
                        jnp.arange(Ww, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(i)
    p = jnp.stack([i, j, ones], 0).reshape(3, -1)
    q = Hm @ p
    x = q[0] / q[2]
    y = q[1] / q[2]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0

    def tap(yy, xx):
        ok = (xx >= 0) & (xx < Ww) & (yy >= 0) & (yy < Hh)
        v = img[jnp.clip(yy, 0, Hh - 1), jnp.clip(xx, 0, Ww - 1)]
        return jnp.where(ok, v, 0.0)

    v = (tap(y0, x0) * (1 - fx) * (1 - fy) + tap(y0, x0 + 1) * fx * (1 - fy)
         + tap(y0 + 1, x0) * (1 - fx) * fy + tap(y0 + 1, x0 + 1) * fx * fy)
    return v.reshape(Hh, Ww)


# --------------------------------------------------------------------------
# labels + losses
# --------------------------------------------------------------------------

def detector_labels(gray: jnp.ndarray, top_k: int = 300) -> jnp.ndarray:
    """(Hc, Wc) int labels in [0, 64]: the in-cell position (row-major 8x8)
    of the strongest NMS'd Harris corner, or 64 (dustbin) if the cell holds
    no top-k corner."""
    score = harris_score(gray)
    nms = jnp.where(_maxpool_nms(score, 4), score, -jnp.inf)
    # keep only the top_k strongest NMS'd responses (with a relative floor)
    vals, _ = jax.lax.top_k(nms.reshape(-1), top_k)
    floor = jnp.maximum(vals[0] * 1e-3, 1e-12)
    nms = jnp.where((nms >= vals[-1]) & (nms > floor), nms, -jnp.inf)
    # per-cell 8x8 block argmax -> in-cell position label, dustbin if empty
    blocks = nms.reshape(HC, 8, WC, 8).transpose(0, 2, 1, 3).reshape(
        HC, WC, 64)
    pos = jnp.argmax(blocks, axis=-1)
    has = jnp.max(blocks, axis=-1) > -jnp.inf
    return jnp.where(has, pos, 64).astype(jnp.int32)


def _detector_ce(semi: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """semi (65, Hc, Wc) raw logits; labels (Hc, Wc) in [0, 64]."""
    logp = jax.nn.log_softmax(semi, axis=0)
    lp = jnp.take_along_axis(logp, labels[None], axis=0)[0]
    return -lp.mean()


def _descriptor_hinge(da: jnp.ndarray, db: jnp.ndarray, Hm: jnp.ndarray,
                      m_pos: float = 1.0, m_neg: float = 0.2,
                      lambda_d: float = 250.0) -> jnp.ndarray:
    return _descriptor_hinge_impl(da, db, Hm, m_pos, m_neg, lambda_d)


def _descriptor_hinge_impl(da, db, Hm, m_pos, m_neg, lambda_d):
    """da/db (256, Hc, Wc) L2-normalized coarse descriptors of the source
    image and its warp; Hm maps warp pixel -> source pixel."""
    j, i = jnp.meshgrid(jnp.arange(HC, dtype=jnp.float32) * 8 + 3.5,
                        jnp.arange(WC, dtype=jnp.float32) * 8 + 3.5,
                        indexing="ij")
    p = jnp.stack([i, j, jnp.ones_like(i)], 0).reshape(3, -1)  # warp cells
    q = Hm @ p                                                 # -> source px
    qx = (q[0] / q[2]).reshape(-1)
    qy = (q[1] / q[2]).reshape(-1)
    # source cell centers
    sx = i.reshape(-1)
    sy = j.reshape(-1)
    d2 = ((qx[None, :] - sx[:, None]) ** 2
          + (qy[None, :] - sy[:, None]) ** 2)
    s = (d2 <= 64.0).astype(jnp.float32)  # (src_cell, warp_cell)
    inb = ((qx >= 0) & (qx < W_IMG) & (qy >= 0) & (qy < H_IMG)
           ).astype(jnp.float32)[None, :]
    dot = da.reshape(256, -1).T @ db.reshape(256, -1)  # (src, warp)
    loss = (lambda_d * s * jax.nn.relu(m_pos - dot)
            + (1.0 - s) * jax.nn.relu(dot - m_neg)) * inb
    return loss.mean()


def make_loss_fn(lambda_desc: float = 1.0, m_pos: float = 1.0,
                 m_neg: float = 0.2, lambda_d: float = 250.0):
    """lambda_desc weights the descriptor hinge against the detector CE.
    The SuperPoint paper's lambda = 1e-4 balances a SUM over all
    (Hc*Wc)^2 cell pairs; _descriptor_hinge returns the MEAN, so the
    equivalent balance is O(1) — at 1e-4 the descriptor head trains ~4
    orders too slowly (measured: desc loss flat, 40% homography match
    precision; at 1.0 it converges). m_pos/m_neg/lambda_d expose the
    hinge margins for the distillation sweep."""
    def loss_fn(params, gray, warped, Hm, labels_a, labels_b):
        def fwd(g):
            # raw semi logits + normalized desc, pre-softmax (the training
            # loss needs logits; superpoint_forward applies softmax)
            from ..frontend.features import _conv
            relu = jax.nn.relu
            x = g[None, None, :, :]
            for name in ("conv1a", "conv1b"):
                x = relu(_conv(params[name], x))
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2),
                                      (1, 1, 2, 2), "VALID")
            for name in ("conv2a", "conv2b"):
                x = relu(_conv(params[name], x))
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2),
                                      (1, 1, 2, 2), "VALID")
            for name in ("conv3a", "conv3b"):
                x = relu(_conv(params[name], x))
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2),
                                      (1, 1, 2, 2), "VALID")
            for name in ("conv4a", "conv4b"):
                x = relu(_conv(params[name], x))
            cPa = relu(_conv(params["convPa"], x))
            semi = _conv(params["convPb"], cPa)[0]
            cDa = relu(_conv(params["convDa"], x))
            desc = _conv(params["convDb"], cDa)[0]
            desc = desc / jnp.maximum(
                jnp.linalg.norm(desc, axis=0, keepdims=True), 1e-10)
            return semi, desc

        semi_a, da = fwd(gray)
        semi_b, db = fwd(warped)
        det = _detector_ce(semi_a, labels_a) + _detector_ce(semi_b, labels_b)
        desc = _descriptor_hinge_impl(da, db, Hm, m_pos, m_neg, lambda_d)
        return det + lambda_desc * desc, (det, desc)

    return loss_fn


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------

def train(steps: int = 2000, batch: int = 4, n_images: int = 64,
          lr: float = 1e-3, seed: int = 0, out: str | None = None,
          log_every: int = 100, match_run_scale: bool = True,
          augment: bool = True, m_pos: float = 1.0, m_neg: float = 0.2,
          lambda_d: float = 250.0, mag: float = 0.15,
          corpus: np.ndarray | None = None):
    rng = np.random.default_rng(seed)
    if corpus is None:
        print(f"rendering {n_images} synthetic views...")
        corpus = render_corpus(n_images, seed, match_run_scale)
    params = init_superpoint(jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    loss_fn = make_loss_fn(m_pos=m_pos, m_neg=m_neg, lambda_d=lambda_d)

    labels_fn = jax.jit(detector_labels)

    @jax.jit
    def step(params, opt_state, grays, warps, Hms, la, lb):
        def batch_loss(p):
            l, aux = jax.vmap(
                lambda g, w, Hm, a, b: loss_fn(p, g, w, Hm, a, b)
            )(grays, warps, Hms, la, lb)
            return l.mean(), (aux[0].mean(), aux[1].mean())

        (l, aux), g = jax.value_and_grad(batch_loss, has_aux=True)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l, aux

    warp_jit = jax.jit(warp_image)
    t0 = time.time()
    for it in range(steps):
        clean = crop_batch(corpus, rng, batch)
        Hms = jnp.asarray(np.stack([sample_homography(rng, mag)
                                    for _ in range(batch)]))
        warps_clean = np.stack([np.asarray(warp_jit(jnp.asarray(clean[b]),
                                                    Hms[b]))
                                for b in range(batch)])
        # detector labels from the CLEAN images (Harris teacher unpolluted
        # by noise); the network trains on the augmented inputs
        la = jnp.stack([labels_fn(jnp.asarray(clean[b]))
                        for b in range(batch)])
        lb = jnp.stack([labels_fn(jnp.asarray(warps_clean[b]))
                        for b in range(batch)])
        if augment:
            grays = jnp.asarray(photometric_aug(clean, rng))
            warps = jnp.asarray(photometric_aug(warps_clean, rng))
        else:
            grays = jnp.asarray(clean)
            warps = jnp.asarray(warps_clean)
        params, opt_state, l, (det, desc) = step(params, opt_state, grays,
                                                 warps, Hms, la, lb)
        if it % log_every == 0 or it == steps - 1:
            print(f"step {it}: loss {float(l):.4f} (det {float(det):.4f} "
                  f"desc {float(desc):.4f}) [{time.time() - t0:.0f}s]")
    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        save_superpoint_npz(out, params)
        print(f"saved {out}")
    return params, corpus


def evaluate(params, corpus, n_pairs: int = 8, seed: int = 1):
    """Match repeatability across known homographies: fraction of two-way
    descriptor matches whose warp-mapped distance is < 4 px."""
    from ..frontend.matching import match_two_way
    from ..frontend.features import (_maxpool_nms, _sample_desc,
                                     _topk_keypoints)

    rng = np.random.default_rng(seed)

    @jax.jit
    def extract(gray):
        heat, desc_c = superpoint_forward(params, gray)
        keep = _maxpool_nms(heat, 4)
        score = jnp.where(keep, heat, 0.0)
        kps, valid, _ = _topk_keypoints(score, 300, 4, 0.015)
        return kps, _sample_desc(desc_c, kps, H_IMG, W_IMG), valid

    ok = tot = 0
    for _ in range(n_pairs):
        g = jnp.asarray(crop_batch(corpus, rng, 1)[0])
        Hm = sample_homography(rng)
        w = warp_image(g, jnp.asarray(Hm))
        k1, d1, v1 = extract(g)
        k2, d2, v2 = extract(w)
        idx2, mvalid, _ = match_two_way(d2, v2, d1, v1, 0.7)
        m = np.asarray(mvalid)
        if m.sum() == 0:
            continue
        # warp image-B keypoints back to source px and compare to match
        k2n = np.asarray(k2)[m]
        p = np.concatenate([k2n, np.ones((len(k2n), 1))], 1) @ Hm.T
        src = p[:, :2] / p[:, 2:3]
        k1m = np.asarray(k1)[np.asarray(idx2)[m]]
        d = np.linalg.norm(src - k1m, axis=1)
        ok += int((d < 4).sum())
        tot += len(d)
    return ok / max(tot, 1), tot


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--n_images", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--m_pos", type=float, default=1.0)
    p.add_argument("--m_neg", type=float, default=0.2)
    p.add_argument("--lambda_d", type=float, default=250.0)
    p.add_argument("--mag", type=float, default=0.15)
    p.add_argument("--legacy_scale", action="store_true",
                   help="the round-3 coarse-texture 120x160 corpus")
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--out", type=str,
                   default=os.path.join(os.path.dirname(__file__), "..", "..",
                                        "pretrained",
                                        "superpoint_synthetic.npz"))
    args = p.parse_args()
    params, corpus = train(args.steps, args.batch, args.n_images, args.lr,
                           out=args.out,
                           match_run_scale=not args.legacy_scale,
                           augment=not args.no_augment, m_pos=args.m_pos,
                           m_neg=args.m_neg, lambda_d=args.lambda_d,
                           mag=args.mag)
    acc, tot = evaluate(params, corpus)
    print(f"homography match precision: {acc:.3f} over {tot} matches")


if __name__ == "__main__":
    main()
