"""ATE evaluation (capability of src/tools/eval_ate.py).

Horn's closed-form rigid alignment of estimated to ground-truth
trajectories + translational RMSE/mean/median stats; checkpoint-driven CLI
reading this framework's npz checkpoints (ckpt translation divided by
`scale`, inf/nan gt rows masked — reference eval_ate.py:243-258).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def align_horn(model: np.ndarray, data: np.ndarray):
    """Rigid alignment data ~= rot @ model + trans (both (3, N)).

    Returns rot (3,3), trans (3,1), trans_error (N,). Mirrors the reference's
    SVD-based Horn implementation (eval_ate.py:44-78)."""
    model_mean = model.mean(axis=1, keepdims=True)
    data_mean = data.mean(axis=1, keepdims=True)
    model_zc = model - model_mean
    data_zc = data - data_mean
    W = model_zc @ data_zc.T
    U, d, Vt = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vt
    trans = data_mean - rot @ model_mean
    aligned = rot @ model + trans
    err = np.sqrt(np.sum((aligned - data) ** 2, axis=0))
    return rot, trans, err


def evaluate_ate(gt_c2w: np.ndarray, est_c2w: np.ndarray,
                 scale: float = 1.0):
    """ATE stats over (N, 4, 4) pose arrays.

    Translations divided by `scale` (ckpt poses live in the scaled world,
    reference eval_ate.py:243-247); gt rows containing inf/nan are dropped
    (ScanNet, :253-258)."""
    gt_t = gt_c2w[:, :3, 3] / scale
    est_t = est_c2w[:, :3, 3] / scale
    ok = np.isfinite(gt_t).all(axis=1) & np.isfinite(est_t).all(axis=1)
    # skip all-zero (never-filled) rows as well
    ok &= ~(np.abs(gt_c2w).sum(axis=(1, 2)) == 0)
    gt_t = gt_t[ok]
    est_t = est_t[ok]
    _, _, err = align_horn(est_t.T, gt_t.T)
    return {
        "compared_pose_pairs": int(ok.sum()),
        "absolute_translational_error.rmse": float(
            np.sqrt(np.mean(err ** 2))),
        "absolute_translational_error.mean": float(err.mean()),
        "absolute_translational_error.median": float(np.median(err)),
        "absolute_translational_error.std": float(err.std()),
        "absolute_translational_error.min": float(err.min()),
        "absolute_translational_error.max": float(err.max()),
    }


def plot_traj(gt_c2w, est_c2w, out_png: str, scale: float = 1.0):
    """Top-down trajectory plot (reference eval_ate.py:81-110)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    gt = gt_c2w[:, :3, 3] / scale
    est = est_c2w[:, :3, 3] / scale
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(gt[:, 0], gt[:, 1], "-", color="black", label="ground truth")
    ax.plot(est[:, 0], est[:, 1], "-", color="blue", label="estimated")
    ax.legend()
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_aspect("equal")
    fig.savefig(out_png, dpi=110, bbox_inches="tight")
    plt.close(fig)


def main():
    p = argparse.ArgumentParser(description="ATE from a checkpoint")
    p.add_argument("ckpt", help="path to ckpts/XXXXX.npz, or an output dir "
                   "(uses its latest checkpoint)")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--plot", default=None, help="save trajectory png here")
    args = p.parse_args()
    path = args.ckpt
    if os.path.isdir(path):
        cdir = (os.path.join(path, "ckpts")
                if os.path.isdir(os.path.join(path, "ckpts")) else path)
        cands = sorted(f for f in os.listdir(cdir) if f.endswith(".npz"))
        if not cands:
            raise SystemExit(f"no .npz checkpoints under {cdir}")
        path = os.path.join(cdir, cands[-1])
        print(f"using {path}")
    z = np.load(path)
    stats = evaluate_ate(z["gt_c2w_list"], z["estimate_c2w_list"],
                         args.scale)
    for k, v in stats.items():
        print(f"{k} {v:.6f}" if isinstance(v, float) else f"{k} {v}")
    if args.plot:
        plot_traj(z["gt_c2w_list"], z["estimate_c2w_list"], args.plot,
                  args.scale)
        print(f"saved {args.plot}")


if __name__ == "__main__":
    main()
