"""2D diagnostic drawing: keypoints, match lines, feature trails.

Capability of the reference's GL/pygame-free drawing helpers
(src/utils/utils_draw.py:29-169 draw_points/draw_lines/
combine_images_horizontally/draw_feature_matches, and
src/frame.py:535-576 draw_feature_trails), re-implemented in pure numpy so
the headless image needs no cv2/pygame: lines are rasterized by dense
parametric sampling, circles by disk masks. Colors cycle a fixed palette
like the reference's per-match random colors (seeded, reproducible).

The MatchVisualizer writes {output}/matches_vis/{idx:05d}.jpg panels of the
front-end's two-view matches at the tracking vis cadence — the offline
replacement for the reference's interactive Display2D/viewer windows.
"""

from __future__ import annotations

import os

import numpy as np

_PALETTE = np.array([
    [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
    [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
    [210, 245, 60], [250, 190, 190], [0, 128, 128], [170, 110, 40],
], np.uint8)


def _as_u8_rgb(img: np.ndarray) -> np.ndarray:
    """Accept float [0,1] or uint8, gray or rgb; return (H, W, 3) uint8."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(a * 255.0, 0, 255).astype(np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, -1)
    return np.ascontiguousarray(a[..., :3])


def draw_points(img, pts, radius: int = 3, colors=None) -> np.ndarray:
    """Filled circles at (N, 2) pixel coords (x, y) (utils_draw.py:29-37)."""
    out = _as_u8_rgb(img).copy()
    H, W = out.shape[:2]
    pts = np.asarray(pts)
    if len(pts) == 0:
        return out
    dy, dx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    disk = (dx * dx + dy * dy) <= radius * radius
    offs = np.stack([dx[disk], dy[disk]], -1)  # (M, 2) x,y offsets
    for k, (x, y) in enumerate(pts[:, :2]):
        c = _PALETTE[k % len(_PALETTE)] if colors is None \
            else np.asarray(colors[k], np.uint8)
        xx = np.clip(int(round(x)) + offs[:, 0], 0, W - 1)
        yy = np.clip(int(round(y)) + offs[:, 1], 0, H - 1)
        out[yy, xx] = c
    return out


def draw_lines(img, line_edges, radius: int = 1, colors=None) -> np.ndarray:
    """Line segments ((N, 4): x1,y1,x2,y2) by dense parametric sampling
    (utils_draw.py:52-64)."""
    out = _as_u8_rgb(img).copy()
    H, W = out.shape[:2]
    edges = np.asarray(line_edges, np.float32).reshape(-1, 4)
    for k, (x1, y1, x2, y2) in enumerate(edges):
        c = _PALETTE[k % len(_PALETTE)] if colors is None \
            else np.asarray(colors[k], np.uint8)
        n = int(max(abs(x2 - x1), abs(y2 - y1), 1)) * 2 + 1
        t = np.linspace(0.0, 1.0, n)
        xs = np.clip(np.round(x1 + (x2 - x1) * t).astype(int), 0, W - 1)
        ys = np.clip(np.round(y1 + (y2 - y1) * t).astype(int), 0, H - 1)
        for r in range(-radius + 1, radius):
            out[np.clip(ys + r, 0, H - 1), xs] = c
            out[ys, np.clip(xs + r, 0, W - 1)] = c
        out[ys, xs] = c
    return out


def combine_images_horizontally(img1, img2) -> np.ndarray:
    """Side-by-side canvas, height-padded (utils_draw.py:66-78)."""
    a = _as_u8_rgb(img1)
    b = _as_u8_rgb(img2)
    H = max(a.shape[0], b.shape[0])
    canvas = np.zeros((H, a.shape[1] + b.shape[1], 3), np.uint8)
    canvas[: a.shape[0], : a.shape[1]] = a
    canvas[: b.shape[0], a.shape[1]:] = b
    return canvas


def combine_images_vertically(img1, img2) -> np.ndarray:
    """Stacked canvas, width-padded (utils_draw.py:80-98)."""
    a = _as_u8_rgb(img1)
    b = _as_u8_rgb(img2)
    W = max(a.shape[1], b.shape[1])
    canvas = np.zeros((a.shape[0] + b.shape[0], W, 3), np.uint8)
    canvas[: a.shape[0], : a.shape[1]] = a
    canvas[a.shape[0]:, : b.shape[1]] = b
    return canvas


def draw_feature_matches(img1, img2, kps1, kps2, horizontal: bool = True,
                         radius: int = 3) -> np.ndarray:
    """Match panel: both images combined, matched keypoints circled and
    connected, one palette color per match (utils_draw.py:100-169)."""
    kps1 = np.asarray(kps1, np.float32).reshape(-1, 2)
    kps2 = np.asarray(kps2, np.float32).reshape(-1, 2)
    if horizontal:
        canvas = combine_images_horizontally(img1, img2)
        off = np.array([_as_u8_rgb(img1).shape[1], 0], np.float32)
    else:
        canvas = combine_images_vertically(img1, img2)
        off = np.array([0, _as_u8_rgb(img1).shape[0]], np.float32)
    k2 = kps2 + off
    edges = np.concatenate([kps1, k2], -1)
    canvas = draw_lines(canvas, edges)
    canvas = draw_points(canvas, kps1, radius)
    canvas = draw_points(canvas, k2, radius)
    return canvas


def draw_feature_trails(img, trails, radius: int = 2,
                        trail_max_length: int = 9) -> np.ndarray:
    """Keypoint motion trails (src/frame.py:535-576): for each track, a
    circle at the newest position and a fading polyline through up to
    trail_max_length previous positions."""
    out = _as_u8_rgb(img).copy()
    for k, trail in enumerate(trails):
        t = np.asarray(trail, np.float32).reshape(-1, 2)
        if len(t) == 0:
            continue
        t = t[-(trail_max_length + 1):]
        color = _PALETTE[k % len(_PALETTE)]
        if len(t) > 1:
            segs = np.concatenate([t[:-1], t[1:]], -1)
            cols = [np.clip(color.astype(int) * (0.4 + 0.6 * (i + 1)
                                                 / len(segs)), 0,
                            255).astype(np.uint8)
                    for i in range(len(segs))]
            out = draw_lines(out, segs, colors=cols)
        out = draw_points(out, t[-1:][:, :2], radius,
                          colors=[color])
    return out


def save_image(path: str, img: np.ndarray):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.imsave(path, _as_u8_rgb(img))


class MatchVisualizer:
    """Writes front-end two-view match panels at a fixed cadence, from the
    SparseFrontend's last_debug record (offline stand-in for the
    reference's Display2D match window, src/Tracker.py:813-821)."""

    def __init__(self, freq: int, out_dir: str, verbose: bool = False):
        self.freq = max(int(freq), 1)
        self.out_dir = out_dir
        self.verbose = verbose
        os.makedirs(out_dir, exist_ok=True)

    def vis(self, slam, idx: int):
        fe = getattr(slam, "frontend", None)
        dbg = getattr(fe, "last_debug", None) if fe is not None else None
        if dbg is None or idx % self.freq != 0 or dbg.get("cur_idx") != idx:
            return
        _, img_ref, _, _ = slam.frame_reader[dbg["ref_idx"]]
        _, img_cur, _, _ = slam.frame_reader[dbg["cur_idx"]]
        acc = dbg["accept"]
        panel = draw_feature_matches(img_ref, img_cur,
                                     dbg["kps_ref"][acc], dbg["kps_cur"][acc])
        path = os.path.join(self.out_dir, f"{idx:05d}.jpg")
        save_image(path, panel)
        if self.verbose:
            print(f"MatchVisualizer: wrote {path} ({int(acc.sum())} "
                  f"matches)")


class TrajectoryWriter:
    """Offline top-down trajectory + map view (the viewer3D capability,
    src/utils/viewer3D.py:25-210, rendered to images instead of a pangolin
    window): estimated vs gt camera trails in the XZ ground plane, current
    camera marked, persistent-map points overlaid when a front-end map is
    live. Writes {output}/traj_vis/{idx:05d}.png at the given cadence."""

    def __init__(self, freq: int, out_dir: str, verbose: bool = False):
        self.freq = max(int(freq), 1)
        self.out_dir = out_dir
        self.verbose = verbose
        os.makedirs(out_dir, exist_ok=True)

    def vis(self, slam, idx: int):
        if idx % self.freq != 0 or idx == 0:
            return
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        est = np.asarray(slam.estimate_c2w_list[: idx + 1])
        gt = np.asarray(slam.gt_c2w_list[: idx + 1])
        fig, ax = plt.subplots(figsize=(5, 5))
        fe = getattr(slam, "frontend", None)
        if fe is not None and getattr(fe, "map", None) is not None:
            pts = [mp.pt for mp in fe.map.points if not mp.is_bad]
            if pts:
                p = np.stack(pts)
                ax.scatter(p[:, 0], p[:, 2], s=1, c="0.75",
                           label=f"map ({len(p)} pts)")
        ax.plot(gt[:, 0, 3], gt[:, 2, 3], "g-", lw=1, label="gt")
        ax.plot(est[:, 0, 3], est[:, 2, 3], "r-", lw=1, label="estimate")
        ax.plot(est[idx, 0, 3], est[idx, 2, 3], "r^", ms=8)
        ax.set_aspect("equal")
        ax.legend(loc="upper right", fontsize=7)
        ax.set_title(f"frame {idx}")
        path = os.path.join(self.out_dir, f"{idx:05d}.png")
        fig.savefig(path, dpi=90)
        plt.close(fig)
        if self.verbose:
            print(f"TrajectoryWriter: wrote {path}")


class LossCurveWriter:
    """Offline optimization-loss curves (the mplot_thread capability,
    src/utils/mplot_thread.py:48-210, rendered to one updating PNG):
    per-event start/end mapping loss and first/best tracking loss over
    frames. Device arrays in slam.loss_log are pulled only here."""

    def __init__(self, freq: int, out_dir: str, verbose: bool = False):
        self.freq = max(int(freq), 1)
        self.out_dir = out_dir
        self.verbose = verbose
        os.makedirs(out_dir, exist_ok=True)

    def vis(self, slam, idx: int):
        log = getattr(slam, "loss_log", None)
        if log is None or idx % self.freq != 0 or idx == 0:
            return
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(9, 3.5))
        if log["mapping"]:
            fr = [i for i, _ in log["mapping"]]
            first = [float(np.asarray(l)[0]) for _, l in log["mapping"]]
            last = [float(np.asarray(l)[-1]) for _, l in log["mapping"]]
            axes[0].plot(fr, first, "0.7", label="start")
            axes[0].plot(fr, last, "b", label="end")
            axes[0].set_yscale("log")
            axes[0].set_title("mapping loss / event")
            axes[0].legend(fontsize=7)
        if log["tracking"]:
            fr = [i for i, _, _ in log["tracking"]]
            first = [float(f) for _, f, _ in log["tracking"]]
            best = [float(b) for _, _, b in log["tracking"]]
            axes[1].plot(fr, first, "0.7", label="first")
            axes[1].plot(fr, best, "b", label="best")
            axes[1].set_yscale("log")
            axes[1].set_title("tracking loss / frame")
            axes[1].legend(fontsize=7)
        fig.tight_layout()
        path = os.path.join(self.out_dir, "loss_curves.png")
        fig.savefig(path, dpi=90)
        plt.close(fig)
        if self.verbose:
            print(f"LossCurveWriter: wrote {path}")
