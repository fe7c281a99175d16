"""Mesh extraction (capability of src/utils/Mesher.py).

Pipeline (get_mesh, reference Mesher.py:349-574):
  1. uniform evaluation grid over marching_cubes_bound (reference :321-347)
  2. field evaluation on TPU in static chunks (the hot part); out-of-TSDF-hull
     grid nodes get z=100 (reference :422-434); with show_forecast
     (mesh_coarse_level) the grid is instead split seen/forecast/unseen via
     point_masks, forecast evaluated at the coarse stage +0.2, unseen = -100
     (reference :387-419)
  3. level-set extraction at meshing.level_set via the in-repo native C++
     marching-tetrahedra library (replaces skimage marching_cubes — this
     image ships no skimage; see native/marching_tets.cpp)
  4. mesh cleaning (reference :469-510): drop faces whose three vertices are
     all unseen by every keyframe frustum (point_masks, reference :53-212,
     incl. the forecast edge extension, the optional per-pixel depth_test,
     and the use-all-frames variant for the eval mesh), then connected-
     component cleanup — keep the largest component or drop components below
     remove_small_geometry_threshold
  5. vertex coloring: 'direct_point_query' (decoder query at vertices) or
     'render_ray_along_normal' (render a short ray through the vertex,
     reference :526-553 — the iMAP* default); forecast vertices cyan
  6. vertices /= scale; binary PLY export (own writer; no trimesh here)

The per-keyframe frustum projections run as one jitted lax.scan over the
keyframe axis on device (the reference loops keyframes in Python per chunk).
"""

from __future__ import annotations

import ctypes
import functools
import os
import struct
import subprocess
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load_native():
    lib_path = os.path.join(_NATIVE_DIR, "libmarching_tets.so")
    if not os.path.exists(lib_path):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(lib_path)
    lib.mt_extract.restype = ctypes.c_void_p
    lib.mt_extract.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                               ctypes.c_int, ctypes.c_int, ctypes.c_float]
    lib.mt_num_vertices.restype = ctypes.c_long
    lib.mt_num_vertices.argtypes = [ctypes.c_void_p]
    lib.mt_num_triangles.restype = ctypes.c_long
    lib.mt_num_triangles.argtypes = [ctypes.c_void_p]
    lib.mt_copy.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_long)]
    lib.mt_free.argtypes = [ctypes.c_void_p]
    return lib


_LIB = None


def marching_tets(grid: np.ndarray, level: float):
    """Extract the level set of a (Nx, Ny, Nz) scalar grid.

    Returns (verts (V, 3) in grid-index coords, tris (T, 3) int64)."""
    global _LIB
    if _LIB is None:
        _LIB = _load_native()
    g = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = g.shape
    h = _LIB.mt_extract(g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        nx, ny, nz, ctypes.c_float(level))
    try:
        nv = _LIB.mt_num_vertices(h)
        nt = _LIB.mt_num_triangles(h)
        verts = np.empty((nv, 3), np.float32)
        tris = np.empty((nt, 3), np.int64)
        if nv:
            _LIB.mt_copy(h, verts.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)),
                tris.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    finally:
        _LIB.mt_free(h)
    return verts, tris


def write_ply(path: str, verts: np.ndarray, tris: np.ndarray,
              colors: Optional[np.ndarray] = None):
    """Binary little-endian PLY with optional uint8 vertex colors."""
    nv, nt = len(verts), len(tris)
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {nv}",
               "property float x", "property float y", "property float z"]
        if colors is not None:
            hdr += ["property uchar red", "property uchar green",
                    "property uchar blue"]
        hdr += [f"element face {nt}",
                "property list uchar int vertex_indices", "end_header"]
        f.write(("\n".join(hdr) + "\n").encode())
        if colors is not None:
            for v, c in zip(verts, colors):
                f.write(struct.pack("<fffBBB", *v, *c))
        else:
            f.write(np.asarray(verts, "<f4").tobytes())
        face = np.empty((nt, 13), np.uint8)
        face[:, 0] = 3
        face[:, 1:] = np.asarray(tris, "<i4").view(np.uint8).reshape(nt, 12)
        f.write(face.tobytes())


def read_ply(path: str):
    """Read back the PLYs this module writes (verts, tris, colors|None)."""
    with open(path, "rb") as f:
        nv = nt = 0
        has_color = False
        while True:
            line = f.readline().decode().strip()
            if line.startswith("element vertex"):
                nv = int(line.split()[-1])
            elif line.startswith("element face"):
                nt = int(line.split()[-1])
            elif line == "property uchar red":
                has_color = True
            elif line == "end_header":
                break
        if has_color:
            rec = np.dtype([("xyz", "<f4", 3), ("rgb", "u1", 3)])
            data = np.frombuffer(f.read(nv * rec.itemsize), rec)
            verts, colors = data["xyz"].copy(), data["rgb"].copy()
        else:
            verts = np.frombuffer(f.read(nv * 12), "<f4").reshape(nv, 3).copy()
            colors = None
        frec = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
        tris = np.frombuffer(f.read(nt * frec.itemsize), frec)["idx"].copy()
    return verts, tris, colors


def _frustum_masks_fn(H, W, fx, fy, cx, cy, depth_test: bool,
                      use_depth: bool):
    """Jitted (points-chunk, keyframes) -> (seen, forecast) frustum masks.

    Exact mask semantics of the reference point_masks (Mesher.py:53-212):
      seen     = in-image projection (edge 0) with z in front
      forecast = projection within a 1000-px extended edge with z in front
      depth constraint: depth_test samples the keyframe depth bilinearly
        (zeros padding) and requires |proj - d| < 2.4 for seen, proj <
        max(sampled d) for forecast (Mesher.py:160-176); otherwise both
        require proj < 1.1 * max(depth) (Mesher.py:178-191). The
        use-all-frames variant (eval mesh) has no depth data and applies
        no depth constraint (Mesher.py:88-126).
    """

    def bilinear_zeros(img, u, v):
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        fu = u - u0
        fv = v - v0
        u0i = u0.astype(jnp.int32)
        v0i = v0.astype(jnp.int32)
        flat = img.reshape(-1)

        def tap(vi, ui):
            ok = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
            idx = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
            return jnp.where(ok, jnp.take(flat, idx), 0.0)

        return (tap(v0i, u0i) * (1 - fu) * (1 - fv)
                + tap(v0i, u0i + 1) * fu * (1 - fv)
                + tap(v0i + 1, u0i) * (1 - fu) * fv
                + tap(v0i + 1, u0i + 1) * fu * fv)

    @jax.jit
    def masks_chunk(pts, w2c, depths, max_depths, valid):
        """pts (P,3); w2c (K,4,4); depths (K,H,W); max_depths (K,);
        valid (K,) -> seen (P,), forecast (P,)."""

        def body(carry, inp):
            seen, forecast = carry
            T, dep, md, ok = inp
            cam = pts @ T[:3, :3].T + T[:3, 3]
            # reference: cam_cord[:,0] *= -1; uv = K @ cam; z = uv[2]+1e-8
            z = cam[:, 2] + 1e-8
            u = (fx * (-cam[:, 0]) + cx * z) / z
            v = (fy * cam[:, 1] + cy * z) / z
            front = z < 0
            s = (u > 0) & (u < W) & (v > 0) & (v < H) & front
            f = ((u > -1000) & (u < W + 1000) & (v > -1000) & (v < H + 1000)
                 & front)
            if use_depth:
                proj = -cam[:, 2]
                if depth_test:
                    ds = bilinear_zeros(dep, u, v)
                    f = f & (proj < jnp.max(ds))
                    s = s & (proj < ds + 2.4) & (ds - 2.4 < proj)
                else:
                    s = s & (proj < md)
                    f = f & (proj < md)
            seen = seen | (s & ok)
            forecast = forecast | (f & ok)
            return (seen, forecast), None

        init = (jnp.zeros(pts.shape[0], bool), jnp.zeros(pts.shape[0], bool))
        (seen, forecast), _ = jax.lax.scan(body, init,
                                           (w2c, depths, max_depths, valid))
        return seen, forecast

    return masks_chunk


def _eval_chunk_fn(model_cfg, stage: str, what: str):
    """Cached jitted chunk evaluator. Params/grids are ARGUMENTS (a
    closure-captured param pytree is baked into the compiled program as a
    constant, forcing a full 20-40 s recompile at every mesh event). Keyed
    additionally on the live renderer.eval_points identity so test
    monkeypatches get their own trace."""
    from ..render import renderer as R
    return _eval_chunk_cached(R.eval_points, model_cfg, stage, what)


@functools.lru_cache(maxsize=None)
def _eval_chunk_cached(eval_points_fn, model_cfg, stage: str, what: str):
    @jax.jit
    def f(params, c_grid, pts, bound):
        raw = eval_points_fn(params, model_cfg, pts, bound,
                             c_grid=c_grid if c_grid else None, stage=stage)
        return raw[:, :3] if what == "rgb" else raw[:, 3]

    return f


def _render_color_fn(model_cfg, rcfg):
    from ..render import renderer as R
    return _render_color_cached(R.eval_points, model_cfg, rcfg)


@functools.lru_cache(maxsize=None)
def _render_color_cached(eval_points_fn, model_cfg, rcfg):
    # eval_points_fn is only the cache key; render_rays resolves the live
    # (possibly monkeypatched) eval_points from module globals at trace time
    from ..render.renderer import render_rays

    @jax.jit
    def f(params, c_grid, rays_o, rays_d, gt_depth, bound):
        _, _, color, _ = render_rays(params, model_cfg, rcfg, rays_o,
                                     rays_d, bound, None, gt_depth,
                                     c_grid if c_grid else None)
        return color

    return f


def _drain(gen):
    """Run a work generator to completion, returning its return value."""
    while True:
        try:
            next(gen)
        except StopIteration as s:
            return s.value


class _KFView:
    """Snapshot view of the keyframe buffer (jax arrays are immutable and
    the buffer replaces them functionally, so references pin the state)."""

    def __init__(self, kf):
        self._n = len(kf)
        self.est_c2w = kf.est_c2w
        self.depth = kf.depth

    def __len__(self):
        return self._n


class MeshSnapshot:
    """Everything a mesh build reads from the SLAM system, captured at job
    creation so an asynchronously-built mesh reflects the field/poses of
    its trigger frame even while the live system advances."""

    def __init__(self, slam):
        self.params = slam.params
        self.c_grid = dict(slam.c_grid) if slam.c_grid else {}
        self.model_cfg = slam.model_cfg
        self.rcfg = slam.rcfg
        self.bound = slam.bound
        self.H, self.W = slam.H, slam.W
        self.fx, self.fy = slam.fx, slam.fy
        self.cx, self.cy = slam.cx, slam.cy
        self.keyframes = _KFView(slam.keyframes)
        self.estimate_c2w_list = np.array(slam.estimate_c2w_list)


class MeshJob:
    """An in-flight mesh build: a generator that yields after each bounded
    unit of device work, driven by Mesher.tick() from the frame loop
    (SURVEY §7 'careful not to serialize the mapper on mesh frames')."""

    def __init__(self, gen, out_file: str):
        self.gen = gen
        self.out_file = out_file
        self.done = False
        self.result = None

    def tick(self, budget: int = 1) -> bool:
        """Advance up to `budget` work units; True when the job finished."""
        for _ in range(budget):
            try:
                next(self.gen)
            except StopIteration as s:
                self.done = True
                self.result = s.value
                return True
        return False


class Mesher:
    def __init__(self, cfg, slam, points_batch_size: int = 500000):
        m = cfg["meshing"]
        self.resolution = m["resolution"]
        self.level_set = m["level_set"]
        self.clean_mesh = m["clean_mesh"]
        self.clean_mesh_bound_scale = m["clean_mesh_bound_scale"]
        self.color_method = m["color_mesh_extraction_method"]
        self.mesh_freq = cfg["mapping"]["mesh_freq"]
        self.eval_rec = m["eval_rec"]
        self.depth_test = m.get("depth_test", False)
        self.get_largest_components = m.get("get_largest_components", False)
        self.remove_small_geometry_threshold = m.get(
            "remove_small_geometry_threshold", 0.2)
        self.mesh_coarse_level = m.get("mesh_coarse_level", False)
        self.points_batch_size = points_batch_size
        self.bound = np.array(cfg["mapping"]["marching_cubes_bound"],
                              np.float32) * cfg["scale"]
        self.scale = cfg["scale"]
        self.verbose = cfg["verbose"]
        self._masks_fns = {}
        # async meshing: periodic meshes are built incrementally, a few
        # device chunks per frame, instead of stalling the frame loop for
        # the whole build (VERDICT r2: a synchronous 256^3 mesh cost
        # minutes inline). `meshing.chunks_per_frame` bounds the per-frame
        # device work; `meshing.async: false` restores synchronous builds.
        self.async_mesh = m.get("async", True)
        self.chunks_per_frame = m.get("chunks_per_frame", 4)
        # final_mesh: false suppresses the end-of-run mesh (set by the
        # supervisor's chunked attempts, whose last frame is not the
        # sequence end)
        self.final_mesh = m.get("final_mesh", True)
        self._job: Optional[MeshJob] = None

    # -- grid ---------------------------------------------------------------
    def get_grid_uniform(self):
        """Uniform grid over the marching-cubes bound; `resolution` cells on
        the longest axis (reference get_grid_uniform, Mesher.py:321-347)."""
        b = self.bound
        lengths = b[:, 1] - b[:, 0]
        step = float(lengths.max()) / self.resolution
        axes = [np.arange(b[i, 0], b[i, 1] + 1e-6, step, dtype=np.float32)
                for i in range(3)]
        return axes

    def _eval_grid_gen(self, slam, pts: np.ndarray, stage: str = "fine"):
        """Field evaluation at (N, 3) points; yields once per device chunk
        (one bounded unit of work for the async frame-loop driver)."""
        n = pts.shape[0]
        out = np.zeros((n,), np.float32)
        if n == 0:
            return out
        chunk = min(self.points_batch_size, 1 << max(n - 1, 1).bit_length())
        fn = _eval_chunk_fn(slam.model_cfg, stage, "occ")
        c_grid = getattr(slam, "c_grid", {}) or {}
        for i in range(0, n, chunk):
            p = pts[i:i + chunk].astype(np.float32)
            m = len(p)
            if m < chunk:
                p = np.concatenate([p, np.zeros((chunk - m, 3), np.float32)])
            vals = fn(slam.params, c_grid, jnp.asarray(p), slam.bound)
            out[i:i + m] = np.asarray(vals)[:m]
            yield
        return out

    def eval_grid(self, slam, pts: np.ndarray, stage: str = "fine"
                  ) -> np.ndarray:
        """Synchronous wrapper over _eval_grid_gen."""
        return _drain(self._eval_grid_gen(slam, pts, stage))

    def grid_points(self, axes) -> np.ndarray:
        gx, gy, gz = np.meshgrid(*axes, indexing="ij")
        return np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)

    # -- masks ----------------------------------------------------------------
    def point_masks(self, slam, points: np.ndarray,
                    use_all_frames: bool = False, cur_idx: int = None):
        """Synchronous wrapper over _point_masks_gen."""
        return _drain(self._point_masks_gen(slam, points, use_all_frames,
                                            cur_idx))

    def _point_masks_gen(self, slam, points: np.ndarray,
                         use_all_frames: bool = False, cur_idx: int = None):
        """Split points into (seen, forecast, unseen) by keyframe frustums
        (reference point_masks, Mesher.py:53-212). With use_all_frames the
        poses are every estimated frame pose up to cur_idx and no depth
        constraint applies (the eval-mesh variant, Mesher.py:88-126).
        Yields once per device chunk."""
        n = len(points)
        if use_all_frames:
            end = (cur_idx + 1) if cur_idx is not None else len(
                slam.estimate_c2w_list)
            c2ws = np.asarray(slam.estimate_c2w_list[:end], np.float32)
            c2ws = c2ws[np.abs(c2ws).sum(axis=(1, 2)) > 0]
            if len(c2ws) == 0:
                z = np.zeros(n, bool)
                return np.ones(n, bool), z, z
            w2c = jnp.asarray(np.linalg.inv(c2ws))
            K = len(c2ws)
            depths = jnp.zeros((K, 1, 1), jnp.float32)
            max_depths = jnp.zeros((K,), jnp.float32)
            use_depth = False
        else:
            n_kf = len(slam.keyframes)
            if n_kf == 0:
                z = np.zeros(n, bool)
                return np.ones(n, bool), z, z
            from ..core.se3 import camera_from_tensor, to_homogeneous
            c2ws = np.asarray(to_homogeneous(
                camera_from_tensor(slam.keyframes.est_c2w[:n_kf])))
            w2c = jnp.asarray(np.linalg.inv(c2ws).astype(np.float32))
            depths = slam.keyframes.depth[:n_kf]
            max_depths = jnp.max(depths.reshape(n_kf, -1), axis=1) * 1.1
            use_depth = True

        key = (use_depth, self.depth_test and use_depth)
        if key not in self._masks_fns:
            self._masks_fns[key] = _frustum_masks_fn(
                slam.H, slam.W, slam.fx, slam.fy, slam.cx, slam.cy,
                depth_test=key[1], use_depth=key[0])
        fn = self._masks_fns[key]
        # pad the keyframe axis to the next multiple of 16 so the jitted
        # scan does not retrace (20-40 s TPU compile) every time a keyframe
        # lands between mesh events
        K = int(w2c.shape[0])
        K_pad = (-K) % 16
        if K_pad:
            w2c = jnp.concatenate(
                [w2c, jnp.tile(jnp.eye(4, dtype=w2c.dtype)[None],
                               (K_pad, 1, 1))], 0)
            depths = jnp.concatenate(
                [depths, jnp.zeros((K_pad,) + depths.shape[1:],
                                   depths.dtype)], 0)
            max_depths = jnp.concatenate(
                [max_depths, jnp.zeros((K_pad,), max_depths.dtype)], 0)
        valid = jnp.arange(K + K_pad) < K

        seen = np.zeros(n, bool)
        forecast = np.zeros(n, bool)
        chunk = self.points_batch_size
        for i in range(0, n, chunk):
            p = points[i:i + chunk].astype(np.float32)
            m = len(p)
            # pad to the next power of two: bounded trace count across mesh
            # events with varying vertex counts
            m_pad = 1 << max(m - 1, 1).bit_length()
            if m_pad > m:
                p = np.concatenate([p, np.zeros((m_pad - m, 3), np.float32)])
            s, f = fn(jnp.asarray(p), w2c, depths, max_depths, valid)
            seen[i:i + chunk] = np.asarray(s)[:m]
            forecast[i:i + chunk] = np.asarray(f)[:m]
            yield
        forecast &= ~seen
        unseen = ~(seen | forecast)
        return seen, forecast, unseen

    def bound_hull(self, slam):
        """TSDF-fused convex-hull scene bound (get_bound_from_frames
        capability, Mesher.py:214-279). None when unavailable."""
        n_kf = len(slam.keyframes)
        if n_kf == 0:
            return None
        try:
            from ..core.se3 import camera_from_tensor, to_homogeneous
            from .tsdf import scene_bound_hull
            import jax.numpy as jnp
            depths = slam.keyframes.depth[:n_kf]
            c2ws = to_homogeneous(
                camera_from_tensor(slam.keyframes.est_c2w[:n_kf]))
            return scene_bound_hull(
                depths, c2ws, slam.fx, slam.fy, slam.cx, slam.cy,
                np.asarray(slam.bound),
                scale=self.clean_mesh_bound_scale)
        except Exception as e:
            if self.verbose:
                print(f"Mesher: TSDF hull unavailable ({e})")
            return None

    # -- color ------------------------------------------------------------------
    def color_vertices(self, slam, verts_world, tris):
        """Synchronous wrapper over _color_gen."""
        return _drain(self._color_gen(slam, verts_world, tris))

    def _color_gen(self, slam, verts_world, tris):
        n = len(verts_world)
        c_grid = getattr(slam, "c_grid", {}) or {}
        if self.color_method == "direct_point_query":
            chunk = min(self.points_batch_size,
                        1 << max(n - 1, 1).bit_length())
            fn = _eval_chunk_fn(slam.model_cfg, "color", "rgb")
            rgb = np.zeros((n, 3), np.float32)
            for i in range(0, n, chunk):
                p = verts_world[i:i + chunk].astype(np.float32)
                m = len(p)
                if m < chunk:
                    p = np.concatenate(
                        [p, np.zeros((chunk - m, 3), np.float32)])
                rgb[i:i + m] = np.asarray(
                    fn(slam.params, c_grid, jnp.asarray(p), slam.bound))[:m]
                yield
        else:  # render_ray_along_normal (iMAP* default, Mesher.py:526-553)
            normals = vertex_normals(verts_world, tris)
            rays_o = (verts_world - 0.1 * normals).astype(np.float32)
            rays_d = normals.astype(np.float32)
            rgb = np.zeros((n, 3), np.float32)
            chunk = min(65536, 1 << max(n - 1, 1).bit_length())
            fn = _render_color_fn(slam.model_cfg, slam.rcfg)
            gt_depth = jnp.full((chunk,), 0.1 * 1.2, jnp.float32)
            for i in range(0, n, chunk):
                o = rays_o[i:i + chunk]
                d = rays_d[i:i + chunk]
                m = len(o)
                if m < chunk:
                    pad = np.zeros((chunk - m, 3), np.float32)
                    o = np.concatenate([o, pad])
                    d = np.concatenate([d, pad + 1e-3])
                c = fn(slam.params, c_grid, jnp.asarray(o), jnp.asarray(d),
                       gt_depth, slam.bound)
                rgb[i:i + m] = np.asarray(c)[:m]
                yield
        return np.clip(rgb * 255, 0, 255).astype(np.uint8)

    # -- main -----------------------------------------------------------------
    def get_mesh(self, slam, out_file: str, clean: Optional[bool] = None,
                 show_forecast: Optional[bool] = None,
                 use_all_frames: bool = False, cur_idx: int = None):
        """Build a mesh synchronously (drains the incremental generator)."""
        view = slam if isinstance(slam, MeshSnapshot) else MeshSnapshot(slam)
        return _drain(self._mesh_gen(view, out_file, clean, show_forecast,
                                     use_all_frames, cur_idx))

    def _mesh_gen(self, view: "MeshSnapshot", out_file: str,
                  clean: Optional[bool] = None,
                  show_forecast: Optional[bool] = None,
                  use_all_frames: bool = False, cur_idx: int = None):
        """The full mesh pipeline as a generator: each yield is one bounded
        unit of work (one device chunk, or one host-thread poll), so the
        frame loop can interleave mesh building with tracking/mapping."""
        show_forecast = (self.mesh_coarse_level if show_forecast is None
                         else show_forecast)
        axes = self.get_grid_uniform()
        pts = self.grid_points(axes)

        if show_forecast:
            # seen at 'fine', forecast at 'coarse' + 0.2, unseen = -100
            # (reference Mesher.py:387-419)
            seen, forecast, unseen = yield from self._point_masks_gen(
                view, pts, use_all_frames=use_all_frames, cur_idx=cur_idx)
            occ = np.full(len(pts), -100.0, np.float32)
            occ[seen] = yield from self._eval_grid_gen(view, pts[seen],
                                                       stage="fine")
            occ[forecast] = (yield from self._eval_grid_gen(
                view, pts[forecast], stage="coarse")) + 0.2
        else:
            occ = yield from self._eval_grid_gen(view, pts, stage="fine")
            hull = self.bound_hull(view)
            yield
            if hull is not None:
                # out-of-hull grid nodes become the occupied sentinel so no
                # free-space surface forms there (reference Mesher.py:422-434)
                occ[~hull(pts)] = 100.0
        occ = occ.reshape(len(axes[0]), len(axes[1]), len(axes[2]))

        # level-set extraction: pure C++/numpy, no device work -> safe on a
        # worker thread even on the single-client axon runtime
        mc_out = {}

        def _mc():
            mc_out["vt"] = marching_tets(occ, self.level_set)

        th = threading.Thread(target=_mc, daemon=True)
        th.start()
        while th.is_alive():
            th.join(timeout=0.05)
            yield
        verts_idx, tris = mc_out["vt"]
        if len(verts_idx) == 0:
            print("Mesher: no surface extracted at level "
                  f"{self.level_set}")
            return None
        # grid-index -> world
        origin = np.array([axes[0][0], axes[1][0], axes[2][0]])
        step = axes[0][1] - axes[0][0]
        verts = origin + verts_idx * step

        if clean if clean is not None else self.clean_mesh:
            if show_forecast:
                # drop faces fully outside the TSDF hull (reference :474-489)
                hull = self.bound_hull(view)
                yield
                if hull is not None:
                    verts, tris = cull_faces(verts, tris, ~hull(verts))
            else:
                # drop faces whose three vertices are all unseen (:490-498)
                seen, _, _ = yield from self._point_masks_gen(
                    view, verts, use_all_frames=use_all_frames,
                    cur_idx=cur_idx)
                verts, tris = cull_faces(verts, tris, ~seen)
            if len(tris):
                verts, tris = clean_components(
                    verts, tris, self.get_largest_components,
                    self.remove_small_geometry_threshold * self.scale
                    * self.scale)
        if len(verts) == 0 or len(tris) == 0:
            print("Mesher: all vertices culled")
            return None

        colors = yield from self._color_gen(view, verts, tris)
        if show_forecast:
            # cyan forecast region (reference Mesher.py:556-562)
            _, forecast_v, _ = yield from self._point_masks_gen(
                view, verts, use_all_frames=use_all_frames, cur_idx=cur_idx)
            colors[forecast_v] = np.array([0, 255, 255], np.uint8)
        verts_out = verts / self.scale
        write_ply(out_file, verts_out.astype(np.float32), tris, colors)
        if self.verbose:
            print(f"Mesher: wrote {out_file} ({len(verts)} verts, "
                  f"{len(tris)} tris)")
        return verts_out, tris, colors

    # -- scheduling -----------------------------------------------------------
    def flush(self, slam=None):
        """Drain any in-flight mesh job to completion."""
        if self._job is not None:
            while not self._job.tick(64):
                pass
            self._job = None

    def maybe_mesh(self, slam, idx: int):
        """Frame-loop hook: start a mesh job at mesh cadence and advance any
        in-flight job by a bounded budget; the final frame drains
        synchronously (reference cadence Mapper.py:912-930)."""
        final = idx == slam.n_img - 1 and self.final_mesh
        mesh_frame = (idx % self.mesh_freq == 0 and idx != 0
                      and idx % slam.ecfg.every_frame == 0)
        if mesh_frame and not final:
            self.flush(slam)  # a still-running previous mesh finishes first
            out = os.path.join(slam.output, "mesh", f"{idx:05d}_mesh.ply")
            job = MeshJob(self._mesh_gen(MeshSnapshot(slam), out,
                                         cur_idx=idx), out)
            if self.async_mesh:
                self._job = job
                job.tick(self.chunks_per_frame)
            else:
                while not job.tick(64):
                    pass
        elif self._job is not None:
            if self._job.tick(self.chunks_per_frame):
                self._job = None
        if final:
            self.flush(slam)
            out = os.path.join(slam.output, "mesh", f"{idx:05d}_mesh.ply")
            self.get_mesh(slam, out, cur_idx=idx)
            import shutil
            fin = os.path.join(slam.output, "mesh", "final_mesh.ply")
            if os.path.exists(out):
                shutil.copy(out, fin)
            if self.eval_rec:
                # eval mesh: all-frame masks, no forecast (Mapper.py:925-929)
                self.get_mesh(slam, os.path.join(
                    slam.output, "mesh", "final_mesh_eval_rec.ply"),
                    clean=True, show_forecast=False, use_all_frames=True,
                    cur_idx=idx)


def vertex_normals(verts: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals."""
    n = np.zeros_like(verts)
    a = verts[tris[:, 0]]
    b = verts[tris[:, 1]]
    c = verts[tris[:, 2]]
    fn = np.cross(b - a, c - a)
    for k in range(3):
        np.add.at(n, tris[:, k], fn)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    return n / np.maximum(norm, 1e-12)


def filter_mesh(verts, tris, keep_verts):
    """Keep faces whose three vertices survive; reindex."""
    remap = -np.ones(len(verts), np.int64)
    remap[keep_verts] = np.arange(keep_verts.sum())
    face_ok = keep_verts[tris].all(axis=1)
    new_tris = remap[tris[face_ok]]
    return verts[keep_verts], new_tris


def _drop_unreferenced(verts, tris):
    used = np.zeros(len(verts), bool)
    used[tris.reshape(-1)] = True
    remap = -np.ones(len(verts), np.int64)
    remap[used] = np.arange(used.sum())
    return verts[used], remap[tris]


def cull_faces(verts, tris, drop_verts):
    """Remove faces whose three vertices are ALL in the drop set (the
    reference's update_faces(~face_mask) with face_mask =
    mask[faces].all(axis=1), Mesher.py:487-497), then drop unreferenced
    vertices."""
    face_drop = drop_verts[tris].all(axis=1)
    return _drop_unreferenced(verts, tris[~face_drop])


def face_areas(verts, tris):
    a = verts[tris[:, 0]]
    b = verts[tris[:, 1]]
    c = verts[tris[:, 2]]
    return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)


def clean_components(verts, tris, get_largest: bool, area_threshold: float):
    """Connected-component mesh cleanup (reference Mesher.py:500-510):
    keep the largest-area component (get_largest_components) or drop
    components with area <= remove_small_geometry_threshold * scale^2.
    Components over vertex-shared faces (trimesh.split(only_watertight=False)
    equivalent) via scipy union-find."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    V = len(verts)
    if V == 0 or len(tris) == 0:
        return verts, tris
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]], 0)
    adj = sp.coo_matrix((np.ones(len(e), np.int8), (e[:, 0], e[:, 1])),
                        shape=(V, V))
    n_comp, labels = connected_components(adj, directed=False)
    fa = face_areas(verts, tris)
    f_label = labels[tris[:, 0]]
    comp_area = np.bincount(f_label, weights=fa, minlength=n_comp)
    if get_largest:
        keep = f_label == int(comp_area.argmax())
    else:
        keep = comp_area[f_label] > area_threshold
    return _drop_unreferenced(verts, tris[keep])
