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
import os
import struct
import subprocess
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

    def eval_grid(self, slam, pts: np.ndarray, stage: str = "fine",
                  raw_col: int = 3) -> np.ndarray:
        """Field evaluation at (N, 3) points, chunked on device."""
        from ..render.renderer import eval_points

        n = pts.shape[0]
        if n == 0:
            return np.zeros((0,), np.float32)
        chunk = min(self.points_batch_size, max(n, 1))
        n_pad = (-n) % chunk
        pts_p = np.concatenate(
            [pts.astype(np.float32), np.zeros((n_pad, 3), np.float32)], 0)
        pts_p = jnp.asarray(pts_p).reshape(-1, chunk, 3)

        @jax.jit
        def eval_chunk(p):
            return eval_points(slam.params, slam.model_cfg, p, slam.bound,
                               c_grid=slam.c_grid or None,
                               stage=stage)[:, raw_col]

        vals = jax.lax.map(eval_chunk, pts_p)
        return np.asarray(vals).reshape(-1)[:n].copy()

    def grid_points(self, axes) -> np.ndarray:
        gx, gy, gz = np.meshgrid(*axes, indexing="ij")
        return np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)

    # -- masks ----------------------------------------------------------------
    def point_masks(self, slam, points: np.ndarray,
                    use_all_frames: bool = False, cur_idx: int = None):
        """Split points into (seen, forecast, unseen) by keyframe frustums
        (reference point_masks, Mesher.py:53-212). With use_all_frames the
        poses are every estimated frame pose up to cur_idx and no depth
        constraint applies (the eval-mesh variant, Mesher.py:88-126)."""
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
        from ..render.renderer import eval_points, render_rays

        if self.color_method == "direct_point_query":
            v = jnp.asarray(verts_world, jnp.float32)
            raw = []
            chunk = self.points_batch_size
            for i in range(0, len(verts_world), chunk):
                raw.append(np.asarray(
                    eval_points(slam.params, slam.model_cfg, v[i:i + chunk],
                                slam.bound)[:, :3]))
            rgb = np.concatenate(raw, 0) if raw else np.zeros((0, 3))
        else:  # render_ray_along_normal (iMAP* default, Mesher.py:526-553)
            normals = vertex_normals(verts_world, tris)
            rays_o = verts_world - 0.1 * normals
            rays_d = normals.astype(np.float32)
            gt_depth = np.full((len(verts_world),), 0.1 * 1.2, np.float32)
            rgb = np.zeros((len(verts_world), 3), np.float32)
            chunk = 65536
            for i in range(0, len(verts_world), chunk):
                _, _, c, _ = render_rays(
                    slam.params, slam.model_cfg, slam.rcfg,
                    jnp.asarray(rays_o[i:i + chunk], jnp.float32),
                    jnp.asarray(rays_d[i:i + chunk]), slam.bound, None,
                    jnp.asarray(gt_depth[i:i + chunk]))
                rgb[i:i + chunk] = np.asarray(c)
        return np.clip(rgb * 255, 0, 255).astype(np.uint8)

    # -- main -----------------------------------------------------------------
    def get_mesh(self, slam, out_file: str, clean: Optional[bool] = None,
                 show_forecast: Optional[bool] = None,
                 use_all_frames: bool = False, cur_idx: int = None):
        show_forecast = (self.mesh_coarse_level if show_forecast is None
                         else show_forecast)
        axes = self.get_grid_uniform()
        pts = self.grid_points(axes)

        if show_forecast:
            # seen at 'fine', forecast at 'coarse' + 0.2, unseen = -100
            # (reference Mesher.py:387-419)
            seen, forecast, unseen = self.point_masks(
                slam, pts, use_all_frames=use_all_frames, cur_idx=cur_idx)
            occ = np.full(len(pts), -100.0, np.float32)
            occ[seen] = self.eval_grid(slam, pts[seen], stage="fine")
            occ[forecast] = self.eval_grid(slam, pts[forecast],
                                           stage="coarse") + 0.2
        else:
            occ = self.eval_grid(slam, pts, stage="fine")
            hull = self.bound_hull(slam)
            if hull is not None:
                # out-of-hull grid nodes become the occupied sentinel so no
                # free-space surface forms there (reference Mesher.py:422-434)
                occ[~hull(pts)] = 100.0
        occ = occ.reshape(len(axes[0]), len(axes[1]), len(axes[2]))

        verts_idx, tris = marching_tets(occ, self.level_set)
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
                hull = self.bound_hull(slam)
                if hull is not None:
                    verts, tris = cull_faces(verts, tris, ~hull(verts))
            else:
                # drop faces whose three vertices are all unseen (:490-498)
                seen, _, _ = self.point_masks(
                    slam, verts, use_all_frames=use_all_frames,
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

        colors = self.color_vertices(slam, verts, tris)
        if show_forecast:
            # cyan forecast region (reference Mesher.py:556-562)
            _, forecast_v, _ = self.point_masks(
                slam, verts, use_all_frames=use_all_frames, cur_idx=cur_idx)
            colors[forecast_v] = np.array([0, 255, 255], np.uint8)
        verts_out = verts / self.scale
        write_ply(out_file, verts_out.astype(np.float32), tris, colors)
        if self.verbose:
            print(f"Mesher: wrote {out_file} ({len(verts)} verts, "
                  f"{len(tris)} tris)")
        return verts_out, tris, colors

    def maybe_mesh(self, slam, idx: int):
        final = idx == slam.n_img - 1
        if (idx % self.mesh_freq == 0 and idx != 0
                and idx % slam.ecfg.every_frame == 0) or final:
            out = os.path.join(slam.output, "mesh", f"{idx:05d}_mesh.ply")
            self.get_mesh(slam, out, cur_idx=idx)
            if final:
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
