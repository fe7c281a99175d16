"""Fused value-and-grad for the flagship render losses.

One optimization iteration = two Pallas TPU kernels with a thin XLA middle:

  [p1 kernel]  stratified pass-1 sigma (forward-only, parallel grid)
  [XLA]        compositing weights -> inverse-CDF resample -> merge-sort
               (pure-jnp one-hot helpers; in-kernel this machinery measured
               2.1 ms/iter on the VPU, in XLA it is noise)
  [main kernel] regulation + importance sweeps -> composite -> per-ray loss
               cotangents -> manual MLP backward -> all gradients

Against the two-kernel megakernel (ops/megakernel.py, custom-VJP pair) the
main kernel removes ALL backward recompute: pass-2 and regulation
activations stay resident in VMEM scratch between the forward sweep and the
backward sweep, so the FLOP count drops to the theoretical fwd + 2x-bwd
minimum (the XLA path's count) while keeping the fused memory traffic
(HBM sees rays, z-planes, loss/grads — none of the (N*S, 256) activation
streams that bound the XLA path).

This is possible because the flagship losses are per-ray decomposable
(handle_dynamic=False in the reference flagship configs - reference
configs/pointNeRF_slam.yaml:48, configs/imap.yaml:32):

  mapper  (reference src/Mapper.py:560-575, engine/mapper.py loss_fn):
     sum |gt_d - dep| * (gt_d>0) * ray_w
   + w_color * sum |gt_c - col| * ray_w
   + w_reg   * sum |sigma_reg|  * ray_w          (free-space regulation)

  tracker (reference src/Tracker.py:304-331, engine/tracker.py loss_fn):
     sum |gt_d - dep| / sqrt(stopgrad(var) + 1e-10) * (gt_d>0)
   + w_color * sum |gt_c - col| * (gt_d>0)       (no regulation term)

Their output-cotangents are elementwise closed forms (d|x|/dx = sign(x),
sign(0) = 0 exactly as jnp.abs's VJP), so the kernel derives them in-VMEM
and runs the manual MLP backward immediately.

Gradient structure mirrors ops/megakernel.py: sample_pdf / merge-sort /
ray_far_bound are stop-gradient, pass 1 carries zero gradient, z values are
constants; camera gradients leave the kernel as d(loss)/d(rays_o, rays_d)
and the caller chains them through its ray-generation VJP (cams -> rays is
cheap XLA math).

Capability of /root/reference/src/utils/Renderer.py:85-201 +
src/common.py:204-245 + the loss sites above, rebuilt TPU-first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.sampling import ray_far_bound
from .fused_mlp import (_KP_ORDER, _dot, _dot_f32, _dot_nt, _dot_tn,
                        pad_params, unpad_grads)
from .megakernel import (_bound_spec, _chunk_pts, _full_spec,
                         _interpret, _merge_sort, _reg_zvals,
                         _sample_pdf_det, _unpack_rays, _weights, _z_pass1,
                         supports_megakernel)

# Perf-bisect hook (debug only, wrong numerics): _VG_ABLATE names a kernel
# stage to skip so its cost can be measured by difference on real hardware.
import os as _os

_ABLATE = _os.environ.get("_VG_ABLATE", "")

# 128-ray tiles: halves the per-tile fixed cost (plane relayouts, small
# matmul pipeline fills) vs 64. Viable since round 3 freed the VMEM the
# backward's concat temporaries used (unified scratch) and the resample
# split moved the sort out, shrinking the kernel body Mosaic has to
# compile (the pre-split 128-tile kernel took tens of minutes).
TILE = 128

# VMEM ceiling for the resident activations: (P2 + PR) * (4 + 128 + 4*256)
# * 4B must fit beside the working set under the raised vmem limit.
_MAX_PTS = 12800

# Termination-loss band (engine/mapper.py PARITY #25; must match the XLA
# mapper loss exactly): in-band = z in [gt - _BEYOND_LO, gt + _BEYOND_HI].
_BEYOND_LO = 0.10
_BEYOND_HI = 0.05


def _vrow(cols):
    return pl.BlockSpec((TILE, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def supports_fused_vg(model_cfg, rcfg, ecfg=None) -> bool:
    """Fused VG covers the flagship iMAP* loss configurations."""
    if not supports_megakernel(model_cfg, rcfg):
        return False
    S1, SI, SR = rcfg.N_samples, rcfg.N_importance, rcfg.N_samples
    pts = TILE * (S1 + SI + SR)
    if ecfg is not None and not ecfg.depth_supervision:
        return False        # color-only tracking keeps the two-kernel path
    return pts <= _MAX_PTS


def _mlp_fwd_full(x4, kp):
    """Decoder forward returning the FULL 128-wide head (P, 128): the
    caller extracts rgb/sigma in plane space via the sublane-split view.
    Identical math to megakernel._mlp_fwd."""
    emb = jnp.sin(_dot_f32(x4, kp["Bp"]))
    h = jnp.maximum(_dot(emb, kp["W0p"]) + kp["b0"], 0.0)
    h = jnp.maximum(_dot(h, kp["W1"]) + kp["b1"], 0.0)
    h = jnp.maximum(_dot(h, kp["W2"]) + kp["b2"], 0.0)
    h = jnp.maximum(_dot(h, kp["W3"]) + kp["b3"], 0.0)
    return _dot(h, kp["Woutp"]) + kp["boutp"]


def _mlp_fwd_store(x4, kp, es, hs):
    """Decoder forward that parks its activations in VMEM scratch (bf16 —
    see _vg_scratch) and returns the full 128-wide head (P, 128).

    es <- sin embedding; hs[i] <- relu hidden i."""
    def st(ref, v):
        ref[:] = v.astype(jnp.bfloat16)

    emb = jnp.sin(_dot_f32(x4, kp["Bp"]))
    st(es, emb)
    h = jnp.maximum(_dot(emb, kp["W0p"]) + kp["b0"], 0.0)
    st(hs[0], h)
    h = jnp.maximum(_dot(h, kp["W1"]) + kp["b1"], 0.0)
    st(hs[1], h)
    h = jnp.maximum(_dot(h, kp["W2"]) + kp["b2"], 0.0)
    st(hs[2], h)
    h = jnp.maximum(_dot(h, kp["W3"]) + kp["b3"], 0.0)
    st(hs[3], h)
    return _dot(h, kp["Woutp"]) + kp["boutp"]


def _lane_sel4():
    """(4, 128) selection matrix: row k = one-hot at lane k."""
    r = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)
    return (r == c).astype(jnp.float32)


def _dot_small_f32(a, b):
    """Tiny exact-f32 matmul (head-placement algebra; negligible FLOPs)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _mlp_bwd_stored(x4, pl4, kp, acc, emb, hs, param_grads=True):
    """Manual MLP backward over stored activations (NO recompute).

    Takes the head cotangent as pl4 (P, 4) — the four REAL head columns
    [d_r, d_g, d_b, d_sigma] in point space — and folds the 128-wide head
    placement in algebraically: with E4 the (4, 128) lane-selection matrix,
      dWout = (h3^T @ pl4) @ E4      dh = pl4 @ (E4 @ Wout^T) * relu'
    This replaces the explicit (P, 128) head-gradient build (4 broadcast
    one-hot passes over (T, S, 128), ~1.6 ms/iter on the VPU) AND two
    (P,128)x(128,256)-class matmuls whose K dim was 97% padding.

    Returns demb (P, 128); the caller reduces it to ray cotangents via
    _dray_matmul. emb/hs are bf16 VALUES from scratch — the matmuls cast
    to bf16 at use anyway.

    Only the embedding pre-activation is re-derived (one (P,4)@(4,128)
    matmul + cos — negligible next to the layer matmuls). Accumulates
    weight grads into the `acc` refs unless param_grads=False (the tracker
    optimizes only the camera: skipping the h^T @ dh contractions drops
    ~1/3 of the backward FLOPs)."""
    # bf16 comparisons don't lower on TPU; mask via f32 casts
    m0, m1, m2, m3 = [(h.astype(jnp.float32) > 0) for h in hs]
    h0, h1, h2, h3 = hs
    E4 = _lane_sel4()

    if param_grads:
        acc["Woutp"][:] += _dot_small_f32(_dot_tn(h3, pl4), E4)
        acc["boutp"][:] += _dot_small_f32(
            jnp.sum(pl4, axis=0, keepdims=True), E4)
    dh = _dot(pl4, _dot_nt(E4, kp["Woutp"])) * m3
    if param_grads:
        acc["W3"][:] += _dot_tn(h2, dh)
        acc["b3"][:] += jnp.sum(dh, axis=0, keepdims=True)
    dh = _dot_nt(dh, kp["W3"]) * m2
    if param_grads:
        acc["W2"][:] += _dot_tn(h1, dh)
        acc["b2"][:] += jnp.sum(dh, axis=0, keepdims=True)
    dh = _dot_nt(dh, kp["W2"]) * m1
    if param_grads:
        acc["W1"][:] += _dot_tn(h0, dh)
        acc["b1"][:] += jnp.sum(dh, axis=0, keepdims=True)
    dh = _dot_nt(dh, kp["W1"]) * m0
    if param_grads:
        acc["W0p"][:] += _dot_tn(emb, dh)
        acc["b0"][:] += jnp.sum(dh, axis=0, keepdims=True)
    xb = _dot_f32(x4, kp["Bp"])                   # re-derive cos argument
    demb = _dot_nt(dh, kp["W0p"]) * jnp.cos(xb)
    if param_grads:
        acc["Bp"][:] += jax.lax.dot_general(
            x4, demb, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    return demb


# --- relayout-free plane <-> point-space movement -------------------------
#
# Mosaic relayouts that move data between lanes and sublanes (e.g. the
# naive raw[:, 3:4].reshape(T, S) plane extraction) cost ~hundreds of us
# EACH; ~20 of them per tile made the first kernel version slower than the
# XLA path it replaced. The only cheap reshapes keep the lane dim intact:
# (P, 128) <-> (T, S, 128) sublane splits/collapses. So plane extraction
# is a lane-masked reduction over the split view, and head-cotangent
# packing is a broadcast outer product into the split view.


def _lane_onehot(k):
    """(1, 1, 128) float one-hot along lanes."""
    return (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
            == k).astype(jnp.float32)


def _extract_plane(v3, k):
    """(T, S, 128) head view -> (T, S) plane of head column k."""
    if _ABLATE == "noextract":          # debug: lane sum, no one-hot mult
        return jnp.sum(v3, axis=2)
    return jnp.sum(v3 * _lane_onehot(k), axis=2)


def _lane4_onehot(k):
    """(1, 1, 4) float one-hot along a 4-wide lane axis."""
    return (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 4), 2)
            == k).astype(jnp.float32)


def _pack_cotangent(grc, ggc, gbc, gsc, T, S):
    """Cotangent planes (T, S) -> (T*S, 4) point-space head cotangent
    [d_r, d_g, d_b, d_sigma]: one-hot broadcast into a (T, S, 4) view,
    then the lane-preserving collapse to (P, 4). Same construction as the
    old 128-wide head build but at 4 lanes (32x less data); Mosaic rejects
    the direct (T,S)->(P,1) shape cast, so per-plane column extraction is
    not an option. The 128-wide head placement happens inside
    _mlp_bwd_stored as matmul algebra (see its docstring)."""
    cot3 = (grc[..., None] * _lane4_onehot(0)
            + ggc[..., None] * _lane4_onehot(1)
            + gbc[..., None] * _lane4_onehot(2)
            + gsc[..., None] * _lane4_onehot(3))           # (T, S, 4)
    return cot3.reshape(T * S, 4)


def _inside_plane(o3, d3, z, b6):
    """(T, S) in-AABB mask computed directly in plane space
    (megakernel._inside_mask parity, renderer.py:73)."""
    px = o3[:, 0:1] + d3[:, 0:1] * z
    py = o3[:, 1:2] + d3[:, 1:2] * z
    pz = o3[:, 2:3] + d3[:, 2:3] * z
    return ((px > b6[0]) & (px < b6[1]) & (py > b6[2]) & (py < b6[3])
            & (pz > b6[4]) & (pz < b6[5])).astype(jnp.float32)


def _dray_matmul(demb, zpt, Bp, T, S):
    """Ray-origin/direction cotangents from demb (P, 128) as two tiny MXU
    matmuls: do[t, k] = sum_{s,l} demb3[t,s,l] Bp[k,l], dd likewise with a
    z weight. The earlier per-k lane-masked reductions (3 lane-axis
    reductions of (T,S,128) per block) were, with the head-cotangent
    build, ~3 ms/iter of the mapper's 12.2 — lane reductions are
    log-shuffle chains on the VPU, while the sublane reductions here are
    native and the (T,128)x(4,128)^T contractions ride the MXU.

    zpt (P, 1) is the per-point z in point space — the same value the
    forward's _chunk_pts materializes, so the relayout is CSE'd, not new.
    f32 HIGHEST keeps camera-gradient parity with the XLA path (the pose
    optimizer consumes these)."""
    d3 = demb.reshape(T, S, 128)
    M = jnp.sum(d3, axis=1)                                   # (T, 128)
    Mz = jnp.sum((demb * zpt).reshape(T, S, 128), axis=1)     # (T, 128)

    def dot_bp(a):
        return jax.lax.dot_general(
            a, Bp, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    return dot_bp(M), dot_bp(Mz)                              # (T, 4) x2


def _make_p1_kernel(S1):
    """Pass-1 forward: stratified sigma plane only (gradient-free; feeds
    the XLA-side CDF resampling between the two kernels)."""

    def kernel(ray_ref, bound_ref, *rest):
        kp = dict(zip(_KP_ORDER, [r[:] for r in rest[:len(_KP_ORDER)]]))
        sig1_ref = rest[len(_KP_ORDER)]
        b6 = [bound_ref[0, k] for k in range(6)]
        o, d, gtd, far = _unpack_rays(ray_ref[:])
        T = o.shape[0]
        z1 = _z_pass1(gtd, far, S1)
        x1 = _chunk_pts(o, d, z1)
        raw1_3 = _mlp_fwd_full(x1, kp).reshape(T, S1, 128)
        ins1f = _inside_plane(o, d, z1, b6)
        sig1_ref[:] = jnp.where(ins1f > 0, _extract_plane(raw1_3, 3),
                                100.0)

    return kernel


def _make_vg_kernel(S1, SI, SR, mode, with_color, w_color, w_reg,
                    param_grads, w_beyond=0.0, with_dray=True):
    """with_dray=False: skip the d(loss)/d(rays) contractions + store —
    the no-BA mapper discards them (cams frozen; ba_mask all-False), so
    the ~1.4 ms/iter dray block (PERF round-3 ablation) is pure waste.
    dray outputs come back zero; callers must not consume them."""
    S2 = S1 + SI
    with_reg = mode == "mapper"
    with_beyond = mode == "mapper" and w_beyond > 0.0

    def kernel(ray_ref, aux_ref, treg_ref, z2_ref, bound_ref, *rest):
        kp = dict(zip(_KP_ORDER, [r[:] for r in rest[:len(_KP_ORDER)]]))
        nk = len(_KP_ORDER)
        outv_ref, dray_ref = rest[nk], rest[nk + 1]
        acc = dict(zip(_KP_ORDER, rest[nk + 2:nk + 2 + nk]))
        scr = rest[nk + 2 + nk:]
        # unified activation scratch: the importance block (rows
        # [0, T*S2)) and regulation block (rows [T*S2, P)) share ONE
        # buffer set, so ONE forward sweep covers both (bigger matmuls,
        # half the op instances) and the backward reads the scratch
        # directly instead of materializing (P, 256) concatenations
        # (~13 MB of VMEM copies per tile in the split-scratch version).
        xs, es, hs = scr[0], scr[1], list(scr[2:6])

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in acc.values():
                r[:] = jnp.zeros_like(r)

        b6 = [bound_ref[0, k] for k in range(6)]
        ray = ray_ref[:]
        o, d, gtd, far = _unpack_rays(ray)
        dn = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))
        T = ray.shape[0]
        # z2 arrives precomputed: pass 1 runs in the small _p1 kernel and
        # the CDF/merge-sort runs as plain XLA between the two kernels (the
        # same pure-jnp helpers; in-kernel the one-hot machinery measured
        # 2.1 ms/iter, in XLA it is noise — round-1 PERF)
        z2 = z2_ref[:]

        # ---- forward: ONE merged sweep (importance block + regulation
        #      block concatenated in point space, activations stored) ----
        x2 = _chunk_pts(o, d, z2)
        if with_reg:
            zr = _reg_zvals(gtd, treg_ref[:])
            xr = _chunk_pts(o, d, zr)
            xall = jnp.concatenate([x2, xr], axis=0)      # (P, 4): cheap
        else:
            xall = x2
        xs[:] = xall
        rawall = _mlp_fwd_store(xall, kp, es, hs)          # (P, 128)
        raw2_3 = rawall[:T * S2].reshape(T, S2, 128)
        if with_reg:
            rawr_3 = rawall[T * S2:].reshape(T, SR, 128)
            insrf = _inside_plane(o, d, zr, b6)
            sigr = jnp.where(insrf > 0, _extract_plane(rawr_3, 3), 100.0)
        ins2f = _inside_plane(o, d, z2, b6)
        r2 = _extract_plane(raw2_3, 0)
        g2 = _extract_plane(raw2_3, 1)
        b2 = _extract_plane(raw2_3, 2)
        sig2 = jnp.where(ins2f > 0, _extract_plane(raw2_3, 3), 100.0)
        w2 = _weights(sig2, z2, dn)
        depth = jnp.sum(w2 * z2, axis=1, keepdims=True)
        var = jnp.sum(w2 * (z2 - depth) ** 2, axis=1, keepdims=True)
        col = jnp.concatenate(
            [jnp.sum(w2 * c, axis=1, keepdims=True) for c in (r2, g2, b2)],
            axis=1)

        # ---- loss + output cotangents (per-ray closed forms) ----
        gt_c = aux_ref[:, 0:3]
        ray_w = aux_ref[:, 3:4]
        mask = (gtd > 0).astype(jnp.float32) * ray_w
        ed = gtd - depth
        if mode == "tracker":
            wdep = mask / jnp.sqrt(var + 1e-10)    # var is stop-gradient
            wcol = w_color * mask
        else:
            wdep = mask
            wcol = w_color * ray_w
        loss_ray = jnp.sum(jnp.abs(ed) * wdep, axis=1, keepdims=True)
        gdep = -jnp.sign(ed) * wdep
        if with_beyond:
            # termination (line-of-sight) penalty: w_beyond * (1 - in-band
            # compositing mass) per supervised ray — identical math to the
            # XLA mapper loss (engine/mapper.py PARITY #25). z2 and gtd are
            # stop-gradient; the mass gradient enters the composite VJP as
            # a WEIGHTS-output cotangent (gw below) so the transmittance
            # chain is linearized exactly once — a second _weights call
            # here pushed scoped VMEM to 63.8M, over the validated 62M
            # limit (run-2 launch failure, 2026-08-19).
            in_band = ((z2 > gtd - _BEYOND_LO)
                       & (z2 < gtd + _BEYOND_HI)).astype(jnp.float32)
            m_in = jnp.sum(w2 * in_band, axis=1, keepdims=True)
            loss_ray += w_beyond * (1.0 - m_in) * mask
            gw_beyond = (-w_beyond * mask) * in_band
        ec = gt_c - col
        if with_color:
            loss_ray += jnp.sum(jnp.abs(ec), axis=1, keepdims=True) * wcol
            gcol = -jnp.sign(ec) * wcol
        else:
            gcol = jnp.zeros_like(ec)
        if with_reg:
            loss_ray += w_reg * jnp.sum(jnp.abs(sigr), axis=1,
                                        keepdims=True) * ray_w
            gsigr = w_reg * jnp.sign(sigr) * ray_w
        outv_ref[:] = jnp.concatenate(
            [loss_ray, depth, var, col, jnp.zeros((T, 2), jnp.float32)],
            axis=1)

        if _ABLATE == "nobwd":
            dray_ref[:] = jnp.zeros((T, 8), jnp.float32)
            return

        # ---- backward: composite VJP (small (T, S) math, autodiffed) ----
        if _ABLATE == "nocompvjp":
            gr = gg = gb = gsig = jnp.ones_like(r2)
            gdvec = jnp.zeros_like(d)
        else:
            def comp_fn(r_, g_, b_, sig, dvec):
                dnorm = jnp.sqrt(jnp.sum(dvec * dvec, axis=1,
                                         keepdims=True) + 1e-24)
                w = _weights(sig, z2, dnorm)
                dep = jnp.sum(w * z2, axis=1, keepdims=True)
                va = jnp.sum(w * (z2 - dep) ** 2, axis=1, keepdims=True)
                co = jnp.concatenate(
                    [jnp.sum(w * c, axis=1, keepdims=True)
                     for c in (r_, g_, b_)], axis=1)
                return (dep, va, co, w) if with_beyond else (dep, va, co)

            _, comp_vjp = jax.vjp(comp_fn, r2, g2, b2, sig2, d)
            gvar = jnp.zeros_like(var)   # never in the gradient
            cots = ((gdep, gvar, gcol, gw_beyond) if with_beyond
                    else (gdep, gvar, gcol))
            gr, gg, gb, gsig, gdvec = comp_vjp(cots)

        # ---- backward: ONE merged MLP sweep over stored activations
        #      (importance-pass block + regulation block concatenated in
        #      point space: one dh chain, one accumulator visit) ----
        plc_2 = _pack_cotangent(gr, gg, gb, gsig * ins2f, T, S2)
        if with_reg:
            zpl = jnp.zeros((T, SR), jnp.float32)
            plc_r = _pack_cotangent(zpl, zpl, zpl, gsigr * insrf, T, SR)
            plc = jnp.concatenate([plc_2, plc_r], axis=0)  # (P, 4)
        else:
            plc = plc_2
        if _ABLATE == "nomlpbwd":
            demb = jnp.pad(plc, ((0, 0), (0, 124)))
        else:
            demb = _mlp_bwd_stored(xs[:], plc, kp, acc, es[:],
                                   [h[:] for h in hs],
                                   param_grads
                                   and _ABLATE != "noparamgrads")
        if not with_dray:
            dray_ref[:] = jnp.zeros((T, 8), jnp.float32)
            return
        Tz = jnp.zeros((T, 4), jnp.float32)
        Do, Dd = Tz, Tz
        if _ABLATE != "nodray":
            # (T,S) z -> (P,1) point-space z via the same lane-preserving
            # (T,S,4) route (direct (T,S)->(P,1) casts don't lower)
            ones4 = jnp.ones((1, 1, 4), jnp.float32)
            zpt2 = (z2[..., None] * ones4).reshape(T * S2, 4)[:, 0:1]
            Do, Dd = _dray_matmul(demb[:T * S2], zpt2, kp["Bp"], T, S2)
            if with_reg:
                zptr = (zr[..., None] * ones4).reshape(T * SR, 4)[:, 0:1]
                Dor, Ddr = _dray_matmul(demb[T * S2:], zptr, kp["Bp"],
                                        T, SR)
                Do = Do + Dor
                Dd = Dd + Ddr

        dray_ref[:] = jnp.concatenate(
            [Do[:, :3], Dd[:, :3] + gdvec,
             jnp.zeros((T, 2), jnp.float32)], axis=1)

    return kernel


def _vg_scratch(S1, SI, SR, with_reg):
    """Activation parking scratch: x4 stays f32 (feeds the HIGHEST-precision
    Bp gradient), sin-embedding and hidden layers store bf16 — the backward
    matmuls cast to bf16 at use anyway, so the rounding is free and the
    scratch traffic halves. ONE buffer set covers the importance block
    (rows [0, T*S2)) and, for the mapper, the regulation block after it."""
    T = TILE
    P = T * (S1 + SI) + (T * SR if with_reg else 0)
    f = lambda shape: pltpu.VMEM(shape, jnp.float32)
    b = lambda shape: pltpu.VMEM(shape, jnp.bfloat16)
    return [f((P, 4)), b((P, 128))] + [b((P, 256)) for _ in range(4)]


def _make_vg_parts(rcfg, mode: str, w_color: float, w_reg: float,
                   with_color: bool, param_grads: bool, w_beyond: float,
                   with_ray_grads: bool = True):
    """Shared construction for make_fused_vg / make_fused_vg_split."""
    assert mode in ("mapper", "tracker"), mode
    S1, SI, SR = rcfg.N_samples, rcfg.N_importance, rcfg.N_samples
    S2 = S1 + SI
    with_reg = mode == "mapper"
    kernel = _make_vg_kernel(S1, SI, SR, mode, with_color,
                             float(w_color), float(w_reg), param_grads,
                             float(w_beyond),
                             with_dray=with_ray_grads)
    p1_kernel = _make_p1_kernel(S1)

    def _pack_rays(rays_o, rays_d, gt_d, bound):
        far_bb = ray_far_bound(rays_o, rays_d, bound)
        far = jnp.clip(far_bb, 0.0, jnp.max(gt_d * 1.2))
        pk = jnp.concatenate(
            [rays_o, rays_d, gt_d[:, None], far[:, None]], axis=1)
        n = pk.shape[0]
        pk = jnp.pad(pk, ((0, (-n) % TILE), (0, 0)))
        b8 = jnp.zeros((1, 8), jnp.float32).at[0, :6].set(
            bound.reshape(-1).astype(jnp.float32))
        return pk, b8

    def prepare(params, rays_o, rays_d, gt_d, bound):
        """Pass-1 sigma + importance resample -> merged z2 (padded rows).

        Split out so a resample_every=K schedule can reuse one z2 across K
        Adam iterations: the (K-1)/K share of the p1 kernel + the XLA
        middle (stratify/composite/inverse-CDF/sort) disappears from the
        per-iteration cost. z2 is stop-gradient by construction (the
        reference also resamples from a detached pass; Renderer.py:186-201),
        so reuse only staleness-shifts the importance DISTRIBUTION, never
        a gradient path."""
        kp = pad_params(params)
        pk, b8 = _pack_rays(rays_o, rays_d, gt_d, bound)

        # kernel 1: pass-1 sigma (parallel grid, small working set)
        sig1 = pl.pallas_call(
            p1_kernel,
            grid=(pk.shape[0] // TILE,),
            in_specs=[_vrow(8), _bound_spec()]
            + [_full_spec(kp[k].shape) for k in _KP_ORDER],
            out_specs=_vrow(S1),
            out_shape=jax.ShapeDtypeStruct((pk.shape[0], S1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=44 * 1024 * 1024),
            interpret=_interpret(),
        )(pk, b8, *[kp[k] for k in _KP_ORDER])

        # XLA middle: stratified z, compositing weights, inverse-CDF
        # importance resampling, rank merge-sort — identical pure-jnp
        # helpers to the in-kernel versions, all stop-gradient
        gtd_c = pk[:, 6:7]
        dn = jnp.sqrt(jnp.sum(pk[:, 3:6] ** 2, axis=1, keepdims=True))
        z1 = _z_pass1(gtd_c, pk[:, 7:8], S1)
        w1 = _weights(sig1, z1, dn)
        zs = _sample_pdf_det(z1, w1, SI)
        # native XLA sort (renderer.py:136 parity; the kernel-friendly
        # one-hot _merge_sort exists for in-kernel use only)
        return jnp.sort(jnp.concatenate([z1, zs], axis=1), axis=1)

    def main(params, rays_o, rays_d, gt_d, gt_c, ray_w, t_reg, z2, bound):
        """Main fused value-and-grad kernel, given the merged z2."""
        kp = pad_params(params)
        pk, b8 = _pack_rays(rays_o, rays_d, gt_d, bound)
        n = rays_o.shape[0]
        npad = (-n) % TILE
        aux = jnp.concatenate(
            [gt_c, ray_w[:, None], jnp.zeros((gt_c.shape[0], 4))], axis=1)
        aux = jnp.pad(aux, ((0, npad), (0, 0)))   # ray_w pads to 0: no-op
        tr = jnp.pad(t_reg, ((0, npad), (0, 0)))
        grad_shapes = [jax.ShapeDtypeStruct(kp[k].shape, jnp.float32)
                       for k in _KP_ORDER]

        outs = pl.pallas_call(
            kernel,
            grid=(pk.shape[0] // TILE,),
            in_specs=[_vrow(8), _vrow(8), _vrow(SR), _vrow(S2),
                      _bound_spec()]
            + [_full_spec(kp[k].shape) for k in _KP_ORDER],
            out_specs=[_vrow(8), _vrow(8)]
            + [_full_spec(kp[k].shape) for k in _KP_ORDER],
            out_shape=[jax.ShapeDtypeStruct((pk.shape[0], 8), jnp.float32),
                       jax.ShapeDtypeStruct((pk.shape[0], 8), jnp.float32)]
            + grad_shapes,
            scratch_shapes=_vg_scratch(S1, SI, SR, with_reg),
            # weight-grad accumulators carry across grid steps: sequential.
            # vmem_limit must cover the kernel's REAL scoped usage (~36M at
            # TILE=64) while leaving physical headroom for the enclosing
            # XLA program's buffers: a 100M limit compiled and ran bare,
            # but crashed the TPU worker at runtime inside the engine's
            # sampling+gather scan (physical VMEM overrun — the compiler
            # check is bypassed by the override).
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=62 * 1024 * 1024),
            interpret=_interpret(),
        )(pk, aux, tr, z2, b8, *[kp[k] for k in _KP_ORDER])
        outv, dray = outs[0], outs[1]
        gk = dict(zip(_KP_ORDER, outs[2:]))
        loss = jnp.sum(outv[:n, 0])
        dparams = unpad_grads(gk, emb=params["embedder"]["B"].shape[1])
        aux_out = (outv[:n, 1], outv[:n, 2], outv[:n, 3:6])
        return loss, dparams, dray[:n, 0:3], dray[:n, 3:6], aux_out

    def vg(params, rays_o, rays_d, gt_d, gt_c, ray_w, t_reg, bound):
        z2 = prepare(params, rays_o, rays_d, gt_d, bound)
        return main(params, rays_o, rays_d, gt_d, gt_c, ray_w, t_reg, z2,
                    bound)

    return vg, prepare, main


def make_fused_vg(rcfg, mode: str, w_color: float, w_reg: float = 0.0005,
                  with_color: bool = True, param_grads: bool = True,
                  w_beyond: float = 0.0, with_ray_grads: bool = True):
    """Build the single-kernel loss value-and-grad callable.

    Returns vg(params, rays_o, rays_d, gt_d, gt_c, ray_w, t_reg, bound)
      -> (loss, dparams, dray_o, dray_d, (depth, depth_var, color))
    where loss and all gradients match jax.value_and_grad over the XLA
    mapper/tracker loss exactly (to bf16 matmul noise). dray_* feed the
    caller's camera chain rule; aux outputs are detached monitors.
    param_grads=False skips the weight-grad contractions (dparams comes
    back all-zero) — use for camera-only tracking. w_beyond > 0 (mapper
    only) adds the in-kernel termination penalty (PARITY #25) so the
    flagship room_bench configs stay on the fused path.
    with_ray_grads=False skips the dray contractions (no-BA mapper)."""
    return _make_vg_parts(rcfg, mode, w_color, w_reg, with_color,
                          param_grads, w_beyond,
                          with_ray_grads=with_ray_grads)[0]


def make_fused_vg_split(rcfg, mode: str, w_color: float,
                        w_reg: float = 0.0005, with_color: bool = True,
                        param_grads: bool = True, w_beyond: float = 0.0,
                        with_ray_grads: bool = True):
    """The factored pair for resample_every=K schedules.

    Returns (prepare, main):
      prepare(params, rays_o, rays_d, gt_d, bound) -> z2 (padded rows)
      main(params, rays_o, rays_d, gt_d, gt_c, ray_w, t_reg, z2, bound)
        -> same outputs as make_fused_vg's vg.
    main(..., prepare(...)) == vg(...) exactly (same op sequence; the
    recomputed ray packing CSEs away under one jit)."""
    _, prepare, main = _make_vg_parts(rcfg, mode, w_color, w_reg,
                                      with_color, param_grads, w_beyond,
                                      with_ray_grads=with_ray_grads)
    return prepare, main
