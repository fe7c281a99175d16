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
from .megakernel import (_bound_spec, _chunk_pts, _composite, _full_spec,
                         _interpret, _merge_sort, _reg_zvals,
                         _sample_pdf_det, _unpack_rays, _weights, _z_pass1,
                         supports_megakernel)

# The VG kernel uses a smaller ray tile than the two-kernel megakernel:
# Mosaic's compile time scales with straight-line vector IR size (~points
# per sweep), and the single-kernel body is the fwd+bwd superset — 128-ray
# tiles compiled for tens of minutes, 64-ray tiles are tractable.
TILE = 64

# VMEM ceiling for the resident activations: (P2 + PR) * (4 + 128 + 4*256)
# * 4B must fit beside the working set under the raised vmem limit.
_MAX_PTS = 12800


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


def _mlp_fwd_store(x4, kp, es, hs, lo=0):
    """Decoder forward that parks its activations in VMEM scratch (bf16 —
    see _vg_scratch) and returns the full 128-wide head (P, 128).

    es <- sin embedding; hs[i] <- relu hidden i. `lo` stores only rows
    [lo:, :] (used when the leading rows are a gradient-free segment
    sharing the sweep)."""
    def st(ref, v):
        ref[:] = v[lo:].astype(jnp.bfloat16)

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


def _mlp_bwd_stored(x4, g, kp, acc, emb, hs, param_grads=True):
    """Manual MLP backward over stored activations (NO recompute).

    Takes the head cotangent g already 128-wide (the caller builds it in
    plane space — see _head_cotangent) and returns demb (P, 128): the
    caller extracts d(loss)/d(point) in plane space too, so no
    lane<->sublane relayout ever happens (each costs ~hundreds of us in
    Mosaic and dominated the first kernel version's runtime). emb/hs are
    bf16 VALUES (possibly concatenated from several scratch blocks) — the
    matmuls cast to bf16 at use anyway.

    Only the embedding pre-activation is re-derived (one (P,4)@(4,128)
    matmul + cos — negligible next to the layer matmuls). Accumulates
    weight grads into the `acc` refs unless param_grads=False (the tracker
    optimizes only the camera: skipping the h^T @ dh contractions drops
    ~1/3 of the backward FLOPs)."""
    # bf16 comparisons don't lower on TPU; mask via f32 casts
    m0, m1, m2, m3 = [(h.astype(jnp.float32) > 0) for h in hs]
    h0, h1, h2, h3 = hs

    if param_grads:
        acc["Woutp"][:] += _dot_tn(h3, g)
        acc["boutp"][:] += jnp.sum(g, axis=0, keepdims=True)
    dh = _dot_nt(g, kp["Woutp"]) * m3
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
    return jnp.sum(v3 * _lane_onehot(k), axis=2)


def _head_cotangent(grc, ggc, gbc, gsc, T, S):
    """Cotangent planes -> (T*S, 128) head gradient: outer products into
    the sublane-split view, then a lane-preserving collapse."""
    g3 = (grc[..., None] * _lane_onehot(0)
          + ggc[..., None] * _lane_onehot(1)
          + gbc[..., None] * _lane_onehot(2)
          + gsc[..., None] * _lane_onehot(3))
    return g3.reshape(T * S, 128)


def _inside_plane(o3, d3, z, b6):
    """(T, S) in-AABB mask computed directly in plane space
    (megakernel._inside_mask parity, renderer.py:73)."""
    px = o3[:, 0:1] + d3[:, 0:1] * z
    py = o3[:, 1:2] + d3[:, 1:2] * z
    pz = o3[:, 2:3] + d3[:, 2:3] * z
    return ((px > b6[0]) & (px < b6[1]) & (py > b6[2]) & (py < b6[3])
            & (pz > b6[4]) & (pz < b6[5])).astype(jnp.float32)


def _dray_accum(demb, Bp, zc, carry, T, S):
    """Accumulate ray-origin/direction cotangents from demb (P, 128):
    dx_k = demb @ Bp[k] evaluated as lane-masked reductions over the
    sublane-split view (no relayout)."""
    demb3 = demb.reshape(T, S, 128)
    dox, doy, doz, ddx, ddy, ddz = carry
    s = lambda v: jnp.sum(v, axis=1, keepdims=True)
    outs = []
    for k in range(3):
        bk = Bp[k:k + 1, :][None]                               # (1,1,128)
        outs.append(jnp.sum(demb3 * bk, axis=2))                # (T, S)
    dxx, dxy, dxz = outs
    return (dox + s(dxx), doy + s(dxy), doz + s(dxz),
            ddx + s(dxx * zc), ddy + s(dxy * zc), ddz + s(dxz * zc))


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
                    param_grads):
    S2 = S1 + SI
    with_reg = mode == "mapper"

    def kernel(ray_ref, aux_ref, treg_ref, z2_ref, bound_ref, *rest):
        kp = dict(zip(_KP_ORDER, [r[:] for r in rest[:len(_KP_ORDER)]]))
        nk = len(_KP_ORDER)
        outv_ref, dray_ref = rest[nk], rest[nk + 1]
        acc = dict(zip(_KP_ORDER, rest[nk + 2:nk + 2 + nk]))
        scr = rest[nk + 2 + nk:]
        x2s, e2s, h2s = scr[0], scr[1], list(scr[2:6])
        if with_reg:
            xrs, ers, hrs = scr[6], scr[7], list(scr[8:12])

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

        # ---- forward: regulation sweep (activations stored) ----
        if with_reg:
            zr = _reg_zvals(gtd, treg_ref[:])
            xr = _chunk_pts(o, d, zr)
            xrs[:] = xr
            rawr_3 = _mlp_fwd_store(xr, kp, ers, hrs).reshape(T, SR, 128)
            insrf = _inside_plane(o, d, zr, b6)
            sigr = jnp.where(insrf > 0, _extract_plane(rawr_3, 3), 100.0)

        # ---- forward sweep B: importance pass (activations stored) ----
        x2 = _chunk_pts(o, d, z2)
        x2s[:] = x2
        raw2_3 = _mlp_fwd_store(x2, kp, e2s, h2s).reshape(T, S2, 128)
        ins2f = _inside_plane(o, d, z2, b6)
        r2 = _extract_plane(raw2_3, 0)
        g2 = _extract_plane(raw2_3, 1)
        b2 = _extract_plane(raw2_3, 2)
        sig2 = jnp.where(ins2f > 0, _extract_plane(raw2_3, 3), 100.0)
        depth, var, col = _composite(r2, g2, b2, sig2, z2, dn)

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

        # ---- backward: composite VJP (small (T, S) math, autodiffed) ----
        def comp_fn(r_, g_, b_, sig, dvec):
            dnorm = jnp.sqrt(jnp.sum(dvec * dvec, axis=1, keepdims=True)
                             + 1e-24)
            return _composite(r_, g_, b_, sig, z2, dnorm)

        _, comp_vjp = jax.vjp(comp_fn, r2, g2, b2, sig2, d)
        gvar = jnp.zeros_like(var)   # never in the gradient (see docstring)
        gr, gg, gb, gsig, gdvec = comp_vjp((gdep, gvar, gcol))

        # ---- backward: ONE merged MLP sweep over stored activations
        #      (importance-pass block + regulation block concatenated in
        #      point space: one dh chain, one accumulator visit) ----
        zc1 = jnp.zeros((T, 1), jnp.float32)
        carry = (zc1, zc1, zc1,
                 gdvec[:, 0:1], gdvec[:, 1:2], gdvec[:, 2:3])
        gh_2 = _head_cotangent(gr, gg, gb, gsig * ins2f, T, S2)
        if with_reg:
            zplane = jnp.zeros((T, SR), jnp.float32)
            gh_r = _head_cotangent(zplane, zplane, zplane, gsigr * insrf,
                                   T, SR)
            xcat = jnp.concatenate([x2s[:], xrs[:]], axis=0)
            ghcat = jnp.concatenate([gh_2, gh_r], axis=0)
            ecat = jnp.concatenate([e2s[:], ers[:]], axis=0)
            hcat = [jnp.concatenate([a[:], b_[:]], axis=0)
                    for a, b_ in zip(h2s, hrs)]
            demb = _mlp_bwd_stored(xcat, ghcat, kp, acc, ecat, hcat,
                                   param_grads)
            carry = _dray_accum(demb[:T * S2], kp["Bp"], z2, carry, T, S2)
            carry = _dray_accum(demb[T * S2:], kp["Bp"], zr, carry, T, SR)
        else:
            demb = _mlp_bwd_stored(x2s[:], gh_2, kp, acc, e2s[:],
                                   [h[:] for h in h2s], param_grads)
            carry = _dray_accum(demb, kp["Bp"], z2, carry, T, S2)

        dray_ref[:] = jnp.concatenate(
            list(carry) + [jnp.zeros((T, 2), jnp.float32)], axis=1)

    return kernel


def _vg_scratch(S1, SI, SR, with_reg):
    """Activation parking scratch: x4 stays f32 (feeds the HIGHEST-precision
    Bp gradient), sin-embedding and hidden layers store bf16 — the backward
    matmuls cast to bf16 at use anyway, so the rounding is free and the
    scratch traffic halves."""
    T = TILE
    P2 = T * (S1 + SI)
    PR = T * SR
    f = lambda shape: pltpu.VMEM(shape, jnp.float32)
    b = lambda shape: pltpu.VMEM(shape, jnp.bfloat16)
    scr = [f((P2, 4)), b((P2, 128))] + [b((P2, 256)) for _ in range(4)]
    if with_reg:
        scr += [f((PR, 4)), b((PR, 128))] + [b((PR, 256)) for _ in range(4)]
    return scr


def make_fused_vg(rcfg, mode: str, w_color: float, w_reg: float = 0.0005,
                  with_color: bool = True, param_grads: bool = True):
    """Build the single-kernel loss value-and-grad callable.

    Returns vg(params, rays_o, rays_d, gt_d, gt_c, ray_w, t_reg, bound)
      -> (loss, dparams, dray_o, dray_d, (depth, depth_var, color))
    where loss and all gradients match jax.value_and_grad over the XLA
    mapper/tracker loss exactly (to bf16 matmul noise). dray_* feed the
    caller's camera chain rule; aux outputs are detached monitors.
    param_grads=False skips the weight-grad contractions (dparams comes
    back all-zero) — use for camera-only tracking."""
    assert mode in ("mapper", "tracker"), mode
    S1, SI, SR = rcfg.N_samples, rcfg.N_importance, rcfg.N_samples
    S2 = S1 + SI
    with_reg = mode == "mapper"
    kernel = _make_vg_kernel(S1, SI, SR, mode, with_color,
                             float(w_color), float(w_reg), param_grads)
    p1_kernel = _make_p1_kernel(S1)

    def vg(params, rays_o, rays_d, gt_d, gt_c, ray_w, t_reg, bound):
        kp = pad_params(params)
        far_bb = ray_far_bound(rays_o, rays_d, bound)
        far = jnp.clip(far_bb, 0.0, jnp.max(gt_d * 1.2))
        pk = jnp.concatenate(
            [rays_o, rays_d, gt_d[:, None], far[:, None]], axis=1)
        aux = jnp.concatenate(
            [gt_c, ray_w[:, None], jnp.zeros((gt_c.shape[0], 4))], axis=1)
        n = pk.shape[0]
        npad = (-n) % TILE
        pk = jnp.pad(pk, ((0, npad), (0, 0)))
        aux = jnp.pad(aux, ((0, npad), (0, 0)))   # ray_w pads to 0: no-op
        tr = jnp.pad(t_reg, ((0, npad), (0, 0)))
        b8 = jnp.zeros((1, 8), jnp.float32).at[0, :6].set(
            bound.reshape(-1).astype(jnp.float32))
        grad_shapes = [jax.ShapeDtypeStruct(kp[k].shape, jnp.float32)
                       for k in _KP_ORDER]

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
        z2 = jnp.sort(jnp.concatenate([z1, zs], axis=1), axis=1)

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
                vmem_limit_bytes=44 * 1024 * 1024),
            interpret=_interpret(),
        )(pk, aux, tr, z2, b8, *[kp[k] for k in _KP_ORDER])
        outv, dray = outs[0], outs[1]
        gk = dict(zip(_KP_ORDER, outs[2:]))
        loss = jnp.sum(outv[:n, 0])
        dparams = unpad_grads(gk, emb=params["embedder"]["B"].shape[1])
        aux_out = (outv[:n, 1], outv[:n, 2], outv[:n, 3:6])
        return loss, dparams, dray[:n, 0:3], dray[:n, 3:6], aux_out

    return vg
