"""Per-stage scale/pose error decomposition from a round-5 checkpoint.

Reads the `scale_telemetry` (engine stage centers: motion prior ->
front-end solve -> NeRF refine, + gt) and `fe2_telemetry` (front-end
per-solve records: applied scale, raw field anchor, map correction,
parallax) banked in the npz checkpoint, and prints which stage injects
the step-length error — the measurement VERDICT r4 #1 asked for.

Usage (CPU-safe):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/_analyze_scale_telemetry.py <ckpt.npz>
"""

import json
import sys

import numpy as np


def main(path):
    z = np.load(path, allow_pickle=False)
    if "scale_telemetry" not in z:
        print("no scale_telemetry in this checkpoint (pre-round-5 run)")
        return
    recs = json.loads(str(z["scale_telemetry"]))
    fe = json.loads(str(z["fe2_telemetry"])) if "fe2_telemetry" in z \
        else []
    fe_by_idx = {}
    for t in fe:
        if "idx" in t:
            fe_by_idx.setdefault(t["idx"], []).append(t)
    gt_list = z["gt_c2w_list"]
    est_list = z["estimate_c2w_list"]

    rows = []
    print(f"{'idx':>5} {'ref':>5} {'par':>5} | step ratios vs gt: "
          f"{'prior':>6} {'solve':>6} {'refine':>6} | "
          f"{'f_map':>6} {'nmap':>5} {'s_raw/s':>8}")
    for r in recs:
        i, ref = r["idx"], r["ref_idx"]
        if ref < 0 or r.get("c_gt") is None:
            continue
        c_gt = np.asarray(r["c_gt"])
        # gt step about the same reference the solve used (its ESTIMATED
        # pose at solve time is not banked; use the final est ref pose —
        # adequate: ref poses move little after their own refine)
        c_ref_est = est_list[ref][:3, 3]
        c_ref_gt = gt_list[ref][:3, 3]
        b_gt = np.linalg.norm(c_gt - c_ref_gt)
        if b_gt < 1e-9:
            continue

        def ratio(c):
            return np.linalg.norm(np.asarray(c) - c_ref_est) / b_gt

        rp = ratio(r["c_prior"])
        rs = ratio(r["c_solve"]) if r.get("c_solve") is not None \
            else float("nan")
        rr = ratio(r["c_refined"]) if r.get("c_refined") is not None \
            else float("nan")
        ft = fe_by_idx.get(i, [{}])[-1]
        f_map = ft.get("f_map", float("nan"))
        n_map = ft.get("n_map_anchor", 0)
        s, s_raw = ft.get("scale"), ft.get("scale_raw")
        sr = (s_raw / s) if (s and s_raw) else float("nan")
        par = ft.get("parallax", float("nan"))
        rows.append((i, rp, rs, rr))
        print(f"{i:5d} {ref:5d} {par:5.2f} | "
              f"{rp:6.3f} {rs:6.3f} {rr:6.3f} | "
              f"{f_map:6.3f} {n_map:5d} {sr:8.3f}")

    if rows:
        a = np.asarray([[r[1], r[2], r[3]] for r in rows], float)
        print("\nstage step-ratio medians (1.0 = perfect scale):")
        for name, col in zip(("motion prior", "frontend solve",
                              "nerf refined"), a.T):
            col = col[np.isfinite(col)]
            if len(col):
                q = np.percentile(col, [25, 50, 75])
                print(f"  {name:>15}: median {q[1]:.3f}  "
                      f"IQR [{q[0]:.3f}, {q[2]:.3f}]  n={len(col)}")


if __name__ == "__main__":
    main(sys.argv[1])
