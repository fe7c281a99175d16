"""Pre-render the synthetic dataset's on-disk frame cache for a config.

The analytic ray cast is host numpy (~1-2 s/frame at Replica resolution);
on a fresh machine the first SLAM run would pay it inline. This warms
`data.frame_cache_dir` ahead of time so the supervised oracle run streams
frames at disk speed. Run it tunnel-free while the TPU is busy:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/prewarm_synth_cache.py configs/Synthetic/room_bench_weak.yaml
"""
import sys
import time

sys.path.insert(0, ".")

from pointnerf_slam_tpu.io.config import load_config
from pointnerf_slam_tpu.io.synthetic import SyntheticDataset


def main():
    cfg = load_config(sys.argv[1])
    ds = SyntheticDataset(cfg, scale=cfg.get("scale", 1.0))
    n = ds.n_img
    t0 = time.time()
    for i in range(n):
        ds[i]
        if i % 25 == 0 or i == n - 1:
            dt = time.time() - t0
            print(f"[prewarm] {i + 1}/{n} frames  {dt:.0f}s "
                  f"({dt / (i + 1):.2f} s/frame)", flush=True)


if __name__ == "__main__":
    main()
