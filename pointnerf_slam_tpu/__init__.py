"""pointnerf_slam_tpu — a TPU-native neural-field SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
thua919/pointNeRF-SLAM (a NICE-SLAM fork running in iMAP* mode with a
SuperPoint sparse front-end producing weak depth supervision).

Layer map (mirrors SURVEY.md §1):
  core/      L1  geometry & ray math (SE3, rays, sampling, compositing)
  models/    L3  neural scene decoders (iMAP* MLP, NICE grid stack) + SuperPoint
  ops/       --  Pallas TPU kernels (fused render, trilinear grid sample, knn)
  render/    L3.5 differentiable volume renderer
  frontend/  L2  sparse visual front-end (matching, epipolar, triangulation)
  engine/    L4  SLAM engine: tracker/mapper jitted steps + scheduler
  parallel/  --  device-mesh sharding of the mapping/render workload
  io/        L6  config system, dataset readers, checkpointing
  outputs/   L5  mesher, logger, visualizer
  tools/     L5  eval_ate, eval_recon, cull_mesh
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name in ("PointNeRFSLAM", "pointNeRF_SLAM"):
        # `pointNeRF_SLAM` mirrors the reference's cleaned second-iteration
        # class name (my/pointNeRF_SLAM.py:20)
        from .engine import PointNeRFSLAM
        return PointNeRFSLAM
    if name == "load_config":
        from .io.config import load_config
        return load_config
    raise AttributeError(name)
