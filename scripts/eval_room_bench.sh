#!/bin/bash
# Oracle evaluation for the 500-frame synthetic room_bench run
# (the stand-in for the reference's Replica room0 protocol:
#  reference src/tools/eval_ate.py:261-301 + eval_recon.py:91-210).
#
# Run AFTER `python run.py configs/Synthetic/room_bench.yaml` completes
# (never concurrently: the axon tunnel is single-client).
#
# Produces, under output/Synthetic/room_bench/:
#   room_gt_mesh.ply           exact analytic GT mesh
#   room_gt_mesh_culled.ply    GT culled to the sequence frustums
#   room_gt_mesh_culled_pc_unseen.npy  unseen-region pc (2D view rejection)
#   eval_metrics.txt           ATE RMSE + 3D acc/comp + 2D depth-L1
set -e
cd "$(dirname "$0")/.."
OUT=${1:-output/Synthetic/room_bench}
# prefer the eval_rec variant (all-frames masks, reference Mapper.py:925-929)
if [ -f $OUT/mesh/final_mesh_eval_rec.ply ]; then
  REC=$OUT/mesh/final_mesh_eval_rec.ply
else
  REC=$(ls -v $OUT/mesh/*_mesh.ply | tail -1)
fi
CKPT=$(ls -v $OUT/ckpts/*.npz | tail -1)
echo "rec mesh: $REC  ckpt: $CKPT"

python -m pointnerf_slam_tpu.tools.make_synthetic_gt_mesh \
    --out $OUT/room_gt_mesh.ply --resolution 256

python -m pointnerf_slam_tpu.tools.cull_mesh $OUT/room_gt_mesh.ply \
    --traj "$CKPT" --out $OUT/room_gt_mesh_culled.ply --save_unseen_pc

{
  echo "== eval_ate ($CKPT) =="
  python -m pointnerf_slam_tpu.tools.eval_ate "$CKPT" \
      --plot $OUT/ate_traj.png
  echo "== eval_recon 3D ($REC vs culled GT) =="
  python -m pointnerf_slam_tpu.tools.eval_recon --rec_mesh "$REC" \
      --gt_mesh $OUT/room_gt_mesh_culled.ply -3d
  echo "== eval_recon 2D depth-L1 (with unseen-view rejection) =="
  python -m pointnerf_slam_tpu.tools.eval_recon --rec_mesh "$REC" \
      --gt_mesh $OUT/room_gt_mesh_culled.ply -2d --n_imgs 200
  echo "== eval_recon 2D depth-L1 (rejection DISABLED, for the parity delta) =="
  python -m pointnerf_slam_tpu.tools.eval_recon --rec_mesh "$REC" \
      --gt_mesh $OUT/room_gt_mesh_culled.ply -2d --n_imgs 200 \
      --no_reject_unseen
} | tee $OUT/eval_metrics.txt
