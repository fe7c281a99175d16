#!/bin/bash
mkdir -p Datasets/TUM_RGBD
cd Datasets/TUM_RGBD
for seq in rgbd_dataset_freiburg1_desk rgbd_dataset_freiburg2_xyz rgbd_dataset_freiburg3_long_office_household; do
  wget https://vision.in.tum.de/rgbd/dataset/${seq%%_*}/${seq}.tgz 2>/dev/null || \
  wget https://cvg.cit.tum.de/rgbd/dataset/$(echo $seq | cut -d_ -f3)/${seq}.tgz
  tar -xvzf ${seq}.tgz
done
