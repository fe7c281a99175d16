#!/bin/bash
# Replica (NICE-SLAM packaging) — same source the reference uses
mkdir -p Datasets
cd Datasets
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip
