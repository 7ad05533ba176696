#!/bin/bash
# Download the 100-frame KITTI-00 example subset (the reference's smoke
# dataset, reference: scripts/download_kitti_example.sh) into data/.
set -e
mkdir -p data && cd data
echo "Downloading KITTI odometry sequence 00 subset (first 100 frames)..."
wget -O kitti_example.tar.gz -c https://uni-bonn.sciebo.de/s/Ycl28f1Cppghvjm/download
tar -xvf kitti_example.tar.gz && rm kitti_example.tar.gz
