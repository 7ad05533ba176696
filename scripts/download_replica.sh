#!/bin/bash
# Download the pin-format Replica RGB-D sequences (reference:
# scripts/download_replica.sh) into data/.
set -e
mkdir -p data && cd data
echo "Downloading Replica (pin-format)..."
wget -O replica_pin.tar.gz -c https://uni-bonn.sciebo.de/s/bfvO0PVXCfi8lPQ/download
tar -xvf replica_pin.tar.gz && rm replica_pin.tar.gz
