"""pin_slam_tpu — a TPU-native (JAX/XLA/Pallas) LiDAR & RGB-D SLAM framework.

A from-scratch rebuild of the capabilities of PRBonn/PIN_SLAM (point-based
implicit neural SLAM) designed for TPU execution: fixed-capacity HBM-resident
neural-point map with a voxel hash table, fused kNN feature queries, online
SDF training, correspondence-free point-to-SDF Gauss-Newton registration
compiled as a single jit program, scan-context loop detection, JAX pose-graph
optimization with elastic map deformation, and a chunked marching-cubes
mesher.

Reference behavior parity targets are documented per-module with
`file:line` citations into the reference repo.
"""

__version__ = "0.1.0"
