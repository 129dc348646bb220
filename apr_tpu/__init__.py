"""apr_tpu — TPU-native distant point-cloud registration framework.

A brand-new JAX / XLA / Pallas / pjit implementation of the capabilities of
liuQuan98/APR (IJCAI'23): training and evaluating feature extractors for
distant LiDAR point-cloud registration with the APR recipe (encoder + NPR
generative decoder reconstructing an Aggregated Point Cloud), plus the full
registration pipeline (voxelization, neighbor search, sparse convolution,
KPConv, Chamfer, RANSAC/Kabsch pose estimation) as on-device kernels over
padded fixed-capacity buffers.

Subpackages
-----------
- ``ops``          geometry primitives: voxelize / neighbors / chamfer / pooling
- ``geometry``     SE(3) math, Kabsch, robust IRLS solver, ICP, pose graphs
- ``registration`` matching, RANSAC, registration metrics
- ``models``       SparseResUNet (FCGF path), KPFCNN (Predator path), MLP decoders
- ``losses``       hardest-contrastive, circle/overlap/saliency, chamfer
- ``data``         KITTI / nuScenes readers, APG complement pipeline, synthetic
- ``training``     trainers, optax schedules, orbax checkpointing
- ``parallel``     mesh + sharding helpers (data parallel over ICI)
- ``eval``         testers / benchmark harness
"""

__version__ = "0.1.0"
