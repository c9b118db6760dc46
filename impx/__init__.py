"""impx — a TPU-native (JAX/XLA/Pallas) rebuild of the IMP iterative matching framework.

Capabilities mirror feixue94/imp-release (CVPR 2023 "IMP: Iterative Matching and Pose
estimation with adaptive pooling"): SuperPoint/RootSIFT feature extraction, recurrent
self/cross attention graph matching with Sinkhorn optimal transport, EIMP adaptive
keypoint pooling, iterative match<->pose estimation with early stopping, and the
YFCC/ScanNet/MegaDepth data + eval pipelines.

Design (TPU-first, not a port):
  * static shapes everywhere: keypoint sets are padded to buckets and carried with
    validity masks; masked attention/Sinkhorn are mathematically exact w.r.t. the
    variable-size computation (see impx/ops/sinkhorn.py).
  * functional models: parameters are explicit pytrees, applied with pure functions
    under jit; data-parallel training is a jit-sharded step over a jax Mesh.
  * on-device robust pose estimation (batched RANSAC + essential solver) so the
    iterative match->pose loop runs without host round-trips.
"""

__version__ = "0.1.0"
