"""TensoFlow-TPU: a TPU-native inverse-rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
TensoFlow inverse renderer (CVPR 2025): tensorial SDF reconstruction
(stage 1, NeuS-style volume rendering over a VM-decomposed SDF field)
followed by physically-based material estimation with a conditional
normalizing-flow importance sampler (stage 2, Monte-Carlo shading).

Design stance (TPU-first, not a port):
  * pure-functional modules: parameters are pytrees, apply functions are pure
  * one jit/pjit-compiled train step per stage; rays sharded over a device
    mesh, parameters replicated, gradients all-reduced over ICI
  * fixed shapes everywhere: dense ``[rays, samples]`` layouts + masks replace
    the reference's variable-length CUDA sample lists (nerfacc ray_indices,
    torch_scatter segment_coo, BVH hit compaction)
  * Pallas kernels for gather-heavy hot paths; XLA fusion for the rest
"""

__version__ = "0.1.0"
