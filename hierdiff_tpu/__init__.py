"""HierDiff-TPU: a TPU-native hierarchical 3D molecule diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the coarse-to-fine hierarchical
diffusion pipeline of "Coarse-to-Fine: a Hierarchical Diffusion Model for
Molecule Generation in 3D" (ICML 2023). Three stages:

1. ``models.diffusion.CoarseDiffusion`` — an E(3)-equivariant denoising
   diffusion model over fragment-center point clouds (dense masked EGNN,
   1000-step reverse process as a single ``lax.scan``).
2. ``models.edge_denoise.EdgeDenoise`` + ``models.refine.NodeRefine`` — an
   autoregressive fine-grained stage that converts blurred point clouds into
   junction trees (focal / edge / node-type heads over depth-masked dense
   message passing).
3. ``chem`` + ``sampling`` — host-side RDKit assembly of junction trees into
   valid 3D molecules, overlapped with device compute.

All device compute uses dense masked (B, N, ...) layouts with bucketed static
shapes; distribution is expressed through ``jax.sharding`` meshes (see
``parallel``).
"""

__version__ = "0.1.0"
