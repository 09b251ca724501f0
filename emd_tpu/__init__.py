"""emd_tpu: a TPU-native differentiable Gaussian-splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of qingpowuwu/emd
(EMD: Explicit Motion Decomposition for street-scene 3DGS, ICCV 2025):

- ``core``   — quaternion / SE(3) / spherical-harmonic / camera math (pure jnp)
- ``raster`` — the differentiable rasterizer: EWA projection, tile binning via
  XLA segmented sort, and depth-ordered alpha compositing as Pallas TPU
  kernels with a hand-derived backward (custom_vjp)
- ``motion`` — EMD motion layer: temporal embedding grids with coarse-to-fine
  interpolation, SE(3) rigid-actor tracks, conditional deformation MLPs,
  hexplane fields, SMPL linear-blend skinning
- ``scene``  — scene graph over capacity-padded Gaussian classes
  (Background / RigidNodes / DeformableNodes / SMPLNodes / Sky / Affine)
- ``train``  — losses, optimizer groups, densification controller, train loop
- ``data``   — processed-scene datasets (Waymo layouts of both reference
  subprojects), synthetic scenes, importance sampling
- ``dist``   — device-mesh sharding of pixels x gaussians, multi-host init
- ``eval``   — PSNR/SSIM/LPIPS metrics, decomposition renders, trajectories
"""

__version__ = "0.1.0"
