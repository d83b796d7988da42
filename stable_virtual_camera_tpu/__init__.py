"""stable_virtual_camera_tpu — a TPU-native novel-view-synthesis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`stable-virtual-camera` (Seva): a 1.3B multiview latent-diffusion model that,
given 1..N posed input images and M target camera poses, generates
3D-consistent novel views along arbitrary camera trajectories.

Layer map (TPU-first, see SURVEY.md §7):
  core/      camera math, Plücker rays, trajectory presets, scene normalization
  models/    Seva UNet / SD2.1 VAE / CLIP ViT-H image tower as flax modules (NHWC)
  ops/       Pallas TPU kernels (multiview flash attention, fused GroupNorm)
  sampling/  EDM discretization + CFG guidance + Euler sampler as a jitted scan
  engine/    chunk planner + two-pass orchestrator (host-side, pure numpy)
  parallel/  device mesh, view-axis sharding, collective attention
  data/      reconfusion / colmap / direct scene parsers, output writers
  apps/      CLI compatible with the reference demo.py flag surface
"""

__version__ = "0.1.0"
