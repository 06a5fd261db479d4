"""DrawingSpinUp-TPU: a TPU-native framework for turning a single amateur
character drawing into a stylized 3D animation.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capabilities as the reference DrawingSpinUp pipeline:

  stage 1 — contour removal     (FFC-ResNet spectral segmentation + inpainting)
  stage 2a — multi-view diffusion (cross-view / cross-domain attention UNet)
  stage 2b — NeuS SDF reconstruction (hash-grid field + volume rendering + MC)
  stage 3 — style translation   (skinned-mesh rasterizer + patch GANs + GIF)

The compute path is pure JAX (jit / shard_map / pallas); the runtime around it
(mesh extraction, IO, GIF encode) uses native C++ where hot.
"""

__version__ = "0.1.0"
