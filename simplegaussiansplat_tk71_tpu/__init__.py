"""TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch+CUDA implementation ``TaiseiNiman/SimpleGaussianSplat_tk71``:

- COLMAP scene loading (pure-python binary parser; reference: gs_load_colmap.py)
- Differentiable projection of 3D Gaussians (quaternion/scale covariances,
  SH colors, logit opacities; reference: gs_model.py:277-460)
- Tile-based depth-sorted alpha compositing with an analytic custom VJP
  (reference: gs_model.py:477-820 + cuda_kernel/ segmented scans)
- L1 + D-SSIM training with adaptive densify/split/clone/prune
  (reference: gs_control.py, gs_model.py:190-271)
- Multi-chip sharding over a jax.sharding.Mesh (absent in the reference,
  which is strictly single-GPU; see SURVEY.md section 2b)
"""

__version__ = "0.1.0"

from simplegaussiansplat_tk71_tpu.models.gaussians import GaussianModel  # noqa: F401
