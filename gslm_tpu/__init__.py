"""gslm_tpu — TPU-native 3D Gaussian Splatting + Levenberg-Marquardt framework.

A from-scratch JAX/Pallas/pjit re-design of the capabilities of
``rogerhh/gaussian-splatting-lm`` (reference mounted at /root/reference):

- functional Gaussian parameter pytrees instead of mutable nn.Parameters
  (reference: scene/gaussian_model.py),
- a tile-based differentiable rasterizer built from vectorized XLA ops and
  Pallas kernels instead of CUDA (reference: diff-gaussian-rasterization-jvp),
- matrix-free LM via jax.jvp/jax.vjp instead of torch fwAD/autograd
  (reference: solver/solver_functions.py),
- damped CGLS as a jitted lax.while_loop (reference: solver/conjugate_gradient.py),
- multi-chip scaling over a (data, model) jax.sharding.Mesh (new capability;
  the reference is single-GPU only).
"""

__version__ = "0.1.0"
