"""TPU-native STAGE framework for TVQA+ spatio-temporal video QA.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference PyTorch implementation (jayleicn/TVQAplus).  The compute path is a
single jitted train/eval step with vmapped five-way answer scoring, static
bucketed input shapes, fused Pallas kernels for the hot ops, and a
`jax.sharding.Mesh`-based data-parallel (optionally context-parallel) layout.
"""

__version__ = "0.1.0"
