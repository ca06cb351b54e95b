"""Core compute ops: pure-jnp math + Pallas kernels.

Each module here replaces one CUDA/C++ component of the reference
(``gsplat/cuda/csrc/*``, see SURVEY.md §2.1). Forward math is pure jnp where
XLA fusion suffices; only the tile rasterizer gets hand-written Pallas
kernels with a custom VJP.
"""
