"""lorastencil_tpu: a TPU-native low-rank stencil computation framework.

Re-implements the capabilities of the LoRAStencil SC'24 artifact
(stencils as low-rank banded GEMMs on matrix units) with a JAX/Pallas/pjit
architecture: MXU banded matmuls inside Pallas kernels, VMEM halo-window
tiling, lax loops for timestepping, and shard_map + ppermute domain
decomposition for multi-chip grids.
"""

from .models.shapes import ALL_SHAPES, StencilSpec, SeparableTerm, get_shape

__version__ = "0.1.0"
__all__ = ["ALL_SHAPES", "StencilSpec", "SeparableTerm", "get_shape"]
