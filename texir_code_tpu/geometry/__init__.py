"""Host-side geometry & assets: OBJ/mesh IO, BVH build, surface sampling.

This layer runs on the host (numpy / optional C++ extension) and emits flat
SoA arrays consumed by the on-device kernels in texir_code_tpu.ops.
"""

from texir_code_tpu.geometry.mesh import Mesh  # noqa: F401
from texir_code_tpu.geometry.obj import load_obj  # noqa: F401
from texir_code_tpu.geometry.bvh import build_bvh, FlatBVH  # noqa: F401
