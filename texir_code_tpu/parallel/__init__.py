"""Multi-chip scaling: device meshes, ray/texel sharding, gradient psum."""

from texir_code_tpu.parallel.mesh import (  # noqa: F401
    make_device_mesh,
    replicated,
    shard_along,
)
