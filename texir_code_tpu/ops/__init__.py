"""Device-side compute library: sampling, shading, ray casting, texturing.

Everything here is pure JAX (jit/vmap/shard_map-friendly, static shapes,
fp32 by default) and forms the hot path of all three pipeline stages.
"""
