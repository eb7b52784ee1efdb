"""texir_code_tpu — a TPU-native differentiable inverse-rendering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of TexIR
("Multi-view Inverse Rendering for Large-scale Real-world Indoor Scenes",
CVPR 2023; reference implementation at /root/reference):

  * NIrF  — neural irradiance field training (reference: trainer/train_irrf.py)
  * IrT   — Monte-Carlo irradiance-texture baking (reference: models/tracer_o3d_irt.py)
  * Mat   — SVBRDF (albedo/roughness) texture optimization with a differentiable
            cube-map renderer (reference: models/mat_nvdiffrast.py,
            trainer/train_material.py)
  * baseline heads (InvRender / NeILF / nvdiffrec) and evaluation runners
            (editing, novel view, relighting, re-render error)

Architecture differences from the reference (TPU-first, not a port):

  * All light transport stays on-device: a skip-link ("threaded") BVH built
    host-side is traversed by a vectorized, stackless XLA/Pallas kernel —
    replacing the CPU Open3D/Embree round trip (reference
    models/mat_nvdiffrast.py:292-320 "RaycastingScene only support cpu").
  * Primary visibility is ray-cast, not rasterized: the cube-face G-buffers the
    reference gets from nvdiffrast's OpenGL rasterizer are produced by casting
    per-pixel rays through the same MVP frustum; the reference detaches all
    G-buffers, so only forward-mode correctness is required
    (reference models/mat_nvdiffrast.py:149,179,182).
  * Texture sampling (the only differentiable path into the atlases) is a
    JAX mip-pyramid sampler whose backward is XLA scatter-add / segment-sum —
    replacing nvdiffrast's dr.texture.
  * Scaling is ray/texel data-parallelism over a jax.sharding.Mesh with psum
    gradient all-reduce, replacing nothing in the reference (it is strictly
    single-GPU) but required for the pod-scale deployment target.
"""

__version__ = "0.1.0"
