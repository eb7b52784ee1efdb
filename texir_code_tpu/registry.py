"""Dynamic class resolution — the framework's plugin system.

The reference selects dataset/model/loss classes by dotted-path strings in the
HOCON config, resolved reflectively (reference utils/general.py:12-18, used at
trainer/train_material.py:97,110,115).  We keep that contract — configs name
classes like ``texir_code_tpu.models.material.MaterialModel`` — and add an
alias registry so reference config files naming the *old* classes
(``models.mat_nvdiffrast.MaterialModel``) resolve to their TPU equivalents.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict

# reference dotted paths → texir_code_tpu equivalents
_ALIASES: Dict[str, str] = {
    # datasets (reference datasets/dataset.py)
    "datasets.dataset.MeshPoint": "texir_code_tpu.data.datasets.MeshPoint",
    "datasets.dataset.ImageMeshPoint": "texir_code_tpu.data.datasets.ImageMeshPoint",
    "datasets.dataset.ImageDerived": "texir_code_tpu.data.datasets.ImageDerived",
    "datasets.dataset.ImageCubeDerived": "texir_code_tpu.data.datasets.ImageCubeDerived",
    "datasets.dataset.ImageCubeNovel": "texir_code_tpu.data.datasets.ImageCubeNovel",
    "datasets.dataset.ImageCubeSyn": "texir_code_tpu.data.datasets.ImageCubeSyn",
    # models
    "models.tracer_o3d.TracerO3d": "texir_code_tpu.models.tracer_irf.TracerIRF",
    "models.mat_mlp.MaterialMLP": "texir_code_tpu.models.material_mlp.MaterialMLP",
    "models.mat_redner.MaterialModel": "texir_code_tpu.models.material_redner.RednerMaterialModel",
    "models.tracer_o3d_irrf.TracerO3d": "texir_code_tpu.models.tracer_irrf.TracerIRRF",
    "models.tracer_o3d_irt.TracerO3d": "texir_code_tpu.models.tracer_irt.IrradianceTextureBaker",
    "models.tracer_o3d_pil.TracerO3d": "texir_code_tpu.models.tracer_pil.TracerPIL",
    "models.mat_nvdiffrast.MaterialModel": "texir_code_tpu.models.material.MaterialModel",
    "models.mat_nvdiffrast_invrender.MaterialModel": "texir_code_tpu.models.material_heads.InvRenderMaterialModel",
    "models.mat_nvdiffrast_neilf.MaterialModel": "texir_code_tpu.models.material_heads.NeILFMaterialModel",
    "models.mat_nvdiffrast_recMLP.MaterialModel": "texir_code_tpu.models.material_heads.NvDiffRecMaterialModel",
    "models.mat_nvdiffrast_rec.MaterialModel": "texir_code_tpu.models.material_heads.NvDiffRecMaterialModel",
    "models.test_nvdiffrast.MaterialModel": "texir_code_tpu.eval.renderer.EvalMaterialModel",
    "models.test_redner.MaterialModel": "texir_code_tpu.eval.path_tracer.PathTracedMaterialModel",
    # losses
    "models.loss.IRFLoss": "texir_code_tpu.models.losses.IRFLoss",
    "models.loss.RenderLoss": "texir_code_tpu.models.losses.RenderLoss",
    "models.loss.InvLoss": "texir_code_tpu.models.losses.InvLoss",
    "models.loss.NeILFLoss": "texir_code_tpu.models.losses.NeILFLoss",
    "models.loss.NvDiffRecLoss": "texir_code_tpu.models.losses.NvDiffRecLoss",
}

_REGISTRY: Dict[str, Any] = {}


def register(name: str, obj: Any) -> Any:
    """Register an object under a short name (usable from configs)."""
    _REGISTRY[name] = obj
    return obj


def get_class(path: str) -> Any:
    """Resolve a dotted path (or registered short name / reference alias)."""
    if path in _REGISTRY:
        return _REGISTRY[path]
    path = _ALIASES.get(path, path)
    module_name, _, attr = path.rpartition(".")
    if not module_name:
        raise ImportError(f"not a dotted path or registered name: {path!r}")
    module = importlib.import_module(module_name)
    return getattr(module, attr)
