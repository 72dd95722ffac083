"""iffnerf_tpu — TPU-native (JAX/XLA/Pallas) framework with the capabilities of
mbortolon97/IFFNeRF (ICRA 2024).

Layers (mirrors reference layer map, re-designed TPU-first — see SURVEY.md §1):
  - ops/        fused numeric primitives (grid sampling, ray marching, encodings)
  - geometry/   rays, cameras, contractions
  - models/     TensoRF radiance fields (VM/CP) + shading heads (Ref, MLP, SH)
  - data/       dataset loaders (blender, tankstemple, nsvf, llff, ...)
  - render/     chunked renderer + evaluation harness
  - train/      TensoRF reconstruction loop (phase machinery, optax)
  - pose/       IFFNeRF pose-estimation pipeline (surface sampling, isocell,
                identification module, closed-form solver)
  - inerf/      iNeRF iterative pose-refinement baseline
  - parallel/   jax.sharding mesh utilities (ICI-sharded rendering/scoring)
  - utils/      metrics, misc math, mesh export, config system
"""

__version__ = "0.1.0"
