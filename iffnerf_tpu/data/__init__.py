"""Dataset loaders (reference: dataLoader/ — registry at __init__.py:12-22).

Loaders are host-side numpy producers. Every loader returns a ``RayDataset``
satisfying the reference's duck-typed contract (SURVEY.md §2.7): ``all_rays``
[ΣHW, 6|7] flat when ``is_stack=False`` (training) or [N, H, W, 6|7] stacked
(eval); ``all_rgbs`` 3- or 4-channel; ``poses`` [N, 4, 4]; ``K`` [1, 3, 3];
``scene_bbox`` [2, 3]; ``near_far``; ``white_bg``; ``img_wh``.
"""

from iffnerf_tpu.data.base import RayDataset
from iffnerf_tpu.data.blender import load_blender
from iffnerf_tpu.data.nsvf import load_nsvf
from iffnerf_tpu.data.tankstemple import load_tankstemple
from iffnerf_tpu.data.llff import load_llff
from iffnerf_tpu.data.your_own import load_your_own
from iffnerf_tpu.data.mip360 import load_mip360
from iffnerf_tpu.data.repair import load_repair
from iffnerf_tpu.data.co3d import load_co3d
from iffnerf_tpu.data.co3d_metashape import load_co3d_metashape

# reference dataLoader/__init__.py:12-22
dataset_dict = {
    "blender": load_blender,
    "nsvf": load_nsvf,
    "tankstemple": load_tankstemple,
    "llff": load_llff,
    "mip360": load_mip360,
    "repair": load_repair,
    "co3d": load_co3d,
    "co3d_metashape": load_co3d_metashape,
    "own_data": load_your_own,
}


def register_dataset(name: str, loader) -> None:
    dataset_dict[name] = loader
