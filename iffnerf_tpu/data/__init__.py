"""Dataset loaders (reference: dataLoader/ — registry at __init__.py:12-22).

Loaders are host-side numpy producers. Every loader returns a ``RayDataset``
satisfying the reference's duck-typed contract (SURVEY.md §2.7): ``all_rays``
[ΣHW, 6|7] flat when ``is_stack=False`` (training) or [N, H, W, 6|7] stacked
(eval); ``all_rgbs`` 3- or 4-channel; ``poses`` [N, 4, 4]; ``K`` [1, 3, 3];
``scene_bbox`` [2, 3]; ``near_far``; ``white_bg``; ``img_wh``.
"""

from iffnerf_tpu.data.base import RayDataset
from iffnerf_tpu.data.blender import load_blender

# reference dataLoader/__init__.py:12-22; entries fill in as loaders land.
dataset_dict = {
    "blender": load_blender,
}


def register_dataset(name: str, loader) -> None:
    dataset_dict[name] = loader


def _lazy(name):
    def load(*args, **kwargs):
        import importlib

        mod = importlib.import_module(f"iffnerf_tpu.data.{name}")
        return getattr(mod, f"load_{name}")(*args, **kwargs)

    return load
