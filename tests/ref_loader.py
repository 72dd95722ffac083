"""Import helper for the PUBLIC reference implementation at /root/reference.

Used ONLY as a parity oracle in tests (golden-value comparisons). Missing
heavy dependencies (torchvision, cv2, ...) are stubbed — the model layer
doesn't touch them at runtime.
"""

import sys
import types

_STUBS = (
    "omegaconf",
    "torchvision",
    "torchvision.transforms",
    "cv2",
    "scipy",
    "scipy.signal",
    "lpips",
    "plyfile",
    "skimage",
    "skimage.measure",
    "pytorch3d",
    "pytorch3d.transforms",
    "lietorch",
)


def import_reference():
    """Make /root/reference importable; returns its path or None if absent."""
    import os

    ref = "/root/reference"
    if not os.path.isdir(ref):
        return None
    import importlib.util

    stubbed = set()
    for name in _STUBS:
        if name in sys.modules:
            continue
        try:
            present = importlib.util.find_spec(name) is not None
        except (ImportError, ValueError):
            present = False
        if not present:
            sys.modules[name] = types.ModuleType(name)
            stubbed.add(name)
    if "omegaconf" in stubbed:
        sys.modules["omegaconf"].OmegaConf = object
    if "lietorch" in stubbed:
        sys.modules["lietorch"].SE3 = object
    if "pytorch3d" in stubbed:
        sys.modules["pytorch3d"].transforms = sys.modules["pytorch3d.transforms"]
        sys.modules["pytorch3d.transforms"].Rotate = object
        sys.modules["pytorch3d.transforms"].Translate = object
    if "torchvision" in stubbed:
        sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    if "scipy" in stubbed:
        sys.modules["scipy"].signal = sys.modules["scipy.signal"]
    _stub_kornia()
    if ref not in sys.path:
        sys.path.append(ref)
    return ref


def load_ref_module(relpath: str, name: str):
    """Load a single reference module by file path, bypassing package
    __init__ files (which import the whole loader zoo and its deps)."""
    import importlib.util
    import os

    import_reference()
    path = os.path.join("/root/reference", relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub_kornia():
    """Functional stand-ins for the two kornia symbols the reference uses."""
    import importlib.util

    if "kornia" in sys.modules:
        return
    try:
        if importlib.util.find_spec("kornia") is not None:
            return
    except (ImportError, ValueError):
        pass
    import torch

    def create_meshgrid(height, width, normalized_coordinates=True,
                        device=None, dtype=None):
        xs = torch.arange(width, dtype=torch.float32)
        ys = torch.arange(height, dtype=torch.float32)
        if normalized_coordinates:
            xs = 2.0 * xs / (width - 1) - 1.0
            ys = 2.0 * ys / (height - 1) - 1.0
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        return torch.stack([gx, gy], dim=-1)[None]

    kornia = types.ModuleType("kornia")
    kornia.create_meshgrid = create_meshgrid
    geometry = types.ModuleType("kornia.geometry")
    liegroup = types.ModuleType("kornia.geometry.liegroup")
    liegroup.Se3 = object
    kornia.geometry = geometry
    geometry.liegroup = liegroup
    sys.modules["kornia"] = kornia
    sys.modules["kornia.geometry"] = geometry
    sys.modules["kornia.geometry.liegroup"] = liegroup
