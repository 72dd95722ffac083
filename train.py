"""TensoRF training CLI — reference-parity driver
(reference train.py:126-521: same flags via configs/*.txt, same phases).

Usage:
    python train.py --config configs/lego.txt
    python train.py --config configs/lego.txt --render_only 1 --render_test 1 --ckpt <ckpt.npz>
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The environment's sitecustomize force-registers the TPU plugin and latches
# JAX_PLATFORMS before user code runs; this hook restores the standard env-var
# behavior (IFFNERF_PLATFORM=cpu python train.py ... for host-only runs).
from iffnerf_tpu.runtime import setup as _runtime_setup

_runtime_setup()

from iffnerf_tpu.config import config_parser


def render_test(args):
    """Checkpoint-only evaluation (reference train.py:53-123)."""
    from iffnerf_tpu.checkpoint import load_field, load_torch_checkpoint
    from iffnerf_tpu.data import dataset_dict
    from iffnerf_tpu.render import evaluation, evaluation_path

    loader = dataset_dict[args.dataset_name]
    test_dataset = loader(args.datadir, split="test",
                          downsample=args.downsample_train, is_stack=True)
    if args.ckpt is None or not os.path.exists(args.ckpt):
        print("the ckpt path does not exist!")
        return
    if args.ckpt.endswith(".th"):
        config, params, mask = load_torch_checkpoint(args.ckpt)
    else:
        config, params, mask = load_field(args.ckpt)

    # multi-device hosts: shard the eval ray chunks over a data mesh
    # (SURVEY.md §5); parameters replicate
    import jax

    mesh = None
    if int(getattr(args, "data_mesh", -1) or -1) != 0 and jax.device_count() > 1:
        from iffnerf_tpu.parallel import make_mesh, replicate_arrays

        mesh = make_mesh()
        params = replicate_arrays(mesh, params)
        if mask is not None:
            mask = replicate_arrays(mesh, mask)

    logfolder = os.path.dirname(args.ckpt)
    if args.render_train:
        train_dataset = loader(args.datadir, split="train",
                               downsample=args.downsample_train, is_stack=True)
        psnrs = evaluation(
            train_dataset, config, params, mask,
            f"{logfolder}/imgs_train_all", N_vis=-1,
            n_samples=-1, white_bg=test_dataset.white_bg,
            ndc_ray=bool(args.ndc_ray), mesh=mesh,
        )
        print(f"======> {args.expname} train all psnr: {np.mean(psnrs)} <====")
    if args.render_test:
        psnrs = evaluation(
            test_dataset, config, params, mask,
            f"{logfolder}/imgs_test_all", N_vis=-1,
            n_samples=-1, white_bg=test_dataset.white_bg,
            ndc_ray=bool(args.ndc_ray), mesh=mesh,
        )
        print(f"======> {args.expname} test all psnr: {np.mean(psnrs)} <====")
    if args.render_path and test_dataset.render_path is not None:
        evaluation_path(
            config, params, mask, test_dataset.render_path, test_dataset,
            f"{logfolder}/imgs_path_all", white_bg=test_dataset.white_bg,
            ndc_ray=bool(args.ndc_ray), mesh=mesh,
        )


def export_mesh(args):
    """Marching-cubes PLY export from a checkpoint
    (reference train.py:39-49)."""
    from iffnerf_tpu.checkpoint import load_field, load_torch_checkpoint
    from iffnerf_tpu.utils.mesh import export_mesh_from_field

    if args.ckpt.endswith(".th"):
        config, params, mask = load_torch_checkpoint(args.ckpt)
    else:
        config, params, mask = load_field(args.ckpt)
    export_mesh_from_field(
        config, params, mask, args.ckpt.rsplit(".", 1)[0] + ".ply"
    )


if __name__ == "__main__":
    np.random.seed(20211202)
    args = config_parser()
    print(args)
    if args.export_mesh:
        export_mesh(args)
    if args.render_only and (args.render_test or args.render_path):
        render_test(args)
    elif not args.export_mesh:
        from iffnerf_tpu.train import reconstruction

        reconstruction(args, seed=20211202)
