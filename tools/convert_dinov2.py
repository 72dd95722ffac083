"""Offline DINOv2 ViT-S/14 weight converter (SURVEY.md §7 hard part 3).

The reference downloads ``dinov2_vits14`` through torch.hub at runtime
(pose_estimation/backbone.py:3-15); this environment has no egress, so
conversion is a one-time offline step wherever the weights exist:

    # from a torch.hub cache or a downloaded checkpoint:
    python tools/convert_dinov2.py --torch_ckpt dinov2_vits14.pth \
        --out dinov2_vits14.npz
    # or from HuggingFace (facebook/dinov2-small) if cached locally:
    python tools/convert_dinov2.py --hf facebook/dinov2-small --out out.npz

The resulting npz plugs into the pose CLI via ``--backbone_ckpt``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def from_torch_ckpt(path: str):
    import torch

    from iffnerf_tpu.pose.vit import convert_torch_dinov2

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return convert_torch_dinov2(sd)


def from_hf(name: str):
    """Map HuggingFace Dinov2Model weights into torch-hub naming, then
    convert."""
    from transformers import Dinov2Model

    from iffnerf_tpu.pose.vit import convert_torch_dinov2

    model = Dinov2Model.from_pretrained(name)
    hf = {k: v for k, v in model.state_dict().items()}
    sd = {
        "cls_token": hf["embeddings.cls_token"][0],
        "pos_embed": hf["embeddings.position_embeddings"][0],
        "patch_embed.proj.weight":
            hf["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            hf["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": hf["layernorm.weight"],
        "norm.bias": hf["layernorm.bias"],
    }
    import torch

    i = 0
    while f"encoder.layer.{i}.norm1.weight" in hf:
        p = f"encoder.layer.{i}"
        q = hf[f"{p}.attention.attention.query.weight"]
        k = hf[f"{p}.attention.attention.key.weight"]
        v = hf[f"{p}.attention.attention.value.weight"]
        qb = hf[f"{p}.attention.attention.query.bias"]
        kb = hf[f"{p}.attention.attention.key.bias"]
        vb = hf[f"{p}.attention.attention.value.bias"]
        sd[f"blocks.{i}.attn.qkv.weight"] = torch.cat([q, k, v], dim=0)
        sd[f"blocks.{i}.attn.qkv.bias"] = torch.cat([qb, kb, vb], dim=0)
        sd[f"blocks.{i}.attn.proj.weight"] = hf[
            f"{p}.attention.output.dense.weight"]
        sd[f"blocks.{i}.attn.proj.bias"] = hf[
            f"{p}.attention.output.dense.bias"]
        sd[f"blocks.{i}.norm1.weight"] = hf[f"{p}.norm1.weight"]
        sd[f"blocks.{i}.norm1.bias"] = hf[f"{p}.norm1.bias"]
        sd[f"blocks.{i}.norm2.weight"] = hf[f"{p}.norm2.weight"]
        sd[f"blocks.{i}.norm2.bias"] = hf[f"{p}.norm2.bias"]
        sd[f"blocks.{i}.ls1.gamma"] = hf[f"{p}.layer_scale1.lambda1"]
        sd[f"blocks.{i}.ls2.gamma"] = hf[f"{p}.layer_scale2.lambda1"]
        sd[f"blocks.{i}.mlp.fc1.weight"] = hf[f"{p}.mlp.fc1.weight"]
        sd[f"blocks.{i}.mlp.fc1.bias"] = hf[f"{p}.mlp.fc1.bias"]
        sd[f"blocks.{i}.mlp.fc2.weight"] = hf[f"{p}.mlp.fc2.weight"]
        sd[f"blocks.{i}.mlp.fc2.bias"] = hf[f"{p}.mlp.fc2.bias"]
        i += 1
    return convert_torch_dinov2(sd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_ckpt", type=str, default=None)
    ap.add_argument("--hf", type=str, default=None)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    from iffnerf_tpu.checkpoint import save_pytree

    if args.torch_ckpt:
        params = from_torch_ckpt(args.torch_ckpt)
    elif args.hf:
        params = from_hf(args.hf)
    else:
        ap.error("one of --torch_ckpt / --hf is required")
    save_pytree(args.out, params, {"arch": "dinov2_vits14"})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
