"""Self-describing checkpoint I/O (reference models/tensorBase.py:424-458).

Format: a single ``.npz`` holding every parameter array plus a JSON-encoded
``FieldConfig`` — the analog of the reference's ``{model_name, kwargs,
state_dict}`` dict, so checkpoints can be re-instantiated without external
config. The alpha mask is stored bit-packed (np.packbits) exactly like the
reference.

Also ships a converter for the reference's torch ``.th`` checkpoints so a
user can bring TensoRF models trained with the original codebase.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp

from iffnerf_tpu.models.field import AlphaMask, FieldConfig, make_alpha_mask


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return tuple(listify(node[str(i)]) for i in range(len(keys)))
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_field(path: str, config: FieldConfig, params,
               mask: AlphaMask | None = None) -> None:
    blobs = {f"params/{k}": v for k, v in _flatten(params).items()}
    if mask is not None:
        vol = np.asarray(mask.volume) > 0.5
        blobs["alphaMask.mask"] = np.packbits(vol.reshape(-1))
        blobs["alphaMask.shape"] = np.asarray(vol.shape, np.int64)
        blobs["alphaMask.aabb"] = np.asarray(mask.aabb, np.float32)
    blobs["config_json"] = np.frombuffer(
        json.dumps(dataclasses.asdict(config)).encode(), dtype=np.uint8
    )
    np.savez(path, **blobs)


def _config_from_dict(d: dict) -> FieldConfig:
    # tolerate configs written by newer/older versions (extra keys dropped,
    # missing keys take the dataclass defaults)
    known = {f.name for f in dataclasses.fields(FieldConfig)}
    d = {k: v for k, v in d.items() if k in known}
    for key in ("aabb",):
        d[key] = tuple(map(tuple, d[key]))
    for key in ("grid_size", "density_n_comp", "app_n_comp", "near_far"):
        d[key] = tuple(d[key])
    if "compact_ratios_eval" in d:  # JSON round-trips tuples as lists
        d["compact_ratios_eval"] = tuple(d["compact_ratios_eval"])
    return FieldConfig(**d)


def load_field(path: str):
    """-> (config, params, mask | None)"""
    with np.load(path) as z:
        blobs = {k: z[k] for k in z.files}
    config = _config_from_dict(
        json.loads(bytes(blobs.pop("config_json")).decode())
    )
    mask = None
    if "alphaMask.mask" in blobs:
        shape = tuple(blobs.pop("alphaMask.shape"))
        n = int(np.prod(shape))
        vol = np.unpackbits(blobs.pop("alphaMask.mask"))[:n].reshape(shape)
        mask = make_alpha_mask(
            jnp.asarray(vol, jnp.float32), blobs.pop("alphaMask.aabb"),
            config.contraction_type,
        )
    params = _unflatten(
        {k[len("params/"):]: v for k, v in blobs.items()}
    )
    return config, params, mask


def save_pytree(path: str, tree, meta: dict | None = None) -> None:
    """Generic pytree checkpoint (used for the ID module — analog of the
    reference's id_module.th dict, pose_estimation/train.py:226-234)."""
    blobs = _flatten(tree)
    if meta:
        blobs["meta_json"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    np.savez(path, **blobs)


def load_pytree(path: str):
    """-> (tree, meta dict)."""
    with np.load(path) as z:
        blobs = {k: z[k] for k in z.files}
    meta = {}
    if "meta_json" in blobs:
        meta = json.loads(bytes(blobs.pop("meta_json")).decode())
    return _unflatten(blobs), meta


# ---------------------------------------------------------------------------
# Reference .th (torch) checkpoint conversion
# ---------------------------------------------------------------------------

_SHADING_MAP_REF = {
    "diffuse_color_mlp.0": "diffuse",
    "tint_color_mlp.0": "tint",
    "roughness_mlp.0": "roughness",
    "bottleneck_mlp": "bottleneck",
    "specular_mlp.0": "specular",
    "normal_mlp.0": "normal",
}


def load_torch_checkpoint(path: str):
    """Convert a reference TensoRF ``.th`` checkpoint
    ({model_name, kwargs, state_dict} + packed alpha mask,
    models/tensorBase.py:424-458) into (config, params, mask)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    kwargs = ckpt["kwargs"]
    aabb = np.asarray(kwargs["aabb"], dtype=np.float32)
    config = FieldConfig(
        model_name=ckpt["model_name"],
        aabb=tuple(map(tuple, aabb.tolist())),
        grid_size=tuple(int(g) for g in kwargs["gridSize"]),
        density_n_comp=tuple(kwargs["density_n_comp"]),
        app_n_comp=tuple(kwargs["appearance_n_comp"]),
        app_dim=kwargs["app_dim"],
        shading_mode=kwargs["shadingMode"],
        near_far=tuple(float(x) for x in kwargs["near_far"]),
        density_shift=kwargs["density_shift"],
        alpha_mask_thres=kwargs["alphaMask_thres"],
        distance_scale=kwargs["distance_scale"],
        ray_march_weight_thres=kwargs["rayMarch_weight_thres"],
        pos_pe=kwargs["pos_pe"],
        view_pe=kwargs["view_pe"],
        fea_pe=kwargs["fea_pe"],
        feature_c=kwargs["featureC"],
        step_ratio=kwargs["step_ratio"],
        fea2dense_act=kwargs["fea2denseAct"],
        contraction_type=kwargs.get("contraction_type", "aabb"),
    )

    sd = {k: v.detach().numpy() for k, v in ckpt["state_dict"].items()}
    params: dict = {}
    is_vm = config.model_name == "TensorVMSplit"
    if is_vm:
        params["density_plane"] = tuple(
            jnp.asarray(sd[f"density_plane.{i}"][0].transpose(1, 2, 0))
            for i in range(3)
        )
        params["app_plane"] = tuple(
            jnp.asarray(sd[f"app_plane.{i}"][0].transpose(1, 2, 0))
            for i in range(3)
        )
    params["density_line"] = tuple(
        jnp.asarray(sd[f"density_line.{i}"][0, :, :, 0].T) for i in range(3)
    )
    params["app_line"] = tuple(
        jnp.asarray(sd[f"app_line.{i}"][0, :, :, 0].T) for i in range(3)
    )
    params["basis_mat"] = {"w": jnp.asarray(sd["basis_mat.weight"].T)}

    shading: dict = {}
    if config.shading_mode == "Ref":
        for ref_name, ours in _SHADING_MAP_REF.items():
            w_key = f"renderModule.{ref_name}.weight"
            if w_key not in sd:
                continue
            shading[ours] = {"w": jnp.asarray(sd[w_key].T)}
            b_key = f"renderModule.{ref_name}.bias"
            if b_key in sd:
                shading[ours]["b"] = jnp.asarray(sd[b_key])
    else:
        layers = []
        for i in (0, 2, 4):
            w_key = f"renderModule.mlp.{i}.weight"
            if w_key not in sd:
                break
            layer = {"w": jnp.asarray(sd[w_key].T)}
            b_key = f"renderModule.mlp.{i}.bias"
            if b_key in sd:
                layer["b"] = jnp.asarray(sd[b_key])
            layers.append(layer)
        # tuple, not list: keeps the pytree structure identical to
        # mlp_init's, so converted checkpoints round-trip structurally
        shading["mlp"] = tuple(layers)
    params["shading"] = shading

    mask = None
    if "alphaMask.aabb" in ckpt:
        shape = tuple(ckpt["alphaMask.shape"])
        n = int(np.prod(shape))
        vol = np.unpackbits(ckpt["alphaMask.mask"])[:n].reshape(shape)
        mask = make_alpha_mask(
            jnp.asarray(vol, jnp.float32),
            np.asarray(ckpt["alphaMask.aabb"], np.float32),
            config.contraction_type,
        )
    return config, params, mask
