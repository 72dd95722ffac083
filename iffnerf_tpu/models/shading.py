"""Shading heads — per-ray color decoders selected by ``shading_mode``.

Re-designs the reference heads (models/tensorBase.py:38-47,138-259 and
models/ref.py:48-155) as pure functions over parameter pytrees. All heads
take ``(params, pts, viewdirs, features)`` and return ``(rgb, extra)``; the
Ref head additionally exposes ``compute_normals`` (models/ref.py:154-155),
needed by the pose pipeline's surface-normal query.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from iffnerf_tpu.nn import linear_init, linear_apply, mlp_init, mlp_apply
from iffnerf_tpu.ops.encoding import positional_encoding
from iffnerf_tpu.ops.ide import integrated_dir_enc, ide_output_dim
from iffnerf_tpu.ops.image import linear_to_srgb
from iffnerf_tpu.ops.sh import eval_sh_bases

RGB_PADDING = 0.001  # reference models/ref.py:64


def reflect(viewdirs: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    """Mirror viewdirs about normals (reference models/ref_utils.py:6-20)."""
    return (
        2.0 * jnp.sum(normals * viewdirs, axis=-1, keepdims=True) * normals
        - viewdirs
    )


# ---------------------------------------------------------------------------
# Ref head (Ref-NeRF style; reference models/ref.py:48-155)
# ---------------------------------------------------------------------------


def init_ref(key, in_channels: int, feature_c: int = 128, deg_view: int = 4,
             predicted_normals: bool = True):
    keys = jax.random.split(key, 6)
    params = {
        "diffuse": linear_init(keys[0], in_channels, 3),
        "tint": linear_init(keys[1], in_channels, 3),
        "roughness": linear_init(keys[2], in_channels, 1),
        "bottleneck": linear_init(keys[3], in_channels, feature_c),
        "specular": linear_init(
            keys[4], feature_c + ide_output_dim(deg_view) + 1, 3
        ),
    }
    if predicted_normals:
        params["normal"] = linear_init(keys[5], in_channels, 3)
    return params


def ref_normals(params, features: jnp.ndarray) -> jnp.ndarray:
    """The raw normal-MLP output: -normalize(linear(features)).

    Matches reference ``normal_mlp`` (models/ref.py:85-89); the *surface*
    normal used by the pose pipeline is the negation of this
    (``compute_normals``, models/ref.py:154).
    """
    raw = linear_apply(params["normal"], features)
    norm = jnp.linalg.norm(raw, axis=-1, keepdims=True)
    return -(raw / jnp.maximum(norm, 1e-12))


def apply_ref(params, pts, viewdirs, features, normals=None, deg_view: int = 4):
    """Ref head forward (reference models/ref.py:103-152)."""
    if normals is None:
        normals = ref_normals(params, features)

    tint = jax.nn.sigmoid(linear_apply(params["tint"], features))
    roughness = jax.nn.softplus(
        linear_apply(params["roughness"], features) - 1.0
    )
    bottleneck = linear_apply(params["bottleneck"], features)

    refdirs = reflect(-viewdirs, normals)
    dir_enc = integrated_dir_enc(refdirs, roughness, deg_view)

    dotprod = jnp.sum(normals * viewdirs, axis=-1, keepdims=True)
    x = jnp.concatenate([bottleneck, dir_enc, dotprod], axis=-1)

    specular = jax.nn.sigmoid(linear_apply(params["specular"], x))
    specular_linear = tint * specular
    diffuse_linear = jax.nn.sigmoid(
        linear_apply(params["diffuse"], features) - math.log(3.0)
    )

    rgb = jnp.clip(linear_to_srgb(specular_linear + diffuse_linear), 0.0, 1.0)
    rgb = rgb * (1.0 + 2.0 * RGB_PADDING) - RGB_PADDING
    return rgb, None


# ---------------------------------------------------------------------------
# MLP heads (reference models/tensorBase.py:165-259)
# ---------------------------------------------------------------------------


def init_mlp_head(key, dims):
    return {"mlp": mlp_init(key, dims, zero_last_bias=True)}


def apply_mlp_fea(params, pts, viewdirs, features, viewpe: int, feape: int):
    indata = [features, viewdirs]
    if feape > 0:
        indata.append(positional_encoding(features, feape))
    if viewpe > 0:
        indata.append(positional_encoding(viewdirs, viewpe))
    rgb = jax.nn.sigmoid(mlp_apply(params["mlp"], jnp.concatenate(indata, -1)))
    return rgb, None


def apply_mlp_pe(params, pts, viewdirs, features, viewpe: int, pospe: int):
    indata = [features, viewdirs]
    if pospe > 0:
        indata.append(positional_encoding(pts, pospe))
    if viewpe > 0:
        indata.append(positional_encoding(viewdirs, viewpe))
    rgb = jax.nn.sigmoid(mlp_apply(params["mlp"], jnp.concatenate(indata, -1)))
    return rgb, None


def apply_mlp(params, pts, viewdirs, features, viewpe: int):
    indata = [features, viewdirs]
    if viewpe > 0:
        indata.append(positional_encoding(viewdirs, viewpe))
    rgb = jax.nn.sigmoid(mlp_apply(params["mlp"], jnp.concatenate(indata, -1)))
    return rgb, None


def apply_mlp_gaussian(params, pts, viewdirs, features):
    x = jnp.concatenate([features, viewdirs], axis=-1)
    raw = mlp_apply(params["mlp"], x, activation=jax.nn.celu)
    return jax.nn.sigmoid(raw[..., :3]), raw[..., 3:]


def apply_sh(params, pts, viewdirs, features):
    """SH shading (reference models/tensorBase.py:38-42)."""
    sh_mult = eval_sh_bases(2, viewdirs)[..., None, :]
    rgb_sh = features.reshape(features.shape[:-1] + (3, sh_mult.shape[-1]))
    return jax.nn.relu(jnp.sum(sh_mult * rgb_sh, axis=-1) + 0.5), None


def apply_rgb(params, pts, viewdirs, features):
    return features, None


# ---------------------------------------------------------------------------
# Dispatch (reference models/tensorBase.py:328-352)
# ---------------------------------------------------------------------------


def init_shading(key, shading_mode: str, app_dim: int, view_pe: int,
                 pos_pe: int, fea_pe: int, feature_c: int):
    if shading_mode == "Ref":
        return init_ref(key, app_dim, feature_c)
    if shading_mode == "MLP_Fea":
        in_c = 2 * view_pe * 3 + 2 * fea_pe * app_dim + 3 + app_dim
        return init_mlp_head(key, [in_c, feature_c, feature_c, 3])
    if shading_mode == "MLP_PE":
        in_c = (3 + 2 * view_pe * 3) + (3 + 2 * pos_pe * 3) + app_dim
        return init_mlp_head(key, [in_c, feature_c, feature_c, 3])
    if shading_mode == "MLP":
        in_c = (3 + 2 * view_pe * 3) + app_dim
        return init_mlp_head(key, [in_c, feature_c, feature_c, 3])
    if shading_mode == "MLP_GARF":
        in_c = 3 + app_dim
        return init_mlp_head(key, [in_c, in_c, in_c, in_c])
    if shading_mode in ("SH", "RGB"):
        return {}
    raise ValueError(f"Unrecognized shading mode: {shading_mode}")


def apply_shading(params, shading_mode: str, pts, viewdirs, features,
                  view_pe: int = 6, pos_pe: int = 6, fea_pe: int = 6):
    if shading_mode == "Ref":
        return apply_ref(params, pts, viewdirs, features)
    if shading_mode == "MLP_Fea":
        return apply_mlp_fea(params, pts, viewdirs, features, view_pe, fea_pe)
    if shading_mode == "MLP_PE":
        return apply_mlp_pe(params, pts, viewdirs, features, view_pe, pos_pe)
    if shading_mode == "MLP":
        return apply_mlp(params, pts, viewdirs, features, view_pe)
    if shading_mode == "MLP_GARF":
        return apply_mlp_gaussian(params, pts, viewdirs, features)
    if shading_mode == "SH":
        return apply_sh(params, pts, viewdirs, features)
    if shading_mode == "RGB":
        return apply_rgb(params, pts, viewdirs, features)
    raise ValueError(f"Unrecognized shading mode: {shading_mode}")


def compute_normals(params, shading_mode: str, features: jnp.ndarray):
    """Surface normals from the Ref head (reference models/ref.py:154-155)."""
    assert shading_mode == "Ref", "normals require the Ref shading head"
    return -ref_normals(params, features)
