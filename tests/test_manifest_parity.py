"""Full-size SVD-XT checkpoint-compatibility tests against vendored
state-dict manifests (tests/fixtures/svd_manifests.py).

Two directions per component, at the REAL SVD-XT size (via jax.eval_shape —
no weights are materialized; leaves are zero-stride broadcast views):

  export:  flax params -> torch names/shapes == manifest exactly
  import:  synthetic torch state dict built from the manifest strict-loads
           into the flax module (name + shape coverage of all ~700 keys)

A single wrong name or transpose anywhere in the 1.5B-param tree fails
here, instead of the day real `diffusion_pytorch_model.safetensors` land.
Parity targets: diffusers 0.27.2 UNetSpatioTemporalConditionModel /
AutoencoderKLTemporalDecoder (reference requirements.txt:3, config at
/root/reference/src/ctrlv/models/unet_spatio_temporal_condition.py:176-199),
the reference ControlNetModel (models/controlnet.py:101-192), and
transformers' CLIPVisionModelWithProjection (generated live, meta device).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))

from svd_manifests import (  # noqa: E402
    clip_vit_h_manifest,
    svd_xt_controlnet_manifest,
    svd_xt_unet_manifest,
    svd_xt_vae_manifest,
)

from ctrlv_tpu.models import (  # noqa: E402
    AutoencoderKLTemporalDecoder,
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
    ControlNetSpatioTemporal,
    UNetSpatioTemporalConditionModel,
    UNetSTConfig,
    VAEConfig,
)
from ctrlv_tpu.train.hf_import import (  # noqa: E402
    flax_params_to_torch_state_dict,
    torch_state_dict_to_flax,
)


def _zero_view(shape, dtype=np.float32):
    """O(1)-memory stand-in array of the given shape."""
    return np.broadcast_to(np.zeros((), dtype=dtype), tuple(shape))


def _template_params(init_fn, *args):
    """Abstract-init a module and return params as broadcast-zero views."""
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0), *args)["params"]
    return jax.tree.map(lambda s: _zero_view(s.shape), shapes)


def _check_export(flax_params, manifest, component=None):
    sd = flax_params_to_torch_state_dict(flax_params, component=component)
    got = {k: tuple(np.shape(v)) for k, v in sd.items()}
    missing = sorted(set(manifest) - set(got))
    extra = sorted(set(got) - set(manifest))
    assert not missing and not extra, (
        f"key drift: missing={missing[:10]} ({len(missing)}), "
        f"extra={extra[:10]} ({len(extra)})"
    )
    bad = {k: (got[k], manifest[k]) for k in manifest if got[k] != manifest[k]}
    assert not bad, f"shape drift: {dict(list(bad.items())[:10])}"


def _check_import(flax_params, manifest):
    synthetic = {k: _zero_view(s) for k, s in manifest.items()}
    # strict=True raises on any missing/shape-mismatched flax param
    restored = torch_state_dict_to_flax(
        synthetic, expected=flax_params, strict=True
    )
    flat = jax.tree_util.tree_leaves(restored)
    assert len(flat) == len(jax.tree_util.tree_leaves(flax_params))


@pytest.fixture(scope="module")
def unet_params():
    model = UNetSpatioTemporalConditionModel(config=UNetSTConfig())
    sample = jnp.zeros((1, 2, 8, 8, 8))
    t = jnp.zeros(())
    ehs = jnp.zeros((1, 1, 1024))
    ids = jnp.zeros((1, 3))
    return _template_params(
        lambda k, *a: model.init(k, *a), sample, t, ehs, ids
    )


def test_unet_export_matches_manifest(unet_params):
    manifest = svd_xt_unet_manifest()
    n_params = sum(int(np.prod(s)) for s in manifest.values())
    assert 1.4e9 < n_params < 1.6e9, n_params  # SVD-XT UNet is ~1.52B
    _check_export(unet_params, manifest)


def test_unet_import_strict(unet_params):
    _check_import(unet_params, svd_xt_unet_manifest())


@pytest.fixture(scope="module")
def controlnet_params():
    model = ControlNetSpatioTemporal(config=UNetSTConfig())
    sample = jnp.zeros((1, 2, 8, 8, 8))
    cond = jnp.zeros((1, 2, 8, 8, 4))
    return _template_params(
        lambda k, *a: model.init(k, *a),
        sample,
        jnp.zeros(()),
        jnp.zeros((1, 1, 1024)),
        jnp.zeros((1, 3)),
        cond,
    )


def test_controlnet_export_matches_manifest(controlnet_params):
    _check_export(controlnet_params, svd_xt_controlnet_manifest())


def test_controlnet_import_strict(controlnet_params):
    _check_import(controlnet_params, svd_xt_controlnet_manifest())


@pytest.fixture(scope="module")
def vae_params():
    model = AutoencoderKLTemporalDecoder(config=VAEConfig())
    x = jnp.zeros((1, 32, 32, 3))
    return _template_params(
        lambda k, *a: model.init(k, *a, num_frames=1), x
    )


def test_vae_export_matches_manifest(vae_params):
    manifest = svd_xt_vae_manifest()
    n_params = sum(int(np.prod(s)) for s in manifest.values())
    assert 8e7 < n_params < 2e8, n_params
    _check_export(vae_params, manifest)


def test_vae_import_strict(vae_params):
    _check_import(vae_params, svd_xt_vae_manifest())


@pytest.fixture(scope="module")
def clip_params():
    model = CLIPVisionModelWithProjection(config=CLIPVisionConfig())
    x = jnp.zeros((1, 224, 224, 3))
    return _template_params(lambda k, *a: model.init(k, *a), x)


def test_clip_export_matches_manifest(clip_params):
    _check_export(clip_params, clip_vit_h_manifest(), component="image_encoder")


def test_clip_import_strict(clip_params):
    _check_import(clip_params, clip_vit_h_manifest())


def test_literal_linear_names_roundtrip():
    """The ADVICE round-1 bug: time_embedding.linear_1 must not export as
    time_embedding.linear.1 (a name real diffusers would reject)."""
    params = {"time_embedding": {"linear_1": {"kernel": np.zeros((4, 8))}}}
    sd = flax_params_to_torch_state_dict(params)
    assert list(sd) == ["time_embedding.linear_1.weight"]
    assert sd["time_embedding.linear_1.weight"].shape == (8, 4)
