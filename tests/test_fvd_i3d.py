"""I3D torch->flax converter coverage + converted-weights FVD path
(VERDICT r1 item 6: the moment real Kinetics I3D weights are obtainable,
`i3d_torch_to_flax` either loads them or fails loudly here first)."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))

from svd_manifests import i3d_manifest  # noqa: E402

from ctrlv_tpu.metrics.fvd import FVD, InceptionI3d, i3d_torch_to_flax  # noqa: E402


@pytest.fixture(scope="module")
def template():
    model = InceptionI3d()
    x = np.zeros((1, 8, 64, 64, 3), np.float32)
    shapes = jax.eval_shape(lambda k: model.init(k, x), jax.random.PRNGKey(0))
    return jax.tree.map(
        lambda s: np.broadcast_to(np.zeros((), np.float32), s.shape), shapes
    )


def _synthetic_state_dict(seed=0):
    rng = np.random.default_rng(seed)
    return {
        k: rng.standard_normal(s).astype(np.float32) * 0.05
        if not k.endswith("running_var")
        else np.abs(rng.standard_normal(s).astype(np.float32)) + 1.0
        for k, s in i3d_manifest().items()
    }


def test_i3d_manifest_covers_flax_tree(template):
    converted = i3d_torch_to_flax(_synthetic_state_dict(), expected=template)
    assert set(converted) == {"params", "batch_stats"}


def test_i3d_converter_rejects_missing_key(template):
    sd = _synthetic_state_dict()
    sd.pop("Mixed_4d.b2b.conv3d.weight")
    with pytest.raises(ValueError, match="mismatch"):
        i3d_torch_to_flax(sd, expected=template)


def test_fvd_with_converted_weights(template):
    params = i3d_torch_to_flax(_synthetic_state_dict(), expected=template)
    fvd = FVD(params=params, target_size=64)
    rng = np.random.default_rng(0)
    real = rng.uniform(size=(2, 8, 72, 96, 3)).astype(np.float32)
    fake = rng.uniform(size=(2, 8, 72, 96, 3)).astype(np.float32)
    fvd.update(real, fake)
    d = fvd.compute()
    assert np.isfinite(d)

    # identical sets => (near-)zero distance
    fvd2 = FVD(params=params, target_size=64)
    fvd2.update(real, real)
    assert abs(fvd2.compute()) < 1e-3
