"""Frame-sharded sampling: pipeline on a (data=4, frame=2) mesh must match
the unsharded result bit-for-... well, within fp tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.parallel import make_mesh
from ctrlv_tpu.pipelines import VideoDiffusionPipeline
from helpers import build_tiny_models

pytestmark = pytest.mark.mesh

F, H, W = 4, 32, 32


@pytest.fixture(scope="module")
def models():
    return build_tiny_models(num_frames=F, image_hw=(H, W))


def test_frame_sharded_sampling_matches_single_device(models):
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3), minval=-1, maxval=1)
    bbox = jax.random.uniform(jax.random.PRNGKey(2), (1, F, H, W, 3), minval=-1, maxval=1)
    kwargs = dict(
        rng=jax.random.PRNGKey(3), num_frames=F, num_inference_steps=2,
        decode_chunk_size=F,
    )

    plain = VideoDiffusionPipeline(
        models["unet"], models["unet_params"], models["vae"], models["vae_params"],
        models["clip"], models["clip_params"],
    )
    ref = np.asarray(plain(image, bbox_images=bbox, **kwargs))

    mesh = make_mesh(n_data=4, n_frame=2)
    sharded = VideoDiffusionPipeline(
        models["unet"], models["unet_params"], models["vae"], models["vae_params"],
        models["clip"], models["clip_params"], mesh=mesh,
    )
    out = np.asarray(sharded(image, bbox_images=bbox, **kwargs))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.heavy
def test_pallas_attention_under_spmd_partitioner():
    """The layout-native MHA kernel with a SHARDED batch operand: the real
    sampler runs spatial attention on (CFG*B*F, S, C) tensors whose
    leading axis is frame-sharded, so the pallas custom call must survive
    the SPMD partitioner. d=64/S=1024 so the kernel actually routes
    (tiny-UNet configs use d=32 and fall back to XLA, which is why the
    other mesh tests never exercise this path)."""
    from ctrlv_tpu.models.layers import Attention
    from ctrlv_tpu.ops.mha import mha_supported
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert mha_supported(1024, 1024, 64, 1, 4)
    attn = Attention(query_dim=64, heads=1, dim_head=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 1024, 64))
    params = attn.init(jax.random.PRNGKey(1), x)
    ref = np.asarray(jax.jit(attn.apply)(params, x))

    mesh = make_mesh(n_data=4, n_frame=2)
    repl = NamedSharding(mesh, P())
    x_sh = jax.device_put(x, NamedSharding(mesh, P("frame")))
    with jax.set_mesh(mesh):
        out = jax.jit(attn.apply)(jax.device_put(params, repl), x_sh)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)
