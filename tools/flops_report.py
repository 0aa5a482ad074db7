"""Measure denoise-step FLOPs via XLA cost analysis (TPU backend)."""
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from ctrlv_tpu.models import (UNetSpatioTemporalConditionModel, UNetSTConfig,
                              ControlNetSpatioTemporal, AutoencoderKLTemporalDecoder, VAEConfig)

dtype = jnp.bfloat16
ucfg = UNetSTConfig()
unet = UNetSpatioTemporalConditionModel(config=ucfg, dtype=dtype)
ctrl = ControlNetSpatioTemporal(config=ucfg, dtype=dtype)
F = ucfg.num_frames
h, w = 320 // 8, 512 // 8
sample = jnp.zeros((2, F, h, w, ucfg.in_channels), dtype)
cond = jnp.zeros((2, F, h, w, ucfg.in_channels // 2), dtype)
enc = jnp.zeros((2, 1, ucfg.cross_attention_dim), dtype)
tids = jnp.asarray([[6.0, 127.0, 0.02]] * 2, dtype)
t = jnp.asarray(1.0, jnp.float32)

uparams = jax.eval_shape(lambda: unet.init(jax.random.PRNGKey(0), sample, t, enc, tids))
cparams = jax.eval_shape(lambda: ctrl.init(jax.random.PRNGKey(0), sample, t, enc, tids, cond))

def unet_fwd(p, s):
    return unet.apply(p, s, t, enc, tids)
def ctrl_fwd(p, s):
    return ctrl.apply(p, s, t, enc, tids, cond)

for name, fn, pshape in [("unet", unet_fwd, uparams), ("controlnet", ctrl_fwd, cparams)]:
    lowered = jax.jit(fn).lower(pshape, jax.ShapeDtypeStruct(sample.shape, sample.dtype))
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    print(name, "flops=%.3f TFLOP" % (ca.get("flops", float("nan")) / 1e12))

# VAE decode (8-frame chunk) + encode (25 frames)
vcfg = VAEConfig()
vae = AutoencoderKLTemporalDecoder(config=vcfg, dtype=dtype)
vparams = jax.eval_shape(lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 320, 512, 3), dtype)))
lat8 = jnp.zeros((8, h, w, 4), dtype)
dec = jax.jit(lambda p, z: vae.apply(p, z, num_frames=8, method=vae.decode)).lower(vparams, jax.ShapeDtypeStruct(lat8.shape, lat8.dtype))
ca = dec.compile().cost_analysis()
if isinstance(ca, list): ca = ca[0]
print("vae_decode8 flops=%.3f TFLOP" % (ca.get("flops", float("nan")) / 1e12))
