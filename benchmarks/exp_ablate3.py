#!/usr/bin/env python
"""Ablation of the NON-DenseBlock parts of the fused serving forward.

Each variant swaps one component class for a shape-preserving cheap stand-in
(timing only, numerics don't matter); the delta vs the full forward is that
component's honest in-context cost.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from benchmarks.microbench import forced_timeit
from multi_degradation_image_enhancement_tpu.models.cdan import CDAN, _bilinear_x2
from multi_degradation_image_enhancement_tpu.models import cdan_fast
from flax import linen as nn
from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import _run_cm, pack_params_cm

B, S = 128, 256
dtype = jnp.bfloat16
model = CDAN(dtype=dtype)
variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, S, S, 3), jnp.float32), train=False)
x01 = (jnp.abs(jnp.sin(jnp.arange(B*S*S*3, dtype=jnp.float32)*0.001)).reshape(B,S,S,3))
params = variables["params"]; stats = variables["batch_stats"]
enc_p, enc_s = params["encoder"], stats["encoder"]
dec_p, dec_s = params["decoder"], stats["decoder"]

def timeit(fn, *args, iters=20):
    jfn = jax.jit(fn)
    return forced_timeit(lambda i: jfn(*args), iters) * 1e3

def build(up="bilinear", pool="max", conv="full", sig=True):
    folded = {}
    for name in ("conv1","conv2","conv3","conv4"):
        folded[name] = cdan_fast._fold_conv_bn(enc_p[name]["Conv_0"], enc_p[name]["BatchNorm_0"], enc_s[name]["BatchNorm_0"])
    for name in ("de1","de2","de3","de4"):
        folded[name] = cdan_fast._fold_conv_bn(dec_p[f"{name}_conv"], dec_p[f"{name}_bn"], dec_s[f"{name}_bn"])
    db_cfg = {"dense1":64,"dense2":128,"dense3":256,"final_dense":3}
    db_packed = {n: pack_params_cm((enc_p if n.startswith("dense") else dec_p)[n], (enc_s if n.startswith("dense") else dec_s)[n], c) for n,c in db_cfg.items()}
    from multi_degradation_image_enhancement_tpu.models.cbam import CBAM
    cbam_mods = {"bottleneck": CBAM(512, dtype=dtype), "cbam1": CBAM(256, dtype=dtype), "cbam2": CBAM(128, dtype=dtype), "cbam3": CBAM(64, dtype=dtype)}
    cbam_vars = {"bottleneck": {"params": params["bottleneck"], "batch_stats": stats["bottleneck"]},
                 "cbam1": {"params": dec_p["cbam1"], "batch_stats": dec_s["cbam1"]},
                 "cbam2": {"params": dec_p["cbam2"], "batch_stats": dec_s["cbam2"]},
                 "cbam3": {"params": dec_p["cbam3"], "batch_stats": dec_s["cbam3"]}}
    def conv_relu(x, name):
        k,b = folded[name]
        if conv == "1x1":
            k = k[1:2, 1:2]  # center tap only: same shapes, 1/9 the FLOPs
        return nn.relu(cdan_fast._conv2d(x,k,b,dtype))
    def dense_block(x, name, c_in):
        out_cm = _run_cm(x, db_packed[name], c_in=c_in, interpret=False)
        bsz,_,hw = out_cm.shape; h,w = x.shape[1], x.shape[2]
        return out_cm[:, :c_in, :].transpose(0,2,1).reshape(bsz,h,w,c_in)
    def cbam(x, name):
        return cbam_mods[name].apply(cbam_vars[name], x, train=False)
    def upsample(x):
        if up == "nearest":
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _bilinear_x2(x)
    def pool_fn(x):
        if pool == "stride":
            return x[:, ::2, ::2, :]
        return nn.max_pool(x,(2,2),strides=(2,2))
    def apply_fn(x):
        x = x.astype(dtype)
        out = conv_relu(x,"conv1"); out = pool_fn(out)
        d1 = dense_block(out,"dense1",64); skip0 = out
        out = conv_relu(out,"conv2"); out = pool_fn(out)
        d2 = dense_block(out,"dense2",128); skip1 = out
        out = conv_relu(out,"conv3"); out = pool_fn(out)
        d3 = dense_block(out,"dense3",256); skip2 = out
        out = conv_relu(out,"conv4"); out = cbam(out,"bottleneck")
        out = conv_relu(out,"de1"); out = out + skip2; out = cbam(out,"cbam1")
        out = out * d3; out = conv_relu(out,"de2"); out = upsample(out); out = out + skip1; out = cbam(out,"cbam2")
        out = out * d2; out = conv_relu(out,"de3"); out = upsample(out); out = out + skip0; out = cbam(out,"cbam3")
        out = out * d1; out = conv_relu(out,"de4"); out = upsample(out); out = out + x
        out = dense_block(out,"final_dense",3)
        if sig:
            return jax.nn.sigmoid(out).astype(jnp.float32)
        return out.astype(jnp.float32)
    return apply_fn

full = timeit(build(), x01)
print(f"full: {full:.2f} ms", flush=True)
for label, kw in [
    ("nearest_up", dict(up="nearest")),
    ("stride_pool", dict(pool="stride")),
    ("convs_1x1", dict(conv="1x1")),
    ("no_sigmoid", dict(sig=False)),
]:
    t = timeit(build(**kw), x01)
    print(f"{label}: {t:.2f} ms   (delta {full-t:+.2f})", flush=True)
