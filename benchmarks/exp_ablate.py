#!/usr/bin/env python
"""Ablation profile of the fused serving forward (one jit call per variant).

Per-dispatch overhead on the axon tunnel is ~1-3 ms, so separate-call
microbenchmarks mis-attribute cost; this measures variants of the SAME
jitted step and reads differences, which cancels the overhead.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from benchmarks.microbench import forced_timeit

from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
from multi_degradation_image_enhancement_tpu.models import cdan_fast
from multi_degradation_image_enhancement_tpu.ops.degradations import apply_degradation

B, S = 128, 256
dtype = jnp.bfloat16
model = CDAN(dtype=dtype)
variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, S, S, 3), jnp.float32), train=False)
clean = jnp.abs(jnp.sin(jnp.arange(B*S*S*3, dtype=jnp.float32)*0.001)).reshape(B,S,S,3)*255.0
x01 = clean / 255.0
key = jax.random.key(0)

def timeit(fn, *args, iters=20):
    jfn = jax.jit(fn)
    return forced_timeit(lambda i: jfn(*args), iters) * 1e3

full = cdan_fast.build_fast_apply(variables, dtype)

# Variant builders: monkeypatch pieces of apply_fn by re-deriving it with knobs.
# Rebuild manually mirroring cdan_fast.apply_fn with switches.
import types
from flax import linen as nn
from multi_degradation_image_enhancement_tpu.models.cdan import _bilinear_x2

def build_variant(skip_db=False, skip_cbam=False, skip_convs=False, skip_up=False):
    base = cdan_fast.build_fast_apply(variables, dtype)
    # reach into the closure? simpler: copy the code with knobs
    params = variables["params"]; stats = variables["batch_stats"]
    enc_p, enc_s = params["encoder"], stats["encoder"]
    dec_p, dec_s = params["decoder"], stats["decoder"]
    folded = {}
    for name in ("conv1","conv2","conv3","conv4"):
        folded[name] = cdan_fast._fold_conv_bn(enc_p[name]["Conv_0"], enc_p[name]["BatchNorm_0"], enc_s[name]["BatchNorm_0"])
    for name in ("de1","de2","de3","de4"):
        folded[name] = cdan_fast._fold_conv_bn(dec_p[f"{name}_conv"], dec_p[f"{name}_bn"], dec_s[f"{name}_bn"])
    from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import _run_cm, pack_params_cm
    db_cfg = {"dense1":64,"dense2":128,"dense3":256,"final_dense":3}
    db_packed = {n: pack_params_cm((enc_p if n.startswith("dense") else dec_p)[n], (enc_s if n.startswith("dense") else dec_s)[n], c) for n,c in db_cfg.items()}
    from multi_degradation_image_enhancement_tpu.models.cbam import CBAM
    cbam_mods = {"bottleneck": CBAM(512, dtype=dtype), "cbam1": CBAM(256, dtype=dtype), "cbam2": CBAM(128, dtype=dtype), "cbam3": CBAM(64, dtype=dtype)}
    cbam_vars = {"bottleneck": {"params": params["bottleneck"], "batch_stats": stats["bottleneck"]},
                 "cbam1": {"params": dec_p["cbam1"], "batch_stats": dec_s["cbam1"]},
                 "cbam2": {"params": dec_p["cbam2"], "batch_stats": dec_s["cbam2"]},
                 "cbam3": {"params": dec_p["cbam3"], "batch_stats": dec_s["cbam3"]}}
    def conv_relu(x, name):
        if skip_convs:
            k, b = folded[name]
            co = k.shape[-1]
            if x.shape[-1] == co: return nn.relu(x)
            return nn.relu(jnp.broadcast_to(x[..., :1], x.shape[:-1]+(co,)))
        k,b = folded[name]
        return nn.relu(cdan_fast._conv2d(x,k,b,dtype))
    def dense_block(x, name, c_in):
        if skip_db: return x
        out_cm = _run_cm(x, db_packed[name], c_in=c_in, interpret=False)
        bsz,_,hw = out_cm.shape; h,w = x.shape[1], x.shape[2]
        return out_cm[:, :c_in, :].transpose(0,2,1).reshape(bsz,h,w,c_in)
    def cbam(x, name):
        if skip_cbam: return x
        return cbam_mods[name].apply(cbam_vars[name], x, train=False)
    up = (lambda x: x) if False else _bilinear_x2
    def apply_fn(x):
        x = x.astype(dtype)
        out = conv_relu(x,"conv1"); out = nn.max_pool(out,(2,2),strides=(2,2))
        d1 = dense_block(out,"dense1",64); skip0 = out
        out = conv_relu(out,"conv2"); out = nn.max_pool(out,(2,2),strides=(2,2))
        d2 = dense_block(out,"dense2",128); skip1 = out
        out = conv_relu(out,"conv3"); out = nn.max_pool(out,(2,2),strides=(2,2))
        d3 = dense_block(out,"dense3",256); skip2 = out
        out = conv_relu(out,"conv4"); out = cbam(out,"bottleneck")
        out = conv_relu(out,"de1"); out = out + skip2; out = cbam(out,"cbam1")
        out = out * d3; out = conv_relu(out,"de2"); out = _bilinear_x2(out); out = out + skip1; out = cbam(out,"cbam2")
        out = out * d2; out = conv_relu(out,"de3"); out = _bilinear_x2(out); out = out + skip0; out = cbam(out,"cbam3")
        out = out * d1; out = conv_relu(out,"de4"); out = _bilinear_x2(out); out = out + x
        out = dense_block(out,"final_dense",3)
        return jax.nn.sigmoid(out).astype(jnp.float32)
    return apply_fn

res = {}
res["degrade_only"] = timeit(lambda c,k: apply_degradation("noise", c, k)/255.0, clean, key)
res["full_fwd"] = timeit(lambda z: full(z), x01)
res["fwd_no_db"] = timeit(build_variant(skip_db=True), x01)
res["fwd_no_cbam"] = timeit(build_variant(skip_cbam=True), x01)
res["fwd_no_db_no_cbam"] = timeit(build_variant(skip_db=True, skip_cbam=True), x01)
for k,v in res.items(): print(f"{k}: {v:.2f} ms", flush=True)
print("db_cost:", round(res["full_fwd"]-res["fwd_no_db"],2), "cbam_cost:", round(res["full_fwd"]-res["fwd_no_cbam"],2))
