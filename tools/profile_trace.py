"""Capture an XProf trace of the flagship train step and dump HLO op stats."""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root
import glob
import json
import sys

from pytorch_end2end_speech_recognition_tpu.utils.platform import (
    enable_compilation_cache,
)
enable_compilation_cache()
from pytorch_end2end_speech_recognition_tpu.utils.platform import configure_prng
configure_prng("rbg")
import jax, jax.numpy as jnp, numpy as np
from flax import nnx
from __graft_entry__ import _flagship_cfg
from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel
from pytorch_end2end_speech_recognition_tpu.training.losses import hybrid_loss
from pytorch_end2end_speech_recognition_tpu.training.schedules import make_optimizer

cfg = _flagship_cfg()
rng = np.random.default_rng(0)
B, sec = 32, 30.0
Ts = int(sec * cfg.frontend.sample_rate)
audio = jnp.asarray(rng.standard_normal((B, Ts)).astype(np.float32) * 0.1)
audio_lens = jnp.full((B,), Ts, jnp.int32)
U = 64
tokens = jnp.asarray(rng.integers(3, cfg.model.vocab_size, (B, U)).astype(np.int32))
token_lens = jnp.full((B,), U, jnp.int32)
key = jax.random.PRNGKey(0)

model = AsrModel(cfg, nnx.Rngs(0))
graphdef, params, rest = nnx.split(model, nnx.Param, ...)
tx = make_optimizer(cfg.train)
opt_state = tx.init(params)


@jax.jit
def train_step(p, o, k):
    def loss(p):
        m = nnx.merge(graphdef, p, rest)
        enc, enc_lens = m.encode(audio, audio_lens, train=True, rng=k)
        logits = m.ctc_logits(enc)
        att = m.decoder(enc, enc_lens, tokens, token_lens, train=True, rng=k)
        l, _ = hybrid_loss(logits, enc_lens, att, tokens, token_lens,
                           cfg.model.ctc_weight, ctc_impl=cfg.model.ctc_impl)
        return l
    g = jax.grad(loss)(p)
    updates, o2 = tx.update(g, o, p)
    p2 = jax.tree_util.tree_map(lambda a, b: a + b, p, updates)
    return p2, o2

p2, o2 = train_step(params, opt_state, key)
jax.block_until_ready(p2)
c = train_step.lower(params, opt_state, key).compile()
ca = c.cost_analysis()
print("XLA cost analysis: flops=%.3e bytes=%.3e" % (
    ca.get("flops", 0), ca.get("bytes accessed", 0)), flush=True)

import shutil
logdir = "/tmp/jax-trace-train"
shutil.rmtree(logdir, ignore_errors=True)
with jax.profiler.trace(logdir):
    for _ in range(3):
        p2, o2 = train_step(params, opt_state, key)
    jax.block_until_ready(p2)

paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
print("xplane:", paths, flush=True)

from xprof.convert import raw_to_tool_data

data, extra = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats^", {})
print("extra:", extra, flush=True)
if isinstance(data, bytes):
    data = data.decode("utf-8", "replace")
if data is None:
    print("hlo_stats returned None; trying framework_op_stats")
    data, extra = raw_to_tool_data.xspace_to_tool_data(paths, "framework_op_stats^", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
with open("/tmp/hlo_stats.json", "w") as f:
    f.write(data)
print("wrote /tmp/hlo_stats.json len", len(data))
