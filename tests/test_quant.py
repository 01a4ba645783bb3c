"""Int8 (W8A8) quantized DiT path — ops/quant.py (opt-in serving mode).

The quantized mode is NON-PARITY by design (like the few-step recipe):
these tests pin (a) the quantization math itself, (b) that the parameter-
tree transform touches exactly the hot-loop leaves, and (c) an error
envelope of the quantized forward/sampler vs the bf16 path at tiny config,
so a regression that silently breaks the int8 path (instead of degrading
it gracefully) is caught on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.config import tiny_dit_config
from echo_tts_tpu.models import dit as jdit
from echo_tts_tpu.ops import quant
from echo_tts_tpu.sampler.euler import sample_euler_cfg_independent_guidances

CFG = tiny_dit_config()


@pytest.fixture(scope="module")
def params():
    return jdit.init_dit_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def test_quantize_roundtrip_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 48)) / np.sqrt(32)
    q = quant.quantize_weight_int8(w)
    assert q["q8"].dtype == jnp.int8 and q["q8"].shape == w.shape
    assert q["s"].shape == (3, 48)
    back = quant.dequantize_weight(q)
    # per-element error is at most half a quantization step (scale/2)
    step = np.asarray(q["s"])[:, None, :]
    assert np.all(np.abs(np.asarray(back - w)) <= 0.5 * step + 1e-7)


def test_int8_dot_matches_f32_within_envelope():
    k, n, m = 256, 96, 64
    w = jax.random.normal(jax.random.PRNGKey(2), (k, n)) / np.sqrt(k)
    x = jax.random.normal(jax.random.PRNGKey(3), (m, k))
    q = quant.quantize_weight_int8(w)
    ref = np.asarray(x @ w)
    got = np.asarray(quant.int8_dot(x, q["q8"], q["s"],
                                    out_dtype=jnp.float32))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1.5e-2, rel


def test_pallas_w8a8_kernel_matches_xla_path():
    """The experimental fused kernel (ops/pallas/int8_matmul.py — a kept,
    measured negative result; see its docstring) must stay bit-faithful
    to the production XLA path on the int32 accumulator."""
    from echo_tts_tpu.ops.pallas.int8_matmul import (int8_matmul_fused,
                                                     supported)

    k, n, m = 256, 256, 128
    w = jax.random.normal(jax.random.PRNGKey(20), (k, n)) / np.sqrt(k)
    x = jax.random.normal(jax.random.PRNGKey(21), (2, m // 2, k))
    q = quant.quantize_weight_int8(w)
    assert supported(m, k, n)
    assert not supported(m + 1, k, n)
    ref = quant.int8_dot(x, q["q8"], q["s"], out_dtype=jnp.float32)
    got = int8_matmul_fused(x, q["q8"], q["s"], interpret=True,
                            out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=0)


def test_qdot_plain_weight_is_exact_matmul():
    w = jax.random.normal(jax.random.PRNGKey(4), (16, 8))
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 16))
    np.testing.assert_array_equal(np.asarray(quant.qdot(x, w)),
                                  np.asarray(x @ w))


def test_quantize_dit_params_touches_only_hot_leaves(params):
    qp = quant.quantize_dit_params(params)
    assert quant.dit_params_are_quantized(qp)
    assert not quant.dit_params_are_quantized(params)

    for group, key in quant.DIT_BLOCK_QUANT_KEYS:
        leaf = qp["blocks"][group][key]
        assert quant.is_quantized(leaf)
        assert leaf["q8"].shape == params["blocks"][group][key].shape
    # everything else is shared by reference, not copied
    assert qp["text_encoder"] is params["text_encoder"]
    assert qp["blocks"]["attn"]["wk_text"] is params["blocks"]["attn"]["wk_text"]
    assert qp["blocks"]["attn"]["q_norm"] is params["blocks"]["attn"]["q_norm"]
    assert qp["blocks"]["attn_adaln"] is params["blocks"]["attn_adaln"]
    assert qp["out_proj"] is params["out_proj"]

    # idempotent: re-quantizing returns identical quantized leaves
    qp2 = quant.quantize_dit_params(qp)
    assert qp2["blocks"]["mlp"]["w2"] is qp["blocks"]["mlp"]["w2"]


def test_int4_dot_and_dispatch():
    """W4A8 experiment (quantize_weight_int4 / int4_dot): bounded error
    vs f32, and qdot dispatches on the q4 leaf."""
    k, n, m = 256, 96, 64
    w = jax.random.normal(jax.random.PRNGKey(40), (k, n)) / np.sqrt(k)
    x = jax.random.normal(jax.random.PRNGKey(41), (m, k))
    q = quant.quantize_weight_int4(w)
    # nibble-packed storage (jnp.int4 is not lowerable on every stack)
    assert q["q4"].dtype == jnp.int8 and q["q4"].shape == (k // 2, n)
    # unpack is bit-exact against direct 4-bit quantization
    wf = np.asarray(w, np.float32)
    s = np.maximum(np.max(np.abs(wf), axis=0), 1e-12) / 7.0
    direct = np.clip(np.round(wf / s[None, :]), -7, 7).astype(np.int8)
    np.testing.assert_array_equal(
        np.asarray(quant.unpack_weight_int4(q["q4"])), direct)
    ref = np.asarray(x @ w)
    got = np.asarray(quant.int4_dot(x, q["q4"], q["s"],
                                    out_dtype=jnp.float32))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.15, rel        # 4-bit: ~16x coarser than int8
    np.testing.assert_array_equal(
        np.asarray(quant.qdot(x, q)),
        np.asarray(quant.int4_dot(x, q["q4"], q["s"])))
    qp = quant.quantize_dit_params_int4(
        {"blocks": {"attn": {k2: w for k2 in
                             ("wq", "wk", "wv", "gate", "wo")},
                    "mlp": {k2: w for k2 in ("w1", "w2", "w3")}}})
    assert qp["blocks"]["mlp"]["w2"]["q4"].dtype == jnp.int8


def test_quantize_kv_roundtrip_error_bounded():
    k = jax.random.normal(jax.random.PRNGKey(30), (2, 1, 24, 4, 16))
    v = jax.random.normal(jax.random.PRNGKey(31), (2, 1, 24, 4, 16))
    q = quant.quantize_kv_int8(k, v)
    assert q["k8"].dtype == jnp.int8 and q["k8"].shape == k.shape
    assert q["ks"].shape == k.shape[:-1]
    kd, vd = quant.dequantize_kv(q, dtype=jnp.float32)
    # per-element error at most half a quantization step
    ks = np.asarray(q["ks"])[..., None]
    assert np.all(np.abs(np.asarray(kd - k)) <= 0.5 * ks + 1e-7)
    assert quant.kv_is_quantized(q)
    assert not quant.kv_is_quantized((k, v))


def test_sampler_kv_quant_within_envelope(params):
    """kv_quant=True (int8 static KV) must stay close to the exact
    sampler at tiny config f32 — the same envelope discipline as the
    W8A8 weight mode."""
    rng = np.random.default_rng(32)
    ids = jnp.asarray(rng.integers(0, CFG.text_vocab_size, size=(1, 12)))
    tmask = jnp.ones((1, 12), bool)
    spk = jnp.asarray(rng.standard_normal((1, 8, CFG.latent_size)),
                      jnp.float32)
    smask = jnp.ones((1, 8), bool)
    kw = dict(num_steps=4, cfg_scale_text=2.0, cfg_scale_speaker=3.0,
              cfg_min_t=0.4, cfg_max_t=1.0, sequence_length=16,
              dtype=jnp.float32, rng_key=jax.random.PRNGKey(9),
              speaker_kv_scale=1.5, speaker_kv_min_t=0.5)
    base = np.asarray(sample_euler_cfg_independent_guidances(
        params, CFG, spk, smask, ids, tmask, **kw))
    got = np.asarray(sample_euler_cfg_independent_guidances(
        params, CFG, spk, smask, ids, tmask, kv_quant=True, **kw))
    assert np.isfinite(got).all()
    rel = (np.linalg.norm(got - base)
           / max(np.linalg.norm(base), 1e-9))
    assert rel < 5e-2, rel


def test_partially_quantized_tree_fails_loudly(params):
    """A mixed bf16/int8 tree (interrupted transform, hand-built
    checkpoint) must raise, not report fully-quantized from a single
    probe leaf and serve silently mixed numerics."""
    qp = quant.quantize_dit_params(params)
    mixed = dict(qp)
    mixed["blocks"] = dict(qp["blocks"])
    mixed["blocks"]["mlp"] = dict(qp["blocks"]["mlp"])
    mixed["blocks"]["mlp"]["w1"] = params["blocks"]["mlp"]["w1"]  # de-quant one
    with pytest.raises(ValueError, match="partially quantized"):
        quant.dit_params_are_quantized(mixed)


def _forward(p, x, t, kvs, masks):
    kv_text, kv_speaker = kvs
    text_mask, speaker_mask = masks
    return jdit.dit_forward(p, CFG, x, t, text_mask, speaker_mask,
                            kv_text, kv_speaker)


def test_quantized_forward_within_envelope(params):
    rng = np.random.default_rng(6)
    b, s = 2, 16
    ids = jnp.asarray(rng.integers(0, CFG.text_vocab_size, size=(b, 11)))
    tmask = jnp.asarray(np.ones((b, 11), dtype=bool))
    spk = jnp.asarray(rng.standard_normal((b, 8, CFG.latent_size)),
                      jnp.float32)
    smask = jnp.asarray(np.ones((b, 8), dtype=bool))
    kv_text = jdit.get_kv_cache_text(params, CFG, ids, tmask)
    kv_spk = jdit.get_kv_cache_speaker(params, CFG, spk)
    x = jnp.asarray(rng.standard_normal((b, s, CFG.latent_size)), jnp.float32)
    t = jnp.full((b,), 0.7, jnp.float32)

    ref = np.asarray(_forward(params, x, t, (kv_text, kv_spk),
                              (tmask, smask)))
    qp = quant.quantize_dit_params(params)
    got = np.asarray(_forward(qp, x, t, (kv_text, kv_spk),
                              (tmask, smask)))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert np.all(np.isfinite(got))
    assert rel < 0.05, rel


def test_quantized_sampler_envelope_and_stability(params):
    rng = np.random.default_rng(7)
    b, seq = 1, 16
    ids = jnp.asarray(rng.integers(0, CFG.text_vocab_size, size=(b, 11)))
    tmask = jnp.asarray(np.ones((b, 11), dtype=bool))
    spk = jnp.asarray(rng.standard_normal((b, 8, CFG.latent_size)),
                      jnp.float32)
    smask = jnp.asarray(np.ones((b, 8), dtype=bool))
    noise = jnp.asarray(rng.standard_normal((b, seq, CFG.latent_size)),
                        jnp.float32)
    kw = dict(num_steps=6, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
              cfg_min_t=0.5, cfg_max_t=1.0, sequence_length=seq,
              dtype=jnp.float32, initial_noise=noise)

    ref = np.asarray(sample_euler_cfg_independent_guidances(
        params, CFG, spk, smask, ids, tmask, **kw))
    got = np.asarray(sample_euler_cfg_independent_guidances(
        quant.quantize_dit_params(params), CFG, spk, smask, ids, tmask, **kw))

    assert np.all(np.isfinite(got))
    # 6 guided steps amplify per-matmul int8 noise; pin a sane envelope
    # plus high agreement in direction (untrained tiny weights are the
    # worst case for relative error — real layers are smoother).
    denom = np.linalg.norm(ref) + 1e-9
    rel = np.linalg.norm(got - ref) / denom
    corr = float(np.corrcoef(got.ravel(), ref.ravel())[0, 1])
    assert rel < 0.5, rel
    assert corr > 0.95, corr


def test_synthesize_with_quantized_bundle(tiny_models, tmp_path):
    """Full serving pipeline (text -> sampler -> PCA -> codec -> WAV) with
    a W8A8 DiT bundle — pins that the quantized tree flows every hot path
    (prefill KV, euler core, decode) without shape or dtype breakage."""
    import dataclasses

    from echo_tts_tpu.serve import handler as h
    from echo_tts_tpu.serve.config import load_config

    voices = tmp_path / "voices"
    voices.mkdir()
    cfg = load_config({
        "AUDIO_VOICES_DIR": str(voices),
        "OUTPUT_AUDIO_DIR": str(tmp_path / "out"),
        "HF_TOKEN": "test",
    })
    qm = dataclasses.replace(
        tiny_models,
        dit_params=quant.quantize_dit_params(tiny_models.dit_params))
    out = h.synthesize(
        {"text": "Quantized mode.", "seed": 11,
         "parameters": {"num_steps": 2, "sequence_length": 8}},
        cfg=cfg, models=qm)
    assert out["status"] == "success", out
    md = out["metadata"]
    assert md["num_chunks"] == 1


def test_stream_synthesize_with_quantized_bundle(tiny_models):
    """Blockwise streaming (latent-prefix KV, per-block decode) over a
    W8A8 tree — the quantized leaves ride the scanned blockwise params
    too (wk_latent/wv_latent stay bf16 by design)."""
    import dataclasses

    from echo_tts_tpu.serve.streaming import stream_synthesize

    qm = dataclasses.replace(
        tiny_models,
        dit_params=quant.quantize_dit_params(tiny_models.dit_params))
    chunks = list(stream_synthesize(
        qm, "Quantized stream.", chunk_size=4, num_chunks=3, seed=5,
        sampler_params={"num_steps": 2}))
    assert len(chunks) == 3 and chunks[-1].is_last
    for c in chunks:
        assert np.isfinite(c.audio).all()


def test_run_batch_quantized_matches_quantized_serial(tiny_models):
    """The (G*B)-row batched sampler over a W8A8 tree must equal the
    quantized serial path — the batcher's batched==serial invariant has
    to hold per MODE, not just for bf16 (dynamic per-token activation
    quantization is row-local, so batching cannot change any row's
    quantization decisions)."""
    import dataclasses

    from echo_tts_tpu.serve.batcher import BatchRequest, run_batch

    qm = dataclasses.replace(
        tiny_models,
        dit_params=quant.quantize_dit_params(tiny_models.dit_params))
    reqs = [BatchRequest("First quantized.", seed=11, request_id="a"),
            BatchRequest("Second quantized.", seed=22, request_id="b")]
    fast = {"num_steps": 2, "sequence_length": 8}
    batched = run_batch(qm, reqs, fast)
    for req, got in zip(reqs, batched):
        alone = run_batch(qm, [req], fast)[0]
        np.testing.assert_allclose(got.audio, alone.audio, atol=2e-5,
                                   err_msg=req.request_id)


def test_load_models_env_flag(monkeypatch):
    """ECHO_DIT_QUANT=int8 quantizes at load; the cache key includes the
    mode so a later different-mode load raises instead of serving the
    wrong tree."""
    from echo_tts_tpu.serve import models as serve_models

    from echo_tts_tpu.config import tiny_dac_config
    monkeypatch.setattr(serve_models, "base_dit_config",
                        lambda blockwise=True: tiny_dit_config())
    monkeypatch.setattr(serve_models, "base_dac_config", tiny_dac_config)
    monkeypatch.setenv("ECHO_DIT_QUANT", "int8")
    serve_models.clear_models()
    try:
        m = serve_models.load_models(None, dtype=jnp.float32,
                                     allow_random=True)
        assert quant.dit_params_are_quantized(m.dit_params)
        monkeypatch.setenv("ECHO_DIT_QUANT", "none")
        with pytest.raises(RuntimeError, match="already loaded"):
            serve_models.load_models(None, dtype=jnp.float32,
                                     allow_random=True)
    finally:
        serve_models.clear_models()
