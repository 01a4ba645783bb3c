"""Fused joint-attention Pallas kernel vs the XLA einsum path.

Runs the kernel in interpreter mode on CPU (the standard way to test
Mosaic kernels off-TPU); on-device equivalence is covered by the same
code path compiling on the real chip (bench.py).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.config import tiny_dit_config
from echo_tts_tpu.models import dit
from echo_tts_tpu.ops.pallas.joint_attention import (fits_vmem,
                                                     fits_vmem_flash,
                                                     fused_joint_attention)

CFG_X = dataclasses.replace(tiny_dit_config(), attention_impl="xla")
CFG_P = dataclasses.replace(tiny_dit_config(), attention_impl="pallas")


@pytest.fixture(scope="module")
def params():
    return dit.init_dit_params(jax.random.key(0), CFG_X, dtype=jnp.float32)


def _inputs(b=2, g=3, s=16, tt=24, ts=16):
    ks = jax.random.split(jax.random.key(1), 4)
    rng = np.random.default_rng(0)
    x = jax.random.normal(ks[0], (g * b, s, 80))
    t = jax.random.uniform(ks[1], (g * b,))
    tm = jnp.asarray(rng.random((g * b, tt)) > 0.3)
    sm = jnp.asarray(rng.random((g * b, ts)) > 0.3)
    ids = jax.random.randint(ks[2], (b, tt), 0, 256)
    spk = jax.random.normal(ks[3], (b, ts, 80))
    return x, t, tm, sm, ids, spk


def test_kernel_matches_dense_reference():
    """Raw kernel vs a dense softmax over concatenated KV, including the
    G-broadcast (q batch GB over kv batch B) and non-128-multiple T."""
    rng = np.random.default_rng(2)
    gb, b, s, t, h, dh = 6, 2, 16, 72, 2, 128

    def arr(*sh):
        return jnp.asarray(rng.standard_normal(sh).astype(np.float32))

    q, ks_, vs = arr(gb, s, h, dh), arr(gb, s, h, dh), arr(gb, s, h, dh)
    kt, vt = arr(b, t, h, dh), arr(b, t, h, dh)
    mask = jnp.asarray(rng.random((gb, t)) > 0.3).at[:, 0].set(True)
    scale = dh ** -0.5

    out = fused_joint_attention(q, ks_, vs, kt, vt, mask, sm_scale=scale,
                                interpret=True)

    ktb = jnp.tile(kt, (gb // b, 1, 1, 1))
    vtb = jnp.tile(vt, (gb // b, 1, 1, 1))
    k_all = jnp.concatenate([ks_, ktb], axis=1)
    v_all = jnp.concatenate([vs, vtb], axis=1)
    m_all = jnp.concatenate([jnp.ones((gb, s), bool), mask], axis=1)
    logits = jnp.einsum("bshd,bthd->bhst", q, k_all,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(m_all[:, None, None, :], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhst,bthd->bshd", w.astype(v_all.dtype), v_all)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dit_forward_pallas_matches_xla(params):
    x, t, tm, sm, ids, spk = _inputs()
    kvt = dit.get_kv_cache_text(params, CFG_X, ids, tm[:2])
    kvs = dit.get_kv_cache_speaker(params, CFG_X, spk)
    out_x = dit.dit_forward(params, CFG_X, x, t, tm, sm, kvt, kvs)
    out_p = dit.dit_forward(params, CFG_P, x, t, tm, sm, kvt, kvs)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               atol=2e-5, rtol=1e-4)


def test_dit_forward_pallas_with_latent_and_speaker_scale(params):
    x, t, tm, sm, ids, spk = _inputs()
    pre = jax.random.normal(jax.random.key(9), (2, 8, 80))
    kvt = dit.get_kv_cache_text(params, CFG_X, ids, tm[:2])
    kvs = dit.get_kv_cache_speaker(params, CFG_X, spk)
    kvl = dit.get_kv_cache_latent(params, CFG_X, pre)
    lm = jnp.asarray(dit.latent_prefix_mask(6, 2, 5, 4))
    sc = jnp.full((CFG_X.num_layers,), 1.3, jnp.float32)
    kw = dict(kv_latent=kvl, latent_mask=lm, speaker_scale_by_layer=sc,
              start_pos=5)
    out_x = dit.dit_forward(params, CFG_X, x, t, tm, sm, kvt, kvs, **kw)
    out_p = dit.dit_forward(params, CFG_P, x, t, tm, sm, kvt, kvs, **kw)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               atol=2e-5, rtol=1e-4)


def test_dit_forward_static_pallas_matches_xla(params):
    """The hot serving path: dit_forward_static through the Pallas kernel,
    with a non-unity per-layer speaker scale and a non-lane-multiple T
    (text 24 + speaker 16/4 = 28 static columns)."""
    x, t, tm, sm, ids, spk = _inputs()
    kvt = dit.get_kv_cache_text(params, CFG_X, ids, tm[:2])
    kvs = dit.get_kv_cache_speaker(params, CFG_X, spk)
    kv_static, spk_cols = dit.concat_static_kv(CFG_X, kvt, kvs)
    static_mask = dit.static_attention_mask(CFG_X, tm, sm)
    sc = jnp.linspace(1.0, 1.8, CFG_X.num_layers).astype(jnp.float32)
    kw = dict(speaker_scale_by_layer=sc)
    out_x = dit.dit_forward_static(params, CFG_X, x, t, kv_static,
                                   spk_cols, static_mask, **kw)
    out_p = dit.dit_forward_static(params, CFG_P, x, t, kv_static,
                                   spk_cols, static_mask, **kw)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               atol=2e-5, rtol=1e-4)


def test_grad_through_pallas_attention(params):
    """Training must be able to differentiate the fused kernel: the custom
    VJP recomputes the backward through the XLA twin.  Regression for the
    single-chip training crash (pallas_call has no reverse-mode rule)."""
    x, t, tm, sm, ids, spk = _inputs()

    def loss(params, cfg):
        kvt = dit.get_kv_cache_text(params, cfg, ids, tm[:2])
        kvs = dit.get_kv_cache_speaker(params, cfg, spk)
        v = dit.dit_forward(params, cfg, x, t, tm, sm, kvt, kvs)
        return jnp.mean(v ** 2)

    lx, gx = jax.value_and_grad(loss)(params, CFG_X)
    lp, gp = jax.value_and_grad(loss)(params, CFG_P)
    np.testing.assert_allclose(float(lx), float(lp), rtol=1e-5)
    wq_x = np.asarray(gx["blocks"]["attn"]["wq"])
    wq_p = np.asarray(gp["blocks"]["attn"]["wq"])
    np.testing.assert_allclose(wq_x, wq_p, atol=3e-5, rtol=1e-3)


def _dense_reference(q, ks_, vs, kt, vt, mask, col_scale, scale):
    gb, b = q.shape[0], kt.shape[0]
    ktb = jnp.tile(kt, (gb // b, 1, 1, 1))
    vtb = jnp.tile(vt, (gb // b, 1, 1, 1))
    s = q.shape[1]
    logits_self = jnp.einsum("bshd,bthd->bhst", q, ks_,
                             preferred_element_type=jnp.float32) * scale
    logits_st = jnp.einsum("bshd,bthd->bhst", q, ktb,
                           preferred_element_type=jnp.float32) * scale
    logits_st = logits_st * col_scale
    logits_st = jnp.where(mask[:, None, None, :], logits_st, -jnp.inf)
    logits = jnp.concatenate([logits_self, logits_st], axis=-1)
    w = jax.nn.softmax(logits, axis=-1)
    w_self = w[..., :s].astype(vs.dtype)
    w_st = (w[..., s:] * col_scale).astype(vtb.dtype)
    return (jnp.einsum("bhst,bthd->bshd", w_self, vs)
            + jnp.einsum("bhst,bthd->bshd", w_st, vtb))


def test_flash_kernel_matches_dense_reference():
    """Blocked (online-softmax) variant with multiple self/static/query
    tiles, ragged extents, a non-unity column scale and masked columns."""
    rng = np.random.default_rng(5)
    gb, b, s, t, h, dh = 2, 1, 150, 300, 2, 128

    def arr(*sh):
        return jnp.asarray(rng.standard_normal(sh).astype(np.float32))

    q, ks_, vs = arr(gb, s, h, dh), arr(gb, s, h, dh), arr(gb, s, h, dh)
    kt, vt = arr(b, t, h, dh), arr(b, t, h, dh)
    mask = jnp.asarray(rng.random((gb, t)) > 0.3).at[:, 0].set(True)
    col_scale = jnp.asarray(
        1.0 + 0.5 * rng.random(t).astype(np.float32))
    scale = dh ** -0.5

    out = fused_joint_attention(
        q, ks_, vs, kt, vt, mask, col_scale, sm_scale=scale,
        interpret=True, flash=True, block_q=64, block_kv=64)
    ref = _dense_reference(q, ks_, vs, kt, vt, mask, col_scale, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_int8_static_kv_matches_dequantized_run():
    """Int8 static KV via kv_scales must equal running the kernel on the
    dequantized bf16/f32 KV (the scales fold into the column scales; the
    int8->f32 cast happens in VMEM) — for both kernel variants and the
    XLA fallback in models/dit.py (covered via the interpret path)."""
    from echo_tts_tpu.ops import quant

    rng = np.random.default_rng(11)
    gb, b, s, t, h, dh = 2, 1, 96, 260, 2, 128

    def arr(*sh):
        return jnp.asarray(rng.standard_normal(sh).astype(np.float32))

    q, ks_, vs = arr(gb, s, h, dh), arr(gb, s, h, dh), arr(gb, s, h, dh)
    kt, vt = arr(b, t, h, dh), arr(b, t, h, dh)
    mask = jnp.asarray(rng.random((gb, t)) > 0.3).at[:, 0].set(True)
    col_scale = jnp.asarray(
        1.0 + 0.5 * rng.random(t).astype(np.float32))
    scale = dh ** -0.5

    qkv = quant.quantize_kv_int8(kt, vt)           # (B, T, H) scales
    kd, vd = quant.dequantize_kv(qkv, dtype=jnp.float32)

    for flash in (False, True):
        got = fused_joint_attention(
            q, ks_, vs, qkv["k8"], qkv["v8"], mask, col_scale,
            sm_scale=scale, interpret=True, flash=flash,
            block_q=64, block_kv=64,
            kv_scales=(qkv["ks"], qkv["vs"]))
        want = fused_joint_attention(
            q, ks_, vs, kd, vd, mask, col_scale, sm_scale=scale,
            interpret=True, flash=flash, block_q=64, block_kv=64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4,
                                   err_msg=f"flash={flash}")
        # and close to the unquantized truth
        ref = _dense_reference(q, ks_, vs, kt, vt, mask, col_scale, scale)
        rel = (np.linalg.norm(np.asarray(got) - np.asarray(ref))
               / np.linalg.norm(np.asarray(ref)))
        assert rel < 2e-2, (flash, rel)


def test_flash_auto_selected_past_whole_row_budget():
    """`flash=None` must pick the blocked kernel exactly where the
    whole-row kernel stops fitting VMEM, with identical results."""
    s, t, dh = 2048, 200, 128
    assert not fits_vmem(s, t, dh)
    assert fits_vmem_flash(s, t, dh)

    rng = np.random.default_rng(6)

    def arr(*sh):
        return jnp.asarray(rng.standard_normal(sh).astype(np.float32))

    gb, b, h = 2, 1, 1
    q, ks_, vs = arr(gb, s, h, dh), arr(gb, s, h, dh), arr(gb, s, h, dh)
    kt, vt = arr(b, t, h, dh), arr(b, t, h, dh)
    mask = jnp.ones((gb, t), bool)
    scale = dh ** -0.5
    out = fused_joint_attention(q, ks_, vs, kt, vt, mask, sm_scale=scale,
                                interpret=True)  # flash=None -> auto
    ref = _dense_reference(q, ks_, vs, kt, vt, mask,
                           jnp.ones((t,), jnp.float32), scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_grad_through_flash_kernel():
    """The custom VJP (XLA-recompute backward) covers the flash forward."""
    rng = np.random.default_rng(7)
    gb, b, s, t, h, dh = 2, 1, 40, 80, 1, 128

    def arr(*sh):
        return jnp.asarray(rng.standard_normal(sh).astype(np.float32))

    q, ks_, vs = arr(gb, s, h, dh), arr(gb, s, h, dh), arr(gb, s, h, dh)
    kt, vt = arr(b, t, h, dh), arr(b, t, h, dh)
    mask = jnp.ones((gb, t), bool)
    scale = dh ** -0.5

    def loss(q, flash):
        out = fused_joint_attention(q, ks_, vs, kt, vt, mask,
                                    sm_scale=scale, interpret=True,
                                    flash=flash, block_q=16, block_kv=64)
        return jnp.mean(out ** 2)

    lf, gf = jax.value_and_grad(loss)(q, True)
    lw, gw = jax.value_and_grad(loss)(q, False)
    np.testing.assert_allclose(float(lf), float(lw), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gw),
                               atol=3e-5, rtol=1e-3)


def test_fits_vmem_guard():
    assert fits_vmem(640, 768 + 1600, 128)        # published worst case
    assert not fits_vmem(4096, 100_000, 128)      # absurd shapes fall back
    assert fits_vmem_flash(4096, 2432, 128)       # flash covers big S
    # EVERY flash operand is tiled now (bias/scales included — their
    # column tiles are picked by the index maps), so arbitrarily long
    # static KV and batch fit; the budget depends on block sizes only
    assert fits_vmem_flash(4096, 100_000, 128)
    assert fits_vmem_flash(4096, 100_000, 128, q_batch=512)
    # absurd tile sizes still fail the budget
    assert not fits_vmem_flash(4096, 100_000, 128,
                               block_q=4096, block_kv=8192)


def test_auto_dispatch_refuses_shapes_fitting_neither(monkeypatch):
    """flash=None auto-pick must raise (not silently compile an
    over-VMEM kernel) when both budget checks fail — e.g. a forced
    attention_impl='pallas' at very large batch x very long static KV."""
    import echo_tts_tpu.ops.pallas.joint_attention as ja
    monkeypatch.setattr(ja, "fits_vmem", lambda *a, **k: False)
    monkeypatch.setattr(ja, "fits_vmem_flash", lambda *a, **k: False)
    q = jnp.zeros((3, 8, 2, 16), jnp.float32)
    kt = jnp.zeros((1, 8, 2, 16), jnp.float32)
    mask = jnp.ones((3, 8), bool)
    with pytest.raises(ValueError, match="fits neither"):
        ja.fused_joint_attention(q, q, q, kt, kt, mask,
                                 sm_scale=0.25, interpret=True)
