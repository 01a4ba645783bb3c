"""Incremental (stateful) S1-DAC decode for streaming synthesis.

The one-shot decode path (dac.decode_zq) is fully causal: a window-128
causal transformer (post_module), stride==kernel transpose-conv upsampling,
and causal conv stacks (reference: autoencoder.py:376-496, 932-998).  Its
receptive field is therefore bounded, and the reference even ships a KVCache
class for exactly this (autoencoder.py:660-680) — but never uses it,
re-decoding from scratch instead.  This module carries the decode state
across blocks so each streamed block costs O(block) instead of
O(context + block):

  * post_module: per-layer rolling K/V of the last (window-1) positions
    (keys cached post-RoPE at absolute positions) + an absolute-position
    counter for the RoPE table and window mask.
  * every causal conv: the last (k_eff - stride) RAW input frames, which
    replace the causal zero left-pad (conv.py `history`).  Zero-initialized
    state makes block 0 bit-equal to the one-shot left-pad.
  * transpose convs: the last (K/stride - 1) input frames (the quantizer
    upsample has K == stride, so its state is width-0).

Streamed audio equals the one-shot decode up to float reduction order
(~1e-6; pinned in tests/test_streaming.py).

API:
  state = init_decode_state(cfg, batch, dtype)
  audio_block, state = decode_zq_block(params, cfg, state, z_q_block)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...config import AETransformerConfig, DACConfig
from .conv import causal_conv1d, causal_conv_transpose1d, layer_norm, snake
from .dac import DILATIONS, zq_from_codes
from .quantize import rvq_encode
from .transformer import _apply_rope, _rms_norm_ae, _rope_table_bf16

# Default RoPE-table bound for streaming decode: ~6.3 min of latents at
# 21.5 Hz, past the reference's 300 s load_audio cap (inference.py:104-113).
MAX_POSITIONS = 8192
# The encoder-side transformer runs at the 512-sample hop (86 Hz), so the
# encode bound must be ~4x higher for the same audio length.
MAX_ENC_POSITIONS = 32768


# ---------------------------------------------------------------------------
# State initialization
# ---------------------------------------------------------------------------

def _conv_state(batch: int, k: int, stride: int, dilation: int, c_in: int,
                dtype) -> jnp.ndarray:
    width = (k - 1) * dilation + 1 - stride
    return jnp.zeros((batch, width, c_in), dtype)


def _convt_state(batch: int, k: int, stride: int, c_in: int,
                 dtype) -> jnp.ndarray:
    return jnp.zeros((batch, k // stride - 1, c_in), dtype)


def init_decode_state(cfg: DACConfig, batch: int = 1,
                      dtype=jnp.float32) -> dict:
    """Zero state == the one-shot causal pads."""
    d = cfg.latent_dim
    tcfg = cfg.quantizer_transformer_config()
    w = tcfg.window_size
    post = {
        "k": jnp.zeros((tcfg.n_layer, batch, w - 1, tcfg.n_head,
                        tcfg.head_dim), dtype),
        "v": jnp.zeros((tcfg.n_layer, batch, w - 1, tcfg.n_head,
                        tcfg.head_dim), dtype),
        "pos": jnp.zeros((), jnp.int32),
    }
    upsample = [{
        "convt": _convt_state(batch, factor, factor, d, dtype),
        "dwconv": _conv_state(batch, 7, 1, 1, d, dtype),
    } for factor in reversed(cfg.downsample_factor)]

    dec_blocks = []
    ch = cfg.decoder_dim
    for bi, stride in enumerate(cfg.decoder_rates):
        in_dim = ch // (2 ** bi)
        out_dim = ch // (2 ** (bi + 1))
        dec_blocks.append({
            "up": _convt_state(batch, 2 * stride, stride, in_dim, dtype),
            "res": [{"conv1": _conv_state(batch, 7, 1, dil, out_dim, dtype)}
                    for dil in DILATIONS],
        })
    final_dim = ch // (2 ** len(cfg.decoder_rates))
    decoder = {
        "conv_in": _conv_state(batch, 7, 1, 1, d, dtype),
        "blocks": dec_blocks,
        "conv_out": _conv_state(batch, 7, 1, 1, final_dim, dtype),
    }
    return {"post": post, "upsample": upsample, "decoder": decoder}


# ---------------------------------------------------------------------------
# Stateful building blocks (one-shot twins in conv.py / transformer.py)
# ---------------------------------------------------------------------------

def _roll(hist: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """New history = tail of [hist | x] (handles blocks shorter than the
    state width)."""
    width = hist.shape[1]
    if width == 0:
        return hist
    if x.shape[1] >= width:
        return x[:, x.shape[1] - width:].astype(hist.dtype)
    joined = jnp.concatenate([hist, x.astype(hist.dtype)], axis=1)
    return joined[:, joined.shape[1] - width:]


def _sconv(hist, x, p, **kw):
    out = causal_conv1d(x, p["kernel"], p["bias"], history=hist, **kw)
    return _roll(hist, x), out


def _sconvt(hist, x, p, *, stride):
    out = causal_conv_transpose1d(x, p["kernel"], p["bias"], stride=stride,
                                  history=hist)
    return _roll(hist, x), out


def _convnext_block_s(p: dict, st: dict, x: jnp.ndarray):
    """Streaming twin of conv.convnext_block (reference:
    autoencoder.py:333-373); only the k7 depthwise conv carries state."""
    inp = x
    dim = x.shape[-1]
    st_dw, x = _sconv(st["dwconv"], x, p["dwconv"], groups=dim)
    x = layer_norm(x, p["norm"]["weight"], p["norm"]["bias"], 1e-6)
    x = x @ p["pwconv1"]["kernel"] + p["pwconv1"]["bias"]
    x = jax.nn.gelu(x, approximate=False)
    x = x @ p["pwconv2"]["kernel"] + p["pwconv2"]["bias"]
    return {"dwconv": st_dw}, inp + p["gamma"] * x


def _residual_unit_s(p: dict, st: dict, x: jnp.ndarray, dilation: int,
                     approx_snake: bool = False):
    """Streaming twin of conv.residual_unit (reference:
    autoencoder.py:879-900); the k1 conv2 is stateless."""
    y = snake(x, p["snake1"], approx=approx_snake)
    st_c1, y = _sconv(st["conv1"], y, p["conv1"], dilation=dilation)
    y = snake(y, p["snake2"], approx=approx_snake)
    y = causal_conv1d(y, p["conv2"]["kernel"], p["conv2"]["bias"])
    return {"conv1": st_c1}, x + y


def transformer_decode_block(p: dict, cfg: AETransformerConfig, st: dict,
                             x: jnp.ndarray, max_positions: int):
    """Incremental WindowLimitedTransformer (one-shot twin:
    transformer.transformer_forward; reference: autoencoder.py:744-802 +
    the unused KVCache idea at 660-680).

    st: {'k','v': (L, B, W-1, H, Dh) post-RoPE rolling caches,
         'pos': () int32 absolute position of this block's first token}.
    """
    b, s, d = x.shape
    h, hd = cfg.n_head, cfg.head_dim
    w = cfg.window_size
    pos = st["pos"]
    table_full = jnp.asarray(_rope_table_bf16(max_positions, hd,
                                              cfg.rope_base))
    table = jax.lax.dynamic_slice_in_dim(table_full, pos, s, axis=0)
    scale = 1.0 / (hd ** 0.5)

    # Key visibility (window causal over absolute positions,
    # autoencoder.py:762-784): cache slot m holds position pos-(W-1)+m,
    # in-block key n holds pos+n; query i holds pos+i.  Visible iff
    # 0 <= k_pos <= q_pos and k_pos > q_pos - W.  Relative offsets drop pos.
    q_off = jnp.arange(s)[:, None]
    k_off = jnp.concatenate([jnp.arange(w - 1) - (w - 1), jnp.arange(s)])
    mask = ((k_off[None, :] + pos >= 0)
            & (k_off[None, :] <= q_off)
            & (k_off[None, :] > q_off - w))[None, None]

    def body(carry, xs):
        hh = carry
        bp, k_cache, v_cache = xs
        xn = _rms_norm_ae(hh, bp["attn_norm"], cfg.norm_eps)
        qkv = xn @ bp["wqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _apply_rope(q.reshape(b, s, h, hd), table)
        k = _apply_rope(k.reshape(b, s, h, hd), table)
        v = v.reshape(b, s, h, hd)
        k_all = jnp.concatenate([k_cache.astype(k.dtype), k], axis=1)
        v_all = jnp.concatenate([v_cache.astype(v.dtype), v], axis=1)
        logits = jnp.einsum("bshd,bthd->bhst", q, k_all,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mask, logits, float("-inf"))
        wts = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = (jnp.einsum("bhst,bthd->bshd", wts, v_all)
                .reshape(b, s, d)) @ bp["wo"]
        hh = hh + bp["attn_ls"] * attn

        xn = _rms_norm_ae(hh, bp["ffn_norm"], cfg.norm_eps)
        ff = (jax.nn.silu(xn @ bp["w1"]) * (xn @ bp["w3"])) @ bp["w2"]
        hh = hh + bp["ffn_ls"] * ff
        return hh, (k_all[:, k_all.shape[1] - (w - 1):].astype(k_cache.dtype),
                    v_all[:, v_all.shape[1] - (w - 1):].astype(v_cache.dtype))

    x, (new_k, new_v) = jax.lax.scan(body, x,
                                     (p["blocks"], st["k"], st["v"]))
    out = _rms_norm_ae(x, p["norm"], cfg.norm_eps)
    return out, {"k": new_k, "v": new_v, "pos": pos + s}


# ---------------------------------------------------------------------------
# Incremental decode_zq (one-shot twin: dac.decode_zq)
# ---------------------------------------------------------------------------

def decode_zq_block(params: dict, cfg: DACConfig, state: dict,
                    z_q: jnp.ndarray, *,
                    max_positions: int = MAX_POSITIONS):
    """z_q (B, T_block, 1024) -> (audio (B, T_block*2048, 1), new state).

    Exactly dac.decode_zq restricted to the new block, with all causal
    context coming from `state` (reference one-shot: autoencoder.py:486-496,
    1128-1132).  `max_positions` is the static RoPE-table bound (must stay
    constant across one stream's blocks)."""
    q = params["quantizer"]
    z, post_st = transformer_decode_block(
        q["post"], cfg.quantizer_transformer_config(), state["post"], z_q,
        max_positions)

    up_states = []
    for i, factor in enumerate(reversed(cfg.downsample_factor)):
        st = state["upsample"][i]
        st_t, z = _sconvt(st["convt"], z, q["upsample"][i]["convt"],
                          stride=factor)
        st_cn, z = _convnext_block_s(q["upsample"][i]["convnext"],
                                     {"dwconv": st["dwconv"]}, z)
        up_states.append({"convt": st_t, "dwconv": st_cn["dwconv"]})

    dp = params["decoder"]
    dst = state["decoder"]
    ap = cfg.snake_approx  # decoder-side fast snake (conv.py:sin2_poly)
    st_in, x = _sconv(dst["conv_in"], z, dp["conv_in"])
    blk_states = []
    for bi, stride in enumerate(cfg.decoder_rates):
        bp = dp["blocks"][bi]
        bst = dst["blocks"][bi]
        x = snake(x, bp["snake"], approx=ap)
        st_up, x = _sconvt(bst["up"], x, bp["up"], stride=stride)
        res_states = []
        for ri, dil in enumerate(DILATIONS):
            st_r, x = _residual_unit_s(bp["res_units"][ri],
                                       bst["res"][ri], x, dil,
                                       approx_snake=ap)
            res_states.append(st_r)
        blk_states.append({"up": st_up, "res": res_states})
    x = snake(x, dp["snake_out"], approx=ap)
    st_out, x = _sconv(dst["conv_out"], x, dp["conv_out"])
    audio = jnp.tanh(x)

    new_state = {
        "post": post_st,
        "upsample": up_states,
        "decoder": {"conv_in": st_in, "blocks": blk_states,
                    "conv_out": st_out},
    }
    return audio, new_state


# ---------------------------------------------------------------------------
# Incremental encode_zq (one-shot twin: dac.encode_zq) — the mirror of the
# decode state, for O(block) encoding of long audio (dataset building,
# >5-min speaker references).  The quantizers are pointwise per frame and
# carry no state.
# ---------------------------------------------------------------------------

def init_encode_state(cfg: DACConfig, batch: int = 1,
                      dtype=jnp.float32) -> dict:
    """Zero state == the one-shot causal pads (encoder side)."""
    dim = cfg.encoder_dim
    blocks = []
    for bi, (stride, n_t) in enumerate(
            zip(cfg.encoder_rates, cfg.encoder_transformer_layers)):
        in_dim, out_dim = dim, dim * 2
        dim = out_dim
        blk = {
            "res": [{"conv1": _conv_state(batch, 7, 1, dil, in_dim, dtype)}
                    for dil in DILATIONS],
            # down conv k=2s stride s: history width k_eff - s = s
            "down": _conv_state(batch, 2 * stride, stride, 1, in_dim, dtype),
        }
        if n_t:
            tcfg = cfg.encoder_transformer_config(out_dim, n_t)
            w = tcfg.window_size
            blk["transformer"] = {
                "k": jnp.zeros((tcfg.n_layer, batch, w - 1, tcfg.n_head,
                                tcfg.head_dim), dtype),
                "v": jnp.zeros((tcfg.n_layer, batch, w - 1, tcfg.n_head,
                                tcfg.head_dim), dtype),
                "pos": jnp.zeros((), jnp.int32),
            }
        blocks.append(blk)
    qcfg = cfg.quantizer_transformer_config()
    return {
        "conv_in": _conv_state(batch, 7, 1, 1, 1, dtype),
        "blocks": blocks,
        "conv_out": _conv_state(batch, 3, 1, 1, dim, dtype),
        "downsample": [{"dwconv": _conv_state(batch, 7, 1, 1,
                                              cfg.latent_dim, dtype)}
                       for _ in cfg.downsample_factor],
        "pre": {
            "k": jnp.zeros((qcfg.n_layer, batch, qcfg.window_size - 1,
                            qcfg.n_head, qcfg.head_dim), dtype),
            "v": jnp.zeros((qcfg.n_layer, batch, qcfg.window_size - 1,
                            qcfg.n_head, qcfg.head_dim), dtype),
            "pos": jnp.zeros((), jnp.int32),
        },
    }


def encode_zq_block(params: dict, cfg: DACConfig, state: dict,
                    audio: jnp.ndarray, *,
                    max_positions: int = MAX_ENC_POSITIONS):
    """audio (B, L_block, 1) -> (z_q (B, L_block/2048, 1024), new state).

    L_block must be a multiple of frame_length (the one-shot right-pad to a
    frame multiple is the caller's job, dac.encode_codes:126-129).  Exactly
    dac.encode_zq restricted to the new block, with all causal context in
    `state`; feeding consecutive blocks reproduces the one-shot encode of
    the concatenated audio (reference one-shot: autoencoder.py:1080-1126).
    Bit-exact at f32 when both sides run the unrolled XLA convs (CPU; or
    TPU with the fused res-stack kernel ineligible) — on TPU the ONE-SHOT
    encoder may take the fused kernel path (dac._res_stack), whose
    different reduction order makes equality float-tolerance instead.  In
    bf16 the VQ nearest-neighbor argmax can additionally flip at
    near-boundary frames (~1 per 3k frames measured on real audio) — the
    same discreteness any bf16 re-ordering of the one-shot encode has.
    """
    if audio.shape[1] % cfg.frame_length != 0:
        raise ValueError(
            f"block length {audio.shape[1]} must be a multiple of "
            f"frame_length {cfg.frame_length}")
    ep = params["encoder"]
    st_in, x = _sconv(state["conv_in"], audio, ep["conv_in"])
    blk_states = []
    dim = cfg.encoder_dim
    for bi, (stride, n_t) in enumerate(
            zip(cfg.encoder_rates, cfg.encoder_transformer_layers)):
        dim *= 2
        bp = ep["blocks"][bi]
        bst = state["blocks"][bi]
        res_states = []
        for ri, dil in enumerate(DILATIONS):
            st_r, x = _residual_unit_s(bp["res_units"][ri],
                                       bst["res"][ri], x, dil)
            res_states.append(st_r)
        x = snake(x, bp["snake"])
        st_d, x = _sconv(bst["down"], x, bp["down"], stride=stride)
        new_blk = {"res": res_states, "down": st_d}
        if n_t:
            x, new_blk["transformer"] = transformer_decode_block(
                bp["transformer"], cfg.encoder_transformer_config(dim, n_t),
                bst["transformer"], x, max_positions)
        blk_states.append(new_blk)
    x = snake(x, ep["snake_out"])
    st_out, z = _sconv(state["conv_out"], x, ep["conv_out"])

    q = params["quantizer"]
    ds_states = []
    for i, factor in enumerate(cfg.downsample_factor):
        z = causal_conv1d(z, q["downsample"][i]["conv"]["kernel"],
                          q["downsample"][i]["conv"]["bias"], stride=factor)
        st_cn, z = _convnext_block_s(
            q["downsample"][i]["convnext"],
            {"dwconv": state["downsample"][i]["dwconv"]}, z)
        ds_states.append({"dwconv": st_cn["dwconv"]})
    z, pre_st = transformer_decode_block(
        q["pre"], cfg.quantizer_transformer_config(), state["pre"], z,
        max_positions)

    sem_zq, sem_codes = rvq_encode(q["semantic"], z)
    _, res_codes = rvq_encode(q["residual"], z - sem_zq)
    codes = jnp.concatenate([sem_codes, res_codes], axis=1)
    z_q = zq_from_codes(q, cfg, codes)

    new_state = {"conv_in": st_in, "blocks": blk_states,
                 "conv_out": st_out, "downsample": ds_states,
                 "pre": pre_st}
    return z_q, new_state
