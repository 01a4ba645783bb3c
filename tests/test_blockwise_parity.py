"""Blockwise streaming sampler parity vs the reference
(fp32, CPU, tiny model, injected per-block torch noise)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from echo_tts_tpu.config import tiny_dit_config
from echo_tts_tpu.sampler.blockwise import (
    sample_blockwise_euler_cfg_independent_guidances,
)

from torch_ref import build_torch_dit, jax_params_from_torch, rand

CFG = tiny_dit_config()


@pytest.fixture(scope="module")
def setup():
    tmodel = build_torch_dit(CFG, seed=0)
    params = jax_params_from_torch(tmodel, CFG)
    import sys
    sys.path.insert(0, "/root/reference")
    import torch_ref
    torch_ref.import_ref_inference()  # satisfies inference_blockwise imports
    import inference_blockwise as ref_bw
    return tmodel, params, ref_bw


def _torch_noises(seed, b, block_sizes, latent):
    """The reference draws all blocks from ONE generator sequentially
    (inference_blockwise.py:42, 76)."""
    rng = torch.Generator(device="cpu").manual_seed(seed)
    return [torch.randn((b, bs, latent), dtype=torch.float32, generator=rng)
            for bs in block_sizes]


BASE = dict(
    num_steps=4, cfg_scale_text=3.0, cfg_scale_speaker=5.0,
    cfg_min_t=0.5, cfg_max_t=1.0,
    truncation_factor=0.8, rescale_k=None, rescale_sigma=None,
    speaker_kv_scale=None, speaker_kv_max_layers=None, speaker_kv_min_t=None,
)


def _run_both(setup, kw, block_sizes, seed=0, continuation=None):
    tmodel, params, ref_bw = setup
    rng = np.random.default_rng(seed + 50)
    b = 1
    ids = rng.integers(0, CFG.text_vocab_size, size=(b, 10))
    tmask = np.ones((b, 10), dtype=bool)
    spk_latent = rand(rng, b, 8, CFG.latent_size)
    smask = np.ones((b, 8), dtype=bool)

    cont_t = None if continuation is None else torch.tensor(continuation)
    with torch.no_grad():
        ref = ref_bw.sample_blockwise_euler_cfg_independent_guidances(
            model=tmodel,
            speaker_latent=torch.tensor(spk_latent),
            speaker_mask=torch.tensor(smask),
            text_input_ids=torch.tensor(ids),
            text_mask=torch.tensor(tmask),
            rng_seed=seed,
            block_sizes=list(block_sizes),
            continuation_latent=cont_t,
            **kw,
        ).numpy()

    noises = [n.numpy() for n in _torch_noises(seed, b, block_sizes,
                                               CFG.latent_size)]
    got = np.asarray(sample_blockwise_euler_cfg_independent_guidances(
        params, CFG,
        jnp.asarray(spk_latent), jnp.asarray(smask),
        jnp.asarray(ids), jnp.asarray(tmask),
        block_sizes=list(block_sizes),
        dtype=jnp.float32,
        initial_noises=[jnp.asarray(n) for n in noises],
        continuation_latent=None if continuation is None
        else jnp.asarray(continuation),
        **kw,
    ))
    return got, ref


def _assert_close(got, ref):
    mse = float(np.mean((got - ref) ** 2))
    assert mse < 1e-8, f"latent MSE {mse}"
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-4)


def test_blockwise_basic(setup):
    got, ref = _run_both(setup, dict(BASE), block_sizes=[8, 8, 4])
    _assert_close(got, ref)


def test_blockwise_speaker_kv_scale(setup):
    kw = dict(BASE, speaker_kv_scale=1.5, speaker_kv_max_layers=1,
              speaker_kv_min_t=0.4)
    got, ref = _run_both(setup, kw, block_sizes=[8, 8], seed=1)
    _assert_close(got, ref)


def test_one_program_per_block_size(setup, monkeypatch):
    """A stream of N same-size blocks must build ONE block core and compile
    ONE program — start_pos is a traced operand, not a cache key
    (round-1 weakness: 40-block streams compiled 40 programs)."""
    import jax

    import echo_tts_tpu.sampler.blockwise as bw

    _, params, _ = setup
    rng = np.random.default_rng(7)
    ids = rng.integers(0, CFG.text_vocab_size, size=(1, 10))
    tmask = np.ones((1, 10), dtype=bool)
    spk_latent = rand(rng, 1, 8, CFG.latent_size)
    smask = np.ones((1, 8), dtype=bool)

    cores = []
    orig = bw._block_core

    def spy(*a):
        c = orig(*a)
        cores.append(c)
        return c

    monkeypatch.setattr(bw, "_block_core", spy)
    sample_blockwise_euler_cfg_independent_guidances(
        params, CFG, jnp.asarray(spk_latent), jnp.asarray(smask),
        jnp.asarray(ids), jnp.asarray(tmask), block_sizes=[8, 8, 8],
        dtype=jnp.float32, rng_key=jax.random.PRNGKey(0), **BASE)
    assert len(cores) == 3
    # block 0 gets the latent-free first-block specialization; every later
    # same-size block shares ONE core/program (start_pos is traced)
    assert cores[1] is cores[2] and cores[0] is not cores[1]
    assert cores[1]._cache_size() == 1
    assert cores[0]._cache_size() == 1


def test_incremental_latent_kv_matches_full_reencode(setup):
    """Chained latent_kv_append_block must equal get_kv_cache_latent on
    the real prefix (valid columns) — the causal encoder's KV never
    changes once written."""
    from echo_tts_tpu.models import dit

    _, params, _ = setup
    rng = np.random.default_rng(21)
    ps = CFG.speaker_patch_size
    prefix = rand(rng, 1, 16, CFG.latent_size)

    full_k, full_v = dit.get_kv_cache_latent(params, CFG,
                                             jnp.asarray(prefix))

    state = dit.init_latent_inc_state(CFG, 1, 16 // ps, jnp.float32)
    for start, size in ((0, 8), (8, 4), (12, 4)):
        state = dit.latent_kv_append_block(
            params, CFG, state, jnp.asarray(prefix[:, start:start + size]))
    assert int(state["pos"]) == 16 // ps
    np.testing.assert_allclose(np.asarray(state["lat_k"]),
                               np.asarray(full_k), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(state["lat_v"]),
                               np.asarray(full_v), atol=1e-5, rtol=1e-4)


def test_blockwise_incremental_latent_matches_reencode(setup):
    """incremental_latent=True must produce the same latents as the
    default full-re-encode path (and therefore the torch reference)."""
    import jax

    _, params, _ = setup
    rng = np.random.default_rng(23)
    ids = rng.integers(0, CFG.text_vocab_size, size=(1, 10))
    tmask = np.ones((1, 10), dtype=bool)
    spk_latent = rand(rng, 1, 8, CFG.latent_size)
    smask = np.ones((1, 8), dtype=bool)
    common = dict(
        block_sizes=[8, 8, 4], dtype=jnp.float32,
        rng_key=jax.random.PRNGKey(3), **BASE)

    base = np.asarray(sample_blockwise_euler_cfg_independent_guidances(
        params, CFG, jnp.asarray(spk_latent), jnp.asarray(smask),
        jnp.asarray(ids), jnp.asarray(tmask), **common))
    inc = np.asarray(sample_blockwise_euler_cfg_independent_guidances(
        params, CFG, jnp.asarray(spk_latent), jnp.asarray(smask),
        jnp.asarray(ids), jnp.asarray(tmask), incremental_latent=True,
        **common))
    np.testing.assert_allclose(inc, base, atol=1e-5, rtol=1e-4)

    with pytest.raises(ValueError, match="divisible by"):
        list(sample_blockwise_euler_cfg_independent_guidances(
            params, CFG, jnp.asarray(spk_latent), jnp.asarray(smask),
            jnp.asarray(ids), jnp.asarray(tmask), incremental_latent=True,
            block_sizes=[6, 6], dtype=jnp.float32,
            rng_key=jax.random.PRNGKey(3), **BASE))


def test_total_len_bucket_identical(setup):
    """Padding the prefix buffer to a static total bucket must not change
    outputs (the position-gated latent mask hides the padding), and the
    FIRST-block program must be shared across totals (keyed on block size
    only) so bucketing makes the serving compile surface finite."""
    import jax

    import echo_tts_tpu.sampler.blockwise as bw

    _, params, _ = setup
    rng = np.random.default_rng(31)
    ids = rng.integers(0, CFG.text_vocab_size, size=(1, 10))
    tmask = np.ones((1, 10), dtype=bool)
    spk_latent = rand(rng, 1, 8, CFG.latent_size)
    smask = np.ones((1, 8), dtype=bool)
    common = dict(
        block_sizes=[8, 8, 4], dtype=jnp.float32,
        rng_key=jax.random.PRNGKey(5), **BASE)

    base = np.asarray(sample_blockwise_euler_cfg_independent_guidances(
        params, CFG, jnp.asarray(spk_latent), jnp.asarray(smask),
        jnp.asarray(ids), jnp.asarray(tmask), **common))
    bucketed = np.asarray(sample_blockwise_euler_cfg_independent_guidances(
        params, CFG, jnp.asarray(spk_latent), jnp.asarray(smask),
        jnp.asarray(ids), jnp.asarray(tmask), total_len_bucket=32,
        **common))
    assert bucketed.shape == base.shape  # padding cropped off
    np.testing.assert_allclose(bucketed, base, atol=1e-5, rtol=1e-4)

    # first-block core: same object for totals 20 and 32 (bucket)
    c20 = bw._block_core(CFG, 8, 8, 4, 3.0, 5.0, 0.5, 1.0, 0.8, None,
                         None, None, None, None, jnp.dtype(jnp.float32),
                         False, True)
    assert c20 is bw._block_core(
        CFG, 8, 8, 4, 3.0, 5.0, 0.5, 1.0, 0.8, None, None, None, None,
        None, jnp.dtype(jnp.float32), False, True)

    with pytest.raises(ValueError, match="smaller than"):
        list(sample_blockwise_euler_cfg_independent_guidances(
            params, CFG, jnp.asarray(spk_latent), jnp.asarray(smask),
            jnp.asarray(ids), jnp.asarray(tmask), total_len_bucket=16,
            **common))


def test_total_len_bucket_incremental(setup):
    """Bucketed + incremental latent-KV: the oversized append buffer's
    unwritten columns are masked out, so outputs still match."""
    import jax

    _, params, _ = setup
    rng = np.random.default_rng(37)
    ids = rng.integers(0, CFG.text_vocab_size, size=(1, 10))
    tmask = np.ones((1, 10), dtype=bool)
    spk_latent = rand(rng, 1, 8, CFG.latent_size)
    smask = np.ones((1, 8), dtype=bool)
    common = dict(
        block_sizes=[8, 8], dtype=jnp.float32,
        rng_key=jax.random.PRNGKey(6), **BASE)

    base = np.asarray(sample_blockwise_euler_cfg_independent_guidances(
        params, CFG, jnp.asarray(spk_latent), jnp.asarray(smask),
        jnp.asarray(ids), jnp.asarray(tmask), **common))
    got = np.asarray(sample_blockwise_euler_cfg_independent_guidances(
        params, CFG, jnp.asarray(spk_latent), jnp.asarray(smask),
        jnp.asarray(ids), jnp.asarray(tmask), total_len_bucket=32,
        incremental_latent=True, **common))
    np.testing.assert_allclose(got, base, atol=1e-5, rtol=1e-4)


def test_blockwise_continuation(setup):
    rng = np.random.default_rng(99)
    continuation = rand(rng, 1, 8, CFG.latent_size)
    got, ref = _run_both(setup, dict(BASE), block_sizes=[8, 4], seed=2,
                         continuation=continuation)
    _assert_close(got, ref)
    # continuation region is passed through untouched
    np.testing.assert_allclose(got[:, :8], continuation, rtol=1e-6, atol=1e-7)
