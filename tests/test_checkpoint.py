"""Orbax checkpoint round-trip of the full model bundle."""
import numpy as np

import jax

from echo_tts_tpu.tools.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path, tiny_models):
    models = tiny_models
    dit_cfg, dac_cfg = models.dit_cfg, models.dac_cfg

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, models)
    restored = load_checkpoint(path)

    assert restored.dit_cfg == dit_cfg
    assert restored.dac_cfg == dac_cfg
    for a, b in zip(jax.tree.leaves(models.dit_params),
                    jax.tree.leaves(restored.dit_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(models.dac_params),
                    jax.tree.leaves(restored.dac_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(models.pca["components"]),
                                  np.asarray(restored.pca["components"]))


def test_checkpoint_roundtrip_quantized(tmp_path, tiny_models):
    """A W8A8 bundle (ops/quant.py) checkpoints byte-identically: the
    quantized leaves are plain {int8, f32} dicts, so a pre-quantized
    serving checkpoint avoids the quantize-at-load step entirely."""
    import dataclasses

    from echo_tts_tpu.ops.quant import (dit_params_are_quantized,
                                        quantize_dit_params)

    qm = dataclasses.replace(
        tiny_models,
        dit_params=quantize_dit_params(tiny_models.dit_params))
    path = str(tmp_path / "qckpt")
    save_checkpoint(path, qm)
    restored = load_checkpoint(path)
    assert dit_params_are_quantized(restored.dit_params)
    q8 = restored.dit_params["blocks"]["mlp"]["w2"]["q8"]
    assert np.asarray(q8).dtype == np.int8
    for a, b in zip(jax.tree.leaves(qm.dit_params),
                    jax.tree.leaves(restored.dit_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
