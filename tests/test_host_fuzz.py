"""Randomized bit-identity fuzz of the host text/DSP stack against the
live reference implementations (complements the fixed-case goldens in
test_host_pipeline)."""
import random
import string

import numpy as np

from echo_tts_tpu.pipeline import dsp, text
from torch_ref import import_ref_handler, import_ref_inference

_CHARS = (string.ascii_letters + string.digits + " " * 20 + ".,!?;:'\"()[]"
          + "…’”—\n" + "éüñß日本語")


def _rand_text(rng, n):
    return "".join(rng.choice(_CHARS) for _ in range(n))


def test_fuzz_tokenizer_and_chunkers():
    ref = import_ref_inference()
    refh = import_ref_handler()
    rng = random.Random(0)
    for trial in range(150):
        s = _rand_text(rng, rng.randint(0, 500))
        got_ids, got_norm = text.tokenizer_encode(
            s, return_normalized_text=True)
        ref_ids, ref_norm = ref.tokenizer_encode(
            s, return_normalized_text=True)
        assert got_norm == ref_norm, (trial, s)
        assert got_ids.tolist() == list(ref_ids), (trial, s)

        max_chars = rng.choice([20, 60, 150, 300])
        assert (text.chunk_text(s, max_chars)
                == ref.chunk_text(s, max_chars)), (trial, s, max_chars)
        dur = rng.choice([2.0, 10.0, 30.0])
        assert (text.chunk_text_for_audio(s, max_chars, dur)
                == refh.chunk_text_for_audio(s, max_chars, dur)), (
                    trial, s, max_chars, dur)


def test_fuzz_boundary_normalization():
    import torch
    refh = import_ref_handler()
    rng = np.random.default_rng(1)
    for trial in range(25):
        n_chunks = int(rng.integers(1, 5))
        chunks = []
        for _ in range(n_chunks):
            n = int(rng.integers(100, 3000))
            x = (rng.standard_normal((1, n)) * 0.2).astype(np.float32)
            # random trailing quiet region
            q = int(rng.integers(0, n))
            x[:, n - q:] *= 0.001
            chunks.append(x)
        got = dsp.normalize_chunk_boundaries(
            [c.copy() for c in chunks], min_silence_samples=500)
        ref = refh.normalize_chunk_boundaries(
            [torch.from_numpy(c.copy()) for c in chunks],
            min_silence_samples=500).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-7, err_msg=str(trial))
