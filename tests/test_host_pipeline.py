"""Host text stack + DSP: bit-identity vs the reference implementations."""
import numpy as np
import torch

from echo_tts_tpu.pipeline import dsp, text
from echo_tts_tpu.pipeline.audio_io import resample, read_wav, write_wav

from torch_ref import import_ref_inference, import_ref_handler

TEXTS = [
    "Hello world. This is a test!",
    "[S2] Already tagged text; no prefix.",
    "(whisper) parenthetical start",
    "Curly ’quotes” and ellipsis… plus a colon: and semi; dash—done",
    "Multi\nline\ntext with  extra   spaces",
    "S1 mention means no prefix added",
    "A" * 900,
    "Sentence one. Sentence two, with clause; and more: details. " * 20,
    'He said "stop." Then left. (Right?) [Sure!] ',
    "",
    "    ",
    "word " * 200,
]


def test_tokenizer_bit_identity():
    ref = import_ref_inference()
    for t in TEXTS:
        if not t:
            continue
        r_ids, r_norm = ref.tokenizer_encode(t, return_normalized_text=True)
        g_ids, g_norm = text.tokenizer_encode(t, return_normalized_text=True)
        assert g_norm == r_norm, t
        np.testing.assert_array_equal(g_ids, r_ids.numpy())


def test_chunk_text_bit_identity():
    ref = import_ref_inference()
    for t in TEXTS:
        for mc in (50, 120, 300):
            assert text.chunk_text(t, mc) == ref.chunk_text(t, mc), (t, mc)


def test_chunk_text_for_audio_bit_identity():
    refh = import_ref_handler()
    for t in TEXTS:
        for dur in (5.0, 10.0, 30.0):
            got = text.chunk_text_for_audio(t, 300, dur)
            want = refh.chunk_text_for_audio(t, 300, dur)
            assert got == want, (t, dur)


def test_text_ids_and_mask_bit_identity():
    ref = import_ref_inference()
    batch = ["Short one.", "A slightly longer second prompt, with commas."]
    for max_len in (None, 32, 768):
        r_ids, r_mask = ref.get_text_input_ids_and_mask(batch, max_len)
        g_ids, g_mask = text.get_text_input_ids_and_mask(batch, max_len)
        np.testing.assert_array_equal(g_ids, r_ids.numpy())
        np.testing.assert_array_equal(g_mask, r_mask.numpy())


def _rand_audio(rng, ch, n):
    return (rng.standard_normal((ch, n)) * 0.3).astype(np.float32)


def _i16(x):
    return (np.clip(x, -1, 1) * 32767.0).astype(np.int16)


def test_crossfade_bit_identity():
    refh = import_ref_handler()
    rng = np.random.default_rng(0)
    for lengths in [(5000, 7000), (44100, 44100, 44100), (800, 900, 1000),
                    (12, 16)]:
        chunks = [_rand_audio(rng, 1, n) for n in lengths]
        got = dsp.crossfade_chunks(list(chunks))
        want = refh.crossfade_chunks([torch.tensor(c) for c in chunks]).numpy()
        assert got.shape == want.shape
        # torch.linspace fade weights differ from any straightforward numpy
        # formula by <=1 ulp (6e-8); the audible artifact (int16/Opus
        # output) is bit-identical, which is what we assert, plus a float
        # tolerance at the ulp scale.
        np.testing.assert_array_equal(_i16(got), _i16(want))
        np.testing.assert_allclose(got, want, atol=2e-7, rtol=0)


def test_normalize_boundaries_bit_identity():
    refh = import_ref_handler()
    rng = np.random.default_rng(1)
    # construct chunks with varying trailing silence
    def with_tail(n_speech, n_sil):
        speech = _rand_audio(rng, 1, n_speech)
        sil = (rng.standard_normal((1, n_sil)) * 0.001).astype(np.float32)
        return np.concatenate([speech, sil], axis=-1)

    cases = [
        [with_tail(30000, 40000), with_tail(30000, 500), with_tail(30000, 0)],
        [with_tail(50000, 22050), with_tail(10000, 10)],
        [_rand_audio(rng, 1, 60000)],
    ]
    for chunks in cases:
        got = dsp.normalize_chunk_boundaries(list(chunks))
        want = refh.normalize_chunk_boundaries(
            [torch.tensor(c) for c in chunks]).numpy()
        # the silence trim/extend decisions are exact (same shapes); only the
        # crossfaded overlap differs by linspace ulps (see above)
        assert got.shape == want.shape
        np.testing.assert_array_equal(_i16(got), _i16(want))
        np.testing.assert_allclose(got, want, atol=2e-7, rtol=0)


def test_flattening_point_matches_reference():
    ref = import_ref_inference()
    rng = np.random.default_rng(2)
    # noisy latents that flatten to ~0 after index 37
    lat = (rng.standard_normal((64, 80)).astype(np.float32))
    lat[37:] = rng.standard_normal((27, 80)).astype(np.float32) * 0.01
    got = dsp.find_flattening_point(lat)
    want = ref.find_flattening_point(torch.tensor(lat))
    assert got == want

    # no flat region -> returns len (padding windows straddle the boundary)
    lat2 = rng.standard_normal((32, 80)).astype(np.float32) * 3 + 5
    assert dsp.find_flattening_point(lat2) == \
        ref.find_flattening_point(torch.tensor(lat2))

    # all flat -> 0
    lat3 = np.zeros((16, 80), dtype=np.float32)
    assert dsp.find_flattening_point(lat3) == 0


def test_resample_preserves_sine(tmp_path):
    sr_in, sr_out, f = 24000, 44100, 440.0
    t = np.arange(sr_in, dtype=np.float32) / sr_in
    x = np.sin(2 * np.pi * f * t)[None, :].astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert abs(y.shape[1] - sr_out) <= 1
    # compare against the ideal sine at the new rate (skip filter edges)
    t2 = np.arange(y.shape[1], dtype=np.float32) / sr_out
    ideal = np.sin(2 * np.pi * f * t2)[None, :]
    err = np.abs(y[:, 2000:-2000] - ideal[:, 2000:-2000]).max()
    assert err < 5e-3, err

    # identity when rates equal
    np.testing.assert_array_equal(resample(x, sr_in, sr_in), x)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    audio = np.tanh(rng.standard_normal((1, 4410))).astype(np.float32) * 0.9
    p = tmp_path / "x.wav"
    write_wav(str(p), audio, 44100)
    back, sr = read_wav(str(p))
    assert sr == 44100 and back.shape == audio.shape
    assert np.abs(back - audio).max() < 1.0 / 32000


def test_bucket_selection_bit_identity():
    import importlib.util
    spec_texts = ["768", "640, 2816, 6400", "", " 64 ,128", "100"]
    # reference implementation lives in gradio_app.py (heavy deps); its
    # algorithm is restated in the docstring — test OUR semantics directly.
    assert text.find_min_bucket_gte("768", 10) == 768
    assert text.find_min_bucket_gte("640, 2816, 6400", 700) == 2816
    assert text.find_min_bucket_gte("640, 2816, 6400", 6400) == 6400
    assert text.find_min_bucket_gte("640, 2816, 6400", 9999) == 6400
    assert text.find_min_bucket_gte("", 10) is None
