"""Native C host-DSP kernels vs the numpy reference implementations."""
import numpy as np

from echo_tts_tpu import native


def test_native_available_with_toolchain():
    # gcc is present in CI/dev images; if this fails the numpy fallback
    # still keeps the package functional, but we want to know.
    assert native.available()


def test_trailing_silence_matches_python_loop():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(1, 2000))
        x = (rng.standard_normal(n) * 0.02).astype(np.float32)
        thr = 0.01
        tail = np.abs(x)
        expected = 0
        for j in range(len(tail) - 1, -1, -1):
            if tail[j] < thr:
                expected += 1
            else:
                break
        assert native.trailing_silence(x, thr) == expected


def test_trailing_silence_all_silent_and_all_loud():
    assert native.trailing_silence(np.zeros(100, np.float32), 0.01) == 100
    assert native.trailing_silence(np.ones(100, np.float32), 0.01) == 0


def test_flattening_point_matches_numpy():
    from echo_tts_tpu.pipeline import dsp
    rng = np.random.default_rng(1)
    # loud region then a flat tail
    data = np.concatenate([
        rng.standard_normal((30, 8)).astype(np.float32),
        np.zeros((20, 8), np.float32) + 0.01,
    ])
    got = native.flattening_point(data)
    # numpy path (force fallback by calling internals)
    n = len(data)
    window = 20
    padded = np.concatenate([data, np.zeros((window, 8), np.float32)])
    flat = padded.reshape(len(padded), -1)
    win = np.lib.stride_tricks.sliding_window_view(flat, window, axis=0)[:n]
    count = win.shape[1] * win.shape[2]
    means = win.mean(axis=(1, 2))
    var = np.square(win - means[:, None, None]).sum(axis=(1, 2)) / (count - 1)
    ok = (np.sqrt(var) < 0.05) & (np.abs(means) < 0.1)
    idx = int(np.argmax(ok))
    expected = idx if ok[idx] else n
    assert got == expected

    # ndim>=3 inputs flatten trailing feature dims like the numpy fallback
    # instead of raising (regression: 'n, width = data.shape' ValueError)
    got3 = native.flattening_point(data.reshape(50, 4, 2))
    assert got3 == expected
