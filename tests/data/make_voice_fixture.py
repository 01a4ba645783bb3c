"""Generate tests/data/voice.wav — a deterministic 2 s synthetic "voice".

Not speech, but voice-LIKE in the ways the pipeline cares about: a glottal
pulse train with vibrato and drifting formant resonances, amplitude
envelope with pauses (so the trailing-silence / flattening-point DSP has
real structure to find), plus breath noise.  Checked in so voice-cloning
e2e tests exercise the real audio path (load_audio -> resample -> AE
encode) instead of tanh(randn) — the reference ships real sample voices in
audio_prompts/ which cannot be redistributed here.

Regenerate with: python tests/data/make_voice_fixture.py
"""
import os
import struct
import wave

import numpy as np

SR = 44100
SECONDS = 2.0


def synth() -> np.ndarray:
    rng = np.random.default_rng(20260816)
    n = int(SR * SECONDS)
    t = np.arange(n) / SR

    # F0 contour: ~120 Hz male-ish with declination + 5 Hz vibrato
    f0 = 128.0 - 14.0 * t / SECONDS + 3.0 * np.sin(2 * np.pi * 5.1 * t)
    phase = 2 * np.pi * np.cumsum(f0) / SR

    # Harmonic-rich source (soft-saturated pulse train)
    src = np.zeros(n)
    for h in range(1, 25):
        src += np.sin(h * phase) / h
    src = np.tanh(1.5 * src)

    # Two drifting "formants" via time-varying resonant mixing
    f1 = 550 + 150 * np.sin(2 * np.pi * 0.9 * t)
    f2 = 1700 + 300 * np.sin(2 * np.pi * 0.6 * t + 1.0)
    voiced = (src * (0.8 + 0.2 * np.sin(2 * np.pi * f1 * t / 40))
              + 0.3 * src * np.sin(2 * np.pi * f2 * t / 400))

    # Breath noise
    voiced = voiced + 0.02 * rng.standard_normal(n)

    # Syllable-ish amplitude envelope with an inter-"word" pause and a
    # trailing decay into silence (exercises crop/normalize DSP)
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 3.3 * t - 0.7) ** 2
    env *= np.clip(1.0 - np.exp(-(t / 0.05)), 0, 1)          # attack
    pause = (t > 0.95) & (t < 1.12)
    env[pause] *= 0.02
    tail = t > 1.82
    env[tail] *= np.exp(-(t[tail] - 1.82) / 0.04)

    audio = voiced * env
    return (audio / np.max(np.abs(audio))).astype(np.float32)


def main():
    audio = synth()
    path = os.path.join(os.path.dirname(__file__), "voice.wav")
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())
    print(f"wrote {path}: {len(pcm) / SR:.2f}s @ {SR} Hz, "
          f"{os.path.getsize(path)} bytes")


if __name__ == "__main__":
    main()
