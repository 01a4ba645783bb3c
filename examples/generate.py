"""Runnable end-to-end example — the analog of `python -m inference`
(reference: inference.py:524-558, labeled "Running Tests" in its README).

With ECHO_MODEL_DIR set to converted weights this produces real speech;
without it, --random-weights runs the full pipeline with random
initialization (same compute, noise audio) as a smoke test.

    python examples/generate.py --text "Hello!" [--voice ref.wav]
        [--preset Independent-High-Speaker-CFG] [--seed 0] [--out out.wav]

Serving env vars apply (the example loads through serve.models): e.g.
ECHO_DIT_QUANT=int8 runs the W8A8 DiT (docs/PERFORMANCE.md §11).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default="The quick brown fox jumps over the "
                    "lazy dog, then reads it a bedtime story.")
    ap.add_argument("--voice", default=None, help="speaker reference audio")
    ap.add_argument("--preset", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--out", default="out.wav")
    ap.add_argument("--random-weights", action="store_true")
    args = ap.parse_args()

    from echo_tts_tpu.pipeline import audio_io
    from echo_tts_tpu.pipeline.pipeline import sample_pipeline
    from echo_tts_tpu.serve.handler import build_sample_fn
    from echo_tts_tpu.serve.models import load_models

    models = load_models(os.environ.get("ECHO_MODEL_DIR"),
                         allow_random=args.random_weights)
    params = {} if args.steps is None else {"num_steps": args.steps}
    sample_fn, p = build_sample_fn(params, preset=args.preset)
    print("sampler:", p)

    speaker = audio_io.load_audio(args.voice) if args.voice else None
    t0 = time.time()
    audio, text = sample_pipeline(models, sample_fn, args.text, speaker,
                                  rng_seed=args.seed)
    dt = time.time() - t0
    dur = audio.shape[-1] / 44100
    audio_io.write_wav(args.out, audio, 44100)
    print(f"wrote {args.out}: {dur:.1f}s audio in {dt:.1f}s "
          f"({dur / dt:.1f}x realtime)\nnormalized text: {text}")


if __name__ == "__main__":
    main()
