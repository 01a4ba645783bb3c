"""Streaming example — the analog of `python inference_blockwise.py`
(reference: inference_blockwise.py:126-220): blockwise generation with a
continuation pass, audio emitted per block.

    python examples/streaming_demo.py [--voice ref.wav] [--random-weights]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default="Streaming synthesis produces audio "
                    "block by block, so playback can begin immediately.")
    ap.add_argument("--voice", default=None)
    ap.add_argument("--chunk-size", type=int, default=160)
    ap.add_argument("--num-chunks", type=int, default=4)
    ap.add_argument("--total-latents", type=int, default=None,
                    help="use the growing schedule (40,80,160,320,...) "
                    "for this many latents instead of uniform chunks — "
                    "halves time-to-first-audio")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="stream.wav")
    ap.add_argument("--random-weights", action="store_true")
    args = ap.parse_args()

    from echo_tts_tpu.pipeline import audio_io
    from echo_tts_tpu.serve.models import load_models
    from echo_tts_tpu.serve.streaming import stream_synthesize

    models = load_models(os.environ.get("ECHO_MODEL_DIR"),
                         allow_random=args.random_weights)
    speaker = audio_io.load_audio(args.voice) if args.voice else None

    chunk_sizes = None
    if args.total_latents:
        from echo_tts_tpu.serve.presets import growing_schedule
        chunk_sizes = growing_schedule(args.total_latents)
        print(f"schedule: {chunk_sizes}")

    pieces = []
    t0 = time.time()
    for chunk in stream_synthesize(
            models, args.text, speaker, chunk_size=args.chunk_size,
            num_chunks=args.num_chunks, chunk_sizes=chunk_sizes,
            seed=args.seed):
        dt = time.time() - t0
        dur = chunk.audio.shape[-1] / 44100
        print(f"block {chunk.index}: +{dur:.1f}s audio at t={dt:.2f}s "
              f"(latents {chunk.latent_start}:{chunk.latent_end})")
        pieces.append(chunk.audio)

    audio = np.concatenate(pieces, axis=-1)
    audio_io.write_wav(args.out, audio, 44100)
    print(f"wrote {args.out}: {audio.shape[-1] / 44100:.1f}s total")


if __name__ == "__main__":
    main()
