"""The warmup manifest is derived from the SAME constants request
validation uses (serve/presets.py), so the warmed shape surface and the
accepted shape surface cannot drift apart: every manifest stream entry
must pass the handler's own validation rules, and the full manifest must
cover every program the serving surface can demand.
"""
import pytest

from echo_tts_tpu.config import SAMPLER_DEFAULTS
from echo_tts_tpu.serve import presets as P


def _stream_entries(manifest):
    return [e for e in manifest if e["kind"] == "stream"]


def test_pick_stream_total_bucket():
    buckets = P._parse_buckets(P.STREAM_TOTAL_BUCKETS)
    assert P.pick_stream_total_bucket(1) == min(buckets)
    assert P.pick_stream_total_bucket(min(buckets)) == min(buckets)
    assert P.pick_stream_total_bucket(min(buckets) + 1) == buckets[1]
    assert P.pick_stream_total_bucket(max(buckets)) == max(buckets)
    # past the top bucket: None (run unbucketed), NOT a clamp to max —
    # find_min_bucket_gte returns max(values) on overflow
    assert P.pick_stream_total_bucket(max(buckets) + 1) is None


def test_total_buckets_cover_accepted_stream_surface():
    """Every schedule the handler accepts (sizes in STREAM_CHUNK_SIZES,
    count <= MAX_STREAM_CHUNKS) lands in SOME total bucket, and buckets
    satisfy the sampler's divisibility requirement."""
    from echo_tts_tpu.config import EchoDiTConfig
    ps = EchoDiTConfig.speaker_patch_size
    max_total = max(P.STREAM_CHUNK_SIZES) * P.MAX_STREAM_CHUNKS
    buckets = P._parse_buckets(P.STREAM_TOTAL_BUCKETS)
    assert max(buckets) >= max_total
    for b in buckets:
        assert b % ps == 0
    # decode RoPE bound: bucketing must not exceed what streaming allows
    from echo_tts_tpu.models.dac.streaming import MAX_POSITIONS
    assert max(buckets) <= MAX_POSITIONS


def test_stream_entries_pass_serving_validation():
    for manifest in (P.warmup_manifest(batch_sizes=(8,)),
                     P.warmup_manifest(full=True)):
        for e in _stream_entries(manifest):
            sizes = e["chunk_sizes"]
            assert 1 <= len(sizes) <= P.MAX_STREAM_CHUNKS, e
            assert all(c in P.STREAM_CHUNK_SIZES for c in sizes), e
            # the claimed bucket is what stream_synthesize will pick
            assert e["total_bucket"] == P.pick_stream_total_bucket(
                sum(sizes)), e


def test_default_manifest_is_high_traffic_subset():
    m = P.warmup_manifest(batch_sizes=(8,))
    speaker_smallest = P._parse_buckets(P.SPEAKER_BUCKETS)[0]
    ones = [e for e in m if e["kind"] == "oneshot"]
    assert {e["speaker_bucket"] for e in ones} == {None, speaker_smallest}
    assert {e["sequence_length"] for e in ones} == {
        SAMPLER_DEFAULTS["sequence_length"]}
    streams = _stream_entries(m)
    scheds = {tuple(e["chunk_sizes"]) for e in streams}
    assert (160, 160, 160, 160) in scheds          # default schedule
    assert tuple(P.STREAM_CHUNK_SIZES) in scheds   # growing ramp
    batches = [e for e in m if e["kind"] == "batch"]
    assert {e["batch_size"] for e in batches} == {8}


def test_full_manifest_covers_every_program():
    m = P.warmup_manifest(full=True)
    speaker_buckets = [None] + P._parse_buckets(P.SPEAKER_BUCKETS)
    totals = P._parse_buckets(P.STREAM_TOTAL_BUCKETS)
    smallest = min(P.STREAM_CHUNK_SIZES)

    ones = [e for e in m if e["kind"] == "oneshot"]
    assert {e["speaker_bucket"] for e in ones} == set(speaker_buckets)
    # every auto_sequence_length bucket + the default
    want_seqs = set(P._parse_buckets(P.SEQUENCE_BUCKETS)) | {
        SAMPLER_DEFAULTS["sequence_length"]}
    for s in speaker_buckets:
        assert {e["sequence_length"] for e in ones
                if e["speaker_bucket"] == s} == want_seqs

    for s in speaker_buckets:
        streams = [e for e in _stream_entries(m)
                   if e["speaker_bucket"] == s]
        # first-block programs are total-independent (keyed on block size
        # only, sampler/blockwise.py): every accepted size appears as
        # some stream's FIRST block
        firsts = {e["chunk_sizes"][0] for e in streams}
        assert firsts == set(P.STREAM_CHUNK_SIZES)
        # later-block programs are keyed on (total bucket, size): every
        # reachable pair is warmed.  (tb, c) is reachable iff a schedule
        # [smallest, c, ...] fits the bucket.
        later = {(e["total_bucket"], c)
                 for e in streams for c in e["chunk_sizes"][1:]}
        for tb in totals:
            for c in P.STREAM_CHUNK_SIZES:
                if smallest + c <= tb:
                    assert (tb, c) in later, (tb, c)


def test_later_cover_schedule_lands_in_its_bucket():
    totals = P._parse_buckets(P.STREAM_TOTAL_BUCKETS)
    for tb in totals:
        sched = P._later_cover_schedule(tb)
        assert len(sched) <= P.MAX_STREAM_CHUNKS
        assert all(c in P.STREAM_CHUNK_SIZES for c in sched)
        assert P.pick_stream_total_bucket(sum(sched)) == tb


def test_full_manifest_batch_entries():
    """Batched programs are keyed on (batch size, sequence_length) too
    (batcher.group_compatible groups by identical sampler params), so
    full=True must warm batch entries for EVERY sequence bucket — an
    auto_sequence_length chunk that batches at seq 160/320/480 would
    otherwise pay a full-size compile at traffic time."""
    from echo_tts_tpu.config import SAMPLER_DEFAULTS
    m = P.warmup_manifest(batch_sizes=(4, 8), full=True)
    batches = [e for e in m if e["kind"] == "batch"]
    speaker_buckets = {None} | set(P._parse_buckets(P.SPEAKER_BUCKETS))
    seq_buckets = (set(P._parse_buckets(P.SEQUENCE_BUCKETS))
                   | {SAMPLER_DEFAULTS["sequence_length"]})
    assert {(e["batch_size"], e["speaker_bucket"], e["sequence_length"])
            for e in batches} == {
        (b, s, q) for b in (4, 8) for s in speaker_buckets
        for q in seq_buckets}
    # the high-traffic default stays lean: default seq only
    m0 = P.warmup_manifest(batch_sizes=(8,))
    assert {e["sequence_length"] for e in m0 if e["kind"] == "batch"} == {
        SAMPLER_DEFAULTS["sequence_length"]}


def test_full_manifest_covers_incremental_kv_paths():
    """Stream block programs are keyed on the re-encode vs incremental-KV
    choice (streaming.py engages incremental at totals >=
    INCREMENTAL_LATENT_MIN_TOTAL): buckets serving incremental totals
    need an entry crossing the threshold, buckets serving re-encode
    totals need one below it."""
    from echo_tts_tpu.serve.streaming import INCREMENTAL_LATENT_MIN_TOTAL
    m = P.warmup_manifest(full=True)
    totals = P._parse_buckets(P.STREAM_TOTAL_BUCKETS)
    speakers = [None] + P._parse_buckets(P.SPEAKER_BUCKETS)
    for s in speakers:
        streams = [e for e in _stream_entries(m)
                   if e["speaker_bucket"] == s]
        for i, tb in enumerate(totals):
            prev = totals[i - 1] if i else 0
            if tb >= INCREMENTAL_LATENT_MIN_TOTAL:
                assert any(e["total_bucket"] == tb
                           and sum(e["chunk_sizes"])
                           >= INCREMENTAL_LATENT_MIN_TOTAL
                           for e in streams), (s, tb)
            if prev < INCREMENTAL_LATENT_MIN_TOTAL:
                assert any(e["total_bucket"] == tb
                           and sum(e["chunk_sizes"])
                           < INCREMENTAL_LATENT_MIN_TOTAL
                           for e in streams), (s, tb)


def test_batch_size_buckets():
    """The micro-batch server pads groups to these sizes and warmup warms
    exactly them — the pair is what keeps arrival counts off the compile
    path (serve/server.py)."""
    assert P.batch_size_buckets(8) == (1, 2, 4, 8)
    assert P.batch_size_buckets(6) == (1, 2, 4, 6)
    assert P.batch_size_buckets(1) == (1,)
    assert P.pick_batch_bucket(3, 8) == 4
    assert P.pick_batch_bucket(5, 6) == 6
    assert P.pick_batch_bucket(8, 8) == 8
    with pytest.raises(ValueError):
        P.pick_batch_bucket(9, 8)
    with pytest.raises(ValueError):
        P.batch_size_buckets(0)


def test_manifest_respects_default_sequence_override():
    m = P.warmup_manifest(default_sequence_length=320)
    assert {e["sequence_length"] for e in m
            if e["kind"] == "oneshot"} == {320}
