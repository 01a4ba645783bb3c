"""StageTimer accounting."""
import time

from echo_tts_tpu.utils.profiling import StageTimer


def test_stage_timer_accumulates_and_reports():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        time.sleep(0.005)
    rep = t.report()
    assert rep["a"]["calls"] == 2 and rep["b"]["calls"] == 1
    assert rep["a"]["seconds"] >= 0.02
    assert t.total() >= 0.025
    assert t.rtf(audio_seconds=1.0) > 0


def test_stage_timer_records_on_exception():
    t = StageTimer()
    try:
        with t.stage("fails"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert t.report()["fails"]["calls"] == 1


def test_rtf_empty_timer_is_inf():
    assert StageTimer().rtf(10.0) == float("inf")
