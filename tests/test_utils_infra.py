"""Observability infra: StageTimer, profiler annotations, logger.

These are the tracing/metrics subsystems SURVEY §5 calls out as absent in
the reference (tqdm-only); small but load-bearing for the serving pipeline's
tiles/sec reporting (data/pipeline PipelineStats feeds on StageTimer rates).
"""

import logging
import time

from aquaculture_tpu.utils.logging import get_logger, log_info, log_warning
from aquaculture_tpu.utils.profiler import annotate
from aquaculture_tpu.utils.timer import StageTimer


def test_stage_timer_accumulates_and_rates():
    t = StageTimer()
    with t.stage("decode", items=10):
        time.sleep(0.01)
    with t.stage("decode", items=30):
        time.sleep(0.01)
    with t.stage("infer"):
        pass
    assert t.items["decode"] == 40
    assert t.seconds["decode"] >= 0.02
    assert t.rate("decode") == t.items["decode"] / t.seconds["decode"]
    assert t.rate("missing") == 0.0
    rep = t.report()
    assert "decode" in rep and "/s" in rep and "infer" in rep


def test_stage_timer_survives_exceptions():
    t = StageTimer()
    try:
        with t.stage("fail", items=1):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert t.items["fail"] == 1 and t.seconds["fail"] > 0


def test_annotate_traces_without_profiler_session():
    # jax.profiler.TraceAnnotation is a no-op outside an active trace; the
    # context must still nest and propagate results
    with annotate("outer"):
        with annotate("inner"):
            x = 1 + 1
    assert x == 2


def test_logger_singleton_and_prefixes():
    lg = get_logger()
    assert get_logger() is lg
    # the package logger is non-propagating (it owns its stderr handler), so
    # capture with our own handler rather than caplog's root hook
    records = []

    class _Cap(logging.Handler):
        def emit(self, record):
            records.append(record)

    cap = _Cap()
    lg.addHandler(cap)
    try:
        log_info("hello %d", 7)
        log_warning("careful %s", "now")
    finally:
        lg.removeHandler(cap)
    messages = [r.getMessage() for r in records]
    assert "hello 7" in messages and "careful now" in messages
    assert {r.levelname for r in records} == {"INFO", "WARNING"}
