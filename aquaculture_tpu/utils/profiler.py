"""JAX profiler integration.

The observability layer the reference lacks (SURVEY §5): wrap any pipeline
region in a TensorBoard-compatible device trace, or annotate host spans.

    with trace_region("/tmp/tb"):
        run_pipeline(...)
    # then: tensorboard --logdir /tmp/tb  (trace_viewer shows HLO timing)
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator


@contextmanager
def trace_region(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device+host profile of the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def maybe_trace(logdir: str | None):
    """``trace_region(logdir)`` when logdir is set, else a no-op context.

    The one-liner behind every CLI's ``--profile LOGDIR`` flag."""
    if logdir:
        return trace_region(logdir)
    from contextlib import nullcontext

    return nullcontext()


@contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named host span visible in the trace viewer."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
