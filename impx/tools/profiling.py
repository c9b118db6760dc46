"""Device profiling helpers: jax.profiler traces (the TPU-native replacement
for the reference's wall-clock-only AverageTimer instrumentation)."""
from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/impx_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto:

        with trace("/tmp/impx_trace"):
            run_steps()
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for host-side stages."""
    import jax

    return jax.profiler.TraceAnnotation(name)
