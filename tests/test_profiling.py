"""Profiling utilities (utils/profiling.py; SURVEY.md §5.1)."""

import time

from multimodalspectraltransformer_tpu.utils import profiling


def test_phase_timer_accumulates_and_reports():
    t = profiling.PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2 and t.totals["a"] >= 0.02
    rep = t.report()
    assert "a" in rep and "b" in rep and "mean_ms" in rep
    d = t.as_dict()
    assert d["a"]["calls"] == 2


def test_device_trace_writes_artifacts(tmp_path):
    import jax
    import jax.numpy as jnp

    with profiling.device_trace(str(tmp_path)):
        with profiling.annotate("matmul"):
            x = jnp.ones((64, 64))
            (x @ x).block_until_ready()
    # a plugins/profile/<date> directory appears
    found = list(tmp_path.rglob("*.xplane.pb"))
    assert found, list(tmp_path.rglob("*"))
