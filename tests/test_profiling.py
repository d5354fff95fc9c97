"""utils.profiling: phase timers, throughput counter, gated device trace."""

import json
import os
import time

from topo4d_tpu.utils.profiling import PhaseTimer, device_trace, mpix_per_s


def test_phase_timer_accumulates(tmp_path):
    timer = PhaseTimer()
    for _ in range(3):
        with timer.phase("a"):
            time.sleep(0.01)
    timer.add("b", 2.5)
    s = timer.summary()
    assert s["a"]["count"] == 3
    assert s["a"]["seconds"] >= 0.03
    assert abs(s["a"]["mean_seconds"] - s["a"]["seconds"] / 3) < 1e-3
    assert s["b"] == {"seconds": 2.5, "count": 1, "mean_seconds": 2.5}
    path = str(tmp_path / "timings.json")
    timer.write(path)
    assert json.load(open(path)) == s


def test_phase_timer_records_on_exception():
    timer = PhaseTimer()
    try:
        with timer.phase("boom"):
            raise RuntimeError
    except RuntimeError:
        pass
    assert timer.summary()["boom"]["count"] == 1


def test_device_trace_disabled_is_noop(monkeypatch):
    monkeypatch.delenv("TOPO4D_PROFILE_DIR", raising=False)
    with device_trace() as tracing:
        assert tracing is False


def test_device_trace_enabled(tmp_path, monkeypatch):
    import jax.numpy as jnp

    logdir = str(tmp_path / "trace")
    with device_trace(logdir) as tracing:
        if tracing:  # backend may not support tracing; no-op is also valid
            jnp.ones((4, 4)).sum().block_until_ready()
    if tracing:
        assert os.path.isdir(logdir)


def test_mpix_per_s():
    assert mpix_per_s(1000, 1000, 10, 2.0) == 5.0
    assert mpix_per_s(100, 100, 1, 0.0) == 0.0


def test_phase_timer_load_folds_prior(tmp_path):
    """timer.load: a resumed run's profile keeps pre-resume phases."""
    from topo4d_tpu.utils.profiling import PhaseTimer

    t1 = PhaseTimer()
    t1.add("geometry", 2.0)
    t1.add("export", 1.0)
    path = str(tmp_path / "timings.json")
    t1.write(path)

    t2 = PhaseTimer()  # fresh process after a kill
    t2.load(path)
    t2.add("geometry", 3.0)
    s = t2.summary()
    assert s["geometry"]["seconds"] == 5.0
    assert s["geometry"]["count"] == 2
    assert s["export"]["seconds"] == 1.0
    # corrupt file: load is a no-op
    bad = tmp_path / "bad.json"
    bad.write_text("{oops")
    t3 = PhaseTimer()
    t3.load(str(bad))
    assert t3.summary() == {}
