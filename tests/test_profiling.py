"""Profiling subsystem (utils/profiling.py; SURVEY.md §5 — the reference
has no tracing at all, this is the rebuild's)."""

import jax
import jax.numpy as jnp
import numpy as np

from one_to_many_gan_tpu.utils.profiling import StepTimer, trace


def test_trace_writes_profile_artifacts(tmp_path):
    with trace(tmp_path):
        float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((64, 64))))
    # jax.profiler emits a plugins/profile/<ts>/ tree with a .trace.json.gz
    produced = list(tmp_path.rglob("*.trace.json.gz"))
    assert produced, list(tmp_path.rglob("*"))


def test_step_timer_excludes_warmup():
    t = StepTimer(warmup=2)
    for _ in range(6):
        t.tick()
    # 5 intervals, first 2 are warmup
    assert len(t.times) == 3
    assert np.isfinite(t.mean) and np.isfinite(t.p50)
    assert t.p50 == sorted(t.times)[1]


def test_step_timer_empty_is_nan():
    t = StepTimer()
    assert np.isnan(t.mean) and np.isnan(t.p50)
