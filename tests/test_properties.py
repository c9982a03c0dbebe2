"""Property-based tests (hypothesis) for the stateful pytree components.

The replay buffer and the ADA controller re-express the reference's
host-side Python state machines (src/core/training.py:22-65,
src/model/loss.py:11-52) as pure jitted pytree updates; these tests drive
them against literal Python oracles over hypothesis-generated schedules,
complementing the example-based tests in test_buffer.py / test_ada.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from one_to_many_gan_tpu.augment.controller import init_ada_state, make_ada_update
from one_to_many_gan_tpu.core.buffer import buffer_apply, init_buffer


class PythonAdaOracle:
    """Literal transcription of the reference ADAp flow (loss.py:11-52):
    append score; when the list has n_batches+1 entries, compare its mean
    to the target, step p, reset the list to [score]."""

    def __init__(self, ada_e, adjustment_size, batch_size, target):
        self.n_batches = ada_e // batch_size
        self.adjustment = adjustment_size * ada_e
        self.target = target
        self.p = 0.0
        self.scores = []

    def update(self, score):
        self.scores.append(score)
        if len(self.scores) == self.n_batches + 1:
            m = sum(self.scores) / len(self.scores)
            if m > self.target:
                self.p = max(0.0, self.p + self.adjustment)
            elif m < self.target:
                self.p = max(0.0, self.p - self.adjustment)
            self.scores = [score]


@settings(max_examples=30, deadline=None)
@given(
    ada_e=st.integers(min_value=2, max_value=24),
    batch=st.integers(min_value=1, max_value=8),
    adj=st.floats(min_value=1e-4, max_value=0.1),
    target=st.floats(min_value=-0.5, max_value=0.9),
    scores=st.lists(
        st.floats(min_value=-1.0, max_value=1.0), min_size=1, max_size=60
    ),
)
def test_ada_controller_matches_python_oracle(ada_e, batch, adj, target, scores):
    if ada_e // batch < 1:
        ada_e = batch  # keep n_batches >= 1 (reference precondition)
    update = jax.jit(make_ada_update(ada_e, adj, batch, target))
    state = init_ada_state()
    oracle = PythonAdaOracle(ada_e, adj, batch, target)
    for s in scores:
        state = update(state, jnp.float32(s))
        oracle.update(np.float32(s))  # match f32 rounding of the input
        np.testing.assert_allclose(
            float(state.p), oracle.p, rtol=1e-5, atol=1e-7
        )


@settings(max_examples=20, deadline=None)
@given(
    size=st.integers(min_value=1, max_value=6),
    batches=st.lists(
        st.integers(min_value=1, max_value=5), min_size=1, max_size=6
    ),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_buffer_invariants(size, batches, seed):
    """Sequential-fill/swap invariants, for any size/batch schedule:

    - count rises by min(batch, remaining capacity) until full, then stays;
    - before the buffer is full every image passes through unchanged;
    - after any call, each output image is either the pushed image at that
      position or SOME image pushed earlier (set membership — the
      reference returns clones of stored tensors);
    - the updated buffer contents are always a subset of everything pushed.
    """
    key = jax.random.key(seed)
    state = init_buffer(size, (2, 2, 1))
    pushed = []  # every image ever pushed, as bytes
    step = 0
    for b in batches:
        step += 1
        key, k_img, k_apply = jax.random.split(key, 3)
        fakes = jax.random.normal(k_img, (b, 2, 2, 1))
        prev_count = int(state.count)
        out, state = jax.jit(buffer_apply)(state, fakes, k_apply)
        fakes_np = np.asarray(fakes)
        pushed.extend(f.tobytes() for f in fakes_np)
        # count invariant
        assert int(state.count) == min(prev_count + b, size)
        out_np = np.asarray(out)
        for i in range(b):
            if prev_count + i < size:
                # buffer not yet full at this position: pass-through
                np.testing.assert_array_equal(out_np[i], fakes_np[i])
            else:
                assert out_np[i].tobytes() in pushed
        # buffer contents are pushed images (filled slots only)
        buf_np = np.asarray(state.images)
        for s in range(int(state.count)):
            assert buf_np[s].tobytes() in pushed


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_buffer_swap_conservation(seed):
    """When full, each (output, new buffer slot) pair conserves images: a
    swap returns the old occupant and stores the new image; a pass-through
    leaves the slot alone. Checked via multiset conservation per call."""
    key = jax.random.key(seed)
    size = 4
    state = init_buffer(size, (1, 1, 1))
    key, k0, ka = jax.random.split(key, 3)
    first = jax.random.normal(k0, (size, 1, 1, 1))
    _, state = jax.jit(buffer_apply)(state, first, ka)  # fill exactly
    key, k1, kb = jax.random.split(key, 3)
    fakes = jax.random.normal(k1, (3, 1, 1, 1))
    out, new_state = jax.jit(buffer_apply)(state, fakes, kb)
    # multiset{out + new buffer} == multiset{fakes + old buffer}: the call
    # only routes images, never invents or drops one. (Sequential swaps can
    # chain — an image stored this call may be swapped out later in the
    # same batch — so only the aggregate multiset is stable.)
    before = sorted(
        x.tobytes() for x in [*np.asarray(fakes), *np.asarray(state.images)]
    )
    after = sorted(
        x.tobytes() for x in [*np.asarray(out), *np.asarray(new_state.images)]
    )
    assert before == after
