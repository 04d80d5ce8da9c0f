"""Engine-core tests: streaming/sequence equivalence, delay contract,
masked reset, determinism — for every model kind."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from koala_tpu.constants import DELAY_SAMPLE, FRAME_LENGTH
from koala_tpu.engine.batch import masked_reset
from koala_tpu.engine.core import make_engine
from koala_tpu.models import identity, mask_gru, mmse

MODEL_SETUPS = {
    "identity": (identity, identity.DEFAULT_CONFIG),
    "mmse": (mmse, mmse.DEFAULT_CONFIG),
    "mask_gru": (mask_gru, mask_gru.DEFAULT_CONFIG),
}


def _params(kind):
    mod, _ = MODEL_SETUPS[kind]
    return mod.init_params(jax.random.PRNGKey(0))


@pytest.mark.parametrize("kind", list(MODEL_SETUPS))
def test_step_fold_equals_sequence(kind, rng):
    """sequence() must match folding step() over hops.

    Tolerance note: the two paths compile to different XLA programs (the
    sequence path hoists matmuls and fuses differently, e.g. fma), so
    cross-path equality is allclose at ~1 ulp scale, not bitwise. Bitwise
    determinism is guaranteed (and tested) per execution path."""
    t, b = 6, 3
    engine = make_engine(kind, MODEL_SETUPS[kind][1])
    params = _params(kind)
    hops = jnp.asarray(rng.standard_normal((b, t, FRAME_LENGTH)).astype(np.float32) * 0.1)

    state = engine.init_state((b,))
    outs = []
    for i in range(t):
        state, out = engine.step(params, state, hops[:, i])
        outs.append(out)
    folded = np.stack([np.asarray(o) for o in outs], axis=1)

    state2 = engine.init_state((b,))
    state2, seq_out = engine.sequence(params, state2, hops)

    np.testing.assert_allclose(folded, np.asarray(seq_out), atol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(state2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=3e-5)


def test_identity_engine_is_pure_delay(rng):
    """With a unit mask the engine is an exact one-hop delay line."""
    t = 10
    engine = make_engine("identity", identity.DEFAULT_CONFIG)
    params = _params("identity")
    x = rng.standard_normal((t * FRAME_LENGTH,)).astype(np.float32) * 0.5
    hops = jnp.asarray(x.reshape(t, FRAME_LENGTH))
    state = engine.init_state(())
    _, out = engine.sequence(params, state, hops)
    y = np.asarray(out).reshape(-1)
    np.testing.assert_allclose(y[DELAY_SAMPLE:], x[:-DELAY_SAMPLE], atol=1e-4)
    np.testing.assert_allclose(y[:DELAY_SAMPLE], 0.0, atol=1e-4)


@pytest.mark.parametrize("kind", list(MODEL_SETUPS))
def test_sequence_chunking_equivalence(kind, rng):
    """Processing [T] hops in one call == two chunked calls with carried state
    (the long-form streaming contract, BASELINE.json config 4)."""
    engine = make_engine(kind, MODEL_SETUPS[kind][1])
    params = _params(kind)
    t1, t2, b = 5, 7, 2
    hops = jnp.asarray(rng.standard_normal((b, t1 + t2, FRAME_LENGTH)).astype(np.float32) * 0.1)

    state = engine.init_state((b,))
    _, full = engine.sequence(params, state, hops)

    state2 = engine.init_state((b,))
    state2, out1 = engine.sequence(params, state2, hops[:, :t1])
    _, out2 = engine.sequence(params, state2, hops[:, t1:])
    chunked = jnp.concatenate([out1, out2], axis=1)

    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


@pytest.mark.parametrize("kind", list(MODEL_SETUPS))
def test_masked_reset_matches_fresh_stream(kind, rng):
    """Resetting stream 0 of a pool == that stream being newly created."""
    engine = make_engine(kind, MODEL_SETUPS[kind][1])
    params = _params(kind)
    b, t = 4, 5
    hops_a = jnp.asarray(rng.standard_normal((b, t, FRAME_LENGTH)).astype(np.float32) * 0.1)
    hops_b = jnp.asarray(rng.standard_normal((b, t, FRAME_LENGTH)).astype(np.float32) * 0.1)

    state = engine.init_state((b,))
    state, _ = engine.sequence(params, state, hops_a)
    mask = jnp.asarray([True, False, False, False])
    state = masked_reset(state, engine.init_state((b,)), mask)
    _, out = engine.sequence(params, state, hops_b)

    # stream 0 after reset == the same stream in a freshly created pool
    # (same batch shape -> same XLA program -> bitwise equality)
    fresh = engine.init_state((b,))
    _, fresh_out = engine.sequence(params, fresh, hops_b)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(fresh_out[0]))

    # stream 1 kept its state: equals an unreset continuation
    state_c = engine.init_state((b,))
    state_c, _ = engine.sequence(params, state_c, hops_a)
    _, cont = engine.sequence(params, state_c, hops_b)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(cont[1]))


@pytest.mark.parametrize("kind", list(MODEL_SETUPS))
def test_rerun_determinism(kind, rng):
    """Two identical runs produce bit-identical output."""
    engine = make_engine(kind, MODEL_SETUPS[kind][1])
    params = _params(kind)
    hops = jnp.asarray(rng.standard_normal((2, 8, FRAME_LENGTH)).astype(np.float32) * 0.1)
    _, out1 = engine.sequence_jit(params, engine.init_state((2,)), hops)
    out1 = np.asarray(out1)
    _, out2 = engine.sequence_jit(params, engine.init_state((2,)), hops)
    np.testing.assert_array_equal(out1, np.asarray(out2))


def test_mask_gru_param_count():
    """Model sized to the reference's ~2M-param budget (SURVEY.md §2 #2:
    4,007,743-byte file at ~2 bytes/param)."""
    params = mask_gru.init_params(jax.random.PRNGKey(0))
    n = mask_gru.num_params(params)
    assert 1_500_000 < n < 2_500_000, n
