"""Sampling op tests: reference guard semantics + top-p filtering."""

import numpy as np
import jax
import jax.numpy as jnp

from vlm_bridge_tpu.ops.sampling import sample_token, sanitize_logits


def test_sanitize_finite_rows_untouched():
    x = jnp.asarray([[150.0, -200.0, 3.0]])  # finite but extreme
    out = np.asarray(sanitize_logits(x))
    np.testing.assert_array_equal(out, np.asarray(x))  # NOT clipped


def test_sanitize_nan_row_zeroed():
    x = jnp.asarray([[1.0, jnp.nan, 3.0], [1.0, 2.0, 3.0]])
    out = np.asarray(sanitize_logits(x))
    np.testing.assert_array_equal(out[0], [0.0, 0.0, 0.0])
    np.testing.assert_array_equal(out[1], [1.0, 2.0, 3.0])  # other row intact


def test_sanitize_inf_row_clamped():
    x = jnp.asarray([[jnp.inf, 150.0, -200.0], [1.0, 2.0, 3.0]])
    out = np.asarray(sanitize_logits(x))
    np.testing.assert_array_equal(out[0], [100.0, 100.0, -100.0])
    np.testing.assert_array_equal(out[1], [1.0, 2.0, 3.0])


def test_sanitize_nan_beats_inf():
    # reference zeroes the tensor on NaN FIRST; the zeroed row has no Inf
    x = jnp.asarray([[jnp.nan, jnp.inf, 5.0]])
    out = np.asarray(sanitize_logits(x))
    np.testing.assert_array_equal(out[0], [0.0, 0.0, 0.0])


def test_greedy_is_argmax():
    logits = jnp.asarray([[0.1, 5.0, -1.0], [2.0, 0.0, 9.0]])
    toks = np.asarray(sample_token(jax.random.key(0), logits, greedy=True))
    np.testing.assert_array_equal(toks, [1, 2])


def test_topp_keeps_top1_always():
    # distribution where top-1 exceeds top_p by itself: must still sample it
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    for seed in range(5):
        tok = int(np.asarray(sample_token(
            jax.random.key(seed), logits, temperature=1.0, top_p=0.5,
            topk_window=4))[0])
        assert tok == 0


def test_topp_excludes_tail():
    # two dominant tokens cover > 0.9; the tail must never be sampled
    logits = jnp.asarray([[8.0, 8.0, -20.0, -20.0]])
    seen = {int(np.asarray(sample_token(
        jax.random.key(s), logits, temperature=1.0, top_p=0.9,
        topk_window=4))[0]) for s in range(20)}
    assert seen <= {0, 1}
    assert len(seen) == 2  # both heads appear across seeds


def test_tail_mass_zero_for_peaked_distribution():
    from vlm_bridge_tpu.ops.sampling import topp_window_tail_mass

    logits = jnp.zeros((2, 1000)).at[:, 0].set(50.0)
    tail = np.asarray(topp_window_tail_mass(
        logits, temperature=1.0, top_p=0.9, topk_window=128))
    np.testing.assert_allclose(tail, 0.0, atol=1e-6)


def test_tail_mass_flags_flat_distribution():
    from vlm_bridge_tpu.ops.sampling import topp_window_tail_mass

    # uniform over 1000 tokens: a 128-token window reaches 0.128 of the
    # mass; p=0.9 nucleus is clipped by 0.9 - 0.128 = 0.772
    logits = jnp.zeros((1, 1000))
    tail = float(np.asarray(topp_window_tail_mass(
        logits, temperature=1.0, top_p=0.9, topk_window=128))[0])
    np.testing.assert_allclose(tail, 0.9 - 128 / 1000, atol=1e-4)


def test_tail_mass_respects_temperature():
    from vlm_bridge_tpu.ops.sampling import topp_window_tail_mass

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 1, (1, 4096)), jnp.float32)
    hot = float(np.asarray(topp_window_tail_mass(
        logits, temperature=5.0, top_p=0.9, topk_window=128))[0])
    cold = float(np.asarray(topp_window_tail_mass(
        logits, temperature=0.2, top_p=0.9, topk_window=128))[0])
    assert hot > cold  # flatter distribution -> more clipped nucleus
    assert cold == 0.0
