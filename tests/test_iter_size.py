"""Gradient accumulation (iter_size -> optax.MultiSteps) parity test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.training import get_trainer


@pytest.mark.slow
@pytest.mark.veryslow
def test_iter_size_accumulates(rng):
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_trainer import CFG, _make_batch

    cfg = CFG.replace(iter_size=2)
    trainer = get_trainer(cfg)
    batch = _make_batch(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    p0 = state.params
    # first micro-step: gradients accumulate, params unchanged
    state, m1 = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    diff1 = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: a - b, p0, state.params), 0.0,
    )
    assert diff1 == 0.0, "params must not move before iter_size micro-steps"
    # second micro-step: the update applies
    state, m2 = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    diff2 = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: a - b, p0, state.params), 0.0,
    )
    assert diff2 > 0.0
    # lr schedule also reaches the MultiSteps inner state
    s2 = trainer.set_lr(state, 5)
    assert np.isclose(float(s2.lr), cfg.lr * cfg.exp_gamma ** 5)
    state3, m3 = trainer.train_step(s2, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m3["loss"]))
