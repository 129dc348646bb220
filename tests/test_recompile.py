"""Compile-count regression guard (round-2 verdict weak-item 2).

Round 1 learned the hard way that silent retraces (weak-typed scalars, fresh
pytree signatures after strongification, per-epoch shape drift) multiply the
~minutes-scale TPU compile cost; the lesson was only encoded as a comment
(trainer.py:57-66).  This test pins it: the FCGF train step must stay ONE
compiled program across consecutive steps AND an epoch boundary (set_lr
writes the new learning rate as a device scalar, not a Python float — a
retrace there would recompile every epoch, reference-equivalent behavior is
a single cached executable).
"""

import jax
import numpy as np
import pytest

import __graft_entry__ as ge
from apr_tpu.training.trainer import FCGFTrainer, get_trainer


@pytest.mark.slow
def test_train_step_single_program_across_epochs():
    cfg = ge._tiny_config(batch_size=1)
    trainer = get_trainer(cfg)
    batch = ge._sample_batch(cfg, seeds=(0,))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    # step once to populate the cache, then snapshot
    state, m = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])
    base = FCGFTrainer.train_step._cache_size()

    # two more steps, an epoch boundary (LR schedule step), one more step:
    # none of these may add a compiled program
    for i in range(2):
        state, m = trainer.train_step(state, batch, jax.random.PRNGKey(2 + i))
    state = trainer.set_lr(state, epoch=1)
    state, m = trainer.train_step(state, batch, jax.random.PRNGKey(9))
    jax.block_until_ready(m["loss"])
    assert np.isfinite(float(m["loss"]))

    grown = FCGFTrainer.train_step._cache_size() - base
    assert grown == 0, (
        f"train_step retraced {grown} time(s) across steps/epoch boundary — "
        "check for weak-typed scalars or pytree-signature drift in "
        "TrainState/PairBatch"
    )
