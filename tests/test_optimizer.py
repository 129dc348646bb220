"""Optimizer-flag parity + escalation-config semantics.

The reference nominally exposes any torch optimizer via
``getattr(optim, config.optimizer)`` but unconditionally passes
``momentum=`` (FCGF_APR/lib/trainer.py:73-77), so its own ``--optimizer
Adam`` path crashes with TypeError before ever training.  Here Adam is
implemented for real; these tests pin that contract plus the
Optional[int] semantics of test_ransac_escalation_factor (an explicit 0
pinned in config.json must stay 0 — round-4 advisor finding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.config import APRConfig
from apr_tpu.training import get_trainer


def _toy_params():
    return {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}


def _run_steps(trainer, n=3):
    params = _toy_params()
    tx = trainer.tx
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    for _ in range(n):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return params


def test_adam_optimizer_steps():
    cfg = APRConfig(optimizer="Adam", trainer="ContrastiveLossTrainer",
                    model="SimpleNetBN2", lr=0.01, weight_decay=0.0)
    trainer = get_trainer(cfg)
    params = _run_steps(trainer)
    # Adam with constant unit grads moves ~lr per step regardless of scale
    delta = float(jnp.mean(jnp.abs(params["w"] - 1.0)))
    np.testing.assert_allclose(delta, 3 * 0.01, rtol=0.05)


def test_sgd_still_default():
    cfg = APRConfig(trainer="ContrastiveLossTrainer", model="SimpleNetBN2",
                    lr=0.1, weight_decay=0.0, sgd_momentum=0.0,
                    iter_size=1)
    trainer = get_trainer(cfg)
    params = _run_steps(trainer, n=1)
    np.testing.assert_allclose(np.asarray(params["w"]), 1.0 - 0.1, rtol=1e-5)


def test_unknown_optimizer_rejected():
    cfg = APRConfig(optimizer="RMSprop", trainer="ContrastiveLossTrainer",
                    model="SimpleNetBN2")
    with pytest.raises(NotImplementedError):
        get_trainer(cfg)


def test_escalation_factor_pinned_zero_roundtrip(tmp_path):
    # default is None ("unset"); an explicit 0 survives the json round-trip
    # so eval entries can tell "never configured" from "deliberately off"
    assert APRConfig().test_ransac_escalation_factor is None
    cfg = APRConfig(test_ransac_escalation_factor=0)
    p = str(tmp_path / "config.json")
    cfg.save_json(p)
    back = APRConfig.load_json(p)
    assert back.test_ransac_escalation_factor == 0
    cfg2 = APRConfig(test_ransac_escalation_factor=8)
    cfg2.save_json(p)
    assert APRConfig.load_json(p).test_ransac_escalation_factor == 8


def test_escalation_factor_cli_parses_as_int():
    import train as train_mod

    parser = train_mod.build_parser()
    ns = parser.parse_args(["--test_ransac_escalation_factor", "4"])
    assert ns.test_ransac_escalation_factor == 4
    ns2 = parser.parse_args(["--test_ransac_dist_thresh", "0.45"])
    assert ns2.test_ransac_dist_thresh == 0.45


def test_capacity_buckets_pinned_zero_roundtrip(tmp_path):
    # same Optional semantics as the escalation factor: default None
    # ("unset"), explicit 0 survives the json round-trip
    assert APRConfig().test_capacity_buckets is None
    p = str(tmp_path / "config.json")
    APRConfig(test_capacity_buckets=0).save_json(p)
    assert APRConfig.load_json(p).test_capacity_buckets == 0
