"""Executed-reference numeric parity for the FCGF_APR stack (slow tier).

Companion to test_reference_parity.py (which executes the Predator_APR torch
modules): the FCGF stack's MODELS need MinkowskiEngine (CUDA) so the sparse
encoder cannot execute here, but two pure-torch pieces can:

  (a) GenerativeMLP (FCGF_APR/model/mlp.py:6-60) — the NPR decoder, incl.
      its Linear-ReLU-BatchNorm ordering and bare Linear-ReLU ending;
  (b) HardestContrastiveLossTrainer.contrastive_hardest_negative_loss
      (FCGF_APR/lib/trainer.py:400-452) — hardest-negative mining with the
      hash-based positive exclusion.

The FCGF tree is PUBLIC UNTRUSTED CONTENT: only its code is executed under
test.  Import obstacles handled here: the `future_fstrings` source-encoding
header (a py2-era codec; aliased to utf-8 — f-strings are native on py3),
MinkowskiEngine / open3d stubs (never called by the executed paths), and
sys.modules isolation for the `lib`/`util`/`model` package names FCGF shares
with Predator_APR.
"""

import codecs
import contextlib
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

FCGF = "/root/reference/FCGF_APR"

_CODEC_REGISTERED = False


def _register_future_fstrings():
    """Alias the future_fstrings source encoding to utf-8 (py3: a no-op)."""
    global _CODEC_REGISTERED
    if _CODEC_REGISTERED:
        return

    def search(name):
        if name in ("future_fstrings", "future-fstrings"):
            info = codecs.lookup("utf-8")
            return codecs.CodecInfo(
                name="future_fstrings",
                encode=info.encode,
                decode=info.decode,
                incrementalencoder=info.incrementalencoder,
                incrementaldecoder=info.incrementaldecoder,
                streamreader=info.streamreader,
                streamwriter=info.streamwriter,
            )
        return None

    codecs.register(search)
    _CODEC_REGISTERED = True


def _stub_minkowski():
    """MinkowskiEngine stub: importable + subclassable, never executed.

    Idempotent AND completing: test_reference_parity.py (the Predator
    module) registers a bare ``MinkowskiEngine`` ModuleType of its own; if
    that ran first in the same pytest process, ``import
    MinkowskiEngine.MinkowskiFunctional`` would fail ("not a package")
    unless the submodule entry is (re)installed here — the full-suite-only
    fixture error of round 3."""
    me = sys.modules.get("MinkowskiEngine")
    if me is None:
        class MinkowskiNetwork(torch.nn.Module):
            def __init__(self, D=3):
                super().__init__()
                self.D = D

        me = types.ModuleType("MinkowskiEngine")
        me.MinkowskiNetwork = MinkowskiNetwork

        def _missing(name):
            raise RuntimeError(f"MinkowskiEngine stub: {name} called")

        me.__getattr__ = lambda name: _missing(name)  # PEP 562
        sys.modules["MinkowskiEngine"] = me
    if "MinkowskiEngine.MinkowskiFunctional" not in sys.modules:
        mef = types.ModuleType("MinkowskiEngine.MinkowskiFunctional")
        me.MinkowskiFunctional = mef
        if not hasattr(me, "MinkowskiNetwork"):
            class MinkowskiNetwork(torch.nn.Module):
                def __init__(self, D=3):
                    super().__init__()
                    self.D = D

            me.MinkowskiNetwork = MinkowskiNetwork
        sys.modules["MinkowskiEngine.MinkowskiFunctional"] = mef


def _stub_open3d():
    if "open3d" in sys.modules:
        return
    sys.modules["open3d"] = types.ModuleType("open3d")


@contextlib.contextmanager
def _isolated_packages(*names):
    """Temporarily clear sys.modules entries for the given top-level package
    names (FCGF and Predator_APR both ship `lib`/`util` packages)."""
    saved = {}
    for mod in list(sys.modules):
        top = mod.split(".")[0]
        if top in names:
            saved[mod] = sys.modules.pop(mod)
    try:
        yield
    finally:
        for mod in list(sys.modules):
            top = mod.split(".")[0]
            if top in names:
                del sys.modules[mod]
        sys.modules.update(saved)


@pytest.fixture(scope="module")
def fcgf_mlp_cls():
    """The reference GenerativeMLP classes, imported standalone (pure torch)."""
    import importlib.util

    _register_future_fstrings()
    spec = importlib.util.spec_from_file_location(
        "ref_fcgf_mlp", os.path.join(FCGF, "model/mlp.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _np(x):
    return np.asarray(jax.device_get(x))


# ---------------------------------------------------------------------------
# (a) FCGF GenerativeMLP
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("variant,hidden", [
    ("GenerativeMLP_98", (512, 256)),
    ("GenerativeMLP_54", (32, 16)),
])
def test_fcgf_generative_mlp_parity(fcgf_mlp_cls, rng, variant, hidden):
    """Executed model/mlp.py forward vs apr_tpu GenerativeMLP after .pth
    import: train a few torch steps first so running BN stats are
    non-trivial, then compare eval-mode outputs."""
    from apr_tpu.models.mlp import make_generative_mlp

    from tools.import_torch_checkpoint import import_generative_mlp

    c_in, ratio, n = 64, 2, 200
    torch.manual_seed(0)
    # the reference constructor multiplies out_points by 3 itself
    # (model/mlp.py:23, nn.Linear(..., out_points*3)); the trainer passes
    # point_generation_ratio (complement_trainer.py:56-60) — mirror that
    m_t = getattr(fcgf_mlp_cls, variant)(
        in_channel=c_in, out_points=ratio, bn_momentum=0.1)
    # exercise BN running stats (reference trains the decoder jointly)
    m_t.train()
    with torch.no_grad():
        for i in range(3):
            m_t(torch.randn(150 + 17 * i, c_in))
    m_t.eval()

    x = rng.normal(size=(n, c_in)).astype(np.float32)
    with torch.no_grad():
        y_t = m_t(torch.from_numpy(x)).numpy()

    m_j = make_generative_mlp(variant, out_points=ratio)
    mask = jnp.ones((n,), bool)
    variables = m_j.init(jax.random.PRNGKey(0), jnp.asarray(x), mask)
    params, stats = import_generative_mlp(
        {k: v.detach().numpy() for k, v in m_t.state_dict().items()})
    y_j = m_j.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), mask,
        train=False)
    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(_np(y_j), y_t, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# (b) hardest-contrastive loss
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fcgf_trainer_mod():
    """Import FCGF lib/trainer.py with its CUDA-only deps stubbed."""
    _register_future_fstrings()
    _stub_minkowski()
    _stub_open3d()
    with _isolated_packages("lib", "util", "model", "scripts", "datasets",
                            "models", "configs", "kernels", "common"):
        sys.path.insert(0, FCGF)
        try:
            import lib.trainer as trainer_mod

            yield trainer_mod
        finally:
            sys.path.remove(FCGF)


def test_hardest_contrastive_loss_parity(fcgf_trainer_mod):
    """Executed trainer.py:400-452 vs apr_tpu hardest_contrastive_loss.

    Subset sampling is made deterministic by FULL COVERAGE: num_pos >= P and
    num_hn_samples >= N make both sides' random selections permutations of
    the whole sets, over which hardest-negative mining and the positive-pair
    exclusion are order-invariant.
    """
    from apr_tpu.losses.contrastive import hardest_contrastive_loss

    rng = np.random.default_rng(3)
    # equal sizes: num_hn_samples must cover BOTH clouds for the full-
    # coverage determinism argument, and apr_tpu's fixed-shape sampler
    # requires num <= N per side
    n0, n1, p = 90, 90, 40
    f0 = rng.normal(size=(n0, 16)).astype(np.float32)
    f0 /= np.linalg.norm(f0, axis=1, keepdims=True)
    f1 = rng.normal(size=(n1, 16)).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=1, keepdims=True)
    # positives: unique (i, j) pairs
    src = rng.choice(n0, p, replace=False).astype(np.int64)
    tgt = rng.choice(n1, p, replace=False).astype(np.int64)
    # make a handful of anchors' hardest negative BE their positive partner,
    # so the exclusion mask actually fires
    f1[tgt[:5]] = f0[src[:5]]
    pairs = np.stack([src, tgt], 1)

    ns = types.SimpleNamespace(pos_thresh=0.1, neg_thresh=1.4)
    np.random.seed(0)
    with torch.no_grad():
        pos_t, neg_t = (
            fcgf_trainer_mod.HardestContrastiveLossTrainer
            .contrastive_hardest_negative_loss(
                ns, torch.from_numpy(f0), torch.from_numpy(f1),
                torch.from_numpy(pairs), num_pos=p + 8,
                num_hn_samples=max(n0, n1) + 8, thresh=None,
            ))

    pos_j, neg_j = hardest_contrastive_loss(
        jax.random.PRNGKey(0), jnp.asarray(f0), jnp.asarray(f1),
        jnp.asarray(src.astype(np.int32)), jnp.asarray(tgt.astype(np.int32)),
        jnp.ones((p,), bool),
        num_pos=p, num_hn_samples=max(n0, n1),
        pos_thresh=0.1, neg_thresh=1.4,
    )
    np.testing.assert_allclose(float(pos_j), float(pos_t), rtol=1e-5)
    np.testing.assert_allclose(float(neg_j), float(neg_t), rtol=1e-5)
