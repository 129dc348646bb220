"""FCGF-path trainers: contrastive / triplet / generative-pair (APR).

Capability parity with FCGF_APR/lib/trainer.py (AlignmentTrainer +
Contrastive/HardestContrastive/Triplet/HardestTriplet trainers) and
FCGF_APR/lib/complement_trainer.py (TwoStageTrainer/GenerativePairTrainer),
re-architected TPU-first:

- the whole optimization step (two encoder forwards, mining, generative
  branch, backward, SGD update) is ONE jit program; no host round-trips;
- batch data parallelism: the batch dim shards across a 1-D device mesh,
  parameters replicate, gradient all-reduce rides ICI (the reference is
  single-GPU, SURVEY.md §2.4);
- hardest-negative candidate subsets are drawn from the *whole batch's*
  concatenated clouds, matching the reference's batched sparse tensor
  (trainer.py:412-415);
- the NPR generative branch sums (chamfer + reg) * loss_ratio over every
  cloud of the batch, exactly like complement_trainer.py:422-483;
- gradient accumulation (iter_size) becomes optax.MultiSteps;
- the NaN-guard of the reference (validate_gradient, lib/utils.py:100)
  becomes a jnp.isfinite gate on the loss that zeroes the update.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from apr_tpu.config import APRConfig
from apr_tpu.geometry.robust import est_rigid_robust
from apr_tpu.losses.contrastive import (
    contrastive_loss_random_negatives,
    hardest_contrastive_loss,
    triplet_loss,
)
from apr_tpu.losses.generative import npr_reconstruction
from apr_tpu.models import load_model, make_generative_mlp
from apr_tpu.registration.matching import feature_nn_correspondences
from apr_tpu.registration.metrics import hit_ratio, registration_errors
from apr_tpu.training.batching import PairBatch

log = logging.getLogger(__name__)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    lr: jnp.ndarray


def strongify(tree):
    """Clear weak types on every array leaf.

    Weak-typed scalars (e.g. ``jnp.asarray(-5.0)``) become strong-typed after
    one jitted update, changing the pytree signature and forcing a full
    train_step recompile on the SECOND step — minutes on TPU.
    """
    return jax.tree.map(
        lambda x: x.astype(x.dtype) if hasattr(x, "astype") else x, tree
    )


def _flatten_pairs(pos_src, pos_tgt, pos_mask, n):
    """Offset per-pair voxel indices into the concatenated [B*N] feature rows."""
    b = pos_src.shape[0]
    offs = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    return (
        (pos_src + offs).reshape(-1),
        (pos_tgt + offs).reshape(-1),
        pos_mask.reshape(-1),
    )


class FCGFTrainer:
    """One trainer class, loss selected by name (reference get_trainer)."""

    LOSS_MODES = (
        "ContrastiveLossTrainer",
        "HardestContrastiveLossTrainer",
        "TripletLossTrainer",
        "HardestTripletLossTrainer",
        "GenerativePairTrainer",
    )

    def __init__(self, config: APRConfig):
        assert config.trainer in self.LOSS_MODES, config.trainer
        self.config = config
        cd = (None if config.compute_dtype in (None, "float32")
              else config.compute_dtype)
        enc_kwargs = dict(
            in_channels=1,
            # batching.py feeds masked ones as input features (the FCGF
            # convention) -> conv1 runs as a validity matmul, no gather
            ones_input=True,
            out_channels=config.model_n_out,
            normalize_feature=config.normalize_feature,
            conv1_kernel_size=config.conv1_kernel_size,
            bn_momentum=config.bn_momentum,
            compute_dtype=cd,
        )
        # registry dispatch (FCGF_APR/model/__init__.py:18): ResUNet and
        # SimpleNet families are both legal encoder names
        encoder_factory = load_model(config.model)
        self.encoder = encoder_factory(**enc_kwargs)
        # identical module (same param/stat tree), but BN treats the leading
        # axis as 2 interleaved stat groups — the train-mode pair fold
        self.encoder_folded = encoder_factory(stats_groups=2, **enc_kwargs)
        self.generative = config.trainer == "GenerativePairTrainer"
        self.symmetric = bool(config.symmetric) and self.generative
        if self.symmetric:
            # symmetric NPR mode (complement_trainer.py:52-60, 413-419): the
            # decoder is a SECOND ResUNet over the same voxel pyramid whose
            # final head emits point_generation_ratio*3 offset channels
            self.generator = load_model(config.generator_model)(
                in_channels=config.model_n_out,
                out_channels=config.point_generation_ratio * 3,
                normalize_feature=False,
                conv1_kernel_size=config.conv1_kernel_size,
                bn_momentum=config.bn_momentum,
                compute_dtype=cd,
            )
        elif self.generative:
            self.generator = make_generative_mlp(
                config.generator_model,
                out_points=config.point_generation_ratio,
                bn_momentum=config.bn_momentum,
            )
        else:
            self.generator = None
        self.tx = self._make_optimizer()

    # --- optimizer / schedule -------------------------------------------

    def _make_optimizer(self):
        c = self.config
        # The reference nominally exposes any torch optimizer via
        # getattr(optim, config.optimizer) but always passes momentum=
        # (FCGF_APR/lib/trainer.py:73-77), so its own --optimizer Adam
        # crashes with TypeError.  Here Adam actually works: decoupled
        # weight decay matches torch SGD's coupled form only at momentum=0,
        # but the reference never reaches its Adam path at all, so the
        # contract is "what the flag was meant to do".
        if c.optimizer not in ("SGD", "Adam"):
            raise NotImplementedError(c.optimizer)

        def sgd(learning_rate):
            inner = (
                optax.adam(learning_rate)
                if c.optimizer == "Adam"
                else optax.sgd(learning_rate, momentum=c.sgd_momentum)
            )
            return optax.chain(
                optax.add_decayed_weights(c.weight_decay),
                inner,
            )

        tx = optax.inject_hyperparams(sgd)(learning_rate=c.lr)
        if c.iter_size > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=c.iter_size)
        return tx

    def epoch_lr(self, epoch: int) -> float:
        """ExponentialLR parity: lr * gamma^epoch (stepped per epoch)."""
        return self.config.lr * (self.config.exp_gamma ** epoch)

    def set_lr(self, state: TrainState, epoch: int) -> TrainState:
        lr = jnp.asarray(self.epoch_lr(epoch), jnp.float32)

        def set_in(opt_state):
            if isinstance(opt_state, optax.MultiStepsState):
                return opt_state._replace(
                    inner_opt_state=set_in(opt_state.inner_opt_state)
                )
            hp = dict(opt_state.hyperparams)
            hp["learning_rate"] = lr
            return opt_state._replace(hyperparams=hp)

        return state._replace(opt_state=set_in(state.opt_state), lr=lr)

    # --- init -----------------------------------------------------------

    def init_state(self, key: jax.Array, sample_batch: PairBatch) -> TrainState:
        k_enc, k_gen = jax.random.split(key)
        # jit the init: eager flax init dispatches hundreds of individual ops,
        # each paying its own compile on TPU (minutes); one traced program
        # compiles once.
        enc_vars = jax.jit(
            lambda k, f, p: self.encoder.init(k, f, p, train=False)
        )(k_enc, sample_batch.feats0, sample_batch.pyramid0)
        params = {"encoder": enc_vars["params"]}
        batch_stats = {"encoder": enc_vars.get("batch_stats", {})}
        if self.symmetric:
            b, c0 = sample_batch.feats0.shape[:2]
            f_dummy = jnp.zeros((b, c0, self.config.model_n_out), jnp.float32)
            gen_vars = jax.jit(
                lambda k, f, p: self.generator.init(k, f, p, train=False)
            )(k_gen, f_dummy, sample_batch.pyramid0)
            params["generator"] = gen_vars["params"]
            batch_stats["generator"] = gen_vars.get("batch_stats", {})
        elif self.generative:
            f_dummy = jnp.zeros(
                (1, 8, self.config.model_n_out), jnp.float32
            )
            gen_vars = jax.jit(
                lambda k, f, m: self.generator.init(k, f, m, train=False)
            )(k_gen, f_dummy, jnp.ones((1, 8), bool))
            params["generator"] = gen_vars["params"]
            batch_stats["generator"] = gen_vars.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return strongify(TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            lr=jnp.asarray(self.config.lr, jnp.float32),
        ))

    # --- forward helpers ------------------------------------------------

    def _encode(self, params, batch_stats, feats, pyramid, train,
                module=None):
        module = module or self.encoder
        variables = {"params": params["encoder"],
                     "batch_stats": batch_stats["encoder"]}
        if train:
            out, upd = module.apply(
                variables, feats, pyramid, train=True, mutable=["batch_stats"]
            )
            return out, upd["batch_stats"]
        return module.apply(variables, feats, pyramid, train=False), \
            batch_stats["encoder"]

    def _encode_pair(self, params, batch_stats, batch, train, fold=True):
        """Encode both clouds of a PairBatch; returns (f0, f1, encoder stats).

        Both modes fold the two forwards into ONE 2B-batch program — the
        encoder is op-overhead bound, so one twice-wide program halves its
        dispatch cost (docs/PERF.md).  Eval is trivially exact
        (running-stats BN has no cross-element coupling); train stays
        bit-faithful to the reference's sequential
        model(sinput0); model(sinput1) (FCGF_APR/lib/complement_trainer.py)
        via stats_groups=2 BatchNorm: per-side batch moments and in-order
        momentum updates.  ``fold=False`` keeps the literal two-forward
        path (used by the parity test).
        """
        if not fold:
            f0, stats1 = self._encode(params, batch_stats, batch.feats0,
                                      batch.pyramid0, train)
            f1, stats2 = self._encode(
                params, dict(batch_stats, encoder=stats1), batch.feats1,
                batch.pyramid1, train)
            return f0, f1, stats2
        # interleave (not concat) so pair i's two sides are adjacent: under
        # a batch-sharded mesh each device keeps BOTH sides of its own
        # pairs — the fold adds no cross-device movement.  Interleaving is
        # also what makes BN's reshape-(bw, 2) grouping see side0/side1 as
        # groups 0/1.
        b = batch.feats0.shape[0]

        def weave(a, c):
            return jnp.stack([a, c], 1).reshape((2 * b,) + a.shape[1:])

        feats = weave(batch.feats0, batch.feats1)
        pyr = jax.tree.map(weave, batch.pyramid0, batch.pyramid1)
        f, stats = self._encode(params, batch_stats, feats, pyr, train,
                                module=self.encoder_folded if train else None)
        f = f.reshape((b, 2) + f.shape[1:])
        return f[:, 0], f[:, 1], stats

    def _contrastive(self, key, f0_flat, f1_flat, src, tgt, pmask, m0, m1):
        c = self.config
        num_pos = c.num_pos_per_batch * c.batch_size
        num_hn = c.num_hn_samples_per_batch * c.batch_size
        name = c.trainer
        if name in ("HardestContrastiveLossTrainer", "GenerativePairTrainer"):
            return hardest_contrastive_loss(
                key, f0_flat, f1_flat, src, tgt, pmask, m0, m1,
                num_pos=num_pos, num_hn_samples=num_hn,
                pos_thresh=c.pos_thresh, neg_thresh=c.neg_thresh,
            )
        if name == "ContrastiveLossTrainer":
            return contrastive_loss_random_negatives(
                key, f0_flat, f1_flat, src, tgt, pmask, m1,
                num_pos=num_pos, num_neg=num_pos,
                pos_thresh=c.pos_thresh, neg_thresh=c.neg_thresh,
            )
        hardest = name == "HardestTripletLossTrainer"
        l = triplet_loss(
            key, f0_flat, f1_flat, src, tgt, pmask, m1,
            num_pos=num_pos, num_hn_samples=num_hn, hardest=hardest,
        )
        return l, jnp.zeros(())

    def _generative_branch(self, params, gen_stats, feats, pyramid, apc,
                           apc_mask, train):
        """Sum over batch clouds of (chamfer + reg*strength) * loss_ratio.

        ``gen_stats`` is the generator's batch_stats subtree; returns the
        updated subtree.
        """
        c = self.config
        mask = pyramid.levels[0].mask  # [B, C0]
        variables = {"params": params["generator"], "batch_stats": gen_stats}
        # symmetric mode: the decoder is a ResUNet over (feats, pyramid);
        # asymmetric: a per-point MLP over (feats, mask).  Both emit
        # [B, C0, ratio*3] raw offsets.
        gen_in = (feats, pyramid) if self.symmetric else (feats, mask)
        if train:
            mlp_out, upd = self.generator.apply(
                variables, *gen_in, train=True, mutable=["batch_stats"]
            )
            new_stats = upd["batch_stats"]
        else:
            mlp_out = self.generator.apply(variables, *gen_in, train=False)
            new_stats = gen_stats

        anchors = pyramid.levels[0].coords.astype(jnp.float32) * c.voxel_size

        def one(mo, anc, m, apc_b, apc_m):
            return npr_reconstruction(
                mo, anc, apc_b, m, apc_m,
                voxel_size=c.voxel_size,
                reg_type=c.regularization_type,
                reg_strength=c.regularization_strength,
                alpha=c.alpha,
                chamfer_mode=c.chamfer_mode,
                chamfer_cell_size=c.chamfer_cell_multiplier * c.voxel_size,
            )

        totals, cds, regs, clamps = jax.vmap(one)(mlp_out, anchors, mask,
                                                  apc, apc_mask)
        total, cd, reg = jnp.sum(totals), jnp.sum(cds), jnp.sum(regs)
        return total * c.loss_ratio, cd, reg, jnp.mean(clamps), new_stats

    # --- the train step -------------------------------------------------

    def loss_fn(self, params, batch_stats, batch: PairBatch, key: jax.Array,
                train: bool = True, return_feats: bool = False):
        c = self.config
        k_mine, _ = jax.random.split(key)
        f0, f1, enc_stats = self._encode_pair(params, batch_stats, batch,
                                              train)
        new_stats = dict(batch_stats, encoder=enc_stats)

        b, n, ch = f0.shape
        f0_flat = f0.reshape(b * n, ch)
        f1_flat = f1.reshape(b * n, ch)
        m0 = batch.pyramid0.levels[0].mask.reshape(-1)
        m1 = batch.pyramid1.levels[0].mask.reshape(-1)
        src, tgt, pmask = _flatten_pairs(batch.pos_src, batch.pos_tgt,
                                         batch.pos_mask, n)
        pos_loss, neg_loss = self._contrastive(
            k_mine, f0_flat, f1_flat, src, tgt, pmask, m0, m1
        )
        loss = pos_loss + c.neg_weight * neg_loss
        metrics = {"pos_loss": pos_loss, "neg_loss": neg_loss}

        if self.generative:
            gen0, cd0, reg0, clamp0, gen_stats = self._generative_branch(
                params, new_stats["generator"], f0, batch.pyramid0,
                batch.apc0, batch.apc0_mask, train)
            gen1, cd1, reg1, clamp1, gen_stats = self._generative_branch(
                params, gen_stats, f1, batch.pyramid1,
                batch.apc1, batch.apc1_mask, train)
            new_stats = dict(new_stats, generator=gen_stats)
            loss = loss + gen0 + gen1
            metrics.update(
                chamfer_loss=cd0 + cd1, regularization_loss=reg0 + reg1,
                chamfer_clamp_frac=0.5 * (clamp0 + clamp1),
            )
        metrics["loss"] = loss
        if return_feats:
            return loss, (new_stats, metrics, (f0, f1))
        return loss, (new_stats, metrics)

    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: TrainState, batch: PairBatch, key: jax.Array):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, key, True)

        # NaN gate (validate_gradient parity): skip the update ENTIRELY.
        # Zeroing grads alone is not enough — weight decay still emits
        # wd * params and the momentum trace replays, so params/opt_state
        # are select()ed back to their old values on non-finite steps
        # (this also keeps MultiSteps' mini-step counter from advancing
        # with a diluted zero-gradient contribution).
        finite = jnp.isfinite(loss)
        leaves = jax.tree_util.tree_leaves(grads)
        finite = jnp.logical_and(
            finite,
            jnp.all(jnp.stack([jnp.all(jnp.isfinite(g)) for g in leaves])),
        )
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            params, state.params,
        )
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old) if hasattr(
                new, "dtype") else new,
            opt_state, state.opt_state,
        )
        new_stats = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_stats, state.batch_stats,
        )
        metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        return (
            state._replace(
                params=params,
                batch_stats=new_stats,
                opt_state=opt_state,
                step=state.step + 1,
            ),
            metrics,
        )

    def build_batch(self, raw: Tuple[jnp.ndarray, ...]) -> PairBatch:
        """Device-side batch build from collate_raw's nine arrays (the
        standalone flavor of the build fused into train_step_fused)."""
        from apr_tpu.training.batching import make_pair_batch

        c = self.config
        return make_pair_batch(
            *raw,
            voxel_size=c.voxel_size,
            capacities=tuple(c.capacities),
            conv1_kernel_size=c.conv1_kernel_size,
            corr_cap=c.corr_capacity_per_point,
            search_multiplier=c.positive_pair_search_voxel_size_multiplier,
        )

    @partial(jax.jit, static_argnames=("self",))
    def train_step_fused(self, state: TrainState, batch: PairBatch,
                         raw_next: Tuple[jnp.ndarray, ...], key: jax.Array):
        """train_step on ``batch`` + device-side build of the NEXT batch
        (voxelize / pyramids / GT correspondences over ``raw_next``'s nine
        padded host arrays) in ONE program.

        The two halves share no data, so XLA schedules them in one
        executable: the steady-state cost per iteration is build+step with
        no inter-program dispatch gap — the TPU analog of the reference
        hiding ALL batch prep in DataLoader worker processes
        (FCGF_APR/lib/complement_data_loader.py:1375-1382;
        Predator_APR/datasets/dataloader.py:76-176), where sustained ==
        step time is the parity bar.  Returns (new_state, metrics,
        next_batch); the loop feeds next_batch to the following call.
        """
        new_state, metrics = self.train_step(state, batch, key)
        next_batch = self.build_batch(raw_next)
        return new_state, metrics, next_batch

    # --- validation -----------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def valid_step(self, state: TrainState, batch: PairBatch, key: jax.Array):
        """Reference _valid_epoch parity: loss + matching/registration metrics
        (complement_trainer.py:514-681): feature NN -> robust IRLS pose ->
        RTE/RRE + hit ratio + feature-match ratio."""
        c = self.config
        # reuse loss_fn's encoder outputs: re-encoding both clouds doubled
        # validation's encoder cost for identical inputs (train=False leaves
        # batch_stats untouched)
        loss, (_, metrics, (f0, f1)) = self.loss_fn(
            state.params, state.batch_stats, batch, key, False,
            return_feats=True,
        )

        def one(f0b, f1b, xyz0, xyz1, m0, m1, t_gt):
            corr = feature_nn_correspondences(f0b, f1b, m0, m1)
            tgt_pts = xyz1[jnp.clip(corr.tgt_idx, 0, xyz1.shape[0] - 1)]
            hr = hit_ratio(xyz0, tgt_pts, t_gt, c.hit_ratio_thresh, corr.mask)
            w = corr.mask.astype(jnp.float32)
            t_est = est_rigid_robust(xyz0, tgt_pts, w)
            rte, rre = registration_errors(t_est, t_gt)
            return hr, rte, rre

        hrs, rtes, rres = jax.vmap(one)(
            f0, f1, batch.xyz0, batch.xyz1,
            batch.pyramid0.levels[0].mask, batch.pyramid1.levels[0].mask,
            batch.t_gt,
        )
        metrics.update(
            hit_ratio=jnp.mean(hrs),
            feat_match_ratio=jnp.mean((hrs > 0.05).astype(jnp.float32)),
            rte=jnp.mean(rtes),
            # non-finite RRE (degenerate pose fit) counts as the WORST
            # rotation, not a perfect one (0 would reward failures)
            rre=jnp.mean(
                jnp.where(jnp.isfinite(rres), rres, 180.0)
            ),
            success=jnp.mean(
                ((rtes < c.rte_thresh) & (rres < c.rre_thresh)).astype(
                    jnp.float32
                )
            ),
        )
        return metrics


def get_trainer(config: APRConfig) -> FCGFTrainer:
    """Reference train.py get_trainer parity: dispatch by config.trainer."""
    return FCGFTrainer(config)
