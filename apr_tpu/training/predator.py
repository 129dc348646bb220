"""Predator-APR trainer: KPFCNN + MetricLoss + generative branch.

Parity with Predator_APR/lib/trainer.py: per step (batch of one pair, the
reference's fixed batch size — dataloader.py:76):

    total = circle * w_circle + overlap_bce * w_overlap + saliency_bce * w_sal
          + sum over both frames of (chamfer + reg * reg_strength) * loss_ratio

with w_saliency toggled from 0 to 1 once validation feature-match recall
exceeds 0.3 (trainer.py:370-374), offsets anchored on metric point
coordinates (no voxel_size scaling, unlike FCGF — trainer.py:178-204), a
NaN-chamfer batch skip (invalid_flag :185-220) and a gradient NaN gate
(validate_gradient lib/utils.py:100) — both folded into one finite-gate on
the update.  Optimizer: SGD momentum 0.98 or Adam over model+generator
parameters with per-epoch ExponentialLR (main.py:66-91).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from apr_tpu.config import APRConfig
from apr_tpu.losses.circle import metric_loss
from apr_tpu.losses.generative import npr_reconstruction
from apr_tpu.models.kpconv import KPPyramid, build_kp_pyramid
from apr_tpu.models.kpfcnn import KPFCNN
from apr_tpu.models.mlp import make_generative_mlp
from apr_tpu.registration.matching import gt_correspondences
from apr_tpu.training.trainer import TrainState

log = logging.getLogger(__name__)


class KPPairBatch(NamedTuple):
    pyr0: KPPyramid
    pyr1: KPPyramid
    corr_src: jnp.ndarray
    corr_tgt: jnp.ndarray
    corr_mask: jnp.ndarray
    apc0: jnp.ndarray
    apc0_mask: jnp.ndarray
    apc1: jnp.ndarray
    apc1_mask: jnp.ndarray
    t_gt: jnp.ndarray


@partial(
    jax.jit,
    static_argnames=("first_subsampling_dl", "conv_radius", "capacities",
                     "neighbor_limits", "corr_cap", "overlap_radius",
                     "radius_select", "overflow_fallback"),
)
def make_kp_pair_batch(
    points0, mask0, points1, mask1,
    apc0, apc0_mask, apc1, apc1_mask, t_gt,
    first_subsampling_dl=0.3,
    conv_radius=4.25,
    capacities=(16384, 4096, 2048, 1024),
    neighbor_limits=(40, 40, 40, 40),
    corr_cap=2,
    overlap_radius=0.45,
    radius_select="topk",
    overflow_fallback=True,
) -> KPPairBatch:
    """One pair -> pyramids + GT correspondences (kitti.py:481 parity:
    matches found within overlap_radius on the subsampled clouds)."""
    pyr0 = build_kp_pyramid(
        points0, mask0, first_subsampling_dl, conv_radius,
        len(capacities), capacities, neighbor_limits, radius_select,
        overflow_fallback,
    )
    pyr1 = build_kp_pyramid(
        points1, mask1, first_subsampling_dl, conv_radius,
        len(capacities), capacities, neighbor_limits, radius_select,
        overflow_fallback,
    )
    corr = gt_correspondences(
        pyr0.levels[0].points, pyr1.levels[0].points, t_gt,
        radius=overlap_radius, cap_per_point=corr_cap,
        mask0=pyr0.levels[0].mask, mask1=pyr1.levels[0].mask,
    )

    # voxel-dedup APC targets (kitti.py voxelizes nghb clouds too) — the
    # lean in-place dedup: the masked Chamfer reads (points, mask) only
    if apc0.shape[0] > 8:
        from apr_tpu.ops.voxelize import dedup_points

        apc0, apc0_mask = dedup_points(apc0, first_subsampling_dl, apc0_mask)
        apc1, apc1_mask = dedup_points(apc1, first_subsampling_dl, apc1_mask)

    return KPPairBatch(
        pyr0=pyr0, pyr1=pyr1,
        corr_src=corr.src_idx, corr_tgt=corr.tgt_idx, corr_mask=corr.mask,
        apc0=apc0, apc0_mask=apc0_mask, apc1=apc1, apc1_mask=apc1_mask,
        t_gt=t_gt,
    )


class PredatorTrainer:
    def __init__(self, config: APRConfig):
        self.config = config
        c = config
        cd = (None if c.compute_dtype in (None, "float32")
              else c.compute_dtype)
        self.model = KPFCNN(
            final_feats_dim=c.final_feats_dim,
            first_feats_dim=c.first_feats_dim,
            gnn_feats_dim=c.gnn_feats_dim,
            dgcnn_k=c.dgcnn_k,
            num_head=c.num_head,
            nets=tuple(c.nets),
            first_subsampling_dl=c.first_subsampling_dl,
            conv_radius=c.conv_radius,
            kp_extent=c.KP_extent,
            num_kernel_points=c.num_kernel_points,
            condition_feature=c.condition_feature,
            add_cross_score=c.add_cross_score,
            deformable=c.deformable,
            modulated=c.modulated,
            compute_dtype=cd,
        )
        self.symmetric = bool(c.symmetric)
        if self.symmetric:
            # symmetric NPR (architectures.py:215-340): a second KPConv U-Net
            # over the same pyramid consuming the encoder output features
            from apr_tpu.models.kpfcnn import KPFCNNDecoder

            self.generator = KPFCNNDecoder(
                point_generation_ratio=c.point_generation_ratio,
                first_feats_dim=c.first_feats_dim,
                first_subsampling_dl=c.first_subsampling_dl,
                conv_radius=c.conv_radius,
                kp_extent=c.KP_extent,
                num_kernel_points=c.num_kernel_points,
                deformable=c.deformable,
                modulated=c.modulated,
                compute_dtype=cd,
            )
        else:
            # final_bn: the Predator MLP flavor ends Linear-ReLU-BatchNorm
            # (always-true branch, Predator_APR/models/mlp.py:120-133)
            self.generator = make_generative_mlp(
                c.generator_model, out_points=c.point_generation_ratio,
                final_bn=True,
            )
        self.tx = self._make_optimizer()

    def _make_optimizer(self):
        c = self.config

        def wd_mask(params):
            # kernel_points are frozen buffers (requires_grad=False in the
            # reference, blocks.py:225-230): stop_gradient zeroes their
            # grads, and this mask keeps weight decay off them too
            return jax.tree_util.tree_map_with_path(
                lambda path, _: not any(
                    getattr(k, "key", None) == "kernel_points" for k in path
                ),
                params,
            )

        def opt(learning_rate):
            if c.optimizer == "SGD":
                return optax.chain(
                    optax.add_decayed_weights(c.weight_decay, mask=wd_mask),
                    optax.sgd(learning_rate, momentum=c.sgd_momentum),
                )
            return optax.adamw(learning_rate, weight_decay=c.weight_decay,
                               mask=wd_mask)

        tx = optax.inject_hyperparams(opt)(learning_rate=c.lr)
        if c.iter_size > 1:
            # gradient accumulation (reference Predator trainer.py:316-322)
            tx = optax.MultiSteps(tx, every_k_schedule=c.iter_size)
        return tx

    def epoch_lr(self, epoch: int) -> float:
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

    def init_state(self, key: jax.Array, batch: KPPairBatch) -> TrainState:
        k_m, k_g = jax.random.split(key)
        # jit the init (eager flax init = hundreds of per-op TPU compiles)
        mv = jax.jit(self.model.init)(k_m, batch.pyr0, batch.pyr1)
        n0 = batch.pyr0.levels[0].points.shape[0]
        f_dummy = jnp.zeros((n0, self.config.final_feats_dim))
        if self.symmetric:
            gv = jax.jit(
                lambda k, f, p0, p1: self.generator.init(k, f, f, p0, p1)
            )(k_g, f_dummy, batch.pyr0, batch.pyr1)
        else:
            gv = jax.jit(
                lambda k, f, m: self.generator.init(k, f, m, train=False)
            )(k_g, f_dummy, jnp.ones((n0,), bool))
        params = {"model": mv["params"], "generator": gv["params"]}
        batch_stats = {
            "model": mv.get("batch_stats", {}),
            "generator": gv.get("batch_stats", {}),
        }
        opt_state = self.tx.init(params)
        from apr_tpu.training.trainer import strongify

        return strongify(TrainState(
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            lr=jnp.asarray(self.config.lr, jnp.float32),
        ))

    # --- loss -----------------------------------------------------------

    def loss_fn(self, params, batch_stats, batch: KPPairBatch, key,
                w_saliency, train: bool):
        c = self.config
        out = self.model.apply({"params": params["model"]}, batch.pyr0,
                               batch.pyr1)
        m0 = batch.pyr0.levels[0].mask
        m1 = batch.pyr1.levels[0].mask
        src = batch.pyr0.levels[0].points
        tgt = batch.pyr1.levels[0].points

        stats = metric_loss(
            key, src, tgt, m0, m1, out.feats0, out.feats1,
            batch.corr_src, batch.corr_tgt, batch.corr_mask, batch.t_gt,
            out.overlap0, out.overlap1, out.saliency0, out.saliency1,
            pos_radius=c.pos_radius, safe_radius=c.safe_radius,
            overlap_radius=c.overlap_radius,
            matchability_radius=c.matchability_radius,
            pos_margin=c.pos_margin, neg_margin=c.neg_margin,
            log_scale=c.log_scale, max_points=c.max_points,
        )

        # generative branch: offsets anchored on metric points, no voxel scale
        mo_pair = [None, None]
        if self.symmetric:
            # one stacked-pair pass: the reference decoder consumes both
            # clouds' features jointly (architectures.py:326 second_features)
            mo_pair = self.generator.apply(
                {"params": params["generator"]},
                out.feats0, out.feats1, batch.pyr0, batch.pyr1,
            )

        def gen_branch(feats, anchors, mask, apc, apc_mask, gstats, mo):
            variables = {"params": params["generator"], "batch_stats": gstats}
            if self.symmetric:
                pass  # mo precomputed above
            elif train:
                mo, upd = self.generator.apply(
                    variables, feats, mask, train=True, mutable=["batch_stats"]
                )
                gstats = upd["batch_stats"]
            else:
                mo = self.generator.apply(variables, feats, mask, train=False)
            total, cd, reg, clamp = npr_reconstruction(
                mo, anchors, apc, mask, apc_mask,
                voxel_size=1.0,
                reg_type="L2",
                reg_strength=c.regularization_strength,
                chamfer_mode=c.chamfer_mode,
                chamfer_cell_size=(
                    c.chamfer_cell_multiplier * c.first_subsampling_dl
                ),
            )
            return total, cd, reg, clamp, gstats

        g0, cd0, reg0, clamp0, gstats = gen_branch(
            out.feats0, src, m0, batch.apc0, batch.apc0_mask,
            batch_stats["generator"], mo_pair[0])
        g1, cd1, reg1, clamp1, gstats = gen_branch(
            out.feats1, tgt, m1, batch.apc1, batch.apc1_mask, gstats,
            mo_pair[1])

        loss = (
            stats["circle_loss"] * c.w_circle_loss
            + stats["overlap_loss"] * c.w_overlap_loss
            + stats["saliency_loss"] * w_saliency
            + (g0 + g1) * c.loss_ratio
        )
        metrics = dict(stats)
        metrics.update(
            loss=loss,
            chamfer_loss=cd0 + cd1,
            regularization_loss=reg0 + reg1,
            chamfer_clamp_frac=0.5 * (clamp0 + clamp1),
        )
        new_stats = dict(batch_stats, generator=gstats)
        return loss, (new_stats, metrics)

    def _finite_gated_update(self, state, loss, grads, new_stats, metrics):
        """Full skip on non-finite steps: weight decay + momentum would
        still move params with zeroed grads (see FCGF trainer note)."""
        finite = jnp.isfinite(loss)
        leaves = jax.tree_util.tree_leaves(grads)
        finite = jnp.logical_and(
            finite,
            jnp.all(jnp.stack([jnp.all(jnp.isfinite(g)) for g in leaves])),
        )
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
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
            state._replace(params=params, batch_stats=new_stats,
                           opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: TrainState, batch: KPPairBatch, key,
                   w_saliency):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, key, w_saliency, True)
        return self._finite_gated_update(state, loss, grads, new_stats,
                                         metrics)

    @partial(jax.jit, static_argnames=("self",))
    def valid_step(self, state: TrainState, batch: KPPairBatch, key,
                   w_saliency):
        _, (_, metrics) = self.loss_fn(
            state.params, state.batch_stats, batch, key, w_saliency, False
        )
        return metrics

    # --- data-parallel steps (SURVEY.md §2.4: pairs sharded over ICI) -----
    #
    # The reference trains Predator strictly single-GPU with batch_size 1
    # (dataloader.py:76); the TPU-first scaling analog stacks B pairs on a
    # leading axis (exactly like the sharded tester,
    # eval/predator_tester.py:121-135), vmaps the per-pair loss, and lets
    # GSPMD shard the stack over the mesh — gradients all-reduce over ICI.

    def _batched_loss(self, params, batch_stats, batch: KPPairBatch, keys,
                      w_saliency, train: bool, pair_weights=None):
        """``pair_weights`` [B] (summing to 1) weight each pair's loss,
        batch_stats and metrics — used by the train loop to zero out
        repetition-padded tail pairs so they don't bias gradients (the
        padded entries repeat the last real pair, predator_loop._group_iter).
        None means uniform."""
        def one(b, k):
            return self.loss_fn(params, batch_stats, b, k, w_saliency, train)

        losses, (new_stats, metrics) = jax.vmap(one)(batch, keys)
        if pair_weights is None:
            pair_weights = jnp.full(losses.shape, 1.0 / losses.shape[0])

        def wmean(a):
            w = pair_weights.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.sum(a * w, axis=0)

        new_stats = jax.tree.map(wmean, new_stats)
        metrics = jax.tree.map(wmean, metrics)
        return jnp.sum(losses * pair_weights), (new_stats, metrics)

    @partial(jax.jit, static_argnames=("self",))
    def train_step_batched(self, state: TrainState, batch: KPPairBatch,
                           keys, w_saliency, pair_weights=None):
        """batch: KPPairBatch with leading pair axis [B, ...]; keys [B, 2]."""
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            self._batched_loss, has_aux=True
        )(state.params, state.batch_stats, batch, keys, w_saliency, True,
          pair_weights)
        return self._finite_gated_update(state, loss, grads, new_stats,
                                         metrics)

    @partial(jax.jit, static_argnames=("self",))
    def train_step_batched_fused(self, state: TrainState, batch: KPPairBatch,
                                 keys, w_saliency, raw_next,
                                 pair_weights=None):
        """train_step_batched on ``batch`` + the NEXT group's device-side
        pyramid/correspondence build (vmapped make_kp_pair_batch over
        ``raw_next``'s nine stacked [B, ...] host arrays) in ONE program —
        no inter-program dispatch gap between step i and build i+1 (the
        reference hides prep in DataLoader workers,
        Predator_APR/datasets/dataloader.py:76-176).  Returns
        (new_state, metrics, next_batch)."""
        new_state, metrics = self.train_step_batched(
            state, batch, keys, w_saliency, pair_weights)
        next_batch = self.build_batch_group(raw_next)
        return new_state, metrics, next_batch

    def build_batch_group(self, raw) -> KPPairBatch:
        """Vmapped device-side pyramid/correspondence build over the nine
        stacked [B, ...] arrays (standalone flavor of the build fused into
        train_step_batched_fused)."""
        c = self.config
        build = partial(
            make_kp_pair_batch,
            first_subsampling_dl=c.first_subsampling_dl,
            conv_radius=c.conv_radius,
            capacities=tuple(c.kp_capacities),
            neighbor_limits=tuple(c.neighborhood_limits),
            overlap_radius=c.overlap_radius,
            radius_select=c.kp_radius_select,
            # under vmap a cond lowers to a select executing BOTH branches;
            # the grouped train build keeps overflow as telemetry instead
            # (build_kp_pyramid docstring)
            overflow_fallback=False,
        )
        return jax.vmap(build)(*raw)

    @partial(jax.jit, static_argnames=("self",))
    def valid_step_batched(self, state: TrainState, batch: KPPairBatch,
                           keys, w_saliency):
        _, (_, metrics) = self._batched_loss(
            state.params, state.batch_stats, batch, keys, w_saliency, False
        )
        return metrics
