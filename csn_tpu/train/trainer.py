"""Training / evaluation orchestration for the sparse-voxel (Mink-branch)
models.

Ports the reference trainers:
* `MinkowskiNet/lib/trainer_seg.py` — plain segmentation loop.
* `MinkowskiNet/lib/trainer_csn.py` — CSN loop with the
  plateau -> reload-best -> rebuild-shape-graph state machine
  (MAX_PATIENCE=10, MAX_COOLDOWN=5, MAX_GRAPH_CONSTRUCTION=3,
  `trainer_csn.py:36,115-158`), iter_size gradient accumulation
  (`trainer_csn.py:188-224`), checkpoints carrying `csn_data`
  (`trainer_csn.py:315-387`), and the static `test()` evaluation
  (`trainer_csn.py:400-500`).

TPU structure: the host loop owns control flow (epochs, patience, graph
rebuilds, plateau LR); all compute is in two jitted functions (grad step and
update step) over static-shape `JaxVoxelBatch`es. Gradient accumulation runs
the jitted grad step `iter_size` times and averages on device.
"""

from __future__ import annotations

import logging
import os
import os.path as osp
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from csn_tpu.config import Config
from csn_tpu.core.pyramid import PyramidSpec, build_voxel_batch
from csn_tpu.core.interp import interp_batch
from csn_tpu.data.sampler import InfSampler
from csn_tpu.retrieval import graph as retrieval
from csn_tpu.train import metrics as M
from csn_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from csn_tpu.train.losses import cross_entropy_ignore, predict_nonzero
from csn_tpu.train.optim import (
    ReduceLROnPlateau, get_lr, make_lr_schedule, make_optimizer, set_lr,
)
from csn_tpu.utils.logging import MetricsWriter
from csn_tpu.utils.timer import AverageMeter, Timer


def truncated_batch_size(point_counts: Sequence[int],
                         limit_numpoints: int) -> int:
    """Collate-time batch truncation rule (`lib/transforms.py:126-136`,
    oracle-pinned by tests/test_reference_oracle_mink_data.py): shapes are
    kept in order until the cumulative point count exceeds the limit; the
    shape that overflows and everything after it are dropped. Divergence: the
    reference would drop even the FIRST shape (and then crash collating an
    empty batch), so we keep at least one (j > 0 guard)."""
    if not limit_numpoints or limit_numpoints <= 0:
        return len(point_counts)
    tot = 0
    for j, p in enumerate(point_counts):
        tot += int(p)
        if tot > limit_numpoints and j > 0:
            return j
    return len(point_counts)


def neighbor_slot_indices(neighbors, idxs: Sequence[int],
                          K: int) -> List[List[int]]:
    """Slot-major neighbor layout (`lib/csn_utils.py:114-130 get_neighbors`,
    oracle-pinned): slot k holds the k-th neighbor of every query, in query
    order, so the K neighbor batches line up row-for-row with the query
    batch."""
    return [[neighbors[i][1][k] for i in idxs] for k in range(K)]


def build_batch_from_dataset(dataset, indices: Sequence[int],
                             spec: PyramidSpec,
                             rng: np.random.Generator,
                             augment: bool,
                             limit_numpoints: int = 0):
    """Assemble one padded VoxelBatch. `limit_numpoints` mirrors the
    reference's collate-time batch truncation (`lib/transforms.py:126-143`):
    once the cumulative point count exceeds the limit, the remaining shapes
    of the batch are masked out (the static-shape analogue of dropping them).
    """
    shapes = [dataset.get(i, rng=rng, augment=augment) for i in indices]
    batch = build_voxel_batch(shapes, spec, rng=rng)
    if limit_numpoints > 0:
        tot = sum(int(c.shape[0]) for c, _, _ in shapes)
        kept = truncated_batch_size([c.shape[0] for c, _, _ in shapes],
                                    limit_numpoints)
        if kept < len(shapes):
            logging.warning(
                "\tCannot fit %d points into %d points limit. Truncating "
                "batch %d -> %d shapes.", tot, limit_numpoints, len(shapes),
                kept)
            batch.point_mask[kept:] = False
            batch.labels[kept:] = 255
            for m in batch.masks:
                m[kept:] = False
            batch.interp_w[kept:] = 0.0
    return batch


class BaseTrainer:
    """Shared machinery: jitted steps, checkpointing, eval loop."""

    def __init__(self, model, config: Config, spec: PyramidSpec,
                 train_dataset, val_dataset, num_labels: int):
        self.model = model
        self.config = config
        self.spec = spec
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.num_labels = num_labels
        self.K = getattr(config, "k_neighbors", 0) if self._uses_keys() else 0

        self.writer = MetricsWriter(config.log_dir)
        self.data_timer, self.iter_timer = Timer(), Timer()
        self.data_time_avg, self.iter_time_avg = AverageMeter(), AverageMeter()
        self.losses, self.scores = AverageMeter(), AverageMeter()

        self.rng = np.random.default_rng(config.seed)
        # Dedicated generator for the training-data path: it is consumed from
        # the prefetch thread and must not race the eval/graph paths' rng.
        self.data_rng = np.random.default_rng(config.seed + 1)
        self.jax_rng = jax.random.PRNGKey(config.seed)
        self.sampler = InfSampler(len(train_dataset), shuffle=True,
                                  rng=self.data_rng)

        self.optimizer = make_optimizer(
            optimizer=config.optimizer, lr=config.lr,
            sgd_momentum=config.sgd_momentum,
            sgd_dampening=config.sgd_dampening,
            adam_beta1=config.adam_beta1, adam_beta2=config.adam_beta2,
            weight_decay=config.weight_decay)
        self.lr_factor = 0.5
        self.schedule = make_lr_schedule(
            config.scheduler, config.lr, step_size=config.step_size,
            step_gamma=config.step_gamma, max_iter=config.max_iter,
            poly_power=config.poly_power, exp_gamma=config.exp_gamma,
            exp_step_size=config.exp_step_size)

        self.best_val_part_iou, self.best_val_part_iou_iter = 0.0, 0
        self.best_val_shape_iou, self.best_val_shape_iou_iter = 0.0, 0
        self.best_val_loss, self.best_val_loss_iter = np.inf, 0
        self.best_val_acc, self.best_val_acc_iter = 0.0, 0
        self.curr_iter, self.epoch, self.is_training = 1, 1, True

        self.params = None
        self.batch_stats = None
        self.opt_state = None

        # `--data_parallel N`: shapes sharded over an N-device mesh
        # (parallel/dp.py shard_map steps slot in for the single-device
        # jits; grads/BN stats are psum'd over ICI).
        self.n_dev = max(getattr(config, "data_parallel", 1), 1)
        # `--collection_parallel`: the TRAIN step runs on a 2-D
        # ('data', 'col') mesh with the [self]+K collection sharded one
        # member per col chip (parallel/cp.py); eval/test/graph paths keep
        # the flat DP mesh over the same devices.
        self.n_col = 1
        if getattr(config, "collection_parallel", False):
            if self.K < 1:
                raise ValueError(
                    "--collection_parallel needs k_neighbors >= 1 (the col "
                    "mesh axis is the [self]+K collection)")
            if self.n_dev % (self.K + 1) != 0:
                raise ValueError(
                    f"--collection_parallel needs k_neighbors+1 "
                    f"({self.K + 1}) to divide --data_parallel "
                    f"({self.n_dev})")
            self.n_col = self.K + 1
        self.n_data = self.n_dev // self.n_col
        # params/opt_state are rebound to the returns at the sole call site
        # (_train_iter), so donate them: XLA aliases the SGD update in place
        # instead of holding two generations of the 2x-param-sized
        # (params, momentum) state live. grads are NOT donated — _train_iter
        # keeps them for _log_params histograms.
        # INVARIANT: no live device reference to params/opt_state may survive
        # a _train_iter() — the pre-update buffers are deleted by donation.
        # Readers (checkpoint saves, graph rebuilds) must run before the next
        # update or np.asarray-copy first. Pinned by
        # tests/test_trainer.py::test_apply_step_donates_param_buffers.
        self._apply_step = jax.jit(self._make_apply_step(),
                                   donate_argnums=(0, 1))
        if self.n_dev > 1:
            from csn_tpu.parallel import dp

            self.mesh = dp.make_mesh(self.n_dev)
            self._grad_step, self._eval_step, self._dp_ssa_step = \
                dp.make_dp_trainer_steps(
                    self.model, self.mesh, k_neighbors=self.K,
                    ignore_label=config.ignore_label)
            if self.n_col > 1:
                from csn_tpu.parallel import cp

                self.cp_mesh = cp.make_cp_mesh(self.n_data, self.n_col)
                cp_steps = cp.make_cp_trainer_steps(
                    self.model, self.cp_mesh, k_neighbors=self.K,
                    ignore_label=config.ignore_label)
                # trainer-shaped adapter: the stacked collection travels in
                # the qb slot, keys is always ()
                self._grad_step = (
                    lambda p, bs, qb, keys, rng:
                    cp_steps.grad_step(p, bs, qb, rng))
        else:
            self.mesh = None
            self._grad_step = jax.jit(self._make_grad_step())
            self._eval_step = jax.jit(self._make_eval_step())

    # -- model-specific hooks -------------------------------------------------
    def _uses_keys(self) -> bool:
        return False

    def _apply_model(self, variables, qb, keys, train, mutable, rngs):
        return self.model.apply(variables, qb, train=train, mutable=mutable,
                                rngs=rngs)

    # -- jitted steps ---------------------------------------------------------
    def _make_grad_step(self):
        def grad_step(params, batch_stats, qb, keys, rng):
            def loss_fn(p):
                out, new_vars = self._apply_model(
                    {"params": p, "batch_stats": batch_stats}, qb, keys,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                point_logits = interp_batch(out, qb)
                loss = cross_entropy_ignore(
                    point_logits, qb.labels, self.config.ignore_label,
                    qb.point_mask)
                return loss, (new_vars["batch_stats"], point_logits)

            (loss, (new_stats, point_logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            pred = predict_nonzero(point_logits)
            return loss, grads, new_stats, pred

        return grad_step

    def _make_apply_step(self):
        def apply_step(params, opt_state, grads):
            updates, new_opt_state = self.optimizer.update(
                grads, opt_state, params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, params, updates)
            return new_params, new_opt_state

        return apply_step

    def _make_eval_step(self):
        def eval_step(params, batch_stats, qb, keys):
            out = self._apply_model(
                {"params": params, "batch_stats": batch_stats}, qb, keys,
                train=False, mutable=False, rngs=None)
            point_logits = interp_batch(out, qb)
            loss = cross_entropy_ignore(
                point_logits, qb.labels, self.config.ignore_label,
                qb.point_mask)
            pred = predict_nonzero(point_logits)
            return loss, point_logits, pred

        return eval_step

    # -- init -----------------------------------------------------------------
    def initialize(self):
        idxs = list(range(min(self.config.batch_size,
                              len(self.train_dataset))))
        idxs = (idxs * self.config.batch_size)[: self.config.batch_size]
        qb = build_batch_from_dataset(self.train_dataset, idxs, self.spec,
                                      self.rng, augment=False).to_jax()
        keys = self._fetch_keys_for_init(qb, idxs)
        init_rng, self.jax_rng = jax.random.split(self.jax_rng)

        def init_fn(r, b, ks):
            if self._uses_keys():
                return self.model.init(r, b, ks, train=False)
            return self.model.init(r, b, train=False)

        variables = jax.jit(init_fn)(init_rng, qb, keys)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.optimizer.init(self.params)
        # `--weights` pretrained load (`lib/config.py:47`): restore params +
        # batch stats from a checkpoint file, keep the fresh optimizer state.
        # A `.pth` path loads a reference torch checkpoint through the
        # converter (models/convert.py) — released-model eval parity path.
        if getattr(self.config, "weights", "None") not in (None, "", "None"):
            if self.config.weights.endswith(".pth"):
                from csn_tpu.models.convert import load_mink_torch_checkpoint
                from csn_tpu.models.hrnet import HRNetSimCSN

                self.params, self.batch_stats = load_mink_torch_checkpoint(
                    self.config.weights,
                    num_stages=self.model.NUM_STAGES,
                    num_blocks=self.model.NUM_BLOCKS,
                    csn_head=isinstance(self.model, HRNetSimCSN),
                    k_neighbors=self.config.k_neighbors)
            else:
                tree, _ = load_checkpoint(self.config.weights,
                                          self._tree_state(),
                                          require_host=False)
                self.params = tree["params"]
                self.batch_stats = tree["batch_stats"]
            logging.info("===> Loaded weights from %s", self.config.weights)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(self.params))
        logging.info("===> Number of trainable parameters: %d", n_params)

    def _fetch_keys_for_init(self, qb, idxs):
        return ()

    # -- data -----------------------------------------------------------------
    def _fetch_data(self, augment: bool = True,
                    rng: Optional[np.random.Generator] = None):
        rng = rng if rng is not None else self.data_rng
        idxs = self.sampler.take(self.config.batch_size * self.n_data)
        if self.n_col > 1:
            return self._fetch_data_cp(idxs, augment, rng)
        if self.n_dev > 1:
            return self._fetch_data_dp(idxs, augment, rng)
        if self.K > 0:
            # build the query batch and the K neighbor batches concurrently
            # (independent work; each gets its own spawned generator)
            from concurrent.futures import ThreadPoolExecutor

            rngs = rng.spawn(1 + self.K)
            nbr_idxs = neighbor_slot_indices(self.train_dataset.neighbors,
                                             idxs, self.K)
            with ThreadPoolExecutor(max_workers=1 + self.K) as ex:
                fq = ex.submit(build_batch_from_dataset, self.train_dataset,
                               idxs, self.spec, rngs[0], augment,
                               self.config.train_limit_numpoints)
                fks = [ex.submit(build_batch_from_dataset,
                                 self.train_dataset, nbr_idxs[k], self.spec,
                                 rngs[1 + k], augment)
                       for k in range(self.K)]
                qb = fq.result()
                keys = tuple(f.result().to_jax() for f in fks)
            return qb.to_jax(), keys
        qb = build_batch_from_dataset(
            self.train_dataset, idxs, self.spec, rng, augment=augment,
            limit_numpoints=self.config.train_limit_numpoints)
        return qb.to_jax(), ()

    def _fetch_data_dp(self, idxs, augment: bool, rng):
        """Per-device batches stacked along a leading mesh axis; each device
        batch keeps its local kernel-map index space (no cross-chip gathers
        in the conv path)."""
        from csn_tpu.parallel.dp import stack_batches

        B = self.config.batch_size
        chunks = [idxs[d * B:(d + 1) * B] for d in range(self.n_dev)]
        rngs = rng.spawn(self.n_dev * (1 + self.K))
        qbs = [build_batch_from_dataset(
            self.train_dataset, ch, self.spec, rngs[d], augment,
            self.config.train_limit_numpoints)
            for d, ch in enumerate(chunks)]
        keys = []
        for k in range(self.K):
            kbs = []
            for d, ch in enumerate(chunks):
                nbr = [self.train_dataset.neighbors[i][1][k] for i in ch]
                kbs.append(build_batch_from_dataset(
                    self.train_dataset, nbr, self.spec,
                    rngs[self.n_dev * (1 + k) + d], augment))
            keys.append(stack_batches(kbs))
        return stack_batches(qbs), tuple(keys)

    def _fetch_data_cp(self, idxs, augment: bool, rng):
        """Collection-parallel stacking: per data shard d, the query batch
        and its K neighbor batches occupy consecutive rows (row-major
        (d, c) — the order `P(('data', 'col'))` shards the leading axis
        over the 2-D mesh; parallel/cp.py stack_collection). Travels in
        the qb slot of the step interface; keys is ()."""
        from csn_tpu.parallel.cp import stack_collection

        B = self.config.batch_size
        chunks = [idxs[d * B:(d + 1) * B] for d in range(self.n_data)]
        rngs = rng.spawn(self.n_data * self.n_col)
        # the n_data*(K+1) builds are independent (per-slot pre-spawned
        # rngs); run them concurrently like the single-device K>0 path.
        # NOT _host_pool: build_batch_from_dataset submits nested jobs
        # into it, so queueing the outer builds there can starve the pool.
        from concurrent.futures import ThreadPoolExecutor

        def build(d, c):
            if c == 0:
                return build_batch_from_dataset(
                    self.train_dataset, chunks[d], self.spec,
                    rngs[d * self.n_col], augment,
                    self.config.train_limit_numpoints)
            nbr = [self.train_dataset.neighbors[i][1][c - 1]
                   for i in chunks[d]]
            return build_batch_from_dataset(
                self.train_dataset, nbr, self.spec,
                rngs[d * self.n_col + c], augment)

        with ThreadPoolExecutor(
                max_workers=self.n_data * self.n_col) as ex:
            futs = [[ex.submit(build, d, c) for c in range(self.n_col)]
                    for d in range(self.n_data)]
            per_data = [[f.result() for f in row] for row in futs]
        return stack_collection(per_data), ()

    # -- train loop -----------------------------------------------------------
    @property
    def data_len(self) -> int:
        n_batches = max(len(self.train_dataset)
                        // (self.config.batch_size * self.n_data), 1)
        return (n_batches + self.config.iter_size - 1) // self.config.iter_size

    def _current_lr(self) -> float:
        if self.schedule is not None:
            return float(self.schedule(self.curr_iter))
        return float(self.plateau.lr) if hasattr(self, "plateau") else \
            self.config.lr

    def _close_prefetch(self):
        pf = getattr(self, "_prefetch", None)
        if pf is not None:
            pf.close()
            self._prefetch = None

    def _start_prefetch(self):
        """Overlap host batch construction with device compute
        (data/prefetch.py)."""
        if getattr(self, "_prefetch", None) is None:
            from csn_tpu.data.prefetch import Prefetcher

            # The worker thread owns its own generator (spawned here, on the
            # main thread) so it never mutates `data_rng` concurrently with
            # main-thread draws.
            worker_rng = self.data_rng.spawn(1)[0]
            self._prefetch = Prefetcher(
                lambda: self._fetch_data(rng=worker_rng), depth=2)

    def _train_iter(self):
        self._start_prefetch()
        self.iter_timer.tic()
        data_time, batch_loss = 0.0, 0.0
        grads_acc = None
        pred = target = mask = None
        for _ in range(self.config.iter_size):
            self.data_timer.tic()
            qb, keys = next(self._prefetch)
            data_time += self.data_timer.toc(False)
            step_rng, self.jax_rng = jax.random.split(self.jax_rng)
            loss, grads, new_stats, pred = self._grad_step(
                self.params, self.batch_stats, qb, keys, step_rng)
            self.batch_stats = new_stats
            batch_loss += float(loss) / self.config.iter_size
            if grads_acc is None:
                grads_acc = grads
            else:
                grads_acc = jax.tree_util.tree_map(
                    lambda a, b: a + b, grads_acc, grads)
            # under collection parallelism qb is the stacked [self]+K
            # collection; only the query rows (every n_col-th) score
            target = qb.labels[::self.n_col]
            mask = qb.point_mask[::self.n_col]
        if self.config.iter_size > 1:
            grads_acc = jax.tree_util.tree_map(
                lambda g: g / self.config.iter_size, grads_acc)

        self.opt_state = set_lr(self.opt_state, self._current_lr())
        self.params, self.opt_state = self._apply_step(
            self.params, self.opt_state, grads_acc)
        self._last_grads = grads_acc  # for _log_params grad histograms

        self.data_time_avg.update(data_time)
        self.iter_time_avg.update(self.iter_timer.toc(False))

        pred_np = np.asarray(pred)
        target_np = np.asarray(target)
        mask_np = np.asarray(mask)
        score = M.precision_at_one_partnet(
            np.where(mask_np, pred_np, self.config.ignore_label),
            np.where(mask_np, target_np, self.config.ignore_label),
            self.config.ignore_label)
        n = int(mask_np.sum())
        self.losses.update(batch_loss, n)
        self.scores.update(score, n)

    def _log_stats(self):
        lr = self._current_lr()
        logging.info(
            "===> Epoch[%d](%d/%d): Loss %.4f\tLR: %.3e\tScore %.3f\t"
            "Data time: %.4f, Total iter time: %.4f",
            self.epoch, self.curr_iter, self.data_len, self.losses.avg, lr,
            self.scores.avg, self.data_time_avg.avg, self.iter_time_avg.avg)
        self.data_time_avg.reset()
        self.iter_time_avg.reset()
        self.writer.add_scalar("training/loss", self.losses.avg,
                               self.curr_iter)
        self.writer.add_scalar("training/precision_at_1", self.scores.avg,
                               self.curr_iter)
        self.writer.add_scalar("training/learning_rate", lr, self.curr_iter)

    def _log_params(self):
        """Weight AND gradient histograms (`trainer_csn.py:309-313` logs
        both; grads come from the most recent train iteration)."""
        if not self.config.save_param_histogram:
            return
        grads = getattr(self, "_last_grads", None)
        gmap = (dict(jax.tree_util.tree_leaves_with_path(grads))
                if grads is not None else {})
        for path, leaf in jax.tree_util.tree_leaves_with_path(self.params):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            tag = self.model.__class__.__name__ + "/" + name
            self.writer.add_histogram(tag, np.asarray(leaf), self.epoch)
            if path in gmap:
                self.writer.add_histogram(tag + ".grad",
                                          np.asarray(gmap[path]), self.epoch)

    # -- eval -----------------------------------------------------------------
    def validate(self) -> Tuple[float, float, float, float]:
        res = self.test_on(self.val_dataset)
        self.writer.add_scalar("validation/PartIoU", res[2], self.curr_iter)
        self.writer.add_scalar("validation/ShapeIoU", res[3], self.curr_iter)
        self.writer.add_scalar("validation/loss", res[0], self.curr_iter)
        self.writer.add_scalar("validation/precision_at_1", res[1],
                               self.curr_iter)
        return res

    def test_on(self, dataset, save_pred_dir: Optional[str] = None
                ) -> Tuple[float, float, float, float]:
        """Evaluation loop (`trainer_csn.py:400-500`): per-shape IoU with the
        Mink metric definitions, loss and precision@1 averages."""
        bs = max(self.config.test_batch_size, 1)
        gbs = bs * self.n_dev
        self._prepare_eval(dataset)
        losses, scores, ious = AverageMeter(), AverageMeter(), {}
        n = len(dataset)
        shape_id = 0
        for start in range(0, n, gbs):
            idxs = list(range(start, min(start + gbs, n)))
            valid = len(idxs)
            while len(idxs) < gbs:
                idxs.append(idxs[-1])
            if self.n_dev > 1:
                from csn_tpu.parallel.dp import stack_batches

                chunks = [idxs[d * bs:(d + 1) * bs]
                          for d in range(self.n_dev)]
                hosts = [build_batch_from_dataset(dataset, ch, self.spec,
                                                  self.rng, augment=False)
                         for ch in chunks]
                # final-batch padding duplicates: masked out of the loss
                for gi in range(valid, gbs):
                    hosts[gi // bs].point_mask[gi % bs] = False
                qb = stack_batches(hosts)
                loss, point_logits, pred = self._eval_forward_dp(
                    dataset, chunks, qb)
                labels = np.concatenate([h.labels for h in hosts])
                mask = np.concatenate([h.point_mask for h in hosts])
                pred = np.asarray(pred).reshape(gbs, -1)
                loss_np = np.asarray(loss)
                for d, h in enumerate(hosts):
                    losses.update(float(loss_np[d]),
                                  int(h.point_mask.sum()))
            else:
                qb_host = build_batch_from_dataset(dataset, idxs, self.spec,
                                                   self.rng, augment=False)
                # the final partial batch is padded by duplicating the last
                # shape; mask the duplicates out of the loss (metrics slice
                # [:valid])
                qb_host.point_mask[valid:] = False
                qb = qb_host.to_jax()
                loss, point_logits, pred = self._eval_forward(
                    dataset, idxs, qb)
                pred = np.asarray(pred)
                labels = np.asarray(qb_host.labels)
                mask = np.asarray(qb_host.point_mask)
                losses.update(float(loss), int(mask[:valid].sum()))
            for b in range(valid):
                m = mask[b]
                g, p = labels[b][m], pred[b][m]
                scores.update(M.precision_at_one_partnet(p, g), int(m.sum()))
                ious[shape_id] = M.calculate_iou(g, p, self.num_labels)
                shape_id += 1
                # progress logging (`trainer_csn.py:477-486`)
                if (self.config.test_stat_freq > 0 and shape_id > 0
                        and shape_id % self.config.test_stat_freq == 0):
                    logging.info(
                        "===> Test iter %d/%d: Loss %.4f\tScore %.3f",
                        shape_id, n, losses.avg, scores.avg)
        part_iou = M.calculate_part_iou(ious, self.num_labels) * 100
        shape_iou = M.calculate_shape_iou(ious) * 100
        if save_pred_dir:
            os.makedirs(save_pred_dir, exist_ok=True)
            with open(osp.join(save_pred_dir, "results_log.txt"), "w") as f:
                f.write("Shape IoU: " + str(np.round(shape_iou, 2))
                        + "\nPart IoU: " + str(np.round(part_iou, 2)))
        return losses.avg, scores.avg, part_iou, shape_iou

    def _fetch_eval_keys(self, dataset, idxs):
        return ()

    def _fetch_eval_keys_dp(self, dataset, chunks):
        return ()

    def _prepare_eval(self, dataset):
        """Hook run once at the top of `test_on` (CSN cached-eval builds the
        key-collection cache here)."""

    def _eval_forward(self, dataset, idxs, qb):
        return self._eval_step(self.params, self.batch_stats, qb,
                               self._fetch_eval_keys(dataset, idxs))

    def _eval_forward_dp(self, dataset, chunks, qb):
        return self._eval_step(self.params, self.batch_stats, qb,
                               self._fetch_eval_keys_dp(dataset, chunks))

    # -- checkpointing --------------------------------------------------------
    def _tree_state(self):
        return {"params": self.params, "batch_stats": self.batch_stats,
                "opt_state": self.opt_state}

    def _host_state(self) -> Dict:
        st = {
            "iteration": self.curr_iter,
            "epoch": self.epoch + 1,
            "arch": self.config.model,
            "best_val_part_iou": self.best_val_part_iou,
            "best_val_part_iou_iter": self.best_val_part_iou_iter,
            "best_val_shape_iou": self.best_val_shape_iou,
            "best_val_shape_iou_iter": self.best_val_shape_iou_iter,
            "best_val_loss": float(self.best_val_loss),
            "best_val_loss_iter": self.best_val_loss_iter,
            "best_val_acc": self.best_val_acc,
            "best_val_acc_iter": self.best_val_acc_iter,
        }
        # host-side ReduceLROnPlateau state (current lr, best metric,
        # cooldown) — without it a resumed run silently restarts at the
        # config lr (the reference checkpoints its scheduler state_dict,
        # `lib/utils.py:11-61`, and restores it, `trainer_csn.py:348-387`;
        # caught by a TPU soak resume: lr 0.025 -> 0.05 on restart)
        if hasattr(self, "plateau"):
            st["plateau"] = self.plateau.state_dict()
        return st

    def save_checkpoint(self, postfix: Optional[str] = None):
        save_checkpoint(
            self.config.log_dir, self.config.model, self._tree_state(),
            self._host_state(), config=self.config.to_dict(), postfix=postfix,
            overwrite=self.config.overwrite_weights)

    def _save_best_checkpoints(self, val_loss, val_score, val_part_iou,
                               val_shape_iou):
        """`trainer_csn.py:330-346`."""
        if val_part_iou > self.best_val_part_iou:
            self.best_val_part_iou = val_part_iou
            self.best_val_part_iou_iter = self.curr_iter
            self.save_checkpoint(postfix="best_part_iou")
        if val_shape_iou > self.best_val_shape_iou:
            self.best_val_shape_iou = val_shape_iou
            self.best_val_shape_iou_iter = self.curr_iter
            self.save_checkpoint(postfix="best_shape_iou")
        if val_loss < self.best_val_loss:
            self.best_val_loss = val_loss
            self.best_val_loss_iter = self.curr_iter
            self.save_checkpoint(postfix="best_loss")
        if val_score > self.best_val_acc:
            self.best_val_acc = val_score
            self.best_val_acc_iter = self.curr_iter
            self.save_checkpoint(postfix="best_acc")

    def _load_tree(self, path: str, load_optimizer: bool):
        tree, host = load_checkpoint(path, self._tree_state())
        self.params = tree["params"]
        self.batch_stats = tree["batch_stats"]
        if load_optimizer:
            self.opt_state = tree["opt_state"]
        return host

    def resume(self):
        """`trainer_csn.py:348-387`."""
        path = osp.join(self.config.resume, "weights.msgpack")
        if not osp.isfile(path):
            raise ValueError(f"=> no checkpoint found at '{path}'")
        host = self._load_tree(path, self.config.resume_optimizer)
        self.curr_iter = host["iteration"] + 1
        self.epoch = host["epoch"]
        for k in ("best_val_part_iou", "best_val_shape_iou", "best_val_loss",
                  "best_val_acc"):
            if k in host:
                setattr(self, k, host[k])
                setattr(self, k + "_iter", host.get(k + "_iter", 0))
        if "plateau" in host and hasattr(self, "plateau"):
            self.plateau.load_state_dict(dict(host["plateau"]))
        logging.info("=> Loaded checkpoint '%s' (epoch %d)", path,
                     host["epoch"])
        return host


class SegTrainer(BaseTrainer):
    """`lib/trainer_seg.py`: plain per-epoch loop, validate, best ckpts,
    scheduler step."""

    def train(self):
        if self.params is None:
            self.initialize()
        if self.config.scheduler == "ReduceLROnPlateau":
            self.plateau = ReduceLROnPlateau(
                lr=self.config.lr, factor=self.lr_factor, patience=10,
                cooldown=10)
        if self.config.resume:
            self.resume()
        logging.info("===> Start training")
        self._log_params()
        while self.is_training:
            for _ in range(self.data_len):
                self._train_iter()
                if (self.curr_iter % self.config.stat_freq == 0
                        or self.curr_iter == 1):
                    self._log_stats()
                self.curr_iter += 1
            if self.epoch >= self.config.max_epoch:
                self.is_training = False
                break
            self.save_checkpoint()
            val = self.validate()
            self._save_best_checkpoints(*val)
            if self.config.scheduler == "ReduceLROnPlateau":
                self.plateau.step(val[0])
            if (self.config.save_param_histogram
                    and self.epoch % self.config.param_histogram_freq == 0):
                self._log_params()
            self.losses.reset()
            self.scores.reset()
            self.epoch += 1
        val = self.validate()
        self.save_checkpoint()
        self._save_best_checkpoints(*val)
        self._close_prefetch()
        return val


class CSNTrainer(BaseTrainer):
    """`lib/trainer_csn.py`: CSN training with the shape-graph state machine."""

    MAX_PATIENCE, MAX_COOLDOWN, MAX_GRAPH_CONSTRUCTION = 10, 5, 3

    def __init__(self, model, config: Config, spec: PyramidSpec,
                 train_dataset, val_dataset, num_labels: int):
        super().__init__(model, config, spec, train_dataset, val_dataset,
                         num_labels)
        self.patience = self.MAX_PATIENCE
        self.cooldown = self.MAX_COOLDOWN
        self.n_graph_construction = 0
        self._ssa_step = jax.jit(self._make_ssa_step())
        self._cache_step = None
        self._cached_eval_step = None
        self._collection_cache = None
        self._collection_cache_dev = None  # sharded (feats, pools, masks, per)
        self._dp_cached_eval_step = None

    def _uses_keys(self) -> bool:
        return True

    def _apply_model(self, variables, qb, keys, train, mutable, rngs):
        if mutable:
            return self.model.apply(variables, qb, keys, train=train,
                                    mutable=mutable, rngs=rngs)
        return self.model.apply(variables, qb, keys, train=train)

    def _make_ssa_step(self):
        def ssa_step(params, batch_stats, qb):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats}, qb,
                train=False, return_ssa=True)

        return ssa_step

    def _fetch_keys_for_init(self, qb, idxs):
        return tuple(qb for _ in range(self.K)) if self.K > 0 else ()

    def _fetch_eval_keys(self, dataset, idxs):
        if self.K <= 0:
            return ()
        keys = []
        slots = neighbor_slot_indices(dataset.neighbors, idxs, self.K)
        for i in range(self.K):
            kb = build_batch_from_dataset(self.train_dataset, slots[i],
                                          self.spec, self.rng, augment=False)
            keys.append(kb.to_jax())
        return tuple(keys)

    def _fetch_eval_keys_dp(self, dataset, chunks):
        if self.K <= 0:
            return ()
        from csn_tpu.parallel.dp import stack_batches

        keys = []
        for i in range(self.K):
            kbs = []
            for ch in chunks:
                nbr = [dataset.neighbors[idx][1][i] for idx in ch]
                kbs.append(build_batch_from_dataset(
                    self.train_dataset, nbr, self.spec, self.rng,
                    augment=False))
            keys.append(stack_batches(kbs))
        return tuple(keys)

    # -- cached-collection eval ----------------------------------------------
    # `--cached_eval`: forward every train-collection shape ONCE through the
    # backbone (`HRNetSimCSN.cache_features`), keep the per-shape K/V features
    # + pooled SSA on the host (f16/f32), and evaluate queries with
    # `csa_from_cache` — a single-B backbone pass per batch instead of the
    # (K+1)-B combined pass. The reference re-forwards every neighbor per
    # query (`lib/trainer_csn.py:442-454`). Under `--data_parallel N` the
    # cache is built DP (one collection batch per chip) and SHARDED over the
    # mesh — each chip holds N/n_dev shapes — with neighbor rows fetched
    # over ICI per eval batch (parallel/collection.py, SURVEY §5.8).
    def _make_cache_step(self):
        def cache_step(params, batch_stats, qb):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats}, qb,
                method="cache_features")

        return cache_step

    def _make_cached_eval_step(self):
        def eval_step(params, batch_stats, qb, key_feats, key_pools,
                      key_masks):
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, qb,
                key_feats, key_pools, key_masks, method="csa_from_cache")
            point_logits = interp_batch(out, qb)
            loss = cross_entropy_ignore(
                point_logits, qb.labels, self.config.ignore_label,
                qb.point_mask)
            return loss, point_logits, predict_nonzero(point_logits)

        return eval_step

    def build_collection_cache(self):
        """Cache (features, ssa_pool, mask) for every train-collection shape.

        Host footprint N*L0*d f16 — the same budget as the retrieval
        descriptor cache `_all_ssa_descriptors` already holds (and what the
        reference keeps CPU-side in `csn_utils.py:66-83`). Rebuilt on every
        `test_on` call because it is a function of the current params."""
        if self._cache_step is None:
            self._cache_step = jax.jit(self._make_cache_step())
        ds = self.train_dataset
        bs = max(self.config.test_batch_size, 1)
        n = len(ds)
        feats_out, pools_out, masks_out = [], [], []
        for start in range(0, n, bs):
            idxs = list(range(start, min(start + bs, n)))
            valid = len(idxs)
            while len(idxs) < bs:
                idxs.append(idxs[-1])
            kb = build_batch_from_dataset(ds, idxs, self.spec, self.rng,
                                          augment=False)
            feats, pools = self._cache_step(self.params, self.batch_stats,
                                            kb.to_jax())
            feats_out.append(np.asarray(feats[:valid], dtype=np.float16))
            pools_out.append(np.asarray(pools[:valid], dtype=np.float32))
            masks_out.append(np.asarray(kb.masks[0])[:valid])
        self._collection_cache = (np.concatenate(feats_out),
                                  np.concatenate(pools_out),
                                  np.concatenate(masks_out))

    def build_collection_cache_dp(self):
        """DP cache build + mesh placement: forward n_dev collection batches
        per step (`make_dp_cache_step`), then `shard_collection` the f16
        feature cache over the mesh so each chip holds N/n_dev shapes."""
        from csn_tpu.parallel import collection as pc
        from csn_tpu.parallel.dp import stack_batches

        if self._cache_step is None:
            self._cache_step = pc.make_dp_cache_step(self.model, self.mesh)
        ds = self.train_dataset
        bs = max(self.config.test_batch_size, 1)
        gbs = bs * self.n_dev
        n = len(ds)
        feats_out, pools_out, masks_out = [], [], []
        for start in range(0, n, gbs):
            idxs = list(range(start, min(start + gbs, n)))
            valid = len(idxs)
            while len(idxs) < gbs:
                idxs.append(idxs[-1])
            chunks = [idxs[d * bs:(d + 1) * bs] for d in range(self.n_dev)]
            hosts = [build_batch_from_dataset(ds, ch, self.spec, self.rng,
                                              augment=False)
                     for ch in chunks]
            feats, pools = self._cache_step(self.params, self.batch_stats,
                                            stack_batches(hosts))
            L0, d = feats.shape[-2:]
            feats_out.append(np.asarray(feats, np.float16)
                             .reshape(gbs, L0, d)[:valid])
            pools_out.append(np.asarray(pools, np.float32)
                             .reshape(gbs, d)[:valid])
            masks_out.append(np.concatenate(
                [np.asarray(h.masks[0]) for h in hosts])[:valid])
        cf, cp, cm, per = pc.shard_collection(
            np.concatenate(feats_out), np.concatenate(pools_out),
            np.concatenate(masks_out), self.mesh)
        self._collection_cache_dev = (cf, cp, cm, per)
        if self._dp_cached_eval_step is None:
            self._dp_cached_eval_step = pc.make_dp_cached_eval_step(
                self.model, self.mesh, per=per,
                ignore_label=self.config.ignore_label)

    def _prepare_eval(self, dataset):
        if self.config.cached_eval and self.K > 0:
            logging.info("===> Building cached-eval collection (%d shapes%s)",
                         len(self.train_dataset),
                         f", sharded over {self.n_dev} chips"
                         if self.n_dev > 1 else "")
            if self.n_dev > 1:
                self.build_collection_cache_dp()
            else:
                self.build_collection_cache()
                if self._cached_eval_step is None:
                    self._cached_eval_step = jax.jit(
                        self._make_cached_eval_step())

    def _eval_forward(self, dataset, idxs, qb):
        if self._collection_cache is None or self.K <= 0 or self.n_dev > 1:
            return super()._eval_forward(dataset, idxs, qb)
        feats, pools, masks = self._collection_cache
        nbr = np.asarray([[dataset.neighbors[idx][1][i]
                           for i in range(self.K)] for idx in idxs])  # [B,K]
        return self._cached_eval_step(
            self.params, self.batch_stats, qb,
            jnp.asarray(feats[nbr]), jnp.asarray(pools[nbr]),
            jnp.asarray(masks[nbr]))

    def _eval_forward_dp(self, dataset, chunks, qb):
        if self._collection_cache_dev is None or self.K <= 0:
            return super()._eval_forward_dp(dataset, chunks, qb)
        cf, cp, cm, _per = self._collection_cache_dev
        idx = np.asarray([[[dataset.neighbors[i][1][k]
                            for k in range(self.K)] for i in ch]
                          for ch in chunks], np.int32)  # [n_dev, B, K]
        return self._dp_cached_eval_step(self.params, self.batch_stats, qb,
                                         cf, cp, cm, jnp.asarray(idx))

    # -- shape graph ----------------------------------------------------------
    def _all_ssa_descriptors(self, dataset):
        """Batched SSA features for every shape (augmentations disabled, like
        `csn_utils.py:26-27`). Returns (feats [N, L0, d] fp16, masks [N, L0]).
        With `--data_parallel N` the forward passes run sharded over the mesh
        (n_dev batches per step)."""
        bs = self.config.batch_size
        gbs = bs * self.n_dev
        n = len(dataset)
        feats_out, masks_out = [], []
        for start in range(0, n, gbs):
            idxs = list(range(start, min(start + gbs, n)))
            valid = len(idxs)
            while len(idxs) < gbs:
                idxs.append(idxs[-1])
            if self.n_dev > 1:
                from csn_tpu.parallel.dp import stack_batches

                chunks = [idxs[d * bs:(d + 1) * bs]
                          for d in range(self.n_dev)]
                hosts = [build_batch_from_dataset(dataset, ch, self.spec,
                                                  self.rng, augment=False)
                         for ch in chunks]
                ssa = np.asarray(self._dp_ssa_step(
                    self.params, self.batch_stats, stack_batches(hosts)))
                ssa = ssa.reshape(gbs, *ssa.shape[2:])
                m0 = np.concatenate([h.masks[0] for h in hosts])
            else:
                qb_host = build_batch_from_dataset(dataset, idxs, self.spec,
                                                   self.rng, augment=False)
                ssa = np.asarray(self._ssa_step(self.params,
                                                self.batch_stats,
                                                qb_host.to_jax()))
                m0 = np.asarray(qb_host.masks[0])
            feats_out.append(ssa[:valid].astype(np.float16))
            masks_out.append(m0[:valid])
        return np.concatenate(feats_out), np.concatenate(masks_out)

    def _measure(self, q_feats, q_mask, k_feats, k_mask):
        """Mean-of-max cosine retrieval measure; sharded over the mesh when
        `--data_parallel N` is set (parallel/dp.py)."""
        if self.mesh is not None:
            from csn_tpu.parallel.dp import sharded_retrieval_measure

            return sharded_retrieval_measure(q_feats, q_mask, k_feats,
                                             k_mask, self.mesh)
        return retrieval.retrieval_measure(q_feats, q_mask, k_feats, k_mask)

    def construct_shape_graph(self, recalculate: bool):
        """`trainer_csn.py:262-282` + `csn_utils.py:11-111`: random pairs on
        first construction, SSA cosine retrieval on rebuilds. Train neighbors
        come from the train set (self-excluded); val neighbors from the train
        set."""
        # Flush the prefetch queue first: queued batches were built from the
        # OLD neighbor graph, and the worker thread must not read
        # `train_dataset.neighbors` while it is being replaced. The next
        # `_train_iter` restarts the prefetcher over the new graph.
        self._close_prefetch()
        K = self.config.k_neighbors
        if not recalculate:
            logging.info("===> Get random pairs")
            self.train_dataset.neighbors = retrieval.random_pairs(
                len(self.train_dataset), len(self.train_dataset), K,
                is_same=True, rng=self.rng)
            self.val_dataset.neighbors = retrieval.random_pairs(
                len(self.val_dataset), len(self.train_dataset), K,
                is_same=False, rng=self.rng)
        else:
            logging.info("===> Get pairs based on cosine similarity (SSA)")
            tr_feats, tr_masks = self._all_ssa_descriptors(self.train_dataset)
            measure = self._measure(tr_feats, tr_masks, tr_feats, tr_masks)
            self.train_dataset.neighbors = retrieval.knn_graph_from_measure(
                measure, K, is_same=True)
            va_feats, va_masks = self._all_ssa_descriptors(self.val_dataset)
            measure = self._measure(va_feats, va_masks, tr_feats, tr_masks)
            self.val_dataset.neighbors = retrieval.knn_graph_from_measure(
                measure, K, is_same=False)
        # Log the first 2 query point clouds WITH their retrieved neighbors
        # (`csn_utils.py:99-109`).
        for idx in range(min(2, len(self.train_dataset))):
            pc = self.train_dataset.coords[idx]
            self.writer.add_mesh(f"training/query_pc_{idx}", pc[None, ...],
                                 self.n_graph_construction)
            for nn_idx in self.train_dataset.neighbors[idx][1]:
                npc = self.train_dataset.coords[nn_idx]
                self.writer.add_mesh(
                    f"training/query_pc_{idx}/neighbor_pc_{nn_idx}",
                    npc[None, ...], self.n_graph_construction)

    # -- checkpoint extensions ------------------------------------------------
    def _host_state(self):
        st = super()._host_state()
        if self.config.k_neighbors > 0:
            st["csn_data"] = {
                "patience": self.patience,
                "cooldown": self.cooldown,
                "n_graph_construction": self.n_graph_construction,
                "train_neighbors": [list(x) if not isinstance(x[1], list)
                                    else [x[0], x[1]]
                                    for x in self.train_dataset.neighbors],
                "val_neighbors": [[x[0], x[1]]
                                  for x in self.val_dataset.neighbors],
            }
        return st

    def resume(self):
        host = super().resume()
        if "csn_data" in host:
            cd = host["csn_data"]
            self.patience = cd["patience"]
            self.cooldown = cd["cooldown"]
            self.n_graph_construction = cd["n_graph_construction"]
            self.train_dataset.neighbors = [
                (int(a), list(b)) for a, b in cd["train_neighbors"]]
            self.val_dataset.neighbors = [
                (int(a), list(b)) for a, b in cd["val_neighbors"]]
            logging.info("===> Patience=%d, Cooldown=%d, #Graph construction=%d",
                         self.patience, self.cooldown,
                         self.n_graph_construction)
        return host

    def _rebuild_on_plateau(self):
        """Patience exhausted: reload best-part-IoU weights, rebuild the shape
        graph, reset counters (`trainer_csn.py:136-158`)."""
        self._close_prefetch()  # pending batches use the old graph
        ckpt = osp.join(
            self.config.log_dir,
            f"checkpoint_{self.config.model}best_part_iou.msgpack")
        logging.info("=====> Loading checkpoint '%s'", ckpt)
        # `trainer_csn.py:143-148`: with resume_optimizer the best
        # checkpoint's *optimizer state* is reloaded too (momentum buffers
        # carry over from the best epoch) and the lr resets to config.lr.
        self._load_tree(ckpt, load_optimizer=self.config.resume_optimizer)
        if self.config.resume_optimizer:
            self.opt_state = set_lr(self.opt_state, self.config.lr)
            if hasattr(self, "plateau"):
                self.plateau = ReduceLROnPlateau(
                    lr=self.config.lr, factor=self.lr_factor,
                    patience=self.MAX_PATIENCE,
                    cooldown=self.MAX_COOLDOWN * 2)
        self.construct_shape_graph(recalculate=True)
        self.n_graph_construction += 1
        self.patience = self.MAX_PATIENCE
        self.cooldown = self.MAX_COOLDOWN
        self.save_checkpoint()

    # -- main loop ------------------------------------------------------------
    def train(self):
        """`trainer_csn.py:54-186`."""
        if self.params is None:
            self.initialize()
        if self.config.scheduler == "ReduceLROnPlateau":
            self.plateau = ReduceLROnPlateau(
                lr=self.config.lr, factor=self.lr_factor,
                patience=self.MAX_PATIENCE, cooldown=self.MAX_COOLDOWN * 2)
        logging.info("===> Start training")

        if self.config.resume:
            self.resume()
            if self.config.k_neighbors > 0 and self.patience <= 0:
                self.construct_shape_graph(recalculate=True)
                self.n_graph_construction += 1
                self.patience = self.MAX_PATIENCE
                self.cooldown = self.MAX_COOLDOWN

        self._log_params()

        if self.config.k_neighbors > 0 and not self.config.resume:
            self.construct_shape_graph(recalculate=False)
            self.n_graph_construction += 1

        while self.is_training:
            for _ in range(self.data_len):
                self._train_iter()
                if (self.curr_iter % self.config.stat_freq == 0
                        or self.curr_iter == 1):
                    self._log_stats()
                self.curr_iter += 1

            if self.epoch >= self.config.max_epoch:
                self.is_training = False
                break

            self.save_checkpoint()
            self.cooldown -= 1
            val_loss, val_score, val_part_iou, val_shape_iou = self.validate()
            if val_part_iou > self.best_val_part_iou:
                self.patience = self.MAX_PATIENCE
            elif (self.config.k_neighbors > 0
                    and self.n_graph_construction
                    < self.MAX_GRAPH_CONSTRUCTION):
                if self.cooldown <= 0:
                    self.cooldown = 0
                    self.patience -= 1
                    logging.info(
                        "=====> (Iteration:%d) Patience running out "
                        "(patience:%d)", self.curr_iter, self.patience)
                else:
                    logging.info("=====> (Iteration:%d) Getting hotter "
                                 "(cooldown:%d)", self.curr_iter, self.cooldown)
            self._save_best_checkpoints(val_loss, val_score, val_part_iou,
                                        val_shape_iou)

            if self.config.k_neighbors > 0 and self.patience <= 0:
                self._rebuild_on_plateau()

            if self.config.scheduler == "ReduceLROnPlateau":
                self.plateau.step(val_loss)
            if (self.config.save_param_histogram
                    and self.epoch % self.config.param_histogram_freq == 0):
                self._log_params()
            self.losses.reset()
            self.scores.reset()
            self.epoch += 1

        val = self.validate()
        self.save_checkpoint()
        self._save_best_checkpoints(*val)
        self._log_params()
        self._close_prefetch()
        return val

    def construct_test_graph(self, test_dataset):
        """Eval-time graph: test neighbors always retrieved from the TRAIN
        collection (`tasks/main_csn.py:121-141`)."""
        tr_feats, tr_masks = self._all_ssa_descriptors(self.train_dataset)
        te_feats, te_masks = self._all_ssa_descriptors(test_dataset)
        measure = self._measure(te_feats, te_masks, tr_feats, tr_masks)
        test_dataset.neighbors = retrieval.knn_graph_from_measure(
            measure, self.config.k_neighbors, is_same=False)
