"""MID-FC SSA / CSA training and evaluation loops.

Ports `MID-FC/ssa_training.py` and `MID-FC/csa_training.py`:
* SSA: 200 epochs of Adam(lr=1e-3, betas=(0.5, 0.999), L2 wd), gradient
  accumulation (default 32), masked CE over labels>0, NaN-loss zeroing,
  per-epoch eval with the MID-FC dataset-aggregated part IoU, best-IoU
  checkpoint + `test_summaries.csv`, lr x0.1 at epochs T/20 and 3T/4
  (`ssa_training.py:204-258`).
* CSA: loads the trained SSA weights (`utils.py:29-39` semantics: shared
  module tree, so a plain parameter merge), loads precomputed kNN graphs,
  trains 24 epochs, rebuilds the kNN graph with the current model (KMeans
  candidate path for the big categories Chair/Lamp/StorageFurniture/Table),
  then trains 24 more epochs (`csa_training.py:136-176,303-376`).

Also provides `save_knn_graphs` — the functionality of the reference's
*missing* `save_knn_graph.py` (`run_save_knn.py:50` references it; logic
reconstructed from `csa_models.py:270-332`). This is one of the reference
defects we fix rather than replicate (SURVEY.md appendix).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization

from csn_tpu.midfc.data import CSAFeaturesDataset, FeaturesDataset
from csn_tpu.midfc.model import CrossShapeAt, get_model
from csn_tpu.retrieval.graph import (
    kmeans_candidate_indices, knn_graph_topk_rows, retrieval_measure,
)
from csn_tpu.train.losses import cross_entropy_positive_labels
from csn_tpu.train.metrics import MidfcIoUAccumulator
from csn_tpu.train.optim import make_optimizer, set_lr

BIG_CLASSES = ("Chair", "Lamp", "StorageFurniture", "Table")


@dataclasses.dataclass
class MidfcConfig:
    logs_dir: str = "logs/backbone_fc_ssa_logit"
    ssa_logs_dir: str = ""
    partname: str = "Bed"
    num_classes: int = 15
    n_heads: int = 1
    K: int = 1
    batch_size: int = 8
    d_model: int = 256               # == feature channels (256 for real fc_1)
    lr: float = 1e-3
    weight_decay: float = 1e-4       # ssa default; csa uses 5e-4
    gradient_accumulation_steps: int = 32
    epochs: int = 200
    testing: bool = False            # `--testing`: break every loop after one batch
    chunk_size: Optional[int] = 500
    # 'auto' = flash kernels on TPU, dense elsewhere. Flash on the SAME
    # 500-pt chunk grid keeps the reference's block-diagonal semantics
    # (online softmax is exact; dropout moves in-kernel) and measured
    # 226 -> 192 ms/step on the CSA bench protocol — the win is not
    # materializing the [80,8,500,500] attn tensor around the dropout.
    # SCOPE (intentional): 'auto' covers every training-INTERNAL surface —
    # grad steps, the knn-graph feature extraction/rebuild (save_knn and
    # the two-phase CSA update), and in-training validation — so graphs
    # are built and consumed by the same numerics (flash uses bf16 MXU
    # operands; near-tie neighbor ranks can differ from dense by ~1e-3).
    # The checkpoint-parity surface (get_csa_pred / --attention_type
    # pred) pins False (+f32).
    use_flash: object = "auto"       # 'auto' | True | False
    num_points: int = 10000
    seed: int = 0
    # Multi-chip (parallel/midfc.py): 'data' shards the batch (psum grads),
    # 'seq' shards the point axis (chunked attention is block-diagonal, so
    # point shards are independent; pooled compatibility descriptors pmean).
    # data_parallel * seq_parallel chips; batch_size % data_parallel == 0 and
    # (num_points/seq_parallel) % chunk_size == 0. seq_parallel is the HBM
    # lever: the B=8 protocol OOMs single-chip and fits at seq_parallel=2.
    data_parallel: int = 1
    seq_parallel: int = 1
    # activation dtype of the attention stack (the logit head always
    # computes f32). f32 DEFAULT is a measured choice, not caution: bf16
    # is 15% SLOWER for this head on v5e (CSA step 228 -> 264 ms at B=4,
    # bench BENCH_MIDFC_DTYPE A/B 2026-08-18 — the d_k=256-per-head
    # geometry runs near the MXU f32 roofline and the cast/convert
    # overhead outweighs the bf16 matmul rate). Learning check:
    # scripts/learning_check.py --task midfc (both dtypes converge
    # identically to 4dp). get_csa_pred pins float32 for checkpoint-eval
    # parity independently of this default.
    compute_dtype: str = "float32"


def _save(params, path):
    # atomic: a crash mid-write must not truncate the best-IoU checkpoint
    # this path overwrites in place
    from csn_tpu.train.checkpoint import _atomic_write_bytes

    _atomic_write_bytes(path, serialization.to_bytes(params))
    logging.info("model saved to: %s!", path)


def load_params(params_template, path):
    with open(path, "rb") as f:
        return serialization.from_bytes(params_template, f.read())


def _write_summary_csv(path, partname, value):
    with open(path, "w") as f:
        f.write(f",{partname}\n0,{value}\n")


class MidfcRunner:
    """Shared jit/step machinery for SSA and CSA phases."""

    def __init__(self, cfg: MidfcConfig, attention_type: str):
        self.cfg = cfg
        self.attention_type = attention_type
        from csn_tpu.config import resolve_compute_dtype

        use_flash = cfg.use_flash
        if use_flash == "auto":
            use_flash = jax.default_backend() == "tpu"
        self.model = get_model(attention_type, cfg.num_classes, cfg.n_heads,
                               K=cfg.K, chunk_size=cfg.chunk_size,
                               use_flash=bool(use_flash),
                               d_model=cfg.d_model,
                               compute_dtype=resolve_compute_dtype(
                                   cfg.compute_dtype))
        self.optimizer = make_optimizer(
            optimizer="Adam", lr=cfg.lr, adam_beta1=0.5, adam_beta2=0.999,
            weight_decay=cfg.weight_decay)
        self.params = None
        self.opt_state = None
        self.rng = np.random.default_rng(cfg.seed)
        self.jax_rng = jax.random.PRNGKey(cfg.seed)
        self.lr = cfg.lr

        # params/opt_state are rebound to the returns at the sole call site
        # (train epoch loop), so donate: the 3x-param-sized (params, m, v)
        # Adam state updates in place instead of double-buffering.
        # INVARIANT: pre-update buffers are deleted by donation — readers of
        # params (the best-IoU _save) must run before the next _apply call or
        # np.asarray-copy first (same contract as trainer.py _apply_step,
        # pinned by tests/test_trainer.py::test_apply_step_donates_...).
        self._apply = jax.jit(self._make_apply(), donate_argnums=(0, 1))
        n_par = cfg.data_parallel * cfg.seq_parallel
        if n_par > 1:
            from csn_tpu.parallel.midfc import make_midfc_mesh, \
                make_midfc_steps

            self.mesh = make_midfc_mesh(cfg.data_parallel, cfg.seq_parallel)
            steps = make_midfc_steps(self.model, attention_type, self.mesh)
            self._grad = steps.grad
            self._eval = steps.eval
            self._ssa_feats = steps.ssa_feats
        else:
            self.mesh = None
            self._grad = jax.jit(self._make_grad())
            self._eval = jax.jit(self._make_eval())
            self._ssa_feats = jax.jit(self._make_ssa_feats())

    def _call_model(self, params, feats, neighbors, train, rng=None):
        kwargs = dict(train=train)
        rngs = {"dropout": rng} if rng is not None else None
        if self.attention_type == "csa":
            return self.model.apply({"params": params}, feats, neighbors,
                                    rngs=rngs, **kwargs)
        return self.model.apply({"params": params}, feats, rngs=rngs, **kwargs)

    def _make_grad(self):
        def step(params, feats, labels, neighbors, rng):
            def loss_fn(p):
                logits = self._call_model(p, feats, neighbors, True, rng)
                return cross_entropy_positive_labels(logits, labels)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            # NaN-loss zeroing (`ssa_training.py:142-143`)
            isnan = jnp.isnan(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(isnan, jnp.zeros_like(g), g), grads)
            loss = jnp.where(isnan, 0.0, loss)
            return loss, grads

        return step

    def _make_apply(self):
        def step(params, opt_state, grads):
            updates, new_opt = self.optimizer.update(grads, opt_state, params)
            return jax.tree_util.tree_map(lambda p, u: p + u, params,
                                          updates), new_opt

        return step

    def _make_eval(self):
        def step(params, feats, neighbors):
            logits = self._call_model(params, feats, neighbors, False)
            loss = None  # computed host-side per-batch below if needed
            return logits

        return step

    def _make_ssa_feats(self):
        def step(params, feats):
            return self.model.apply({"params": params}, feats,
                                    method=CrossShapeAt.get_ssa_feats)

        return step

    def initialize(self, sample_feats, sample_neighbors=None):
        init_rng, self.jax_rng = jax.random.split(self.jax_rng)

        def init_fn(r, f, n):
            if self.attention_type == "csa":
                return self.model.init(r, f, n, train=False)
            return self.model.init(r, f, train=False)

        # param shapes are batch/point independent: init traces a forward on
        # ONE shape instead of the full global batch, so a (data, seq) mesh
        # run no longer pays a single-chip full-batch forward at startup
        # (ADVICE r3 — this capped the scale the mesh could reach)
        f0 = jnp.asarray(sample_feats)[:1]
        n0 = (None if sample_neighbors is None
              else jnp.asarray(sample_neighbors)[:1])
        variables = jax.jit(init_fn)(init_rng, f0, n0)
        self.params = variables["params"]
        self.opt_state = self.optimizer.init(self.params)

    # -- loops ---------------------------------------------------------------
    def train_epoch(self, dataset, is_csa: bool) -> float:
        """One epoch with gradient accumulation
        (`ssa_training.py:125-156`, `csa_training.py:191-222`)."""
        cfg = self.cfg
        running, count = 0.0, 0
        grads_acc, n_acc = None, 0
        batches = dataset.batches(cfg.batch_size, shuffle=not is_csa,
                                  rng=self.rng)
        n_batches = (len(dataset) + cfg.batch_size - 1) // cfg.batch_size
        for bi, data in enumerate(batches):
            if is_csa:
                feats, labels, neighbors, _ = data
                neighbors = jnp.asarray(neighbors)
            else:
                feats, labels, _ = data
                neighbors = None
            rng, self.jax_rng = jax.random.split(self.jax_rng)
            loss, grads = self._grad(self.params, jnp.asarray(feats),
                                     jnp.asarray(labels), neighbors, rng)
            # NOTE: the returned "train loss" is mean_CE / accumulation_steps
            # BY DESIGN — the reference divides the same way before summing
            # (`csa_training.py train_layers: loss /= args.gradient_
            # accumulation_steps; running_loss += loss.item(); /= len(...)`),
            # so its logged train loss sits ~32x below val loss too. Kept for
            # log parity; do not "fix" one side only.
            running += float(loss) / cfg.gradient_accumulation_steps
            count += 1
            if grads_acc is None:
                grads_acc, n_acc = grads, 1
            else:
                grads_acc = jax.tree_util.tree_map(lambda a, b: a + b,
                                                   grads_acc, grads)
                n_acc += 1
            if ((bi + 1) % cfg.gradient_accumulation_steps == 0
                    or (bi + 1) == n_batches):
                grads_acc = jax.tree_util.tree_map(lambda g: g / n_acc,
                                                   grads_acc)
                self.opt_state = set_lr(self.opt_state, self.lr)
                self.params, self.opt_state = self._apply(
                    self.params, self.opt_state, grads_acc)
                grads_acc, n_acc = None, 0
            if cfg.testing:
                break
        return running / max(count, 1)

    def validate(self, dataset, is_csa: bool) -> Tuple[float, float]:
        """Returns (iou_avg, mean loss) with the MID-FC metric
        (`ssa_training.py:158-192`)."""
        cfg = self.cfg
        acc = MidfcIoUAccumulator(cfg.num_classes)
        running, count = 0.0, 0
        for data in dataset.batches(cfg.batch_size):
            if is_csa:
                feats, labels, neighbors, valid = data
                neighbors = jnp.asarray(neighbors)
            else:
                feats, labels, valid = data
                neighbors = None
            logits = self._eval(self.params, jnp.asarray(feats), neighbors)
            logits_np = np.asarray(logits)[:valid]
            labels_np = labels[:valid]
            loss = float(cross_entropy_positive_labels(
                jnp.asarray(logits_np), jnp.asarray(labels_np)))
            if not np.isnan(loss):
                running += loss
                count += 1
            pred = np.argmax(logits_np, axis=-1)
            for b in range(valid):
                acc.update(pred[b], labels_np[b])
            if cfg.testing:
                break
        return acc.result(), running / max(count, 1)

    def all_ssa_feats(self, dataset) -> np.ndarray:
        """`csa_models.py:282-300`: SSA features for every shape [N, P, d]
        (fp16 on host)."""
        out = []
        for feats, _labels, valid in dataset.batches(self.cfg.batch_size):
            f = self._ssa_feats(self.params, jnp.asarray(feats))
            out.append(np.asarray(f)[:valid].astype(np.float16))
        return np.concatenate(out)

    def global_max_feats(self, dataset) -> np.ndarray:
        """Max-pooled SSA descriptors for KMeans (`csa_models.py:302-319`)."""
        out = []
        for feats, _labels, valid in dataset.batches(self.cfg.batch_size):
            f = self._ssa_feats(self.params, jnp.asarray(feats))
            out.append(np.asarray(f.max(axis=1))[:valid])
        return np.concatenate(out)


def compute_knn_graphs(runner: MidfcRunner, train_ds: FeaturesDataset,
                       test_ds: FeaturesDataset, K: int, partname: str
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """kNN graphs for train (vs train) and test (vs train). Big categories
    use the KMeans candidate path (`csa_training.py:136-163`)."""
    if partname in BIG_CLASSES:
        glob = runner.global_max_feats(train_ds)
        cand = np.sort(kmeans_candidate_indices(glob))
        tr = runner.all_ssa_feats(train_ds)
        te = runner.all_ssa_feats(test_ds)
        cand_feats = tr[cand]
        ones = np.ones(tr.shape[:2], dtype=bool)
        m_tr = retrieval_measure(tr, ones, cand_feats,
                                 np.ones(cand_feats.shape[:2], dtype=bool))
        m_te = retrieval_measure(te, np.ones(te.shape[:2], dtype=bool),
                                 cand_feats,
                                 np.ones(cand_feats.shape[:2], dtype=bool))
        tr_rows = cand[knn_graph_topk_rows(m_tr, K)]
        te_rows = cand[knn_graph_topk_rows(m_te, K)]
        return tr_rows, te_rows
    tr = runner.all_ssa_feats(train_ds)
    te = runner.all_ssa_feats(test_ds)
    ones_tr = np.ones(tr.shape[:2], dtype=bool)
    ones_te = np.ones(te.shape[:2], dtype=bool)
    m_tr = retrieval_measure(tr, ones_tr, tr, ones_tr)
    m_te = retrieval_measure(te, ones_te, tr, ones_tr)
    return knn_graph_topk_rows(m_tr, K), knn_graph_topk_rows(m_te, K)


def save_knn_graphs(runner: MidfcRunner, train_ds, test_ds, K: int,
                    partname: str, logs_root: str = "logs"):
    """Write `logs/knn_graphs/n_heads_*/{part}/{train,test}.npy`
    (`csa_training.py:286-290` layout; fixes the missing save_knn_graph.py)."""
    out_dir = os.path.join(logs_root, "knn_graphs",
                           f"n_heads_{runner.cfg.n_heads}", partname)
    os.makedirs(out_dir, exist_ok=True)
    tr, te = compute_knn_graphs(runner, train_ds, test_ds, K, partname)
    np.save(os.path.join(out_dir, "train.npy"), tr)
    np.save(os.path.join(out_dir, "test.npy"), te)
    return out_dir


def train_ssa(cfg: MidfcConfig, train_ds: FeaturesDataset,
              test_ds: FeaturesDataset) -> Tuple[float, str]:
    """`ssa_training.py:194-258`. Returns (best IoU, checkpoint path)."""
    runner = MidfcRunner(cfg, "ssa")
    f0, l0, _ = next(iter(train_ds.batches(cfg.batch_size)))
    runner.initialize(f0)
    os.makedirs(cfg.logs_dir, exist_ok=True)
    save_name = os.path.join(cfg.logs_dir, "trained_layers.msgpack")
    df_path = os.path.join(cfg.logs_dir, "test_summaries.csv")

    T = cfg.epochs
    best_iou = 0.0
    for t in range(T):
        train_loss = runner.train_epoch(train_ds, is_csa=False)
        val_iou, val_loss = runner.validate(test_ds, is_csa=False)
        logging.info("iter: %d/%d train_loss: %g val_loss: %g val_IoU: %g "
                     "best_IoU: %g", t + 1, T, train_loss, val_loss, val_iou,
                     best_iou)
        if val_iou > best_iou:
            best_iou = val_iou
            _save(runner.params, save_name)
            _write_summary_csv(df_path, cfg.partname, val_iou * 100)
        if (t + 1) == T // 20 or (t + 1) == (3 * T) // 4:
            runner.lr *= 0.1
        if cfg.testing:
            break
    return best_iou, save_name


def train_csa(cfg: MidfcConfig, train_root: str, test_root: str,
              train_knn_graph: np.ndarray, test_knn_graph: np.ndarray,
              ssa_params_path: Optional[str] = None,
              history: Optional[list] = None) -> Tuple[float, str]:
    """`csa_training.py:261-387`: two 24-epoch phases with a graph rebuild in
    between. Returns (best IoU, checkpoint path). `history`, when given,
    collects one dict per epoch (phase/epoch/train_loss/val_loss/val_iou) —
    trajectory-level evidence for the convergence soak."""
    runner = MidfcRunner(cfg, "csa")
    train_plain = FeaturesDataset(train_root, cfg.num_points)
    test_plain = FeaturesDataset(test_root, cfg.num_points)

    csa_train = CSAFeaturesDataset(train_root, train_root, train_knn_graph,
                                   cfg.K, cfg.num_points)
    csa_test = CSAFeaturesDataset(test_root, train_root, test_knn_graph,
                                  cfg.K, cfg.num_points,
                                  same_collection=False)

    f0, l0, n0, _ = next(iter(csa_train.batches(cfg.batch_size)))
    runner.initialize(f0, n0)
    if ssa_params_path:
        # `utils.py:29-39`: copy the SSA-trained attention/logit weights into
        # the CSA model. The module trees share names, so merge directly.
        # single-device template runner: only its param TREE is used (the
        # mesh steps of the real runner are what train)
        ssa_runner = MidfcRunner(dataclasses.replace(
            cfg, data_parallel=1, seq_parallel=1), "ssa")
        ssa_runner.initialize(f0)
        ssa_params = load_params(ssa_runner.params, ssa_params_path)
        merged = dict(runner.params)
        for k in ssa_params:
            merged[k] = ssa_params[k]
        runner.params = type(runner.params)(merged) \
            if not isinstance(runner.params, dict) else merged
        logging.info("trained_ssa_layers imported!")

    os.makedirs(cfg.logs_dir, exist_ok=True)
    save_name = os.path.join(cfg.logs_dir, "trained_layers.msgpack")
    df_path = os.path.join(cfg.logs_dir, "test_summaries.csv")
    best_iou = 0.0

    def phase(csa_train, csa_test, best_iou, phase_idx=0):
        runner.lr = cfg.lr
        runner.opt_state = runner.optimizer.init(runner.params)
        T = 24
        for t in range(T):
            train_loss = runner.train_epoch(csa_train, is_csa=True)
            val_iou, val_loss = runner.validate(csa_test, is_csa=True)
            if history is not None:
                history.append(dict(phase=phase_idx, epoch=t,
                                    train_loss=float(train_loss),
                                    val_loss=float(val_loss),
                                    val_iou=float(val_iou)))
            logging.info("iter: %d/%d train_loss: %g val_loss: %g "
                         "val_IoU: %g best_IoU: %g", t + 1, T, train_loss,
                         val_loss, val_iou * 100, best_iou)
            if val_iou > best_iou:
                best_iou = val_iou
                _save(runner.params, save_name)
                _write_summary_csv(df_path, cfg.partname, val_iou * 100)
            # scheduler stepped at epochs 10 and 18 (`csa_training.py:335`)
            if (t + 1) == 10 or (t + 1) == (3 * T) // 4:
                runner.lr *= 0.1
            if cfg.testing:
                break
        return best_iou

    best_iou = phase(csa_train, csa_test, best_iou, phase_idx=0)

    # reload best, rebuild graph, phase 2 (`csa_training.py:341-376`)
    runner.params = load_params(runner.params, save_name)
    logging.info("Updating KNN graph....")
    tr_graph, te_graph = compute_knn_graphs(runner, train_plain, test_plain,
                                            cfg.K, cfg.partname)
    csa_train = CSAFeaturesDataset(train_root, train_root, tr_graph, cfg.K,
                                   cfg.num_points)
    csa_test = CSAFeaturesDataset(test_root, train_root, te_graph, cfg.K,
                                  cfg.num_points, same_collection=False)
    logging.info("KNN graph UPDATED!")
    best_iou = phase(csa_train, csa_test, best_iou, phase_idx=1)

    runner.params = load_params(runner.params, save_name)
    val_iou, _ = runner.validate(csa_test, is_csa=True)
    logging.info("Final val_IoU: %g", val_iou * 100)
    _write_summary_csv(df_path, cfg.partname, val_iou * 100)
    return best_iou, save_name
