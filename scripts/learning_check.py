"""End-to-end learning evidence on synthetic data with the REAL trainer.

Gradient-correctness check no unit test provides: drives `CSNTrainer` (the
product path: combined (K+1)B backbone, windowed convs, flash attention,
torch-exact SGD with weight decay, plateau machinery) on a synthetic PartNet
category and asserts the train loss falls substantially. Run on TPU:

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python scripts/learning_check.py

Flags: --epochs, --dtype float32|bfloat16 (activation dtype A/B),
--task csn|seg (seg drives SegTrainer/HRNetSeg2S — the bf16-default
learning evidence for the plain segmentation path).
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--dtype", default="auto")
    ap.add_argument("--use_flash", default="auto")
    ap.add_argument("--use_windows", default="auto")
    ap.add_argument("--num_points", type=int, default=2048)
    ap.add_argument("--shapes", type=int, default=16)
    ap.add_argument("--task", default="csn",
                    choices=["csn", "seg", "midfc"])
    ap.add_argument("--steps", type=int, default=150,
                    help="midfc: training steps")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/jaxcache"))
    except Exception:
        pass

    from csn_tpu.config import Config
    from csn_tpu.data.partnet import write_synthetic_partnet

    if args.task == "midfc":
        return midfc_check(args)
    if args.task == "seg":
        from csn_tpu.tasks.main_seg import build_trainer
        model, k = "HRNetSeg2S", 0
    else:
        from csn_tpu.tasks.main_csn import build_trainer
        model, k = "HRNetSimCSN2S", 1

    with tempfile.TemporaryDirectory() as tmp:
        write_synthetic_partnet(tmp, category="Display",
                                n_train=args.shapes, n_val=4, n_test=4,
                                num_points=args.num_points)
        cfg = Config(
            model=model, partnet_path=tmp,
            partnet_category="Display", batch_size=4, val_batch_size=4,
            test_batch_size=4, k_neighbors=k, conv1_kernel_size=5,
            d_model=64, n_head=2, max_epoch=args.epochs, stat_freq=1000,
            num_points=args.num_points, level_shrink=2.0, seed=0,
            compute_dtype=args.dtype, use_flash=args.use_flash,
            use_windows=args.use_windows,
            log_dir=os.path.join(tmp, "logs"),
        ).normalized()
        trainer = build_trainer(cfg)
        trainer.initialize()
        if args.task == "csn":
            trainer.construct_shape_graph(recalculate=False)
        first, last = None, None
        iters_per_epoch = max(args.shapes // cfg.batch_size, 1)
        for i in range(args.epochs * iters_per_epoch):
            trainer._train_iter()
            loss = trainer.losses.val  # AverageMeter: last batch loss
            if first is None:
                first = loss
            last = loss
            if i % (10 * iters_per_epoch) == 0:
                print(f"iter {i:4d} loss {loss:.4f}", flush=True)
        trainer._close_prefetch()
    print(f"RESULT task={args.task} dtype={args.dtype} "
          f"first_loss={first:.4f} last_loss={last:.4f}")
    assert last < 0.8 * first, (
        f"train loss did not fall substantially ({first:.3f} -> {last:.3f})")
    print("LEARNING CHECK PASSED")


def midfc_check(args):
    """MID-FC CSA learning evidence: drive the REAL MidfcRunner step
    (flash-on-chunks on TPU, Adam(0.5,0.999), NaN zeroing) on a learnable
    synthetic task — labels correlated with the features through a fixed
    random projection — and assert the loss falls. The SHIPPED training
    default is float32 (bf16 measured slower for this head, see
    MidfcConfig); --dtype without a value follows that default, and
    --dtype bfloat16 gives the A/B trajectory."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from csn_tpu.midfc.training import MidfcConfig, MidfcRunner

    B, P, C, K = 4, 10000, 256, 4
    # 'auto' here means "the shipped MidfcConfig default" (f32 — measured
    # faster than bf16 for this head), NOT Config's auto->bf16 rule
    dt = MidfcConfig.compute_dtype if args.dtype == "auto" else args.dtype
    cfg = MidfcConfig(num_classes=15, n_heads=8, K=K, batch_size=B,
                      num_points=P, seed=0, compute_dtype=dt)
    runner = MidfcRunner(cfg, "csa")
    rng = np.random.default_rng(0)
    feats_np = rng.normal(size=(B, P, C)).astype(np.float32)
    w = rng.normal(size=(C, 15)).astype(np.float32)
    labels_np = (feats_np @ w).argmax(-1).astype(np.int32) + 1  # labels 1..15
    # 15 classes + positive labels only -> num_classes=15 works with the
    # masked CE (label 0 = unlabeled is absent here)
    feats = jnp.asarray(feats_np)
    labels = jnp.asarray(np.minimum(labels_np, 14))
    neighbors = jnp.asarray(np.stack(
        [feats_np] + [rng.normal(size=(B, P, C)).astype(np.float32)
                      for _ in range(K)], axis=1))
    runner.initialize(feats, neighbors)
    key = jax.random.PRNGKey(0)
    first = last = None
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        loss, grads = runner._grad(runner.params, feats, labels, neighbors,
                                   sub)
        runner.params, runner.opt_state = runner._apply(
            runner.params, runner.opt_state, grads)
        if i % 25 == 0 or i == args.steps - 1:
            lv = float(np.asarray(loss))
            print(f"step {i:4d} loss {lv:.4f}", flush=True)
            if first is None:
                first = lv
            last = lv
    print(f"RESULT task=midfc dtype={dt} "
          f"first_loss={first:.4f} last_loss={last:.4f}")
    assert last < 0.8 * first, (
        f"train loss did not fall substantially ({first:.3f} -> {last:.3f})")
    print("LEARNING CHECK PASSED")


if __name__ == "__main__":
    main()
