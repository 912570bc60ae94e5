"""Per-category MID-FC launcher + summary aggregation.

Port of `MID-FC/run_training.py` (SSA/CSA per-category launches with the
hyperparameter tables at `run_training.py:7-23`), `run_save_knn.py` (kNN
graph precomputation; the referenced `save_knn_graph.py` is missing upstream
— functionality restored here), `run_csa_pred.py` (pretrained per-category
eval loop; upstream ships it with a syntax error at `:52` — `pred` mode
here), and the summary CSV collection (`run_training.py:123-138`). SLURM
job farming maps to sequential / external launcher invocation: one process
per category, exactly like the reference's one-job-per-category scheme.

Usage:
  python -m csn_tpu.midfc.run_training --attention_type ssa \
      --data_root <root with {train,test}/<Cat>/{fc_1,point_labels}> \
      --start 0 --end 16
  python -m csn_tpu.midfc.run_training --attention_type save_knn ...
  python -m csn_tpu.midfc.run_training --attention_type csa --K 4 ...
"""

from __future__ import annotations

import argparse
import os

import numpy as np

NAMES = ["Bed", "Bottle", "Chair", "Clock", "Dishwasher", "Display", "Door",
         "Earphone", "Faucet", "Knife", "Lamp", "Microwave", "Refrigerator",
         "StorageFurniture", "Table", "TrashCan", "Vase"]
TRAIN_NUM = [133, 315, 4489, 406, 111, 633, 149, 147, 435, 221, 1554, 133,
             136, 1588, 5707, 221, 741]
MAX_ITERS = [3000, 3000, 20000, 5000, 3000, 5000, 3000, 3000, 5000, 3000,
             10000, 3000, 3000, 10000, 20000, 3000, 10000]
TEST_NUM = [37, 84, 1217, 98, 51, 191, 51, 53, 132, 77, 419, 39, 31, 451,
            1668, 63, 233]
VAL_NUM = [24, 37, 617, 50, 19, 104, 25, 28, 81, 29, 234, 12, 20, 230, 843,
           37, 102]
SEG_NUM = [15, 9, 39, 11, 7, 4, 5, 10, 12, 10, 41, 6, 7, 24, 51, 11, 6]


def main(argv=None):
    from csn_tpu.utils.platform import honor_env_platform

    honor_env_platform()  # virtual-mesh runs (--data_parallel/--seq_parallel)
    from csn_tpu.midfc.data import FeaturesDataset
    from csn_tpu.midfc.training import (
        MidfcConfig, MidfcRunner, load_params, save_knn_graphs, train_csa,
        train_ssa,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", type=str, required=True,
                    help="root with {train,test}/<Category>/{fc_1,point_labels}")
    ap.add_argument("--logs_root", type=str, default="logs")
    ap.add_argument("--attention_type", type=str, default="ssa",
                    choices=["ssa", "csa", "save_knn", "pred"])
    ap.add_argument("--K", type=int, default=1)
    ap.add_argument("--n_heads", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--gradient_accumulation_steps", type=int, default=2)
    ap.add_argument("--run", type=int, default=1)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=16)
    ap.add_argument("--testing", action="store_true")
    from csn_tpu.midfc import chunk_size_arg

    ap.add_argument("--chunk_size", type=chunk_size_arg, default=500,
                    help="attention chunk (reference: 500); 0 = FULL "
                    "attention over the point set (the TPU upgrade path; "
                    "under --seq_parallel it runs ring_attention)")
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--num_points", type=int, default=10000)
    ap.add_argument("--data_parallel", type=int, default=1,
                    help="shard the batch over this many chips (psum grads)")
    ap.add_argument("--seq_parallel", type=int, default=1,
                    help="shard the point axis over this many chips "
                    "(block-diagonal chunked attention is point-parallel; "
                    "the HBM lever for large batch sizes)")
    args = ap.parse_args(argv)
    chunk_size = args.chunk_size if args.chunk_size > 0 else None

    at = args.attention_type
    if at == "ssa":
        logs_base = os.path.join(
            args.logs_root, f"ssa_n_heads_{args.n_heads}", f"run_{args.run}")
    elif at == "pred":
        # pretrained-eval loop (`MID-FC/run_csa_pred.py`, which upstream
        # ships with a syntax error at :52): per-category get_csa_pred over
        # logs_root/pretrained_models/run_{run}/<Cat> checkpoints and the
        # published knn_graphs/n_heads_{n}/<Cat> graphs when present.
        logs_base = os.path.join(args.logs_root, "pretrained_models",
                                 f"run_{args.run}")
    else:
        logs_base = os.path.join(
            args.logs_root,
            f"sgd_csa_n_heads_{args.n_heads}_K_{args.K}", f"run_{args.run}")

    ious = {}
    for k, name in enumerate(NAMES):
        if k < args.start or k > args.end:
            continue
        train_root = os.path.join(args.data_root, "train", name)
        test_root = os.path.join(args.data_root, "test", name)
        if at == "pred":
            from csn_tpu.midfc import get_csa_pred

            cat_dir = os.path.join(logs_base, name)
            pred_argv = [
                "--data_root", args.data_root,
                "--logs_dir", cat_dir,
                "--partname", name,
                "--num_classes", str(SEG_NUM[k]),
                "--n_heads", str(args.n_heads),
                "--K", str(args.K),
                "--batch_size", str(args.batch_size),
                "--chunk_size", str(args.chunk_size),
                "--d_model", str(args.d_model),
                "--num_points", str(args.num_points),
            ]
            msgpack = os.path.join(cat_dir, "trained_layers.msgpack")
            pth = os.path.join(cat_dir, "trained_layers.pth")
            if os.path.exists(msgpack):
                pred_argv += ["--msgpack_ckpt", msgpack]
            elif os.path.exists(pth):
                pred_argv += ["--torch_ckpt", pth]
            graph_dir = os.path.join(args.logs_root, "pretrained_models",
                                     "knn_graphs", f"n_heads_{args.n_heads}",
                                     name)
            if os.path.exists(os.path.join(graph_dir, "test.npy")):
                pred_argv += ["--knn_graph_dir", graph_dir]
            ious[name] = get_csa_pred.main(pred_argv) * 100
            continue
        cfg = MidfcConfig(
            logs_dir=os.path.join(logs_base, name), partname=name,
            num_classes=SEG_NUM[k], n_heads=args.n_heads, K=args.K,
            batch_size=args.batch_size, lr=args.lr,
            weight_decay=args.weight_decay,
            gradient_accumulation_steps=args.gradient_accumulation_steps,
            testing=args.testing, chunk_size=chunk_size,
            d_model=args.d_model, num_points=args.num_points,
            data_parallel=args.data_parallel,
            seq_parallel=args.seq_parallel)

        if at == "ssa":
            best, _ = train_ssa(cfg, FeaturesDataset(train_root,
                                                     cfg.num_points),
                                FeaturesDataset(test_root, cfg.num_points))
            ious[name] = best * 100
        elif at == "save_knn":
            runner = MidfcRunner(cfg, "ssa")
            tr_ds = FeaturesDataset(train_root, cfg.num_points)
            te_ds = FeaturesDataset(test_root, cfg.num_points)
            f0, _, _ = next(iter(tr_ds.batches(cfg.batch_size)))
            runner.initialize(f0)
            ssa_path = os.path.join(args.logs_root,
                                    f"ssa_n_heads_{args.n_heads}",
                                    f"run_{args.run}", name,
                                    "trained_layers.msgpack")
            if os.path.exists(ssa_path):
                runner.params = load_params(runner.params, ssa_path)
            save_knn_graphs(runner, tr_ds, te_ds, args.K, name,
                            logs_root=args.logs_root)
        else:  # csa
            graph_dir = os.path.join(args.logs_root, "knn_graphs",
                                     f"n_heads_{args.n_heads}", name)
            tr_graph = np.load(os.path.join(graph_dir, "train.npy"))
            te_graph = np.load(os.path.join(graph_dir, "test.npy"))
            ssa_path = os.path.join(args.logs_root,
                                    f"ssa_n_heads_{args.n_heads}",
                                    f"run_{args.run}", name,
                                    "trained_layers.msgpack")
            best, _ = train_csa(cfg, train_root, test_root, tr_graph,
                                te_graph,
                                ssa_params_path=ssa_path
                                if os.path.exists(ssa_path) else None)
            ious[name] = best * 100

    if ious:
        mean_iou = sum(ious.values()) / len(ious)
        for name, iou in ious.items():
            print(f"name: {name}, iou: {iou}")
        print(f"\n mean_IoU: {mean_iou}\n")
        if at == "pred":
            os.makedirs(logs_base, exist_ok=True)
            out_csv = os.path.join(logs_base, "part_IoU_summaries.csv")
            with open(out_csv, "w") as f:
                f.write("," + ",".join(ious) + ",mean\n")
                f.write("0," + ",".join(f"{v}" for v in ious.values())
                        + f",{mean_iou}\n")
            print(f"-> {out_csv}")
    return ious


if __name__ == "__main__":
    main()
