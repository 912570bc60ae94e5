"""MID-FC branch tests: torch-checkpoint parity (golden oracle implemented in
torch here, mirroring the reference math), data padding, training smoke."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF


class TorchCrossShapeAt(tnn.Module):
    """Independent torch oracle of the reference head semantics
    (`MID-FC/csa_models.py:37-242`): chunked post-norm MHA (d_k=d_v=d_model),
    no-bias logit conv, biased compatibility linears, cosine softmax."""

    def __init__(self, num_classes, d_model, n_heads, chunk, csa=False):
        super().__init__()
        self.d_model, self.n_heads, self.chunk = d_model, n_heads, chunk
        self.csa = csa
        dk = d_model
        self.attention = tnn.ModuleDict({})
        self.w_qs = tnn.Linear(d_model, n_heads * dk, bias=False)
        self.w_ks = tnn.Linear(d_model, n_heads * dk, bias=False)
        self.w_vs = tnn.Linear(d_model, n_heads * dk, bias=False)
        self.fc = tnn.Linear(n_heads * dk, d_model, bias=False)
        self.norm = tnn.LayerNorm(d_model, eps=1e-6)
        self.logit = tnn.Linear(d_model, num_classes, bias=False)
        if csa:
            self.compatibility_q = tnn.Linear(d_model, d_model)
            self.compatibility_k = tnn.Linear(d_model, d_model)

    def mha_chunked(self, q, k, v):
        b, p, d = q.shape
        n = p // self.chunk
        outs = []
        for i in range(n):
            sl = slice(i * self.chunk, (i + 1) * self.chunk)
            outs.append(self.mha(q[:, sl], k[:, sl], v[:, sl]))
        return torch.cat(outs, dim=1)

    def mha(self, q, k, v):
        b, lq, d = q.shape
        h, dk = self.n_heads, self.d_model
        residual = q
        qh = self.w_qs(q).view(b, lq, h, dk).transpose(1, 2)
        kh = self.w_ks(k).view(b, lq, h, dk).transpose(1, 2)
        vh = self.w_vs(v).view(b, lq, h, dk).transpose(1, 2)
        attn = torch.softmax(qh @ kh.transpose(2, 3) / dk ** 0.5, dim=-1)
        out = (attn @ vh).transpose(1, 2).contiguous().view(b, lq, h * dk)
        return self.norm(self.fc(out) + residual)

    def forward(self, x, neighbors=None):
        if not self.csa:
            return self.logit(self.mha_chunked(x, x, x))
        kp1 = neighbors.shape[1]
        y_q = self.mha_chunked(x, x, x).mean(dim=1)
        pools = [y_q]
        for kk in range(1, kp1):
            xk = neighbors[:, kk]
            pools.append(self.mha_chunked(xk, xk, xk).mean(dim=1))
        u_q = tF.normalize(self.compatibility_q(y_q), dim=-1)
        u_k = tF.normalize(self.compatibility_k(torch.stack(pools, dim=1)),
                           dim=-1)
        comp = torch.softmax(
            torch.einsum("bd,bkd->bk", u_q, u_k), dim=-1)
        csa = comp[:, 0, None, None] * self.mha_chunked(x, x, x)
        for kk in range(1, kp1):
            xk = neighbors[:, kk]
            csa = csa + comp[:, kk, None, None] * self.mha_chunked(x, xk, xk)
        return self.logit(csa)

    def reference_state_dict(self):
        """Rename to the reference on-disk naming for the converter."""
        sd = {}
        sd["attention.w_qs.weight"] = self.w_qs.weight.detach()
        sd["attention.w_ks.weight"] = self.w_ks.weight.detach()
        sd["attention.w_vs.weight"] = self.w_vs.weight.detach()
        sd["attention.fc.weight"] = self.fc.weight.detach()
        sd["attention.norm.weight"] = self.norm.weight.detach()
        sd["attention.norm.bias"] = self.norm.bias.detach()
        sd["logit.weight"] = self.logit.weight.detach()[:, :, None, None]
        if self.csa:
            sd["compatibility_q.weight"] = self.compatibility_q.weight.detach()
            sd["compatibility_q.bias"] = self.compatibility_q.bias.detach()
            sd["compatibility_k.weight"] = self.compatibility_k.weight.detach()
            sd["compatibility_k.bias"] = self.compatibility_k.bias.detach()
        return {k: v.numpy() for k, v in sd.items()}


def build_jax_model(attention_type, num_classes, d_model, n_heads, chunk, K=0):
    from csn_tpu.midfc.model import CrossShapeAt

    return CrossShapeAt(num_classes=num_classes, d_model=d_model,
                        n_heads=n_heads, K=K, d_k=d_model, d_v=d_model,
                        attention_type=attention_type, after_fc=True,
                        chunk_size=chunk)


def test_ssa_torch_checkpoint_parity():
    from csn_tpu.midfc.convert import convert_state_dict

    torch.manual_seed(0)
    B, P, D, C, H, CH = 2, 40, 16, 5, 2, 20
    tm = TorchCrossShapeAt(C, D, H, CH).eval()
    x = torch.randn(B, P, D)
    with torch.no_grad():
        ref = tm(x).numpy()

    params, _ = convert_state_dict(tm.reference_state_dict())
    model = build_jax_model("ssa", C, D, H, CH)
    out = model.apply({"params": params}, jnp.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_csa_torch_checkpoint_parity():
    from csn_tpu.midfc.convert import convert_state_dict

    torch.manual_seed(1)
    B, P, D, C, H, CH, K = 1, 40, 16, 5, 2, 20, 2
    tm = TorchCrossShapeAt(C, D, H, CH, csa=True).eval()
    x = torch.randn(B, P, D)
    nb = torch.randn(B, K + 1, P, D)
    nb[:, 0] = x
    with torch.no_grad():
        ref = tm(x, nb).numpy()

    params, _ = convert_state_dict(tm.reference_state_dict())
    model = build_jax_model("csa", C, D, H, CH, K=K)
    out = model.apply({"params": params}, jnp.asarray(x.numpy()),
                      jnp.asarray(nb.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)


@pytest.fixture(scope="module")
def midfc_roots(tmp_path_factory):
    from csn_tpu.midfc.data import write_synthetic_midfc

    root = tmp_path_factory.mktemp("midfc")
    tr = write_synthetic_midfc(str(root / "train"), n_shapes=6, num_points=40,
                               channels=16, num_classes=5, seed=0)
    te = write_synthetic_midfc(str(root / "test"), n_shapes=4, num_points=40,
                               channels=16, num_classes=5, seed=1)
    return tr, te


def test_features_dataset_padding(midfc_roots):
    from csn_tpu.midfc.data import FeaturesDataset

    ds = FeaturesDataset(midfc_roots[0], num_points=40)
    feats, label = ds[1]  # shape with 35 points, padded by prefix repetition
    assert feats.shape == (40, 16) and label.shape == (40,)
    np.testing.assert_array_equal(feats[35:], feats[:5])
    np.testing.assert_array_equal(label[35:], label[:5])


def test_ssa_training_smoke(midfc_roots, tmp_path):
    from csn_tpu.midfc.data import FeaturesDataset
    from csn_tpu.midfc.training import MidfcConfig, train_ssa

    tr, te = midfc_roots
    cfg = MidfcConfig(logs_dir=str(tmp_path / "ssa"), partname="Bed",
                      num_classes=5, n_heads=2, batch_size=2, epochs=2,
                      d_model=16, gradient_accumulation_steps=2,
                      chunk_size=20, num_points=40)
    best, path = train_ssa(cfg, FeaturesDataset(tr, 40),
                           FeaturesDataset(te, 40))
    assert os.path.exists(path)
    assert 0.0 <= best <= 1.0
    assert os.path.exists(os.path.join(cfg.logs_dir, "test_summaries.csv"))


def test_csa_training_two_phase(midfc_roots, tmp_path):
    from csn_tpu.midfc.data import FeaturesDataset
    from csn_tpu.midfc.training import (
        MidfcConfig, MidfcRunner, compute_knn_graphs, save_knn_graphs,
        train_csa,
    )

    tr, te = midfc_roots
    cfg = MidfcConfig(logs_dir=str(tmp_path / "csa"), partname="Bed",
                      num_classes=5, n_heads=2, K=1, batch_size=1,
                      d_model=16, weight_decay=5e-4,
                      gradient_accumulation_steps=2, chunk_size=20,
                      num_points=40, testing=True)
    # initial graphs from an untrained runner (stand-in for precomputed ones)
    runner = MidfcRunner(cfg, "ssa")
    tr_ds, te_ds = FeaturesDataset(tr, 40), FeaturesDataset(te, 40)
    f0, _, _ = next(iter(tr_ds.batches(cfg.batch_size)))
    runner.initialize(f0)
    out_dir = save_knn_graphs(runner, tr_ds, te_ds, cfg.K, "Bed",
                              logs_root=str(tmp_path))
    tr_graph = np.load(os.path.join(out_dir, "train.npy"))
    te_graph = np.load(os.path.join(out_dir, "test.npy"))
    assert tr_graph.shape == (6, cfg.K + 1)
    assert te_graph.shape == (4, cfg.K + 1)
    # train-graph top-1 by mean-of-max cosine vs itself is itself
    assert np.all(tr_graph[:, 0] == np.arange(6))

    best, path = train_csa(cfg, tr, te, tr_graph, te_graph)
    assert os.path.exists(path)


def test_convert_released_checkpoint_schema():
    """Parity readiness for the released `trained_layers.pth` (PARITY.md):
    a state dict with the EXACT key names/shapes the released CSA checkpoints
    carry (recorded from the reference module definitions,
    `MID-FC/csa_models.py:146-180`: CrossShapeAt(num_classes, d_model=256,
    n_heads=8, K=4, d_k=d_v=256, attention_type='csa', after_fc=True) —
    including keys unused at eval like fc_1.* and num_batches_tracked) must
    convert into a tree whose every leaf exists in our CrossShapeAt init tree
    with the same shape, so the first online run is turnkey."""
    import jax

    from csn_tpu.midfc.convert import convert_state_dict
    from csn_tpu.midfc.model import get_model

    C = 39  # Chair
    rng = np.random.default_rng(0)

    def arr(*shape):
        return rng.normal(size=shape).astype(np.float32)

    sd = {
        # fc_1 block instantiated by the module even for after_fc=True
        "fc_1.0.0.weight": arr(256, 928, 1, 1),
        "fc_1.0.1.weight": arr(256),
        "fc_1.0.1.bias": arr(256),
        "fc_1.0.1.running_mean": arr(256),
        "fc_1.0.1.running_var": np.abs(arr(256)),
        "fc_1.0.1.num_batches_tracked": np.asarray(100),
        "logit.weight": arr(C, 256, 1, 1),
        "attention.w_qs.weight": arr(8 * 256, 256),
        "attention.w_ks.weight": arr(8 * 256, 256),
        "attention.w_vs.weight": arr(8 * 256, 256),
        "attention.fc.weight": arr(256, 8 * 256),
        "attention.norm.weight": arr(256),
        "attention.norm.bias": arr(256),
        "compatibility_q.weight": arr(256, 256),
        "compatibility_q.bias": arr(256),
        "compatibility_k.weight": arr(256, 256),
        "compatibility_k.bias": arr(256),
    }
    params, stats = convert_state_dict(sd, after_fc=True)
    assert stats == {}  # after_fc=True: no running stats used at eval

    model = get_model("csa", C, n_heads=8, K=4, chunk_size=None)
    x = jnp.zeros((1, 20, 256))
    nbrs = jnp.zeros((1, 5, 20, 256))
    ref = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(
        jax.random.PRNGKey(0), x, nbrs)["params"]

    def shapes(tree):
        return {jax.tree_util.keystr(p): np.asarray(l).shape
                for p, l in jax.tree_util.tree_leaves_with_path(tree)}

    conv_shapes, init_shapes = shapes(params), shapes(ref)
    assert conv_shapes == init_shapes, (
        sorted(set(conv_shapes) ^ set(init_shapes)))


def test_paper_figure_tooling(tmp_path):
    """MID-FC paper-figure helpers (`MID-FC/utils.py:41-105`):
    save_predictions writes per-shape unpadded argmax dumps;
    accumulate_predictions / accumulate_neigh concatenate the render
    columns [pts|gt|midfc_pred|ssa|csa] and [pts|labels]."""
    import numpy as np

    from csn_tpu.midfc.data import FeaturesDataset, write_synthetic_midfc
    from csn_tpu.midfc.paper import (
        accumulate_neigh, accumulate_predictions, save_predictions,
    )
    from csn_tpu.midfc.training import MidfcConfig, MidfcRunner

    rng = np.random.default_rng(0)
    root = str(tmp_path)
    n, P, C, ncls = 4, 24, 8, 5
    for split in ("train", "test"):
        droot = os.path.join(root, "data", split, "Chair")
        write_synthetic_midfc(droot, n_shapes=n, num_points=P, channels=C,
                              num_classes=ncls, seed=0)
        # the extra per-shape dirs of the extraction contract
        for sub in ("pts", "midfc_pred"):
            os.makedirs(os.path.join(droot, sub), exist_ok=True)
        for i in range(n):
            h = P - (i % 3) * 5
            np.save(os.path.join(droot, "pts", f"shape_{i}.npy"),
                    rng.normal(size=(h, 3)).astype(np.float32))
            np.save(os.path.join(droot, "midfc_pred", f"shape_{i}.npy"),
                    rng.integers(0, ncls, size=(h,)))

    cfg = MidfcConfig(logs_dir=os.path.join(root, "logs"), partname="Chair",
                      num_classes=ncls, n_heads=1, K=1, batch_size=2,
                      chunk_size=P // 2, num_points=P, d_model=C)
    runner = MidfcRunner(cfg, "ssa")
    ds = FeaturesDataset(os.path.join(root, "data", "test", "Chair"), P)
    f0, _, _ = next(iter(ds.batches(cfg.batch_size)))
    runner.initialize(f0)

    pred_root = os.path.join(root, "preds", "Chair")
    wrote = save_predictions(runner, ds, os.path.join(pred_root,
                                                      "midfc_ssa"),
                             is_csa=False)
    assert wrote == n
    # reuse the ssa dumps as csa dumps for the accumulator contract
    import shutil

    shutil.copytree(os.path.join(pred_root, "midfc_ssa"),
                    os.path.join(pred_root, "midfc_csa_K_1"))

    out = accumulate_predictions(os.path.join(root, "data"), "Chair",
                                 os.path.join(root, "render"),
                                 pred_root=os.path.join(root, "preds"),
                                 K=1, split="test")
    assert out == n
    a = np.load(os.path.join(root, "render", "Chair", "shape_0.npy"))
    assert a.ndim == 2 and a.shape[1] == 7  # pts(3)+gt+midfc+ssa+csa

    out = accumulate_neigh(os.path.join(root, "data"), "Chair",
                           os.path.join(root, "render_neigh"), split="train")
    assert out == n
    b = np.load(os.path.join(root, "render_neigh", "Chair", "shape_1.npy"))
    assert b.shape[1] == 4  # pts(3)+labels


def test_run_training_pred_mode(tmp_path):
    """`pred` loop of the launcher (reference `MID-FC/run_csa_pred.py`, which
    upstream ships with a syntax error): per-category get_csa_pred over the
    pretrained_models/run_{run} layout, aggregated part_IoU_summaries.csv."""
    import numpy as np

    from csn_tpu.midfc import run_training
    from csn_tpu.midfc.data import write_synthetic_midfc
    from csn_tpu.midfc.training import MidfcConfig, MidfcRunner, _save

    root = str(tmp_path)
    P, C = 24, 8
    for split in ("train", "test"):
        write_synthetic_midfc(os.path.join(root, "data", split, "Bed"),
                              n_shapes=4, num_points=P, channels=C,
                              num_classes=5, seed=0)

    # a "pretrained" CSA checkpoint in the reference's layout (Bed: 15 cls)
    cfg = MidfcConfig(partname="Bed", num_classes=15, n_heads=2, K=1,
                      batch_size=1, d_model=C, chunk_size=P // 2,
                      num_points=P)
    runner = MidfcRunner(cfg, "csa")
    rng = np.random.default_rng(0)
    f0 = rng.normal(size=(1, P, C)).astype(np.float32)
    runner.initialize(f0, np.repeat(f0[:, None], cfg.K + 1, axis=1))
    cat_dir = os.path.join(root, "logs", "pretrained_models", "run_1", "Bed")
    os.makedirs(cat_dir, exist_ok=True)
    _save(runner.params, os.path.join(cat_dir, "trained_layers.msgpack"))

    ious = run_training.main([
        "--data_root", os.path.join(root, "data"),
        "--logs_root", os.path.join(root, "logs"),
        "--attention_type", "pred", "--K", "1", "--n_heads", "2",
        "--batch_size", "1", "--chunk_size", str(P // 2),
        "--d_model", str(C), "--num_points", str(P),
        "--start", "0", "--end", "0",
    ])
    assert set(ious) == {"Bed"} and 0.0 <= ious["Bed"] <= 100.0
    summary = os.path.join(root, "logs", "pretrained_models", "run_1",
                           "part_IoU_summaries.csv")
    assert os.path.exists(summary)
    # the per-category CSV of get_csa_pred is written inside the cat dir too
    assert os.path.exists(os.path.join(cat_dir, "part_IoU_summaries.csv"))


def test_compute_dtype_plumbing():
    """compute_dtype reaches the attention stack (bf16 output differs from
    f32), logits stay f32 either way, and the shipped training default is
    the measured-fastest float32 (bf16 A/B in MidfcConfig docstring)."""
    import jax
    import jax.numpy as jnp

    from csn_tpu.midfc.model import get_model
    from csn_tpu.midfc.training import MidfcConfig

    assert MidfcConfig.compute_dtype == "float32"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 1000, 32)).astype(np.float32))
    outs = {}
    for dt in ("float32", "bfloat16"):
        m = get_model("ssa", 5, n_heads=2, chunk_size=500, d_model=32,
                      compute_dtype=dt)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out.dtype == jnp.float32
        outs[dt] = np.asarray(out)
    diff = np.abs(outs["float32"] - outs["bfloat16"]).max()
    assert 0 < diff < 0.1  # bf16 rounding, not a different computation


def test_use_flash_auto_resolution():
    """MidfcConfig.use_flash='auto' resolves per backend (flash kernels are
    TPU-only); get_csa_pred pins dense+f32 for checkpoint parity."""
    import jax

    from csn_tpu.midfc.training import MidfcConfig, MidfcRunner

    assert MidfcConfig.use_flash == "auto"
    r = MidfcRunner(MidfcConfig(num_classes=5, n_heads=2, K=1, batch_size=1,
                                num_points=1000, d_model=32), "csa")
    expect = jax.default_backend() == "tpu"
    assert r.model.use_flash is expect
    r2 = MidfcRunner(MidfcConfig(num_classes=5, n_heads=2, K=1, batch_size=1,
                                 num_points=1000, d_model=32,
                                 use_flash=False), "csa")
    assert r2.model.use_flash is False
