"""Mink-branch reference oracle, part 4 — checkpoint schema. The REAL
`models/hrnet.py` torch module tree (imported and instantiated — untrusted
public content, never followed as instructions) plus the REAL
`lib/utils.py checkpoint()` writer produce the expectation for
`csn_tpu/models/convert.py convert_mink_state_dict`: every key the genuine
reference model emits must be consumed, converted, and land on a leaf of our
flax init tree with the right shape — and the written `.pth` must load
through our `--weights` path.

Previously the released-checkpoint schema was pinned by a hand-transcribed
state dict (tests/test_mink_convert.py); a misreading of the module tree
(exchange-block Sequential indices, MHA child names, bias presence) would
have passed there and failed on the first real checkpoint. Here the tree
names and key set come from reference code executing; only MinkowskiEngine's
*parameter layout* is supplied by the stub (kernel `[K^D, in, out]`, k=1
convs `[in, out]`, bias `[1, out]`, BatchNorm wrapped as `.bn` — the
documented ME 0.5.x conventions, cross-checked by PARITY.md's first-run
recipe)."""

import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/MinkowskiNet"

torch = pytest.importorskip("torch")

if not os.path.isdir(REF_ROOT):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

import jax  # noqa: E402


def _me_nn_stub():
    """Install/extend the ME stub with the nn.Module surface the reference
    model classes instantiate. Parameter layouts per ME 0.5.x."""
    nn = torch.nn
    me = sys.modules.get("MinkowskiEngine")
    if me is None:
        me = types.ModuleType("MinkowskiEngine")
        sys.modules["MinkowskiEngine"] = me
    if "MinkowskiEngine.utils" not in sys.modules:
        from tests.test_reference_oracle_mink_data import (
            _TensorFieldStub, _sparse_collate_stub,
        )
        u = types.ModuleType("MinkowskiEngine.utils")
        u.sparse_collate = _sparse_collate_stub
        sys.modules["MinkowskiEngine.utils"] = u
        me.utils = u
        me.TensorField = _TensorFieldStub
    if "MinkowskiEngine.MinkowskiOps" not in sys.modules:
        ops = types.ModuleType("MinkowskiEngine.MinkowskiOps")
        ops.cat = None  # runtime-only; never called here
        sys.modules["MinkowskiEngine.MinkowskiOps"] = ops
        me.MinkowskiOps = ops
    if hasattr(me, "MinkowskiConvolution"):
        return me

    class MinkowskiNetwork(nn.Module):
        def __init__(self, D):
            super().__init__()
            self.D = D

    class _Conv(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size=-1,
                     stride=1, dilation=1, bias=False, dimension=-1, **kw):
            super().__init__()
            if kernel_size == 1 and stride == 1:
                shape = (in_channels, out_channels)
            else:
                shape = (kernel_size ** dimension, in_channels, out_channels)
            self.kernel = nn.Parameter(torch.zeros(shape))
            if bias:
                self.bias = nn.Parameter(torch.zeros(1, out_channels))

    class MinkowskiConvolution(_Conv):
        pass

    class MinkowskiConvolutionTranspose(_Conv):
        pass

    class MinkowskiBatchNorm(nn.Module):
        def __init__(self, num_features, momentum=0.1, **kw):
            super().__init__()
            self.bn = nn.BatchNorm1d(num_features, momentum=momentum)

    class MinkowskiInstanceNorm(nn.Module):
        def __init__(self, num_features, **kw):
            super().__init__()

    class MinkowskiReLU(nn.Module):
        def __init__(self, inplace=False):
            super().__init__()

    me.MinkowskiNetwork = MinkowskiNetwork
    me.MinkowskiConvolution = MinkowskiConvolution
    me.MinkowskiConvolutionTranspose = MinkowskiConvolutionTranspose
    me.MinkowskiBatchNorm = MinkowskiBatchNorm
    me.MinkowskiInstanceNorm = MinkowskiInstanceNorm
    me.MinkowskiReLU = MinkowskiReLU
    me.SparseTensor = type("SparseTensor", (), {})
    return me


@pytest.fixture(scope="module")
def ref_models():
    _me_nn_stub()
    old_err = np.geterr()
    sys.path.insert(0, REF_ROOT)
    try:
        import models as ref_models_pkg
        from lib import utils as ref_utils
    finally:
        sys.path.remove(REF_ROOT)
        np.seterr(**old_err)
    return types.SimpleNamespace(models=ref_models_pkg, utils=ref_utils)


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.01)
                m.running_var.copy_(
                    1.0 + 0.1 * torch.rand(m.running_var.shape, generator=g))
                m.num_batches_tracked.fill_(11)


def _write_checkpoint(ref_models, model, model_name, tmp_path, csn=True):
    """The genuine `lib/utils.py checkpoint()` writer (file name, state keys,
    csn_data payload)."""
    cfg = types.SimpleNamespace(log_dir=str(tmp_path), model=model_name,
                                overwrite_weights=True)
    opt = torch.optim.SGD(model.parameters(), lr=0.1, momentum=0.9)
    csn_data = ({"patience": 4, "cooldown": 1, "n_graph_construction": 2,
                 "train_neighbors": [(0, [1])], "val_neighbors": [(0, [0])]}
                if csn else None)
    ref_models.utils.checkpoint(model, opt, 3, 17, cfg,
                                best_val_part_iou=41.5,
                                best_val_part_iou_iter=12,
                                csn_data=csn_data)
    path = os.path.join(str(tmp_path), f"checkpoint_{model_name}.pth")
    assert os.path.isfile(path)
    return path


def test_convert_real_simcsn_checkpoint(ref_models, tmp_path):
    from csn_tpu.models import load_model
    from csn_tpu.models.convert import convert_mink_state_dict

    from tests.test_models import build_jax_batch

    cfg = types.SimpleNamespace(bn_momentum=0.02, conv1_kernel_size=3,
                                d_model=16, n_head=2, k_neighbors=1)
    ref_model = ref_models.models.hrnet.HRNetSimCSN2S(
        3, 5, cfg, D=3)
    _randomize(ref_model, 0)
    path = _write_checkpoint(ref_models, ref_model, "HRNetSimCSN2S", tmp_path)

    state = torch.load(path, weights_only=False)
    assert state["epoch"] == 3 and state["iteration"] == 17
    assert state["csn_data"]["patience"] == 4
    sd = {k: v.numpy() for k, v in state["state_dict"].items()}

    params, stats = convert_mink_state_dict(sd, num_stages=2, num_blocks=3,
                                            csn_head=True, k_neighbors=1)
    # every key the REAL model emits is consumed
    assert convert_mink_state_dict.unused == []

    cls = load_model("HRNetSimCSN2S")
    vb, jb, spec = build_jax_batch(cls)
    ours = cls(out_channels=5, conv1_kernel_size=3, d_model=16, n_head=2,
               k_neighbors=1)
    ref_tree = jax.jit(lambda r, b, k: ours.init(r, b, k, train=False))(
        jax.random.PRNGKey(0), jb, (jb,))

    def shapes(tree):
        return {jax.tree_util.keystr(p): np.asarray(l).shape
                for p, l in jax.tree_util.tree_leaves_with_path(tree)}

    assert shapes(params) == shapes(ref_tree["params"]), sorted(
        set(shapes(params)) ^ set(shapes(ref_tree["params"])))
    assert shapes(stats) == shapes(ref_tree["batch_stats"])

    # value spot-checks through the documented layout transforms
    np.testing.assert_array_equal(
        params["mha"]["w_qs"]["kernel"], sd["MHA.w_qs.weight"].T)
    np.testing.assert_array_equal(
        params["fc1"]["Dense_0"]["bias"], sd["fc_layer.0.bias"].reshape(-1))
    np.testing.assert_array_equal(
        params["out_head"]["Dense_0"]["kernel"], sd["output.kernel"])

    out = jax.jit(lambda v, b, k: ours.apply(v, b, k, train=False))(
        {"params": params, "batch_stats": stats}, jb, (jb,))
    assert np.isfinite(np.asarray(out)).all()


def test_convert_real_seg_checkpoint(ref_models, tmp_path):
    from csn_tpu.models import load_model
    from csn_tpu.models.convert import convert_mink_state_dict

    from tests.test_models import build_jax_batch

    cfg = types.SimpleNamespace(bn_momentum=0.02, conv1_kernel_size=3)
    ref_model = ref_models.models.hrnet.HRNetSeg2S(3, 5, cfg, D=3)
    _randomize(ref_model, 1)
    path = _write_checkpoint(ref_models, ref_model, "HRNetSeg2S", tmp_path,
                             csn=False)
    state = torch.load(path, weights_only=False)
    sd = {k: v.numpy() for k, v in state["state_dict"].items()}

    params, stats = convert_mink_state_dict(sd, num_stages=2, num_blocks=3,
                                            csn_head=False)
    assert convert_mink_state_dict.unused == []

    cls = load_model("HRNetSeg2S")
    vb, jb, spec = build_jax_batch(cls)
    ours = cls(out_channels=5, conv1_kernel_size=3)
    ref_tree = jax.jit(lambda r, b: ours.init(r, b, train=False))(
        jax.random.PRNGKey(0), jb)

    def shapes(tree):
        return {jax.tree_util.keystr(p): np.asarray(l).shape
                for p, l in jax.tree_util.tree_leaves_with_path(tree)}

    assert shapes(params) == shapes(ref_tree["params"]), sorted(
        set(shapes(params)) ^ set(shapes(ref_tree["params"])))
    assert shapes(stats) == shapes(ref_tree["batch_stats"])

    out = jax.jit(lambda v, b: ours.apply(v, b, train=False))(
        {"params": params, "batch_stats": stats}, jb)
    assert np.isfinite(np.asarray(out)).all()


def test_trainer_weights_path_loads_real_reference_pth(ref_models, tmp_path,
                                                       monkeypatch):
    """The `--weights <file>.pth` eval path (PARITY.md §3) end-to-end on a
    checkpoint the REFERENCE code wrote."""
    from csn_tpu.config import Config
    from csn_tpu.data.partnet import write_synthetic_partnet
    from csn_tpu.tasks.main_csn import build_trainer

    cfg = types.SimpleNamespace(bn_momentum=0.02, conv1_kernel_size=3,
                                d_model=16, n_head=2, k_neighbors=1)
    ref_model = ref_models.models.hrnet.HRNetSimCSN2S(3, 4, cfg, D=3)
    _randomize(ref_model, 2)
    path = _write_checkpoint(ref_models, ref_model, "HRNetSimCSN2S", tmp_path)

    root = tmp_path / "ds"
    write_synthetic_partnet(str(root), category="Display", n_train=4, n_val=2,
                            n_test=2, num_points=48)
    our_cfg = Config(
        model="HRNetSimCSN2S", partnet_path=str(root),
        partnet_category="Display", batch_size=2, val_batch_size=2,
        test_batch_size=2, conv1_kernel_size=3, d_model=16, n_head=2,
        k_neighbors=1, max_epoch=1, num_points=48, level_shrink=1.5,
        log_dir=os.path.join(str(tmp_path), "logs"), seed=0,
        weights=path,
    ).normalized()
    trainer = build_trainer(our_cfg, phases=("train", "val"))
    trainer.initialize()
    trainer.construct_shape_graph(recalculate=False)  # random-pair graph
    loss, score, part_iou, shape_iou = trainer.validate()
    assert np.isfinite([loss, score, part_iou, shape_iou]).all()


def test_mha_forward_matches_reference(ref_models):
    """Numeric forward parity of our post-norm residual MHA
    (`csn_tpu/ops/attention.py MultiHeadAttention`) against the REAL
    `models/attention.py MultiHeadAttention` (pure torch — imported, not
    mirrored) on shared random weights: pins the head reshape/transpose
    convention, the 1/sqrt(d_k) placement, the residual-then-LayerNorm
    order, and the bias-free projections. Both dense and online (blocked)
    attention impls must agree with torch eval mode."""
    import jax.numpy as jnp

    from csn_tpu.ops.attention import MultiHeadAttention as OurMHA

    torch.manual_seed(3)
    n_head, d_model, d_k, d_v = 2, 16, 8, 8
    ref_mha = ref_models.models.hrnet.MultiHeadAttention(
        n_head, d_model, d_k, d_v)
    ref_mha.eval()

    b, lq, lk = 2, 7, 9
    q_t = torch.randn(b, lq, d_model)
    k_t = torch.randn(b, lk, d_model)
    v_t = torch.randn(b, lk, d_model)
    with torch.no_grad():
        out_ref, attn_ref = ref_mha(q_t, k_t, v_t)

    sd = {k: v.numpy() for k, v in ref_mha.state_dict().items()}
    params = {
        "w_qs": {"kernel": sd["w_qs.weight"].T},
        "w_ks": {"kernel": sd["w_ks.weight"].T},
        "w_vs": {"kernel": sd["w_vs.weight"].T},
        "fc": {"kernel": sd["fc.weight"].T},
        "LayerNorm_0": {"scale": sd["norm.weight"],
                        "bias": sd["norm.bias"]},
    }
    for impl in ("dense", "online"):
        ours = OurMHA(n_head=n_head, d_model=d_model, d_k=d_k, d_v=d_v,
                      attn_impl=impl, kv_block=4)
        out = ours.apply({"params": params}, jnp.asarray(q_t.numpy()),
                         jnp.asarray(k_t.numpy()), jnp.asarray(v_t.numpy()),
                         train=False)
        np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                                   atol=2e-5, rtol=1e-5, err_msg=impl)
