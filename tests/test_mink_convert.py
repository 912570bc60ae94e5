"""Mink-branch checkpoint conversion: schema-level parity readiness
(PARITY.md). A state dict with the key names/shapes the released
HRNetSimCSN weights.pth carries (recorded from the reference module
definitions, `MinkowskiNet/models/hrnet.py:296-357` + `modules/
resnet_block.py` + `modules/common.py`) must convert into a tree whose
every leaf matches our HRNetSimCSN init tree."""

import numpy as np
import pytest

import jax


def _mink_csn_sd(rng, num_stages=2, num_blocks=3, init_dim=32, feat_factor=4,
                 d_model=16, n_head=2, out_channels=5, k1=3):
    """Synthetic reference state_dict for HRNetSimCSN2S (keys as the torch
    module tree names them; includes num_batches_tracked like a real dump)."""
    isd = init_dim * feat_factor

    def arr(*shape):
        # small magnitudes: std-1 kernels overflow through a deep net in the
        # forward smoke check (real checkpoints are trained, i.e. small)
        return (rng.normal(size=shape) * 0.02).astype(np.float32)

    sd = {}

    def bn(name, c):
        sd[f"{name}.bn.weight"] = arr(c)
        sd[f"{name}.bn.bias"] = arr(c)
        sd[f"{name}.bn.running_mean"] = arr(c)
        sd[f"{name}.bn.running_var"] = np.abs(arr(c))
        sd[f"{name}.bn.num_batches_tracked"] = np.asarray(7)

    sd["conv0s1.kernel"] = arr(k1 ** 3, 3, init_dim)
    bn("bn0s1", init_dim)
    sd["conv1s1.kernel"] = arr(27, init_dim, isd)
    bn("bn1s1", isd)
    for i in range(num_stages):
        for j in range(i + 1):
            c = isd * 2 ** j
            for b in range(num_blocks):
                sd[f"stages.{i}.{j}.{b}.conv1.kernel"] = arr(27, c, c)
                bn(f"stages.{i}.{j}.{b}.norm1", c)
                sd[f"stages.{i}.{j}.{b}.conv2.kernel"] = arr(27, c, c)
                bn(f"stages.{i}.{j}.{b}.norm2", c)
    for i in range(num_stages - 1):
        depth = i + 1
        for j in range(depth):
            cj = isd * 2 ** j
            for k in range(depth + 1):
                if j == k:
                    continue
                for s in range(abs(k - j)):
                    cin = cj * 2 ** s if k > j else cj // 2 ** s
                    cout = cin * 2 if k > j else cin // 2
                    sd[f"exchange_blocks.{i}.{j}.{k}.{3 * s}.kernel"] = \
                        arr(27, cin, cout)
                    bn(f"exchange_blocks.{i}.{j}.{k}.{3 * s + 1}", cout)
    for i in range(1, num_stages):
        c = isd * 2 ** i
        for j in range(i):
            sd[f"final_transitions.{i - 1}.{3 * j}.kernel"] = arr(27, c, c)
            bn(f"final_transitions.{i - 1}.{3 * j + 1}", c)
    backbone_out = sum(isd * 2 ** s for s in range(num_stages)) + init_dim
    sd["fc_layer.0.kernel"] = arr(backbone_out, d_model)
    sd["fc_layer.0.bias"] = arr(d_model)
    bn("fc_layer.1", d_model)
    dk = d_model // n_head
    for w in ("w_qs", "w_ks", "w_vs"):
        sd[f"MHA.{w}.weight"] = arr(n_head * dk, d_model)
    sd["MHA.fc.weight"] = arr(d_model, n_head * dk)
    sd["MHA.norm.weight"] = arr(d_model)
    sd["MHA.norm.bias"] = arr(d_model)
    sd["output.kernel"] = arr(d_model * 2, out_channels)
    sd["output.bias"] = arr(out_channels)
    sd["linear_q.weight"] = arr(d_model, d_model)
    sd["linear_k.weight"] = arr(d_model, d_model)
    return sd


def test_kernel_offset_permutation():
    from csn_tpu.models.convert import _kernel_perm

    p = _kernel_perm(3, "xyz")
    assert sorted(p.tolist()) == list(range(27))
    # our row (x,y,z)=(1,0,0) is index 9; ME x-fastest stores it at index 1
    assert p[9] == 1
    # (0,0,1): ours index 1; ME stores at z*9 = 9
    assert p[1] == 9
    np.testing.assert_array_equal(_kernel_perm(3, "zyx"), np.arange(27))


def test_convert_mink_released_schema_matches_init_tree():
    from csn_tpu.models import load_model
    from csn_tpu.models.convert import convert_mink_state_dict

    from tests.test_models import build_jax_batch

    rng = np.random.default_rng(0)
    sd = _mink_csn_sd(rng)
    params, stats = convert_mink_state_dict(sd, num_stages=2, num_blocks=3,
                                            csn_head=True, k_neighbors=1)
    assert convert_mink_state_dict.unused == []

    cls = load_model("HRNetSimCSN2S")
    vb, jb, spec = build_jax_batch(cls)
    model = cls(out_channels=5, conv1_kernel_size=3, d_model=16, n_head=2,
                k_neighbors=1)
    ref = jax.jit(lambda r, b, k: model.init(r, b, k, train=False))(
        jax.random.PRNGKey(0), jb, (jb,))

    def shapes(tree):
        return {jax.tree_util.keystr(p): np.asarray(l).shape
                for p, l in jax.tree_util.tree_leaves_with_path(tree)}

    assert shapes(params) == shapes(ref["params"]), sorted(
        set(shapes(params)) ^ set(shapes(ref["params"])))
    assert shapes(stats) == shapes(ref["batch_stats"])

    # converted params actually RUN (forward with the loaded weights)
    out = jax.jit(lambda v, b, k: model.apply(v, b, k, train=False))(
        {"params": params, "batch_stats": stats}, jb, (jb,))
    assert np.isfinite(np.asarray(out)).all()


def test_trainer_loads_reference_pth_weights(tmp_path):
    """--weights <file>.pth routes through the torch-checkpoint converter
    (the released-model eval path of PARITY.md)."""
    import torch

    from csn_tpu.config import Config
    from csn_tpu.data.partnet import write_synthetic_partnet
    from csn_tpu.tasks.main_csn import build_trainer

    rng = np.random.default_rng(1)
    sd = _mink_csn_sd(rng, out_channels=4)
    pth = str(tmp_path / "weights.pth")
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, pth)

    root = str(tmp_path / "pn")
    write_synthetic_partnet(root, category="Display", n_train=2, n_val=2,
                            n_test=2, num_points=48)
    cfg = Config(
        model="HRNetSimCSN2S", partnet_path=root, partnet_category="Display",
        batch_size=2, conv1_kernel_size=3, d_model=16, n_head=2,
        k_neighbors=1, num_points=48, level_shrink=1.5, weights=pth,
        log_dir=str(tmp_path / "logs"), seed=0,
    ).normalized()
    trainer = build_trainer(cfg, phases=("train", "val"))
    trainer.initialize()
    from csn_tpu.models.convert import _kernel_perm

    np.testing.assert_allclose(
        np.asarray(trainer.params["conv1"]["kernel"]),
        sd["conv1s1.kernel"][_kernel_perm(3, "xyz")], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(trainer.batch_stats["norm0"]["MaskedBatchNorm_0"]["mean"]),
        sd["bn0s1.bn.running_mean"], rtol=1e-6)
