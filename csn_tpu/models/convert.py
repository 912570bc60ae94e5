"""torch-checkpoint -> flax conversion for the MinkowskiNet-branch models.

Enables eval of the reference's released pretrained checkpoints
(`MinkowskiNet/README.md:119-125`: HRNetSeg3S / HRNetSimCSN3S weights.pth)
on this framework. Maps the torch `state_dict` of
`MinkowskiNet/models/hrnet.py` (module names: conv0s1/bn0s1, conv1s1/bn1s1,
stages.{i}.{j}.{b}.{conv1,norm1,conv2,norm2}, exchange_blocks.{i}.{j}.{k}
Sequentials, final_transitions, fc_layer / final, MHA, output,
linear_q/linear_k) onto the flax trees of `csn_tpu/models/hrnet.py`.

Layout notes:
* ME sparse-conv kernels are stored `[kernel_volume, in, out]` — the same
  layout as ours; k=1 ME convs collapse to `[in, out]` (== flax Dense).
* torch `nn.Linear.weight` is `[out, in]` -> transposed.
* ME.MinkowskiBatchNorm wraps `nn.BatchNorm1d` as `.bn` -> keys like
  `bn0s1.bn.weight`.
* Kernel OFFSET ORDER: our kernel maps enumerate cubic offsets z-fastest
  (numpy `itertools.product`); if ME enumerates x-fastest, rows must be
  permuted. `offset_order='xyz'` applies that permutation (the expected ME
  convention); `'zyx'` is the identity. PARITY.md documents the one-bit
  A/B check against a real checkpoint (the schema/shape contract is
  identical either way).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32).T)


def _kernel_perm(ksize: int, offset_order: str) -> np.ndarray:
    """Row permutation taking a torch/ME kernel to our z-fastest order."""
    k = ksize
    if offset_order == "zyx":  # already z-fastest
        return np.arange(k ** 3)
    # ME x-fastest: me_row(x,y,z) = x + k*y + k^2*z; ours = z + k*y + k^2*x
    ours = np.arange(k ** 3)
    z = ours % k
    y = (ours // k) % k
    x = ours // (k * k)
    return x + k * y + k * k * z


class _SD:
    """state_dict view that records consumed keys and converts kernels."""

    def __init__(self, sd: Dict, offset_order: str):
        self.sd = {k: np.asarray(v, dtype=np.float32)
                   for k, v in sd.items()
                   if not k.endswith("num_batches_tracked")}
        self.offset_order = offset_order
        self.used = set()

    def a(self, name: str) -> np.ndarray:
        self.used.add(name)
        if name not in self.sd:
            raise KeyError(
                f"checkpoint is missing '{name}'; available near-misses: "
                f"{[k for k in self.sd if k.split('.')[0] in name][:8]}")
        return self.sd[name]

    def conv(self, name: str) -> np.ndarray:
        w = self.a(name + ".kernel")
        if w.ndim == 3:  # [K, in, out]: permute offsets to our order
            return w[_kernel_perm(round(w.shape[0] ** (1 / 3)),
                                  self.offset_order)]
        return w        # k=1 conv: [in, out] == flax Dense kernel

    def bn(self, name: str) -> Tuple[Dict, Dict]:
        return ({"MaskedBatchNorm_0": {"scale": self.a(name + ".bn.weight"),
                                       "bias": self.a(name + ".bn.bias")}},
                {"MaskedBatchNorm_0": {"mean": self.a(name +
                                                      ".bn.running_mean"),
                                       "var": self.a(name +
                                                     ".bn.running_var")}})

    def bias(self, name: str) -> np.ndarray:
        """Conv bias as a flax-style 1-D vector. ME 0.5.x stores
        MinkowskiConvolution bias as `[1, out]`; accept that and the plain
        `[out]` layout."""
        b = self.a(name + ".bias")
        return b.reshape(-1)

    def unused(self):
        return sorted(set(self.sd) - self.used)


def convert_mink_state_dict(
    sd: Dict, num_stages: int, num_blocks: int = 3, *,
    csn_head: bool = True, k_neighbors: int = 1,
    offset_order: str = "xyz",
) -> Tuple[Dict, Dict]:
    """Convert a reference HRNetSeg / HRNetSimCSN state_dict.

    Returns (params, batch_stats) flax-style nested dicts matching
    `csn_tpu.models.hrnet.HRNetSeg`/`HRNetSimCSN` init trees. Raises KeyError
    naming the first missing checkpoint key (turnkey diagnosis on the first
    real-checkpoint run); leftover unconsumed keys are returned... reported
    via `convert_mink_state_dict.unused` on the function object after a call.
    """
    v = _SD(sd, offset_order)
    params: Dict = {}
    stats: Dict = {}

    params["conv0"] = {"kernel": v.conv("conv0s1")}
    params["norm0"], stats["norm0"] = v.bn("bn0s1")
    params["conv1"] = {"kernel": v.conv("conv1s1")}
    params["norm1"], stats["norm1"] = v.bn("bn1s1")

    # stages.{i}.{j}.{b}: BasicBlocks (conv1/norm1/conv2/norm2)
    for i in range(num_stages):
        for j in range(i + 1):
            for b in range(num_blocks):
                base = f"stages.{i}.{j}.{b}"
                name = f"stages_{i}_{j}_{b}"
                p = {"SparseConv_0": {"kernel": v.conv(base + ".conv1")},
                     "SparseConv_1": {"kernel": v.conv(base + ".conv2")}}
                s = {}
                p["Norm_0"], s["Norm_0"] = v.bn(base + ".norm1")
                p["Norm_1"], s["Norm_1"] = v.bn(base + ".norm2")
                params[name] = p
                stats[name] = s

    # exchange_blocks.{i}.{j}.{k}: Sequential [C,N] then [R,C,N] per step
    # (conv at 3s, norm at 3s+1)
    for i in range(num_stages - 1):
        depth = i + 1
        for j in range(depth):
            for k in range(depth + 1):
                if j == k:
                    continue
                steps = abs(k - j)
                for s in range(steps):
                    base = f"exchange_blocks.{i}.{j}.{k}"
                    name = f"exchange_{i}_{j}_{k}_{s}"
                    p = {"kernel": v.conv(f"{base}.{3 * s}")}
                    params[name + "_0"] = p
                    pn, sn = v.bn(f"{base}.{3 * s + 1}")
                    params[name + "_1"] = pn
                    stats[name + "_1"] = sn

    # final transitions: Sequential [ConvT, Norm, ReLU] x steps
    ft_p, ft_s = {}, {}
    for i in range(1, num_stages):
        for j in range(i):
            base = f"final_transitions.{i - 1}.{3 * j}"
            name = f"trans_{i - 1}_{j}"
            ft_p[name + "_0"] = {"kernel": v.conv(base)}
            pn, sn = v.bn(f"final_transitions.{i - 1}.{3 * j + 1}")
            ft_p[name + "_1"] = pn
            ft_s[name + "_1"] = sn
    params["final_transitions"] = ft_p
    stats["final_transitions"] = ft_s

    if csn_head:
        params["fc1"] = {"Dense_0": {"kernel": v.conv("fc_layer.0"),
                                     "bias": v.bias("fc_layer.0")}}
        params["fc1_norm"], stats["fc1_norm"] = v.bn("fc_layer.1")
        params["mha"] = {
            "w_qs": {"kernel": _t(v.a("MHA.w_qs.weight"))},
            "w_ks": {"kernel": _t(v.a("MHA.w_ks.weight"))},
            "w_vs": {"kernel": _t(v.a("MHA.w_vs.weight"))},
            "fc": {"kernel": _t(v.a("MHA.fc.weight"))},
            "LayerNorm_0": {"scale": v.a("MHA.norm.weight"),
                            "bias": v.a("MHA.norm.bias")},
        }
        params["out_head"] = {"Dense_0": {"kernel": v.conv("output"),
                                          "bias": v.bias("output")}}
        if k_neighbors > 0:
            params["linear_q"] = {"kernel": _t(v.a("linear_q.weight"))}
            params["linear_k"] = {"kernel": _t(v.a("linear_k.weight"))}
    else:  # HRNetSeg head: final = Sequential [fc1, bn, relu, fc2]
        params["fc1"] = {"Dense_0": {"kernel": v.conv("final.0"),
                                     "bias": v.bias("final.0")}}
        params["fc1_norm"], stats["fc1_norm"] = v.bn("final.1")
        params["fc2"] = {"Dense_0": {"kernel": v.conv("final.3"),
                                     "bias": v.bias("final.3")}}

    convert_mink_state_dict.unused = v.unused()
    return params, stats


def _convert_block(v: _SD, base: str) -> Tuple[Dict, Dict]:
    """One residual block (`modules/resnet_block.py`): BasicBlock
    (conv1/norm1/conv2/norm2 [+ downsample]) or Bottleneck
    (conv1..conv3/norm1..norm3 [+ downsample], k1-k3-k1), mapped onto the
    flax names of `csn_tpu/models/blocks.py` (nn.compact auto-numbering:
    SparseConv_N for k3, Conv1x1_N/Dense_0 for k1, Norm_N, with the
    channel-mismatch projection last)."""
    p: Dict = {}
    s: Dict = {}
    bottleneck = (base + ".conv3.kernel") in v.sd
    if bottleneck:
        p["Conv1x1_0"] = {"Dense_0": {"kernel": v.conv(base + ".conv1")}}
        p["Norm_0"], s["Norm_0"] = v.bn(base + ".norm1")
        p["SparseConv_0"] = {"kernel": v.conv(base + ".conv2")}
        p["Norm_1"], s["Norm_1"] = v.bn(base + ".norm2")
        p["Conv1x1_1"] = {"Dense_0": {"kernel": v.conv(base + ".conv3")}}
        p["Norm_2"], s["Norm_2"] = v.bn(base + ".norm3")
        proj_conv, proj_norm = "Conv1x1_2", "Norm_3"
    else:
        p["SparseConv_0"] = {"kernel": v.conv(base + ".conv1")}
        p["Norm_0"], s["Norm_0"] = v.bn(base + ".norm1")
        p["SparseConv_1"] = {"kernel": v.conv(base + ".conv2")}
        p["Norm_1"], s["Norm_1"] = v.bn(base + ".norm2")
        proj_conv, proj_norm = "Conv1x1_0", "Norm_2"
    if (base + ".downsample.0.kernel") in v.sd:
        p[proj_conv] = {"Dense_0": {"kernel": v.conv(base + ".downsample.0")}}
        p[proj_norm], s[proj_norm] = v.bn(base + ".downsample.1")
    return p, s


def _block_count(sd: Dict, name: str) -> int:
    n = 0
    while any(k.startswith(f"{name}.{n}.") for k in sd):
        n += 1
    return n


def convert_res16unet_state_dict(
    sd: Dict, *, offset_order: str = "xyz",
) -> Tuple[Dict, Dict]:
    """Convert a reference Res16UNet* state_dict (`models/res16unet.py`:
    stem conv0p1s1/bn0, four k2/s2 down convs conv{1-4}p*s2/bn{1-4} with
    residual stages block{1-4}, four k2/s2 transposes convtr{4-7}p*s2/
    bntr{4-7} with skip-concat stages block{5-8}, final k1 head) onto
    `csn_tpu/models/res16unet.py` trees."""
    v = _SD(sd, offset_order)
    params: Dict = {"conv0": {"kernel": v.conv("conv0p1s1")}}
    stats: Dict = {}
    params["norm0"], stats["norm0"] = v.bn("bn0")
    tr_names = ["convtr4p16s2", "convtr5p8s2", "convtr6p4s2", "convtr7p2s2"]
    for l in range(4):
        params[f"down_convs_{l}"] = {
            "kernel": v.conv(f"conv{l + 1}p{2 ** l}s2")}
        params[f"down_norms_{l}"], stats[f"down_norms_{l}"] = v.bn(
            f"bn{l + 1}")
        params[f"up_convs_{l}"] = {"kernel": v.conv(tr_names[l])}
        params[f"up_norms_{l}"], stats[f"up_norms_{l}"] = v.bn(f"bntr{l + 4}")
        for b in range(_block_count(v.sd, f"block{l + 1}")):
            params[f"enc_blocks_{l}_{b}"], stats[f"enc_blocks_{l}_{b}"] = \
                _convert_block(v, f"block{l + 1}.{b}")
        for b in range(_block_count(v.sd, f"block{l + 5}")):
            params[f"dec_blocks_{l}_{b}"], stats[f"dec_blocks_{l}_{b}"] = \
                _convert_block(v, f"block{l + 5}.{b}")
    params["final"] = {"Dense_0": {"kernel": v.conv("final"),
                                   "bias": v.bias("final")}}
    convert_res16unet_state_dict.unused = v.unused()
    return params, stats


def convert_resunet_state_dict(
    sd: Dict, *, offset_order: str = "xyz",
) -> Tuple[Dict, Dict]:
    """Convert a reference ResUNet* / MinkUNetBase state_dict
    (`models/resunet.py`: stem conv1p1s1/bn1 + block1 at level 0, three
    k2/s2 downs conv{2-4}p*s2/bn{2-4} with stages block{2-4}, three k2/s2
    transposes convtr{4-6}p*s2/bntr{4-6} with stages block{5-6}, 2-layer k1
    head `final.{0,1,3}`) onto `csn_tpu/models/resunet.py` trees."""
    v = _SD(sd, offset_order)
    params: Dict = {"conv0": {"kernel": v.conv("conv1p1s1")}}
    stats: Dict = {}
    params["norm0"], stats["norm0"] = v.bn("bn1")
    for b in range(_block_count(v.sd, "block1")):
        params[f"block0_{b}"], stats[f"block0_{b}"] = _convert_block(
            v, f"block1.{b}")
    tr_names = ["convtr4p8s2", "convtr5p4s2", "convtr6p2s2"]
    for l in range(3):
        params[f"down_convs_{l}"] = {
            "kernel": v.conv(f"conv{l + 2}p{2 ** l}s2")}
        params[f"down_norms_{l}"], stats[f"down_norms_{l}"] = v.bn(
            f"bn{l + 2}")
        params[f"up_convs_{l}"] = {"kernel": v.conv(tr_names[l])}
        params[f"up_norms_{l}"], stats[f"up_norms_{l}"] = v.bn(f"bntr{l + 4}")
        for b in range(_block_count(v.sd, f"block{l + 2}")):
            params[f"enc_blocks_{l}_{b}"], stats[f"enc_blocks_{l}_{b}"] = \
                _convert_block(v, f"block{l + 2}.{b}")
        if l < 2:
            for b in range(_block_count(v.sd, f"block{l + 5}")):
                params[f"dec_blocks_{l}_{b}"], stats[f"dec_blocks_{l}_{b}"] \
                    = _convert_block(v, f"block{l + 5}.{b}")
    params["final_fc"] = {"Dense_0": {"kernel": v.conv("final.0"),
                                      "bias": v.bias("final.0")}}
    # final_norm is a bare MaskedBatchNorm (not a Norm wrapper), so unwrap
    pn, sn = v.bn("final.1")
    params["final_norm"] = pn["MaskedBatchNorm_0"]
    stats["final_norm"] = sn["MaskedBatchNorm_0"]
    params["final_out"] = {"Dense_0": {"kernel": v.conv("final.3"),
                                       "bias": v.bias("final.3")}}
    convert_resunet_state_dict.unused = v.unused()
    return params, stats


def load_mink_torch_checkpoint(path: str, num_stages: int, **kw):
    """Load a reference .pth (lib/utils.py checkpoint() format: dict with
    'state_dict') and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_mink_state_dict(sd, num_stages, **kw)
