"""torch-checkpoint -> flax parameter conversion for the MID-FC head.

Enables exact-eval parity against the reference's pretrained
`trained_layers.pth` checkpoints (BASELINE.md: MID-FC + CSA, n_heads=8, K=4).
Maps the state_dict of `MID-FC/csa_models.py:146-180` onto the module tree of
`csn_tpu/midfc/model.py`:

  attention.w_qs.weight [H*dk, dm]  -> attention/mha/w_qs/kernel (transposed)
  attention.fc.weight               -> attention/mha/fc/kernel
  attention.norm.{weight,bias}      -> attention/mha/LayerNorm_0/{scale,bias}
  logit.weight [C, 256, 1, 1]       -> logit/kernel [256, C]
  compatibility_{q,k}.{weight,bias} -> compatibility_{q,k}/{kernel,bias}
  fc_1.0.0.weight [256, 928, 1, 1]  -> fc_1/kernel (only for after_fc=False)
  fc_1.0.1.{weight,bias,running_*}  -> fc_1_bn params/batch_stats
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32).T)


def convert_state_dict(sd: Dict[str, "object"], after_fc: bool = True
                       ) -> Tuple[Dict, Dict]:
    """sd: name -> array-like (torch tensors or numpy). Returns
    (params, batch_stats) flax-style nested dicts."""

    def a(name):
        return np.asarray(sd[name], dtype=np.float32)

    params: Dict = {}
    stats: Dict = {}

    mha = {
        "w_qs": {"kernel": _t(a("attention.w_qs.weight"))},
        "w_ks": {"kernel": _t(a("attention.w_ks.weight"))},
        "w_vs": {"kernel": _t(a("attention.w_vs.weight"))},
        "fc": {"kernel": _t(a("attention.fc.weight"))},
        "LayerNorm_0": {"scale": a("attention.norm.weight"),
                        "bias": a("attention.norm.bias")},
    }
    params["attention"] = {"mha": mha}

    lw = a("logit.weight")  # [C, 256, 1, 1]
    params["logit"] = {"kernel": _t(lw[:, :, 0, 0])}

    if "compatibility_q.weight" in sd:
        params["compatibility_q"] = {
            "kernel": _t(a("compatibility_q.weight")),
            "bias": a("compatibility_q.bias"),
        }
        params["compatibility_k"] = {
            "kernel": _t(a("compatibility_k.weight")),
            "bias": a("compatibility_k.bias"),
        }

    if not after_fc and "fc_1.0.0.weight" in sd:
        w = a("fc_1.0.0.weight")  # [256, 928, 1, 1]
        params["fc_1"] = {"kernel": _t(w[:, :, 0, 0])}
        params["fc_1_bn"] = {"scale": a("fc_1.0.1.weight"),
                             "bias": a("fc_1.0.1.bias")}
        stats["fc_1_bn"] = {"mean": a("fc_1.0.1.running_mean"),
                            "var": a("fc_1.0.1.running_var")}

    return params, stats


def load_torch_checkpoint(path: str, after_fc: bool = True):
    """Load a reference .pth and convert (requires the baked-in cpu torch)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_state_dict(sd, after_fc=after_fc)
