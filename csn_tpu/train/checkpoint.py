"""Checkpoint / resume.

Mirrors the reference checkpoint contract (`MinkowskiNet/lib/utils.py:11-61`,
`lib/trainer_csn.py:315-387`): one file per checkpoint holding model params,
optimizer state, epoch/iteration, the best-metric quadruple, and — for CSN —
`csn_data` (patience, cooldown, n_graph_construction, train/val neighbor
lists) so a resumed run keeps its shape graph. A `weights.msgpack` symlink
always points at the latest. `config.json` is dumped alongside and reloaded
on resume (`tasks/main_csn.py:32-35`).

Format: flax.serialization msgpack for pytrees + a json sidecar for host
scalars (no torch pickle)."""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization


def _to_jsonable(obj):
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    return obj


def save_checkpoint(
    log_dir: str,
    name: str,
    tree_state: Dict[str, Any],     # params / batch_stats / opt_state pytrees
    host_state: Dict[str, Any],     # epoch, iteration, bests, csn_data, ...
    config: Optional[Dict[str, Any]] = None,
    postfix: Optional[str] = None,
    overwrite: bool = True,
    link_latest: bool = True,
) -> str:
    os.makedirs(log_dir, exist_ok=True)
    if overwrite:
        filename = f"checkpoint_{name}{postfix or ''}.msgpack"
    else:
        it = host_state.get("iteration", 0)
        filename = f"checkpoint_{name}_iter_{it}.msgpack"
    path = os.path.join(log_dir, filename)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree_state))
    with open(path + ".json", "w") as f:
        json.dump(_to_jsonable(host_state), f, indent=2)
    if config is not None:
        with open(os.path.join(log_dir, "config.json"), "w") as f:
            json.dump(_to_jsonable(config), f, indent=4)
    if postfix is None and link_latest:
        link = os.path.join(log_dir, "weights.msgpack")
        for l in (link, link + ".json"):
            if os.path.islink(l) or os.path.exists(l):
                os.remove(l)
        os.symlink(filename, link)
        os.symlink(filename + ".json", link + ".json")
    return path


def load_checkpoint(path: str, tree_template: Dict[str, Any]):
    """Returns (tree_state, host_state)."""
    with open(path, "rb") as f:
        tree_state = serialization.from_bytes(tree_template, f.read())
    with open(path + ".json") as f:
        host_state = json.load(f)
    return tree_state, host_state
