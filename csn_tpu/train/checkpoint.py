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
    # Atomic writes: overwrite=True rewrites the same path every epoch, so a
    # crash/preemption mid-write would otherwise truncate the ONLY copy of
    # the latest checkpoint in place (the reference has the same hazard via
    # torch.save; see SURVEY.md §5.3 — no failure recovery upstream). Write
    # to a temp sibling and os.replace (atomic on POSIX).
    _atomic_write_bytes(path, serialization.to_bytes(tree_state))
    _atomic_write_text(path + ".json",
                       json.dumps(_to_jsonable(host_state), indent=2))
    if config is not None:
        _atomic_write_text(os.path.join(log_dir, "config.json"),
                           json.dumps(_to_jsonable(config), indent=4))
    if postfix is None and link_latest:
        link = os.path.join(log_dir, "weights.msgpack")
        _atomic_symlink(filename, link)
        _atomic_symlink(filename + ".json", link + ".json")
    return path


def _fsync_dir(path: str):
    """fsync the directory so the os.replace RENAME itself is durable: file
    fsync alone guarantees old-or-new content, but after a power loss the
    directory entry may still point at the previous checkpoint (ADVICE r3).
    Best-effort — not every fs allows O_RDONLY dir fsync."""
    try:
        fd = os.open(os.path.dirname(os.path.abspath(path)) or ".",
                     os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    except OSError:
        pass


def _atomic_write_bytes(path: str, data: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())  # data must hit disk BEFORE the rename does,
        # or a machine crash can persist the rename over unwritten blocks
        # (ext4 delayed allocation) — a zero-length "latest" checkpoint
    os.replace(tmp, path)
    _fsync_dir(path)


def _atomic_write_text(path: str, text: str):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_dir(path)


def _atomic_symlink(target: str, link: str):
    tmp = link + ".tmp"
    if os.path.islink(tmp) or os.path.exists(tmp):
        os.remove(tmp)
    os.symlink(target, tmp)
    os.replace(tmp, link)


def load_checkpoint(path: str, tree_template: Dict[str, Any],
                    require_host: bool = True):
    """Returns (tree_state, host_state). `require_host=False` for
    weights-only loads (`--weights foo.msgpack`): a bare msgpack shared
    without its `.json` host-state sidecar is a legitimate artifact there,
    while resume paths keep failing loudly on a missing sidecar."""
    with open(path, "rb") as f:
        tree_state = serialization.from_bytes(tree_template, f.read())
    host_state: Dict[str, Any] = {}
    if require_host or os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            host_state = json.load(f)
    return tree_state, host_state
