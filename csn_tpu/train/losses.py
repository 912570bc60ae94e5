"""Losses and prediction rules.

* Mink branch: CrossEntropyLoss(ignore_index=255) at interpolated point
  outputs (`lib/trainer_csn.py:45,205`); prediction = argmax over logits[:,1:]
  + 1, i.e. label 0 is never predicted (`trainer_csn.py:221,466`).
* MID-FC branch: cross entropy masked to labels > 0
  (`MID-FC/ssa_training.py:82-96`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_ignore(
    logits: jnp.ndarray,   # [..., C]
    labels: jnp.ndarray,   # [...] int
    ignore_label: int = 255,
    extra_mask: jnp.ndarray = None,  # [...] bool, e.g. point padding
) -> jnp.ndarray:
    """Mean cross entropy over non-ignored elements (torch semantics)."""
    valid = labels != ignore_label
    if extra_mask is not None:
        valid = valid & extra_mask
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    n = jnp.maximum(valid.sum(), 1)
    return nll.sum() / n


def cross_entropy_positive_sum(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    extra_mask: jnp.ndarray = None,
):
    """(sum of per-element NLL over labels > 0, contributing count).

    The separable form of `cross_entropy_positive_labels` — a sharded step
    psums both parts over the mesh and divides once, which reproduces the
    single-device mean EXACTLY regardless of how valid labels distribute
    across shards (per-shard means pmean'd would not)."""
    valid = labels > 0
    if extra_mask is not None:
        valid = valid & extra_mask
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum(), valid.sum()


def cross_entropy_positive_labels(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    extra_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """MID-FC masked CE: only labels > 0 contribute
    (`ssa_training.py:87-92`)."""
    s, n = cross_entropy_positive_sum(logits, labels, extra_mask)
    return s / jnp.maximum(n, 1)


def predict_nonzero(logits: jnp.ndarray) -> jnp.ndarray:
    """argmax over classes 1..C-1, shifted by +1 (label 0 never predicted)."""
    return jnp.argmax(logits[..., 1:], axis=-1) + 1
