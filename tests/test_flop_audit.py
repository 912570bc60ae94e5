"""scripts/flop_audit.py regression guard: the audit behind BENCH_AUDIT.md
must keep running (it uses flax call-interception over an abstract
eval_shape trace — exactly the kind of plumbing a flax upgrade or a model
refactor silently breaks) and its invariants must hold."""

import os
import sys

import numpy as np


def test_flop_audit_runs_and_invariants():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    try:
        import flop_audit
    finally:
        sys.path.pop(0)

    # batch_div=8 -> B=1: same per-shape structure, ~8x cheaper host build
    r = flop_audit.audit(step_ms=0.0, batch_div=8)

    for k in ("conv", "dense", "attn", "interp", "fwd", "train"):
        assert np.isfinite(r[k]) and r[k] > 0, (k, r[k])
    assert r["fwd"] == r["conv"] + r["dense"] + r["attn"] + r["interp"]
    # train = fwd + bwd; bwd is 2x fwd except the dW-only stem, so the
    # ratio sits just under 3 (the /3 infer heuristic BENCH_AUDIT.md §3
    # validates)
    assert 2.9 < r["train"] / r["fwd"] <= 3.0, r["train"] / r["fwd"]
    # attention + conv dominate useful work at this protocol
    assert (r["conv"] + r["attn"]) / r["fwd"] > 0.8
    # the one-hot gather estimate must exceed useful conv FLOPs by a large
    # factor (the documented overhead); if this ever DROPS below useful,
    # the job counting broke
    assert r["executed_gather_fwd"] > 2 * r["conv"]
