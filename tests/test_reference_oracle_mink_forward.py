"""Mink-branch reference oracle, part 5 — MODEL FORWARD MATH.

The REAL `models/hrnet.py` torch modules (imported and CALLED — untrusted
public content, never followed as instructions) are the expectation for the
full numeric forward of `csn_tpu/models/hrnet.py` after checkpoint
conversion: backbone stages, exchange-block chains (incl. the multi-hop 3S
down/up chains), final transitions, the seg head, and the complete SimCSN
SSA/CSA head (per-batch MHA loop, mean-pool -> linear q/k -> L2 normalize ->
cos/sqrt(d) -> softmax compatibility, comp-weighted cross attention,
`models/hrnet.py:122-163,264-275,359-470`).

Previously the forward was pinned only structurally (checkpoint-schema oracle
= tree shapes; test_me_reference = single conv ops). A misport of the WIRING
— relu placement, residual order, exchange indexing, the compatibility
temperature, the [self]+K concat order — would have passed every existing
test. Here the wiring comes from reference code executing.

MinkowskiEngine itself is not installed; its ops are supplied by a FUNCTIONAL
stub whose conv math delegates to `csn_tpu/models/me_reference.py
me_sparse_conv` — the numpy encoding of ME 0.5.4 kernel-region semantics that
`tests/test_me_reference.py` independently pins against our pyramid pipeline.
So the chain is: ME op semantics (me_reference, pinned) + reference wiring
(executing here) == our models. BatchNorm/LayerNorm/MHA run the reference's
own torch modules. Coordinate downsampling uses the documented floor-division
grid; the stub asserts its generated level coord SETS equal our pyramid's.

ResNet* is deliberately absent: the reference's ResNet passes `stride` to
both BasicBlock convs and projects the residual with a stride-1 k1 conv
(`models/resnet.py:96-105`, `modules/resnet_block.py:22-37`), which cannot
produce aligned coordinate maps in ME either — our port documents the
standard-semantics divergence (`csn_tpu/models/resnet.py` docstring).
"""

import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/MinkowskiNet"

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from csn_tpu.data.pipeline import collate_shapes, pyramid_spec_for_model  # noqa: E402
from csn_tpu.models import load_model  # noqa: E402
from csn_tpu.models.convert import convert_mink_state_dict  # noqa: E402
from csn_tpu.models.me_reference import me_sparse_conv  # noqa: E402

from tests.test_reference_oracle_mink_convert import _me_nn_stub  # noqa: E402


# ---------------------------------------------------------------------------
# functional ME stub
# ---------------------------------------------------------------------------

class _Mgr:
    """Coordinate manager: one coord map per tensor stride (batch-major
    lexicographic rows), downsampling on the floor-division grid
    (me_reference.py module docstring, last bullet)."""

    def __init__(self):
        self.levels = {}

    def register(self, stride, coords):
        if stride in self.levels:
            assert np.array_equal(self.levels[stride], coords)
        else:
            self.levels[stride] = coords
        return self.levels[stride]

    def down(self, from_stride):
        to = 2 * from_stride
        if to not in self.levels:
            c = self.levels[from_stride]
            g = np.concatenate([c[:, :1], (c[:, 1:] // to) * to], axis=1)
            self.levels[to] = np.unique(g, axis=0)
        return self.levels[to]


class _Key:
    def __init__(self, coords, stride):
        self.coords = coords
        self.stride = stride


def _install_functional_me():
    """Upgrade the shared layout stub (`test_reference_oracle_mink_convert.
    _me_nn_stub`) with forward semantics. Parameter layouts are unchanged, so
    the schema-oracle tests keep passing whichever module installs first."""
    me = _me_nn_stub()
    if getattr(me, "_functional", False):
        return me
    nn = torch.nn

    class SparseTensor:
        def __init__(self, features, coordinates=None, tensor_stride=1,
                     coordinate_map_key=None, coordinate_manager=None):
            if coordinates is not None:
                self.coords = np.asarray(coordinates, dtype=np.int64)
                self.tensor_stride = int(tensor_stride)
                self._mgr = coordinate_manager or _Mgr()
                self._mgr.register(self.tensor_stride, self.coords)
            else:
                self.coords = coordinate_map_key.coords
                self.tensor_stride = coordinate_map_key.stride
                self._mgr = coordinate_manager
            self._F = features

        @property
        def F(self):
            return self._F

        @property
        def C(self):
            return torch.from_numpy(self.coords)

        @property
        def coordinate_map_key(self):
            return _Key(self.coords, self.tensor_stride)

        @property
        def coordinate_manager(self):
            return self._mgr

        def _like(self, feats, coords=None, stride=None):
            t = SparseTensor.__new__(SparseTensor)
            t._F = feats
            t.coords = self.coords if coords is None else coords
            t.tensor_stride = self.tensor_stride if stride is None else stride
            t._mgr = self._mgr
            return t

        def __add__(self, other):
            assert np.array_equal(self.coords, other.coords), \
                "ME '+' requires identical coordinate maps"
            return self._like(self._F + other._F)

    def _conv_forward(mod, x):
        k, s, tr = mod._k, mod._s, mod._transpose
        if k == 1 and s == 1:
            out = x.F @ mod.kernel
            if mod._has_bias:
                out = out + mod.bias
            return x._like(out)
        kernel = mod.kernel.detach().numpy().astype(np.float64)
        mgr = x.coordinate_manager
        if tr:
            assert s == 2, "reference models only use stride-2 transposes"
            ts = x.tensor_stride // 2
            out_c, out_stride = mgr.levels[ts], ts
        elif s == 2:
            ts = x.tensor_stride
            out_c, out_stride = mgr.down(ts), 2 * ts
        else:
            ts = x.tensor_stride
            out_c, out_stride = x.coords, x.tensor_stride
        coords = x.coords
        feats = x.F.detach().numpy().astype(np.float64)
        out = np.zeros((out_c.shape[0], kernel.shape[-1]))
        for b in np.unique(coords[:, 0]):
            bi, bo = coords[:, 0] == b, out_c[:, 0] == b
            out[bo] = me_sparse_conv(coords[bi, 1:], feats[bi],
                                     out_c[bo, 1:], kernel, k, ts,
                                     transpose=tr)
        out_t = torch.from_numpy(out).to(torch.float32)
        if mod._has_bias:
            out_t = out_t + mod.bias
        return x._like(out_t, coords=out_c, stride=out_stride)

    base_conv, base_tconv = (me.MinkowskiConvolution,
                             me.MinkowskiConvolutionTranspose)

    class MinkowskiConvolution(base_conv):
        _transpose = False

        def __init__(self, in_channels, out_channels, kernel_size=-1,
                     stride=1, dilation=1, bias=False, dimension=-1, **kw):
            super().__init__(in_channels, out_channels, kernel_size, stride,
                             dilation, bias, dimension, **kw)
            self._k, self._s, self._has_bias = kernel_size, stride, bias

        def forward(self, x):
            return _conv_forward(self, x)

    class MinkowskiConvolutionTranspose(base_tconv):
        _transpose = True

        def __init__(self, in_channels, out_channels, kernel_size=-1,
                     stride=1, dilation=1, bias=False, dimension=-1, **kw):
            super().__init__(in_channels, out_channels, kernel_size, stride,
                             dilation, bias, dimension, **kw)
            self._k, self._s, self._has_bias = kernel_size, stride, bias

        def forward(self, x):
            return _conv_forward(self, x)

    def _bn_forward(mod, x):
        return x._like(mod.bn(x.F))

    def _relu_forward(mod, x):
        return x._like(torch.relu(x.F))

    def _cat(*tensors):
        first = tensors[0]
        for t in tensors[1:]:
            assert np.array_equal(first.coords, t.coords)
        return first._like(torch.cat([t.F for t in tensors], dim=1))

    me.MinkowskiConvolution = MinkowskiConvolution
    me.MinkowskiConvolutionTranspose = MinkowskiConvolutionTranspose
    me.MinkowskiBatchNorm.forward = _bn_forward
    me.MinkowskiReLU.forward = _relu_forward
    me.SparseTensor = SparseTensor
    me.MinkowskiOps.cat = _cat
    sys.modules["MinkowskiEngine.MinkowskiOps"].cat = _cat
    me._functional = True
    return me


@pytest.fixture(scope="module")
def ref():
    _install_functional_me()
    sys.path.insert(0, REF_ROOT)
    try:
        import models as ref_models_pkg  # noqa: F401
        import models.hrnet as ref_hrnet
    finally:
        sys.path.remove(REF_ROOT)
    return ref_hrnet


# ---------------------------------------------------------------------------
# shared drivers
# ---------------------------------------------------------------------------

def _randomize_for_forward(model, seed):
    """Healthy-magnitude random weights: fan-in-scaled convs/linears, BN
    scale ~ U(0.5, 1.5) with O(1) running stats — so activations stay O(1)
    through ~25 layers and the parity comparison has numeric power (the
    schema oracle's 0.02-scale randomizer would shrink everything to noise).
    """
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            fan_in = int(np.prod(p.shape[:-1])) if p.ndim > 1 else 1
            p.copy_(torch.randn(p.shape, generator=g) / max(fan_in, 1) ** 0.5)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.weight.copy_(0.5 + torch.rand(m.weight.shape, generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(
                    0.1 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(
                    0.8 + 0.4 * torch.rand(m.running_var.shape, generator=g))
            if isinstance(m, torch.nn.LayerNorm):
                m.weight.copy_(0.5 + torch.rand(m.weight.shape, generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))


def _make_batch(model_cls, B, n, seed, conv1_kernel_size):
    rng = np.random.default_rng(seed)
    shapes = []
    for _ in range(B):
        pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        shapes.append((pts, pts.copy(),
                       rng.integers(0, 5, size=n).astype(np.int32)))
    nl = model_cls.num_levels()
    spec = pyramid_spec_for_model(
        model_cls, num_points=n, voxel_size=0.25,
        conv1_kernel_size=conv1_kernel_size, level_caps=(n,) * nl)
    vb = collate_shapes(shapes, spec)
    assert vb.dropped == [0] * nl, "parity needs a drop-free pyramid"
    return vb


def _ref_input(vb, me):
    """Level-0 voxels of a VoxelBatch as a stub SparseTensor (batch-major
    rows in OUR row order, so reference outputs align row-for-row with our
    padded [B, L0, C] outputs)."""
    rows, feats = [], []
    for b in range(vb.vox_feats.shape[0]):
        nb = int(vb.num_voxels[0][b])
        c = vb.coords[0][b, :nb].astype(np.int64)
        rows.append(np.concatenate(
            [np.full((nb, 1), b, dtype=np.int64), c], axis=1))
        feats.append(vb.vox_feats[b, :nb])
    coords = np.concatenate(rows, axis=0)
    f = torch.from_numpy(np.concatenate(feats, axis=0).astype(np.float32))
    return me.SparseTensor(f, coordinates=coords)


def _assert_level_sets_match(vb, st):
    """The stub manager's generated downsample maps must equal our pyramid's
    level coord sets (guards the whole comparison's alignment)."""
    B = vb.vox_feats.shape[0]
    for lvl, stride in enumerate(sorted(st.coordinate_manager.levels)):
        ours_all = []
        for b in range(B):
            nb = int(vb.num_voxels[lvl][b])
            c = vb.coords[lvl][b, :nb].astype(np.int64)
            ours_all.append(np.concatenate(
                [np.full((nb, 1), b, np.int64), c], axis=1))
        ours = np.unique(np.concatenate(ours_all, axis=0), axis=0)
        theirs = np.unique(st.coordinate_manager.levels[stride], axis=0)
        np.testing.assert_array_equal(ours, theirs,
                                      err_msg=f"level {lvl} coord set")


def _compare_rows(vb, ref_st, ours, atol):
    """ref rows (batch-major exact) vs our padded [B, L0, C] rows."""
    ref = ref_st.F.detach().numpy() if hasattr(ref_st, "F") else ref_st
    got = np.asarray(ours)
    off = 0
    for b in range(got.shape[0]):
        nb = int(vb.num_voxels[0][b])
        np.testing.assert_allclose(
            got[b, :nb], ref[off:off + nb], atol=atol, rtol=atol,
            err_msg=f"batch element {b}")
        off += nb
    assert off == ref.shape[0]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,cks,seed", [("HRNetSeg2S", 5, 10),
                                           ("HRNetSeg3S", 3, 11)])
def test_hrnet_seg_forward_matches_reference(ref, name, cks, seed):
    """Full seg forward: backbone + exchanges + final transitions + 2-layer
    head (`models/hrnet.py:122-163,264-275`). 2S runs the k5 stem; 3S covers
    the 2-hop exchange chains and chained final transitions."""
    me = _install_functional_me()
    cfg = types.SimpleNamespace(bn_momentum=0.02, conv1_kernel_size=cks)
    ref_model = getattr(ref, name)(3, 5, cfg, D=3)
    _randomize_for_forward(ref_model, seed)
    ref_model.eval()

    cls = load_model(name)
    vb = _make_batch(cls, B=2, n=60, seed=seed, conv1_kernel_size=cks)
    st = _ref_input(vb, me)
    with torch.no_grad():
        out_ref = ref_model(st)
    _assert_level_sets_match(vb, out_ref)

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = convert_mink_state_dict(
        sd, num_stages=cls.NUM_STAGES, csn_head=False)
    assert convert_mink_state_dict.unused == []

    ours = cls(out_channels=5, conv1_kernel_size=cks)
    got = jax.jit(lambda v, b: ours.apply(v, b, train=False))(
        {"params": params, "batch_stats": stats}, vb.to_jax())
    _compare_rows(vb, out_ref, got, atol=2e-4)


def test_hrnet_simcsn_csa_forward_matches_reference(ref):
    """The COMPLETE SimCSN head at K=2 (`models/hrnet.py:359-470`): per-batch
    SSA MHA loop, mean-pool -> linear q/k -> L2 normalize -> cos/sqrt(d) ->
    softmax compatibility over [self]+K, comp-weighted cross attention, cat
    with backbone features, output projection — the reference's python loops
    vs our batched masked formulation."""
    me = _install_functional_me()
    cfg = types.SimpleNamespace(bn_momentum=0.02, conv1_kernel_size=3,
                                d_model=16, n_head=2, k_neighbors=2)
    ref_model = ref.HRNetSimCSN2S(3, 5, cfg, D=3)
    _randomize_for_forward(ref_model, 20)
    ref_model.eval()

    cls = load_model("HRNetSimCSN2S")
    vb = _make_batch(cls, B=2, n=60, seed=20, conv1_kernel_size=3)
    kb1 = _make_batch(cls, B=2, n=60, seed=21, conv1_kernel_size=3)
    kb2 = _make_batch(cls, B=2, n=60, seed=22, conv1_kernel_size=3)
    st, sk1, sk2 = (_ref_input(b, me) for b in (vb, kb1, kb2))
    with torch.no_grad():
        out_ref = ref_model(st, keys=[sk1, sk2])
        ssa_ref = ref_model(st, keys=[sk1, sk2], return_ssa=True)

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = convert_mink_state_dict(sd, num_stages=2, csn_head=True,
                                            k_neighbors=2)
    assert convert_mink_state_dict.unused == []

    ours = cls(out_channels=5, conv1_kernel_size=3, d_model=16, n_head=2,
               k_neighbors=2)
    variables = {"params": params, "batch_stats": stats}
    jb, jk1, jk2 = vb.to_jax(), kb1.to_jax(), kb2.to_jax()
    got = jax.jit(lambda v, b, ks: ours.apply(v, b, ks, train=False))(
        variables, jb, (jk1, jk2))
    _compare_rows(vb, out_ref, got, atol=3e-4)

    got_ssa = jax.jit(lambda v, b, ks: ours.apply(
        v, b, ks, train=False, return_ssa=True))(variables, jb, (jk1, jk2))
    _compare_rows(vb, ssa_ref, got_ssa, atol=2e-4)


def test_hrnet_simcsn_ssa_only_matches_reference(ref):
    """K=0 (`models/hrnet.py:418-423`): csa output degenerates to the query
    SSA; out = output(cat(queries_out, SSA))."""
    me = _install_functional_me()
    cfg = types.SimpleNamespace(bn_momentum=0.02, conv1_kernel_size=3,
                                d_model=16, n_head=2, k_neighbors=1)
    ref_model = ref.HRNetSimCSN2S(3, 5, cfg, D=3)
    _randomize_for_forward(ref_model, 30)
    ref_model.eval()

    cls = load_model("HRNetSimCSN2S")
    vb = _make_batch(cls, B=2, n=60, seed=30, conv1_kernel_size=3)
    st = _ref_input(vb, me)
    with torch.no_grad():
        out_ref = ref_model(st, keys=None)

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = convert_mink_state_dict(sd, num_stages=2, csn_head=True,
                                            k_neighbors=1)
    ours = cls(out_channels=5, conv1_kernel_size=3, d_model=16, n_head=2,
               k_neighbors=1)
    got = jax.jit(lambda v, b: ours.apply(v, b, (), train=False))(
        {"params": params, "batch_stats": stats}, vb.to_jax())
    _compare_rows(vb, out_ref, got, atol=2e-4)


@pytest.mark.parametrize("name,seed", [("Res16UNet14", 50),
                                       ("Res16UNet34C", 51)])
def test_res16unet_forward_matches_reference(ref, name, seed):
    """Full Res16UNet forward (`models/res16unet.py:170-229`): k5 stem, four
    k2/s2 encoder convs + residual stages, four k2/s2 transposes with skip
    concats consumed by channel-projecting blocks, k1 head — even-kernel ME
    conv semantics (forward offsets {0..k-1}*s) included."""
    me = _install_functional_me()
    sys.path.insert(0, REF_ROOT)
    try:
        import models.res16unet as ref_r16
    finally:
        sys.path.remove(REF_ROOT)
    from csn_tpu.models.convert import convert_res16unet_state_dict

    cfg = types.SimpleNamespace(bn_momentum=0.02, conv1_kernel_size=5,
                                dilations=(1, 1, 1, 1))
    ref_model = getattr(ref_r16, name)(3, 5, cfg, D=3)
    _randomize_for_forward(ref_model, seed)
    ref_model.eval()

    cls = load_model(name)
    vb = _make_batch(cls, B=2, n=60, seed=seed, conv1_kernel_size=5)
    st = _ref_input(vb, me)
    with torch.no_grad():
        out_ref = ref_model(st)
    _assert_level_sets_match(vb, out_ref)

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = convert_res16unet_state_dict(sd)
    assert convert_res16unet_state_dict.unused == []

    ours = cls(out_channels=5, conv1_kernel_size=5)
    got = jax.jit(lambda v, b: ours.apply(v, b, train=False))(
        {"params": params, "batch_stats": stats}, vb.to_jax())
    _compare_rows(vb, out_ref, got, atol=3e-4)


def test_resunet_forward_matches_reference(ref):
    """Full ResUNet forward (`models/resunet.py:145-190`): level-0 stage,
    three k2/s2 downs, three transposes (the last concat feeds the head
    directly), 2-layer k1 head with its own default-momentum BatchNorm."""
    me = _install_functional_me()
    sys.path.insert(0, REF_ROOT)
    try:
        import models.resunet as ref_ru
    finally:
        sys.path.remove(REF_ROOT)
    from csn_tpu.models.convert import convert_resunet_state_dict

    cfg = types.SimpleNamespace(bn_momentum=0.02, conv1_kernel_size=3,
                                dilations=(1, 1, 1, 1))
    ref_model = ref_ru.ResUNet14(3, 5, cfg, D=3)
    _randomize_for_forward(ref_model, 60)
    ref_model.eval()

    cls = load_model("ResUNet14")
    vb = _make_batch(cls, B=2, n=60, seed=60, conv1_kernel_size=3)
    st = _ref_input(vb, me)
    with torch.no_grad():
        out_ref = ref_model(st)
    _assert_level_sets_match(vb, out_ref)

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = convert_resunet_state_dict(sd)
    assert convert_resunet_state_dict.unused == []

    ours = cls(out_channels=5, conv1_kernel_size=3)
    got = jax.jit(lambda v, b: ours.apply(v, b, train=False))(
        {"params": params, "batch_stats": stats}, vb.to_jax())
    _compare_rows(vb, out_ref, got, atol=3e-4)


def test_reference_cosine_similarity_matches_retrieval_measure(ref):
    """`HRNetSimCSN.cosine_similarity` (`models/hrnet.py:472-490`) — the
    retrieval measure the CSN graph rebuild ranks neighbors by — vs our
    streamed descriptor math on the same feature sets."""
    from csn_tpu.retrieval.graph import retrieval_measure

    rng = np.random.default_rng(40)
    q = rng.normal(size=(33, 16)).astype(np.float32)
    k = rng.normal(size=(47, 16)).astype(np.float32)
    ref_val = ref.HRNetSimCSN.cosine_similarity(
        torch.from_numpy(q), torch.from_numpy(k)).item()
    got = retrieval_measure(q[None], np.ones((1, 33), bool),
                            k[None], np.ones((1, 47), bool))
    np.testing.assert_allclose(np.asarray(got)[0, 0], ref_val, atol=1e-5)
