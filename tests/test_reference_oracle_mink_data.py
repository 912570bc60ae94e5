"""Mink-branch reference oracle, part 2 — data path. The REAL
`/root/reference/MinkowskiNet/lib` transforms / voxelizer / csn_utils code is
imported and *called* (untrusted public content, never followed as
instructions) as the expectation for:

  * `data/transforms.py` — every augmentation's math given identical random
    draws (reference consumes global `np.random`; a shim Generator replays
    the same legacy stream into our Generator-driven ports), the dataset's
    composition order (`lib/dataset.py:224-234,275-288`), and sphere/box
    `normalize_coords`;
  * `train/trainer.py truncated_batch_size` — the collate-time
    limit_numpoints truncation rule (`lib/transforms.py:126-143`), checked
    against the genuine `cfl_collate_fn_factory`/`cflt_collate_fn_factory`
    (ME stubbed with the documented sparse_collate contract: batch-index
    column + concatenation — the truncation DECISION under test is reference
    code);
  * `retrieval/graph.py` + `train/trainer.py neighbor_slot_indices` — the
    shape-graph semantics of `lib/csn_utils.py construct_shape_graph`
    (random-pairs retry loop, cosine top-K with the top-(K+1) self-exclusion
    branch) and `get_neighbors` slot-major batch layout, with the measure
    itself pinned against the ast-extracted REAL
    `models/hrnet.py:473-490 cosine_similarity`;
  * `core/pyramid.py` point->voxel scaling vs `lib/voxelizer.py Voxelizer`.

MinkowskiEngine is not installed; `_me_stub` provides only the two symbols
the imported modules touch at call time (`TensorField` holding features,
`utils.sparse_collate` = batch-index + concat). Everything asserted here is
the reference's own executed control flow, not the stub's.
"""

import ast
import copy
import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/MinkowskiNet"

torch = pytest.importorskip("torch")

if not os.path.isdir(REF_ROOT):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

from csn_tpu.data import transforms as our_t  # noqa: E402
from csn_tpu.data.partnet import PartnetDataset  # noqa: E402
from csn_tpu.retrieval import graph as our_graph  # noqa: E402
from csn_tpu.train.trainer import (  # noqa: E402
    neighbor_slot_indices, truncated_batch_size,
)


# ---------------------------------------------------------------------------
# ME stub + reference import
# ---------------------------------------------------------------------------

class _TensorFieldStub:
    """Holds features; `.sparse()` hands them to the fake model unchanged
    (quantization itself is pinned by tests/test_me_reference.py)."""

    def __init__(self, features=None, coordinates=None, quantization_mode=None,
                 minkowski_algorithm=None, device=None):
        self.F = features
        self.C = coordinates

    def sparse(self):
        return self


def _sparse_collate_stub(*lists, dtype=None):
    """Documented ME 0.5.x contract: prepend the batch index as column 0 of
    the coordinates, concatenate everything else."""
    outs = []
    for j, lst in enumerate(lists):
        ts = [torch.as_tensor(x) for x in lst]
        if j == 0:
            ts = [torch.cat(
                [torch.full((t.shape[0], 1), i, dtype=t.dtype), t], dim=1)
                for i, t in enumerate(ts)]
        outs.append(torch.cat(ts, dim=0))
    return tuple(outs) if len(outs) > 1 else outs[0]


@pytest.fixture(scope="module")
def ref():
    if "MinkowskiEngine" not in sys.modules:
        me = types.ModuleType("MinkowskiEngine")
        me_utils = types.ModuleType("MinkowskiEngine.utils")
        me_utils.sparse_collate = _sparse_collate_stub
        me.utils = me_utils
        me.TensorField = _TensorFieldStub
        sys.modules["MinkowskiEngine"] = me
        sys.modules["MinkowskiEngine.utils"] = me_utils
    old_err = np.geterr()  # lib/transforms.py:7 calls np.seterr globally
    sys.path.insert(0, REF_ROOT)
    try:
        from lib import transforms as ref_transforms
        from lib import voxelizer as ref_voxelizer
        from lib import csn_utils as ref_csn_utils
    finally:
        sys.path.remove(REF_ROOT)
        np.seterr(**old_err)
    return types.SimpleNamespace(t=ref_transforms, vox=ref_voxelizer,
                                 csn=ref_csn_utils)


@pytest.fixture(scope="module")
def ref_cosine():
    """The REAL mean-of-max cosine (`models/hrnet.py:473-490`), ast-extracted
    so the ME-importing module around it never executes."""
    src = open(os.path.join(REF_ROOT, "models", "hrnet.py")).read()
    tree = ast.parse(src)
    fn = None
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and \
                node.name == "cosine_similarity":
            fn = node
            break
    assert fn is not None
    fn.decorator_list = []
    mod = ast.Module(body=[fn], type_ignores=[])
    ast.fix_missing_locations(mod)
    ns = {"torch": torch}
    exec(compile(mod, "<hrnet.cosine_similarity>", "exec"), ns)
    return ns["cosine_similarity"]


class _LegacyGen:
    """np.random.Generator facade that replays the legacy global stream the
    reference consumes — seeding np.random identically on both sides makes
    draw-for-draw comparison exact."""

    def standard_normal(self, shape):
        return np.random.randn(*shape)

    def uniform(self, lo, hi):
        return np.random.uniform(lo, hi)

    def choice(self, n, k, replace=True):
        return np.random.choice(n, k, replace=replace)


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def _cloud(rng, n=57, extra_feat=2):
    coords = rng.normal(size=(n, 3)) * 0.7
    feats = rng.normal(size=(n, 3 + extra_feat))
    labels = rng.integers(0, 5, n)
    return coords, feats, labels


def test_random_shift_matches_reference(ref):
    coords, feats, labels = _cloud(np.random.default_rng(0))
    np.random.seed(11)
    rc, rf, rl = ref.t.RandomShift(sigma=0.01, clip=0.05)(
        coords.copy(), feats.copy(), labels.copy())
    np.random.seed(11)
    oc, of, ol = our_t.RandomShift(sigma=0.01, clip=0.05)(
        coords.copy(), feats.copy(), labels.copy(), _LegacyGen())
    np.testing.assert_allclose(oc, rc, rtol=0, atol=0)
    np.testing.assert_array_equal(of, rf)


def test_random_jittering_matches_reference(ref):
    coords, feats, labels = _cloud(np.random.default_rng(1))
    np.random.seed(12)
    rc, _, _ = ref.t.RandomJittering(0.25, 0.25, 0.25)(
        coords.copy(), feats, labels)
    np.random.seed(12)
    oc, _, _ = our_t.RandomJittering(0.25, 0.25, 0.25)(
        coords.copy(), feats, labels, _LegacyGen())
    np.testing.assert_allclose(oc, rc, rtol=0, atol=0)


def test_random_scaling_matches_reference(ref):
    coords, feats, labels = _cloud(np.random.default_rng(2))
    np.random.seed(13)
    rc, _, _ = ref.t.RandomScaling(0.75, 1.25)(coords.copy(), feats, labels)
    np.random.seed(13)
    oc, _, _ = our_t.RandomScaling(0.75, 1.25)(
        coords.copy(), feats, labels, _LegacyGen())
    np.testing.assert_allclose(oc, rc, rtol=0, atol=1e-15)


def test_rotation_matches_reference_including_normals(ref):
    coords, feats, labels = _cloud(np.random.default_rng(3))
    bound = PartnetDataset.ROTATION_AUGMENTATION_BOUND
    # Reference: the dataset samples the angle, then the transform applies it
    # (`lib/dataset.py:224-227`). Ours samples inside the transform from the
    # same bound — one uniform draw either way.
    np.random.seed(14)
    angle = np.random.uniform(bound[0], bound[1])
    ref.t.RotationAugmentation.update_angle(angle)
    rc, rf, _ = ref.t.RotationAugmentation(use_normals=True)(
        coords.copy(), feats.copy(), labels)
    np.random.seed(14)
    oc, of, _ = our_t.RotationAugmentation(bound, use_normals=True)(
        coords.copy(), feats.copy(), labels, _LegacyGen())
    np.testing.assert_allclose(oc, rc, rtol=0, atol=1e-12)
    np.testing.assert_allclose(of, rf, rtol=0, atol=1e-12)
    # without normals the features pass through untouched
    ref.t.RotationAugmentation.update_angle(angle)
    rc2, rf2, _ = ref.t.RotationAugmentation(use_normals=False)(
        coords.copy(), feats.copy(), labels)
    np.random.seed(14)
    oc2, of2, _ = our_t.RotationAugmentation(bound, use_normals=False)(
        coords.copy(), feats.copy(), labels, _LegacyGen())
    np.testing.assert_allclose(oc2, rc2, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(of2, rf2)


@pytest.mark.parametrize("shift,jitter,scale", [
    (True, False, True),    # the PartNet training chain (shift wins the XOR)
    (False, True, True),
    (False, False, True),
    (True, False, False),
])
def test_composed_chain_matches_reference(ref, shift, jitter, scale):
    """Full dataset-order chain (`lib/dataset.py:275-288`): rotation, then
    shift XOR jitter, then scale — same draws, same outputs."""
    coords, feats, labels = _cloud(np.random.default_rng(4))
    cls = PartnetDataset
    bound = cls.ROTATION_AUGMENTATION_BOUND

    ref_chain = [ref.t.RotationAugmentation(use_normals=False)]
    if shift:
        ref_chain.append(ref.t.RandomShift(*cls.SHIFT_PARAMS))
    elif jitter:
        ref_chain.append(ref.t.RandomJittering(*cls.JITTER_AUGMENTATION_BOUND))
    if scale:
        ref_chain.append(ref.t.RandomScaling(*cls.SCALE_AUGMENTATION_BOUND))
    np.random.seed(21)
    angle = np.random.uniform(bound[0], bound[1])  # dataset.py:224
    ref.t.RotationAugmentation.update_angle(angle)
    rc, rf, rl = ref.t.Compose(ref_chain)(coords.copy(), feats.copy(),
                                          labels.copy())

    ours = our_t.build_prevoxel_transforms(cls, rot_aug=True, shift=shift,
                                           jitter=jitter, scale=scale)
    np.random.seed(21)
    oc, of, ol = ours(coords.copy(), feats.copy(), labels.copy(),
                      _LegacyGen())
    np.testing.assert_allclose(oc, rc, rtol=0, atol=1e-12)
    np.testing.assert_allclose(of, rf, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(ol, rl)


@pytest.mark.parametrize("method", ["sphere", "box"])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_normalize_coords_matches_reference(ref, method, dtype):
    coords = np.random.default_rng(5).normal(size=(83, 3)).astype(dtype) * 3.1
    r = ref.t.normalize_coords(coords.copy(), method=method)
    o = our_t.normalize_coords(coords.copy(), method=method)
    np.testing.assert_allclose(o, r, rtol=0, atol=0)
    # degenerate single-repeated-point cloud exercises the tolerance floor
    coords1 = np.ones((4, 3), dtype=dtype)
    np.testing.assert_allclose(
        our_t.normalize_coords(coords1, method=method),
        ref.t.normalize_coords(coords1, method=method), rtol=0, atol=0)


# ---------------------------------------------------------------------------
# collate truncation (limit_numpoints)
# ---------------------------------------------------------------------------

def _list_data(rng, counts, with_transformation=False):
    out = []
    for c in counts:
        coords = rng.normal(size=(c, 3)).astype(np.float32)
        feats = rng.normal(size=(c, 2)).astype(np.float32)
        labels = rng.integers(0, 4, c).astype(np.int32)
        if with_transformation:
            out.append((coords, feats, labels,
                        rng.normal(size=(4, 4)).astype(np.float32)))
        else:
            out.append((coords, feats, labels))
    return out


def test_collate_truncation_matches_reference(ref):
    rng = np.random.default_rng(6)
    trials = 0
    for _ in range(60):
        b = int(rng.integers(1, 9))
        counts = rng.integers(40, 400, b)
        total = int(counts.sum())
        # limit regimes: none, generous, tight (first shape always fits —
        # the reference crashes otherwise, see truncated_batch_size's note)
        for limit in (0, total + 10,
                      int(rng.integers(int(counts[0]), total + 1))):
            data = _list_data(rng, counts)
            c_b, f_b, l_b = ref.t.cfl_collate_fn_factory(limit)(data)
            kept_ref = int(c_b[:, 0].max().item()) + 1
            kept_ours = truncated_batch_size(counts, limit)
            assert kept_ours == kept_ref, (counts, limit)
            # the kept rows are exactly the first kept_ref shapes, in order
            assert f_b.shape[0] == int(counts[:kept_ref].sum())
            trials += 1
    assert trials >= 180


def test_cflt_transformation_truncation_matches_reference(ref):
    rng = np.random.default_rng(7)
    counts = np.array([100, 120, 90, 300])
    limit = 250   # keeps shapes 0-1
    data = _list_data(rng, counts, with_transformation=True)
    c_b, f_b, l_b, trans = ref.t.cflt_collate_fn_factory(limit)(data)
    kept = truncated_batch_size(counts, limit)
    assert kept == int(c_b[:, 0].max().item()) + 1
    assert len(trans) == kept  # transformations truncated to the kept batch


# ---------------------------------------------------------------------------
# csn_utils: shape graph construction + neighbor fetch layout
# ---------------------------------------------------------------------------

class _RefDataset:
    """Minimal stand-in for the reference dataset protocol consumed by
    `construct_shape_graph` / `get_neighbors`: indexable -> (coords, feats,
    _, _) numpy, with `prevoxel_transform` and `prefetched_coords`."""

    def __init__(self, shapes):
        self.shapes = shapes
        self.prevoxel_transform = None
        self.prefetched_coords = [c for c, _ in shapes]

    def __len__(self):
        return len(self.shapes)

    def __getitem__(self, i):
        c, f = self.shapes[i]
        return c, f, None, None


class _FakeSSAModel:
    """Deterministic SSA stand-in: a fixed linear map of the input features.
    `cosine_similarity` is the REAL extracted hrnet method, so the measure
    math under test is reference code."""

    def __init__(self, w, cosine):
        self.w = w
        self._cosine = cosine

    def __call__(self, sparse, return_ssa=False):
        assert return_ssa
        return types.SimpleNamespace(F=sparse.F @ self.w)

    def cosine_similarity(self, q, k):
        return self._cosine(q, k)


def _make_shapes(rng, n, d_in=4, p_lo=5, p_hi=13):
    shapes = []
    for _ in range(n):
        p = int(rng.integers(p_lo, p_hi))
        coords = rng.normal(size=(p, 3))
        feats = rng.normal(size=(p, d_in))
        shapes.append((coords.astype(np.float64), feats.astype(np.float64)))
    return shapes


def _our_padded_ssa(shapes, w):
    """Our side of the same SSA map: padded [N, Pmax, d] + mask."""
    n = len(shapes)
    pmax = max(f.shape[0] for _, f in shapes)
    d = w.shape[1]
    feats = np.zeros((n, pmax, d), dtype=np.float32)
    mask = np.zeros((n, pmax), dtype=bool)
    for i, (_, f) in enumerate(shapes):
        ssa = (f.astype(np.float32) @ w)
        feats[i, : ssa.shape[0]] = ssa
        mask[i, : ssa.shape[0]] = True
    return feats, mask


@pytest.mark.parametrize("is_same", [True, False])
def test_construct_shape_graph_cosine_matches_reference(
        ref, ref_cosine, monkeypatch, is_same):
    """The cosine branch (`csn_utils.py:44-97`): reference topk + the
    top-(K+1) self-exclusion vs retrieval_measure + knn_graph_from_measure.
    With is_same=True every query's self-similarity is exactly 1.0 (top-1),
    so the K+1 exclusion branch fires on every query."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=True)
    rng = np.random.default_rng(8 + is_same)
    q_shapes = _make_shapes(rng, 7)
    k_shapes = q_shapes if is_same else _make_shapes(rng, 9)
    d_in, d = 4, 6
    w32 = rng.normal(size=(d_in, d)).astype(np.float32)

    model = _FakeSSAModel(torch.from_numpy(w32), ref_cosine)
    K = 2
    ref_out = ref.csn.construct_shape_graph(
        model=model, device="cpu", query_dataset=_RefDataset(q_shapes),
        mink_settings={"q_mode": None, "mink_algo": None},
        key_dataset=None if is_same else _RefDataset(k_shapes),
        K=K, writer=None, random_pairs=False)

    qf, qm = _our_padded_ssa(q_shapes, w32)
    kf, km = (qf, qm) if is_same else _our_padded_ssa(k_shapes, w32)
    measure = our_graph.retrieval_measure(qf, qm, kf, km, query_block=3,
                                          key_chunk=4)
    ours = our_graph.knn_graph_from_measure(measure, K, is_same=is_same)
    assert ours == [(q, list(nbrs)) for q, nbrs in ref_out]

    # and the measure itself matches the extracted reference math pairwise
    for qi in (0, 3):
        for ki in (1, 4):
            r = ref_cosine(
                torch.from_numpy(qf[qi][qm[qi]]),
                torch.from_numpy(kf[ki][km[ki]])).item()
            np.testing.assert_allclose(measure[qi, ki], r, atol=1e-5)


def test_random_pairs_matches_reference_stream(ref):
    """The random-pairs branch (`csn_utils.py:31-43`): identical legacy
    np.random stream -> identical graphs, including the retry-while-self
    loop's draw consumption order."""
    shapes = _make_shapes(np.random.default_rng(9), 10)
    for K in (1, 3):
        np.random.seed(100 + K)
        ref_out = ref.csn.construct_shape_graph(
            model=None, device="cpu", query_dataset=_RefDataset(shapes),
            mink_settings=None, K=K, writer=None, random_pairs=True)
        np.random.seed(100 + K)
        ours = our_graph.random_pairs(len(shapes), len(shapes), K,
                                      is_same=True, rng=_LegacyGen())
        assert ours == [(q, list(nbrs)) for q, nbrs in ref_out]
        for q, nbrs in ours:   # semantic invariants
            assert q not in nbrs and len(set(nbrs)) == K


def test_get_neighbors_slot_layout_matches_reference(ref):
    """`get_neighbors` (`csn_utils.py:114-130`) stacks the i-th neighbor of
    every query into batch i — the slot-major layout our trainer builds with
    neighbor_slot_indices. Features are the shape index, so the reference's
    own batches reveal which shape landed where."""
    rng = np.random.default_rng(10)
    n_key, n_query, K, P = 8, 5, 3, 6
    shapes = [(rng.normal(size=(P, 3)),
               np.full((P, 2), float(i))) for i in range(n_key)]
    neighbors = []
    for q in range(n_query):
        neighbors.append((q, rng.choice(n_key, K, replace=False).tolist()))

    ref_slots = ref.csn.get_neighbors(_RefDataset(shapes), neighbors, K)
    assert len(ref_slots) == K
    ours = neighbor_slot_indices(neighbors, list(range(n_query)), K)
    for i in range(K):
        input_batch, coords_batch = ref_slots[i]
        got = input_batch.reshape(n_query, P, 2)[:, 0, 0].numpy().astype(int)
        assert got.tolist() == ours[i]
        # coords carry the batch index column the collate prepends
        assert int(coords_batch[:, 0].max().item()) == n_query - 1


# ---------------------------------------------------------------------------
# voxelizer scaling
# ---------------------------------------------------------------------------

def test_voxelizer_scaling_matches_pyramid(ref):
    """`lib/voxelizer.py:34-45`: the only transform applied is the 1/voxel
    homogeneous scale; our pipeline divides by spec.voxel_size before
    flooring (`core/pyramid.py:777`). Same floats, same floors at the
    protocol voxel size."""
    rng = np.random.default_rng(11)
    coords = rng.normal(size=(200, 3)) * 0.9
    feats = rng.normal(size=(200, 3))
    labels = rng.integers(0, 5, 200)
    v = 0.05
    ref_coords, ref_feats, ref_labels, rigid = ref.vox.Voxelizer(
        voxel_size=v).voxelize(coords.copy(), feats, labels)
    ours = coords / v
    np.testing.assert_allclose(ours, ref_coords, rtol=0, atol=1e-9)
    np.testing.assert_array_equal(np.floor(ours), np.floor(ref_coords))
    # the returned rigid transformation is the same diagonal scale
    np.testing.assert_allclose(rigid.reshape(4, 4),
                               np.diag([1 / v, 1 / v, 1 / v, 1.0]))


# ---------------------------------------------------------------------------
# full dataset __getitem__ path (lib/dataset.py + lib/datasets/partnet.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_ds(ref):
    """Import the REAL VoxelizationDataset/PartnetVoxelizationDataset (ME
    already stubbed by `ref`). numpy 2.0 removed the `np.int` alias
    `lib/dataset.py:244` evaluates inside __getitem__; rebind the module's
    own `np` name to a shimmed namespace (global numpy stays untouched)."""
    old_err = np.geterr()
    sys.path.insert(0, REF_ROOT)
    try:
        from lib import dataset as ref_dataset
        from lib.datasets import partnet as ref_partnet
    finally:
        sys.path.remove(REF_ROOT)
        np.seterr(**old_err)
    np_compat = types.SimpleNamespace()
    np_compat.__dict__.update(
        {k: getattr(np, k) for k in dir(np) if not k.startswith("_")})
    np_compat.int = int
    ref_dataset.np = np_compat
    return types.SimpleNamespace(dataset=ref_dataset, partnet=ref_partnet)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from csn_tpu.data.partnet import write_synthetic_partnet

    root = tmp_path_factory.mktemp("partnet_oracle_ds")
    write_synthetic_partnet(str(root), category="Display", n_train=6, n_val=2,
                            n_test=2, num_points=96)
    return str(root)


def _ref_config(root, category="Display", random_rotation=False):
    return types.SimpleNamespace(
        partnet_category=category, partnet_path=root, input_feat="xyz",
        ignore_label=255, return_transformation=False, prefetch_data=True,
        normalize_coords=True, normalize_method="sphere", load_h5=True,
        return_neighbors=False, random_rotation=random_rotation)


def test_dataset_getitem_matches_reference_no_aug(ref_ds, synth_root):
    """The full un-augmented __getitem__ chain (`lib/dataset.py:222-252`):
    h5 prefetch + per-shape sphere normalization + xyz coords-as-features +
    1/voxel scaling + identity label map. Our dataset serves world coords
    (the pyramid scales later, `core/pyramid.py:777`), so ref coords ==
    ours / VOXEL_SIZE."""
    from csn_tpu.data.partnet import make_partnet_dataset

    ref_obj = ref_ds.partnet.PartnetVoxelizationDataset(
        _ref_config(synth_root), prevoxel_transform=None, rot_aug=False,
        phase="train")
    ours = make_partnet_dataset(synth_root, "Display", "train",
                                distort=False)
    assert len(ref_obj) == len(ours) == 6
    v = ref_ds.partnet.PartnetVoxelizationDataset.VOXEL_SIZE
    for i in range(len(ours)):
        rc, rf, rl = ref_obj[i]
        oc, of, ol = ours.get(i, augment=False)
        np.testing.assert_allclose(oc / v, rc, rtol=0, atol=1e-5)
        np.testing.assert_allclose(of, rf, rtol=0, atol=0)  # feats: world
        np.testing.assert_array_equal(ol, rl)


def test_dataset_getitem_matches_reference_distort_aug(ref, ref_ds,
                                                       synth_root):
    """The augmented chain at the --distort_partnet transform stack
    (rotation + jitter + scale, `lib/config.py` macro; composition per
    `lib/dataset.py:275-288`), draw-for-draw: the reference samples the
    angle in __getitem__ (`dataset.py:224-227`) then runs the prevoxel
    Compose; ours consumes the same legacy stream through the shim
    Generator."""
    from csn_tpu.data.partnet import PartnetDataset, make_partnet_dataset

    cls = PartnetDataset
    prevoxel = ref.t.Compose([
        ref.t.RotationAugmentation(use_normals=False),
        ref.t.RandomJittering(*cls.JITTER_AUGMENTATION_BOUND),
        ref.t.RandomScaling(*cls.SCALE_AUGMENTATION_BOUND),
    ])
    ref_obj = ref_ds.partnet.PartnetVoxelizationDataset(
        _ref_config(synth_root, random_rotation=True),
        prevoxel_transform=prevoxel, rot_aug=True, phase="train")
    ours = make_partnet_dataset(synth_root, "Display", "train", distort=True)
    v = ref_ds.partnet.PartnetVoxelizationDataset.VOXEL_SIZE
    for i in range(len(ours)):
        np.random.seed(4000 + i)
        rc, rf, rl = ref_obj[i]
        np.random.seed(4000 + i)
        oc, of, ol = ours.get(i, rng=_LegacyGen(), augment=True)
        np.testing.assert_allclose(oc / v, rc, rtol=0, atol=1e-5)
        np.testing.assert_allclose(of, rf, rtol=0, atol=1e-12)
        np.testing.assert_array_equal(ol, rl)


def test_dataset_label_map_with_ignored_labels(ref_ds, synth_root):
    """`lib/dataset.py:199-209,243-244`: labels in IGNORE_LABELS map to the
    ignore mask and the rest renumber densely. PartNet ships no ignored
    classes, so force one through the class attribute to pin the remap
    machinery itself."""
    ref_obj = ref_ds.partnet.PartnetVoxelizationDataset(
        _ref_config(synth_root), prevoxel_transform=None, rot_aug=False,
        phase="train")
    # rebuild the label map the way __init__ does, with label 1 ignored
    ignore, n_used, label_map = (1,), 0, {}
    for lab in range(4):
        if lab in ignore:
            label_map[lab] = 255
        else:
            label_map[lab] = n_used
            n_used += 1
    label_map[255] = 255
    ref_obj.IGNORE_LABELS = ignore
    ref_obj.label_map = label_map
    _, _, rl = ref_obj[0]
    raw = ref_obj.prefetched_labels[0]
    expect = np.array([label_map[x] for x in raw])
    np.testing.assert_array_equal(rl, expect)
    assert (rl == 255).sum() == (raw == 1).sum()


# ---------------------------------------------------------------------------
# results collection (lib/collect_partnet_results.py)
# ---------------------------------------------------------------------------

def test_collect_partnet_results_matches_reference(tmp_path, monkeypatch,
                                                   capsys):
    """The REAL `lib/collect_partnet_results.py main()` run on a synthetic
    17-category experiment tree (the testing_csn.sh layout:
    `<base>/<Cat>-k1-*/..._evaluation/results/results_log.txt`) must extract
    the same per-category Part/Shape IoU values, in the same order, as our
    `tasks/collect_partnet_results.py` — including the `-k{K}-` directory
    filter and the last-token line parse of the files OUR test_on writes."""
    import importlib
    from csn_tpu.data.partnet import CATEGORIES
    from csn_tpu.tasks import collect_partnet_results as ours

    sys.path.insert(0, REF_ROOT)
    try:
        ref_mod = importlib.import_module("lib.collect_partnet_results")
    finally:
        sys.path.remove(REF_ROOT)

    rng = np.random.default_rng(12)
    base = tmp_path / "experiments"
    expect = {}
    for cat in CATEGORIES:
        s, p = round(float(rng.uniform(20, 80)), 2), \
            round(float(rng.uniform(20, 80)), 2)
        expect[cat] = (s, p)
        d = base / f"{cat}-k1-run" / "test_evaluation" / "results"
        os.makedirs(d)
        # the exact file our test_on(save_pred_dir=...) writes
        (d / "results_log.txt").write_text(
            f"Shape IoU: {s}\nPart IoU: {p}\n")
    # a decoy run that the -k1- filter must exclude
    d = base / "Chair-k2-run" / "test_evaluation" / "results"
    os.makedirs(d)
    (d / "results_log.txt").write_text("Shape IoU: 1.0\nPart IoU: 1.0\n")

    monkeypatch.setattr(sys, "argv",
                        ["collect_partnet_results.py", str(base), "1"])
    ref_mod.main()
    out = capsys.readouterr().out
    ref_part = eval(out.split("PART IOU:")[1].splitlines()[2])
    ref_shape = eval(out.split("SHAPE IOU:")[1].splitlines()[2])

    rows = ours.main(["--results_root", str(base),
                      "--pattern", "{cat}-k1-*/*evaluation/results/"
                                   "results_log.txt"])
    capsys.readouterr()
    assert [p for _, _, p in rows] == ref_part
    assert [s for _, s, _ in rows] == ref_shape
    # the order both sides produce is the sorted category order
    assert ref_part == [expect[c][1] for c in CATEGORIES]
