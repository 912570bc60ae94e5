"""Static-shape sparse voxel batches for TPU.

This module is the TPU-native replacement for MinkowskiEngine's C++/CUDA
CoordinateManager (reference: the ME.TensorField / SparseTensor machinery driven
from `MinkowskiNet/lib/trainer_csn.py:236-258` and `lib/csn_utils.py:54-61`).

Instead of a dynamic coordinate hashmap queried per convolution on device, we
precompute — on the host, per batch — a *voxel pyramid*: one padded, masked,
fixed-capacity coordinate array per stride level, plus integer "kernel maps"
(per-offset neighbor index tables) for every (level, kernel) combination a model
needs. The device then runs pure static-shape gather/matmul/scatter compute,
which is what XLA/MXU want. Quantization modes mirror ME's
``RANDOM_SUBSAMPLE`` / ``UNWEIGHTED_AVERAGE`` (`lib/config.py:156-168`).

Layout conventions
------------------
* Points:  ``[B, P, ...]`` padded with ``point_mask``.
* Voxels:  ``[B, L_l, ...]`` per level ``l`` (stride ``2**l``), padded with
  ``mask``; kernel-map indices address the *flattened* ``[B * L_l]`` axis, with
  the sentinel value ``B * L_l`` meaning "no neighbor" (gathers use
  ``mode='fill'`` with 0.0 so sentinels contribute nothing).
* Level-0 voxel coordinates are ``floor(point / voxel)`` ints; level ``l+1``
  coords are ``floor(c / (2*s)) * (2*s)`` of level-``l`` coords (ME convention:
  coords stay in world-voxel units, stride-``s`` tensors hold multiples of
  ``s``).
"""

from __future__ import annotations

import dataclasses
import enum
import itertools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class QMode(enum.Enum):
    """Quantization mode for point->voxel feature reduction.

    Mirrors ME quantization enums selected in the reference's
    `lib/config.py:156-168` (`--avg_feat` flag).
    """

    RANDOM_SUBSAMPLE = 0
    UNWEIGHTED_AVERAGE = 1


@dataclasses.dataclass(frozen=True)
class MapSpec:
    """One kernel map to build.

    kind:  'same' (stride-1 conv at `level`),
           'down' (stride-2 conv from `level` to `level+1`),
           'up'   (stride-2 transpose conv from `level+1` to `level`).
    ksize: cubic kernel size. Odd kernels use offsets {-(k//2)..k//2}^3 * s,
           even kernels use {0..k-1}^3 * s (ME convention).
    """

    kind: str
    level: int
    ksize: int

    @property
    def name(self) -> str:
        return f"{self.kind}{self.level}k{self.ksize}"

    def offsets(self) -> np.ndarray:
        s = 2 ** self.level
        if self.ksize % 2 == 1:
            r = self.ksize // 2
            rng = np.arange(-r, r + 1) * s
        else:
            rng = np.arange(self.ksize) * s
        offs = np.array(list(itertools.product(rng, rng, rng)), dtype=np.int64)
        return offs  # [ksize**3, 3]

    @property
    def num_offsets(self) -> int:
        return self.ksize ** 3


@dataclasses.dataclass(frozen=True)
class PyramidSpec:
    """Static-shape description of a voxel batch (compilation signature)."""

    voxel_size: float
    num_points: int                   # P: per-shape point capacity
    level_caps: Tuple[int, ...]       # L_l: per-shape voxel capacity per level
    maps: Tuple[MapSpec, ...]
    qmode: QMode = QMode.RANDOM_SUBSAMPLE

    @property
    def num_levels(self) -> int:
        return len(self.level_caps)

    def map_names(self) -> List[str]:
        return [m.name for m in self.maps]


def default_level_caps(num_points: int, num_levels: int,
                       shrink: float = 3.0, floor: int = 64) -> Tuple[int, ...]:
    """Heuristic per-level voxel capacities: each stride-2 level of a 3D sparse
    shape typically shrinks the voxel count by ~4-8x; we budget conservatively
    with `shrink` (default 3x) and round up to a multiple of 8 (TPU sublanes)."""
    caps = []
    cap = float(num_points)
    for _ in range(num_levels):
        c = max(int(np.ceil(cap)), floor)
        caps.append(int(-(-c // 8) * 8))
        cap = cap / shrink
    return tuple(caps)


@dataclasses.dataclass
class VoxelBatch:
    """A fully materialized, static-shape batch (host numpy arrays).

    Convert to device arrays with `.to_jax()`; the result is a pytree suitable
    as a jit argument.
    """

    # Per-point data (level 0 frame): float voxel coords, input features,
    # labels, validity.
    points: np.ndarray         # [B, P, 3] float32  (coords / voxel_size)
    point_feats: np.ndarray    # [B, P, Cf] float32
    labels: np.ndarray         # [B, P] int32 (ignore label kept as-is)
    point_mask: np.ndarray     # [B, P] bool

    # Per-level voxel data.
    coords: List[np.ndarray]   # level l: [B, L_l, 3] int32 (world-voxel units)
    masks: List[np.ndarray]    # level l: [B, L_l] bool
    vox_feats: np.ndarray      # [B, L_0, Cf] float32 (quantized input features)

    # Kernel maps: name -> [K_off, B*L_target] int32 (sentinel = B*L_source).
    kmaps: Dict[str, np.ndarray]

    # Trilinear point readout at level 0.
    interp_idx: np.ndarray     # [B, P, 8] int32 into flattened B*L_0 (sentinel B*L_0)
    interp_w: np.ndarray       # [B, P, 8] float32

    # Map from each point to its containing level-0 voxel (flattened index,
    # sentinel for invalid points). Used for nearest-voxel readout.
    point_to_voxel: np.ndarray  # [B, P] int32

    # Bookkeeping
    num_voxels: List[np.ndarray]  # level l: [B] int32 true counts
    dropped: List[int]            # voxels dropped per level due to caps

    def to_jax(self):
        import jax.numpy as jnp

        return JaxVoxelBatch(
            points=jnp.asarray(self.points),
            point_feats=jnp.asarray(self.point_feats),
            labels=jnp.asarray(self.labels),
            point_mask=jnp.asarray(self.point_mask),
            coords=tuple(jnp.asarray(c) for c in self.coords),
            masks=tuple(jnp.asarray(m) for m in self.masks),
            vox_feats=jnp.asarray(self.vox_feats),
            kmaps={k: jnp.asarray(v) for k, v in self.kmaps.items()},
            interp_idx=jnp.asarray(self.interp_idx),
            interp_w=jnp.asarray(self.interp_w),
            point_to_voxel=jnp.asarray(self.point_to_voxel),
        )


try:
    from flax import struct as _struct
    import jax.numpy as _jnp

    @_struct.dataclass
    class JaxVoxelBatch:
        """Device-side pytree mirror of VoxelBatch (no host bookkeeping)."""

        points: _jnp.ndarray
        point_feats: _jnp.ndarray
        labels: _jnp.ndarray
        point_mask: _jnp.ndarray
        coords: Tuple[_jnp.ndarray, ...]
        masks: Tuple[_jnp.ndarray, ...]
        vox_feats: _jnp.ndarray
        kmaps: Dict[str, _jnp.ndarray]
        interp_idx: _jnp.ndarray
        interp_w: _jnp.ndarray
        point_to_voxel: _jnp.ndarray

        @property
        def batch_size(self) -> int:
            return self.points.shape[0]

        def level_feat_shape(self, level: int) -> Tuple[int, int]:
            return self.masks[level].shape
except Exception:  # pragma: no cover - import-time fallback for pure-numpy use
    JaxVoxelBatch = None


# ---------------------------------------------------------------------------
# Host-side construction
# ---------------------------------------------------------------------------

def _pack_keys(coords: np.ndarray, mins: np.ndarray, dims: np.ndarray) -> np.ndarray:
    """Pack int coords [N,3] into sortable int64 keys (within one shape)."""
    c = coords - mins[None, :]
    return (c[:, 0].astype(np.int64) * dims[1] + c[:, 1]) * dims[2] + c[:, 2]


class _LevelIndex:
    """Sorted-key lookup table for one (batch-element, level) coordinate set."""

    def __init__(self, coords: np.ndarray):
        # coords: [n, 3] int64, unique
        if coords.shape[0] == 0:
            self.mins = np.zeros(3, dtype=np.int64)
            self.dims = np.ones(3, dtype=np.int64)
            self.sorted_keys = np.empty(0, dtype=np.int64)
            self.sorted_idx = np.empty(0, dtype=np.int64)
            return
        self.mins = coords.min(axis=0) - 1
        maxs = coords.max(axis=0) + 2
        self.dims = (maxs - self.mins).astype(np.int64)
        keys = _pack_keys(coords, self.mins, self.dims)
        order = np.argsort(keys, kind="stable")
        self.sorted_keys = keys[order]
        self.sorted_idx = order

    def lookup(self, queries: np.ndarray) -> np.ndarray:
        """queries: [M, 3] int64 -> index into the original coords array,
        or -1 if absent."""
        if self.sorted_keys.shape[0] == 0:
            return np.full(queries.shape[0], -1, dtype=np.int64)
        inside = np.all((queries > self.mins) & (queries < self.mins + self.dims),
                        axis=1)
        q = np.where(inside[:, None], queries, self.mins[None, :] + 1)
        keys = _pack_keys(q, self.mins, self.dims)
        pos = np.searchsorted(self.sorted_keys, keys)
        pos = np.clip(pos, 0, self.sorted_keys.shape[0] - 1)
        found = (self.sorted_keys[pos] == keys) & inside
        out = np.where(found, self.sorted_idx[pos], -1)
        return out


def _quantize_one(points: np.ndarray, feats: np.ndarray, qmode: QMode,
                  rng: np.random.Generator):
    """Quantize one shape's float voxel coords into unique int voxels.

    Returns (vox_coords [n,3] int64, vox_feats [n,Cf], point_to_voxel [P_valid]).
    """
    ic = np.floor(points).astype(np.int64)
    mins = ic.min(axis=0) - 1
    dims = ic.max(axis=0) + 2 - mins
    keys = _pack_keys(ic, mins, dims)
    uniq_keys, inv = np.unique(keys, return_inverse=True)
    n = uniq_keys.shape[0]
    # Reconstruct coords from first occurrence of each key.
    first = np.full(n, -1, dtype=np.int64)
    # np.unique returns sorted keys; map first occurrence:
    order = np.argsort(inv, kind="stable")
    seen_first = np.zeros(n, dtype=bool)
    first_idx = np.empty(n, dtype=np.int64)
    inv_sorted = inv[order]
    boundary = np.ones(inv_sorted.shape[0], dtype=bool)
    boundary[1:] = inv_sorted[1:] != inv_sorted[:-1]
    first_idx[inv_sorted[boundary]] = order[boundary]
    vox_coords = ic[first_idx]

    if qmode == QMode.UNWEIGHTED_AVERAGE:
        cf = feats.shape[1]
        sums = np.zeros((n, cf), dtype=np.float64)
        np.add.at(sums, inv, feats)
        counts = np.bincount(inv, minlength=n).astype(np.float64)
        vox_feats = (sums / counts[:, None]).astype(np.float32)
    else:  # RANDOM_SUBSAMPLE: one random point per voxel
        r = rng.random(points.shape[0])
        # pick the argmax of r within each voxel
        best = np.full(n, -1.0)
        best_idx = np.zeros(n, dtype=np.int64)
        np.maximum.at(best, inv, r)
        hit = r >= best[inv] - 1e-12
        # later points with equal max overwrite; fine (random anyway)
        best_idx[inv[hit]] = np.nonzero(hit)[0]
        vox_feats = feats[best_idx].astype(np.float32)

    return vox_coords, vox_feats, inv


def build_voxel_batch(
    shapes: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    spec: PyramidSpec,
    rng: Optional[np.random.Generator] = None,
    ignore_label: int = 255,
) -> VoxelBatch:
    """Build a static-shape VoxelBatch from a list of shapes.

    shapes: sequence of (coords [P_i,3] float world coords, feats [P_i,Cf],
            labels [P_i] int). Coords are divided by spec.voxel_size here
            (reference: `lib/voxelizer.py:34-45` applies the same scale as a
            homogeneous transform before ME quantizes).
    """
    if rng is None:
        rng = np.random.default_rng(0)
    B = len(shapes)
    P = spec.num_points
    cf = shapes[0][1].shape[1]
    nl = spec.num_levels

    points = np.zeros((B, P, 3), dtype=np.float32)
    point_feats = np.zeros((B, P, cf), dtype=np.float32)
    labels = np.full((B, P), ignore_label, dtype=np.int32)
    point_mask = np.zeros((B, P), dtype=bool)

    coords = [np.zeros((B, spec.level_caps[l], 3), dtype=np.int32) for l in range(nl)]
    masks = [np.zeros((B, spec.level_caps[l]), dtype=bool) for l in range(nl)]
    vox_feats = np.zeros((B, spec.level_caps[0], cf), dtype=np.float32)
    num_voxels = [np.zeros(B, dtype=np.int32) for _ in range(nl)]
    dropped = [0 for _ in range(nl)]

    point_to_voxel = np.full((B, P), B * spec.level_caps[0], dtype=np.int32)

    # per (b, level) lookup tables
    indices: List[List[_LevelIndex]] = [[None] * nl for _ in range(B)]

    for b, (c, f, lab) in enumerate(shapes):
        p = min(c.shape[0], P)
        pts = (np.asarray(c[:p], dtype=np.float64) / spec.voxel_size)
        points[b, :p] = pts.astype(np.float32)
        point_feats[b, :p] = f[:p]
        labels[b, :p] = np.asarray(lab[:p]).reshape(-1)
        point_mask[b, :p] = True

        vc, vf, inv = _quantize_one(pts, np.asarray(f[:p], dtype=np.float32),
                                    spec.qmode, rng)
        n0 = vc.shape[0]
        if n0 > spec.level_caps[0]:
            dropped[0] += n0 - spec.level_caps[0]
            keep = n0  # we still drop below after assignment ordering
            vc = vc[: spec.level_caps[0]]
            vf = vf[: spec.level_caps[0]]
            n0 = spec.level_caps[0]
        coords[0][b, :n0] = vc
        masks[0][b, :n0] = True
        vox_feats[b, :n0] = vf
        num_voxels[0][b] = n0
        p2v = inv
        valid_v = p2v < n0
        point_to_voxel[b, :p] = np.where(
            valid_v, b * spec.level_caps[0] + p2v, B * spec.level_caps[0]
        )
        indices[b][0] = _LevelIndex(vc.astype(np.int64))

        prev = vc.astype(np.int64)
        for l in range(1, nl):
            s2 = 2 ** l
            down = (np.floor_divide(prev, s2)) * s2
            uniq = np.unique(down, axis=0)
            n = uniq.shape[0]
            if n > spec.level_caps[l]:
                dropped[l] += n - spec.level_caps[l]
                uniq = uniq[: spec.level_caps[l]]
                n = spec.level_caps[l]
            coords[l][b, :n] = uniq
            masks[l][b, :n] = True
            num_voxels[l][b] = n
            indices[b][l] = _LevelIndex(uniq)
            prev = uniq

    # Kernel maps
    kmaps: Dict[str, np.ndarray] = {}
    for m in spec.maps:
        if m.kind == "same":
            src_l, dst_l = m.level, m.level
            sign = +1
        elif m.kind == "down":
            src_l, dst_l = m.level, m.level + 1
            sign = +1
        elif m.kind == "up":
            src_l, dst_l = m.level + 1, m.level
            sign = -1
        else:
            raise ValueError(m.kind)
        if dst_l >= nl or src_l >= nl:
            raise ValueError(
                f"map {m.name} needs level {max(src_l, dst_l)} but spec has {nl}"
            )
        Ld = spec.level_caps[dst_l]
        Ls = spec.level_caps[src_l]
        offs = m.offsets()
        K = offs.shape[0]
        table = np.full((K, B * Ld), B * Ls, dtype=np.int32)
        for b in range(B):
            n = int(num_voxels[dst_l][b])
            if n == 0:
                continue
            out_c = coords[dst_l][b, :n].astype(np.int64)
            src_index = indices[b][src_l]
            for k in range(K):
                q = out_c + sign * offs[k][None, :]
                hit = src_index.lookup(q)
                col = np.where(hit >= 0, b * Ls + hit, B * Ls)
                table[k, b * Ld : b * Ld + n] = col.astype(np.int32)
        kmaps[m.name] = table

    # Trilinear interpolation tables at level 0 (replaces
    # `soutput.interpolate(queries_field)`, `lib/trainer_csn.py:201`).
    L0 = spec.level_caps[0]
    interp_idx = np.full((B, P, 8), B * L0, dtype=np.int32)
    interp_w = np.zeros((B, P, 8), dtype=np.float32)
    corner_offs = np.array(list(itertools.product([0, 1], repeat=3)), dtype=np.int64)
    for b in range(B):
        p = int(point_mask[b].sum())
        if p == 0:
            continue
        pts = points[b, :p].astype(np.float64)
        base = np.floor(pts).astype(np.int64)
        frac = pts - base
        src_index = indices[b][0]
        for k in range(8):
            off = corner_offs[k]
            q = base + off[None, :]
            hit = src_index.lookup(q)
            w = np.prod(
                np.where(off[None, :] == 1, frac, 1.0 - frac), axis=1
            ).astype(np.float32)
            interp_idx[b, :p, k] = np.where(hit >= 0, b * L0 + hit, B * L0).astype(
                np.int32
            )
            interp_w[b, :p, k] = np.where(hit >= 0, w, 0.0)

    return VoxelBatch(
        points=points,
        point_feats=point_feats,
        labels=labels,
        point_mask=point_mask,
        coords=coords,
        masks=masks,
        vox_feats=vox_feats,
        kmaps=kmaps,
        interp_idx=interp_idx,
        interp_w=interp_w,
        point_to_voxel=point_to_voxel,
        num_voxels=num_voxels,
        dropped=dropped,
    )
