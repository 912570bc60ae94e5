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
import os
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


_POOL = None
_POOL_INIT_LOCK = threading.Lock()


def _host_pool():
    """Shared thread pool for host-side batch builds.

    build_voxel_batch used to construct (and join) two fresh
    ``ThreadPoolExecutor``s per batch — ~15 thread spawns + joins each call
    (cProfile at bench scale B=8). The builders (C++ engine, worklist
    builds) release the GIL, so one persistent pool is safe and removes
    that per-batch overhead. Sized at 8: the per-shape builds and the
    per-map worklist builds each submit <= 8-9 jobs, and none of the
    submitted functions submit nested pool work (deadlock-free).
    """
    global _POOL
    if _POOL is None:
        with _POOL_INIT_LOCK:
            if _POOL is None:  # double-checked: callers race (the trainer
                # builds query + neighbor batches concurrently); without
                # the lock each racer creates a pool and one leaks its 8
                # threads
                from concurrent.futures import ThreadPoolExecutor

                _POOL = ThreadPoolExecutor(max_workers=8,
                                           thread_name_prefix="csn-host")
    return _POOL


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
    # Emit per-(tile, offset-group) window-job worklists so same-level k3
    # convs run the Pallas windowed-gather kernel (core/window_conv.py,
    # fixed WINDOW source rows per job). TPU-only: leave False on CPU.
    use_windows: bool = False
    # Dense-grid stem conv (core/conv.py dense_stem_conv): G > 0 ships
    # per-shape level-0 cell coordinates so raw-data stems (Cin < 16) run as
    # ONE dense 3D convolution on a [G, G, G] per-shape grid — exact
    # (non-voxel cells are zero) and MXU-shaped, vs ksize^3 one-hot gathers.
    # 0 disables; batches whose level-0 extent exceeds G fall back (logged).
    dense_stem_grid: int = 0
    # Sort each shape's points by containing level-0 voxel at batch build.
    # Semantically free (per-point arrays permute together; loss/metrics are
    # permutation-invariant) and it makes the interp corner tables window-
    # able: with it, batches carry 'win!interp_f'/'win!interp_b' worklists
    # so the voxel<->point readout runs the Pallas windowed kernels
    # (core/interp_window.py) instead of XLA's row gather / serial scatter.
    sort_points: bool = False

    @property
    def num_levels(self) -> int:
        return len(self.level_caps)

    def map_names(self) -> List[str]:
        return [m.name for m in self.maps]


def default_level_caps(num_points: int, num_levels: int,
                       shrink: float = 3.0, floor: int = 64) -> Tuple[int, ...]:
    """Heuristic per-level voxel capacities: each stride-2 level of a 3D sparse
    shape typically shrinks the voxel count by ~4-8x; we budget conservatively
    with `shrink` (default 3x) and round up to a multiple of 32 (TPU sublanes;
    32 also keeps batch-of->=8 tile grids aligned to the windowed-conv TILE
    so window worklists stay concatenable across batches)."""
    caps = []
    cap = float(num_points)
    for _ in range(num_levels):
        c = max(int(np.ceil(cap)), floor)
        caps.append(int(-(-c // 32) * 32))
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

    # Per-shape level-0 cell coords on the dense stem grid (uint8, sentinel
    # 255 for padded rows) when spec.dense_stem_grid > 0; else None.
    stem_cells: Optional[np.ndarray] = None
    stem_grid: int = 0            # the grid G the cells index into

    def to_jax(self, compact: bool = True):
        """Device pytree. `compact=True` (default) minimizes host->device
        wire bytes (VERDICT r2 #5 — kernel-map tables dominate the ~46 MB
        batch): kmaps ship as LOSSLESS int16 deltas against a per-tile
        linear predictor (decoded on device by the conv layers / concat),
        and `points`/`coords` — which no device computation reads (they
        exist for host-side logging/extraction) — are dropped (None)."""
        import jax.numpy as jnp

        B = self.points.shape[0]
        kmaps = {}
        for k, v in self.kmaps.items():
            if compact and not k.startswith("win!"):
                src_l = _map_levels(k)[0]
                enc = encode_kmap16(v, B * self.masks[src_l].shape[1])
                if enc is not None:
                    kmaps[k] = jnp.asarray(enc)
                    continue
            kmaps[k] = jnp.asarray(v)
        interp_idx = self.interp_idx
        if compact:
            # corner index = own voxel + small delta (int16; invariant
            # under concat — both sides shift by the same batch offset)
            n0 = B * self.masks[0].shape[1]
            sent = self.interp_idx >= n0
            d = (self.interp_idx.astype(np.int64)
                 - self.point_to_voxel.astype(np.int64)[..., None])
            p2v_ok = (self.point_to_voxel < n0)[..., None]
            if bool((sent | (p2v_ok & (d > -32768) & (d < 32767))).all()):
                interp_idx = np.where(sent, 32767, d).astype(np.int16)
        # f16 float wire: coords/feats/weights are [-1, 1]-scale values with
        # ~1e-3 magnitudes at worst — f16 (eps 5e-4) is transparent to the
        # f32/bf16 compute they are cast into on device
        def f16(x):
            return jnp.asarray(np.asarray(x, np.float16)) if compact \
                else jnp.asarray(x)

        return JaxVoxelBatch(
            points=None if compact else jnp.asarray(self.points),
            point_feats=f16(self.point_feats),
            labels=jnp.asarray(self.labels),
            point_mask=jnp.asarray(self.point_mask),
            coords=None if compact else tuple(
                jnp.asarray(c) for c in self.coords),
            masks=tuple(jnp.asarray(m) for m in self.masks),
            vox_feats=f16(self.vox_feats),
            kmaps=kmaps,
            interp_idx=jnp.asarray(interp_idx),
            interp_w=f16(self.interp_w),
            point_to_voxel=jnp.asarray(self.point_to_voxel),
            stem_cells=(None if self.stem_cells is None
                        else jnp.asarray(self.stem_cells)),
            stem_grid=self.stem_grid,
        )


# --- compact kernel-map wire encoding (lossless) ---------------------------
# kmap values are near-linear in the output row (both sides are spatially
# sorted), so (value - tile_base) fits int16: HALF the bytes of the dominant
# transfer. Sentinel n_in maps to the reserved 32767.
WIRE_TILE = 256          # base granularity (== window_conv.TILE; any works)
KMAP_SENT16 = 32767


def encode_kmap16(kmap: np.ndarray, n_in: int):
    """int32 [K, n_out] absolute table -> int16 delta table, or None when
    the geometry's spread exceeds int16 (caller keeps int32; logged).

    Hot on the host path (the k5 stem table alone is 5.6M entries, encoded
    every batch): dispatched to the C++ engine when built (csrc
    csn_encode_kmap16, bit-identical, GIL-released; to_jax(compact)
    994 -> ~54 ms/batch at bench scale on this host) with this numpy form
    as the fallback — itself a rewrite of the original int64 math with
    `delta[~sent]` boolean fancy-indexing (~1.2 s/batch)."""
    K, n_out = kmap.shape
    st = (WIRE_TILE * n_in) // max(n_out, 1)
    if n_in >= (1 << 30):  # delta could overflow int32; unreachable at
        return None        # padded conv scales (n_in = B * level_cap)
    from csn_tpu.core.native import encode_kmap16_native

    enc = encode_kmap16_native(kmap, n_in, WIRE_TILE, KMAP_SENT16)
    if enc is not None:
        if isinstance(enc, np.ndarray):
            return enc
        import logging  # enc == -1: delta range exceeds int16

        logging.warning(
            "kmap delta range exceeds int16; keeping int32 (one retrace)")
        return None
    base = ((np.arange(n_out, dtype=np.int32) // WIRE_TILE)
            * np.int32(st))
    delta = kmap - base[None, :]               # int32, one pass
    valid = kmap < n_in
    if valid.any():
        lo = int(np.min(delta, where=valid, initial=np.iinfo(np.int32).max))
        hi = int(np.max(delta, where=valid, initial=np.iinfo(np.int32).min))
    else:
        lo = hi = 0
    if lo < -32768 or hi >= KMAP_SENT16:
        import logging

        logging.warning(
            "kmap delta range [%d, %d] exceeds int16; keeping int32 "
            "(one retrace)", lo, hi)
        return None
    out = delta.astype(np.int16)               # exact: range checked above
    out[~valid] = KMAP_SENT16
    return out


def decode_kmap(kmap, n_in: int):
    """Traced inverse of encode_kmap16 (identity for int32 tables)."""
    import jax.numpy as jnp

    if kmap.dtype != jnp.int16:
        return kmap
    n_out = kmap.shape[1]
    st = (WIRE_TILE * n_in) // max(n_out, 1)
    base = (jnp.arange(n_out, dtype=jnp.int32) // WIRE_TILE) * st
    k = kmap.astype(jnp.int32)
    return jnp.where(k == KMAP_SENT16, n_in, k + base[None, :])


try:
    from flax import struct as _struct
    import jax.numpy as _jnp

    @_struct.dataclass
    class JaxVoxelBatch:
        """Device-side pytree mirror of VoxelBatch (no host bookkeeping).

        `points`/`coords` are None under the compact wire format (device
        compute never reads them); kmaps may be int16 wire tables — conv
        layers and concat_jax_batches decode via `decode_kmap`."""

        points: Optional[_jnp.ndarray]
        point_feats: _jnp.ndarray
        labels: _jnp.ndarray
        point_mask: _jnp.ndarray
        coords: Optional[Tuple[_jnp.ndarray, ...]]
        masks: Tuple[_jnp.ndarray, ...]
        vox_feats: _jnp.ndarray
        kmaps: Dict[str, _jnp.ndarray]
        interp_idx: _jnp.ndarray
        interp_w: _jnp.ndarray
        point_to_voxel: _jnp.ndarray
        # dense-stem-grid cell coords (uint8 wire, sentinel 255) + static G
        stem_cells: Optional[_jnp.ndarray] = None
        stem_grid: int = _struct.field(pytree_node=False, default=0)

        @property
        def batch_size(self) -> int:
            return self.point_mask.shape[0]

        def level_feat_shape(self, level: int) -> Tuple[int, int]:
            return self.masks[level].shape
except Exception:  # pragma: no cover - import-time fallback for pure-numpy use
    JaxVoxelBatch = None


def _map_levels(name: str) -> Tuple[int, int]:
    """(src_level, dst_level) of a kernel-map name like 'same0k3'."""
    kind = "same" if name.startswith("same") else (
        "down" if name.startswith("down") else "up")
    lvl = int(name[len(kind):].split("k")[0])
    if kind == "same":
        return lvl, lvl
    if kind == "down":
        return lvl, lvl + 1
    return lvl + 1, lvl


def concat_jax_batches(batches: Sequence["JaxVoxelBatch"]) -> "JaxVoxelBatch":
    """Concatenate JaxVoxelBatches (same PyramidSpec) along the batch axis.

    Kernel-map / interp / point->voxel indices address the flattened
    ``[B * L]`` per-level space with sentinel ``B * L``; concatenation offsets
    each batch's index space and remaps sentinels to the combined sentinel.
    Window metadata ('win!' entries) are source-row starts and only need the
    offset. jit-safe (pure jnp ops); the int remaps are trivial next to a conv.

    This enables the single (K+1)*B backbone pass of the CSN models — the
    reference likewise batches the query and all K keys through ONE backbone
    call (`MinkowskiNet/models/hrnet.py:425-454`).
    """
    import jax.numpy as jnp

    if len(batches) == 1:
        return batches[0]
    b0 = batches[0]
    nl = len(b0.masks)
    caps = [m.shape[1] for m in b0.masks]
    bs = [b.masks[0].shape[0] for b in batches]
    cum = np.cumsum([0] + bs)
    total = int(cum[-1])

    def cat(leaf):
        return jnp.concatenate([leaf(b) for b in batches], axis=0)

    def remap_cat(tables, src_l, axis):
        parts = []
        for g, t in enumerate(tables):
            sent_old = bs[g] * caps[src_l]
            off = int(cum[g]) * caps[src_l]
            parts.append(
                jnp.where(t >= sent_old, total * caps[src_l], t + off))
        return jnp.concatenate(parts, axis=axis)

    # win! worklists are per-batch optional (overflow fallback): keep only
    # keys present in EVERY batch (the affected conv falls back to the
    # gather path), and say so — losing a windowed kernel silently costs
    # a retrace + the fastest path
    common = set.intersection(*(set(b.kmaps) for b in batches))
    missing = set.union(*(set(b.kmaps) for b in batches)) - common
    if missing:
        import logging

        logging.warning(
            "concat_jax_batches: dropping %s (absent in some batches — "
            "worklist-overflow fallback); combined pass uses the XLA "
            "gather path for those maps", sorted(missing))

    kmaps = {}
    for name in b0.kmaps:
        if name not in common:
            continue
        if name.startswith("win!interp"):
            # interp worklists are only consumed on ORIGINAL query batches
            # (trainers interpolate with qb, never the combined batch), and
            # their point-tile grids don't concatenate; drop them.
            continue
        if name.startswith("win!"):
            # Window-job metas [5, cap] = tiles|groups|starts|flags|0: tiles
            # shift by each batch's OUTPUT-tile offset, starts by its source
            # -row offset; groups/flags are batch-local. Valid only when
            # every batch's output rows are TILE-aligned (each meta was
            # built over its own padded tile grid); otherwise the combined
            # pass falls back to the gather path for this map.
            from csn_tpu.core.window_conv import TILE

            src_l, dst_l = _map_levels(name[4:])
            if any((b_ * caps[dst_l]) % TILE for b_ in bs):
                # Per-batch output rows not TILE-aligned -> the metas were
                # built over incompatible tile grids and cannot be offset.
                # Falling back to the gather path here silently loses the
                # fastest kernel (and forces a retrace), so say it loudly.
                import logging

                logging.warning(
                    "concat_jax_batches: dropping %s (batch output rows "
                    "%s x cap %d not %d-aligned) — combined pass falls "
                    "back to the XLA gather conv for this map; choose "
                    "level caps so B*cap %% %d == 0",
                    name, bs, caps[dst_l], TILE, TILE)
                continue
            parts = []
            row4_parts = []
            col_off = 0
            for g, b in enumerate(batches):
                m = b.kmaps[name]
                t_off = int(cum[g]) * caps[dst_l] // TILE
                s_off = int(cum[g]) * caps[src_l]
                parts.append(jnp.stack([m[0] + t_off, m[1], m[2] + s_off,
                                        m[3], m[4]]))
                # row 4 = per-tile job COLUMN ranges (tile-grid kernels):
                # batch g's columns shift by its meta-column offset; the
                # final terminator (n_jobs of the LAST batch + its offset)
                # caps the visited/prefetched range
                nt_g = bs[g] * caps[dst_l] // TILE
                r4 = m[4]
                if g + 1 < len(batches):
                    row4_parts.append(r4[:nt_g] + col_off)
                else:
                    row4_parts.append(jnp.concatenate(
                        [r4[:nt_g], r4[nt_g:nt_g + 1]]) + col_off)
                col_off += m.shape[1]
            combined = jnp.concatenate(parts, axis=1)
            row4 = jnp.concatenate(row4_parts)
            row4 = jnp.pad(row4, (0, combined.shape[1] - row4.shape[0]))
            kmaps[name] = combined.at[4].set(row4)
        else:
            # int16 wire tables decode BEFORE the index-space remap (the
            # concat offsets exceed int16)
            src_l = _map_levels(name)[0]
            kmaps[name] = remap_cat(
                [decode_kmap(b.kmaps[name], bs[g] * caps[src_l])
                 for g, b in enumerate(batches)], src_l, axis=1)

    return JaxVoxelBatch(
        points=None if b0.points is None else cat(lambda b: b.points),
        point_feats=cat(lambda b: b.point_feats),
        labels=cat(lambda b: b.labels),
        point_mask=cat(lambda b: b.point_mask),
        coords=None if b0.coords is None else tuple(
            jnp.concatenate([b.coords[l] for b in batches], axis=0)
            for l in range(nl)),
        masks=tuple(jnp.concatenate([b.masks[l] for b in batches], axis=0)
                    for l in range(nl)),
        vox_feats=cat(lambda b: b.vox_feats),
        kmaps=kmaps,
        # int16 interp deltas are offset-invariant (delta vs own voxel);
        # absolute int32 tables need the index-space remap. MIXED dtypes
        # (a per-batch int16-range fallback) must decode first — naive
        # concat would promote deltas to int32 "absolutes"
        interp_idx=(cat(lambda b: b.interp_idx)
                    if all(b.interp_idx.dtype == jnp.int16 for b in batches)
                    else remap_cat([_decode_interp(b, g, caps)
                                    for g, b in enumerate(batches)], 0,
                                   axis=0)),
        interp_w=cat(lambda b: b.interp_w),
        point_to_voxel=remap_cat([b.point_to_voxel for b in batches], 0,
                                 axis=0),
        # per-shape grid coords: batch-offset-free by construction
        stem_cells=(None if any(b.stem_cells is None for b in batches)
                    else cat(lambda b: b.stem_cells)),
        stem_grid=b0.stem_grid,
    )


# ---------------------------------------------------------------------------
# Host-side construction
# ---------------------------------------------------------------------------

def _decode_interp(b, g, caps):
    """Batch-local interp_idx as absolute int32 (identity for int32)."""
    from csn_tpu.core.interp import decode_interp_idx

    n0 = b.masks[0].shape[0] * caps[0]
    return decode_interp_idx(b.interp_idx, b.point_to_voxel, n0)


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


def _shape_tables_numpy(pts: np.ndarray, spec: PyramidSpec) -> dict:
    """Per-shape coordinate tables (pure numpy): voxel coords per level,
    local kernel maps (-1 = missing), interp corners, point->voxel map."""
    nl = spec.num_levels
    ic = np.floor(pts).astype(np.int64)
    mins = ic.min(axis=0) - 1
    dims = ic.max(axis=0) + 2 - mins
    keys = _pack_keys(ic, mins, dims)
    uniq_keys, inv = np.unique(keys, return_inverse=True)
    n = uniq_keys.shape[0]
    order = np.argsort(inv, kind="stable")
    inv_sorted = inv[order]
    boundary = np.ones(inv_sorted.shape[0], dtype=bool)
    boundary[1:] = inv_sorted[1:] != inv_sorted[:-1]
    first_idx = np.empty(n, dtype=np.int64)
    first_idx[inv_sorted[boundary]] = order[boundary]
    vc = ic[first_idx]

    coords = [vc]
    indices = [_LevelIndex(vc)]
    prev = vc
    for l in range(1, nl):
        s2 = 2 ** l
        down = np.floor_divide(prev, s2) * s2
        uniq = np.unique(down, axis=0)
        coords.append(uniq)
        indices.append(_LevelIndex(uniq))
        prev = uniq

    kmaps = {}
    for m in spec.maps:
        if m.kind == "same":
            src_l, dst_l, sign = m.level, m.level, +1
        elif m.kind == "down":
            src_l, dst_l, sign = m.level, m.level + 1, +1
        else:
            src_l, dst_l, sign = m.level + 1, m.level, -1
        offs = m.offsets()
        out_c = coords[dst_l][: spec.level_caps[dst_l]]
        nk = offs.shape[0]
        table = np.full((nk, spec.level_caps[dst_l]), -1, dtype=np.int32)
        if out_c.shape[0]:
            for k in range(nk):
                hit = indices[src_l].lookup(out_c + sign * offs[k][None, :])
                table[k, : out_c.shape[0]] = hit.astype(np.int32)
        kmaps[m.name] = table

    base = np.floor(pts).astype(np.int64)
    frac = pts - base
    p = pts.shape[0]
    interp_idx = np.full((p, 8), -1, dtype=np.int32)
    interp_w = np.zeros((p, 8), dtype=np.float32)
    corner_offs = np.array(list(itertools.product([0, 1], repeat=3)),
                           dtype=np.int64)
    for k in range(8):
        off = corner_offs[k]
        hit = indices[0].lookup(base + off[None, :])
        w = np.prod(np.where(off[None, :] == 1, frac, 1.0 - frac),
                    axis=1).astype(np.float32)
        interp_idx[:, k] = hit.astype(np.int32)
        interp_w[:, k] = np.where(hit >= 0, w, 0.0)

    return {"coords": coords, "kmaps": kmaps, "interp_idx": interp_idx,
            "interp_w": interp_w, "p2v": inv.astype(np.int32)}


def _shape_tables_native(pts: np.ndarray, spec: PyramidSpec) -> dict:
    """Same tables via the C++ engine (csrc/coords.cpp)."""
    from csn_tpu.core import native

    nl = spec.num_levels
    sh = native.NativeShape(pts.astype(np.float32), nl)
    coords = [sh.coords(l, spec.level_caps[l] + 10 ** 9)
              for l in range(nl)]
    kmaps = {}
    for m in spec.maps:
        dst_l = m.level + 1 if m.kind == "down" else m.level
        kmaps[m.name] = sh.kernel_map(m.kind, m.level, m.ksize,
                                      spec.level_caps[dst_l])
    interp_idx, interp_w = sh.interp()
    return {"coords": coords, "kmaps": kmaps, "interp_idx": interp_idx,
            "interp_w": interp_w, "p2v": sh.p2v()}


def build_voxel_batch(
    shapes: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    spec: PyramidSpec,
    rng: Optional[np.random.Generator] = None,
    ignore_label: int = 255,
    use_native: Optional[bool] = None,
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

    coords = [np.zeros((B, spec.level_caps[l], 3), dtype=np.int32)
              for l in range(nl)]
    masks = [np.zeros((B, spec.level_caps[l]), dtype=bool) for l in range(nl)]
    vox_feats = np.zeros((B, spec.level_caps[0], cf), dtype=np.float32)
    num_voxels = [np.zeros(B, dtype=np.int32) for _ in range(nl)]
    dropped = [0 for _ in range(nl)]
    L0 = spec.level_caps[0]
    point_to_voxel = np.full((B, P), B * L0, dtype=np.int32)
    interp_idx = np.full((B, P, 8), B * L0, dtype=np.int32)
    interp_w = np.zeros((B, P, 8), dtype=np.float32)
    kmaps: Dict[str, np.ndarray] = {}
    for m in spec.maps:
        dst_l = m.level + 1 if m.kind == "down" else m.level
        src_l = m.level + 1 if m.kind == "up" else m.level
        if dst_l >= nl or src_l >= nl:
            raise ValueError(
                f"map {m.name} needs level {max(src_l, dst_l)} but spec has "
                f"{nl}")
        Ld, Ls = spec.level_caps[dst_l], spec.level_caps[src_l]
        # np.empty, not np.full: fill_shape writes EVERY [:, b*Ld:(b+1)*Ld]
        # column slice unconditionally (sentinels included via np.where), and
        # the sentinel pre-fill of these ~40 MB of fresh pages was the single
        # largest host-collate cost (np.full 0.47 s/batch profiled at bench
        # scale — first-touch page faults, paid again on the real write).
        kmaps[m.name] = np.empty((m.num_offsets, B * Ld), dtype=np.int32)

    if use_native is None:
        try:
            from csn_tpu.core import native as _native

            use_native = _native.available()
        except Exception:
            use_native = False
    builder = _shape_tables_native if use_native else _shape_tables_numpy
    if use_native:
        from csn_tpu.core.native import globalize_kmap_native \
            as _native_globalize
    else:
        _native_globalize = None

    # Build the per-shape tables in parallel: the C++ engine releases the GIL
    # during its calls, so a thread pool scales across cores and keeps the
    # host pipeline off the training critical path.
    pts_all = []
    for (c, f, lab) in shapes:
        p = min(c.shape[0], P)
        pts_all.append(np.asarray(c[:p], dtype=np.float64) / spec.voxel_size)
    if use_native and B > 1:
        tabs_all = list(_host_pool().map(lambda a: builder(a, spec), pts_all))
    else:
        tabs_all = [builder(a, spec) for a in pts_all]

    # Per-shape post-processing (quantization reduction, kmap
    # globalization over [K, Ld] tables, interp fixups) writes disjoint
    # [b] slices of the preallocated batch arrays, so it runs in the same
    # pool (numpy releases the GIL on the large-array ops). The RANDOM_
    # SUBSAMPLE draws are taken serially, in b order, BEFORE the parallel
    # section — bit-identical batches vs the serial construction.
    rand_all = None
    if spec.qmode == QMode.RANDOM_SUBSAMPLE:
        rand_all = [rng.random(pts_all[b].shape[0]) for b in range(B)]

    def fill_shape(b):
        c, f, lab = shapes[b]
        p = pts_all[b].shape[0]
        pts = pts_all[b]
        f_p = np.asarray(f[:p])
        lab_p = np.asarray(lab[:p]).reshape(-1)
        tabs = tabs_all[b]
        if spec.sort_points:
            # voxel-sorted point order (see PyramidSpec.sort_points): every
            # per-point array permutes together, so nothing downstream
            # changes semantically
            perm = np.argsort(tabs["p2v"], kind="stable")
            pts = pts[perm]
            f_p = f_p[perm]
            lab_p = lab_p[perm]
            tabs = {**tabs, "p2v": tabs["p2v"][perm],
                    "interp_idx": tabs["interp_idx"][perm],
                    "interp_w": tabs["interp_w"][perm]}
        points[b, :p] = pts.astype(np.float32)
        point_feats[b, :p] = f_p
        labels[b, :p] = lab_p
        point_mask[b, :p] = True

        p2v = tabs["p2v"]
        feats_p = np.asarray(f_p, dtype=np.float32)
        n0_full = tabs["coords"][0].shape[0]
        n0 = min(n0_full, L0)
        drop_b = [n0_full - n0] + [0] * (nl - 1)

        # point -> voxel feature reduction (ME quantization modes)
        if spec.qmode == QMode.UNWEIGHTED_AVERAGE:
            sums = np.zeros((n0_full, cf), dtype=np.float64)
            np.add.at(sums, p2v, feats_p)
            counts = np.bincount(p2v, minlength=n0_full).astype(np.float64)
            vf = (sums / np.maximum(counts, 1.0)[:, None]).astype(np.float32)
        else:  # RANDOM_SUBSAMPLE
            r = rand_all[b]
            best = np.full(n0_full, -1.0)
            np.maximum.at(best, p2v, r)
            best_idx = np.zeros(n0_full, dtype=np.int64)
            hit = r >= best[p2v] - 1e-12
            best_idx[p2v[hit]] = np.nonzero(hit)[0]
            vf = feats_p[best_idx]

        for l in range(nl):
            cl = tabs["coords"][l]
            n_full = cl.shape[0]
            n = min(n_full, spec.level_caps[l])
            if l > 0:
                drop_b[l] = n_full - n
            coords[l][b, :n] = cl[:n]
            masks[l][b, :n] = True
            num_voxels[l][b] = n
        vox_feats[b, :n0] = vf[:n0]

        valid_v = p2v < n0
        point_to_voxel[b, :p] = np.where(valid_v, b * L0 + p2v, B * L0)

        for m in spec.maps:
            dst_l = m.level + 1 if m.kind == "down" else m.level
            src_l = m.level + 1 if m.kind == "up" else m.level
            Ld, Ls = spec.level_caps[dst_l], spec.level_caps[src_l]
            n_src = int(num_voxels[src_l][b])
            local = tabs["kmaps"][m.name]  # [K, Ld] local ids, -1 missing
            if (use_native and local.dtype == np.int32
                    and local.flags.c_contiguous
                    and _native_globalize(local, n_src, b * Ls, B * Ls,
                                          kmaps[m.name], b * Ld)):
                continue
            ok = (local >= 0) & (local < n_src)
            kmaps[m.name][:, b * Ld : (b + 1) * Ld] = np.where(
                ok, b * Ls + local, B * Ls).astype(np.int32)

        li = tabs["interp_idx"][:p]
        lw = tabs["interp_w"][:p]
        ok = (li >= 0) & (li < n0)
        interp_idx[b, :p] = np.where(ok, b * L0 + li, B * L0).astype(np.int32)
        interp_w[b, :p] = np.where(ok, lw, 0.0)
        return drop_b

    if B > 1:
        drops = list(_host_pool().map(fill_shape, range(B)))
    else:
        drops = [fill_shape(b) for b in range(B)]
    for d in drops:
        for l in range(nl):
            dropped[l] += d[l]

    # Dense stem grid: per-shape min-corner-shifted level-0 cell coords.
    # Sentinel 255 marks padded rows (255 >= G always: G is capped at 254);
    # any shape whose level-0 extent exceeds G disables the grid for the
    # whole batch (gather/windowed fallback — one retrace; logged).
    stem_cells = None
    G = spec.dense_stem_grid
    if G:
        assert G <= 254, f"dense_stem_grid {G} > 254 (uint8 wire + sentinel)"
        stem_cells = np.full((B, L0, 3), 255, dtype=np.uint8)
        for b in range(B):
            n = int(num_voxels[0][b])
            if n == 0:
                continue
            c = coords[0][b, :n].astype(np.int64)
            sc = c - c.min(axis=0)
            if int(sc.max(initial=0)) >= G:
                import logging

                logging.warning(
                    "dense stem grid disabled for this batch: level-0 "
                    "extent %d >= G=%d (gather/windowed fallback, retrace)",
                    int(sc.max()) + 1, G)
                stem_cells = None
                break
            stem_cells[b, :n] = sc.astype(np.uint8)

    if spec.use_windows:
        # Windowed-conv job worklists for every odd-kernel map — same-level
        # k3/k5 AND strided down/up (key translation preserves sorted order
        # across levels too; core/window_conv.py). The key set is a pure
        # function of spec.maps, so the batch pytree structure is identical
        # across batches (jit-signature stability). Pathological geometry
        # overflowing the static job capacity disables windows for the whole
        # batch (gather fallback — one retrace; logged). The per-map builds
        # are independent and the C++ builder releases the GIL, so they run
        # in a thread pool (serial: ~35 ms/batch at bench scale).
        from csn_tpu.core.window_conv import (
            WindowOverflow, align_for_map, cap_mult_for_map, window_for_map,
            window_jobs,
        )

        def build_one(m):
            src_l = m.level + 1 if m.kind == "up" else m.level
            n_in = B * spec.level_caps[src_l]
            return "win!" + m.name, window_jobs(
                kmaps[m.name], n_in, window=window_for_map(m.name),
                group=m.ksize ** 2, cap_mult=cap_mult_for_map(m.name),
                align=align_for_map(m.name))

        # even (k2) maps: dense small gathers
        odd = [m for m in spec.maps if m.ksize % 2 == 1]
        want_interp = (spec.sort_points
                       and os.environ.get("CSN_INTERP_WIN", "1") != "0")
        ex = _host_pool()
        futs = [ex.submit(build_one, m) for m in odd]
        if want_interp:
            # windowed interp worklists (core/interp_window.py) — valid
            # because sort_points makes the corner tables near-monotone;
            # overflow handled inside (CSN_INTERP_WIN=0 is the kill
            # switch back to XLA gather/scatter)
            from csn_tpu.core.interp_window import build_interp_windows

            fi = ex.submit(build_interp_windows, interp_idx, B * L0)
        try:
            kmaps.update(dict(f.result() for f in futs))
        except WindowOverflow as e:  # pragma: no cover - rare geometry
            import logging

            logging.warning(
                "windowed conv disabled for this batch (gather "
                "fallback, retrace): %s", e)
            for f in futs:  # drain: never leave orphans in the shared pool
                f.exception()
        if want_interp:
            iw = fi.result()
            if iw is not None:
                kmaps["win!interp_f"], kmaps["win!interp_b"] = iw

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
        stem_cells=stem_cells,
        stem_grid=G if stem_cells is not None else 0,
    )
