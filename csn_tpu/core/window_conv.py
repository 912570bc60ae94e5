"""Windowed sparse convolution (Pallas): MXU one-hot gathers over
sequentially-DMA'd source windows, driven by a host-built job worklist.

Why: XLA's row-granular dynamic gather moves ~33-40 GB/s on v5e for 256-byte
rows (scripts/microbench.py) — HBM transactions are much wider than a voxel
row, so the sparse conv is transaction-bound, not bandwidth-bound. The voxel
lists are built in spatially-sorted order (core/pyramid.py packs keys
x-major, z-fastest), so for every kernel offset the source rows of a
contiguous output tile fall inside a narrow index *window* (key translation
preserves sorted order). This kernel exploits that — the TPU translation of
Minuet-style gather coalescing (PAPERS.md):

  job = (output tile t, offset-group g, window start s):
    - DMA the contiguous source window  feats[s : s+W]   (sequential, full
      HBM bandwidth; pipelined one job ahead)
    - for each offset k in group g, gather inside VMEM as a one-hot matmul
      on the MXU:  onehot[i, j] = (kmap[k, tile_i] - s == j)   [T, W] bf16
      g_k = onehot @ window   [T, C]
    - accumulate g_k @ weights[k] into the tile accumulator

Unlike round-1's fixed one-window-per-tile layout (which failed on planar
geometry where an offset's source spread exceeds any fixed W), the worklist
emits as many windows per (tile, group) as the geometry needs: sources are
monotone within a tile, so greedy segmentation covers every row with
disjoint windows (measured 1.02-1.08x the one-window ideal on realistic
PartNet-like batches, see STATUS.md). Every output row's source falls in
exactly one of its (tile, group) windows, so contributions never double
count; rows outside a job's window hit zero one-hot columns.

The backward kernel reuses the same worklist on the transpose map (for
same-level odd kernels kmap_t == kmap with mirrored weights) and fuses BOTH
gradients: per job it computes gg = onehot @ g_window once, accumulates
d_feats += gg @ W_pair^T into the tile accumulator and dW_t[k] += f_tile^T
@ gg into a persistent VMEM scratch written out at the final job — no
scatter, no second pass over g.

Replaces MinkowskiEngine's gather-GEMM-scatter sparse conv (C++/CUDA) for
the hot stride-1 maps; see `core/conv.py` for the XLA gather fallback.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256          # output rows per job
WINDOW = 512        # default source rows DMA'd per job


def _ceil8(c: int) -> int:
    return max(8, -(-c // 8) * 8)


def pack_enabled() -> bool:
    """Lane-packed windows are a MEASURED NEGATIVE RESULT, kept as an
    opt-in experiment (CSN_PACK=1) with full parity tests.

    Measured on v5e (B=16 combined scale, /tmp-series recorded in
    STATUS.md): packed kernels are uniformly SLOWER despite 1.6-2x fewer
    gather MACs — same0k3 64->64 fwd 3.41 -> 4.45 ms, 32->64 fwd
    3.41 -> 4.48 ms, k5 stem 3->32 fwd 10.5 -> 18.2 ms; end-to-end step
    264 -> 314 ms. Cause: the gather matmul's output is 128-lane
    quantized, so at C <= 128 its cost is already near the T*128*128
    floor; the MAC savings are small, while the per-offset post-gather
    lane-group select (iota/compare/bitcast/multiply on [T, 128]) adds
    more VPU time than the MXU time saved. The one-hot windowed conv's
    remaining budget is per-job machinery + VPU, not MXU flops."""
    import os

    return os.environ.get("CSN_PACK", "0") == "1"


def pack_of(width: int) -> int:
    """Lane-packing factor for a channel width: p consecutive source rows
    are packed into the 128-lane dimension (p * ceil8(width) == 128), so the
    one-hot gather matmul contracts over W/p packed rows instead of W.
    Non-power-of-two padded widths don't pack (p=1, legacy layout).
    See `pack_enabled` for why this is off by default."""
    c = _ceil8(width)
    if c > 128 or (c & (c - 1)):
        return 1
    return min(16, 128 // c)


def align_for_map(name: str) -> int:
    """Window-start alignment (source rows) for a map's job worklist. With
    lane packing enabled, starts must be multiples of 16*pack so the PACKED
    bf16 window slice stays sublane-tile-aligned for every packing its
    users choose: k3 maps serve widths >= 32 (p <= 4 -> 64); the k5 stem
    gathers the 3-channel input (p = 16 -> 256). Without packing, plain
    bf16 sublane alignment (16) maximizes window coverage."""
    if not pack_enabled():
        return 16
    ksize = int(name.rsplit("k", 1)[1])
    return 256 if ksize >= 5 else 64


def runtime_pack(width: int, window: int, align: int) -> int:
    """Packing factor actually usable by a kernel call: bounded by the
    channel width, the meta's start alignment, and W % (16p) == 0 (the
    packed window W/p must stay a bf16 sublane multiple)."""
    if not pack_enabled():
        return 1
    p = min(pack_of(width), max(align // 16, 1))
    while p > 1 and window % (16 * p):
        p //= 2
    return max(p, 1)


def window_for_map(name: str) -> int:
    """Per-map window width. Must be a multiple of 128: W is the CONTRACTION
    dim of the one-hot gather matmul, and the MXU pads it to 128-lane tiles
    (a W of 320 computes exactly like 384). The gather cost scales with
    njobs * W; measured jobs/ideal ratios x W on PartNet-like batches:

      map kind | W128        | W256        | W384        | W512
      same     | 2.35x = 301 | 1.56x = 400 | 0.94x = 365 | 0.92x = 470
      down     | 4.5x  = 550 | 2.7x  = 692 | 2.0x  = 770 | 1.7x  = 850
      up       | 1.0x  = 125 | 0.85x = 219 | 0.84x = 322 | 0.81x = 426

    up maps (L_coarse sources for an L_fine tile span ~tile/2 rows) fit tiny
    windows on paper, and W128's work product wins for same maps too — but
    measured per-JOB overhead is ~2.9 us (grid step + DMA machinery), which
    dominates at these scales: the best widths MINIMIZE JOB COUNT, not the
    work product. Measured end-to-end: narrower-than-necessary widths lose
    (294 -> 278 ms regression when down/up went 512/384 -> 256/128)."""
    import os

    if "k5" in name and pack_enabled():
        return 512   # stem under packing: align 256 demands W % 256 == 0
    if name.startswith("up"):
        return int(os.environ.get("CSN_W_UP", "384"))
    if name.startswith("down"):
        return int(os.environ.get("CSN_W_DOWN", "512"))
    return int(os.environ.get("CSN_W_SAME", "384"))


def cap_mult_for_map(name: str) -> float:
    """Job-worklist capacity headroom (jobs per (tile, group) budget). Down
    maps legitimately need ~2.7 windows per (tile, group) at W=256; padded
    slots are near-free (inactive jobs skip DMA + compute). CSN_CAP_MULT
    scales the budget for narrow-window sweeps (job counts grow ~1/W)."""
    import os

    base = 4.0 if name.startswith("down") else 2.0
    return base * float(os.environ.get("CSN_CAP_MULT", "1.0"))
META_ROWS = 5       # tiles | groups | starts | flags | per-tile job offsets
                    # row 4: [lo_0 .. lo_{nt-1}, n_jobs, 0...] — job index
                    # ranges per output tile (jobs are tile-sorted), used by
                    # the tile-grid kernels; cap >= n_tiles + 1 always holds

F_FIRST = 1         # flags bit: first job of its output tile (init acc)
F_LAST = 2          # flags bit: last job of its tile (write out)
F_ACTIVE = 4        # flags bit: real job (padding jobs do nothing)


class WindowOverflow(ValueError):
    """Job worklist exceeded its static capacity (pathological geometry)."""


def window_jobs(kmap: np.ndarray, n_in: int, tile: int = TILE,
                window: int = WINDOW, group: int = 9,
                cap_mult: float = 1.25, align: int = 16) -> np.ndarray:
    """Build the job worklist for one kernel map.

    kmap: [K, n_out] int32 source indices (sentinel >= n_in), n_out % tile
    == 0 (pad with sentinels first). Offsets are grouped in consecutive runs
    of `group` (for a cubic k=3 kernel, group=9 shares one window across all
    (dy, dz) offsets of a dx-slab — their source ranges nearly coincide).

    Returns int32 meta [META_ROWS, J_cap] (tiles, groups, starts, flags, 0),
    jobs sorted by tile. Raises WindowOverflow if the geometry needs more
    than cap_mult * n_tiles * n_groups windows (caller falls back to the
    gather path).
    """
    K, n_out = kmap.shape
    if K % group != 0:
        raise WindowOverflow(f"K={K} not divisible by group={group}")
    if window % align:
        raise WindowOverflow(f"window={window} not a multiple of "
                             f"align={align}")
    n_tiles0 = -(-n_out // tile)
    cap0 = int(np.ceil(cap_mult * n_tiles0 * (K // group) / 64.0) * 64) + 64
    # meta row 4 stores per-tile job ranges terminated at index n_tiles, so
    # cap must exceed n_tiles even when a tiny cap_mult (CSN_CAP_MULT
    # sweeps) would otherwise allow cap == n_tiles == n_jobs
    cap0 = max(cap0, (-(-(n_tiles0 + 1) // 64)) * 64)
    try:  # C++ fast path (bit-identical to the numpy builder below)
        from csn_tpu.core import native

        m = native.window_jobs_native(kmap, n_in, tile, window, group, cap0,
                                      align)
    except Exception:
        m = None
    if m is not None:
        if isinstance(m, int):
            raise WindowOverflow(
                f"window jobs > capacity {cap0} ({n_tiles0} tiles, "
                f"window={window})")
        return m
    pad = (-n_out) % tile
    if pad:  # pad with sentinels (the wrappers pad the device kmap the same)
        kmap = np.concatenate(
            [kmap, np.full((K, pad), n_in, kmap.dtype)], axis=1)
        n_out += pad
    n_tiles = n_out // tile
    ng = K // group
    cap = int(np.ceil(cap_mult * n_tiles * ng / 64.0) * 64) + 64
    cap = max(cap, (-(-(n_tiles + 1) // 64)) * 64)  # row-4 terminator slot

    t = kmap.reshape(ng, group, n_tiles, tile)
    valid = t < n_in
    big = np.where(valid, t, np.iinfo(np.int32).max)
    small = np.where(valid, t, -1)
    # Window starts are aligned DOWN to `align` (16 * max packing): the
    # kernels DMA bf16 windows — possibly lane-packed p rows at a time —
    # whose (16, 128) tiling Mosaic must prove the dynamic slice start
    # (in PACKED rows, start/p) divisible by 16.
    lo = (big.min(axis=(1, 3)) // align) * align   # [ng, n_tiles]
    hi = small.max(axis=(1, 3))
    any_v = valid.any(axis=(1, 3))
    fits = any_v & (hi - lo < window)
    over = any_v & ~fits

    jobs_t, jobs_g, jobs_s = [], [], []
    # vectorized single-window jobs
    gi, ti = np.nonzero(fits)
    jobs_t.append(ti.astype(np.int64))
    jobs_g.append(gi.astype(np.int64))
    jobs_s.append(lo[fits].astype(np.int64))
    # greedy multi-window jobs for the (rare) overflowing (group, tile)s.
    # Starts stay aligned AND windows stay disjoint (window itself is a
    # multiple of align, and each next start is clamped to the previous
    # window's end) so no source row ever matches two windows (no double
    # counting).
    assert window % align == 0 and window % 16 == 0
    for g, ti_ in zip(*np.nonzero(over)):
        srcs = np.unique(t[g, :, ti_][valid[g, :, ti_]])
        start = (int(srcs[0]) // align) * align
        starts = [start]
        for s in srcs:
            if s >= start + window:
                start = max((int(s) // align) * align, start + window)
                starts.append(start)
        jobs_t.append(np.full(len(starts), ti_, np.int64))
        jobs_g.append(np.full(len(starts), g, np.int64))
        jobs_s.append(np.asarray(starts, np.int64))
    jt = np.concatenate(jobs_t) if jobs_t else np.empty(0, np.int64)
    jg = np.concatenate(jobs_g) if jobs_g else np.empty(0, np.int64)
    js = np.concatenate(jobs_s) if jobs_s else np.empty(0, np.int64)

    # every output tile needs >= 1 job (zero-init + write): dummy job with
    # start = 0 (always aligned) gathers nothing — a tile only lacks jobs
    # when it has NO valid kmap entries, so the one-hot has zero hits
    covered = np.zeros(n_tiles, bool)
    covered[np.unique(jt)] = True
    missing = np.nonzero(~covered)[0]
    if missing.size:
        jt = np.concatenate([jt, missing])
        jg = np.concatenate([jg, np.zeros(missing.size, np.int64)])
        js = np.concatenate([js, np.zeros(missing.size, np.int64)])

    n_jobs = jt.shape[0]
    if n_jobs > cap:
        raise WindowOverflow(
            f"{n_jobs} window jobs > capacity {cap} "
            f"({n_tiles} tiles x {ng} groups, window={window})")

    order = np.argsort(jt, kind="stable")
    jt, jg, js = jt[order], jg[order], js[order]
    flags = np.full(n_jobs, F_ACTIVE, np.int64)
    newt = np.ones(n_jobs, bool)
    newt[1:] = jt[1:] != jt[:-1]
    flags[newt] |= F_FIRST
    lastt = np.ones(n_jobs, bool)
    lastt[:-1] = jt[:-1] != jt[1:]
    flags[lastt] |= F_LAST

    meta = np.zeros((META_ROWS, cap), np.int32)
    meta[0, :n_jobs] = jt
    meta[1, :n_jobs] = jg
    meta[2, :n_jobs] = js
    meta[3, :n_jobs] = flags
    meta[4, :n_tiles] = np.searchsorted(jt, np.arange(n_tiles))
    meta[4, n_tiles] = n_jobs
    # padding jobs: inactive, point at the last tile (keeps the out-block
    # index valid and unchanged so nothing is flushed or re-fetched);
    # start 0 (aligned; never DMA'd but kept provably in-bounds)
    if n_jobs < cap:
        meta[0, n_jobs:] = jt[-1] if n_jobs else 0
    return meta


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _onehot_tile(rows, start, n_in, window, pack: int = 1):
    """[TILE, window//pack] bf16 one-hot of (rows - start) >> log2(pack),
    invalid rows zeroed. With pack > 1 the window holds `pack` source rows
    per 128-lane packed row, so the one-hot selects the PACKED row (the
    in-pack position is resolved by a lane-group mask after the matmul).

    Built as float BITS via integer ops + bitcast: an i1->bf16 select trips
    a Mosaic relayout limitation, and any int->float convert downstream of
    an iota gets canonicalized into an (invalid) f32 iota. An all-bf16
    compare (constant bf16 column ramps, no bitcast/relayout) was tried and
    is INEXPRESSIBLE on v5e: Mosaic rejects 16-bit vector compares
    ("Target does not support this comparison"). Validity is folded into
    `rel` as a [T]-vector op (invalid rows -> -1, matching no column), so
    the [T, W]-sized work is one compare-select + bitcast + downcast.
    """
    rel = jnp.where(rows < n_in, rows - start, -1)
    if pack > 1:
        # arithmetic shift: negative rel -> negative col (no iota match);
        # rel >= window -> col >= window//pack (no match)
        rel = rel >> int(pack).bit_length() - 1
    ncols = window // pack
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, ncols), 1)
    one_bits = jnp.int32(0x3F800000)  # bits of 1.0f
    hit = jnp.where(rel[:, None] == cols, one_bits, 0)
    return pltpu.bitcast(hit, jnp.float32).astype(jnp.bfloat16)


def _lane_select(gthr, rows, start, pack: int, c_pack: int):
    """Zero every lane group except the one holding (rows - start) % pack.

    After the packed one-hot gather, row t of `gthr` [TILE, pack*c_pack]
    holds the whole pack of `pack` source rows; only lane group
    (rel & (pack-1)) is t's actual source. Rows with no one-hot hit are
    already all-zero, so their (meaningless) group index is harmless."""
    rel = rows - start
    grp = rel & (pack - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, pack * c_pack), 1)
    lane = lane >> int(c_pack).bit_length() - 1  # // c_pack (pow2)
    one_bits = jnp.int32(0x3F800000)
    sel = jnp.where(lane == grp[:, None], one_bits, 0)
    return gthr * pltpu.bitcast(sel, jnp.float32)


def dyng_mode() -> int:
    """Dynamic-gather experiment mode (tile-grid kernels, pack == 1 only).
    Speculative: requires Mosaic to lower `jnp.take` along the sublane dim
    on this TPU gen (probe: scripts/probe_dyngather.py); exactness-tested
    on TPU before any default flip.

    CSN_DYNG=1: replace each offset's one-hot gather matmul with an
      in-VMEM masked row gather — per-offset work drops from O(T*W) one-hot
      construction + [T,W]@[W,C] MXU gather to O(T*C) gather + mask; the
      per-offset [T,C]@[C,Cout] apply matmuls stay.
    CSN_DYNG=2: im2col — gathered rows accumulate into a per-tile
      [T, K*C] VMEM scratch (offset k owns lane block k*C; jobs of one
      (tile, group) touch disjoint rows, so bf16 += merges exactly) and the
      apply becomes ONE [T, K*C] @ [K*C, Cout] MXU matmul per tile (fwd);
      bwd gets d_feats = GG @ W_T-stack and the whole dW in one
      [Cin, T] @ [T, K*Cout] matmul per tile.
    CSN_DYNG=3: im2col with STATIC group dispatch — the scratch column
      base is g-dependent (a traced value); if Mosaic rejects the
      dynamic-lane-offset accumulate, this variant unrolls `pl.when(g ==
      const)` over the ng groups so every store offset is static
      (ng x group inline gather blocks; one branch executes per job)."""
    import os

    v = os.environ.get("CSN_DYNG", "0")
    return int(v) if v in ("0", "1", "2", "3") else 0


def dyng_im2col_fits(K: int, c_pack: int) -> bool:
    """VMEM guard for the DYNG>=2 im2col kernels: the [TILE, K*c_pack]
    bf16 scratch dominates their footprint (k5 stem: 125*128 lanes =
    8.2 MB vs ~16 MB/core total, next to window buffers, the resident dW
    block and the VMEM weight input). Maps whose scratch exceeds
    CSN_DYNG_VMEM_MB (default 6) demote to CSN_DYNG=1 (per-offset gather,
    no big scratch) instead of risking a Mosaic VMEM failure."""
    import os

    mb = float(os.environ.get("CSN_DYNG_VMEM_MB", "6"))
    return TILE * K * c_pack * 2 <= mb * 1e6


BANK = 128


def banked_mode() -> bool:
    """Bank-factored one-hot (pack == 1 kernels): build ONE [T, 128] lane
    one-hot per offset and apply each 128-row window bank with a [T, 1]
    bank-indicator multiply + [T,128]@[128,C] matmul, instead of the full
    [T, window] compare/select/downcast chain. Identical arithmetic (each
    valid rel hits exactly one (bank, lane) pair; invalid rel matches no
    bank) and MXU MACs unchanged — but MEASURED SLOWER on v5e (same0k3 fwd
    4.3 -> 6.1 ms, k5 stem 10.1 -> 17.6 at the B=16 opbench protocol,
    2026-08-18): the [T, 1] indicator construction/broadcast and the
    window//BANK separate matmul issues cost more VPU time than the
    narrower compare saves, the same verdict as the lane-packed experiment
    (CSN_PACK). Third refutation of a structural one-hot attack (pack,
    narrow windows, banks) — the flat W=384 one-hot chain stands as the
    v5e floor. Opt-in for future hardware gens."""
    import os

    return os.environ.get("CSN_BANKED", "0") == "1"


def _banked_gather(rows, start, n_in, window, win_bf):
    """[T, C] f32 == _dot(_onehot_tile(rows, ...), win_bf) via the bank
    factorization (see banked_mode). rel < 0 (sentinel) and rel >= window
    (row owned by another job of this tile) match no bank: `hi` is an
    arithmetic shift, so invalid rows have hi < 0 or hi >= window//BANK
    while `lo`'s wrapped lane hit is zeroed by the all-zero indicator."""
    rel = jnp.where(rows < n_in, rows - start, -1)
    lo = rel & (BANK - 1)
    hi = rel >> (BANK.bit_length() - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, BANK), 1)
    one_bits = jnp.int32(0x3F800000)  # bits of 1.0f
    oh_lo = pltpu.bitcast(jnp.where(lo[:, None] == cols, one_bits, 0),
                          jnp.float32).astype(jnp.bfloat16)
    acc = None
    for h in range(window // BANK):
        mh = pltpu.bitcast(jnp.where(hi == h, one_bits, 0)[:, None],
                           jnp.float32).astype(jnp.bfloat16)
        part = _dot(oh_lo * mh, win_bf[h * BANK:(h + 1) * BANK],
                    ((1,), (0,)))
        acc = part if acc is None else acc + part
    return acc


def _gather_tile(rows, start, n_in, window, pack, c_pack, win_bf):
    """One offset's window gather [T, pack*c_pack] f32: the banked
    factorization when enabled (pack == 1, window a multiple of BANK),
    else the flat one-hot matmul (+ lane select for packed windows).
    banked_mode() is read at trace time — same env-flip caching semantics
    as CSN_DYNG/CSN_PACK (a warm jit cache keeps the traced mode)."""
    if banked_mode() and pack == 1 and window % BANK == 0 and window > BANK:
        return _banked_gather(rows, start, n_in, window, win_bf)
    onehot = _onehot_tile(rows, start, n_in, window, pack)
    gthr = _dot(onehot, win_bf, ((1,), (0,)))
    if pack > 1:
        gthr = _lane_select(gthr, rows, start, pack, c_pack)
    return gthr


def _gather_rows(win_bf, rows, start, n_in, window):
    """[T, lanes] f32 masked row gather: out[i] = win_bf[rows[i] - start]
    when rows[i] is a real source inside THIS job's window, else 0. The
    in-window mask (not just the sentinel check) is required for
    exactness: a (tile, group) may span several jobs and each row must
    contribute in exactly one of them."""
    rel = rows - start
    valid = (rows < n_in) & (rel >= 0) & (rel < window)
    g = jnp.take(win_bf, jnp.where(valid, rel, 0), axis=0)
    one_bits = jnp.int32(0x3F800000)
    mask = pltpu.bitcast(jnp.where(valid, one_bits, 0)[:, None],
                         jnp.float32)
    return g.astype(jnp.float32) * mask


def _dot(a, b, dims):
    # precision=DEFAULT: a global f32 matmul-precision setting would force
    # fp32 contract precision onto bf16 operands ("Bad lhs type" in Mosaic)
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               precision=jax.lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)


def _wjobs_fwd_kernel(meta_ref, kmap_ref, feats_hbm, w_ref, out_ref,
                      win_scratch, sem, acc_ref, *,
                      group: int, window: int, n_in: int, cap: int,
                      nbuf: int, pack: int, c_pack: int):
    j = pl.program_id(0)

    def dma(slot, jj):
        # window_jobs aligns starts to 16*pack; Mosaic needs the hint to
        # prove the dynamic HBM slice (in PACKED rows) is tile-aligned
        start = pl.multiple_of(meta_ref[2 * cap + jj] // pack, 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, window // pack), :],
            win_scratch.at[slot], sem.at[slot])

    flags = meta_ref[3 * cap + j]
    active = (flags & F_ACTIVE) != 0

    @pl.when((j == 0) & active)
    def _():
        dma(0, 0).start()

    @pl.when(j + 1 < cap)
    def _():
        nxt_active = (meta_ref[3 * cap + j + 1] & F_ACTIVE) != 0

        @pl.when(nxt_active)
        def _():
            dma((j + 1) % nbuf, j + 1).start()

    # accumulate a tile's jobs in the f32 VMEM scratch (persists across the
    # tile's grid steps); the F_LAST job casts+writes the out block, so the
    # output can carry the (possibly bf16) activation dtype
    @pl.when((flags & F_FIRST) != 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(active)
    def _():
        dma(j % nbuf, j).wait()
        start = meta_ref[2 * cap + j]
        g = meta_ref[cap + j]
        win_bf = win_scratch[j % nbuf].astype(jnp.bfloat16)

        def body(i, _):
            k = g * group + i
            rows = kmap_ref[k, :]
            gthr = _gather_tile(rows, start, n_in, window, pack, c_pack,
                                win_bf)                 # [T, pack*c_pack]
            acc_ref[...] += _dot(gthr.astype(jnp.bfloat16), w_ref[k],
                                 ((1,), (0,)))                 # [T, Cout]
            return ()

        jax.lax.fori_loop(0, group, body, (), unroll=True)

    @pl.when((flags & F_LAST) != 0)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _wjobs_bwd_kernel(meta_ref, kmap_ref, f_tile_ref, g_hbm, wt_ref,
                      dfeats_ref, dw_ref, win_scratch, sem, acc_ref, *,
                      group: int, window: int, n_in: int,
                      cap: int, nbuf: int, pack: int, c_pack: int,
                      dw_only: bool = False):
    """d_feats tile + fused dW: gg = onehot @ g_window serves both
    d_feats += gg @ W_pair^T and dW_t[k] += f_tile^T @ gg. Both outputs are
    accumulated directly in their VMEM-resident out blocks (dW's block index
    is constant, so it stays resident for the whole grid). With pack > 1 the
    g window is lane-packed; dW accumulates in packed-lane layout
    [Cin, pack*c_pack] and the wrapper folds the pack groups."""
    j = pl.program_id(0)

    def dma(slot, jj):
        # window_jobs aligns starts to 16*pack; Mosaic needs the hint to
        # prove the dynamic HBM slice (in PACKED rows) is tile-aligned
        start = pl.multiple_of(meta_ref[2 * cap + jj] // pack, 16)
        return pltpu.make_async_copy(
            g_hbm.at[pl.ds(start, window // pack), :],
            win_scratch.at[slot], sem.at[slot])

    flags = meta_ref[3 * cap + j]
    active = (flags & F_ACTIVE) != 0

    @pl.when(j == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

        @pl.when(active)
        def _():
            dma(0, 0).start()

    @pl.when(j + 1 < cap)
    def _():
        nxt_active = (meta_ref[3 * cap + j + 1] & F_ACTIVE) != 0

        @pl.when(nxt_active)
        def _():
            dma((j + 1) % nbuf, j + 1).start()

    @pl.when((flags & F_FIRST) != 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(active)
    def _():
        dma(j % nbuf, j).wait()
        start = meta_ref[2 * cap + j]
        g = meta_ref[cap + j]
        win_bf = win_scratch[j % nbuf].astype(jnp.bfloat16)
        f_bf = f_tile_ref[...].astype(jnp.bfloat16)

        def body(i, _):
            k = g * group + i
            rows = kmap_ref[k, :]
            gg = _gather_tile(rows, start, n_in, window, pack, c_pack,
                              win_bf)                 # [T, pack*c_pack]
            ggb = gg.astype(jnp.bfloat16)
            if not dw_only:
                acc_ref[...] += _dot(ggb, wt_ref[k],
                                     ((1,), (0,)))             # [T, Cin]
            dw_ref[k, :, :] += _dot(f_bf, ggb, ((0,), (0,)))
            return ()

        jax.lax.fori_loop(0, group, body, (), unroll=True)

    @pl.when((flags & F_LAST) != 0)
    def _():
        dfeats_ref[...] = acc_ref[...].astype(dfeats_ref.dtype)


def skip_empty() -> bool:
    """Per-offset empty skip in the tile-grid kernels (CSN_SKIP_EMPTY=1):
    wrap each offset's one-hot gather + matmuls in pl.when(any valid row).
    Host-side measurement (scripts/probe_offset_skip.py, bench geometry
    B=16): ~11% of (job, offset) pairs gather ZERO valid rows (stem 10.9%,
    same0k3 8.7%, up0k3 14.5%), so the ceiling is ~11% of the inner loop;
    the guard itself is one [T] compare-reduce on the already-resident kmap
    row plus a scalar branch per offset. Exactness is unconditional: a
    skipped offset's one-hot is all-zero, so its f32 accumulations are
    exact zeros.

    MEASURED REGRESSION on v5e (opbench B=16, 2026-08-18): same0k3 64->64
    fwd 4.61 -> 7.82 ms, k5 stem fwd ~10 -> 26.6, every map 1.5-2x slower —
    the per-offset vector->scalar `any` reduce + pl.when predication breaks
    the unrolled inner-loop pipeline, costing far more than the ~11% of
    offsets it skips. FIFTH refuted structural attack on the one-hot loop
    (after lane-pack, narrow windows, dynamic gather, bank factorization);
    opt-in for future hardware gens, parity-tested."""
    import os

    return os.environ.get("CSN_SKIP_EMPTY", "0") == "1"


def tile_grid_enabled() -> bool:
    """Tile-grid kernels (one grid step per OUTPUT TILE, inner dynamic loop
    over that tile's jobs): the kmap block and out block are loaded/flushed
    once per tile instead of once per job, padding jobs vanish from the
    grid, and per-grid-step machinery amortizes over ~3 jobs.
    CSN_TILE_GRID=0 falls back to the one-job-per-step kernels."""
    import os

    return os.environ.get("CSN_TILE_GRID", "1") != "0"


def _tile_fwd_kernel(meta_ref, kmap_ref, feats_hbm, w_ref, out_ref,
                     win_scratch, sem, acc_ref, *,
                     group: int, window: int, n_in: int, cap: int,
                     nbuf: int, pack: int, c_pack: int, n_tiles: int,
                     dyng: bool = False):
    t = pl.program_id(0)
    # row 4 column ranges PARTITION the meta columns across tiles (padding
    # columns belong to the last tile of their batch segment after concat),
    # so slot parity j % nbuf is globally consistent. Start/wait guards
    # mirror the one-job-per-step kernel: a DMA is started iff its job is
    # active, and waited before compute, so no started DMA outlives its
    # slot's reuse.
    lo = meta_ref[4 * cap + t]
    hi = meta_ref[4 * cap + t + 1]

    def dma(slot, jj):
        start = pl.multiple_of(meta_ref[2 * cap + jj] // pack, 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, window // pack), :],
            win_scratch.at[slot], sem.at[slot])

    def active(jj):
        return (meta_ref[3 * cap + jj] & F_ACTIVE) != 0

    @pl.when((t == 0) & active(0))
    def _():
        dma(0, 0).start()

    # accumulate the tile in f32 scratch; one cast+store at the end lets
    # the output carry the (possibly bf16) activation dtype
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def job_body(j, _):
        @pl.when(jnp.logical_and(j + 1 < meta_ref[4 * cap + n_tiles],
                                 active(j + 1)))
        def _():
            dma((j + 1) % nbuf, j + 1).start()

        @pl.when(active(j))
        def _():
            dma(j % nbuf, j).wait()
            start = meta_ref[2 * cap + j]
            g = meta_ref[cap + j]
            win_bf = win_scratch[j % nbuf].astype(jnp.bfloat16)

            def body(i, _):
                k = g * group + i
                rows = kmap_ref[k, :]

                def compute():
                    if dyng:
                        gthr = _gather_rows(win_bf, rows, start, n_in,
                                            window)
                    else:
                        gthr = _gather_tile(rows, start, n_in, window,
                                            pack, c_pack, win_bf)
                    acc_ref[...] += _dot(gthr.astype(jnp.bfloat16),
                                         w_ref[k], ((1,), (0,)))

                if skip_empty():
                    rel = rows - start
                    hit = jnp.any((rows < n_in) & (rel >= 0)
                                  & (rel < window))
                    pl.when(hit)(compute)
                else:
                    compute()
                return ()

            jax.lax.fori_loop(0, group, body, (), unroll=True)

        return ()

    jax.lax.fori_loop(lo, hi, job_body, ())
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _tile_bwd_kernel(meta_ref, kmap_ref, f_tile_ref, g_hbm, wt_ref,
                     dfeats_ref, dw_ref, win_scratch, sem, acc_ref, *,
                     group: int, window: int, n_in: int, cap: int,
                     nbuf: int, pack: int, c_pack: int, n_tiles: int,
                     dw_only: bool = False, dyng: bool = False):
    t = pl.program_id(0)
    lo = meta_ref[4 * cap + t]
    hi = meta_ref[4 * cap + t + 1]

    def dma(slot, jj):
        start = pl.multiple_of(meta_ref[2 * cap + jj] // pack, 16)
        return pltpu.make_async_copy(
            g_hbm.at[pl.ds(start, window // pack), :],
            win_scratch.at[slot], sem.at[slot])

    def active(jj):
        return (meta_ref[3 * cap + jj] & F_ACTIVE) != 0

    @pl.when(t == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

        @pl.when(active(0))
        def _():
            dma(0, 0).start()

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def job_body(j, _):
        @pl.when(jnp.logical_and(j + 1 < meta_ref[4 * cap + n_tiles],
                                 active(j + 1)))
        def _():
            dma((j + 1) % nbuf, j + 1).start()

        @pl.when(active(j))
        def _():
            dma(j % nbuf, j).wait()
            start = meta_ref[2 * cap + j]
            g = meta_ref[cap + j]
            win_bf = win_scratch[j % nbuf].astype(jnp.bfloat16)
            f_bf = f_tile_ref[...].astype(jnp.bfloat16)

            def body(i, _):
                k = g * group + i
                rows = kmap_ref[k, :]

                def compute():
                    if dyng:
                        gg = _gather_rows(win_bf, rows, start, n_in,
                                          window)
                    else:
                        gg = _gather_tile(rows, start, n_in, window, pack,
                                          c_pack, win_bf)
                    ggb = gg.astype(jnp.bfloat16)
                    if not dw_only:
                        acc_ref[...] += _dot(ggb, wt_ref[k], ((1,), (0,)))
                    dw_ref[k, :, :] += _dot(f_bf, ggb, ((0,), (0,)))

                if skip_empty():
                    rel = rows - start
                    hit = jnp.any((rows < n_in) & (rel >= 0)
                                  & (rel < window))
                    pl.when(hit)(compute)
                else:
                    compute()
                return ()

            jax.lax.fori_loop(0, group, body, (), unroll=True)

        return ()

    jax.lax.fori_loop(lo, hi, job_body, ())
    dfeats_ref[...] = acc_ref[...].astype(dfeats_ref.dtype)


def _im2col_gathers(ic_ref, kmap_ref, win_bf, start, g, *, group: int,
                    window: int, n_in: int, c_pack: int, n_groups: int,
                    static_g: bool):
    """Accumulate one job's `group` masked row gathers into the im2col
    scratch. static_g unrolls pl.when(g == const) over the ng groups so
    every scratch column offset is static (mode 3); otherwise the column
    base is the traced g * group * c_pack (mode 2, 128-aligned)."""

    def do_group(gv, base):
        def body(i, _):
            rows = kmap_ref[gv * group + i, :]
            gthr = _gather_rows(win_bf, rows, start, n_in, window)
            ic_ref[:, pl.ds(base + i * c_pack,
                            c_pack)] += gthr.astype(jnp.bfloat16)
            return ()

        jax.lax.fori_loop(0, group, body, (), unroll=True)

    if static_g:
        for gs in range(n_groups):
            @pl.when(g == gs)
            def _(gs=gs):
                do_group(gs, gs * group * c_pack)
    else:
        do_group(g, g * (group * c_pack))


def _tile_fwd_im2col_kernel(meta_ref, kmap_ref, feats_hbm, w_ref, out_ref,
                            win_scratch, sem, ic_ref, *,
                            group: int, window: int, n_in: int, cap: int,
                            nbuf: int, c_pack: int, n_tiles: int,
                            n_groups: int = 1, static_g: bool = False):
    """CSN_DYNG=2/3 forward: masked dynamic gathers fill the [T, K*c_pack]
    im2col scratch (offset k owns lane block k*c_pack — a 128-multiple, so
    the dynamic-lane-offset accumulate stays tile-aligned); one MXU matmul
    against the [K*c_pack, Cout] stacked weights per tile."""
    t = pl.program_id(0)
    lo = meta_ref[4 * cap + t]
    hi = meta_ref[4 * cap + t + 1]

    def dma(slot, jj):
        start = pl.multiple_of(meta_ref[2 * cap + jj], 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, window), :],
            win_scratch.at[slot], sem.at[slot])

    def active(jj):
        return (meta_ref[3 * cap + jj] & F_ACTIVE) != 0

    @pl.when((t == 0) & active(0))
    def _():
        dma(0, 0).start()

    ic_ref[...] = jnp.zeros_like(ic_ref)

    def job_body(j, _):
        @pl.when(jnp.logical_and(j + 1 < meta_ref[4 * cap + n_tiles],
                                 active(j + 1)))
        def _():
            dma((j + 1) % nbuf, j + 1).start()

        @pl.when(active(j))
        def _():
            dma(j % nbuf, j).wait()
            _im2col_gathers(ic_ref, kmap_ref, win_scratch[j % nbuf],
                            meta_ref[2 * cap + j], meta_ref[cap + j],
                            group=group, window=window, n_in=n_in,
                            c_pack=c_pack, n_groups=n_groups,
                            static_g=static_g)

        return ()

    jax.lax.fori_loop(lo, hi, job_body, ())
    out_ref[...] = _dot(ic_ref[...], w_ref[...],
                        ((1,), (0,))).astype(out_ref.dtype)


def _tile_bwd_im2col_kernel(meta_ref, kmap_ref, f_tile_ref, g_hbm, wt_ref,
                            dfeats_ref, dw_ref, win_scratch, sem, gg_ref, *,
                            group: int, window: int, n_in: int, cap: int,
                            nbuf: int, c_pack: int, n_tiles: int,
                            dw_only: bool = False, n_groups: int = 1,
                            static_g: bool = False):
    """CSN_DYNG=2 backward: the gathered-cotangent im2col GG [T, K*c_pack]
    serves d_feats = GG @ stacked-W^T (one matmul) and the WHOLE dW via
    f_tile^T @ GG -> [Cin, K*c_pack] (one matmul per tile; the wrapper
    unstacks to [K, Cin, Cout])."""
    t = pl.program_id(0)
    lo = meta_ref[4 * cap + t]
    hi = meta_ref[4 * cap + t + 1]

    def dma(slot, jj):
        start = pl.multiple_of(meta_ref[2 * cap + jj], 16)
        return pltpu.make_async_copy(
            g_hbm.at[pl.ds(start, window), :],
            win_scratch.at[slot], sem.at[slot])

    def active(jj):
        return (meta_ref[3 * cap + jj] & F_ACTIVE) != 0

    @pl.when(t == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

        @pl.when(active(0))
        def _():
            dma(0, 0).start()

    gg_ref[...] = jnp.zeros_like(gg_ref)

    def job_body(j, _):
        @pl.when(jnp.logical_and(j + 1 < meta_ref[4 * cap + n_tiles],
                                 active(j + 1)))
        def _():
            dma((j + 1) % nbuf, j + 1).start()

        @pl.when(active(j))
        def _():
            dma(j % nbuf, j).wait()
            _im2col_gathers(gg_ref, kmap_ref, win_scratch[j % nbuf],
                            meta_ref[2 * cap + j], meta_ref[cap + j],
                            group=group, window=window, n_in=n_in,
                            c_pack=c_pack, n_groups=n_groups,
                            static_g=static_g)

        return ()

    jax.lax.fori_loop(lo, hi, job_body, ())
    ggb = gg_ref[...]
    if dw_only:
        dfeats_ref[...] = jnp.zeros_like(dfeats_ref)
    else:
        dfeats_ref[...] = _dot(ggb, wt_ref[...],
                               ((1,), (0,))).astype(dfeats_ref.dtype)
    dw_ref[...] += _dot(f_tile_ref[...].astype(jnp.bfloat16), ggb,
                        ((0,), (0,)))


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------


def _pad_feats(feats, window, pack: int = 1):
    """Pad channels and rows, cast to bf16 ONCE (the in-kernel matmuls
    consume bf16 operands anyway, so DMA'ing bf16 windows halves the bytes
    with identical numerics), and — when pack > 1 — fold `pack` consecutive
    rows into the 128-lane dim: row-major reshape [R, c] -> [R/pack,
    pack*c] puts orig row (i*pack + k) at packed row i, lane group k.
    Rows are padded by `window` (+ pack remainder) so any aligned window
    start <= n_in stays in bounds; padding rows are zeros, so sentinel /
    out-of-range hits contribute nothing.

    Returns (padded-or-packed array, c_pack): for pack == 1, c_pack is the
    128-multiple contraction width (legacy layout); for pack > 1 it is the
    8-multiple per-row width inside each lane group."""
    n_in, cin = feats.shape
    if pack > 1:
        # per-row width 128//pack: the packed array is EXACTLY 128 lanes
        # wide (Mosaic can only slice HBM at 128-lane granularity)
        cp = 128 // pack
        assert cp >= cin, (cin, pack)
        rows = n_in + window
        rpad = (-rows) % pack
        f = jnp.pad(feats, ((0, window + rpad),
                            (0, cp - cin))).astype(jnp.bfloat16)
        return f.reshape((rows + rpad) // pack, pack * cp), cp
    cpad = (-cin) % 128
    return (jnp.pad(feats, ((0, window), (0, cpad))).astype(jnp.bfloat16),
            cin + cpad)


def _pad_kmap(kmap, n_in, tile=TILE):
    pad = (-kmap.shape[1]) % tile
    if pad:
        kmap = jnp.pad(kmap, ((0, 0), (0, pad)), constant_values=n_in)
    return kmap, pad


def _default_nbuf() -> int:
    """Window double-buffer depth (CSN_NBUF overrides; perf knob): 2 =
    classic double buffering; 3 keeps two DMAs in flight to absorb HBM
    latency spikes at the cost of one extra window of VMEM."""
    import os

    return int(os.environ.get("CSN_NBUF", "2"))


def window_conv_fwd(feats, kmap, meta, weights, *, group: int,
                    window: int = WINDOW, nbuf: int = None, align: int = 16):
    """feats [N_in, Cin], kmap [K, N_out], meta [META_ROWS, J], weights
    [K, Cin, Cout] -> [N_out, Cout]. `align` must match the worklist's
    start alignment (window_jobs align=): it bounds the lane packing."""
    n_in, cin = feats.shape
    K, n_out = kmap.shape
    cout = weights.shape[-1]
    if nbuf is None:
        nbuf = _default_nbuf()
    pack = runtime_pack(cin, window, align)
    feats_p, c_pack = _pad_feats(feats, window, pack)
    kmap_p, opad = _pad_kmap(kmap, n_in)
    if pack > 1:
        # replicate the (channel-padded) weights once per lane group: the
        # post-gather lane mask zeroes every group but the source's, so
        # masked @ tiled-W == gathered-row @ W
        w_p = jnp.tile(jnp.pad(weights, ((0, 0), (0, c_pack - cin), (0, 0))),
                       (1, pack, 1)).astype(jnp.bfloat16)
    else:
        w_p = jnp.pad(weights, ((0, 0), (0, c_pack - cin),
                                (0, 0))).astype(jnp.bfloat16)
    cap = meta.shape[-1]

    n_tiles = (n_out + opad) // TILE
    dyng = dyng_mode() if (tile_grid_enabled() and pack == 1) else 0
    if dyng >= 2 and not dyng_im2col_fits(K, c_pack):
        dyng = 1
    if dyng >= 2:
        kern = functools.partial(_tile_fwd_im2col_kernel, group=group,
                                 window=window, n_in=n_in, cap=cap,
                                 nbuf=nbuf, c_pack=c_pack, n_tiles=n_tiles,
                                 n_groups=K // group, static_g=dyng == 3)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((K, TILE), lambda t, m: (0, t)),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, cout), lambda t, m: (t, 0)),
            scratch_shapes=[
                pltpu.VMEM((nbuf, window, c_pack), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.VMEM((TILE, K * c_pack), jnp.bfloat16),
            ],
        )
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_out + opad, cout),
                                           feats.dtype),
        )(meta.reshape(-1), kmap_p, feats_p, w_p.reshape(K * c_pack, cout))
        return out[:n_out]
    if tile_grid_enabled():
        kern = functools.partial(_tile_fwd_kernel, group=group,
                                 window=window, n_in=n_in, cap=cap,
                                 nbuf=nbuf, pack=pack, c_pack=c_pack,
                                 n_tiles=n_tiles, dyng=dyng == 1)
        grid = (n_tiles,)
        kmap_spec = pl.BlockSpec((K, TILE), lambda t, m: (0, t))
        out_spec = pl.BlockSpec((TILE, cout), lambda t, m: (t, 0))
    else:
        kern = functools.partial(_wjobs_fwd_kernel, group=group,
                                 window=window, n_in=n_in, cap=cap,
                                 nbuf=nbuf, pack=pack, c_pack=c_pack)
        grid = (cap,)
        kmap_spec = pl.BlockSpec((K, TILE), lambda j, m: (0, m[j]))
        out_spec = pl.BlockSpec((TILE, cout), lambda j, m: (m[j], 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            kmap_spec,
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((nbuf, window // pack, pack * c_pack), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.VMEM((TILE, cout), jnp.float32),
        ],
    )
    # accumulation stays f32 (in the VMEM acc scratch — 27+ offset
    # contributions per row); the single tile store casts to the activation
    # dtype, halving the output HBM write + downstream reads under bf16
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out + opad, cout), feats.dtype),
    )(meta.reshape(-1), kmap_p, feats_p, w_p)
    return out[:n_out]


def window_conv_bwd(feats, g, kmap_t, meta, weights_pair, *, group: int,
                    window: int = WINDOW, nbuf: int = None,
                    dw_only: bool = False, align: int = 16):
    """Fused backward for a same-level windowed conv.

    feats [N, Cin] (forward input), g [N, Cout] (upstream grad), kmap_t
    [K, N] transpose map (== kmap for same-level odd kernels), weights_pair
    [K, Cin, Cout] ALREADY mirrored for same-level maps. Returns
    (d_feats [N, Cin], d_w_t [K, Cin, Cout]) with d_w_t in transpose-offset
    order (caller un-mirrors). `dw_only=True` skips the d_feats matmuls
    (returned d_feats is zeros) — for stem convs whose input is raw data
    with no gradient consumer. `align` must match the worklist's start
    alignment; it bounds the lane packing of the g windows.
    """
    n_out_f, cin_raw = feats.shape
    K, n_out = kmap_t.shape
    assert n_out_f == n_out  # d_feats rows == transpose-map outputs
    n_src = g.shape[0]       # gather SOURCE rows (differs from n_out for
    cout = g.shape[-1]       # strided down/up pairs)
    if nbuf is None:
        nbuf = _default_nbuf()
    pack = runtime_pack(cout, window, align)
    g_p, cout_p = _pad_feats(g, window, pack)
    glanes = pack * cout_p if pack > 1 else cout_p
    kmap_p, opad = _pad_kmap(kmap_t, n_src)
    # pad tiny channel counts (the 3-channel stem input) to a sublane
    # multiple so f_tile blocks / dW tiles stay layout-friendly
    cin = max(-(-cin_raw // 8) * 8, 8)
    f_p = jnp.pad(feats, ((0, opad), (0, cin - cin_raw)))
    # wt[k] = W_pair[k]^T padded on the Cout (contract) AND Cin sides;
    # with packing, tiled once per lane group (see window_conv_fwd)
    wt = jnp.pad(jnp.swapaxes(weights_pair, 1, 2),
                 ((0, 0), (0, cout_p - cout), (0, cin - cin_raw)))
    if pack > 1:
        wt = jnp.tile(wt, (1, pack, 1))
    wt = wt.astype(jnp.bfloat16)
    cap = meta.shape[-1]

    n_tiles = (n_out + opad) // TILE
    dyng = dyng_mode() if (tile_grid_enabled() and pack == 1) else 0
    if dyng >= 2 and not dyng_im2col_fits(K, cout_p):
        dyng = 1
    if dyng >= 2:
        kern = functools.partial(_tile_bwd_im2col_kernel, group=group,
                                 window=window, n_in=n_src, cap=cap,
                                 nbuf=nbuf, c_pack=cout_p, n_tiles=n_tiles,
                                 dw_only=dw_only, n_groups=K // group,
                                 static_g=dyng == 3)
        row_spec2 = pl.BlockSpec((TILE, cin), lambda t, m: (t, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((K, TILE), lambda t, m: (0, t)),
                row_spec2,
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                row_spec2,
                pl.BlockSpec((cin, K * cout_p), lambda t, m: (0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((nbuf, window, cout_p), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.VMEM((TILE, K * cout_p), jnp.bfloat16),
            ],
        )
        d_feats, d_w_flat = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n_out + opad, cin), feats.dtype),
                jax.ShapeDtypeStruct((cin, K * cout_p), jnp.float32),
            ),
        )(meta.reshape(-1), kmap_p, f_p, g_p,
          wt.reshape(K * cout_p, cin))
        d_w_t = jnp.transpose(d_w_flat.reshape(cin, K, cout_p), (1, 0, 2))
        return d_feats[:n_out, :cin_raw], d_w_t[:, :cin_raw, :cout]
    if tile_grid_enabled():
        kern = functools.partial(_tile_bwd_kernel, group=group,
                                 window=window, n_in=n_src, cap=cap,
                                 nbuf=nbuf, pack=pack, c_pack=cout_p,
                                 n_tiles=n_tiles, dw_only=dw_only,
                                 dyng=dyng == 1)
        grid = (n_tiles,)
        kmap_spec = pl.BlockSpec((K, TILE), lambda t, m: (0, t))
        row_spec = pl.BlockSpec((TILE, cin), lambda t, m: (t, 0))
        dw_spec = pl.BlockSpec((K, cin, glanes), lambda t, m: (0, 0, 0))
    else:
        kern = functools.partial(_wjobs_bwd_kernel, group=group,
                                 window=window, n_in=n_src, cap=cap,
                                 nbuf=nbuf, pack=pack, c_pack=cout_p,
                                 dw_only=dw_only)
        grid = (cap,)
        kmap_spec = pl.BlockSpec((K, TILE), lambda j, m: (0, m[j]))
        row_spec = pl.BlockSpec((TILE, cin), lambda j, m: (m[j], 0))
        dw_spec = pl.BlockSpec((K, cin, glanes), lambda j, m: (0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            kmap_spec,
            row_spec,
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            row_spec,
            dw_spec,
        ),
        scratch_shapes=[
            pltpu.VMEM((nbuf, window // pack, glanes), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.VMEM((TILE, cin), jnp.float32),
        ],
    )
    # d_feats accumulates f32 in the acc scratch and stores once per tile
    # in the activation dtype (the cotangent the upstream layer consumes);
    # dW keeps its f32 resident block (accumulated across the whole grid)
    d_feats, d_w_t = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_out + opad, cin), feats.dtype),
            jax.ShapeDtypeStruct((K, cin, glanes), jnp.float32),
        ),
    )(meta.reshape(-1), kmap_p, f_p, g_p, wt)
    if pack > 1:
        # dW accumulated in packed-lane layout: fold the pack groups
        d_w_t = d_w_t.reshape(K, cin, pack, cout_p).sum(axis=2)
    return d_feats[:n_out, :cin_raw], d_w_t[:, :cin_raw, :cout]
