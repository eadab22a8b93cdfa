"""Column-window slot layout — v6 successor to the sparse candidate groups.

The sparse layout (topology/sparse.py) gathers per-tile candidate GROUPS into
packed slabs; the XLA gather + lane-major transpose around every kernel move
each dynamic byte ~4x (measured: ~2.6 ms/step of XLA glue at 100k).  This
layout removes the gather entirely: slot space is column-contiguous and
z-sorted, so a tile's candidates are NINE contiguous slot windows (one per
column of the 3x3 rest-space xy neighborhood, z-clipped to the tile's
reach-dilated z-range).  Kernels DMA those windows straight from lane-major
(k, n_slots) HBM sources — no gather, no transpose, no per-tile gidx tables;
just a (n_tiles, 9) int32 offset table and one static window length per
bucket.

Inertness argument (why window padding is safe): the cubic-spline kernel has
support 2h = the build reach, so ANY real particle beyond reach contributes
exactly zero force (branchless coefficients vanish at q >= 2).  A window may
therefore over-cover its own column freely.  The ONE illegal overlap is
spilling into a DIFFERENT column that is also in the tile's 3x3 set (those
slots are in-reach and would be double-counted through that column's own
window) — prevented by padding every column to at least the largest bucket
window length and clamping windows inside their column.

Replaces the same reference contract as sparse.py: wp.HashGrid built once
over rest positions (reference sim.py:123-127), restructured for TPU DMA.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .sparse import _bucket_boundaries

ALIGN = 8  # window start alignment in slots (Mosaic sublane-dim alignment)


@dataclasses.dataclass
class WindowBucket:
    """Tiles sharing one static per-column window-length vector (host-side)."""

    tile_ids: np.ndarray   # (t_b,) int32 tile index (row-block index in slot space)
    offsets: np.ndarray    # (t_b, 9) int32 window start SLOT per 3x3 column
    windows: tuple         # 9 static window lengths (ALIGN multiples)

    @property
    def window(self) -> int:   # compat: max single length
        return max(self.windows)

    @property
    def slab_len(self) -> int:
        return int(sum(self.windows))


@dataclasses.dataclass
class WindowLayout:
    """Host-side description of the column-window slot space."""

    cell: float
    rows: int
    n_slots: int                  # body + inert tail (>= max window)
    n_tiles: int                  # body_slots // rows (includes padding tiles)
    tail_start: int               # first slot of the inert tail region
    slot_of_particle: np.ndarray  # (N,)
    particle_of_slot: np.ndarray  # (n_slots,) -> particle or -1
    buckets: list[WindowBucket]
    stats: dict
    n_shards: int = 1


def build_window_layout(
    rest: np.ndarray,
    support_radius: float,
    rows: int = 32,
    max_buckets: int = 8,
    cell_scale: float = 1.0,
    n_shards: int = 1,
) -> WindowLayout:
    """Build the column-window layout from rest positions (all vectorized
    numpy; no Python loops over particles or tiles except the column sweep).

    cell_scale < 1 shrinks columns and widens the xy window to radius
    ceil(1/cell_scale): e.g. 0.5 -> 5x5 half-reach columns, whose xy
    coverage (2.5 reach)^2 is 31% tighter than 3x3 full-reach columns at
    the cost of (2r+1)^2 DMAs per source per tile."""
    rest = np.asarray(rest, dtype=np.float64)
    n = rest.shape[0]
    reach = float(support_radius)
    cell = reach * cell_scale
    wr = int(np.ceil(reach / cell - 1e-12))   # xy window radius in columns
    nwin = (2 * wr + 1) ** 2
    lo = rest.min(axis=0) - 1e-9

    # ---- columns: (x, y) cells, z-sorted dense
    q = np.floor((rest[:, :2] - lo[None, :2]) / cell).astype(np.int64)
    col_key = (q[:, 0] << 21) | q[:, 1]
    cols, col_inv = np.unique(col_key, return_inverse=True)
    n_cols = len(cols)
    order = np.lexsort((rest[:, 2], col_inv))
    col_sorted = col_inv[order]
    col_counts = np.bincount(col_inv, minlength=n_cols)
    col_first = np.concatenate([[0], np.cumsum(col_counts)])
    z_sorted = rest[order, 2]  # z of real slots, column-major dense

    # ---- phase A: real tiles (chunks of `rows` real slots per column) and
    # their reach-dilated z-ranges
    n_tiles_real = ((col_counts + rows - 1) // rows).astype(np.int64)
    tile_col = np.repeat(np.arange(n_cols), n_tiles_real)       # (T,)
    tile_rank = (np.arange(len(tile_col))
                 - np.repeat(np.concatenate([[0], np.cumsum(n_tiles_real)])[:-1],
                             n_tiles_real))                      # k within column
    t_first = col_first[tile_col] + tile_rank * rows             # first REAL idx
    t_last = np.minimum(t_first + rows, col_first[tile_col] + col_counts[tile_col]) - 1
    t_z0 = z_sorted[t_first]
    t_z1 = z_sorted[t_last]
    T = len(tile_col)
    # tile xy bounding boxes (for per-column z-dilation): segment min/max over
    # the tile's real slots
    xy_sorted = rest[order, :2]
    t_xylo = np.stack([np.minimum.reduceat(xy_sorted[:, a], t_first)
                       for a in range(2)], axis=1)
    t_xyhi = np.stack([np.maximum.reduceat(xy_sorted[:, a], t_first)
                       for a in range(2)], axis=1)
    # (reduceat segments end at the next t_first; real slots are dense and
    # column-contiguous, so segments are exactly each tile's real slots)

    # ---- neighbor columns ((2wr+1)^2 window), -1 when absent
    cx = (cols >> 21).astype(np.int64)
    cy = (cols & ((1 << 21) - 1)).astype(np.int64)
    nbr = np.full((n_cols, nwin), -1, dtype=np.int64)
    for k, (dx, dy) in enumerate(
            [(dx, dy) for dx in range(-wr, wr + 1)
             for dy in range(-wr, wr + 1)]):
        keys = ((cx + dx) << 21) | (cy + dy)
        pos = np.clip(np.searchsorted(cols, keys), 0, n_cols - 1)
        hit = cols[pos] == keys
        nbr[hit, k] = pos[hit]
    tile_nbr = nbr[tile_col]                                     # (T, nwin)

    # ---- phase A windows in REAL per-column indices: [wlo, whi).
    # Vectorized per-column searchsorted via the two-level key trick: keys =
    # column_id * span + (z - zmin) are globally sorted (columns ascending,
    # z ascending within); query keys clip z into [0, span) so out-of-range
    # queries land on the column boundary.
    zmin = z_sorted.min() if n else 0.0
    span = (z_sorted.max() - zmin) + 1.0 if n else 1.0
    keys = col_sorted * span + (z_sorted - zmin)

    def search_cols(cs, vals, side):
        qz = np.clip(vals - zmin, 0.0, np.nextafter(span, 0.0))
        return np.searchsorted(keys, cs * span + qz, side=side)

    wlo = np.zeros((T, nwin), np.int64)
    whi = np.zeros((T, nwin), np.int64)
    for k in range(nwin):
        c = tile_nbr[:, k]
        ok = c >= 0
        cs = np.where(ok, c, 0)
        base = col_first[cs]
        # per-(tile, column) z-dilation: a column at xy-gap g from the tile's
        # xy bbox only reaches sqrt(reach^2 - g^2) in z (full +-reach for the
        # own/edge-adjacent columns, much less for corner columns) — measured
        # ~12% fewer candidate pairs at 100k vs the uniform +-reach window
        rect_lo = lo[None, :2] + np.stack([cx[cs], cy[cs]], axis=1) * cell
        rect_hi = rect_lo + cell
        gap = np.maximum(np.maximum(rect_lo - t_xyhi, t_xylo - rect_hi), 0.0)
        g2 = (gap * gap).sum(axis=1)
        dz = np.sqrt(np.maximum(reach * reach - g2, 0.0))
        lo_g = search_cols(cs, t_z0 - dz, "left")
        hi_g = search_cols(cs, t_z1 + dz, "right")
        keep = ok & (g2 < reach * reach)
        wlo[:, k] = np.where(keep, lo_g - base, 0)
        whi[:, k] = np.where(keep, hi_g - base, 0)
        tile_nbr[:, k] = np.where(keep, tile_nbr[:, k], -1)

    # align starts down; lengths in real-slot units (per column k)
    wlo_al = (wlo // ALIGN) * ALIGN
    wlen = whi - wlo_al
    wlen = ((wlen + ALIGN - 1) // ALIGN) * ALIGN
    wlen = np.maximum(wlen, ALIGN)  # caps stay >= ALIGN (zero-length DMAs
                                    # are not expressible; tail windows are
                                    # inert)

    # ---- canonicalize window ORDER by descending length: the kernel treats
    # the 9 windows as anonymous slab chunks, so each tile's windows can be
    # permuted freely; after sorting, the per-bucket cap vector is a max of
    # ORDER STATISTICS, which is far tighter than per-position maxima
    # (measured at 100k: unsorted per-k caps 1214 pairs/particle, single
    # per-tile max cap 865, sorted per-k caps below).
    sort_idx = np.argsort(-wlen, axis=1, kind="stable")
    wlen = np.take_along_axis(wlen, sort_idx, axis=1)
    wlo_al = np.take_along_axis(wlo_al, sort_idx, axis=1)
    tile_nbr = np.take_along_axis(tile_nbr, sort_idx, axis=1)

    # ---- COLUMN-level bucketing: a column's profile is the per-rank max
    # over its tiles; tiles inherit the column bucket.  Costs ~10% more pairs
    # than tile-level bucketing (962 vs 871 at 100k) but lets us permute WHOLE
    # COLUMNS bucket-major: slot space stays column-contiguous (windows need
    # that) AND every bucket's tiles form one contiguous row range (no
    # per-step scatters of ay/forces).
    prof = np.zeros((n_cols, nwin), np.int64)
    np.maximum.at(prof, tile_col, wlen)
    s_col = prof.sum(axis=1)
    sizes, inv_s = np.unique(s_col, return_inverse=True)
    wcounts = np.bincount(inv_s, weights=n_tiles_real.astype(np.float64),
                          minlength=len(sizes)).astype(np.int64)
    caps = _bucket_boundaries(sizes, np.maximum(wcounts, 1), max_buckets)
    caps_arr = np.asarray(caps)
    cbucket = np.searchsorted(caps_arr, s_col)              # (n_cols,)
    cap_vecs = []
    for bi in range(len(caps)):
        sel = cbucket == bi
        cap_vecs.append(prof[sel].max(axis=0) if sel.any()
                        else np.full(nwin, ALIGN, np.int64))
    w_max = int(max(int(v.max()) for v in cap_vecs))

    # per-column padded length: must fit the clamped window of every (tile, k)
    # referencing it
    col_need = np.zeros(n_cols, np.int64)
    for k in range(nwin):
        c = tile_nbr[:, k]
        ok = c >= 0
        capk = np.asarray([cap_vecs[b][k] for b in cbucket[tile_col]])
        np.maximum.at(col_need, c[ok], capk[ok])
    pad_len_old = np.maximum(((col_counts + rows - 1) // rows) * rows, rows)
    pad_len_old = np.maximum(pad_len_old,
                             ((col_need + rows - 1) // rows) * rows)
    tiles_per_col = pad_len_old // rows

    # ---- permute columns (shard, bucket)-major (stable inside a group:
    # preserves xy-key order, keeping intra-bucket locality).  For SPMD
    # (n_shards > 1) columns are greedily balanced over shards by tile count
    # within each bucket, and per-(shard, bucket) deficits are filled with
    # SYNTHETIC inert columns (no particles, all-tail windows), so every
    # shard owns a contiguous slot range with an identical bucket-shape
    # signature — the one traced program shard_map requires.
    if n_shards > 1:
        shard_of_col = np.zeros(n_cols, np.int64)
        syn = []  # (bucket, shard, n_tiles) synthetic columns
        for bi in range(len(caps)):
            cs_b = np.flatnonzero(cbucket == bi)
            if not len(cs_b):
                continue
            order_b = cs_b[np.argsort(-tiles_per_col[cs_b], kind="stable")]
            loads = np.zeros(n_shards, np.int64)
            for c in order_b:
                d = int(np.argmin(loads))
                shard_of_col[c] = d
                loads[d] += tiles_per_col[c]
            peak = int(loads.max())
            for d in range(n_shards):
                if loads[d] < peak:
                    syn.append((bi, d, peak - int(loads[d])))
        n_syn = len(syn)
        cbucket_ext = np.concatenate(
            [cbucket, np.asarray([s[0] for s in syn], np.int64)])
        shard_ext = np.concatenate(
            [shard_of_col, np.asarray([s[1] for s in syn], np.int64)])
        pad_ext = np.concatenate(
            [pad_len_old,
             np.asarray([s[2] * rows for s in syn], np.int64)])
        col_perm = np.lexsort(
            (np.arange(n_cols + n_syn), cbucket_ext, shard_ext))
    else:
        n_syn = 0
        cbucket_ext = cbucket
        pad_ext = pad_len_old
        col_perm = np.argsort(cbucket, kind="stable")       # new -> old col

    pad_len = pad_ext[col_perm]                              # new order
    col_slot_start_new = np.concatenate([[0], np.cumsum(pad_len)])
    new_of_old = np.empty(n_cols + n_syn, np.int64)
    new_of_old[col_perm] = np.arange(n_cols + n_syn)
    col_start_of_old = col_slot_start_new[new_of_old[:n_cols]]  # old col -> slot
    body_slots = int(col_slot_start_new[-1])
    tail = ((w_max + ALIGN - 1) // ALIGN) * ALIGN
    n_slots = body_slots + tail
    n_tiles = body_slots // rows

    slot_of_particle = np.empty(n, dtype=np.int64)
    slot_of_particle[order] = (
        col_start_of_old[col_sorted] + (np.arange(n) - col_first[col_sorted])
    )
    particle_of_slot = np.full(n_slots, -1, dtype=np.int64)
    particle_of_slot[slot_of_particle] = np.arange(n)

    # real-tile index -> global tile id in the NEW order
    n_tiles_col_new = (pad_len // rows).astype(np.int64)
    col_tile_start_new = np.concatenate([[0], np.cumsum(n_tiles_col_new)])
    tid_real = col_tile_start_new[new_of_old[tile_col]] + tile_rank
    n_tiles_real_ext = np.concatenate(
        [n_tiles_real, np.zeros(n_syn, np.int64)])

    # ---- window offsets in final slot space, clamped into the column
    tbucket = cbucket[tile_col]                              # tile -> bucket
    offsets = np.full((T, nwin), body_slots, dtype=np.int64)    # default: tail
    capk_of_tile = np.zeros((T, nwin), np.int64)
    for k in range(nwin):
        capk_of_tile[:, k] = [cap_vecs[b][k] for b in tbucket]
    for k in range(nwin):
        c = tile_nbr[:, k]
        ok = c >= 0
        cs = np.where(ok, c, 0)
        cstart = col_start_of_old[cs]
        start = cstart + wlo_al[:, k]
        hi_lim = cstart + pad_len_old[cs] - capk_of_tile[:, k]
        start = np.minimum(start, hi_lim)
        start = np.maximum(start, cstart)
        start = (start // ALIGN) * ALIGN  # col starts are rows-aligned, safe
        offsets[:, k] = np.where(ok, start, body_slots)

    # ---- buckets: REAL tiles grouped by (shard, column-bucket); tile ids
    # within a bucket are CONTIGUOUS in the new order.  Padding tiles
    # (pure-padding row blocks inside real AND synthetic columns) join their
    # column's bucket with all-tail windows so their force rows are written
    # (zeros) by the kernels.
    cb_new = cbucket_ext[col_perm]                           # new col -> bucket
    if n_shards > 1:
        sh_new = shard_ext[col_perm]                         # new col -> shard
    else:
        sh_new = np.zeros(n_cols, np.int64)
    tshard = (sh_new[new_of_old[tile_col]] if n_shards > 1
              else np.zeros(T, np.int64))
    buckets = []
    for d in range(n_shards):
        for bi in range(len(caps)):
            sel_cols = np.flatnonzero((cb_new == bi) & (sh_new == d))
            if not len(sel_cols):
                continue
            sel_tiles = np.flatnonzero((tbucket == bi) & (tshard == d))
            tids = tid_real[sel_tiles]
            offs = offsets[sel_tiles]
            # padding tiles of this group's columns
            extra = []
            for c_new in sel_cols:
                t0 = (col_tile_start_new[c_new]
                      + n_tiles_real_ext[col_perm[c_new]])
                t1 = col_tile_start_new[c_new + 1]
                if t1 > t0:
                    extra.append(np.arange(t0, t1))
            if extra:
                extra = np.concatenate(extra)
                tids = np.concatenate([tids, extra])
                offs = np.concatenate(
                    [offs, np.full((len(extra), nwin), body_slots, np.int64)])
            o = np.argsort(tids)
            buckets.append(WindowBucket(
                tile_ids=tids[o].astype(np.int32),
                offsets=offs[o].astype(np.int32),
                windows=tuple(int(x) for x in cap_vecs[bi]),
            ))
            ts = buckets[-1].tile_ids
            assert (np.diff(ts) == 1).all(), "bucket tiles not contiguous"

    padded_pairs = int(sum(len(b.tile_ids) * b.slab_len * rows for b in buckets))
    stats = {
        "n_slots": n_slots,
        "n_tiles": n_tiles,
        "n_real_tiles": int(T),
        "n_buckets": len(buckets),
        "bucket_caps": [b.slab_len for b in buckets],
        "bucket_tiles": [len(b.tile_ids) for b in buckets],
        "padded_pairs_per_step": padded_pairs,
        "pairs_per_particle": padded_pairs / max(n, 1),
        "slot_inflation": n_slots / max(n, 1),
        "w_max": w_max,
        "n_shards": int(n_shards),
    }
    return WindowLayout(
        cell=float(cell),
        rows=int(rows),
        n_slots=int(n_slots),
        n_tiles=int(n_tiles),
        tail_start=int(body_slots),
        slot_of_particle=slot_of_particle,
        particle_of_slot=particle_of_slot,
        buckets=buckets,
        stats=stats,
        n_shards=int(n_shards),
    )


def validate_window_layout(layout: WindowLayout, rest: np.ndarray,
                           support_radius: float) -> dict:
    """Check (a) every true rest-neighbor pair is covered by a window of the
    other particle's tile, and (b) no tile's windows overlap each other on
    REAL slots (overlap on inert tail/padding slots is harmless)."""
    rest = np.asarray(rest, np.float64)
    n = rest.shape[0]
    rows = layout.rows
    from scipy.spatial import cKDTree

    tree = cKDTree(rest)
    pairs = tree.query_pairs(support_radius, output_type="ndarray")
    i, j = pairs[:, 0], pairs[:, 1]

    # slot -> covering windows as a boolean membership matrix (n_tiles, n_slots)
    # is too big; instead mark, per tile, covered slot ranges and test via
    # interval arithmetic: slot s is covered by tile t iff s in any
    # [o_k, o_k + W_b).
    tile_of_slot = np.arange(layout.n_tiles * rows) // rows
    si = layout.slot_of_particle[i]
    sj = layout.slot_of_particle[j]

    nwin = layout.buckets[0].offsets.shape[1]
    off = np.zeros((layout.n_tiles, nwin), np.int64)
    capv = np.zeros((layout.n_tiles, nwin), np.int64)
    seen = np.zeros((layout.n_tiles,), bool)
    for b in layout.buckets:
        off[b.tile_ids] = b.offsets
        capv[b.tile_ids] = np.asarray(b.windows)[None, :]
        seen[b.tile_ids] = True

    def covered(t_ids, s):
        o = off[t_ids]                            # (P, nwin)
        c = capv[t_ids]                           # (P, nwin)
        return (((s[:, None] >= o) & (s[:, None] < o + c)).any(axis=1)
                & seen[t_ids])

    ok = covered(tile_of_slot[si], sj) & covered(tile_of_slot[sj], si)
    missing = int((~ok).sum())
    if missing:
        raise AssertionError(f"{missing}/{len(i)} true pairs uncovered")

    # self coverage: every particle's own slot covered by its own tile
    s_all = layout.slot_of_particle
    ok_self = covered(tile_of_slot[s_all], s_all)
    if int((~ok_self).sum()):
        raise AssertionError("self slots uncovered")

    # overlap check on REAL slots: windows of one tile must not double-count
    real = layout.particle_of_slot >= 0
    real_cum = np.concatenate([[0], np.cumsum(real)])

    def n_real(lo_, hi_):  # real slots in [lo_, hi_)
        return real_cum[hi_] - real_cum[lo_]

    for b in layout.buckets:
        w = np.asarray(b.windows)[None, :]
        order_ = np.argsort(b.offsets, axis=1)
        o_s = np.take_along_axis(b.offsets.astype(np.int64), order_, axis=1)
        w_s = np.take_along_axis(np.broadcast_to(w, b.offsets.shape), order_,
                                 axis=1)
        end_s = o_s + w_s
        bad = o_s[:, 1:] < end_s[:, :-1]
        if bad.any():
            tt, kk = np.nonzero(bad)
            for t_, k_ in zip(tt[:256], kk[:256]):
                lo_ = int(o_s[t_, k_ + 1])
                hi_ = int(min(end_s[t_, k_], end_s[t_, k_ + 1]))
                if n_real(lo_, hi_) > 0:
                    raise AssertionError(
                        f"tile {b.tile_ids[t_]} windows overlap real slots")
    true_pairs = 2 * len(i) + n
    return {
        "true_pairs": true_pairs,
        "padded_pairs": layout.stats["padded_pairs_per_step"],
        "waste": layout.stats["padded_pairs_per_step"] / max(true_pairs, 1),
    }
