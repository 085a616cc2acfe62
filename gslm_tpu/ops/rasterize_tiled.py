"""Production tile-based rasterizer: duplicate → sort → per-tile composite.

TPU-native re-design of the CUDA pipeline (duplicateWithKeys → radix sort →
identifyTileRanges → per-tile renderCUDA) in pure XLA ops with static shapes:

  1. *Duplicate*: each visible Gaussian owns ``tile_count`` consecutive
     entries in a fixed-capacity list (capacity ``dup_capacity``), placed by
     an exclusive cumsum + ``jnp.repeat(..., total_repeat_length)`` — the
     static-shape replacement for the CUDA prefix-sum + scatter.
  2. *Sort*: one stable lexicographic ``lax.sort`` on (tile_id, depth) keys
     with the Gaussian index as payload — replaces the 64-bit-key radix sort.
  3. *Ranges*: ``searchsorted`` of tile boundaries over the sorted tile ids —
     the identifyTileRanges analog.
  4. *Composite*: tiles processed in chunks via ``lax.map`` (bounded memory);
     within a chunk each 16x16 tile gathers its first ``max_per_tile``
     splats and runs the closed-form compositor (ops/composite.py). The
     chunk body is rematerialized (jax.checkpoint) so the backward pass
     recomputes alphas tile-by-tile instead of storing (splat, pixel)
     weights — the same recompute-in-backward strategy as the CUDA backward
     kernel, but deterministic (segment reductions, no atomics).

The whole pipeline is differentiable with jax.grad **and** jax.jvp (sort
order and masks are treated as locally constant, exactly like the CUDA
custom backward/JVP), so the LM J·v / Jᵀ·v operators come for free.

Static-capacity knobs (dup_capacity, max_per_tile) trade memory for exact
coverage; overflow counts are returned so callers can re-tune (the CUDA
version sizes these buffers dynamically per frame, which XLA cannot).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gslm_tpu.ops.composite import alpha_from_conic, composite_weights
from gslm_tpu.ops.projection import TILE, Splats2D, quad_min_rect
from gslm_tpu.struct import pytree_dataclass

# int32 sort-key budget: (ntiles+1) << bit_length(P-1) must fit, else
# duplicate_sort_ranges falls back to the split-key two-key stable sort.
# Module-level (not hardcoded at the branch) so tests can patch it down
# and pin the split-key path at small shapes (tests/test_cull.py).
_KEY_BUDGET = 1 << 31


@pytree_dataclass(static_fields=("dup_capacity", "max_per_tile", "tile_chunk",
                                 "antialiasing", "impl", "pack", "cull",
                                 "live_capacity", "depth_grad",
                                 "mp_route_capacity", "bwd_reduce",
                                 "chunk_rows", "bucket"))
class RasterConfig:
    """Static rasterizer capacities (compile-time).

    ``impl`` selects the compositor when the caller doesn't override it:
    "tiled" (XLA), "pallas" (TPU kernel, custom-VJP), "pallas_jvp" (TPU
    kernel, custom-JVP — for forward-mode LM matvecs), "auto" (pallas on
    TPU, tiled elsewhere), "ref" (dense golden rasterizer).

    ``pack`` (0 = env default GSLM_RASTER_PACK, else 1/2/4/8): records per
    128-lane row in the Pallas record stream. 1 is fastest on v5e
    (measured ~1.8x over 2/4); 8 costs VPU issue overhead but shrinks the
    HBM stream/footprint 8x for million-Gaussian multi-view windows.

    ``cull``: exact ellipse–tile intersection culling. Only records the
    compositor's 1/255 alpha gate would zero everywhere are dropped, so
    output differs from cull=False by at most f32 reassociation (≤1-2 ulp
    from shifted reduction trees, never a contribution). Drops the AABB's
    corner tiles, ~18% of records at typical opacities — every post-sort
    stage scales with the stream. With
    ``live_capacity`` (default 0 → = dup_capacity) the post-sort arrays
    (record gather, compositor streams, backward cotangent scatter) shrink
    to the surviving-record capacity while the AABB-sized duplicate/sort
    front-end keeps ``dup_capacity``.

    ``depth_grad``: compute invdepth cotangents in the Pallas backward.
    Set False when no depth loss is active (the reference backward also
    skips depth grads when dL/dinvdepth is absent) — trims the per-record
    gradient reductions.
    """

    dup_capacity: int = 1 << 18     # total (gaussian, tile) entries
    max_per_tile: int = 1024        # splats composited per tile
    tile_chunk: int = 32            # tiles per lax.map step
    antialiasing: bool = False
    impl: str = "tiled"
    pack: int = 0
    cull: bool = True
    live_capacity: int = 0          # 0 → dup_capacity
    depth_grad: bool = True
    mp_route_capacity: int = 0      # model-parallel raster: per-source-shard
    #                                 routed-record capacity (records each
    #                                 shard may send to ONE band owner);
    #                                 0 → all_gather every shard's splats
    #                                 (parallel/model_raster.py)
    bwd_reduce: str = "auto"        # Pallas backward (L,10)->(P,10)
    #                                 cotangent reduction. "auto" (default
    #                                 since r5) resolves by live record
    #                                 count: "scatter" (XLA scatter-add,
    #                                 row-serial) below ~4M records,
    #                                 "sortseg" (sort-by-gaussian +
    #                                 segmented-scan segment-sum) above.
    #                                 Measured in-graph on v5e (honest
    #                                 A/B; standalone pure-XLA timings
    #                                 over the axon tunnel under-report):
    #                                 at L=1.3M scatter fwd+bwd 83.1 ms vs
    #                                 sortseg 105.6 ms (and the sortseg
    #                                 lowering compiles pathologically
    #                                 slowly at this size); at L=10.5M
    #                                 sortseg 909 ms vs scatter 1392 ms.
    #                                 Both are parity-green on the full
    #                                 hardware matrix (grads ≤1.5e-6 rel);
    #                                 the r3 cumsum-diff variant that
    #                                 failed the 1e-4 gate is gone.
    bucket: int = 1                 # binning granularity in tiles (Pallas
    #                                 path only): records are (gaussian,
    #                                 bucket-of-bucket² tiles) instead of
    #                                 (gaussian, tile). The sort and the
    #                                 record gather — the two row-bound
    #                                 stages — shrink ~bucket²/dilation
    #                                 (measured on the m1 scene: 2.2x at
    #                                 bucket=2, 4.0x at bucket=4)
    #                                 while each 16x16 tile walks its
    #                                 parent bucket's segment; records not
    #                                 touching the tile contribute alpha
    #                                 exactly 0, so the composite matches
    #                                 to chunk-boundary f32 rounding (a
    #                                 few ulp). Worth it when the
    #                                 compositor early-exits (deep
    #                                 streams, e.g. millions of splats);
    #                                 at shallow streams the kernel's
    #                                 extra walk outweighs the savings.
    #                                 Capacities then count bucket
    #                                 records. Requires view_rows %
    #                                 bucket == 0.
    chunk_rows: int = 0             # Pallas VMEM rows per DMA chunk
    #                                 (0 → GSLM_RASTER_K/pack, i.e. a
    #                                 fixed record count per chunk). At
    #                                 pack=8 the default chunk is 16 rows
    #                                 = 8 KB per DMA; raising it amortizes
    #                                 DMA issue + loop overhead at the
    #                                 cost of coarser early-exit
    #                                 granularity. Swept on-chip at the
    #                                 million-Gaussian config (r5,
    #                                 pack=8 fwd): rows 0/8/64/128/256 →
    #                                 460/463/467/483/511 ms — early-exit
    #                                 granularity wins, keep the default
    #                                 (scripts/profile_m1.py --rows ...)

    def __post_init__(self):
        if self.chunk_rows < 0 or self.chunk_rows % 8:
            raise ValueError(
                f"chunk_rows={self.chunk_rows}: must be a non-negative "
                "multiple of 8 (VMEM sublane tile)")
        if self.bwd_reduce not in ("auto", "scatter", "sortseg"):
            raise ValueError(
                f"bwd_reduce={self.bwd_reduce!r}: must be 'auto', "
                "'scatter' or 'sortseg' (unknown values would silently "
                "fall through to the scatter path)")
        if self.impl not in ("tiled", "pallas", "pallas_jvp", "auto", "ref"):
            raise ValueError(f"impl={self.impl!r}: must be one of "
                             "tiled/pallas/pallas_jvp/auto/ref")
        if self.bucket not in (1, 2, 4):
            raise ValueError(f"bucket={self.bucket}: must be 1, 2 or 4")

    def eff_capacity(self) -> int:
        return (self.live_capacity or self.dup_capacity) if self.cull \
            else self.dup_capacity

    def grow(self, factor: int = 2) -> "RasterConfig":
        """Overflow-recovery scaling: EVERY capacity ceiling must grow (a
        doubled dup_capacity alone leaves the post-cull live stream or the
        routed-record buffers at their old ceilings and the overflow
        persists)."""
        return self.replace(
            dup_capacity=factor * self.dup_capacity,
            live_capacity=factor * self.live_capacity,
            mp_route_capacity=factor * self.mp_route_capacity)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _lower_bound(keys, bounds, n: int):
    """Vectorized binary search: for each bound, the count of (ascending)
    ``keys[:n]`` strictly below it. Replaces the separable rect-histogram
    for per-tile segment extraction when exact culling is on (survival is
    not separable in x/y, so the MXU indicator matmul no longer applies):
    ~log2(n) gathers of ntiles rows each — P- and L-independent."""
    lo = jnp.zeros_like(bounds)
    hi = jnp.full_like(bounds, n)
    for _ in range(max(n.bit_length(), 1) + 1):
        mid = (lo + hi) >> 1
        go = keys[jnp.minimum(mid, n - 1)] < bounds
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    return jnp.minimum(lo, n)


def _cell_masks(splats: Splats2D, view_rows: int, cwb: int,
                tile_px: int = TILE):
    """Per-Gaussian 8×8-cell survival masks for exact ellipse–tile culling.

    ``tile_px``: pixel size of one grid unit (TILE for the plain tile
    grid; TILE*bucket when the rects are bucket-granular).

    The AABB tile rect (projection.py, opacity-aware per-axis bounds) still
    keeps tiles the contributing ellipse never touches — the rect corners.
    Partition each rect into an 8×8 grid of cells (cell = cw×ch whole
    tiles, cw = ceil(w/8)); a cell survives iff the exact min of the conic
    quadratic over the cell's pixel rectangle is within the alpha ≥ 1/255
    level set (projection.quad_min_rect). For rects ≤ 8 tiles wide/tall the
    cells ARE single tiles, so the test is exact per tile; larger rects are
    culled at cell granularity (measured: the 8×8 scheme recovers
    essentially the full exact-test reduction, 0.8213 vs 0.8211 survival on
    the bench distribution). Returns three packed int32 mask words
    (22/22/20 bits), packed (ch << cwb) | cw cell sizes, and the per-
    Gaussian surviving-tile count.

    CUDA comparison: the reference's rasterizer keeps the full 3-sigma
    rect (SURVEY §2.2 duplicateWithKeys); opacity-aware AABB + exact
    intersection is a TPU-side improvement that shrinks the record stream
    the row-latency-bound scatter/gather stages pay for."""
    x0r, y0r = splats.rect_min[:, 0], splats.rect_min[:, 1]
    x1r, y1r = splats.rect_max[:, 0], splats.rect_max[:, 1]
    wr = jnp.maximum(x1r - x0r, 1)
    hr = jnp.maximum(y1r - y0r, 1)
    cw = (wr + 7) >> 3
    ch = (hr + 7) >> 3
    # tile rows are view-local in pixel space (fused multi-view batches
    # stack per-view tile grids vertically with view-local splat coords)
    y0loc = y0r % view_rows
    mx, my = splats.mean2d[:, 0], splats.mean2d[:, 1]
    qa = jnp.maximum(splats.conic[:, 0], 1e-12)
    qb = splats.conic[:, 1]
    qc = jnp.maximum(splats.conic[:, 2], 1e-12)
    s2 = 2.0 * jnp.log(jnp.maximum(splats.opacity * 255.0, 1e-12))
    ftile = float(tile_px)
    words = [jnp.zeros_like(x0r), jnp.zeros_like(x0r), jnp.zeros_like(x0r)]
    nlive = jnp.zeros_like(x0r)
    for b in range(64):
        cy_, cx_ = b >> 3, b & 7
        ax0 = cx_ * cw
        ax1 = jnp.minimum(ax0 + cw, wr)
        ay0 = cy_ * ch
        ay1 = jnp.minimum(ay0 + ch, hr)
        nx = jnp.maximum(ax1 - ax0, 0)
        ny = jnp.maximum(ay1 - ay0, 0)
        qmin = quad_min_rect(
            qa, qb, qc,
            (x0r + ax0).astype(jnp.float32) * ftile - mx,
            (x0r + ax1).astype(jnp.float32) * ftile - 1.0 - mx,
            (y0loc + ay0).astype(jnp.float32) * ftile - my,
            (y0loc + ay1).astype(jnp.float32) * ftile - 1.0 - my)
        # conservative margin: keep on any rounding doubt (never cull a
        # record the compositor's 1/255 gate would pass)
        keep = (nx > 0) & (ny > 0) & (qmin * (1.0 - 1e-4) <= s2 + 1e-3)
        wi, sh = (0, b) if b < 22 else ((1, b - 22) if b < 44 else (2, b - 44))
        words[wi] = words[wi] | (keep.astype(jnp.int32) << sh)
        nlive = nlive + jnp.where(keep, nx * ny, 0)
    nlive = jnp.where(splats.tile_count > 0, nlive, 0)
    assert cw.dtype == jnp.int32
    return words[0], words[1], words[2], (ch << cwb) | cw, nlive


def duplicate_sort_ranges(splats: Splats2D, ntx: int, nty: int, L: int,
                          carry_cols=None, *, view_rows: int | None = None,
                          cull: bool = False, live_capacity: int = 0,
                          want_gid_counts: bool = False,
                          tile_px: int = TILE):
    """Stages 1-3 of the tile pipeline (shared by the XLA and Pallas
    compositors): fixed-capacity duplicate-with-keys, sort by (tile,
    depth), per-tile range extraction.

    Returns ``(order (P,), rank (L,), starts, ends, total)``: ``order`` is
    the depth-ascending permutation of Gaussians; ``rank[i]`` indexes into
    *depth-sorted* per-Gaussian tables (callers gather splat fields as
    ``field[order][rank]`` — composing keeps the big L-sized gather single
    and its VJP an exact scatter-add). Entry order within a tile matches
    the CUDA stable (tile, depth) sort bit-for-bit: rank ascends with
    depth, ties broken by original index via the stable P-level sort.

    ``carry_cols`` (optional, (NC, P) f32): per-Gaussian field columns to
    carry *through* the pipeline as sort payloads; returned as an extra
    (NC, L) tuple element in sorted-entry order. On TPU a random-index
    L-sized gather runs at ~11 ns/row (~24 ms at L=2M) while sort payloads
    are nearly free (measured +0.1 ms for 10 payload columns) and both
    ``lax.sort`` payloads and ``jnp.repeat`` differentiate efficiently
    (repeat's VJP is a consecutive segment-sum, 10x faster than the
    scatter-add a gather's VJP emits) — so carrying fields beats gathering
    by ~20 ms each way at 1080p scale.

    TPU-native design (replaces the CUDA 64-bit-key radix sort):
      1. depth-argsort the P Gaussians once (P << L), payload-carrying the
         per-Gaussian columns instead of permuting them with gathers;
      2. entries then need only a single int32 key ``tile << B | rank``
         (in-tile depth order == rank order) — a keys-only ``lax.sort``
         moves 3x less data than the lexicographic (tile, depth, gid) sort;
      3. per-tile segment bounds come from a rectangle histogram: a tile is
         covered by a Gaussian iff (row in [y0,y1)) AND (col in [x0,x1)) —
         separable, so the (nty, ntx) count map is one (nty,P)x(P,ntx)
         indicator matmul on the MXU + a tiny cumsum (measured 150x faster
         than searchsorted over the L-sized sorted keys).

    When ``(ntiles+1) << B`` exceeds int32 (huge P x many tiles) the key
    packs (tile, rank-high) and rank-low rides as a payload — still int32,
    still keys-first. Segments are exact whenever ``total <= L``; on
    overflow the flag is set and contents degrade (finite, gated) until the
    caller re-tunes dup_capacity, matching the reference's resize-on-demand.

    ``cull=True`` enables exact ellipse–tile culling (see ``_cell_masks``):
    entries whose tile the contributing ellipse never reaches get the
    sentinel key and sort past all live entries, so the returned ``rank``
    and segment bounds are truncated to ``live_capacity`` (default
    ``L``) — post-sort stages (gather, compositor, backward scatter) then
    scale with the surviving stream while duplicate+sort keep AABB
    capacity. Culled records are exactly ones the compositor's 1/255 alpha
    gate zeroes, so output changes only by f32 reassociation. The returned
    ``total`` becomes a pair (live total, AABB total) for the two capacity
    checks.

    ``want_gid_counts=True`` appends one more return element: the
    per-Gaussian live record count in DEPTH order (the value ``rank``
    indexes by), i.e. how many sorted entries carry each rank. The Pallas
    backward's sort-based cotangent segment-reduction needs the exclusive
    prefix of these as its segment boundaries (``_gather_records_seg``).
    """
    ntiles = ntx * nty
    P = splats.mean2d.shape[0]
    assert ntx <= 0xFFFF and nty <= 0xFFFF, "tile coords must fit 16 bits"
    B = max((P - 1).bit_length(), 1)
    nc = 0 if carry_cols is None else carry_cols.shape[0]
    if view_rows is None:
        view_rows = nty
    Leff = (live_capacity or L) if cull else L

    cell_cols = ()
    if cull:
        cwb = max(_cdiv(ntx, 8).bit_length(), 1)
        chb = max(_cdiv(view_rows, 8).bit_length(), 1)
        m0, m1, m2, cwch, nlive = _cell_masks(splats, view_rows, cwb,
                                              tile_px=tile_px)
        total_live = jnp.sum(nlive)
        cell_cols = (m0, m1, m2, cwch)
        if want_gid_counts:
            cell_cols = cell_cols + (nlive,)

    # ---- 1. depth pre-sort at P level (stable; invisible last) ----------
    # Rect corners ride as two packed int32 payloads ((x0<<16|x1),
    # (y0<<16|y1)): bitonic sort cost scales with payload width, and tile
    # coordinates always fit 16 bits.
    depth_key = jnp.where(splats.visible, splats.depth, jnp.inf)
    px_pack = (splats.rect_min[:, 0] << 16) | splats.rect_max[:, 0]
    py_pack = (splats.rect_min[:, 1] << 16) | splats.rect_max[:, 1]
    sorted_p = jax.lax.sort(
        (depth_key, jnp.arange(P, dtype=jnp.int32), splats.tile_count,
         px_pack, py_pack, *cell_cols,
         *(carry_cols[i] for i in range(nc))),
        num_keys=1, is_stable=True)
    _, order, counts, pxs, pys = sorted_p[:5]
    ncell = len(cell_cols)
    cell_p = sorted_p[5:5 + ncell]
    ccols_p = sorted_p[5 + ncell:]
    x0, x1 = pxs >> 16, pxs & 0xFFFF
    y0, y1 = pys >> 16, pys & 0xFFFF

    offsets = jnp.cumsum(counts) - counts            # exclusive
    total = offsets[-1] + counts[-1]

    # ---- 2. duplicate + keys-first sort ----------------------------------
    # Per-entry integer control fields (segment offset, rect width, corner
    # tile, depth rank) are reconstructed by a *delta-scatter + cumsum*: for
    # any per-Gaussian value v, scatter v_g - v_{g-1} at offset_g and cumsum
    # — entry i then reads the value of its owning Gaussian (offsets shared
    # with zero-count Gaussians telescope away). This replaces the old
    # jnp.repeat(packed, counts) whose lowering ends in an L-sized row
    # gather (~8 ms at L=2M on v5e; the delta scatter is P-sized and the
    # int32 cumsums are bandwidth-cheap). int32 exactness also lifts the
    # old f32 dup_capacity < 2^24 cap. Fields pack LSB-first into as few
    # int32 streams as their static bit budgets allow (two for typical
    # shapes).
    width = jnp.maximum(x1 - x0, 1)
    corner = y0 * ntx + x0
    rank_p = jnp.arange(P, dtype=jnp.int32)          # rank = depth position
    field_bits = [(offsets, max(L.bit_length(), 1)),
                  (width, max(ntx.bit_length(), 1)),
                  (corner, max((ntiles - 1).bit_length(), 1)),
                  (rank_p, B)]
    if cull:
        field_bits += [(cell_p[0], 22), (cell_p[1], 22), (cell_p[2], 20),
                       (cell_p[3], cwb + chb)]
    streams, layout = [], []                         # layout: (si, shift, nb)
    for arr, nb in field_bits:
        assert nb <= 31, "field exceeds an int32 stream"
        if streams and layout[-1][1] + layout[-1][2] + nb <= 31:
            sh = layout[-1][1] + layout[-1][2]
            streams[-1] = streams[-1] | (arr << sh)
        else:
            sh = 0
            streams.append(arr)
        layout.append((len(streams) - 1, sh, nb))
    svals = jnp.stack(streams, axis=0)               # (ns, P)
    delta = jnp.concatenate([svals[:, :1], svals[:, 1:] - svals[:, :-1]],
                            axis=1)
    acc = jnp.zeros((len(streams), L), jnp.int32).at[:, offsets].add(
        delta, mode="drop")
    acc = jnp.cumsum(acc, axis=1)
    fields_e = [(acc[si] >> sh) & ((1 << nb) - 1) for si, sh, nb in layout]
    off_e, w_e, corner_e, rank_e = fields_e[:4]

    iota = jnp.arange(L, dtype=jnp.int32)
    entry_valid = iota < total
    r = iota - off_e
    dy = r // w_e
    dx = r - dy * w_e
    tile = corner_e + dy * ntx + dx

    if cull:
        # per-entry survival bit from the owning Gaussian's cell mask
        m0e, m1e, m2e, cwche = fields_e[4:8]
        cw_e = jnp.maximum(cwche & ((1 << cwb) - 1), 1)
        ch_e = jnp.maximum(cwche >> cwb, 1)
        cxe = jnp.clip(dx // cw_e, 0, 7)
        cye = jnp.clip(dy // ch_e, 0, 7)
        cb_ = cye * 8 + cxe
        word = jnp.where(cb_ < 22, m0e, jnp.where(cb_ < 44, m1e, m2e))
        shv = jnp.where(cb_ < 22, cb_,
                        jnp.where(cb_ < 44, cb_ - 22, cb_ - 44))
        entry_live = entry_valid & (((word >> shv) & 1) > 0)
    else:
        entry_live = entry_valid

    if nc:
        # real-valued carry columns still ride a jnp.repeat (they need
        # exact f32 values and a differentiable path; the integer control
        # fields above need neither)
        rep_c = jnp.repeat(jnp.stack(ccols_p, axis=1), counts, axis=0,
                           total_repeat_length=L)
        payloads = tuple(rep_c[:, i] for i in range(nc))
    else:
        payloads = ()

    if (ntiles + 1) << B <= _KEY_BUDGET:
        key_shift = B
        key = jnp.where(entry_live,
                        (tile << B) | rank_e,
                        jnp.int32(ntiles << B))      # sentinel sorts last
        sorted_l = jax.lax.sort((key, *payloads), num_keys=1,
                                is_stable=False)
        rank = sorted_l[0] & ((1 << B) - 1)
        ccols_l = sorted_l[1:]
    else:
        # split rank across key high bits + payload (the m1 regime:
        # 1080p's 8160 tiles x P=2^20 needs 33 key bits). ONE stable key
        # suffices: entries are laid out by the depth-ordered cumsum, so
        # within any equal (tile, rank-high) key the original entry order
        # already ascends in rank — stability supplies the rank-low
        # tie-break and rank_e rides as a pure payload. (Measured at
        # L=12.6M on v5e: same time as num_keys=2 — XLA's stable lowering
        # appends an iota tiebreaker either way — kept for the simpler
        # comparator and because it documents the real invariant.)
        hi_bits = _KEY_BUDGET.bit_length() - 1 - (ntiles + 1).bit_length()
        key_shift = hi_bits
        key = jnp.where(entry_live,
                        (tile << hi_bits) | (rank_e >> (B - hi_bits)),
                        jnp.int32(ntiles << hi_bits))
        sorted_l = jax.lax.sort((key, rank_e, *payloads), num_keys=1,
                                is_stable=True)
        rank = sorted_l[1]
        ccols_l = sorted_l[2:]

    # ---- 3. per-tile segment bounds --------------------------------------
    if cull:
        # survival is not separable in x/y, so the histogram matmul below
        # no longer applies; the sorted keys themselves ARE the segment
        # structure (live entries form an ascending prefix) — binary-search
        # the tile boundaries over the truncated key stream.
        bounds = (jnp.arange(ntiles, dtype=jnp.int32) + 1) << key_shift
        ends = _lower_bound(sorted_l[0][:Leff], bounds, Leff)
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
        rank = rank[:Leff]
        ccols_l = tuple(c[:Leff] for c in ccols_l)
        totals = (total_live, total)
    else:
        # rectangle-histogram matmul (MXU): a tile is covered iff
        # (row in [y0,y1)) AND (col in [x0,x1)) — separable
        vis = counts > 0
        cx = jnp.arange(ntx, dtype=jnp.int32)[None, :]
        cy = jnp.arange(nty, dtype=jnp.int32)[None, :]
        in_x = ((cx >= x0[:, None]) & (cx < x1[:, None])).astype(jnp.bfloat16)
        in_y = ((cy >= y0[:, None]) & (cy < y1[:, None]) & vis[:, None]
                ).astype(jnp.bfloat16)
        hist = jax.lax.dot_general(in_y, in_x, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        ends = jnp.minimum(jnp.cumsum(hist.reshape(-1).astype(jnp.int32)), L)
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
        totals = (total, total)
    out = (order, rank, starts, ends, totals)
    if carry_cols is not None:
        out = out + (ccols_l,)
    if want_gid_counts:
        # per-gaussian live record count in depth order (rank's index
        # space): the exact cell-mask tile count when culling, else the
        # AABB tile count (both already zero for invisible Gaussians)
        out = out + (cell_p[4] if cull else counts,)
    return out


@functools.partial(jax.jit, static_argnames=("height", "width", "config",
                                             "view_rows"))
def rasterize_tiled(splats: Splats2D, height: int, width: int,
                    bg: jnp.ndarray, config: RasterConfig,
                    view_rows: int | None = None) -> dict:
    """Composite splats over a (height, width) canvas.

    Returns dict(render (3,H,W), invdepth (1,H,W), n_duplicates, overflow,
    max_tile_load); the last three are diagnostics (int32 scalars).
    ``view_rows``: tile rows per view for fused multi-view batches (splat
    coordinates are view-local; tile rows wrap modulo view_rows).
    """
    L = config.dup_capacity
    S = config.max_per_tile
    G = config.tile_chunk
    ntx, nty = _cdiv(width, TILE), _cdiv(height, TILE)
    ntiles = ntx * nty
    if view_rows is None:
        view_rows = nty

    Leff = config.eff_capacity()
    order, rank, starts, ends, totals = duplicate_sort_ranges(
        splats, ntx, nty, L, view_rows=view_rows, cull=config.cull,
        live_capacity=config.live_capacity)
    total_eff, total_aabb = totals
    tile_loads = ends - starts

    # ---- 4. per-tile compositing ----------------------------------------
    # Gather the splat fields into depth order once at P level (cheap), so
    # each tile's per-slot lookup is a single gather through ``rank``.
    mean2d = splats.mean2d[order]
    conic = splats.conic[order]
    color = splats.color[order]
    opacity = splats.opacity[order]
    invdepth = splats.invdepth[order]
    sorted_gid = rank

    slot_iota = jnp.arange(S, dtype=jnp.int32)
    # Pixels are handled as a flat (256,) lane vector per tile, not (16,16):
    # a 16-wide minor dim uses 16 of the VPU's 128 lanes (8x waste); the
    # flat layout fills two full vector registers per row.
    lin = jnp.arange(TILE * TILE, dtype=jnp.float32)
    lane_px = lin % TILE
    lane_py = lin // TILE

    def tile_fn(t):
        s0 = starts[t]
        n = jnp.minimum(ends[t] - s0, S)
        idx = jnp.minimum(s0 + slot_iota, Leff - 1)
        g = sorted_gid[idx]                          # (S,)
        valid = slot_iota < n

        txc = (t % ntx).astype(jnp.float32) * TILE
        tyc = ((t // ntx) % view_rows).astype(jnp.float32) * TILE
        px = txc + lane_px                            # (256,)
        py = tyc + lane_py

        alpha = alpha_from_conic(mean2d[g], conic[g], opacity[g], px, py,
                                 valid[:, None])              # (S,256)
        weights, t_final = composite_weights(alpha)
        # precision=HIGHEST: TPU matmuls default to bf16 passes; color
        # accumulation error would otherwise reach ~4e-3 per pixel.
        img = (jnp.matmul(weights.T, color[g],
                          precision=jax.lax.Precision.HIGHEST)  # (256,3)
               + t_final[:, None] * bg[None, :])
        invd = jnp.matmul(weights.T, invdepth[g][:, None],
                          precision=jax.lax.Precision.HIGHEST)  # (256,1)
        return img, invd

    n_groups = _cdiv(ntiles, G)
    tile_ids = jnp.arange(n_groups * G, dtype=jnp.int32) % ntiles
    tile_ids = tile_ids.reshape(n_groups, G)

    group_fn = jax.checkpoint(jax.vmap(tile_fn))
    imgs, invds = jax.lax.map(group_fn, tile_ids)    # (n_groups, G, 256, 3/1)

    def assemble(tiles, c):
        tiles = tiles.reshape(n_groups * G, TILE, TILE, c)[:ntiles]
        tiles = tiles.reshape(nty, ntx, TILE, TILE, c)
        canvas = tiles.transpose(4, 0, 2, 1, 3).reshape(c, nty * TILE, ntx * TILE)
        return canvas[:, :height, :width]

    return {
        "render": assemble(imgs, 3),
        "invdepth": assemble(invds, 1),
        "n_duplicates": total_eff,
        "overflow": ((total_eff > Leff) | (total_aabb > L)).astype(jnp.int32),
        "max_tile_load": jnp.max(tile_loads),
    }
