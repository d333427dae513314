"""Congruent 4-point set search: invariant-point join of two pair sets.

Replaces both reference variants with one data-parallel join:

- ``Match4PCS::FindCongruentQuadrilaterals`` (ref:src/super4pcs/
  algorithms/4pcs.cc:62-109) builds a temporary kd-tree on the
  invariant points ``e1 = a + inv1 (b - a)`` of the first pair set and
  range-queries it with ``e2 = c + inv2 (d - c)`` of the second;
- ``MatchSuper4PCS::FindCongruentQuadrilaterals`` (ref:algorithms/
  super4pcs.cc:80-177) additionally filters by pair direction through a
  position-grid + direction-bin cone rasterization
  (ref:accelerators/normalset.hpp:162-210).

Here both become a dense masked K x K distance test between the two
invariant-point sets — an MXU-shaped computation — plus, in Super4PCS
mode, an exact cone mask ``|dir1 . dir2 - cos(alpha)| <= tol`` on the
joined candidates. The reference's grid query inspects only the single
cell containing the query point, so it can drop true matches whose
invariant point falls in an adjacent cell; the dense form has no such
misses (it is a superset, then exactly validated).

Threshold quirk *not* kept: both reference variants compare a *squared*
distance against the *unsquared* ``distance_threshold2``
(ref:4pcs.cc:97-99, super4pcs.cc:160), making the effective radius
``sqrt(2 * delta)`` — scale-dependent and unintended (~14x too wide at
delta=0.01, too narrow at delta>0.5). The inflated radius produces
10^5-10^6 spurious congruent quads per base, which the reference
absorbs through per-candidate early exits but which would swamp a
batched scorer. We use the geometrically intended contract: squared
distance vs squared radius, ``d^2 <= threshold^2``. Candidates the
quirk would add are false positives that the reference's own
rms-vs-2*delta gate (ref:hpp:439) rejects later, so LCP quality is
unaffected. Divergence decided per SURVEY.md §3.3/§7 hard-part (d).
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np

from .masking import masked_indices, masked_indices_2d
from . import healpix as _healpix


def invariant_points(pos, pairs, invariant):
    """``e = p_first + invariant * (p_second - p_first)``
    (ref:4pcs.cc:87, super4pcs.cc:123)."""
    a = pos[pairs[:, 0]]
    b = pos[pairs[:, 1]]
    return a + invariant * (b - a)


def pair_directions(pos, pairs):
    d = pos[pairs[:, 1]] - pos[pairs[:, 0]]
    n = jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d / jnp.maximum(n, 1e-30)


# ---------------------------------------------------------------------------
# Direction filters. The default is the exact cone mask
# |dir1 . dir2 - cos(alpha)| <= tol; the optional HEALPix filter mirrors
# the reference's deprecated ``IndexedNormalHealSet`` (ref:src/super4pcs/
# accelerators/normalHealSet.h:270-321): the circle of directions at
# angle alpha around each query direction is sampled and rasterized into
# ring-scheme pixels, and a candidate passes iff its direction's pixel is
# among them. Tolerance is implicit in the bin resolution (nside), as in
# the reference — where the exact mask uses ``cone_cos_tolerance``, the
# healpix mask uses pixel adjacency.
# ---------------------------------------------------------------------------


def healpix_circle_pixels(dirs, cos_alpha, nside: int, samples: int = 32):
    """Ring-scheme pixels rasterized by the circle of directions at angle
    ``alpha`` (given as its cosine) around each row of ``dirs`` (K, 3).

    Returns (K, samples) int32 pixel ids (duplicates possible — callers
    use membership, not counts). The sampled-circle rasterization is the
    reference's own scheme (ref:normalHealSet.h:270-321, sampling a
    quaternion-rotated circle); misses between samples are possible
    there too and shrink with ``samples``/pixel size.
    """
    dirs = jnp.asarray(dirs, jnp.float32)
    cos_a = jnp.clip(jnp.asarray(cos_alpha, jnp.float32), -1.0, 1.0)
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))

    # orthonormal frame (u, v) perpendicular to each direction; seed with
    # the least-aligned coordinate axis for stability
    ax = jnp.argmin(jnp.abs(dirs), axis=-1)                    # (K,)
    seed = jnp.eye(3, dtype=jnp.float32)[ax]                   # (K, 3)
    u = jnp.cross(dirs, seed)
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-30)
    v = jnp.cross(dirs, u)

    t = jnp.linspace(0.0, 2.0 * np.pi, samples, endpoint=False)
    circ = (cos_a * dirs[:, None, :]
            + sin_a * (jnp.cos(t)[None, :, None] * u[:, None, :]
                       + jnp.sin(t)[None, :, None] * v[:, None, :]))
    return _healpix.vec2pix_ring(nside, circ)                  # (K, S)


def _healpix_membership(pix_cand, circle_pix):
    """``pix_cand`` (...,) vs per-candidate pixel sets ``circle_pix``
    (..., S): True where the candidate pixel appears in the set."""
    return jnp.any(pix_cand[..., None] == circle_pix, axis=-1)


def find_congruent_quads(
    pos,
    pairs1, valid1,            # (K,2) int32, (K,) bool — base edge (0,1)
    pairs2, valid2,            # (K,2) int32, (K,) bool — base edge (2,3)
    invariant1, invariant2,
    distance_threshold,        # join radius (squared-vs-squared compare)
    base_cos_alpha,            # cos of the angle between the base segments
    cone_cos_tolerance,        # <0: disable the direction filter (4PCS mode)
    capacity: int,
    direction_bins: str = "cone",
    healpix_nside: int = 4,
    healpix_samples: int = 32,
    seg_ratio=None,
    scale_band: float = -1.0,
):
    """Join the two pair sets on invariant-point proximity.

    ``direction_bins`` selects the Super4PCS direction filter: "cone"
    (exact mask, the default) or "healpix" (rasterized ring-scheme bins,
    the reference's ``IndexedNormalHealSet`` analog — see
    :func:`healpix_circle_pixels`). Ignored when
    ``cone_cos_tolerance < 0``.

    ``scale_band`` >= 0 enables the similarity-mode scale-consistency
    mask (the reference's MULTISCALE ratioDev gate,
    ref:match4pcsBase.cc:390-414, applied there only at fit time): a
    candidate passes iff the scales implied by its two pairs agree —
    ``| (d1 / len1) / (d2 / len2) - 1 | <= scale_band`` with
    ``seg_ratio = d1 / d2`` the base's segment-length ratio (traced
    scalar). With the pair distance filter off (estimate_scale) the
    invariant-point join alone floods the capacity with scale-
    inconsistent collisions that the fit gate would reject anyway;
    masking them here keeps true candidates inside ``capacity``.

    Returns (quads (capacity, 4) int32 = (a, b, c, d), valid (capacity,),
    count). Quad layout matches ref:super4pcs.cc:172-173:
    (P_pair.first, P_pair.second, Q_pair.first, Q_pair.second) — both
    pair sets index the Q samples.
    """
    e1 = invariant_points(pos, pairs1, invariant1)     # (K1, 3)
    e2 = invariant_points(pos, pairs2, invariant2)     # (K2, 3)

    d2 = jnp.sum((e1[:, None, :] - e2[None, :, :]) ** 2, axis=-1)
    mask = d2 <= distance_threshold * distance_threshold
    mask = mask & valid1[:, None] & valid2[None, :]

    if scale_band >= 0:
        len1 = jnp.linalg.norm(pos[pairs1[:, 1]] - pos[pairs1[:, 0]],
                               axis=-1)                        # (K1,)
        len2 = jnp.linalg.norm(pos[pairs2[:, 1]] - pos[pairs2[:, 0]],
                               axis=-1)                        # (K2,)
        # ratio1/ratio2 = (d1/len1) / (d2/len2) = seg_ratio * len2/len1
        rr = (seg_ratio * len2[None, :]
              / jnp.maximum(len1[:, None], 1e-30))
        mask = mask & (jnp.abs(rr - 1.0) <= scale_band)

    if cone_cos_tolerance >= 0:
        dir1 = pair_directions(pos, pairs1)
        dir2 = pair_directions(pos, pairs2)
        if direction_bins == "healpix":
            pix1 = _healpix.vec2pix_ring(healpix_nside, dir1)   # (K1,)
            circ = healpix_circle_pixels(
                dir2, base_cos_alpha, healpix_nside, healpix_samples)
            mask = mask & _healpix_membership(
                pix1[:, None], circ[None, :, :])               # (K1, K2)
        else:
            cos12 = jnp.einsum('id,jd->ij', dir1, dir2,
                               precision='highest')           # (K1, K2)
            mask = mask & (jnp.abs(cos12 - base_cos_alpha)
                           <= cone_cos_tolerance)

    k2 = pairs2.shape[0]
    flat_idx, valid, count = masked_indices_2d(mask, capacity)
    i1 = flat_idx // k2
    i2 = flat_idx % k2
    quads = jnp.concatenate([pairs1[i1], pairs2[i2]], axis=-1)
    return quads.astype(jnp.int32), valid, count


# ---------------------------------------------------------------------------
# Grid-hash join — the TPU-native "smart indexing" (Super4PCS) form.
# ---------------------------------------------------------------------------

# Spatial-hash primes (any fixed odd constants work; collisions only add
# candidates that the exact distance mask removes).
_HP1, _HP2, _HP3 = 73856093, 19349669, 83492791

def probe_window(radius: float, cell: float | None) -> int:
    """Cells per axis the grid join probes: a radius-r ball intersects
    at most ceil(2r / cell) + 1 cells per axis (the classic 8-corner
    scheme is the w = 2 case, cell size >= 2r). The single source of
    truth for the window — callers sizing probe budgets must use this.
    """
    cell = cell if cell is not None else 2.0 * radius
    return int(np.ceil(2.0 * radius / cell - 1e-6)) + 1


def _window_offsets(w: int):
    r = range(w)
    return np.array([(i, j, k) for i in r for j in r for k in r],
                    dtype=np.int32)


def _cell_hash(cells):
    """int32 spatial hash of (..., 3) integer cell coordinates."""
    return (cells[..., 0] * _HP1) ^ (cells[..., 1] * _HP2) \
        ^ (cells[..., 2] * _HP3)


def find_congruent_quads_grid(
    pos,
    pairs1, valid1,
    pairs2, valid2,
    invariant1, invariant2,
    distance_threshold,
    base_cos_alpha,
    cone_cos_tolerance,
    capacity: int,
    cell_candidates: int = 16,
    q_budget: int | None = None,
    direction_bins: str = "cone",
    healpix_nside: int = 4,
    healpix_samples: int = 32,
    row_cap: int | None = None,
    probe_budget: int | None = None,
    cell_size: float | None = None,
    seg_ratio=None,
    scale_band: float = -1.0,
    allpairs_cols: bool = False,
    q_uniform: bool = False,
    q_rot=None,
    table_hash=None,
):
    """Output-sensitive congruent-set join via a sorted spatial hash.

    The TPU re-design of Super4PCS's ``IndexedNormalSet`` position-grid
    + direction-bin cone rasterization (ref:src/super4pcs/accelerators/
    normalset.hpp:110-210, algorithms/super4pcs.cc:80-177): instead of
    pointer grids and circle rendering, invariant points of the first
    pair set are hashed into cells of size ``cell_size`` (default
    ``2 * distance_threshold``) and sorted by hash; each second-set
    invariant point probes the w^3 window cells covering its radius-r
    ball (w = ceil(2r / cell) + 1; the classic 8-corner scheme when the
    cell is at least 2r) via boundary queries folded into the same
    sort, takes up to ``cell_candidates`` entries per cell, and
    validates exactly (distance + cone mask). Decoupling ``cell_size``
    from the radius keeps per-cell occupancy — and so the
    ``cell_candidates`` cap pressure — constant when a coarse-search
    radius (Options.search_delta_factor) widens the join: the wider
    ball probes more fine cells instead of fewer, fatter ones.

    The sort carries only the table index; probed slots recompute their
    pair's invariant point and direction exactly from ``pos`` at
    validation (no quantized direction column). Exact up to the
    per-cell candidate cap (overflow is counted); hash collisions only
    add candidates that the exact distance mask removes.

    ``q_budget`` bounds how many *valid* second-side pairs are probed
    per call (default: all up to 8192). The compaction to the budget
    happens BEFORE the probe expansion, so the searchsorted query
    volume and the (QB*w^3, L) candidate gather are independent of
    pair-buffer capacity. Since the Q samples are pre-shuffled
    (ref:match4pcsBase.hpp:129-132), the first ``q_budget`` valid slots
    are a uniform random subsample of the pair set; skipped pairs are
    reported in the separate ``q_subsampled`` return (x w^3, in probe
    units) — intentional subsampling, not capacity pressure.

    Same contract as :func:`find_congruent_quads` (the dense oracle),
    plus a second returned count of per-cell/budget overflow drops.

    ``row_cap`` declares that ``pairs1`` is in the row-capped capture
    layout of ``extract_pairs_rowcap_layout`` — row ``i`` of the table
    is the ordered pair ``(i // row_cap, pairs1[i, 1])``. The first
    endpoint is then materialized by a broadcast instead of a K1-sized
    gather (measurably cheaper on TPU, where gathers are
    element-at-a-time). Behavior is identical; a parity test pins it.

    ``probe_budget``: when set, the corner probes that hit a non-empty
    cell are compacted to this many before the candidate gather, so
    gather/validate cost scales with cells *hit* rather than probes
    *issued* (at the fine-delta operating point only ~13% of probes hit
    a non-empty cell — tools/probe_occupancy measurement). Probes
    beyond the budget drop their whole cell; those entries are counted
    in ``dropped`` exactly like per-cell cap overflow. ``None`` (the
    default) disables compaction — no probe is ever dropped.

    ``allpairs_cols`` (requires ``row_cap``) declares the IMPLICIT
    full-pair table of the scale-mode "allpairs" engine: table row
    ``t`` IS the ordered pair ``(t // row_cap, t % row_cap)`` — no
    pair array exists (``pairs1``/``pairs2`` may be None) and BOTH
    endpoint columns of the hash stage are pure broadcasts of ``pos``:
    the engine's whole point is zero capture loss over the nq^2 pair
    space of estimate_scale mode (the distance filter is off, so every
    ordered pair is a candidate — see matcher.resolve_pair_engine) at
    zero extraction cost and zero K1-sized gathers.

    ``table_hash`` (requires ``row_cap``): a precomputed (K1,) int32
    cell-hash column for the table — captured slots carry
    ``_cell_hash(floor(e1 / cell))``, empty slots the int32-max
    sentinel. The Pallas capture kernel emits this while both pair
    endpoints are VMEM-resident (kernels/rowcap_pallas.py), removing
    the join's single largest cost: the K1-sized ``pos[cols]`` gathers
    + invariant-point arithmetic of the hash build (measured 2.66 s of
    the 3.94 s join at nq=32768, b=16 — tools/join5_micro.py). The
    caller guarantees bit-identical hash arithmetic (same primes, same
    ``a + inv (b - a)`` expression, same cell size).

    ``q_uniform`` replaces the first-``q_budget``-valid-slots probe
    selection with a rotated strided walk over the whole second-side
    buffer (rotation ``q_rot``, re-drawn per trial). The prefix rule is
    right when pairs are band-filtered (any qb of them is a uniform
    subsample of a thin shell); in scale mode the buffer is the raw
    pair ENUMERATION, whose prefix is all pairs anchored at a handful
    of first endpoints — starving the probe side of diversity is what
    drove the measured nq=2500 registration failure.

    Returns (quads, valid, count, dropped, q_subsampled).
    """
    r = distance_threshold
    cell = cell_size if cell_size is not None else 2.0 * r
    w = probe_window(r, cell)
    n_probe = w * w * w
    k1 = valid1.shape[0]
    k2 = valid2.shape[0]
    L = cell_candidates
    if allpairs_cols and row_cap is None:
        raise ValueError("allpairs_cols requires row_cap")

    # gather each pair's endpoints once; e1 and the direction both
    # derive from (a1, b1). Everything K1-sized is kept as 1-D
    # component columns: a (K1, 3) tensor tiles to a minor-dim-padded
    # TPU layout (3 -> 128), a 64x HBM blowup that OOMs at the
    # fine-delta operating point (measured 21.5 GB for the vmapped
    # invariant-point tensor at K1=2.6M x 16 bases).
    # row-capped layouts may pass a 1-D COLS-ONLY table (slot s is the
    # ordered pair (s // row_cap, cols[s])): the packed (K1, 2) pairs
    # tensor was pure waste there — the row side is implicit, and the
    # stack + its fused consumers measured ~1.6 TB of HBM traffic per
    # step at nq=32768 (cost_analysis; the join's real wall after the
    # Pallas capture kernel removed the extraction planes)
    if allpairs_cols:
        cols1 = None
    elif pairs1.ndim == 1:
        assert row_cap is not None, "1-D pairs require row_cap layout"
        cols1 = pairs1
    else:
        cols1 = pairs1[:, 1]
    if row_cap is not None:
        # rows are 0..n_rows-1 in order (n_rows may exceed len(pos) by
        # block padding; those rows are invalid and clamp like gathers)
        n_rows = k1 // row_cap
        row_clamp = jnp.minimum(jnp.arange(n_rows), pos.shape[0] - 1)
        col_clamp = jnp.minimum(jnp.arange(row_cap), pos.shape[0] - 1)
    def _e1_components(rows, cols):
        """Invariant-point components of table pairs (rows, cols) —
        shared by the hash below and the lazy validation (identical
        arithmetic to the dense oracle's ``invariant_points``)."""
        out = []
        for c in range(3):
            pc = pos[:, c]
            ac = pc[rows]
            bc = pc[cols]
            out.append((ac, bc, ac + invariant1 * (bc - ac)))
        return out

    if table_hash is not None:
        # the capture kernel hashed each slot's invariant-point cell
        # in-VMEM while both endpoints were resident (empty slots carry
        # the sentinel) — the whole K1-gather hash stage below is
        # skipped (see the table_hash docstring)
        assert row_cap is not None, "table_hash requires row_cap layout"
        h1 = table_hash
    elif allpairs_cols:
        # Implicit full-pair table: row t = (t // row_cap, t % row_cap).
        # BOTH endpoint columns are broadcasts of small pos gathers —
        # the hash stage of the nq^2-row table does no K1-sized gather
        # at all (the 'a' side repeats per row, the 'b' side repeats
        # per column of the enumeration).
        e1c = []
        for c in range(3):
            pc = pos[:, c]
            ac = jnp.broadcast_to(
                pc[row_clamp][:, None], (n_rows, row_cap)).reshape(k1)
            bc = jnp.broadcast_to(
                pc[col_clamp][None, :], (n_rows, row_cap)).reshape(k1)
            e1c.append(ac + invariant1 * (bc - ac))
    elif row_cap is not None:
        # The 'a' endpoint is constant across a row's slots: gather it
        # once per ROW (n_rows elements) and broadcast across the
        # row_cap axis. TPU gathers are element-at-a-time, so this
        # halves the K1-sized gather volume of the hash stage — the
        # dominant cost of the whole join (measured 603 -> ~300 ms per
        # 16-base step at the fine-delta operating point,
        # tools/join_micro.py). Arithmetic is bit-identical to the
        # gather form (same values, same order).
        def _bcast(x):
            return jnp.broadcast_to(
                x[:, None], (n_rows, row_cap)).reshape(k1)
        e1c = []
        for c in range(3):
            pc = pos[:, c]
            ac = _bcast(pc[row_clamp])
            bc = pc[cols1]
            e1c.append(ac + invariant1 * (bc - ac))
    else:
        rows1 = pairs1[:, 0]
        e1c = [e for (_, _, e) in _e1_components(rows1, cols1)]

    if table_hash is None:
        # hash e1 cells; invalid entries get a sentinel hash kept out
        # of the way by the sort
        h1 = (jnp.floor(e1c[0] / cell).astype(jnp.int32) * _HP1) \
            ^ (jnp.floor(e1c[1] / cell).astype(jnp.int32) * _HP2) \
            ^ (jnp.floor(e1c[2] / cell).astype(jnp.int32) * _HP3)
        h1 = jnp.where(valid1, h1, jnp.int32(2147483647))

    # The table is sorted ONCE (further below, fused with the probe
    # boundary queries), carrying ONLY the original index as payload:
    # the probed slots re-derive their pair identity from the index and
    # recompute invariant point + direction from the small ``pos``
    # table at validation time — (probe_budget * L)-sized gathers —
    # instead of dragging e1 / direction columns through every
    # compare-exchange pass of a K1-sized sort.
    # No `valid` payload column: invalid rows carry the sentinel hash
    # (INT32_MAX, packed group 0x7ffffffe), and no probe can return a
    # sentinel-region slot — a query cell in that top group gets an
    # empty range via the group+2 wrap (see below), and any other group
    # never equals it. (A *valid* entry whose real hash lands in the
    # top group is unreachable for the same reason — true with or
    # without the column, at 2^-31 odds per entry.)
    use_dir = cone_cos_tolerance >= 0
    use_healpix = use_dir and direction_bins == "healpix"

    # Q-side budget: compact the first qb valid second-side pairs —
    # or, under q_uniform (scale mode), a rotated strided walk over the
    # whole buffer (see the docstring: the valid prefix of a raw pair
    # enumeration has no first-endpoint diversity)
    qb = min(q_budget or 8192, k2)
    if q_uniform:
        # stride must be coprime with k2 or the walk's period collapses:
        # at power-of-two nq (k2 = nq^2) the raw k2 // qb shares a large
        # factor with k2 and sel2 % nq takes only nq/gcd distinct values
        # — every probe pair ends at a handful of second endpoints,
        # reintroducing the endpoint starvation q_uniform exists to fix.
        # k2 and qb are static shapes, so the adjustment is host-side.
        stride = max(k2 // qb, 1)
        while _math.gcd(stride, k2) != 1:
            stride += 1
        rot = (jnp.int32(0) if q_rot is None
               else jnp.asarray(q_rot, jnp.int32))
        sel2 = (jnp.arange(qb, dtype=jnp.int32) * stride + rot) % k2
        sel2_valid = valid2[sel2]
        n2 = jnp.sum(valid2, dtype=jnp.int32)
    else:
        sel2, sel2_valid, n2 = masked_indices(valid2, qb)
    if allpairs_cols and pairs2 is None:
        pairs2b = jnp.stack([sel2 // row_cap, sel2 % row_cap],
                            axis=-1).astype(jnp.int32)         # (QB, 2)
    elif pairs2.ndim == 1:
        # cols-only row-cap layout: slot s = (s // row_cap, cols[s]);
        # the full (K2, 2) pack never materializes — only the QB rows
        # actually probed are assembled here
        pairs2b = jnp.stack([sel2 // row_cap, pairs2[sel2]],
                            axis=-1).astype(jnp.int32)         # (QB, 2)
    else:
        pairs2b = pairs2[sel2]                                 # (QB, 2)
    a2 = pos[pairs2b[:, 0]]
    b2 = pos[pairs2b[:, 1]]
    e2 = a2 + invariant2 * (b2 - a2)                           # (QB, 3)

    # w^3 window cells per query (8 corners at the default cell = 2r);
    # [hq, hq+2] boundary queries (in packed key units, see below) find
    # both range ends. Caveat: a cell whose packed hash group is the
    # top one (0x7ffffffe) wraps to an empty range — that group already
    # holds the invalid-entry sentinel today, so nothing new is lost.
    base_cell = jnp.floor((e2 - r) / cell).astype(jnp.int32)   # (QB, 3)
    probe = base_cell[:, None, :] + jnp.asarray(_window_offsets(w))
    hq_flat = _cell_hash(probe).reshape(-1)                    # (QB*w^3,)
    n2q = hq_flat.shape[0]

    # Sort the TABLE ONLY, then locate each probe's group range with a
    # vectorized binary search: log2(k1) rounds of (2*QB*w^3)-sized
    # gathers against the sorted keys. This replaced the earlier fused
    # design (boundary queries folded into the sort, ranges rebuilt
    # with a reverse-cummin + table-rank cumsum + scatter): the fused
    # form's range machinery alone measured 0.47 s/step at k1=5.2M
    # (tools/join_phase_micro.py prefix deltas) while the search is a
    # few ms of small gathers — and dropping the interleaved query
    # rows shrinks the sort itself, removes the low-bit query/table
    # tag, the in-window table-tag masking, and the rank translation.
    # Grouping still clears the hash's low bit (merges cells h and h^1
    # — a superset window, removed by the exact distance mask like any
    # other hash collision); sorted positions ARE table ranks, so
    # counts are direct differences.
    group1 = h1 & ~jnp.int32(1)            # sentinel 0x7fffffff -> ..fe
    sk, order = jax.lax.sort(
        (group1, jnp.arange(k1, dtype=jnp.int32)), num_keys=1)

    groupq = hq_flat & ~jnp.int32(1)
    vals = jnp.concatenate([groupq, groupq + 2])   # [lo targets, hi)

    # Bucket-accelerated range search (r5): a dense 2^16-bucket BLOCK
    # offset table over the sorted keys — bucket = the key's top 16
    # bits in unsigned order (monotone in signed order) — seeds each
    # probe's binary search inside its bucket, cutting the serial
    # gather rounds from log2(k1) (23 at nq=32768) toward log2(bucket
    # width). The table is built from a 64-STRIDED sample of the keys
    # (block-last keys): jb[m] = first 64-block whose last key reaches
    # bucket m, so the true boundary for any value of bucket b lies in
    # [64*jb[b], 64*jb[b+1] + 64]. Building from the sample keeps every
    # construction op at k1/64 elements — a first cut built the table
    # from the full key column and its masked_indices cumsum alone cost
    # 0.54 s/step at nq=32768, MORE than the rounds it saved
    # (tools/join5_micro.py); the sampled build is ~free.
    # Every seed is clamped to the start of the sentinel zone (invalid
    # rows, hash int32-max): without the clamp a probe whose cell
    # hashes into the TOP bucket would range over sentinel rows whose
    # clamped (row, 0) pair identities are real points never captured —
    # the one way a junk candidate could pass the exact distance mask.
    # (The old full search excluded them structurally.)
    MIN32 = jnp.int32(-2147483648)
    nblk = (k1 + 63) // 64
    sk_s = sk[63::64]                             # block-last keys
    if sk_s.shape[0] < nblk:                      # k1 % 64 != 0 tail
        sk_s = jnp.concatenate([sk_s, sk[-1:]])
    buck_s = jax.lax.shift_right_logical(sk_s ^ MIN32, 16)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), buck_s[1:] != buck_s[:-1]])
    fi, fv, _ = masked_indices(first, min(65536, nblk))
    tgt = jnp.where(fv, buck_s[fi], 65536)
    starts = jnp.full((65537,), nblk, jnp.int32).at[tgt].min(
        jnp.where(fv, fi, nblk), mode="drop")
    jb = jnp.flip(jax.lax.cummin(jnp.flip(starts)))
    slo = jnp.int32(0)
    shi = jnp.int32(k1)
    for _ in range(max(k1.bit_length(), 1)):       # scalar: ~free
        mid = (slo + shi) >> 1
        go = sk[jnp.minimum(mid, k1 - 1)] < jnp.int32(2147483646)
        slo = jnp.where(go, mid + 1, slo)
        shi = jnp.where(go, shi, mid)

    bq = jax.lax.shift_right_logical(vals ^ MIN32, 16)
    lo_b = jnp.minimum(64 * jb[bq], slo)
    hi_b = jnp.minimum(jnp.minimum(64 * jb[bq + 1] + 64, k1), slo)
    # Rounds cover buckets up to 2^rounds rows. A bucket's width is the
    # sum of its cells' table occupancies; a denser-than-2^rounds cell
    # leaves the search short of the group boundary, costing that probe
    # part of its L candidate slots — the same per-cell cap lottery the
    # join already lives with (lo never overshoots: junk slots below
    # the boundary are distance-masked, never false positives). At the
    # small k1 of the CPU parity tests rounds >= log2(k1), so results
    # there are bit-identical to the exhaustive search.
    rounds = min(max(k1.bit_length(), 1),
                 max(12, (k1 >> 16).bit_length() + 5))
    for _ in range(rounds):
        mid = (lo_b + hi_b) >> 1
        go = sk[jnp.minimum(mid, k1 - 1)] < vals
        lo_b = jnp.where(go, mid + 1, lo_b)
        hi_b = jnp.where(go, hi_b, mid)
    lo_c = lo_b[:n2q]                                          # (QB*w^3,)
    hi_all = lo_b[n2q:]

    # invalid slots beyond the live count probe garbage cells; zero them
    # so they neither emit candidates nor fake drop telemetry
    pvalid = jnp.repeat(sel2_valid, n_probe)
    counts = jnp.where(pvalid, jnp.maximum(hi_all - lo_c, 0), 0)
    hi_c = jnp.where(pvalid, hi_all, lo_c)
    total_cells = jnp.sum(counts, dtype=jnp.int32)

    if probe_budget is not None:
        # compact the probes that hit at least one table row; the
        # gather/validate volume below becomes (probe_budget, L)
        pmask = (hi_c > lo_c) & pvalid
        psel, psv, _ = masked_indices(pmask, probe_budget)
        lo_c = lo_c[psel]
        hi_c = jnp.where(psv, hi_c[psel], lo_c)
        qi = psel // n_probe                           # e2 row
        pvalid = psv
        kept_cells = jnp.sum(jnp.where(psv, counts[psel], 0),
                             dtype=jnp.int32)
        counts = jnp.where(psv, counts[psel], 0)
    else:
        qi = jnp.arange(qb * n_probe,
                        dtype=jnp.int32) // n_probe    # e2 row
        kept_cells = total_cells

    # up to L sorted-order slots per probe, laid out (L, PB): the LARGE
    # probe axis must be minor — a (PB, L=16) layout pads its minor dim
    # to the 128-lane width, an 8x tax on every gather below (measured
    # 667 -> 102 ms per 16-base toy-scale join, tools/join_micro_small).
    slot = lo_c[None, :] + jnp.arange(L, dtype=lo_c.dtype)[:, None]
    in_cell = (slot < hi_c[None, :]) & pvalid[None, :]        # (L, PB)
    slot = jnp.clip(slot, 0, k1 - 1)

    # candidate fetch: the slot's table index, then the pair identity
    # and its geometry recomputed from the small pos table — all
    # (L, PB)-sized element gathers. (A contiguous L-row dynamic-slice
    # per probe was tried here and is 12x SLOWER on TPU than the plain
    # gather — vmapped dynamic_slice lowers to gather-of-slices,
    # measured 1053 vs 86 ms at 65k probes x L=16.)
    # The table-only sort means slots within [lo, hi) are table rows by
    # construction — no tag masking needed.
    orid = jnp.minimum(order[slot], k1 - 1)                   # (L, PB)
    if row_cap is not None:
        trow = jnp.minimum(orid // row_cap, pos.shape[0] - 1)
    else:
        trow = rows1[orid]
    tcol = (orid % row_cap) if allpairs_cols else cols1[orid]

    # exact validation: invariant-point distance, then the direction
    # filter — both recomputed exactly (identical arithmetic to the
    # dense oracle; no quantized direction column)
    e2_c = e2[qi].T                                           # (3, PB)
    g = _e1_components(trow, tcol)
    d2 = sum((ec - e2_c[c][None, :]) ** 2
             for c, (_, _, ec) in enumerate(g))               # (L, PB)
    mask = in_cell & (d2 <= r * r)

    if use_dir or scale_band >= 0:
        d2v = b2 - a2
        dxc = [bc - ac for (ac, bc, _) in g]                  # (L, PB) x3
        n1g = jnp.maximum(jnp.sqrt(
            dxc[0] ** 2 + dxc[1] ** 2 + dxc[2] ** 2), 1e-30)
    if use_dir:
        dir2 = d2v / jnp.maximum(
            jnp.linalg.norm(d2v, axis=-1, keepdims=True), 1e-30)
    if scale_band >= 0:
        # similarity-mode scale-consistency gate (see the dense oracle's
        # docstring): |seg_ratio * len2 / len1 - 1| <= scale_band
        len2 = jnp.linalg.norm(d2v, axis=-1)                  # (QB,)
        rr = seg_ratio * len2[qi][None, :] / n1g              # (L, PB)
        mask &= jnp.abs(rr - 1.0) <= scale_band
    if use_healpix:
        circ = healpix_circle_pixels(
            dir2, base_cos_alpha, healpix_nside, healpix_samples)
        pix_cand = _healpix.ang2pix_ring(
            healpix_nside, dxc[2] / n1g,
            jnp.arctan2(dxc[1], dxc[0])).astype(jnp.int32)
        mask &= _healpix_membership(pix_cand, circ[qi][None, :, :])
    elif use_dir:
        d2q = dir2[qi]                                        # (PB, 3)
        cos12 = (dxc[0] * d2q[None, :, 0] + dxc[1] * d2q[None, :, 1]
                 + dxc[2] * d2q[None, :, 2]) / n1g
        mask &= jnp.abs(cos12 - base_cos_alpha) <= cone_cos_tolerance

    sel, valid, count = masked_indices_2d(mask, capacity)
    orid_sel = orid.reshape(-1)[sel]
    if allpairs_cols:
        q1 = jnp.stack([orid_sel // row_cap, orid_sel % row_cap],
                       axis=-1)
    elif row_cap is not None:
        # derive (row, col) without touching the (K1, 2) pairs tensor
        # (a padded-minor-dim layout hazard at table sizes)
        q1 = jnp.stack([orid_sel // row_cap, cols1[orid_sel]], axis=-1)
    else:
        q1 = pairs1[orid_sel]
    q2 = pairs2b[qi[sel % qi.shape[0]]]
    quads = jnp.concatenate([q1, q2], axis=-1)
    # overflow accounting: per-cell cap drops and whole cells lost to
    # the probe budget stay in ``dropped`` (genuine capacity pressure);
    # pairs beyond the Q budget (x n_probe = w^3 probe units) are the
    # INTENTIONAL per-trial subsampling volume and are reported
    # separately — folding them together swamps the cap-pressure signal
    # the telemetry exists to expose (in allpairs scale mode the
    # subsample term alone is ~w^3 * (nq^2 - qb) per base per step).
    dropped = jnp.sum(jnp.maximum(counts - L, 0), dtype=jnp.int32)
    dropped += total_cells - kept_cells
    q_subsampled = n_probe * jnp.maximum(n2 - qb, 0)
    return quads.astype(jnp.int32), valid, count, dropped, q_subsampled
