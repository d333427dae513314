"""Output-sensitive pair extraction: sorted cell-pair distance table.

The TPU-native re-design of the reference's sphere-shell rasterization
engine (``IntersectionFunctor``, ref:src/super4pcs/accelerators/
pairExtraction/intersectionFunctor.h:105-233): the reference prunes the
O(n^2) pair space with an adaptive 2^d-tree so a scalar CPU touches only
cells near some sphere shell. Here the same pruning is one range query:

- **once per run** (Q is fixed for the whole search) the Q samples are
  bucketed into a voxel grid (cell size auto-fit to a cell budget), and
  the distances between ALL ordered cell-center pairs are sorted on
  device into one global table. ~O(M^2 log M) once, M = occupied cells;
- **per base edge** the pairs at distance ``d +- eps`` live in cell
  pairs whose center distance is in ``d +- (eps + sqrt(3) g)`` — ONE
  CONTIGUOUS RANGE of the sorted table, found by binary search (the
  per-step cost is output-sensitive: two log2(M^2) probes plus work
  proportional to the cell pairs actually in the band);
- each in-band cell pair expands to its members' point pairs via a
  TWO-LEVEL compact expansion (see below), validated with the EXACT
  pair predicate (distance band + normal/color/translation/angle
  filters — identical semantics to ops/pairs.py, pinned by a
  set-equality parity test vs extract_pairs).

Two-level capture (the r3 redesign). The naive expansion — ``pc^2``
member slots per captured cell pair — wasted ~95% of its slots on
padding at mean occupancy << pc, and its contiguous band window meant
that under band overflow each trial examined only a razor-thin
center-distance slice (measured LCP 0.028 vs rowcap's 0.849 at
nq=32768: true counterpart pairs were simply never captured). Now:

1. the window takes ``cell_pair_cap`` band entries spread UNIFORMLY
   over the whole band (a strided walk, order-scrambled by a coprime
   multiplier, rotated per trial by ``rot_offset``), and
2. the expansion gives every window entry a FIXED budget of
   ``expand_cap // cell_pair_cap`` candidate slots, enumerated inside
   the entry by div/mod over its occupancy (rotated per trial, exact
   per-entry overflow counting). Sizing the budget at ~2x the mean
   occupancy product keeps padding bounded (~2x, vs pc^2/mean_prod
   ~20x for the naive grid) while using ONLY static index arithmetic —
   an exact prefix-sum enumeration (scatter + cummax/cumsum segment
   map over the flat candidate axis) had zero padding but its
   E-length scans measured 18.3 s/step vs 5.3 for this form at
   nq=32768 on v5 lite: large cumulative ops are multi-pass over HBM
   on TPU and swamp the padding they save.

Static-shape discipline: every drop (band entries beyond the window,
candidates beyond expand_cap, validated hits beyond capacity,
member-cap overflow) is counted in candidate-pair units like the grid
join's cell_dropped telemetry. All caps generous by default — at
reference operating points the band fits entirely and the expansion
covers it exactly (the parity tests pin set equality with dense).

Why this beats the dense/rowcap engines at scale: their mask evaluation
is Theta(nq^2) per base edge regardless of output size (fine to
nq ~ 8k, ~16x/step more FLOPs at 32k); here a step's extraction work
scales with the TRUE number of near-band candidates. The once-per-run
table sort is amortized over every step of the search.
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .masking import masked_indices
from .pairs import PairFilterConfig

_SQRT3 = math.sqrt(3.0)


@dataclasses.dataclass(frozen=True)
class BandIndex:
    """Once-per-run spatial index over the (centered) Q samples.

    Registered as a jax PYTREE (array leaves + static meta), so a
    batched form — every leaf carrying a leading pairs axis — vmaps
    straight through ``extract_pairs_banded`` (the banded x batch
    composition of parallel/batch.py; see
    :func:`build_batched_band_index`).

    Array leaves:
      members:     (M_cap, pc) int32 — point ids per occupied cell,
                   padded with ``n`` (callers clamp; valid via occ).
      occ:         (M_cap,) int32 — true member count per cell (may
                   exceed pc; the excess is counted in member_dropped).
      centers:     (M_cap, 3) f32 — geometric cell centers (occupied
                   cells; padding rows carry huge distinct coordinates
                   so their pair distances sort to the table's tail).
      sorted_pair: (M_cap * M_cap,) int32 — ordered cell-pair ids
                   (a * M_cap + b) sorted by ascending center distance.
                   Distances are NOT stored: binary-search probes
                   recompute them from ``centers`` (halves the table's
                   HBM footprint; the search does ~2 log2(M^2) probes).
      g:           f32 scalar — cell size (a leaf so a batch can carry
                   one per pair).
    Static meta:
      m: table stride (padded cell count M_cap); m_real: occupied cell
      count; n: point count; pc: member slots per cell;
      member_dropped: points beyond the pc member cap (whole run).
    """
    members: jnp.ndarray
    occ: jnp.ndarray
    centers: jnp.ndarray
    sorted_pair: jnp.ndarray
    g: jnp.ndarray
    m: int
    n: int
    pc: int
    member_dropped: int
    m_real: int = 0


jax.tree_util.register_dataclass(
    BandIndex,
    data_fields=("members", "occ", "centers", "sorted_pair", "g"),
    meta_fields=("m", "n", "pc", "member_dropped", "m_real"))


def _host_bucket(q_pos: np.ndarray, delta: float, cell_budget: int):
    """Voxel-bucket the samples on host (cheap): the g-doubling fit to
    the cell budget, unique cells, member ordering, geometric centers."""
    q = np.asarray(q_pos, np.float32)
    g = 2.0 * float(delta)
    for _ in range(40):
        cells = np.floor(q / g).astype(np.int64)
        # pack to a unique key (same packed-int scheme as the sampler)
        mn = cells.min(axis=0)
        c = cells - mn
        span = int(c.max()) + 2
        key = (c[:, 0] * span + c[:, 1]) * span + c[:, 2]
        uniq, inv_idx, counts = np.unique(
            key, return_inverse=True, return_counts=True)
        if len(uniq) <= cell_budget:
            break
        g *= 2.0
    order = np.argsort(inv_idx, kind="stable")
    starts = np.zeros(len(uniq), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    # geometric centers of occupied cells (original coordinates)
    cell_coords = np.stack([(uniq // (span * span)),
                            (uniq // span) % span,
                            uniq % span], axis=1).astype(np.float64)
    centers = ((cell_coords + mn + 0.5) * g).astype(np.float32)
    return g, counts, order, starts, centers


def _device_sort_table(centers: np.ndarray) -> jnp.ndarray:
    """All ordered cell-pair center distances, sorted ascending,
    carrying only the packed pair id (distance recomputed on probe)."""
    m_cap = centers.shape[0]
    d_centers = jnp.asarray(centers)

    @jax.jit
    def _sort_table(cen):
        d2 = (jnp.sum(cen * cen, -1)[:, None]
              + jnp.sum(cen * cen, -1)[None, :]
              - 2.0 * jnp.einsum('id,jd->ij', cen, cen,
                                 precision='highest'))
        d2 = jnp.maximum(d2, 0.0).reshape(-1)
        ids = jnp.arange(m_cap * m_cap, dtype=jnp.int32)
        _, pair = jax.lax.sort((d2, ids), num_keys=1)
        return pair

    return d_centers, _sort_table(d_centers)


def build_band_index(q_pos: np.ndarray, delta: float,
                     cell_budget: int = 8192,
                     pc: int | None = None,
                     m_pad: int | None = None,
                     n_override: int | None = None) -> BandIndex:
    """Build the index. Host does the (cheap) bucketing; the O(M^2)
    distance table is sorted on device.

    ``cell_budget``: static cap on occupied cells — the cell size g
    starts at 2 * delta (the sampler guarantees >= delta point spacing,
    so occupancy stays small) and doubles until the occupied count
    fits. ``pc``: member slots per cell (default: the observed max
    occupancy, capped at 32). ``m_pad`` / ``n_override``: pad the cell
    table to a shared shape / clamp target, so a batch of indexes can
    stack (padding cells have occ 0 and huge DISTINCT centers — their
    pair distances sort to the tail, past every band; a pad-pad pair is
    never at distance 0, so it cannot alias a short base edge).
    """
    q = np.asarray(q_pos, np.float32)
    n = int(n_override) if n_override is not None else q.shape[0]
    g, counts, order, starts, centers = _host_bucket(
        q, delta, cell_budget)
    m = len(counts)
    m_cap = int(m_pad) if m_pad is not None else m
    if m_cap < m:
        raise ValueError(f"m_pad ({m_cap}) < occupied cells ({m})")

    if pc is None:
        pc = int(min(max(counts.max(), 1), 32))
    members = np.full((m_cap, pc), n, np.int32)
    occ = np.zeros(m_cap, np.int32)
    occ[:m] = counts.astype(np.int32)
    member_dropped = int(np.maximum(counts - pc, 0).sum())
    take = np.minimum(counts, pc)
    for s in range(pc):
        rows = np.zeros(m_cap, bool)
        rows[:m] = take > s
        members[rows, s] = order[starts[take > s] + s]

    if m_cap > m:
        # distinct far-away padding centers: pairwise distances among
        # pads and to real cells are ~1e12+, beyond any band query
        pad = 1.0e12 + 1.0e6 * np.arange(m_cap - m, dtype=np.float64)
        centers = np.concatenate(
            [centers, np.stack([pad, pad, pad], 1).astype(np.float32)])

    d_centers, sorted_pair = _device_sort_table(centers)
    return BandIndex(members=jnp.asarray(members), occ=jnp.asarray(occ),
                     centers=d_centers, sorted_pair=sorted_pair,
                     g=jnp.float32(g), m=m_cap, n=n, pc=pc,
                     member_dropped=member_dropped, m_real=m)


def build_batched_band_index(q_pos_list, delta: float,
                             cell_budget: int = 8192) -> BandIndex:
    """Per-pair band indexes padded to one shared shape and stacked
    along a leading pairs axis — the vmappable form register_batch
    feeds through the step's ``band`` argument (VERDICT r3 #4: the
    banded engine composed with batch mode; the reference's one scaling
    mechanism works for every caller,
    ref:src/super4pcs/algorithms/super4pcs.h:33-45).

    ``q_pos_list``: per-pair (centered, possibly sentinel-padded) Q
    positions, all with the same row count (the batch pads first).
    Sentinel rows (|x| >= ops.lcp.Q_PAD) are EXCLUDED from the index —
    they can never appear in a member list, so banded extraction never
    emits a sentinel pair (stronger than the rowcap path's "sentinels
    waste capacity" caveat; also keeps the host bucketing's packed
    int64 voxel keys finite). member_dropped is summed over pairs.
    """
    from .lcp import Q_PAD
    qs = [np.asarray(q, np.float32) for q in q_pos_list]
    n = qs[0].shape[0]
    assert all(q.shape[0] == n for q in qs), "batch must pad Q first"
    reals = [q[np.abs(q[:, 0]) < Q_PAD] for q in qs]
    # point ids must refer to the PADDED row space (extraction gathers
    # from the padded Q arrays): bucket the real prefix, clamp to n
    assert all(len(r) > 0 for r in reals), "all-sentinel Q cloud"
    # cheap host pre-pass to find the shared padded shape
    buckets = [_host_bucket(q, delta, cell_budget) for q in reals]
    m_cap = max(len(c) for (_, c, _, _, _) in buckets)
    pc_cap = int(min(max(max(int(c.max()) for (_, c, _, _, _) in buckets),
                         1), 32))
    idxs = [build_band_index(q, delta, cell_budget, pc=pc_cap,
                             m_pad=m_cap, n_override=n) for q in reals]
    # static meta is part of the treedef — normalize the per-pair
    # fields before stacking (restored as batch aggregates after)
    dropped = sum(i.member_dropped for i in idxs)
    m_real = max(i.m_real for i in idxs)
    idxs = [dataclasses.replace(i, member_dropped=0, m_real=0)
            for i in idxs]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *idxs)
    return dataclasses.replace(
        stacked, member_dropped=dropped, m_real=m_real)


def _pair_dist(idx: BandIndex, t):
    """Center distance of table entries ``t`` (recomputed, not stored)."""
    pid = idx.sorted_pair[t]
    a = pid // idx.m
    b = pid % idx.m
    return jnp.linalg.norm(idx.centers[a] - idx.centers[b], axis=-1)


def _searchsorted_table(idx: BandIndex, value):
    """First table position whose center distance >= value (binary
    search over the sorted table, distance recomputed per probe)."""
    total = idx.m * idx.m
    lo = jnp.int32(0)
    hi = jnp.int32(total)
    steps = max(int(math.ceil(math.log2(max(total, 2)))) + 1, 1)
    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        below = _pair_dist(idx, mid) < value
        return (jnp.where(below, mid + 1, lo), jnp.where(below, hi, mid))
    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _pick(tab, slot, mode):
    """Route candidate slots to per-window member data: ``tab`` is a
    (pc, CP) column table gathered ONCE per window entry; ``slot`` is
    the (es, CP) member-slot index of each candidate. The whole point
    of this indirection is gather economy: the v5 measurement (direct
    HBM gathers at the candidate level, 8 per slot) ran the nq=32768
    extraction at 24.9 s/step vs 5.3 s for the broadcast form — random
    HBM gathers are the single most expensive primitive on TPU, so we
    gather at the (pc, CP) member level (~pc/es_fill times fewer) and
    expand with VPU-friendly selects that XLA fuses.

    Modes (SUPER4PCS_TPU_BAND_PICK, measured on v5 lite — see
    BASELINE.md r3 banded table): "where" = a pc-deep fused select
    chain; "take" = take_along_axis over the pc axis (XLA decides the
    lowering); "flat" = the direct HBM gather (kept as the baseline)."""
    if mode == "flat":  # caller passed the full (n,) column as tab
        return tab[slot]
    if mode == "take":
        return jnp.take_along_axis(tab, slot, axis=0)
    out = jnp.broadcast_to(tab[0][None, :], slot.shape)
    for k in range(1, tab.shape[0]):
        out = jnp.where(slot == k, tab[k][None, :], out)
    return out


def _pick_mode() -> str:
    return os.environ.get("SUPER4PCS_TPU_BAND_PICK", "where")


def _scramble_multiplier(cp: int) -> int:
    """Odd multiplier ~512, coprime with ``cp``: ``(s * a) % cp`` is a
    bijection of the window slots whose prefixes are spread uniformly
    (stride-a progressions), and ``s * a`` stays < 2^31 for any
    realistic window (cp <= 2^21). Host-side, static per trace."""
    a = 521 if cp > 1024 else max((cp // 2) | 1, 1)
    while math.gcd(a, cp) != 1:
        a += 2
    return a


def extract_pairs_banded(
    idx: BandIndex,
    pos, normal, rgb,
    base_pos, base_norm, base_rgb,
    edge0: int, edge1: int,
    pair_distance_epsilon,
    cfg: PairFilterConfig,
    cell_pair_cap: int,
    rot_offset=None,
    capacity: int | None = None,
    expand_cap: int | None = None,
):
    """Extract ordered pairs matching one base edge through the band
    index (two-level compact capture — see the module docstring).

    Window: ``cell_pair_cap`` band entries, spread uniformly over the
    whole band when it overflows (strided walk, rotated per trial by
    ``rot_offset``), order-scrambled so expansion prefix-cuts sample
    the band uniformly. Expansion: ``expand_cap`` flat candidate slots
    (default: every member pair of the window, i.e. exact) assigned to
    real (u, v) member pairs by prefix-sum + searchsorted — no padding
    slots. Returns ``(pairs, valid, count, dropped)``; with
    ``capacity`` the validated hits are compacted to a
    ``(capacity, 2)`` buffer (extract_pairs' contract), without it the
    raw ``(expand_cap, 2)`` slots + mask are returned. ``count`` is
    the number of validated hits among examined candidates; ``dropped``
    counts, in candidate-pair units: band entries beyond the window
    (x their mean occupancy product), real candidates beyond
    expand_cap, and validated hits beyond capacity. The run-constant
    member-cap loss is reported by the index build.
    """
    b0p, b1p = base_pos[edge0], base_pos[edge1]
    pair_distance = jnp.linalg.norm(b0p - b1p)
    pair_normals_angle = jnp.linalg.norm(
        base_norm[edge0] - base_norm[edge1])

    # conservative cell-level band: any point pair at distance within
    # d +- eps lives in a cell pair whose center distance is within
    # d +- (eps + sqrt(3) g). With the distance filter OFF
    # (estimate_scale mode) every cell pair qualifies — the band is the
    # whole table (the engine degenerates to rotated random capture;
    # the matcher prefers the rowcap engine there, see
    # matcher.resolve_pair_engine).
    if cfg.use_distance_filter:
        slack = pair_distance_epsilon + _SQRT3 * idx.g
        lo = _searchsorted_table(idx, pair_distance - slack)
        hi = _searchsorted_table(idx, pair_distance + slack)
    else:
        lo = jnp.int32(0)
        hi = jnp.int32(idx.m * idx.m)
    span = hi - lo
    span_m = jnp.maximum(span, 1)

    cp = cell_pair_cap
    s = jnp.arange(cp, dtype=jnp.int32)
    if rot_offset is None:
        off = jnp.int32(0)
    else:
        off = jnp.asarray(rot_offset, jnp.int32)
    # scrambled slot -> band position: p is a bijection of [0, cp);
    # live slots are scattered (their prod is 0 below, so dead slots
    # consume no expansion budget)
    p = (s * _scramble_multiplier(cp)) % cp
    # under band overflow, walk the whole band with stride span//cp
    # (uniform coverage; the old contiguous window examined one thin
    # center-distance slice per trial — the measured quality collapse)
    stride = jnp.maximum(span // cp, 1)
    rel = (off % span_m + p * stride) % span_m
    take = lo + jnp.where(span <= cp, jnp.minimum(p, span_m - 1), rel)
    take = jnp.clip(take, 0, idx.m * idx.m - 1)
    live = p < jnp.minimum(span, cp)

    pid = idx.sorted_pair[take]                      # (CP,)
    ca = jnp.where(live, pid // idx.m, 0)
    cb = jnp.where(live, pid % idx.m, 0)

    pc = idx.pc
    occ_u = jnp.minimum(idx.occ[ca], pc)             # (CP,)
    occ_v = jnp.minimum(idx.occ[cb], pc)

    # fixed-budget expansion: each window entry gets ``es`` candidate
    # slots; slot q of an entry maps to member pair (q // occ_v,
    # q % occ_v), rotated per trial WITHIN the entry (a bijection of
    # [0, prod) when it fits), so dense entries lose a decorrelated —
    # and exactly counted — subset instead of always their high-(u, v)
    # corner. All (es, CP) tensors keep the LARGE axis minor (see
    # ops/congruent.py's lane-layout design note).
    prod = jnp.where(live, occ_u * occ_v, 0)         # (CP,)
    if expand_cap is None:
        expand_cap = cp * pc * pc                    # exact: es = pc^2
    es = max(expand_cap // cp, 1)
    q0 = jnp.arange(es, dtype=jnp.int32)[:, None]    # (es, 1)
    prod_m = jnp.maximum(prod, 1)[None, :]           # (1, CP)
    evalid = q0 < prod[None, :]                      # (es, CP)
    qq = jnp.where(evalid, (q0 + off) % prod_m, 0)
    ov = jnp.maximum(occ_v, 1)[None, :]
    u = qq // ov                                     # (es, CP) slot in cell
    v = qq % ov

    # member-level gather, slot-level select (see _pick): the point
    # ids and any point columns the predicate needs are gathered from
    # HBM once per (member slot, window entry) — pc * CP elements —
    # and the es * CP candidate slots route into those small tables
    # with fused selects.
    mode = _pick_mode()
    if mode == "flat":
        members_flat = jnp.minimum(idx.members.reshape(-1), idx.n - 1)
        iu = members_flat[(ca * pc)[None, :] + u]    # (es, CP) point ids
        iv = members_flat[(cb * pc)[None, :] + v]
        col_u = lambda col: col[iu]
        col_v = lambda col: col[iv]
    else:
        mu = jnp.minimum(idx.members[ca], idx.n - 1).T   # (pc, CP)
        mv = jnp.minimum(idx.members[cb], idx.n - 1).T
        iu = _pick(mu, u, mode)                      # (es, CP) point ids
        iv = _pick(mv, v, mode)
        col_u = lambda col: _pick(col[mu], u, mode)
        col_v = lambda col: _pick(col[mv], v, mode)
    mask = evalid & (iu != iv)

    # exact pair predicate on (es, CP) planes (per-coordinate columns
    # — see ops/congruent.py's lane-layout design note)
    xu = [col_u(pos[:, c]) for c in range(3)]
    xv = [col_v(pos[:, c]) for c in range(3)]
    d2 = sum((xv[c] - xu[c]) ** 2 for c in range(3))
    dist = jnp.sqrt(d2)
    if cfg.use_distance_filter:
        mask &= jnp.abs(dist - pair_distance) <= pair_distance_epsilon

    if cfg.max_normal_difference > 0:
        nu = [col_u(normal[:, c]) for c in range(3)]
        nv = [col_v(normal[:, c]) for c in range(3)]
        both = ((sum(nu[c] ** 2 for c in range(3)) > 0)
                & (sum(nv[c] ** 2 for c in range(3)) > 0))
        fa = jnp.sqrt(sum((nu[c] - nv[c]) ** 2 for c in range(3)))
        sa = jnp.sqrt(sum((nu[c] + nv[c]) ** 2 for c in range(3)))
        nd = jnp.minimum(jnp.abs(fa - pair_normals_angle),
                         jnp.abs(sa - pair_normals_angle))
        thr = 0.5 * cfg.max_normal_difference * math.pi / 180.0
        mask &= jnp.where(both, nd <= thr, True)

    if cfg.max_color_distance > 0:
        cu = [col_u(rgb[:, c]) for c in range(3)]
        cv = [col_v(rgb[:, c]) for c in range(3)]
        base_has = (base_rgb[edge0][0] >= 0) & (base_rgb[edge1][0] >= 0)
        use_rgb = (cu[0] >= 0) & (cv[0] >= 0) & base_has
        du = jnp.sqrt(sum((cu[c] - base_rgb[edge0][c]) ** 2
                          for c in range(3)))
        dv = jnp.sqrt(sum((cv[c] - base_rgb[edge1][c]) ** 2
                          for c in range(3)))
        good = ((du < cfg.max_color_distance)
                & (dv < cfg.max_color_distance))
        mask &= jnp.where(use_rgb, good, True)

    if cfg.max_translation_distance > 0:
        tu = jnp.sqrt(sum((xu[c] - b0p[c]) ** 2 for c in range(3)))
        tv = jnp.sqrt(sum((xv[c] - b1p[c]) ** 2 for c in range(3)))
        mask &= ((tu < cfg.max_translation_distance)
                 & (tv < cfg.max_translation_distance))

    if cfg.max_angle > 0:
        seg1 = (b1p - b0p) / jnp.linalg.norm(b1p - b0p)
        cosang = sum((xv[c] - xu[c]) * seg1[c]
                     for c in range(3)) / jnp.maximum(dist, 1e-30)
        cosang = jnp.clip(cosang, -1.0, 1.0)
        mask &= jnp.arccos(cosang) <= cfg.max_angle * math.pi / 180.0

    count = jnp.sum(mask, dtype=jnp.int32)
    if capacity is not None:
        flat = mask.reshape(-1)
        sel, valid, _ = masked_indices(flat, capacity)
        iu_f = iu.reshape(-1)
        iv_f = iv.reshape(-1)
        pairs = jnp.stack([jnp.where(valid, iu_f[sel], 0),
                           jnp.where(valid, iv_f[sel], 0)],
                          axis=-1).astype(jnp.int32)
        cap_dropped = jnp.maximum(count - capacity, 0)
    else:
        pairs = jnp.stack([iu.reshape(-1), iv.reshape(-1)],
                          axis=-1).astype(jnp.int32)
        valid = mask.reshape(-1)
        cap_dropped = jnp.int32(0)

    # overflow telemetry, in candidate-pair units (the true-hit subset
    # of unexamined candidates is unknowable without evaluating them —
    # same convention as the join's cell_dropped): band entries beyond
    # the window approximated by the mean kept occupancy product (f32
    # to dodge int32 overflow at large tables), plus the EXACT count of
    # candidates beyond each entry's expansion budget, plus validated
    # hits beyond capacity.
    over = jnp.maximum(span - cp, 0)
    mean_prod = (jnp.sum(prod).astype(jnp.float32)
                 / jnp.maximum(jnp.sum(live), 1))
    band_unexamined = jnp.minimum(
        over.astype(jnp.float32) * mean_prod, 2.0e9).astype(jnp.int32)
    entry_over = jnp.sum(jnp.maximum(prod - es, 0), dtype=jnp.int32)
    dropped = band_unexamined + entry_over + cap_dropped
    return pairs, valid, count, dropped


def extract_pairs_banded_both(
    idx: BandIndex,
    pos, normal, rgb,
    base_pos, base_norm, base_rgb,
    pair_distance_epsilon,
    cfg: PairFilterConfig,
    cell_pair_cap: int,
    col_offset=None,
    capacity: int | None = None,
    expand_cap: int | None = None,
):
    """Both base edges through the band index (the _extract_both
    contract of matcher._build_try_base)."""
    out = []
    for (e0, e1) in ((0, 1), (2, 3)):
        out.append(extract_pairs_banded(
            idx, pos, normal, rgb, base_pos, base_norm, base_rgb,
            e0, e1, pair_distance_epsilon, cfg, cell_pair_cap,
            rot_offset=col_offset, capacity=capacity,
            expand_cap=expand_cap))
    return tuple(out)
