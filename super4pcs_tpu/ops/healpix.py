"""Jittable HEALPix ring-scheme pixelization.

The reference's deprecated ``IndexedNormalHealSet`` bins pair directions
into HEALPix pixels via the vendored chealpix C library
(ref:src/super4pcs/accelerators/normalHealSet.h:102-106,
3rdparty/chealpix — only ``vec2pix_ring`` / ``nside2npix`` are used).
This is a from-scratch implementation of the public HEALPix ring
pixelization (Górski et al. 2005, ApJ 622) as pure jax arithmetic, so
direction binning can run on device. Kept for feature parity; the
default congruent join uses exact cone masks instead (the reference
itself disables the HealSet by default — "slows down the approach",
ref:CHANGELOG V1.1.0).

All functions are elementwise over leading batch dims and jittable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def nside2npix(nside: int) -> int:
    """Total pixels of an nside tessellation (ref API chealpix.h:80)."""
    return 12 * nside * nside


def ang2pix_ring(nside: int, z, phi):
    """Ring-scheme pixel of direction(s) given z=cos(theta), phi."""
    z = jnp.asarray(z, jnp.float32)
    phi = jnp.asarray(phi, jnp.float32)
    two_pi = 2.0 * np.pi
    tt = jnp.mod(phi, two_pi) * (2.0 / np.pi)        # in [0, 4)
    za = jnp.abs(z)

    # --- equatorial belt: |z| <= 2/3 ---
    temp1 = nside * (0.5 + tt)
    temp2 = nside * (z * 0.75)
    jp = jnp.floor(temp1 - temp2).astype(jnp.int32)  # ascending edge
    jm = jnp.floor(temp1 + temp2).astype(jnp.int32)  # descending edge
    ir = nside + 1 + jp - jm                          # ring 1..2n+1
    kshift = 1 - (ir & 1)
    ip = (jp + jm - nside + kshift + 1) // 2
    ip = jnp.mod(ip, 4 * nside)
    ncap = 2 * nside * (nside - 1)
    pix_eq = ncap + (ir - 1) * (4 * nside) + ip

    # --- polar caps: |z| > 2/3 ---
    tp = tt - jnp.floor(tt)
    tmp = nside * jnp.sqrt(jnp.maximum(3.0 * (1.0 - za), 0.0))
    jp_c = jnp.floor(tp * tmp).astype(jnp.int32)
    jm_c = jnp.floor((1.0 - tp) * tmp).astype(jnp.int32)
    ir_c = jp_c + jm_c + 1                            # ring counted from pole
    ip_c = jnp.floor(tt * ir_c).astype(jnp.int32)
    ip_c = jnp.mod(ip_c, 4 * ir_c)
    pix_north = 2 * ir_c * (ir_c - 1) + ip_c
    pix_south = nside2npix(nside) - 2 * ir_c * (ir_c + 1) + ip_c
    pix_cap = jnp.where(z > 0, pix_north, pix_south)

    return jnp.where(za <= 2.0 / 3.0, pix_eq, pix_cap).astype(jnp.int32)


def vec2pix_ring(nside: int, vec):
    """Ring-scheme pixel of 3D direction(s) ``vec`` (..., 3)
    (ref API chealpix.h:97)."""
    vec = jnp.asarray(vec, jnp.float32)
    vlen = jnp.linalg.norm(vec, axis=-1)
    z = vec[..., 2] / jnp.maximum(vlen, 1e-30)
    phi = jnp.arctan2(vec[..., 1], vec[..., 0])
    return ang2pix_ring(nside, z, phi)


def pix2vec_ring(nside: int, ipix):
    """Center direction of ring-scheme pixel(s) — the inverse map, used
    to validate the pixelization round-trip."""
    ipix = jnp.asarray(ipix, jnp.int32)
    npix = nside2npix(nside)
    ncap = 2 * nside * (nside - 1)

    # north cap
    iring_n = ((1 + jnp.sqrt(1.0 + 2.0 * ipix)) / 2).astype(jnp.int32)
    # refine (integer sqrt edge cases)
    iring_n = jnp.where(2 * iring_n * (iring_n - 1) > ipix,
                        iring_n - 1, iring_n)
    iring_n = jnp.where(2 * iring_n * (iring_n + 1) <= ipix,
                        iring_n + 1, iring_n)
    iphi_n = ipix - 2 * iring_n * (iring_n - 1)
    z_n = 1.0 - (iring_n * iring_n) / (3.0 * nside * nside)
    phi_n = (iphi_n + 0.5) * np.pi / (2.0 * iring_n)

    # equatorial belt
    ipe = ipix - ncap
    iring_e = ipe // (4 * nside) + nside
    iphi_e = jnp.mod(ipe, 4 * nside)
    # rings where (iring + nside) is odd are unshifted; even rings sit
    # half a pixel east (Gorski et al. 2005, ring scheme)
    fodd = jnp.where(jnp.mod(iring_e + nside, 2) == 1, 0.0, 0.5)
    z_e = (2.0 * nside - iring_e) * 2.0 / (3.0 * nside)
    phi_e = (iphi_e + fodd) * np.pi / (2.0 * nside)

    # south cap
    ips = npix - 1 - ipix
    iring_s = ((1 + jnp.sqrt(1.0 + 2.0 * ips)) / 2).astype(jnp.int32)
    iring_s = jnp.where(2 * iring_s * (iring_s - 1) > ips,
                        iring_s - 1, iring_s)
    iring_s = jnp.where(2 * iring_s * (iring_s + 1) <= ips,
                        iring_s + 1, iring_s)
    iphi_s = ips - 2 * iring_s * (iring_s - 1)
    z_s = -1.0 + (iring_s * iring_s) / (3.0 * nside * nside)
    phi_s = (4.0 * iring_s - iphi_s - 0.5) * np.pi / (2.0 * iring_s)

    in_ncap = ipix < ncap
    in_scap = ipix >= npix - ncap
    z = jnp.where(in_ncap, z_n, jnp.where(in_scap, z_s, z_e))
    phi = jnp.where(in_ncap, phi_n, jnp.where(in_scap, phi_s, phi_e))
    st = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), z], axis=-1)
