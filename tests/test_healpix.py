"""HEALPix ring pixelization properties (the optional direction-bin
variant, ref:accelerators/normalHealSet.h + 3rdparty/chealpix).

No healpy oracle is available; validated through the scheme's defining
properties: pixel-count bounds, equal-area occupancy, round-trip angular
error within the pixel radius, and known axis pixels."""

import numpy as np
import jax.numpy as jnp

from super4pcs_tpu.ops import healpix


def random_dirs(rng, n):
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


def test_bounds_and_coverage(rng):
    for nside in (1, 2, 4, 8):
        npix = healpix.nside2npix(nside)
        pix = np.asarray(healpix.vec2pix_ring(nside, random_dirs(rng, 20000)))
        assert pix.min() >= 0 and pix.max() < npix
        # equal-area tessellation: uniform directions cover every pixel
        counts = np.bincount(pix, minlength=npix)
        assert (counts > 0).all()
        # occupancy within 5x of uniform on 20k draws
        assert counts.max() < 5 * 20000 / npix


def test_roundtrip_within_pixel_radius(rng):
    nside = 8
    dirs = random_dirs(rng, 5000)
    pix = healpix.vec2pix_ring(nside, dirs)
    centers = np.asarray(healpix.pix2vec_ring(nside, pix))
    cosang = (dirs * centers).sum(axis=1).clip(-1, 1)
    ang = np.arccos(cosang)
    # max pixel circumradius ~ sqrt(4pi/npix) * ~1.4
    max_rad = 1.5 * np.sqrt(4 * np.pi / healpix.nside2npix(nside))
    assert ang.max() < max_rad, ang.max()


def test_known_axis_pixels():
    # +z lands in the first polar ring (pixels 0..3); -z in the last 4
    nside = 4
    npix = healpix.nside2npix(nside)
    assert int(healpix.vec2pix_ring(nside, jnp.asarray([0.0, 0.0, 1.0]))) < 4
    assert int(healpix.vec2pix_ring(
        nside, jnp.asarray([0.0, 0.0, -1.0]))) >= npix - 4
    # equator points land in the equatorial belt
    ncap = 2 * nside * (nside - 1)
    p = int(healpix.vec2pix_ring(nside, jnp.asarray([1.0, 0.0, 0.0])))
    assert ncap <= p < npix - ncap


def test_nside2npix():
    assert healpix.nside2npix(1) == 12
    assert healpix.nside2npix(16) == 3072
