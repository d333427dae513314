"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors how the reference tests the fast path against brute-force
oracles rather than live infrastructure (SURVEY.md §4): multi-chip
sharding code paths are exercised with
``--xla_force_host_platform_device_count`` fake devices.

The ambient environment pins ``JAX_PLATFORMS=axon`` (a tunneled TPU) and
a sitecustomize imports jax at interpreter start, so the env-var route
is too late — ``jax.config.update`` still works because no backend has
been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def random_rigid_transform(rng, max_translation=1.0):
    """Random rotation + translation as a 4x4 matrix."""
    a = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    mat = np.eye(4, dtype=np.float64)
    mat[:3, :3] = q
    mat[:3, 3] = rng.uniform(-max_translation, max_translation, size=3)
    return mat.astype(np.float32)


@pytest.fixture
def make_transform(rng):
    return lambda **kw: random_rigid_transform(rng, **kw)
