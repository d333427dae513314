"""Packaging/import surface — the analog of the reference's
externalAppTest (ref:tests/externalAppTest: a downstream app linking
the installed package; here: the public import surface and console
entry point resolve)."""

import importlib
import importlib.metadata


def test_public_surface_imports():
    import super4pcs_tpu as s4p
    for name in s4p.__all__:
        assert getattr(s4p, name) is not None
    # subsystem modules import cleanly
    for mod in ("super4pcs_tpu.api", "super4pcs_tpu.cli",
                "super4pcs_tpu.io", "super4pcs_tpu.parallel",
                "super4pcs_tpu.ops.lcp", "super4pcs_tpu.ops.healpix",
                "super4pcs_tpu.kernels.lcp_pallas",
                "super4pcs_tpu.utils.profiling"):
        importlib.import_module(mod)


def test_console_entry_point():
    """The console script resolves when the package is pip-installed;
    from a plain source checkout (no dist-info on sys.path) fall back to
    asserting the declared entry point loads."""
    eps = importlib.metadata.entry_points(group="console_scripts")
    match = [e for e in eps if e.name == "super4pcs"]
    if match:
        main = match[0].load()
    else:
        import os
        import re
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "pyproject.toml")) as f:
            decl = re.search(
                r'^super4pcs\s*=\s*"([\w.]+):(\w+)"', f.read(), re.M)
        assert decl, "super4pcs console script not declared in pyproject"
        mod = importlib.import_module(decl.group(1))
        main = getattr(mod, decl.group(2))
    assert callable(main)


def test_version():
    import super4pcs_tpu
    assert super4pcs_tpu.__version__
