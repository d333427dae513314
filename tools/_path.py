"""Put the repo root on sys.path for `python tools/<script>.py` runs.

Must be imported (not PYTHONPATH): entries in PYTHONPATH are on sys.path
while this image's sitecustomize imports jax, and a repo-root name there
shadows a module the axon TPU plugin needs — the backend then silently
fails to register. Mutating sys.path at script import time runs after
sitecustomize, so the plugin is unaffected.
"""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
