"""TPU-only full-scale tests — run on real TPU hardware:

    python -m pytest tpu_tests/ -m slow -q

Unlike tests/ (which forces a virtual CPU mesh), this suite uses the
ambient JAX platform and SKIPS everything unless a TPU is present.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="requires a TPU device")
        for item in items:
            item.add_marker(skip)
