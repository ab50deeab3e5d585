"""Optional adapters importing *reference* (PyTorch) modules for parity tests.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT mounted
read-only; we import a few torch-only leaf modules purely as numerical
oracles. Every use is guarded — if the mount or a dependency is missing the
corresponding tests skip rather than fail, so the framework's own test suite
stands alone.
"""
from __future__ import annotations

import importlib.util
import sys

REF_ROOT = "/root/reference"


def load_ref_module(relpath: str, name: str):
    """Load a single reference file as an isolated module, or None."""
    try:
        spec = importlib.util.spec_from_file_location(
            name, f"{REF_ROOT}/{relpath}")
        if spec is None:
            return None
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


def ref_loss_utils():
    return load_ref_module("utils/loss_utils.py", "_ref_loss_utils")


def ref_sh_utils():
    return load_ref_module("utils/sh_utils.py", "_ref_sh_utils")
