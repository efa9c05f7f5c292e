"""HPO-B dataset loading with an optional native C++ fast path.

The C++ extension (native/hpob_loader.cpp, built by ``python
native/build.py``) parses the HPO-B JSON numeric payload directly into
contiguous float64 buffers — ~one order of magnitude faster and far leaner
than ``json.load`` + nested-list numpy conversion for the multi-hundred-MB
meta-train files.  Falls back to the pure-Python path transparently.
"""
from __future__ import annotations

import json
import os
import sys
from typing import Dict, Tuple

import numpy as np

_NATIVE = None


def _try_import_native():
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    native_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "..", "..", "native")
    native_dir = os.path.abspath(native_dir)
    if native_dir not in sys.path:
        sys.path.insert(0, native_dir)
    try:
        import hpob_native  # type: ignore
        _NATIVE = hpob_native
    except ImportError:
        _NATIVE = False
    return _NATIVE


def load_hpob_arrays(path: str) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Load {dataset_id: (X [n, d] float32, y [n, 1] float32)}."""
    native = _try_import_native()
    if native:
        raw = native.load(path)
        out = {}
        for did, ((xr, xc), xb, (yr, yc), yb) in raw.items():
            X = np.frombuffer(xb, dtype=np.float64).reshape(xr, xc)
            y = np.frombuffer(yb, dtype=np.float64).reshape(yr, yc)
            out[did] = (X.astype(np.float32),
                        y.reshape(yr, -1)[:, :1].astype(np.float32))
        return out
    with open(path) as f:
        data = json.load(f)
    return {did: (np.asarray(v["X"], np.float32),
                  np.asarray(v["y"], np.float32).reshape(-1, 1))
            for did, v in data.items()}


def native_available() -> bool:
    return bool(_try_import_native())
