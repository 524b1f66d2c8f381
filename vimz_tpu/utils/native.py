"""Native-extension loader: builds/loads the C witness-input parser.

The extension source lives in native/vimz_loader.c; it is compiled on first
use into ~/.cache/vimz_tpu/native (one-time, a second or two with the baked
g++) and loaded from there. All users go through `get_loader()`, which
returns None when no C toolchain is available — callers fall back to the
pure-Python path, so the native module is an accelerator, not a dependency.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig

_LOADER = None
_TRIED = False


def _native_dir() -> str:
    from vimz_tpu.utils.cache import cache_dir

    d = os.path.join(cache_dir(), "native")
    os.makedirs(d, exist_ok=True)
    return d


def _source_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "vimz_loader.c",
    )


def _build() -> str | None:
    src = _source_path()
    if not os.path.exists(src):
        return None
    out_dir = _native_dir()
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(out_dir, f"vimz_loader{suffix}")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cc = os.environ.get("CC", "gcc")
    include = sysconfig.get_paths()["include"]
    cmd = [cc, "-O2", "-shared", "-fPIC", f"-I{include}", src, "-o", out + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(out + ".tmp", out)
        return out
    except (subprocess.SubprocessError, OSError):
        return None


def get_loader():
    """The compiled vimz_loader module, or None if unavailable."""
    global _LOADER, _TRIED
    if _TRIED:
        return _LOADER
    _TRIED = True
    path = _build()
    if path is None:
        return None
    try:
        spec = importlib.util.spec_from_file_location("vimz_loader", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _LOADER = mod
    except Exception:
        _LOADER = None
    return _LOADER


def hex_rows_to_limbs(rows: list[list[str]]):
    """Hex-word rows -> (R, C, 16) uint32 standard-form limbs.

    Uses the C parser when available; exact pure-Python fallback otherwise.
    """
    import numpy as np

    n_rows = len(rows)
    n_cols = len(rows[0]) if n_rows else 0
    loader = get_loader()
    if loader is not None:
        blob = "\n".join(w for row in rows for w in row).encode()
        raw = loader.hex_words_to_limbs(blob, n_rows * n_cols)
        return np.frombuffer(raw, dtype=np.uint32).reshape(n_rows, n_cols, 16).copy()
    from vimz_tpu.fields.limbs import FR_LIMBS

    ints = np.array([[int(w, 16) for w in row] for row in rows], dtype=object)
    return FR_LIMBS.to_limbs(ints)
