"""Disk cache for compiled circuit structures and Pedersen bases.

Circuit structure (constraints + witness tape) and commitment bases are
expensive to build but deterministic; caching them makes key generation a
one-time cost, matching the reference's amortized `create_public_params` /
`Folding::preprocess` setup (vimz/src/nova_snark_backend/folding.rs:21-25).

Cache dir: $VIMZ_TPU_CACHE or ~/.cache/vimz_tpu.
"""

from __future__ import annotations

import hashlib
import os
import pickle


def cache_dir() -> str:
    d = os.environ.get("VIMZ_TPU_CACHE") or os.path.expanduser("~/.cache/vimz_tpu")
    os.makedirs(d, exist_ok=True)
    return d


_FINGERPRINT = None


def source_fingerprint() -> str:
    """Digest of the circuit-defining source files, folded into structure
    cache keys so layout changes invalidate cached structures automatically
    (no reliance on a manually-bumped version string)."""
    global _FINGERPRINT
    if _FINGERPRINT is None:
        h = hashlib.sha256()
        base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for rel in ("r1cs/builder.py", "r1cs/gadgets.py", "circuits/spec.py"):
            try:
                with open(os.path.join(base, rel), "rb") as f:
                    h.update(f.read())
            except OSError:
                h.update(rel.encode())
        _FINGERPRINT = h.hexdigest()[:16]
    return _FINGERPRINT


def _path(key) -> str:
    h = hashlib.sha256(repr(key).encode()).hexdigest()[:32]
    return os.path.join(cache_dir(), f"{h}.pkl")


def disk_load(key):
    path = _path(key)
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        return None


def disk_save(key, obj):
    path = _path(key)
    tmp = path + f".tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            pickle.dump(obj, f, protocol=5)
        os.replace(tmp, path)
    except Exception:
        if os.path.exists(tmp):
            os.remove(tmp)
