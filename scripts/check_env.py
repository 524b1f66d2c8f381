#!/usr/bin/env python3
"""Environment preflight (reference: check-env.sh:1-38, which checks the
Rust/circom/node toolchain; here the stack is JAX/XLA)."""

import importlib
import shutil
import sys

REQUIRED_MODULES = ["jax", "jaxlib", "numpy", "PIL"]
OPTIONAL_MODULES = ["pytest"]


def main():
    ok = True
    for mod in REQUIRED_MODULES:
        try:
            m = importlib.import_module(mod)
            ver = getattr(m, "__version__", "?")
            print(f"  ok       {mod} {ver}")
        except ImportError:
            print(f"  MISSING  {mod}")
            ok = False
    for mod in OPTIONAL_MODULES:
        try:
            importlib.import_module(mod)
            print(f"  ok       {mod} (optional)")
        except ImportError:
            print(f"  absent   {mod} (optional)")

    import jax

    try:
        devs = jax.devices()
        print(f"  ok       jax backend: {devs[0].platform} x {len(devs)}")
    except Exception as e:  # pragma: no cover
        print(f"  WARNING  no accelerator backend ({e}); CPU fallback only")

    for tool in ("g++", "cmake", "make"):
        print(f"  {'ok      ' if shutil.which(tool) else 'absent  '} {tool} (native toolchain)")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
