"""Explicit build entry point: python -m ttsx.native.build"""
from ttsx.native import build

if __name__ == "__main__":
    ok = build(verbose=True)
    print("built" if ok else "BUILD FAILED")
    raise SystemExit(0 if ok else 1)
