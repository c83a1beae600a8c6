"""Structural lint gate: per-directory LoC limits.

Re-designs train/utils/check_file_sizes.py:6-27 (engine 400 / blocks 300 /
callbacks 250 / utils 200, exit 1 on violation) for this repo's layout.
"""
from __future__ import annotations

import sys
from pathlib import Path
from typing import Dict, List, Tuple

DEFAULT_LIMITS: Dict[str, int] = {
    "ttsx/train": 450,
    "ttsx/nn": 300,
    "ttsx/core": 400,
    "ttsx/dsp": 250,
    "ttsx/models": 450,
    "ttsx/eval": 250,
    "ttsx/parallel": 200,
    "ttsx/utils": 200,
    "ttsx/ops": 250,
    "ttsx/data": 400,
    "ttsx/pipeline": 450,
    "ttsx/cli": 400,
}


def count_loc(path: Path) -> int:
    """Non-blank lines (SURVEY's LoC convention)."""
    return sum(1 for line in path.read_text().splitlines() if line.strip())


def check_file_sizes(root: str | Path = ".",
                     limits: Dict[str, int] | None = None
                     ) -> List[Tuple[str, int, int]]:
    """Returns [(file, loc, limit)] violations."""
    root = Path(root)
    limits = limits or DEFAULT_LIMITS
    violations = []
    for rel, limit in limits.items():
        d = root / rel
        if not d.exists():
            continue
        for py in d.rglob("*.py"):
            loc = count_loc(py)
            if loc > limit:
                violations.append((str(py.relative_to(root)), loc, limit))
    return violations


def main(argv=None) -> int:
    violations = check_file_sizes(Path(__file__).resolve().parents[2])
    for f, loc, limit in violations:
        print(f"LOC VIOLATION: {f}: {loc} > {limit}")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
