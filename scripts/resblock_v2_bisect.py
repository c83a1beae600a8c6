"""Bisect the resblock-stack kernel v2 Mosaic compile failure on TPU.

gen_profile showed: upsample-only path compiles (11.3 ms), any variant
with the v2 resblock stack dies in the remote tpu_compile_helper with a
hidden error. Two candidate changes: (a) channel-adaptive tiles (4096
rows at C=16), (b) the mel-rate film one-hot gather. Compile each stage
shape for each path separately and print the first real error.
"""
import sys
import traceback
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ttsx.ops.resblock_stack_kernel import _stack_impl, _pick_tile

DILS = (1, 3, 5)
TC = 118  # mel frames for ~1.25 s at hop 256 (gen_profile uses T=118)


def try_case(name, B, T, C, Tf):
    x = jnp.ones((B, T, C), jnp.float32)
    film = jnp.ones((B, Tf, 6 * C), jnp.float32) * 0.1
    w1 = jnp.ones((3, 3, C, 2 * C), jnp.float32) * 0.01
    b1 = jnp.zeros((3, 2 * C))
    w2 = jnp.ones((3, 3, C, C), jnp.float32) * 0.01
    b2 = jnp.zeros((3, C))
    try:
        y = _stack_impl(x, film, w1, b1, w2, b2, DILS)
        y.block_until_ready()
        print(f"OK   {name}: T={T} C={C} Tf={Tf} tile={_pick_tile(C)} "
              f"sum={float(y.sum()):.3f}")
    except Exception as e:
        msg = str(e).splitlines()[:30]
        print(f"FAIL {name}: T={T} C={C} Tf={Tf} tile={_pick_tile(C)}")
        print("\n".join(msg))


def main():
    B = 4
    up = [8, 8, 2, 2]
    T = TC
    C = 256
    for i, f in enumerate(up):
        T *= f
        C //= 2
        # direct path (film at waveform rate) — isolates adaptive tiles
        try_case(f"stage{i}_direct", B, T, C, T)
        # gather path (film at mel rate) — the full v2
        try_case(f"stage{i}_gather", B, T, C, TC)


if __name__ == "__main__":
    main()
