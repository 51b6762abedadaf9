#!/usr/bin/env python
"""FP8 grid sanity script (~ reference root-level test.py:1-71).

Prints the E3/E4 value spaces and verifies that quantizing each grid through
``quantize_to_fp8_ste`` is idempotent (the grid is a fixed point).
"""

import numpy as np


def main():
    import jax.numpy as jnp

    from fp8_quantization_tpu.numerics import (
        fp8_grid,
        fp8_max_value,
        quantize_to_fp8_ste,
        value_space,
    )

    for ebits, mant, bias in [(4, 3, 8), (3, 4, 4), (5, 2, 16)]:
        grid = fp8_grid(8, ebits, bias)
        print(f"\nE{ebits}M{mant} (bias {bias}): {len(grid)} values, "
              f"max {fp8_max_value(ebits, bias)}")
        print("  positive value space:",
              np.array2string(grid[grid >= 0][:16], precision=6), "...")

        maxval = jnp.asarray([float(np.max(np.abs(grid)))])
        q, derived_bias = quantize_to_fp8_ste(
            jnp.asarray(grid.astype(np.float32)), 8, maxval, float(mant), 1
        )
        ok = bool(jnp.all(q == jnp.asarray(grid.astype(np.float32))))
        print(f"  round-trip idempotent: {ok}; derived bias "
              f"{float(derived_bias[0]):.0f}")
        assert ok, "grid must be a fixed point of the quantizer"

        vs = value_space(ebits, mant, bias)
        print(f"  codec value space head: "
              f"{np.array2string(np.asarray(vs[:8]), precision=6)}")
    print("\nall grids verified")


if __name__ == "__main__":
    main()
