"""Mantissa-product error-compensation LUT registry.

The approximate FP multiplier models mantissa multiplication as an integer
add plus a small correction table; the six hand-derived int8 tables are pure
*data* (reference: `/root/reference/approx/approx_matmul_whole_v9.py:393-549`)
and are stored bit-exactly in ``_comp_tables.npz``.

``get_error_table`` mirrors the selector ``get_error_table_NN``
(v9.py:555-592): the table is the *residual* error when hardware compensation
is (not) applied, so e.g. E3M4 with a down-sample factor >= 4 compensates
perfectly and the table is all zeros.

Tables are 2^M x 2^M, indexed by the two operands' mantissa fields.
"""

from __future__ import annotations

import functools
import os

import numpy as np

_NPZ = os.path.join(os.path.dirname(__file__), "_comp_tables.npz")


@functools.lru_cache(maxsize=None)
def _tables():
    with np.load(_NPZ) as data:
        return tuple(data[f"table{i}"].astype(np.int32) for i in range(6))


@functools.lru_cache(maxsize=None)
def get_error_table(expo_width: int, mant_width: int, with_comp: bool,
                    dnsmp_factor: int = 3) -> np.ndarray:
    """Select the compensation table for a format (v9.py:555-592).

    Args:
      expo_width / mant_width: the ExMy format.
      with_comp: whether the simulated hardware applies LUT compensation.
      dnsmp_factor: down-sample factor of the hardware's compensation LUT.

    Returns:
      int32 array of shape (2^M, 2^M).
    """
    tabs = _tables()
    zeros = np.zeros((1 << mant_width, 1 << mant_width), dtype=np.int32)

    if (expo_width, mant_width) == (4, 3):
        return zeros if with_comp else tabs[0]
    if (expo_width, mant_width) == (3, 4):
        if with_comp:
            if dnsmp_factor == 3:
                return tabs[1]
            if dnsmp_factor >= 4:
                return zeros
            raise ValueError(f"unsupported dnsmp_factor={dnsmp_factor} for E3M4")
        return tabs[2]
    if (expo_width, mant_width) == (2, 5):
        if with_comp:
            if dnsmp_factor == 3:
                return tabs[3]
            if dnsmp_factor == 4:
                return tabs[4]
            if dnsmp_factor == 5:
                return zeros
            raise ValueError(f"unsupported dnsmp_factor={dnsmp_factor} for E2M5")
        return tabs[5]

    raise ValueError(
        f"Invalid combination of expo_width={expo_width} and mant_width={mant_width}"
    )
