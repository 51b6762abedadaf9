"""Numerics core: ExMy formats, codecs, FP8 STE quantization, approx matmul.

Pure-jnp, CPU-testable layer. The fused TPU fast paths live in
``fp8_quantization_tpu.ops.pallas`` and are tested against this oracle.
"""

from .approx_matmul import (ApproxStats, approx_matmul_golden,
                            approx_matmul_golden_v6)
from .codec import (
    code_of,
    compose,
    decompose,
    fields_of,
    quantize_exmy,
    quantize_exmy_allnorm,
    value_space,
)
from .formats import E2M5, E3M4, E4M3, E5M2, ExMy, default_bias
from .fp8_ste import (
    default_maxval,
    fp8_grid,
    fp8_grid_scaled,
    fp8_max_value,
    quantize_to_fp8_ste,
)
from .luts import get_error_table
from .rounding import (
    ewgs_round,
    round_ste,
    scale_grad,
    stacked_sigmoid_round,
    stochastic_round_ste,
)

__all__ = [
    "ApproxStats",
    "approx_matmul_golden",
    "approx_matmul_golden_v6",
    "code_of",
    "compose",
    "decompose",
    "fields_of",
    "quantize_exmy",
    "quantize_exmy_allnorm",
    "value_space",
    "ExMy",
    "E2M5",
    "E3M4",
    "E4M3",
    "E5M2",
    "default_bias",
    "default_maxval",
    "fp8_grid",
    "fp8_grid_scaled",
    "fp8_max_value",
    "quantize_to_fp8_ste",
    "get_error_table",
    "round_ste",
    "scale_grad",
    "stochastic_round_ste",
    "ewgs_round",
    "stacked_sigmoid_round",
]
