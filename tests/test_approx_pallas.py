"""Fused Pallas approx matmul vs the jnp golden oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.numerics import (
    approx_matmul_golden,
    get_error_table,
    quantize_exmy,
)
from fp8_quantization_tpu.ops.pallas.approx_matmul import approx_matmul_pallas


def _operands(rng, m, k, n, ew, mw, ba, bb):
    a = np.asarray(
        quantize_exmy((rng.normal(size=(m, k)) * 2).astype(np.float32), ew, mw, ba)
    )
    if np.ndim(bb) == 0:
        b = np.asarray(
            quantize_exmy((rng.normal(size=(k, n)) * 2).astype(np.float32), ew, mw, bb)
        )
    else:
        b = np.asarray(
            quantize_exmy(
                (rng.normal(size=(k, n)) * 2).astype(np.float32), ew, mw,
                np.asarray(bb).reshape(1, -1),
            )
        )
    return a, b


CASES = [
    dict(ew=3, mw=4, with_comp=True, with_approx=True, qb=True, s2=False),
    dict(ew=3, mw=4, with_comp=False, with_approx=True, qb=True, s2=False),
    dict(ew=3, mw=4, with_comp=True, with_approx=True, qb=False, s2=False),
    dict(ew=3, mw=4, with_comp=True, with_approx=True, qb=True, s2=True),
    dict(ew=4, mw=3, with_comp=False, with_approx=True, qb=True, s2=False),
    dict(ew=2, mw=5, with_comp=True, with_approx=True, qb=True, s2=False),
    dict(ew=3, mw=4, with_comp=True, with_approx=False, qb=True, s2=False),
    dict(ew=3, mw=4, with_comp=True, with_approx=True, qb=True, s2=False,
         clip=True),
]


@pytest.mark.parametrize("case", CASES, ids=lambda c: (
    f"E{c['ew']}M{c['mw']}"
    f"{'c' if c['with_comp'] else ''}{'a' if c['with_approx'] else ''}"
    f"{'q' if c['qb'] else ''}{'s' if c['s2'] else ''}"
    f"{'x' if c.get('clip') else ''}"
))
def test_kernel_matches_oracle(case, rng):
    ew, mw = case["ew"], case["mw"]
    ba, bb, br = 5, 6, 4
    m, k, n = 24, 40, 16
    a, b = _operands(rng, m, k, n, ew, mw, ba, bb)
    table = get_error_table(ew, mw, case["with_comp"], 3)

    golden = np.asarray(approx_matmul_golden(
        a, b, ew, mw, ba, bb, br, table,
        with_approx=case["with_approx"],
        with_s2nn2s_opt=case["s2"],
        quant_btw_mult_accu=case["qb"],
        golden_clip_of=case.get("clip", False),
    ))
    ours = np.asarray(approx_matmul_pallas(
        jnp.asarray(a), jnp.asarray(b), ba, bb, br,
        expo_width=ew, mant_width=mw,
        with_comp=case["with_comp"],
        with_approx=case["with_approx"],
        with_s2nn2s_opt=case["s2"],
        quant_btw_mult_accu=case["qb"],
        golden_clip_of=case.get("clip", False),
        bm=8, bn=8, bk=8,
    ))
    np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-6)


def test_per_column_bias(rng):
    ew, mw = 3, 4
    ba, br = 5, 4
    m, k, n = 16, 24, 8
    bias_b = np.array([3, 4, 5, 6, 7, 8, 5, 6], dtype=np.int32)
    a, b = _operands(rng, m, k, n, ew, mw, ba, bias_b)
    table = get_error_table(ew, mw, True, 3)

    golden = np.asarray(approx_matmul_golden(
        a, b, ew, mw, ba, bias_b, br, table, with_approx=True,
    ))
    ours = np.asarray(approx_matmul_pallas(
        jnp.asarray(a), jnp.asarray(b), ba, jnp.asarray(bias_b), br,
        expo_width=ew, mant_width=mw, with_comp=True, with_approx=True,
        bm=8, bn=8, bk=8,
    ))
    np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-6)


def test_unaligned_shapes_padding(rng):
    ew, mw = 3, 4
    ba, bb, br = 5, 6, 4
    m, k, n = 13, 17, 9  # deliberately unaligned to 8-blocks
    a, b = _operands(rng, m, k, n, ew, mw, ba, bb)
    table = get_error_table(ew, mw, True, 3)
    golden = np.asarray(approx_matmul_golden(a, b, ew, mw, ba, bb, br, table))
    ours = np.asarray(approx_matmul_pallas(
        jnp.asarray(a), jnp.asarray(b), ba, bb, br,
        expo_width=ew, mant_width=mw, with_comp=True,
        bm=8, bn=8, bk=8,
    ))
    np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-6)


def test_m_split_bit_identical(rng):
    """Large-M dispatches run as a lax.map over row chunks (m_split) and must
    be BIT-identical to the unsplit kernel: each output row depends only on
    its own A rows. The split exists because XLA may place a custom call's
    whole result in scoped VMEM when it feeds a fusion (r5: f32[25088,128]
    output inside the MobileNetV2 conv body blew the 16 MB scoped limit)."""
    ew, mw = 3, 4
    ba, bb, br = 5, 6, 4
    m, k, n = 200, 24, 16  # m deliberately NOT a multiple of the split
    a, b = _operands(rng, m, k, n, ew, mw, ba, bb)
    table_kwargs = dict(expo_width=ew, mant_width=mw, with_comp=True,
                        dnsmp_factor=3)
    whole = np.asarray(approx_matmul_pallas(
        jnp.asarray(a), jnp.asarray(b), ba, bb, br, **table_kwargs))
    split = np.asarray(approx_matmul_pallas(
        jnp.asarray(a), jnp.asarray(b), ba, bb, br, m_split=64,
        **table_kwargs))
    np.testing.assert_array_equal(whole, split)
