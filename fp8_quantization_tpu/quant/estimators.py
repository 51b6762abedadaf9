"""Range estimators as jittable state-update passes.

TPU-native replacement for the reference's stateful estimator nn.Modules
(`/root/reference/quantization/range_estimators.py`). Each estimator is a
``(init, update)`` pair over a dict-of-arrays state with static shapes, so a
whole calibration epoch is one jitted scan and multi-host calibration reduces
states with psum/pmin/pmax.

* current_minmax ~ ``CurrentMinMaxEstimator``  (range_estimators.py:56-76)
* allminmax      ~ ``AllMinMaxEstimator``      (:79-100)
* running_minmax ~ ``RunningMinMaxEstimator``  (:103-125)
* MSE            ~ ``FP_MSE_Estimator``        (:285-369), the FP8 grid
  search over (mantissa_bits, maxval) candidates — re-expressed as a pure
  argmin over a vmapped candidate axis instead of mutating the quantizer
  mid-search.
* cross_entropy  ~ the estimator the reference *references* for logits
  layers but never defines (``RangeEstimators.cross_entropy``,
  quantization/utils.py:85-90 — that branch would crash there): a threshold
  line search scored by softmax cross-entropy instead of MSE.

``update`` returns ``(state, ranges)`` where ranges is
``(x_min, x_max, mantissa_bits | None)`` — the MSE estimator also elects
mantissa bits (the reference mutates them on the quantizer,
range_estimators.py:364-366).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import EstimatorConfig, QuantizerConfig, RangeMethod
from ..numerics.fp8_ste import quantize_to_fp8_ste
from .quantizers import bcast_param

EstState = Dict[str, Any]
Ranges = Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]


def _channelize(x, per_channel: bool, channel_axis: int):
    """Flatten to (C, -1) with the channel axis leading, or (1, -1)."""
    if per_channel:
        x = jnp.moveaxis(x, channel_axis, 0)
        return x.reshape(x.shape[0], -1)
    return x.reshape(1, -1)


def _num_channels(shape, per_channel: bool, channel_axis: int) -> int:
    return shape[channel_axis] if per_channel else 1


def _mbit_list(qcfg: QuantizerConfig):
    """Candidate mantissa widths for the MSE search (range_estimators.py:319-325).

    The reference sizes the list with the quantizer's *current* sign_bits
    attribute; we use the static value implied by ``allow_unsigned``.
    """
    if qcfg.fp8.mse_include_mantissa_bits:
        sign_bits = 0 if qcfg.fp8.allow_unsigned else 1
        return [float(m) for m in range(1, qcfg.n_bits - sign_bits)]
    return [float(qcfg.fp8.mantissa_bits)]


def line_search_ranges(
    x,
    qcfg: QuantizerConfig,
    num_candidates: int = 1000,
    range_margin: float = 0.5,
    apply_fn=None,
    opt_method=None,
):
    """1-D symmetric line search for clipping thresholds.

    ~ the reference ``LineSearchEstimator``'s ``_perform_1D_search``
    (range_estimators.py:236-256) / ``estimate_range_line_search``
    (:372-379), used by the analytic error CLI: sweep ``num_candidates``
    thresholds, quantize with each, pick the MSE argmin. One-sided when the
    data is non-negative (:263-264).

    ``opt_method`` selects grid (default) or golden-section search. The
    reference's ``OptMethod.golden_section`` branch calls methods that are
    never defined (range_estimators.py:200-205 — it would crash); here it is
    a working fixed-iteration golden-section bracket shrink on the threshold
    (the MSE-vs-threshold curve is near-unimodal for the distributions the
    analytic CLI targets).

    Args:
      x: sample tensor.
      qcfg: quantizer to evaluate candidates with.
      apply_fn: optional ``f(x, x_min, x_max) -> x_q`` override.
      opt_method: ``config.OptMethod`` or its string value.

    Returns (x_min, x_max) scalars.
    """
    from ..config import OptMethod
    from . import quantizers

    if opt_method is None:
        opt_method = OptMethod.grid
    if isinstance(opt_method, str):
        opt_method = OptMethod(opt_method)

    x = jnp.asarray(x, jnp.float32)
    one_sided = jnp.all(x >= 0)
    max_pos_thr = jnp.maximum(jnp.abs(x.min()), x.max()) + range_margin
    step = max_pos_thr / num_candidates

    if apply_fn is None:
        def apply_fn(x, x_min, x_max):
            st = quantizers.init(qcfg)
            st = quantizers.set_quant_range(qcfg, st, x_min, x_max)
            return quantizers.apply(qcfg, st, x)

    def loss_for(pos):
        neg = jnp.where(one_sided, 0.0, -pos)
        y = apply_fn(x, neg, pos)
        return jnp.sum((x - y) ** 2)

    if opt_method == OptMethod.golden_section:
        invphi = (5.0 ** 0.5 - 1.0) / 2.0

        def body(_, bracket):
            a, b = bracket
            c = b - invphi * (b - a)
            d = a + invphi * (b - a)
            shrink_right = loss_for(c) < loss_for(d)
            return (jnp.where(shrink_right, a, c),
                    jnp.where(shrink_right, d, b))

        a, b = jax.lax.fori_loop(0, 40, body, (step, max_pos_thr))
        x_max = (a + b) / 2.0
    else:
        idxs = jnp.arange(1, num_candidates + 1, dtype=jnp.float32)
        losses = jax.vmap(lambda i: loss_for(step * i))(idxs)
        x_max = step * idxs[jnp.argmin(losses)]
    x_min = jnp.where(one_sided, 0.0, -x_max)
    return x_min, x_max


def init(cfg: EstimatorConfig, qcfg: QuantizerConfig, shape,
         per_channel: bool, channel_axis: int = 0) -> EstState:
    """Create the zero state for an estimator given the tensor shape."""
    c = _num_channels(shape, per_channel, channel_axis)
    if cfg.method in (RangeMethod.current_minmax, RangeMethod.allminmax,
                      RangeMethod.running_minmax):
        return {
            "xmin": jnp.full((c,), jnp.inf, jnp.float32),
            "xmax": jnp.full((c,), -jnp.inf, jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }
    if cfg.method == RangeMethod.MSE:
        n_mbits = len(_mbit_list(qcfg))
        return {
            "search_grid": jnp.zeros((cfg.num_candidates, c), jnp.float32),
            "mses": jnp.zeros((n_mbits, cfg.num_candidates, c), jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }
    if cfg.method == RangeMethod.cross_entropy:
        # per-tensor only: the CE is over the last (class) axis of logits
        if per_channel:
            raise ValueError("cross_entropy estimation is per-tensor only")
        return {
            "search_grid": jnp.zeros((cfg.num_candidates, 1), jnp.float32),
            "losses": jnp.zeros((cfg.num_candidates, 1), jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }
    raise NotImplementedError(cfg.method)


def update(cfg: EstimatorConfig, qcfg: QuantizerConfig, state: EstState, x,
           per_channel: bool, channel_axis: int = 0) -> Tuple[EstState, Ranges]:
    """Fold one batch into the state; return updated state + current ranges."""
    if cfg.method == RangeMethod.current_minmax:
        return _current_minmax(cfg, state, x, per_channel, channel_axis)
    if cfg.method == RangeMethod.allminmax:
        return _all_minmax(state, x, per_channel, channel_axis)
    if cfg.method == RangeMethod.running_minmax:
        return _running_minmax(cfg, state, x, per_channel, channel_axis)
    if cfg.method == RangeMethod.MSE:
        return _fp_mse(cfg, qcfg, state, x, per_channel, channel_axis)
    if cfg.method == RangeMethod.cross_entropy:
        return _cross_entropy(cfg, qcfg, state, x)
    raise NotImplementedError(cfg.method)


# --------------------------------------------------------------------------


def _current_minmax(cfg, state, x, per_channel, channel_axis):
    xf = _channelize(x, per_channel, channel_axis)
    if cfg.percentile:
        # (range_estimators.py:64-71); per-tensor uses the global percentile
        q = jnp.asarray([cfg.percentile, 100.0 - cfg.percentile])
        lo_hi = jnp.percentile(xf, q, axis=-1)
        x_min, x_max = lo_hi[0], lo_hi[1]
        if not per_channel:
            x_min, x_max = x_min.reshape(1), x_max.reshape(1)
    else:
        x_min = xf.min(axis=-1)
        x_max = xf.max(axis=-1)
    new = {"xmin": x_min, "xmax": x_max, "count": state["count"] + 1}
    return new, (x_min, x_max, None)


def _all_minmax(state, x, per_channel, channel_axis):
    xf = _channelize(x, per_channel, channel_axis)
    x_min = jnp.minimum(state["xmin"], xf.min(axis=-1))
    x_max = jnp.maximum(state["xmax"], xf.max(axis=-1))
    new = {"xmin": x_min, "xmax": x_max, "count": state["count"] + 1}
    return new, (x_min, x_max, None)


def _running_minmax(cfg, state, x, per_channel, channel_axis):
    xf = _channelize(x, per_channel, channel_axis)
    b_min = xf.min(axis=-1)
    b_max = xf.max(axis=-1)
    first = state["count"] == 0
    m = cfg.momentum
    x_min = jnp.where(first, b_min, (1 - m) * b_min + m * state["xmin"])
    x_max = jnp.where(first, b_max, (1 - m) * b_max + m * state["xmax"])
    new = {"xmin": x_min, "xmax": x_max, "count": state["count"] + 1}
    return new, (x_min, x_max, None)


def _fp_mse(cfg, qcfg, state, x, per_channel, channel_axis):
    """FP8 (mantissa_bits, maxval) grid search (range_estimators.py:285-369)."""
    mbit_list = _mbit_list(qcfg)
    xf = _channelize(x, per_channel, channel_axis)          # (C, -1)
    c = xf.shape[0]

    # search grid from the first batch: 111 points in [0.1*mx, 1.2*mx] per
    # channel (:300-316); recomputed every batch but only adopted on the first
    mxs = jnp.maximum(jnp.abs(xf.min(axis=-1)), jnp.abs(xf.max(axis=-1)))
    fresh = jnp.linspace(0.1 * mxs, 1.2 * mxs, cfg.num_candidates)  # (ncand, C)
    first = state["count"] == 0
    grid = jnp.where(first, fresh, state["search_grid"])

    # sign bits from the data (:332)
    if qcfg.fp8.allow_unsigned:
        sign_bits = jnp.any(x < 0).astype(jnp.int32)
    else:
        sign_bits = jnp.asarray(1, jnp.int32)

    # per-candidate MSE, vmapped over the maxval axis; mean over non-channel
    # dims (:337-347)
    def mse_for(mbits, maxval_c):
        maxval_b = bcast_param(maxval_c, x.ndim, channel_axis) if per_channel \
            else maxval_c.reshape((1,) * x.ndim)
        xfp, _ = quantize_to_fp8_ste(x, qcfg.n_bits, maxval_b, mbits, sign_bits)
        err = (x - xfp) ** 2
        return _channelize(err, per_channel, channel_axis).mean(axis=-1)  # (C,)

    contribs = []
    for mbits in mbit_list:
        contribs.append(jax.vmap(lambda mv, m=mbits: mse_for(m, mv))(grid))
    mses = state["mses"] + jnp.stack(contribs)               # (n_mbits, ncand, C)

    # elect mantissa bits by per-channel plurality vote (:349-354)
    best_per_channel = jnp.argmin(jnp.min(mses, axis=1), axis=0)     # (C,)
    votes = jnp.sum(jax.nn.one_hot(best_per_channel, len(mbit_list)), axis=0)
    best_idx = jnp.argmax(votes)                                      # smallest wins ties
    best_mbits = jnp.asarray(mbit_list)[best_idx]

    # best per-channel maxval for the elected mbits (:356-363)
    cand_idx = jnp.argmin(jnp.take(mses, best_idx, axis=0), axis=0)   # (C,)
    maxval = jnp.take_along_axis(grid, cand_idx[None, :], axis=0)[0]  # (C,)

    new = {"search_grid": grid, "mses": mses, "count": state["count"] + 1}
    sign_f = sign_bits.astype(jnp.float32)
    return new, (-sign_f * maxval, maxval, best_mbits.reshape(1))


def _cross_entropy(cfg, qcfg, state, x):
    """Cross-entropy threshold search for logits quantizers.

    1-D symmetric line search over ``num_candidates`` clipping thresholds
    (the ``LineSearchEstimator`` scan structure, range_estimators.py:236-256,
    losses accumulated over batches), scoring each candidate by
    ``H(softmax(x), log_softmax(x_q))`` over the last axis instead of MSE —
    quantizing a logits tensor should preserve its output *distribution*,
    not its raw values. The reference names this estimator
    (quantization/utils.py:85-90) but never defines it.
    """
    from . import quantizers

    x = jnp.asarray(x, jnp.float32)
    x2d = x.reshape(-1, x.shape[-1])
    p = jax.nn.softmax(x2d, axis=-1)

    mx = jnp.maximum(jnp.abs(x.min()), jnp.abs(x.max())) + cfg.range_margin
    fresh = (jnp.arange(1, cfg.num_candidates + 1, dtype=jnp.float32)
             / cfg.num_candidates * mx).reshape(-1, 1)
    first = state["count"] == 0
    grid = jnp.where(first, fresh, state["search_grid"])

    def ce_for(pos):
        st = quantizers.init(qcfg)
        st = quantizers.set_quant_range(qcfg, st, -pos, pos)
        xq = quantizers.apply(qcfg, st, x2d)
        logq = jax.nn.log_softmax(xq, axis=-1)
        return -jnp.sum(p * logq)

    losses = state["losses"] + jax.vmap(ce_for)(grid[:, 0]).reshape(-1, 1)
    x_max = grid[jnp.argmin(losses[:, 0])]
    new = {"search_grid": grid, "losses": losses, "count": state["count"] + 1}
    return new, (-x_max, x_max, None)
