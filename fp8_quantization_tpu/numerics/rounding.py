"""Rounding / gradient-estimator primitives as jax.custom_vjp functions.

TPU-native equivalents of the reference's ``torch.autograd.Function`` zoo
(`/root/reference/quantization/quantizers/rounding_utils.py:12-162`). Each
reference Function becomes a ``jax.custom_vjp`` pure function; the
"parametrized" estimators carry their parameter explicitly instead of as
module state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --- RoundStraightThrough (rounding_utils.py:12-19) ---
@jax.custom_vjp
def round_ste(x):
    """Round to nearest (half-to-even); identity gradient."""
    return jnp.round(x)


def _round_ste_fwd(x):
    return jnp.round(x), None


def _round_ste_bwd(_, g):
    return (g,)


round_ste.defvjp(_round_ste_fwd, _round_ste_bwd)


# --- exact power-of-two ---
@jax.custom_vjp
def exp2_exact(arg):
    """``2**arg`` computed exactly for integral ``arg`` in [-126, 127].

    XLA lowers ``exp2`` to ``exp(arg*ln2)``, which is off by ~1ulp·|arg| in
    float32 and would break the bit-exactness of power-of-two quantization
    scales (the reference's ``2.0 ** (...)``, fp8_quantizer.py:151, is exact
    in torch). Forward constructs the float from its exponent field with
    integer bit-ops (faster than ldexp on the TPU VPU); backward is the
    smooth ``ln2 * 2^arg`` so learnable maxval/mantissa_bits still train.
    """
    arg = jnp.asarray(arg)
    sexp = jnp.clip(jnp.round(arg).astype(jnp.int32) + 127, 1, 254)
    return jax.lax.bitcast_convert_type(
        jnp.left_shift(sexp, 23), jnp.float32
    ).astype(arg.dtype)


def _exp2_exact_fwd(arg):
    out = exp2_exact(arg)
    return out, out


def _exp2_exact_bwd(out, g):
    return (g * out * 0.6931471805599453,)


exp2_exact.defvjp(_exp2_exact_fwd, _exp2_exact_bwd)


def exp2_int(e):
    """``2**e`` for an int array ``e``, exact, as float32."""
    e = jnp.asarray(e).astype(jnp.int32)
    return jnp.ldexp(jnp.ones(e.shape, dtype=jnp.float32), e)


# --- StochasticRoundSTE (rounding_utils.py:22-31) ---
@jax.custom_vjp
def stochastic_round_ste(x, key):
    noise = jax.random.uniform(key, x.shape, dtype=x.dtype)
    return jnp.floor(x + noise)


def _sround_fwd(x, key):
    return stochastic_round_ste(x, key), None


def _sround_bwd(_, g):
    return g, None


stochastic_round_ste.defvjp(_sround_fwd, _sround_bwd)


# --- ScaleGradient (rounding_utils.py:34-42) ---
@jax.custom_vjp
def scale_grad(x, scale):
    return x


def _scale_grad_fwd(x, scale):
    return x, scale


def _scale_grad_bwd(scale, g):
    return g * scale, None


scale_grad.defvjp(_scale_grad_fwd, _scale_grad_bwd)


# --- EWGSFunctional (rounding_utils.py:45-64) ---
@jax.custom_vjp
def ewgs_round(x, scaling_factor):
    return jnp.round(x)


def _ewgs_fwd(x, scaling_factor):
    x_int = jnp.round(x)
    return x_int, (x - x_int, scaling_factor)


def _ewgs_bwd(res, g):
    diff, delta = res
    scale = 1 + delta * jnp.sign(g) * diff
    return g * scale, None


ewgs_round.defvjp(_ewgs_fwd, _ewgs_bwd)


# --- StackSigmoidFunctional (rounding_utils.py:67-87) ---
@jax.custom_vjp
def stacked_sigmoid_round(x, alpha):
    return jnp.round(x)


def _ssig_fwd(x, alpha):
    return jnp.round(x), (x, alpha)


def _ssig_bwd(res, g):
    x, alpha = res
    sig_min = jax.nn.sigmoid(alpha / 2)
    sig_scale = 1 - 2 * sig_min
    x_base = jnp.floor(x)
    x_rest = x - x_base - 0.5
    s = jax.nn.sigmoid(x_rest * -alpha)
    grad = s * (1 - s) * -alpha / sig_scale
    return grad * g, None


stacked_sigmoid_round.defvjp(_ssig_fwd, _ssig_bwd)
