"""Oscillation dampening + freezing for low-bit QAT.

The reference exposes a full CLI namespace for these
(`/root/reference/utils/click_options.py:216-317`, ``osc_damp`` /
``osc_freeze``) **with no implementation behind it** — the flags are parsed
into the config and never consumed. This module is the working algorithm the
flags describe (Nagel et al., "Overcoming Oscillations in Quantization-Aware
Training", ICML 2022 — the paper the flag vocabulary comes from):

* **Dampening** (``oscillations_dampen_*``): a regularization term
  ``sum((sg(quantize(w)) - w)^2)`` added to the loss. The quantized value is
  a constant (stop-gradient), so the gradient ``2*(w - w_q)`` pulls each
  latent weight toward the center of its current quantization bin, shrinking
  the distance-to-boundary drift that causes bin flipping. Aggregations:
  ``sum`` | ``mean`` (global) | ``kernel_mean`` (per-kernel mean, summed) —
  the reference's choices. The weight anneals with the reference's
  ``CosineTempDecay`` schedule (utils/utils.py:283-294) from ``weight`` to
  ``weight_final`` starting at ``anneal_start`` of training.

* **Freezing** (``oscillations_freeze_*``): per-weight oscillation frequency
  is tracked as an EMA of flip events — an oscillation is an integer-code
  change whose direction reverses the previous change
  (``freq = m*osc + (1-m)*freq``). When ``freq`` exceeds the (annealed)
  threshold the weight freezes: its integer code is pinned (to the rounded
  EMA of past codes when ``use_ema``, else the code at freeze time), the
  latent weight is projected onto that code's dequantized value, and its
  gradient updates are masked to zero from then on. Only uniform-quantizer
  layers with ``n_bits <= max_bits`` are tracked (the flags target low-bit
  INT QAT; FP8 grids rarely oscillate because their bins scale with
  magnitude).

Everything is functional: the tracker state is a pytree keyed by layer path,
threaded through the jitted QAT step (see ``qat.make_qat_step``).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import OscDampConfig, OscFreezeConfig, QMethod, QuantizerConfig
from . import quantizers

FreezeState = Dict[str, Dict[str, jnp.ndarray]]


def cosine_anneal(step, total_steps: int, start: float,
                  final: Optional[float], rel_start: float):
    """``CosineTempDecay`` (utils/utils.py:283-294) as a jittable schedule:
    constant ``start`` before ``rel_start * total_steps``, then cosine decay
    to ``final``. ``final=None`` means no annealing (constant)."""
    if final is None:
        return jnp.float32(start)
    t0 = rel_start * total_steps
    rel = jnp.clip((step - t0) / max(total_steps - t0, 1e-9), 0.0, 1.0)
    return final + 0.5 * (start - final) * (1.0 + jnp.cos(rel * jnp.pi))


def iter_weight_sites(model_params, quant_tree, path=()
                      ) -> Iterator[Tuple[Tuple[str, ...], jnp.ndarray, dict]]:
    """Yield ``(path, kernel, weight-quantizer state)`` for each quantized
    kernel: flax layout pairs ``params/<layer>/kernel`` with
    ``quant/<layer>/weight_quantizer/q``."""
    if not isinstance(model_params, dict):
        return
    kernel = model_params.get("kernel")
    if kernel is not None and isinstance(quant_tree, dict):
        q = (quant_tree.get("weight_quantizer") or {}).get("q")
        if q is not None:
            yield path, kernel, q
    for key, child in model_params.items():
        if isinstance(child, dict):
            qchild = (quant_tree.get(key, {})
                      if isinstance(quant_tree, dict) else {})
            yield from iter_weight_sites(child, qchild, path + (key,))


# --------------------------------------------------------------------------
# Dampening
# --------------------------------------------------------------------------

def dampening_loss(model_params, quant_tree, wq_cfg: QuantizerConfig,
                   aggregation: str = "kernel_mean", channel_axis: int = -1):
    """Bin-center regularizer over every quantized kernel.

    ``sg(w_q)`` keeps the quantizer out of the gradient: the STE would make
    ``d(w_q)/dw = 1`` and the loss gradient identically zero.
    """
    total = jnp.float32(0.0)
    count = 0
    for _path, w, q in iter_weight_sites(model_params, quant_tree):
        w_q = jax.lax.stop_gradient(
            quantizers.apply(wq_cfg, q, w, channel_axis=channel_axis))
        err = (w_q - w.astype(jnp.float32)) ** 2
        if aggregation == "kernel_mean":
            total = total + err.mean()
        else:
            total = total + err.sum()
            count += err.size
    if aggregation == "mean" and count:
        total = total / count
    return total


def dampening_weight(cfg: OscDampConfig, step, total_steps: int):
    """Annealed regularizer weight for the current step."""
    return cosine_anneal(step, total_steps, cfg.weight, cfg.weight_final,
                         cfg.anneal_start)


# --------------------------------------------------------------------------
# Freezing
# --------------------------------------------------------------------------

def _int_coords(wq_cfg: QuantizerConfig, q: dict, w, channel_axis: int = -1):
    """(x_int, scale, zero_point) of ``w`` on its frozen uniform grid —
    the integer-domain view of ``quantizers.uniform_apply``."""
    delta = quantizers.bcast_param(q["delta"], w.ndim, channel_axis)
    scale = quantizers._uniform_scale(wq_cfg, delta)
    if wq_cfg.method == QMethod.symmetric_uniform:
        int_min, int_max = quantizers._sym_int_bounds(wq_cfg, q["signed"])
        zero_point = jnp.float32(0.0)
    else:
        int_min, int_max = 0.0, 2.0 ** wq_cfg.n_bits - 1
        zp = jnp.round(quantizers.bcast_param(q["zero_float"], w.ndim,
                                              channel_axis))
        zero_point = jnp.clip(zp, int_min, int_max)
    x_int = jnp.clip(jnp.round(w / scale) + zero_point, int_min, int_max)
    return x_int, scale, zero_point


def _tracked(cfg: OscFreezeConfig, wq_cfg: QuantizerConfig) -> bool:
    return (cfg.threshold > 0.0
            and wq_cfg.method != QMethod.fp_quantizer
            and wq_cfg.n_bits <= cfg.max_bits)


def freeze_init(cfg: OscFreezeConfig, wq_cfg: QuantizerConfig,
                model_params, quant_tree) -> FreezeState:
    """Per-weight tracker state; empty when freezing doesn't apply."""
    state: FreezeState = {}
    if not _tracked(cfg, wq_cfg):
        return state
    for path, w, q in iter_weight_sites(model_params, quant_tree):
        x_int, _, _ = _int_coords(wq_cfg, q, w)
        state["/".join(path)] = {
            "prev_int": x_int,
            "prev_dir": jnp.zeros_like(x_int),
            "freq": jnp.zeros_like(x_int),
            "int_ema": x_int,
            "frozen": jnp.zeros(x_int.shape, jnp.bool_),
            "target_int": x_int,
        }
    return state


def freeze_update(cfg: OscFreezeConfig, wq_cfg: QuantizerConfig,
                  state: FreezeState, model_params, quant_tree,
                  threshold) -> FreezeState:
    """One tracking step AFTER the optimizer update: detect direction-
    reversing integer-code flips, update the frequency EMA, and freeze
    weights whose frequency crosses ``threshold``."""
    m = cfg.ema_momentum
    new_state: FreezeState = {}
    sites = {"/".join(p): (w, q)
             for p, w, q in iter_weight_sites(model_params, quant_tree)}
    for key, s in state.items():
        w, q = sites[key]
        x_int, _, _ = _int_coords(wq_cfg, q, w)
        changed = x_int != s["prev_int"]
        direction = jnp.sign(x_int - s["prev_int"])
        osc = changed & (direction == -s["prev_dir"]) & (s["prev_dir"] != 0)
        freq = m * osc.astype(jnp.float32) + (1.0 - m) * s["freq"]
        int_ema = m * x_int + (1.0 - m) * s["int_ema"]
        newly = (freq > threshold) & ~s["frozen"]
        pin = jnp.round(int_ema) if cfg.use_ema else x_int
        new_state[key] = {
            "prev_int": x_int,
            "prev_dir": jnp.where(changed, direction, s["prev_dir"]),
            "freq": freq,
            "int_ema": int_ema,
            "frozen": s["frozen"] | newly,
            "target_int": jnp.where(newly, pin, s["target_int"]),
        }
    return new_state


def freeze_threshold(cfg: OscFreezeConfig, step, total_steps: int):
    return cosine_anneal(step, total_steps, cfg.threshold,
                         cfg.threshold_final, cfg.anneal_start)


def project_frozen(wq_cfg: QuantizerConfig, state: FreezeState,
                   model_params, quant_tree):
    """Pin the latent weights of frozen entries onto their target code's
    dequantized value, so the forward quantizer reproduces the frozen code
    exactly. Returns updated model_params."""
    if not state:
        return model_params
    sites = {"/".join(p): (p, w, q)
             for p, w, q in iter_weight_sites(model_params, quant_tree)}
    out = _deep_dict_copy(model_params)

    def set_kernel(tree, path, value):
        node = tree
        for k in path:
            node = node[k]
        node["kernel"] = value

    for key, s in state.items():
        path, w, q = sites[key]
        _, scale, zero_point = _int_coords(wq_cfg, q, w)
        pinned = scale * (s["target_int"] - zero_point)
        set_kernel(out, path, jnp.where(s["frozen"], pinned, w))
    return out


def _deep_dict_copy(tree):
    if isinstance(tree, dict):
        return {k: _deep_dict_copy(v) for k, v in tree.items()}
    return tree


def mask_frozen_updates(state: FreezeState, updates):
    """Zero the optimizer updates of frozen weights (their kernels are
    pinned; any gradient drift would unfreeze them numerically)."""
    if not state:
        return updates
    out = _deep_dict_copy(updates)

    def mask(node, path):
        for key, child in list(node.items()):
            if isinstance(child, dict):
                mask(child, path + (key,))
            elif key == "kernel":
                skey = "/".join(path)
                if skey in state:
                    node[key] = jnp.where(state[skey]["frozen"],
                                          jnp.zeros_like(child), child)

    mask(out, ())
    return out


def frozen_fraction(state: FreezeState) -> jnp.ndarray:
    """Diagnostic: fraction of tracked weights currently frozen."""
    if not state:
        return jnp.float32(0.0)
    tot = sum(s["frozen"].size for s in state.values())
    frz = sum(jnp.sum(s["frozen"]) for s in state.values())
    return frz / tot
