"""QAT: range learning, parameter partitioning, optimizers, train step.

Functional counterpart of the reference's (side) training path:

* ``partition_variables`` ~ ``separate_quantized_model_params``
  (quantization/utils.py:15-71): split trainables into quantizer-range
  params (maxval / mantissa_bits / delta / zero_float) and model weights so
  each group can get its own optimizer (--sep-quant-optimizer,
  click_options.py:197-202).
* ``make_optimizer`` ~ ``utils/optimizer_utils.py:8-39`` (SGD/Adam +
  MultiStepLR / cosine schedules) on optax.
* ``qat_train_step`` ~ the ignite trainer step (utils/supervised_driver.py:
  11-60) with ``learn_ranges`` semantics: the ``quant`` collection is
  differentiable (STE custom-vjps flow gradients into maxval/mantissa_bits)
  and LSQ gradient scaling is a phase flag.

The reference's oscillation dampening/freezing flags (click_options.py:
216-317) are CLI-only there — no implementation exists in the reference to
mirror.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import OscDampConfig, OscFreezeConfig, QuantConfig
from .sites import QuantPhase

RANGE_PARAM_NAMES = ("maxval", "mantissa_bits", "delta", "zero_float")


class QATState(NamedTuple):
    """Train-step carry. Indexes [0..4] match the historical plain tuple."""

    model_params: dict
    quant_train: dict
    rest: dict
    m_opt_state: object
    q_opt_state: object
    # oscillation tracking: {"freeze": FreezeState, "step": int32 scalar}
    osc: dict


def _split_quant(tree, trainable: Tuple[str, ...] = RANGE_PARAM_NAMES):
    """Split a ``quant`` collection into (trainable range params, frozen)."""
    train, frozen = {}, {}
    for k, v in tree.items():
        if isinstance(v, dict):
            t, f = _split_quant(v, trainable)
            if t:
                train[k] = t
            if f:
                frozen[k] = f
        elif k in trainable:
            train[k] = v
        else:
            frozen[k] = v
    return train, frozen


def trainable_range_params(qc) -> Tuple[str, ...]:
    """Which range params QAT may train, per the config's learn flags
    (the reference's ``make_range_trainable``, fp8_quantizer.py:289-301 /
    uniform_quantizers.py:242-246: uniform delta/zero_float always become
    Parameters in learn_ranges; FP maxval/mantissa_bits only when their
    learn flags are set)."""
    names = ["delta", "zero_float"]
    if qc.fp8.learn_maxval:
        names.append("maxval")
    if qc.fp8.learn_mantissa_bits:
        names.append("mantissa_bits")
    return tuple(names)


def partition_variables(variables: dict,
                        trainable: Tuple[str, ...] = RANGE_PARAM_NAMES
                        ) -> Tuple[dict, dict, dict]:
    """Split a variables dict into (model_params, quant_params, rest).

    model_params: the ``params`` collection. quant_params: the ``trainable``
    leaves of the ``quant`` collection (see ``trainable_range_params``).
    rest: everything else (estimator state, batch stats, integer flags) —
    not optimized.
    """
    model_params = variables.get("params", {})
    quant = variables.get("quant", {})
    quant_train, quant_frozen = _split_quant(quant, trainable)
    rest = {k: v for k, v in variables.items() if k not in ("params", "quant")}
    rest["_quant_frozen"] = quant_frozen
    return model_params, quant_train, rest


def merge_variables(model_params: dict, quant_train: dict, rest: dict) -> dict:
    """Inverse of ``partition_variables``."""
    quant_frozen = rest.get("_quant_frozen", {})

    def merge(a, b):
        out = dict(a)
        for k, v in b.items():
            if k in out and isinstance(out[k], dict):
                out[k] = merge(out[k], v)
            else:
                out[k] = v
        return out

    variables = {k: v for k, v in rest.items() if k != "_quant_frozen"}
    variables["params"] = model_params
    variables["quant"] = merge(quant_frozen, quant_train)
    return variables


def make_schedule(base_lr: float, schedule: Optional[str], total_steps: int,
                  steps_per_epoch: int = 1):
    """'MultiStepLR:10:20:40' or 'cosine:1e-4' (optimizer_utils.py:24-39).

    MultiStepLR milestones are EPOCH indices (the reference steps its
    scheduler once per epoch); they scale by ``steps_per_epoch`` to become
    optimizer-step boundaries."""
    if not schedule:
        return base_lr
    kind, *rest = schedule.split(":")
    if kind == "MultiStepLR":
        milestones = [int(m) for m in rest]
        return optax.piecewise_constant_schedule(
            base_lr, {m * steps_per_epoch: 0.1 for m in milestones}
        )
    if kind == "cosine":
        final = float(rest[0]) if rest else 0.0
        return optax.cosine_decay_schedule(
            base_lr, total_steps, alpha=final / base_lr if base_lr else 0.0
        )
    raise ValueError(f"unknown schedule {schedule}")


def make_optimizer(
    name: str = "SGD",
    learning_rate: float = 0.01,
    momentum: float = 0.9,
    weight_decay: Optional[float] = None,
    schedule: Optional[str] = None,
    total_steps: int = 10_000,
    steps_per_epoch: int = 1,
) -> optax.GradientTransformation:
    """SGD/Adam factory (optimizer_utils.py:8-23)."""
    lr = make_schedule(learning_rate, schedule, total_steps, steps_per_epoch)
    if name.upper() == "SGD":
        opt = optax.sgd(lr, momentum=momentum)
    elif name.upper() == "ADAM":
        opt = optax.adam(lr)
    else:
        raise ValueError(f"unknown optimizer {name}")
    if weight_decay:
        opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    return opt


def _merge_quant_tree(quant_train: dict, rest: dict) -> dict:
    """Full ``quant`` collection from its partitioned halves."""
    return merge_variables({}, quant_train, rest)["quant"]


def make_qat_step(
    model,
    model_opt: optax.GradientTransformation,
    quant_opt: Optional[optax.GradientTransformation] = None,
    *,
    grad_scaling: bool = False,
    estimate_ranges_train: bool = False,
    trainable: Tuple[str, ...] = RANGE_PARAM_NAMES,
    model_kwargs: Optional[dict] = None,
    qc: Optional[QuantConfig] = None,
    osc_damp: Optional[OscDampConfig] = None,
    osc_freeze: Optional[OscFreezeConfig] = None,
    total_steps: int = 10_000,
):
    """Build a jitted QAT train step over (model_params, quant_params).

    Default mode is the ``learn_ranges`` state
    (quantization_manager.py:100-103): ranges are frozen values that receive
    gradients. With ``estimate_ranges_train`` the ``estimate_ranges_train``
    Qstate applies instead (quantization_manager.py:105-107,134-139): range
    estimators keep updating from every training batch and override the
    gradient updates on range params.

    ``osc_damp`` / ``osc_freeze`` enable the oscillation dampening loss and
    the EMA-frequency freezer (``quant/oscillations.py`` — the working
    implementation behind the reference's flags-only ``osc_damp``/
    ``osc_freeze`` namespaces, click_options.py:216-317). Both need ``qc``
    (the model's QuantConfig) to interpret the weight-quantizer states;
    ``total_steps`` drives their cosine annealing schedules.
    """
    from . import oscillations as osc

    quant_opt = quant_opt or model_opt
    qp = QuantPhase(
        phase="estimate" if estimate_ranges_train else "fixed",
        grad_scaling=grad_scaling,
    )
    model_kwargs = model_kwargs or {}
    damp_on = osc_damp is not None and osc_damp.enabled
    freeze_on = osc_freeze is not None and osc_freeze.enabled
    if (damp_on or freeze_on) and qc is None:
        qc = getattr(model, "qc", None)
        if qc is None:
            raise ValueError("oscillation dampening/freezing needs qc")
    wq_cfg = qc.weight_quantizer() if qc is not None else None

    def loss_fn(model_params, quant_train, rest, x, y, osc_step):
        variables = merge_variables(model_params, quant_train, rest)
        if estimate_ranges_train:
            logits, ups = model.apply(
                variables, x, qp, mutable=["quant", "quant_est"],
                **model_kwargs,
            )
        else:
            logits = model.apply(variables, x, qp, **model_kwargs)
            ups = {}
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, y
        ).mean()
        if damp_on:
            w = osc.dampening_weight(osc_damp, osc_step, total_steps)
            loss = loss + w * osc.dampening_loss(
                model_params, variables["quant"], wq_cfg,
                osc_damp.aggregation)
        return loss, ups

    @jax.jit
    def step(state, x, y):
        if len(state) == 5:
            # pre-oscillation 5-tuple API: append the default osc carry so
            # externally persisted / hand-built states keep working
            state = QATState(*state, {"step": jnp.int32(0)})
        (model_params, quant_train, rest, m_opt_state, q_opt_state,
         osc_state) = state
        osc_step = osc_state.get("step", jnp.int32(0))
        (loss, ups), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                has_aux=True)(
            model_params, quant_train, rest, x, y, osc_step
        )
        g_model, g_quant = grads
        upd_m, m_opt_state = model_opt.update(g_model, m_opt_state, model_params)
        if freeze_on:
            upd_m = osc.mask_frozen_updates(osc_state["freeze"], upd_m)
        model_params = optax.apply_updates(model_params, upd_m)
        upd_q, q_opt_state = quant_opt.update(g_quant, q_opt_state, quant_train)
        quant_train = optax.apply_updates(quant_train, upd_q)
        if estimate_ranges_train:
            # estimator-driven ranges override gradient updates
            new_qt, new_frozen = _split_quant(ups["quant"], trainable)
            quant_train = new_qt
            rest = dict(rest, _quant_frozen=new_frozen,
                        quant_est=ups["quant_est"])
        if freeze_on:
            quant_tree = _merge_quant_tree(quant_train, rest)
            thr = osc.freeze_threshold(osc_freeze, osc_step, total_steps)
            fstate = osc.freeze_update(osc_freeze, wq_cfg,
                                       osc_state["freeze"], model_params,
                                       quant_tree, thr)
            model_params = osc.project_frozen(wq_cfg, fstate, model_params,
                                              quant_tree)
            osc_state = dict(osc_state, freeze=fstate)
        osc_state = dict(osc_state, step=osc_step + 1)
        return QATState(model_params, quant_train, rest, m_opt_state,
                        q_opt_state, osc_state), loss

    def init_state(variables: dict) -> QATState:
        model_params, quant_train, rest = partition_variables(variables,
                                                              trainable)
        osc_state = {"step": jnp.int32(0)}
        if freeze_on:
            quant_tree = _merge_quant_tree(quant_train, rest)
            osc_state["freeze"] = osc.freeze_init(osc_freeze, wq_cfg,
                                                  model_params, quant_tree)
        return QATState(
            model_params,
            quant_train,
            rest,
            model_opt.init(model_params),
            quant_opt.init(quant_train),
            osc_state,
        )

    return step, init_state
