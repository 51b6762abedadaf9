"""Eval driver: calibrate -> fix -> (BN re-estimate) -> evaluate.

The functional counterpart of ``validate_quantized``
(`/root/reference/image_net.py:59-203`) + ``pass_data_for_range_estimation``
(`quantization/utils.py:74-115`) + ``reestimate_BN_stats``
(`utils/qat_utils.py:60-108`). Phases are explicit jitted steps over the
variables pytree instead of mutated module state:

1. calibration: ESTIMATE-phase forwards over <= num_est_batches, threading
   the ``quant``/``quant_est`` collections through each step;
2. ranges freeze by construction (FIXED phase reads frozen state);
3. optional BN re-estimation: per-batch batch-stats snapshots averaged;
4. jitted eval loop accumulating psum-able metric state.
"""

from __future__ import annotations

import dataclasses
import datetime
import functools
import json
import os
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..quant.sites import QuantPhase
from ..utils.misc import approx_compiler_options
from .metrics import MetricState, finalize_metrics, update_metrics

Batch = Tuple[Any, Any]


def calibrate(
    model,
    variables: dict,
    batches: Iterable[Any],
    *,
    num_est_batches: Optional[int] = None,
    quant_w: bool = True,
    quant_a: bool = True,
    model_kwargs: Optional[dict] = None,
) -> dict:
    """Range-estimation pass (quantization/utils.py:74-115). ``batches``
    yields model inputs (or (input, label) pairs — labels ignored)."""
    qp = QuantPhase(phase="estimate", quant_w=quant_w, quant_a=quant_a)
    model_kwargs = model_kwargs or {}

    @functools.partial(jax.jit,
                       compiler_options=approx_compiler_options(model))
    def step(variables, x):
        _, ups = model.apply(
            variables, x, qp, mutable=["quant", "quant_est"], **model_kwargs
        )
        return ups

    for i, batch in enumerate(batches):
        if num_est_batches is not None and i >= num_est_batches:
            break
        x = batch[0] if isinstance(batch, tuple) else batch
        ups = step(variables, jnp.asarray(x))
        variables = {**variables, **ups}
    return variables


def reestimate_bn(
    model,
    variables: dict,
    batches: Iterable[Any],
    *,
    num_batches: int = 50,
    quant_w: bool = True,
    quant_a: bool = True,
    model_kwargs: Optional[dict] = None,
) -> dict:
    """BN re-estimation (utils/qat_utils.py:60-108): run N batches with
    momentum=1-style batch stats, then average the per-batch stats."""
    qp = QuantPhase(phase="fixed", quant_w=quant_w, quant_a=quant_a,
                    reestimate_bn=True)
    model_kwargs = model_kwargs or {}

    @jax.jit
    def step(variables, x):
        _, ups = model.apply(
            variables, x, qp, mutable=["batch_stats"], **model_kwargs
        )
        return ups["batch_stats"]

    if "batch_stats" not in variables:
        return variables

    total = None
    count = 0
    for i, batch in enumerate(batches):
        if i >= num_batches:
            break
        x = batch[0] if isinstance(batch, tuple) else batch
        stats = step(variables, jnp.asarray(x))
        total = stats if total is None else jax.tree.map(jnp.add, total, stats)
        count += 1
    if count == 0:
        return variables
    avg = jax.tree.map(lambda t: t / count, total)
    return {**variables, "batch_stats": avg}


def cache_quantized_weights(
    model,
    variables: dict,
    example,
    *,
    quant_a: bool = True,
    fast: bool = False,
    model_kwargs: Optional[dict] = None,
) -> dict:
    """Materialize frozen quantized weights into the ``quant_cache``
    collection (one forward); fixed-phase inference then skips per-call
    weight quantization. ``fast=True`` stores them bfloat16 (lossless for
    the grid) for the bf16 fast inference mode."""
    qp = QuantPhase(phase="fixed", quant_a=quant_a, cache_weights=True,
                    fast=fast)
    _, ups = model.apply(
        variables, example, qp, mutable=["quant_cache"],
        **(model_kwargs or {}),
    )
    return {**variables, **ups}


def evaluate(
    model,
    variables: dict,
    batches: Iterable[Batch],
    *,
    quant_w: bool = True,
    quant_a: bool = True,
    fast: bool = False,
    packed: bool = False,
    chained: bool = False,
    topk: int = 5,
    model_kwargs: Optional[dict] = None,
) -> Dict[str, float]:
    """Jitted eval loop with accumulator metrics (image_net.py:129-181).
    ``fast=True`` evaluates in the bf16 fast inference mode (QuantPhase.fast;
    pair with weights cached via ``cache_quantized_weights(fast=True)``).
    ``packed=True`` additionally uses byte-packed weight codes installed by
    ``ops.fastpath.pack_dense_caches`` (FP: Pallas dequant matmul; uniform:
    native int8 MXU); layers without codes fall through.
    ``chained=True`` (uniform per-tensor configs, on top of packed) passes
    int8 activation codes between layers — value-identical, 1 B/element
    inter-layer traffic (quant/sites.py::Coded)."""
    qp = QuantPhase(phase="fixed", quant_w=quant_w, quant_a=quant_a,
                    fast=fast, packed=packed, chained=chained)
    model_kwargs = model_kwargs or {}

    # variables are a traced argument (not a closure) so repeated evaluate()
    # calls reuse the compiled executable instead of re-embedding weights.
    # approx-armed conv models get the scoped-VMEM compiler option
    # automatically (utils.misc.approx_compiler_options) so the flagship
    # approx eval is config-free on TPU
    @functools.partial(jax.jit,
                       compiler_options=approx_compiler_options(model))
    def step(variables, state: MetricState, x, y):
        logits = model.apply(variables, x, qp, **model_kwargs)
        return update_metrics(state, logits, y, k=topk)

    state = MetricState.zero()
    for x, y in batches:
        state = step(variables, state, jnp.asarray(x), jnp.asarray(y))
    return finalize_metrics(state)


def validate_quantized(
    model,
    variables: dict,
    calib_batches: Iterable[Any],
    eval_batches: Iterable[Batch],
    *,
    num_est_batches: int = 1,
    quant_w: bool = True,
    quant_a: bool = True,
    fast: bool = False,
    packed: bool = False,
    chained: bool = False,
    qc=None,
    calib_example=None,
    bn_reestimate_batches: Optional[Iterable[Any]] = None,
    model_kwargs: Optional[dict] = None,
) -> Tuple[Dict[str, float], dict]:
    """The full validate-quantized pipeline (image_net.py:59-203).

    ``packed=True`` (requires ``qc`` + ``calib_example``) additionally
    freezes the quantized weights and installs byte-packed codes
    (``ops.fastpath.pack_dense_caches``) before evaluating with
    ``QuantPhase.packed`` — real 8-bit storage / the int8 MXU path.

    Returns (final_metrics, calibrated variables).
    """
    variables = calibrate(
        model, variables, calib_batches, num_est_batches=num_est_batches,
        quant_w=quant_w, quant_a=quant_a, model_kwargs=model_kwargs,
    )
    if bn_reestimate_batches is not None:
        variables = reestimate_bn(
            model, variables, bn_reestimate_batches,
            quant_w=quant_w, quant_a=quant_a, model_kwargs=model_kwargs,
        )
    if packed:
        if qc is None or calib_example is None:
            raise ValueError("packed eval needs qc and calib_example")
        from ..ops.fastpath import pack_dense_caches

        variables = cache_quantized_weights(
            model, variables, calib_example, quant_a=quant_a, fast=fast,
            model_kwargs=model_kwargs,
        )
        variables, _report = pack_dense_caches(variables, qc)
    metrics = evaluate(
        model, variables, eval_batches,
        quant_w=quant_w, quant_a=quant_a, fast=fast, packed=packed,
        chained=chained, model_kwargs=model_kwargs,
    )
    return metrics, variables


def write_result_file(
    output_dir: str,
    arch: str,
    approx_cfg,
    run_method_cfg,
    metrics: Dict[str, float],
) -> str:
    """Run-result artifact, reference naming scheme (image_net.py:185-202):
    ``<out>/<arch>/E{e}M{m}D{d}/D{d}_<timestamp>.txt``."""
    e, m, d = approx_cfg.expo_width, approx_cfg.mant_width, approx_cfg.dnsmp_factor
    subdir = os.path.join(output_dir, arch, f"E{e}M{m}D{d}")
    os.makedirs(subdir, exist_ok=True)
    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    path = os.path.join(subdir, f"D{d}_{stamp}.txt")
    with open(path, "w") as f:
        f.write(f"run_method: {dataclasses.asdict(run_method_cfg)}\n")
        f.write(f"approx_params: {dataclasses.asdict(approx_cfg)}\n")
        f.write(f"final_metrics: {json.dumps(metrics)}\n")
    return path
