"""Training-loop driver: QAT epochs with eval, checkpointing, logging.

~ reference ``utils/supervised_driver.py:11-111`` (ignite trainer/evaluator
factory with per-epoch Checkpoint and TensorBoard logging — unused by the
reference's main PTQ flow but part of its surface). Here: a plain loop over
the jitted QAT step with periodic evaluation, BN re-estimation, orbax
checkpoints (n_saved=1 semantics: latest only), and optional TensorBoard
scalars.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

import jax

from ..quant.qat import (
    RANGE_PARAM_NAMES,
    make_optimizer,
    make_qat_step,
    merge_variables,
    trainable_range_params,
)
from .driver import evaluate, reestimate_bn


class TensorBoardLogger:
    """Minimal scalar logger (supervised_driver.py:89-111). Uses tf.summary
    when tensorflow is importable, else accumulates in memory."""

    def __init__(self, log_dir: Optional[str]):
        self.log_dir = log_dir
        self.history: list = []
        self._writer = None
        if log_dir:
            try:
                import tensorflow as tf

                self._writer = tf.summary.create_file_writer(log_dir)
            except ImportError:
                pass

    def scalar(self, tag: str, value: float, step: int):
        self.history.append((tag, float(value), step))
        if self._writer is not None:
            import tensorflow as tf

            with self._writer.as_default():
                tf.summary.scalar(tag, value, step=step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()


def train_qat(
    model,
    variables: dict,
    train_batches: Callable[[], Iterable],
    *,
    max_epochs: int = 1,
    eval_batches: Optional[Callable[[], Iterable]] = None,
    optimizer: str = "SGD",
    learning_rate: float = 1e-3,
    momentum: float = 0.9,
    weight_decay: Optional[float] = None,
    learning_rate_schedule: Optional[str] = None,
    sep_quant_optimizer: bool = False,
    quant_optimizer: str = "Adam",
    quant_learning_rate: float = 1e-4,
    grad_scaling: bool = False,
    reestimate_bn_stats: bool = True,
    save_checkpoint_dir: Optional[str] = None,
    tb_logging_dir: Optional[str] = None,
    steps_per_epoch: Optional[int] = None,
    model_kwargs: Optional[dict] = None,
    osc_damp=None,
    osc_freeze=None,
):
    """Run QAT; returns (variables, history of per-epoch metrics)."""
    spe = steps_per_epoch or 1000
    total = spe * max_epochs
    model_opt = make_optimizer(optimizer, learning_rate, momentum,
                               weight_decay, learning_rate_schedule, total,
                               steps_per_epoch=spe)
    quant_opt = (
        make_optimizer(quant_optimizer, quant_learning_rate)
        if sep_quant_optimizer else None
    )
    trainable = (trainable_range_params(model.qc)
                 if hasattr(model, "qc") else RANGE_PARAM_NAMES)
    step, init_state = make_qat_step(
        model, model_opt, quant_opt, grad_scaling=grad_scaling,
        trainable=trainable, model_kwargs=model_kwargs,
        osc_damp=osc_damp, osc_freeze=osc_freeze, total_steps=total,
    )
    state = init_state(variables)
    tb = TensorBoardLogger(tb_logging_dir)

    history = []
    global_step = 0
    for epoch in range(max_epochs):
        for x, y in train_batches():
            state, loss = step(state, jax.numpy.asarray(x), jax.numpy.asarray(y))
            tb.scalar("train/loss", float(loss), global_step)
            global_step += 1
            if steps_per_epoch and global_step % steps_per_epoch == 0:
                break

        variables = merge_variables(state[0], state[1], state[2])
        if reestimate_bn_stats:
            # BN stats come from TRAINING data (utils/qat_utils.py feeds the
            # train loader) — never from the eval set
            variables = reestimate_bn(model, variables, train_batches(),
                                      model_kwargs=model_kwargs)
            # keep optimizer state; refresh the rest snapshot
            if "batch_stats" in variables:
                state = state._replace(rest={
                    **state.rest, "batch_stats": variables["batch_stats"]})

        metrics = {}
        if eval_batches is not None:
            metrics = evaluate(model, variables, eval_batches(),
                               model_kwargs=model_kwargs)
            for k, v in metrics.items():
                tb.scalar(f"eval/{k}", v, epoch)
        history.append({"epoch": epoch, "loss": float(loss), **metrics})

        if save_checkpoint_dir:
            from ..utils.checkpoint import save_checkpoint

            save_checkpoint(os.path.join(save_checkpoint_dir, "latest"),
                            variables)
    tb.flush()
    return variables, history
