"""Command-line interface: ``validate-quantized`` and friends.

Argparse re-implementation of the reference click CLI
(`/root/reference/image_net.py:37-226` + `utils/click_options.py`): same
command names, same kebab-case flags, same defaults, so the reference's
experiment scripts (scripts/image_net.sh flag sets) port directly. click is
not a dependency of this framework.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Optional

from .config import (
    ApproxConfig,
    EstimatorConfig,
    FP8Config,
    OptMethod,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)

logger = logging.getLogger("fp8_quantization_tpu")

ARCH_CHOICES = [
    "mobilenet_v2_quantized",
    "resnet18_quantized",
    "resnet50_quantized",
    "vit_quantized",
    # bert_quantized takes token inputs — served by nlp.py, not this CLI
    "demo_quantized",
    # approx twins resolve to the same TPU-native models; the approx behavior
    # is carried by the run-method flags (the reference duplicates the model
    # files only to change the surgery import, SURVEY.md §2.6)
    "mobilenet_v2_quantized_approx",
    "resnet18_quantized_approx",
    "resnet50_quantized_approx",
    "vit_quantized_approx",
]


def _add_bool_flag(p, name: str, default: bool, help: str = ""):
    """click-style ``--x/--no-x`` flag pair."""
    dest = name.replace("-", "_")
    group = p.add_mutually_exclusive_group()
    group.add_argument(f"--{name}", dest=dest, action="store_true", help=help)
    group.add_argument(f"--no-{name}", dest=dest, action="store_false")
    p.set_defaults(**{dest: default})


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="image_net.py")
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p):
        # base_options (click_options.py:23-103)
        p.add_argument("--images-dir", type=str, default=None,
                       help="Root directory of images (expects <dir>/val)")
        p.add_argument("--interpolation", type=str, default="bilinear")
        p.add_argument("--batch-size", type=int, default=128)
        p.add_argument("--num-workers", type=int, default=16)
        p.add_argument("--fast-mode", action="store_true",
                       help="evaluate in the bf16 fast inference mode "
                            "(quant sites emit bf16; matmuls accumulate f32)")
        p.add_argument("--packed-weights", action="store_true",
                       help="freeze + byte-pack dense weights before eval "
                            "(FP: 1-byte ExMy codes + fused dequant kernel; "
                            "uniform: native int8 MXU path)")
        p.add_argument("--chained-acts", action="store_true",
                       help="chained int8 serving (with --packed-weights, "
                            "uniform per-tensor configs): activation sites "
                            "pass int8 codes between layers — value-"
                            "identical, 1 B/element inter-layer traffic")
        p.add_argument("--native-loader", action="store_true",
                       help="decode/preprocess val batches in the C++ "
                            "thread pool (runtime/libimage_loader.so)")
        p.add_argument("--seed", type=int, default=None)
        p.add_argument("--architecture", type=str, required=True,
                       choices=ARCH_CHOICES)
        p.add_argument("--model-dir", type=str, default=None,
                       help="Path to FP32 torch checkpoint (.pth/.pth.tar) or "
                            "orbax/npz checkpoint")
        _add_bool_flag(p, "pretrained", True)
        _add_bool_flag(p, "progress-bar", False)
        p.add_argument("--save-checkpoint-dir", type=str, default=None)
        # accepted for reference-script compatibility; device selection is
        # jax-level and load_type is inferred from the checkpoint format
        _add_bool_flag(p, "cuda", True)
        p.add_argument("--load-type", type=str, default="fp32",
                       choices=["fp32", "quantized"])

        # quantization_options (click_options.py:320-447)
        _add_bool_flag(p, "weight-quant", True)
        _add_bool_flag(p, "act-quant", True)
        p.add_argument("--qmethod", type=str, default="symmetric_uniform",
                       choices=[m.value for m in QMethod])
        p.add_argument("--qmethod-act", type=str, default=None,
                       choices=[m.value for m in QMethod])
        p.add_argument("--weight-quant-method", type=str,
                       default="current_minmax",
                       choices=[m.value for m in RangeMethod])
        p.add_argument("--weight-opt-method", type=str, default="grid",
                       choices=[m.value for m in OptMethod])
        p.add_argument("--num-candidates", type=int, default=None)
        p.add_argument("--n-bits", type=int, default=8)
        p.add_argument("--n-bits-act", type=int, default=None)
        _add_bool_flag(p, "per-channel", False)
        p.add_argument("--act-quant-method", type=str, default="running_minmax",
                       choices=[m.value for m in RangeMethod])
        p.add_argument("--act-opt-method", type=str, default="grid",
                       choices=[m.value for m in OptMethod])
        p.add_argument("--act-num-candidates", type=int, default=None)
        p.add_argument("--act-momentum", type=float, default=None)
        p.add_argument("--num-est-batches", type=int, default=1)
        p.add_argument("--quant-setup", type=str, default="all",
                       choices=["all", "LSQ", "FP_logits", "fc4", "fc4_dw8",
                                "LSQ_paper"])
        _add_bool_flag(p, "quantize-input", False)

        # fp8_options (click_options.py:450-481)
        p.add_argument("--fp8-maxval", type=float, default=None)
        p.add_argument("--fp8-mantissa-bits", type=int, default=4)
        _add_bool_flag(p, "fp8-set-maxval", False)
        _add_bool_flag(p, "fp8-learn-maxval", False)
        _add_bool_flag(p, "fp8-learn-mantissa-bits", False)
        _add_bool_flag(p, "fp8-mse-include-mantissa-bits", True)
        _add_bool_flag(p, "fp8-allow-unsigned", False)

        # run_method_options (click_options.py:483-501)
        _add_bool_flag(p, "approx_flag", False)
        _add_bool_flag(p, "quantize-after-mult-and-add", False)
        _add_bool_flag(p, "res-quantizer-flag", False)
        _add_bool_flag(p, "original-quantize-res", False)

        # approx_options (click_options.py:503-542)
        p.add_argument("--expo-width", type=int, default=3)
        p.add_argument("--mant-width", type=int, default=4)
        p.add_argument("--dnsmp-factor", type=int, default=3)
        _add_bool_flag(p, "withComp", False)
        _add_bool_flag(p, "with_approx", False)
        _add_bool_flag(p, "with_s2nn2s_opt", False)
        _add_bool_flag(p, "sim_hw_add_OFUF", False)
        _add_bool_flag(p, "with_OF_opt", False)
        _add_bool_flag(p, "with_UF_opt", False)
        _add_bool_flag(p, "golden-clip-OF", False)
        _add_bool_flag(p, "quant_btw_mult_accu", True)
        _add_bool_flag(p, "debug-mode", False)
        _add_bool_flag(p, "self-check-mode", False)
        p.add_argument("--approx-output-dir", type=str,
                       default="approx_output")

        # oscillations_dampen_options (click_options.py:216-256) — the
        # reference parses these and never implements them; here they drive
        # quant/oscillations.py via osc_configs_from_args
        p.add_argument("--oscillations-dampen-weight", type=float,
                       default=None)
        p.add_argument("--oscillations-dampen-aggregation", type=str,
                       default="kernel_mean",
                       choices=["sum", "mean", "kernel_mean"])
        p.add_argument("--oscillations-dampen-weight-final", type=float,
                       default=None)
        p.add_argument("--oscillations-dampen-anneal-start", type=float,
                       default=0.25)

        # oscillations_freeze_options (click_options.py:259-317)
        p.add_argument("--oscillations-freeze-threshold", type=float,
                       default=0.0)
        p.add_argument("--oscillations-freeze-ema-momentum", type=float,
                       default=0.001)
        _add_bool_flag(p, "oscillations-freeze-use-ema", True)
        p.add_argument("--oscillations-freeze-max-bits", type=int, default=4)
        p.add_argument("--oscillations-freeze-threshold-final", type=float,
                       default=None)
        p.add_argument("--oscillations-freeze-anneal-start", type=float,
                       default=0.25)

        # eval control (image_net.py mini-test path, :171-179)
        _add_bool_flag(p, "mini-test", False)
        p.add_argument("--mini-test-batches", type=int, default=10)
        p.add_argument("--mini-test-start", type=int, default=5)
        p.add_argument("--mini-test-step", type=int, default=300)
        p.add_argument("--max-eval-batches", type=int, default=None)
        _add_bool_flag(p, "synthetic-data", False,
                       help="Use deterministic synthetic batches (no dataset)")
        p.add_argument("--reestimate-bn-batches", type=int, default=0)

        # parallel execution (green-field; reference is single-device)
        p.add_argument("--mesh-data", type=int, default=1)
        p.add_argument("--mesh-model", type=int, default=1)

    vq = sub.add_parser("validate-quantized", help="image_net.py:45-203")
    common(vq)
    vd = sub.add_parser("validate-quantized-demo", help="image_net.py:205-224")
    common(vd)

    # QAT fine-tuning — the entry point that consumes the --oscillations-*
    # flags (the reference parses qat_options, click_options.py:184-214, but
    # its main CLI never trains; this wires eval/trainer.py::train_qat)
    tq = sub.add_parser(
        "train-qat",
        help="calibrate then QAT-finetune (qat_options, "
             "click_options.py:184-214; consumes --oscillations-*)")
    common(tq)
    tq.add_argument("--learning-rate", type=float, default=1e-3)
    tq.add_argument("--optimizer", type=str, default="SGD")
    tq.add_argument("--momentum", type=float, default=0.9)
    tq.add_argument("--weight-decay", type=float, default=None)
    tq.add_argument("--learning-rate-schedule", type=str, default=None,
                    help="e.g. 'multistep:30,60' or 'cosine'")
    tq.add_argument("--max-epochs", type=int, default=1)
    _add_bool_flag(tq, "sep-quant-optimizer", False)
    tq.add_argument("--quant-optimizer", type=str, default="Adam")
    tq.add_argument("--quant-learning-rate", type=float, default=1e-4)
    _add_bool_flag(tq, "grad-scaling", False)
    tq.add_argument("--steps-per-epoch", type=int, default=None)
    tq.add_argument("--tb-logging-dir", type=str, default=None)
    return parser


def osc_configs_from_args(args):
    """args -> (OscDampConfig | None, OscFreezeConfig | None) — the
    reference's ``osc_damp``/``osc_freeze`` config namespaces
    (click_options.py:216-317), consumed by ``quant.qat.make_qat_step``."""
    from .config import OscDampConfig, OscFreezeConfig

    damp = None
    if args.oscillations_dampen_weight is not None:
        damp = OscDampConfig(
            weight=args.oscillations_dampen_weight,
            aggregation=args.oscillations_dampen_aggregation,
            weight_final=args.oscillations_dampen_weight_final,
            anneal_start=args.oscillations_dampen_anneal_start,
        )
    freeze = None
    if args.oscillations_freeze_threshold > 0.0:
        freeze = OscFreezeConfig(
            threshold=args.oscillations_freeze_threshold,
            ema_momentum=args.oscillations_freeze_ema_momentum,
            use_ema=args.oscillations_freeze_use_ema,
            max_bits=args.oscillations_freeze_max_bits,
            threshold_final=args.oscillations_freeze_threshold_final,
            anneal_start=args.oscillations_freeze_anneal_start,
        )
    return damp, freeze


def config_from_args(args) -> QuantConfig:
    """args -> QuantConfig (the quant_params_dict analog,
    click_options.py:544-606)."""
    weight_range = EstimatorConfig(
        method=RangeMethod(args.weight_quant_method),
        percentile=None,
        num_candidates=args.num_candidates or 111,
        opt_method=OptMethod(args.weight_opt_method),
    )
    act_range = EstimatorConfig(
        method=RangeMethod(args.act_quant_method),
        momentum=args.act_momentum if args.act_momentum is not None else 0.9,
        num_candidates=args.act_num_candidates or args.num_candidates or 111,
        opt_method=OptMethod(args.act_opt_method),
    )
    return QuantConfig(
        method=QMethod(args.qmethod),
        act_method=QMethod(args.qmethod_act) if args.qmethod_act else None,
        n_bits=args.n_bits,
        n_bits_act=args.n_bits_act,
        per_channel_weights=args.per_channel,
        quantize_input=(args.quantize_input or args.quant_setup == "LSQ_paper"),
        quant_setup=args.quant_setup,
        weight_range=weight_range,
        act_range=act_range,
        fp8=FP8Config(
            maxval=args.fp8_maxval,
            mantissa_bits=args.fp8_mantissa_bits,
            set_maxval=args.fp8_set_maxval,
            learn_maxval=args.fp8_learn_maxval,
            learn_mantissa_bits=args.fp8_learn_mantissa_bits,
            mse_include_mantissa_bits=args.fp8_mse_include_mantissa_bits,
            allow_unsigned=args.fp8_allow_unsigned,
        ),
        run_method=RunMethodConfig(
            approx_flag=args.approx_flag,
            quantize_after_mult_and_add=args.quantize_after_mult_and_add,
            res_quantizer_flag=args.res_quantizer_flag,
            original_quantize_res=args.original_quantize_res,
        ),
        approx=ApproxConfig(
            expo_width=args.expo_width,
            mant_width=args.mant_width,
            dnsmp_factor=args.dnsmp_factor,
            with_comp=args.withComp,
            with_approx=args.with_approx,
            with_s2nn2s_opt=args.with_s2nn2s_opt,
            sim_hw_add_ofuf=args.sim_hw_add_OFUF,
            with_of_opt=args.with_OF_opt,
            with_uf_opt=args.with_UF_opt,
            golden_clip_of=args.golden_clip_OF,
            quant_btw_mult_accu=args.quant_btw_mult_accu,
            debug_mode=args.debug_mode,
            self_check_mode=args.self_check_mode,
        ),
    )


def build_model(arch: str, qc: QuantConfig, num_classes: int = 1000):
    import jax.numpy as jnp

    from .models.demo import QuantizedDemoModel
    from .models.mobilenet_v2 import QuantizedMobileNetV2
    from .models.resnet import QuantizedResNet
    from .models.vit import QuantizedViT

    arch = arch.replace("_approx", "")
    if arch == "mobilenet_v2_quantized":
        model = QuantizedMobileNetV2(qc=qc, num_classes=num_classes)
        example = jnp.zeros((1, 224, 224, 3), jnp.float32)
    elif arch == "resnet18_quantized":
        model = QuantizedResNet(qc=qc, depth=18, num_classes=num_classes)
        example = jnp.zeros((1, 224, 224, 3), jnp.float32)
    elif arch == "resnet50_quantized":
        model = QuantizedResNet(qc=qc, depth=50, num_classes=num_classes)
        example = jnp.zeros((1, 224, 224, 3), jnp.float32)
    elif arch == "vit_quantized":
        model = QuantizedViT(qc=qc)
        example = jnp.zeros((1, 224, 224, 3), jnp.float32)
    elif arch == "demo_quantized":
        model = QuantizedDemoModel(qc=qc)
        example = jnp.zeros((1, 10), jnp.float32)
    else:
        raise ValueError(f"unknown architecture {arch}")
    return model, example


def load_weights(arch: str, model, variables: dict, model_dir: Optional[str]):
    """Load an FP32 checkpoint into the variables pytree (torch .pth[.tar]
    via the porting module, or a previously saved orbax/npz checkpoint)."""
    if model_dir is None:
        logger.warning("no --model-dir given; using randomly initialized weights")
        return variables
    from .models import porting

    arch = arch.replace("_approx", "")
    if model_dir.endswith((".pth", ".pth.tar", ".pt", ".bin")):
        import torch

        state = porting.torch_state_to_numpy(
            torch.load(model_dir, map_location="cpu", weights_only=True)
        )
        if arch == "mobilenet_v2_quantized":
            params, stats = porting.port_mobilenet_v2(state)
        elif arch.startswith("resnet"):
            depth = 18 if "18" in arch else 50
            params, stats = porting.port_resnet(state, depth)
        elif arch == "vit_quantized":
            params, stats = porting.port_vit(state)
        else:
            raise ValueError(f"no torch porting rule for {arch}")
        return porting.merge_ported(variables, params, stats)
    from .utils.checkpoint import load_checkpoint

    return load_checkpoint(model_dir, variables)


def run_validate(args) -> dict:
    import jax
    import jax.numpy as jnp

    from .eval import data as data_mod
    from .eval.driver import validate_quantized, write_result_file
    from .quant.sites import QuantPhase
    from .utils.misc import seed_all

    if args.seed is not None:
        seed_all(args.seed)

    qc = config_from_args(args)
    model, example = build_model(args.architecture, qc)

    variables = model.init(jax.random.key(args.seed or 0), example,
                           QuantPhase(phase="estimate"))
    variables = load_weights(args.architecture, model, variables, args.model_dir)

    mesh = None
    if args.mesh_data * args.mesh_model > 1:
        from .parallel import make_mesh, shard_variables

        mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)
        mesh.__enter__()
        variables = shard_variables(variables, mesh)

    image_size = example.shape[1] if example.ndim == 4 else None

    def make_batches(max_batches=None):
        if args.architecture == "demo_quantized":
            import numpy as np

            rng = np.random.default_rng(args.seed or 0)
            return [
                (rng.normal(size=(args.batch_size, 10)).astype(np.float32),
                 rng.integers(0, 10, size=(args.batch_size,)))
                for _ in range(max_batches or 4)
            ]
        if args.synthetic_data or not args.images_dir:
            return data_mod.synthetic_batches(
                args.batch_size, max_batches or 8, image_size=image_size,
                seed=args.seed or 10,
            )
        if getattr(args, "native_loader", False):
            from .eval import native_data

            if native_data.available():
                return native_data.imagenet_val_batches_native(
                    args.images_dir, args.batch_size, image_size=image_size,
                    max_batches=max_batches, num_threads=args.num_workers,
                )
            print("warning: native loader unavailable, using PIL pipeline")
        return data_mod.imagenet_val_batches(
            args.images_dir, args.batch_size, image_size=image_size,
            max_batches=max_batches,
        )

    def make_train_batches(max_batches=None):
        """Calibration/BN batches come from TRAIN data (the reference feeds
        the train loader, quantization/utils.py:99; utils/qat_utils.py:90)."""
        if args.architecture == "demo_quantized" or args.synthetic_data \
                or not args.images_dir:
            return make_batches(max_batches)
        return data_mod.imagenet_train_batches(
            args.images_dir, args.batch_size, image_size=image_size,
            max_batches=max_batches, seed=args.seed or 10,
        )

    calib = make_train_batches(args.num_est_batches)
    if args.mini_test:
        eval_batches = data_mod.strided_batches(
            make_batches(None), args.mini_test_batches, args.mini_test_start,
            args.mini_test_step,
        )
    else:
        eval_batches = make_batches(args.max_eval_batches)

    bn_batches = (make_train_batches(args.reestimate_bn_batches)
                  if args.reestimate_bn_batches else None)

    if mesh is not None:
        from .parallel import shard_batch

        def _sharded(batches):
            for b in batches:
                if isinstance(b, tuple):
                    yield tuple(shard_batch(t, mesh) for t in b)
                else:
                    yield shard_batch(b, mesh)

        calib = _sharded(calib)
        eval_batches = _sharded(eval_batches)
        if bn_batches is not None:
            bn_batches = _sharded(bn_batches)

    try:
        metrics, calibrated = validate_quantized(
            model, variables, calib, eval_batches,
            num_est_batches=args.num_est_batches,
            quant_w=args.weight_quant,
            quant_a=args.act_quant,
            fast=getattr(args, "fast_mode", False),
            packed=getattr(args, "packed_weights", False),
            chained=getattr(args, "chained_acts", False),
            qc=qc,
            calib_example=example,
            bn_reestimate_batches=bn_batches,
        )
    finally:
        if mesh is not None:
            mesh.__exit__(None, None, None)

    path = write_result_file(
        args.approx_output_dir, args.architecture, qc.approx, qc.run_method,
        metrics,
    )
    print(f"final_metrics: {metrics}")
    print(f"results written to {path}")

    if args.save_checkpoint_dir:
        from .utils.checkpoint import save_checkpoint

        save_checkpoint(args.save_checkpoint_dir, calibrated)
        print(f"checkpoint saved to {args.save_checkpoint_dir}")
    return metrics


def run_train_qat(args) -> dict:
    """Calibrate then QAT-finetune (the reference's unused trainer path,
    utils/supervised_driver.py:11-60, done properly); consumes the
    --oscillations-* flags via ``osc_configs_from_args``."""
    import jax
    import numpy as np

    from .eval import data as data_mod
    from .eval.driver import calibrate
    from .eval.trainer import train_qat
    from .quant.sites import QuantPhase
    from .utils.misc import seed_all

    if args.seed is not None:
        seed_all(args.seed)

    qc = config_from_args(args)
    model, example = build_model(args.architecture, qc)
    variables = model.init(jax.random.key(args.seed or 0), example,
                           QuantPhase(phase="estimate"))
    variables = load_weights(args.architecture, model, variables,
                             args.model_dir)
    image_size = example.shape[1] if example.ndim == 4 else None
    spe = args.steps_per_epoch or 8

    def train_batches():
        if args.architecture == "demo_quantized":
            rng = np.random.default_rng(args.seed or 0)
            return [
                (rng.normal(size=(args.batch_size, 10)).astype(np.float32),
                 rng.integers(0, 10, size=(args.batch_size,)))
                for _ in range(spe)
            ]
        if args.synthetic_data or not args.images_dir:
            return data_mod.synthetic_batches(
                args.batch_size, spe, image_size=image_size,
                seed=args.seed or 10)
        return data_mod.imagenet_train_batches(
            args.images_dir, args.batch_size, image_size=image_size,
            max_batches=args.steps_per_epoch, seed=args.seed or 10)

    def eval_batches():
        if args.architecture == "demo_quantized" or args.synthetic_data \
                or not args.images_dir:
            return train_batches()
        return data_mod.imagenet_val_batches(
            args.images_dir, args.batch_size, image_size=image_size,
            max_batches=args.max_eval_batches)

    variables = calibrate(model, variables, train_batches(),
                          num_est_batches=args.num_est_batches,
                          quant_w=args.weight_quant, quant_a=args.act_quant)
    osc_damp, osc_freeze = osc_configs_from_args(args)
    variables, history = train_qat(
        model, variables, train_batches,
        max_epochs=args.max_epochs,
        eval_batches=eval_batches,
        optimizer=args.optimizer,
        learning_rate=args.learning_rate,
        momentum=args.momentum,
        weight_decay=args.weight_decay,
        learning_rate_schedule=args.learning_rate_schedule,
        sep_quant_optimizer=args.sep_quant_optimizer,
        quant_optimizer=args.quant_optimizer,
        quant_learning_rate=args.quant_learning_rate,
        grad_scaling=args.grad_scaling,
        reestimate_bn_stats=args.reestimate_bn_batches > 0,
        save_checkpoint_dir=args.save_checkpoint_dir,
        tb_logging_dir=args.tb_logging_dir,
        steps_per_epoch=args.steps_per_epoch,
        osc_damp=osc_damp,
        osc_freeze=osc_freeze,
    )
    print(f"qat history: {history}")
    return history[-1] if history else {}


def main(argv=None):
    logging.basicConfig(level=os.environ.get("LOGLEVEL", "INFO"))
    args = build_parser().parse_args(argv)
    if args.command in ("validate-quantized", "validate-quantized-demo"):
        return run_validate(args)
    if args.command == "train-qat":
        return run_train_qat(args)
    raise SystemExit(f"unknown command {args.command}")


if __name__ == "__main__":
    main(sys.argv[1:])
