"""Torch-checkpoint porting: reference FP32 state dicts -> flax pytrees.

Replaces the reference's load path (``mobilenetv2_quantized`` loading a torch
``.pth.tar``, models/mobilenet_v2_quantized.py:95-113) for a JAX model: the
FP32 checkpoint's conv/BN/linear tensors are mapped into the quantized model's
``params`` / ``batch_stats`` collections. BN folding follows ``fold_bn``
(autoquant_utils.py:266-289): conv+BN windows merge into one BNQuantConv
keeping FP32 stats, and a conv bias preceding BN folds into ``running_mean``
(autoquant_utils.py:281-283).

Layout conversions: torch conv OIHW -> flax HWIO; torch linear (out, in) ->
flax (in, out). All inputs are numpy arrays (call ``torch_state_to_numpy``
on a torch state dict first).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from .mobilenet_v2 import INVERTED_RESIDUAL_SETTING


def torch_state_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Detach a torch state dict to plain numpy (no torch needed downstream)."""
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state_dict.items()}


def conv_kernel(w: np.ndarray) -> jnp.ndarray:
    """torch OIHW -> flax HWIO."""
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def linear_kernel(w: np.ndarray) -> jnp.ndarray:
    """torch (out, in) -> flax (in, out)."""
    return jnp.asarray(np.transpose(w, (1, 0)))


def conv_transpose_kernel(w: np.ndarray) -> jnp.ndarray:
    """torch ConvTranspose*d (in, out, *K) -> our un-flipped (*K, I, O).

    Torch's transposed conv scatters the kernel (equivalently: correlates the
    input-dilated signal with the *spatially flipped* kernel), while
    ``QuantConvTranspose`` correlates with the kernel as stored
    (``transpose_kernel=False`` semantics). Flipping the spatial axes here
    makes the two produce identical outputs.
    """
    n_spatial = w.ndim - 2
    w = np.flip(w, axis=tuple(range(2, 2 + n_spatial)))
    # (I, O, *K) -> (*K, I, O)
    return jnp.asarray(np.transpose(w, (*range(2, 2 + n_spatial), 0, 1)))


def conv_transpose_padding_from_torch(kernel_size, stride, padding,
                                      output_padding=0, dilation=1):
    """Torch ConvTranspose*d (padding, output_padding) -> explicit (lo, hi)
    pads for ``QuantConvTranspose``: ``(d*(k-1)-p, d*(k-1)-p+op)`` per dim."""
    def _tup(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (v,) * len(kernel_size)

    s, p, op, d = map(_tup, (stride, padding, output_padding, dilation))
    del s  # stride enters as input dilation, not padding
    return tuple(
        (di * (k - 1) - pi, di * (k - 1) - pi + opi)
        for k, pi, opi, di in zip(kernel_size, p, op, d)
    )


def _conv_bn(state: Mapping[str, np.ndarray], conv: str, bn: str):
    """One fold_bn window -> BNQuantConv params + batch stats."""
    params = {
        "kernel": conv_kernel(state[f"{conv}.weight"]),
        "gamma": jnp.asarray(state[f"{bn}.weight"]),
        "beta": jnp.asarray(state[f"{bn}.bias"]),
    }
    mean = np.asarray(state[f"{bn}.running_mean"])
    if f"{conv}.bias" in state:
        # conv bias before BN folds into running_mean (autoquant_utils.py:281-283)
        mean = mean - np.asarray(state[f"{conv}.bias"])
    stats = {
        "mean": jnp.asarray(mean),
        "var": jnp.asarray(state[f"{bn}.running_var"]),
    }
    return params, stats


def port_mobilenet_v2(
    state: Mapping[str, np.ndarray], width_mult: float = 1.0
) -> Tuple[dict, dict]:
    """Map the reference FP32 MobileNetV2 state dict (models/mobilenet_v2.py)
    onto ``QuantizedMobileNetV2``'s variables.

    Returns (params, batch_stats) pytrees.
    """
    params: dict = {}
    stats: dict = {}

    def put_conv_bn(dst: str, conv: str, bn: str):
        p, s = _conv_bn(state, conv, bn)
        params[dst] = p
        stats[dst] = s

    # stem (features.0 = Sequential(conv, bn, relu6))
    put_conv_bn("features_0", "features.0.0", "features.0.1")

    idx = 1
    for t, _, n, _ in INVERTED_RESIDUAL_SETTING:
        for _ in range(n):
            base = f"features.{idx}.conv"
            block_p: dict = {}
            block_s: dict = {}
            # Sequential indices (mobilenet_v2.py:36-59):
            #   t == 1: (0 dw-conv, 1 bn, 2 relu6, 3 pw-conv, 4 bn)
            #   t != 1: (0 pw-conv, 1 bn, 2 relu6, 3 dw-conv, 4 bn, 5 relu6,
            #            6 pw-conv, 7 bn)
            windows = [(0, 1), (3, 4)] if t == 1 else [(0, 1), (3, 4), (6, 7)]
            for j, (ci, bi) in enumerate(windows):
                p, s = _conv_bn(state, f"{base}.{ci}", f"{base}.{bi}")
                block_p[f"conv_{j}"] = p
                block_s[f"conv_{j}"] = s
            params[f"features_{idx}"] = block_p
            stats[f"features_{idx}"] = block_s
            idx += 1

    put_conv_bn(f"features_{idx}", f"features.{idx}.0", f"features.{idx}.1")

    params["classifier_1"] = {
        "kernel": linear_kernel(state["classifier.1.weight"]),
        "bias": jnp.asarray(state["classifier.1.bias"]),
    }
    return params, stats


def port_resnet(
    state: Mapping[str, np.ndarray], depth: int = 18
) -> Tuple[dict, dict]:
    """Map a torchvision-layout ResNet FP32 state dict onto
    ``QuantizedResNet``'s variables (resnet_quantized.py loads torchvision
    resnet18/50, :136-167)."""
    from .resnet import RESNET_SPECS

    kind, reps = RESNET_SPECS[depth]
    n_convs = 2 if kind == "basic" else 3

    params: dict = {}
    stats: dict = {}

    p, s = _conv_bn(state, "conv1", "bn1")
    params["conv1"] = p
    stats["conv1"] = s

    for li, n in enumerate(reps, start=1):
        for bi in range(n):
            src = f"layer{li}.{bi}"
            dst = f"layer{li}_{bi}"
            bp: dict = {}
            bs: dict = {}
            for ci in range(1, n_convs + 1):
                p, s = _conv_bn(state, f"{src}.conv{ci}", f"{src}.bn{ci}")
                bp[f"conv{ci}"] = p
                bs[f"conv{ci}"] = s
            if f"{src}.downsample.0.weight" in state:
                p, s = _conv_bn(state, f"{src}.downsample.0", f"{src}.downsample.1")
                bp["downsample_0"] = p
                bs["downsample_0"] = s
            params[dst] = bp
            stats[dst] = bs

    params["fc"] = {
        "kernel": linear_kernel(state["fc.weight"]),
        "bias": jnp.asarray(state["fc.bias"]),
    }
    return params, stats


def port_vit(state: Mapping[str, np.ndarray], num_layers: int = 12
             ) -> Tuple[dict, dict]:
    """Map an HF ``ViTForImageClassification`` state dict onto
    ``QuantizedViT``'s variables (vit_quantized.py:396-402 loads
    google/vit-base-patch16-224)."""

    def dense(prefix):
        return {
            "kernel": linear_kernel(state[f"{prefix}.weight"]),
            "bias": jnp.asarray(state[f"{prefix}.bias"]),
        }

    def ln(prefix):
        return {
            "scale": jnp.asarray(state[f"{prefix}.weight"]),
            "bias": jnp.asarray(state[f"{prefix}.bias"]),
        }

    params: dict = {
        "cls_token": jnp.asarray(state["vit.embeddings.cls_token"]),
        "position_embeddings": jnp.asarray(
            state["vit.embeddings.position_embeddings"]
        ),
        "patch_projection": {
            "kernel": conv_kernel(
                state["vit.embeddings.patch_embeddings.projection.weight"]
            ),
            "bias": jnp.asarray(
                state["vit.embeddings.patch_embeddings.projection.bias"]
            ),
        },
        "layernorm": ln("vit.layernorm"),
        "classifier": dense("classifier"),
    }
    for i in range(num_layers):
        src = f"vit.encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "layernorm_before": ln(f"{src}.layernorm_before"),
            "layernorm_after": ln(f"{src}.layernorm_after"),
            "attention": {
                "query": dense(f"{src}.attention.attention.query"),
                "key": dense(f"{src}.attention.attention.key"),
                "value": dense(f"{src}.attention.attention.value"),
            },
            "attention_output": dense(f"{src}.attention.output.dense"),
            "intermediate": dense(f"{src}.intermediate.dense"),
            "output": dense(f"{src}.output.dense"),
        }
    return params, {}


def port_bert(state: Mapping[str, np.ndarray], num_layers: int = 12
              ) -> Tuple[dict, dict]:
    """Map an HF ``BertForSequenceClassification`` state dict onto
    ``QuantizedBert``'s variables."""

    def dense(prefix):
        return {
            "kernel": linear_kernel(state[f"{prefix}.weight"]),
            "bias": jnp.asarray(state[f"{prefix}.bias"]),
        }

    def ln(prefix):
        return {
            "scale": jnp.asarray(state[f"{prefix}.weight"]),
            "bias": jnp.asarray(state[f"{prefix}.bias"]),
        }

    params: dict = {
        "word_embeddings": jnp.asarray(
            state["bert.embeddings.word_embeddings.weight"]
        ),
        "position_embeddings": jnp.asarray(
            state["bert.embeddings.position_embeddings.weight"]
        ),
        "token_type_embeddings": jnp.asarray(
            state["bert.embeddings.token_type_embeddings.weight"]
        ),
        "embeddings_layernorm": ln("bert.embeddings.LayerNorm"),
        "pooler": dense("bert.pooler.dense"),
        "classifier": dense("classifier"),
    }
    for i in range(num_layers):
        src = f"bert.encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{src}.attention.self.query"),
                "key": dense(f"{src}.attention.self.key"),
                "value": dense(f"{src}.attention.self.value"),
            },
            "attention_output": dense(f"{src}.attention.output.dense"),
            "attention_layernorm": ln(f"{src}.attention.output.LayerNorm"),
            "intermediate": dense(f"{src}.intermediate.dense"),
            "output": dense(f"{src}.output.dense"),
            "output_layernorm": ln(f"{src}.output.LayerNorm"),
        }
    return params, {}


def port_llama(state: Mapping[str, np.ndarray], num_layers: int = 32
               ) -> Tuple[dict, dict]:
    """Map an HF ``LlamaForCausalLM`` state dict onto ``QuantizedLlama``."""

    def dense(prefix):
        return {"kernel": linear_kernel(state[f"{prefix}.weight"])}

    params: dict = {
        "embed": jnp.asarray(state["model.embed_tokens.weight"]),
        "final_norm": jnp.asarray(state["model.norm.weight"]),
        "lm_head": dense("lm_head"),
    }
    for i in range(num_layers):
        src = f"model.layers.{i}"
        params[f"layer_{i}"] = {
            "attn_norm": jnp.asarray(state[f"{src}.input_layernorm.weight"]),
            "mlp_norm": jnp.asarray(
                state[f"{src}.post_attention_layernorm.weight"]
            ),
            "q_proj": dense(f"{src}.self_attn.q_proj"),
            "k_proj": dense(f"{src}.self_attn.k_proj"),
            "v_proj": dense(f"{src}.self_attn.v_proj"),
            "o_proj": dense(f"{src}.self_attn.o_proj"),
            "gate_proj": dense(f"{src}.mlp.gate_proj"),
            "up_proj": dense(f"{src}.mlp.up_proj"),
            "down_proj": dense(f"{src}.mlp.down_proj"),
        }
    return params, {}


def merge_ported(variables: dict, params: dict, batch_stats: dict) -> dict:
    """Overlay ported tensors onto an initialized variables dict."""
    import flax

    merged_params = flax.core.unfreeze(variables["params"])

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst.setdefault(k, {}), v)
            else:
                if k in dst and dst[k].shape != v.shape:
                    raise ValueError(
                        f"shape mismatch for {k}: {dst[k].shape} vs {v.shape}"
                    )
                dst[k] = v

    overlay(merged_params, params)
    out = dict(variables)
    out["params"] = merged_params
    if batch_stats:
        merged_stats = flax.core.unfreeze(variables.get("batch_stats", {}))
        overlay(merged_stats, batch_stats)
        out["batch_stats"] = merged_stats
    return out
