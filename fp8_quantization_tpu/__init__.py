"""fp8_quantization_tpu — a TPU-native FP8 quantized-inference framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference research codebase ``revollllt/FP8_quantization`` (simulated FP8
post-training quantization with configurable ExMy formats and an
approximate-hardware FP multiplier), rebuilt TPU-first:

* ``numerics``  — ExMy codec, FP8 STE quantizer, compensation LUTs, golden
  approx matmul oracle (pure jnp, CPU-testable).
* ``quant``     — functional quantizer params + jittable calibration passes
  (range estimators) replacing the reference's stateful manager/state machine.
* ``ops``       — quantized layer ops (linear/conv/layernorm) with the
  reference's forward protocol, plus fused Pallas TPU kernels.
* ``models``    — MobileNetV2 / ResNet / ViT / BERT / demo model families with
  torch-checkpoint porting and BN folding.
* ``parallel``  — mesh/sharding rules and psum-reduced distributed eval.
* ``eval``      — eval drivers, metrics, data pipelines.
"""

__version__ = "0.1.0"
