"""Quantizer / estimator / QuantSite tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.config import (
    EstimatorConfig,
    FP8Config,
    QMethod,
    QuantConfig,
    QuantizerConfig,
    RangeMethod,
)
from fp8_quantization_tpu.quant import (
    ESTIMATE,
    FIXED,
    QuantSite,
    estimators,
    quantizers,
)


def _fp_cfg(**fp8):
    return QuantizerConfig(method=QMethod.fp_quantizer, fp8=FP8Config(**fp8))


class TestEstimators:
    def _run(self, ecfg, qcfg, batches, per_channel=False, axis=0):
        state = estimators.init(ecfg, qcfg, batches[0].shape, per_channel, axis)
        for b in batches:
            state, ranges = estimators.update(ecfg, qcfg, state, b, per_channel, axis)
        return ranges

    def test_current_minmax_last_batch(self, rng):
        b1 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        b2 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)) * 5
        xmin, xmax, _ = self._run(
            EstimatorConfig(RangeMethod.current_minmax), _fp_cfg(), [b1, b2]
        )
        assert float(xmin[0]) == float(b2.min())
        assert float(xmax[0]) == float(b2.max())

    def test_allminmax_union(self, rng):
        b1 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        b2 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)) * 5
        xmin, xmax, _ = self._run(
            EstimatorConfig(RangeMethod.allminmax), _fp_cfg(), [b1, b2]
        )
        assert float(xmin[0]) == float(jnp.minimum(b1.min(), b2.min()))
        assert float(xmax[0]) == float(jnp.maximum(b1.max(), b2.max()))

    def test_running_minmax_ema(self, rng):
        b1 = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
        b2 = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
        xmin, xmax, _ = self._run(
            EstimatorConfig(RangeMethod.running_minmax), _fp_cfg(), [b1, b2]
        )
        exp_max = 0.1 * float(b2.max()) + 0.9 * float(b1.max())
        assert float(xmax[0]) == pytest.approx(exp_max, rel=1e-6)

    def test_per_channel_minmax(self, rng):
        x = jnp.asarray(rng.normal(size=(3, 50)).astype(np.float32))
        xmin, xmax, _ = self._run(
            EstimatorConfig(RangeMethod.current_minmax), _fp_cfg(), [x],
            per_channel=True, axis=0,
        )
        np.testing.assert_allclose(np.asarray(xmax), np.asarray(x.max(axis=1)))

    def test_channel_axis_last(self, rng):
        x = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
        xmin, xmax, _ = self._run(
            EstimatorConfig(RangeMethod.current_minmax), _fp_cfg(), [x],
            per_channel=True, axis=-1,
        )
        np.testing.assert_allclose(np.asarray(xmax), np.asarray(x.max(axis=0)))

    def test_percentile(self, rng):
        x = jnp.asarray(rng.normal(size=(1000,)).astype(np.float32))
        xmin, xmax, _ = self._run(
            EstimatorConfig(RangeMethod.current_minmax, percentile=1.0),
            _fp_cfg(), [x],
        )
        assert float(xmax[0]) < float(x.max())
        assert float(xmin[0]) > float(x.min())

    def test_mse_picks_reasonable_maxval(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32))
        ecfg = EstimatorConfig(RangeMethod.MSE)
        qcfg = _fp_cfg(mse_include_mantissa_bits=True)
        xmin, xmax, mbits = self._run(ecfg, qcfg, [x])
        mx = float(jnp.abs(x).max())
        assert 0.1 * mx <= float(xmax[0]) <= 1.2 * mx
        assert mbits is not None and 1 <= float(mbits[0]) <= 7
        # quantizing with the chosen range must beat a crazy range
        st = quantizers.init(qcfg)
        st = quantizers.set_quant_range(_fp_cfg(set_maxval=True), st, xmin, xmax)
        st = dict(st, mantissa_bits=mbits.astype(jnp.float32))
        err_best = float(jnp.mean((x - quantizers.apply(qcfg, st, x)) ** 2))
        st_bad = quantizers.set_quant_range(_fp_cfg(set_maxval=True), st, -20 * mx, 20 * mx)
        err_bad = float(jnp.mean((x - quantizers.apply(qcfg, st_bad, x)) ** 2))
        assert err_best < err_bad

    def test_mse_jits(self, rng):
        x = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
        ecfg = EstimatorConfig(RangeMethod.MSE)
        qcfg = _fp_cfg()
        state = estimators.init(ecfg, qcfg, x.shape, False)

        @jax.jit
        def step(state, x):
            return estimators.update(ecfg, qcfg, state, x, False)

        state, (xmin, xmax, mbits) = step(state, x)
        assert np.isfinite(float(xmax[0]))


class TestUniformQuantizers:
    def test_symmetric_grid(self):
        cfg = QuantizerConfig(method=QMethod.symmetric_uniform, n_bits=8)
        st = quantizers.init(cfg)
        st = quantizers.set_quant_range(cfg, st, -1.0, 1.0)
        x = jnp.linspace(-1.5, 1.5, 101)
        y = quantizers.apply(cfg, st, x)
        delta = 1.0 / 127.0
        np.testing.assert_allclose(np.asarray(y) / delta,
                                   np.round(np.asarray(y) / delta), atol=1e-5)
        assert float(y.max()) <= 1.0 + 1e-6
        assert float(y.min()) >= -128 * delta - 1e-6

    def test_symmetric_unsigned_detection(self):
        cfg = QuantizerConfig(method=QMethod.symmetric_uniform, n_bits=8)
        st = quantizers.set_quant_range(cfg, quantizers.init(cfg), 0.0, 2.0)
        assert int(st["signed"][0]) == 0
        y = quantizers.apply(cfg, st, jnp.asarray([2.0]))
        assert float(y[0]) == pytest.approx(2.0, rel=1e-6)

    def test_asymmetric_zero_point(self):
        cfg = QuantizerConfig(method=QMethod.asymmetric_uniform, n_bits=8)
        st = quantizers.set_quant_range(cfg, quantizers.init(cfg), -0.5, 1.5)
        x = jnp.asarray([-0.7, -0.5, 0.0, 1.5, 2.0])
        y = quantizers.apply(cfg, st, x)
        assert float(y[2]) == pytest.approx(0.0, abs=1e-4)  # zero exactly representable
        assert float(y[0]) == pytest.approx(float(y[1]), abs=1e-6)  # clipped
        assert float(y[4]) == pytest.approx(float(y[3]), abs=1e-6)

    def test_per_channel_last_axis(self, rng):
        cfg = QuantizerConfig(method=QMethod.symmetric_uniform, n_bits=8,
                              per_channel=True)
        x = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
        st = quantizers.init(cfg, 4)
        st = quantizers.set_quant_range(cfg, st, x.min(axis=0), x.max(axis=0))
        y = quantizers.apply(cfg, st, x, channel_axis=-1)
        assert y.shape == x.shape
        # each column respects its own max
        np.testing.assert_array_less(np.abs(np.asarray(y)).max(axis=0),
                                     np.abs(np.asarray(x)).max(axis=0) * 1.01 + 1e-6)


class TestQuantSite:
    def test_calibrate_then_freeze(self, rng):
        site = QuantSite(_fp_cfg(set_maxval=True),
                         EstimatorConfig(RangeMethod.allminmax))
        x1 = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        x2 = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)) * 2

        variables = site.init(jax.random.key(0), x1, ESTIMATE)
        # calibration: estimator state and quant params update
        y1, updates = site.apply(variables, x1, ESTIMATE,
                                 mutable=["quant", "quant_est"])
        variables = {**variables, **updates}
        y2, updates = site.apply(variables, x2, ESTIMATE,
                                 mutable=["quant", "quant_est"])
        variables = {**variables, **updates}
        mv = float(updates["quant"]["q"]["maxval"][0])
        assert mv == pytest.approx(float(jnp.abs(jnp.concatenate([x1, x2])).max()))

        # frozen: repeated quantization is idempotent and state-free
        y_fixed = site.apply(variables, x2, FIXED)
        y_fixed2 = site.apply(variables, y_fixed, FIXED)
        np.testing.assert_array_equal(np.asarray(y_fixed), np.asarray(y_fixed2))

    def test_site_with_bias(self, rng):
        site = QuantSite(_fp_cfg(set_maxval=True),
                         EstimatorConfig(RangeMethod.current_minmax))
        x = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
        variables = site.init(jax.random.key(0), x, ESTIMATE, with_bias=True)
        (y, bias), _ = site.apply(variables, x, ESTIMATE, with_bias=True,
                                  mutable=["quant", "quant_est"])
        assert bias.shape == (1,)
        assert np.isfinite(float(bias[0]))

    def test_per_channel_site(self, rng):
        qcfg = QuantizerConfig(method=QMethod.fp_quantizer, per_channel=True,
                               fp8=FP8Config(set_maxval=True))
        site = QuantSite(qcfg, EstimatorConfig(RangeMethod.current_minmax),
                         channel_axis=-1)
        w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
        variables = site.init(jax.random.key(0), w, ESTIMATE)
        _, updates = site.apply(variables, w, ESTIMATE,
                                mutable=["quant", "quant_est"])
        assert updates["quant"]["q"]["maxval"].shape == (8,)


class TestLineSearch:
    def test_line_search_reasonable_and_beats_minmax(self, rng):
        import numpy as np

        from fp8_quantization_tpu.config import QMethod, QuantizerConfig
        from fp8_quantization_tpu.quant import quantizers
        from fp8_quantization_tpu.quant.estimators import line_search_ranges

        # heavy-tailed data: clipping should beat plain min/max
        x = jnp.asarray((rng.standard_t(3, size=4096) * 1.0).astype(np.float32))
        qcfg = QuantizerConfig(method=QMethod.symmetric_uniform, n_bits=4)
        x_min, x_max = line_search_ranges(x, qcfg, num_candidates=200)
        assert float(x_max) > 0 and float(x_min) == -float(x_max)

        def mse(lo, hi):
            st = quantizers.set_quant_range(qcfg, quantizers.init(qcfg), lo, hi)
            return float(jnp.mean((x - quantizers.apply(qcfg, st, x)) ** 2))

        assert mse(x_min, x_max) < mse(x.min(), x.max())

    def test_one_sided(self, rng):
        import numpy as np

        from fp8_quantization_tpu.config import QMethod, QuantizerConfig
        from fp8_quantization_tpu.quant.estimators import line_search_ranges

        x = jnp.asarray(np.abs(rng.normal(size=1024)).astype(np.float32))
        qcfg = QuantizerConfig(method=QMethod.asymmetric_uniform, n_bits=8)
        x_min, x_max = line_search_ranges(x, qcfg, num_candidates=100)
        assert float(x_min) == 0.0

    def test_golden_section_close_to_grid(self, rng):
        """Golden-section converges to (about) the grid-search optimum.

        The reference's OptMethod.golden_section branch calls undefined
        methods and would crash (range_estimators.py:200-205); ours works.
        """
        import numpy as np

        from fp8_quantization_tpu.config import (
            OptMethod, QMethod, QuantizerConfig,
        )
        from fp8_quantization_tpu.quant import quantizers
        from fp8_quantization_tpu.quant.estimators import line_search_ranges

        x = jnp.asarray((rng.standard_t(3, size=4096)).astype(np.float32))
        qcfg = QuantizerConfig(method=QMethod.symmetric_uniform, n_bits=4)
        _, grid_max = line_search_ranges(x, qcfg, num_candidates=1000)
        gs_min, gs_max = line_search_ranges(
            x, qcfg, opt_method=OptMethod.golden_section)
        assert float(gs_min) == -float(gs_max)

        def mse(hi):
            st = quantizers.set_quant_range(qcfg, quantizers.init(qcfg),
                                            -hi, hi)
            return float(jnp.mean((x - quantizers.apply(qcfg, st, x)) ** 2))

        # not necessarily the same local argmin, but comparable quality
        assert mse(float(gs_max)) <= 1.5 * mse(float(grid_max))
        # string form accepted too
        _, gs2 = line_search_ranges(x, qcfg, opt_method="golden_section")
        assert float(gs2) == float(gs_max)


class TestCrossEntropyEstimator:
    """RangeMethod.cross_entropy — the estimator the reference names for
    logits layers but never defines (quantization/utils.py:85-90)."""

    def _qcfg(self, n_bits=4):
        return QuantizerConfig(method=QMethod.fp_quantizer, n_bits=n_bits,
                               fp8=FP8Config(mantissa_bits=2))

    def test_threshold_minimizes_cross_entropy(self, rng):
        from fp8_quantization_tpu.quant import estimators, quantizers

        # peaked logits: one large value per row; MSE-optimal clipping and
        # CE-optimal clipping differ, CE must win on CE
        logits = rng.normal(size=(64, 32)).astype(np.float32)
        logits[np.arange(64), rng.integers(0, 32, 64)] += 8.0
        x = jnp.asarray(logits)
        qcfg = self._qcfg()
        ecfg = EstimatorConfig(method=RangeMethod.cross_entropy,
                               num_candidates=64)
        st = estimators.init(ecfg, qcfg, x.shape, per_channel=False)
        st, (x_min, x_max, mb) = estimators.update(ecfg, qcfg, st, x,
                                                   per_channel=False)
        assert mb is None
        assert float(x_max[0]) > 0 and float(x_min[0]) == -float(x_max[0])

        def ce(hi):
            qst = quantizers.set_quant_range(qcfg, quantizers.init(qcfg),
                                             -hi, hi)
            xq = quantizers.apply(qcfg, qst, x)
            p = jax.nn.softmax(x, axis=-1)
            return float(-jnp.sum(p * jax.nn.log_softmax(xq, axis=-1)))

        chosen = ce(float(x_max[0]))
        # the chosen threshold beats both a too-small and a too-large one
        assert chosen <= ce(float(x_max[0]) * 0.3) + 1e-5
        assert chosen <= ce(float(x_max[0]) * 3.0) + 1e-5

    def test_accumulates_over_batches(self, rng):
        from fp8_quantization_tpu.quant import estimators

        qcfg = self._qcfg()
        ecfg = EstimatorConfig(method=RangeMethod.cross_entropy,
                               num_candidates=32)
        x1 = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
        x2 = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32) * 2)
        st = estimators.init(ecfg, qcfg, x1.shape, per_channel=False)
        st, _ = estimators.update(ecfg, qcfg, st, x1, per_channel=False)
        grid_after_1 = np.asarray(st["search_grid"])
        st, (lo, hi, _) = estimators.update(ecfg, qcfg, st, x2,
                                            per_channel=False)
        # grid frozen after the first batch; losses accumulated
        np.testing.assert_array_equal(np.asarray(st["search_grid"]),
                                      grid_after_1)
        assert int(st["count"]) == 2

    def test_per_channel_rejected(self):
        from fp8_quantization_tpu.quant import estimators

        qcfg = self._qcfg()
        ecfg = EstimatorConfig(method=RangeMethod.cross_entropy)
        with pytest.raises(ValueError):
            estimators.init(ecfg, qcfg, (4, 8), per_channel=True)

    def test_layer_override_calibrates_logits_site(self, rng):
        """act_range_override: the cross_entropy_layer analog on a logits
        QuantDense (output quantizer)."""
        from fp8_quantization_tpu.ops.layers import QuantDense
        from fp8_quantization_tpu.quant import ESTIMATE, FIXED

        qc = QuantConfig(
            method=QMethod.fp_quantizer,
            quantize_input=False,  # output-quantizer position
            act_range=EstimatorConfig(RangeMethod.allminmax),
            fp8=FP8Config(mantissa_bits=3),
        )
        layer = QuantDense(
            qc=qc, features=16,
            act_range_override=EstimatorConfig(
                RangeMethod.cross_entropy, num_candidates=48),
        )
        x = jnp.asarray(rng.normal(size=(8, 12)).astype(np.float32))
        v = layer.init(jax.random.key(0), x, ESTIMATE)
        _, ups = layer.apply(v, x, ESTIMATE, mutable=["quant", "quant_est"])
        v = {**v, **ups}
        est = v["quant_est"]["activation_quantizer"]["est"]
        assert "losses" in est  # CE state, not minmax
        out = layer.apply(v, x, FIXED)
        assert np.isfinite(np.asarray(out)).all()
