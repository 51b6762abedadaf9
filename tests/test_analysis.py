"""Analytic error model tests: self-consistency + reference parity."""

import os
import numpy as np
import pytest

from fp8_quantization_tpu.analysis import (
    ClippedGaussDistr,
    ClippedStudentTDistr,
    UniformDistr,
    empirical_rounding_mse,
    expected_dot_prod_mse_analyt,
    expected_rounding_mse,
    integrate_pdf_grid_func_analyt,
)
from fp8_quantization_tpu.numerics import fp8_grid_scaled
from tests.reference_loader import load_reference_module, reference_available


def _grids():
    fp = fp8_grid_scaled(8, 4, 8, 4.0)
    int8 = 4.0 / 127 * np.arange(-128, 128)
    return fp, int8


class TestSelfConsistency:
    @pytest.mark.parametrize("distr_fn", [
        lambda: ClippedGaussDistr({"mu": 0.0, "sigma": 1.0}, -4.0, 4.0),
        lambda: ClippedGaussDistr({"mu": 0.5, "sigma": 2.0}, -3.0, 5.0),
        lambda: ClippedStudentTDistr({"nu": 8.0}, -6.0, 6.0),
        lambda: UniformDistr(None, -2.0, 2.0),
    ], ids=["gauss", "gauss-shifted", "student_t", "uniform"])
    @pytest.mark.parametrize("grid_idx", [0, 1], ids=["fp8", "int8"])
    def test_analytic_matches_monte_carlo(self, distr_fn, grid_idx):
        distr = distr_fn()
        grid = _grids()[grid_idx]
        # scale grid into the distribution's range
        mx = max(abs(distr.range_min), abs(distr.range_max))
        grid = grid / np.max(np.abs(grid)) * mx
        analyt = expected_rounding_mse(distr, grid)
        emp = empirical_rounding_mse(distr, grid, num_samples=500_000)
        assert analyt == pytest.approx(emp, rel=0.05)

    def test_second_moment_gauss(self):
        d = ClippedGaussDistr({"mu": 0.0, "sigma": 1.0}, -100.0, 100.0)
        assert d.eval_non_central_second_moment() == pytest.approx(1.0, rel=1e-6)

    def test_dot_prod_mse_positive_and_close_to_mc(self):
        dx = ClippedGaussDistr({"mu": 0.0, "sigma": 1.0}, -4.0, 4.0)
        dy = ClippedGaussDistr({"mu": 0.0, "sigma": 1.0}, -4.0, 4.0)
        grid, _ = _grids()
        analyt = expected_dot_prod_mse_analyt(dx, grid, dy, grid)
        assert analyt > 0
        # Monte-Carlo
        rng = np.random.default_rng(0)
        from fp8_quantization_tpu.analysis.error_estimator import _quantize_to_grid

        x = dx.sample((500_000,), rng)
        y = dy.sample((500_000,), rng)
        emp = np.mean((x * y - _quantize_to_grid(x, grid) * _quantize_to_grid(y, grid)) ** 2)
        assert analyt == pytest.approx(emp, rel=0.1)


@pytest.mark.skipif(not reference_available(), reason="no reference checkout")
class TestReferenceParity:
    @pytest.fixture(scope="class")
    def ref(self):
        import types

        torch = pytest.importorskip("torch")
        distributions = load_reference_module(
            "utils/distributions.py", "_ref_distributions"
        )
        utils_stub = types.ModuleType("utils.distributions")
        utils_stub.__dict__.update(distributions.__dict__)
        grid_mod = load_reference_module(
            "utils/grid.py", "_ref_grid",
            stubs={"utils.distributions": utils_stub,
                   "utils": types.ModuleType("utils")},
        )
        return distributions, grid_mod

    @pytest.mark.parametrize("fname", ["integr_interv_p_sqr_r",
                                       "integr_interv_x_p_signed_r"])
    def test_gauss_interval_integrals(self, ref, fname):
        dists, _ = ref
        r = dists.ClippedGaussDistr({"mu": 0.3, "sigma": 1.3}, -3.0, 4.0)
        o = ClippedGaussDistr({"mu": 0.3, "sigma": 1.3}, -3.0, 4.0)
        for a, b, u in [(-1.0, 0.5, 0.1), (0.0, 2.0, 1.9), (-3.0, -1.0, -2.0)]:
            assert getattr(o, fname)(a, b, u) == pytest.approx(
                getattr(r, fname)(a, b, u), rel=1e-8
            )

    @pytest.mark.parametrize("fname", ["integr_interv_p_sqr_r",
                                       "integr_interv_x_p_signed_r"])
    def test_student_t_interval_integrals(self, ref, fname):
        dists, _ = ref
        r = dists.ClippedStudentTDistr({"nu": 6.0}, -5.0, 5.0)
        o = ClippedStudentTDistr({"nu": 6.0}, -5.0, 5.0)
        for a, b, u in [(-1.0, 0.5, 0.1), (0.5, 2.0, 1.0), (-4.0, -2.0, -3.0)]:
            assert getattr(o, fname)(a, b, u) == pytest.approx(
                getattr(r, fname)(a, b, u), rel=1e-6
            )

    def test_grid_integration_parity(self, ref):
        dists, grid_mod = ref
        grid = np.linspace(-3.0, 3.0, 33)
        r = dists.ClippedGaussDistr({"mu": 0.0, "sigma": 1.0}, -2.5, 2.5)
        o = ClippedGaussDistr({"mu": 0.0, "sigma": 1.0}, -2.5, 2.5)
        ref_val = grid_mod.integrate_pdf_grid_func_analyt(
            r, grid, "integr_interv_p_sqr_r"
        )
        our_val = integrate_pdf_grid_func_analyt(o, grid, "integr_interv_p_sqr_r")
        assert our_val == pytest.approx(ref_val, rel=1e-8)


class TestInspect:
    """analysis/inspect.py (~ hooks/hook_demo.py weight inspection)."""

    def _demo_variables(self):
        import jax
        import jax.numpy as jnp

        from fp8_quantization_tpu.config import (FP8Config, QMethod,
                                                 QuantConfig)
        from fp8_quantization_tpu.models.demo import QuantizedDemoModel
        from fp8_quantization_tpu.quant import ESTIMATE

        qc = QuantConfig(method=QMethod.fp_quantizer,
                         fp8=FP8Config(set_maxval=True,
                                       mse_include_mantissa_bits=False))
        model = QuantizedDemoModel(qc=qc)
        x = jnp.ones((2, 10), jnp.float32)
        variables = model.init(jax.random.key(0), x, ESTIMATE)
        _, ups = model.apply(variables, x, ESTIMATE,
                             mutable=["quant", "quant_est"])
        return {**variables, **ups}

    def test_weight_summaries_and_quant_state(self):
        from fp8_quantization_tpu.analysis.inspect import (
            quant_state_summary,
            weight_summaries,
        )

        variables = self._demo_variables()
        rows = weight_summaries(variables["params"])
        assert rows and all(
            {"name", "shape", "min", "max", "mean", "std", "abs_max"}
            <= set(r) for r in rows)
        kernels = [r for r in rows if "kernel" in r["name"]]
        assert kernels and kernels[0]["abs_max"] >= kernels[0]["max"] >= \
            kernels[0]["mean"] >= kernels[0]["min"]

        qrows = quant_state_summary(variables)
        assert any("maxval" in r["name"] for r in qrows)

    def test_weight_histograms_written(self, tmp_path):
        pytest.importorskip("matplotlib")
        from fp8_quantization_tpu.analysis.inspect import weight_histograms

        variables = self._demo_variables()
        written = weight_histograms(variables["params"], str(tmp_path),
                                    select="kernel")
        assert written
        for name, path in written:
            assert os.path.exists(path) and os.path.getsize(path) > 0
