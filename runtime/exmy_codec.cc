// Native ExMy codec: independent C++ implementation of the framework's
// quantization numerics (fp8_quantization_tpu/numerics/codec.py and
// fp8_ste.py — reference semantics from
// /root/reference/approx/approx_matmul_whole_v9.py:233-362 and
// /root/reference/quantization/quantizers/fp8_quantizer.py:97-173).
//
// Used through ctypes (fp8_quantization_tpu/utils/native.py) as
//   * a cross-language bit-exactness oracle for the jnp/Pallas codecs,
//   * a host-side weight pre-quantizer for checkpoint tooling that must not
//     pull in JAX (e.g. offline conversion pipelines).
//
// Build: make -C runtime   (produces libexmy_codec.so)

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

inline float pow2i(int e) { return std::ldexp(1.0f, e); }

// round half to even, like rint with default rounding mode
inline float round_even(float x) { return std::nearbyintf(x); }

}  // namespace

extern "C" {

// Decompose floats into ExMy (expo, mant) integer fields.
// Mirrors codec.decompose: subnormals get expo 0; mantissa rounds
// half-to-even and clamps at the binade top without carrying.
void exmy_decompose(const float* values, int32_t* expo_out, int32_t* mant_out,
                    int64_t n, int expo_width, int mant_width, int bias,
                    int clip_of) {
  const int32_t max_mant = (1 << mant_width) - 1;
  const int32_t max_expo = (1 << expo_width) - 1;
  const float min_norm = pow2i(1 - bias);
  const float max_norm = pow2i(max_expo - bias) * (2.0f - pow2i(-mant_width));

  for (int64_t i = 0; i < n; ++i) {
    const float v = values[i];
    const float av = std::fabs(v);
    int e;
    const float m = std::frexp(av, &e);  // av = m * 2^e, m in [0.5, 1)
    int32_t expo, mant;
    if (av < min_norm) {  // subnormal (or zero)
      expo = 0;
      mant = (int32_t)round_even(std::ldexp(m, e + bias - 1 + mant_width));
    } else {
      expo = e - 1 + bias;
      mant = (int32_t)round_even(std::ldexp(m * 2.0f - 1.0f, mant_width));
    }
    if (mant > max_mant) mant = max_mant;
    if (clip_of && (v < -max_norm || v > max_norm)) {
      expo = max_expo;
      mant = max_mant;
    }
    expo_out[i] = expo;
    mant_out[i] = mant;
  }
}

// Rebuild floats from (expo, mant) fields; expo may exceed the nominal
// field width (overflow-extension mode). Mirrors codec.compose.
void exmy_compose(const int32_t* expo, const int32_t* mant, const float* sign,
                  float* out, int64_t n, int mant_width, int bias) {
  const float inv_scale = pow2i(-mant_width);
  for (int64_t i = 0; i < n; ++i) {
    const float frac = (float)mant[i] * inv_scale;
    float v;
    if (expo[i] == 0) {
      v = pow2i(1 - bias) * frac;
    } else {
      v = std::ldexp(1.0f + frac, expo[i] - bias);
    }
    out[i] = sign ? v * sign[i] : v;
  }
}

// Round-trip quantization onto the ExMy grid (codec.quantize_exmy).
void exmy_quantize(const float* in, float* out, int64_t n, int expo_width,
                   int mant_width, int bias, int clip_of) {
  const int32_t max_mant = (1 << mant_width) - 1;
  const int32_t max_expo = (1 << expo_width) - 1;
  const float min_norm = pow2i(1 - bias);
  const float max_norm = pow2i(max_expo - bias) * (2.0f - pow2i(-mant_width));
  const float inv_scale = pow2i(-mant_width);

  for (int64_t i = 0; i < n; ++i) {
    const float v = in[i];
    const float av = std::fabs(v);
    const float s = v < 0 ? -1.0f : 1.0f;
    int e;
    const float m = std::frexp(av, &e);
    int32_t expo, mant;
    if (av < min_norm) {
      expo = 0;
      mant = (int32_t)round_even(std::ldexp(m, e + bias - 1 + mant_width));
    } else {
      expo = e - 1 + bias;
      mant = (int32_t)round_even(std::ldexp(m * 2.0f - 1.0f, mant_width));
    }
    if (mant > max_mant) mant = max_mant;
    if (clip_of && (v < -max_norm || v > max_norm)) {
      expo = max_expo;
      mant = max_mant;
    }
    const float frac = (float)mant * inv_scale;
    out[i] = s * (expo == 0 ? pow2i(1 - bias) * frac
                            : std::ldexp(1.0f + frac, expo - bias));
  }
}

// FP8 STE fake-quantization with per-tensor params
// (fp8_ste.quantize_to_fp8_ste / pallas quantize_block semantics: scale-
// domain rounding, carries across binades, clip to [-maxval, maxval]).
// Returns the derived integer bias through *bias_out.
void fp8_ste_quantize(const float* in, float* out, int64_t n, int n_bits,
                      float maxval, int mant_bits, int sign_bits,
                      int32_t* bias_out) {
  const int M = mant_bits < 1 ? 1 : (mant_bits > n_bits - sign_bits
                                         ? n_bits - sign_bits
                                         : mant_bits);
  const int E = n_bits - sign_bits - M;
  const double bias_f = std::pow(2.0, E) - std::log2((double)maxval) +
                        std::log2(2.0 - std::pow(2.0, -M)) - 1.0;
  const int bias = (int)std::nearbyint(bias_f);
  if (bias_out) *bias_out = bias;
  const float minval = sign_bits == 1 ? -maxval : 0.0f;

  for (int64_t i = 0; i < n; ++i) {
    float xc = in[i];
    if (xc < minval) xc = minval;
    if (xc > maxval) xc = maxval;
    int e;
    std::frexp(std::fabs(xc), &e);  // log2|xc| in [e-1, e)
    int ls = e - 1 + bias;
    if (ls < 1) ls = 1;
    const float scale = pow2i(ls - M - bias);
    out[i] = round_even(xc / scale) * scale;
  }
}

}  // extern "C"
