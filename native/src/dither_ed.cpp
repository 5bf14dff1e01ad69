// Exact error-diffusion dither (Floyd-Steinberg, serpentine scan).
//
// The reference's `zscale=dither=error_diffusion` (src/lut_renderer/
// ffmpeg.py:304-307) is inherently serial: each pixel's quantization error
// feeds its right/lower neighbors, so the TPU kernel substitutes a
// spatially-stationary ordered dither (plan.policy note). This native
// implementation provides the real row-recurrent algorithm as (a) the
// quality oracle ordered dither is compared against, and (b) an opt-in
// host-side finishing pass for users who require error diffusion exactly.
//
// C API:
//   ltn_dither_ed(in_float_codevalues, out_u16, h, w, max_value)
//     in:  float[h*w] code values at the TARGET depth (e.g. 0..255)
//     out: uint16[h*w] quantized with FS error diffusion, clamped [0,max]

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

int ltn_dither_ed(const float* in, uint16_t* out, int h, int w,
                  float max_value) {
  if (h <= 0 || w <= 0) return -1;
  std::vector<float> err_cur(w + 2, 0.0f), err_next(w + 2, 0.0f);

  for (int y = 0; y < h; y++) {
    const bool ltr = (y % 2) == 0;  // serpentine reduces directional artifacts
    std::fill(err_next.begin(), err_next.end(), 0.0f);
    for (int i = 0; i < w; i++) {
      const int x = ltr ? i : (w - 1 - i);
      const float v = in[(long)y * w + x] + err_cur[x + 1];
      float q = v + 0.5f;
      if (q < 0.0f) q = 0.0f;
      long qi = (long)q;
      if (qi > (long)max_value) qi = (long)max_value;
      out[(long)y * w + x] = (uint16_t)qi;
      const float e = v - (float)qi;
      const int step = ltr ? 1 : -1;
      // Floyd-Steinberg kernel (7/16 ahead; 3,5,1 below), mirrored on
      // right-to-left rows.
      err_cur[x + 1 + step] += e * (7.0f / 16.0f);
      err_next[x + 1 - step] += e * (3.0f / 16.0f);
      err_next[x + 1] += e * (5.0f / 16.0f);
      err_next[x + 1 + step] += e * (1.0f / 16.0f);
    }
    std::swap(err_cur, err_next);
  }
  return 0;
}

}  // extern "C"
