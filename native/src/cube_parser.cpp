// Fast .cube 3D-LUT parser.
//
// Python's text parsing of a 65^3 LUT (823k floats) costs ~100-200 ms per
// load; this strtof loop does it in a few ms and writes the table directly in
// the framework's [r][g][b] layout (FFmpeg lut3d order: red index fastest in
// the file). Exposed through lut_renderer_tpu.native_ext with a pure-Python
// fallback, so the .so is an accelerator, never a hard dependency.
//
// C API (all return 0 on success, negative on error):
//   ltn_cube_parse(path, out_table, max_entries, out_n, out_domain6)
//     out_table: float[N^3 * 3], layout ((r*N + g)*N + b)*3 + c
//     out_domain6: {min_r,min_g,min_b,max_r,max_g,max_b}

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

enum {
  LTN_OK = 0,
  LTN_ERR_OPEN = -1,
  LTN_ERR_NO_SIZE = -2,
  LTN_ERR_BAD_SIZE = -3,
  LTN_ERR_COUNT = -4,
  LTN_ERR_TOO_BIG = -5,
  LTN_ERR_NONFINITE = -6,
  LTN_ERR_IS_1D = -7,
};

int ltn_cube_parse(const char* path, float* out, long max_entries, int* out_n,
                   float* domain6) {
  FILE* f = fopen(path, "rb");
  if (!f) return LTN_ERR_OPEN;

  int n = 0;
  long count = 0;       // floats written
  long expected = -1;   // n^3 * 3 once size known
  domain6[0] = domain6[1] = domain6[2] = 0.0f;
  domain6[3] = domain6[4] = domain6[5] = 1.0f;

  char line[8192];
  int rc = LTN_OK;
  while (fgets(line, sizeof line, f)) {
    const char* p = line;
    while (*p == ' ' || *p == '\t') p++;
    if (*p == '#' || *p == '\r' || *p == '\n' || *p == '\0') continue;

    if (isalpha((unsigned char)*p)) {
      if (!strncmp(p, "LUT_3D_SIZE", 11)) {
        n = (int)strtol(p + 11, nullptr, 10);
        if (n < 2 || n > 129) { rc = LTN_ERR_BAD_SIZE; break; }
        expected = 3L * n * n * n;
        if (expected > max_entries) { rc = LTN_ERR_TOO_BIG; break; }
      } else if (!strncmp(p, "LUT_1D_SIZE", 11)) {
        rc = LTN_ERR_IS_1D; break;
      } else if (!strncmp(p, "DOMAIN_MIN", 10)) {
        char* q = const_cast<char*>(p) + 10;
        for (int i = 0; i < 3; i++) domain6[i] = strtof(q, &q);
      } else if (!strncmp(p, "DOMAIN_MAX", 10)) {
        char* q = const_cast<char*>(p) + 10;
        for (int i = 0; i < 3; i++) domain6[3 + i] = strtof(q, &q);
      }
      // TITLE and unknown keywords: ignored (tolerant, like most readers)
      continue;
    }

    // data row: three floats; file order has the RED index fastest
    if (expected < 0) { rc = LTN_ERR_NO_SIZE; break; }
    if (count + 3 > expected) { rc = LTN_ERR_COUNT; break; }
    char* q = const_cast<char*>(p);
    long i = count / 3;  // entry index in file order
    long r = i % n, g = (i / n) % n, b = i / ((long)n * n);
    float* dst = out + (((r * n) + g) * n + b) * 3;
    for (int c = 0; c < 3; c++) {
      float v = strtof(q, &q);
      if (!std::isfinite(v)) { rc = LTN_ERR_NONFINITE; goto done; }
      dst[c] = v;
    }
    count += 3;
  }
done:
  fclose(f);
  if (rc != LTN_OK) return rc;
  if (expected < 0) return LTN_ERR_NO_SIZE;
  if (count != expected) return LTN_ERR_COUNT;
  *out_n = n;
  return LTN_OK;
}

}  // extern "C"
