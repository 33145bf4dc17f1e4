// qrdecode.cpp — from-scratch QR decoder (ISO/IEC 18004), versions 1-40,
// arbitrary in-plane rotation, perspective, and mirrored codes.
//
// Native replacement for the reference's QR path, which shells out to a Java
// ZXing subprocess through temp PNG files (pyzxing; reference
// app_camera.py:464, 531-537). This library decodes in-process from a raw
// grayscale buffer: adaptive binarization -> 1:1:3:1:1 finder-pattern scan ->
// perspective module sampling -> format/BCH -> codeword de-interleave ->
// Reed-Solomon error correction (Berlekamp-Massey/Chien/Forney) -> bitstream
// (numeric/alphanumeric/byte modes).
//
// C ABI (ctypes-friendly):
//   int qr_decode_gray(const uint8_t* img, int h, int w, int stride,
//                      char* out, int out_cap);
// Returns the number of decoded payloads; payloads are written into `out`
// NUL-separated. Build: see native/Makefile.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <string>
#include <algorithm>

static bool qr_debug() {
  static int v = -1;
  if (v < 0) v = getenv("QR_DEBUG") ? 1 : 0;
  return v;
}

namespace {

// ---------------------------------------------------------------------------
// GF(256), poly 0x11D
// ---------------------------------------------------------------------------

struct GF {
  uint8_t exp[512];
  uint8_t log[256];
  GF() {
    int x = 1;
    for (int i = 0; i < 255; i++) {
      exp[i] = (uint8_t)x;
      log[x] = (uint8_t)i;
      x <<= 1;
      if (x & 0x100) x ^= 0x11D;
    }
    for (int i = 255; i < 512; i++) exp[i] = exp[i - 255];
    log[0] = 0;
  }
  uint8_t mul(uint8_t a, uint8_t b) const {
    if (!a || !b) return 0;
    return exp[log[a] + log[b]];
  }
  uint8_t inv(uint8_t a) const { return exp[255 - log[a]]; }
};
static const GF gf;

// Reed-Solomon decode in place; returns false when uncorrectable.
bool rs_correct(std::vector<uint8_t>& block, int n_ec) {
  const int n = (int)block.size();
  std::vector<uint8_t> synd(n_ec);
  bool all_zero = true;
  for (int i = 0; i < n_ec; i++) {
    uint8_t s = 0;
    for (int j = 0; j < n; j++) s = gf.mul(s, gf.exp[i]) ^ block[j];
    synd[i] = s;
    if (s) all_zero = false;
  }
  if (all_zero) return true;

  // Berlekamp-Massey
  std::vector<uint8_t> sigma{1}, prev{1};
  int L = 0, m = 1;
  uint8_t b = 1;
  for (int i = 0; i < n_ec; i++) {
    uint8_t d = synd[i];
    for (int j = 1; j <= L; j++)
      if (j < (int)sigma.size()) d ^= gf.mul(sigma[j], synd[i - j]);
    if (d == 0) {
      m++;
    } else if (2 * L <= i) {
      std::vector<uint8_t> t = sigma;
      uint8_t coef = gf.mul(d, gf.inv(b));
      std::vector<uint8_t> shifted(prev.size() + m, 0);
      for (size_t k = 0; k < prev.size(); k++) shifted[k + m] = gf.mul(prev[k], coef);
      if (shifted.size() > sigma.size()) sigma.resize(shifted.size(), 0);
      for (size_t k = 0; k < shifted.size(); k++) sigma[k] ^= shifted[k];
      L = i + 1 - L;
      prev = t;
      b = d;
      m = 1;
    } else {
      uint8_t coef = gf.mul(d, gf.inv(b));
      std::vector<uint8_t> shifted(prev.size() + m, 0);
      for (size_t k = 0; k < prev.size(); k++) shifted[k + m] = gf.mul(prev[k], coef);
      if (shifted.size() > sigma.size()) sigma.resize(shifted.size(), 0);
      for (size_t k = 0; k < shifted.size(); k++) sigma[k] ^= shifted[k];
      m++;
    }
  }
  if (L == 0 || 2 * L > n_ec) return false;

  // Chien search: roots of sigma -> error positions
  std::vector<int> err_pos;
  for (int i = 0; i < n; i++) {
    // candidate position i (coefficient index from the left, degree n-1-i)
    uint8_t xinv = gf.exp[(255 - (n - 1 - i)) % 255];  // alpha^{-(n-1-i)}
    uint8_t v = 0;
    uint8_t xp = 1;
    for (size_t k = 0; k < sigma.size(); k++) {
      v ^= gf.mul(sigma[k], xp);
      xp = gf.mul(xp, xinv);
    }
    if (v == 0) err_pos.push_back(i);
  }
  if ((int)err_pos.size() != L) return false;

  // Forney: error magnitudes. Omega = (synd_poly * sigma) mod x^n_ec
  std::vector<uint8_t> omega(n_ec, 0);
  for (int i = 0; i < n_ec; i++) {
    uint8_t acc = 0;
    for (size_t j = 0; j <= (size_t)i && j < sigma.size(); j++)
      acc ^= gf.mul(sigma[j], synd[i - j]);
    omega[i] = acc;
  }
  // sigma' (formal derivative): odd-degree terms
  for (int p : err_pos) {
    int pos_pow = n - 1 - p;                 // exponent of alpha at this position
    uint8_t xinv = gf.exp[(255 - pos_pow) % 255];
    uint8_t num = 0, xp = 1;
    for (size_t k = 0; k < omega.size(); k++) {
      num ^= gf.mul(omega[k], xp);
      xp = gf.mul(xp, xinv);
    }
    uint8_t den = 0;
    xp = 1;  // xinv^0
    for (size_t k = 1; k < sigma.size(); k += 2) {
      den ^= gf.mul(sigma[k], xp);
      xp = gf.mul(xp, gf.mul(xinv, xinv));
    }
    if (den == 0) return false;
    // b=0 code (generator roots alpha^0..): e = X * Omega(X^-1) / sigma'(X^-1)
    uint8_t mag = gf.mul(gf.exp[pos_pow % 255], gf.mul(num, gf.inv(den)));
    block[p] ^= mag;
  }
  // verify
  for (int i = 0; i < n_ec; i++) {
    uint8_t s = 0;
    for (int j = 0; j < n; j++) s = gf.mul(s, gf.exp[i]) ^ block[j];
    if (s) return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// Version tables (versions 1-40) — same spec data as the python encoder
// (qr/encode.py _EC_TABLE/_ALIGN_POS; consistency vs module-geometry-derived
// codeword totals asserted by tests/unit/test_qr_tables.py)
// ---------------------------------------------------------------------------

static const int MAX_VERSION = 40;

struct ECEntry { int ec, g1b, g1dc, g2b, g2dc; };
// index [version][level] with level order L,M,Q,H
static const ECEntry EC_TABLE[41][4] = {
    {},  // v0 unused
    {{7,1,19,0,0},{10,1,16,0,0},{13,1,13,0,0},{17,1,9,0,0}},
    {{10,1,34,0,0},{16,1,28,0,0},{22,1,22,0,0},{28,1,16,0,0}},
    {{15,1,55,0,0},{26,1,44,0,0},{18,2,17,0,0},{22,2,13,0,0}},
    {{20,1,80,0,0},{18,2,32,0,0},{26,2,24,0,0},{16,4,9,0,0}},
    {{26,1,108,0,0},{24,2,43,0,0},{18,2,15,2,16},{22,2,11,2,12}},
    {{18,2,68,0,0},{16,4,27,0,0},{24,4,19,0,0},{28,4,15,0,0}},
    {{20,2,78,0,0},{18,4,31,0,0},{18,2,14,4,15},{26,4,13,1,14}},
    {{24,2,97,0,0},{22,2,38,2,39},{22,4,18,2,19},{26,4,14,2,15}},
    {{30,2,116,0,0},{22,3,36,2,37},{20,4,16,4,17},{24,4,12,4,13}},
    {{18,2,68,2,69},{26,4,43,1,44},{24,6,19,2,20},{28,6,15,2,16}},
    {{20,4,81,0,0},{30,1,50,4,51},{28,4,22,4,23},{24,3,12,8,13}},
    {{24,2,92,2,93},{22,6,36,2,37},{26,4,20,6,21},{28,7,14,4,15}},
    {{26,4,107,0,0},{22,8,37,1,38},{24,8,20,4,21},{22,12,11,4,12}},
    {{30,3,115,1,116},{24,4,40,5,41},{20,11,16,5,17},{24,11,12,5,13}},
    {{22,5,87,1,88},{24,5,41,5,42},{30,5,24,7,25},{24,11,12,7,13}},
    {{24,5,98,1,99},{28,7,45,3,46},{24,15,19,2,20},{30,3,15,13,16}},
    {{28,1,107,5,108},{28,10,46,1,47},{28,1,22,15,23},{28,2,14,17,15}},
    {{30,5,120,1,121},{26,9,43,4,44},{28,17,22,1,23},{28,2,14,19,15}},
    {{28,3,113,4,114},{26,3,44,11,45},{26,17,21,4,22},{26,9,13,16,14}},
    {{28,3,107,5,108},{26,3,41,13,42},{30,15,24,5,25},{28,15,15,10,16}},
    {{28,4,116,4,117},{26,17,42,0,0},{28,17,22,6,23},{30,19,16,6,17}},
    {{28,2,111,7,112},{28,17,46,0,0},{30,7,24,16,25},{24,34,13,0,0}},
    {{30,4,121,5,122},{28,4,47,14,48},{30,11,24,14,25},{30,16,15,14,16}},
    {{30,6,117,4,118},{28,6,45,14,46},{30,11,24,16,25},{30,30,16,2,17}},
    {{26,8,106,4,107},{28,8,47,13,48},{30,7,24,22,25},{30,22,15,13,16}},
    {{28,10,114,2,115},{28,19,46,4,47},{28,28,22,6,23},{30,33,16,4,17}},
    {{30,8,122,4,123},{28,22,45,3,46},{30,8,23,26,24},{30,12,15,28,16}},
    {{30,3,117,10,118},{28,3,45,23,46},{30,4,24,31,25},{30,11,15,31,16}},
    {{30,7,116,7,117},{28,21,45,7,46},{30,1,23,37,24},{30,19,15,26,16}},
    {{30,5,115,10,116},{28,19,47,10,48},{30,15,24,25,25},{30,23,15,25,16}},
    {{30,13,115,3,116},{28,2,46,29,47},{30,42,24,1,25},{30,23,15,28,16}},
    {{30,17,115,0,0},{28,10,46,23,47},{30,10,24,35,25},{30,19,15,35,16}},
    {{30,17,115,1,116},{28,14,46,21,47},{30,29,24,19,25},{30,11,15,46,16}},
    {{30,13,115,6,116},{28,14,46,23,47},{30,44,24,7,25},{30,59,16,1,17}},
    {{30,12,121,7,122},{28,12,47,26,48},{30,39,24,14,25},{30,22,15,41,16}},
    {{30,6,121,14,122},{28,6,47,34,48},{30,46,24,10,25},{30,2,15,64,16}},
    {{30,17,122,4,123},{28,29,46,14,47},{30,49,24,10,25},{30,24,15,46,16}},
    {{30,4,122,18,123},{28,13,46,32,47},{30,48,24,14,25},{30,42,15,32,16}},
    {{30,20,117,4,118},{28,40,47,7,48},{30,43,24,22,25},{30,10,15,67,16}},
    {{30,19,118,6,119},{28,18,47,31,48},{30,34,24,34,25},{30,20,15,61,16}},
};
static const int ALIGN_POS[41][8] = {
    {0}, {0}, {2,6,18}, {2,6,22}, {2,6,26}, {2,6,30},
    {2,6,34}, {3,6,22,38}, {3,6,24,42}, {3,6,26,46}, {3,6,28,50},
    {3,6,30,54}, {3,6,32,58}, {3,6,34,62},
    {4,6,26,46,66}, {4,6,26,48,70}, {4,6,26,50,74},
    {4,6,30,54,78}, {4,6,30,56,82}, {4,6,30,58,86}, {4,6,34,62,90},
    {5,6,28,50,72,94}, {5,6,26,50,74,98}, {5,6,30,54,78,102},
    {5,6,28,54,80,106}, {5,6,32,58,84,110}, {5,6,30,58,86,114},
    {5,6,34,62,90,118},
    {6,6,26,50,74,98,122}, {6,6,30,54,78,102,126}, {6,6,26,52,78,104,130},
    {6,6,30,56,82,108,134}, {6,6,34,60,86,112,138}, {6,6,30,58,86,114,142},
    {6,6,34,62,90,118,146},
    {7,6,30,54,78,102,126,150}, {7,6,24,50,76,102,128,154},
    {7,6,28,54,80,106,132,158}, {7,6,32,58,84,110,136,162},
    {7,6,26,54,82,110,138,166}, {7,6,30,58,86,114,142,170},
};  // first entry = count

// format info: 15 bits; decode by minimum hamming distance over all 32 codes
static int format_table[32];
struct FormatInit {
  FormatInit() {
    for (int v = 0; v < 32; v++) {
      int val = v << 10;
      int g = 0b10100110111;
      for (int bit = 14; bit >= 10; bit--)
        if (val & (1 << bit)) val ^= g << (bit - 10);
      format_table[v] = ((v << 10) | val) ^ 0b101010000010010;
    }
  }
};
static FormatInit format_init;

// ---------------------------------------------------------------------------
// Binarization (integral-image adaptive threshold)
// ---------------------------------------------------------------------------

struct Bitmap {
  int h, w;
  std::vector<uint8_t> bit;  // 1 = dark
  uint8_t at(int y, int x) const {
    if (y < 0 || y >= h || x < 0 || x >= w) return 0;
    return bit[(size_t)y * w + x];
  }
};

Bitmap binarize(const uint8_t* img, int h, int w, int stride, bool smooth) {
  // 3x3 box smoothing first: cheap sensor-noise suppression that leaves
  // module edges (>=2px in practice) intact
  std::vector<uint8_t> sm((size_t)h * w);
  if (smooth) {
    for (int y = 0; y < h; y++) {
      int y0 = y > 0 ? y - 1 : y, y1 = y < h - 1 ? y + 1 : y;
      for (int x = 0; x < w; x++) {
        int x0 = x > 0 ? x - 1 : x, x1 = x < w - 1 ? x + 1 : x;
        int acc = 0, cnt = 0;
        for (int yy = y0; yy <= y1; yy++)
          for (int xx = x0; xx <= x1; xx++) { acc += img[(size_t)yy * stride + xx]; cnt++; }
        sm[(size_t)y * w + x] = (uint8_t)(acc / cnt);
      }
    }
  } else {
    for (int y = 0; y < h; y++)
      memcpy(&sm[(size_t)y * w], img + (size_t)y * stride, w);
  }
  Bitmap bm{h, w, std::vector<uint8_t>((size_t)h * w)};
  std::vector<uint64_t> integ((size_t)(h + 1) * (w + 1), 0);
  for (int y = 0; y < h; y++) {
    uint64_t row = 0;
    for (int x = 0; x < w; x++) {
      row += sm[(size_t)y * w + x];
      integ[(size_t)(y + 1) * (w + 1) + x + 1] =
          integ[(size_t)y * (w + 1) + x + 1] + row;
    }
  }
  int win = std::max(15, std::min(h, w) / 16) | 1;
  int r = win / 2;
  for (int y = 0; y < h; y++) {
    int y0 = std::max(0, y - r), y1 = std::min(h - 1, y + r);
    for (int x = 0; x < w; x++) {
      int x0 = std::max(0, x - r), x1 = std::min(w - 1, x + r);
      uint64_t sum = integ[(size_t)(y1 + 1) * (w + 1) + x1 + 1] -
                     integ[(size_t)y0 * (w + 1) + x1 + 1] -
                     integ[(size_t)(y1 + 1) * (w + 1) + x0] +
                     integ[(size_t)y0 * (w + 1) + x0];
      int area = (y1 - y0 + 1) * (x1 - x0 + 1);
      int mean = (int)(sum / area);
      // proportional threshold: inside large uniform dark regions the local
      // mean collapses toward 0, so `pixel < mean - c` would hollow them out;
      // `pixel < 0.85*mean + 8` keeps solid blacks solid and paper white
      bm.bit[(size_t)y * w + x] =
          sm[(size_t)y * w + x] * 20 < mean * 17 + 160 ? 1 : 0;
    }
  }
  return bm;
}

// ---------------------------------------------------------------------------
// Finder pattern detection (1:1:3:1:1 run scanning)
// ---------------------------------------------------------------------------

struct Finder {
  double x, y;      // center (pixels)
  double module;    // estimated module size (pixels)
  int votes;
};

bool ratio_ok(const int r[5]) {
  int total = r[0] + r[1] + r[2] + r[3] + r[4];
  if (total < 7) return false;
  double m = total / 7.0;
  double tol = m * 0.65;
  return std::fabs(r[0] - m) < tol && std::fabs(r[1] - m) < tol &&
         std::fabs(r[2] - 3 * m) < 3 * tol && std::fabs(r[3] - m) < tol &&
         std::fabs(r[4] - m) < tol;
}

// verify the 1:1:3:1:1 ratio vertically through (cx, cy); returns center y
// and (optionally) the vertical-cut module estimate
bool cross_check(const Bitmap& bm, int cx, int cy, double module, double* out_cy,
                 double* out_module = nullptr) {
  int h = bm.h;
  int runs[5] = {0, 0, 0, 0, 0};
  int y = cy;
  while (y >= 0 && bm.at(y, cx)) { runs[2]++; y--; }
  while (y >= 0 && !bm.at(y, cx) && runs[1] < 3 * module) { runs[1]++; y--; }
  while (y >= 0 && bm.at(y, cx) && runs[0] < 3 * module) { runs[0]++; y--; }
  int top = y;
  y = cy + 1;
  while (y < h && bm.at(y, cx)) { runs[2]++; y++; }
  while (y < h && !bm.at(y, cx) && runs[3] < 3 * module) { runs[3]++; y++; }
  while (y < h && bm.at(y, cx) && runs[4] < 3 * module) { runs[4]++; y++; }
  if (!ratio_ok(runs)) return false;
  *out_cy = top + runs[0] + runs[1] + runs[2] / 2.0 + 0.5;
  if (out_module)
    *out_module = (runs[0] + runs[1] + runs[2] + runs[3] + runs[4]) / 7.0;
  return true;
}

// verify the 1:1:3:1:1 ratio along one diagonal through (cx, cy). A real
// finder (concentric squares) shows the ratio on every cut through its
// center — √2-scaled on the diagonal, which ratio_ok is scale-free about.
// Data-region false positives almost never survive H+V+diagonal together
// (ZXing's crossCheckDiagonal trick).
bool cross_check_diag(const Bitmap& bm, int cx, int cy, double module,
                      double* out_module = nullptr) {
  double lim = 5 * module;  // diagonal runs are up to ~√2 longer
  int runs[5] = {0, 0, 0, 0, 0};
  int i = 0;
  while (bm.at(cy - i, cx - i) && i <= cy && i <= cx) { runs[2]++; i++; }
  while (bm.at(cy - i, cx - i) == 0 && i <= cy && i <= cx && runs[1] < lim) { runs[1]++; i++; }
  while (bm.at(cy - i, cx - i) && i <= cy && i <= cx && runs[0] < lim) { runs[0]++; i++; }
  i = 1;
  while (bm.at(cy + i, cx + i) && cy + i < bm.h && cx + i < bm.w) { runs[2]++; i++; }
  while (bm.at(cy + i, cx + i) == 0 && cy + i < bm.h && cx + i < bm.w && runs[3] < lim) { runs[3]++; i++; }
  while (bm.at(cy + i, cx + i) && cy + i < bm.h && cx + i < bm.w && runs[4] < lim) { runs[4]++; i++; }
  if (!ratio_ok(runs)) return false;
  if (out_module)
    *out_module = (runs[0] + runs[1] + runs[2] + runs[3] + runs[4]) *
                  1.41421356237 / 7.0;
  return true;
}

std::vector<Finder> find_finders(const Bitmap& bm) {
  std::vector<Finder> out;
  for (int y = 0; y < bm.h; y += 2) {
    int x = 0;
    // skip initial light
    while (x < bm.w && !bm.at(y, x)) x++;
    int run_start = x;
    int current = 1;  // dark
    int count = 0;
    std::vector<std::pair<int,int>> seq;  // (value, length)
    for (; x <= bm.w; x++) {
      int v = x < bm.w ? bm.at(y, x) : 2;  // force flush at end
      if (v == current) {
        count++;
      } else {
        seq.push_back({current, count});
        if ((int)seq.size() >= 5 && seq.back().first == 1) {
          // last five runs d,l,d,l,d
          int n = (int)seq.size();
          int r[5];
          bool pattern = true;
          for (int k = 0; k < 5; k++) {
            auto [val, len] = seq[n - 5 + k];
            if (val != (k % 2 == 0 ? 1 : 0)) { pattern = false; break; }
            r[k] = len;
          }
          if (pattern && ratio_ok(r)) {
            int total = r[0] + r[1] + r[2] + r[3] + r[4];
            // run r[4] ends at pixel x-1, so the 3-wide core center is at
            // x - r4 - r3 - r2/2
            double cx = x - (r[4] + r[3] + r[2] / 2.0);
            double module = total / 7.0;
            double cy_ref, mv = module, md = module;
            if (cross_check(bm, (int)cx, y, module, &cy_ref, &mv) &&
                cross_check_diag(bm, (int)cx, (int)std::lround(cy_ref), module,
                                 &md)) {
              // under in-plane rotation θ every axis-aligned cut inflates the
              // run lengths by 1/cos(angle to the nearest pattern axis); of
              // the H/V/diagonal cuts one is always within 22.5°, so the MIN
              // of the three estimates is within 8.3% of the true module —
              // the H-only estimate is off by up to 41%, which at v17+ mis-
              // sizes the grid by whole versions.
              module = std::min({module, mv, md});
              bool merged = false;
              for (auto& f : out) {
                // same pattern only if position AND module size agree —
                // otherwise nearby data-area false positives drag the center
                if (std::fabs(f.x - cx) < 3 * module &&
                    std::fabs(f.y - cy_ref) < 3 * module &&
                    std::fabs(f.module - module) < 0.35 * module) {
                  f.x = (f.x * f.votes + cx) / (f.votes + 1);
                  f.y = (f.y * f.votes + cy_ref) / (f.votes + 1);
                  f.module = (f.module * f.votes + module) / (f.votes + 1);
                  f.votes++;
                  merged = true;
                  break;
                }
              }
              if (!merged) out.push_back({cx, cy_ref, module, 1});
            }
          }
        }
        current = v;
        count = 1;
      }
    }
    (void)run_start;
  }
  return out;
}

// ---------------------------------------------------------------------------
// Grid sampling + decode
// ---------------------------------------------------------------------------

struct Grid {
  int n;                       // modules per side
  // affine/perspective mapping module coords -> pixel coords
  double c[8];                 // perspective coefficients
  double px(double u, double v) const {
    double d = c[6] * u + c[7] * v + 1.0;
    return (c[0] * u + c[1] * v + c[2]) / d;
  }
  double py(double u, double v) const {
    double d = c[6] * u + c[7] * v + 1.0;
    return (c[3] * u + c[4] * v + c[5]) / d;
  }
};

static bool gauss_solve8(double A[8][9], double c[8]) {
  for (int col = 0; col < 8; col++) {
    int piv = col;
    for (int r = col + 1; r < 8; r++)
      if (std::fabs(A[r][col]) > std::fabs(A[piv][col])) piv = r;
    if (std::fabs(A[piv][col]) < 1e-12) return false;
    if (piv != col)
      for (int k = 0; k < 9; k++) std::swap(A[piv][k], A[col][k]);
    for (int r = 0; r < 8; r++) {
      if (r == col) continue;
      double f = A[r][col] / A[col][col];
      for (int k = col; k < 9; k++) A[r][k] -= f * A[col][k];
    }
  }
  for (int i = 0; i < 8; i++) c[i] = A[i][8] / A[i][i];
  return true;
}

// solve perspective transform from 4 (u,v)->(x,y) pairs
bool solve_perspective(const double uv[4][2], const double xy[4][2], double c[8]) {
  // build 8x8 linear system
  double A[8][9];
  for (int i = 0; i < 4; i++) {
    double u = uv[i][0], v = uv[i][1], x = xy[i][0], y = xy[i][1];
    double* r1 = A[2 * i];
    double* r2 = A[2 * i + 1];
    r1[0] = u; r1[1] = v; r1[2] = 1; r1[3] = 0; r1[4] = 0; r1[5] = 0;
    r1[6] = -u * x; r1[7] = -v * x; r1[8] = x;
    r2[0] = 0; r2[1] = 0; r2[2] = 0; r2[3] = u; r2[4] = v; r2[5] = 1;
    r2[6] = -u * y; r2[7] = -v * y; r2[8] = y;
  }
  return gauss_solve8(A, c);
}

// least-squares homography from >=4 (u,v)->(x,y) pairs (normal equations).
// `pts` is packed (u, v, x, y). Used to fit the sampling grid to ALL detected
// alignment patterns at large versions, where a 3-finder+1-alignment exact
// solve leaves too much drift at the far corner.
bool solve_homography_ls(const std::vector<double>& pts, double c[8]) {
  size_t np = pts.size() / 4;
  if (np < 4) return false;
  double AtA[8][8] = {{0}}, Atb[8] = {0};
  for (size_t p = 0; p < np; p++) {
    double u = pts[4 * p], v = pts[4 * p + 1];
    double x = pts[4 * p + 2], y = pts[4 * p + 3];
    double r1[8] = {u, v, 1, 0, 0, 0, -u * x, -v * x};
    double r2[8] = {0, 0, 0, u, v, 1, -u * y, -v * y};
    for (int a = 0; a < 8; a++) {
      for (int b = 0; b < 8; b++) AtA[a][b] += r1[a] * r1[b] + r2[a] * r2[b];
      Atb[a] += r1[a] * x + r2[a] * y;
    }
  }
  double A[8][9];
  for (int i = 0; i < 8; i++) {
    for (int j = 0; j < 8; j++) A[i][j] = AtA[i][j];
    A[i][8] = Atb[i];
  }
  return gauss_solve8(A, c);
}

int sample(const Bitmap& bm, const Grid& g, int row, int col) {
  double x = g.px(col + 0.5, row + 0.5);
  double y = g.py(col + 0.5, row + 0.5);
  return bm.at((int)std::lround(y), (int)std::lround(x));
}

bool is_function_module(int n, int version, int r, int c) {
  // finders + separators + format areas
  if (r <= 8 && c <= 8) return true;
  if (r <= 8 && c >= n - 8) return true;
  if (r >= n - 8 && c <= 8) return true;
  if (r == 6 || c == 6) return true;  // timing
  // version info
  if (version >= 7) {
    if (r < 6 && c >= n - 11 && c <= n - 9) return true;
    if (c < 6 && r >= n - 11 && r <= n - 9) return true;
  }
  // alignment patterns
  int cnt = ALIGN_POS[version][0];
  for (int i = 1; i <= cnt; i++) {
    for (int j = 1; j <= cnt; j++) {
      int ar = ALIGN_POS[version][i], ac = ALIGN_POS[version][j];
      int lo = ALIGN_POS[version][1], hi = ALIGN_POS[version][cnt];
      if ((ar == lo && ac == lo) || (ar == lo && ac == hi) || (ar == hi && ac == lo))
        continue;
      if (std::abs(r - ar) <= 2 && std::abs(c - ac) <= 2) return true;
    }
  }
  return false;
}

bool mask_bit(int mask, int r, int c) {
  switch (mask) {
    case 0: return (r + c) % 2 == 0;
    case 1: return r % 2 == 0;
    case 2: return c % 3 == 0;
    case 3: return (r + c) % 3 == 0;
    case 4: return (r / 2 + c / 3) % 2 == 0;
    case 5: return (r * c) % 2 + (r * c) % 3 == 0;
    case 6: return ((r * c) % 2 + (r * c) % 3) % 2 == 0;
    default: return ((r + c) % 2 + (r * c) % 3) % 2 == 0;
  }
}

// read format info from the sampled matrix; returns (level, mask) or false
bool read_format(const std::vector<uint8_t>& m, int n, int* level, int* mask) {
  int f1 = 0, f2 = 0;
  const int ca[15][2] = {{0,8},{1,8},{2,8},{3,8},{4,8},{5,8},{7,8},{8,8},
                         {8,7},{8,5},{8,4},{8,3},{8,2},{8,1},{8,0}};
  for (int i = 0; i < 15; i++) f1 |= m[(size_t)ca[i][0] * n + ca[i][1]] << i;
  const int cb_a[8][2] = {{8,-1},{8,-2},{8,-3},{8,-4},{8,-5},{8,-6},{8,-7},{8,-8}};
  for (int i = 0; i < 8; i++)
    f2 |= m[(size_t)cb_a[i][0] * n + (n + cb_a[i][1])] << i;
  for (int i = 8; i < 15; i++)
    f2 |= m[(size_t)(n - 7 + (i - 8)) * n + 8] << i;

  int best = -1, best_dist = 4;
  for (int v = 0; v < 32; v++) {
    int d1 = __builtin_popcount(f1 ^ format_table[v]);
    int d2 = __builtin_popcount(f2 ^ format_table[v]);
    int d = std::min(d1, d2);
    if (d < best_dist) { best_dist = d; best = v; }
  }
  if (best < 0) return false;
  static const int LEVEL_MAP[4] = {1, 0, 3, 2};  // bits 01->L(0)? map below
  int level_bits = best >> 3;
  // bits: L=01, M=00, Q=11, H=10 -> index L,M,Q,H = 0,1,2,3
  int idx;
  switch (level_bits) {
    case 0b01: idx = 0; break;
    case 0b00: idx = 1; break;
    case 0b11: idx = 2; break;
    default: idx = 3; break;
  }
  (void)LEVEL_MAP;
  *level = idx;
  *mask = best & 7;
  return true;
}

// zigzag codeword extraction
std::vector<uint8_t> extract_codewords(const std::vector<uint8_t>& m, int n,
                                       int version, int mask) {
  std::vector<uint8_t> bits;
  bits.reserve((size_t)n * n);
  int col = n - 1;
  bool up = true;
  while (col > 0) {
    if (col == 6) col--;
    for (int k = 0; k < n; k++) {
      int r = up ? n - 1 - k : k;
      for (int cc = col; cc >= col - 1; cc--) {
        if (is_function_module(n, version, r, cc)) continue;
        uint8_t bit = m[(size_t)r * n + cc];
        if (mask_bit(mask, r, cc)) bit ^= 1;
        bits.push_back(bit);
      }
    }
    up = !up;
    col -= 2;
  }
  std::vector<uint8_t> cw;
  for (size_t i = 0; i + 8 <= bits.size(); i += 8) {
    uint8_t b = 0;
    for (int k = 0; k < 8; k++) b = (uint8_t)((b << 1) | bits[i + k]);
    cw.push_back(b);
  }
  return cw;
}

// de-interleave + RS-correct; returns data codewords or empty on failure
std::vector<uint8_t> correct_and_order(const std::vector<uint8_t>& cw,
                                       int version, int level) {
  const ECEntry e = EC_TABLE[version][level];
  int nblocks = e.g1b + e.g2b;
  int total_dc = e.g1b * e.g1dc + e.g2b * e.g2dc;
  int total = total_dc + nblocks * e.ec;
  if ((int)cw.size() < total) return {};

  std::vector<std::vector<uint8_t>> blocks(nblocks);
  std::vector<int> dc(nblocks);
  for (int b = 0; b < nblocks; b++) dc[b] = b < e.g1b ? e.g1dc : e.g2dc;
  int max_dc = *std::max_element(dc.begin(), dc.end());
  size_t pos = 0;
  for (int i = 0; i < max_dc; i++)
    for (int b = 0; b < nblocks; b++)
      if (i < dc[b]) blocks[b].push_back(cw[pos++]);
  for (int i = 0; i < e.ec; i++)
    for (int b = 0; b < nblocks; b++) blocks[b].push_back(cw[pos++]);

  std::vector<uint8_t> data;
  for (int b = 0; b < nblocks; b++) {
    if (!rs_correct(blocks[b], e.ec)) return {};
    data.insert(data.end(), blocks[b].begin(), blocks[b].begin() + dc[b]);
  }
  return data;
}

// bitstream -> payload string
bool parse_bitstream(const std::vector<uint8_t>& data, int version, std::string* out) {
  size_t bitpos = 0;
  size_t nbits = data.size() * 8;
  auto get = [&](int k) -> int {
    int v = 0;
    for (int i = 0; i < k; i++) {
      if (bitpos >= nbits) return -1;
      v = (v << 1) | ((data[bitpos / 8] >> (7 - bitpos % 8)) & 1);
      bitpos++;
    }
    return v;
  };
  static const char* ALNUM =
      "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ $%*+-./:";
  std::string res;
  while (true) {
    if (nbits - bitpos < 4) break;
    int mode = get(4);
    if (mode <= 0) break;          // terminator / exhausted
    if (mode == 0b0001) {          // numeric
      int cnt = get(version <= 9 ? 10 : (version <= 26 ? 12 : 14));
      if (cnt < 0) return false;
      while (cnt >= 3) { int v = get(10); if (v < 0) return false;
        res += (char)('0' + v / 100); res += (char)('0' + (v / 10) % 10);
        res += (char)('0' + v % 10); cnt -= 3; }
      if (cnt == 2) { int v = get(7); if (v < 0) return false;
        res += (char)('0' + v / 10); res += (char)('0' + v % 10); }
      else if (cnt == 1) { int v = get(4); if (v < 0) return false;
        res += (char)('0' + v); }
    } else if (mode == 0b0010) {   // alphanumeric
      int cnt = get(version <= 9 ? 9 : (version <= 26 ? 11 : 13));
      if (cnt < 0) return false;
      while (cnt >= 2) { int v = get(11); if (v < 0) return false;
        res += ALNUM[v / 45]; res += ALNUM[v % 45]; cnt -= 2; }
      if (cnt == 1) { int v = get(6); if (v < 0) return false; res += ALNUM[v]; }
    } else if (mode == 0b0100) {   // byte
      int cnt = get(version <= 9 ? 8 : 16);
      if (cnt < 0) return false;
      for (int i = 0; i < cnt; i++) { int v = get(8); if (v < 0) return false;
        res += (char)v; }
    } else if (mode == 0b0111) {   // ECI: skip designator
      int first = get(8);
      if (first < 0) return false;
      if ((first & 0x80) == 0) {}
      else if ((first & 0xC0) == 0x80) { if (get(8) < 0) return false; }
      else { if (get(16) < 0) return false; }
    } else if (mode == 0b1000) {   // kanji: decode as raw shift-JIS bytes
      int cnt = get(version <= 9 ? 8 : (version <= 26 ? 10 : 12));
      if (cnt < 0) return false;
      for (int i = 0; i < cnt; i++) { int v = get(13); if (v < 0) return false;
        res += (char)(v >> 8); res += (char)(v & 0xFF); }
    } else {
      break;  // unknown mode — stop, keep what we have
    }
  }
  if (res.empty()) return false;
  *out = res;
  return true;
}

double dist(const Finder& a, const Finder& b) {
  return std::hypot(a.x - b.x, a.y - b.y);
}

// Re-measure a finder center by walking the 1:1:3:1:1 runs horizontally then
// vertically from the current estimate (two passes). Horizontal-scan voting
// alone drifts under rotation because only cy is cross-checked at detect time.
bool refine_finder(const Bitmap& bm, Finder* f) {
  for (int pass = 0; pass < 2; pass++) {
    int cx = (int)std::lround(f->x), cy = (int)std::lround(f->y);
    if (!bm.at(cy, cx)) return pass > 0;
    double lim = 4 * f->module;
    // horizontal runs
    int r[5] = {0, 0, 0, 0, 0};
    int x = cx;
    while (x >= 0 && bm.at(cy, x)) { r[2]++; x--; }
    while (x >= 0 && !bm.at(cy, x) && r[1] < lim) { r[1]++; x--; }
    while (x >= 0 && bm.at(cy, x) && r[0] < lim) { r[0]++; x--; }
    int left = x;
    x = cx + 1;
    while (x < bm.w && bm.at(cy, x)) { r[2]++; x++; }
    while (x < bm.w && !bm.at(cy, x) && r[3] < lim) { r[3]++; x++; }
    while (x < bm.w && bm.at(cy, x) && r[4] < lim) { r[4]++; x++; }
    if (!ratio_ok(r)) return false;
    f->x = left + r[0] + r[1] + r[2] / 2.0 + 0.5;
    double hmod = (r[0] + r[1] + r[2] + r[3] + r[4]) / 7.0;
    double vy, vmod = hmod;
    if (!cross_check(bm, (int)std::lround(f->x), cy, f->module, &vy, &vmod))
      return false;
    f->y = vy;
    // keep the smallest module estimate seen — axis-aligned cuts only ever
    // inflate it under rotation (see find_finders)
    f->module = std::min({f->module, hmod, vmod});
  }
  return true;
}

// BCH(18,6) version-info codeword, generator 0x1F25 (matches the encoder's
// _version_bits, qr/encode.py)
static int version_info_bits(int v) {
  int val = v << 12;
  int g = 0b1111100100101;
  for (int bit = 17; bit >= 12; bit--)
    if (val & (1 << bit)) val ^= g << (bit - 12);
  return (v << 12) | val;
}

// Sample the two 18-bit version-info blocks (v>=7) through a provisional
// grid and BCH-decode with <=3 bit errors. Near the anchoring finders the
// provisional grid is accurate even when its assumed n is off by a version
// or two, so this pins the version before the expensive sampling loop.
static int read_version_info(const Bitmap& bm, const Grid& g, int n) {
  int b_tr = 0, b_bl = 0;
  for (int i = 0; i < 18; i++) {
    // encoder places bit i at (i/3, n-11+i%3) and its transpose
    b_tr |= sample(bm, g, i / 3, n - 11 + i % 3) << i;
    b_bl |= sample(bm, g, n - 11 + i % 3, i / 3) << i;
  }
  int best = -1, best_d = 4;
  for (int v = 7; v <= MAX_VERSION; v++) {
    int ref = version_info_bits(v);
    int d = std::min(__builtin_popcount(b_tr ^ ref),
                     __builtin_popcount(b_bl ^ ref));
    if (d < best_d) { best_d = d; best = v; }
  }
  return best;
}

// one full decode attempt for a fixed finder-role assignment (tl, tr, bl)
bool decode_oriented(const Bitmap& bm, const Finder* tl, const Finder* tr,
                     const Finder* bl, std::string* out) {
  double module = (tl->module + tr->module + bl->module) / 3.0;
  if (module <= 0) return false;
  double side = (dist(*tl, *tr) + dist(*tl, *bl)) / 2.0;
  int n_est = (int)std::lround(side / module) + 7;
  // snap to valid sizes 21 + 4k
  int best_version = -1, best_err = 1 << 30;
  for (int v = 1; v <= MAX_VERSION; v++) {
    int n = 17 + 4 * v;
    int err = std::abs(n - n_est);
    if (err < best_err) { best_err = err; best_version = v; }
  }
  if (best_version < 0 || best_err > 6) {
    if (qr_debug()) fprintf(stderr, "[qrdecode] n_est=%d rejected\n", n_est);
    return false;
  }
  if (qr_debug()) fprintf(stderr, "[qrdecode] n_est=%d try v=%d..\n", n_est, best_version);

  auto grid_for = [&](int n, Grid* g) -> bool {
    // perspective from the three finder centers (+ inferred 4th corner):
    // finder centers sit at module coords (3.5, 3.5), (n-3.5, 3.5), (3.5, n-3.5)
    double uv[4][2] = {{3.5, 3.5}, {n - 3.5, 3.5}, {3.5, n - 3.5},
                       {n - 3.5, n - 3.5}};
    double xy[4][2] = {{tl->x, tl->y}, {tr->x, tr->y}, {bl->x, bl->y},
                       {tr->x + bl->x - tl->x, tr->y + bl->y - tl->y}};
    g->n = n;
    return solve_perspective(uv, xy, g->c);
  };

  // candidate version list: a readable version-info block (v>=7) wins,
  // else +-2 around the size estimate
  std::vector<int> cands;
  if (best_version >= 6) {
    Grid g0;
    if (grid_for(17 + 4 * best_version, &g0)) {
      int vi = read_version_info(bm, g0, g0.n);
      if (vi >= 7 && std::abs((17 + 4 * vi) - n_est) <= 10) {
        cands.push_back(vi);
        if (qr_debug()) fprintf(stderr, "[qrdecode] version info -> v=%d\n", vi);
      }
    }
  }
  for (int v = best_version - 2; v <= best_version + 2; v++)
    if (v >= 1 && v <= MAX_VERSION && (cands.empty() || v != cands[0]))
      cands.push_back(v);

  for (int version : cands) {
    int n = 17 + 4 * version;
    Grid g;
    if (!grid_for(n, &g)) continue;

    // refine the grid against every alignment pattern we can find (v >= 2):
    // least-squares homography over {3 finder centers} ∪ {found alignments}.
    // One bottom-right alignment suffices at small versions; large versions
    // need the full constellation to keep far-corner sampling on-grid.
    if (version >= 2) {
      double m_px = side / (n - 7);
      std::vector<double> pts = {3.5, 3.5, tl->x, tl->y,
                                 n - 3.5, 3.5, tr->x, tr->y,
                                 3.5, n - 3.5, bl->x, bl->y};
      int cnt = ALIGN_POS[version][0];
      int lo = ALIGN_POS[version][1], hi = ALIGN_POS[version][cnt];
      for (int i = 1; i <= cnt; i++) {
        for (int j = 1; j <= cnt; j++) {
          int ar = ALIGN_POS[version][i], ac = ALIGN_POS[version][j];
          if ((ar == lo && ac == lo) || (ar == lo && ac == hi) ||
              (ar == hi && ac == lo))
            continue;
          double ex = g.px(ac + 0.5, ar + 0.5), ey = g.py(ac + 0.5, ar + 0.5);
          // centroid of all pixels that look like the alignment core (dark
          // with a light ring one module away) — first-match would bias
          // toward the core's top-left edge and skew the grid
          double sx_acc = 0, sy_acc = 0;
          int n_acc = 0;
          int rad = (int)(2 * m_px);
          for (int dy = -rad; dy <= rad; dy++) {
            for (int dx = -rad; dx <= rad; dx++) {
              int x = (int)std::lround(ex + dx), y = (int)std::lround(ey + dy);
              if (bm.at(y, x) &&
                  !bm.at((int)(y - m_px), x) && !bm.at((int)(y + m_px), x) &&
                  !bm.at(y, (int)(x - m_px)) && !bm.at(y, (int)(x + m_px))) {
                sx_acc += x + 0.5; sy_acc += y + 0.5; n_acc++;
              }
            }
          }
          if (n_acc > 0)
            pts.insert(pts.end(),
                       {ac + 0.5, ar + 0.5, sx_acc / n_acc, sy_acc / n_acc});
        }
      }
      if (pts.size() / 4 >= 4) {
        Grid g2;
        g2.n = n;
        if (solve_homography_ls(pts, g2.c)) g = g2;
      }
    }

    // sample all modules
    std::vector<uint8_t> m((size_t)n * n);
    for (int r = 0; r < n; r++)
      for (int c2 = 0; c2 < n; c2++)
        m[(size_t)r * n + c2] = (uint8_t)sample(bm, g, r, c2);

    // sanity: timing pattern should alternate reasonably
    int good = 0, tot = 0;
    for (int i = 8; i < n - 8; i++) {
      tot += 2;
      if (m[(size_t)6 * n + i] == (uint8_t)(1 - i % 2)) good++;
      if (m[(size_t)i * n + 6] == (uint8_t)(1 - i % 2)) good++;
    }
    if (qr_debug()) fprintf(stderr, "[qrdecode] v=%d timing %d/%d\n", version, good, tot);
    if (tot > 0 && good * 4 < tot * 3) continue;  // <75% timing match

    int level, mask;
    if (!read_format(m, n, &level, &mask)) {
      if (qr_debug()) fprintf(stderr, "[qrdecode] v=%d format FAIL\n", version);
      continue;
    }
    if (qr_debug()) fprintf(stderr, "[qrdecode] v=%d level=%d mask=%d\n", version, level, mask);
    auto cw = extract_codewords(m, n, version, mask);
    if (qr_debug()) {
      fprintf(stderr, "[qrdecode] cw:");
      for (size_t q = 0; q < cw.size() && q < 12; q++) fprintf(stderr, " %02x", cw[q]);
      fprintf(stderr, "\n");
    }
    auto data = correct_and_order(cw, version, level);
    if (data.empty()) {
      if (qr_debug()) fprintf(stderr, "[qrdecode] v=%d RS FAIL (%zu cw)\n", version, cw.size());
      continue;
    }
    std::string payload;
    if (!parse_bitstream(data, version, &payload)) {
      if (qr_debug()) fprintf(stderr, "[qrdecode] v=%d bitstream FAIL\n", version);
      continue;
    }
    *out = payload;
    return true;
  }
  return false;
}

// try to decode one QR given three finder centers: pick the top-left corner
// geometrically (largest opposite side), orient via cross product, and fall
// back to the mirrored role assignment when the normal one fails — in a
// mirrored image top-right and bottom-left swap (ZXing-style mirror retry;
// the reference's decode path inherits this from ZXing, app_camera.py:464).
bool decode_triple(const Bitmap& bm, const Finder& f0, const Finder& f1,
                   const Finder& f2, std::string* out) {
  const Finder* tl;
  const Finder* a;
  const Finder* b;
  double d01 = dist(f0, f1), d02 = dist(f0, f2), d12 = dist(f1, f2);
  if (d12 >= d01 && d12 >= d02) { tl = &f0; a = &f1; b = &f2; }
  else if (d02 >= d01 && d02 >= d12) { tl = &f1; a = &f0; b = &f2; }
  else { tl = &f2; a = &f0; b = &f1; }
  // orient: cross product decides which of a/b is top-right vs bottom-left
  double ax = a->x - tl->x, ay = a->y - tl->y;
  double bx = b->x - tl->x, by = b->y - tl->y;
  const Finder* tr;
  const Finder* bl;
  if (ax * by - ay * bx > 0) { tr = a; bl = b; }
  else { tr = b; bl = a; }

  Finder rtl = *tl, rtr = *tr, rbl = *bl;
  if (refine_finder(bm, &rtl)) tl = &rtl;
  if (refine_finder(bm, &rtr)) tr = &rtr;
  if (refine_finder(bm, &rbl)) bl = &rbl;

  if (decode_oriented(bm, tl, tr, bl, out)) return true;
  return decode_oriented(bm, tl, bl, tr, out);
}

}  // namespace

extern "C" {

static int decode_pass(const uint8_t* img, int h, int w, int stride,
                       bool smooth, std::vector<std::string>& results) {
  Bitmap bm = binarize(img, h, w, stride, smooth);
  std::vector<Finder> finders = find_finders(bm);
  if (qr_debug()) {
    fprintf(stderr, "[qrdecode] %zu finder candidates\n", finders.size());
    for (auto& f : finders)
      fprintf(stderr, "  (%.1f,%.1f) module=%.2f votes=%d\n", f.x, f.y, f.module, f.votes);
  }
  // keep plausible finders only
  std::vector<Finder> fs;
  for (auto& f : finders)
    if (f.votes >= 2) fs.push_back(f);
  if (fs.size() < 3) fs = finders;
  if (fs.size() < 3) return 0;
  std::sort(fs.begin(), fs.end(),
            [](const Finder& a, const Finder& b) { return a.votes > b.votes; });
  if (fs.size() > 16) fs.resize(16);

  int count = 0;
  // decode_triple is ~1-2 ms even on garbage (sampling + RS attempts);
  // on noise the 16-finder cap still allows C(16,3)=560 attempts (~1 s
  // measured). Two guards keep the worst case bounded without touching
  // real frames: (a) a geometry prefilter — genuine finder centers form
  // a right isoceles triangle (legs equal, hyp² ≈ leg²+leg², legs ≥
  // ~(n-7)·module ≥ 14·module for v1) with wide tolerances for
  // perspective; (b) a hard cap on decode attempts per pass.
  int attempts = 0;
  const int kMaxAttempts = 96;
  auto d2 = [](const Finder& a, const Finder& b) {
    double dx = a.x - b.x, dy = a.y - b.y;
    return dx * dx + dy * dy;
  };
  for (size_t i = 0; i < fs.size() && attempts < kMaxAttempts; i++)
    for (size_t j = i + 1; j < fs.size() && attempts < kMaxAttempts; j++)
      for (size_t k = j + 1; k < fs.size() && attempts < kMaxAttempts; k++) {
        // module sizes must be comparable
        double mn = std::min({fs[i].module, fs[j].module, fs[k].module});
        double mx = std::max({fs[i].module, fs[j].module, fs[k].module});
        if (mx > 1.6 * mn) continue;
        double dij = d2(fs[i], fs[j]), dik = d2(fs[i], fs[k]),
               djk = d2(fs[j], fs[k]);
        double hyp = std::max({dij, dik, djk});
        double l1 = dij + dik + djk - hyp -
                    std::min({dij, dik, djk});  // middle leg
        double l2 = std::min({dij, dik, djk});
        if (l2 < 1e-9 || l1 > 2.2 * l2) continue;  // legs within ~1.5×
        if (hyp < 0.6 * (l1 + l2) || hyp > 1.5 * (l1 + l2))
          continue;  // corner angle far from 90°
        double m_avg = (fs[i].module + fs[j].module + fs[k].module) / 3.0;
        if (l2 < (10.0 * m_avg) * (10.0 * m_avg))
          continue;  // closer than any legal version allows
        attempts++;
        std::string payload;
        if (decode_triple(bm, fs[i], fs[j], fs[k], &payload)) {
          bool dup = false;
          for (auto& r : results) dup |= (r == payload);
          if (dup) continue;
          results.push_back(payload);
          count++;
        }
      }
  return count;
}

int qr_decode_gray(const uint8_t* img, int h, int w, int stride,
                   char* out, int out_cap) {
  if (!img || h < 21 || w < 21) return 0;
  std::vector<std::string> results;
  decode_pass(img, h, w, stride, /*smooth=*/true, results);
  if (results.empty())
    decode_pass(img, h, w, stride, /*smooth=*/false, results);
  if (results.empty()) {
    // low-contrast fallback: global min/max stretch to full range (the
    // proportional binarizer assumes blacks near 0)
    uint8_t lo = 255, hi = 0;
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++) {
        uint8_t v = img[(size_t)y * stride + x];
        lo = std::min(lo, v);
        hi = std::max(hi, v);
      }
    if (hi > lo && (lo > 40 || hi < 215)) {
      std::vector<uint8_t> st((size_t)h * w);
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
          st[(size_t)y * w + x] =
              (uint8_t)((img[(size_t)y * stride + x] - lo) * 255 / (hi - lo));
      decode_pass(st.data(), h, w, w, /*smooth=*/true, results);
    }
  }
  int count = 0;
  size_t written = 0;
  for (auto& payload : results) {
    size_t need = payload.size() + 1;
    if (written + need <= (size_t)out_cap) {
      memcpy(out + written, payload.data(), payload.size());
      out[written + payload.size()] = '\0';
      written += need;
      count++;
    }
  }
  return count;
}

}  // extern "C"
