// Native banded anchored DP (gap fill + free-end extension for ANIm).
//
// Bit-identical port of pyani_plus_tpu/ops/extend.py::_band_dp: same
// band geometry (unit diagonal for free-end extension, scaled diagonal
// for anchored fills), same linear gap model, same tie rules:
//   - base = max(diag, up) with diag preferred on ties;
//   - left-gap closure source = *latest* index achieving the running
//     max of (base - gap*k);
//   - free-end best updates on strictly-greater score, or equal score
//     with larger i+j (prefer longer extensions).
//
// Build: g++ -O3 -shared -fPIC band.cpp -o libband.so

#include <cstdint>
#include <vector>

namespace {
constexpr int64_t NEG = -1000000000LL;
}

extern "C" {

// out[5] = {best_i, best_j, best_score, errors, gapcols}
void band_dp(const uint8_t *a, int64_t m, const uint8_t *b, int64_t n,
             int64_t band, int free_end, int match, int mismatch, int gap,
             int64_t *out) {
  const int64_t width = 2 * band + 1;
  std::vector<int64_t> score(width), err(width), gaps(width);
  std::vector<int64_t> nscore(width), nerr(width), ngaps(width);
  std::vector<int64_t> base(width), berr(width), bgap(width);

  auto center = [&](int64_t i) -> int64_t {
    return free_end ? i : (i * n) / m;
  };

  const int64_t c0 = center(0);
  for (int64_t k = 0; k < width; k++) {
    const int64_t j = k + (c0 - band);
    if (j >= 0 && j <= n) {
      const int64_t aj = j < 0 ? -j : j;
      score[k] = (int64_t)gap * aj;
      err[k] = aj;
      gaps[k] = aj;
    } else {
      score[k] = NEG;
      err[k] = 0;
      gaps[k] = 0;
    }
  }
  int64_t best_i = 0, best_j = 0, best_s = 0, best_e = 0, best_g = 0;
  if (free_end) {
    int64_t k0 = 0;
    for (int64_t k = 1; k < width; k++)
      if (score[k] > score[k0]) k0 = k;
    if (score[k0] > best_s) {
      best_i = 0;
      best_j = k0 + (c0 - band);
      best_s = score[k0];
      best_e = err[k0];
      best_g = gaps[k0];
    }
  }

  for (int64_t i = 1; i <= m; i++) {
    const int64_t ci = center(i), cp = center(i - 1);
    const int64_t shift = ci - cp;
    const uint8_t ac = a[i - 1];

    // base = max(diag, up), diag preferred on tie; then left closure
    for (int64_t k = 0; k < width; k++) {
      const int64_t j = k + (ci - band);
      const bool valid = j >= 0 && j <= n;
      // previous-row values at offsets (k + shift - 1) and (k + shift)
      const int64_t di = k + shift - 1;
      const int64_t ui = k + shift;
      const int64_t diag_s = (di >= 0 && di < width) ? score[di] : NEG;
      const int64_t diag_e = (di >= 0 && di < width) ? err[di] : 0;
      const int64_t diag_g = (di >= 0 && di < width) ? gaps[di] : 0;
      const int64_t up_s = (ui >= 0 && ui < width) ? score[ui] : NEG;
      const int64_t up_e = (ui >= 0 && ui < width) ? err[ui] : 0;
      const int64_t up_g = (ui >= 0 && ui < width) ? gaps[ui] : 0;

      const bool in_b = valid && j >= 1;
      bool sub_ok = false;
      if (in_b) {
        const uint8_t bc = b[j - 1];
        sub_ok = (bc == ac) && ac < 4 && bc < 4;
      }
      const int64_t d = in_b ? diag_s + (sub_ok ? match : mismatch) : NEG;
      const int64_t u = up_s + gap;
      if (d >= u) {
        base[k] = d;
        berr[k] = diag_e + (sub_ok ? 0 : 1);
        bgap[k] = diag_g;
      } else {
        base[k] = u;
        berr[k] = up_e + 1;
        bgap[k] = up_g + 1;
      }
    }
    // Left-gap closure: score[k] = max(base[k], max_{k'<k} base[k'] + gap*(k-k'))
    // run over key = base - gap*k with latest-tie source.
    int64_t run_max = NEG, run_src = -1;
    for (int64_t k = 0; k < width; k++) {
      const int64_t j = k + (ci - band);
      const bool valid = j >= 0 && j <= n;
      int64_t ns = base[k], ne = berr[k], ng = bgap[k];
      if (run_src >= 0) {
        const int64_t left = run_max + (int64_t)gap * k;
        if (left > ns) {
          ns = left;
          ne = berr[run_src] + (k - run_src);
          ng = bgap[run_src] + (k - run_src);
        }
      }
      if (!valid) {
        ns = NEG;
        ne = 0;
        ng = 0;
      }
      nscore[k] = ns;
      nerr[k] = ne;
      ngaps[k] = ng;
      // update running max AFTER computing k (sources are k' < k), using
      // the raw base key (left-of-left never better under linear gaps)
      const int64_t key = base[k] - (int64_t)gap * k;
      if (key >= run_max) {
        run_max = key;
        run_src = k;
      }
    }
    score.swap(nscore);
    err.swap(nerr);
    gaps.swap(ngaps);

    if (free_end) {
      int64_t k0 = 0;
      for (int64_t k = 1; k < width; k++)
        if (score[k] > score[k0]) k0 = k;
      const int64_t j0 = k0 + (ci - band);
      if (score[k0] > best_s ||
          (score[k0] == best_s && i + j0 > best_i + best_j)) {
        best_i = i;
        best_j = j0;
        best_s = score[k0];
        best_e = err[k0];
        best_g = gaps[k0];
      }
    }
  }

  if (free_end) {
    out[0] = best_i;
    out[1] = best_j;
    out[2] = best_s;
    out[3] = best_e;
    out[4] = best_g;
    return;
  }
  const int64_t cm = center(m);
  const int64_t k = n - (cm - band);
  if (k >= 0 && k < width && score[k] > NEG / 2) {
    out[0] = m;
    out[1] = n;
    out[2] = score[k];
    out[3] = err[k];
    out[4] = gaps[k];
  } else {
    out[0] = m;
    out[1] = n;
    out[2] = NEG;
    out[3] = (m > n ? m : n);
    out[4] = (m > n ? m - n : n - m);
  }
}

}  // extern "C"
