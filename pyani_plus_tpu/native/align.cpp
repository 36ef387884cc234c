// Native affine-gap local alignment with statistics (host hot path).
//
// Bit-identical to pyani_plus_tpu/ops/dp.py's local_align_stats: same
// recurrence (E derived from G = max(0, diag, F), exploiting that chained
// same-direction gaps are never optimal under affine costs), same argmax
// cell choice (first maximum in row-major order), same traceback
// preferences (diagonal > E > F on ties, shortest gap length).
//
// Used by the ANIb method for per-fragment best-HSP statistics once the
// TPU batch DP has picked the winning window. ~1 ns/cell vs ~300 ns/cell
// for the numpy path.
//
// Build: g++ -O3 -shared -fPIC align.cpp -o libalign.so

#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr int32_t NEG = -1000000;
}

extern "C" {

// out[10]: score, length, matches, mismatches, gaps, gap_opens,
//          query_start, query_end, subject_start, subject_end
// returns 1 on success, 0 if no positive-scoring alignment.
int local_align_stats(const uint8_t *q, int64_t m, const uint8_t *s,
                      int64_t n, int reward, int penalty, int gap_open,
                      int gap_extend, int64_t *out) {
  if (m == 0 || n == 0) return 0;
  const int go_ge = gap_open + gap_extend;
  const int ge = gap_extend;

  std::vector<int32_t> H((m + 1) * (n + 1), 0);
  std::vector<int32_t> E((m + 1) * (n + 1), NEG);
  std::vector<int32_t> F((m + 1) * (n + 1), NEG);

  int32_t best_score = 0;
  int64_t best_i = 0, best_j = 0;
  const int64_t stride = n + 1;

  for (int64_t i = 1; i <= m; i++) {
    const uint8_t qc = q[i - 1];
    int32_t *h_row = &H[i * stride];
    int32_t *h_prev = &H[(i - 1) * stride];
    int32_t *e_row = &E[i * stride];
    int32_t *f_row = &F[i * stride];
    int32_t *f_prev = &F[(i - 1) * stride];
    int32_t e_run = NEG;
    for (int64_t j = 1; j <= n; j++) {
      const uint8_t sc = s[j - 1];
      const bool match = (qc == sc) && qc < 4 && sc < 4;
      const int32_t sub = match ? reward : penalty;
      const int32_t diag = h_prev[j - 1] + sub;
      int32_t f = h_prev[j] - go_ge;
      const int32_t f_ext = f_prev[j] - ge;
      if (f_ext > f) f = f_ext;
      int32_t g = diag;
      if (f > g) g = f;
      if (g < 0) g = 0;
      // E[j] = max over j'<j of G[j'] - go - ge*(j-j'), maintained as a
      // running value: e_run already includes the -ge for this column.
      const int32_t e = e_run;
      int32_t h = g;
      if (e > h) h = e;
      h_row[j] = h;
      e_row[j] = e;
      f_row[j] = f;
      if (h > best_score) {
        best_score = h;
        best_i = i;
        best_j = j;
      }
      // Prepare e_run for column j+1: max(E[j] - ge, G[j] - go - ge)
      int32_t cand = g - go_ge;
      int32_t carry = e - ge;
      e_run = (cand > carry) ? cand : carry;
    }
  }
  if (best_score <= 0) return 0;

  // Traceback (diagonal > E > F on ties, shortest gap)
  int64_t i = best_i, j = best_j;
  int64_t length = 0, matches = 0, mismatches = 0, gaps = 0, gap_opens = 0;
  while (i > 0 && j > 0 && H[i * stride + j] > 0) {
    const uint8_t qc = q[i - 1], sc = s[j - 1];
    const bool match = (qc == sc) && qc < 4 && sc < 4;
    const int32_t sub = match ? reward : penalty;
    const int32_t h = H[i * stride + j];
    if (h == H[(i - 1) * stride + (j - 1)] + sub) {
      length++;
      // blastn counts IDENTITIES by letter equality, so N aligned to N
      // is an identity (pident 100.000 across an N run) even though it
      // SCORES as a penalty; mismatch = non-identical columns only.
      if (qc == sc)
        matches++;
      else
        mismatches++;
      i--;
      j--;
    } else if (h == E[i * stride + j]) {
      gap_opens++;
      const int32_t target = E[i * stride + j];
      int64_t ln = 1;
      while (j - ln > 1) {
        // G[i, j-ln] = max(0, diag, F) at that cell
        const uint8_t sc2 = s[j - ln - 1];
        const bool match2 = (qc == sc2) && qc < 4 && sc2 < 4;
        int32_t g2 = H[(i - 1) * stride + (j - ln - 1)] +
                     (match2 ? reward : penalty);
        const int32_t f2 = F[i * stride + (j - ln)];
        if (f2 > g2) g2 = f2;
        if (g2 < 0) g2 = 0;
        if (g2 - gap_open - ge * ln == target) break;
        ln++;
      }
      length += ln;
      gaps += ln;
      j -= ln;
    } else {
      gap_opens++;
      const int32_t target = F[i * stride + j];
      int64_t ln = 1;
      while (i - ln > 1) {
        if (H[(i - ln) * stride + j] - gap_open - ge * ln == target) break;
        ln++;
      }
      length += ln;
      gaps += ln;
      i -= ln;
    }
  }
  out[0] = best_score;
  out[1] = length;
  out[2] = matches;
  out[3] = mismatches;
  out[4] = gaps;
  out[5] = gap_opens;
  out[6] = i;
  out[7] = best_i;
  out[8] = j;
  out[9] = best_j;
  return 1;
}

// Score-only local alignment (rolling rows, no traceback storage).
int32_t local_align_score(const uint8_t *q, int64_t m, const uint8_t *s,
                          int64_t n, int reward, int penalty, int gap_open,
                          int gap_extend) {
  if (m == 0 || n == 0) return 0;
  const int go_ge = gap_open + gap_extend;
  const int ge = gap_extend;
  std::vector<int32_t> h_prev(n + 1, 0), h_row(n + 1, 0);
  std::vector<int32_t> f_prev(n + 1, NEG), f_row(n + 1, NEG);
  int32_t best = 0;
  for (int64_t i = 1; i <= m; i++) {
    const uint8_t qc = q[i - 1];
    int32_t e_run = NEG;
    h_row[0] = 0;
    for (int64_t j = 1; j <= n; j++) {
      const uint8_t sc = s[j - 1];
      const bool match = (qc == sc) && qc < 4 && sc < 4;
      const int32_t diag = h_prev[j - 1] + (match ? reward : penalty);
      int32_t f = h_prev[j] - go_ge;
      const int32_t f_ext = f_prev[j] - ge;
      if (f_ext > f) f = f_ext;
      int32_t g = diag > f ? diag : f;
      if (g < 0) g = 0;
      int32_t h = g > e_run ? g : e_run;
      h_row[j] = h;
      f_row[j] = f;
      if (h > best) best = h;
      const int32_t cand = g - go_ge;
      const int32_t carry = e_run - ge;
      e_run = cand > carry ? cand : carry;
    }
    std::swap(h_prev, h_row);
    std::swap(f_prev, f_row);
  }
  return best;
}

}  // extern "C"
