// Native banded anchored DP (gap fill + free-end extension for ANIm).
//
// Affine-gap (Gotoh) generalisation of the linear model: a gap run of
// length L costs open + extend*(L-1), so open == extend reduces to the
// linear per-column model. Three states per cell (M = substitution,
// D = gap in b / vertical, I = gap in a / horizontal) each carry
// (score, errors, gap_columns) payloads. Mirrors
// pyani_plus_tpu/ops/extend.py::_band_dp bit-for-bit (parity-tested):
//   - M predecessor = max(M, D, I) with tie preference M >= D >= I;
//   - D = max(max(M, I)_up + open, D_up + extend), tie prefers the
//     continuation (extend);
//   - I within a row via running max of base = max(M, D) with the
//     *latest* index achieving the running key max as source;
//   - cell best = max(M, D, I), tie preference M >= D >= I;
//   - free-end best updates on strictly-greater score, or equal score
//     with larger i+j (prefer longer extensions).
//
// Build: g++ -O3 -shared -fPIC band.cpp -o libband.so

#include <cstdint>
#include <vector>

namespace {
constexpr int64_t NEG = -1000000000LL;

struct Cell {
  int64_t s, e, g;  // score, errors, gap columns
};

inline Cell best3(const Cell &m, const Cell &d, const Cell &i) {
  // tie preference M >= D >= I
  Cell out = m;
  if (d.s > out.s) out = d;
  if (i.s > out.s) out = i;
  return out;
}
}  // namespace

extern "C" {

// out[5] = {best_i, best_j, best_score, errors, gapcols}
// stop_rows: free-end early termination -- give up after this many rows
// without a best-score improvement (0 = never). nucmer's Extend_Alignment
// abandons an extension after breaklen columns without improvement, so a
// generous multiple of breaklen preserves its observable results while
// collapsing dead extensions in divergent regions.
void band_affine(const uint8_t *a, int64_t m, const uint8_t *b, int64_t n,
                 int64_t band, int free_end, int match, int mismatch,
                 int open_, int extend, int64_t stop_rows, int64_t *out) {
  const int64_t width = 2 * band + 1;
  std::vector<Cell> M(width), D(width), I(width);
  std::vector<Cell> nM(width), nD(width), nI(width);

  auto center = [&](int64_t i) -> int64_t {
    return free_end ? i : (i * n) / m;
  };

  const Cell dead{NEG, 0, 0};
  const int64_t c0 = center(0);
  for (int64_t k = 0; k < width; k++) {
    const int64_t j = k + (c0 - band);
    M[k] = D[k] = I[k] = dead;
    if (j == 0) {
      M[k] = Cell{0, 0, 0};  // origin lives in M by convention
    } else if (j > 0 && j <= n) {
      I[k] = Cell{open_ + (int64_t)extend * (j - 1), j, j};
    }
  }
  int64_t best_i = 0, best_j = 0, best_s = 0, best_e = 0, best_g = 0;
  int64_t rows_since_improve = 0;
  if (free_end) {
    for (int64_t k = 0; k < width; k++) {
      const Cell c = best3(M[k], D[k], I[k]);
      const int64_t j = k + (c0 - band);
      if (c.s > best_s || (c.s == best_s && 0 + j > best_i + best_j)) {
        best_i = 0;
        best_j = j;
        best_s = c.s;
        best_e = c.e;
        best_g = c.g;
      }
    }
  }

  for (int64_t i = 1; i <= m; i++) {
    const int64_t ci = center(i), cp = center(i - 1);
    const int64_t shift = ci - cp;
    const uint8_t ac = a[i - 1];

    for (int64_t k = 0; k < width; k++) {
      const int64_t j = k + (ci - band);
      const bool valid = j >= 0 && j <= n;
      nM[k] = nD[k] = nI[k] = dead;
      if (!valid) continue;
      // previous-row slots for this j (diag = j-1, up = j)
      const int64_t di = k + shift - 1;
      const int64_t ui = k + shift;
      if (j >= 1 && di >= 0 && di < width) {
        const Cell p = best3(M[di], D[di], I[di]);
        if (p.s > NEG / 2) {
          const uint8_t bc = b[j - 1];
          const bool sub_ok = (bc == ac) && ac < 4 && bc < 4;
          nM[k] = Cell{p.s + (sub_ok ? match : mismatch),
                       p.e + (sub_ok ? 0 : 1), p.g};
        }
      }
      if (ui >= 0 && ui < width) {
        // open from max(M, I); tie prefers continuation (extend)
        Cell om = M[ui];
        if (I[ui].s > om.s) om = I[ui];
        const int64_t open_s = om.s > NEG / 2 ? om.s + open_ : NEG;
        const int64_t cont_s = D[ui].s > NEG / 2 ? D[ui].s + extend : NEG;
        if (cont_s >= open_s) {
          if (cont_s > NEG / 2)
            nD[k] = Cell{cont_s, D[ui].e + 1, D[ui].g + 1};
        } else {
          nD[k] = Cell{open_s, om.e + 1, om.g + 1};
        }
      }
    }
    // I state: horizontal runs within the row from base = max(M, D).
    // I[k] = max_{k'<k} base[k'] + open + extend*(k-k'-1)
    //      = extend*k + max_{k'<k} (base[k'] + open - extend*(k'+1))
    // with the latest k' achieving the running max as source.
    int64_t run_max = NEG, run_src = -1;
    for (int64_t k = 0; k < width; k++) {
      const int64_t j = k + (ci - band);
      if (j >= 1 && j <= n && run_src >= 0) {
        const int64_t s = run_max + (int64_t)extend * k;
        if (s > NEG / 2) {
          const Cell &src =
              nM[run_src].s >= nD[run_src].s ? nM[run_src] : nD[run_src];
          nI[k] = Cell{s, src.e + (k - run_src), src.g + (k - run_src)};
        }
      }
      const Cell &bse = nM[k].s >= nD[k].s ? nM[k] : nD[k];
      if (bse.s > NEG / 2) {
        const int64_t key = bse.s + open_ - (int64_t)extend * (k + 1);
        if (key >= run_max) {
          run_max = key;
          run_src = k;
        }
      }
    }
    M.swap(nM);
    D.swap(nD);
    I.swap(nI);

    if (free_end) {
      bool improved = false;
      for (int64_t k = 0; k < width; k++) {
        const Cell c = best3(M[k], D[k], I[k]);
        const int64_t j = k + (ci - band);
        if (c.s > best_s || (c.s == best_s && i + j > best_i + best_j)) {
          best_i = i;
          best_j = j;
          best_s = c.s;
          best_e = c.e;
          best_g = c.g;
          improved = true;
        }
      }
      if (improved) rows_since_improve = 0;
      else if (stop_rows > 0 && ++rows_since_improve >= stop_rows) break;
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
  Cell fin = dead;
  if (k >= 0 && k < width) fin = best3(M[k], D[k], I[k]);
  if (fin.s > NEG / 2) {
    out[0] = m;
    out[1] = n;
    out[2] = fin.s;
    out[3] = fin.e;
    out[4] = fin.g;
  } else {
    out[0] = m;
    out[1] = n;
    out[2] = NEG;
    out[3] = (m > n ? m : n);
    out[4] = (m > n ? m - n : n - m);
  }
}

}  // extern "C"
