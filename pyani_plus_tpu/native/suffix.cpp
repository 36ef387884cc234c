// Native Kasai LCP computation (host hot path for bacterial-scale ANIm).
//
// The suffix array itself stays in numpy (prefix doubling = a handful of
// O(n log n) vectorised sorts); Kasai's O(n) LCP walk is a scalar loop
// that is ~100x faster here than in Python.
//
// Build: g++ -O3 -shared -fPIC suffix.cpp -o libsuffix.so

#include <cstdint>
#include <vector>
#include <algorithm>
#include <utility>

extern "C" {

// text: int64 symbols, sa: int64 suffix array; writes lcp[n] where
// lcp[r] = LCP(suffix sa[r-1], suffix sa[r]), lcp[0] = 0.
void kasai_lcp(const int64_t *text, const int64_t *sa, int64_t n,
               int64_t *lcp) {
  if (n == 0) return;
  std::vector<int64_t> rank(n);
  for (int64_t r = 0; r < n; r++) rank[sa[r]] = r;
  int64_t h = 0;
  lcp[0] = 0;
  for (int64_t i = 0; i < n; i++) {
    const int64_t r = rank[i];
    if (r > 0) {
      const int64_t j = sa[r - 1];
      const int64_t max_h = n - (i > j ? i : j);
      while (h < max_h && text[i + h] == text[j + h]) h++;
      lcp[r] = h;
      if (h > 0) h--;
    } else {
      h = 0;
    }
  }
}

// Suffix array via Larsson-Sadakane qsufsort (prefix doubling with
// per-group ternary-split quicksort refinement; sorted groups are
// skipped, so total work collapses quickly). Output equals any correct
// suffix array (suffix order is unique) -- parity-tested against the
// numpy implementation.
namespace sa_ls {

static int64_t *V;   // rank (group number = index of group's last slot)
static int64_t *I;   // suffix array under construction
static int64_t H;    // current offset h

static inline int64_t key(int64_t p) { return V[I[p] + H]; }

static void update_group(int64_t lo, int64_t hi) {
  // assign group number = hi (last slot index) to slots lo..hi
  for (int64_t i = lo; i <= hi; i++) V[I[i]] = hi;
  if (lo == hi) I[lo] = -1;  // single element: mark sorted (length 1 run)
}

static void select_sort_split(int64_t lo, int64_t hi) {
  int64_t i = lo;
  while (i < hi) {
    int64_t j = i, mink = key(i);
    for (int64_t k2 = i + 1; k2 <= hi; k2++)
      if (key(k2) < mink) mink = key(k2);
    // move all elements with key == mink to the front
    for (int64_t k2 = i; k2 <= hi; k2++)
      if (key(k2) == mink) std::swap(I[j++], I[k2]);
    update_group(i, j - 1);
    i = j;
  }
  // a single trailing element (or a singleton input) still needs its
  // group renumbered, else stale group-end pointers corrupt later walks
  if (i == hi) update_group(hi, hi);
}

static int64_t choose_pivot(int64_t lo, int64_t hi) {
  int64_t mid = (lo + hi) / 2;
  int64_t a = key(lo), b = key(mid), c = key(hi);
  if (a > b) std::swap(a, b);
  if (b > c) { b = c; if (a > b) b = a; }
  return b;
}

static void sort_split(int64_t lo, int64_t hi) {
  if (hi - lo < 8) {  // small group: selection sort split
    select_sort_split(lo, hi);
    return;
  }
  const int64_t piv = choose_pivot(lo, hi);
  // three-way partition by key
  int64_t first = lo, last = hi, i = lo;
  while (i <= last) {
    const int64_t k2 = key(i);
    if (k2 < piv) std::swap(I[first++], I[i++]);
    else if (k2 > piv) std::swap(I[i], I[last--]);
    else i++;
  }
  if (first > lo) sort_split(lo, first - 1);
  update_group(first, last);
  if (last < hi) sort_split(last + 1, hi);
}

}  // namespace sa_ls

void suffix_array_pd(const int64_t *text, int64_t n, int64_t *sa) {
  if (n == 0) return;
  if (n == 1) { sa[0] = 0; return; }
  using namespace sa_ls;
  // Append a unique *smallest* sentinel: every unsorted group then
  // consists of suffixes whose sentinel offset is >= H, so key reads
  // V[s + H] stay in bounds (the classic qsufsort invariant).
  int64_t mn = text[0];
  for (int64_t i = 1; i < n; i++)
    if (text[i] < mn) mn = text[i];
  const int64_t n2 = n + 1;
  std::vector<int64_t> txt(n2);
  for (int64_t i = 0; i < n; i++) txt[i] = text[i];
  txt[n] = mn - 1;

  std::vector<int64_t> Vv(n2 + 1), Iv(n2);
  V = Vv.data();
  I = Iv.data();

  // Initial bucket sort by symbol
  {
    std::vector<std::pair<int64_t, int64_t>> sym(n2);
    for (int64_t i = 0; i < n2; i++) sym[i] = {txt[i], i};
    std::sort(sym.begin(), sym.end());
    for (int64_t i = 0; i < n2; i++) I[i] = sym[i].second;
    int64_t gstart = 0;
    for (int64_t i = 0; i < n2; i++) {
      if (i + 1 == n2 || sym[i + 1].first != sym[i].first) {
        for (int64_t j2 = gstart; j2 <= i; j2++) V[I[j2]] = i;
        if (gstart == i) I[gstart] = -1;
        gstart = i + 1;
      }
    }
  }

  for (H = 1; I[0] != -n2; H *= 2) {
    int64_t i = 0;
    int64_t sorted_run = 0;
    while (i < n2) {
      if (I[i] < 0) {
        sorted_run += -I[i];
        i += -I[i];
      } else {
        if (sorted_run) {
          I[i - sorted_run] = -sorted_run;
          sorted_run = 0;
        }
        const int64_t g = V[I[i]];  // group's last slot
        sort_split(i, g);
        i = g + 1;
      }
    }
    if (sorted_run) I[n2 - sorted_run] = -sorted_run;
  }
  // Reconstruct: V[i] = final rank of suffix i; sentinel suffix (rank 0)
  // is dropped, remaining ranks shift down by one.
  for (int64_t i = 0; i < n; i++) sa[V[i] - 1] = i;
}

}  // extern "C"
