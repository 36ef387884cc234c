// Native suffix array + Kasai LCP (host hot path for bacterial-scale
// ANIm/dnadiff seeding).
//
// Suffix array via SA-IS (Nong, Zhang & Chan 2009): linear-time induced
// sorting of LMS substrings with recursion on the reduced problem.
// Input symbols are first remapped to dense ranks (the callers use
// arbitrary int64 symbols: nucleotide codes, separators, and unique
// per-N sentinels), then a unique smallest sentinel 0 is appended.
// Output equals any correct suffix array (suffix order is unique) --
// parity-tested against the numpy prefix-doubling implementation and a
// brute-force oracle.
//
// Kasai's O(n) LCP walk is a scalar loop ~100x faster here than in
// Python.
//
// Build: g++ -O3 -shared -fPIC suffix.cpp -o libsuffix.so

#include <algorithm>
#include <cstdint>
#include <vector>

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

namespace sais_impl {

inline bool is_lms(const std::vector<uint8_t> &t, int64_t i) {
  return i > 0 && t[i] && !t[i - 1];
}

static void get_buckets(const int64_t *T, int64_t n, int64_t K,
                        std::vector<int64_t> &bkt, bool end) {
  std::fill(bkt.begin(), bkt.end(), 0);
  for (int64_t i = 0; i < n; i++) bkt[T[i]]++;
  int64_t sum = 0;
  for (int64_t k = 0; k < K; k++) {
    sum += bkt[k];
    bkt[k] = end ? sum : sum - bkt[k];
  }
}

static void induce(const int64_t *T, int64_t *SA, int64_t n, int64_t K,
                   const std::vector<uint8_t> &t, std::vector<int64_t> &bkt) {
  // induce L-type from sorted LMS/S positions
  get_buckets(T, n, K, bkt, false);
  for (int64_t i = 0; i < n; i++) {
    const int64_t j = SA[i] - 1;
    if (SA[i] > 0 && !t[j]) SA[bkt[T[j]]++] = j;
  }
  // induce S-type
  get_buckets(T, n, K, bkt, true);
  for (int64_t i = n - 1; i >= 0; i--) {
    const int64_t j = SA[i] - 1;
    if (SA[i] > 0 && t[j]) SA[--bkt[T[j]]] = j;
  }
}

// T[0..n): symbols in [0, K), T[n-1] = 0 the unique smallest sentinel.
static void sais(const int64_t *T, int64_t *SA, int64_t n, int64_t K) {
  if (n == 1) {
    SA[0] = 0;
    return;
  }
  std::vector<uint8_t> t(n);
  t[n - 1] = true;
  for (int64_t i = n - 2; i >= 0; i--)
    t[i] = T[i] < T[i + 1] || (T[i] == T[i + 1] && t[i + 1]);
  std::vector<int64_t> bkt(K);

  // Stage 1: sort LMS substrings by induced sorting
  std::fill(SA, SA + n, (int64_t)-1);
  get_buckets(T, n, K, bkt, true);
  for (int64_t i = 1; i < n; i++)
    if (is_lms(t, i)) SA[--bkt[T[i]]] = i;
  induce(T, SA, n, K, t, bkt);

  // Compact the sorted LMS positions into SA[0..n1)
  int64_t n1 = 0;
  for (int64_t i = 0; i < n; i++)
    if (is_lms(t, SA[i])) SA[n1++] = SA[i];

  // Name LMS substrings into SA[n1..n)
  std::fill(SA + n1, SA + n, (int64_t)-1);
  int64_t name = 0, prev = -1;
  for (int64_t i = 0; i < n1; i++) {
    const int64_t pos = SA[i];
    bool diff = false;
    if (prev == -1) {
      diff = true;
    } else {
      for (int64_t d = 0;; d++) {
        if (pos + d == n || prev + d == n || T[pos + d] != T[prev + d] ||
            t[pos + d] != t[prev + d]) {
          diff = true;
          break;
        }
        if (d > 0 && (is_lms(t, pos + d) || is_lms(t, prev + d))) break;
      }
    }
    if (diff) {
      name++;
      prev = pos;
    }
    SA[n1 + pos / 2] = name - 1;
  }
  for (int64_t i = n - 1, j = n - 1; i >= n1; i--)
    if (SA[i] >= 0) SA[j--] = SA[i];

  // Stage 2: sort the reduced problem
  int64_t *SA1 = SA;
  int64_t *s1 = SA + n - n1;
  if (name < n1) {
    sais(s1, SA1, n1, name);
  } else {
    for (int64_t i = 0; i < n1; i++) SA1[s1[i]] = i;
  }

  // Stage 3: induce the full SA from the sorted LMS suffixes
  for (int64_t i = 1, j = 0; i < n; i++)
    if (is_lms(t, i)) s1[j++] = i;  // LMS positions in text order
  for (int64_t i = 0; i < n1; i++) SA1[i] = s1[SA1[i]];
  std::fill(SA + n1, SA + n, (int64_t)-1);
  get_buckets(T, n, K, bkt, true);
  for (int64_t i = n1 - 1; i >= 0; i--) {
    const int64_t j = SA[i];
    SA[i] = -1;
    SA[--bkt[T[j]]] = j;
  }
  induce(T, SA, n, K, t, bkt);
}

}  // namespace sais_impl

// Suffix array of arbitrary int64 symbols (name kept for ABI compat
// with the previous prefix-doubling entry point).
void suffix_array_pd(const int64_t *text, int64_t n, int64_t *sa) {
  if (n == 0) return;
  if (n == 1) {
    sa[0] = 0;
    return;
  }
  // Dense order-preserving remap to [1, K); sentinel 0 appended.
  std::vector<int64_t> sorted(text, text + n);
  std::sort(sorted.begin(), sorted.end());
  sorted.erase(std::unique(sorted.begin(), sorted.end()), sorted.end());
  const int64_t n2 = n + 1;
  std::vector<int64_t> T(n2);
  for (int64_t i = 0; i < n; i++)
    T[i] = 1 + (std::lower_bound(sorted.begin(), sorted.end(), text[i]) -
                sorted.begin());
  T[n] = 0;
  std::vector<int64_t> SA(n2);
  sais_impl::sais(T.data(), SA.data(), n2, (int64_t)sorted.size() + 1);
  // Drop the sentinel suffix (always rank 0)
  for (int64_t i = 1; i < n2; i++) sa[i - 1] = SA[i];
}

}  // extern "C"
