// Burrows-Wheeler transform, host-native path.
//
// Forward: SA-IS suffix-array construction (original implementation of the
// Nong/Zhang/Chan induced-sorting algorithm), then BWT extraction in the
// reference's stream convention (verified against libsais behavior):
//   U[0] = T[n-1]; U[1..] = T[SA[j]-1] for SA ranks j skipping suffix 0;
//   primary index = rank(suffix 0) + 1;
//   aux indexes (sampling rate r): indexes[t] = rank(suffix (t+1)*r),
//   with r = 2^floor(log2(n/8)) via the bit-smear in bwt.cpp:192-197 and
//   num_indexes = (n-1)/r.
//
// Inverse: counting + LF-mapping walk over the virtual-sentinel BWT matrix;
// with aux indexes the walk splits into num_indexes+1 independent chains
// (parallelized with OpenMP when available).

#include <cstdint>
#include <cstring>
#include <new>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace tbsc {

using u8 = uint8_t;
using i32 = int32_t;

// ---------------------------------------------------------------------------
// SA-IS
// ---------------------------------------------------------------------------

namespace sais {

#ifndef TBSC_SAIS_PREFETCH
#define TBSC_SAIS_PREFETCH 48
#endif
constexpr i32 PF = TBSC_SAIS_PREFETCH;

// s: sequence of n symbols in [0, K); SA: output of length n.
//
// Hot-path layout: each level builds a fused array v[i] = 2*s[i] + t[i]
// (t = 1 for S-type) so the induce loops issue ONE random load per step
// instead of two, and the (char, type) sub-bucket boundaries come from a
// single 2K-wide histogram (L sub-bucket of char c = value 2c, S = 2c+1).

template <typename VT>
static inline bool is_lms(const VT* v, i32 i) {
  return i > 0 && (v[i] & 1) && !(v[i - 1] & 1);
}

template <typename VT>
static void induce(const VT* v, i32* SA, const i32* cnt2, i32* bkt2,
                   i32 n, i32 K) {
  // induce L-type from left to right; virtual sentinel first induces n-1
  {
    i32 sum = 0;
    for (i32 c = 0; c < 2 * K; ++c) { bkt2[c] = sum; sum += cnt2[c]; }
  }
  SA[bkt2[v[n - 1]]++] = n - 1;  // suffix n-1 is always L-type
  // The scan is latency-bound on v[SA[i]-1]; in the L pass every slot is
  // written before the scan reaches it, so prefetching a lookahead slot's
  // target hides most of the miss.
  for (i32 i = 0; i < n; ++i) {
    if (i + PF < n) {
      i32 jp = SA[i + PF];
      if (jp > 0) __builtin_prefetch(&v[jp - 1]);
    }
    i32 j = SA[i];
    if (j > 0) {
      i32 vj = v[j - 1];
      if (!(vj & 1)) SA[bkt2[vj]++] = j - 1;
    }
  }
  // induce S-type from right to left (place at S sub-bucket ends)
  {
    i32 sum = 0;
    for (i32 c = 0; c < 2 * K; ++c) { sum += cnt2[c]; bkt2[c] = sum; }
  }
  for (i32 i = n - 1; i >= 0; --i) {
    if (i - PF >= 0) {
      i32 jp = SA[i - PF];
      if (jp > 0) __builtin_prefetch(&v[jp - 1]);
    }
    i32 j = SA[i];
    if (j > 0) {
      i32 vj = v[j - 1];
      if (vj & 1) SA[--bkt2[vj]] = j - 1;
    }
  }
}

// VT: fused-value type — u16 at the byte level (2*256 values, denser in
// cache), i32 for recursion levels (names can exceed 2^15).
template <typename CharT, typename VT>
static void sais_rec(const CharT* s, i32* SA, i32 n, i32 K, void* vbuf,
                     i32* cntbuf, i32* names) {
  if (n == 1) { SA[0] = 0; return; }

  // fused (char, type) values; suffix n-1 is L-type (sentinel is smaller)
  VT* v = (VT*)vbuf;
  v[n - 1] = (VT)(2 * (i32)s[n - 1]);
  for (i32 i = n - 2; i >= 0; --i) {
    i32 tnext = v[i + 1] & 1;
    v[i] = (VT)(2 * (i32)s[i] +
           ((s[i] < s[i + 1] || (s[i] == s[i + 1] && tnext)) ? 1 : 0));
  }

  i32* cnt2 = cntbuf;
  i32* bkt2 = cntbuf + 2 * K;
  std::memset(cnt2, 0, sizeof(i32) * (size_t)(2 * K));
  for (i32 i = 0; i < n; ++i) ++cnt2[v[i]];

  // Step 1: place LMS suffixes at bucket ends (in text order), induce.
  for (i32 i = 0; i < n; ++i) SA[i] = -1;
  {
    i32 sum = 0;
    for (i32 c = 0; c < 2 * K; ++c) { sum += cnt2[c]; bkt2[c] = sum; }
  }
  for (i32 i = n - 1; i > 0; --i)
    if (is_lms(v, i)) SA[--bkt2[v[i]]] = i;
  induce(v, SA, cnt2, bkt2, n, K);

  // Step 2: compact sorted LMS suffixes, name LMS substrings.
  i32 n_lms = 0;
  for (i32 i = 0; i < n; ++i) {
    i32 j = SA[i];
    if (is_lms(v, j)) SA[n_lms++] = j;
  }

  i32 name = 0, prev = -1;
  for (i32 i = 0; i < n_lms; ++i) {
    if (i + 4 < n_lms) __builtin_prefetch(&v[SA[i + 4]]);  // next substrings
    i32 pos = SA[i];
    bool diff = false;
    if (prev < 0) diff = true;
    else {
      // Compare LMS substrings at pos and prev: the fused values cover
      // chars + types; stop at the next LMS position (end is unique).
      for (i32 d = 0;; ++d) {
        if (pos + d == n || prev + d == n) { diff = true; break; }
        if (v[pos + d] != v[prev + d]) { diff = true; break; }
        if (d > 0 && (is_lms(v, pos + d) || is_lms(v, prev + d))) {
          diff = !(is_lms(v, pos + d) && is_lms(v, prev + d));
          break;
        }
      }
    }
    if (diff) { ++name; prev = pos; }
    names[pos >> 1] = name - 1;
  }

  if (name < n_lms) {
    // Build the reduced string (LMS names in text order) in the SA tail,
    // recurse, then map the reduced suffix array back to text positions.
    i32* s1 = SA + n - n_lms;
    i32 k = 0;
    for (i32 i = 1; i < n; ++i)
      if (is_lms(v, i)) s1[k++] = names[i >> 1];
    sais_rec<i32, i32>(s1, SA, n_lms, name, (i32*)vbuf + n, cntbuf + 4 * K, names);
    i32* lms_pos = s1;  // reuse tail: LMS positions in text order
    k = 0;
    for (i32 i = 1; i < n; ++i)
      if (is_lms(v, i)) lms_pos[k++] = i;
    for (i32 i = 0; i < n_lms; ++i) {
      if (i + 16 < n_lms) __builtin_prefetch(&lms_pos[SA[i + 16]]);
      SA[i] = lms_pos[SA[i]];
    }
  }
  // else: SA[0..n_lms) already holds LMS suffixes in sorted order.
  // (v is intact — the recursion used vbuf + n.)

  // Step 3: final induce from sorted LMS suffixes.
  {
    i32 sum = 0;
    for (i32 c = 0; c < 2 * K; ++c) { sum += cnt2[c]; bkt2[c] = sum; }
  }
  for (i32 i = n_lms; i < n; ++i) SA[i] = -1;
  for (i32 i = n_lms - 1; i >= 0; --i) {
    i32 j = SA[i];
    SA[i] = -1;
    SA[--bkt2[v[j]]] = j;
  }
  induce(v, SA, cnt2, bkt2, n, K);
}

}  // namespace sais

// Computes the suffix array of T (length n) into SA.
int suffix_array(const u8* T, i32* SA, i32 n) {
  if (n <= 0) return -1;
  if (n == 1) { SA[0] = 0; return 0; }
  // fused (char,type) values: u16 at the top level, i32 below; the i32
  // recursion levels need n/2 + n/4 + ... <= n ints starting at offset n
  i32* vbuf = new (std::nothrow) i32[(size_t)2 * n + 8];
  // count+bucket buffers: 4*K per level, bounded by 1024 + 4n ints
  i32* cntbuf = new (std::nothrow) i32[(size_t)4 * n + 2048];
  i32* names = new (std::nothrow) i32[(size_t)(n >> 1) + 2];
  if (!vbuf || !cntbuf || !names) {
    delete[] vbuf; delete[] cntbuf; delete[] names;
    return -2;
  }
  sais::sais_rec<u8, uint16_t>(T, SA, n, 256, vbuf, cntbuf, names);
  delete[] vbuf;
  delete[] cntbuf;
  delete[] names;
  return 0;
}

// Aux-index sampling rate (bwt.cpp:192-197).
static int aux_rate(int n) {
  int mod = n / 8;
  mod |= mod >> 1; mod |= mod >> 2; mod |= mod >> 4;
  mod |= mod >> 8; mod |= mod >> 16;
  mod >>= 1;
  return mod + 1;
}

// In-place BWT of T[0..n); returns primary index (>0) or error (<0).
// When indexes != null, writes num_indexes = (n-1)/r sampled ranks.
int bwt_encode(u8* T, int n, u8* num_indexes, i32* indexes, int /*num_threads*/) {
  if (n <= 1) { if (num_indexes) *num_indexes = 0; return n; }
  i32* SA = new (std::nothrow) i32[(size_t)n];
  if (!SA) return -2;
  if (suffix_array(T, SA, n) != 0) { delete[] SA; return -2; }

  u8* U = new (std::nothrow) u8[(size_t)n];
  if (!U) { delete[] SA; return -2; }

  int r = aux_rate(n);
  int n_aux = (n - 1) / r;
  int primary = -1;
  U[0] = T[n - 1];
  for (int j = 0, w = 1; j < n; ++j) {
    i32 sj = SA[j];
    if (sj == 0) { primary = j + 1; continue; }
    U[w++] = T[sj - 1];
  }
  if (indexes && num_indexes) {
    // indexes[t] = rank of suffix (t+1)*r
    for (int j = 0; j < n; ++j) {
      i32 sj = SA[j];
      if (sj != 0 && sj % r == 0 && sj / r <= n_aux) indexes[sj / r - 1] = j;
    }
    *num_indexes = (u8)n_aux;
  } else if (num_indexes) {
    *num_indexes = 0;
  }

  std::memcpy(T, U, (size_t)n);
  delete[] U;
  delete[] SA;
  return primary;
}

// Inverse BWT.  index/aux semantics per the encode above.
int bwt_decode(u8* T, int n, int index, int num_indexes, const i32* indexes,
               int num_threads) {
  (void)num_threads;  // the interleaved chase saturates one core's MLP
  if (n <= 1) return 0;
  if (index <= 0 || index > n) return -1;

  // LF over the virtual-sentinel matrix:
  //   row k (k != index) shows U[u], u = k - (k > index);
  //   LF(k) = 1 + base0[U[u]] + occ(U[u], u).
  // Precompute next[u] = LF(row of u) directly in u-coordinates.
  i32* lf = new (std::nothrow) i32[(size_t)n];
  if (!lf) return -2;
  i32 cnt[256];
  std::memset(cnt, 0, sizeof cnt);
  for (int u = 0; u < n; ++u) {
    lf[u] = cnt[T[u]]++;
  }
  i32 base[256];
  {
    i32 sum = 1;  // sentinel occupies row 0
    for (int c = 0; c < 256; ++c) { base[c] = sum; sum += cnt[c]; }
  }
  for (int u = 0; u < n; ++u) lf[u] += base[T[u]];

  u8* out = new (std::nothrow) u8[(size_t)n];
  if (!out) { delete[] lf; return -2; }

  int r = aux_rate(n);
  bool use_aux = indexes && num_indexes == (n - 1) / r;

  if (!use_aux) {
    // single chain from the sentinel row (k=0 => u=0)
    i32 k = 0;
    for (int pos = n - 1; pos >= 0; --pos) {
      i32 u = k - (k > index ? 1 : 0);
      out[pos] = T[u];
      k = lf[u];
    }
  } else {
    // chain t starts at the row of suffix t*r and writes positions
    // [t*r - 1 .. (t-1)*r] going backward; chain 0 starts at the sentinel
    // row (k=0, whose preceding char is T[n-1]) and writes the tail
    // [n-1 .. num_indexes*r].  All chains advance together in one loop:
    // each LF step is a dependent cache miss, so interleaving keeps
    // n_chains misses in flight instead of one (memory-level parallelism —
    // the single-core analog of the reference's parallel chain decode).
    int n_chains = num_indexes + 1;
    i32 kk[256];
    int hi[256], lo[256];
    for (int t = 0; t < n_chains; ++t) {
      kk[t] = (t == 0) ? 0 : indexes[t - 1] + 1;
      hi[t] = (t == 0) ? n - 1 : t * r - 1;
      lo[t] = (t == 0) ? num_indexes * r : (t - 1) * r;
    }
    int active = n_chains;
    while (active > 0) {
      active = 0;
      for (int t = 0; t < n_chains; ++t) {
        if (hi[t] < lo[t]) continue;
        ++active;
        i32 k = kk[t];
        i32 u = k - (k > index ? 1 : 0);
        out[hi[t]--] = T[u];
        k = lf[u];
        kk[t] = k;
        i32 un = k - (k > index ? 1 : 0);
        __builtin_prefetch(&lf[un]);
        __builtin_prefetch(&T[un]);
      }
    }
  }

  std::memcpy(T, out, (size_t)n);
  delete[] out;
  delete[] lf;
  return 0;
}

}  // namespace tbsc
