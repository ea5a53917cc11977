// Sort Transform of order k (ST3..ST8): a BWT restricted to k-byte contexts.
//
// Forward semantics (matches reference st.cpp / st.cu): stably sort all
// positions i by the k following bytes T[i..i+k-1] (wrapping), ties broken
// by position; output the preceding byte T[(i-1) mod n]; return the rank of
// position 0.  Implemented here as an LSD radix sort over packed 64-bit keys
// (one array for k <= 7 with the payload byte in the low bits, key+payload
// pairs for k == 8).
//
// Inverse: group-refinement + LF-mapping (the algorithm of st.cpp:1014-1527):
// 1) recover order-2 context group sizes from the output histogram and an
//    in-bucket sub-histogram transpose; 2) refine group boundaries k-3 times
//    via LF-order marking; 3) walk the text backward, consuming slots of
//    each identical-context tie range from the back (ties are position-
//    ordered, and the backward walk visits the largest positions first).
// Three reconstruction layouts depending on n and per-char counts (packed
// char+link, relative link, or link-only with char recovered by search).

#include <cstdint>
#include <cstring>
#include <new>

namespace tbsc {

using u8 = uint8_t;
using u32 = uint32_t;
using u64 = uint64_t;
using i32 = int32_t;

// ---------------------------------------------------------------------------
// Forward
// ---------------------------------------------------------------------------

static void radix_pass16(const u64* src, u64* dst, int n, int shift) {
  static_assert(sizeof(size_t) >= 8, "");
  i32* cnt = new i32[65536]();
  for (int i = 0; i < n; ++i) ++cnt[(src[i] >> shift) & 0xffff];
  i32 sum = 0;
  for (int d = 0; d < 65536; ++d) { i32 t = cnt[d]; cnt[d] = sum; sum += t; }
  for (int i = 0; i < n; ++i) dst[cnt[(src[i] >> shift) & 0xffff]++] = src[i];
  delete[] cnt;
}

static void radix_pass16_pair(const u64* src, const u8* sval, u64* dst, u8* dval,
                              int n, int shift) {
  i32* cnt = new i32[65536]();
  for (int i = 0; i < n; ++i) ++cnt[(src[i] >> shift) & 0xffff];
  i32 sum = 0;
  for (int d = 0; d < 65536; ++d) { i32 t = cnt[d]; cnt[d] = sum; sum += t; }
  for (int i = 0; i < n; ++i) {
    i32 p = cnt[(src[i] >> shift) & 0xffff]++;
    dst[p] = src[i];
    dval[p] = sval[i];
  }
  delete[] cnt;
}

int st_encode(u8* T, int n, int k, int /*num_threads*/) {
  if (n <= 1) return 0;
  if (k < 3 || k > 8) return -1;

  if (k <= 7) {
    u64* a = new (std::nothrow) u64[(size_t)n];
    u64* b = new (std::nothrow) u64[(size_t)n];
    if (!a || !b) { delete[] a; delete[] b; return -2; }

    // key = ctx bytes (big-endian, byte j at bits 8*(k-j)) | prev byte
    u64 key = 0;
    for (int j = 0; j < k; ++j) key = (key << 8) | T[j % n];
    key <<= 8;
    u64 ctx_mask = ((~0ull) >> (64 - 8 * k)) << 8;
    for (int i = 0; i < n; ++i) {
      u64 prev = T[(i + n - 1) % n];
      a[i] = (key & ctx_mask) | prev;
      key = (key << 8) | ((u64)T[(i + k) % n] << 8);
    }
    u64 key0 = a[0] & ctx_mask;

    int passes = (k + 1) / 2;
    u64 *src = a, *dst = b;
    for (int p = 0; p < passes; ++p) {
      radix_pass16(src, dst, n, 8 + 16 * p);
      u64* t = src; src = dst; dst = t;
    }

    // rank of position 0 = first entry whose context equals ctx(0)
    int lo = 0, hi = n;
    while (lo < hi) {
      int mid = (lo + hi) >> 1;
      if ((src[mid] & ctx_mask) < key0) lo = mid + 1; else hi = mid;
    }
    int index = lo;

    for (int i = 0; i < n; ++i) T[i] = (u8)src[i];
    delete[] a;
    delete[] b;
    return index;
  }

  // k == 8: full 64-bit context key + separate payload byte
  u64* a = new (std::nothrow) u64[(size_t)n];
  u64* b = new (std::nothrow) u64[(size_t)n];
  u8* av = new (std::nothrow) u8[(size_t)n];
  u8* bv = new (std::nothrow) u8[(size_t)n];
  if (!a || !b || !av || !bv) { delete[] a; delete[] b; delete[] av; delete[] bv; return -2; }

  u64 key = 0;
  for (int j = 0; j < 8; ++j) key = (key << 8) | T[j % n];
  for (int i = 0; i < n; ++i) {
    a[i] = key;
    av[i] = T[(i + n - 1) % n];
    key = (key << 8) | T[(i + 8) % n];
  }
  u64 key0 = a[0];

  u64 *src = a, *dst = b;
  u8 *sval = av, *dval = bv;
  for (int p = 0; p < 4; ++p) {
    radix_pass16_pair(src, sval, dst, dval, n, 16 * p);
    u64* t = src; src = dst; dst = t;
    u8* tv = sval; sval = dval; dval = tv;
  }

  int lo = 0, hi = n;
  while (lo < hi) {
    int mid = (lo + hi) >> 1;
    if (src[mid] < key0) lo = mid + 1; else hi = mid;
  }
  int index = lo;

  std::memcpy(T, sval, (size_t)n);
  delete[] a;
  delete[] b;
  delete[] av;
  delete[] bv;
  return index;
}

// ---------------------------------------------------------------------------
// Inverse
// ---------------------------------------------------------------------------

// Mark order-(k-1) context-group starts in P (any nonzero bit = start).
// Returns failBack = some char count >= 2^23 (packed-link layouts overflow).
static bool unst_mark_groups(const u8* T, u32* P, u32* count, int n, int k) {
  u32* bucket = new u32[65536]();
  u32 index[256];
  i32 group[256];

  bool fail_back = false;
  u32 cnt[256];
  std::memset(cnt, 0, sizeof cnt);
  for (int i = 0; i < n; ++i) ++cnt[T[i]];
  {
    u32 sum = 0;
    for (int c = 0; c < 256; ++c) {
      if (cnt[c] >= 0x800000) fail_back = true;
      count[c] = sum;
      u32 end = sum + cnt[c];
      // sub-histogram: output bytes within first-context-byte bucket c
      for (u32 i = sum; i < end; ++i) ++bucket[(c << 8) | T[i]];
      sum = end;
    }
  }
  // transpose: bucket[(c1<<8)|c2] = count of order-2 context (c1,c2)
  for (int c = 0; c < 256; ++c)
    for (int d = 0; d < c; ++d) {
      u32 t = bucket[(d << 8) | c];
      bucket[(d << 8) | c] = bucket[(c << 8) | d];
      bucket[(c << 8) | d] = t;
    }

  if (k == 3) {
    u32 sum = 0;
    for (int w = 0; w < 65536; ++w) {
      if (bucket[w] > 0) { P[sum] = 1; sum += bucket[w]; }
    }
    delete[] bucket;
    return fail_back;
  }

  // order-3 starts: LF-scan over order-2 groups
  std::memcpy(index, count, sizeof index);
  std::memset(group, 0xff, sizeof group);
  {
    u32 sum = 0;
    for (int w = 0; w < 65536; ++w) {
      u32 end = sum + bucket[w];
      for (u32 i = sum; i < end; ++i) {
        u8 c = T[i];
        if (group[c] != w) { group[c] = w; P[index[c]] = 0x80000000u; }
        ++index[c];
      }
      sum = end;
    }
  }

  // refine to order-(k-1)
  u32 mask0 = 0x80000000u, mask1 = 0x40000000u;
  for (int round = 4; round < k; ++round, mask0 >>= 1, mask1 >>= 1) {
    std::memcpy(index, count, sizeof index);
    std::memset(group, 0xff, sizeof group);
    for (i32 g = 0, i = 0; i < n; ++i) {
      if (P[i] & mask0) g = i;
      u8 c = T[i];
      if (group[c] != g) { group[c] = g; P[index[c]] += mask1; }
      ++index[c];
    }
  }

  delete[] bucket;
  return fail_back;
}

// Layout A (n < 2^23): P[i] packs (char << 24) | leader-flag | link.
static void unst_rebuild_packed(u8* T, u32* P, const u32* count, int n, int start) {
  u32 index[256];
  i32 group[256];
  std::memcpy(index, count, sizeof index);
  std::memset(group, 0xff, sizeof group);

  for (i32 g = 0, i = 0; i < n; ++i) {
    if (P[i] > 0) g = i;
    u8 c = T[i];
    if (group[c] < g) {
      group[c] = i;
      P[i] = ((u32)c << 24) | index[c];
    } else {
      P[i] = ((u32)c << 24) | 0x800000u | (u32)group[c];
      ++P[group[c]];
    }
    ++index[c];
  }

  for (int p = start, i = n - 1; i >= 0; --i) {
    u32 u = P[p];
    if (u & 0x800000u) { p = (int)(u & 0x7fffffu); u = P[p]; }
    T[i] = (u8)(u >> 24);
    --P[p];
    p = (int)(u & 0x7fffffu);
  }
}

// Layout B (larger n, all char counts < 2^23): links relative to the bucket.
static void unst_rebuild_relative(u8* T, u32* P, const u32* count, int n, int start) {
  u32 index[256];
  i32 group[256];
  std::memset(index, 0, sizeof index);
  std::memset(group, 0xff, sizeof group);

  for (i32 g = 0, i = 0; i < n; ++i) {
    if (P[i] > 0) g = i;
    u8 c = T[i];
    if (group[c] < g) {
      group[c] = i;
      P[i] = ((u32)c << 24) | index[c];
    } else {
      P[i] = ((u32)c << 24) | 0x800000u | (u32)(i - group[c]);
      ++P[group[c]];
    }
    ++index[c];
  }

  for (int p = start, i = n - 1; i >= 0; --i) {
    u32 u = P[p];
    if (u & 0x800000u) { p = p - (int)(u & 0x7fffffu); u = P[p]; }
    u8 c = (u8)(u >> 24);
    T[i] = c;
    --P[p];
    p = (int)(u & 0x7fffffu) + (int)count[c];
  }
}

// Layout C (fail-back): link-only; the char is recovered by locating the
// rank inside the first-context-byte partition (accelerated lookup table).
static void unst_rebuild_search(u8* T, u32* P, const u32* count, int n, int start) {
  constexpr int kFastBits = 10;
  u8 fastbits[1 << kFastBits];
  u32 ends[256];
  i32 group[256];
  u32 index[256];

  std::memcpy(index, count, sizeof index);
  std::memset(group, 0xff, sizeof group);

  for (i32 g = 0, i = 0; i < n; ++i) {
    if (P[i] > 0) g = i;
    u8 c = T[i];
    if (group[c] < g) {
      group[c] = i;
      P[i] = index[c];
    } else {
      P[i] = 0x80000000u | (u32)group[c];
      ++P[group[c]];
    }
    ++index[c];
  }

  int shift = 0;
  while (((n - 1) >> shift) >= (1 << kFastBits)) ++shift;
  {
    int v = 0;
    for (int c = 0; c < 256; ++c) {
      ends[c] = (c + 1 < 256) ? count[c + 1] : (u32)n;
      if (count[c] != ends[c])
        for (; v <= (int)((ends[c] - 1) >> shift); ++v) fastbits[v] = (u8)c;
    }
  }

  auto char_of = [&](int p) {
    int c = fastbits[p >> shift];
    while (ends[c] <= (u32)p) ++c;
    return (u8)c;
  };

  int p = start;
  if (P[p] & 0x80000000u) p = (int)(P[p] & 0x7fffffffu);
  T[0] = char_of(p);
  --P[p];
  p = (int)P[p] + 1;

  for (int i = n - 1; i >= 1; --i) {
    u32 u = P[p];
    if (u & 0x80000000u) { p = (int)(u & 0x7fffffffu); u = P[p]; }
    T[i] = char_of(p);
    --P[p];
    p = (int)u;
  }
}

int st_decode(u8* T, int n, int k, int index, int /*num_threads*/) {
  if (n < 0 || k < 3 || k > 8) return -1;
  if (n <= 1) return 0;
  if (index < 0 || index >= n) return -1;

  u32* P = new (std::nothrow) u32[(size_t)n]();
  u32* count = new (std::nothrow) u32[256]();
  if (!P || !count) { delete[] P; delete[] count; return -2; }

  bool fail_back = unst_mark_groups(T, P, count, n, k);

  if (n < 0x800000) unst_rebuild_packed(T, P, count, n, index);
  else if (!fail_back) unst_rebuild_relative(T, P, count, n, index);
  else unst_rebuild_search(T, P, count, n, index);

  delete[] P;
  delete[] count;
  return 0;
}

}  // namespace tbsc
