// 2 MB-aligned allocation with transparent-huge-page advice.
//
// The pointer-chasing stages (inverse ST walk, inverse-BWT chains, SA-IS
// induce) make random accesses over arrays of 4n bytes; with 4 KiB pages
// every access is also a TLB miss.  THP on this machine is madvise-only,
// so the big arrays opt in explicitly.  hfree() pairs with halloc().

#pragma once

#include <cstdlib>

#if defined(__linux__)
#include <sys/mman.h>
#endif

namespace tbsc {

inline void* halloc(size_t bytes) {
  const size_t kHuge = (size_t)2 << 20;
  size_t aligned = (bytes + kHuge - 1) & ~(kHuge - 1);
  void* p = aligned_alloc(kHuge, aligned);
  if (!p) return malloc(bytes);  // plain pages as a fallback
#if defined(__linux__)
  madvise(p, aligned, MADV_HUGEPAGE);
#endif
  return p;
}

inline void hfree(void* p) { free(p); }

}  // namespace tbsc
