// LZP (Lempel-Ziv prediction) preprocessing stage.
//
// Stream format (matches reference lzp.cpp): the first 4 bytes pass through
// verbatim; afterwards, at each position whose order-4 context hash hits a
// table entry pointing at a previous position, either
//   - a confirmed match of >= minLen bytes is replaced by the flag byte 0xf2
//     followed by (len - minLen) in base-254 continuation bytes, or
//   - a literal 0xf2 under a hash hit is escaped as 0xf2 0xff.
// A literal 0xf2 with no hash hit is NOT escaped.  Hash updates on the
// decoder mirror the encoder exactly, including inside copied matches.
//
// The encoder here implements the reference's "generic" match policy
// (lzp.cpp:441-531) including its failed-region heuristic, so the output is
// decodable by any conforming decoder.  Sub-block splitting (1/2/4/8 chunks
// with an in-stream directory, lzp.cpp:676-715) is applied above.

#include <cstdint>
#include <cstring>
#include <new>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace tbsc {

using u8 = uint8_t;
using u32 = uint32_t;

static const int kFlag = 0xf2;

static inline u32 ctx_hash(u32 context, u32 mask) {
  return ((context >> 15) ^ context ^ (context >> 3)) & mask;
}

static inline u32 load_ctx(const u8* p) {
  // context of position p: previous 4 bytes, most recent in the low byte
  return (u32)p[-1] | ((u32)p[-2] << 8) | ((u32)p[-3] << 16) | ((u32)p[-4] << 24);
}

int lzp_encode_block(const u8* input, const u8* input_end, u8* output, u8* output_end,
                     int hash_size, int min_len) {
  if ((int)(input_end - input) - min_len < 32) return -3;

  const u32 mask = (1u << hash_size) - 1;
  int* lookup = new (std::nothrow) int[(size_t)1 << hash_size]();
  if (!lookup) return -2;

  const u8* in_start = input;
  const u8* out_start = output;
  const u8* out_eob = output_end - 8;
  const u8* heuristic = input;
  const u8* min_len_end = input_end - min_len - 32;

  for (int i = 0; i < 4; ++i) *output++ = *input++;

  u32 context = load_ctx(input);
  while (input < min_len_end && output < out_eob) {
    u32 idx = ctx_hash(context, mask);
    int value = lookup[idx];
    lookup[idx] = (int)(input - in_start);
    if (value > 0) {
      const u8* ref = in_start + value;
      bool head_ok = std::memcmp(input + min_len - 4, ref + min_len - 4, 4) == 0 &&
                     std::memcmp(input, ref, 4) == 0;
      bool matched = false;
      if (head_ok) {
        if (heuristic > input && std::memcmp(heuristic, ref + (heuristic - input), 4) != 0) {
          // known-bad region: skip the full extension scan
        } else {
          int len = 4;
          for (; input + len < min_len_end; len += 4) {
            if (std::memcmp(input + len, ref + len, 4) != 0) break;
          }
          if (len < min_len) {
            if (heuristic < input + len) heuristic = input + len;
          } else {
            len += 2 * (std::memcmp(input + len, ref + len, 2) == 0);
            len += (input[len] == ref[len]);
            input += len;
            context = load_ctx(input);
            *output++ = kFlag;
            len -= min_len;
            while (len >= 254) {
              len -= 254;
              *output++ = 254;
              if (output >= out_eob) break;
            }
            *output++ = (u8)len;
            matched = true;
          }
        }
      }
      if (!matched) {
        u8 next = *output++ = *input++;
        context = (context << 8) | next;
        if (next == kFlag) *output++ = 255;
      }
    } else {
      context = (context << 8) | (*output++ = *input++);
    }
  }

  // Tail: literals only, with flag escaping under hash hits.
  context = load_ctx(input);
  while (input < input_end && output < out_eob) {
    u32 idx = ctx_hash(context, mask);
    int value = lookup[idx];
    lookup[idx] = (int)(input - in_start);
    u8 next = *output++ = *input++;
    context = (context << 8) | next;
    if (next == kFlag && value > 0) *output++ = 255;
  }

  delete[] lookup;
  return output >= out_eob ? -3 : (int)(output - out_start);
}

int lzp_decode_block(const u8* input, const u8* input_end, u8* output,
                     int hash_size, int min_len) {
  if (input_end - input < 4) return -5;

  const u32 mask = (1u << hash_size) - 1;
  int* lookup = new (std::nothrow) int[(size_t)1 << hash_size]();
  if (!lookup) return -2;

  const u8* out_start = output;
  for (int i = 0; i < 4; ++i) *output++ = *input++;

  u32 context = load_ctx(output);
  while (input < input_end) {
    u32 idx = ctx_hash(context, mask);
    int value = lookup[idx];
    lookup[idx] = (int)(output - out_start);
    if (*input == kFlag && value > 0) {
      ++input;
      if (*input != 255) {
        int len = min_len;
        for (;;) {
          len += *input;
          if (*input++ != 254) break;
        }
        const u8* ref = out_start + value;
        u8* out_end = output + len;
        while (output < out_end) *output++ = *ref++;
        context = load_ctx(output);
      } else {
        ++input;
        context = (context << 8) | (*output++ = kFlag);
      }
    } else {
      context = (context << 8) | (*output++ = *input++);
    }
  }

  delete[] lookup;
  return (int)(output - out_start);
}

static int lzp_num_blocks(int n) {
  if (n < 256 * 1024) return 1;
  if (n < 4 * 1024 * 1024) return 2;
  if (n < 16 * 1024 * 1024) return 4;
  return 8;
}

static void put_i32(u8* p, int v) { std::memcpy(p, &v, 4); }
static int get_i32(const u8* p) { int v; std::memcpy(&v, p, 4); return v; }

int lzp_compress(const u8* input, u8* output, int n, int hash_size, int min_len,
                 int num_threads) {
  int n_blocks = lzp_num_blocks(n);
  if (n_blocks == 1) {
    int r = lzp_encode_block(input, input + n, output + 1, output + n - 1, hash_size, min_len);
    if (r >= 0) { output[0] = 1; return r + 1; }
    return r;
  }

  int chunk = n / n_blocks;
  int packed[8], sizes[8];
  for (int b = 0; b < n_blocks; ++b)
    sizes[b] = b != n_blocks - 1 ? chunk : n - b * chunk;
  output[0] = (u8)n_blocks;

#ifdef _OPENMP
  if (num_threads > 1) {
    u8* scratch = new (std::nothrow) u8[(size_t)n];
    if (scratch) {
      #pragma omp parallel for schedule(dynamic) num_threads(num_threads)
      for (int b = 0; b < n_blocks; ++b) {
        int start = b * chunk;
        int r = lzp_encode_block(input + start, input + start + sizes[b],
                                 scratch + start, scratch + start + sizes[b],
                                 hash_size, min_len);
        packed[b] = r < 0 ? sizes[b] : r;
      }
      long long total = 1 + 8 * n_blocks;
      for (int b = 0; b < n_blocks; ++b) total += packed[b];
      if (total >= n) { delete[] scratch; return -3; }
      int out_ptr = 1 + 8 * n_blocks;
      for (int b = 0; b < n_blocks; ++b) {
        put_i32(output + 1 + 8 * b, sizes[b]);
        put_i32(output + 1 + 8 * b + 4, packed[b]);
        const u8* src = packed[b] != sizes[b] ? scratch + b * chunk : input + b * chunk;
        std::memcpy(output + out_ptr, src, (size_t)packed[b]);
        out_ptr += packed[b];
      }
      delete[] scratch;
      return out_ptr;
    }
  }
#endif
  (void)num_threads;

  int out_ptr = 1 + 8 * n_blocks;
  for (int b = 0; b < n_blocks; ++b) {
    int start = b * chunk;
    int budget = sizes[b];
    if (budget > n - out_ptr) budget = n - out_ptr;
    int r = lzp_encode_block(input + start, input + start + sizes[b],
                             output + out_ptr, output + out_ptr + budget,
                             hash_size, min_len);
    if (r < 0) {
      if (out_ptr + sizes[b] >= n) return -3;
      r = sizes[b];
      std::memcpy(output + out_ptr, input + start, (size_t)sizes[b]);
    }
    put_i32(output + 1 + 8 * b, sizes[b]);
    put_i32(output + 1 + 8 * b + 4, r);
    out_ptr += r;
  }
  return out_ptr;
}

int lzp_decompress(const u8* input, u8* output, int n, int hash_size, int min_len,
                   int num_threads) {
  int n_blocks = input[0];
  if (n_blocks == 1)
    return lzp_decode_block(input + 1, input + n, output, hash_size, min_len);

  int results[256], in_ptr[256], out_ptr[256], in_size[256], out_size[256];
  {
    int ip = 1 + 8 * n_blocks, op = 0;
    for (int b = 0; b < n_blocks; ++b) {
      out_size[b] = get_i32(input + 1 + 8 * b);
      in_size[b] = get_i32(input + 1 + 8 * b + 4);
      in_ptr[b] = ip;
      out_ptr[b] = op;
      ip += in_size[b];
      op += out_size[b];
    }
  }

#ifdef _OPENMP
  #pragma omp parallel for schedule(dynamic) num_threads(num_threads > 0 ? num_threads : 1) if (num_threads > 1)
#endif
  for (int b = 0; b < n_blocks; ++b) {
    if (in_size[b] != out_size[b]) {
      results[b] = lzp_decode_block(input + in_ptr[b], input + in_ptr[b] + in_size[b],
                                    output + out_ptr[b], hash_size, min_len);
    } else {
      results[b] = in_size[b];
      std::memcpy(output + out_ptr[b], input + in_ptr[b], (size_t)in_size[b]);
    }
  }

  int total = 0;
  for (int b = 0; b < n_blocks; ++b) {
    if (results[b] < 0) return results[b];
    total += results[b];
  }
  return total;
}

}  // namespace tbsc
