// Native host-side hot paths (C++17, no external deps).
//
// The reference implements its whole runtime in C++; in this TPU-native
// rebuild the device does the heavy math, but three host loops remain hot
// and byte-/branch-bound — exactly what Python is worst at:
//
//  1. jpeg_payload_offset: JPEG marker walk to find the SOS offset so md5
//     ignores EXIF/APPn segments (reference src/scanner.cpp:927-964).
//  2. window_compress: the sequential per-frame hash-run compression for
//     video indexing (reference src/media.cpp:998-1031) — data-dependent
//     control flow, one iteration per decoded frame.
//  3. hamming_scan / hamming_knn: POPCNT brute scan (reference src/hamm.h,
//     src/tree/radix.h:187-230) used as the small-index fast path where
//     device dispatch latency would dominate, and as the no-TPU fallback.
//
// Built as a plain shared library, loaded via ctypes (see __init__.py);
// every entry point has a pure-Python fallback so the package works
// without a compiler.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

#if defined(__GNUC__)
#define EXPORT extern "C" __attribute__((visibility("default")))
#else
#define EXPORT extern "C"
#endif

static inline int popcount64(uint64_t v) {
#if defined(__GNUC__)
    return __builtin_popcountll(v);
#else
    v = v - ((v >> 1) & 0x5555555555555555ull);
    v = (v & 0x3333333333333333ull) + ((v >> 2) & 0x3333333333333333ull);
    v = (v + (v >> 4)) & 0x0f0f0f0f0f0f0f0full;
    return (int)((v * 0x0101010101010101ull) >> 56);
#endif
}

#if defined(__AVX2__)
#include <immintrin.h>
// 4x64-bit popcount via the pshufb nibble LUT (the AVX2 replacement for
// the reference's hand-unrolled radix scan, src/tree/radix.h:187-230).
static inline __m256i popcount256_epi64(__m256i v) {
    const __m256i lut = _mm256_setr_epi8(0,1,1,2,1,2,2,3,1,2,2,3,2,3,3,4,
                                         0,1,1,2,1,2,2,3,1,2,2,3,2,3,3,4);
    const __m256i low = _mm256_set1_epi8(0x0f);
    const __m256i lo = _mm256_and_si256(v, low);
    const __m256i hi = _mm256_and_si256(_mm256_srli_epi32(v, 4), low);
    const __m256i cnt = _mm256_add_epi8(_mm256_shuffle_epi8(lut, lo),
                                        _mm256_shuffle_epi8(lut, hi));
    return _mm256_sad_epu8(cnt, _mm256_setzero_si256());
}
#endif

// ---------------------------------------------------------------------------
// 1. jpeg payload
// ---------------------------------------------------------------------------

// Return the byte offset of the first SOS (0xFFDA) marker, skipping
// application segments (0xFFE1-0xFFEF) by their declared length so embedded
// thumbnails can't fake the offset.  0 = no SOS found (hash whole file).
//
// memchr-jump scan: hop from 0xFF byte to 0xFF byte instead of walking every
// byte.  Behavior contract (pinned by tests/test_ioutil.py, must stay md5-
// compatible with indexes written by the reference): only APP1-APP15 bodies
// are length-skipped (APP0 and table/SOF segments are walked through, so a
// stray FF DA inside them WOULD match — same answer either way), a stuffed
// FF 00 or fill FF FF never classifies, and the first SOS wins.
EXPORT int64_t cbird_jpeg_payload_offset(const uint8_t* data, int64_t size) {
    int64_t pos = 0;
    while (pos < size) {
        const uint8_t* ff =
            (const uint8_t*)memchr(data + pos, 0xFF, (size_t)(size - pos));
        if (ff == nullptr) break;
        const int64_t p = ff - data;
        if (p + 1 >= size) break;
        const uint8_t code = data[p + 1];
        if (code == 0xFF) {           // fill byte: the next FF may itself
            pos = p + 1;              // start the marker
        } else if (code >= 0xE1 && code <= 0xEF) {
            // APPn: hop over the declared segment body (big-endian length
            // counts its own two bytes); truncated length field → fall
            // through to a plain byte scan past the code
            pos = (p + 3 < size)
                ? p + 2 + ((int64_t(data[p + 2]) << 8) | data[p + 3])
                : p + 2;
        } else if (code == 0xDA) {
            return p;                 // first start-of-scan wins
        } else {
            pos = p + 2;              // any other code: scan on
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// 2. video hash-run window compression
// ---------------------------------------------------------------------------

// Compress a per-frame hash run: frame 0 always retained; frame i >= 1 is
// retained exactly when some frame in the comparison window — every frame
// since (and including) the last retained one, or since frame 1 if none —
// sits at Hamming distance >= threshold from it.  The final frame is always
// appended.  Retention quirks pinned by tests/test_video.py: frame 1 is
// never retained (its window is empty), and the window restarts AT the
// retained frame, not after it.
//
// The window is always the contiguous run hashes[win_lo .. i-1], so two
// indexes replace the reference's materialized vector, and the existence
// test short-circuits on the first far member instead of counting close
// ones.  out_frames/out_hashes must have capacity n+1.  Returns count.
EXPORT int64_t cbird_window_compress(const uint64_t* hashes, int64_t n,
                                     int threshold, int32_t* out_frames,
                                     uint64_t* out_hashes) {
    if (n <= 0) return 0;
    int64_t count = 0;
    out_frames[count] = 0;
    out_hashes[count] = hashes[0];
    ++count;
    if (threshold <= 0) {  // no compression: every frame retained
        for (int64_t i = 1; i < n; ++i) {
            out_frames[count] = (int32_t)i;
            out_hashes[count] = hashes[i];
            ++count;
        }
    } else {
        int64_t win_lo = 1;  // comparison window = hashes[win_lo .. i-1]
        for (int64_t i = 1; i < n; ++i) {
            const uint64_t h = hashes[i];
            bool cut = false;
            for (int64_t j = win_lo; j < i; ++j) {
                if (popcount64(hashes[j] ^ h) >= threshold) {
                    cut = true;
                    break;
                }
            }
            if (cut) {
                out_frames[count] = (int32_t)i;
                out_hashes[count] = h;
                ++count;
                win_lo = i;  // window restarts at the retained frame
            }
        }
    }
    if (out_frames[count - 1] != (int32_t)(n - 1)) {
        out_frames[count] = (int32_t)(n - 1);
        out_hashes[count] = hashes[n - 1];
        ++count;
    }
    return count;
}

// ---------------------------------------------------------------------------
// 3. CPU Hamming scans
// ---------------------------------------------------------------------------

// Threshold scan of one needle over n hashes; rows with id 0 are
// tombstones.  Results are appended up to cap; returns hit count (possibly
// > cap, caller may re-run with a bigger buffer).
EXPORT int64_t cbird_hamming_scan(const uint64_t* hashes, const uint32_t* ids,
                                  int64_t n, uint64_t needle, int threshold,
                                  int32_t* out_idx, int32_t* out_dist,
                                  int64_t cap) {
    int64_t hits = 0;
    int64_t i = 0;
#if defined(__AVX2__)
    // 4 rows per iteration; one movemask branch skips miss-only groups
    const __m256i vneedle = _mm256_set1_epi64x((int64_t)needle);
    const __m256i vthresh = _mm256_set1_epi64x(threshold);
    alignas(32) uint64_t dbuf[4];
    for (; i + 4 <= n; i += 4) {
        const __m256i h = _mm256_loadu_si256((const __m256i*)(hashes + i));
        const __m256i d4 = popcount256_epi64(_mm256_xor_si256(h, vneedle));
        const __m256i lt = _mm256_cmpgt_epi64(vthresh, d4);
        if (!_mm256_movemask_pd(_mm256_castsi256_pd(lt))) continue;
        _mm256_store_si256((__m256i*)dbuf, d4);
        for (int l = 0; l < 4; ++l) {
            const int d = (int)dbuf[l];
            if (d < threshold && ids[i + l] != 0) {
                if (hits < cap) {
                    out_idx[hits] = (int32_t)(i + l);
                    out_dist[hits] = d;
                }
                hits++;
            }
        }
    }
#endif
    for (; i < n; ++i) {
        const int d = popcount64(hashes[i] ^ needle);
        if (d < threshold && ids[i] != 0) {
            if (hits < cap) {
                out_idx[hits] = (int32_t)i;
                out_dist[hits] = d;
            }
            hits++;
        }
    }
    return hits;
}

// k-nearest (by Hamming distance) for a batch of needles; insertion sort
// into a per-needle heap-less top-k (k is small).  out arrays are [q, k];
// missing slots get dist 0x7FFF / idx -1.
EXPORT void cbird_hamming_knn(const uint64_t* hashes, const uint32_t* ids,
                              int64_t n, const uint64_t* needles, int64_t q,
                              int k, int32_t* out_idx, int32_t* out_dist) {
    for (int64_t t = 0; t < q; ++t) {
        int32_t* bi = out_idx + t * k;
        int32_t* bd = out_dist + t * k;
        for (int j = 0; j < k; ++j) { bi[j] = -1; bd[j] = 0x7FFF; }
        const uint64_t needle = needles[t];
        int64_t i = 0;
#if defined(__AVX2__)
        alignas(32) uint64_t dbuf[4];
        for (; i + 4 <= n; i += 4) {
            const __m256i h = _mm256_loadu_si256((const __m256i*)(hashes + i));
            const __m256i vneedle = _mm256_set1_epi64x((int64_t)needle);
            const __m256i d4 = popcount256_epi64(_mm256_xor_si256(h, vneedle));
            const __m256i vbound = _mm256_set1_epi64x(bd[k - 1]);
            const __m256i lt = _mm256_cmpgt_epi64(vbound, d4);
            if (!_mm256_movemask_pd(_mm256_castsi256_pd(lt))) continue;
            _mm256_store_si256((__m256i*)dbuf, d4);
            for (int l = 0; l < 4; ++l) {
                if (ids[i + l] == 0) continue;
                const int d = (int)dbuf[l];
                if (d < bd[k - 1]) {
                    int j = k - 1;
                    while (j > 0 && bd[j - 1] > d) {
                        bd[j] = bd[j - 1];
                        bi[j] = bi[j - 1];
                        --j;
                    }
                    bd[j] = d;
                    bi[j] = (int32_t)(i + l);
                }
            }
        }
#endif
        for (; i < n; ++i) {
            if (ids[i] == 0) continue;
            const int d = popcount64(hashes[i] ^ needle);
            if (d < bd[k - 1]) {
                int j = k - 1;
                while (j > 0 && bd[j - 1] > d) {
                    bd[j] = bd[j - 1];
                    bi[j] = bi[j - 1];
                    --j;
                }
                bd[j] = d;
                bi[j] = (int32_t)i;
            }
        }
    }
}

// 256-bit (4x64) descriptor variant of the knn scan (ORB descriptors).
EXPORT void cbird_hamming256_knn(const uint64_t* desc, const uint32_t* ids,
                                 int64_t n, const uint64_t* needles, int64_t q,
                                 int k, int32_t* out_idx, int32_t* out_dist) {
    for (int64_t t = 0; t < q; ++t) {
        int32_t* bi = out_idx + t * k;
        int32_t* bd = out_dist + t * k;
        for (int j = 0; j < k; ++j) { bi[j] = -1; bd[j] = 0x7FFF; }
        const uint64_t* nd = needles + t * 4;
#if defined(__AVX2__)
        const __m256i vn = _mm256_loadu_si256((const __m256i*)nd);
#endif
        for (int64_t i = 0; i < n; ++i) {
            if (ids[i] == 0) continue;
            const uint64_t* hd = desc + i * 4;
#if defined(__AVX2__)
            // one 256-bit row per vector: xor + nibble popcount + lane sum
            const __m256i x = _mm256_xor_si256(
                _mm256_loadu_si256((const __m256i*)hd), vn);
            const __m256i c = popcount256_epi64(x);
            const __m128i s = _mm_add_epi64(_mm256_castsi256_si128(c),
                                            _mm256_extracti128_si256(c, 1));
            const int d = (int)(_mm_cvtsi128_si64(s)
                                + _mm_extract_epi64(s, 1));
#else
            const int d = popcount64(hd[0] ^ nd[0]) + popcount64(hd[1] ^ nd[1])
                        + popcount64(hd[2] ^ nd[2]) + popcount64(hd[3] ^ nd[3]);
#endif
            if (d < bd[k - 1]) {
                int j = k - 1;
                while (j > 0 && bd[j - 1] > d) {
                    bd[j] = bd[j - 1];
                    bi[j] = bi[j - 1];
                    --j;
                }
                bd[j] = d;
                bi[j] = (int32_t)i;
            }
        }
    }
}
