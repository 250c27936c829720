/* Optional compiled fast path for the baseline-JPEG ENTROPY layer only.
 *
 * Scope is deliberately integer-exact: Huffman symbol decode (T.81 F.2) and
 * variable-length bit packing with byte stuffing (T.81 B.1.1.5 / F.1.2.3).
 * Everything floating-point (FDCT/IDCT, color transforms, quantization
 * rounding) stays in numpy so decoded pixels and encoded blobs are
 * bit-identical whether or not this kernel is available — the numpy lane
 * decoder / vector packer in codec.py remain the canonical reference
 * implementations and the permanent fallback.
 *
 * Built on demand by imaging/native.py (gcc -O2 -shared -fPIC); no
 * third-party headers, C99 only.
 */

#include <stdint.h>
#include <stddef.h>

/* 16-bit MSB-aligned peek at bit position `pos` of byte buffer `p` —
 * identical to the numpy decoder's 24-bit sliding-window formula. The
 * caller guarantees ≥3 readable bytes past any reachable position. */
static inline uint32_t peek16(const uint8_t *p, long pos) {
    long i = pos >> 3;
    uint32_t w = ((uint32_t)p[i] << 16) | ((uint32_t)p[i + 1] << 8)
                 | (uint32_t)p[i + 2];
    return (w >> (8 - (pos & 7))) & 0xFFFFu;
}

/* Baseline sequential entropy decode of one image's scan (1x1 sampling,
 * interleaved MCUs). `bits` holds the image's destuffed restart segments
 * concatenated (caller pads the buffer tail by >=8 bytes). `seg_start`
 * has nseg+1 byte offsets into `bits`. Coefficients land zig-zag-ordered
 * at out[((long)(m*ncomp + c)) * 64 + k] (int32, caller zero-fills).
 * `sym`/`len` are the concatenated 65536-entry decode LUTs; comp_dc/_ac
 * give each component's table base offset. Returns 0 on success,
 * -(seg+1) on the first stream anomaly (caller falls back to the scalar
 * python decoder for identical error surfacing). */
long om_entropy_decode(const uint8_t *bits, const int64_t *seg_start,
                       int nseg, long mcus, long ri, int ncomp,
                       const int64_t *comp_dc, const int64_t *comp_ac,
                       const int16_t *sym, const uint8_t *len,
                       int32_t *out) {
    int pred[4] = {0, 0, 0, 0};
    for (int seg = 0; seg < nseg; seg++) {
        const uint8_t *p = bits + seg_start[seg];
        long nbits = (seg_start[seg + 1] - seg_start[seg]) * 8;
        long pos = 0;
        for (int c = 0; c < ncomp; c++) pred[c] = 0;
        long m0 = (long)seg * ri;
        long m1 = m0 + ri;
        if (m1 > mcus) m1 = mcus;
        for (long m = m0; m < m1; m++) {
            for (int c = 0; c < ncomp; c++) {
                int32_t *blk = out + (m * ncomp + c) * 64;
                uint32_t w = peek16(p, pos);
                int s = sym[comp_dc[c] + w];
                int l = len[comp_dc[c] + w];
                if (!l) return -(seg + 1);
                pos += l;
                if (s) {
                    uint32_t v = (peek16(p, pos) >> (16 - s))
                                 & ((1u << s) - 1);
                    pos += s;
                    pred[c] += (v < (1u << (s - 1)))
                                   ? (int)v - (1 << s) + 1
                                   : (int)v;
                }
                if (pos > nbits) return -(seg + 1);
                blk[0] = pred[c];
                int k = 1;
                while (k < 64) {
                    w = peek16(p, pos);
                    int rs = sym[comp_ac[c] + w];
                    l = len[comp_ac[c] + w];
                    if (!l) return -(seg + 1);
                    pos += l;
                    int ssz = rs & 15;
                    if (ssz == 0) {
                        if (pos > nbits) return -(seg + 1);
                        if (rs == 0xF0) { k += 16; continue; }
                        break; /* EOB */
                    }
                    k += rs >> 4;
                    if (k > 63) return -(seg + 1);
                    uint32_t v = (peek16(p, pos) >> (16 - ssz))
                                 & ((1u << ssz) - 1);
                    pos += ssz;
                    if (pos > nbits) return -(seg + 1);
                    blk[k] = (v < (1u << (ssz - 1)))
                                 ? (int)v - (1 << ssz) + 1
                                 : (int)v;
                    k++;
                }
            }
        }
    }
    return 0;
}

/* Variable-length bit packing of pre-sorted (code, len) symbols carrying a
 * non-decreasing segment id. Per segment: MSB-first emission, 1-bit pad to
 * byte alignment, 0xFF->0xFF00 stuffing of every data byte (padding byte
 * included); then the segment's 2-byte trailer from `trailer` (0x0000 =
 * none — image boundary or final segment; trailer bytes are emitted raw,
 * never stuffed, exactly like the numpy packer's post-stuffing insert).
 * Per-segment exclusive end offsets (after trailer) land in seg_end.
 * Returns total bytes written. `out` must hold >= 2*ceil(sum(len)/8) +
 * 3*nseg + 8 bytes (all-0xFF worst case doubles). */
long om_pack_codes(const int64_t *codes, const uint8_t *lens,
                   const int32_t *segs, long nsym, int nseg,
                   const uint16_t *trailer, int64_t *seg_end,
                   uint8_t *out) {
    long o = 0;
    uint64_t acc = 0;
    int nb = 0;
    long i = 0;
    for (int seg = 0; seg < nseg; seg++) {
        while (i < nsym && segs[i] == seg) {
            int l = lens[i];
            acc = (acc << l) | ((uint64_t)codes[i] & ((1ull << l) - 1ull));
            nb += l;
            while (nb >= 8) {
                uint8_t b = (uint8_t)(acc >> (nb - 8));
                out[o++] = b;
                if (b == 0xFF) out[o++] = 0x00;
                nb -= 8;
            }
            i++;
        }
        if (nb) { /* 1-pad to byte boundary */
            uint8_t b = (uint8_t)(((acc << (8 - nb))
                                   | ((1u << (8 - nb)) - 1u)) & 0xFFu);
            out[o++] = b;
            if (b == 0xFF) out[o++] = 0x00;
            nb = 0;
            acc = 0;
        }
        uint16_t t = trailer[seg];
        if (t) {
            out[o++] = (uint8_t)(t >> 8);
            out[o++] = (uint8_t)(t & 0xFF);
        }
        seg_end[seg] = o;
    }
    return o;
}

/* Bit-parallel LCS length (Allison-Dix) per string pair, over Unicode
 * codepoints, for the conflation matcher's fuzz.ratio gate. `codes` packs
 * every string's UTF-32 codepoints; pair i compares
 * codes[a_off[i] .. +la[i]) vs codes[b_off[i] .. +lb[i]), both <= 64
 * (the Python caller routes longer pairs to its big-int scalar).
 * Integer-exact twin of text.py's numpy lane kernel: the ratio division
 * happens in numpy on the returned counts, so floats never diverge. */
void om_lcs_pairs(const uint32_t *codes, const int64_t *a_off,
                  const int64_t *b_off, const int64_t *la,
                  const int64_t *lb, long n, int64_t *out) {
    for (long i = 0; i < n; i++) {
        const uint32_t *A = codes + a_off[i];
        const uint32_t *B = codes + b_off[i];
        int m = (int)la[i];
        int nb = (int)lb[i];
        /* mirror the numpy kernel's 64-column clip exactly: mask bits and
         * scanned b-chars clip to 64, the width mask saturates at m>=64
         * (lengths beyond 64 only reach here for non-string oddities —
         * normal >64-char pairs take the Python big-int scalar path) */
        int mscan = m > 64 ? 64 : m;
        int nbscan = nb > 64 ? 64 : nb;
        uint64_t wmask = (m >= 64) ? ~0ull : ((1ull << m) - 1ull);
        uint64_t row = 0;
        for (int j = 0; j < nbscan; j++) {
            uint32_t c = B[j];
            uint64_t mask = 0;
            for (int k = 0; k < mscan; k++)
                if (A[k] == c) mask |= 1ull << k;
            uint64_t x = row | mask;
            uint64_t y = x - ((row << 1) | 1ull);
            row = (x & ~y) & wmask;
        }
        out[i] = (int64_t)__builtin_popcountll(row);
    }
}
