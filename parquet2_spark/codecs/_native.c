/* Optional C accelerator for FSST greedy encoding (the hot scalar loop).
 *
 * Implements exactly the same greedy longest-match-at-each-position
 * semantics as the Python implementations in fsst.py (regex + numpy);
 * byte-identical output is asserted in tests. Built lazily with the
 * system compiler; everything falls back to pure numpy when absent.
 *
 * Design follows the FSST paper's encoder shape: probe longest length
 * first via a tiny open-addressing table keyed by (len, prefix bytes).
 */
#include <stdint.h>
#include <string.h>

#define TABLE_BITS 12
#define TABLE_SIZE (1 << TABLE_BITS)
#define TABLE_MASK (TABLE_SIZE - 1)
#define ESCAPE 255

static uint64_t mix64(uint64_t z) {
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

typedef struct {
    uint64_t vals[TABLE_SIZE];
    uint8_t lens[TABLE_SIZE];
    int16_t codes[TABLE_SIZE];
    uint8_t used[TABLE_SIZE];
    uint8_t len_present[9];
    int max_len;
    /* direct-index fast paths (FSST-paper shortCodes shape): len-1 and
     * len-2 symbols resolve with one array read; lenmask2[v16] has bit
     * (L-3) set iff some length-L symbol (L>=3) starts with those two
     * bytes, so the hash probe only runs for lengths that can match. */
    int16_t code1[256];
    int16_t code2[65536];
    uint8_t lenmask2[65536];
} table2_t;

static table2_t G; /* single-threaded per python worker process */

static uint64_t window_val(const uint8_t *p, int len) {
    uint64_t v = 0;
    memcpy(&v, p, len);
    if (len < 8) v &= (1ULL << (8 * len)) - 1;
    return v;
}

int fsst_build(const uint8_t *symbol_bytes, const int32_t *symbol_lens, int n_symbols) {
    memset(&G, 0, sizeof(G));
    memset(G.code1, 0xFF, sizeof(G.code1));   /* int16 -1 */
    memset(G.code2, 0xFF, sizeof(G.code2));
    const uint8_t *p = symbol_bytes;
    for (int i = 0; i < n_symbols; i++) {
        int len = symbol_lens[i];
        if (len < 1 || len > 8) return -1;
        uint64_t v = window_val(p, len);
        if (len == 1) {
            G.code1[(uint8_t)v] = (int16_t)i;
        } else if (len == 2) {
            G.code2[(uint16_t)v] = (int16_t)i;
        } else {
            uint64_t h = mix64(v * 0x9E3779B97F4A7C15ULL + (uint64_t)len) & TABLE_MASK;
            while (G.used[h]) h = (h + 1) & TABLE_MASK;
            G.vals[h] = v;
            G.lens[h] = (uint8_t)len;
            G.codes[h] = (int16_t)i;
            G.used[h] = 1;
            G.lenmask2[(uint16_t)(v & 0xFFFF)] |= (uint8_t)(1u << (len - 3));
        }
        G.len_present[len] = 1;
        if (len > G.max_len) G.max_len = len;
        p += len;
    }
    return 0;
}

static int lookup(uint64_t v, int len) {
    uint64_t h = mix64(v * 0x9E3779B97F4A7C15ULL + (uint64_t)len) & TABLE_MASK;
    while (G.used[h]) {
        if (G.lens[h] == (uint8_t)len && G.vals[h] == v) return G.codes[h];
        h = (h + 1) & TABLE_MASK;
    }
    return -1;
}

/* Encode `n` input bytes into `out` (caller allocates 2n). Returns output
 * length. Greedy longest match, escape = 0xFF + literal. */
int64_t fsst_encode(const uint8_t *data, int64_t n, uint8_t *out) {
    int64_t i = 0, o = 0;
    while (i < n) {
        int64_t remaining = n - i;
        int code = -1, mlen = 1;
        /* longest window value once, then shrink by masking */
        uint64_t v8 = 0;
        int take = remaining >= 8 ? 8 : (int)remaining;
        memcpy(&v8, data + i, take);
        if (take < 8) v8 &= (1ULL << (8 * take)) - 1;
        if (remaining >= 2) {
            uint16_t v16 = (uint16_t)(v8 & 0xFFFF);
            uint8_t mask = G.lenmask2[v16];
            if (mask) {
                int max_l = G.max_len < remaining ? G.max_len : (int)remaining;
                for (int L = max_l; L >= 3; L--) {
                    if (!(mask & (1u << (L - 3)))) continue;
                    uint64_t v = L < 8 ? (v8 & ((1ULL << (8 * L)) - 1)) : v8;
                    int c = lookup(v, L);
                    if (c >= 0) { code = c; mlen = L; break; }
                }
            }
            if (code < 0 && G.code2[v16] >= 0) { code = G.code2[v16]; mlen = 2; }
        }
        if (code < 0 && G.code1[data[i]] >= 0) { code = G.code1[data[i]]; mlen = 1; }
        if (code >= 0) {
            out[o++] = (uint8_t)code;
        } else {
            out[o++] = ESCAPE;
            out[o++] = data[i];
        }
        i += mlen;
    }
    return o;
}

/* Decode: symbol expansion (escape = 0xFF + literal). Caller must size
 * `out` to the known decoded size. Returns bytes written or -1. */
int64_t fsst_decode(const uint8_t *enc, int64_t n, const uint8_t *symbol_bytes,
                    const int64_t *symbol_starts, const int32_t *symbol_lens,
                    int n_symbols, uint8_t *out, int64_t out_cap) {
    int64_t i = 0, o = 0;
    while (i < n) {
        uint8_t c = enc[i++];
        if (c == ESCAPE) {
            if (i >= n || o >= out_cap) return -1;
            out[o++] = enc[i++];
        } else {
            if (c >= n_symbols) return -1;
            int32_t l = symbol_lens[c];
            if (o + l > out_cap) return -1;
            memcpy(out + o, symbol_bytes + symbol_starts[c], l);
            o += l;
        }
    }
    return o;
}

/* MinHash: per document segment, per permutation, min of splitmix64(h +
 * const_p) over the segment's shingle hashes — identical math to the
 * numpy path (dedup.py), asserted byte-identical in tests. Permutation-
 * inner loop so the compiler can vectorize across p. */
void minhash64(const uint64_t *h, int64_t n, const int64_t *seg_starts,
               int64_t n_docs, const uint64_t *consts, int nh, uint64_t *out) {
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t s = seg_starts[d];
        int64_t e = (d + 1 < n_docs) ? seg_starts[d + 1] : n;
        for (int p = 0; p < nh; p++) out[p * n_docs + d] = ~0ULL;
        for (int64_t i = s; i < e; i++) {
            uint64_t x = h[i];
            for (int p = 0; p < nh; p++) {
                uint64_t z = x + consts[p];
                z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
                z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
                z ^= z >> 31;
                if (z < out[p * n_docs + d]) out[p * n_docs + d] = z;
            }
        }
    }
}

/* SimHash: per document segment, the 64-bit sign-sum signature over the
 * segment's shingle hashes — identical math to operators/dedup.py
 * (votes[b] = 2*popcount_of_bit_b - n_windows; bit set iff positive;
 * result >> 1 to stay non-negative in int64). */
void simhash64(const uint64_t *h, int64_t n, const int64_t *seg_starts,
               int64_t n_docs, int64_t *out) {
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t s = seg_starts[d];
        int64_t e = (d + 1 < n_docs) ? seg_starts[d + 1] : n;
        int64_t cnt[64] = {0};
        for (int64_t i = s; i < e; i++) {
            uint64_t x = h[i];
            for (int b = 0; b < 64; b++) cnt[b] += (x >> b) & 1ULL;
        }
        int64_t m = e - s;
        uint64_t v = 0;
        for (int b = 0; b < 64; b++)
            if (2 * cnt[b] - m > 0) v |= 1ULL << b;
        out[d] = (int64_t)(v >> 1);
    }
}

/* LSB-first k-bit unpack (bitpacked/unpack.rs semantics, one generic
 * kernel instead of const-generic monomorphs): value i occupies bits
 * [i*num_bits, (i+1)*num_bits) of buf. Fast path reads an unaligned
 * 8-byte window (+1 spill byte) per value; the last few values whose
 * window would over-read the buffer go through a zero-padded local
 * copy. Caller guarantees nbytes >= ceil(n*num_bits/8). */
void unpack_bits(const uint8_t *buf, int64_t nbytes, int32_t num_bits,
                 int64_t n, uint64_t *out) {
    if (num_bits <= 0) { memset(out, 0, (size_t)n * 8); return; }
    uint64_t mask = (num_bits >= 64) ? ~0ULL : ((1ULL << num_bits) - 1);
    int64_t safe_n = 0;
    if (nbytes >= 9) {
        safe_n = ((nbytes - 9) * 8 + 7) / num_bits + 1;
        if (safe_n > n) safe_n = n;
    }
    int64_t i = 0, bitpos = 0;
    for (; i < safe_n; i++, bitpos += num_bits) {
        int64_t byte = bitpos >> 3;
        int shift = (int)(bitpos & 7);
        uint64_t v;
        memcpy(&v, buf + byte, 8);
        v >>= shift;
        if (shift + num_bits > 64)
            v |= ((uint64_t)buf[byte + 8]) << (64 - shift);
        out[i] = v & mask;
    }
    if (i < n) {
        /* remaining values span < 9 real bytes; a 32-byte zero-padded
         * window keeps every per-value 9-byte read in bounds */
        uint8_t tmp[32] = {0};
        int64_t start = bitpos >> 3;
        int64_t avail = nbytes - start;
        if (avail > 0)
            memcpy(tmp, buf + start, (size_t)(avail < 23 ? avail : 23));
        for (; i < n; i++, bitpos += num_bits) {
            int64_t rel = bitpos - start * 8;
            int64_t byte = rel >> 3;
            int shift = (int)(rel & 7);
            uint64_t v;
            memcpy(&v, tmp + byte, 8);
            v >>= shift;
            if (shift + num_bits > 64)
                v |= ((uint64_t)tmp[byte + 8]) << (64 - shift);
            out[i] = v & mask;
        }
    }
}

/* LSB-first k-bit pack: inverse of unpack_bits. vals must be masked to
 * num_bits (the python wrapper masks). out must be zeroed and sized
 * ceil(n*num_bits/8) + 8 (spill lets the writer RMW whole words).
 * Returns payload bytes written (excluding spill). */
int64_t pack_bits(const uint64_t *vals, int64_t n, int32_t num_bits,
                  uint8_t *out) {
    if (num_bits <= 0 || n == 0) return 0;
    int64_t bitpos = 0;
    for (int64_t i = 0; i < n; i++, bitpos += num_bits) {
        int64_t byte = bitpos >> 3;
        int shift = (int)(bitpos & 7);
        uint64_t v;
        memcpy(&v, out + byte, 8);
        v |= vals[i] << shift;
        memcpy(out + byte, &v, 8);
        if (shift + num_bits > 64)
            out[byte + 8] |= (uint8_t)(vals[i] >> (64 - shift));
    }
    return (n * num_bits + 7) / 8;
}

/* Front-coding (DELTA_BYTE_ARRAY) reconstruction: value i = first
 * prefix_lens[i] bytes of value i-1 + its suffix. Sequential by nature —
 * exactly why it lives in C. Returns total bytes written or -1. */
int64_t front_decode(const int64_t *prefix_lens, const int64_t *suffix_lens,
                     int64_t n, const uint8_t *suffixes, int64_t suffixes_len,
                     uint8_t *out, int64_t out_cap) {
    int64_t spos = 0, opos = 0, prev = 0, prev_len = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t p = prefix_lens[i], s = suffix_lens[i];
        if (p < 0 || s < 0 || spos + s > suffixes_len || opos + p + s > out_cap)
            return -1;
        if (p > prev_len) return -1; /* corrupt stream: prefix longer than prev */
        prev_len = p + s;
        /* prefix comes from the previous *reconstructed* value */
        memmove(out + opos, out + prev, (size_t)p);
        memcpy(out + opos + p, suffixes + spos, (size_t)s);
        prev = opos;
        opos += p + s;
        spos += s;
    }
    return opos;
}
