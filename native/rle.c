/* COCO compressed-RLE mask decoding.
 *
 * Native counterpart of slotformer_tpu/datasets/utils.rle_decode: CLEVRER
 * mask evaluation decodes ~300 RLE masks per video sample (48 frames x ~6
 * objects); the python varint+fill loop dominates host time there. This
 * C implementation is ~50x faster and is loaded via ctypes
 * (slotformer_tpu/native.py) with the numpy path as fallback.
 *
 * Format per the COCO spec: LEB128-style varints (5 bits/char, offset 48),
 * counts delta-coded from the 3rd entry on, runs fill column-major.
 */

#include <stdint.h>
#include <stddef.h>

/* Decode one RLE string into a row-major uint8 mask buffer out[h*w].
 * Returns 0 on success, -1 on malformed input / overflow. */
int rle_decode(const char *counts, long counts_len, long h, long w,
               uint8_t *out) {
    long total = h * w;
    long prev2 = 0, prev1 = 0; /* last two decoded counts (for delta) */
    long n_counts = 0;
    long pos = 0; /* pixels filled so far (column-major index) */
    uint8_t val = 0;
    long i = 0;

    while (i < counts_len) {
        long x = 0;
        int k = 0;
        int more = 1;
        while (more) {
            if (i >= counts_len || k > 12)
                return -1;
            long c = (long)(counts[i]) - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (c & 0x20) != 0;
            i++;
            k++;
            if (!more && (c & 0x10))
                x |= -1L << (5 * k);
        }
        if (n_counts > 2)
            x += prev2;
        prev2 = prev1;
        prev1 = x;
        n_counts++;

        if (x < 0 || pos + x > total)
            return -1;
        if (val) {
            /* fill run: column-major position p -> out[(p % h) * w + p / h] */
            long p;
            for (p = pos; p < pos + x; p++) {
                out[(p % h) * w + (p / h)] = 1;
            }
        }
        pos += x;
        val = 1 - val;
    }
    return pos == total ? 0 : -1;
}

/* Batch variant: decode n masks (concatenated counts strings with offsets)
 * into out[n*h*w]. offsets has n+1 entries. */
int rle_decode_batch(const char *counts, const long *offsets, long n, long h,
                     long w, uint8_t *out) {
    long i;
    for (i = 0; i < n; i++) {
        int rc = rle_decode(counts + offsets[i], offsets[i + 1] - offsets[i],
                            h, w, out + i * h * w);
        if (rc != 0)
            return rc;
    }
    return 0;
}
