/* postcard.h — header-only C11 codec for the postcard wire format.
 *
 * Capability parity with the reference's libs/postcard-c/postcard.h
 * (original implementation; differentially tested byte-for-byte against
 * the Python codec in elodin_tpu/db/postcard.py, see
 * tests/test_native_client.py):
 *
 *   - LEB128 varints (u16/u32/u64), zigzag signed ints
 *   - little-endian f32/f64
 *   - length-prefixed strings / byte slices
 *   - option tags, enum discriminants, seq/map length prefixes
 *
 * All calls are bounds-checked against the caller's buffer; every encode/
 * decode returns PC_OK or an error and the cursor never moves past `len`.
 */
#ifndef ELODIN_POSTCARD_H
#define ELODIN_POSTCARD_H

#include <stdbool.h>
#include <stddef.h>
#include <stdint.h>
#include <string.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum {
    PC_OK = 0,
    PC_ERR_OVERFLOW = 1,   /* buffer too small / input exhausted */
    PC_ERR_MALFORMED = 2,  /* varint longer than 10 bytes, bad tag */
} pc_status;

typedef struct {
    uint8_t *buf;
    size_t cap;
    size_t pos;
} pc_writer;

typedef struct {
    const uint8_t *buf;
    size_t len;
    size_t pos;
} pc_reader;

static inline pc_writer pc_writer_init(uint8_t *buf, size_t cap) {
    pc_writer w;
    w.buf = buf;
    w.cap = cap;
    w.pos = 0;
    return w;
}

static inline pc_reader pc_reader_init(const uint8_t *buf, size_t len) {
    pc_reader r;
    r.buf = buf;
    r.len = len;
    r.pos = 0;
    return r;
}

/* -- raw bytes ---------------------------------------------------------- */

static inline pc_status pc_write_raw(pc_writer *w, const void *p, size_t n) {
    if (n > w->cap - w->pos) return PC_ERR_OVERFLOW;
    memcpy(w->buf + w->pos, p, n);
    w->pos += n;
    return PC_OK;
}

static inline pc_status pc_read_raw(pc_reader *r, void *p, size_t n) {
    if (n > r->len - r->pos) return PC_ERR_OVERFLOW;
    memcpy(p, r->buf + r->pos, n);
    r->pos += n;
    return PC_OK;
}

/* -- varints ------------------------------------------------------------ */

static inline pc_status pc_write_varint(pc_writer *w, uint64_t v) {
    do {
        uint8_t b = (uint8_t)(v & 0x7f);
        v >>= 7;
        if (v) b |= 0x80;
        if (w->pos >= w->cap) return PC_ERR_OVERFLOW;
        w->buf[w->pos++] = b;
    } while (v);
    return PC_OK;
}

static inline pc_status pc_read_varint(pc_reader *r, uint64_t *out) {
    uint64_t v = 0;
    for (unsigned shift = 0; shift < 70; shift += 7) {
        if (r->pos >= r->len) return PC_ERR_OVERFLOW;
        uint8_t b = r->buf[r->pos++];
        /* the 10th byte may only contribute one bit; anything else means
         * the value exceeds u64 — reject like Rust postcard instead of
         * silently truncating via the << 63 shift */
        if (shift == 63 && (b & 0xfe)) return PC_ERR_MALFORMED;
        v |= (uint64_t)(b & 0x7f) << shift;
        if (!(b & 0x80)) {
            *out = v;
            return PC_OK;
        }
    }
    return PC_ERR_MALFORMED;
}

static inline uint64_t pc_zigzag_enc(int64_t v) {
    return ((uint64_t)v << 1) ^ (uint64_t)(v >> 63);
}

static inline int64_t pc_zigzag_dec(uint64_t v) {
    return (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
}

static inline pc_status pc_write_i64(pc_writer *w, int64_t v) {
    return pc_write_varint(w, pc_zigzag_enc(v));
}

static inline pc_status pc_read_i64(pc_reader *r, int64_t *out) {
    uint64_t raw;
    pc_status s = pc_read_varint(r, &raw);
    if (s == PC_OK) *out = pc_zigzag_dec(raw);
    return s;
}

/* -- fixed-width scalars (postcard: u8/bool/f32/f64 are not varints) ---- */

static inline pc_status pc_write_u8(pc_writer *w, uint8_t v) {
    return pc_write_raw(w, &v, 1);
}

static inline pc_status pc_read_u8(pc_reader *r, uint8_t *out) {
    return pc_read_raw(r, out, 1);
}

static inline pc_status pc_write_bool(pc_writer *w, bool v) {
    return pc_write_u8(w, v ? 1 : 0);
}

static inline pc_status pc_read_bool(pc_reader *r, bool *out) {
    uint8_t b;
    pc_status s = pc_read_u8(r, &b);
    if (s != PC_OK) return s;
    if (b > 1) return PC_ERR_MALFORMED;
    *out = b != 0;
    return PC_OK;
}

static inline pc_status pc_write_f32(pc_writer *w, float v) {
    uint32_t bits;
    memcpy(&bits, &v, 4);
    uint8_t le[4] = {
        (uint8_t)bits, (uint8_t)(bits >> 8), (uint8_t)(bits >> 16),
        (uint8_t)(bits >> 24),
    };
    return pc_write_raw(w, le, 4);
}

static inline pc_status pc_read_f32(pc_reader *r, float *out) {
    uint8_t le[4];
    pc_status s = pc_read_raw(r, le, 4);
    if (s != PC_OK) return s;
    uint32_t bits = (uint32_t)le[0] | ((uint32_t)le[1] << 8) |
                    ((uint32_t)le[2] << 16) | ((uint32_t)le[3] << 24);
    memcpy(out, &bits, 4);
    return PC_OK;
}

static inline pc_status pc_write_f64(pc_writer *w, double v) {
    uint64_t bits;
    memcpy(&bits, &v, 8);
    uint8_t le[8];
    for (int i = 0; i < 8; i++) le[i] = (uint8_t)(bits >> (8 * i));
    return pc_write_raw(w, le, 8);
}

static inline pc_status pc_read_f64(pc_reader *r, double *out) {
    uint8_t le[8];
    pc_status s = pc_read_raw(r, le, 8);
    if (s != PC_OK) return s;
    uint64_t bits = 0;
    for (int i = 0; i < 8; i++) bits |= (uint64_t)le[i] << (8 * i);
    memcpy(out, &bits, 8);
    return PC_OK;
}

/* -- composite prefixes -------------------------------------------------- */

/* string/bytes: varint length then payload */
static inline pc_status pc_write_bytes(pc_writer *w, const void *p, size_t n) {
    pc_status s = pc_write_varint(w, (uint64_t)n);
    return s == PC_OK ? pc_write_raw(w, p, n) : s;
}

static inline pc_status pc_write_string(pc_writer *w, const char *s) {
    return pc_write_bytes(w, s, strlen(s));
}

/* Returns a VIEW into the reader's buffer (zero-copy). */
static inline pc_status pc_read_bytes(pc_reader *r, const uint8_t **p,
                                      size_t *n) {
    uint64_t len;
    pc_status s = pc_read_varint(r, &len);
    if (s != PC_OK) return s;
    /* subtract-form check: `r->pos + len` wraps for wire-controlled huge
     * lengths, bypassing the bound and handing back a ~2^64-byte view */
    if (len > (uint64_t)(r->len - r->pos)) return PC_ERR_OVERFLOW;
    *p = r->buf + r->pos;
    *n = (size_t)len;
    r->pos += len;
    return PC_OK;
}

/* option: 0 = None, 1 = Some(payload follows) */
static inline pc_status pc_write_option_tag(pc_writer *w, bool some) {
    return pc_write_u8(w, some ? 1 : 0);
}

static inline pc_status pc_read_option_tag(pc_reader *r, bool *some) {
    return pc_read_bool(r, some);
}

/* enum discriminant / seq count / map count: plain varints */
static inline pc_status pc_write_discriminant(pc_writer *w, uint32_t d) {
    return pc_write_varint(w, d);
}

static inline pc_status pc_write_seq_len(pc_writer *w, size_t n) {
    return pc_write_varint(w, (uint64_t)n);
}

static inline pc_status pc_read_seq_len(pc_reader *r, size_t *n) {
    uint64_t v;
    pc_status s = pc_read_varint(r, &v);
    if (s == PC_OK) *n = (size_t)v;
    return s;
}

/* -- impeller2 helpers ---------------------------------------------------- */

/* 64-bit FNV-1a of a dotted component name (types.rs:36). */
static inline uint64_t pc_component_id(const char *name) {
    uint64_t h = 0xcbf29ce484222325ull;
    for (const char *p = name; *p; p++) {
        h ^= (uint8_t)*p;
        h *= 0x100000001b3ull;
    }
    return h;
}

/* Derived 2-byte message id: 32-bit FNV-1a XOR-folded to 16 bits,
 * little-endian (const_fnv1a_hash::fnv1a_hash_str_16_xor, used at
 * types.rs:585-597); ids landing in the reserved 224 range are remapped
 * to 223. */
static inline void pc_msg_id(const char *name, uint8_t out[2]) {
    uint32_t h = 0x811c9dc5u;
    for (const char *p = name; *p; p++) {
        h ^= (uint8_t)*p;
        h *= 0x01000193u;
    }
    uint16_t folded = (uint16_t)((h >> 16) ^ (h & 0xffffu));
    out[0] = (uint8_t)folded;
    out[1] = (uint8_t)(folded >> 8);
    if (out[0] == 224) out[0] = 223;
}

#ifdef __cplusplus
}
#endif

#endif /* ELODIN_POSTCARD_H */
