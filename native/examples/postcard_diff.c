/* Differential test driver for postcard.h against the Python codec.
 *
 * Modes:
 *   encode        — encode a fixed battery of values, print hex on stdout
 *   decode <hex>  — decode the battery from hex, print parsed fields
 *   ids           — print component-id / msg-id derivations
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "postcard.h"

#define CHECK(expr)                                                   \
    do {                                                              \
        if ((expr) != PC_OK) {                                        \
            fprintf(stderr, "postcard error at %s\n", #expr);         \
            return 1;                                                 \
        }                                                             \
    } while (0)

static int encode(void) {
    uint8_t buf[512];
    pc_writer w = pc_writer_init(buf, sizeof buf);
    CHECK(pc_write_varint(&w, 0));
    CHECK(pc_write_varint(&w, 127));
    CHECK(pc_write_varint(&w, 128));
    CHECK(pc_write_varint(&w, 300));
    CHECK(pc_write_varint(&w, 1ull << 40));
    CHECK(pc_write_i64(&w, 0));
    CHECK(pc_write_i64(&w, -1));
    CHECK(pc_write_i64(&w, 1));
    CHECK(pc_write_i64(&w, -(1ll << 40)));
    CHECK(pc_write_string(&w, "h\xc3\xa9llo"));
    const uint8_t blob[2] = {0x00, 0x01};
    CHECK(pc_write_bytes(&w, blob, 2));
    CHECK(pc_write_option_tag(&w, false));
    CHECK(pc_write_option_tag(&w, true));
    CHECK(pc_write_varint(&w, 5));
    CHECK(pc_write_bool(&w, true));
    CHECK(pc_write_u8(&w, 200));
    CHECK(pc_write_f32(&w, 1.5f));
    CHECK(pc_write_f64(&w, -2.25));
    CHECK(pc_write_discriminant(&w, 2));
    CHECK(pc_write_seq_len(&w, 3));
    for (size_t i = 0; i < w.pos; i++) printf("%02x", w.buf[i]);
    printf("\n");
    return 0;
}

static int decode(const char *hex) {
    size_t n = strlen(hex) / 2;
    uint8_t *buf = malloc(n);
    for (size_t i = 0; i < n; i++) {
        unsigned v;
        sscanf(hex + 2 * i, "%2x", &v);
        buf[i] = (uint8_t)v;
    }
    pc_reader r = pc_reader_init(buf, n);
    uint64_t u;
    for (int i = 0; i < 5; i++) {
        CHECK(pc_read_varint(&r, &u));
        printf("u %llu\n", (unsigned long long)u);
    }
    int64_t s;
    for (int i = 0; i < 4; i++) {
        CHECK(pc_read_i64(&r, &s));
        printf("i %lld\n", (long long)s);
    }
    const uint8_t *p;
    size_t len;
    CHECK(pc_read_bytes(&r, &p, &len));
    printf("s %.*s\n", (int)len, p);
    CHECK(pc_read_bytes(&r, &p, &len));
    printf("b %zu\n", len);
    bool some;
    CHECK(pc_read_option_tag(&r, &some));
    printf("opt %d\n", some);
    CHECK(pc_read_option_tag(&r, &some));
    CHECK(pc_read_varint(&r, &u));
    printf("opt %d %llu\n", some, (unsigned long long)u);
    bool flag;
    CHECK(pc_read_bool(&r, &flag));
    uint8_t byte;
    CHECK(pc_read_u8(&r, &byte));
    float f;
    double d;
    CHECK(pc_read_f32(&r, &f));
    CHECK(pc_read_f64(&r, &d));
    printf("scalars %d %u %.2f %.2f\n", flag, byte, f, d);
    CHECK(pc_read_varint(&r, &u));
    uint64_t count;
    CHECK(pc_read_varint(&r, &count));
    printf("enum %llu seq %llu\n", (unsigned long long)u,
           (unsigned long long)count);
    printf("consumed %zu of %zu\n", r.pos, r.len);
    free(buf);
    return 0;
}

static int ids(void) {
    printf("cid %016llx\n",
           (unsigned long long)pc_component_id("rocket.world_pos"));
    uint8_t id[2];
    pc_msg_id("my_msg", id);
    printf("mid %02x%02x\n", id[0], id[1]);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 2 && strcmp(argv[1], "encode") == 0) return encode();
    if (argc >= 3 && strcmp(argv[1], "decode") == 0) return decode(argv[2]);
    if (argc >= 2 && strcmp(argv[1], "ids") == 0) return ids();
    fprintf(stderr, "usage: postcard_diff encode|decode <hex>|ids\n");
    return 2;
}
