/* impeller.c — native hot paths for the elodin-tpu telemetry plane.
 *
 * Parity target: the reference's native storage engine (libs/db, Rust:
 * append-only per-component time-series files with sparse preallocation and
 * zero-copy mmap views, src/lib.rs:240+) and the postcard/vtable codec hot
 * paths.  Exposed as a plain C ABI consumed from Python via ctypes
 * (elodin_tpu/native.py) and usable directly from C/C++ flight software.
 *
 * Build: cc -O2 -shared -fPIC -o libimpeller.so impeller.c
 */

#define _GNU_SOURCE /* mremap */
#include <fcntl.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

/* ------------------------------------------------------------------ hash */

uint64_t impeller_component_id(const char* name, size_t len) {
    uint64_t h = 0xcbf29ce484222325ull;
    for (size_t i = 0; i < len; i++) {
        h ^= (unsigned char)name[i];
        h *= 0x100000001b3ull;
    }
    return h;
}

uint16_t impeller_msg_id16(const char* name, size_t len) {
    uint32_t h = 0x811c9dc5u;
    for (size_t i = 0; i < len; i++) {
        h ^= (unsigned char)name[i];
        h *= 0x01000193u;
    }
    uint16_t folded = (uint16_t)((h >> 16) ^ (h & 0xffff));
    /* reserved [224,*] well-known range remaps to 223 — every sibling
     * implementation (db/postcard.py msg_id, postcard.h pc_msg_id,
     * elodin_db.hpp msg_id; reference types.rs:590-597) applies this, so
     * omitting it here made C consumers disagree for ~1/256 of names */
    if ((folded & 0xff) == 224) folded = (uint16_t)((folded & 0xff00) | 223);
    return folded;
}

/* -------------------------------------------------------- mmap appender */

typedef struct {
    int fd;
    uint8_t* map;
    uint64_t capacity; /* mapped bytes */
    uint64_t len;      /* committed bytes (stored in header) */
} AppendLog;

#define LOG_HEADER 16 /* [0..8) magic+version, [8..16) committed length */
#define LOG_MAGIC 0x454c4f4442313000ull /* "ELODB10\0" */

typedef struct {
    AppendLog ts;   /* i64 timestamps */
    AppendLog data; /* raw rows */
    uint64_t row_nbytes;
} Store;

static void log_close_partial(AppendLog* log);

static int log_open(AppendLog* log, const char* path, uint64_t initial_cap) {
    log->map = NULL;
    log->fd = open(path, O_RDWR | O_CREAT, 0644);
    if (log->fd < 0) return -1;
    struct stat st;
    if (fstat(log->fd, &st) != 0) { log_close_partial(log); return -1; }
    uint64_t cap = (uint64_t)st.st_size;
    int fresh = cap < LOG_HEADER;
    if (cap < initial_cap) {
        cap = initial_cap;
        /* sparse preallocation: ftruncate extends without allocating disk */
        if (ftruncate(log->fd, (off_t)cap) != 0) {
            log_close_partial(log);
            return -1;
        }
    }
    log->map = mmap(NULL, cap, PROT_READ | PROT_WRITE, MAP_SHARED, log->fd, 0);
    if (log->map == MAP_FAILED) { log_close_partial(log); return -1; }
    log->capacity = cap;
    if (fresh) {
        ((uint64_t*)log->map)[0] = LOG_MAGIC;
        ((uint64_t*)log->map)[1] = 0;
    } else if (((uint64_t*)log->map)[0] != LOG_MAGIC) {
        log_close_partial(log);
        return -2;
    }
    log->len = ((uint64_t*)log->map)[1];
    /* a corrupt/truncated committed-length header must not drive readers
       past the mapping — clamp to what the file can actually hold */
    if (log->len > cap - LOG_HEADER) {
        log->len = cap - LOG_HEADER;
        ((uint64_t*)log->map)[1] = log->len;
    }
    return 0;
}

static void log_close_partial(AppendLog* log) {
    if (log->map && log->map != MAP_FAILED) munmap(log->map, log->capacity);
    if (log->fd >= 0) close(log->fd);
    log->map = NULL;
    log->fd = -1;
}

static int log_reserve(AppendLog* log, uint64_t extra) {
    uint64_t need = LOG_HEADER + log->len + extra;
    if (need <= log->capacity) return 0;
    uint64_t new_cap = log->capacity * 2;
    while (new_cap < need) new_cap *= 2;
    if (ftruncate(log->fd, (off_t)new_cap) != 0) return -1;
    uint8_t* m = mremap(log->map, log->capacity, new_cap, MREMAP_MAYMOVE);
    if (m == MAP_FAILED) return -1;
    log->map = m;
    log->capacity = new_cap;
    return 0;
}

static void log_append(AppendLog* log, const void* src, uint64_t n) {
    memcpy(log->map + LOG_HEADER + log->len, src, n);
    log->len += n;
    /* commit: ordered against the memcpy for PROCESS crashes (same
       mapping, kernel writes back whole pages); for POWER loss the kernel
       may flush the header page first — durability of committed rows
       requires store_flush (msync), which the DB calls on flush/close.
       The open-time clamps above reconcile whatever survives. */
    ((uint64_t*)log->map)[1] = log->len;
}

Store* store_open(const char* ts_path, const char* data_path,
                  uint64_t row_nbytes, uint64_t initial_cap) {
    Store* s = calloc(1, sizeof(Store));
    if (!s) return NULL;
    s->row_nbytes = row_nbytes;
    if (initial_cap < 1 << 16) initial_cap = 1 << 16;
    if (log_open(&s->ts, ts_path, initial_cap) != 0) {
        free(s);
        return NULL;
    }
    if (log_open(&s->data, data_path, initial_cap) != 0) {
        log_close_partial(&s->ts);  /* don't leak the first log's fd+map */
        free(s);
        return NULL;
    }
    /* torn-tail repair: a crash between the ts-log commit and the data-log
       commit (store_append commits them separately) leaves the two logs
       disagreeing on the row count — clamp both to the complete rows so
       readers never see uncommitted bytes and later appends stay aligned */
    {
        uint64_t rows = s->ts.len / 8;
        uint64_t drows = row_nbytes ? s->data.len / row_nbytes : 0;
        if (drows < rows) rows = drows;
        s->ts.len = rows * 8;
        s->data.len = rows * row_nbytes;
        ((uint64_t*)s->ts.map)[1] = s->ts.len;
        ((uint64_t*)s->data.map)[1] = s->data.len;
    }
    return s;
}

int store_append(Store* s, const int64_t* timestamps, const uint8_t* rows,
                 uint64_t n_rows) {
    if (log_reserve(&s->ts, n_rows * 8) != 0) return -1;
    if (log_reserve(&s->data, n_rows * s->row_nbytes) != 0) return -1;
    log_append(&s->ts, timestamps, n_rows * 8);
    log_append(&s->data, rows, n_rows * s->row_nbytes);
    return 0;
}

uint64_t store_len(const Store* s) { return s->ts.len / 8; }

/* zero-copy views into the mapped region (valid until next append) */
const int64_t* store_timestamps(const Store* s) {
    return (const int64_t*)(s->ts.map + LOG_HEADER);
}
const uint8_t* store_data(const Store* s) {
    return s->data.map + LOG_HEADER;
}

int store_flush(Store* s) {
    if (msync(s->ts.map, LOG_HEADER + s->ts.len, MS_SYNC) != 0) return -1;
    if (msync(s->data.map, LOG_HEADER + s->data.len, MS_SYNC) != 0) return -1;
    return 0;
}

void store_close(Store* s) {
    if (!s) return;
    store_flush(s);
    /* shrink the sparse file to its committed size (the reference's
     * `compact`, libs/db cli) */
    ftruncate(s->ts.fd, (off_t)(LOG_HEADER + s->ts.len));
    ftruncate(s->data.fd, (off_t)(LOG_HEADER + s->data.len));
    munmap(s->ts.map, s->ts.capacity);
    munmap(s->data.map, s->data.capacity);
    close(s->ts.fd);
    close(s->data.fd);
    free(s);
}

/* ------------------------------------------------------ row pack helper */

/* Pack one table row: shared i64 timestamp at offset 0, then each field's
 * bytes at its precomputed offset.  `offsets`/`nbytes` are per-field;
 * `srcs` points at per-field little-endian source buffers. */
void impeller_pack_row(uint8_t* row, uint64_t row_nbytes, int64_t timestamp,
                       const uint8_t** srcs, const uint64_t* offsets,
                       const uint64_t* nbytes, uint64_t n_fields) {
    memset(row, 0, row_nbytes);
    memcpy(row, &timestamp, 8);
    for (uint64_t i = 0; i < n_fields; i++) {
        memcpy(row + offsets[i], srcs[i], nbytes[i]);
    }
}

/* binary search over the timestamp column: first index with ts >= key */
uint64_t store_lower_bound(const Store* s, int64_t key) {
    const int64_t* ts = store_timestamps(s);
    uint64_t lo = 0, hi = store_len(s);
    while (lo < hi) {
        uint64_t mid = lo + (hi - lo) / 2;
        if (ts[mid] < key)
            lo = mid + 1;
        else
            hi = mid;
    }
    return lo;
}
