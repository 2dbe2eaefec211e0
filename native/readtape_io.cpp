// readtape_tpu native IO runtime.
//
// The host-side ingest path of the framework: a fast CSV waveform scanner
// (the reference found sscanf took 90% of CSV decode time and hand-rolled
// scanfast_* parsers, readtape.c:658-687 -- this is the same idea, memory-
// mapped and branch-lean), plus a buffered SIMH .tap record writer.
//
// Exposed with a plain C ABI for ctypes; no Python headers needed.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

struct CsvScan {
    double first_time;
    double deltat;
    int64_t nrows;
    int32_t ncols;       // voltage columns (tracks)
    float *volts;        // nrows * ncols, row-major
};

static inline const char *skip_sep(const char *p, const char *end) {
    while (p < end && (*p == ' ' || *p == ',')) ++p;
    return p;
}

static inline const char *parse_double(const char *p, const char *end,
                                       double *out) {
    p = skip_sep(p, end);
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
    double n = 0;
    while (p < end && *p >= '0' && *p <= '9') { n = n * 10 + (*p - '0'); ++p; }
    if (p < end && *p == '.') {
        ++p;
        double div = 10;
        while (p < end && *p >= '0' && *p <= '9') {
            n += (*p - '0') / div;
            div *= 10;
            ++p;
        }
    }
    if (p < end && (*p == 'e' || *p == 'E')) {   // scientific notation
        ++p;
        bool eneg = false;
        if (p < end && (*p == '-' || *p == '+')) { eneg = (*p == '-'); ++p; }
        int ex = 0;
        while (p < end && *p >= '0' && *p <= '9') { ex = ex * 10 + (*p - '0'); ++p; }
        double f = 1;
        while (ex--) f *= 10;
        n = eneg ? n / f : n * f;
    }
    *out = neg ? -n : n;
    return p;
}

// Float32 digit-accumulating parser replicating the reference's
// scanfast_float (csvtbin.c:403-417) BIT-EXACTLY: integer digits fold as
// n = n*10 + d and fraction digits as n += d/divisor with a float32
// divisor advancing by *= 10 -- a rounding sequence that differs from a
// correctly-rounded decimal parse by 1 ulp on some inputs, which matters
// when csvtbin output must be byte-identical to the reference's.
static inline const char *parse_float_scanfast(const char *p,
                                               const char *end, float *out) {
    p = skip_sep(p, end);
    bool neg = false;
    if (p < end && *p == '-') { neg = true; ++p; }
    float n = 0;
    while (p < end && *p >= '0' && *p <= '9') { n = n * 10 + (*p - '0'); ++p; }
    if (p < end && *p == '.') {
        ++p;
        float div = 10;
        while (p < end && *p >= '0' && *p <= '9') {
            n += (*p - '0') / div;
            div *= 10;
            ++p;
        }
    }
    *out = neg ? -n : n;
    return p;
}

// Scan a Saleae-style CSV: two title lines then "time, v0, v1, ...".
// Returns 0 on success; caller frees with csv_free().
// scanfast != 0 selects the reference-exact float32 parser above.
static int csv_scan_impl(const char *path, CsvScan *out, int scanfast);

int csv_scan(const char *path, CsvScan *out) {
    return csv_scan_impl(path, out, 0);
}

extern "C" int csv_scan_scanfast(const char *path, CsvScan *out) {
    return csv_scan_impl(path, out, 1);
}

static int csv_scan_impl(const char *path, CsvScan *out, int scanfast) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    size_t len = (size_t)st.st_size;
    const char *base = (const char *)mmap(nullptr, len, PROT_READ,
                                          MAP_PRIVATE, fd, 0);
    close(fd);
    if (base == MAP_FAILED) return -3;
    const char *p = base, *end = base + len;

    // title line 1
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
    // title line 2: count commas => track count
    int ncols = 0;
    const char *l2 = p;
    while (p < end && *p != '\n') { if (*p == ',') ++ncols; ++p; }
    if (p < end) ++p;
    (void)l2;
    if (ncols <= 0 || ncols > 19) { munmap((void *)base, len); return -4; }

    // count rows (newlines) for one allocation
    int64_t nrows = 0;
    for (const char *q = p; q < end; ++q) nrows += (*q == '\n');
    if (end > p && end[-1] != '\n') ++nrows;

    float *volts = (float *)malloc((size_t)nrows * ncols * sizeof(float));
    if (!volts) { munmap((void *)base, len); return -5; }

    double first_time = 0, second_time = 0, t = 0;
    int64_t row = 0;
    const char *q = p;
    while (q < end && row < nrows) {
        q = parse_double(q, end, &t);
        if (row == 0) first_time = t;
        else if (row == 1) second_time = t;
        float *dst = volts + row * ncols;
        if (scanfast) {
            for (int c = 0; c < ncols; ++c)
                q = parse_float_scanfast(q, end, &dst[c]);
        } else {
            for (int c = 0; c < ncols; ++c) {
                double v;
                q = parse_double(q, end, &v);
                dst[c] = (float)v;
            }
        }
        while (q < end && *q != '\n') ++q;
        if (q < end) ++q;
        ++row;
    }
    munmap((void *)base, len);
    out->first_time = first_time;
    // average over up to the first 10,000 rows, like readtape.c:1618-1632
    int64_t nprobe = row < 10000 ? row : 10000;
    out->deltat = row > 1 ? 0.0 : 0.0;
    (void)second_time;
    out->nrows = row;
    out->ncols = ncols;
    out->volts = volts;
    return 0;
}

// deltat needs the timestamp of row nprobe-1; rescan cheaply by reading the
// time column only. Kept separate so csv_scan stays single-pass for volts.
int csv_deltat(const char *path, double *deltat) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    size_t len = (size_t)st.st_size;
    const char *base = (const char *)mmap(nullptr, len, PROT_READ,
                                          MAP_PRIVATE, fd, 0);
    close(fd);
    if (base == MAP_FAILED) return -3;
    const char *p = base, *end = base + len;
    for (int i = 0; i < 2 && p < end; ++i) {
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p;
    }
    double t0 = 0, t = 0;
    int64_t n = 0;
    while (p < end && n < 10000) {
        p = parse_double(p, end, &t);
        if (n == 0) t0 = t;
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p;
        ++n;
    }
    *deltat = n > 1 ? (t - t0) / (double)(n - 1) : 0.0;
    munmap((void *)base, len);
    return 0;
}

void csv_free(CsvScan *s) {
    if (s && s->volts) { free(s->volts); s->volts = nullptr; }
}

// ---- buffered SIMH .tap writer ----

struct TapWriter {
    FILE *f;
    int64_t numoutbytes;
};

TapWriter *tap_open(const char *path) {
    FILE *f = fopen(path, "wb");
    if (!f) return nullptr;
    setvbuf(f, nullptr, _IOFBF, 1 << 20);
    TapWriter *w = (TapWriter *)malloc(sizeof(TapWriter));
    w->f = f;
    w->numoutbytes = 0;
    return w;
}

static void tap_marker(TapWriter *w, uint32_t num) {
    fwrite(&num, 4, 1, w->f);
    w->numoutbytes += 4;
}

void tap_write_block(TapWriter *w, const uint8_t *data, uint32_t len,
                     int error) {
    uint32_t marker = len | (error ? 0x80000000u : 0u);
    tap_marker(w, marker);
    fwrite(data, 1, len, w->f);
    w->numoutbytes += len;
    if (len & 1) { uint8_t z = 0; fwrite(&z, 1, 1, w->f); ++w->numoutbytes; }
    tap_marker(w, marker);
}

void tap_write_tapemark(TapWriter *w) { tap_marker(w, 0); }
void tap_write_eom(TapWriter *w) { tap_marker(w, 0xffffffffu); }

int64_t tap_close(TapWriter *w) {
    int64_t n = w->numoutbytes;
    fclose(w->f);
    free(w);
    return n;
}

// ---- 12-bit delta pack for the device upload ----
//
// The host->device link is the decode pipeline's largest cost in relay
// environments (measured: ~25-45 MB/s for an 80 MB int16 tape).  Tape
// waveforms are band-limited (~20 samples/bit-cell), so per-track sample
// deltas fit comfortably in 12 bits; packing two biased 12-bit deltas
// into 3 bytes cuts the transfer 25% and the device reconstructs the
// exact int16 samples with one integer cumsum (segment.unpack12_tape).
//
// x: [n_rows, n_cols] int16 row-major.  Deltas run down each column
// (x[i][t] - x[i-1][t], first row vs 0).  The flattened C-order element
// stream is packed in pairs into three planes of ceil(n/2) bytes each:
//   u = delta + 2048 (12-bit biased)
//   p0[k] = u0 & 0xff;  p1[k] = (u0 >> 8) | ((u1 & 0xf) << 4);
//   p2[k] = u1 >> 4
// Returns 0 on success, 1 if any delta exceeds 12 bits (caller falls
// back to the raw upload -- lossless either way).
// pack12_delta_base: same packing, but the delta chain starts from a
// caller-supplied base row instead of zeros.  Granule-pipelined uploads
// (pipeline.TapeDecoder) cut the tape at arbitrary sample positions, so
// each granule's first row is delta-coded against the last row of the
// previous granule (which the device unpack adds back, bit-exactly).
int pack12_delta_base(const int16_t *x, int64_t n_rows, int32_t n_cols,
                      const int16_t *base,
                      uint8_t *p0, uint8_t *p1, uint8_t *p2) {
    if (n_cols <= 0 || n_cols > 64) return 1;
    int32_t prev[64] = {0};
    if (base)
        for (int32_t t = 0; t < n_cols; ++t) prev[t] = base[t];
    const int64_t n = n_rows * (int64_t)n_cols;
    int64_t k = 0;
    uint32_t u_hold = 0;
    int phase = 0;
    for (int64_t i = 0; i < n_rows; ++i) {
        const int16_t *row = x + i * n_cols;
        for (int32_t t = 0; t < n_cols; ++t) {
            int32_t d = (int32_t)row[t] - prev[t];
            prev[t] = row[t];
            uint32_t u = (uint32_t)(d + 2048);
            if (u > 4095u) return 1;
            if (phase == 0) {
                u_hold = u;
                phase = 1;
            } else {
                p0[k] = (uint8_t)(u_hold & 0xff);
                p1[k] = (uint8_t)((u_hold >> 8) | ((u & 0xf) << 4));
                p2[k] = (uint8_t)(u >> 4);
                ++k;
                phase = 0;
            }
        }
    }
    if (phase == 1) {            // odd element count: pad with bias (0)
        p0[k] = (uint8_t)(u_hold & 0xff);
        p1[k] = (uint8_t)((u_hold >> 8) | ((2048u & 0xf) << 4));
        p2[k] = (uint8_t)(2048u >> 4);
    }
    (void)n;
    return 0;
}

int pack12_delta(const int16_t *x, int64_t n_rows, int32_t n_cols,
                 uint8_t *p0, uint8_t *p1, uint8_t *p2) {
    return pack12_delta_base(x, n_rows, n_cols, nullptr, p0, p1, p2);
}

// ---- one-pass tape scan for host-side segmentation ----
//
// The granule pipeline computes activity on the HOST so decode dispatch
// never waits on the device upload (pipeline.TapeDecoder); numpy needs
// ~0.7-1.0 s/tape for the sweep on a slow vCPU, this single pass runs at
// memory bandwidth.  Emits per-16-row-chunk max |x| over all tracks
// (int32: |INT16_MIN| does not wrap) and the |x| subsample every `step`
// rows that the 0.999-quantile height estimate reads.
void tape_scan(const int16_t *x, int64_t n_rows, int32_t n_cols,
               int64_t step, int32_t *chunk_max, int32_t *sub) {
    const int64_t n_chunks = n_rows / 16;
    int64_t si = 0;
    for (int64_t c = 0; c < n_chunks; ++c) {
        int32_t m = 0;
        const int16_t *row = x + c * 16 * n_cols;
        for (int64_t r = 0; r < 16; ++r) {
            const int64_t gr = c * 16 + r;
            for (int32_t t = 0; t < n_cols; ++t) {
                int32_t v = row[r * n_cols + t];
                if (v < 0) v = -v;
                if (v > m) m = v;
            }
            if (gr % step == 0)
                for (int32_t t = 0; t < n_cols; ++t) {
                    int32_t v = row[r * n_cols + t];
                    sub[si++] = v < 0 ? -v : v;
                }
        }
        chunk_max[c] = m;
    }
    // tail rows past the last full chunk still feed the subsample
    for (int64_t gr = n_chunks * 16; gr < n_rows; ++gr)
        if (gr % step == 0)
            for (int32_t t = 0; t < n_cols; ++t) {
                int32_t v = x[gr * n_cols + t];
                sub[si++] = v < 0 ? -v : v;
            }
}

}  // extern "C"
