// Fast .srv survey-file column reader.
//
// The reference parses PFLOTRAN ERT survey files with np.genfromtxt
// (Generate_ERT_utils.py:219) — ~100x slower than needed for the
// thousands-of-files ingest that builds the training set. This reader
// mmap-free, single-pass, zero-allocation-per-row parses one whitespace-
// delimited column after skipping a fixed header.
//
// C ABI for ctypes (no pybind11 in this image):
//   srv_read_column(path, skip_header, usecols, out, max_rows) -> n_rows
//     out: caller-allocated double buffer (max_rows)
//     returns -1 on open failure, -2 on truncated/short rows.
//   srv_count_rows(path, skip_header) -> row count (for sizing).
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cctype>

extern "C" {

static inline const char* skip_ws(const char* p) {
    while (*p == ' ' || *p == '\t' || *p == '\r') ++p;
    return p;
}

long srv_count_rows(const char* path, long skip_header) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    long rows = 0, line = 0;
    char buf[1 << 16];
    while (std::fgets(buf, sizeof buf, f)) {
        if (line++ < skip_header) continue;
        const char* p = skip_ws(buf);
        if (*p && *p != '\n') ++rows;
    }
    std::fclose(f);
    return rows;
}

long srv_read_column(const char* path, long skip_header, long usecols,
                     double* out, long max_rows) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    long line = 0, n = 0;
    char buf[1 << 16];
    while (std::fgets(buf, sizeof buf, f)) {
        if (line++ < skip_header) continue;
        const char* p = skip_ws(buf);
        if (!*p || *p == '\n') continue;
        // advance to column `usecols` (0-based)
        for (long c = 0; c < usecols; ++c) {
            while (*p && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r')
                ++p;
            p = skip_ws(p);
            if (!*p || *p == '\n') { std::fclose(f); return -2; }
        }
        char* end = nullptr;
        double v = std::strtod(p, &end);
        if (end == p) { std::fclose(f); return -2; }
        if (n >= max_rows) { std::fclose(f); return -2; }
        out[n++] = v;
    }
    std::fclose(f);
    return n;
}

}  // extern "C"
