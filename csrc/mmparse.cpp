// mmparse — native Matrix Market ingestion.
//
// The performance ingestion path: the C++ counterpart of the
// reference's loader stack (zlib inflate streambuf + POSIX ustar member
// scan + coordinate-entry parser; spmv-cache-trace
// src/util/zlibstream.cpp, src/util/tarstream.cpp,
// src/matrix/matrix-market.cpp:530-861).  Python's parser
// (spmv_tpu.io.matrix_market) is the semantic reference; this library
// accelerates large files and is dispatched to via
// spmv_tpu.io.native when present.
//
// Supports: plain .mtx, gzip (.mtx.gz) and SuiteSparse tarballs
// (.tar.gz with member <stem>/<stem>.mtx), detected by content, not
// extension; coordinate format with real / integer / pattern /
// complex fields (complex keeps the real part, like values_real()).
//
// C ABI for ctypes.  Build: csrc/Makefile -> libmmparse.so (-lz).

#include <zlib.h>

#include <cctype>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Result {
    int64_t rows = 0;
    int64_t cols = 0;
    int64_t nnz = 0;
    int field = 0;     // 0 real, 1 integer, 2 pattern, 3 complex
    int symmetry = 0;  // 0 general, 1 symmetric, 2 skew, 3 hermitian
    std::vector<int32_t> row_idx;  // 1-based
    std::vector<int32_t> col_idx;  // 1-based
    std::vector<double> values;
    std::string error;
};

bool read_file(const char *path, std::vector<uint8_t> &out,
               std::string &err) {
    FILE *f = std::fopen(path, "rb");
    if (!f) {
        err = std::string("cannot open ") + path;
        return false;
    }
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    out.resize(size > 0 ? (size_t)size : 0);
    if (size > 0 && std::fread(out.data(), 1, (size_t)size, f)
                        != (size_t)size) {
        err = std::string("short read on ") + path;
        std::fclose(f);
        return false;
    }
    std::fclose(f);
    return true;
}

bool gunzip(const std::vector<uint8_t> &in, std::vector<uint8_t> &out,
            std::string &err) {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) {
        err = "inflateInit2 failed";
        return false;
    }
    zs.next_in = const_cast<uint8_t *>(in.data());
    zs.avail_in = (uInt)in.size();
    out.clear();
    out.reserve(in.size() * 4);
    std::vector<uint8_t> buf(1 << 20);
    int rc = Z_OK;
    while (rc != Z_STREAM_END) {
        zs.next_out = buf.data();
        zs.avail_out = (uInt)buf.size();
        rc = inflate(&zs, Z_NO_FLUSH);
        if (rc != Z_OK && rc != Z_STREAM_END) {
            err = "gzip inflate error";
            inflateEnd(&zs);
            return false;
        }
        out.insert(out.end(), buf.data(),
                   buf.data() + (buf.size() - zs.avail_out));
        if (rc == Z_OK && zs.avail_in == 0 && zs.avail_out != 0) {
            err = "truncated gzip stream";
            inflateEnd(&zs);
            return false;
        }
    }
    inflateEnd(&zs);
    return true;
}

// Octal or base-256 tar size field (tarstream.cpp:34-53).
int64_t tar_field_size(const uint8_t *p, size_t n) {
    if (p[0] & 0x80) {  // base-256
        int64_t v = p[0] & 0x7f;
        for (size_t i = 1; i < n; ++i) v = (v << 8) | p[i];
        return v;
    }
    int64_t v = 0;
    for (size_t i = 0; i < n && p[i]; ++i) {
        if (p[i] >= '0' && p[i] <= '7') v = v * 8 + (p[i] - '0');
    }
    return v;
}

bool is_tar(const std::vector<uint8_t> &d) {
    return d.size() >= 512 && std::memcmp(d.data() + 257, "ustar", 5) == 0;
}

// Find the first member whose name ends with suffix; returns span.
bool tar_find(const std::vector<uint8_t> &d, const char *suffix,
              size_t &off, size_t &len) {
    size_t pos = 0;
    size_t slen = std::strlen(suffix);
    while (pos + 512 <= d.size()) {
        const uint8_t *hdr = d.data() + pos;
        if (hdr[0] == 0) break;  // end-of-archive zero block
        char name[101];
        std::memcpy(name, hdr, 100);
        name[100] = 0;
        int64_t size = tar_field_size(hdr + 124, 12);
        char typeflag = (char)hdr[156];
        size_t nlen = std::strlen(name);
        if ((typeflag == '0' || typeflag == 0) && nlen >= slen &&
            std::strcmp(name + nlen - slen, suffix) == 0) {
            off = pos + 512;
            len = (size_t)size;
            return off + len <= d.size();
        }
        pos += 512 + ((size + 511) / 512) * 512;
    }
    return false;
}

inline const char *skip_ws(const char *p, const char *end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char *next_line(const char *p, const char *end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

bool parse_text(const char *p, const char *end, Result &r) {
    // Header.
    if (std::strncmp(p, "%%MatrixMarket", 14) != 0) {
        r.error = "invalid Matrix Market header";
        return false;
    }
    char obj[32], fmt[32], fld[32], sym[32];
    {
        const char *eol = p;
        while (eol < end && *eol != '\n') ++eol;
        std::string line(p, eol);
        if (std::sscanf(line.c_str(), "%%%%MatrixMarket %31s %31s %31s %31s",
                        obj, fmt, fld, sym) != 4) {
            r.error = "invalid Matrix Market header";
            return false;
        }
        for (char *s : {obj, fmt, fld, sym})
            for (char *q = s; *q; ++q) *q = (char)std::tolower(*q);
        p = eol < end ? eol + 1 : end;
    }
    if (std::strcmp(fmt, "coordinate") != 0) {
        r.error = "only coordinate format is supported natively";
        return false;
    }
    if (std::strcmp(fld, "real") == 0 || std::strcmp(fld, "double") == 0)
        r.field = 0;
    else if (std::strcmp(fld, "integer") == 0)
        r.field = 1;
    else if (std::strcmp(fld, "pattern") == 0)
        r.field = 2;
    else if (std::strcmp(fld, "complex") == 0)
        r.field = 3;
    else {
        r.error = std::string("unsupported field: ") + fld;
        return false;
    }
    if (std::strcmp(sym, "general") == 0) r.symmetry = 0;
    else if (std::strcmp(sym, "symmetric") == 0) r.symmetry = 1;
    else if (std::strcmp(sym, "skew-symmetric") == 0) r.symmetry = 2;
    else if (std::strcmp(sym, "hermitian") == 0) r.symmetry = 3;
    else {
        r.error = std::string("unsupported symmetry: ") + sym;
        return false;
    }

    // Comments, then size line.
    while (p < end) {
        p = skip_ws(p, end);
        if (p < end && *p == '%') { p = next_line(p, end); continue; }
        if (p < end && *p == '\n') { ++p; continue; }
        break;
    }
    {
        // Size-line overflow discipline mirrors the reference
        // (matrix-market.cpp:449-482): reject out-of-range values
        // instead of silently truncating into int32 index storage.
        char *q;
        errno = 0;
        r.rows = std::strtoll(p, &q, 10);
        r.cols = std::strtoll(q, &q, 10);
        r.nnz = std::strtoll(q, &q, 10);
        if (errno == ERANGE) {
            r.error = "integer overflow in size line";
            return false;
        }
        if (q == p || r.rows < 0 || r.cols < 0 || r.nnz < 0) {
            r.error = "invalid size line";
            return false;
        }
        if (r.rows > INT32_MAX || r.cols > INT32_MAX) {
            r.error = "matrix dimensions exceed the int32 index range";
            return false;
        }
        p = next_line(q, end);
        // an entry line is at least "1 1\n": bail before resize()
        // tries to allocate storage a lying size line asked for
        if (r.nnz > (int64_t)(end - p) / 3 + 1) {
            r.error = "size line claims more entries than the file holds";
            return false;
        }
    }

    r.row_idx.resize(r.nnz);
    r.col_idx.resize(r.nnz);
    r.values.resize(r.nnz);
    char *q = const_cast<char *>(p);
    char *qend = const_cast<char *>(end);
    for (int64_t k = 0; k < r.nnz; ++k) {
        char *next;
        long long i = std::strtoll(q, &next, 10);
        if (next == q) { r.error = "truncated entries"; return false; }
        q = next;
        long long j = std::strtoll(q, &next, 10);
        if (next == q) { r.error = "truncated entries"; return false; }
        q = next;
        double v = 1.0;
        if (r.field == 0 || r.field == 3) {
            v = std::strtod(q, &next);
            if (next == q) { r.error = "truncated entries"; return false; }
            q = next;
            if (r.field == 3) {  // skip imaginary part
                std::strtod(q, &next);
                q = next;
            }
        } else if (r.field == 1) {
            v = (double)std::strtoll(q, &next, 10);
            if (next == q) { r.error = "truncated entries"; return false; }
            q = next;
        }
        if (i < 1 || i > r.rows || j < 1 || j > r.cols) {
            r.error = "matrix entry index out of bounds";
            return false;
        }
        r.row_idx[k] = (int32_t)i;
        r.col_idx[k] = (int32_t)j;
        r.values[k] = v;
        (void)qend;
    }
    return true;
}

}  // namespace

extern "C" {

void *mmparse_parse_file(const char *path, char *errbuf, int errlen) {
    auto *r = new Result();
    std::vector<uint8_t> raw;
    if (!read_file(path, raw, r->error)) goto fail;

    {
        std::vector<uint8_t> text;
        const std::vector<uint8_t> *data = &raw;
        std::vector<uint8_t> inflated;
        if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
            if (!gunzip(raw, inflated, r->error)) goto fail;
            data = &inflated;
        }
        size_t off = 0, len = data->size();
        if (is_tar(*data)) {
            if (!tar_find(*data, ".mtx", off, len)) {
                r->error = "no .mtx member in tar archive";
                goto fail;
            }
        }
        const char *p = (const char *)data->data() + off;
        if (!parse_text(p, p + len, *r)) goto fail;
    }
    return r;

fail:
    if (errbuf && errlen > 0) {
        std::snprintf(errbuf, (size_t)errlen, "%s", r->error.c_str());
    }
    delete r;
    return nullptr;
}

int64_t mmparse_rows(void *h) { return ((Result *)h)->rows; }
int64_t mmparse_cols(void *h) { return ((Result *)h)->cols; }
int64_t mmparse_nnz(void *h) { return ((Result *)h)->nnz; }
int mmparse_field(void *h) { return ((Result *)h)->field; }
int mmparse_symmetry(void *h) { return ((Result *)h)->symmetry; }

void mmparse_copy(void *h, int32_t *rows, int32_t *cols, double *vals) {
    Result *r = (Result *)h;
    std::memcpy(rows, r->row_idx.data(), r->nnz * sizeof(int32_t));
    std::memcpy(cols, r->col_idx.data(), r->nnz * sizeof(int32_t));
    std::memcpy(vals, r->values.data(), r->nnz * sizeof(double));
}

void mmparse_free(void *h) { delete (Result *)h; }

}  // extern "C"
