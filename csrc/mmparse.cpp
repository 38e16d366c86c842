// mmparse — native Matrix Market ingestion, streaming.
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
// Like the reference's zlibstream (128 KiB underflow buffers,
// zlibstream.cpp:45-136), decompression is STREAMING: the file is read
// and inflated in fixed-size chunks through a pull pipeline
//   file -> [inflate] -> [tar member framing] -> line-carry parser
// so peak memory is the output arrays plus fixed buffers — the
// inflated text (3-4x the binary size) never exists in RAM at once.
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

constexpr size_t CHUNK = 256 * 1024;

struct Result {
    int64_t rows = 0;
    int64_t cols = 0;
    int64_t nnz = 0;
    int field = 0;     // 0 real, 1 integer, 2 pattern, 3 complex
    int symmetry = 0;  // 0 general, 1 symmetric, 2 skew, 3 hermitian
    std::vector<int32_t> row_idx;  // 1-based
    std::vector<int32_t> col_idx;  // 1-based
    std::vector<double> values;
    std::vector<double> values_imag;  // complex field only
    std::string error;
};

// ---- pull pipeline ---------------------------------------------------

// Raw file chunks.
struct FileSource {
    FILE *f = nullptr;
    bool eof = false;
    std::string err;

    bool open(const char *path) {
        f = std::fopen(path, "rb");
        if (!f) err = std::string("cannot open ") + path;
        return f != nullptr;
    }
    ~FileSource() {
        if (f) std::fclose(f);
    }
    // Returns bytes read; 0 at EOF.
    size_t pull(uint8_t *out, size_t n) {
        if (eof) return 0;
        size_t got = std::fread(out, 1, n, f);
        if (got < n) eof = true;
        return got;
    }
};

// Optional gzip layer: inflates the file chunkwise on demand.
struct InflateSource {
    FileSource *src = nullptr;
    bool gz = false;
    bool done = false;
    z_stream zs;
    std::vector<uint8_t> inbuf;
    std::string err;

    // Peeks the first bytes to detect gzip; always usable afterwards.
    bool init(FileSource *s) {
        src = s;
        inbuf.resize(CHUNK);
        size_t got = src->pull(inbuf.data(), 2);
        gz = (got == 2 && inbuf[0] == 0x1f && inbuf[1] == 0x8b);
        if (gz) {
            std::memset(&zs, 0, sizeof(zs));
            if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) {
                err = "inflateInit2 failed";
                return false;
            }
            zs.next_in = inbuf.data();
            zs.avail_in = (uInt)got;
        } else {
            carry.assign(inbuf.begin(), inbuf.begin() + got);
        }
        return true;
    }
    ~InflateSource() {
        if (gz) inflateEnd(&zs);
    }
    std::vector<uint8_t> carry;  // plain-file peeked bytes

    size_t pull(uint8_t *out, size_t n) {
        if (!gz) {
            size_t o = 0;
            if (!carry.empty()) {
                o = carry.size() < n ? carry.size() : n;
                std::memcpy(out, carry.data(), o);
                carry.erase(carry.begin(), carry.begin() + o);
            }
            if (o < n) o += src->pull(out + o, n - o);
            return o;
        }
        if (done) return 0;
        zs.next_out = out;
        zs.avail_out = (uInt)n;
        while (zs.avail_out > 0) {
            if (zs.avail_in == 0 && !src->eof) {
                size_t got = src->pull(inbuf.data(), inbuf.size());
                zs.next_in = inbuf.data();
                zs.avail_in = (uInt)got;
            }
            int rc = inflate(&zs, Z_NO_FLUSH);
            if (rc == Z_STREAM_END) {
                done = true;
                break;
            }
            if (rc != Z_OK) {
                err = "gzip inflate error";
                return 0;
            }
            if (zs.avail_in == 0 && src->eof && zs.avail_out > 0) {
                err = "truncated gzip stream";
                return 0;
            }
        }
        return n - zs.avail_out;
    }
};

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

// Optional tar layer: streams 512-byte headers, skips non-matching
// members, then frames the matching member's bytes.
struct MemberSource {
    InflateSource *src = nullptr;
    bool tar = false;
    int64_t remaining = -1;       // member bytes left (tar mode)
    std::vector<uint8_t> carry;   // peeked bytes when not a tar
    std::string err;

    bool pull_exact(uint8_t *out, size_t n) {
        size_t got = 0;
        while (got < n) {
            size_t r = src->pull(out + got, n - got);
            if (r == 0) return false;
            got += r;
        }
        return true;
    }

    bool skip(int64_t n) {
        uint8_t buf[4096];
        while (n > 0) {
            size_t want = n < (int64_t)sizeof(buf) ? (size_t)n
                                                   : sizeof(buf);
            size_t r = src->pull(buf, want);
            if (r == 0) return false;
            n -= (int64_t)r;
        }
        return true;
    }

    bool init(InflateSource *s, const char *suffix) {
        src = s;
        uint8_t hdr[512];
        size_t got = 0;
        while (got < 512) {
            size_t r = src->pull(hdr + got, 512 - got);
            if (r == 0) break;
            got += r;
        }
        if (got < 512 || std::memcmp(hdr + 257, "ustar", 5) != 0) {
            carry.assign(hdr, hdr + got);
            return true;  // not a tar: pass bytes through
        }
        tar = true;
        size_t slen = std::strlen(suffix);
        while (true) {
            if (hdr[0] == 0) break;  // end-of-archive zero block
            char name[101];
            std::memcpy(name, hdr, 100);
            name[100] = 0;
            int64_t size = tar_field_size(hdr + 124, 12);
            char typeflag = (char)hdr[156];
            size_t nlen = std::strlen(name);
            if ((typeflag == '0' || typeflag == 0) && nlen >= slen &&
                std::strcmp(name + nlen - slen, suffix) == 0) {
                remaining = size;
                return true;
            }
            int64_t padded = ((size + 511) / 512) * 512;
            if (!skip(padded)) break;
            if (!pull_exact(hdr, 512)) break;
        }
        err = "no .mtx member in tar archive";
        return false;
    }

    size_t pull(uint8_t *out, size_t n) {
        if (!tar) {
            size_t o = 0;
            if (!carry.empty()) {
                o = carry.size() < n ? carry.size() : n;
                std::memcpy(out, carry.data(), o);
                carry.erase(carry.begin(), carry.begin() + o);
            }
            if (o < n) o += src->pull(out + o, n - o);
            return o;
        }
        if (remaining <= 0) return 0;
        size_t want = (int64_t)n < remaining ? n : (size_t)remaining;
        size_t got = src->pull(out, want);
        remaining -= (int64_t)got;
        return got;
    }
};

// ---- incremental text parsing ---------------------------------------

inline const char *skip_ws(const char *p, const char *end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char *next_line(const char *p, const char *end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

// Streaming parser state: a buffer holding the unconsumed tail; the
// parse functions only consume COMPLETE lines (the last partial line
// carries over to the next refill), so tokens never straddle chunks.
struct LineBuffer {
    MemberSource *src;
    std::vector<char> buf;
    size_t fill = 0;
    bool eof = false;

    explicit LineBuffer(MemberSource *s) : src(s) {
        buf.resize(CHUNK + 1);
    }
    // Appends more bytes; true if anything was added.
    bool refill() {
        if (eof) return false;
        if (fill + CHUNK + 1 > buf.size()) buf.resize(fill + CHUNK + 1);
        size_t got = src->pull((uint8_t *)buf.data() + fill, CHUNK);
        fill += got;
        if (got == 0) eof = true;
        return got > 0;
    }
    void consume(size_t n) {
        std::memmove(buf.data(), buf.data() + n, fill - n);
        fill -= n;
    }
    // Span of complete lines currently buffered ([data, data+usable));
    // at EOF the whole remainder is usable.
    size_t usable() const {
        if (eof) return fill;
        for (size_t i = fill; i > 0; --i)
            if (buf[i - 1] == '\n') return i;
        return 0;
    }
};

bool parse_header(LineBuffer &lb, Result &r) {
    // Header + comments + size line always fit one chunk in practice;
    // refill until the size line is complete.
    while (true) {
        size_t n = lb.usable();
        const char *p = lb.buf.data();
        const char *end = p + n;
        if (n == 0) {
            if (!lb.refill()) {
                r.error = "invalid Matrix Market header";
                return false;
            }
            continue;
        }
        if (std::strncmp(p, "%%MatrixMarket", 14) != 0) {
            r.error = "invalid Matrix Market header";
            return false;
        }
        char obj[32], fmt[32], fld[32], sym[32];
        const char *eol = p;
        while (eol < end && *eol != '\n') ++eol;
        std::string line(p, eol);
        if (std::sscanf(line.c_str(),
                        "%%%%MatrixMarket %31s %31s %31s %31s",
                        obj, fmt, fld, sym) != 4) {
            r.error = "invalid Matrix Market header";
            return false;
        }
        for (char *s : {obj, fmt, fld, sym})
            for (char *q = s; *q; ++q) *q = (char)std::tolower(*q);
        if (std::strcmp(fmt, "coordinate") != 0) {
            r.error = "only coordinate format is supported natively";
            return false;
        }
        if (!std::strcmp(fld, "real") || !std::strcmp(fld, "double"))
            r.field = 0;
        else if (!std::strcmp(fld, "integer"))
            r.field = 1;
        else if (!std::strcmp(fld, "pattern"))
            r.field = 2;
        else if (!std::strcmp(fld, "complex"))
            r.field = 3;
        else {
            r.error = std::string("unsupported field: ") + fld;
            return false;
        }
        if (!std::strcmp(sym, "general")) r.symmetry = 0;
        else if (!std::strcmp(sym, "symmetric")) r.symmetry = 1;
        else if (!std::strcmp(sym, "skew-symmetric")) r.symmetry = 2;
        else if (!std::strcmp(sym, "hermitian")) r.symmetry = 3;
        else {
            r.error = std::string("unsupported symmetry: ") + sym;
            return false;
        }

        // Comments, then size line (within the complete-line span;
        // refill and retry if it is not buffered yet).
        const char *q = eol < end ? eol + 1 : end;
        while (q < end) {
            q = skip_ws(q, end);
            if (q < end && *q == '%') { q = next_line(q, end); continue; }
            if (q < end && *q == '\n') { ++q; continue; }
            break;
        }
        const char *size_end = q;
        while (size_end < end && *size_end != '\n') ++size_end;
        if (size_end == end && !lb.eof) {
            if (!lb.refill()) { /* falls through to eof parse */ }
            continue;
        }
        // Size-line overflow discipline mirrors the reference
        // (matrix-market.cpp:449-482): reject out-of-range values
        // instead of silently truncating into int32 index storage.
        // Confine strtoll to the size LINE: with fewer than three
        // numbers it must error, not consume the next line's tokens.
        char *after;
        errno = 0;
        size_t se = (size_t)(size_end - p);
        char saved_se = lb.buf[se];
        lb.buf[se] = '\0';
        r.rows = std::strtoll(q, &after, 10);
        char *a2;
        r.cols = std::strtoll(after, &a2, 10);
        char *a3;
        r.nnz = std::strtoll(a2, &a3, 10);
        bool three = after != q && a2 != after && a3 != a2;
        after = a3;
        lb.buf[se] = saved_se;
        if (errno == ERANGE) {
            r.error = "integer overflow in size line";
            return false;
        }
        if (!three || r.rows < 0 || r.cols < 0 || r.nnz < 0) {
            r.error = "invalid size line";
            return false;
        }
        if (r.rows > INT32_MAX || r.cols > INT32_MAX) {
            r.error = "matrix dimensions exceed the int32 index range";
            return false;
        }
        const char *consumed = size_end < end ? size_end + 1 : size_end;
        lb.consume((size_t)(consumed - p));
        return true;
    }
}

bool parse_entries(LineBuffer &lb, Result &r) {
    // Storage grows in slabs so a lying size line in a compressed
    // file cannot force a giant upfront allocation (the reference's
    // whole-file path can bound nnz by the file size; a stream
    // cannot).
    int64_t k = 0;
    constexpr int64_t SLAB = 4 << 20;
    while (k < r.nnz) {
        if ((int64_t)r.row_idx.size() <= k) {
            int64_t upto = k + SLAB < r.nnz ? k + SLAB : r.nnz;
            r.row_idx.resize((size_t)upto);
            r.col_idx.resize((size_t)upto);
            r.values.resize((size_t)upto);
            if (r.field == 3) r.values_imag.resize((size_t)upto);
        }
        size_t n = lb.usable();
        if (n == 0) {
            if (!lb.refill()) {
                if (lb.eof && lb.fill > 0)
                    continue;  // final line has no trailing newline:
                               // at EOF the remainder becomes usable
                r.error = "size line claims more entries than the "
                          "file holds";
                return false;
            }
            continue;
        }
        // NUL-terminate the complete-line span so strtoll/strtod
        // cannot run past it.
        char saved = lb.buf[n];
        lb.buf[n] = '\0';
        char *q = lb.buf.data();
        char *qend = lb.buf.data() + n;
        while (k < r.nnz && q < qend) {
            while (q < qend && (*q == ' ' || *q == '\t' ||
                                *q == '\r' || *q == '\n'))
                ++q;  // blank lines must be consumed, not re-buffered
            if (q == qend) break;
            char *next;
            char *entry = q;  // reparse point if a later token stalls
            long long i = std::strtoll(q, &next, 10);
            if (next == q) break;  // no complete token left
            // Each later token must make progress too: tokens may
            // legally sit on separate lines (the reference reads
            // them with operator>>, matrix-market.cpp:508-528), so a
            // stalled token means the rest of the entry is not
            // buffered yet -- rewind to the entry start and refill.
            // At EOF the outer loop turns this into "truncated
            // entries" instead of silently storing 0.
            char *prev = next;
            long long j = std::strtoll(prev, &next, 10);
            if (next == prev) { q = entry; break; }
            double v = 1.0, vi = 0.0;
            if (r.field == 0 || r.field == 3) {
                prev = next;
                v = std::strtod(prev, &next);
                if (next == prev) { q = entry; break; }
                if (r.field == 3) {
                    prev = next;
                    vi = std::strtod(prev, &next);
                    if (next == prev) { q = entry; break; }
                }
            } else if (r.field == 1) {
                prev = next;
                v = (double)std::strtoll(prev, &next, 10);
                if (next == prev) { q = entry; break; }
            }
            if (i < 1 || i > r.rows || j < 1 || j > r.cols) {
                r.error = "matrix entry index out of bounds";
                lb.buf[n] = saved;
                return false;
            }
            if ((int64_t)r.row_idx.size() <= k) {
                int64_t upto = k + SLAB < r.nnz ? k + SLAB : r.nnz;
                r.row_idx.resize((size_t)upto);
                r.col_idx.resize((size_t)upto);
                r.values.resize((size_t)upto);
                if (r.field == 3) r.values_imag.resize((size_t)upto);
            }
            r.row_idx[(size_t)k] = (int32_t)i;
            r.col_idx[(size_t)k] = (int32_t)j;
            r.values[(size_t)k] = v;
            if (r.field == 3) r.values_imag[(size_t)k] = vi;
            ++k;
            q = next;
        }
        lb.buf[n] = saved;
        size_t used = (size_t)(q - lb.buf.data());
        if (used == 0 && lb.eof) {
            r.error = "truncated entries";
            return false;
        }
        if (used == 0 && !lb.refill()) {
            r.error = "truncated entries";
            return false;
        }
        lb.consume(used);
    }
    return true;
}

}  // namespace

extern "C" {

// ``member`` selects the tar member by name suffix; the Python loader
// passes the reference's SuiteSparse convention "<stem>/<stem>.mtx"
// (matrix-market.cpp:760-764) so an auxiliary member like
// "<stem>/<stem>_b.mtx" stored first cannot be picked by accident.
// NULL/"" falls back to the first ".mtx" member.
void *mmparse_parse_file_member(const char *path, const char *member,
                                char *errbuf, int errlen) {
    auto *r = new Result();
    {
        FileSource file;
        if (!file.open(path)) {
            r->error = file.err;
            goto fail;
        }
        InflateSource inflater;
        if (!inflater.init(&file)) {
            r->error = inflater.err;
            goto fail;
        }
        MemberSource memsrc;
        const char *suffix =
            (member && member[0]) ? member : ".mtx";
        if (!memsrc.init(&inflater, suffix)) {
            r->error = memsrc.err.empty() ? inflater.err : memsrc.err;
            goto fail;
        }
        LineBuffer lb(&memsrc);
        // A mid-file gzip error surfaces to the parser as EOF, so on
        // ANY failure prefer the inflater's (then the tar layer's)
        // error over the parser's misleading "file ended early" one.
        if (!parse_header(lb, *r) || !parse_entries(lb, *r)) {
            if (!inflater.err.empty()) r->error = inflater.err;
            else if (!memsrc.err.empty()) r->error = memsrc.err;
            goto fail;
        }
        if (!inflater.err.empty()) {
            r->error = inflater.err;
            goto fail;
        }
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
int mmparse_streaming(void *h) { (void)h; return 1; }

void mmparse_copy_imag(void *h, double *vals_imag) {
    Result *r = (Result *)h;
    if (!r->values_imag.empty())
        std::memcpy(vals_imag, r->values_imag.data(),
                    r->nnz * sizeof(double));
    else
        std::memset(vals_imag, 0, r->nnz * sizeof(double));
}

void mmparse_copy(void *h, int32_t *rows, int32_t *cols, double *vals) {
    Result *r = (Result *)h;
    std::memcpy(rows, r->row_idx.data(), r->nnz * sizeof(int32_t));
    std::memcpy(cols, r->col_idx.data(), r->nnz * sizeof(int32_t));
    std::memcpy(vals, r->values.data(), r->nnz * sizeof(double));
}

void *mmparse_parse_file(const char *path, char *errbuf, int errlen) {
    return mmparse_parse_file_member(path, nullptr, errbuf, errlen);
}

void mmparse_free(void *h) { delete (Result *)h; }

}  // extern "C"
