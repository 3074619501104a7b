// mccodec: native codec for the Monte-Carlo cache tensor format.
//
// The framework's disk interchange format (inherited from the reference,
// mcsim.py:457-459) stores fidelity-distribution tensors as JSON nested
// lists: a .mc file for the paper workload holds 1.1e7 floats (~200 MB of
// text).  CPython's json round-trips that in tens of seconds; this codec
// does it at memory bandwidth.  It is the framework's native data-loader:
// the TPU compute path is JAX/XLA, the cache IO path is C++.
//
// Exposed C ABI (consumed via ctypes from
// code_robchar_tpu/utils/native_io.py):
//
//   int rc_decode_array(const char* text, long long* shape /*cap 8*/,
//                       int* ndim, double** data, long long* count);
//       Parse one rectangular JSON nested array of numbers.  Allocates
//       *data with malloc (caller frees via rc_free).  Accepts NaN /
//       Infinity tokens (Python's json emits them).  Returns 0 on
//       success, negative error codes otherwise.
//
//   int rc_encode_array(const double* data, const long long* shape,
//                       int ndim, char** out, long long* len);
//       Render the flat buffer as JSON nested lists using shortest
//       round-trip formatting (%.17g), bit-exact under strtod.
//
//   void rc_free(void* p);
//
// Build: g++ -O3 -shared -fPIC -o libmccodec.so mccodec.cpp
// (auto-built on first use by native_io.py).

#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <vector>

namespace {

struct Parser {
    const char* p;
    const char* end;

    void skip_ws() {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                           *p == '\r' || *p == ','))
            ++p;
    }
};

// Recursively parse a nested array.  depth_shape collects the length of
// the first array seen at each depth; rectangularity is verified.
int parse_array(Parser& ps, std::vector<double>& out,
                std::vector<long long>& shape, int depth) {
    ps.skip_ws();
    if (ps.p >= ps.end || *ps.p != '[') return -1;
    ++ps.p;
    long long count = 0;
    bool first_child_is_array = false;
    ps.skip_ws();
    if (ps.p < ps.end && *ps.p == '[') first_child_is_array = true;

    while (true) {
        ps.skip_ws();
        if (ps.p >= ps.end) return -2;          // unterminated
        if (*ps.p == ']') { ++ps.p; break; }
        if (first_child_is_array) {
            int rc = parse_array(ps, out, shape, depth + 1);
            if (rc) return rc;
        } else {
            char* next = nullptr;
            double v;
            // strtod handles nan/inf spellings; Python json emits
            // NaN/Infinity/-Infinity which strtod accepts modulo case on
            // some libcs — normalise the leading char run manually.
            if ((ps.end - ps.p) >= 3 &&
                (ps.p[0] == 'N' || ps.p[0] == 'n')) {
                v = NAN; ps.p += 3;
            } else if ((ps.end - ps.p) >= 8 && ps.p[0] == 'I') {
                v = INFINITY; ps.p += 8;
            } else if ((ps.end - ps.p) >= 9 && ps.p[0] == '-' &&
                       ps.p[1] == 'I') {
                v = -INFINITY; ps.p += 9;
            } else {
                v = strtod(ps.p, &next);
                if (next == ps.p) return -3;    // not a number
                ps.p = next;
            }
            out.push_back(v);
        }
        ++count;
    }

    if ((int)shape.size() <= depth) {
        shape.push_back(count);
    } else if (shape[(size_t)depth] != count) {
        return -4;                               // ragged array
    }
    return 0;
}

}  // namespace

extern "C" {

int rc_decode_array(const char* text, long long* shape_out, int* ndim_out,
                    double** data_out, long long* count_out) {
    Parser ps{text, text + strlen(text)};
    std::vector<double> vals;
    vals.reserve((size_t)(ps.end - ps.p) / 8 + 16);
    std::vector<long long> shape;
    int rc = parse_array(ps, vals, shape, 0);
    if (rc) return rc;
    if (shape.size() > 8) return -5;
    *ndim_out = (int)shape.size();
    long long expect = 1;
    for (size_t i = 0; i < shape.size(); ++i) {
        shape_out[i] = shape[i];
        expect *= shape[i];
    }
    if (expect != (long long)vals.size()) return -6;
    double* buf = (double*)malloc(vals.size() * sizeof(double));
    if (!buf && !vals.empty()) return -7;
    memcpy(buf, vals.data(), vals.size() * sizeof(double));
    *data_out = buf;
    *count_out = (long long)vals.size();
    return 0;
}

int rc_encode_array(const double* data, const long long* shape, int ndim,
                    char** out, long long* len_out) {
    if (ndim < 1 || ndim > 8) return -1;
    long long total = 1;
    for (int i = 0; i < ndim; ++i) total *= shape[i];

    // worst case ~26 chars per number + brackets
    size_t cap = (size_t)total * 27 + (size_t)total * 2 + 1024;
    char* buf = (char*)malloc(cap);
    if (!buf) return -7;
    char* w = buf;

    // S[d] = number of scalars inside one depth-d list = prod(shape[d:])
    std::vector<long long> S(ndim, 1);
    S[(size_t)ndim - 1] = shape[ndim - 1];
    for (int i = ndim - 2; i >= 0; --i)
        S[(size_t)i] = S[(size_t)i + 1] * shape[i];

    for (long long idx = 0; idx < total; ++idx) {
        for (int d = 0; d < ndim; ++d)               // list openings
            if (idx % S[(size_t)d] == 0) *w++ = '[';
        double v = data[idx];
        if (std::isnan(v)) {
            memcpy(w, "NaN", 3); w += 3;
        } else if (std::isinf(v)) {
            if (v > 0) { memcpy(w, "Infinity", 8); w += 8; }
            else { memcpy(w, "-Infinity", 9); w += 9; }
        } else {
            w += snprintf(w, 32, "%.17g", v);
        }
        for (int d = ndim - 1; d >= 0; --d)          // list closings
            if ((idx + 1) % S[(size_t)d] == 0) *w++ = ']';
        if (idx + 1 < total) *w++ = ',';
    }
    *w = '\0';
    *out = buf;
    *len_out = (long long)(w - buf);
    return 0;
}

void rc_free(void* p) { free(p); }

}  // extern "C"
