// Native I/O engine: threaded blocked transpose + file I/O for restart
// fields (the host-side hot path of checkpointing).
//
// The on-disk layout (reference io_fields.f90: x innermost, z outermost)
// is the transpose of the in-memory C-ordered (nx, ny, nz) arrays; a naive
// numpy round-trip does strided single-threaded copies. This module
// performs cache-blocked (64x64) transposition in parallel with
// std::thread and writes/reads directly, the role the reference's
// TLab_Transpose + MPI-IO layer plays (src/utils/tlab_transpose.f90,
// src/base/io_fields.f90) re-imagined for a single fat host.
//
// CPython C API only (no pybind11 in this environment).

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

constexpr int kBlock = 64;

// transpose (nx, ny, nz) C-order -> (nz, ny, nx) C-order (x innermost on disk)
void transpose_xz(const double* src, double* dst,
                  int64_t nx, int64_t ny, int64_t nz,
                  int64_t j0, int64_t j1) {
    for (int64_t j = j0; j < j1; ++j) {
        for (int64_t ib = 0; ib < nx; ib += kBlock) {
            int64_t ie = std::min(ib + (int64_t)kBlock, nx);
            for (int64_t kb = 0; kb < nz; kb += kBlock) {
                int64_t ke = std::min(kb + (int64_t)kBlock, nz);
                for (int64_t i = ib; i < ie; ++i) {
                    const double* s = src + (i * ny + j) * nz;
                    for (int64_t k = kb; k < ke; ++k) {
                        dst[(k * ny + j) * nx + i] = s[k];
                    }
                }
            }
        }
    }
}

void transpose_zx(const double* src, double* dst,
                  int64_t nx, int64_t ny, int64_t nz,
                  int64_t j0, int64_t j1) {
    for (int64_t j = j0; j < j1; ++j) {
        for (int64_t kb = 0; kb < nz; kb += kBlock) {
            int64_t ke = std::min(kb + (int64_t)kBlock, nz);
            for (int64_t ib = 0; ib < nx; ib += kBlock) {
                int64_t ie = std::min(ib + (int64_t)kBlock, nx);
                for (int64_t k = kb; k < ke; ++k) {
                    const double* s = src + (k * ny + j) * nx;
                    for (int64_t i = ib; i < ie; ++i) {
                        dst[(i * ny + j) * nz + k] = s[i];
                    }
                }
            }
        }
    }
}

template <typename Fn>
void parallel_over_j(int64_t ny, Fn fn) {
    unsigned nth = std::max(1u, std::thread::hardware_concurrency());
    nth = std::min<unsigned>(nth, (unsigned)ny);
    std::vector<std::thread> threads;
    int64_t chunk = (ny + nth - 1) / nth;
    for (unsigned t = 0; t < nth; ++t) {
        int64_t j0 = t * chunk;
        int64_t j1 = std::min(j0 + chunk, ny);
        if (j0 >= j1) break;
        threads.emplace_back(fn, j0, j1);
    }
    for (auto& th : threads) th.join();
}

// write_field(path: str, buf: buffer (nx*ny*nz float64 C-order), nx, ny,
//             nz, itime, params: bytes) -> None
PyObject* write_field(PyObject*, PyObject* args) {
    const char* path;
    Py_buffer buf;
    int64_t nx, ny, nz;
    int itime;
    Py_buffer params;
    if (!PyArg_ParseTuple(args, "sy*LLLiy*", &path, &buf, &nx, &ny, &nz,
                          &itime, &params))
        return nullptr;

    const double* src = (const double*)buf.buf;
    std::vector<double> tmp((size_t)(nx * ny * nz));

    Py_BEGIN_ALLOW_THREADS
    parallel_over_j(ny, [&](int64_t j0, int64_t j1) {
        transpose_xz(src, tmp.data(), nx, ny, nz, j0, j1);
    });
    Py_END_ALLOW_THREADS

    FILE* fh = std::fopen(path, "wb");
    if (!fh) {
        PyBuffer_Release(&buf);
        PyBuffer_Release(&params);
        PyErr_SetString(PyExc_OSError, "cannot open file for writing");
        return nullptr;
    }
    int32_t hdr[5];
    hdr[0] = (int32_t)(5 * sizeof(int32_t) + params.len);
    hdr[1] = (int32_t)nx;
    hdr[2] = (int32_t)ny;
    hdr[3] = (int32_t)nz;
    hdr[4] = itime;
    bool ok = true;
    Py_BEGIN_ALLOW_THREADS
    ok = std::fwrite(hdr, sizeof(hdr), 1, fh) == 1
        && (params.len == 0
            || std::fwrite(params.buf, (size_t)params.len, 1, fh) == 1)
        && std::fwrite(tmp.data(), sizeof(double), tmp.size(), fh)
            == tmp.size();
    std::fclose(fh);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    PyBuffer_Release(&params);
    if (!ok) {
        PyErr_SetString(PyExc_OSError, "short write");
        return nullptr;
    }
    Py_RETURN_NONE;
}

// read_field(path: str, out: writable buffer) ->
//   (nx, ny, nz, itime, params: bytes)
PyObject* read_field(PyObject*, PyObject* args) {
    const char* path;
    Py_buffer out;
    if (!PyArg_ParseTuple(args, "sw*", &path, &out)) return nullptr;

    FILE* fh = std::fopen(path, "rb");
    if (!fh) {
        PyBuffer_Release(&out);
        PyErr_SetString(PyExc_OSError, "cannot open file for reading");
        return nullptr;
    }
    int32_t hdr[5];
    if (std::fread(hdr, sizeof(hdr), 1, fh) != 1) {
        std::fclose(fh);
        PyBuffer_Release(&out);
        PyErr_SetString(PyExc_OSError, "short read (header)");
        return nullptr;
    }
    int64_t nx = hdr[1], ny = hdr[2], nz = hdr[3];
    int64_t nparam_bytes = hdr[0] - (int64_t)(5 * sizeof(int32_t));
    std::vector<char> params((size_t)std::max<int64_t>(nparam_bytes, 0));
    if (nparam_bytes > 0
        && std::fread(params.data(), (size_t)nparam_bytes, 1, fh) != 1) {
        std::fclose(fh);
        PyBuffer_Release(&out);
        PyErr_SetString(PyExc_OSError, "short read (params)");
        return nullptr;
    }
    size_t n = (size_t)(nx * ny * nz);
    if ((int64_t)(n * sizeof(double)) > out.len) {
        std::fclose(fh);
        PyBuffer_Release(&out);
        PyErr_SetString(PyExc_ValueError, "output buffer too small");
        return nullptr;
    }
    std::vector<double> tmp(n);
    bool ok = true;
    Py_BEGIN_ALLOW_THREADS
    ok = std::fread(tmp.data(), sizeof(double), n, fh) == n;
    std::fclose(fh);
    if (ok) {
        parallel_over_j(ny, [&](int64_t j0, int64_t j1) {
            transpose_zx(tmp.data(), (double*)out.buf, nx, ny, nz, j0, j1);
        });
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&out);
    if (!ok) {
        PyErr_SetString(PyExc_OSError, "short read (data)");
        return nullptr;
    }
    return Py_BuildValue("(LLLiy#)", nx, ny, nz, (int)hdr[4],
                         params.data(), (Py_ssize_t)params.size());
}

PyMethodDef kMethods[] = {
    {"write_field", write_field, METH_VARARGS,
     "write_field(path, f64_buffer, nx, ny, nz, itime, params_bytes)"},
    {"read_field", read_field, METH_VARARGS,
     "read_field(path, out_f64_buffer) -> (nx, ny, nz, itime, params)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_tlabio",
    "Threaded blocked-transpose restart I/O", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__tlabio(void) { return PyModule_Create(&kModule); }
