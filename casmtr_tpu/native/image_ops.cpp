// Native host-side image preprocessing for the input pipeline.
//
// The device compute path is XLA/Pallas (TPU owns the kernels); the host
// runtime around it is native where it is hot: per-sample image resize +
// pad + layout/normalize fused in one multi-threaded C++ pass instead of
// three numpy/cv2 passes (reference does resize -> pad -> normalize
// separately; src/utils/dataset.py:111-142).
//
// Exposed via the CPython C API (no pybind11 in this image).

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Bilinear resize uint8 HWC -> float32 HWC in [0,1], written into a
// pre-zeroed padded canvas (fusing resize + pad + normalize).
void resize_rows(const uint8_t* src, int sh, int sw, int sc,
                 float* dst, int dh, int dw, int canvas_w, int dc,
                 float scale, int row_begin, int row_end) {
  const float sy_ratio = (dh > 1) ? (float)sh / dh : 0.f;
  const float sx_ratio = (dw > 1) ? (float)sw / dw : 0.f;
  for (int y = row_begin; y < row_end; ++y) {
    // OpenCV-style half-pixel centers
    float fy = (y + 0.5f) * sy_ratio - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y0c = std::clamp(y0, 0, sh - 1);
    int y1c = std::clamp(y0 + 1, 0, sh - 1);
    float* out_row = dst + (size_t)y * canvas_w * dc;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx_ratio - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x0c = std::clamp(x0, 0, sw - 1);
      int x1c = std::clamp(x0 + 1, 0, sw - 1);
      const uint8_t* p00 = src + ((size_t)y0c * sw + x0c) * sc;
      const uint8_t* p01 = src + ((size_t)y0c * sw + x1c) * sc;
      const uint8_t* p10 = src + ((size_t)y1c * sw + x0c) * sc;
      const uint8_t* p11 = src + ((size_t)y1c * sw + x1c) * sc;
      for (int c = 0; c < dc; ++c) {
        int cs = (sc == 1) ? 0 : c;  // gray -> broadcast to 3 channels
        float v0 = p00[cs] + wx * (float(p01[cs]) - p00[cs]);
        float v1 = p10[cs] + wx * (float(p11[cs]) - p10[cs]);
        out_row[(size_t)x * dc + c] = (v0 + wy * (v1 - v0)) * scale;
      }
    }
  }
}

// args: src uint8 [H, W, C], out_h, out_w, pad_size  -> (canvas f32
// [pad, pad, 3], mask bool [pad, pad])
PyObject* resize_pad_normalize(PyObject*, PyObject* args) {
  PyArrayObject* src_arr = nullptr;
  int out_h, out_w, pad_size;
  if (!PyArg_ParseTuple(args, "O!iii", &PyArray_Type, &src_arr, &out_h,
                        &out_w, &pad_size))
    return nullptr;
  if (PyArray_TYPE(src_arr) != NPY_UINT8 || PyArray_NDIM(src_arr) != 3 ||
      !PyArray_IS_C_CONTIGUOUS(src_arr)) {
    PyErr_SetString(PyExc_ValueError,
                    "expected C-contiguous uint8 array [H, W, C]");
    return nullptr;
  }
  int sh = (int)PyArray_DIM(src_arr, 0);
  int sw = (int)PyArray_DIM(src_arr, 1);
  int sc = (int)PyArray_DIM(src_arr, 2);
  if (pad_size < out_h || pad_size < out_w) {
    PyErr_SetString(PyExc_ValueError, "pad_size < output size");
    return nullptr;
  }

  npy_intp cdims[3] = {pad_size, pad_size, 3};
  npy_intp mdims[2] = {pad_size, pad_size};
  PyObject* canvas = PyArray_ZEROS(3, cdims, NPY_FLOAT32, 0);
  PyObject* mask = PyArray_ZEROS(2, mdims, NPY_BOOL, 0);
  if (!canvas || !mask) return nullptr;

  const uint8_t* src = (const uint8_t*)PyArray_DATA(src_arr);
  float* dst = (float*)PyArray_DATA((PyArrayObject*)canvas);
  npy_bool* mk = (npy_bool*)PyArray_DATA((PyArrayObject*)mask);

  Py_BEGIN_ALLOW_THREADS
  int n_threads = std::min<unsigned>(std::thread::hardware_concurrency(), 8);
  n_threads = std::max(n_threads, 1);
  std::vector<std::thread> ts;
  int rows_per = (out_h + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int rb = t * rows_per;
    int re = std::min(out_h, rb + rows_per);
    if (rb >= re) break;
    ts.emplace_back(resize_rows, src, sh, sw, sc, dst, out_h, out_w,
                    pad_size, 3, 1.f / 255.f, rb, re);
  }
  for (auto& th : ts) th.join();
  for (int y = 0; y < out_h; ++y)
    std::memset(mk + (size_t)y * pad_size, 1, out_w);
  Py_END_ALLOW_THREADS

  return Py_BuildValue("(NN)", canvas, mask);
}

PyMethodDef methods[] = {
    {"resize_pad_normalize", resize_pad_normalize, METH_VARARGS,
     "Fused bilinear resize + bottom-right pad + [0,1] normalize."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_image_ops",
                      "native image preprocessing", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__image_ops() {
  import_array();
  return PyModule_Create(&module);
}
