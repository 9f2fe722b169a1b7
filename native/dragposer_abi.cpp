// Native runtime: embeds CPython once per process and forwards the C ABI to
// dragposer_tpu.runtime.capi.  Only scalars and bytes cross the boundary
// (no numpy C API, no binding generator); the hot call (`drag_pose`) is a
// single Python method dispatch that launches one pre-compiled XLA program.
//
// Configuration:
//   DRAGPOSER_PYROOT  — repo root holding the dragposer_tpu package
//                       (compiled-in default: DRAGPOSER_DEFAULT_PYROOT)

#include "dragposer_abi.h"

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>

namespace {

void log_line(const std::string& msg) {
  std::FILE* f = std::fopen("cpp_log.txt", "a");
  if (f) {
    std::fprintf(f, "%s\n", msg.c_str());
    std::fclose(f);
  }
}

// Log-and-clear for any Python exception raised behind an ABI call; the
// reference likewise logs rather than crashing the host (exportFunc.cpp:84-94).
bool check_py(const char* where) {
  if (!PyErr_Occurred()) return true;
  PyObject *type, *value, *trace;
  PyErr_Fetch(&type, &value, &trace);
  PyObject* repr = value ? PyObject_Str(value) : nullptr;
  std::string msg = std::string("python error in ") + where + ": " +
                    (repr ? PyUnicode_AsUTF8(repr) : "<unknown>");
  log_line(msg);
  std::fprintf(stderr, "%s\n", msg.c_str());
  Py_XDECREF(repr);
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(trace);
  return false;
}

std::once_flag g_init_once;
PyObject* g_capi = nullptr;  // dragposer_tpu.runtime.capi module

void interpreter_init() {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
  }
  PyGILState_STATE gil = PyGILState_Ensure();
  const char* pyroot = std::getenv("DRAGPOSER_PYROOT");
#ifdef DRAGPOSER_DEFAULT_PYROOT
  if (!pyroot) pyroot = DRAGPOSER_DEFAULT_PYROOT;
#endif
  if (pyroot) {
    PyObject* sys_path = PySys_GetObject("path");  // borrowed
    PyObject* p = PyUnicode_FromString(pyroot);
    PyList_Insert(sys_path, 0, p);
    Py_DECREF(p);
  }
  g_capi = PyImport_ImportModule("dragposer_tpu.runtime.capi");
  check_py("import dragposer_tpu.runtime.capi");
  PyGILState_Release(gil);
}

// RAII GIL guard: every export may be called from any client thread.
struct Gil {
  PyGILState_STATE s;
  Gil() : s(PyGILState_Ensure()) {}
  ~Gil() { PyGILState_Release(s); }
};

}  // namespace

extern "C" {

struct DragPoser {
  long handle = 0;
  int num_joints = 0;
  int num_end_effectors = 0;
};

DRAGPOSER_EXPORT DragPoser* init_drag_poser() {
  std::call_once(g_init_once, interpreter_init);
  if (!g_capi) return nullptr;
  Gil gil;
  PyObject* res = PyObject_CallMethod(g_capi, "init", nullptr);
  if (!check_py("init") || !res) return nullptr;
  auto* h = new DragPoser();
  h->handle = PyLong_AsLong(res);
  Py_DECREF(res);
  log_line("init_drag_poser ok");
  return h;
}

DRAGPOSER_EXPORT void set_reference_skeleton(DragPoser* h, char* bvhPath) {
  Gil gil;
  PyObject* res = PyObject_CallMethod(g_capi, "set_reference_skeleton", "ls",
                                      h->handle, bvhPath);
  if (check_py("set_reference_skeleton") && res) {
    h->num_joints = static_cast<int>(PyLong_AsLong(res));
  }
  Py_XDECREF(res);
}

DRAGPOSER_EXPORT void load_models(DragPoser* h, char* modelPath) {
  Gil gil;
  PyObject* res =
      PyObject_CallMethod(g_capi, "load_models", "ls", h->handle, modelPath);
  check_py("load_models");
  Py_XDECREF(res);
}

DRAGPOSER_EXPORT void set_mask_and_weights(DragPoser* h, float* mask,
                                           float2* weights) {
  Gil gil;
  const Py_ssize_t j = h->num_joints;
  PyObject* res = PyObject_CallMethod(
      g_capi, "set_mask_and_weights", "ly#y#", h->handle,
      reinterpret_cast<const char*>(mask), j * 4,
      reinterpret_cast<const char*>(weights), j * 8);
  if (check_py("set_mask_and_weights") && res) {
    h->num_end_effectors = static_cast<int>(PyLong_AsLong(res));
  }
  Py_XDECREF(res);
}

DRAGPOSER_EXPORT void init_drag_model(DragPoser* h, float3 p, quaternion q) {
  Gil gil;
  PyObject* res = PyObject_CallMethod(
      g_capi, "init_drag_model", "lddddddd", h->handle, (double)p.x,
      (double)p.y, (double)p.z, (double)q.w, (double)q.x, (double)q.y,
      (double)q.z);
  check_py("init_drag_model");
  Py_XDECREF(res);
}

DRAGPOSER_EXPORT void set_optim_params(DragPoser* h, float stopEpsPos,
                                       float stopEpsRot, int maxIter,
                                       float lr) {
  Gil gil;
  PyObject* res = PyObject_CallMethod(
      g_capi, "set_optim_params", "lddid", h->handle, (double)stopEpsPos,
      (double)stopEpsRot, maxIter, (double)lr);
  check_py("set_optim_params");
  Py_XDECREF(res);
}

DRAGPOSER_EXPORT void set_lambdas(DragPoser* h, float lambdaRot,
                                  float lambdaTemporal,
                                  int temporalFutureWindow) {
  Gil gil;
  PyObject* res = PyObject_CallMethod(
      g_capi, "set_lambdas", "lddi", h->handle, (double)lambdaRot,
      (double)lambdaTemporal, temporalFutureWindow);
  check_py("set_lambdas");
  Py_XDECREF(res);
}

DRAGPOSER_EXPORT void set_global_pos(DragPoser* h, float3 p) {
  Gil gil;
  PyObject* res = PyObject_CallMethod(g_capi, "set_global_pos", "lddd",
                                      h->handle, (double)p.x, (double)p.y,
                                      (double)p.z);
  check_py("set_global_pos");
  Py_XDECREF(res);
}

DRAGPOSER_EXPORT void drag_pose(DragPoser* h, int nEndEffectors,
                                float3* targetEEPos, quaternion* targetEERot,
                                quaternion* resultPose,
                                float3* resultGlobalPos) {
  if (nEndEffectors != h->num_end_effectors) {
    log_line("drag_pose: nEndEffectors mismatch");
    return;
  }
  Gil gil;
  PyObject* res = PyObject_CallMethod(
      g_capi, "drag_pose", "ly#y#i", h->handle,
      reinterpret_cast<const char*>(targetEEPos),
      (Py_ssize_t)(nEndEffectors * 12),
      reinterpret_cast<const char*>(targetEERot),
      (Py_ssize_t)(nEndEffectors * 16), nEndEffectors);
  if (!check_py("drag_pose") || !res) return;
  char* buf = nullptr;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(res, &buf, &len) == 0) {
    const Py_ssize_t pose_bytes = (Py_ssize_t)h->num_joints * 16;
    if (len == pose_bytes + 12) {
      std::memcpy(resultPose, buf, pose_bytes);
      std::memcpy(resultGlobalPos, buf + pose_bytes, 12);
    } else {
      log_line("drag_pose: unexpected result size");
    }
  }
  check_py("drag_pose result");
  Py_DECREF(res);
}

DRAGPOSER_EXPORT void destroy_drag_poser(DragPoser* h) {
  if (!h) return;
  {
    Gil gil;
    PyObject* res = PyObject_CallMethod(g_capi, "destroy", "l", h->handle);
    check_py("destroy");
    Py_XDECREF(res);
  }
  delete h;
  log_line("destroy_drag_poser ok");
}

DRAGPOSER_EXPORT int get_num_joints(DragPoser* h) { return h->num_joints; }
DRAGPOSER_EXPORT int get_num_end_effectors(DragPoser* h) {
  return h->num_end_effectors;
}

}  // extern "C"
