// Minimal pybind11 API stub — ONLY for the ABI drop-in compile check
// (dragposer_smoke_refheader target): it lets the reference's unmodified
// headers (DragPoserDLL/exportFunc.h + utils.h) parse without the real
// pybind11, so a client TU written against the REFERENCE's declarations can
// be compiled and linked against libdragposer_tpu_native.so.  Never linked
// into anything that runs Python.
#pragma once

#include <exception>
#include <memory>
#include <string>

namespace pybind11 {

class object {
 public:
  object attr(const char*) const { return object(); }
  template <typename... A>
  object operator()(A&&...) const {
    return object();
  }
};

class module : public object {
 public:
  static module import(const char*) { return module(); }
};

struct scoped_interpreter {};

template <typename T>
class array_t : public object {};

class error_already_set : public std::exception {
 public:
  const char* what() const noexcept override { return "stub"; }
};

}  // namespace pybind11
