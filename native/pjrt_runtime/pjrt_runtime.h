// Native PJRT serving runtime for multi_agent_solver_tpu.
//
// Loads any PJRT plugin shared object (libtpu.so on a TPU host, or this
// environment's tunneled TPU plugin), compiles a StableHLO module exported by
// multi_agent_solver_tpu.utils.export, and executes batched solve requests
// with zero Python in the loop. This is the deployment-path analogue of the
// reference's C++ example binaries: the TPU compute graph stays exactly the
// JAX-compiled program; only the host driver is native.
//
// Implemented directly against the PJRT C API (pjrt_c_api.h) -- no
// dependency on TensorFlow/XLA libraries, only the single header.

#ifndef MAS_NATIVE_PJRT_RUNTIME_H_
#define MAS_NATIVE_PJRT_RUNTIME_H_

#include <cstdint>
#include <memory>
#include <string>
#include <utility>
#include <vector>

extern "C" {
#include "xla/pjrt/c/pjrt_c_api.h"
}

namespace mas_native {

// One named option for PJRT_Client_Create (string or int64).
struct ClientOption {
  std::string name;
  bool is_string = true;
  std::string string_value;
  int64_t int64_value = 0;
};

struct HostArray {
  std::vector<int64_t> dims;
  std::vector<float> data;  // f32-only serving interface for now

  int64_t element_count() const {
    int64_t n = 1;
    for (int64_t d : dims) n *= d;
    return n;
  }
};

class PjrtRuntime {
 public:
  // Loads the plugin, initializes it, and creates a client.
  // Throws std::runtime_error on failure.
  PjrtRuntime(const std::string& plugin_path,
              const std::vector<ClientOption>& options);
  ~PjrtRuntime();

  PjrtRuntime(const PjrtRuntime&) = delete;
  PjrtRuntime& operator=(const PjrtRuntime&) = delete;

  std::string platform_name() const;
  int api_major() const;
  int api_minor() const;
  size_t addressable_device_count() const { return devices_.size(); }

  // Compiles an MLIR (StableHLO) module with the given serialized
  // CompileOptionsProto.
  void Compile(const std::string& mlir_module,
               const std::string& compile_options_proto);

  // Executes the compiled program on device 0 with f32 inputs; returns f32
  // outputs (dims filled from the runtime's view of each output buffer).
  std::vector<HostArray> Execute(const std::vector<HostArray>& inputs);

 private:
  void Check(PJRT_Error* error, const char* what) const;

  void* dl_handle_ = nullptr;
  const PJRT_Api* api_ = nullptr;
  PJRT_Client* client_ = nullptr;
  PJRT_LoadedExecutable* executable_ = nullptr;
  std::vector<PJRT_Device*> devices_;
};

}  // namespace mas_native

#endif  // MAS_NATIVE_PJRT_RUNTIME_H_
