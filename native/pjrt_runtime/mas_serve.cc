// mas_serve: native batched-MPC serving driver.
//
// Loads a PJRT plugin, compiles a StableHLO solve program exported by
// `python -m multi_agent_solver_tpu.utils.export_cli`, and serves batched
// solve requests in a loop -- no Python in the serving path.
//
// Usage:
//   mas_serve --plugin /path/libtpu.so --module solve          \
//             [--iters 10] [--batch-from-meta] [--session-id X]
//
// `--module PREFIX` expects PREFIX.mlir, PREFIX.compile_options.pb and
// PREFIX.meta.json side by side.

#include <chrono>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <random>
#include <sstream>
#include <string>
#include <vector>

#include "pjrt_runtime.h"

namespace {

std::string ReadFile(const std::string& path) {
  std::ifstream in(path, std::ios::binary);
  if (!in) {
    std::cerr << "cannot read " << path << "\n";
    std::exit(1);
  }
  std::ostringstream ss;
  ss << in.rdbuf();
  return ss.str();
}

// Minimal parsing of the exporter's meta.json input shapes (f32 only):
// extracts every "shape": [..] under "inputs". Avoids a JSON dependency.
std::vector<std::vector<int64_t>> ParseInputShapes(const std::string& json) {
  std::vector<std::vector<int64_t>> shapes;
  size_t inputs_pos = json.find("\"inputs\"");
  size_t outputs_pos = json.find("\"outputs\"");
  size_t pos = inputs_pos;
  while (pos != std::string::npos) {
    pos = json.find("\"shape\"", pos + 1);
    if (pos == std::string::npos || (outputs_pos != std::string::npos && pos > outputs_pos)) {
      break;
    }
    size_t open = json.find('[', pos);
    size_t close = json.find(']', open);
    std::vector<int64_t> dims;
    std::stringstream ss(json.substr(open + 1, close - open - 1));
    std::string item;
    while (std::getline(ss, item, ',')) {
      if (!item.empty()) dims.push_back(std::stoll(item));
    }
    shapes.push_back(dims);
  }
  return shapes;
}

std::string GenerateSessionId() {
  std::random_device rd;
  std::mt19937_64 gen(rd());
  auto hex = [&](int n) {
    static const char* digits = "0123456789abcdef";
    std::string s;
    for (int i = 0; i < n; ++i) s += digits[gen() % 16];
    return s;
  };
  return hex(8) + "-" + hex(4) + "-" + hex(4) + "-" + hex(4) + "-" + hex(12);
}

}  // namespace

int main(int argc, char** argv) {
  std::string plugin_path;
  std::string module_prefix;
  std::string session_id;
  std::string topology = "v5e:1x1x1";
  int iters = 10;

  for (int i = 1; i < argc; ++i) {
    std::string arg = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) {
        std::cerr << arg << " requires a value\n";
        std::exit(2);
      }
      return argv[++i];
    };
    if (arg == "--plugin") plugin_path = next();
    else if (arg == "--module") module_prefix = next();
    else if (arg == "--iters") iters = std::stoi(next());
    else if (arg == "--session-id") session_id = next();
    else if (arg == "--topology") topology = next();
    else if (arg == "--help" || arg == "-h") {
      std::cout << "Usage: mas_serve --plugin PLUGIN.so --module PREFIX"
                << " [--iters N] [--topology T] [--session-id ID]\n";
      return 0;
    } else {
      std::cerr << "unknown argument " << arg << "\n";
      return 2;
    }
  }
  if (plugin_path.empty() || module_prefix.empty()) {
    std::cerr << "--plugin and --module are required (see --help)\n";
    return 2;
  }

  std::string mlir = ReadFile(module_prefix + ".mlir");
  std::string compile_options = ReadFile(module_prefix + ".compile_options.pb");
  std::string meta = ReadFile(module_prefix + ".meta.json");
  auto input_shapes = ParseInputShapes(meta);
  if (input_shapes.empty()) {
    std::cerr << "no input shapes found in meta.json\n";
    return 1;
  }

  // Client options: the tunneled-TPU plugin needs session/topology metadata;
  // a stock libtpu.so ignores unknown options.
  if (session_id.empty()) session_id = GenerateSessionId();
  std::vector<mas_native::ClientOption> options;
  auto add_str = [&](const char* name, const std::string& value) {
    mas_native::ClientOption opt;
    opt.name = name;
    opt.is_string = true;
    opt.string_value = value;
    options.push_back(opt);
  };
  auto add_int = [&](const char* name, int64_t value) {
    mas_native::ClientOption opt;
    opt.name = name;
    opt.is_string = false;
    opt.int64_value = value;
    options.push_back(opt);
  };
  add_int("remote_compile", 1);
  add_int("local_only", 0);
  add_int("priority", 0);
  add_str("topology", topology);
  add_int("n_slices", 1);
  add_str("session_id", session_id);
  add_int("rank", 4294967295LL);

  try {
    mas_native::PjrtRuntime runtime(plugin_path, options);
    std::cout << "platform=" << runtime.platform_name()
              << " pjrt_api=" << runtime.api_major() << "."
              << runtime.api_minor()
              << " devices=" << runtime.addressable_device_count() << "\n";

    auto t0 = std::chrono::steady_clock::now();
    runtime.Compile(mlir, compile_options);
    auto t1 = std::chrono::steady_clock::now();
    std::cout << "compiled in "
              << std::chrono::duration<double>(t1 - t0).count() << " s\n";

    // Build randomized inputs matching the exported shapes.
    std::mt19937 gen(0);
    std::uniform_real_distribution<float> lateral(0.5f, 1.5f);
    std::vector<mas_native::HostArray> inputs(input_shapes.size());
    for (size_t i = 0; i < input_shapes.size(); ++i) {
      inputs[i].dims = input_shapes[i];
      inputs[i].data.assign(inputs[i].element_count(), 0.0f);
    }
    // Flagship solve input convention: x0 batch [B, 4]; y-offset is state 1.
    if (input_shapes[0].size() == 2 && input_shapes[0][1] >= 2) {
      int64_t batch = input_shapes[0][0];
      for (int64_t b = 0; b < batch; ++b) {
        inputs[0].data[b * input_shapes[0][1] + 1] = lateral(gen);
      }
    }

    // Warm-up execution, then the timed serving loop.
    auto outputs = runtime.Execute(inputs);
    auto t2 = std::chrono::steady_clock::now();
    for (int i = 0; i < iters; ++i) {
      outputs = runtime.Execute(inputs);
    }
    auto t3 = std::chrono::steady_clock::now();
    double per_exec =
        std::chrono::duration<double>(t3 - t2).count() / std::max(iters, 1);

    int64_t batch = input_shapes[0].empty() ? 1 : input_shapes[0][0];
    std::cout << "outputs=" << outputs.size();
    for (size_t i = 0; i < outputs.size(); ++i) {
      std::cout << " out" << i << "=[";
      for (size_t d = 0; d < outputs[i].dims.size(); ++d) {
        std::cout << (d ? "," : "") << outputs[i].dims[d];
      }
      std::cout << "]";
    }
    std::cout << "\n";
    double checksum = 0.0;
    if (!outputs.empty()) {
      for (float v : outputs.back().data) checksum += static_cast<double>(v);
    }
    std::cout << "exec_ms=" << per_exec * 1e3
              << " solves_per_s=" << static_cast<double>(batch) / per_exec
              << " batch=" << batch << " checksum=" << checksum << "\n";
  } catch (const std::exception& e) {
    std::cerr << "error: " << e.what() << "\n";
    return 1;
  }
  return 0;
}
