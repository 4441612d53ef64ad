// pjrt_runner — deploy-without-Python smoke test for exported detectors.
//
// TPU-native equivalent of the reference's libtorch C++ tracing test
// (reference test/tracing/test_demonet_tracing.cpp:1-60: torch::jit::load a
// TorchScript detector and run it from C++). Here the artifact is StableHLO
// MLIR produced by demonet_tpu.export (save_stablehlo_text) and the runtime
// is any PJRT plugin (libtpu.so on a TPU VM; a CPU PJRT plugin elsewhere),
// loaded through the stable PJRT C API — no Python, no framework.
//
// Usage:
//   pjrt_runner <plugin.so> <model.mlir> <NxHxWxC> [iters] [compile_opts.pb]
//               [key=value ...]
//   e.g. pjrt_runner /lib/libtpu.so ssdlite320.mlir 1x320x320x3 100
//   Trailing key=value pairs become PJRT_Client_Create named options
//   (integers -> kInt64, everything else -> kString); plugins like the
//   axon tunnel need e.g. topology=v5e:1x1x1 session_id=<uuid>
//   remote_compile=1.
//
// Prints per-iteration latency and the output buffer arities — enough to
// smoke-test an exported model end-to-end from C++ and to benchmark the
// serving path without the Python layer.

#include <dlfcn.h>

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

std::string ErrorMessage(PJRT_Error* err) {
  PJRT_Error_Message_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  args.error = err;
  g_api->PJRT_Error_Message(&args);
  std::string msg(args.message, args.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  return msg;
}

#define CHECK_PJRT(expr)                                              \
  do {                                                                \
    PJRT_Error* _err = (expr);                                        \
    if (_err != nullptr) {                                            \
      std::fprintf(stderr, "PJRT error at %s:%d: %s\n", __FILE__,     \
                   __LINE__, ErrorMessage(_err).c_str());             \
      return 1;                                                       \
    }                                                                 \
  } while (0)

bool AwaitEvent(PJRT_Event* event) {
  PJRT_Event_Await_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  PJRT_Error* err = g_api->PJRT_Event_Await(&args);
  if (err) {
    std::fprintf(stderr, "event error: %s\n", ErrorMessage(err).c_str());
    return false;
  }
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  g_api->PJRT_Event_Destroy(&dargs);
  return true;
}

// Copy a device buffer to host in DENSE ROW-MAJOR layout. Without an
// explicit host_layout, ToHostBuffer uses the device buffer's layout —
// on TPU that is often transposed/tiled (verified: (300,4) boxes came
// back as (4,300)), which would silently corrupt consumers.
bool FetchToHostRowMajor(PJRT_Buffer* src, std::vector<char>* out) {
  PJRT_Buffer_Dimensions_Args dims_args;
  std::memset(&dims_args, 0, sizeof(dims_args));
  dims_args.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
  dims_args.buffer = src;
  if (PJRT_Error* err = g_api->PJRT_Buffer_Dimensions(&dims_args)) {
    std::fprintf(stderr, "dims error: %s\n", ErrorMessage(err).c_str());
    return false;
  }
  std::vector<int64_t> minor_to_major(dims_args.num_dims);
  for (size_t i = 0; i < dims_args.num_dims; ++i) {
    minor_to_major[i] = static_cast<int64_t>(dims_args.num_dims - 1 - i);
  }
  PJRT_Buffer_MemoryLayout layout;
  std::memset(&layout, 0, sizeof(layout));
  layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
  layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
  layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
  layout.tiled.minor_to_major = minor_to_major.data();
  layout.tiled.minor_to_major_size = minor_to_major.size();

  PJRT_Buffer_ToHostBuffer_Args d2h;
  std::memset(&d2h, 0, sizeof(d2h));
  d2h.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  d2h.src = src;
  d2h.host_layout = &layout;
  if (PJRT_Error* err = g_api->PJRT_Buffer_ToHostBuffer(&d2h)) {  // size query
    std::fprintf(stderr, "d2h size error: %s\n", ErrorMessage(err).c_str());
    return false;
  }
  out->resize(d2h.dst_size);
  d2h.dst = out->data();
  if (PJRT_Error* err = g_api->PJRT_Buffer_ToHostBuffer(&d2h)) {
    std::fprintf(stderr, "d2h error: %s\n", ErrorMessage(err).c_str());
    return false;
  }
  return AwaitEvent(d2h.event);
}

std::string ReadFile(const char* path) {
  std::ifstream f(path, std::ios::binary);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

std::vector<int64_t> ParseShape(const char* spec) {
  std::vector<int64_t> dims;
  std::string s(spec);
  size_t pos = 0;
  while (pos < s.size()) {
    size_t x = s.find('x', pos);
    if (x == std::string::npos) x = s.size();
    dims.push_back(std::stoll(s.substr(pos, x - pos)));
    pos = x + 1;
  }
  return dims;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <pjrt_plugin.so> <model.mlir> <NxHxWxC> "
                 "[iters] [compile_options.pb]\n",
                 argv[0]);
    return 2;
  }
  const char* plugin_path = argv[1];
  const char* model_path = argv[2];
  std::vector<int64_t> dims = ParseShape(argv[3]);
  int iters = 10;
  std::string compile_opts;
  // positional [iters] [compile_opts.pb], then key=value create options.
  // dump_out=<prefix> is consumed by the runner itself: raw bytes of every
  // output land in <prefix>.<i>.bin for parity checks against Python.
  std::vector<std::pair<std::string, std::string>> create_kv;
  std::string dump_prefix;
  std::string input_file;  // raw f32 bytes; zeros if absent
  int positional = 0;
  for (int i = 4; i < argc; ++i) {
    std::string a(argv[i]);
    size_t eq = a.find('=');
    if (eq != std::string::npos) {
      if (a.substr(0, eq) == "dump_out") {
        dump_prefix = a.substr(eq + 1);
      } else if (a.substr(0, eq) == "input_file") {
        input_file = a.substr(eq + 1);
      } else {
        create_kv.emplace_back(a.substr(0, eq), a.substr(eq + 1));
      }
    } else if (positional == 0) {
      iters = std::atoi(argv[i]);
      ++positional;
    } else {
      compile_opts = ReadFile(argv[i]);
      ++positional;
    }
  }

  void* lib = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (!lib) {
    std::fprintf(stderr, "dlopen(%s) failed: %s\n", plugin_path, dlerror());
    return 1;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(lib, "GetPjrtApi"));
  if (!get_api) {
    std::fprintf(stderr, "GetPjrtApi not found in %s\n", plugin_path);
    return 1;
  }
  g_api = get_api();
  std::printf("PJRT API version %d.%d\n", g_api->pjrt_api_version.major_version,
              g_api->pjrt_api_version.minor_version);

  if (g_api->PJRT_Plugin_Initialize) {
    PJRT_Plugin_Initialize_Args init_args;
    std::memset(&init_args, 0, sizeof(init_args));
    init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    CHECK_PJRT(g_api->PJRT_Plugin_Initialize(&init_args));
  }

  // --- client + device ---
  // Build PJRT named values from trailing key=value args. Integer-looking
  // values go as kInt64 (the axon plugin's remote_compile/local_only/
  // priority/n_slices), the rest as kString (topology, session_id).
  std::vector<int64_t> int_store;
  int_store.reserve(create_kv.size());
  std::vector<PJRT_NamedValue> named;
  named.reserve(create_kv.size());
  for (auto& kv : create_kv) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = kv.first.c_str();
    nv.name_size = kv.first.size();
    const std::string& v = kv.second;
    bool is_int = !v.empty() &&
                  v.find_first_not_of("0123456789-") == std::string::npos;
    if (is_int) {
      int_store.push_back(std::stoll(v));
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = int_store.back();
      nv.value_size = 1;
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = v.c_str();
      nv.value_size = v.size();
    }
    named.push_back(nv);
  }
  PJRT_Client_Create_Args create;
  std::memset(&create, 0, sizeof(create));
  create.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  create.create_options = named.empty() ? nullptr : named.data();
  create.num_options = named.size();
  CHECK_PJRT(g_api->PJRT_Client_Create(&create));
  PJRT_Client* client = create.client;

  PJRT_Client_AddressableDevices_Args dev_args;
  std::memset(&dev_args, 0, sizeof(dev_args));
  dev_args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dev_args.client = client;
  CHECK_PJRT(g_api->PJRT_Client_AddressableDevices(&dev_args));
  if (dev_args.num_addressable_devices == 0) {
    std::fprintf(stderr, "no addressable devices\n");
    return 1;
  }
  PJRT_Device* device = dev_args.addressable_devices[0];
  std::printf("devices: %zu\n", dev_args.num_addressable_devices);

  // --- compile StableHLO ---
  std::string code = ReadFile(model_path);
  if (code.empty()) {
    std::fprintf(stderr, "empty model file %s\n", model_path);
    return 1;
  }
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = code.data();
  program.code_size = code.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args compile;
  std::memset(&compile, 0, sizeof(compile));
  compile.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  compile.client = client;
  compile.program = &program;
  compile.compile_options = compile_opts.data();
  compile.compile_options_size = compile_opts.size();
  auto t0 = std::chrono::steady_clock::now();
  CHECK_PJRT(g_api->PJRT_Client_Compile(&compile));
  auto compile_ms = std::chrono::duration<double, std::milli>(
                        std::chrono::steady_clock::now() - t0)
                        .count();
  std::printf("compiled in %.1f ms\n", compile_ms);
  PJRT_LoadedExecutable* executable = compile.executable;

  // --- input buffer (zeros, f32, dense layout) ---
  int64_t numel = 1;
  for (int64_t d : dims) numel *= d;
  std::vector<float> host_input(static_cast<size_t>(numel), 0.0f);
  if (!input_file.empty()) {
    std::string raw = ReadFile(input_file.c_str());
    if (raw.size() != host_input.size() * sizeof(float)) {
      std::fprintf(stderr, "input_file %s has %zu bytes, want %zu\n",
                   input_file.c_str(), raw.size(),
                   host_input.size() * sizeof(float));
      return 1;
    }
    std::memcpy(host_input.data(), raw.data(), raw.size());
  }

  PJRT_Client_BufferFromHostBuffer_Args h2d;
  std::memset(&h2d, 0, sizeof(h2d));
  h2d.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  h2d.client = client;
  h2d.data = host_input.data();
  h2d.type = PJRT_Buffer_Type_F32;
  h2d.dims = dims.data();
  h2d.num_dims = dims.size();
  h2d.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  h2d.device = device;
  CHECK_PJRT(g_api->PJRT_Client_BufferFromHostBuffer(&h2d));
  if (!AwaitEvent(h2d.done_with_host_buffer)) return 1;
  PJRT_Buffer* input = h2d.buffer;

  // --- output arity ---
  PJRT_LoadedExecutable_GetExecutable_Args get_exec;
  std::memset(&get_exec, 0, sizeof(get_exec));
  get_exec.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  get_exec.loaded_executable = executable;
  CHECK_PJRT(g_api->PJRT_LoadedExecutable_GetExecutable(&get_exec));
  PJRT_Executable_NumOutputs_Args num_out;
  std::memset(&num_out, 0, sizeof(num_out));
  num_out.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  num_out.executable = get_exec.executable;
  CHECK_PJRT(g_api->PJRT_Executable_NumOutputs(&num_out));
  size_t num_outputs = num_out.num_outputs;
  std::printf("outputs: %zu\n", num_outputs);

  // --- execute loop ---
  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  std::vector<PJRT_Buffer*> outputs(num_outputs, nullptr);
  PJRT_Buffer* const arg_list[] = {input};
  PJRT_Buffer* const* const argument_lists[] = {arg_list};
  PJRT_Buffer** output_lists[] = {outputs.data()};
  PJRT_Event* device_complete = nullptr;

  std::vector<double> iter_ms;
  iter_ms.reserve(iters);
  double best_ms = 1e30, total_ms = 0.0;
  for (int i = 0; i < iters; ++i) {
    PJRT_LoadedExecutable_Execute_Args exec;
    std::memset(&exec, 0, sizeof(exec));
    exec.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    exec.executable = executable;
    exec.options = &opts;
    exec.argument_lists = argument_lists;
    exec.num_devices = 1;
    exec.num_args = 1;
    exec.output_lists = output_lists;
    exec.device_complete_events = &device_complete;

    auto it0 = std::chrono::steady_clock::now();
    CHECK_PJRT(g_api->PJRT_LoadedExecutable_Execute(&exec));
    if (!AwaitEvent(device_complete)) return 1;
    // Execute (and even device_complete on some plugins) is async;
    // fetching an output to host is the only honest completion barrier,
    // so the device->host copy of output[0] is inside the timed region
    // (it is a few KB of detections — negligible transfer).
    if (num_outputs > 0) {
      std::vector<char> host_out;
      if (!FetchToHostRowMajor(outputs[0], &host_out)) return 1;
      if (i == 0) {
        std::printf("output[0]: %zu bytes fetched to host\n",
                    host_out.size());
      }
    }
    // first iteration: optionally dump ALL outputs for parity checking
    if (i == 0 && !dump_prefix.empty()) {
      for (size_t oi = 0; oi < num_outputs; ++oi) {
        std::vector<char> host_out;
        if (!FetchToHostRowMajor(outputs[oi], &host_out)) return 1;
        std::string path = dump_prefix + "." + std::to_string(oi) + ".bin";
        std::ofstream of(path, std::ios::binary);
        of.write(host_out.data(), host_out.size());
        std::printf("dumped output[%zu] (%zu bytes) -> %s\n", oi,
                    host_out.size(), path.c_str());
      }
    }
    double ms = std::chrono::duration<double, std::milli>(
                    std::chrono::steady_clock::now() - it0)
                    .count();
    total_ms += ms;
    iter_ms.push_back(ms);
    if (ms < best_ms) best_ms = ms;
    for (PJRT_Buffer* b : outputs) {
      if (!b) continue;
      PJRT_Buffer_Destroy_Args bd;
      std::memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = b;
      CHECK_PJRT(g_api->PJRT_Buffer_Destroy(&bd));
    }
  }
  std::sort(iter_ms.begin(), iter_ms.end());
  double p50 = iter_ms.empty() ? 0.0 : iter_ms[iter_ms.size() / 2];
  std::printf("ran %d iters: best %.3f ms, p50 %.3f ms, mean %.3f ms\n",
              iters, best_ms, p50, total_ms / iters);

  PJRT_Client_Destroy_Args cd;
  std::memset(&cd, 0, sizeof(cd));
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = client;
  CHECK_PJRT(g_api->PJRT_Client_Destroy(&cd));
  std::printf("OK\n");
  return 0;
}
