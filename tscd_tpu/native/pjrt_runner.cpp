// Standalone C++ PJRT runner: load a StableHLO artifact exported by
// tools/export.py (--raw), run it on any PJRT plugin (TPU: libtpu.so /
// the axon tunnel plugin; any other GetPjrtApi .so), then decode + NMS
// the raw YOLOX head output with the same native code the python tests
// pin (yolox_deploy.cpp yolox_decode_nms).
//
// This is the TPU-native equivalent of the reference's C++ deployment
// demos (demo/TensorRT/cpp/yolox.cpp:530 — engine load, enqueue, host
// readback, decode grids/strides, NMS, print): PJRT is the runtime,
// StableHLO is the engine format, one binary serves every XLA backend.
//
// Build (test_pjrt_runner.py does this):
//   g++ -O2 -std=c++17 pjrt_runner.cpp yolox_deploy.cpp -ldl \
//       -I<dir containing xla/pjrt/c/pjrt_c_api.h> -o pjrt_runner
//
// Usage:
//   pjrt_runner --plugin /opt/axon/libaxon_pjrt.so \
//       --module yolox.stablehlo.mlir --height 128 --width 128 \
//       --classes 5 [--input img.f32] [--dump-raw raw.f32] \
//       [--conf 0.25] [--nms 0.45] [--max-out 30]
//
// --input is a raw float32 NHWC (1,H,W,3) blob (0-255 pixels); without
// it a deterministic synthetic image is generated (same formula as the
// python golden test). Detections print as:
//   det <x1> <y1> <x2> <y2> <score> <cls>

#include <dlfcn.h>

#include <cinttypes>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

extern "C" int32_t yolox_decode_nms(
    const float* raw, int64_t A, int64_t C, const int32_t* hw,
    const int32_t* strides, int64_t L, float conf_thresh,
    float nms_thresh, int32_t max_out, float* out);

namespace {

const PJRT_Api* g_api = nullptr;

[[noreturn]] void die(const std::string& msg) {
  std::fprintf(stderr, "pjrt_runner: %s\n", msg.c_str());
  std::exit(1);
}

void check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  std::string msg = what;
  PJRT_Error_Message_Args margs{};
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  msg += ": ";
  msg.append(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs{};
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  die(msg);
}

void await_event(PJRT_Event* ev, const char* what) {
  PJRT_Event_Await_Args args{};
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = ev;
  check(g_api->PJRT_Event_Await(&args), what);
  PJRT_Event_Destroy_Args dargs{};
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = ev;
  g_api->PJRT_Event_Destroy(&dargs);
}

std::string read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) die("cannot read " + path);
  return std::string((std::istreambuf_iterator<char>(f)),
                     std::istreambuf_iterator<char>());
}

// Minimal serialized xla CompileOptionsProto:
//   executable_build_options (field 3) {
//     num_replicas (field 4) = 1; num_partitions (field 5) = 1; }
// (field numbers: xla/pjrt/proto/compile_options.pb.h)
const char kCompileOptions[] = {0x1a, 0x04, 0x20, 0x01, 0x28, 0x01};

}  // namespace

int main(int argc, char** argv) {
  std::string plugin_path, module_path, input_path, dump_raw;
  std::vector<std::string> opt_keys, opt_vals;
  std::vector<bool> opt_is_int;
  int H = 128, W = 128, C = 5, max_out = 30;
  float conf = 0.25f, nms = 0.45f;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (++i >= argc) die("missing value for " + a);
      return argv[i];
    };
    if (a == "--plugin") plugin_path = next();
    else if (a == "--module") module_path = next();
    else if (a == "--input") input_path = next();
    else if (a == "--dump-raw") dump_raw = next();
    else if (a == "--height") H = std::atoi(next().c_str());
    else if (a == "--width") W = std::atoi(next().c_str());
    else if (a == "--classes") C = std::atoi(next().c_str());
    else if (a == "--conf") conf = std::atof(next().c_str());
    else if (a == "--nms") nms = std::atof(next().c_str());
    else if (a == "--max-out") max_out = std::atoi(next().c_str());
    else if (a == "--set-str" || a == "--set-int") {
      // plugin create options (PJRT_NamedValue): some plugins need
      // deployment-specific options (e.g. a topology or session key)
      std::string kv = next();
      auto eq = kv.find('=');
      if (eq == std::string::npos) die("--set-*: expected key=value");
      opt_keys.push_back(kv.substr(0, eq));
      opt_vals.push_back(kv.substr(eq + 1));
      opt_is_int.push_back(a == "--set-int");
    } else if (a == "--help" || a == "-h") {
      std::printf("usage: pjrt_runner --plugin <pjrt.so> --module "
                  "<stablehlo.mlir> [--height H --width W --classes C "
                  "--input img.f32 --dump-raw raw.f32 --conf x --nms x "
                  "--max-out n --set-str k=v --set-int k=v]\n");
      return 0;
    } else {
      die("unknown arg " + a);
    }
  }
  if (plugin_path.empty() || module_path.empty())
    die("--plugin and --module are required (see --help)");

  // --- plugin ----------------------------------------------------------
  void* handle = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!handle) die(std::string("dlopen: ") + dlerror());
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) die("plugin has no GetPjrtApi symbol");
  g_api = get_api();
  if (!g_api) die("GetPjrtApi returned null");
  std::fprintf(stderr, "pjrt api %d.%d\n",
               g_api->pjrt_api_version.major_version,
               g_api->pjrt_api_version.minor_version);

  PJRT_Plugin_Initialize_Args init_args{};
  init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  check(g_api->PJRT_Plugin_Initialize(&init_args), "plugin init");

  // --- client + device -------------------------------------------------
  std::vector<int64_t> int_vals(opt_keys.size());
  std::vector<PJRT_NamedValue> create_opts(opt_keys.size());
  for (size_t i = 0; i < opt_keys.size(); ++i) {
    PJRT_NamedValue& nv = create_opts[i];
    nv = PJRT_NamedValue{};
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = opt_keys[i].c_str();
    nv.name_size = opt_keys[i].size();
    if (opt_is_int[i]) {
      int_vals[i] = std::strtoll(opt_vals[i].c_str(), nullptr, 0);
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = int_vals[i];
      nv.value_size = 1;
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = opt_vals[i].c_str();
      nv.value_size = opt_vals[i].size();
    }
  }

  PJRT_Client_Create_Args client_args{};
  client_args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  client_args.create_options = create_opts.data();
  client_args.num_options = create_opts.size();
  check(g_api->PJRT_Client_Create(&client_args), "client create");
  PJRT_Client* client = client_args.client;

  PJRT_Client_AddressableDevices_Args dev_args{};
  dev_args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dev_args.client = client;
  check(g_api->PJRT_Client_AddressableDevices(&dev_args), "devices");
  if (dev_args.num_addressable_devices == 0) die("no devices");
  PJRT_Device* device = dev_args.addressable_devices[0];
  std::fprintf(stderr, "devices: %zu\n",
               dev_args.num_addressable_devices);

  // --- compile ---------------------------------------------------------
  std::string module = read_file(module_path);
  PJRT_Program program{};
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = module.data();
  program.code_size = module.size();
  const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args compile_args{};
  compile_args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  compile_args.client = client;
  compile_args.program = &program;
  compile_args.compile_options = kCompileOptions;
  compile_args.compile_options_size = sizeof(kCompileOptions);
  check(g_api->PJRT_Client_Compile(&compile_args), "compile");
  PJRT_LoadedExecutable* exec = compile_args.executable;
  std::fprintf(stderr, "compiled %s (%zu bytes)\n", module_path.c_str(),
               module.size());

  // --- input -----------------------------------------------------------
  const size_t n_in = size_t(1) * H * W * 3;
  std::vector<float> img(n_in);
  if (!input_path.empty()) {
    std::string blob = read_file(input_path);
    if (blob.size() != n_in * sizeof(float))
      die("--input size mismatch: got " + std::to_string(blob.size()) +
          " bytes, want " + std::to_string(n_in * sizeof(float)));
    std::memcpy(img.data(), blob.data(), blob.size());
  } else {
    // deterministic synthetic image; keep in sync with the python
    // golden (tests/test_pjrt_runner.py synth_image)
    for (size_t i = 0; i < n_in; ++i)
      img[i] = float((i * 2654435761u) % 256u);
  }

  const int64_t dims[4] = {1, H, W, 3};
  PJRT_Client_BufferFromHostBuffer_Args h2d{};
  h2d.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  h2d.client = client;
  h2d.data = img.data();
  h2d.type = PJRT_Buffer_Type_F32;
  h2d.dims = dims;
  h2d.num_dims = 4;
  h2d.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  h2d.device = device;
  check(g_api->PJRT_Client_BufferFromHostBuffer(&h2d), "h2d");
  await_event(h2d.done_with_host_buffer, "h2d done");
  PJRT_Buffer* in_buf = h2d.buffer;

  // --- execute ---------------------------------------------------------
  PJRT_ExecuteOptions opts{};
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer* arg_list[1] = {in_buf};
  PJRT_Buffer* const* arg_lists[1] = {arg_list};
  PJRT_Buffer* out_list[1] = {nullptr};
  PJRT_Buffer** out_lists[1] = {out_list};
  PJRT_Event* done[1] = {nullptr};

  PJRT_LoadedExecutable_Execute_Args run{};
  run.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  run.executable = exec;
  run.options = &opts;
  run.argument_lists = arg_lists;
  run.num_devices = 1;
  run.num_args = 1;
  run.output_lists = out_lists;
  run.device_complete_events = done;
  check(g_api->PJRT_LoadedExecutable_Execute(&run), "execute");
  await_event(done[0], "execute done");
  PJRT_Buffer* out_buf = out_list[0];

  // --- readback --------------------------------------------------------
  PJRT_Buffer_Dimensions_Args bd{};
  bd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
  bd.buffer = out_buf;
  check(g_api->PJRT_Buffer_Dimensions(&bd), "out dims");
  int64_t A = 0, K = 0;
  if (bd.num_dims == 3) {           // (B, A, 5+C)
    A = bd.dims[1];
    K = bd.dims[2];
  } else {
    die("unexpected output rank " + std::to_string(bd.num_dims));
  }
  if (K != 5 + C)
    die("output K=" + std::to_string(K) + " but --classes says " +
        std::to_string(5 + C));

  // explicit dense row-major host layout: with host_layout nullptr the
  // readback uses the SOURCE buffer's layout, which on TPU is tiled —
  // the bytes would come back reordered. Expressed as a tile-less
  // Tiled layout (minor_to_major = [n-1..0]), the form jaxlib itself
  // passes; this plugin rejects the Strides form.
  std::vector<int64_t> m2m(bd.num_dims);
  for (size_t i = 0; i < bd.num_dims; ++i)
    m2m[i] = int64_t(bd.num_dims) - 1 - int64_t(i);
  PJRT_Buffer_MemoryLayout host_layout{};
  host_layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
  host_layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
  host_layout.tiled.struct_size =
      PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
  host_layout.tiled.minor_to_major = m2m.data();
  host_layout.tiled.minor_to_major_size = m2m.size();

  PJRT_Buffer_ToHostBuffer_Args d2h{};
  d2h.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  d2h.src = out_buf;
  d2h.host_layout = &host_layout;
  check(g_api->PJRT_Buffer_ToHostBuffer(&d2h), "d2h size");
  std::vector<float> raw(d2h.dst_size / sizeof(float));
  d2h.dst = raw.data();
  check(g_api->PJRT_Buffer_ToHostBuffer(&d2h), "d2h");
  await_event(d2h.event, "d2h done");
  std::fprintf(stderr, "output (1, %" PRId64 ", %" PRId64 ")\n", A, K);

  if (!dump_raw.empty()) {
    std::ofstream f(dump_raw, std::ios::binary);
    f.write(reinterpret_cast<const char*>(raw.data()),
            raw.size() * sizeof(float));
  }

  // --- decode + NMS (shared with the ctypes path) ----------------------
  std::vector<int32_t> hw, strides;
  for (int s : {8, 16, 32}) {
    hw.push_back(H / s);
    hw.push_back(W / s);
    strides.push_back(s);
  }
  int64_t expect_a = 0;
  for (size_t l = 0; l < strides.size(); ++l)
    expect_a += int64_t(hw[2 * l]) * hw[2 * l + 1];
  if (expect_a != A)
    die("anchor count mismatch: module says " + std::to_string(A) +
        ", grids say " + std::to_string(expect_a));

  std::vector<float> dets(size_t(max_out) * 7);
  int32_t n = yolox_decode_nms(raw.data(), A, C, hw.data(),
                               strides.data(), (int64_t)strides.size(),
                               conf, nms, max_out, dets.data());
  std::printf("detections %d\n", n);
  for (int32_t i = 0; i < n; ++i) {
    const float* d = &dets[size_t(i) * 7];
    std::printf("det %.2f %.2f %.2f %.2f %.4f %d\n", d[0], d[1], d[2],
                d[3], d[4] * d[5], (int)d[6]);
  }
  return 0;
}
