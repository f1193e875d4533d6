#include "pjrt_runtime.h"

#include <dlfcn.h>

#include <cstring>
#include <stdexcept>

namespace mas_native {

namespace {

std::string ErrorMessage(const PJRT_Api* api, PJRT_Error* error) {
  PJRT_Error_Message_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  args.error = error;
  api->PJRT_Error_Message(&args);
  return std::string(args.message, args.message_size);
}

void AwaitEvent(const PJRT_Api* api, PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args await_args;
  std::memset(&await_args, 0, sizeof(await_args));
  await_args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  await_args.event = event;
  PJRT_Error* err = api->PJRT_Event_Await(&await_args);
  if (err != nullptr) {
    std::string message = ErrorMessage(api, err);
    PJRT_Error_Destroy_Args destroy;
    std::memset(&destroy, 0, sizeof(destroy));
    destroy.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
    destroy.error = err;
    api->PJRT_Error_Destroy(&destroy);
    throw std::runtime_error(std::string(what) + ": " + message);
  }
  PJRT_Event_Destroy_Args destroy_event;
  std::memset(&destroy_event, 0, sizeof(destroy_event));
  destroy_event.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  destroy_event.event = event;
  api->PJRT_Event_Destroy(&destroy_event);
}

}  // namespace

void PjrtRuntime::Check(PJRT_Error* error, const char* what) const {
  if (error == nullptr) return;
  std::string message = ErrorMessage(api_, error);
  PJRT_Error_Destroy_Args destroy;
  std::memset(&destroy, 0, sizeof(destroy));
  destroy.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  destroy.error = error;
  api_->PJRT_Error_Destroy(&destroy);
  throw std::runtime_error(std::string(what) + ": " + message);
}

PjrtRuntime::PjrtRuntime(const std::string& plugin_path,
                         const std::vector<ClientOption>& options) {
  dl_handle_ = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (dl_handle_ == nullptr) {
    throw std::runtime_error(std::string("dlopen failed: ") + dlerror());
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(dl_handle_, "GetPjrtApi"));
  if (get_api == nullptr) {
    throw std::runtime_error("plugin does not export GetPjrtApi");
  }
  api_ = get_api();
  if (api_ == nullptr) {
    throw std::runtime_error("GetPjrtApi returned null");
  }

  // Optional in some plugins, required in others.
  if (api_->PJRT_Plugin_Initialize != nullptr) {
    PJRT_Plugin_Initialize_Args init_args;
    std::memset(&init_args, 0, sizeof(init_args));
    init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    Check(api_->PJRT_Plugin_Initialize(&init_args), "PJRT_Plugin_Initialize");
  }

  // Marshal named create options.
  std::vector<PJRT_NamedValue> named(options.size());
  for (size_t i = 0; i < options.size(); ++i) {
    std::memset(&named[i], 0, sizeof(PJRT_NamedValue));
    named[i].struct_size = PJRT_NamedValue_STRUCT_SIZE;
    named[i].name = options[i].name.c_str();
    named[i].name_size = options[i].name.size();
    if (options[i].is_string) {
      named[i].type = PJRT_NamedValue_kString;
      named[i].string_value = options[i].string_value.c_str();
      named[i].value_size = options[i].string_value.size();
    } else {
      named[i].type = PJRT_NamedValue_kInt64;
      named[i].int64_value = options[i].int64_value;
      named[i].value_size = 1;
    }
  }

  PJRT_Client_Create_Args create_args;
  std::memset(&create_args, 0, sizeof(create_args));
  create_args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  create_args.create_options = named.data();
  create_args.num_options = named.size();
  Check(api_->PJRT_Client_Create(&create_args), "PJRT_Client_Create");
  client_ = create_args.client;

  PJRT_Client_AddressableDevices_Args dev_args;
  std::memset(&dev_args, 0, sizeof(dev_args));
  dev_args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dev_args.client = client_;
  Check(api_->PJRT_Client_AddressableDevices(&dev_args),
        "PJRT_Client_AddressableDevices");
  devices_.assign(dev_args.addressable_devices,
                  dev_args.addressable_devices + dev_args.num_addressable_devices);
  if (devices_.empty()) {
    throw std::runtime_error("no addressable devices");
  }
}

PjrtRuntime::~PjrtRuntime() {
  if (executable_ != nullptr && api_ != nullptr) {
    PJRT_LoadedExecutable_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
    args.executable = executable_;
    api_->PJRT_LoadedExecutable_Destroy(&args);
  }
  if (client_ != nullptr && api_ != nullptr) {
    PJRT_Client_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    args.client = client_;
    api_->PJRT_Client_Destroy(&args);
  }
  if (dl_handle_ != nullptr) {
    dlclose(dl_handle_);
  }
}

std::string PjrtRuntime::platform_name() const {
  PJRT_Client_PlatformName_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  args.client = client_;
  Check(api_->PJRT_Client_PlatformName(&args), "PJRT_Client_PlatformName");
  return std::string(args.platform_name, args.platform_name_size);
}

int PjrtRuntime::api_major() const { return api_->pjrt_api_version.major_version; }
int PjrtRuntime::api_minor() const { return api_->pjrt_api_version.minor_version; }

void PjrtRuntime::Compile(const std::string& mlir_module,
                          const std::string& compile_options_proto) {
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(mlir_module.data());
  program.code_size = mlir_module.size();
  static constexpr char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args compile_args;
  std::memset(&compile_args, 0, sizeof(compile_args));
  compile_args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  compile_args.client = client_;
  compile_args.program = &program;
  compile_args.compile_options = compile_options_proto.data();
  compile_args.compile_options_size = compile_options_proto.size();
  Check(api_->PJRT_Client_Compile(&compile_args), "PJRT_Client_Compile");
  executable_ = compile_args.executable;
}

std::vector<HostArray> PjrtRuntime::Execute(
    const std::vector<HostArray>& inputs) {
  if (executable_ == nullptr) {
    throw std::runtime_error("Execute called before Compile");
  }
  PJRT_Device* device = devices_[0];

  // Host -> device transfers.
  std::vector<PJRT_Buffer*> arg_buffers(inputs.size());
  for (size_t i = 0; i < inputs.size(); ++i) {
    PJRT_Client_BufferFromHostBuffer_Args h2d;
    std::memset(&h2d, 0, sizeof(h2d));
    h2d.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    h2d.client = client_;
    h2d.data = inputs[i].data.data();
    h2d.type = PJRT_Buffer_Type_F32;
    h2d.dims = inputs[i].dims.data();
    h2d.num_dims = inputs[i].dims.size();
    h2d.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    h2d.device = device;
    Check(api_->PJRT_Client_BufferFromHostBuffer(&h2d),
          "PJRT_Client_BufferFromHostBuffer");
    AwaitEvent(api_, h2d.done_with_host_buffer, "h2d transfer");
    arg_buffers[i] = h2d.buffer;
  }

  // Execute on one device.
  PJRT_Buffer* const* arg_list = arg_buffers.data();

  PJRT_Executable_NumOutputs_Args num_out_args;
  std::memset(&num_out_args, 0, sizeof(num_out_args));
  num_out_args.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  PJRT_LoadedExecutable_GetExecutable_Args get_exec;
  std::memset(&get_exec, 0, sizeof(get_exec));
  get_exec.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  get_exec.loaded_executable = executable_;
  Check(api_->PJRT_LoadedExecutable_GetExecutable(&get_exec),
        "PJRT_LoadedExecutable_GetExecutable");
  num_out_args.executable = get_exec.executable;
  Check(api_->PJRT_Executable_NumOutputs(&num_out_args),
        "PJRT_Executable_NumOutputs");
  size_t num_outputs = num_out_args.num_outputs;

  std::vector<PJRT_Buffer*> output_buffers(num_outputs, nullptr);
  PJRT_Buffer** output_list = output_buffers.data();
  PJRT_Event* device_complete = nullptr;

  PJRT_ExecuteOptions exec_options;
  std::memset(&exec_options, 0, sizeof(exec_options));
  exec_options.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_LoadedExecutable_Execute_Args exec_args;
  std::memset(&exec_args, 0, sizeof(exec_args));
  exec_args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  exec_args.executable = executable_;
  exec_args.options = &exec_options;
  exec_args.argument_lists = &arg_list;
  exec_args.num_devices = 1;
  exec_args.num_args = arg_buffers.size();
  exec_args.output_lists = &output_list;
  exec_args.device_complete_events = &device_complete;
  exec_args.execute_device = device;
  Check(api_->PJRT_LoadedExecutable_Execute(&exec_args),
        "PJRT_LoadedExecutable_Execute");
  AwaitEvent(api_, device_complete, "device execution");

  // Device -> host transfers.
  std::vector<HostArray> outputs(num_outputs);
  for (size_t i = 0; i < num_outputs; ++i) {
    PJRT_Buffer_Dimensions_Args dims_args;
    std::memset(&dims_args, 0, sizeof(dims_args));
    dims_args.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    dims_args.buffer = output_buffers[i];
    Check(api_->PJRT_Buffer_Dimensions(&dims_args), "PJRT_Buffer_Dimensions");
    outputs[i].dims.assign(dims_args.dims, dims_args.dims + dims_args.num_dims);

    PJRT_Buffer_ToHostBuffer_Args d2h;
    std::memset(&d2h, 0, sizeof(d2h));
    d2h.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    d2h.src = output_buffers[i];
    Check(api_->PJRT_Buffer_ToHostBuffer(&d2h), "ToHostBuffer size query");
    outputs[i].data.resize(d2h.dst_size / sizeof(float));
    d2h.dst = outputs[i].data.data();
    Check(api_->PJRT_Buffer_ToHostBuffer(&d2h), "ToHostBuffer copy");
    AwaitEvent(api_, d2h.event, "d2h transfer");
  }

  // Release device buffers.
  for (PJRT_Buffer* buffer : arg_buffers) {
    PJRT_Buffer_Destroy_Args destroy;
    std::memset(&destroy, 0, sizeof(destroy));
    destroy.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    destroy.buffer = buffer;
    api_->PJRT_Buffer_Destroy(&destroy);
  }
  for (PJRT_Buffer* buffer : output_buffers) {
    PJRT_Buffer_Destroy_Args destroy;
    std::memset(&destroy, 0, sizeof(destroy));
    destroy.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    destroy.buffer = buffer;
    api_->PJRT_Buffer_Destroy(&destroy);
  }
  return outputs;
}

}  // namespace mas_native
