// C ABI of the DragPoser-TPU native runtime library.
//
// Drop-in replacement for the reference DLL's export surface
// (DragPoserDLL/exportFunc.h:61-70): the same ten functions with the same
// POD argument layouts, so existing clients (e.g. the Unity C# P/Invoke
// wrapper) can switch by swapping the shared library.
//
// Implementation difference that matters: the per-frame drag step executes
// as ONE pre-compiled XLA device computation; the embedded interpreter only
// marshals pointers (the reference interprets PyTorch per frame).

#pragma once

#if defined(_WIN32)
#define DRAGPOSER_EXPORT __declspec(dllexport)
#else
#define DRAGPOSER_EXPORT __attribute__((visibility("default")))
#endif

extern "C" {

// POD layouts shared with the client (reference utils.h:13-41).
struct quaternion {
  float w, x, y, z;
};
struct float3 {
  float x, y, z;
};
struct float2 {
  float x, y;
};

struct DragPoser;  // opaque session handle

DRAGPOSER_EXPORT DragPoser* init_drag_poser();
DRAGPOSER_EXPORT void set_reference_skeleton(DragPoser* h, char* bvhPath);
DRAGPOSER_EXPORT void load_models(DragPoser* h, char* modelPath);
DRAGPOSER_EXPORT void set_mask_and_weights(DragPoser* h, float* mask,
                                           float2* weights);
DRAGPOSER_EXPORT void init_drag_model(DragPoser* h, float3 initialGlobalPos,
                                      quaternion initialGlobalRot);
DRAGPOSER_EXPORT void set_optim_params(DragPoser* h, float stopEpsPos,
                                       float stopEpsRot, int maxIter, float lr);
DRAGPOSER_EXPORT void set_lambdas(DragPoser* h, float lambdaRot,
                                  float lambdaTemporal,
                                  int temporalFutureWindow);
DRAGPOSER_EXPORT void set_global_pos(DragPoser* h, float3 globalPos);
DRAGPOSER_EXPORT void drag_pose(DragPoser* h, int nEndEffectors,
                                float3* targetEEPos, quaternion* targetEERot,
                                quaternion* resultPose,
                                float3* resultGlobalPos);
DRAGPOSER_EXPORT void destroy_drag_poser(DragPoser* h);

// Extension beyond the reference ABI: number of joints of the loaded
// skeleton (the reference returns it from set_reference_skeleton via the
// embedded object; clients hard-code 22).
DRAGPOSER_EXPORT int get_num_joints(DragPoser* h);
DRAGPOSER_EXPORT int get_num_end_effectors(DragPoser* h);

}  // extern "C"
