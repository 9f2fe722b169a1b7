// Native smoke test: three full session lifecycles against the real model
// directory — init → skeleton → models → 6-tracker mask/weights → optimizer
// params → one drag_pose with fixed tracker targets → destroy.
// Mirrors the reference debug executable (DragPoserDLL/main.cpp:10-41);
// exercises interpreter embedding, the ABI, and leak-free re-init.
//
// Usage: dragposer_smoke <model_dir> <skeleton_bvh> [n_cycles]

#include <cstdio>
#include <cstdlib>
#include <cstring>

#ifdef DRAGPOSER_REFCHECK_HEADER
// ABI drop-in proof: compile this SAME smoke client against the reference's
// unmodified header (DragPoserDLL/exportFunc.h, pybind11 satisfied by
// refcheck_stubs/) and link libdragposer_tpu_native.so.  If our exported
// signatures or POD layouts drifted from the reference's, this target
// fails to link or the run produces garbage below.
#include "exportFunc.h"
#else
#include "dragposer_abi.h"
#endif

// both headers must agree on the POD layouts the ABI passes by value/pointer
static_assert(sizeof(quaternion) == 16, "quaternion layout");
static_assert(sizeof(float3) == 12, "float3 layout");
static_assert(sizeof(float2) == 8, "float2 layout");

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <model_dir> <skeleton_bvh> [n_cycles]\n",
                 argv[0]);
    return 2;
  }
  char* model_dir = argv[1];
  char* skeleton = argv[2];
  const int cycles = argc > 3 ? std::atoi(argv[3]) : 3;

  for (int c = 0; c < cycles; ++c) {
    std::printf("cycle %d\n", c);
    DragPoser* h = init_drag_poser();
    if (!h) {
      std::fprintf(stderr, "init_drag_poser failed\n");
      return 1;
    }
    set_reference_skeleton(h, skeleton);
#ifdef DRAGPOSER_REFCHECK_HEADER
    const int j = 22;  // the reference ABI exposes no joint-count export
#else
    const int j = get_num_joints(h);
#endif
    std::printf("  joints: %d\n", j);
    if (j <= 0) return 1;
    load_models(h, model_dir);

    // 6-tracker configuration: hips, feet, head, wrists
    float mask[22] = {0};
    mask[0] = mask[3] = mask[7] = mask[13] = mask[17] = mask[21] = 1.0f;
    float2 weights[22];
    for (int i = 0; i < 22; ++i) weights[i] = {1.0f, 0.01f};
    weights[0] = {10.0f, 10.0f};
    weights[3] = weights[7] = weights[13] = weights[17] = weights[21] =
        {5.0f, 0.01f};
    set_mask_and_weights(h, mask, weights);
#ifdef DRAGPOSER_REFCHECK_HEADER
    const int e = 6;  // count export is our extension, not in the ref header
#else
    const int e = get_num_end_effectors(h);
#endif
    std::printf("  end effectors: %d\n", e);
    if (e != 6) return 1;

    init_drag_model(h, {0, 0, 0}, {1, 0, 0, 0});
    set_optim_params(h, 1e-4f, 0.01f, /*maxIter=*/10, /*lr=*/0.01f);
    set_lambdas(h, 1.0f, 0.02f, /*temporalFutureWindow=*/60);
    set_global_pos(h, {0, 0, 0});

    float3 ee_pos[6] = {{0.0f, 0.05f, 0.0f},   {0.1f, 0.1f, -0.9f},
                        {-0.1f, 0.1f, -0.9f},  {0.0f, 0.05f, 0.65f},
                        {0.45f, 0.05f, 0.35f}, {-0.45f, 0.05f, 0.35f}};
    quaternion ee_rot[6];
    for (int i = 0; i < 6; ++i) ee_rot[i] = {1, 0, 0, 0};
    quaternion pose[22];
    float3 global_pos[1];
    std::memset(pose, 0, sizeof(pose));

    for (int f = 0; f < 3; ++f) {
      drag_pose(h, 6, ee_pos, ee_rot, pose, global_pos);
    }
    float norm = pose[1].w * pose[1].w + pose[1].x * pose[1].x +
                 pose[1].y * pose[1].y + pose[1].z * pose[1].z;
    std::printf("  pose[1] quat norm: %.4f; root pos (%.3f %.3f %.3f)\n",
                norm, global_pos[0].x, global_pos[0].y, global_pos[0].z);
    if (norm < 0.5f || norm > 2.0f) {
      std::fprintf(stderr, "drag_pose produced a non-unit quaternion\n");
      return 1;
    }
    destroy_drag_poser(h);
  }
  std::printf("smoke OK\n");
  return 0;
}
