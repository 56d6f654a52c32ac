// Point-cloud voxelization (hard + dynamic), CPU-native.
//
// Same observable semantics as the reference op (orv/ops/voxelize):
//   - per-point voxel coords floor((p - range_lo) / voxel_size), points
//     outside the grid get (-1,-1,-1)
//   - coords are emitted REVERSED (z, y, x) like the OpenMMLab convention
//   - hard mode: first-come-first-served voxel slots, at most max_points
//     points per voxel, at most max_voxels voxels (deterministic in input
//     order — equivalent to the reference's `deterministic=True` path)
//
// Fresh implementation: flat open-addressing hash on the linearized grid
// index instead of a dense coor_to_voxelidx volume (the reference
// allocates the full grid; 400x400x400 int32 = 256MB — the hash keeps
// memory proportional to occupancy).
//
// extern "C" ABI for ctypes; no torch/pybind dependency.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct HashMap {
  // open addressing, power-of-two capacity
  std::vector<int64_t> keys;
  std::vector<int32_t> vals;
  size_t mask;

  explicit HashMap(size_t expected) {
    size_t cap = 64;
    while (cap < expected * 2) cap <<= 1;
    keys.assign(cap, -1);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  // returns slot value reference; inserts key with -1 if absent
  int32_t* find_or_insert(int64_t key) {
    size_t h = static_cast<size_t>(key * 0x9E3779B97F4A7C15ULL) & mask;
    while (true) {
      if (keys[h] == key) return &vals[h];
      if (keys[h] == -1) {
        keys[h] = key;
        return &vals[h];
      }
      h = (h + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

// points [num_points, num_features] (xyz first), coors out [num_points, 3]
// (z, y, x) int32 or -1s.
void dynamic_voxelize(const float* points, int32_t* coors, int num_points,
                      int num_features, const float* voxel_size,
                      const float* coors_range) {
  int grid[3];
  for (int j = 0; j < 3; ++j) {
    grid[j] = static_cast<int>(
        std::round((coors_range[3 + j] - coors_range[j]) / voxel_size[j]));
  }
  for (int i = 0; i < num_points; ++i) {
    const float* p = points + static_cast<int64_t>(i) * num_features;
    int c[3];
    bool ok = true;
    for (int j = 0; j < 3; ++j) {
      int v = static_cast<int>(std::floor((p[j] - coors_range[j]) / voxel_size[j]));
      if (v < 0 || v >= grid[j]) {
        ok = false;
        break;
      }
      c[2 - j] = v;  // reversed (z, y, x)
    }
    int32_t* out = coors + static_cast<int64_t>(i) * 3;
    if (ok) {
      out[0] = c[0];
      out[1] = c[1];
      out[2] = c[2];
    } else {
      out[0] = out[1] = out[2] = -1;
    }
  }
}

// Returns the number of voxels filled.
// voxels  [max_voxels, max_points, num_features] (zero-initialized by caller)
// coors   [max_voxels, 3]
// num_points_per_voxel [max_voxels]
int hard_voxelize(const float* points, float* voxels, int32_t* coors,
                  int32_t* num_points_per_voxel, int num_points,
                  int num_features, const float* voxel_size,
                  const float* coors_range, int max_points, int max_voxels) {
  int grid[3];
  for (int j = 0; j < 3; ++j) {
    grid[j] = static_cast<int>(
        std::round((coors_range[3 + j] - coors_range[j]) / voxel_size[j]));
  }
  const int64_t gy = grid[1], gx = grid[0];

  std::vector<int32_t> pt_coors(static_cast<size_t>(num_points) * 3);
  dynamic_voxelize(points, pt_coors.data(), num_points, num_features,
                   voxel_size, coors_range);

  // size by the point count: every distinct voxel inserts a key even when
  // max_voxels caps the stored ones, so capacity must bound distinct keys
  HashMap map(static_cast<size_t>(num_points) + 1);
  int voxel_num = 0;

  for (int i = 0; i < num_points; ++i) {
    const int32_t* c = &pt_coors[static_cast<size_t>(i) * 3];  // (z, y, x)
    if (c[0] == -1) continue;
    int64_t key = (static_cast<int64_t>(c[0]) * gy + c[1]) * gx + c[2];
    int32_t* slot = map.find_or_insert(key);
    int32_t vid = *slot;
    if (vid == -1) {
      if (max_voxels != -1 && voxel_num >= max_voxels) continue;
      vid = voxel_num++;
      *slot = vid;
      int32_t* vc = coors + static_cast<int64_t>(vid) * 3;
      vc[0] = c[0];
      vc[1] = c[1];
      vc[2] = c[2];
    }
    int32_t n = num_points_per_voxel[vid];
    if (max_points == -1 || n < max_points) {
      std::memcpy(voxels + (static_cast<int64_t>(vid) * max_points + n) * num_features,
                  points + static_cast<int64_t>(i) * num_features,
                  sizeof(float) * num_features);
      num_points_per_voxel[vid] = n + 1;
    }
  }
  return voxel_num;
}

}  // extern "C"
