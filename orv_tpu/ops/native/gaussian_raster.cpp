// Tile-based 3D Gaussian splat rasterizer (forward), CPU-native.
//
// Capability-equivalent to the reference's CUDA fork
// (orv/ops/diff-gaussian-rasterization): renders per-pixel color (3ch),
// semantic feature (12ch), expected depth, and alpha from 3D gaussians via
// EWA projection + front-to-back alpha blending. Forward only — the
// reference's offline occupancy-render path never backpropagates through
// the rasterizer (gs_render.py discards gradients).
//
// Fresh design: 16x16 tile binning with per-tile index lists built from a
// global depth-ordered gaussian sort (counting-sort by tile after an
// argsort by view depth), then per-tile blending. extern "C" for ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr int TILE = 16;
constexpr int NUM_FEAT = 12;  // semantic channels (reference config.h)

struct Mat3 {
  float m[9];
};

inline void quat_to_rotmat(const float* q, float* R) {
  // (w, x, y, z), normalized by caller
  float w = q[0], x = q[1], y = q[2], z = q[3];
  R[0] = 1 - 2 * (y * y + z * z);
  R[1] = 2 * (x * y - w * z);
  R[2] = 2 * (x * z + w * y);
  R[3] = 2 * (x * y + w * z);
  R[4] = 1 - 2 * (x * x + z * z);
  R[5] = 2 * (y * z - w * x);
  R[6] = 2 * (x * z - w * y);
  R[7] = 2 * (y * z + w * x);
  R[8] = 1 - 2 * (x * x + y * y);
}

}  // namespace

extern "C" {

// All matrices row-major. viewmatrix: world->camera [4x4]; projmatrix:
// full (view @ proj) [4x4] mapping world->clip.
// outputs: color [3,H,W], feature [NUM_FEAT,H,W], depth [H,W], alpha [H,W],
// radii [N] int32.
void rasterize_gaussians(
    const float* means3d,     // [N, 3]
    const float* colors,      // [N, 3]
    const float* features,    // [N, NUM_FEAT] (may be null)
    const float* opacities,   // [N]
    const float* scales,      // [N, 3]
    const float* rotations,   // [N, 4] quaternions (w,x,y,z)
    int num_gaussians,
    const float* viewmatrix,  // [16]
    const float* projmatrix,  // [16]
    const float* bg_color,    // [3]
    float tan_fovx, float tan_fovy, int height, int width,
    float scale_modifier,
    float* out_color, float* out_feature, float* out_depth, float* out_alpha,
    int32_t* out_radii) {
  const float focal_x = width / (2.0f * tan_fovx);
  const float focal_y = height / (2.0f * tan_fovy);

  std::vector<float> px(num_gaussians), py(num_gaussians), pz(num_gaussians);
  std::vector<float> conic(static_cast<size_t>(num_gaussians) * 3);
  std::vector<int> rect(static_cast<size_t>(num_gaussians) * 4);
  std::vector<uint8_t> valid(num_gaussians, 0);

  const float* V = viewmatrix;
  const float* P = projmatrix;

  for (int i = 0; i < num_gaussians; ++i) {
    const float* p = means3d + i * 3;
    // view-space position
    float tx = V[0] * p[0] + V[1] * p[1] + V[2] * p[2] + V[3];
    float ty = V[4] * p[0] + V[5] * p[1] + V[6] * p[2] + V[7];
    float tz = V[8] * p[0] + V[9] * p[1] + V[10] * p[2] + V[11];
    out_radii[i] = 0;
    if (tz < 0.2f) continue;  // near culling

    // clip-space projection
    float cx = P[0] * p[0] + P[1] * p[1] + P[2] * p[2] + P[3];
    float cy = P[4] * p[0] + P[5] * p[1] + P[6] * p[2] + P[7];
    float cw = P[12] * p[0] + P[13] * p[1] + P[14] * p[2] + P[15];
    float inv_w = 1.0f / (cw + 1e-7f);
    float ndc_x = cx * inv_w, ndc_y = cy * inv_w;
    float pix_x = ((ndc_x + 1.0f) * width - 1.0f) * 0.5f;
    float pix_y = ((ndc_y + 1.0f) * height - 1.0f) * 0.5f;

    // 3D covariance: R S S^T R^T
    float R[9];
    float qn[4];
    const float* q = rotations + i * 4;
    float qlen = std::sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]) + 1e-12f;
    for (int k = 0; k < 4; ++k) qn[k] = q[k] / qlen;
    quat_to_rotmat(qn, R);
    const float* s = scales + i * 3;
    float sm[3] = {s[0] * scale_modifier, s[1] * scale_modifier, s[2] * scale_modifier};
    // M = R * diag(s); cov3d = M M^T (upper triangle)
    float M[9];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) M[r * 3 + c] = R[r * 3 + c] * sm[c];
    float c3[6];  // xx, xy, xz, yy, yz, zz
    c3[0] = M[0] * M[0] + M[1] * M[1] + M[2] * M[2];
    c3[1] = M[0] * M[3] + M[1] * M[4] + M[2] * M[5];
    c3[2] = M[0] * M[6] + M[1] * M[7] + M[2] * M[8];
    c3[3] = M[3] * M[3] + M[4] * M[4] + M[5] * M[5];
    c3[4] = M[3] * M[6] + M[4] * M[7] + M[5] * M[8];
    c3[5] = M[6] * M[6] + M[7] * M[7] + M[8] * M[8];

    // EWA: cov2d = J W cov3d W^T J^T, with frustum-clamped x/y
    float limx = 1.3f * tan_fovx, limy = 1.3f * tan_fovy;
    float txz = tx / tz, tyz = ty / tz;
    float ctx = std::min(limx, std::max(-limx, txz)) * tz;
    float cty = std::min(limy, std::max(-limy, tyz)) * tz;
    float J[6] = {focal_x / tz, 0.0f, -(focal_x * ctx) / (tz * tz),
                  0.0f, focal_y / tz, -(focal_y * cty) / (tz * tz)};
    // W = top-left 3x3 of view
    float W9[9] = {V[0], V[1], V[2], V[4], V[5], V[6], V[8], V[9], V[10]};
    // T = J(2x3) @ W(3x3)
    float T[6];
    for (int r = 0; r < 2; ++r)
      for (int c = 0; c < 3; ++c)
        T[r * 3 + c] = J[r * 3 + 0] * W9[c] + J[r * 3 + 1] * W9[3 + c] + J[r * 3 + 2] * W9[6 + c];
    // Sigma(3x3) from c3
    float S9[9] = {c3[0], c3[1], c3[2], c3[1], c3[3], c3[4], c3[2], c3[4], c3[5]};
    // cov2d = T S T^T (2x2 symmetric)
    float TS[6];
    for (int r = 0; r < 2; ++r)
      for (int c = 0; c < 3; ++c)
        TS[r * 3 + c] = T[r * 3 + 0] * S9[c] + T[r * 3 + 1] * S9[3 + c] + T[r * 3 + 2] * S9[6 + c];
    float a = TS[0] * T[0] + TS[1] * T[1] + TS[2] * T[2] + 0.3f;  // low-pass
    float b = TS[0] * T[3] + TS[1] * T[4] + TS[2] * T[5];
    float d = TS[3] * T[3] + TS[4] * T[4] + TS[5] * T[5] + 0.3f;

    float det = a * d - b * b;
    if (det <= 0.0f) continue;
    float inv_det = 1.0f / det;
    conic[i * 3 + 0] = d * inv_det;
    conic[i * 3 + 1] = -b * inv_det;
    conic[i * 3 + 2] = a * inv_det;

    float mid = 0.5f * (a + d);
    float lam = mid + std::sqrt(std::max(0.1f, mid * mid - det));
    int radius = static_cast<int>(std::ceil(3.0f * std::sqrt(lam)));
    if (radius <= 0) continue;

    int x0 = std::max(0, std::min(width, static_cast<int>(pix_x) - radius));
    int x1 = std::max(0, std::min(width, static_cast<int>(pix_x) + radius + 1));
    int y0 = std::max(0, std::min(height, static_cast<int>(pix_y) - radius));
    int y1 = std::max(0, std::min(height, static_cast<int>(pix_y) + radius + 1));
    if (x0 >= x1 || y0 >= y1) continue;

    px[i] = pix_x;
    py[i] = pix_y;
    pz[i] = tz;
    rect[i * 4 + 0] = x0;
    rect[i * 4 + 1] = x1;
    rect[i * 4 + 2] = y0;
    rect[i * 4 + 3] = y1;
    out_radii[i] = radius;
    valid[i] = 1;
  }

  // depth-ordered indices (front to back)
  std::vector<int> order;
  order.reserve(num_gaussians);
  for (int i = 0; i < num_gaussians; ++i)
    if (valid[i]) order.push_back(i);
  std::sort(order.begin(), order.end(),
            [&](int a_, int b_) { return pz[a_] < pz[b_]; });

  // per-tile lists (depth order preserved)
  const int tiles_x = (width + TILE - 1) / TILE;
  const int tiles_y = (height + TILE - 1) / TILE;
  std::vector<std::vector<int>> tile_lists(static_cast<size_t>(tiles_x) * tiles_y);
  for (int idx : order) {
    int tx0 = rect[idx * 4 + 0] / TILE, tx1 = (rect[idx * 4 + 1] - 1) / TILE;
    int ty0 = rect[idx * 4 + 2] / TILE, ty1 = (rect[idx * 4 + 3] - 1) / TILE;
    for (int ty = ty0; ty <= ty1; ++ty)
      for (int tx = tx0; tx <= tx1; ++tx)
        tile_lists[static_cast<size_t>(ty) * tiles_x + tx].push_back(idx);
  }

  const int64_t hw = static_cast<int64_t>(height) * width;

  for (int ty = 0; ty < tiles_y; ++ty) {
    for (int tx = 0; tx < tiles_x; ++tx) {
      const auto& lst = tile_lists[static_cast<size_t>(ty) * tiles_x + tx];
      int yb = ty * TILE, xb = tx * TILE;
      int ye = std::min(yb + TILE, height), xe = std::min(xb + TILE, width);
      for (int y = yb; y < ye; ++y) {
        for (int x = xb; x < xe; ++x) {
          float T_acc = 1.0f;
          float acc_c[3] = {0, 0, 0};
          float acc_f[NUM_FEAT] = {0};
          float acc_d = 0.0f;
          for (int idx : lst) {
            float dx = px[idx] - x, dy = py[idx] - y;
            const float* co = &conic[idx * 3];
            float power = -0.5f * (co[0] * dx * dx + co[2] * dy * dy) - co[1] * dx * dy;
            if (power > 0.0f) continue;
            float alpha = std::min(0.99f, opacities[idx] * std::exp(power));
            if (alpha < 1.0f / 255.0f) continue;
            float w = alpha * T_acc;
            const float* col = colors + idx * 3;
            acc_c[0] += w * col[0];
            acc_c[1] += w * col[1];
            acc_c[2] += w * col[2];
            if (features) {
              const float* f = features + idx * NUM_FEAT;
              for (int k = 0; k < NUM_FEAT; ++k) acc_f[k] += w * f[k];
            }
            acc_d += w * pz[idx];
            T_acc *= (1.0f - alpha);
            if (T_acc < 1e-4f) break;
          }
          int64_t pix = static_cast<int64_t>(y) * width + x;
          for (int k = 0; k < 3; ++k)
            out_color[k * hw + pix] = acc_c[k] + T_acc * bg_color[k];
          if (features)
            for (int k = 0; k < NUM_FEAT; ++k) out_feature[k * hw + pix] = acc_f[k];
          out_depth[pix] = acc_d;
          out_alpha[pix] = 1.0f - T_acc;
        }
      }
    }
  }
}

}  // extern "C"
