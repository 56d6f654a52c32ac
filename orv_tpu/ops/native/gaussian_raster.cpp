// Tile-based 3D Gaussian splat rasterizer (forward + backward), CPU-native.
//
// Capability-equivalent to the reference's CUDA fork
// (orv/ops/diff-gaussian-rasterization): renders per-pixel color (3ch),
// semantic feature (12ch), expected depth, and alpha from 3D gaussians via
// EWA projection + front-to-back alpha blending, and backpropagates
// gradients of all four outputs to means3d / colors / features / opacities
// / scales / rotations (the reference's backward.cu capability, fresh
// derivation + CPU design here — no CUDA atomics, per-tile serial scatter).
//
// Fresh design: 16x16 tile binning with per-tile index lists built from a
// global depth-ordered gaussian sort, then per-tile blending. The backward
// walks each pixel twice (front-to-back): pass A reproduces the forward
// accumulation (totals + final transmittance), pass B converts suffix
// payload sums into per-gaussian alpha gradients. extern "C" for ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr int TILE = 16;
constexpr int NUM_FEAT = 12;  // semantic channels (reference config.h)

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

// per-gaussian preprocessing results shared by forward and backward
struct Pre {
  std::vector<float> px, py, pz;            // pixel center + view depth
  std::vector<float> conic;                 // [N, 3] (c0, c1, c2)
  std::vector<int> rect;                    // [N, 4] x0, x1, y0, y1
  std::vector<uint8_t> valid;               // [N]
  // geometry intermediates for the backward chain
  std::vector<float> tview;                 // [N, 3] tx, ty, tz
  std::vector<float> Tm;                    // [N, 6] T = J W (2x3)
  std::vector<float> S3;                    // [N, 6] cov3d upper (xx,xy,xz,yy,yz,zz)
  std::vector<float> Mm;                    // [N, 9] M = R diag(sm)
  std::vector<float> Rm;                    // [N, 9]
  std::vector<float> qn;                    // [N, 4] normalized quat
  std::vector<float> qlen;                  // [N]
  std::vector<float> cw;                    // [N] clip w (pre-eps)
  std::vector<float> cxy;                   // [N, 2] clip x, y
  std::vector<uint8_t> clampx, clampy;      // frustum clamp hit (sign in value)
  std::vector<float> clampsx, clampsy;      // clamp signs
  int tiles_x = 0, tiles_y = 0;
  std::vector<std::vector<int>> tile_lists;
};

void preprocess(const float* means3d, const float* scales, const float* rotations,
                int n, const float* V, const float* P, float tan_fovx,
                float tan_fovy, int height, int width, float scale_modifier,
                int32_t* out_radii, Pre& pre) {
  const float focal_x = width / (2.0f * tan_fovx);
  const float focal_y = height / (2.0f * tan_fovy);
  pre.px.resize(n); pre.py.resize(n); pre.pz.resize(n);
  pre.conic.assign(static_cast<size_t>(n) * 3, 0.0f);
  pre.rect.assign(static_cast<size_t>(n) * 4, 0);
  pre.valid.assign(n, 0);
  pre.tview.assign(static_cast<size_t>(n) * 3, 0.0f);
  pre.Tm.assign(static_cast<size_t>(n) * 6, 0.0f);
  pre.S3.assign(static_cast<size_t>(n) * 6, 0.0f);
  pre.Mm.assign(static_cast<size_t>(n) * 9, 0.0f);
  pre.Rm.assign(static_cast<size_t>(n) * 9, 0.0f);
  pre.qn.assign(static_cast<size_t>(n) * 4, 0.0f);
  pre.qlen.assign(n, 1.0f);
  pre.cw.assign(n, 1.0f);
  pre.cxy.assign(static_cast<size_t>(n) * 2, 0.0f);
  pre.clampx.assign(n, 0); pre.clampy.assign(n, 0);
  pre.clampsx.assign(n, 0.0f); pre.clampsy.assign(n, 0.0f);

  for (int i = 0; i < n; ++i) {
    const float* p = means3d + i * 3;
    float tx = V[0] * p[0] + V[1] * p[1] + V[2] * p[2] + V[3];
    float ty = V[4] * p[0] + V[5] * p[1] + V[6] * p[2] + V[7];
    float tz = V[8] * p[0] + V[9] * p[1] + V[10] * p[2] + V[11];
    if (out_radii) out_radii[i] = 0;
    if (tz < 0.2f) continue;  // near culling

    float cx = P[0] * p[0] + P[1] * p[1] + P[2] * p[2] + P[3];
    float cy = P[4] * p[0] + P[5] * p[1] + P[6] * p[2] + P[7];
    float cw = P[12] * p[0] + P[13] * p[1] + P[14] * p[2] + P[15];
    float inv_w = 1.0f / (cw + 1e-7f);
    float pix_x = ((cx * inv_w + 1.0f) * width - 1.0f) * 0.5f;
    float pix_y = ((cy * inv_w + 1.0f) * height - 1.0f) * 0.5f;

    float R[9], qnorm[4];
    const float* q = rotations + i * 4;
    float qlen = std::sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]) + 1e-12f;
    for (int k = 0; k < 4; ++k) qnorm[k] = q[k] / qlen;
    quat_to_rotmat(qnorm, R);
    const float* s = scales + i * 3;
    float sm[3] = {s[0] * scale_modifier, s[1] * scale_modifier, s[2] * scale_modifier};
    float M[9];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) M[r * 3 + c] = R[r * 3 + c] * sm[c];
    float c3[6];
    c3[0] = M[0] * M[0] + M[1] * M[1] + M[2] * M[2];
    c3[1] = M[0] * M[3] + M[1] * M[4] + M[2] * M[5];
    c3[2] = M[0] * M[6] + M[1] * M[7] + M[2] * M[8];
    c3[3] = M[3] * M[3] + M[4] * M[4] + M[5] * M[5];
    c3[4] = M[3] * M[6] + M[4] * M[7] + M[5] * M[8];
    c3[5] = M[6] * M[6] + M[7] * M[7] + M[8] * M[8];

    float limx = 1.3f * tan_fovx, limy = 1.3f * tan_fovy;
    float txz = tx / tz, tyz = ty / tz;
    bool cxp = txz > limx, cxm = txz < -limx;
    bool cyp = tyz > limy, cym = tyz < -limy;
    float ctx = std::min(limx, std::max(-limx, txz)) * tz;
    float cty = std::min(limy, std::max(-limy, tyz)) * tz;
    float J[6] = {focal_x / tz, 0.0f, -(focal_x * ctx) / (tz * tz),
                  0.0f, focal_y / tz, -(focal_y * cty) / (tz * tz)};
    float W9[9] = {V[0], V[1], V[2], V[4], V[5], V[6], V[8], V[9], V[10]};
    float T[6];
    for (int r = 0; r < 2; ++r)
      for (int c = 0; c < 3; ++c)
        T[r * 3 + c] = J[r * 3 + 0] * W9[c] + J[r * 3 + 1] * W9[3 + c] + J[r * 3 + 2] * W9[6 + c];
    float S9[9] = {c3[0], c3[1], c3[2], c3[1], c3[3], c3[4], c3[2], c3[4], c3[5]};
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
    pre.conic[i * 3 + 0] = d * inv_det;
    pre.conic[i * 3 + 1] = -b * inv_det;
    pre.conic[i * 3 + 2] = a * inv_det;

    float mid = 0.5f * (a + d);
    float lam = mid + std::sqrt(std::max(0.1f, mid * mid - det));
    int radius = static_cast<int>(std::ceil(3.0f * std::sqrt(lam)));
    if (radius <= 0) continue;

    int x0 = std::max(0, std::min(width, static_cast<int>(pix_x) - radius));
    int x1 = std::max(0, std::min(width, static_cast<int>(pix_x) + radius + 1));
    int y0 = std::max(0, std::min(height, static_cast<int>(pix_y) - radius));
    int y1 = std::max(0, std::min(height, static_cast<int>(pix_y) + radius + 1));
    if (x0 >= x1 || y0 >= y1) continue;

    pre.px[i] = pix_x; pre.py[i] = pix_y; pre.pz[i] = tz;
    pre.rect[i * 4 + 0] = x0; pre.rect[i * 4 + 1] = x1;
    pre.rect[i * 4 + 2] = y0; pre.rect[i * 4 + 3] = y1;
    if (out_radii) out_radii[i] = radius;
    pre.valid[i] = 1;
    pre.tview[i * 3 + 0] = tx; pre.tview[i * 3 + 1] = ty; pre.tview[i * 3 + 2] = tz;
    std::memcpy(&pre.Tm[i * 6], T, sizeof(T));
    std::memcpy(&pre.S3[i * 6], c3, sizeof(c3));
    std::memcpy(&pre.Mm[i * 9], M, sizeof(M));
    std::memcpy(&pre.Rm[i * 9], R, sizeof(R));
    std::memcpy(&pre.qn[i * 4], qnorm, sizeof(qnorm));
    pre.qlen[i] = qlen;
    pre.cw[i] = cw;
    pre.cxy[i * 2 + 0] = cx; pre.cxy[i * 2 + 1] = cy;
    pre.clampx[i] = cxp || cxm; pre.clampsx[i] = cxp ? 1.0f : (cxm ? -1.0f : 0.0f);
    pre.clampy[i] = cyp || cym; pre.clampsy[i] = cyp ? 1.0f : (cym ? -1.0f : 0.0f);
  }

  // depth-ordered per-tile lists (front to back)
  std::vector<int> order;
  order.reserve(n);
  for (int i = 0; i < n; ++i)
    if (pre.valid[i]) order.push_back(i);
  std::sort(order.begin(), order.end(),
            [&](int a_, int b_) { return pre.pz[a_] < pre.pz[b_]; });
  pre.tiles_x = (width + TILE - 1) / TILE;
  pre.tiles_y = (height + TILE - 1) / TILE;
  pre.tile_lists.assign(static_cast<size_t>(pre.tiles_x) * pre.tiles_y, {});
  for (int idx : order) {
    int tx0 = pre.rect[idx * 4 + 0] / TILE, tx1 = (pre.rect[idx * 4 + 1] - 1) / TILE;
    int ty0 = pre.rect[idx * 4 + 2] / TILE, ty1 = (pre.rect[idx * 4 + 3] - 1) / TILE;
    for (int ty = ty0; ty <= ty1; ++ty)
      for (int tx = tx0; tx <= tx1; ++tx)
        pre.tile_lists[static_cast<size_t>(ty) * pre.tiles_x + tx].push_back(idx);
  }
}

}  // namespace

extern "C" {

// All matrices row-major. viewmatrix: world->camera [4x4]; projmatrix:
// full (view @ proj) [4x4] mapping world->clip.
// outputs: color [3,H,W], feature [NUM_FEAT,H,W], depth [H,W], alpha [H,W],
// radii [N] int32.
void rasterize_gaussians(
    const float* means3d, const float* colors, const float* features,
    const float* opacities, const float* scales, const float* rotations,
    int num_gaussians, const float* viewmatrix, const float* projmatrix,
    const float* bg_color, float tan_fovx, float tan_fovy, int height,
    int width, float scale_modifier, float* out_color, float* out_feature,
    float* out_depth, float* out_alpha, int32_t* out_radii) {
  Pre pre;
  preprocess(means3d, scales, rotations, num_gaussians, viewmatrix, projmatrix,
             tan_fovx, tan_fovy, height, width, scale_modifier, out_radii, pre);

  const int64_t hw = static_cast<int64_t>(height) * width;
  for (int ty = 0; ty < pre.tiles_y; ++ty) {
    for (int tx = 0; tx < pre.tiles_x; ++tx) {
      const auto& lst = pre.tile_lists[static_cast<size_t>(ty) * pre.tiles_x + tx];
      int yb = ty * TILE, xb = tx * TILE;
      int ye = std::min(yb + TILE, height), xe = std::min(xb + TILE, width);
      for (int y = yb; y < ye; ++y) {
        for (int x = xb; x < xe; ++x) {
          float T_acc = 1.0f;
          float acc_c[3] = {0, 0, 0};
          float acc_f[NUM_FEAT] = {0};
          float acc_d = 0.0f;
          for (int idx : lst) {
            float dx = pre.px[idx] - x, dy = pre.py[idx] - y;
            const float* co = &pre.conic[idx * 3];
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
            acc_d += w * pre.pz[idx];
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

// Backward: gradients of the four outputs w.r.t. every gaussian input.
// grad_out_feature may be null (feature head unused). Outputs must be
// zero-initialized [N,3] / [N,3] / [N,NUM_FEAT] / [N] / [N,3] / [N,4].
void rasterize_gaussians_backward(
    const float* means3d, const float* colors, const float* features,
    const float* opacities, const float* scales, const float* rotations,
    int num_gaussians, const float* viewmatrix, const float* projmatrix,
    const float* bg_color, float tan_fovx, float tan_fovy, int height,
    int width, float scale_modifier,
    const float* grad_color,    // [3, H, W]
    const float* grad_feature,  // [NUM_FEAT, H, W] or null
    const float* grad_depth,    // [H, W]
    const float* grad_alpha,    // [H, W]
    float* g_means3d, float* g_colors, float* g_features, float* g_opacities,
    float* g_scales, float* g_rotations) {
  Pre pre;
  preprocess(means3d, scales, rotations, num_gaussians, viewmatrix, projmatrix,
             tan_fovx, tan_fovy, height, width, scale_modifier, nullptr, pre);

  const int64_t hw = static_cast<int64_t>(height) * width;
  const float focal_x = width / (2.0f * tan_fovx);
  const float focal_y = height / (2.0f * tan_fovy);
  const float* V = viewmatrix;
  const float* P = projmatrix;

  // screen-space accumulators per gaussian
  std::vector<float> g_px(num_gaussians, 0.0f), g_py(num_gaussians, 0.0f);
  std::vector<float> g_tz(num_gaussians, 0.0f);
  std::vector<float> g_conic(static_cast<size_t>(num_gaussians) * 3, 0.0f);

  std::vector<float> walpha;  // per-pixel forward weights (pass A -> pass B)
  std::vector<int> widx;

  for (int ty = 0; ty < pre.tiles_y; ++ty) {
    for (int tx = 0; tx < pre.tiles_x; ++tx) {
      const auto& lst = pre.tile_lists[static_cast<size_t>(ty) * pre.tiles_x + tx];
      if (lst.empty()) continue;
      int yb = ty * TILE, xb = tx * TILE;
      int ye = std::min(yb + TILE, height), xe = std::min(xb + TILE, width);
      for (int y = yb; y < ye; ++y) {
        for (int x = xb; x < xe; ++x) {
          int64_t pix = static_cast<int64_t>(y) * width + x;
          const float dC[3] = {grad_color[0 * hw + pix], grad_color[1 * hw + pix],
                               grad_color[2 * hw + pix]};
          const float dD = grad_depth ? grad_depth[pix] : 0.0f;
          const float dA = grad_alpha ? grad_alpha[pix] : 0.0f;

          // pass A: reproduce forward per-gaussian weights + total payload
          walpha.clear(); widx.clear();
          float T_acc = 1.0f;
          float total_payload = 0.0f;  // sum_k w_k * (payload_k . dOut)
          for (int idx : lst) {
            float dx = pre.px[idx] - x, dy = pre.py[idx] - y;
            const float* co = &pre.conic[idx * 3];
            float power = -0.5f * (co[0] * dx * dx + co[2] * dy * dy) - co[1] * dx * dy;
            if (power > 0.0f) continue;
            float alpha = std::min(0.99f, opacities[idx] * std::exp(power));
            if (alpha < 1.0f / 255.0f) continue;
            float w = alpha * T_acc;
            float payload = colors[idx * 3] * dC[0] + colors[idx * 3 + 1] * dC[1]
                            + colors[idx * 3 + 2] * dC[2] + pre.pz[idx] * dD;
            if (features && grad_feature) {
              const float* f = features + idx * NUM_FEAT;
              for (int k = 0; k < NUM_FEAT; ++k)
                payload += f[k] * grad_feature[k * hw + pix];
            }
            total_payload += w * payload;
            walpha.push_back(alpha);
            widx.push_back(idx);
            T_acc *= (1.0f - alpha);
            if (T_acc < 1e-4f) break;
          }
          const float T_final = T_acc;
          const float bg_dot = bg_color[0] * dC[0] + bg_color[1] * dC[1]
                               + bg_color[2] * dC[2];
          if (widx.empty()) continue;

          // pass B: front-to-back, suffix = total - prefix(incl. current)
          float T_run = 1.0f;
          float prefix = 0.0f;
          for (size_t j = 0; j < widx.size(); ++j) {
            int idx = widx[j];
            float alpha = walpha[j];
            float w = alpha * T_run;
            float dx = pre.px[idx] - x, dy = pre.py[idx] - y;
            const float* co = &pre.conic[idx * 3];

            float payload = colors[idx * 3] * dC[0] + colors[idx * 3 + 1] * dC[1]
                            + colors[idx * 3 + 2] * dC[2] + pre.pz[idx] * dD;
            if (features && grad_feature) {
              const float* f = features + idx * NUM_FEAT;
              for (int k = 0; k < NUM_FEAT; ++k)
                payload += f[k] * grad_feature[k * hw + pix];
            }
            prefix += w * payload;
            float suffix = total_payload - prefix;

            // payload grads
            for (int k = 0; k < 3; ++k) g_colors[idx * 3 + k] += w * dC[k];
            if (features && grad_feature)
              for (int k = 0; k < NUM_FEAT; ++k)
                g_features[idx * NUM_FEAT + k] += w * grad_feature[k * hw + pix];
            g_tz[idx] += w * dD;  // expected-depth payload

            // alpha grad: direct + via later transmittances + via T_final
            float one_m = std::max(1.0f - alpha, 1e-6f);
            float d_alpha = T_run * payload
                            - (suffix + T_final * bg_dot) / one_m
                            + (T_final / one_m) * dA;

            // alpha = min(0.99, o * exp(power)): clamp kills local grads
            float G = std::exp(-0.5f * (co[0] * dx * dx + co[2] * dy * dy)
                               - co[1] * dx * dy);
            if (opacities[idx] * G < 0.99f) {
              g_opacities[idx] += d_alpha * G;
              float d_power = d_alpha * opacities[idx] * G;
              g_conic[idx * 3 + 0] += d_power * (-0.5f * dx * dx);
              g_conic[idx * 3 + 1] += d_power * (-dx * dy);
              g_conic[idx * 3 + 2] += d_power * (-0.5f * dy * dy);
              g_px[idx] += d_power * (-(co[0] * dx + co[1] * dy));
              g_py[idx] += d_power * (-(co[2] * dy + co[1] * dx));
            }
            T_run *= (1.0f - alpha);
          }
        }
      }
    }
  }

  // geometry chain per gaussian
  for (int i = 0; i < num_gaussians; ++i) {
    if (!pre.valid[i]) continue;
    bool any = g_px[i] != 0 || g_py[i] != 0 || g_tz[i] != 0
               || g_conic[i * 3] != 0 || g_conic[i * 3 + 1] != 0
               || g_conic[i * 3 + 2] != 0;
    if (!any) continue;

    const float* co = &pre.conic[i * 3];
    // dSigma2 = -C G C with G symmetric from packed conic grads
    float G00 = g_conic[i * 3 + 0], G11 = g_conic[i * 3 + 2];
    float G01 = 0.5f * g_conic[i * 3 + 1];
    float C00 = co[0], C01 = co[1], C11 = co[2];
    // CG = C * G
    float CG00 = C00 * G00 + C01 * G01, CG01 = C00 * G01 + C01 * G11;
    float CG10 = C01 * G00 + C11 * G01, CG11 = C01 * G01 + C11 * G11;
    // dS2 = -(CG) * C
    float dS2_00 = -(CG00 * C00 + CG01 * C01);
    float dS2_01 = -(CG00 * C01 + CG01 * C11);
    float dS2_10 = -(CG10 * C00 + CG11 * C01);
    float dS2_11 = -(CG10 * C01 + CG11 * C11);
    // symmetrize (a, b, d packing had b in both off-diagonals)
    float dS2s01 = 0.5f * (dS2_01 + dS2_10);

    const float* T = &pre.Tm[i * 6];
    const float* c3 = &pre.S3[i * 6];
    float S9[9] = {c3[0], c3[1], c3[2], c3[1], c3[3], c3[4], c3[2], c3[4], c3[5]};

    // dS3 = T^T dS2 T  (3x3 symmetric)
    float dS3[9];
    for (int r = 0; r < 3; ++r) {
      for (int c = 0; c < 3; ++c) {
        dS3[r * 3 + c] = T[r] * (dS2_00 * T[c] + dS2s01 * T[3 + c])
                         + T[3 + r] * (dS2s01 * T[c] + dS2_11 * T[3 + c]);
      }
    }
    // dT = 2 dS2 T S3
    float TS3[6];
    for (int r = 0; r < 2; ++r)
      for (int c = 0; c < 3; ++c)
        TS3[r * 3 + c] = T[r * 3] * S9[c] + T[r * 3 + 1] * S9[3 + c] + T[r * 3 + 2] * S9[6 + c];
    float dT[6];
    for (int c = 0; c < 3; ++c) {
      dT[c] = 2.0f * (dS2_00 * TS3[c] + dS2s01 * TS3[3 + c]);
      dT[3 + c] = 2.0f * (dS2s01 * TS3[c] + dS2_11 * TS3[3 + c]);
    }

    // dJ = dT W^T   (T = J W)
    float W9[9] = {V[0], V[1], V[2], V[4], V[5], V[6], V[8], V[9], V[10]};
    float dJ[6];
    for (int r = 0; r < 2; ++r)
      for (int c = 0; c < 3; ++c)
        dJ[r * 3 + c] = dT[r * 3] * W9[c * 3] + dT[r * 3 + 1] * W9[c * 3 + 1]
                        + dT[r * 3 + 2] * W9[c * 3 + 2];

    // J entries -> (tx, ty, tz); only J00, J02, J11, J12 are nonzero
    float tx = pre.tview[i * 3], ty = pre.tview[i * 3 + 1], tz = pre.tview[i * 3 + 2];
    float limx = 1.3f * tan_fovx, limy = 1.3f * tan_fovy;
    float ctx = std::min(limx, std::max(-limx, tx / tz)) * tz;
    float cty = std::min(limy, std::max(-limy, ty / tz)) * tz;
    float dtx = 0.0f, dty = 0.0f, dtz = g_tz[i];
    // J00 = fx / tz
    dtz += dJ[0] * (-focal_x / (tz * tz));
    // J11 = fy / tz
    dtz += dJ[4] * (-focal_y / (tz * tz));
    // J02 = -fx ctx / tz^2
    float dctx = dJ[2] * (-focal_x / (tz * tz));
    dtz += dJ[2] * (2.0f * focal_x * ctx / (tz * tz * tz));
    // J12 = -fy cty / tz^2
    float dcty = dJ[5] * (-focal_y / (tz * tz));
    dtz += dJ[5] * (2.0f * focal_y * cty / (tz * tz * tz));
    if (pre.clampx[i]) dtz += dctx * pre.clampsx[i] * limx;
    else dtx += dctx;
    if (pre.clampy[i]) dtz += dcty * pre.clampsy[i] * limy;
    else dty += dcty;

    // dS3 -> M: dM = 2 dS3_sym M (dS3 already symmetric by construction)
    const float* M = &pre.Mm[i * 9];
    const float* R = &pre.Rm[i * 9];
    float dM[9];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c)
        dM[r * 3 + c] = 2.0f * (dS3[r * 3] * M[c] + dS3[r * 3 + 1] * M[3 + c]
                                + dS3[r * 3 + 2] * M[6 + c]);

    // M = R diag(sm): dsm_c = sum_r dM[r][c] R[r][c]; dR = dM * sm_c
    const float* s = scales + i * 3;
    float dRm[9];
    for (int c = 0; c < 3; ++c) {
      float smc = s[c] * scale_modifier;
      float ds = 0.0f;
      for (int r = 0; r < 3; ++r) {
        ds += dM[r * 3 + c] * R[r * 3 + c];
        dRm[r * 3 + c] = dM[r * 3 + c] * smc;
      }
      g_scales[i * 3 + c] += ds * scale_modifier;
    }

    // dR -> normalized quaternion (w, x, y, z)
    const float* q = &pre.qn[i * 4];
    float w = q[0], xq = q[1], yq = q[2], zq = q[3];
    float dqn[4] = {0, 0, 0, 0};
    // R00 = 1-2(y^2+z^2)
    dqn[2] += dRm[0] * (-4 * yq); dqn[3] += dRm[0] * (-4 * zq);
    // R01 = 2(xy - wz)
    dqn[0] += dRm[1] * (-2 * zq); dqn[1] += dRm[1] * (2 * yq);
    dqn[2] += dRm[1] * (2 * xq);  dqn[3] += dRm[1] * (-2 * w);
    // R02 = 2(xz + wy)
    dqn[0] += dRm[2] * (2 * yq);  dqn[1] += dRm[2] * (2 * zq);
    dqn[2] += dRm[2] * (2 * w);   dqn[3] += dRm[2] * (2 * xq);
    // R10 = 2(xy + wz)
    dqn[0] += dRm[3] * (2 * zq);  dqn[1] += dRm[3] * (2 * yq);
    dqn[2] += dRm[3] * (2 * xq);  dqn[3] += dRm[3] * (2 * w);
    // R11 = 1-2(x^2+z^2)
    dqn[1] += dRm[4] * (-4 * xq); dqn[3] += dRm[4] * (-4 * zq);
    // R12 = 2(yz - wx)
    dqn[0] += dRm[5] * (-2 * xq); dqn[1] += dRm[5] * (-2 * w);
    dqn[2] += dRm[5] * (2 * zq);  dqn[3] += dRm[5] * (2 * yq);
    // R20 = 2(xz - wy)
    dqn[0] += dRm[6] * (-2 * yq); dqn[1] += dRm[6] * (2 * zq);
    dqn[2] += dRm[6] * (-2 * w);  dqn[3] += dRm[6] * (2 * xq);
    // R21 = 2(yz + wx)
    dqn[0] += dRm[7] * (2 * xq);  dqn[1] += dRm[7] * (2 * w);
    dqn[2] += dRm[7] * (2 * zq);  dqn[3] += dRm[7] * (2 * yq);
    // R22 = 1-2(x^2+y^2)
    dqn[1] += dRm[8] * (-4 * xq); dqn[2] += dRm[8] * (-4 * yq);
    // through normalization: dq = (dqn - qn (qn . dqn)) / |q|
    float dot = dqn[0] * w + dqn[1] * xq + dqn[2] * yq + dqn[3] * zq;
    for (int k = 0; k < 4; ++k)
      g_rotations[i * 4 + k] += (dqn[k] - q[k] * dot) / pre.qlen[i];

    // pixel-center grads -> clip space -> means3d
    float cwE = pre.cw[i] + 1e-7f;
    float inv_w = 1.0f / cwE;
    float cx = pre.cxy[i * 2], cy = pre.cxy[i * 2 + 1];
    float dcx = g_px[i] * 0.5f * width * inv_w;
    float dcy = g_py[i] * 0.5f * height * inv_w;
    float dcw = -(g_px[i] * 0.5f * width * cx + g_py[i] * 0.5f * height * cy)
                * inv_w * inv_w;
    float dp[3];
    for (int k = 0; k < 3; ++k)
      dp[k] = dcx * P[k] + dcy * P[4 + k] + dcw * P[12 + k];
    // view-space grads -> means3d (t = V[:3,:4] [p, 1])
    dp[0] += dtx * V[0] + dty * V[4] + dtz * V[8];
    dp[1] += dtx * V[1] + dty * V[5] + dtz * V[9];
    dp[2] += dtx * V[2] + dty * V[6] + dtz * V[10];
    for (int k = 0; k < 3; ++k) g_means3d[i * 3 + k] += dp[k];
  }
}

}  // extern "C"
