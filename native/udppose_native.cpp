// udppose_native — host-side data-plane kernels for udp_pose_tpu.
//
// TPU-native replacement for the reference's compiled extensions
// (deep_hrnet/lib/nms/cpu_nms.pyx greedy NMS; the per-sample cv2.warpAffine
// host work in JointsDataset.py:227 / pose_engine.py:73-80).  The TPU does
// the batched warps on-device; this library keeps *host* data workers fast
// where cv2 would be called per sample (CPU prefetch pipeline), and provides
// the box-NMS kernels the reference builds with Cython/CUDA.
//
// Build: make -C native   (g++ -O3 -shared -fPIC -fopenmp)
// ABI: plain C, consumed via ctypes (udp_pose_tpu/native/__init__.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Bilinear warp of one HxWxC uint8 image with a dst→src affine matrix
// (cv2 WARP_INVERSE_MAP convention), zero border, float32 output.
// Matches ops/affine.warp_affine numerics (float path, not cv2's 1/32
// fixed-point quantisation).
void warp_affine_u8(const uint8_t* img, int H, int W, int C,
                    const float* M, float* out, int oh, int ow) {
    for (int y = 0; y < oh; ++y) {
        const float base_x = M[1] * y + M[2];
        const float base_y = M[4] * y + M[5];
        for (int x = 0; x < ow; ++x) {
            const float sx = M[0] * x + base_x;
            const float sy = M[3] * x + base_y;
            const float fx0 = std::floor(sx), fy0 = std::floor(sy);
            const int x0 = (int)fx0, y0 = (int)fy0;
            const float ax = sx - fx0, ay = sy - fy0;
            const float w00 = (1 - ax) * (1 - ay), w01 = ax * (1 - ay);
            const float w10 = (1 - ax) * ay, w11 = ax * ay;
            float* dst = out + ((size_t)y * ow + x) * C;
            for (int c = 0; c < C; ++c) dst[c] = 0.f;
            const bool in00 = x0 >= 0 && x0 < W && y0 >= 0 && y0 < H;
            const bool in01 = x0 + 1 >= 0 && x0 + 1 < W && y0 >= 0 && y0 < H;
            const bool in10 = x0 >= 0 && x0 < W && y0 + 1 >= 0 && y0 + 1 < H;
            const bool in11 = x0 + 1 >= 0 && x0 + 1 < W && y0 + 1 >= 0 &&
                              y0 + 1 < H;
            if (!(in00 || in01 || in10 || in11)) continue;
            for (int c = 0; c < C; ++c) {
                float v = 0.f;
                if (in00) v += w00 * img[((size_t)y0 * W + x0) * C + c];
                if (in01) v += w01 * img[((size_t)y0 * W + x0 + 1) * C + c];
                if (in10) v += w10 * img[((size_t)(y0 + 1) * W + x0) * C + c];
                if (in11) v += w11 * img[((size_t)(y0 + 1) * W + x0 + 1) * C + c];
                dst[c] = v;
            }
        }
    }
}

// Batched warp: n crops from ONE frame, OpenMP-parallel over crops
// (the detect-then-pose host fallback / data-worker hot loop).
void warp_affine_batch_u8(const uint8_t* img, int H, int W, int C,
                          const float* Ms, int n, float* out, int oh,
                          int ow) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (int i = 0; i < n; ++i) {
        warp_affine_u8(img, H, W, C, Ms + (size_t)i * 6,
                       out + (size_t)i * oh * ow * C, oh, ow);
    }
}

// Greedy box NMS (parity: deep_hrnet/lib/nms/cpu_nms.pyx and nms.py:35-72).
// dets: n x 5 [x1,y1,x2,y2,score]; plus_one selects the +1 area convention.
// Returns number of kept indices written to `keep`.
int greedy_nms(const float* dets, int n, float thresh, int plus_one,
               int* keep) {
    const float e = plus_one ? 1.f : 0.f;
    std::vector<int> order(n);
    for (int i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
        return dets[a * 5 + 4] > dets[b * 5 + 4];
    });
    std::vector<float> areas(n);
    for (int i = 0; i < n; ++i) {
        areas[i] = (dets[i * 5 + 2] - dets[i * 5] + e) *
                   (dets[i * 5 + 3] - dets[i * 5 + 1] + e);
    }
    std::vector<char> suppressed(n, 0);
    int n_keep = 0;
    for (int oi = 0; oi < n; ++oi) {
        const int i = order[oi];
        if (suppressed[i]) continue;
        keep[n_keep++] = i;
        const float ix1 = dets[i * 5], iy1 = dets[i * 5 + 1];
        const float ix2 = dets[i * 5 + 2], iy2 = dets[i * 5 + 3];
        for (int oj = oi + 1; oj < n; ++oj) {
            const int j = order[oj];
            if (suppressed[j]) continue;
            const float xx1 = std::max(ix1, dets[j * 5]);
            const float yy1 = std::max(iy1, dets[j * 5 + 1]);
            const float xx2 = std::min(ix2, dets[j * 5 + 2]);
            const float yy2 = std::min(iy2, dets[j * 5 + 3]);
            const float w = std::max(0.f, xx2 - xx1 + e);
            const float h = std::max(0.f, yy2 - yy1 + e);
            const float inter = w * h;
            const float ovr = inter / (areas[i] + areas[j] - inter);
            if (ovr > thresh) suppressed[j] = 1;
        }
    }
    return n_keep;
}

// OKS-IoU of one pose vs n poses (parity: lib/nms/nms.py:75-94, no
// visibility filter — the eval path calls it with in_vis_thre=None).
// g: 3J floats; d: n x 3J; sigmas: J.
void oks_iou_native(const float* g, const float* d, int n, int J,
                    float a_g, const float* a_d, const float* sigmas,
                    float* out) {
    for (int k = 0; k < n; ++k) {
        double s = 0.0;
        const float* dk = d + (size_t)k * 3 * J;
        const double denom_base = (a_g + a_d[k]) / 2.0 + 2.220446049250313e-16;
        for (int j = 0; j < J; ++j) {
            const double dx = dk[3 * j] - g[3 * j];
            const double dy = dk[3 * j + 1] - g[3 * j + 1];
            const double var = 4.0 * sigmas[j] * sigmas[j];
            const double eterm = (dx * dx + dy * dy) / var / denom_base / 2.0;
            s += std::exp(-eterm);
        }
        out[k] = (float)(s / J);
    }
}

// Bilinear resize of an HxWxC uint8 image (cv2.resize INTER_LINEAR
// semantics: half-pixel centre mapping src = (dst+0.5)*scale-0.5 with
// edge clamping).  Used by the --low-bw host letterbox when cv2 is
// absent — float accumulate, round-half-up to uint8 (within 1 LSB of
// cv2's 2048-scale fixed-point arithmetic).  OpenMP over output rows.
void resize_bilinear_u8(const uint8_t* img, int H, int W, int C,
                        uint8_t* out, int oh, int ow) {
    const float sy_scale = (float)H / oh;
    const float sx_scale = (float)W / ow;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int y = 0; y < oh; ++y) {
        float sy = (y + 0.5f) * sy_scale - 0.5f;
        if (sy < 0.f) sy = 0.f;
        int y0 = (int)sy;
        if (y0 > H - 1) y0 = H - 1;
        int y1 = y0 + 1 < H ? y0 + 1 : H - 1;
        const float ay = sy - y0;
        for (int x = 0; x < ow; ++x) {
            float sx = (x + 0.5f) * sx_scale - 0.5f;
            if (sx < 0.f) sx = 0.f;
            int x0 = (int)sx;
            if (x0 > W - 1) x0 = W - 1;
            int x1 = x0 + 1 < W ? x0 + 1 : W - 1;
            const float ax = sx - x0;
            const uint8_t* p00 = img + ((size_t)y0 * W + x0) * C;
            const uint8_t* p01 = img + ((size_t)y0 * W + x1) * C;
            const uint8_t* p10 = img + ((size_t)y1 * W + x0) * C;
            const uint8_t* p11 = img + ((size_t)y1 * W + x1) * C;
            uint8_t* dst = out + ((size_t)y * ow + x) * C;
            for (int c = 0; c < C; ++c) {
                const float v =
                    (1 - ax) * (1 - ay) * p00[c] + ax * (1 - ay) * p01[c] +
                    (1 - ax) * ay * p10[c] + ax * ay * p11[c];
                dst[c] = (uint8_t)(v + 0.5f);
            }
        }
    }
}

int native_version() { return 2; }

}  // extern "C"
