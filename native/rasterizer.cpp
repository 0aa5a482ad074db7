// Host-side bbox rasterizer (C++), the native preprocessing path.
//
// The reference's conditioning-frame rendering is native code via OpenCV
// (plot_3d_bbox, /root/reference/src/ctrlv/utils/plotting.py:55-124 calls
// cv2's C++ kernels). This library is its TPU-framework equivalent for
// *offline* preprocessing (tools/preprocess_dataset.py) where the device
// is busy training: filled 2D rects with alpha blending, 12-edge 3D
// wireframes + back-X, trajectory dots. Semantics mirror
// ctrlv_tpu/ops/rasterize.py (the on-device XLA path) exactly —
// sequential object draws, later objects overwrite earlier ones — and the
// two implementations are cross-validated in tests/test_native.py.
//
// Build: make -C native   (produces libctrlv_native.so, loaded via ctypes)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

inline void paint_pixel(float* img, int W, int y, int x, const float* color) {
    float* p = img + (static_cast<int64_t>(y) * W + x) * 3;
    p[0] = color[0];
    p[1] = color[1];
    p[2] = color[2];
}

inline void blend_pixel(float* img, int W, int y, int x, const float* color,
                        float alpha) {
    float* p = img + (static_cast<int64_t>(y) * W + x) * 3;
    p[0] = alpha * color[0] + (1.0f - alpha) * p[0];
    p[1] = alpha * color[1] + (1.0f - alpha) * p[1];
    p[2] = alpha * color[2] + (1.0f - alpha) * p[2];
}

// Draw a segment as all pixels within half_width of it (matches the XLA
// kernel's distance-to-segment coverage test, not Bresenham).
void draw_segment(float* img, int H, int W, float x0, float y0, float x1,
                  float y1, const float* color, float half_width) {
    const float dx = x1 - x0, dy = y1 - y0;
    const float len2 = std::max(dx * dx + dy * dy, 1e-8f);
    const int min_x = std::max(0, static_cast<int>(std::floor(std::min(x0, x1) - half_width)));
    const int max_x = std::min(W - 1, static_cast<int>(std::ceil(std::max(x0, x1) + half_width)));
    const int min_y = std::max(0, static_cast<int>(std::floor(std::min(y0, y1) - half_width)));
    const int max_y = std::min(H - 1, static_cast<int>(std::ceil(std::max(y0, y1) + half_width)));
    const float hw2 = half_width * half_width;
    for (int y = min_y; y <= max_y; ++y) {
        for (int x = min_x; x <= max_x; ++x) {
            float t = ((x - x0) * dx + (y - y0) * dy) / len2;
            t = std::min(1.0f, std::max(0.0f, t));
            const float qx = x0 + t * dx, qy = y0 + t * dy;
            const float d2 = (x - qx) * (x - qx) + (y - qy) * (y - qy);
            if (d2 <= hw2) paint_pixel(img, W, y, x, color);
        }
    }
}

}  // namespace

extern "C" {

// img: H*W*3 float32 in [0,1], modified in place.
// corners: N*8*2; bbox2d: N*4 (xyxy); valid: N; colors: N*3.
void rasterize_frame_native(float* img, int H, int W, const float* corners,
                            const float* bbox2d, const uint8_t* valid,
                            const float* type_color, const float* track_color,
                            int N, int plot_2d, float alpha_2dbbox) {
    // Pass 1: filled 2D rects (alpha blended against the ORIGINAL
    // background; later rects overwrite earlier ones, like the XLA
    // "last object wins" select over the pre-blend base).
    if (plot_2d) {
        // snapshot of the base for blend parity with the XLA kernel
        const int64_t npix = static_cast<int64_t>(H) * W * 3;
        float* base = new float[npix];
        std::memcpy(base, img, npix * sizeof(float));
        for (int n = 0; n < N; ++n) {
            if (!valid[n]) continue;
            const float* b = bbox2d + n * 4;
            const int x1 = std::max(0, static_cast<int>(std::floor(b[0])));
            const int y1 = std::max(0, static_cast<int>(std::floor(b[1])));
            const int x2 = std::min(W - 1, static_cast<int>(std::floor(b[2])));
            const int y2 = std::min(H - 1, static_cast<int>(std::floor(b[3])));
            const float* color = track_color + n * 3;
            for (int y = y1; y <= y2; ++y) {
                for (int x = x1; x <= x2; ++x) {
                    const float* bp = base + (static_cast<int64_t>(y) * W + x) * 3;
                    float* p = img + (static_cast<int64_t>(y) * W + x) * 3;
                    p[0] = alpha_2dbbox * color[0] + (1.0f - alpha_2dbbox) * bp[0];
                    p[1] = alpha_2dbbox * color[1] + (1.0f - alpha_2dbbox) * bp[1];
                    p[2] = alpha_2dbbox * color[2] + (1.0f - alpha_2dbbox) * bp[2];
                }
            }
        }
        delete[] base;
    }

    // Pass 2: 3D wireframes override everything where covered.
    static const int kEdges[12][2] = {
        {0, 1}, {2, 3}, {4, 5}, {6, 7},                    // (2i, 2i+1)
        {0, 2}, {1, 3}, {2, 4}, {3, 5}, {4, 6}, {5, 7},    // ring (i, i+2)
        {6, 0}, {7, 1},
    };
    static const int kXEdges[2][2] = {{2, 5}, {3, 4}};
    for (int n = 0; n < N; ++n) {
        if (!valid[n]) continue;
        const float* c8 = corners + n * 16;
        const float* color = type_color + n * 3;
        // half-widths fitted to cv2's drawn pixel sets (thickness 2 is a
        // ~3 px band): keep in sync with ops/rasterize.py _HW_THICK{2,1}
        for (const auto& e : kEdges) {
            draw_segment(img, H, W, c8[e[0] * 2], c8[e[0] * 2 + 1],
                         c8[e[1] * 2], c8[e[1] * 2 + 1], color, 1.4f);
        }
        for (const auto& e : kXEdges) {
            draw_segment(img, H, W, c8[e[0] * 2], c8[e[0] * 2 + 1],
                         c8[e[1] * 2], c8[e[1] * 2 + 1], color, 0.5f);
        }
    }
}

// nuScenes "3d style" frame (matplotlib-parity; see ops/rasterize.py
// rasterize_frame_3dstyle_np for the semantics and the reference citation).
// Sequential alpha-0.75 patch compositing (face, then — in 2D mode — a lw-2
// edge band in the outline color), then opaque wireframes above all patches.
// corners: N*8*2 canvas coords; colors: N*3.
void rasterize_frame_3dstyle_native(float* img, int H, int W,
                                    const float* corners,
                                    const uint8_t* valid,
                                    const float* outline_color,
                                    const float* fill_color, int N,
                                    int show_3d, int show_2d, float alpha,
                                    float hw2, float hw1) {
    // pass 1: patches, in box order
    if (show_2d) {
        for (int n = 0; n < N; ++n) {
            if (!valid[n]) continue;
            const float* c8 = corners + n * 16;
            float x1 = c8[0], y1 = c8[1], x2 = c8[0], y2 = c8[1];
            for (int k = 1; k < 8; ++k) {
                x1 = std::min(x1, c8[k * 2]);
                x2 = std::max(x2, c8[k * 2]);
                y1 = std::min(y1, c8[k * 2 + 1]);
                y2 = std::max(y2, c8[k * 2 + 1]);
            }
            const float* fcol = fill_color + n * 3;
            // face: pixel centers inside [x1,x2]x[y1,y2]
            const int fx1 = std::max(0, static_cast<int>(std::ceil(x1)));
            const int fx2 = std::min(W - 1, static_cast<int>(std::floor(x2)));
            const int fy1 = std::max(0, static_cast<int>(std::ceil(y1)));
            const int fy2 = std::min(H - 1, static_cast<int>(std::floor(y2)));
            for (int y = fy1; y <= fy2; ++y)
                for (int x = fx1; x <= fx2; ++x)
                    blend_pixel(img, W, y, x, fcol, alpha);
            if (!show_3d) {
                // edge band: union of the 4 boundary segments, composited
                // ONCE per pixel (keep bit-parity with the numpy union)
                const float* ocol = outline_color + n * 3;
                const float qx[4] = {x1, x2, x2, x1};
                const float qy[4] = {y1, y1, y2, y2};
                const int ex1 = std::max(0, static_cast<int>(std::floor(x1 - hw2 - 1)));
                const int ex2 = std::min(W - 1, static_cast<int>(std::ceil(x2 + hw2 + 1)));
                const int ey1 = std::max(0, static_cast<int>(std::floor(y1 - hw2 - 1)));
                const int ey2 = std::min(H - 1, static_cast<int>(std::ceil(y2 + hw2 + 1)));
                const float hw22 = hw2 * hw2;
                for (int y = ey1; y <= ey2; ++y) {
                    for (int x = ex1; x <= ex2; ++x) {
                        bool hit = false;
                        for (int e = 0; e < 4 && !hit; ++e) {
                            const float ax = qx[e], ay = qy[e];
                            const float bx = qx[(e + 1) % 4], by = qy[(e + 1) % 4];
                            const float dx = bx - ax, dy = by - ay;
                            const float len2 = std::max(dx * dx + dy * dy, 1e-8f);
                            float t = ((x - ax) * dx + (y - ay) * dy) / len2;
                            t = std::min(1.0f, std::max(0.0f, t));
                            const float px = ax + t * dx, py = ay + t * dy;
                            hit = (x - px) * (x - px) + (y - py) * (y - py) <= hw22;
                        }
                        if (hit) blend_pixel(img, W, y, x, ocol, alpha);
                    }
                }
            }
        }
    }

    // pass 2: opaque wireframes (zorder above all patches)
    if (show_3d) {
        static const int kSide[4][2] = {{0, 4}, {1, 5}, {2, 6}, {3, 7}};
        static const int kRing[8][2] = {{0, 1}, {1, 2}, {2, 3}, {3, 0},
                                        {4, 5}, {5, 6}, {6, 7}, {7, 4}};
        static const int kX[3][2] = {{4, 6}, {6, 5}, {5, 7}};
        for (int n = 0; n < N; ++n) {
            if (!valid[n]) continue;
            const float* c8 = corners + n * 16;
            const float* color = outline_color + n * 3;
            for (const auto& e : kSide)
                draw_segment(img, H, W, c8[e[0] * 2], c8[e[0] * 2 + 1],
                             c8[e[1] * 2], c8[e[1] * 2 + 1], color, hw2);
            for (const auto& e : kRing)
                draw_segment(img, H, W, c8[e[0] * 2], c8[e[0] * 2 + 1],
                             c8[e[1] * 2], c8[e[1] * 2 + 1], color, hw2);
            for (const auto& e : kX)
                draw_segment(img, H, W, c8[e[0] * 2], c8[e[0] * 2 + 1],
                             c8[e[1] * 2], c8[e[1] * 2 + 1], color, hw1);
        }
    }
}

// Trajectory dots: outer track-color circle + inner type-color circle.
void rasterize_trajectory_native(float* img, int H, int W,
                                 const float* centers, const uint8_t* valid,
                                 const float* type_color,
                                 const float* track_color, int N,
                                 float outer_radius, float inner_radius) {
    for (int pass = 0; pass < 2; ++pass) {
        const float radius = pass == 0 ? outer_radius : inner_radius;
        const float r2 = radius * radius;
        for (int n = 0; n < N; ++n) {
            if (!valid[n]) continue;
            const float cx = centers[n * 2], cy = centers[n * 2 + 1];
            const float* color =
                (pass == 0 ? track_color : type_color) + n * 3;
            const int min_x = std::max(0, static_cast<int>(cx - radius - 1));
            const int max_x = std::min(W - 1, static_cast<int>(cx + radius + 1));
            const int min_y = std::max(0, static_cast<int>(cy - radius - 1));
            const int max_y = std::min(H - 1, static_cast<int>(cy + radius + 1));
            for (int y = min_y; y <= max_y; ++y) {
                for (int x = min_x; x <= max_x; ++x) {
                    const float d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy);
                    if (d2 <= r2) paint_pixel(img, W, y, x, color);
                }
            }
        }
    }
}

}  // extern "C"
