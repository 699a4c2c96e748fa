// Native detector-training augmentation kernels.
//
// C++ equivalent of the hot loops in the reference's Cython augmenters
// (/root/reference/dataset/processer.pyx, make_traindata/processer3.pyx):
// inverse-affine bilinear/nearest resampling of the page image and the
// half-resolution textline/separator maps, plus painting of the gaussian
// center heatmap, log-size box map and id/flag ellipse maps. Parameter
// sampling stays in python (numpy RNG) so results are reproducible and
// the numpy fallback is bit-comparable.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Affine {
    double m[9];
};

inline void mat_mul(const double a[9], const double b[9], double out[9]) {
    double t[9];
    for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c) {
            double v = 0;
            for (int k = 0; k < 3; ++k) v += a[r * 3 + k] * b[k * 3 + c];
            t[r * 3 + c] = v;
        }
    std::memcpy(out, t, sizeof(t));
}

// shear @ resize @ move(+c) @ rot @ move(-c)  — same composition as the
// python `_affine_matrix`
Affine make_affine(double cx, double cy, double angle, double sx, double sy,
                   double shx, double shy) {
    double shear[9] = {1, shy, 0, shx, 1, 0, 0, 0, 1};
    double resize[9] = {sx, 0, 0, 0, sy, 0, 0, 0, 1};
    double move[9] = {1, 0, cx, 0, 1, cy, 0, 0, 1};
    double rot[9] = {std::cos(angle), -std::sin(angle), 0,
                     std::sin(angle), std::cos(angle), 0, 0, 0, 1};
    double back[9] = {1, 0, -cx, 0, 1, -cy, 0, 0, 1};
    Affine r;
    mat_mul(shear, resize, r.m);
    mat_mul(r.m, move, r.m);
    mat_mul(r.m, rot, r.m);
    mat_mul(r.m, back, r.m);
    return r;
}

bool invert3(const double m[9], double out[9]) {
    double a = m[0], b = m[1], c = m[2], d = m[3], e = m[4], f = m[5],
           g = m[6], h = m[7], i = m[8];
    double det = a * (e * i - f * h) - b * (d * i - f * g) +
                 c * (d * h - e * g);
    if (std::fabs(det) < 1e-12) return false;
    double inv = 1.0 / det;
    out[0] = (e * i - f * h) * inv;
    out[1] = (c * h - b * i) * inv;
    out[2] = (b * f - c * e) * inv;
    out[3] = (f * g - d * i) * inv;
    out[4] = (a * i - c * g) * inv;
    out[5] = (c * d - a * f) * inv;
    out[6] = (d * h - e * g) * inv;
    out[7] = (b * g - a * h) * inv;
    out[8] = (a * e - b * d) * inv;
    return true;
}

// Sampling reads go through a zero-bordered float copy of the source:
// a single coordinate range test replaces four bounds-checked gathers
// per pixel, and the u8 -> [0,1] conversion happens once per source
// pixel through a LUT (i / 255.f — the identical expression the checked
// path used, so results stay bit-for-bit equal to the numpy backend).
// Taps that land exactly one pixel outside read the zero border, which
// is what the bounds check returned; anything farther out contributed
// exact 0.0 to every term, so the whole pixel short-circuits to 0.
void warp(const uint8_t* src, int sh, int sw, const double inv[9],
          double startx, double starty, double step, int oh, int ow,
          bool nearest, float* out) {
    float lut[256];
    for (int i = 0; i < 256; ++i) lut[i] = i / 255.f;
    const int pw = sw + 2;
    std::vector<float> pad((size_t)(sh + 2) * pw, 0.f);
    for (int y = 0; y < sh; ++y) {
        const uint8_t* srow = src + (size_t)y * sw;
        float* drow = pad.data() + (size_t)(y + 1) * pw + 1;
        for (int x = 0; x < sw; ++x) drow[x] = lut[srow[x]];
    }
    const float* P = pad.data();
    for (int y = 0; y < oh; ++y) {
        for (int x = 0; x < ow; ++x) {
            double gx = x * step + startx;
            double gy = y * step + starty;
            double rx = inv[0] * gx + inv[1] * gy + inv[2];
            double ry = inv[3] * gx + inv[4] * gy + inv[5];
            float v;
            if (nearest) {
                int xi = (int)(rx + 0.5), yi = (int)(ry + 0.5);
                v = (xi >= -1 && xi <= sw && yi >= -1 && yi <= sh)
                    ? P[(size_t)(yi + 1) * pw + (xi + 1)] : 0.f;
            } else if (rx >= -1.0 && rx < (double)sw &&
                       ry >= -1.0 && ry < (double)sh) {
                int x0 = (int)std::floor(rx), y0 = (int)std::floor(ry);
                float dx = (float)(rx - x0), dy = (float)(ry - y0);
                const float* p0 = P + (size_t)(y0 + 1) * pw + (x0 + 1);
                v = (1 - dx) * (1 - dy) * p0[0] +
                    dx * (1 - dy) * p0[1] +
                    (1 - dx) * dy * p0[pw] +
                    dx * dy * p0[pw + 1];
            } else {
                v = 0.f;
            }
            out[(size_t)y * ow + x] = v;
        }
    }
}

void paint_center(float* center, int mh, int mw, double cx, double cy,
                  double w, double h, int scale) {
    double cxs = cx / scale, cys = cy / scale;
    double fw = std::max(w / scale / 2, 1.0);
    double fh = std::max(h / scale / 2, 1.0);
    int k = (int)std::max(fw * 1.5, fh * 1.5);
    double sx = fw / 4, sy = fh / 4;
    int xi = (int)std::lround(cxs), yi = (int)std::lround(cys);
    for (int ky = -k; ky <= k; ++ky) {
        int y = yi + ky;
        if (y < 0 || y >= mh) continue;
        double gy = std::exp(-0.5 * ky * ky / (sy * sy));
        for (int kx = -k; kx <= k; ++kx) {
            int x = xi + kx;
            if (x < 0 || x >= mw) continue;
            float v = (float)(gy * std::exp(-0.5 * kx * kx / (sx * sx)));
            float& c = center[(size_t)y * mw + x];
            if (v > c) c = v;
        }
    }
}

void paint_box_id(float* boxmap, int32_t* idmap, int mh, int mw,
                  double cx, double cy, double w, double h,
                  int32_t code, int32_t flags, int scale) {
    double fw = std::max(w / 10, (double)scale);
    double fh = std::max(h / 10, (double)scale);
    double sizex = std::log(w / 1024.0) + 3;
    double sizey = std::log(h / 1024.0) + 3;
    int x0 = std::max(0, (int)((cx - fw) / scale) - 2);
    int x1 = std::min(mw, (int)((cx + fw) / scale) + 2);
    int y0 = std::max(0, (int)((cy - fh) / scale) - 2);
    int y1 = std::min(mh, (int)((cy + fh) / scale) + 2);
    for (int yi = y0; yi < y1; ++yi) {
        for (int xi = x0; xi < x1; ++xi) {
            double dx = xi * (double)scale - cx;
            double dy = yi * (double)scale - cy;
            if ((dx / fw) * (dx / fw) + (dy / fh) * (dy / fh) >= 1) continue;
            size_t i = (size_t)yi * mw + xi;
            float& bx = boxmap[i * 2 + 0];
            float& by = boxmap[i * 2 + 1];
            if (sizex < bx) bx = (float)sizex;
            if (sizey < by) by = (float)sizey;
            int32_t& ic = idmap[i * 2 + 0];
            int32_t& fl = idmap[i * 2 + 1];
            if (code > ic) ic = code;
            if (flags > fl) fl = flags;
        }
    }
}

}  // namespace

extern "C" {

// Full augmentation application. All randomness is pre-sampled:
// params = [angle, size_x, size_y, sh_x, sh_y, startx, starty, nearest,
//           inv_y0, inv_y1, inv_x0, inv_x1]  (inversion rect; -1 = none)
// Outputs: out_image (oh*ow f32 in [0,1]),
//          out_labelmap (oh/scale * ow/scale * 5 f32, HWC),
//          out_idmap (.. * 2 i32), out_positions (n*4 f32, crop coords).
int augment_apply(const uint8_t* image, int im_h, int im_w,
                  const uint8_t* textline, const uint8_t* sepline,
                  int map_h, int map_w,
                  const float* position, const int32_t* codelist, int n,
                  const double* params, int out_h, int out_w, int scale,
                  float* out_image, float* out_labelmap,
                  int32_t* out_idmap, float* out_positions) {
    const double angle = params[0], sx = params[1], sy = params[2];
    const double shx = params[3], shy = params[4];
    const double startx = params[5], starty = params[6];
    const bool nearest = params[7] > 0.5;
    const int ir_y0 = (int)params[8], ir_y1 = (int)params[9];
    const int ir_x0 = (int)params[10], ir_x1 = (int)params[11];

    const int mh = out_h / scale, mw = out_w / scale;

    // partial inversion copy
    std::vector<uint8_t> img((size_t)im_h * im_w);
    std::memcpy(img.data(), image, img.size());
    if (ir_y0 >= 0) {
        for (int y = std::max(0, ir_y0); y < std::min(im_h, ir_y1); ++y)
            for (int x = std::max(0, ir_x0); x < std::min(im_w, ir_x1); ++x)
                img[(size_t)y * im_w + x] =
                    255 - img[(size_t)y * im_w + x];
    }

    Affine M = make_affine(im_w / 2.0, im_h / 2.0, angle, sx, sy, shx, shy);
    Affine M2 = make_affine(map_w / 2.0, map_h / 2.0, angle, sx, sy,
                            shx, shy);
    double Minv[9], M2inv[9];
    if (!invert3(M.m, Minv) || !invert3(M2.m, M2inv)) return -1;

    // transform positions: corners through M, re-axis-align
    for (int i = 0; i < n; ++i) {
        double cx = position[i * 4 + 0], cy = position[i * 4 + 1];
        double w = position[i * 4 + 2], h = position[i * 4 + 3];
        double x1 = cx - w / 2, y1 = cy - h / 2;
        double x2 = cx + w / 2, y2 = cy + h / 2;
        double r1x = M.m[0] * x1 + M.m[1] * y1 + M.m[2];
        double r1y = M.m[3] * x1 + M.m[4] * y1 + M.m[5];
        double r2x = M.m[0] * x2 + M.m[1] * y2 + M.m[2];
        double r2y = M.m[3] * x2 + M.m[4] * y2 + M.m[5];
        out_positions[i * 4 + 0] = (float)((r1x + r2x) / 2 - startx);
        out_positions[i * 4 + 1] = (float)((r1y + r2y) / 2 - starty);
        out_positions[i * 4 + 2] = (float)(r2x - r1x);
        out_positions[i * 4 + 3] = (float)(r2y - r1y);
    }

    // target maps
    std::vector<float> center((size_t)mh * mw, 0.f);
    std::vector<float> boxmap((size_t)mh * mw * 2, 1e30f);
    std::vector<int32_t> idmap((size_t)mh * mw * 2, 0);
    for (int i = 0; i < n; ++i) {
        double cx = out_positions[i * 4 + 0];
        double cy = out_positions[i * 4 + 1];
        double w = out_positions[i * 4 + 2];
        double h = out_positions[i * 4 + 3];
        if (!(cx > 0 && cx < out_w && cy > 0 && cy < out_h)) continue;
        paint_center(center.data(), mh, mw, cx, cy, w, h, scale);
        paint_box_id(boxmap.data(), idmap.data(), mh, mw, cx, cy, w, h,
                     codelist[i * 2 + 0], codelist[i * 2 + 1], scale);
    }

    // image + map warps
    warp(img.data(), im_h, im_w, Minv, startx, starty, 1.0, out_h, out_w,
         nearest, out_image);
    std::vector<float> line((size_t)mh * mw), seps((size_t)mh * mw);
    warp(textline, map_h, map_w, M2inv, startx / 2, starty / 2,
         scale / 2.0, mh, mw, false, line.data());
    warp(sepline, map_h, map_w, M2inv, startx / 2, starty / 2,
         scale / 2.0, mh, mw, false, seps.data());

    // assemble labelmap HWC: key, xsize, ysize, line, sep
    for (size_t i = 0; i < (size_t)mh * mw; ++i) {
        float bx = boxmap[i * 2 + 0], by = boxmap[i * 2 + 1];
        out_labelmap[i * 5 + 0] = center[i];
        out_labelmap[i * 5 + 1] = bx < 1e29f ? bx : 0.f;
        out_labelmap[i * 5 + 2] = by < 1e29f ? by : 0.f;
        out_labelmap[i * 5 + 3] = line[i];
        out_labelmap[i * 5 + 4] = seps[i];
        out_idmap[i * 2 + 0] = idmap[i * 2 + 0];
        out_idmap[i * 2 + 1] = idmap[i * 2 + 1];
    }
    return 0;
}

}  // extern "C"
