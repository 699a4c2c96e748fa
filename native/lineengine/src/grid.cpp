#include "grid.h"

#include <algorithm>
#include <cmath>
#include <queue>

namespace lineengine {

BoolImage make_separator_mask(const Image& sep, const Params& p) {
    const int w = sep.w, h = sep.h;
    BoolImage mask{w, h, std::vector<uint8_t>((size_t)w * h, 0)};

    // 4-connected components over sep >= sep_valueth
    std::vector<int> label((size_t)w * h, -1);
    int ncomp = 0;
    std::vector<float> comp_sum;
    std::vector<float> comp_max;
    std::vector<std::vector<int>> comp_px;
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            size_t i = (size_t)y * w + x;
            if (label[i] >= 0 || sep.v[i] < p.sep_valueth) continue;
            int c = ncomp++;
            comp_sum.push_back(0.f);
            comp_max.push_back(0.f);
            comp_px.emplace_back();
            std::queue<int> q;
            q.push((int)i);
            label[i] = c;
            while (!q.empty()) {
                int j = q.front(); q.pop();
                int jx = j % w, jy = j / w;
                comp_sum[c] += sep.v[j];
                comp_max[c] = std::max(comp_max[c], sep.v[j]);
                comp_px[c].push_back(j);
                const int dx[4] = {1, -1, 0, 0};
                const int dy[4] = {0, 0, 1, -1};
                for (int k = 0; k < 4; ++k) {
                    int nx = jx + dx[k], ny = jy + dy[k];
                    if (nx < 0 || nx >= w || ny < 0 || ny >= h) continue;
                    size_t ni = (size_t)ny * w + nx;
                    if (label[ni] >= 0 || sep.v[ni] < p.sep_valueth) continue;
                    label[ni] = c;
                    q.push((int)ni);
                }
            }
        }
    }

    // keep strong components; hysteresis-grow them at 10% of seed max
    for (int c = 0; c < ncomp; ++c) {
        if (comp_sum[c] < p.sep_clusterth) continue;
        float grow_th = comp_max[c] * 0.1f;
        std::queue<int> q;
        for (int j : comp_px[c]) {
            mask.v[j] = 1;
            q.push(j);
        }
        while (!q.empty()) {
            int j = q.front(); q.pop();
            int jx = j % w, jy = j / w;
            const int dx[4] = {1, -1, 0, 0};
            const int dy[4] = {0, 0, 1, -1};
            for (int k = 0; k < 4; ++k) {
                int nx = jx + dx[k], ny = jy + dy[k];
                if (nx < 0 || nx >= w || ny < 0 || ny >= h) continue;
                size_t ni = (size_t)ny * w + nx;
                if (mask.v[ni] || sep.v[ni] < grow_th) continue;
                mask.v[ni] = 1;
                q.push((int)ni);
            }
        }
    }
    return mask;
}

LineComponents find_line_components(const Image& line,
                                    const BoolImage& sepmask,
                                    const Params& p) {
    const int w = line.w, h = line.h;
    LineComponents lc;
    lc.w = w; lc.h = h;
    lc.label.assign((size_t)w * h, -1);

    auto on = [&](int x, int y) {
        if (x < 0 || x >= w || y < 0 || y >= h) return false;
        size_t i = (size_t)y * w + x;
        return line.v[i] >= p.line_valueth && !sepmask.v[i];
    };

    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            size_t i = (size_t)y * w + x;
            if (lc.label[i] >= 0 || !on(x, y)) continue;
            int c = lc.count++;
            std::vector<int> px;
            std::queue<int> q;
            q.push((int)i);
            lc.label[i] = c;
            while (!q.empty()) {
                int j = q.front(); q.pop();
                px.push_back(j);
                int jx = j % w, jy = j / w;
                // 5x5 neighborhood bridges small raster gaps
                for (int dy = -2; dy <= 2; ++dy) {
                    for (int dx = -2; dx <= 2; ++dx) {
                        int nx = jx + dx, ny = jy + dy;
                        if (!on(nx, ny)) continue;
                        size_t ni = (size_t)ny * w + nx;
                        if (lc.label[ni] >= 0) continue;
                        lc.label[ni] = c;
                        q.push((int)ni);
                    }
                }
            }
            // orientation from coordinate covariance (PCA)
            double mx = 0, my = 0;
            for (int j : px) { mx += j % w; my += j / w; }
            mx /= px.size(); my /= px.size();
            double sxx = 0, syy = 0, sxy = 0;
            for (int j : px) {
                double dx = j % w - mx, dy = j / w - my;
                sxx += dx * dx; syy += dy * dy; sxy += dx * dy;
            }
            double theta = 0.5 * std::atan2(2 * sxy, sxx - syy);
            lc.dir.push_back(theta);
            lc.vertical.push_back(syy > sxx);
        }
    }
    return lc;
}

bool crosses_separator(const BoolImage& sepmask, const Params& p,
                       float x0, float y0, float x1, float y1) {
    float mx0 = x0 / p.scale, my0 = y0 / p.scale;
    float mx1 = x1 / p.scale, my1 = y1 / p.scale;
    float dx = mx1 - mx0, dy = my1 - my0;
    int steps = (int)std::ceil(std::max(std::fabs(dx), std::fabs(dy)));
    if (steps == 0) steps = 1;
    for (int s = 0; s <= steps; ++s) {
        float t = (float)s / steps;
        int x = (int)std::lround(mx0 + t * dx);
        int y = (int)std::lround(my0 + t * dy);
        if (sepmask.at(x, y)) return true;
    }
    return false;
}

}  // namespace lineengine
