// Line finding: textline-map clustering, orientation, box attachment.
// Behavior-equivalent to
// /root/reference/textline_detect/src/hough_linefind.cpp.
#include "engine.h"

#include <algorithm>
#include <limits>
#include <numeric>

namespace lineengine {

namespace {

// Greedy flood-fill clustering of textline pixels, strongest seed first
// (detect_line, hough_linefind.cpp:200-255). 5x5 neighborhood; touching a
// blocker pixel abandons the whole neighborhood scan of that pixel.
int cluster_line_pixels(const Context& ctx, std::vector<int>& labels,
                        const std::vector<float>& lineimage,
                        const std::vector<bool>& blocker) {
    std::vector<int> order(lineimage.size());
    std::iota(order.begin(), order.end(), 0);
    std::sort(order.begin(), order.end(), [&](int a, int b) {
        return lineimage[a] > lineimage[b];
    });
    int count = 0;
    for (int seed : order) {
        if (lineimage[seed] < ctx.p.line_valueth) break;
        if (labels[seed] >= 0 || blocker[seed]) continue;
        const int sx = seed % ctx.w, sy = seed / ctx.w;
        std::vector<int> stack{seed};
        while (!stack.empty()) {
            int i = stack.back();
            stack.pop_back();
            if (labels[i] >= 0 || blocker[i]) continue;
            if (lineimage[i] < ctx.p.line_valueth) continue;
            labels[i] = count;
            const int x0 = i % ctx.w, y0 = i / ctx.w;
            std::vector<int> found;
            bool hit_blocker = false;
            for (int y = y0 - 2; y <= y0 + 2 && !hit_blocker; ++y) {
                for (int x = x0 - 2; x <= x0 + 2; ++x) {
                    if (!ctx.inside(x, y)) continue;
                    if (ctx.run_mode == 1 && std::abs(y - sy) > 10) continue;
                    if (ctx.run_mode == 2 && std::abs(x - sx) > 10) continue;
                    int j = (int)ctx.at(x, y);
                    if (labels[j] >= 0) continue;
                    if (blocker[j]) { hit_blocker = true; break; }
                    if (lineimage[j] < ctx.p.line_valueth) continue;
                    found.push_back(j);
                }
            }
            if (!hit_blocker)
                stack.insert(stack.end(), found.begin(), found.end());
        }
        ++count;
    }
    return count;
}

// Per-cluster orientation from the extremal pixels along the long axis;
// clusters rejected by run_mode are dropped and ids renumbered
// (set_angle, hough_linefind.cpp:257-334).
int orient_clusters(const Context& ctx, std::vector<double>& angles,
                    std::vector<int>& labels, int count) {
    std::vector<std::vector<int>> members(count);
    for (size_t i = 0; i < labels.size(); ++i)
        if (labels[i] >= 0) members[labels[i]].push_back((int)i);

    std::vector<double> kept_angle;
    std::vector<std::vector<int>> kept;
    for (const auto& px : members) {
        int minx = ctx.w, maxx = 0, miny = ctx.h, maxy = 0;
        for (int i : px) {
            int x = i % ctx.w, y = i / ctx.w;
            minx = std::min(minx, x); maxx = std::max(maxx, x);
            miny = std::min(miny, y); maxy = std::max(maxy, y);
        }
        const bool tall = maxx - minx < maxy - miny;
        if (tall ? (ctx.run_mode == 1) : (ctx.run_mode == 2)) continue;
        // endpoints: first-encountered extremes along the long axis
        int p1x = ctx.w, p1y = ctx.h, p2x = 0, p2y = 0;
        for (int i : px) {
            int x = i % ctx.w, y = i / ctx.w;
            if (tall) {
                if (p1y > y) { p1x = x; p1y = y; }
                if (p2y < y) { p2x = x; p2y = y; }
            } else {
                if (p1x > x) { p1x = x; p1y = y; }
                if (p2x < x) { p2x = x; p2y = y; }
            }
        }
        kept_angle.push_back(std::atan2(p2y - p1y, p2x - p1x));
        kept.push_back(px);
    }
    std::fill(labels.begin(), labels.end(), -1);
    for (int id = 0; id < (int)kept.size(); ++id) {
        for (int i : kept[id]) {
            angles[i] = kept_angle[id];
            labels[i] = id;
        }
    }
    return (int)kept.size();
}

// Attach each non-ruby box to the first line cluster reached by walking
// outward from its center (chain_boxes, hough_linefind.cpp:13-121).
// Probe order per radius: left, right, up, down; a run_mode-rejected hit
// skips the remaining probes at that radius.
Chains attach_boxes(const Context& ctx, std::vector<Box>& boxes,
                    const std::vector<double>& angles,
                    const std::vector<int>& labels, int count) {
    Chains chains(count);
    for (Box& b : boxes) {
        if (b.is_ruby()) continue;
        const float probes[4][2] = {{-1, 0}, {1, 0}, {0, -1}, {0, 1}};
        bool attached = false;
        for (int di = 0; di < std::max(b.w, b.h) / 2 && !attached;
             di += ctx.p.scale) {
            for (const auto& pr : probes) {
                int x = (int)(b.cx + pr[0] * di) / ctx.p.scale;
                int y = (int)(b.cy + pr[1] * di) / ctx.p.scale;
                if (!ctx.inside(x, y)) continue;
                int id = labels[ctx.at(x, y)];
                double dir = angles[ctx.at(x, y)];
                if (id < 0 || std::isnan(dir)) continue;
                const bool horiz = std::fabs(dir) < M_PI_4;
                if (horiz ? (ctx.run_mode == 2) : (ctx.run_mode == 1))
                    break;   // next radius
                chains[id].push_back(b.id);
                b.direction = dir;
                attached = true;
                break;
            }
        }
    }
    return chains;
}

// Thicken clusters by the attached boxes' sizes so a second attachment
// pass reaches offset boxes (line_grow, hough_linefind.cpp:123-198).
// Horizontal lines grow upward only; vertical lines grow both sideways.
void grow_lines(const Context& ctx, std::vector<double>& angles,
                std::vector<int>& labels, const std::vector<Box>& boxes,
                const Chains& chains, const std::vector<bool>& blocker) {
    std::vector<int> widths(chains.size(), 0);
    for (size_t c = 0; c < chains.size(); ++c) {
        float m = 0;
        for (int id : chains[c]) {
            if (boxes[id].horizontal()) {
                m = std::max(m, boxes[id].h);
            } else {
                m = std::max(m, std::max(boxes[id].w, boxes[id].h));
            }
        }
        widths[c] = (int)(m / ctx.p.scale);
    }
    std::vector<int> grown(labels.size(), -1);
    for (int y = 0; y < ctx.h; ++y) {
        for (int x = 0; x < ctx.w; ++x) {
            size_t i = ctx.at(x, y);
            if (blocker[i]) continue;
            int id = labels[i];
            if (id < 0) continue;
            grown[i] = id;
            double dir = angles[i];
            const bool horiz = std::fabs(dir) < M_PI_4;
            if (horiz ? (ctx.run_mode == 2) : (ctx.run_mode == 1)) continue;
            const int m = widths[id];
            if (horiz) {
                for (int y2 = y; y2 >= std::max(0, y - m); --y2) {
                    size_t j = ctx.at(x, y2);
                    if (blocker[j]) break;
                    if (grown[j] < 0) { grown[j] = id; angles[j] = dir; }
                }
            } else {
                for (int x2 = x; x2 >= std::max(0, x - m / 2); --x2) {
                    size_t j = ctx.at(x2, y);
                    if (blocker[j]) break;
                    if (grown[j] < 0) { grown[j] = id; angles[j] = dir; }
                }
                for (int x2 = x; x2 < std::min(ctx.w, x + m / 2 + 1); ++x2) {
                    size_t j = ctx.at(x2, y);
                    if (blocker[j]) break;
                    if (grown[j] < 0) { grown[j] = id; angles[j] = dir; }
                }
            }
        }
    }
    labels = grown;
}

}  // namespace

Chains find_lines(const Context& ctx, std::vector<Box>& boxes,
                  const std::vector<float>& lineimage,
                  const std::vector<bool>& blocker) {
    std::vector<double> angles(lineimage.size(),
                               std::numeric_limits<double>::quiet_NaN());
    std::vector<int> labels(lineimage.size(), -1);
    int count = cluster_line_pixels(ctx, labels, lineimage, blocker);
    count = orient_clusters(ctx, angles, labels, count);

    Chains chains = attach_boxes(ctx, boxes, angles, labels, count);
    grow_lines(ctx, angles, labels, boxes, chains, blocker);
    chains = attach_boxes(ctx, boxes, angles, labels, count);

    tidy_chains(boxes, chains);
    return chains;
}

}  // namespace lineengine
