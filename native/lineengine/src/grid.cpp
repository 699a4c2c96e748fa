// Prepare stage: box-id maps and the separator blocker mask.
// Behavior-equivalent to /root/reference/textline_detect/src/prepare.cpp.
#include "engine.h"

#include <algorithm>

namespace lineengine {

void paint_id_maps(const Context& ctx, const std::vector<Box>& boxes,
                   std::vector<int>& ids_all, std::vector<int>& ids_main) {
    // prepare_id_image (prepare.cpp:68-97): boxes whose map-rect pokes
    // outside the map are skipped entirely; later boxes overwrite earlier.
    ids_all.assign((size_t)ctx.w * ctx.h, -1);
    ids_main.assign((size_t)ctx.w * ctx.h, -1);
    const int s = ctx.p.scale;
    for (const Box& b : boxes) {
        int left = (int)((b.cx - b.w / 2) / s);
        int right = (int)((b.cx + b.w / 2) / s) + 1;
        int top = (int)((b.cy - b.h / 2) / s);
        int bottom = (int)((b.cy + b.h / 2) / s) + 1;
        if (left < 0 || right >= ctx.w || top < 0 || bottom >= ctx.h)
            continue;
        for (int y = top; y < bottom; ++y) {
            for (int x = left; x < right; ++x) {
                ids_all[ctx.at(x, y)] = b.id;
                if (!b.is_ruby()) ids_main[ctx.at(x, y)] = b.id;
            }
        }
    }
}

namespace {

// 4-connected labeling over a boolean mask, row-major seed order, DFS
// (search_connection, prepare.cpp:6-66). Returns the cluster count.
int label_components(const Context& ctx, const std::vector<bool>& mask,
                     std::vector<int>& labels) {
    labels.assign(mask.size(), -1);
    int count = 0;
    for (size_t seed = 0; seed < mask.size(); ++seed) {
        if (!mask[seed] || labels[seed] >= 0) continue;
        std::vector<size_t> stack{seed};
        while (!stack.empty()) {
            size_t i = stack.back();
            stack.pop_back();
            if (labels[i] >= 0 || !mask[i]) continue;
            labels[i] = count;
            int x = (int)(i % ctx.w), y = (int)(i / ctx.w);
            if (x > 0) stack.push_back(i - 1);
            if (y > 0) stack.push_back(i - ctx.w);
            if (x + 1 < ctx.w) stack.push_back(i + 1);
            if (y + 1 < ctx.h) stack.push_back(i + ctx.w);
        }
        ++count;
    }
    return count;
}

}  // namespace

std::vector<bool> make_blocker(const Context& ctx,
                               const std::vector<float>& sep) {
    // make_lineblocker (prepare.cpp:99-170): threshold strictly above
    // sep_valueth; drop clusters whose summed value is under
    // sep_clusterth; then hysteresis-grow each surviving pixel at 10% of
    // its own value over an 8-neighborhood.
    std::vector<bool> blocker(sep.size(), false);
    for (size_t i = 0; i < sep.size(); ++i)
        if (sep[i] > ctx.p.sep_valueth) blocker[i] = true;

    std::vector<int> labels;
    int count = label_components(ctx, blocker, labels);
    std::vector<double> weight(count, 0.0);
    for (size_t i = 0; i < sep.size(); ++i)
        if (labels[i] >= 0) weight[labels[i]] += sep[i];
    for (size_t i = 0; i < sep.size(); ++i)
        if (labels[i] >= 0 && weight[labels[i]] < ctx.p.sep_clusterth)
            blocker[i] = false;

    std::vector<size_t> seeds;
    for (size_t i = 0; i < sep.size(); ++i)
        if (blocker[i]) seeds.push_back(i);
    for (size_t seed : seeds) {
        const float th = sep[seed] * 0.1f;
        std::vector<size_t> stack{seed};
        while (!stack.empty()) {
            size_t i = stack.back();
            stack.pop_back();
            if (sep[i] < th) continue;
            blocker[i] = true;
            int x0 = (int)(i % ctx.w), y0 = (int)(i / ctx.w);
            for (int y = y0 - 1; y <= y0 + 1; ++y) {
                for (int x = x0 - 1; x <= x0 + 1; ++x) {
                    if (!ctx.inside(x, y)) continue;
                    size_t j = ctx.at(x, y);
                    if (blocker[j] || sep[j] < th) continue;
                    stack.push_back(j);
                }
            }
        }
    }
    return blocker;
}

}  // namespace lineengine
