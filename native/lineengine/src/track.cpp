// Chain utilities: in-chain ordering, endpoint/metric estimation, the
// smoothed center track and the chain-ownership raster map.
// Behavior-equivalent to the corresponding functions in
// /root/reference/textline_detect/src/search_loop.cpp (sort_chain :12-65,
// fix_chain_info :67-85, search_chain :87-177, find_linecenter_id
// :179-236, make_track_line :239-449, create_chainid_map :451-522).
#include "engine.h"

#include <algorithm>

namespace lineengine {

void sort_chain(std::vector<int>& chain, const std::vector<Box>& boxes) {
    if (chain.empty()) return;
    const bool horiz = boxes[chain.front()].horizontal();
    auto main_pos = [&](int id) { return horiz ? boxes[id].cx : boxes[id].cy; };
    auto main_end = [&](int id) {
        return horiz ? boxes[id].cx + boxes[id].w / 2
                     : boxes[id].cy + boxes[id].h / 2;
    };
    auto cross_pos = [&](int id) { return horiz ? boxes[id].cy : boxes[id].cx; };

    std::sort(chain.begin(), chain.end(), [&](int a, int b) {
        return main_pos(a) < main_pos(b);
    });
    // boxes overlapping along the reading axis sort by the cross axis
    auto it = chain.begin();
    while (it != chain.end()) {
        auto it2 = it + 1;
        while (it2 != chain.end() && main_end(*it) > main_pos(*it2)) ++it2;
        if (std::distance(it, it2) > 1) {
            std::sort(it, it2, [&](int a, int b) {
                return cross_pos(a) < cross_pos(b);
            });
        }
        it = it2;
    }
}

void tidy_chains(std::vector<Box>& boxes, Chains& chains) {
    chains.erase(std::remove_if(chains.begin(), chains.end(),
                                [](const std::vector<int>& c) {
                                    return c.size() < 2;
                                }),
                 chains.end());
    for (auto& chain : chains) sort_chain(chain, boxes);
}

namespace {

// Endpoint estimate for a chain, weighted towards the chain's first/last
// non-ruby non-doubleline boxes (search_chain, search_loop.cpp:87-177).
struct ChainEnds {
    float direction = 0;
    double w = 0, h = 0;
    float x0 = -1, y0 = -1, x1 = -1, y1 = -1;
    bool valid = false;
};

ChainEnds chain_ends(const std::vector<int>& chain,
                     const std::vector<Box>& boxes) {
    ChainEnds e;
    std::vector<int> core;
    for (int id : chain) {
        if (boxes[id].is_ruby()) continue;
        if (boxes[id].double_line > 0) continue;
        core.push_back(id);
        e.w = std::max(e.w, (double)boxes[id].w);
        e.h = std::max(e.h, (double)boxes[id].h);
    }
    if (core.empty()) return e;
    e.valid = true;
    const size_t n = core.size();
    // weight w*h/(i+1) emphasizes the near end
    auto weighted = [&](bool from_front, bool use_y) {
        double acc = 0, sum = 0;
        for (size_t i = 0; i < n; ++i) {
            const Box& b = boxes[core[i]];
            double wt = (double)b.w * b.h / (from_front ? i + 1 : n - i);
            acc += (use_y ? b.cy : b.cx) * wt;
            sum += wt;
        }
        return (float)(acc / sum);
    };
    if (boxes[core.front()].horizontal()) {
        e.y0 = weighted(true, true);
        e.x0 = boxes[core.front()].cx;
        e.y1 = weighted(false, true);
        e.x1 = boxes[core.back()].cx;
        e.direction = std::atan2(e.y1 - e.y0, e.x1 - e.x0);
        if (e.direction > M_PI_2) e.direction -= M_PI;
    } else {
        e.x0 = weighted(true, false);
        e.y0 = boxes[core.front()].cy;
        e.x1 = weighted(false, false);
        e.y1 = boxes[core.back()].cy;
        e.direction = std::atan2(e.y1 - e.y0, e.x1 - e.x0);
    }
    return e;
}

// Boxes close enough to the chain's fitted center line to steer the
// track (find_linecenter_id, search_loop.cpp:179-236).
std::vector<int> track_anchors(const std::vector<int>& chain,
                               const std::vector<Box>& boxes,
                               const ChainEnds& e) {
    std::vector<int> sel;
    double cx = 0, cy = 0;
    int n = 0;
    const double s = std::max(e.w, e.h);
    for (int id : chain) {
        const Box& b = boxes[id];
        if (b.is_ruby() || b.double_line > 0) continue;
        if (std::max(b.w, b.h) / s < 0.4) continue;
        cx += b.cx; cy += b.cy; ++n;
    }
    if (n == 0) return sel;
    cx /= n; cy /= n;
    for (int id : chain) {
        const Box& b = boxes[id];
        if (b.is_ruby() || b.double_line > 0) continue;
        if (std::max(b.w, b.h) / s < 0.4) continue;
        if (std::fabs(e.direction) < M_PI_4) {
            float yi = std::tan(e.direction) * (b.cx - cx) + cy;
            if (std::fabs(yi - b.cy) < s / 2) sel.push_back(id);
        } else {
            float xi = std::tan(M_PI_2 - e.direction) * (b.cy - cy) + cx;
            if (std::fabs(xi - b.cx) < s / 2) sel.push_back(id);
        }
    }
    return sel;
}

}  // namespace

void chain_track(const Context& ctx, std::vector<int>& xs,
                 std::vector<int>& ys, float& direction, double& w,
                 double& h, const std::vector<Box>& boxes,
                 const Chains& chains, const std::vector<bool>& blocker,
                 int chainid, int extra_len) {
    xs.clear();
    ys.clear();
    const std::vector<int>& chain = chains[chainid];
    ChainEnds e = chain_ends(chain, boxes);
    direction = e.direction;
    w = e.w;
    h = e.h;
    std::vector<int> anchors = track_anchors(chain, boxes, e);
    if (anchors.empty()) return;

    const bool horiz = std::fabs(direction) < M_PI_4;
    // knot sequence: box main-axis positions with a running average of
    // anchor cross positions (make_track_line, search_loop.cpp:259-294)
    std::vector<float> km, kc;   // main-axis knots, cross-axis values
    float run;
    {
        const Box& a = boxes[anchors.front()];
        run = horiz ? a.cy : a.cx;
        km.push_back(horiz ? a.cx - a.w / 2 : a.cy - a.h / 2);
        kc.push_back(run);
    }
    for (int id : chain) {
        const Box& b = boxes[id];
        if (b.is_ruby()) continue;
        if (std::find(anchors.begin(), anchors.end(), id) != anchors.end())
            run = (run + (horiz ? b.cy : b.cx)) / 2;
        km.push_back(horiz ? b.cx : b.cy);
        kc.push_back(run);
    }
    {
        const Box& a = boxes[anchors.back()];
        km.push_back(horiz ? a.cx + a.w / 2 : a.cy + a.h / 2);
        kc.push_back(horiz ? a.cy : a.cx);
    }

    auto emit = [&](int main, int cross) {
        if (horiz) { xs.push_back(main); ys.push_back(cross); }
        else { xs.push_back(cross); ys.push_back(main); }
    };
    const double char_span = horiz ? w : h;

    if (extra_len > 0 && km.size() >= 2) {
        // extrapolate before the start, stopping at blockers
        double a = (kc[1] - kc[0]) / (km[1] - km[0]);
        size_t mark = xs.size();
        for (int mp = (int)km[0]; mp > km[0] - extra_len * char_span * 2;
             mp -= ctx.p.scale) {
            int cp = (int)((mp - km[0]) * a + kc[0]);
            int mi = mp / ctx.p.scale, ci = cp / ctx.p.scale;
            int xi = horiz ? mi : ci, yi = horiz ? ci : mi;
            if (!ctx.inside(xi, yi)) continue;
            if (blocker[ctx.at(xi, yi)]) break;
            emit(mp, cp);
        }
        std::reverse(xs.begin() + mark, xs.end());
        std::reverse(ys.begin() + mark, ys.end());
    }
    for (size_t i = 0; i + 1 < km.size(); ++i) {
        double a = (kc[i + 1] - kc[i]) / (km[i + 1] - km[i]);
        if (!std::isfinite(a)) continue;
        for (int mp = (int)km[i]; mp < km[i + 1]; mp += ctx.p.scale)
            emit(mp, (int)((mp - km[i]) * a + kc[i]));
    }
    if (extra_len > 0 && km.size() >= 2) {
        size_t k = km.size();
        double a = (kc[k - 1] - kc[k - 2]) / (km[k - 1] - km[k - 2]);
        for (int mp = (int)km[k - 1];
             mp < km[k - 1] + extra_len * char_span * 2;
             mp += ctx.p.scale) {
            int cp = (int)((mp - km[k - 2]) * a + kc[k - 2]);
            int mi = mp / ctx.p.scale, ci = cp / ctx.p.scale;
            int xi = horiz ? mi : ci, yi = horiz ? ci : mi;
            if (!ctx.inside(xi, yi)) continue;
            if (blocker[ctx.at(xi, yi)]) break;
            emit(mp, cp);
        }
    }
}

std::vector<int> rasterize_chains(const Context& ctx,
                                  const std::vector<Box>& boxes,
                                  const Chains& chains,
                                  const std::vector<bool>& blocker,
                                  double ratio, int extra_len) {
    std::vector<int> map((size_t)ctx.w * ctx.h, -1);
    // pass 1: paint a band around each chain's center track
    for (int c = 0; c < (int)chains.size(); ++c) {
        if (chains[c].empty()) continue;
        std::vector<int> xs, ys;
        float direction;
        double w, h;
        chain_track(ctx, xs, ys, direction, w, h, boxes, chains, blocker,
                    c, extra_len);
        // fractional band: the loop start truncates but the end compares
        // as a double, so a band < 1 still paints the center row
        const double band = std::max(w, h) / 3 / ctx.p.scale * ratio;
        const bool horiz = std::fabs(direction) < M_PI_4;
        for (size_t i = 0; i < xs.size(); ++i) {
            int xi = xs[i] / ctx.p.scale, yi = ys[i] / ctx.p.scale;
            if (!ctx.inside(xi, yi)) continue;
            if (horiz) {
                for (int y = (int)(yi - band); y < yi + band; ++y) {
                    if (y < 0 || y >= ctx.h) continue;
                    if (map[ctx.at(xi, y)] < 0) map[ctx.at(xi, y)] = c;
                }
            } else {
                for (int x = (int)(xi - band); x < xi + band; ++x) {
                    if (x < 0 || x >= ctx.w) continue;
                    if (map[ctx.at(x, yi)] < 0) map[ctx.at(x, yi)] = c;
                }
            }
        }
    }
    // pass 2: paint the member boxes' own rectangles
    for (int c = 0; c < (int)chains.size(); ++c) {
        for (int id : chains[c]) {
            const Box& b = boxes[id];
            if (b.is_ruby()) continue;
            int left = (int)((b.cx - b.w / 2) / ctx.p.scale);
            int right = (int)((b.cx + b.w / 2) / ctx.p.scale);
            int top = (int)((b.cy - b.h / 2) / ctx.p.scale);
            int bottom = (int)((b.cy + b.h / 2) / ctx.p.scale);
            for (int y = top; y < bottom; ++y) {
                for (int x = left; x < right; ++x) {
                    if (!ctx.inside(x, y)) continue;
                    if (map[ctx.at(x, y)] < 0) map[ctx.at(x, y)] = c;
                }
            }
        }
    }
    return map;
}

}  // namespace lineengine
