// Chain assembly: iterative merging of collinear chains, orphan
// re-attachment, double-line marking and space chaining.
// Behavior-equivalent to /root/reference/textline_detect/src/search_loop.cpp
// (combine_chains :576-891, process_merge :524-574, fix_unbined :904-1088,
// chain_space :1090-1249, search_loop :1251-1270).
#include "engine.h"

#include <algorithm>
#include <numeric>

namespace lineengine {

namespace {

// Exponential average of the cross coordinate walking the chain towards
// one end; weights the final box 0.75 (combine_chains :609-619).
double end_average(const std::vector<int>& chain,
                   const std::vector<Box>& boxes, bool use_y,
                   bool towards_front) {
    auto coord = [&](int id) {
        return (double)(use_y ? boxes[id].cy : boxes[id].cx);
    };
    double acc = coord(towards_front ? chain.back() : chain.front());
    if (towards_front) {
        for (int i = (int)chain.size() - 1; i >= 0; --i)
            acc = 0.25 * acc + 0.75 * coord(chain[i]);
    } else {
        for (size_t i = 0; i < chain.size(); ++i)
            acc = 0.25 * acc + 0.75 * coord(chain[i]);
    }
    return acc;
}

double max_w(const std::vector<int>& chain, const std::vector<Box>& boxes) {
    double m = 0;
    for (int id : chain) m = std::max(m, (double)boxes[id].w);
    return m;
}
double max_h(const std::vector<int>& chain, const std::vector<Box>& boxes) {
    double m = 0;
    for (int id : chain) m = std::max(m, (double)boxes[id].h);
    return m;
}

// Mean positive gap between consecutive boxes along the reading axis
// (combine_chains :621-635).
double mean_gap(const std::vector<int>& chain, const std::vector<Box>& boxes,
                bool horiz) {
    double acc = 0;
    for (size_t i = 0; i + 1 < chain.size(); ++i) {
        const Box& a = boxes[chain[i]];
        const Box& b = boxes[chain[i + 1]];
        float g = horiz ? (b.cx - b.w / 2) - (a.cx + a.w / 2)
                        : (b.cy - b.h / 2) - (a.cy + a.h / 2);
        if (g > 0) acc += g;
    }
    double space = acc / (chain.size() - 1);
    return space < 0 ? 0 : space;
}

// Resolve the merge-intent forest and concatenate chains
// (process_merge, search_loop.cpp:524-574).
void apply_merges(Chains& chains, const std::vector<int>& merge_into) {
    std::vector<int> root(chains.size(), -1);
    for (size_t i = 0; i < merge_into.size(); ++i) {
        if (merge_into[i] == -1) continue;
        std::vector<int> walked;
        int j = merge_into[i];
        walked.push_back(j);
        while (merge_into[j] != -1 &&
               std::find(walked.begin(), walked.end(), merge_into[j]) ==
                   walked.end()) {
            j = merge_into[j];
            walked.push_back(j);
        }
        if (merge_into[j] != -1) {
            // cycle: everyone in it lands in one fresh chain
            int k = -1;
            for (int c : walked) {
                if (root[c] >= 0) { k = root[c]; break; }
            }
            if (k < 0) {
                root[i] = (int)chains.size();
                chains.emplace_back();
                root.push_back(-1);
            } else {
                root[i] = k;
            }
        } else {
            root[i] = j;
        }
    }
    for (size_t i = 0; i < chains.size(); ++i) {
        if (root[i] < 0) continue;
        auto& dst = chains[root[i]];
        dst.insert(dst.end(), chains[i].begin(), chains[i].end());
        chains[i].clear();
    }
    for (auto& chain : chains) {
        if (chain.size() < 2) continue;
        std::sort(chain.begin(), chain.end());
        chain.erase(std::unique(chain.begin(), chain.end()), chain.end());
    }
}

// One merge-intent scan over all chains. Looks 3x(char+space) beyond each
// chain end inside a +-h/8 corridor for another chain to continue; aborts
// at separators; a single unambiguous partner is recorded
// (combine_chains, search_loop.cpp:576-891).
bool propose_merges(const Context& ctx, std::vector<Box>& boxes,
                    Chains& chains, const std::vector<bool>& blocker,
                    const std::vector<int>& cmap,
                    std::vector<int>& merge_into) {
    bool any = false;
    for (int cid = 0; cid < (int)chains.size(); ++cid) {
        const auto& chain = chains[cid];
        const int head = chain.front(), tail = chain.back();
        const double w = max_w(chain, boxes), h = max_h(chain, boxes);
        const bool horiz = boxes[head].horizontal();
        // cross coordinate near the head/tail (EMA towards that end)
        const double head_cross = end_average(chain, boxes, horiz, true);
        const double tail_cross = end_average(chain, boxes, horiz, false);
        const double space = mean_gap(chain, boxes, horiz);
        const double reach = ((horiz ? w : h) + space) * 3.0;
        const double corridor = (horiz ? h : w) / 8.0;

        std::vector<int> done;
        // scan one direction from one chain end; returns candidate list
        // (cleared when a separator interposes)
        auto scan = [&](float edge, int sign, double cross,
                        bool match_front_dl, int dl) {
            std::vector<int> cands;
            for (double s = 0; s < reach; s += ctx.p.scale) {
                int mpos = (int)(edge + sign * s) / ctx.p.scale;
                if (horiz ? (mpos < 0 || mpos >= ctx.w)
                          : (mpos < 0 || mpos >= ctx.h))
                    continue;
                for (int k = -5; k <= 5; ++k) {
                    int cpos = (int)(cross + corridor * k / 5) / ctx.p.scale;
                    if (horiz ? (cpos < 0 || cpos >= ctx.h)
                              : (cpos < 0 || cpos >= ctx.w))
                        continue;
                    size_t at = horiz ? ctx.at(mpos, cpos)
                                      : ctx.at(cpos, mpos);
                    if (blocker[at]) {
                        cands.clear();
                        return cands;
                    }
                    int other = cmap[at];
                    if (other < 0 || other == cid) continue;
                    if (std::find(done.begin(), done.end(), other) !=
                        done.end())
                        continue;
                    if (std::find(cands.begin(), cands.end(), other) !=
                        cands.end())
                        continue;
                    const auto& oc = chains[other];
                    const Box& oback = boxes[oc.back()];
                    int odl = match_front_dl ? boxes[oc.front()].double_line
                                             : oback.double_line;
                    if (oback.horizontal() == horiz && odl == dl) {
                        double oh = horiz ? max_h(oc, boxes)
                                          : max_w(oc, boxes);
                        double ocross;
                        if (sign < 0) {
                            // partner sits before us: compare our head
                            // against its tail EMA. Reference quirk
                            // (:667-671, :807-811): the EMA restarts from
                            // OUR end average each step, leaving only the
                            // partner's last box weighted.
                            double acc = horiz ? boxes[oc.front()].cy
                                               : boxes[oc.front()].cx;
                            for (size_t t = 0; t < oc.size(); ++t) {
                                acc = 0.25 * tail_cross +
                                      0.75 * (horiz ? boxes[oc[t]].cy
                                                    : boxes[oc[t]].cx);
                            }
                            ocross = acc;
                            if (std::fabs(head_cross - ocross) <
                                std::max(horiz ? h : w, oh)) {
                                cands.push_back(other);
                                continue;
                            }
                        } else {
                            // partner continues us: its head EMA
                            ocross = end_average(oc, boxes, horiz, true);
                            if (std::fabs(tail_cross - ocross) <
                                std::max(horiz ? h : w, oh)) {
                                cands.push_back(other);
                            }
                        }
                    }
                    done.push_back(other);
                }
                if (!done.empty()) break;
            }
            return cands;
        };

        // backwards: does some chain end where we start?
        {
            float edge = horiz ? boxes[head].cx - (float)(w / 2)
                               : boxes[head].cy - (float)(h / 2);
            auto cands = scan(edge, -1, head_cross, false,
                              boxes[head].double_line);
            if (cands.size() == 1) {
                merge_into[cid] = cands[0];
                any = true;
            }
        }
        // forwards: does some chain start where we end?
        {
            float edge = horiz ? boxes[tail].cx + (float)(w / 2)
                               : boxes[tail].cy + (float)(h / 2);
            auto cands = scan(edge, 1, tail_cross, true,
                              boxes[tail].double_line);
            if (cands.size() == 1) {
                merge_into[cands[0]] = cid;
                any = true;
            }
        }
    }
    return any;
}

void combine_chains(const Context& ctx, std::vector<Box>& boxes,
                    Chains& chains, const std::vector<bool>& blocker) {
    while (true) {
        tidy_chains(boxes, chains);
        std::vector<int> cmap = rasterize_chains(ctx, boxes, chains, blocker);
        std::vector<int> merge_into(chains.size(), -1);
        if (!propose_merges(ctx, boxes, chains, blocker, cmap, merge_into))
            break;
        apply_merges(chains, merge_into);
    }
}

int count_chained(const Chains& chains) {
    int n = 0;
    for (const auto& c : chains) n += (int)c.size();
    return n;
}

// boxes not yet on any chain, excluding ruby
std::vector<int> unchained_boxes(const std::vector<Box>& boxes,
                                 const Chains& chains, bool skip_ruby) {
    std::vector<char> used(boxes.size(), 0);
    for (const auto& c : chains)
        for (int id : c) used[id] = 1;
    std::vector<int> out;
    for (const Box& b : boxes) {
        if (used[b.id]) continue;
        if (skip_ruby && b.is_ruby()) continue;
        out.push_back(b.id);
    }
    return out;
}

// Re-attach orphan boxes to nearby chains: probe 9 points of the box
// against the chain raster, then scan sideways for a direction-compatible
// chain (fix_unbined, search_loop.cpp:904-1088). Returns true if the
// number of unchained boxes changed.
bool reclaim_orphans(const Context& ctx, std::vector<Box>& boxes,
                     Chains& chains, const std::vector<bool>& blocker) {
    tidy_chains(boxes, chains);
    const int before = count_chained(chains);
    while (true) {
        tidy_chains(boxes, chains);
        std::vector<int> orphans = unchained_boxes(boxes, chains, true);
        int attached = 0;
        for (auto it = orphans.begin(); it != orphans.end();) {
            std::vector<int> cmap =
                rasterize_chains(ctx, boxes, chains, blocker);
            const Box& b = boxes[*it];
            // the center, corners and half-corners of the box
            const float pts[9][2] = {
                {0, 0},       {-.5f, -.5f}, {-.25f, -.25f},
                {.5f, -.5f},  {.25f, -.25f}, {-.5f, .5f},
                {-.25f, .25f}, {.5f, .5f},   {.25f, .25f}};
            bool done = false;
            for (const auto& pt : pts) {
                int x = (int)(b.cx + pt[0] * b.w) / ctx.p.scale;
                int y = (int)(b.cy + pt[1] * b.h) / ctx.p.scale;
                if (!ctx.inside(x, y)) continue;
                int c = cmap[ctx.at(x, y)];
                if (c >= 0) {
                    chains[c].push_back(*it);
                    boxes[*it].direction = boxes[chains[c].front()].direction;
                    ++attached;
                    it = orphans.erase(it);
                    done = true;
                    break;
                }
            }
            if (done) continue;

            // scan beside the box for a chain running the right way:
            // right/left want horizontal chains, below/above vertical
            struct Scan { int axis; int sign; bool want_horiz; };
            const Scan scans[4] = {
                {0, 1, true}, {0, -1, true}, {1, 1, false}, {1, -1, false}};
            for (const Scan& sc : scans) {
                // integer stepping from a truncated start, as the
                // reference's int loop counters do (:975, :1029)
                int from = (int)(sc.axis == 0 ? b.cx + sc.sign * b.w / 2
                                              : b.cy + sc.sign * b.h / 2);
                float to = sc.axis == 0 ? b.cx + sc.sign * b.w * 1.5f
                                        : b.cy + sc.sign * b.h * 1.5f;
                bool stop = false;
                for (int mp = from; sc.sign > 0 ? mp < to : mp > to;
                     mp += sc.sign * ctx.p.scale) {
                    int mi = mp / ctx.p.scale;
                    if (sc.axis == 0 ? (mi < 0 || mi >= ctx.w)
                                     : (mi < 0 || mi >= ctx.h)) {
                        stop = true;
                        break;
                    }
                    int c0 = (int)(sc.axis == 0 ? b.cy - b.h / 2
                                                : b.cx - b.w / 2);
                    float c1 = sc.axis == 0 ? b.cy + b.h / 2
                                            : b.cx + b.w / 2;
                    for (int cp = c0; cp < c1; cp += ctx.p.scale) {
                        int ci = cp / ctx.p.scale;
                        if (sc.axis == 0 ? (ci < 0 || ci >= ctx.h)
                                         : (ci < 0 || ci >= ctx.w))
                            continue;
                        size_t at = sc.axis == 0 ? ctx.at(mi, ci)
                                                 : ctx.at(ci, mi);
                        if (blocker[at]) { stop = true; break; }
                        int c = cmap[at];
                        if (c >= 0 &&
                            boxes[chains[c].front()].horizontal() ==
                                sc.want_horiz) {
                            chains[c].push_back(*it);
                            boxes[*it].direction =
                                boxes[chains[c].front()].direction;
                            ++attached;
                            done = true;
                            break;
                        }
                    }
                    if (stop || done) break;
                }
                if (done) break;
            }
            if (done) {
                it = orphans.erase(it);
            } else {
                ++it;
            }
        }
        if (attached == 0) break;
    }
    return before != count_chained(chains);
}

// Seed chains from isolated space-flagged boxes, pull preceding loose
// boxes onto them, then splice them onto the chain found just before them
// (chain_space, search_loop.cpp:1090-1249).
void chain_spaces(const Context& ctx, std::vector<Box>& boxes,
                  Chains& chains, const std::vector<bool>& blocker,
                  const std::vector<float>& sepimage,
                  const std::vector<int>& ids_main) {
    tidy_chains(boxes, chains);
    std::vector<int> loose = unchained_boxes(boxes, chains, true);
    // each unchained space box becomes a provisional chain
    for (auto it = loose.begin(); it != loose.end();) {
        if ((boxes[*it].subtype & kSpace) == kSpace) {
            chains.push_back({*it});
            it = loose.erase(it);
        } else {
            ++it;
        }
    }

    std::vector<int> cmap = rasterize_chains(ctx, boxes, chains, blocker);
    std::vector<int> continues(chains.size(), -1);
    for (int cid = 0; cid < (int)chains.size(); ++cid) {
        if (chains[cid].empty()) continue;
        const int first = chains[cid].front();
        if ((boxes[first].subtype & kSpace) != kSpace) continue;
        const bool horiz = boxes[first].horizontal();

        // mean advance between consecutive boxes (:1136-1159)
        float step = 0;
        if (chains[cid].size() > 1) {
            for (size_t i = 0; i + 1 < chains[cid].size(); ++i) {
                const Box& a = boxes[chains[cid][i]];
                const Box& b = boxes[chains[cid][i + 1]];
                step += horiz ? b.cx - a.cx : b.cy - a.cy;
            }
            step /= chains[cid].size() - 1;
        } else {
            step = horiz ? boxes[first].w : boxes[first].h;
        }

        // scan backwards (left / up) from the chain head for loose boxes
        // or a chain to continue; separators abort. Horizontal reach is
        // 3 steps, vertical 2 (reference asymmetry, :1165 vs :1197).
        const Box& fb = boxes[first];
        const float reach = step * (horiz ? 3.f : 2.f);
        // integer cross-band bounds, as the reference's int locals
        // (:1163-1168, :1195-1201)
        const int center = (int)(horiz ? fb.cy : fb.cx);
        const int extent = (int)(horiz ? fb.h : fb.w);
        const int edge = (int)(horiz ? fb.cx - fb.w / 2 : fb.cy - fb.h / 2);
        bool stop = false;
        for (int mp = edge; mp > edge - reach && !stop;
             mp -= ctx.p.scale) {
            int mi = mp / ctx.p.scale;
            if (horiz ? (mi < 0 || mi >= ctx.w) : (mi < 0 || mi >= ctx.h))
                continue;
            for (int cp = center - extent / 2; cp < center + extent / 2;
                 cp += ctx.p.scale) {
                int ci = cp / ctx.p.scale;
                if (horiz ? (ci < 0 || ci >= ctx.h)
                          : (ci < 0 || ci >= ctx.w))
                    continue;
                size_t at = horiz ? ctx.at(mi, ci) : ctx.at(ci, mi);
                if (sepimage[at] > ctx.p.sep_valueth2) { stop = true; break; }
                int other = cmap[at];
                if (other < 0 || other == cid) {
                    int oid = ids_main[at];
                    if (oid < 0) continue;
                    auto lp = std::find(loose.begin(), loose.end(), oid);
                    if (lp != loose.end()) {
                        chains[cid].push_back(oid);
                        loose.erase(lp);
                        boxes[oid].direction = boxes[first].direction;
                        stop = true;
                        break;
                    }
                    continue;
                }
                if (continues[cid] < 0) {
                    continues[cid] = other;
                    stop = true;
                    break;
                }
            }
        }
    }

    // collapse continuation pointers (cycle-safe), then splice
    for (int cid = 0; cid < (int)chains.size(); ++cid) {
        if (continues[cid] < 0) continue;
        std::vector<int> walked;
        int root = continues[cid];
        while (root >= 0 && std::find(walked.begin(), walked.end(), root) ==
                                walked.end()) {
            walked.push_back(root);
            root = continues[root];
        }
        continues[cid] = root;
    }
    for (int cid = 0; cid < (int)chains.size(); ++cid) {
        if (continues[cid] < 0) continue;
        auto& dst = chains[continues[cid]];
        dst.insert(dst.end(), chains[cid].begin(), chains[cid].end());
        chains[cid].clear();
    }
    tidy_chains(boxes, chains);
}

}  // namespace

void assemble_chains(const Context& ctx, std::vector<Box>& boxes,
                     Chains& chains, const std::vector<bool>& blocker,
                     const std::vector<int>& ids_main,
                     const std::vector<float>& sepimage) {
    do {
        combine_chains(ctx, boxes, chains, blocker);
    } while (reclaim_orphans(ctx, boxes, chains, blocker));

    mark_mixed_direction(boxes, chains);
    mark_distance_splits(boxes, chains);
    mark_double_rows(boxes, chains);

    chain_spaces(ctx, boxes, chains, blocker, sepimage, ids_main);
}

}  // namespace lineengine
