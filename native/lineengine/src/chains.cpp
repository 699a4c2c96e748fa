#include "chains.h"

#include <algorithm>
#include <cmath>
#include <numeric>

namespace lineengine {

namespace {

// reading-axis and lateral coordinates of a box for a given orientation
inline float axis_of(const Box& b, bool vertical) {
    return vertical ? b.cy : b.cx;
}
inline float lat_of(const Box& b, bool vertical) {
    return vertical ? b.cx : b.cy;
}

double median(std::vector<double> v) {
    if (v.empty()) return 0;
    size_t m = v.size() / 2;
    std::nth_element(v.begin(), v.begin() + m, v.end());
    return v[m];
}

}  // namespace

void update_chain_geometry(Chain& c, const std::vector<Box>& boxes) {
    if (c.boxes.empty()) return;
    const Box& a = boxes[c.boxes.front()];
    const Box& b = boxes[c.boxes.back()];
    c.x0 = a.cx; c.y0 = a.cy; c.x1 = b.cx; c.y1 = b.cy;
    std::vector<double> sizes, lats;
    for (int id : c.boxes) {
        sizes.push_back(boxes[id].size());
        lats.push_back(lat_of(boxes[id], c.vertical));
    }
    c.size = median(sizes);
    c.lat = (float)median(lats);
}

// ---------------------------------------------------------------------
// component assignment + initial chains
// ---------------------------------------------------------------------

static int component_under_box(const Box& b, const LineComponents& lc,
                               const Params& p) {
    int cx = (int)std::lround(b.cx / p.scale);
    int cy = (int)std::lround(b.cy / p.scale);
    int c = lc.at(cx, cy);
    if (c >= 0) return c;
    // walk outward within the box half-extent (the reference walks from the
    // center towards the line cluster: hough_linefind chain_boxes)
    int rx = std::max(1, (int)(b.w / 2 / p.scale));
    int ry = std::max(1, (int)(b.h / 2 / p.scale));
    for (int r = 1; r <= std::max(rx, ry); ++r) {
        for (int dy = -r; dy <= r; ++dy) {
            for (int dx = -r; dx <= r; ++dx) {
                if (std::max(std::abs(dx), std::abs(dy)) != r) continue;
                if (std::abs(dx) > rx || std::abs(dy) > ry) continue;
                c = lc.at(cx + dx, cy + dy);
                if (c >= 0) return c;
            }
        }
    }
    return -1;
}

// decide vertical/horizontal for a set of boxes on one component
static bool decide_vertical(const std::vector<int>& ids,
                            const std::vector<Box>& boxes,
                            bool comp_vertical) {
    if (ids.size() < 2) return comp_vertical;
    // spread along each axis, normalized by char size
    float minx = 1e30f, maxx = -1e30f, miny = 1e30f, maxy = -1e30f;
    double sz = 0;
    for (int id : ids) {
        minx = std::min(minx, boxes[id].cx); maxx = std::max(maxx, boxes[id].cx);
        miny = std::min(miny, boxes[id].cy); maxy = std::max(maxy, boxes[id].cy);
        sz += boxes[id].size();
    }
    sz /= ids.size();
    float sx = maxx - minx, sy = maxy - miny;
    if (sx > 2 * sy) return false;
    if (sy > 2 * sx) return true;
    return comp_vertical;
}

// ---------------------------------------------------------------------
// chain merging
// ---------------------------------------------------------------------

// true if chain b continues chain a along the reading direction
static bool can_merge(const Chain& a, const Chain& b,
                      const std::vector<Box>& boxes,
                      const BoolImage& sepmask, const Params& p) {
    if (a.vertical != b.vertical) return false;
    double size = std::max(a.size, b.size);
    if (std::min(a.size, b.size) < size * (1.0 - p.allow_sizediff))
        return false;
    // lateral alignment within size/2 (a line-height corridor)
    if (std::fabs(a.lat - b.lat) > size * 0.5) return false;
    // gap along the reading axis below 3 char sizes (reference scans
    // 3x(w+space) beyond chain ends: search_loop combine_chains)
    float ax1 = a.vertical ? a.y1 : a.x1;     // end of a
    float bx0 = b.vertical ? b.y0 : b.x0;     // start of b
    float gap = bx0 - ax1;
    if (gap < -size * 0.5f || gap > 3.0f * size) return false;
    // no separator between the facing ends
    if (crosses_separator(sepmask, p, a.x1, a.y1, b.x0, b.y0)) return false;
    return true;
}

static void merge_pass(std::vector<Chain>& chains,
                       std::vector<Box>& boxes, const BoolImage& sepmask,
                       const Params& p) {
    bool changed = true;
    while (changed) {
        changed = false;
        for (size_t i = 0; i < chains.size() && !changed; ++i) {
            if (chains[i].boxes.empty()) continue;
            for (size_t j = 0; j < chains.size(); ++j) {
                if (i == j || chains[j].boxes.empty()) continue;
                if (can_merge(chains[i], chains[j], boxes, sepmask, p)) {
                    chains[i].boxes.insert(chains[i].boxes.end(),
                                           chains[j].boxes.begin(),
                                           chains[j].boxes.end());
                    chains[j].boxes.clear();
                    update_chain_geometry(chains[i], boxes);
                    changed = true;
                    break;
                }
            }
        }
    }
    chains.erase(std::remove_if(chains.begin(), chains.end(),
                                [](const Chain& c) { return c.boxes.empty(); }),
                 chains.end());
}

// ---------------------------------------------------------------------
// orphan handling (reference: fix_unbined + number_unbind)
// ---------------------------------------------------------------------

static void attach_or_cluster_orphans(std::vector<Chain>& chains,
                                      std::vector<Box>& boxes,
                                      std::vector<char>& chained,
                                      const BoolImage& sepmask,
                                      const Params& p) {
    // 1) try to insert orphans into an existing chain
    for (size_t bi = 0; bi < boxes.size(); ++bi) {
        if (chained[bi] || boxes[bi].is_ruby()) continue;
        const Box& b = boxes[bi];
        int best = -1;
        double best_d = 1e30;
        for (size_t ci = 0; ci < chains.size(); ++ci) {
            Chain& c = chains[ci];
            double size = std::max<double>(c.size, b.size());
            float ax = axis_of(b, c.vertical);
            float lt = lat_of(b, c.vertical);
            float c0 = c.vertical ? c.y0 : c.x0;
            float c1 = c.vertical ? c.y1 : c.x1;
            if (std::fabs(lt - c.lat) > size * 0.6) continue;
            double d;
            if (ax < c0) d = c0 - ax;
            else if (ax > c1) d = ax - c1;
            else d = 0;
            if (d > 2.0 * size) continue;
            if (crosses_separator(sepmask, p, b.cx, b.cy,
                                  (c.x0 + c.x1) / 2, (c.y0 + c.y1) / 2))
                continue;
            if (d < best_d) { best_d = d; best = (int)ci; }
        }
        if (best >= 0) {
            Chain& c = chains[best];
            c.boxes.push_back((int)bi);
            bool v = c.vertical;
            std::sort(c.boxes.begin(), c.boxes.end(), [&](int u, int w) {
                return axis_of(boxes[u], v) < axis_of(boxes[w], v);
            });
            update_chain_geometry(c, boxes);
            chained[bi] = 1;
        }
    }

    // 2) cluster remaining orphans into synthetic rows/columns by center
    //    proximity (tolerance = char size)
    std::vector<int> orphan;
    for (size_t bi = 0; bi < boxes.size(); ++bi)
        if (!chained[bi] && !boxes[bi].is_ruby()) orphan.push_back((int)bi);

    std::vector<char> used(orphan.size(), 0);
    for (size_t s = 0; s < orphan.size(); ++s) {
        if (used[s]) continue;
        for (int pass = 0; pass < 2; ++pass) {
            bool vertical = pass == 1;
            std::vector<int> group{orphan[s]};
            std::vector<char> tmp_used(used);
            tmp_used[s] = 1;
            bool grew = true;
            while (grew) {
                grew = false;
                for (size_t t = 0; t < orphan.size(); ++t) {
                    if (tmp_used[t]) continue;
                    const Box& ob = boxes[orphan[t]];
                    for (int gid : group) {
                        const Box& gb = boxes[gid];
                        double tol = std::max(gb.size(), ob.size());
                        float dl = std::fabs(lat_of(gb, vertical) -
                                             lat_of(ob, vertical));
                        float da = std::fabs(axis_of(gb, vertical) -
                                             axis_of(ob, vertical));
                        if (dl < tol * 0.5 && da < tol * 1.8) {
                            group.push_back(orphan[t]);
                            tmp_used[t] = 1;
                            grew = true;
                            break;
                        }
                    }
                }
            }
            if (group.size() >= 2 || pass == 1) {
                Chain c;
                c.vertical = vertical;
                if (group.size() == 1) {
                    // single stragglers: orientation from the box itself
                    const Box& b = boxes[group[0]];
                    c.vertical = b.h > b.w * 1.5;
                }
                c.boxes = group;
                std::sort(c.boxes.begin(), c.boxes.end(), [&](int u, int w) {
                    return axis_of(boxes[u], c.vertical) <
                           axis_of(boxes[w], c.vertical);
                });
                update_chain_geometry(c, boxes);
                chains.push_back(c);
                for (size_t t = 0; t < orphan.size(); ++t)
                    if (tmp_used[t]) used[t] = 1;
                for (int gid : group) chained[gid] = 1;
                break;
            }
        }
    }
}

// ---------------------------------------------------------------------
// double-line split (reference: split_doubleline.cpp)
// ---------------------------------------------------------------------

static void split_double_lines(std::vector<Chain>& chains,
                               std::vector<Box>& boxes) {
    std::vector<Chain> extra;
    for (Chain& c : chains) {
        if (c.boxes.size() < 4) continue;
        // 1-d 2-means on the lateral coordinate
        std::vector<float> lats;
        for (int id : c.boxes) lats.push_back(lat_of(boxes[id], c.vertical));
        float lo = *std::min_element(lats.begin(), lats.end());
        float hi = *std::max_element(lats.begin(), lats.end());
        if (hi - lo < c.size * 0.8) continue;
        float c0 = lo, c1 = hi;
        std::vector<char> assign(lats.size(), 0);
        for (int it = 0; it < 8; ++it) {
            double s0 = 0, s1 = 0; int n0 = 0, n1 = 0;
            for (size_t k = 0; k < lats.size(); ++k) {
                assign[k] = std::fabs(lats[k] - c0) <= std::fabs(lats[k] - c1)
                                ? 0 : 1;
                if (assign[k]) { s1 += lats[k]; ++n1; }
                else { s0 += lats[k]; ++n0; }
            }
            if (!n0 || !n1) break;
            c0 = (float)(s0 / n0); c1 = (float)(s1 / n1);
        }
        int n0 = std::count(assign.begin(), assign.end(), 0);
        int n1 = (int)assign.size() - n0;
        if (n0 < 2 || n1 < 2) continue;
        if (std::fabs(c1 - c0) < c.size * 0.7) continue;
        // split: cluster nearer the reading start keeps the chain
        Chain other;
        other.vertical = c.vertical;
        std::vector<int> keep;
        // for horizontal text the upper row reads first; for vertical the
        // right column reads first (larger x) — vertical lat is x
        bool zero_first = c.vertical ? (c0 > c1) : (c0 < c1);
        for (size_t k = 0; k < c.boxes.size(); ++k) {
            bool first = (assign[k] == 0) == zero_first;
            if (first) keep.push_back(c.boxes[k]);
            else other.boxes.push_back(c.boxes[k]);
        }
        c.boxes = keep;
        for (int id : c.boxes) boxes[id].double_line = 1;
        for (int id : other.boxes) boxes[id].double_line = 2;
        update_chain_geometry(c, boxes);
        update_chain_geometry(other, boxes);
        extra.push_back(std::move(other));
    }
    chains.insert(chains.end(), extra.begin(), extra.end());
}

// ---------------------------------------------------------------------
// force-chaining of stragglers (reference: after_search chain_line_force)
// ---------------------------------------------------------------------

// merge 1-2 box fragments into a nearby compatible chain with relaxed
// thresholds; keeps lines from fragmenting on weak textline maps
static void force_merge_fragments(std::vector<Chain>& chains,
                                  std::vector<Box>& boxes,
                                  const BoolImage& sepmask,
                                  const Params& p) {
    for (size_t fi = 0; fi < chains.size(); ++fi) {
        Chain& frag = chains[fi];
        if (frag.boxes.empty() || frag.boxes.size() > 2) continue;
        int best = -1;
        double best_d = 1e30;
        for (size_t ci = 0; ci < chains.size(); ++ci) {
            if (ci == fi || chains[ci].boxes.size() <= 2) continue;
            const Chain& c = chains[ci];
            double size = std::max(c.size, frag.size);
            if (std::min(c.size, frag.size) < size * 0.4) continue;
            // fragment lateral position within 0.8 line heights
            float flat = c.vertical
                ? (frag.x0 + frag.x1) / 2 : (frag.y0 + frag.y1) / 2;
            if (std::fabs(flat - c.lat) > size * 0.8) continue;
            float fa = c.vertical
                ? (frag.y0 + frag.y1) / 2 : (frag.x0 + frag.x1) / 2;
            float c0 = c.vertical ? c.y0 : c.x0;
            float c1 = c.vertical ? c.y1 : c.x1;
            double d = fa < c0 ? c0 - fa : (fa > c1 ? fa - c1 : 0);
            if (d > 4.0 * size) continue;
            if (crosses_separator(sepmask, p,
                                  (frag.x0 + frag.x1) / 2,
                                  (frag.y0 + frag.y1) / 2,
                                  (c.x0 + c.x1) / 2, (c.y0 + c.y1) / 2))
                continue;
            if (d < best_d) { best_d = d; best = (int)ci; }
        }
        if (best < 0) continue;
        Chain& c = chains[best];
        c.boxes.insert(c.boxes.end(), frag.boxes.begin(), frag.boxes.end());
        bool v = c.vertical;
        std::sort(c.boxes.begin(), c.boxes.end(), [&](int u, int w) {
            return axis_of(boxes[u], v) < axis_of(boxes[w], v);
        });
        update_chain_geometry(c, boxes);
        for (int id : frag.boxes)
            if (v) boxes[id].subtype |= kVertical;
            else boxes[id].subtype &= ~kVertical;
        frag.boxes.clear();
    }
    chains.erase(std::remove_if(chains.begin(), chains.end(),
                                [](const Chain& c) { return c.boxes.empty(); }),
                 chains.end());
}

// ---------------------------------------------------------------------

std::vector<Chain> build_chains(std::vector<Box>& boxes, const Image& line,
                                const BoolImage& sepmask,
                                const LineComponents& lc, const Params& p) {
    // group non-ruby boxes by line component
    std::vector<std::vector<int>> comp_boxes(lc.count);
    std::vector<char> chained(boxes.size(), 0);
    for (size_t i = 0; i < boxes.size(); ++i) {
        if (boxes[i].is_ruby()) continue;
        int c = component_under_box(boxes[i], lc, p);
        if (c >= 0) {
            comp_boxes[c].push_back((int)i);
        }
    }

    std::vector<Chain> chains;
    for (int c = 0; c < lc.count; ++c) {
        if (comp_boxes[c].empty()) continue;
        Chain ch;
        ch.vertical = decide_vertical(comp_boxes[c], boxes, lc.vertical[c]);
        ch.boxes = comp_boxes[c];
        std::sort(ch.boxes.begin(), ch.boxes.end(), [&](int u, int w) {
            return axis_of(boxes[u], ch.vertical) <
                   axis_of(boxes[w], ch.vertical);
        });
        update_chain_geometry(ch, boxes);
        for (int id : ch.boxes) chained[id] = 1;
        chains.push_back(std::move(ch));
    }

    merge_pass(chains, boxes, sepmask, p);
    attach_or_cluster_orphans(chains, boxes, chained, sepmask, p);
    merge_pass(chains, boxes, sepmask, p);
    force_merge_fragments(chains, boxes, sepmask, p);
    split_double_lines(chains, boxes);

    // vertical flag onto boxes
    for (Chain& c : chains)
        for (int id : c.boxes)
            if (c.vertical) boxes[id].subtype |= kVertical;
            else boxes[id].subtype &= ~kVertical;
    return chains;
}

// ---------------------------------------------------------------------
// ruby attachment + in-line ordering (reference: ruby_search.cpp)
// ---------------------------------------------------------------------

void attach_ruby_and_order(std::vector<Box>& boxes,
                           std::vector<Chain>& chains,
                           const BoolImage& sepmask, const Params& p) {
    // collect ruby boxes
    std::vector<int> ruby_ids;
    for (size_t i = 0; i < boxes.size(); ++i)
        if (boxes[i].is_ruby()) ruby_ids.push_back((int)i);

    // per chain: find ruby boxes in the perpendicular band before the line
    // (above a horizontal line; right of a vertical line), within 1.25x
    // line size
    std::vector<std::vector<int>> chain_ruby(chains.size());
    std::vector<char> ruby_used(boxes.size(), 0);
    for (size_t ci = 0; ci < chains.size(); ++ci) {
        Chain& c = chains[ci];
        for (int rid : ruby_ids) {
            if (ruby_used[rid]) continue;
            const Box& r = boxes[rid];
            float ax = axis_of(r, c.vertical);
            float lt = lat_of(r, c.vertical);
            float a0 = c.vertical ? c.y0 : c.x0;
            float a1 = c.vertical ? c.y1 : c.x1;
            if (ax < a0 - c.size || ax > a1 + c.size) continue;
            float d = c.vertical ? (lt - c.lat) : (c.lat - lt);
            // ruby sits before the line laterally: above / to the right
            if (d < c.size * 0.2 || d > c.size * 1.25) continue;
            if (crosses_separator(sepmask, p, r.cx, r.cy,
                                  c.vertical ? c.lat : ax,
                                  c.vertical ? ax : c.lat))
                continue;
            chain_ruby[ci].push_back(rid);
            ruby_used[rid] = 1;
        }
    }

    // lone ruby boxes (no chain found): mark and give their own chain so
    // they are not dropped
    for (int rid : ruby_ids) {
        if (ruby_used[rid]) continue;
        boxes[rid].subtype |= kLoneRuby;
        Chain c;
        c.vertical = boxes[rid].h > boxes[rid].w * 1.5;
        c.boxes = {rid};
        update_chain_geometry(c, boxes);
        chains.push_back(std::move(c));
    }

    // assign in-line reading positions: walk base boxes in order; after
    // the last base char of each ruby-base run, its ruby characters follow
    for (size_t ci = 0; ci < chains.size(); ++ci) {
        Chain& c = chains[ci];
        bool v = c.vertical;
        auto& rb = chain_ruby.size() > ci ? chain_ruby[ci] : ruby_ids;
        std::vector<int> rubies =
            chain_ruby.size() > ci ? chain_ruby[ci] : std::vector<int>{};
        std::sort(rubies.begin(), rubies.end(), [&](int a, int b) {
            return axis_of(boxes[a], v) < axis_of(boxes[b], v);
        });
        (void)rb;

        int pos = 0;
        size_t nb = c.boxes.size();
        std::vector<char> ruby_done(rubies.size(), 0);
        for (size_t k = 0; k < nb; ++k) {
            const Box& b = boxes[c.boxes[k]];
            boxes[c.boxes[k]].subidx = pos++;
            bool run_end = b.is_rubybase() &&
                (k + 1 >= nb || !boxes[c.boxes[k + 1]].is_rubybase());
            if (!run_end) continue;
            // find the start of this base run
            size_t k0 = k;
            while (k0 > 0 && boxes[c.boxes[k0 - 1]].is_rubybase()) --k0;
            float run_a0 = axis_of(boxes[c.boxes[k0]], v) -
                           boxes[c.boxes[k0]].size() / 2;
            float run_a1 = axis_of(b, v) + b.size() / 2;
            for (size_t t = 0; t < rubies.size(); ++t) {
                if (ruby_done[t]) continue;
                float ax = axis_of(boxes[rubies[t]], v);
                if (ax >= run_a0 && ax <= run_a1) {
                    boxes[rubies[t]].subidx = pos++;
                    ruby_done[t] = 1;
                }
            }
        }
        // any leftover ruby in this chain: append at the end
        for (size_t t = 0; t < rubies.size(); ++t)
            if (!ruby_done[t]) boxes[rubies[t]].subidx = pos++;
        // record chain membership for ruby boxes (vertical flag etc.)
        for (size_t t = 0; t < rubies.size(); ++t) {
            if (v) boxes[rubies[t]].subtype |= kVertical;
            else boxes[rubies[t]].subtype &= ~kVertical;
            c.boxes.push_back(rubies[t]);
        }
        // keep geometry based on base boxes only (recompute unaffected)
    }
}

}  // namespace lineengine
