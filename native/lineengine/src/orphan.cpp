// Orphan clustering: boxes that never joined a chain are grouped into
// synthetic rows/columns by center proximity and given fresh line ids.
// Behavior-equivalent to
// /root/reference/textline_detect/src/number_unbind.cpp:12-363.
#include "engine.h"

#include <algorithm>
#include <numeric>

namespace lineengine {

namespace {

constexpr double kMainTol = 1;    // cross-axis tolerance, in char sizes
constexpr double kSubTol = 10;    // reading-axis reach, in char sizes

// Group ids whose `key` coordinates sit within one char size of their
// sorted neighbor (number_unbind.cpp:51-83).
std::vector<std::vector<int>> group_by_coord(
    const std::vector<int>& ids, const std::vector<Box>& boxes, bool use_y) {
    std::vector<int> sorted = ids;
    std::sort(sorted.begin(), sorted.end(), [&](int a, int b) {
        return use_y ? boxes[a].cy < boxes[b].cy : boxes[a].cx < boxes[b].cx;
    });
    std::vector<std::vector<int>> groups;
    for (size_t i = 0; i + 1 < sorted.size(); ++i) {
        int a = sorted[i], b = sorted[i + 1];
        float diff = use_y ? boxes[b].cy - boxes[a].cy
                           : boxes[b].cx - boxes[a].cx;
        float s = std::max(std::max(boxes[a].w, boxes[a].h),
                           std::max(boxes[b].w, boxes[b].h));
        if (diff < s * kMainTol) {
            auto g = std::find_if(groups.begin(), groups.end(),
                                  [&](const std::vector<int>& v) {
                                      return std::find(v.begin(), v.end(),
                                                       a) != v.end();
                                  });
            if (g == groups.end()) groups.push_back({a, b});
            else g->push_back(b);
        }
    }
    return groups;
}

// Append `b` to the pseudo-line that already holds `a`, or start a new one
// (number_unbind.cpp:137-151).
void link_pair(std::vector<std::vector<int>>& lines, int a, int b) {
    auto g = std::find_if(lines.begin(), lines.end(),
                          [&](const std::vector<int>& v) {
                              return std::find(v.begin(), v.end(), a) !=
                                     v.end();
                          });
    if (g == lines.end()) lines.push_back({a, b});
    else g->push_back(b);
}

}  // namespace

int claim_orphans(const Context& ctx, std::vector<Box>& boxes,
                  const std::vector<bool>& blocker, int next_id) {
    std::vector<int> orphans;
    for (const Box& b : boxes) {
        if (b.idx < 0 && (b.subtype & kLoneRuby) != kLoneRuby)
            orphans.push_back(b.id);
    }
    if (orphans.empty()) return next_id;

    // page-majority direction decides isolated leftovers
    int majority = 0;
    for (const Box& b : boxes) {
        if (b.idx < 0) continue;
        majority += (b.subtype & kVertical) == 0 ? 1 : -1;
    }

    std::vector<std::vector<int>> hori_lines, vert_lines;
    if (orphans.size() > 1) {
        if (ctx.run_mode == 0 || ctx.run_mode == 1 || ctx.run_mode == 3) {
            // rows: boxes sharing a cy band, then linked left-to-right
            for (const auto& band : group_by_coord(orphans, boxes, true)) {
                std::vector<int> row = band;
                std::sort(row.begin(), row.end(), [&](int a, int b) {
                    return boxes[a].cx < boxes[b].cx;
                });
                for (size_t i = 0; i + 1 < row.size(); ++i) {
                    const Box& a = boxes[row[i]];
                    const Box& b = boxes[row[i + 1]];
                    float s = std::max(a.w, a.h);
                    if (std::fabs(b.cy - a.cy) > s * kMainTol) continue;
                    if (b.cx - a.cx > s * kSubTol) continue;
                    // the connecting segment must not cross a separator
                    float x1 = a.cx + a.w / 2, x2 = b.cx - b.w / 2;
                    bool cut = false;
                    if (std::fabs(x1 - x2) > 0) {
                        float slope = (b.cy - a.cy) / (x2 - x1);
                        for (int x = (int)x1; x < x2; x += ctx.p.scale) {
                            int xi = x / ctx.p.scale;
                            int yi = (int)(slope * (x - x1) + a.cy) /
                                     ctx.p.scale;
                            if (!ctx.inside(xi, yi)) continue;
                            if (blocker[ctx.at(xi, yi)]) { cut = true;
                                                           break; }
                        }
                    }
                    if (cut) continue;
                    // nor pass over an already-claimed box
                    for (const Box& o : boxes) {
                        if (o.idx < 0) continue;
                        if (a.cx < o.cx && o.cx < b.cx &&
                            std::min(a.cy - a.h / 2, b.cy - b.h / 2) <
                                o.cy &&
                            o.cy < std::max(a.cy + a.h / 2,
                                            b.cy + b.h / 2)) {
                            cut = true;
                            break;
                        }
                    }
                    if (cut) continue;
                    link_pair(hori_lines, row[i], row[i + 1]);
                }
            }
        }
        if (ctx.run_mode == 0 || ctx.run_mode == 2 || ctx.run_mode == 4) {
            // columns: boxes sharing a cx band, linked top-to-bottom
            for (const auto& band : group_by_coord(orphans, boxes, false)) {
                std::vector<int> col = band;
                std::sort(col.begin(), col.end(), [&](int a, int b) {
                    return boxes[a].cy < boxes[b].cy;
                });
                for (size_t i = 0; i + 1 < col.size(); ++i) {
                    const Box& a = boxes[col[i]];
                    const Box& b = boxes[col[i + 1]];
                    float s = std::max(a.w, a.h);
                    if (std::fabs(b.cx - a.cx) > s * kMainTol) continue;
                    if (b.cy - a.cy > s * kSubTol) continue;
                    float y1 = a.cy + a.h / 2, y2 = b.cy - b.h / 2;
                    bool cut = false;
                    if (std::fabs(y1 - y2) > 0) {
                        float slope = (b.cx - a.cx) / (y2 - y1);
                        // reference quirk (number_unbind.cpp:225): the
                        // loop bound uses b's CENTER x coordinate (x2 =
                        // boxes[boxid2].cx), not its left edge
                        for (int y = (int)y1; y < b.cx;
                             y += ctx.p.scale) {
                            int yi = y / ctx.p.scale;
                            int xi = (int)(slope * (y - y1) + a.cx) /
                                     ctx.p.scale;
                            if (!ctx.inside(xi, yi)) continue;
                            if (blocker[ctx.at(xi, yi)]) { cut = true;
                                                           break; }
                        }
                    }
                    if (cut) continue;
                    for (const Box& o : boxes) {
                        if (o.idx < 0) continue;
                        if (a.cy < o.cy && o.cy < b.cy &&
                            std::min(a.cx - a.w / 2, b.cx - b.w / 2) <
                                o.cx &&
                            o.cx < std::max(a.cx + a.w / 2,
                                            b.cx + b.w / 2)) {
                            cut = true;
                            break;
                        }
                    }
                    if (cut) continue;
                    link_pair(vert_lines, col[i], col[i + 1]);
                }
            }
        }

        // boxes claimed by both orientations keep the longer line; equal
        // lengths keep the tighter pitch (number_unbind.cpp:269-319).
        // Quirk preserved: the reference flattens with std::reduce and a
        // mutating binary op; under libstdc++, every block of four lines
        // invokes the op on the stored vectors themselves, so lines at
        // block offsets 0 and 2 absorb their right neighbor IN PLACE
        // (number_unbind.cpp:270-281). That corruption feeds the dedup
        // and registration below, so it is reproduced here.
        auto flatten_with_reduce_quirk =
            [](std::vector<std::vector<int>>& lines) {
                std::vector<int> flat;
                size_t i = 0;
                for (; lines.size() - i >= 4; i += 4) {
                    lines[i].insert(lines[i].end(), lines[i + 1].begin(),
                                    lines[i + 1].end());
                    lines[i + 2].insert(lines[i + 2].end(),
                                        lines[i + 3].begin(),
                                        lines[i + 3].end());
                    flat.insert(flat.end(), lines[i].begin(),
                                lines[i].end());
                    flat.insert(flat.end(), lines[i + 2].begin(),
                                lines[i + 2].end());
                }
                for (; i < lines.size(); ++i)
                    flat.insert(flat.end(), lines[i].begin(),
                                lines[i].end());
                return flat;
            };
        std::vector<int> flat_h = flatten_with_reduce_quirk(hori_lines);
        std::vector<int> flat_v = flatten_with_reduce_quirk(vert_lines);
        std::sort(flat_h.begin(), flat_h.end());
        std::sort(flat_v.begin(), flat_v.end());
        std::vector<int> dup;
        std::set_intersection(flat_h.begin(), flat_h.end(), flat_v.begin(),
                              flat_v.end(), std::back_inserter(dup));
        for (int id : dup) {
            auto hp = std::find_if(hori_lines.begin(), hori_lines.end(),
                                   [&](const std::vector<int>& v) {
                                       return std::count(v.begin(), v.end(),
                                                         id) > 0;
                                   });
            if (hp == hori_lines.end()) continue;
            auto vp = std::find_if(vert_lines.begin(), vert_lines.end(),
                                   [&](const std::vector<int>& v) {
                                       return std::count(v.begin(), v.end(),
                                                         id) > 0;
                                   });
            if (vp == vert_lines.end()) continue;
            if (hp->size() == vp->size()) {
                float hspace = 0, vspace = 0;
                for (size_t i = 0; i + 1 < hp->size(); ++i) {
                    hspace += boxes[(*hp)[i + 1]].cx - boxes[(*hp)[i]].cx;
                    vspace += boxes[(*hp)[i + 1]].cy - boxes[(*hp)[i]].cy;
                }
                if (hspace < vspace) hori_lines.erase(hp);
                else vert_lines.erase(vp);
            } else if (hp->size() > vp->size()) {
                vert_lines.erase(vp);
            } else {
                hori_lines.erase(hp);
            }
        }

        for (const auto& line : hori_lines) {
            int sub = 0;
            for (int id : line) {
                boxes[id].idx = next_id;
                boxes[id].subidx = sub++;
                boxes[id].subtype &= ~kVertical;
                boxes[id].direction = 0;
            }
            ++next_id;
        }
        for (const auto& line : vert_lines) {
            int sub = 0;
            for (int id : line) {
                boxes[id].idx = next_id;
                boxes[id].subidx = sub++;
                boxes[id].subtype |= kVertical;
                boxes[id].direction = M_PI_2;
            }
            ++next_id;
        }
    }

    // isolated leftovers each get their own line in the page-majority
    // direction (number_unbind.cpp:345-361)
    for (int id : orphans) {
        if (boxes[id].idx >= 0) continue;
        boxes[id].idx = next_id++;
        boxes[id].subidx = 0;
        if (majority < 0) {
            boxes[id].subtype |= kVertical;
            boxes[id].direction = M_PI_2;
        } else {
            boxes[id].subtype &= ~kVertical;
            boxes[id].direction = 0;
        }
    }
    return next_id;
}

}  // namespace lineengine
