// Block formation and reading order: per-line geometry, column/section
// layout, next/prev line linking, multi-link rechaining, block grouping,
// page split and the final block/idx/subidx numbering.
// Behavior-equivalent to
// /root/reference/textline_detect/src/make_block.cpp.
#include "engine.h"

#include <algorithm>
#include <numeric>

namespace lineengine {

namespace {

struct LineGeom {
    int d = 0;               // 0: horizontal, 1: vertical
    float x1 = 0, y1 = 0, x2 = 0, y2 = 0;   // bbox (image px)
    int count = 0;
    float size = 0;
    int section = 0;
    int secidx = 0;
    int dl1 = 0, dl2 = 0;    // double-line row-1 / row-2 box counts
    int doubleline = 0;
};

struct Rect {
    float x1, x2, y1, y2;
};

// compact box.idx values; reference renumber_chain (after_search.cpp:62)
int compact_ids(std::vector<Box>& boxes) {
    std::vector<int> seen;
    for (const Box& b : boxes) {
        if (b.idx < 0) continue;
        if (std::find(seen.begin(), seen.end(), b.idx) == seen.end())
            seen.push_back(b.idx);
    }
    std::sort(seen.begin(), seen.end());
    for (Box& b : boxes) {
        if (b.idx < 0) continue;
        b.idx = (int)std::distance(
            seen.begin(), std::find(seen.begin(), seen.end(), b.idx));
    }
    return (int)seen.size();
}

// ---------------------------------------------------------------------
// renumber_id (make_block.cpp:580-1359): orders lines into reading order
// (horizontal lines first: top-down/left-right groups; then vertical:
// right-to-left columns), discovering column "sections" on the way.
// ---------------------------------------------------------------------

// column/section layout pass over one direction's lines. The horizontal
// and vertical passes mirror each other with swapped axes and reversed
// primary order; the asymmetries below match the reference exactly.
struct SectionState {
    std::vector<Rect>& sections;
    std::vector<LineGeom>& lines;
    int open;   // index of the currently open catch-all section
};

void assign_to(SectionState& st, int line_id, int s) {
    st.lines[line_id].section = s;
    st.sections[s].x1 = std::min(st.sections[s].x1, st.lines[line_id].x1);
    st.sections[s].x2 = std::max(st.sections[s].x2, st.lines[line_id].x2);
    st.sections[s].y1 = std::min(st.sections[s].y1, st.lines[line_id].y1);
    st.sections[s].y2 = std::max(st.sections[s].y2, st.lines[line_id].y2);
}

void renumber_sections_all(std::vector<LineGeom>& lines,
                           const std::vector<int>& renum) {
    for (auto& lp : lines) {
        auto it = std::find(renum.begin(), renum.end(), lp.section);
        if (it != renum.end())
            lp.section = (int)std::distance(renum.begin(), it);
    }
}

int renumber_lines(const Context& ctx, int id_max, std::vector<Box>& boxes) {
    std::vector<LineGeom> lines(id_max);
    std::vector<int> order;   // distinct line ids, reordered into reading
                              // order below (reference: chain_remap)
    int major = 0;
    for (const Box& b : boxes) {
        if (b.idx < 0) continue;
        if (std::find(order.begin(), order.end(), b.idx) == order.end())
            order.push_back(b.idx);
        if (b.is_ruby()) continue;
        if ((b.subtype & kLoneRuby) == kLoneRuby) continue;
        LineGeom& lp = lines[b.idx];
        lp.d = (b.subtype & kVertical) ? 1 : 0;
        major += (b.subtype & kVertical) ? -1 : 1;
        if (lp.count == 0 || b.cx - b.w / 2 < lp.x1) lp.x1 = b.cx - b.w / 2;
        if (lp.count == 0 || b.cy - b.h / 2 < lp.y1) lp.y1 = b.cy - b.h / 2;
        if (lp.count == 0 || b.cx + b.w / 2 > lp.x2) lp.x2 = b.cx + b.w / 2;
        if (lp.count == 0 || b.cy + b.h / 2 > lp.y2) lp.y2 = b.cy + b.h / 2;
        if (b.double_line == 1) lp.dl1++;
        else if (b.double_line == 2) lp.dl2++;
        lp.size = std::max(lp.size, std::max(b.w, b.h));
        lp.count++;
    }
    for (auto& lp : lines) {
        if (lp.dl1 > lp.dl2) {
            if (lp.dl1 > lp.count / 2) lp.doubleline = 1;
        } else {
            if (lp.dl2 > lp.count / 2) lp.doubleline = 2;
        }
        if (lp.count == 1) lp.d = major >= 0 ? 0 : 1;
    }

    std::vector<Rect> sections;
    sections.push_back({(float)(ctx.w * ctx.p.scale), 0,
                        (float)(ctx.h * ctx.p.scale), 0});

    std::sort(order.begin(), order.end());
    auto split = std::partition(order.begin(), order.end(), [&](int x) {
        return lines[x].d == 0;
    });

    SectionState st{sections, lines, 0};

    // ---- horizontal lines: top-down groups, left-first sections -------
    {
        auto it1 = order.begin();
        auto it2 = split;
        while (it1 != it2) {
            std::sort(it1, it2, [&](int a, int b) {
                return lines[a].y1 < lines[b].y1;
            });
            float band1 = lines[*it1].y1 -
                          lines[*it1].size * (float)ctx.p.allowwidth_next_block;
            float band2 = lines[*it1].y2 +
                          lines[*it1].size * (float)ctx.p.allowwidth_next_block;
            auto it4 = std::partition(it1, it2, [&](int x) {
                return std::min(band2, lines[x].y2) -
                           std::max(band1, lines[x].y1) > 0;
            });
            if (it4 == it1) {
                assign_to(st, *it1, st.open);
                ++it1;
                continue;
            }
            float gx1 = lines[*it1].x1, gx2 = lines[*it1].x2;
            for (auto it5 = it1; it5 != it4; ++it5) {
                gx1 = std::min(gx1, lines[*it5].x1);
                gx2 = std::max(gx2, lines[*it5].x2);
            }
            std::sort(it1, it2, [&](int a, int b) {
                return lines[a].x1 < lines[b].x1;
            });
            auto it5 = std::partition(it1, it2, [&](int x) {
                return lines[x].x1 <= gx2 && lines[x].x2 >= gx1;
            });
            // expand until the x-connected group is closed
            auto prev5 = it5;
            do {
                prev5 = it5;
                for (auto it53 = it1; it53 != it5; ++it53) {
                    gx1 = std::min(gx1, lines[*it53].x1);
                    gx2 = std::max(gx2, lines[*it53].x2);
                }
                it5 = std::partition(it1, it2, [&](int x) {
                    return lines[x].x1 < gx2 && lines[x].x2 > gx1;
                });
            } while (prev5 != it5);
            if (it5 == it1) {
                assign_to(st, *it1, st.open);
                ++it1;
                continue;
            }
            // lay out the group's lines into sub-sections
            int group_sec = st.open;
            auto it6 = it1;
            while (it6 != it5) {
                std::sort(it6, it5, [&](int a, int b) {
                    return lines[a].y1 < lines[b].y1;
                });
                float ly1 = lines[*it6].y1, ly2 = lines[*it6].y2;
                auto it7 = std::partition(it6, it5, [&](int x) {
                    return std::min(ly2, lines[x].y2) -
                               std::max(ly1, lines[x].y1) > 0;
                });
                if (it7 == it6) {
                    assign_to(st, *it6, group_sec);
                    ++it6;
                    continue;
                }
                if (std::distance(it6, it7) > 1) {
                    std::sort(it6, it7, [&](int a, int b) {
                        return lines[a].x1 < lines[b].x1;
                    });
                    if ((int)sections.size() - 1 == st.open) {
                        group_sec = (int)sections.size();
                        sections.push_back({lines[*it6].x1, lines[*it6].x2,
                                            lines[*it6].y1, lines[*it6].y2});
                    }
                    for (auto it8 = it6; it8 != it7; ++it8) {
                        bool found = false;
                        for (int s = group_sec; s < (int)sections.size();
                             ++s) {
                            if (std::min(sections[s].x2, lines[*it8].x2) -
                                    std::max(sections[s].x1,
                                             lines[*it8].x1) > 0) {
                                assign_to(st, *it8, s);
                                found = true;
                                break;
                            }
                        }
                        if (!found) {
                            lines[*it8].section = (int)sections.size();
                            sections.push_back(
                                {lines[*it8].x1, lines[*it8].x2,
                                 lines[*it8].y1, lines[*it8].y2});
                        }
                    }
                } else {
                    if ((int)sections.size() - 1 == st.open) {
                        group_sec = (int)sections.size();
                        lines[*it6].section = group_sec;
                        sections.push_back({lines[*it6].x1, lines[*it6].x2,
                                            lines[*it6].y1, lines[*it6].y2});
                    } else {
                        bool found = false;
                        for (int s = group_sec; s < (int)sections.size();
                             ++s) {
                            if (std::min(sections[s].x2, lines[*it6].x2) -
                                    std::max(sections[s].x1,
                                             lines[*it6].x1) > 0) {
                                assign_to(st, *it6, s);
                                found = true;
                                break;
                            }
                        }
                        if (!found) {
                            group_sec = (int)sections.size();
                            lines[*it6].section = group_sec;
                            sections.push_back(
                                {lines[*it6].x1, lines[*it6].x2,
                                 lines[*it6].y1, lines[*it6].y2});
                        }
                    }
                }
                it6 = it7;
            }
            st.open = group_sec;

            // order the sections left-first, grouping x-overlaps top-first
            std::vector<int> renum(sections.size());
            std::iota(renum.begin(), renum.end(), 0);
            std::sort(renum.begin(), renum.end(), [&](int a, int b) {
                return sections[a].x1 < sections[b].x1;
            });
            for (auto sit = renum.begin(); sit != renum.end();) {
                float sx1 = sections[*sit].x1, sx2 = sections[*sit].x2;
                auto sit2 = std::partition(sit, renum.end(), [&](int x) {
                    return std::min(sx2, sections[x].x2) -
                               std::max(sx1, sections[x].x1) > 0;
                });
                if (sit2 == sit) { ++sit; continue; }
                if (std::distance(sit, sit2) > 1) {
                    std::sort(sit, sit2, [&](int a, int b) {
                        return sections[a].y1 < sections[b].y1;
                    });
                }
                sit = sit2;
            }
            std::sort(sections.begin(), sections.end(),
                      [](const Rect& a, const Rect& b) {
                          return a.x1 < b.x1;
                      });
            for (auto pit = sections.begin(); pit != sections.end();) {
                float sx1 = pit->x1, sx2 = pit->x2;
                auto pit2 = std::partition(
                    pit, sections.end(), [&](const Rect& x) {
                        return std::min(sx2, x.x2) - std::max(sx1, x.x1) > 0;
                    });
                if (pit2 == pit) { ++pit; continue; }
                if (std::distance(pit, pit2) > 1) {
                    std::sort(pit, pit2, [](const Rect& a, const Rect& b) {
                        return a.y1 < b.y1;
                    });
                }
                pit = pit2;
            }
            renumber_sections_all(lines, renum);

            // columns vs table: columns share a bottom edge
            std::vector<float> bottoms(sections.size());
            for (auto cit = it1; cit != it5; ++cit) {
                int s = lines[*cit].section;
                bottoms[s] = std::max(bottoms[s], lines[*cit].y2);
            }
            std::vector<float> valid;
            std::copy_if(bottoms.begin(), bottoms.end(),
                         std::back_inserter(valid),
                         [](float x) { return x > 0; });
            if (valid.size() > 1) {
                float s2 = lines[*it1].size * 2;
                float bmax = *std::max_element(valid.begin(), valid.end());
                int c = (int)std::count_if(
                    valid.begin(), valid.end(),
                    [&](float x) { return std::fabs(bmax - x) < s2 * 2; });
                if (c > 1) {
                    // columns: read each section top-down, sections in
                    // left-right order
                    std::sort(it1, it5, [&](int a, int b) {
                        return lines[a].y1 < lines[b].y1;
                    });
                    std::stable_sort(it1, it5, [&](int a, int b) {
                        return lines[a].section < lines[b].section;
                    });
                    for (auto ait = it1; ait != it5; ++ait)
                        lines[*ait].secidx = lines[*ait].section;
                } else {
                    // a table: interleave rows across sections
                    std::sort(it1, it5, [&](int a, int b) {
                        return lines[a].section < lines[b].section;
                    });
                    int secidx = lines[*it1].section;
                    auto it8 = it1;
                    while (it8 != it5) {
                        std::sort(it8, it5, [&](int a, int b) {
                            return lines[a].section < lines[b].section;
                        });
                        auto it7 = std::partition(it8, it5, [&](int x) {
                            return lines[*it8].section == lines[x].section;
                        });
                        std::sort(it8, it7, [&](int a, int b) {
                            return lines[a].y1 < lines[b].y1;
                        });
                        if (lines[*it8].section > secidx) {
                            for (; it8 != it7; ++it8) {
                                auto it9 = std::find_if(
                                    it1, it8, [&](int x) {
                                        return lines[*it8].section ==
                                                   lines[x].section + 1 &&
                                               std::min(lines[*it8].y2,
                                                        lines[x].y2) -
                                                       std::max(
                                                           lines[*it8].y1,
                                                           lines[x].y1) > 0;
                                    });
                                if (it9 != it8) {
                                    auto tmp = *it8;
                                    std::copy_backward(it9 + 1, it8,
                                                       it8 + 1);
                                    *(it9 + 1) = tmp;
                                }
                            }
                        } else {
                            it8 = it7;
                        }
                    }
                    for (auto ait = it1; ait != it5; ++ait)
                        lines[*ait].secidx = secidx;
                }
            } else {
                std::sort(it1, it5, [&](int a, int b) {
                    return lines[a].y1 < lines[b].y1;
                });
                for (auto ait = it1; ait != it5; ++ait)
                    lines[*ait].secidx = lines[*ait].section;
            }

            st.open = (int)sections.size();
            sections.push_back({(float)(ctx.w * ctx.p.scale), 0,
                                (float)(ctx.h * ctx.p.scale), 0});
            it1 = it5;
        }
    }

    // ---- vertical lines: right-to-left groups, top-first sections -----
    {
        auto it1 = split;
        auto it2 = order.end();
        const int base = st.open;
        while (it1 != it2) {
            std::sort(it1, it2, [&](int a, int b) {
                return lines[a].x2 > lines[b].x2;
            });
            float band1 = lines[*it1].x1 -
                          lines[*it1].size * (float)ctx.p.allowwidth_next_block;
            float band2 = lines[*it1].x2 +
                          lines[*it1].size * (float)ctx.p.allowwidth_next_block;
            auto it4 = std::partition(it1, it2, [&](int x) {
                return std::min(band2, lines[x].x2) -
                           std::max(band1, lines[x].x1) > 0;
            });
            if (it4 == it1) {
                assign_to(st, *it1, st.open);
                ++it1;
                continue;
            }
            float gy1 = lines[*it1].y1, gy2 = lines[*it1].y2;
            for (auto it5 = it1; it5 != it4; ++it5) {
                gy1 = std::min(gy1, lines[*it5].y1);
                gy2 = std::max(gy2, lines[*it5].y2);
            }
            std::sort(it1, it2, [&](int a, int b) {
                return lines[a].y1 < lines[b].y1;
            });
            auto it5 = std::partition(it1, it2, [&](int x) {
                return lines[x].y1 <= gy2 && lines[x].y2 >= gy1;
            });
            auto prev5 = it5;
            do {
                prev5 = it5;
                for (auto it53 = it1; it53 != it5; ++it53) {
                    gy1 = std::min(gy1, lines[*it53].y1);
                    gy2 = std::max(gy2, lines[*it53].y2);
                }
                it5 = std::partition(it1, it2, [&](int x) {
                    return lines[x].y1 <= gy2 && lines[x].y2 >= gy1;
                });
            } while (prev5 != it5);
            if (it5 == it1) {
                assign_to(st, *it1, st.open);
                ++it1;
                continue;
            }
            int group_sec = st.open;
            auto it6 = it1;
            while (it6 != it5) {
                std::sort(it6, it5, [&](int a, int b) {
                    return lines[a].x2 > lines[b].x2;
                });
                float lx1 = lines[*it6].x1, lx2 = lines[*it6].x2;
                auto it7 = std::partition(it6, it5, [&](int x) {
                    return std::min(lx2, lines[x].x2) -
                               std::max(lx1, lines[x].x1) > 0;
                });
                if (it7 == it6) {
                    assign_to(st, *it6, group_sec);
                    ++it6;
                    continue;
                }
                if (std::distance(it6, it7) > 1) {
                    std::sort(it6, it7, [&](int a, int b) {
                        return lines[a].y1 < lines[b].y1;
                    });
                    if ((int)sections.size() - 1 == st.open) {
                        group_sec = (int)sections.size();
                        sections.push_back({lines[*it6].x1, lines[*it6].x2,
                                            lines[*it6].y1, lines[*it6].y2});
                    }
                    for (auto it8 = it6; it8 != it7; ++it8) {
                        bool found = false;
                        for (int s = group_sec; s < (int)sections.size();
                             ++s) {
                            if (std::min(sections[s].y2, lines[*it8].y2) -
                                    std::max(sections[s].y1,
                                             lines[*it8].y1) > 0) {
                                assign_to(st, *it8, s);
                                found = true;
                                break;
                            }
                        }
                        if (!found) {
                            lines[*it8].section = (int)sections.size();
                            sections.push_back(
                                {lines[*it8].x1, lines[*it8].x2,
                                 lines[*it8].y1, lines[*it8].y2});
                        }
                    }
                } else {
                    if ((int)sections.size() - 1 == st.open) {
                        group_sec = (int)sections.size();
                        lines[*it6].section = group_sec;
                        sections.push_back({lines[*it6].x1, lines[*it6].x2,
                                            lines[*it6].y1, lines[*it6].y2});
                    } else {
                        bool found = false;
                        for (int s = group_sec; s < (int)sections.size();
                             ++s) {
                            if (std::min(sections[s].y2, lines[*it6].y2) -
                                    std::max(sections[s].y1,
                                             lines[*it6].y1) > 0) {
                                assign_to(st, *it6, s);
                                found = true;
                                break;
                            }
                        }
                        if (!found) {
                            group_sec = (int)sections.size();
                            lines[*it6].section = group_sec;
                            sections.push_back(
                                {lines[*it6].x1, lines[*it6].x2,
                                 lines[*it6].y1, lines[*it6].y2});
                        }
                    }
                }
                it6 = it7;
            }
            st.open = group_sec;

            // order the vertical sections top-first, grouping y-overlaps
            // right-first; only the vertical range [base, end) reorders
            std::vector<int> renum(sections.size());
            std::iota(renum.begin(), renum.end(), 0);
            std::sort(renum.begin() + base, renum.end(), [&](int a, int b) {
                return sections[a].y1 < sections[b].y1;
            });
            for (auto sit = renum.begin() + base; sit != renum.end();) {
                float sy1 = sections[*sit].y1, sy2 = sections[*sit].y2;
                auto sit2 = std::partition(sit, renum.end(), [&](int x) {
                    return std::min(sy2, sections[x].y2) -
                               std::max(sy1, sections[x].y1) > 0;
                });
                if (sit2 == sit) { ++sit; continue; }
                if (std::distance(sit, sit2) > 1) {
                    std::sort(sit, sit2, [&](int a, int b) {
                        return sections[a].x2 > sections[b].x2;
                    });
                }
                sit = sit2;
            }
            std::sort(sections.begin() + base, sections.end(),
                      [](const Rect& a, const Rect& b) {
                          return a.y1 < b.y1;
                      });
            for (auto pit = sections.begin() + base;
                 pit != sections.end();) {
                float sy1 = pit->y1, sy2 = pit->y2;
                auto pit2 = std::partition(
                    pit, sections.end(), [&](const Rect& x) {
                        return std::min(sy2, x.y2) - std::max(sy1, x.y1) > 0;
                    });
                if (pit2 == pit) { ++pit; continue; }
                if (std::distance(pit, pit2) > 1) {
                    std::sort(pit, pit2, [](const Rect& a, const Rect& b) {
                        return a.x2 > b.x2;
                    });
                }
                pit = pit2;
            }
            renumber_sections_all(lines, renum);

            // columns vs table: vertical columns share a right edge
            std::vector<float> rights(1 + sections.size());
            for (auto cit = it1; cit != it5; ++cit) {
                int s = lines[*cit].section;
                rights[s] = std::max(rights[s], lines[*cit].x2);
            }
            std::vector<float> valid;
            std::copy_if(rights.begin(), rights.end(),
                         std::back_inserter(valid),
                         [](float x) { return x > 0; });
            if (valid.size() > 1) {
                float s2 = lines[*it1].size * 2;
                float rmax = *std::max_element(valid.begin(), valid.end());
                int c = (int)std::count_if(
                    valid.begin(), valid.end(),
                    [&](float x) { return std::fabs(rmax - x) < s2 * 2; });
                if (c > 1) {
                    std::sort(it1, it5, [&](int a, int b) {
                        return lines[a].x2 > lines[b].x2;
                    });
                    std::stable_sort(it1, it5, [&](int a, int b) {
                        return lines[a].section < lines[b].section;
                    });
                    for (auto ait = it1; ait != it5; ++ait)
                        lines[*ait].secidx = lines[*ait].section;
                } else {
                    std::sort(it1, it5, [&](int a, int b) {
                        return lines[a].section < lines[b].section;
                    });
                    int secidx = lines[*it1].section;
                    auto it8 = it1;
                    while (it8 != it5) {
                        std::sort(it8, it5, [&](int a, int b) {
                            return lines[a].section < lines[b].section;
                        });
                        auto it7 = std::partition(it8, it5, [&](int x) {
                            return lines[*it8].section == lines[x].section;
                        });
                        std::sort(it8, it7, [&](int a, int b) {
                            return lines[a].x2 > lines[b].x2;
                        });
                        if (lines[*it8].section > secidx) {
                            for (; it8 != it7; ++it8) {
                                auto it9 = std::find_if(
                                    it1, it8, [&](int x) {
                                        return lines[*it8].section ==
                                                   lines[x].section + 1 &&
                                               std::min(lines[*it8].x2,
                                                        lines[x].x2) -
                                                       std::max(
                                                           lines[*it8].x1,
                                                           lines[x].x1) > 0;
                                    });
                                if (it9 != it8) {
                                    auto tmp = *it8;
                                    std::copy_backward(it9 + 1, it8,
                                                       it8 + 1);
                                    *(it9 + 1) = tmp;
                                }
                            }
                        } else {
                            it8 = it7;
                        }
                    }
                    for (auto ait = it1; ait != it5; ++ait)
                        lines[*ait].secidx = secidx;
                }
            } else {
                std::sort(it1, it5, [&](int a, int b) {
                    return lines[a].x2 > lines[b].x2;
                });
                for (auto ait = it1; ait != it5; ++ait)
                    lines[*ait].secidx = lines[*ait].section;
            }

            st.open = (int)sections.size();
            sections.push_back({(float)(ctx.w * ctx.p.scale), 0,
                                (float)(ctx.h * ctx.p.scale), 0});
            it1 = it5;
        }
    }

    // merge sections overlapping by more than a quarter of the smaller
    // one, largest first (make_block.cpp:1298-1332)
    {
        std::vector<int> by_size(sections.size());
        std::iota(by_size.begin(), by_size.end(), 0);
        std::vector<int> alive(sections.size());
        std::iota(alive.begin(), alive.end(), 0);
        auto area = [&](int s) {
            return std::max(0.0f, sections[s].x2 - sections[s].x1) *
                   std::max(0.0f, sections[s].y2 - sections[s].y1);
        };
        std::sort(by_size.begin(), by_size.end(), [&](int a, int b) {
            return area(a) > area(b);
        });
        for (int s : by_size) {
            if (area(s) == 0) break;
            for (auto it = alive.begin(); it != alive.end();) {
                if (area(*it) == 0) { ++it; continue; }
                float inter =
                    (std::min(sections[s].x2, sections[*it].x2) -
                     std::max(sections[s].x1, sections[*it].x1)) *
                    (std::min(sections[s].y2, sections[*it].y2) -
                     std::max(sections[s].y1, sections[*it].y1));
                if (inter > std::min(area(s), area(*it)) * 0.25f) {
                    for (auto& lp : lines)
                        if (lp.secidx == *it) lp.secidx = s;
                    it = alive.erase(it);
                } else {
                    ++it;
                }
            }
        }
    }
    // compact secidx in first-use order, then numerically
    {
        std::vector<int> used;
        for (auto& lp : lines)
            if (std::find(used.begin(), used.end(), lp.secidx) == used.end())
                used.push_back(lp.secidx);
        std::sort(used.begin(), used.end());
        for (auto& lp : lines)
            lp.secidx = (int)std::distance(
                used.begin(), std::find(used.begin(), used.end(),
                                        lp.secidx));
    }

    for (Box& b : boxes) {
        if (b.idx < 0) continue;
        auto it = std::find(order.begin(), order.end(), b.idx);
        int old = *it;
        b.idx = (int)std::distance(order.begin(), it);
        b.section = lines[old].secidx;
    }
    return (int)order.size();
}

// ---------------------------------------------------------------------
// process_line (make_block.cpp:21-204): link each line to the lines that
// follow it (next) along the page flow by scanning past its ends into the
// chain raster.
// ---------------------------------------------------------------------
void link_lines(const Context& ctx, const std::vector<Box>& boxes,
                Chains& next, Chains& prev,
                const std::vector<int>& cmap, const Chains& chains,
                const std::vector<bool>& blocker,
                const std::vector<int>& dirs,
                const std::vector<float>& sizes) {
    const double scan = 0.5 + ctx.p.allowwidth_next_block;
    const int id_max = (int)chains.size();
    for (int cid = 0; cid < id_max; ++cid) {
        const int d = dirs[cid];
        const bool as_horiz =
            d == 2 || (d == 0 && (ctx.run_mode == 1 || ctx.run_mode == 3));
        const bool as_vert =
            d == 1 || (d == 0 && (ctx.run_mode == 2 || ctx.run_mode == 4));
        if (!as_horiz && !as_vert) continue;

        float s_s = 0;
        for (int id : chains[cid])
            s_s = std::max(s_s, std::max(boxes[id].w, boxes[id].h));

        // endpoints over full-size, non-ruby, non-doubleline boxes
        float cx1 = -1, cy1 = -1, cx2 = -1, cy2 = -1;
        for (int id : chains[cid]) {
            const Box& b = boxes[id];
            float s = std::max(b.w, b.h);
            if (std::fabs(s - s_s) / std::min(s, s_s) > 0.5f) continue;
            if (b.is_ruby() || b.double_line > 0) continue;
            if (as_horiz) {
                if (cx1 < 0 && cy1 < 0) { cx1 = b.cx - b.w / 2; cy1 = b.cy; }
                cx2 = b.cx + b.w / 2;
                cy2 = b.cy;
            } else {
                if (cx1 < 0 && cy1 < 0) { cx1 = b.cx; cy1 = b.cy - b.h / 2; }
                cx2 = b.cx;
                cy2 = b.cy + b.h / 2;
            }
        }

        auto try_link = [&](int other) {
            if (std::find(next[cid].begin(), next[cid].end(), other) ==
                next[cid].end()) {
                next[cid].push_back(other);
                prev[other].push_back(cid);
                return true;
            }
            return false;
        };

        if (as_horiz) {
            if (cx2 - cx1 < ctx.p.scale) continue;
            float a = (cy2 - cy1) / (cx2 - cx1);
            // scan below the line from its middle outward, both ways
            for (int pass = 0; pass < 2; ++pass) {
                int x = (int)((cx1 + cx2) / 2);
                float xend = pass == 0 ? cx2 + s_s : cx1 - s_s;
                int step = pass == 0 ? 1 : -1;
                for (; pass == 0 ? x < xend : x > xend; x += step) {
                    int y = (int)(a * (x - cx1) + cy1);
                    int xi = x / ctx.p.scale, yi = y / ctx.p.scale;
                    if (!ctx.inside(xi, yi)) continue;
                    if (blocker[ctx.at(xi, yi)]) break;
                    for (int yp = yi; yp < yi + s_s / ctx.p.scale * scan;
                         ++yp) {
                        if (yp < 0 || yp >= ctx.h) continue;
                        if (blocker[ctx.at(xi, yp)]) break;
                        int other = cmap[ctx.at(xi, yp)];
                        if (other < 0 || other == cid) continue;
                        if (dirs[other] == 1) break;
                        if (std::fabs(sizes[other] - sizes[cid]) /
                                std::min(sizes[cid], sizes[other]) >
                            ctx.p.allow_sizediff)
                            continue;
                        if (try_link(other)) break;
                    }
                }
            }
        } else if (as_vert) {
            if (cy2 - cy1 < ctx.p.scale) continue;
            float a = (cx2 - cx1) / (cy2 - cy1);
            for (int pass = 0; pass < 2; ++pass) {
                int y = (int)((cy1 + cy2) / 2);
                float yend = pass == 0 ? cy2 + s_s : cy1 - s_s;
                int step = pass == 0 ? 1 : -1;
                for (; pass == 0 ? y < yend : y > yend; y += step) {
                    int x = (int)(a * (y - cy1) + cx1);
                    int xi = x / ctx.p.scale, yi = y / ctx.p.scale;
                    if (!ctx.inside(xi, yi)) continue;
                    if (blocker[ctx.at(xi, yi)]) break;
                    for (int xp = xi; xp > xi - s_s / ctx.p.scale * scan;
                         --xp) {
                        if (xp < 0 || xp >= ctx.w) continue;
                        if (blocker[ctx.at(xp, yi)]) break;
                        int other = cmap[ctx.at(xp, yi)];
                        if (other < 0 || other == cid) continue;
                        if (dirs[other] == 2) break;
                        // vertical uses max-normalized size difference
                        // (reference asymmetry, make_block.cpp:163)
                        if (std::fabs(sizes[other] - sizes[cid]) /
                                std::max(sizes[cid], sizes[other]) >
                            ctx.p.allow_sizediff)
                            continue;
                        if (try_link(other)) break;
                    }
                }
            }
        }
    }
}

// ---------------------------------------------------------------------
// rechain_search (make_block.cpp:255-577): when a line has several next
// (or prev) links, try to concatenate aggregate members that follow each
// other along the reading axis; the joined head gets space+tab flags.
// Returns true when nothing merged (converged).
// ---------------------------------------------------------------------
bool rechain_pass(Chains& chains, std::vector<Box>& boxes,
                  const Chains& links) {
    bool converged = true;
    if (std::count_if(links.begin(), links.end(), [](const auto& x) {
            return x.size() > 1;
        }) == 0)
        return converged;

    for (size_t i = 0; i < links.size(); ++i) {
        if (links[i].size() <= 1) continue;
        // transitive closure over the link graph from i
        std::vector<int> agg{(int)i};
        std::vector<int> todo(links[i].begin(), links[i].end());
        while (!todo.empty()) {
            int j = todo.back();
            todo.pop_back();
            if (std::find(agg.begin(), agg.end(), j) == agg.end()) {
                agg.push_back(j);
                todo.insert(todo.end(), links[j].begin(), links[j].end());
            }
        }
        std::sort(agg.begin(), agg.end());
        agg.erase(std::unique(agg.begin(), agg.end()), agg.end());
        for (size_t jj = 0; jj < agg.size(); ++jj) {
            for (size_t kk = 0; kk < agg.size(); ++kk) {
                if (jj == kk) continue;
                int n = agg[jj], m = agg[kk];
                if (chains[n].empty() || chains[m].empty()) continue;
                const bool nv = (boxes[chains[n].front()].subtype &
                                 kVertical) != 0;
                const bool mv = (boxes[chains[m].front()].subtype &
                                 kVertical) != 0;
                float size = 0;
                for (int id : chains[n])
                    size = std::max(size,
                                    std::max(boxes[id].w, boxes[id].h));
                for (int id : chains[m])
                    size = std::max(size,
                                    std::max(boxes[id].w, boxes[id].h));
                // same direction, or either side is a 1-box stub
                bool eligible = nv == mv || chains[n].size() < 2 ||
                                chains[m].size() < 2;
                if (!eligible) continue;
                const bool horiz =
                    nv == mv ? !nv
                             : !(chains[n].size() < 2 ? mv : nv);
                auto main_of = [&](int id, bool back) {
                    (void)back;
                    return horiz ? boxes[id].cx : boxes[id].cy;
                };
                auto cross_of = [&](int id) {
                    return horiz ? boxes[id].cy : boxes[id].cx;
                };
                int nb = chains[n].back(), mf = chains[m].front();
                int mb = chains[m].back(), nf = chains[n].front();
                if (main_of(nb, true) < main_of(mf, false) &&
                    std::fabs(cross_of(nb) - cross_of(mf)) < size) {
                    boxes[mf].subtype |= kSpace | kTabSplit;
                    chains[n].insert(chains[n].end(), chains[m].begin(),
                                     chains[m].end());
                    chains[m].clear();
                    converged = false;
                    continue;
                }
                if (main_of(mb, true) < main_of(nf, false) &&
                    std::fabs(cross_of(mb) - cross_of(nf)) < size) {
                    boxes[nf].subtype |= kSpace | kTabSplit;
                    chains[m].insert(chains[m].end(), chains[n].begin(),
                                     chains[n].end());
                    chains[n].clear();
                    converged = false;
                    continue;
                }
            }
        }
    }
    return converged;
}

bool rechain(Chains& chains, std::vector<Box>& boxes, const Chains& next,
             const Chains& prev) {
    if (!rechain_pass(chains, boxes, next)) return false;
    return rechain_pass(chains, boxes, prev);
}

// block = connected set of lines reachable from a prev-less root
// (block_chain_search, make_block.cpp:207-253)
Chains group_blocks(int id_max, const Chains& next, const Chains& prev) {
    std::vector<int> roots;
    for (int cid = 0; cid < id_max; ++cid)
        if (prev[cid].empty()) roots.push_back(cid);

    Chains blocks;
    for (int root : roots) {
        std::vector<int> taken;
        for (const auto& b : blocks)
            taken.insert(taken.end(), b.begin(), b.end());
        std::vector<int> grp;
        std::vector<int> stack{root};
        while (!stack.empty()) {
            int j = stack.back();
            stack.pop_back();
            if (std::find(taken.begin(), taken.end(), j) != taken.end())
                continue;
            if (std::find(grp.begin(), grp.end(), j) != grp.end()) continue;
            grp.push_back(j);
            for (int k : next[j])
                if (std::find(stack.begin(), stack.end(), k) == stack.end())
                    stack.push_back(k);
        }
        std::sort(grp.begin(), grp.end());
        grp.erase(std::unique(grp.begin(), grp.end()), grp.end());
        blocks.push_back(grp);
    }
    return blocks;
}

}  // namespace

void make_blocks(const Context& ctx, std::vector<Box>& boxes,
                 const std::vector<bool>& blocker) {
    int id_max = 0;
    Chains next, prev;
    while (true) {
        id_max = compact_ids(boxes);
        id_max = renumber_lines(ctx, id_max, boxes);

        next.assign(id_max, {});
        prev.assign(id_max, {});

        // core chains: non-ruby, non-lone-ruby boxes in subidx order
        Chains core(id_max);
        std::vector<int> dirs(id_max, 0);
        std::vector<float> sizes(id_max, 0);
        for (const Box& b : boxes) {
            if (b.idx < 0) continue;
            if (b.is_ruby()) continue;
            if ((b.subtype & kLoneRuby) == kLoneRuby) continue;
            core[b.idx].push_back(b.id);
            sizes[b.idx] = std::max(sizes[b.idx], std::max(b.w, b.h));
            if ((b.subtype & kVertical) == 0)
                dirs[b.idx] = core[b.idx].size() > 1 ? 2 : 0;
            else
                dirs[b.idx] = core[b.idx].size() > 1 ? 1 : 0;
        }
        for (auto& chain : core) {
            std::sort(chain.begin(), chain.end(), [&](int a, int b) {
                return boxes[a].subidx < boxes[b].subidx;
            });
        }

        std::vector<int> cmap =
            rasterize_chains(ctx, boxes, core, blocker, 1.0, 0);
        link_lines(ctx, boxes, next, prev, cmap, core, blocker, dirs,
                   sizes);

        // full chains including ruby for the rechain test
        Chains full(id_max);
        for (const Box& b : boxes)
            if (b.idx >= 0) full[b.idx].push_back(b.id);
        for (auto& chain : full) {
            std::sort(chain.begin(), chain.end(), [&](int a, int b) {
                return boxes[a].subidx < boxes[b].subidx;
            });
        }

        if (rechain(full, boxes, next, prev)) break;

        full.erase(std::remove_if(full.begin(), full.end(),
                                  [](const auto& c) { return c.empty(); }),
                   full.end());
        for (int cid = 0; cid < (int)full.size(); ++cid) {
            for (int sub = 0; sub < (int)full[cid].size(); ++sub) {
                boxes[full[cid][sub]].idx = cid;
                boxes[full[cid][sub]].subidx = sub;
            }
        }
    }

    Chains blocks = group_blocks(id_max, next, prev);

    struct BlockGeom {
        int d = 0, p = 0, sec = 0, count = 0;
        float size = 0;
        float x1, y1, x2, y2;
    };
    std::vector<BlockGeom> geo(blocks.size());
    for (auto& g : geo) {
        g.x1 = (float)(ctx.w * ctx.p.scale);
        g.y1 = (float)(ctx.h * ctx.p.scale);
        g.x2 = 0;
        g.y2 = 0;
    }
    std::vector<int> block_of(id_max, -1);
    for (int bi = 0; bi < (int)blocks.size(); ++bi)
        for (int cid : blocks[bi]) block_of[cid] = bi;

    for (const Box& b : boxes) {
        if (b.idx < 0) continue;
        if ((b.subtype & kLoneRuby) == kLoneRuby) continue;
        int bi = block_of[b.idx];
        if (bi < 0) continue;
        geo[bi].d = (b.subtype & kVertical) == 0 ? 0 : 1;
        geo[bi].count++;
        geo[bi].size = std::max(geo[bi].size, std::max(b.w, b.h));
        geo[bi].sec = b.section;
        geo[bi].x1 = std::min(geo[bi].x1, b.cx - b.w / 2);
        geo[bi].y1 = std::min(geo[bi].y1, b.cy - b.h / 2);
        geo[bi].x2 = std::max(geo[bi].x2, b.cx + b.w / 2);
        geo[bi].y2 = std::max(geo[bi].y2, b.cy + b.h / 2);
    }
    for (auto& g : geo) {
        if (g.x1 > g.x2) std::swap(g.x1, g.x2);
        if (g.y1 > g.y2) std::swap(g.y1, g.y2);
    }

    std::vector<int> border(blocks.size());
    std::iota(border.begin(), border.end(), 0);

    // page orientation: area-weighted direction vote
    float orient = 0;
    for (int bi : border) {
        float area = (geo[bi].x2 - geo[bi].x1) * (geo[bi].y2 - geo[bi].y1);
        orient += geo[bi].d == 0 ? area : -area;
    }

    // optional two-page split at the widest main-direction gap near the
    // middle (make_block.cpp:1555-1631)
    if (ctx.p.page_divide) {
        std::vector<int> main_blocks;
        std::copy_if(border.begin(), border.end(),
                     std::back_inserter(main_blocks), [&](int x) {
                         return orient >= 0 ? geo[x].d == 0 : geo[x].d == 1;
                     });
        std::sort(main_blocks.begin(), main_blocks.end(), [&](int a, int b) {
            return geo[a].x1 < geo[b].x1;
        });
        float div_x = ctx.w * ctx.p.scale / 2.0f;
        std::vector<std::pair<float, float>> gaps;
        for (auto it = main_blocks.begin(); it != main_blocks.end(); ++it) {
            auto it2 = std::find_if(it + 1, main_blocks.end(), [&](int x) {
                return std::min(geo[x].x2, geo[*it].x2) -
                           std::max(geo[x].x1, geo[*it].x1) <= 0;
            });
            if (it2 != main_blocks.end() && geo[*it2].x1 > geo[*it].x2)
                gaps.emplace_back(geo[*it].x2, geo[*it2].x1);
        }
        if (gaps.empty()) {
            div_x = 0;
        } else {
            auto dist = [&](const std::pair<float, float>& g) {
                float d1 = div_x - g.first, d2 = div_x - g.second;
                return d1 * d2 > 0 ? std::min(std::fabs(d1), std::fabs(d2))
                                   : 0.0f;
            };
            std::sort(gaps.begin(), gaps.end(),
                      [&](const auto& a, const auto& b) {
                          return dist(a) < dist(b);
                      });
            if (!(gaps.front().first <= div_x &&
                  div_x <= gaps.front().second))
                div_x = (gaps.front().first + gaps.front().second) / 2;
            if (std::fabs(div_x - ctx.w * ctx.p.scale / 2.0f) >
                ctx.w * ctx.p.scale / 10.0f)
                div_x = 0;
        }
        for (int bi : border) {
            // horizontal pages read left page first, vertical right first
            bool right = geo[bi].x1 > div_x;
            geo[bi].p = (orient >= 0) ? (right ? 1 : 0) : (right ? 0 : 1);
        }
    }

    // block order: page, then section, then flow order within
    std::sort(border.begin(), border.end(), [&](int a, int b) {
        return geo[a].sec < geo[b].sec;
    });
    std::stable_sort(border.begin(), border.end(), [&](int a, int b) {
        return geo[a].p < geo[b].p;
    });
    {
        auto st = border.begin();
        while (st != border.end()) {
            auto ed = std::partition(st, border.end(), [&](int x) {
                return geo[x].p == geo[*st].p && geo[x].sec == geo[*st].sec;
            });
            if (orient < 0) {
                // vertical flow: right-to-left; x-overlapping columns
                // read top-down
                std::sort(st, ed, [&](int a, int b) {
                    return geo[a].x2 > geo[b].x2;
                });
                auto it1 = st;
                while (it1 != ed) {
                    float x1 = geo[*it1].x1, x2 = geo[*it1].x2;
                    auto it2 = std::partition(it1, ed, [&](int x) {
                        return std::min(x2, geo[x].x2) -
                                   std::max(x1, geo[x].x1) > 0;
                    });
                    std::sort(it1, it2, [&](int a, int b) {
                        return geo[a].y1 < geo[b].y1;
                    });
                    it1 = it2;
                }
            } else {
                std::sort(st, ed, [&](int a, int b) {
                    return geo[a].y1 < geo[b].y1;
                });
                auto it1 = st;
                while (it1 != ed) {
                    float y1 = geo[*it1].y1, y2 = geo[*it1].y2;
                    auto it2 = std::partition(it1, ed, [&](int x) {
                        return std::min(y2, geo[x].y2) -
                                   std::max(y1, geo[x].y1) > 0;
                    });
                    std::sort(it1, it2, [&](int a, int b) {
                        return geo[a].x1 < geo[b].x1;
                    });
                    it1 = it2;
                }
            }
            st = ed;
        }
    }

    // assign block/page to boxes via their chain
    {
        std::vector<int> remap(id_max, -1), page(id_max, 0);
        int renum = 0;
        for (int bi : border) {
            for (int cid : blocks[bi]) {
                remap[cid] = renum;
                page[cid] = geo[bi].p;
            }
            ++renum;
        }
        for (Box& b : boxes) {
            if (b.idx < 0) continue;
            b.block = remap[b.idx];
            b.page = page[b.idx];
        }
    }

    // renumber idx within each block by ascending global line id
    {
        Chains in_block(border.size());
        for (const Box& b : boxes) {
            if (b.idx < 0 || b.block < 0) continue;
            in_block[b.block].push_back(b.idx);
        }
        for (auto& list : in_block) {
            if (list.size() < 2) continue;
            std::sort(list.begin(), list.end());
            list.erase(std::unique(list.begin(), list.end()), list.end());
        }
        for (Box& b : boxes) {
            if (b.idx < 0 || b.block < 0) continue;
            auto it = std::find(in_block[b.block].begin(),
                                in_block[b.block].end(), b.idx);
            b.idx = (int)std::distance(in_block[b.block].begin(), it);
        }
    }

    // drop unassigned boxes, order the rest
    boxes.erase(std::remove_if(boxes.begin(), boxes.end(),
                               [](const Box& b) {
                                   return b.block < 0 || b.idx < 0;
                               }),
                boxes.end());
    auto reading_order = [](const Box& a, const Box& b) {
        if (a.block != b.block) return a.block < b.block;
        if (a.idx != b.idx) return a.idx < b.idx;
        if (a.subidx != b.subidx) return a.subidx < b.subidx;
        return a.subtype < b.subtype;
    };
    std::sort(boxes.begin(), boxes.end(), reading_order);

    // warichu: double-line runs read row 1 before row 2; remap the run's
    // subidx values onto the new order (make_block.cpp:1764-1826)
    {
        std::vector<std::vector<int>> runs;
        std::vector<int> run;
        int cur_block = -1, cur_line = -1;
        for (int i = 0; i < (int)boxes.size(); ++i) {
            const Box& b = boxes[i];
            if (cur_block != b.block || cur_line != b.idx) {
                if (run.size() > 2) runs.push_back(run);
                run.clear();
            }
            cur_block = b.block;
            cur_line = b.idx;
            if (b.double_line > 0) {
                run.push_back(i);
            } else {
                if (run.size() > 2) runs.push_back(run);
                run.clear();
            }
        }
        if (run.size() > 2) runs.push_back(run);
        for (const auto& idxs : runs) {
            std::vector<int> perm(idxs.size());
            std::iota(perm.begin(), perm.end(), 0);
            const bool horiz = (boxes[idxs.front()].subtype & kVertical) == 0;
            std::sort(perm.begin(), perm.end(), [&](int a, int b) {
                if (a == b) return false;
                const Box& ba = boxes[idxs[a]];
                const Box& bb = boxes[idxs[b]];
                if (ba.double_line == bb.double_line)
                    return horiz ? ba.cx < bb.cx : ba.cy < bb.cy;
                return ba.double_line < bb.double_line;
            });
            std::vector<int> subs;
            for (int i : idxs) subs.push_back(boxes[i].subidx);
            std::sort(subs.begin(), subs.end());
            for (size_t j = 0; j < perm.size(); ++j)
                boxes[idxs[perm[j]]].subidx = subs[j];
        }
    }
    std::sort(boxes.begin(), boxes.end(), reading_order);
}

}  // namespace lineengine
