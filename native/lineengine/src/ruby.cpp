// Ruby (furigana) attachment: scan the band before each line (above a
// horizontal line / right of a vertical line) along its center track for
// ruby-typed boxes, assign each ruby run to its base-character run, and
// interleave ruby after its base run in the in-line reading order.
// Behavior-equivalent to
// /root/reference/textline_detect/src/ruby_search.cpp:12-713.
#include "engine.h"

#include <algorithm>

namespace lineengine {

namespace {

// Assign each ruby box to a base run. Rubies outside every run's span are
// recovered by chaining to neighbor rubies; gap > 2 ruby-widths breaks a
// ruby run (ruby_search.cpp:197-355 horizontal, :456-615 vertical).
std::vector<int> map_ruby_to_runs(const std::vector<int>& rubies,
                                  const std::vector<Box>& boxes,
                                  const std::vector<std::pair<float, float>>&
                                      run_span,
                                  float ruby_size, bool horiz) {
    auto pos = [&](int id) { return horiz ? boxes[id].cx : boxes[id].cy; };
    const size_t n = rubies.size();
    std::vector<int> owner(n, -1);
    for (size_t i = 0; i < n; ++i) {
        for (size_t j = 0; j < run_span.size(); ++j) {
            if (run_span[j].first < pos(rubies[i]) &&
                pos(rubies[i]) < run_span[j].second) {
                owner[i] = (int)j;
                break;
            }
        }
    }
    const bool any_unset = std::count(owner.begin(), owner.end(), -1) > 0;
    const bool any_set =
        std::count_if(owner.begin(), owner.end(),
                      [](int x) { return x >= 0; }) > 0;
    if (!(any_unset && any_set)) return owner;

    const float link = ruby_size * 2;
    // walk a run of linked rubies towards the front looking for an
    // already-owned one
    auto search_back = [&](size_t i) {
        for (size_t k = i; k > 1; --k) {
            if (pos(rubies[k - 1]) - pos(rubies[k - 2]) > link) break;
            if (owner[k - 2] < 0) continue;
            return owner[k - 2];
        }
        return -1;
    };
    auto search_fwd = [&](size_t i) {
        for (size_t k = i + 1; k + 1 < n; ++k) {
            if (pos(rubies[k + 1]) - pos(rubies[k]) > link) break;
            if (owner[k + 1] < 0) continue;
            return owner[k + 1];
        }
        return -1;
    };

    for (size_t i = 0; i < n; ++i) {
        if (owner[i] >= 0) continue;
        float d_prev = i > 0 ? pos(rubies[i]) - pos(rubies[i - 1])
                             : INFINITY;
        float d_next = i + 1 < n ? pos(rubies[i + 1]) - pos(rubies[i])
                                 : INFINITY;
        if (d_prev <= link && d_next <= link) {
            // linked on both sides
            if (owner[i - 1] < 0 && owner[i + 1] < 0) {
                int o = search_back(i);
                if (o < 0) o = search_fwd(i);
                owner[i] = o;
            } else if (owner[i - 1] >= 0 && owner[i + 1] >= 0) {
                owner[i] = d_prev < d_next ? owner[i - 1] : owner[i + 1];
            } else {
                owner[i] = owner[i - 1] >= 0 ? owner[i - 1] : owner[i + 1];
            }
            continue;
        }
        if (d_prev > link && d_next > link) continue;   // isolated
        if (d_prev <= link) {
            owner[i] = owner[i - 1] >= 0 ? owner[i - 1] : search_back(i);
            continue;
        }
        owner[i] = owner[i + 1] >= 0 ? owner[i + 1] : search_fwd(i);
    }
    return owner;
}

}  // namespace

void attach_ruby(const Context& ctx, std::vector<Box>& boxes,
                 Chains& chains, const std::vector<bool>& blocker,
                 const std::vector<int>& ids_all) {
    std::vector<int> cmap = rasterize_chains(ctx, boxes, chains, blocker);

    // phase 1: claim ruby boxes along each chain's track
    // (ruby_search.cpp:22-106)
    for (int cid = 0; cid < (int)chains.size(); ++cid) {
        if (chains[cid].size() < 2) continue;
        sort_chain(chains[cid], boxes);

        std::vector<int> xs, ys;
        float direction;
        double w, h;
        chain_track(ctx, xs, ys, direction, w, h, boxes, chains, blocker,
                    cid, 1);
        const bool horiz = std::fabs(direction) < M_PI_4;
        const double band = (horiz ? h : w) * 1.25 / ctx.p.scale;

        std::vector<int> claimed;
        for (size_t i = 0; i < xs.size(); ++i) {
            int xi = xs[i] / ctx.p.scale, yi = ys[i] / ctx.p.scale;
            if (!ctx.inside(xi, yi)) continue;
            for (int k = 1; k < band; ++k) {
                // ruby sits above a horizontal line, right of a vertical
                int x = horiz ? xi : xi + k;
                int y = horiz ? yi - k : yi;
                if (!ctx.inside(x, y)) continue;
                size_t at = ctx.at(x, y);
                if (blocker[at]) break;
                if (cmap[at] >= 0 && cmap[at] != cid) break;
                int oid = ids_all[at];
                if (oid < 0) continue;
                if (!boxes[oid].is_ruby()) continue;
                if (std::find(claimed.begin(), claimed.end(), oid) !=
                    claimed.end())
                    continue;
                if (boxes[oid].idx >= 0) continue;
                claimed.push_back(oid);
            }
        }
        for (int oid : claimed) {
            if (boxes[oid].idx >= 0) {
                auto& old = chains[boxes[oid].idx];
                old.erase(std::remove(old.begin(), old.end(), oid),
                          old.end());
            } else {
                boxes[oid].idx = cid;
                boxes[oid].direction = direction;
            }
            chains[cid].push_back(oid);
        }
    }

    tidy_chains(boxes, chains);

    // phase 2: per chain, split ruby/base, find base runs, own rubies,
    // and interleave ruby after its run (ruby_search.cpp:111-705)
    for (int cid = 0; cid < (int)chains.size(); ++cid) {
        sort_chain(chains[cid], boxes);

        std::vector<int> base, rubies;
        for (int id : chains[cid]) {
            (boxes[id].is_ruby() ? rubies : base).push_back(id);
        }
        if (rubies.empty()) {
            int sub = 0;
            for (int id : chains[cid]) {
                boxes[id].subtype &= ~kRubyText;
                boxes[id].idx = cid;
                boxes[id].subidx = sub++;
            }
            continue;
        }

        const bool horiz = boxes[chains[cid].front()].horizontal();
        std::sort(rubies.begin(), rubies.end(), [&](int a, int b) {
            return horiz ? boxes[a].cx < boxes[b].cx
                         : boxes[a].cy < boxes[b].cy;
        });

        // consecutive rubybase boxes form runs
        std::vector<std::vector<int>> runs;
        std::vector<int> cur;
        for (int id : base) {
            if (boxes[id].is_rubybase()) {
                cur.push_back(id);
            } else if (!cur.empty()) {
                runs.push_back(cur);
                cur.clear();
            }
        }
        if (!cur.empty()) runs.push_back(cur);

        double base_size = 0, ruby_size = 0;
        for (int id : base)
            base_size = std::max(base_size,
                                 (double)(horiz ? boxes[id].w : boxes[id].h));
        for (int id : rubies)
            ruby_size = std::max(ruby_size,
                                 (double)(horiz ? boxes[id].w : boxes[id].h));

        std::vector<std::pair<float, float>> span;
        for (const auto& run : runs) {
            float p0 = (horiz ? boxes[run.front()].cx
                              : boxes[run.front()].cy) - (float)base_size;
            float p1 = (horiz ? boxes[run.back()].cx
                              : boxes[run.back()].cy) + (float)base_size;
            span.emplace_back(p0, p1);
        }

        std::vector<int> owner = map_ruby_to_runs(rubies, boxes, span,
                                                  (float)ruby_size, horiz);

        // runs with under 2 rubies whose ruby is tiny: demote both
        // (ruby_search.cpp:357-382)
        std::vector<int> per_run(runs.size(), 0);
        for (int o : owner)
            if (o >= 0) ++per_run[o];
        for (size_t i = 0; i < rubies.size(); ++i) {
            const Box& r = boxes[rubies[i]];
            if (std::max(r.w, r.h) >= 13) continue;
            if (owner[i] < 0) {
                boxes[rubies[i]].subtype |= kLoneRuby;
                boxes[rubies[i]].idx = -1;
            } else if (per_run[owner[i]] < 2) {
                boxes[rubies[i]].subtype |= kLoneRuby;
                boxes[rubies[i]].idx = -1;
                for (int bid : runs[owner[i]])
                    boxes[bid].subtype &= ~kRubyText;
            }
        }

        // reading order: base boxes, each run's rubies right after its
        // last base char
        std::vector<int> order;
        for (int id : base) {
            order.push_back(id);
            for (size_t j = 0; j < runs.size(); ++j) {
                if (runs[j].back() != id) continue;
                for (size_t i = 0; i < rubies.size(); ++i) {
                    if (boxes[rubies[i]].idx < 0) continue;
                    if (owner[i] == (int)j) order.push_back(rubies[i]);
                }
                break;
            }
        }

        // runs that attracted no ruby lose the rubybase mark
        for (size_t j = 0; j < runs.size(); ++j) {
            if (std::find(owner.begin(), owner.end(), (int)j) ==
                owner.end()) {
                for (int bid : runs[j]) boxes[bid].subtype &= ~kRubyText;
            }
        }

        // ownerless rubies drop ruby status and slot into the line where
        // their position fits (quirk preserved: the vertical branch
        // compares the box CX against line boxes' cy spans,
        // ruby_search.cpp:672-689)
        for (size_t i = 0; i < rubies.size(); ++i) {
            if (boxes[rubies[i]].idx < 0) continue;
            if (owner[i] != -1) continue;
            int rid = rubies[i];
            boxes[rid].subtype &= ~kRubyText;
            boxes[rid].subtype |= kLoneRuby;
            int p = (int)boxes[rid].cx;
            auto before = std::find_if(
                order.begin(), order.end(), [&](int j) {
                    return horiz ? p < boxes[j].cx - boxes[j].w / 2
                                 : p < boxes[j].cy - boxes[j].h / 2;
                });
            order.insert(before, rid);
        }

        int sub = 0;
        for (int id : order) {
            if (horiz) boxes[id].subtype &= ~kVertical;
            else boxes[id].subtype |= kVertical;
            boxes[id].idx = cid;
            boxes[id].subidx = sub++;
        }
    }

    // rubies that never joined a line lose ruby status
    // (ruby_search.cpp:707-712)
    for (Box& b : boxes) {
        if (b.idx < 0) b.subtype &= ~kRubyText;
    }
}

}  // namespace lineengine
