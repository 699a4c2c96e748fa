// Post pass: direction cleanup of short chains, chain-id registration,
// ruby search, renumbering, orphan claim and (optional) forced chaining.
// Behavior-equivalent to
// /root/reference/textline_detect/src/after_search.cpp:17-251.
#include "engine.h"

#include <algorithm>

namespace lineengine {

namespace {

// chains under 3 boxes infer their direction from the front-back offset
// (fix_shortchain, after_search.cpp:17-41)
void fix_short_chains(std::vector<Box>& boxes, const Chains& chains) {
    for (const auto& chain : chains) {
        if (chain.size() >= 3 || chain.empty()) continue;
        const Box& a = boxes[chain.front()];
        const Box& b = boxes[chain.back()];
        double dir = std::fabs(a.cx - b.cx) > std::fabs(a.cy - b.cy)
                         ? 0 : M_PI_2;
        for (int id : chain) boxes[id].direction = dir;
    }
}

// write chain ids into box.idx and the vertical subtype bit
// (register_chainid, after_search.cpp:44-59)
void register_chain_ids(std::vector<Box>& boxes, const Chains& chains) {
    for (int cid = 0; cid < (int)chains.size(); ++cid) {
        for (int id : chains[cid]) {
            boxes[id].idx = cid;
            if (boxes[id].horizontal()) boxes[id].subtype &= ~kVertical;
            else boxes[id].subtype |= kVertical;
        }
    }
}

// compact sparse idx values (renumber_chain, after_search.cpp:62-79)
int compact_chain_ids(std::vector<Box>& boxes) {
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

// forced chaining of aligned lines within chain_line_ratio char sizes;
// the joined line head gets space+tab-split flags
// (chain_line_force, after_search.cpp:81-225). Disabled by default
// (chain_line_ratio <= 0), matching the reference's default flags.
int force_chain_lines(const Context& ctx, std::vector<Box>& boxes,
                      int id_max) {
    if (ctx.p.chain_line_ratio <= 0) return id_max;

    Chains lines(id_max);
    for (const Box& b : boxes)
        if (b.idx >= 0) lines[b.idx].push_back(-1);
    for (const Box& b : boxes)
        if (b.idx >= 0) lines[b.idx][b.subidx] = b.id;

    for (auto it = lines.begin(); it != lines.end();) {
        const bool horiz = boxes[it->front()].horizontal();
        float ax1 = boxes[it->front()].cx, ay1 = boxes[it->front()].cy;
        float ax2 = boxes[it->back()].cx, ay2 = boxes[it->back()].cy;
        for (auto bit = it->rbegin(); bit != it->rend(); ++bit) {
            if (boxes[*bit].is_ruby()) continue;
            ax2 = boxes[*bit].cx;
            ay2 = boxes[*bit].cy;
            break;
        }
        float s1 = 0;
        for (int id : *it)
            s1 = std::max(s1, std::max(boxes[id].w, boxes[id].h));

        std::vector<std::pair<Chains::iterator, float>> cands;
        for (auto it2 = lines.begin(); it2 != lines.end(); ++it2) {
            if (it == it2) continue;
            const bool horiz2 = boxes[it2->front()].horizontal();
            if (it2->size() > 2) {
                if (horiz != horiz2) continue;
            } else if (it2->size() > 1) {
                // 2-char horizontal stubs may be tate-chu-yoko; only
                // reject vertical stubs against horizontal lines
                if (horiz && !horiz2) continue;
            }
            float bx1 = boxes[it2->front()].cx, by1 = boxes[it2->front()].cy;
            float bx2 = boxes[it2->back()].cx, by2 = boxes[it2->back()].cy;
            for (auto bit = it2->rbegin(); bit != it2->rend(); ++bit) {
                if (boxes[*bit].is_ruby()) continue;
                bx2 = boxes[*bit].cx;
                by2 = boxes[*bit].cy;
                break;
            }
            const float reach = s1 * (float)ctx.p.chain_line_ratio;
            if (horiz) {
                if (std::fabs(ay1 - by2) < s1 && ax1 > bx2 &&
                    ax1 - bx2 < reach)
                    cands.emplace_back(it2, ax1 - bx2);   // b -> a
                if (std::fabs(ay2 - by1) < s1 && ax2 > bx1 &&
                    ax2 - bx1 < reach)
                    cands.emplace_back(it2, bx1 - ax2);   // a -> b
            } else {
                if (std::fabs(ax1 - bx2) < s1 && ay1 > by2 &&
                    ay1 - by2 < reach)
                    cands.emplace_back(it2, ay1 - by2);
                if (std::fabs(ax2 - bx1) < s1 && ay2 > by1 &&
                    ay2 - by1 < reach)
                    cands.emplace_back(it2, by1 - ay2);
            }
        }
        std::sort(cands.begin(), cands.end(), [](const auto& a,
                                                 const auto& b) {
            return std::fabs(a.second) < std::fabs(b.second);
        });
        if (cands.empty()) {
            ++it;
            continue;
        }
        auto it2 = cands.front().first;
        float d = cands.front().second;
        auto set_dir = [&](std::vector<int>& line) {
            for (int id : line) {
                if (horiz) boxes[id].subtype &= ~kVertical;
                else boxes[id].subtype |= kVertical;
            }
        };
        if (d < 0) {
            // this line continues with it2
            it->insert(it->end(), it2->begin(), it2->end());
            boxes[it2->front()].subtype |= kSpace | kTabSplit;
            set_dir(*it);
            auto i1 = std::distance(lines.begin(), it);
            auto i2 = std::distance(lines.begin(), it2);
            lines.erase(it2);
            it = lines.begin() + (i1 < i2 ? i1 + 1 : i1);
        } else {
            // it2 continues with this line
            it2->insert(it2->end(), it->begin(), it->end());
            boxes[it->front()].subtype |= kSpace | kTabSplit;
            set_dir(*it2);
            it = lines.erase(it);
        }
    }

    for (int lid = 0; lid < (int)lines.size(); ++lid) {
        for (int sub = 0; sub < (int)lines[lid].size(); ++sub) {
            boxes[lines[lid][sub]].idx = lid;
            boxes[lines[lid][sub]].subidx = sub;
        }
    }
    return (int)lines.size();
}

}  // namespace

void finish_chains(const Context& ctx, std::vector<Box>& boxes,
                   Chains& chains, const std::vector<bool>& blocker,
                   const std::vector<int>& ids_all) {
    fix_short_chains(boxes, chains);
    register_chain_ids(boxes, chains);

    attach_ruby(ctx, boxes, chains, blocker, ids_all);

    int id_max = compact_chain_ids(boxes);
    id_max = claim_orphans(ctx, boxes, blocker, id_max);
    force_chain_lines(ctx, boxes, id_max);
}

}  // namespace lineengine
