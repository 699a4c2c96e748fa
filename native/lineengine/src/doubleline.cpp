// Double-line detection: marks boxes with double_line 1/2 (first/second
// row of an in-line two-row split, e.g. warichu); the rows are reordered
// into reading order later, in make_blocks' final pass.
// Behavior-equivalent to
// /root/reference/textline_detect/src/split_doubleline.cpp.
#include "engine.h"

#include <algorithm>
#include <numeric>

namespace lineengine {

namespace {

// Erase `split` from chains[i]; if it holds >= 2 boxes insert it as a new
// chain before position i. Returns the number of inserted chains (the
// caller's loop then revisits the reduced original, as the reference's
// iterator insertion does; the inserted chain itself is not revisited).
int split_off(Chains& chains, size_t i, std::vector<int>& split,
              const std::vector<Box>& boxes) {
    if (split.empty() || split.size() == chains[i].size()) return 0;
    auto& chain = chains[i];
    chain.erase(std::remove_if(chain.begin(), chain.end(),
                               [&](int id) {
                                   return std::find(split.begin(),
                                                    split.end(),
                                                    id) != split.end();
                               }),
                chain.end());
    if (split.size() >= 2) {
        sort_chain(split, boxes);
        chains.insert(chains.begin() + i, split);
        return 1;
    }
    return 0;
}

}  // namespace

// Pass 1: boxes whose direction disagrees with the chain head split off
// (split_doubleline1, split_doubleline.cpp:13-72).
void mark_mixed_direction(std::vector<Box>& boxes, Chains& chains) {
    tidy_chains(boxes, chains);
    for (size_t i = 0; i < chains.size(); ++i) {
        if (chains[i].size() < 3) continue;
        const bool horiz = boxes[chains[i].front()].horizontal();
        std::vector<int> split;
        for (int id : chains[i])
            if (boxes[id].horizontal() != horiz) split.push_back(id);
        i += split_off(chains, i, split, boxes);
    }
}

// Pass 2: a gap over 3 chars along the reading axis splits off the rest
// (split_doubleline2, split_doubleline.cpp:75-147).
void mark_distance_splits(std::vector<Box>& boxes, Chains& chains) {
    tidy_chains(boxes, chains);
    for (size_t i = 0; i < chains.size(); ++i) {
        if (chains[i].size() < 3) continue;
        float mw = 0, mh = 0;
        for (int id : chains[i]) {
            mw = std::max(mw, boxes[id].w);
            mh = std::max(mh, boxes[id].h);
        }
        const float limit = 3 * std::max(mw, mh);
        const bool horiz = boxes[chains[i].front()].horizontal();
        float prev = horiz ? boxes[chains[i].front()].cx
                           : boxes[chains[i].front()].cy;
        bool splitting = false;
        std::vector<int> split;
        for (int id : chains[i]) {
            float pos = horiz ? boxes[id].cx : boxes[id].cy;
            if (std::fabs(pos - prev) > limit) splitting = true;
            if (splitting) split.push_back(id);
            prev = pos;
        }
        i += split_off(chains, i, split, boxes);
    }
}

// Pass 3: consecutive boxes overlapping along the reading axis but
// stacked on the cross axis mark a two-row region; the marks then extend
// along the row means (split_doubleline3, split_doubleline.cpp:150-317).
void mark_double_rows(std::vector<Box>& boxes, Chains& chains) {
    tidy_chains(boxes, chains);
    for (auto& chain : chains) {
        if (chain.size() < 3) continue;
        if (std::any_of(chain.begin(), chain.end(), [&](int id) {
                return boxes[id].double_line > 0;
            }))
            continue;

        if (boxes[chain.front()].horizontal()) {
            float last_s = -1, last_e = -1;
            int last = -1;
            for (int id : chain) {
                const Box& b = boxes[id];
                if (b.is_ruby()) continue;
                float ov0 = std::max(last_s, b.cx - b.w / 2);
                float ov1 = std::min(last_e, b.cx + b.w / 2);
                if (last >= 0 && ov0 < ov1 && ov1 - ov0 > b.w * 0.2f) {
                    const Box& lb = boxes[last];
                    if (lb.cy < b.cy) {
                        if (lb.cy + lb.h / 2 * 0.75f <
                            b.cy - b.h / 2 * 0.75f) {
                            boxes[last].double_line = 1;
                            boxes[id].double_line = 2;
                        }
                    } else {
                        if (b.cy + b.h / 2 * 0.75f <
                            lb.cy - lb.h / 2 * 0.75f) {
                            boxes[last].double_line = 2;
                            boxes[id].double_line = 1;
                        }
                    }
                }
                last_s = b.cx - b.w / 2;
                last_e = b.cx + b.w / 2;
                last = id;
            }
            // extend marks along the two rows' mean heights
            int marked = 0;
            double hsum = 0, cy1 = 0, cy2 = 0;
            int n1 = 0, n2 = 0;
            for (int id : chain) {
                if (boxes[id].double_line == 1) {
                    hsum += boxes[id].h; cy1 += boxes[id].cy; ++n1; ++marked;
                } else if (boxes[id].double_line == 2) {
                    hsum += boxes[id].h; cy2 += boxes[id].cy; ++n2; ++marked;
                }
            }
            if (!marked) continue;
            float h_s = (float)(hsum / marked);
            float cy1_s = n1 ? (float)(cy1 / n1) : -1;
            float cy2_s = n2 ? (float)(cy2 / n2) : -1;
            int streak = 0;
            for (int id : chain) {
                Box& b = boxes[id];
                if (b.is_ruby()) continue;
                if (b.double_line > 0) ++streak;
                if (streak > 1 && b.double_line == 0) {
                    if (std::fabs(b.cy - cy1_s) < h_s / 5) b.double_line = 1;
                    else if (std::fabs(b.cy - cy2_s) < h_s / 5)
                        b.double_line = 2;
                    else streak = 0;
                }
            }
        } else {
            // Reference quirk (split_doubleline.cpp:237): max_h is NOT
            // the chain's max height. The reference reduces over box
            // *indices* with a (float, int) lambda, and libstdc++'s
            // std::reduce evaluates as a 4-way tree — so indices get
            // promoted to float "heights" and partial height results
            // get truncated back to int and used as box indices. The
            // resulting under-height threshold is a deterministic (per
            // libstdc++) scramble of indices and heights; replicate it
            // by issuing the identical std::reduce call. Where the
            // reference would index out of range (undefined behavior —
            // a truncated height >= box count) we clamp: divergence is
            // then confined to inputs where the reference itself is
            // undefined. Verified equal against the reference binary on
            // the in-range protocol-fuzz corpus (tests/test_lineengine
            // _fuzz.py); the true-max version flipped warichu marks on
            // ~25% of random-cloud pages.
            const int nb = (int)boxes.size();
            float chain_h = std::reduce(
                chain.begin(), chain.end(), 0.0f,
                [&](float acc, int i) {
                    return std::max(
                        acc, boxes[std::clamp(i, 0, nb - 1)].h);
                });
            float last_s = -1, last_e = -1;
            int last = -1;
            for (int id : chain) {
                const Box& b = boxes[id];
                if (b.is_ruby()) continue;
                float ov0 = std::max(last_s, b.cy - b.h / 2);
                float ov1 = std::min(last_e, b.cy + b.h / 2);
                // only under-height boxes can be warichu rows
                if (last >= 0 && b.h < chain_h * 0.75f && ov0 < ov1 &&
                    ov1 - ov0 > b.h * 0.2f) {
                    const Box& lb = boxes[last];
                    if (lb.cx > b.cx) {
                        if (b.cx + b.w / 2 * 0.75f <
                            lb.cx - lb.w / 2 * 0.75f) {
                            boxes[last].double_line = 1;
                            boxes[id].double_line = 2;
                        }
                    } else {
                        if (lb.cx + lb.w / 2 * 0.75f <
                            b.cx - b.w / 2 * 0.75f) {
                            boxes[last].double_line = 2;
                            boxes[id].double_line = 1;
                        }
                    }
                }
                last_s = b.cy - b.h / 2;
                last_e = b.cy + b.h / 2;
                last = id;
            }
            int marked = 0;
            double wsum = 0, ssum = 0, cx1 = 0, cx2 = 0;
            int n1 = 0, n2 = 0;
            for (int id : chain) {
                const Box& b = boxes[id];
                if (b.double_line == 1) {
                    wsum += b.w; ssum += std::max(b.h, b.w);
                    cx1 += b.cx; ++n1; ++marked;
                } else if (b.double_line == 2) {
                    wsum += b.w; ssum += std::max(b.h, b.w);
                    cx2 += b.cx; ++n2; ++marked;
                }
            }
            if (!marked) continue;
            float w_s = (float)(wsum / marked);
            float s_s = (float)(ssum / marked);
            float cx1_s = n1 ? (float)(cx1 / n1) : -1;
            float cx2_s = n2 ? (float)(cx2 / n2) : -1;
            int streak = 0;
            for (int id : chain) {
                Box& b = boxes[id];
                if (b.is_ruby()) continue;
                if (b.double_line > 0) {
                    ++streak;
                } else if (streak > 2) {
                    if (std::max(b.h, b.w) > s_s * 1.5f) {
                        streak = 0;
                        continue;
                    }
                    if (b.cx - b.w / 2 * 0.75f > cx2_s + w_s / 2 * 0.75f)
                        b.double_line = 1;
                    else if (b.cx + b.w / 2 * 0.75f <
                             cx1_s - w_s / 2 * 0.75f)
                        b.double_line = 2;
                    else
                        streak = 0;
                }
            }
        }
    }
}

}  // namespace lineengine
