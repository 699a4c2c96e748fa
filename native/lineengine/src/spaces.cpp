// Space inference: drop duplicate space flags on overlapping boxes, then
// detect line-head indentation per block by fitting the head boundary
// with a least-squares polynomial (degree <= 4) and comparing each line's
// first character against it.
// Behavior-equivalent to
// /root/reference/textline_detect/src/space_check.cpp (remove_dupspace
// :40-73, find_lostspace :76-673; the polynomial fit replaces the MINPACK
// lmdif1 port with the in-tree damped LM solver, lm.cpp — the model is
// linear in its coefficients, so both converge to the same fit).
#include "engine.h"
#include "lm.h"

#include <algorithm>

namespace lineengine {

namespace {

void remove_duplicate_spaces(std::vector<Box>& boxes) {
    std::vector<int> sp;
    for (int i = 0; i < (int)boxes.size(); ++i)
        if ((boxes[i].subtype & kSpace) == kSpace) sp.push_back(i);
    if (sp.size() < 1) return;
    for (size_t i = 0; i + 1 < sp.size(); ++i) {
        const Box& a = boxes[sp[i]];
        const Box& b = boxes[sp[i + 1]];
        if ((a.subtype & kSpace) != kSpace) continue;
        float ix = std::max(0.f, std::min(a.cx + a.w / 2, b.cx + b.w / 2) -
                                     std::max(a.cx - a.w / 2,
                                              b.cx - b.w / 2));
        float iy = std::max(0.f, std::min(a.cy + a.h / 2, b.cy + b.h / 2) -
                                     std::max(a.cy - a.h / 2,
                                              b.cy - b.h / 2));
        if (ix * iy > 0) boxes[sp[i + 1]].subtype &= ~kSpace;
    }
}

// per-line head measurements for the indent passes
struct HeadProbe {
    float mx2 = 0;    // expected boundary if the line is NOT indented
    float sx2 = 0;    // expected boundary if the line IS indented
    bool skip = false;
};

// Constants vary per pass in the reference; wsum_th and the guard on the
// 3-char span check are the knobs (space_check.cpp:214-252, 309-347,
// 405-443, 500-538).
HeadProbe probe_line(const std::vector<int>& line,
                     const std::vector<Box>& boxes, float s0,
                     float wsum_th, float span_lo, bool guard_hi,
                     bool guarded, int i, int n) {
    HeadProbe hp;
    const Box& b0 = boxes[line[0]];
    const Box& b1 = boxes[line[1]];
    const bool horiz = (b0.subtype & kVertical) == 0;
    auto c = [&](const Box& b) { return horiz ? b.cx : b.cy; };
    auto e = [&](const Box& b) { return horiz ? b.w : b.h; };
    hp.mx2 = (c(b0) + e(b0) / 2 + c(b1) - e(b1) / 2) / 2;
    hp.mx2 = std::max(hp.mx2, (c(b0) + c(b1)) / 2);
    hp.sx2 = hp.mx2 - s0;
    if (c(b1) - c(b0) > s0 * 1.15f) hp.skip = true;
    if (e(b0) + e(b1) < wsum_th) hp.skip = true;
    if (line.size() == 3) {
        const Box& b2 = boxes[line[2]];
        if (c(b2) - c(b0) < span_lo) hp.skip = true;
        if ((!guarded || (i > 0 && i < n - 1)) &&
            c(b2) - c(b0) > s0 * 2.2f)
            hp.skip = true;
    }
    (void)guard_hi;
    return hp;
}

// shared indent-vs-boundary decision (space_check.cpp:267-285 et al.)
void classify(float mx2, float sx2, float fmx, float s0,
              std::vector<bool>& head_indents, std::vector<bool>& head_skip,
              int i) {
    if (mx2 < fmx && std::fabs(fmx - mx2) > s0 * 0.25f) {
        head_skip[i] = true;
    } else if (std::fabs(fmx - mx2) < s0 * 0.6f) {
        head_indents[i] = false;
    } else if (std::fabs(fmx - s0 - mx2) < s0 * 0.6f) {
        head_indents[i] = false;
    } else if (std::fabs(fmx - sx2) < s0 * 0.6f) {
        head_indents[i] = true;
    } else {
        head_skip[i] = true;
    }
}

void find_lost_spaces(std::vector<Box>& boxes) {
    std::vector<int> block_ids;
    for (const Box& b : boxes)
        if (b.idx == 0 && b.subidx == 0) block_ids.push_back(b.block);

    for (int blk : block_ids) {
        // first three non-ruby boxes of each line + the block's char size
        std::vector<std::vector<int>> lines;
        float s0 = 0;
        for (int i = 0; i < (int)boxes.size(); ++i) {
            const Box& b = boxes[i];
            if (b.block != blk || b.is_ruby()) continue;
            s0 = std::max(s0, (b.subtype & kVertical) == 0 ? b.w : b.h);
            while ((int)lines.size() <= b.idx) lines.emplace_back();
            if (lines[b.idx].size() < 3) lines[b.idx].push_back(i);
        }
        // drop lines made only of thin characters
        lines.erase(std::remove_if(lines.begin(), lines.end(),
                                   [&](const std::vector<int>& l) {
                                       for (int i : l) {
                                           const Box& b = boxes[i];
                                           float e = (b.subtype &
                                                      kVertical) == 0
                                                         ? b.w : b.h;
                                           if (s0 - e < s0 * 0.5f)
                                               return false;
                                       }
                                       return true;
                                   }),
                    lines.end());
        if (lines.size() < 2) continue;

        const bool horiz =
            (boxes[lines.front().front()].subtype & kVertical) == 0;
        auto c = [&](int i) {
            return horiz ? boxes[i].cx : boxes[i].cy;
        };
        auto e = [&](int i) { return horiz ? boxes[i].w : boxes[i].h; };

        // drop deeply indented lines
        {
            float x0 = INFINITY;
            for (const auto& l : lines) x0 = std::min(x0, c(l.front()));
            lines.erase(std::remove_if(lines.begin(), lines.end(),
                                       [&](const std::vector<int>& l) {
                                           return c(l.front()) - x0 >
                                                  s0 * 2.5f;
                                       }),
                        lines.end());
        }
        if (lines.size() < 2) continue;

        const int n = (int)lines.size();
        std::vector<bool> head_indents(n), head_skip(n);
        std::vector<float> amx(n, 0);
        for (int i = 0; i < n; ++i)
            head_indents[i] =
                (boxes[lines[i].front()].subtype & kSpace) == kSpace;

        // anchor line: topmost full-width head character
        int k = 0;
        float minx = INFINITY;
        for (int i = 0; i < n; ++i) {
            if (lines[i].size() < 2) continue;
            if (e(lines[i][0]) < s0 * 0.6f) continue;
            float sx = c(lines[i][0]) - e(lines[i][0]) / 2;
            if (sx < minx) {
                minx = sx;
                k = i;
            }
        }

        if (k < n / 2) {
            // forward from the anchor, then a full backward sweep
            for (int i = k; i < n; ++i) {
                if (lines[i].size() < 2) continue;
                HeadProbe hp = probe_line(lines[i], boxes, s0, s0 * 0.85f,
                                          s0, false, false, i, n);
                float delta = 0;
                for (int j = k + 1; j < i; ++j)
                    if (amx[j] != 0 && amx[j - 1] != 0)
                        delta = (amx[j] - amx[j - 1]) * 0.25f +
                                delta * 0.75f;
                if (hp.skip) {
                    head_skip[i] = true;
                } else if (i > 0 && amx[i - 1] != 0) {
                    classify(hp.mx2, hp.sx2, amx[i - 1] + delta, s0,
                             head_indents, head_skip, i);
                }
                if (head_skip[i]) {
                    if (i > 0 && amx[i - 1] != 0) amx[i] = amx[i - 1] + delta;
                } else {
                    amx[i] = head_indents[i] ? hp.sx2 : hp.mx2;
                }
            }
            std::fill(head_skip.begin(), head_skip.end(), false);
            for (int i = n - 1; i >= 0; --i) {
                if (lines[i].size() < 2) continue;
                HeadProbe hp = probe_line(lines[i], boxes, s0, s0 * 0.85f,
                                          s0, false, true, i, n);
                float delta = 0;
                for (int j = n - 2; j > i; --j)
                    if (amx[j] != 0 && amx[j + 1] != 0)
                        delta = (amx[j] - amx[j + 1]) * 0.25f +
                                delta * 0.75f;
                if (hp.skip) {
                    head_skip[i] = true;
                } else if (i < n - 1 && amx[i + 1] != 0) {
                    float fmx = (amx[i] != 0 && delta == 0)
                                    ? amx[i] : amx[i + 1] + delta;
                    classify(hp.mx2, hp.sx2, fmx, s0, head_indents,
                             head_skip, i);
                }
                if (head_skip[i]) {
                    if (i < n - 1 && amx[i + 1] != 0 && amx[i] == 0)
                        amx[i] = amx[i + 1] + delta;
                } else {
                    amx[i] = head_indents[i] ? hp.sx2 : hp.mx2;
                }
            }
        } else {
            // backward from the anchor, then a full forward sweep
            for (int i = k; i >= 0; --i) {
                if (lines[i].size() < 2) continue;
                HeadProbe hp = probe_line(lines[i], boxes, s0, s0 * 0.75f,
                                          s0, false, true, i, n);
                float delta = 0;
                for (int j = k - 1; j > i; --j)
                    if (amx[j] != 0 && amx[j + 1] != 0)
                        delta = (amx[j] - amx[j + 1]) * 0.25f +
                                delta * 0.75f;
                if (hp.skip) {
                    head_skip[i] = true;
                } else if (i < n - 1 && amx[i + 1] != 0) {
                    classify(hp.mx2, hp.sx2, amx[i + 1] + delta, s0,
                             head_indents, head_skip, i);
                }
                if (head_skip[i]) {
                    if (i < n - 1 && amx[i + 1] != 0)
                        amx[i] = amx[i + 1] + delta;
                } else {
                    amx[i] = head_indents[i] ? hp.sx2 : hp.mx2;
                }
            }
            std::fill(head_skip.begin(), head_skip.end(), false);
            for (int i = 0; i < n; ++i) {
                if (lines[i].size() < 2) continue;
                // reference quirk: this sweep's vertical thresholds
                // differ (space_check.cpp:528,532)
                HeadProbe hp = horiz
                    ? probe_line(lines[i], boxes, s0, s0 * 0.75f, s0,
                                 false, false, i, n)
                    : probe_line(lines[i], boxes, s0, s0, s0 * 0.75f,
                                 false, false, i, n);
                float delta = 0;
                for (int j = 1; j < i; ++j)
                    if (amx[j] != 0 && amx[j - 1] != 0)
                        delta = (amx[j] - amx[j - 1]) * 0.25f +
                                delta * 0.75f;
                if (hp.skip) {
                    head_skip[i] = true;
                } else if (i > 0 && amx[i - 1] != 0) {
                    float fmx = (amx[i] != 0 && delta == 0)
                                    ? amx[i] : amx[i - 1] + delta;
                    classify(hp.mx2, hp.sx2, fmx, s0, head_indents,
                             head_skip, i);
                }
                if (head_skip[i]) {
                    if (i > 0 && amx[i - 1] != 0 && amx[i] == 0)
                        amx[i] = amx[i - 1] + delta;
                } else {
                    amx[i] = head_indents[i] ? hp.sx2 : hp.mx2;
                }
            }
        }

        // fit the head boundary: each line anchors at its first box's
        // start (indented) or end (not indented)
        std::vector<double> xd, yd;
        std::vector<float> head_main, head_cross, head_center;
        for (int i = 0; i < n; ++i) {
            const Box& b0 = boxes[lines[i][0]];
            float start = horiz ? b0.cx - b0.w / 2 : b0.cy - b0.h / 2;
            float end = horiz ? b0.cx + b0.w / 2 : b0.cy + b0.h / 2;
            float cross = horiz ? b0.cy : b0.cx;
            float center = horiz ? b0.cx : b0.cy;
            head_main.push_back(start);
            head_cross.push_back(cross);
            head_center.push_back(center);
            if (head_skip[i]) continue;
            xd.push_back(cross);
            yd.push_back(head_indents[i] ? start : end);
        }
        const int m = (int)yd.size();
        const int deg = std::min(4, m);
        auto poly = [](double x, const std::vector<double>& cf) {
            double xx = 1, y = 0;
            for (double cj : cf) {
                y += cj * xx;
                xx *= x;
            }
            return y;
        };
        std::vector<double> coef = levenberg_marquardt(
            [&](const std::vector<double>& cf, std::vector<double>& r) {
                for (int i = 0; i < m; ++i) r[i] = yd[i] - poly(xd[i], cf);
            },
            std::vector<double>(deg, 0.0), m);

        for (int i = 0; i < n; ++i) {
            float lx = (float)poly(head_cross[i], coef);
            bool indent = head_center[i] > lx;
            if (indent)
                boxes[lines[i].front()].subtype |= kSpace;
            else
                boxes[lines[i].front()].subtype &= ~kSpace;
        }
    }
}

}  // namespace

void space_check(std::vector<Box>& boxes) {
    remove_duplicate_spaces(boxes);
    find_lost_spaces(boxes);
}

}  // namespace lineengine
