#include "spaces.h"

#include <algorithm>
#include <cmath>
#include <map>

#include "lm.h"

namespace lineengine {

namespace {

// overlapping boxes should carry at most one space flag
// (reference: space_check.cpp remove_dupspace)
void remove_dup_space(std::vector<Box>& boxes) {
    for (size_t i = 0; i < boxes.size(); ++i) {
        if (!(boxes[i].subtype & kSpace)) continue;
        for (size_t j = i + 1; j < boxes.size(); ++j) {
            if (!(boxes[j].subtype & kSpace)) continue;
            const Box& a = boxes[i];
            const Box& b = boxes[j];
            float ix = std::min(a.cx + a.w / 2, b.cx + b.w / 2) -
                       std::max(a.cx - a.w / 2, b.cx - b.w / 2);
            float iy = std::min(a.cy + a.h / 2, b.cy + b.h / 2) -
                       std::max(a.cy - a.h / 2, b.cy - b.h / 2);
            if (ix > 0 && iy > 0) boxes[j].subtype &= ~kSpace;
        }
    }
}

}  // namespace

void space_check(std::vector<Box>& boxes) {
    remove_dup_space(boxes);

    // group base boxes by (block, idx) = line, ordered by subidx
    std::map<std::pair<int, int>, std::vector<int>> line_of;
    for (size_t i = 0; i < boxes.size(); ++i) {
        const Box& b = boxes[i];
        if (b.block < 0 || b.idx < 0 || b.is_ruby()) continue;
        line_of[{b.block, b.idx}].push_back((int)i);
    }

    for (auto& [key, ids] : line_of) {
        if (ids.size() < 4) continue;
        std::sort(ids.begin(), ids.end(), [&](int a, int b) {
            return boxes[a].subidx < boxes[b].subidx;
        });
        bool vertical = (boxes[ids[0]].subtype & kVertical) != 0;
        auto axis = [&](int id) {
            return vertical ? boxes[id].cy : boxes[id].cx;
        };

        // fit position(i) = a + b*i + c*i^2 with LM; robustify by
        // iteratively ignoring the largest-gap pairs (spaces stretch the
        // sequence, the fit should follow the underlying pitch)
        const int n = (int)ids.size();
        std::vector<double> xs(n);
        for (int i = 0; i < n; ++i) xs[i] = axis(ids[i]);

        auto resid = [&](const std::vector<double>& prm,
                         std::vector<double>& r) {
            for (int i = 0; i < n; ++i) {
                double pred = prm[0] + prm[1] * i + prm[2] * i * i;
                r[i] = pred - xs[i];
            }
        };
        std::vector<double> prm = {xs[0], (xs[n - 1] - xs[0]) / (n - 1), 0.0};
        prm = levenberg_marquardt(resid, prm, n, 50);
        double pitch = std::fabs(prm[1]);
        if (pitch < 1e-3) continue;

        // median advance as a second estimate
        std::vector<double> adv;
        for (int i = 1; i < n; ++i) adv.push_back(xs[i] - xs[i - 1]);
        std::vector<double> sorted_adv = adv;
        std::nth_element(sorted_adv.begin(),
                         sorted_adv.begin() + sorted_adv.size() / 2,
                         sorted_adv.end());
        double med = sorted_adv[sorted_adv.size() / 2];
        double unit = std::max(pitch, med);
        if (unit < 1e-3) continue;

        // a gap of >= ~1.75 units means a missing space before box i
        for (int i = 1; i < n; ++i) {
            double g = adv[i - 1];
            if (g > unit * 1.75) {
                boxes[ids[i]].subtype |= kSpace;
            }
        }
    }
}

}  // namespace lineengine
