#pragma once
// Raster passes: separator mask + textline connected components.
#include "types.h"

namespace lineengine {

// Threshold + component filter + hysteresis grow of the separator map.
// Components whose value sum is below sep_clusterth are dropped; surviving
// components grow into neighbors above 10% of the component seed max.
BoolImage make_separator_mask(const Image& sep, const Params& p);

// Label textline pixels >= line_valueth into components with a 5x5
// neighborhood (bridges 1-2 px gaps); returns a label image (-1 = none)
// and per-component (vertical?, mean direction) via PCA of pixel coords.
struct LineComponents {
    std::vector<int> label;     // w*h, -1 none
    int w = 0, h = 0;
    int count = 0;
    std::vector<double> dir;    // per-component orientation, radians
    std::vector<bool> vertical;
    int at(int x, int y) const {
        if (x < 0 || x >= w || y < 0 || y >= h) return -1;
        return label[(size_t)y * w + x];
    }
};
LineComponents find_line_components(const Image& line, const BoolImage& sepmask,
                                    const Params& p);

// True if the straight segment (x0,y0)-(x1,y1) (image px) crosses the
// separator mask (map scale).
bool crosses_separator(const BoolImage& sepmask, const Params& p,
                       float x0, float y0, float x1, float y1);

}  // namespace lineengine
