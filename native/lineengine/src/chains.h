#pragma once
// Chain construction: boxes -> ordered text lines.
#include "grid.h"
#include "types.h"

namespace lineengine {

// Build chains: assign non-ruby boxes to textline components, order along
// the reading direction, merge collinear chains across gaps, cluster
// never-chained boxes into synthetic rows/columns, split double lines.
std::vector<Chain> build_chains(std::vector<Box>& boxes, const Image& line,
                                const BoolImage& sepmask,
                                const LineComponents& lc, const Params& p);

// Attach ruby boxes to chains (perpendicular band above / right of the
// line) and assign final per-line reading positions (subidx), with ruby
// text interleaved directly after its base run.
void attach_ruby_and_order(std::vector<Box>& boxes,
                           std::vector<Chain>& chains,
                           const BoolImage& sepmask, const Params& p);

// Geometry helpers shared with blocks.cpp
void update_chain_geometry(Chain& c, const std::vector<Box>& boxes);

}  // namespace lineengine
