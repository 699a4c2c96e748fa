#pragma once
// Block construction and reading order.
#include "types.h"
#include "chains.h"

namespace lineengine {

// Group chains into blocks, order blocks/lines/boxes for reading
// (vertical text: right-to-left columns; horizontal: top-down), and write
// block / idx onto the boxes. Also assigns page / section.
void make_blocks(std::vector<Box>& boxes, std::vector<Chain>& chains,
                 const BoolImage& sepmask, const Params& p,
                 int img_w, int img_h);

}  // namespace lineengine
