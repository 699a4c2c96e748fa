// Full pipeline driver. Behavior-equivalent to
// /root/reference/textline_detect/src/process.cpp:46-67.
#include "engine.h"

namespace lineengine {

void run_pipeline(const Context& ctx,
                  const std::vector<float>& lineimage,
                  const std::vector<float>& sepimage,
                  std::vector<Box>& boxes) {
    std::vector<int> ids_all, ids_main;
    paint_id_maps(ctx, boxes, ids_all, ids_main);

    std::vector<bool> blocker = make_blocker(ctx, sepimage);

    Chains chains = find_lines(ctx, boxes, lineimage, blocker);

    assemble_chains(ctx, boxes, chains, blocker, ids_main, sepimage);

    finish_chains(ctx, boxes, chains, blocker, ids_all);
    make_blocks(ctx, boxes, blocker);

    space_check(boxes);
}

}  // namespace lineengine
