// Pipeline stage declarations. One function per reference component; each
// carries a citation to the reference implementation whose observable
// behavior it reproduces (all citations into /root/reference/textline_detect).
#pragma once

#include "types.h"

namespace lineengine {

// -- prepare (src/prepare.cpp) -------------------------------------------
// Paint box ids into two id maps: all boxes vs non-ruby only
// (prepare_id_image, src/prepare.cpp:68-97).
void paint_id_maps(const Context& ctx, const std::vector<Box>& boxes,
                   std::vector<int>& ids_all, std::vector<int>& ids_main);

// Threshold + cluster-filter + hysteresis-grow the separator map into a
// blocker mask (make_lineblocker, src/prepare.cpp:99-170).
std::vector<bool> make_blocker(const Context& ctx,
                               const std::vector<float>& sep);

// -- line finding (src/hough_linefind.cpp) -------------------------------
// Flood-fill textline clusters, orient them, attach boxes by walking out
// from centers, thicken, re-attach (linefind, src/hough_linefind.cpp:336).
Chains find_lines(const Context& ctx, std::vector<Box>& boxes,
                  const std::vector<float>& lineimage,
                  const std::vector<bool>& blocker);

// -- chain utilities (src/search_loop.cpp) -------------------------------
// Order boxes within a chain along its reading axis, sub-sorting boxes
// that overlap on the axis (sort_chain, src/search_loop.cpp:12-65).
void sort_chain(std::vector<int>& chain, const std::vector<Box>& boxes);

// Drop chains under 2 boxes and sort the rest
// (fix_chain_info, src/search_loop.cpp:67-85).
void tidy_chains(std::vector<Box>& boxes, Chains& chains);

// Rasterize chain ownership along smoothed center tracks
// (create_chainid_map, src/search_loop.cpp:451-522).
std::vector<int> rasterize_chains(const Context& ctx,
                                  const std::vector<Box>& boxes,
                                  const Chains& chains,
                                  const std::vector<bool>& blocker,
                                  double ratio = 1.0, int extra_len = 0);

// Smoothed centerline polyline for one chain, optionally extended past
// the ends (make_track_line, src/search_loop.cpp:239-449).
void chain_track(const Context& ctx, std::vector<int>& xs,
                 std::vector<int>& ys, float& direction, double& w,
                 double& h, const std::vector<Box>& boxes,
                 const Chains& chains, const std::vector<bool>& blocker,
                 int chainid, int extra_len = 0);

// -- chain assembly (src/search_loop.cpp) --------------------------------
// combine_chains fixpoint + orphan re-attachment + double-line marking +
// space chaining (search_loop, src/search_loop.cpp:1251-1270).
void assemble_chains(const Context& ctx, std::vector<Box>& boxes,
                     Chains& chains, const std::vector<bool>& blocker,
                     const std::vector<int>& ids_main,
                     const std::vector<float>& sepimage);

// -- double-line marking (src/split_doubleline.cpp) ----------------------
void mark_mixed_direction(std::vector<Box>& boxes, Chains& chains);
void mark_distance_splits(std::vector<Box>& boxes, Chains& chains);
void mark_double_rows(std::vector<Box>& boxes, Chains& chains);

// -- ruby (src/ruby_search.cpp) ------------------------------------------
// Attach ruby boxes to chains along the track line and interleave them
// after their base-run in reading order (search_ruby, ruby_search.cpp:12).
void attach_ruby(const Context& ctx, std::vector<Box>& boxes,
                 Chains& chains, const std::vector<bool>& blocker,
                 const std::vector<int>& ids_all);

// -- orphans (src/number_unbind.cpp) -------------------------------------
// Cluster never-chained boxes into rows/columns and number them
// (number_unbind, src/number_unbind.cpp:12-363). Returns next chain id.
int claim_orphans(const Context& ctx, std::vector<Box>& boxes,
                  const std::vector<bool>& blocker, int next_id);

// -- post pass (src/after_search.cpp) ------------------------------------
void finish_chains(const Context& ctx, std::vector<Box>& boxes,
                   Chains& chains, const std::vector<bool>& blocker,
                   const std::vector<int>& ids_all);

// -- blocks / reading order (src/make_block.cpp) -------------------------
void make_blocks(const Context& ctx, std::vector<Box>& boxes,
                 const std::vector<bool>& blocker);

// -- spaces (src/space_check.cpp) ----------------------------------------
void space_check(std::vector<Box>& boxes);

// Full pipeline (process, src/process.cpp:46-67). Filters boxes that end
// up without a block assignment (reference drops them at make_block).
void run_pipeline(const Context& ctx,
                  const std::vector<float>& lineimage,
                  const std::vector<float>& sepimage,
                  std::vector<Box>& boxes);

}  // namespace lineengine
