// C ABI for in-process use from python (ctypes), avoiding the subprocess
// round trip of the binary protocol. Same pipeline as main.cpp.
#include <algorithm>
#include <cstdint>
#include <vector>

#include "blocks.h"
#include "chains.h"
#include "grid.h"
#include "spaces.h"
#include "types.h"

using namespace lineengine;

extern "C" {

// boxes_in: n x 8 f32 (cx, cy, w, h, code1, code2, code4, code8)
// out:      n x 7 i32 (id, block, idx, subidx, subtype, page, section),
//           sorted in reading order. Returns n.
int lineengine_process(const float* lineimg, const float* sepimg,
                       int w, int h, const float* boxes_in, int n,
                       const double* params9, int32_t* out) {
    Params p;
    if (params9) {
        p.ruby_cutoff = params9[0];
        p.rubybase_cutoff = params9[1];
        p.space_cutoff = params9[2];
        p.emphasis_cutoff = params9[3];
        p.line_valueth = (float)params9[4];
        p.sep_valueth = (float)params9[5];
        p.allowwidth_next_block = params9[6];
        p.allow_sizediff = params9[7];
        p.page_divide = (int)params9[8];
    }

    Image line{w, h, std::vector<float>(lineimg, lineimg + (size_t)w * h)};
    Image sep{w, h, std::vector<float>(sepimg, sepimg + (size_t)w * h)};

    std::vector<Box> boxes(n);
    for (int i = 0; i < n; ++i) {
        Box& b = boxes[i];
        const float* v = boxes_in + (size_t)i * 8;
        b.id = i;
        b.cx = v[0]; b.cy = v[1]; b.w = v[2]; b.h = v[3];
        b.code1 = v[4]; b.code2 = v[5]; b.code4 = v[6]; b.code8 = v[7];
        if (b.code2 > p.rubybase_cutoff) b.subtype |= kRubyBase;
        if (b.code1 > p.ruby_cutoff) b.subtype |= kRubyText;
        if (b.code8 > p.space_cutoff) b.subtype |= kSpace;
        if (b.code4 > p.emphasis_cutoff) b.subtype |= kEmphasis;
    }

    BoolImage sepmask = make_separator_mask(sep, p);
    LineComponents lc = find_line_components(line, sepmask, p);
    std::vector<Chain> chains = build_chains(boxes, line, sepmask, lc, p);
    attach_ruby_and_order(boxes, chains, sepmask, p);
    make_blocks(boxes, chains, sepmask, p, w * p.scale, h * p.scale);
    space_check(boxes);

    std::sort(boxes.begin(), boxes.end(), [](const Box& a, const Box& b) {
        if (a.block != b.block) return a.block < b.block;
        if (a.idx != b.idx) return a.idx < b.idx;
        if (a.subidx != b.subidx) return a.subidx < b.subidx;
        return a.id < b.id;
    });
    for (int i = 0; i < n; ++i) {
        const Box& b = boxes[i];
        int32_t* r = out + (size_t)i * 7;
        r[0] = b.id; r[1] = b.block; r[2] = b.idx; r[3] = b.subidx;
        r[4] = b.subtype; r[5] = b.page; r[6] = b.section;
    }
    return n;
}

}  // extern "C"
