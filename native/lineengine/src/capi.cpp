// C ABI for in-process use from python (ctypes), avoiding the subprocess
// round trip of the binary protocol. Same pipeline as main.cpp.
#include <algorithm>
#include <cstdint>
#include <vector>

#include "engine.h"

using namespace lineengine;

extern "C" {

// boxes_in: n x 8 f32 (cx, cy, w, h, code1, code2, code4, code8)
// out:      n x 7 i32 (id, block, idx, subidx, subtype, page, section),
//           sorted in reading order. Returns the surviving row count
//           (boxes without a block assignment are dropped, mirroring the
//           reference binary).
int lineengine_process(const float* lineimg, const float* sepimg,
                       int w, int h, const float* boxes_in, int n,
                       const double* params10, int32_t* out) {
    Params p;
    if (params10) {
        p.ruby_cutoff = params10[0];
        p.rubybase_cutoff = params10[1];
        p.space_cutoff = params10[2];
        p.emphasis_cutoff = params10[3];
        p.line_valueth = (float)params10[4];
        p.sep_valueth = (float)params10[5];
        p.allowwidth_next_block = params10[6];
        p.allow_sizediff = params10[7];
        p.page_divide = (int)params10[8];
        p.sep_valueth2 = (float)params10[9];
    }

    std::vector<float> line(lineimg, lineimg + (size_t)w * h);
    std::vector<float> sep(sepimg, sepimg + (size_t)w * h);

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

    Context ctx;
    ctx.w = w;
    ctx.h = h;
    ctx.p = p;

    run_pipeline(ctx, line, sep, boxes);

    std::sort(boxes.begin(), boxes.end(), [](const Box& a, const Box& b) {
        if (a.block != b.block) return a.block < b.block;
        if (a.idx != b.idx) return a.idx < b.idx;
        if (a.subidx != b.subidx) return a.subidx < b.subidx;
        return a.id < b.id;
    });
    for (int i = 0; i < (int)boxes.size(); ++i) {
        const Box& b = boxes[i];
        int32_t* r = out + (size_t)i * 7;
        r[0] = b.id; r[1] = b.block; r[2] = b.idx; r[3] = b.subidx;
        r[4] = b.subtype; r[5] = b.page; r[6] = b.section;
    }
    return (int)boxes.size();
}

}  // extern "C"
