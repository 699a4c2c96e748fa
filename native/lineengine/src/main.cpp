// linedetect: stdin/stdout binary protocol driver.
//
// Protocol (wire-compatible with the reference binary,
// /root/reference/textline_detect/src/main.cpp:100-183):
//   stdin : u32 run_mode, u32 w, u32 h,
//           f32 line image [w*h], f32 sep image [w*h],
//           u32 box count, then per box 8 x f32:
//           cx, cy, w, h, code1, code2, code4, code8 (image pixels)
//   stdout: u32 count, then per box 7 x i32:
//           id, block, idx, subidx, subtype, page, section
//           (boxes left without a block assignment are dropped, so the
//           output count can be smaller than the input count)
// Flags: --name=value for every tunable in Params.
#include <algorithm>
#include <cstdio>
#include <cstring>
#include <sstream>
#include <string>
#include <vector>

#include "engine.h"

using namespace lineengine;

int main(int argc, char** argv) {
    Params p;
    for (int i = 1; i < argc; ++i) {
        std::string arg(argv[i]);
        auto get = [&](const char* name, auto& target) {
            std::string prefix = std::string("--") + name + "=";
            if (arg.rfind(prefix, 0) == 0) {
                std::stringstream(arg.substr(prefix.size())) >> target;
                fprintf(stderr, "%s=%s\n", name,
                        arg.substr(prefix.size()).c_str());
            }
        };
        get("ruby_cutoff", p.ruby_cutoff);
        get("rubybase_cutoff", p.rubybase_cutoff);
        get("space_cutoff", p.space_cutoff);
        get("emphasis_cutoff", p.emphasis_cutoff);
        get("line_valueth", p.line_valueth);
        get("sep_valueth", p.sep_valueth);
        get("sep_valueth2", p.sep_valueth2);
        get("allowwidth_next_block", p.allowwidth_next_block);
        get("allow_sizediff", p.allow_sizediff);
        get("chain_line_ratio", p.chain_line_ratio);
        get("page_divide", p.page_divide);
        get("scale", p.scale);
    }

    uint32_t run_mode = 0, w = 0, h = 0;
    if (fread(&run_mode, 4, 1, stdin) != 1) return 1;
    if (fread(&w, 4, 1, stdin) != 1) return 1;
    if (fread(&h, 4, 1, stdin) != 1) return 1;

    std::vector<float> line((size_t)w * h), sep((size_t)w * h);
    if (fread(line.data(), 4, line.size(), stdin) != line.size()) return 1;
    if (fread(sep.data(), 4, sep.size(), stdin) != sep.size()) return 1;

    uint32_t count = 0;
    if (fread(&count, 4, 1, stdin) != 1) return 1;
    fprintf(stderr, "%u\n", count);

    std::vector<Box> boxes(count);
    for (uint32_t i = 0; i < count; ++i) {
        Box& b = boxes[i];
        b.id = (int)i;
        float vals[8];
        if (fread(vals, 4, 8, stdin) != 8) return 1;
        b.cx = vals[0]; b.cy = vals[1]; b.w = vals[2]; b.h = vals[3];
        b.code1 = vals[4]; b.code2 = vals[5];
        b.code4 = vals[6]; b.code8 = vals[7];
        if (b.code2 > p.rubybase_cutoff) b.subtype |= kRubyBase;
        if (b.code1 > p.ruby_cutoff) b.subtype |= kRubyText;
        if (b.code8 > p.space_cutoff) b.subtype |= kSpace;
        if (b.code4 > p.emphasis_cutoff) b.subtype |= kEmphasis;
    }

    Context ctx;
    ctx.w = (int)w;
    ctx.h = (int)h;
    ctx.run_mode = (int)run_mode;
    ctx.p = p;

    run_pipeline(ctx, line, sep, boxes);

    std::sort(boxes.begin(), boxes.end(), [](const Box& a, const Box& b) {
        if (a.block != b.block) return a.block < b.block;
        if (a.idx != b.idx) return a.idx < b.idx;
        if (a.subidx != b.subidx) return a.subidx < b.subidx;
        return a.id < b.id;
    });

    uint32_t n = (uint32_t)boxes.size();
    fwrite(&n, 4, 1, stdout);
    for (const Box& b : boxes) {
        int32_t rec[7] = {b.id, b.block, b.idx, b.subidx,
                          b.subtype, b.page, b.section};
        fwrite(rec, 4, 7, stdout);
    }
    return 0;
}
