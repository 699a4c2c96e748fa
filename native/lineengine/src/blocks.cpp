#include "blocks.h"

#include <algorithm>
#include <cmath>
#include <functional>

namespace lineengine {

namespace {

struct LineInfo {
    int chain;
    bool vertical;
    double size;
    // bounding box over the chain's boxes (image px)
    float minx = 1e30f, miny = 1e30f, maxx = -1e30f, maxy = -1e30f;
    float lat;    // column x (vertical) or row y (horizontal)
    float a0, a1; // reading-axis span
    int block = -1;
};

// do two lines belong to the same block (consecutive columns/rows)?
bool adjacent_lines(const LineInfo& a, const LineInfo& b,
                    const std::vector<Box>& boxes, const BoolImage& sepmask,
                    const Params& p) {
    if (a.vertical != b.vertical) return false;
    double size = std::max(a.size, b.size);
    if (std::min(a.size, b.size) < size * (1.0 - p.allow_sizediff))
        return false;
    // lateral gap between line positions below allowwidth_next_block*size
    double gap = std::fabs(a.lat - b.lat);
    if (gap > p.allowwidth_next_block * size * 1.6) return false;
    if (gap < 1e-3) return false;
    // reading-axis spans must overlap
    float o0 = std::max(a.a0, b.a0), o1 = std::min(a.a1, b.a1);
    if (o1 - o0 < -size) return false;
    // no separator between the two line midpoints
    float am = (a.a0 + a.a1) / 2, bm = (b.a0 + b.a1) / 2;
    float ax, ay, bx, by;
    if (a.vertical) { ax = a.lat; ay = am; bx = b.lat; by = bm; }
    else { ax = am; ay = a.lat; bx = bm; by = b.lat; }
    if (crosses_separator(sepmask, p, ax, ay, bx, by)) return false;
    return true;
}

}  // namespace

void make_blocks(std::vector<Box>& boxes, std::vector<Chain>& chains,
                 const BoolImage& sepmask, const Params& p,
                 int img_w, int img_h) {
    // per-line geometry (base boxes only)
    std::vector<LineInfo> lines;
    for (size_t ci = 0; ci < chains.size(); ++ci) {
        const Chain& c = chains[ci];
        if (c.boxes.empty()) continue;
        LineInfo li;
        li.chain = (int)ci;
        li.vertical = c.vertical;
        li.size = c.size > 0 ? c.size : 1.0;
        for (int id : c.boxes) {
            const Box& b = boxes[id];
            if (b.is_ruby()) continue;
            li.minx = std::min(li.minx, b.cx - b.w / 2);
            li.maxx = std::max(li.maxx, b.cx + b.w / 2);
            li.miny = std::min(li.miny, b.cy - b.h / 2);
            li.maxy = std::max(li.maxy, b.cy + b.h / 2);
        }
        if (li.minx > li.maxx) {  // ruby-only chain
            for (int id : c.boxes) {
                const Box& b = boxes[id];
                li.minx = std::min(li.minx, b.cx - b.w / 2);
                li.maxx = std::max(li.maxx, b.cx + b.w / 2);
                li.miny = std::min(li.miny, b.cy - b.h / 2);
                li.maxy = std::max(li.maxy, b.cy + b.h / 2);
            }
        }
        if (li.vertical) {
            li.lat = (li.minx + li.maxx) / 2;
            li.a0 = li.miny; li.a1 = li.maxy;
        } else {
            li.lat = (li.miny + li.maxy) / 2;
            li.a0 = li.minx; li.a1 = li.maxx;
        }
        lines.push_back(li);
    }

    // block clustering: union-find over adjacent lines
    std::vector<int> parent(lines.size());
    for (size_t i = 0; i < lines.size(); ++i) parent[i] = (int)i;
    std::function<int(int)> find = [&](int x) {
        while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
        return x;
    };
    for (size_t i = 0; i < lines.size(); ++i)
        for (size_t j = i + 1; j < lines.size(); ++j)
            if (adjacent_lines(lines[i], lines[j], boxes, sepmask, p)) {
                int a = find((int)i), b = find((int)j);
                if (a != b) parent[a] = b;
            }

    // collect blocks
    std::vector<std::vector<int>> groups;   // line indices
    {
        std::vector<int> root_of(lines.size());
        std::vector<int> block_of(lines.size(), -1);
        for (size_t i = 0; i < lines.size(); ++i) root_of[i] = find((int)i);
        for (size_t i = 0; i < lines.size(); ++i) {
            int r = root_of[i];
            if (block_of[r] < 0) {
                block_of[r] = (int)groups.size();
                groups.emplace_back();
            }
            groups[block_of[r]].push_back((int)i);
        }
    }

    // block-level geometry + reading order
    struct BlockInfo {
        std::vector<int> line_ids;
        bool vertical;
        float minx = 1e30f, miny = 1e30f, maxx = -1e30f, maxy = -1e30f;
    };
    std::vector<BlockInfo> blocks;
    for (auto& g : groups) {
        BlockInfo bi;
        bi.line_ids = g;
        int nv = 0;
        for (int li : g) {
            nv += lines[li].vertical ? 1 : 0;
            bi.minx = std::min(bi.minx, lines[li].minx);
            bi.maxx = std::max(bi.maxx, lines[li].maxx);
            bi.miny = std::min(bi.miny, lines[li].miny);
            bi.maxy = std::max(bi.maxy, lines[li].maxy);
        }
        bi.vertical = nv * 2 > (int)g.size();
        blocks.push_back(std::move(bi));
    }

    // page/section assignment: optional vertical page divide at the middle
    auto page_of = [&](const BlockInfo& b) {
        if (p.page_divide <= 0) return 0;
        float mid = img_w / 2.0f;
        return (b.minx + b.maxx) / 2 > mid ? 0 : 1;  // right page first (JP)
    };

    // sections: horizontal bands delimited by long horizontal separator
    // rules (headers/footers); a block's section is its band index
    std::vector<int> band_rows;   // map-scale y of full-width rules
    {
        const int mh = sepmask.h, mw = sepmask.w;
        int prev = -10;
        for (int y = 0; y < mh; ++y) {
            int run = 0;
            for (int x = 0; x < mw; ++x)
                if (sepmask.at(x, y)) ++run;
            if (run > mw * 6 / 10 && y > prev + 2) {
                band_rows.push_back(y);
                prev = y;
            }
        }
    }
    auto section_of = [&](const BlockInfo& b) {
        float cy = (b.miny + b.maxy) / 2 / p.scale;
        int s = 0;
        for (int row : band_rows)
            if (cy > (float)row) ++s;
        return s;
    };

    // block reading order: page, then vertical right->left / top->down,
    // horizontal top->down / left->right. Mixed pages: order by the
    // dominant direction of the page.
    std::vector<int> order(blocks.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = (int)i;
    int nvert = 0;
    for (auto& b : blocks) nvert += b.vertical ? 1 : 0;
    bool page_vertical = nvert * 2 > (int)blocks.size();
    std::sort(order.begin(), order.end(), [&](int a, int b) {
        int pa = page_of(blocks[a]), pb = page_of(blocks[b]);
        if (pa != pb) return pa < pb;
        if (page_vertical) {
            // columns right to left; tie-break top first
            float ra = blocks[a].maxx, rb = blocks[b].maxx;
            if (std::fabs(ra - rb) > 1) return ra > rb;
            return blocks[a].miny < blocks[b].miny;
        }
        float ta = blocks[a].miny, tb = blocks[b].miny;
        if (std::fabs(ta - tb) > 1) return ta < tb;
        return blocks[a].minx < blocks[b].minx;
    });

    // assign block ids, line idx, page, section
    int block_no = 0;
    for (int bi : order) {
        BlockInfo& b = blocks[bi];
        // line order within block
        std::sort(b.line_ids.begin(), b.line_ids.end(), [&](int u, int v) {
            if (b.vertical) return lines[u].lat > lines[v].lat;  // R -> L
            return lines[u].lat < lines[v].lat;                  // T -> D
        });
        int line_no = 0;
        for (int li : b.line_ids) {
            const Chain& c = chains[lines[li].chain];
            for (int id : c.boxes) {
                boxes[id].block = block_no;
                boxes[id].idx = line_no;
                boxes[id].page = page_of(b);
                boxes[id].section = section_of(b);
            }
            ++line_no;
        }
        ++block_no;
    }
}

}  // namespace lineengine
