// Text-line ordering engine: core types and tunables.
//
// Fresh implementation of the capability of the reference `linedetect`
// binary (/root/reference/textline_detect/): chains detected character
// boxes into text lines using the detector's textline/separator maps,
// attaches ruby (furigana), splits double lines, groups lines into blocks
// and column sections, assigns reading order (vertical: right-to-left,
// horizontal: top-down), and infers missing inter-word spaces. Same
// stdin/stdout binary protocol and threshold flags as the reference so
// recorded I/O is replayable and outputs are comparable row-for-row.
#pragma once

#define _USE_MATH_DEFINES
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <vector>

using std::size_t;

namespace lineengine {

// subtype bit flags (wire-compatible, reference line_detect.h:8):
//   1: vertical, 2: rubybase, 2|4: ruby text, 8: space, 16: emphasis,
//   32: lone ruby, 512: tab split
enum SubtypeBits : int {
    kVertical = 1,
    kRubyBase = 2,
    kRubyText = 2 | 4,
    kSpace = 8,
    kEmphasis = 16,
    kLoneRuby = 32,
    kTabSplit = 512,
};

struct Box {
    int id = -1;
    float cx = 0, cy = 0, w = 0, h = 0;   // image pixels
    float code1 = 0, code2 = 0, code4 = 0, code8 = 0;
    int subtype = 0;
    // assigned by the engine:
    int block = -1;
    int idx = -1;      // chain id during processing; line index at output
    int subidx = -1;   // reading position within line
    int page = 0;
    int section = 0;
    int double_line = 0;   // 1/2: first/second row of an in-line split
    double direction = 0;  // radians; |d| < pi/4 means horizontal

    bool is_ruby() const { return (subtype & kRubyText) == kRubyText; }
    bool is_rubybase() const { return (subtype & kRubyText) == kRubyBase; }
    bool horizontal() const { return std::fabs(direction) < M_PI_4; }
};

struct Params {
    double ruby_cutoff = 0.25;
    double rubybase_cutoff = 0.75;
    double space_cutoff = 0.5;
    double emphasis_cutoff = 0.5;
    float line_valueth = 0.4f;
    float sep_valueth = 0.1f;
    float sep_valueth2 = 0.15f;
    float sep_clusterth = 10.0f;
    double allowwidth_next_block = 1.5;
    double allow_sizediff = 0.5;
    double chain_line_ratio = 0.0;   // <=0 disables forced chaining
    int page_divide = 0;
    int scale = 4;
};

// Everything a pipeline stage needs besides the boxes: the 1/scale map
// dimensions, the run mode (0: both directions, 1: horizontal only,
// 2: vertical only, 3/4: prefer h/v for ambiguous short chains) and the
// tunables. Replaces the reference's file-scope globals.
struct Context {
    int w = 0, h = 0;       // map (1/scale) dimensions
    int run_mode = 0;
    Params p;

    bool inside(int x, int y) const {
        return x >= 0 && x < w && y >= 0 && y < h;
    }
    size_t at(int x, int y) const { return (size_t)y * w + x; }
};

// A chain is an ordered list of box ids forming one text line.
using Chains = std::vector<std::vector<int>>;

}  // namespace lineengine
