// Text-line ordering engine: core types and tunables.
//
// Fresh implementation of the capability of the reference `linedetect`
// binary (/root/reference/textline_detect/): chains detected character
// boxes into text lines using the detector's textline/separator maps,
// attaches ruby (furigana), splits double lines, groups lines into blocks,
// assigns reading order (vertical: right-to-left, horizontal: top-down),
// and infers missing inter-word spaces. Same stdin/stdout binary protocol
// and threshold flags as the reference so recorded I/O is replayable.
#pragma once

#include <cstddef>
#include <cstdint>
#include <vector>

using std::size_t;

namespace lineengine {

// subtype bit flags (wire-compatible):
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
    int idx = -1;      // line index within block
    int subidx = -1;   // reading position within line
    int page = 0;
    int section = 0;
    int double_line = 0;
    double direction = 0;

    float size() const { return w > h ? w : h; }
    bool is_ruby() const { return (subtype & kRubyText) == kRubyText; }
    bool is_rubybase() const {
        return (subtype & kRubyText) == kRubyBase;
    }
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
    int page_divide = 0;
    int scale = 4;
};

// A text line under construction: ordered non-ruby box ids plus metadata.
struct Chain {
    std::vector<int> boxes;     // ordered along reading direction
    bool vertical = false;
    double size = 0;            // representative char size (image px)
    // geometry cache (image pixels)
    float x0 = 0, y0 = 0, x1 = 0, y1 = 0;   // start/end centers
    float lat = 0;                          // mean lateral coordinate
};

struct Image {
    int w = 0, h = 0;
    std::vector<float> v;
    float at(int x, int y) const {
        if (x < 0 || x >= w || y < 0 || y >= h) return 0.f;
        return v[(size_t)y * w + x];
    }
};

struct BoolImage {
    int w = 0, h = 0;
    std::vector<uint8_t> v;
    bool at(int x, int y) const {
        if (x < 0 || x >= w || y < 0 || y >= h) return false;
        return v[(size_t)y * w + x] != 0;
    }
    void set(int x, int y) {
        if (x >= 0 && x < w && y >= 0 && y < h) v[(size_t)y * w + x] = 1;
    }
};

}  // namespace lineengine
