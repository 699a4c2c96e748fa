// Self-contained TrueType/OpenType glyph engine: SFNT/cmap/glyf parsing,
// CFF (Type2 charstrings, incl. CID-keyed FDArray/FDSelect — most
// Japanese OTF fonts), GSUB `vert`/`vrt2` vertical substitution and
// `liga` ligatures, outline flattening and an anti-aliased signed-area
// rasterizer, plus synthetic oblique/embolden.
//
// Native counterpart of the reference's FreeType subprocess
// (/root/reference/make_traindata/render_font/render_font.cpp:48-596)
// with the same glyph bitmap + 26.6 fixed-point metrics contract; built
// without FreeType (this image ships no dev headers), so the outline and
// raster pipeline is implemented from the OpenType spec directly.
#pragma once

#include <cstdint>
#include <map>
#include <string>
#include <vector>

namespace ttfrast {

struct GlyphBitmap {
    uint32_t rows = 0, width = 0;
    std::vector<uint8_t> pixels;       // rows * width, 0..255 alpha
    // 26.6 fixed-point metrics, FreeType-layout-compatible
    int32_t bound_w = 0, bound_h = 0;
    int32_t hori_bearing_x = 0, hori_bearing_y = 0, hori_advance = 0;
    int32_t vert_bearing_x = 0, vert_bearing_y = 0, vert_advance = 0;
};

class Font {
public:
    bool open(const std::string& path, int face_index = 0);
    void set_pixel_size(double px) { px_size_ = px; }
    void set_style(bool bold, bool italic) { bold_ = bold; italic_ = italic; }

    uint32_t glyph_index(uint32_t codepoint) const;
    // GSUB vert/vrt2 single substitution; returns gid when unmapped
    uint32_t vert_substitute(uint32_t gid) const;
    bool has_vert_substitute(uint32_t gid) const {
        return vert_map_.count(gid) > 0;
    }
    // longest GSUB ligature starting at gids[i]; consumed==1 means none
    struct Ligature { uint32_t glyph; int consumed; };
    Ligature ligature_lookup(const std::vector<uint32_t>& gids,
                             size_t i) const;

    bool render(uint32_t gid, GlyphBitmap& out) const;

    int units_per_em() const { return units_per_em_; }
    int ascent() const { return ascent_; }
    int descent() const { return descent_; }
    bool ok() const { return !data_.empty(); }

private:
    struct Table { uint32_t off = 0, len = 0; };
    const uint8_t* table(const char* tag, uint32_t* len = nullptr) const;

    void parse_cmap();
    void parse_gsub();
    bool parse_cff();
    bool load_outline(uint32_t gid, std::vector<std::vector<float>>& xs,
                      std::vector<std::vector<float>>& ys, int depth) const;
    bool load_outline_cff(uint32_t gid,
                          std::vector<std::vector<float>>& xs,
                          std::vector<std::vector<float>>& ys) const;
    void glyph_hmetrics(uint32_t gid, int& advance, int& lsb) const;
    void glyph_vmetrics(uint32_t gid, int& advance, int& tsb) const;

    std::vector<uint8_t> data_;
    std::map<std::string, Table> tables_;
    std::map<uint32_t, uint32_t> cmap_;
    std::map<uint32_t, uint32_t> vert_map_;
    // first gid -> list of (component gids, ligature gid), longest first
    std::map<uint32_t, std::vector<std::pair<std::vector<uint32_t>,
                                             uint32_t>>> liga_map_;
    int units_per_em_ = 1000;
    int ascent_ = 800, descent_ = -200;
    int num_glyphs_ = 0, num_hmetrics_ = 0, num_vmetrics_ = 0;
    bool long_loca_ = false;
    bool has_vmtx_ = false;
    // CFF ('OTTO') state: offsets into data_ for the charstring INDEX and
    // subr INDEXes; per-FD local subrs for CID-keyed fonts.
    bool is_cff_ = false;
    struct CffIndex {
        std::vector<uint32_t> offs;      // absolute offsets into data_,
                                         // count()+1 entries
        size_t count() const { return offs.empty() ? 0 : offs.size() - 1; }
    };
    CffIndex cff_charstrings_, cff_gsubrs_;
    std::vector<CffIndex> cff_lsubrs_;   // one per FD (single entry when
                                         // the font is not CID-keyed)
    std::vector<uint8_t> cff_fdselect_;  // gid -> FD index; empty => FD 0
    double px_size_ = 16.0;
    bool bold_ = false, italic_ = false;
};

}  // namespace ttfrast
