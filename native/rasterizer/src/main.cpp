// glyphserver: subprocess glyph rasterizer, wire-compatible with the
// reference render_font binary
// (/root/reference/make_traindata/render_font/render_font.cpp:519-596):
//   argv: font_path size type   (type bit0 = italic, bit1 = bold)
//   stdin: u32 UTF-32 codepoints; 0 flushes the batch
//   stdout per glyph: u32 liga_count (source chars consumed),
//     u32 rows, u32 width, i32 bound_w, bound_h, bearing_x, bearing_y,
//     advance, bitmap bytes; then the vertical variant block
//     (rows, width, bound_w, bound_h, vert_bearing_x, vert_bearing_y,
//     vert_advance, bitmap). Unmapped codepoints emit a zero horizontal
//     header only; empty bitmaps omit the vertical block, matching the
//     reference (:388-397, :467-484).
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "ttf.h"

using namespace ttfrast;

static void write_block(const GlyphBitmap& g, bool vertical) {
    fwrite(&g.rows, 4, 1, stdout);
    fwrite(&g.width, 4, 1, stdout);
    fwrite(&g.bound_w, 4, 1, stdout);
    fwrite(&g.bound_h, 4, 1, stdout);
    if (vertical) {
        fwrite(&g.vert_bearing_x, 4, 1, stdout);
        fwrite(&g.vert_bearing_y, 4, 1, stdout);
        fwrite(&g.vert_advance, 4, 1, stdout);
    } else {
        fwrite(&g.hori_bearing_x, 4, 1, stdout);
        fwrite(&g.hori_bearing_y, 4, 1, stdout);
        fwrite(&g.hori_advance, 4, 1, stdout);
    }
    if (g.rows * g.width != 0)
        fwrite(g.pixels.data(), 1, g.pixels.size(), stdout);
}

static int emit_glyph(Font& font, uint32_t consumed, uint32_t gid) {
    fwrite(&consumed, 4, 1, stdout);
    GlyphBitmap g;
    if (!font.render(gid, g)) return 1;
    write_block(g, false);
    if (g.rows * g.width == 0) return 0;   // no vertical block when empty
    uint32_t vgid = font.vert_substitute(gid);
    if (consumed == 1 && vgid != gid) {
        GlyphBitmap vg;
        if (!font.render(vgid, vg)) return 1;
        write_block(vg, true);
    } else {
        write_block(g, true);
    }
    return 0;
}

int main(int argc, char** argv) {
    if (argc < 4) {
        fprintf(stderr, "Usage: %s font_path size type\n", argv[0]);
        return 0;
    }
    Font font;
    if (!font.open(argv[1])) {
        fprintf(stderr, "cannot open font %s\n", argv[1]);
        return 1;
    }
    font.set_pixel_size(atof(argv[2]));
    int t = atoi(argv[3]);
    font.set_style((t & 2) == 2, (t & 1) == 1);

    std::vector<uint32_t> gids;
    auto flush = [&]() -> int {
        size_t i = 0;
        while (i < gids.size()) {
            if (gids[i] == 0) {
                // unmapped: zero horizontal header, no vertical block
                uint32_t one = 1, z = 0;
                fwrite(&one, 4, 1, stdout);
                for (int k = 0; k < 7; ++k) fwrite(&z, 4, 1, stdout);
                ++i;
                continue;
            }
            Font::Ligature lig = font.ligature_lookup(gids, i);
            if (emit_glyph(font, (uint32_t)lig.consumed, lig.glyph) != 0)
                return 1;
            i += lig.consumed;
        }
        fflush(stdout);
        gids.clear();
        return 0;
    };

    uint32_t cp = 0;
    while (fread(&cp, 4, 1, stdin) == 1) {
        if (cp == 0) {
            if (flush() != 0) return 1;
        } else {
            gids.push_back(font.glyph_index(cp));
        }
    }
    return flush();
}
