// C ABI for in-process use from python (ctypes).
#include <cstdint>
#include <cstring>
#include <memory>

#include "ttf.h"

using namespace ttfrast;

extern "C" {

void* rast_open(const char* path, double px_size, int bold, int italic,
                int face_index) {
    auto* f = new Font();
    if (!f->open(path, face_index)) {
        delete f;
        return nullptr;
    }
    f->set_pixel_size(px_size);
    f->set_style(bold != 0, italic != 0);
    return f;
}

void rast_close(void* h) { delete (Font*)h; }

int rast_units_per_em(void* h) { return ((Font*)h)->units_per_em(); }
int rast_ascent(void* h) { return ((Font*)h)->ascent(); }
int rast_descent(void* h) { return ((Font*)h)->descent(); }

int rast_has_glyph(void* h, uint32_t cp) {
    return ((Font*)h)->glyph_index(cp) != 0;
}

int rast_has_vert(void* h, uint32_t cp) {
    Font* f = (Font*)h;
    return f->has_vert_substitute(f->glyph_index(cp));
}

// Render `cp`; vertical applies the GSUB vert/vrt2 substitute when one
// exists. metrics9 = rows, width, bound_w, bound_h, hori_bearing_x,
// hori_bearing_y, hori_advance, vert_bearing_{x,y}, vert_advance is
// metrics10[9]. Bitmap bytes go into buf (caller-sized); returns the
// byte count needed, or -1 on failure (call again with a bigger buffer
// if the return exceeds buf_size; metrics are always filled).
int rast_glyph(void* h, uint32_t cp, int vertical, int32_t* metrics10,
               uint8_t* buf, int buf_size) {
    Font* f = (Font*)h;
    uint32_t gid = f->glyph_index(cp);
    if (gid == 0) return -1;
    if (vertical) gid = f->vert_substitute(gid);
    GlyphBitmap g;
    if (!f->render(gid, g)) return -1;
    metrics10[0] = (int32_t)g.rows;
    metrics10[1] = (int32_t)g.width;
    metrics10[2] = g.bound_w;
    metrics10[3] = g.bound_h;
    metrics10[4] = g.hori_bearing_x;
    metrics10[5] = g.hori_bearing_y;
    metrics10[6] = g.hori_advance;
    metrics10[7] = g.vert_bearing_x;
    metrics10[8] = g.vert_bearing_y;
    metrics10[9] = g.vert_advance;
    int need = (int)g.pixels.size();
    if (need <= buf_size && need > 0)
        std::memcpy(buf, g.pixels.data(), need);
    return need;
}

}  // extern "C"
