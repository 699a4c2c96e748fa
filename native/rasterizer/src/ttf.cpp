// TrueType glyph engine implementation. Table layouts follow the OpenType
// spec; the anti-aliased rasterizer uses the signed-area accumulation
// technique (as popularized by font-rs / stb_truetype's AA rasterizers).
#include "ttf.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>

namespace ttfrast {

namespace {

uint16_t rd16(const uint8_t* p) { return (uint16_t)(p[0] << 8 | p[1]); }
int16_t rds16(const uint8_t* p) { return (int16_t)rd16(p); }
uint32_t rd32(const uint8_t* p) {
    return (uint32_t)p[0] << 24 | (uint32_t)p[1] << 16 |
           (uint32_t)p[2] << 8 | p[3];
}

constexpr double kObliqueSlant = 0.20;   // shear for synthetic italic

}  // namespace

// ---------------------------------------------------------------------
// SFNT container
// ---------------------------------------------------------------------

bool Font::open(const std::string& path, int face_index) {
    std::ifstream f(path, std::ios::binary);
    if (!f) return false;
    data_.assign(std::istreambuf_iterator<char>(f),
                 std::istreambuf_iterator<char>());
    if (data_.size() < 12) { data_.clear(); return false; }

    uint32_t base = 0;
    uint32_t tag = rd32(data_.data());
    if (tag == 0x74746366) {   // 'ttcf'
        uint32_t nfonts = rd32(data_.data() + 8);
        if (face_index < 0 || (uint32_t)face_index >= nfonts) return false;
        base = rd32(data_.data() + 12 + 4 * face_index);
        tag = rd32(data_.data() + base);
    }
    if (tag != 0x00010000 && tag != 0x74727565) {   // 'true'
        data_.clear();
        return false;                               // (no CFF support)
    }
    uint16_t num_tables = rd16(data_.data() + base + 4);
    for (uint16_t i = 0; i < num_tables; ++i) {
        const uint8_t* rec = data_.data() + base + 12 + 16 * i;
        std::string t((const char*)rec, 4);
        tables_[t] = {rd32(rec + 8), rd32(rec + 12)};
    }

    const uint8_t* head = table("head");
    if (!head) { data_.clear(); return false; }
    units_per_em_ = rd16(head + 18);
    long_loca_ = rds16(head + 50) != 0;

    const uint8_t* maxp = table("maxp");
    if (maxp) num_glyphs_ = rd16(maxp + 4);

    const uint8_t* hhea = table("hhea");
    if (hhea) {
        ascent_ = rds16(hhea + 4);
        descent_ = rds16(hhea + 6);
        num_hmetrics_ = rd16(hhea + 34);
    }
    const uint8_t* vhea = table("vhea");
    if (vhea && table("vmtx")) {
        has_vmtx_ = true;
        num_vmetrics_ = rd16(vhea + 34);
    }

    parse_cmap();
    parse_gsub();
    return true;
}

const uint8_t* Font::table(const char* tag, uint32_t* len) const {
    auto it = tables_.find(tag);
    if (it == tables_.end()) return nullptr;
    if (it->second.off + it->second.len > data_.size()) return nullptr;
    if (len) *len = it->second.len;
    return data_.data() + it->second.off;
}

// ---------------------------------------------------------------------
// cmap (formats 4 and 12)
// ---------------------------------------------------------------------

void Font::parse_cmap() {
    const uint8_t* cm = table("cmap");
    if (!cm) return;
    uint16_t n = rd16(cm + 2);
    const uint8_t* best = nullptr;
    int best_rank = -1;
    for (uint16_t i = 0; i < n; ++i) {
        uint16_t plat = rd16(cm + 4 + 8 * i);
        uint16_t enc = rd16(cm + 6 + 8 * i);
        const uint8_t* sub = cm + rd32(cm + 8 + 8 * i);
        uint16_t fmt = rd16(sub);
        int rank = -1;
        if (fmt == 12 && (plat == 3 || plat == 0)) rank = 3;
        else if (fmt == 4 && plat == 3 && enc == 1) rank = 2;
        else if (fmt == 4 && plat == 0) rank = 1;
        if (rank > best_rank) { best_rank = rank; best = sub; }
    }
    if (!best) return;
    uint16_t fmt = rd16(best);
    if (fmt == 12) {
        uint32_t groups = rd32(best + 12);
        for (uint32_t g = 0; g < groups; ++g) {
            const uint8_t* rec = best + 16 + 12 * g;
            uint32_t s = rd32(rec), e = rd32(rec + 4), gid = rd32(rec + 8);
            for (uint32_t c = s; c <= e && c - s < 0x20000; ++c)
                cmap_[c] = gid + (c - s);
        }
    } else if (fmt == 4) {
        uint16_t segx2 = rd16(best + 6);
        const uint8_t* ends = best + 14;
        const uint8_t* starts = ends + segx2 + 2;
        const uint8_t* deltas = starts + segx2;
        const uint8_t* ranges = deltas + segx2;
        for (int seg = 0; seg < segx2 / 2; ++seg) {
            uint16_t e = rd16(ends + 2 * seg);
            uint16_t s = rd16(starts + 2 * seg);
            int16_t delta = rds16(deltas + 2 * seg);
            uint16_t ro = rd16(ranges + 2 * seg);
            if (s == 0xFFFF) continue;
            for (uint32_t c = s; c <= e; ++c) {
                uint16_t gid;
                if (ro == 0) {
                    gid = (uint16_t)(c + delta);
                } else {
                    const uint8_t* p =
                        ranges + 2 * seg + ro + 2 * (c - s);
                    if (p + 1 >= data_.data() + data_.size()) continue;
                    gid = rd16(p);
                    if (gid) gid = (uint16_t)(gid + delta);
                }
                if (gid) cmap_[c] = gid;
            }
        }
    }
}

uint32_t Font::glyph_index(uint32_t cp) const {
    auto it = cmap_.find(cp);
    return it == cmap_.end() ? 0 : it->second;
}

// ---------------------------------------------------------------------
// GSUB: vert/vrt2 single substitution + liga ligatures
// ---------------------------------------------------------------------

namespace {

// glyph ids covered by a Coverage table, in coverage-index order
std::vector<uint32_t> read_coverage(const uint8_t* cov) {
    std::vector<uint32_t> out;
    uint16_t fmt = rd16(cov);
    if (fmt == 1) {
        uint16_t cnt = rd16(cov + 2);
        for (uint16_t i = 0; i < cnt; ++i)
            out.push_back(rd16(cov + 4 + 2 * i));
    } else if (fmt == 2) {
        uint16_t rc = rd16(cov + 2);
        for (uint16_t r = 0; r < rc; ++r) {
            uint16_t s = rd16(cov + 4 + 6 * r);
            uint16_t e = rd16(cov + 6 + 6 * r);
            for (uint32_t g = s; g <= e; ++g) out.push_back(g);
        }
    }
    return out;
}

}  // namespace

void Font::parse_gsub() {
    uint32_t len = 0;
    const uint8_t* gsub = table("GSUB", &len);
    if (!gsub || len < 10) return;
    uint16_t script_off = rd16(gsub + 4);
    uint16_t feature_off = rd16(gsub + 6);
    uint16_t lookup_off = rd16(gsub + 8);
    if (!script_off || !feature_off || !lookup_off) return;

    // union of feature indices over every script/langsys, like the
    // reference (render_font.cpp:80-104)
    std::vector<uint16_t> feat_idx;
    {
        const uint8_t* sl = gsub + script_off;
        uint16_t sc = rd16(sl);
        for (uint16_t i = 0; i < sc; ++i) {
            const uint8_t* script = sl + rd16(sl + 2 + 6 * i + 4);
            auto add_langsys = [&](const uint8_t* ls) {
                uint16_t fc = rd16(ls + 4);
                for (uint16_t k = 0; k < fc; ++k)
                    feat_idx.push_back(rd16(ls + 6 + 2 * k));
            };
            uint16_t dflt = rd16(script);
            if (dflt) add_langsys(script + dflt);
            uint16_t lc = rd16(script + 2);
            for (uint16_t j = 0; j < lc; ++j)
                add_langsys(script + rd16(script + 4 + 6 * j + 4));
        }
        std::sort(feat_idx.begin(), feat_idx.end());
        feat_idx.erase(std::unique(feat_idx.begin(), feat_idx.end()),
                       feat_idx.end());
    }

    // lookups referenced by vert/vrt2 and liga features
    std::vector<uint16_t> vert_lookups, liga_lookups;
    {
        const uint8_t* fl = gsub + feature_off;
        uint16_t fc = rd16(fl);
        for (uint16_t fi : feat_idx) {
            if (fi >= fc) continue;
            std::string tag((const char*)(fl + 2 + 6 * fi), 4);
            const uint8_t* feat = fl + rd16(fl + 2 + 6 * fi + 4);
            uint16_t lic = rd16(feat + 2);
            for (uint16_t j = 0; j < lic; ++j) {
                uint16_t li = rd16(feat + 4 + 2 * j);
                if (tag == "vert" || tag == "vrt2")
                    vert_lookups.push_back(li);
                else if (tag == "liga")
                    liga_lookups.push_back(li);
            }
        }
    }

    const uint8_t* ll = gsub + lookup_off;
    uint16_t lookup_count = rd16(ll);
    auto for_each_subtable = [&](uint16_t li, uint16_t want_type,
                                 auto&& fn) {
        if (li >= lookup_count) return;
        const uint8_t* lk = ll + rd16(ll + 2 + 2 * li);
        uint16_t type = rd16(lk);
        uint16_t stc = rd16(lk + 4);
        for (uint16_t s = 0; s < stc; ++s) {
            const uint8_t* st = lk + rd16(lk + 6 + 2 * s);
            uint16_t t = type;
            if (t == 7) {   // extension wrapper
                t = rd16(st + 2);
                st = st + rd32(st + 4);
            }
            if (t == want_type) fn(st);
        }
    };

    for (uint16_t li : vert_lookups) {
        for_each_subtable(li, 1, [&](const uint8_t* st) {
            uint16_t fmt = rd16(st);
            auto cov = read_coverage(st + rd16(st + 2));
            if (fmt == 1) {
                int16_t delta = rds16(st + 4);
                for (uint32_t g : cov)
                    if (!vert_map_.count(g))
                        vert_map_[g] = (uint16_t)(g + delta);
            } else if (fmt == 2) {
                uint16_t cnt = rd16(st + 4);
                for (uint16_t i = 0; i < cnt && i < cov.size(); ++i)
                    if (!vert_map_.count(cov[i]))
                        vert_map_[cov[i]] = rd16(st + 6 + 2 * i);
            }
        });
    }
    for (uint16_t li : liga_lookups) {
        for_each_subtable(li, 4, [&](const uint8_t* st) {
            if (rd16(st) != 1) return;
            auto cov = read_coverage(st + rd16(st + 2));
            uint16_t setc = rd16(st + 4);
            for (uint16_t i = 0; i < setc && i < cov.size(); ++i) {
                const uint8_t* set = st + rd16(st + 6 + 2 * i);
                uint16_t lc = rd16(set);
                for (uint16_t j = 0; j < lc; ++j) {
                    const uint8_t* lig = set + rd16(set + 2 + 2 * j);
                    uint16_t lig_glyph = rd16(lig);
                    uint16_t comp = rd16(lig + 2);
                    std::vector<uint32_t> rest;
                    for (uint16_t k = 1; k < comp; ++k)
                        rest.push_back(rd16(lig + 4 + 2 * (k - 1)));
                    liga_map_[cov[i]].emplace_back(rest, lig_glyph);
                }
            }
        });
    }
    // longest ligatures first
    for (auto& [g, v] : liga_map_) {
        std::stable_sort(v.begin(), v.end(),
                         [](const auto& a, const auto& b) {
                             return a.first.size() > b.first.size();
                         });
    }
}

uint32_t Font::vert_substitute(uint32_t gid) const {
    auto it = vert_map_.find(gid);
    return it == vert_map_.end() ? gid : it->second;
}

Font::Ligature Font::ligature_lookup(const std::vector<uint32_t>& gids,
                                     size_t i) const {
    auto it = liga_map_.find(gids[i]);
    if (it != liga_map_.end()) {
        for (const auto& [rest, lig] : it->second) {
            if (i + 1 + rest.size() > gids.size()) continue;
            if (std::equal(rest.begin(), rest.end(), gids.begin() + i + 1))
                return {lig, (int)rest.size() + 1};
        }
    }
    return {gids[i], 1};
}

// ---------------------------------------------------------------------
// glyf outlines
// ---------------------------------------------------------------------

bool Font::load_outline(uint32_t gid,
                        std::vector<std::vector<float>>& xs,
                        std::vector<std::vector<float>>& ys,
                        int depth) const {
    if (depth > 5 || (int)gid >= num_glyphs_) return false;
    uint32_t glyf_len = 0, loca_len = 0;
    const uint8_t* glyf = table("glyf", &glyf_len);
    const uint8_t* loca = table("loca", &loca_len);
    if (!glyf || !loca) return false;
    uint32_t off, end;
    if (long_loca_) {
        if ((gid + 1) * 4 + 4 > loca_len) return false;
        off = rd32(loca + 4 * gid);
        end = rd32(loca + 4 * gid + 4);
    } else {
        if ((gid + 1) * 2 + 2 > loca_len) return false;
        off = rd16(loca + 2 * gid) * 2u;
        end = rd16(loca + 2 * gid + 2) * 2u;
    }
    if (off >= end || end > glyf_len) return true;   // empty glyph
    const uint8_t* g = glyf + off;
    int16_t ncont = rds16(g);

    if (ncont >= 0) {
        // simple glyph: endpoints, flags, deltas
        std::vector<uint16_t> ends(ncont);
        for (int c = 0; c < ncont; ++c) ends[c] = rd16(g + 10 + 2 * c);
        int npts = ncont ? ends.back() + 1 : 0;
        const uint8_t* p = g + 10 + 2 * ncont;
        uint16_t ilen = rd16(p);
        p += 2 + ilen;
        std::vector<uint8_t> flags;
        flags.reserve(npts);
        while ((int)flags.size() < npts) {
            uint8_t fl = *p++;
            flags.push_back(fl);
            if (fl & 8) {   // repeat
                uint8_t rep = *p++;
                for (int r = 0; r < rep; ++r) flags.push_back(fl);
            }
        }
        std::vector<float> px(npts), py(npts);
        int v = 0;
        for (int i = 0; i < npts; ++i) {
            uint8_t fl = flags[i];
            if (fl & 2) {
                uint8_t d = *p++;
                v += (fl & 16) ? d : -d;
            } else if (!(fl & 16)) {
                v += rds16(p);
                p += 2;
            }
            px[i] = (float)v;
        }
        v = 0;
        for (int i = 0; i < npts; ++i) {
            uint8_t fl = flags[i];
            if (fl & 4) {
                uint8_t d = *p++;
                v += (fl & 32) ? d : -d;
            } else if (!(fl & 32)) {
                v += rds16(p);
                p += 2;
            }
            py[i] = (float)v;
        }

        // convert each contour's quadratic b-splines to polylines
        int start = 0;
        for (int c = 0; c < ncont; ++c) {
            int stop = ends[c];
            int n = stop - start + 1;
            if (n <= 0) { start = stop + 1; continue; }
            std::vector<float> cx, cy;
            std::vector<bool> on;
            for (int i = 0; i < n; ++i) {
                cx.push_back(px[start + i]);
                cy.push_back(py[start + i]);
                on.push_back((flags[start + i] & 1) != 0);
            }
            // ensure the contour starts on-curve (insert midpoint if not)
            if (!on[0]) {
                if (on[n - 1]) {
                    std::rotate(cx.begin(), cx.end() - 1, cx.end());
                    std::rotate(cy.begin(), cy.end() - 1, cy.end());
                    on.insert(on.begin(), true);
                    on.pop_back();
                    on[0] = true;
                } else {
                    cx.insert(cx.begin(), (cx[0] + cx[n - 1]) / 2);
                    cy.insert(cy.begin(), (cy[0] + cy[n - 1]) / 2);
                    on.insert(on.begin(), true);
                    ++n;
                }
            }
            std::vector<float> ox, oy;
            auto emit_quad = [&](float x0, float y0, float xc, float yc,
                                 float x1, float y1) {
                float dev = std::fabs(xc - (x0 + x1) / 2) +
                            std::fabs(yc - (y0 + y1) / 2);
                int steps = std::min(
                    16, 2 + (int)(std::sqrt(dev * px_size_ /
                                            units_per_em_)));
                for (int s = 1; s <= steps; ++s) {
                    float t = (float)s / steps;
                    float mt = 1 - t;
                    ox.push_back(mt * mt * x0 + 2 * mt * t * xc +
                                 t * t * x1);
                    oy.push_back(mt * mt * y0 + 2 * mt * t * yc +
                                 t * t * y1);
                }
            };
            ox.push_back(cx[0]);
            oy.push_back(cy[0]);
            float lx = cx[0], ly = cy[0];
            int i = 1;
            while (i <= n) {
                int ii = i % n;
                if (on[ii]) {
                    ox.push_back(cx[ii]);
                    oy.push_back(cy[ii]);
                    lx = cx[ii];
                    ly = cy[ii];
                    ++i;
                } else {
                    // control point; endpoint is next on-point or implied
                    float xc = cx[ii], yc = cy[ii];
                    int jj = (i + 1) % n;
                    float xe, ye;
                    if (on[jj]) {
                        xe = cx[jj];
                        ye = cy[jj];
                        i += 2;
                    } else {
                        xe = (xc + cx[jj]) / 2;
                        ye = (yc + cy[jj]) / 2;
                        ++i;
                    }
                    emit_quad(lx, ly, xc, yc, xe, ye);
                    lx = xe;
                    ly = ye;
                }
            }
            xs.push_back(std::move(ox));
            ys.push_back(std::move(oy));
            start = stop + 1;
        }
        return true;
    }

    // composite glyph
    const uint8_t* p = g + 10;
    while (true) {
        uint16_t flags = rd16(p);
        uint16_t child = rd16(p + 2);
        p += 4;
        float dx = 0, dy = 0;
        if (flags & 1) {        // words
            if (flags & 2) { dx = rds16(p); dy = rds16(p + 2); }
            p += 4;
        } else {
            if (flags & 2) { dx = (int8_t)p[0]; dy = (int8_t)p[1]; }
            p += 2;
        }
        float a = 1, b = 0, c2 = 0, d = 1;
        if (flags & 8) {        // uniform scale
            a = d = rds16(p) / 16384.f;
            p += 2;
        } else if (flags & 0x40) {   // x & y scale
            a = rds16(p) / 16384.f;
            d = rds16(p + 2) / 16384.f;
            p += 4;
        } else if (flags & 0x80) {   // 2x2
            a = rds16(p) / 16384.f;
            b = rds16(p + 2) / 16384.f;
            c2 = rds16(p + 4) / 16384.f;
            d = rds16(p + 6) / 16384.f;
            p += 8;
        }
        std::vector<std::vector<float>> cxs, cys;
        load_outline(child, cxs, cys, depth + 1);
        for (size_t k = 0; k < cxs.size(); ++k) {
            std::vector<float> tx(cxs[k].size()), ty(cys[k].size());
            for (size_t i = 0; i < cxs[k].size(); ++i) {
                tx[i] = a * cxs[k][i] + c2 * cys[k][i] + dx;
                ty[i] = b * cxs[k][i] + d * cys[k][i] + dy;
            }
            xs.push_back(std::move(tx));
            ys.push_back(std::move(ty));
        }
        if (!(flags & 0x20)) break;   // no MORE_COMPONENTS
    }
    return true;
}

// ---------------------------------------------------------------------
// metrics
// ---------------------------------------------------------------------

void Font::glyph_hmetrics(uint32_t gid, int& advance, int& lsb) const {
    advance = units_per_em_;
    lsb = 0;
    uint32_t len = 0;
    const uint8_t* hmtx = table("hmtx", &len);
    if (!hmtx || num_hmetrics_ == 0) return;
    if ((int)gid < num_hmetrics_) {
        if (4 * gid + 4 <= len) {
            advance = rd16(hmtx + 4 * gid);
            lsb = rds16(hmtx + 4 * gid + 2);
        }
    } else {
        advance = rd16(hmtx + 4 * (num_hmetrics_ - 1));
        uint32_t o = 4 * num_hmetrics_ + 2 * (gid - num_hmetrics_);
        if (o + 2 <= len) lsb = rds16(hmtx + o);
    }
}

void Font::glyph_vmetrics(uint32_t gid, int& advance, int& tsb) const {
    advance = units_per_em_;
    tsb = 0;
    if (!has_vmtx_) return;
    uint32_t len = 0;
    const uint8_t* vmtx = table("vmtx", &len);
    if (!vmtx || num_vmetrics_ == 0) return;
    if ((int)gid < num_vmetrics_) {
        if (4 * gid + 4 <= len) {
            advance = rd16(vmtx + 4 * gid);
            tsb = rds16(vmtx + 4 * gid + 2);
        }
    } else {
        advance = rd16(vmtx + 4 * (num_vmetrics_ - 1));
        uint32_t o = 4 * num_vmetrics_ + 2 * (gid - num_vmetrics_);
        if (o + 2 <= len) tsb = rds16(vmtx + o);
    }
}

// ---------------------------------------------------------------------
// rasterization: signed-area accumulation, nonzero-ish winding
// ---------------------------------------------------------------------

namespace {

// accumulate one directed segment into the coverage-delta grid
void add_line(std::vector<float>& acc, int w, int h, float x0, float y0,
              float x1, float y1) {
    if (y0 == y1) return;
    float dir = 1.f;
    if (y0 > y1) {
        std::swap(x0, x1);
        std::swap(y0, y1);
        dir = -1.f;
    }
    const float dxdy = (x1 - x0) / (y1 - y0);
    int ys = std::max(0, (int)std::floor(y0));
    int ye = std::min(h, (int)std::ceil(y1));
    for (int y = ys; y < ye; ++y) {
        float ly0 = std::max(y0, (float)y);
        float ly1 = std::min(y1, (float)(y + 1));
        if (ly1 <= ly0) continue;
        float d = dir * (ly1 - ly0);
        float sx0 = x0 + (ly0 - y0) * dxdy;
        float sx1 = x0 + (ly1 - y0) * dxdy;
        float xa = std::min(sx0, sx1), xb = std::max(sx0, sx1);
        xa = std::min(std::max(xa, 0.f), (float)w);
        xb = std::min(std::max(xb, 0.f), (float)w);
        float* row = acc.data() + (size_t)y * (w + 1);
        int xai = (int)std::floor(xa);
        int xbi = (int)std::ceil(xb);
        if (xbi <= xai + 1) {
            // one pixel column: split by subpixel center
            float xm = 0.5f * (xa + xb) - xai;
            row[xai] += d * (1 - xm);
            if (xai + 1 <= w) row[xai + 1] += d * xm;
        } else {
            float inv = 1.f / (xb - xa);
            float xaf = xa - xai;
            float a0 = 0.5f * inv * (1 - xaf) * (1 - xaf);
            float xbf = xb - xbi + 1;
            float am = 0.5f * inv * xbf * xbf;
            row[xai] += d * a0;
            if (xbi == xai + 2) {
                row[xai + 1] += d * (1 - a0 - am);
            } else {
                float a1 = inv * (1.5f - xaf);
                row[xai + 1] += d * (a1 - a0);
                for (int xi = xai + 2; xi < xbi - 1; ++xi)
                    row[xi] += d * inv;
                float a2 = a1 + (xbi - xai - 3) * inv;
                row[xbi - 1] += d * (1 - a2 - am);
            }
            if (xbi <= w) row[xbi] += d * am;
        }
    }
}

}  // namespace

bool Font::render(uint32_t gid, GlyphBitmap& out) const {
    out = GlyphBitmap();
    int adv_u, lsb_u;
    glyph_hmetrics(gid, adv_u, lsb_u);
    const double scale = px_size_ / units_per_em_;
    out.hori_advance = (int32_t)std::lround(adv_u * scale * 64);

    std::vector<std::vector<float>> xs, ys;
    if (!load_outline(gid, xs, ys, 0)) return false;

    // style transforms in font units
    if (italic_) {
        for (size_t c = 0; c < xs.size(); ++c)
            for (size_t i = 0; i < xs[c].size(); ++i)
                xs[c][i] += (float)(kObliqueSlant * ys[c][i]);
    }

    // ink bounds in pixel space
    float minx = 1e30f, maxx = -1e30f, miny = 1e30f, maxy = -1e30f;
    for (size_t c = 0; c < xs.size(); ++c) {
        for (size_t i = 0; i < xs[c].size(); ++i) {
            minx = std::min(minx, xs[c][i]);
            maxx = std::max(maxx, xs[c][i]);
            miny = std::min(miny, ys[c][i]);
            maxy = std::max(maxy, ys[c][i]);
        }
    }
    int vadv_u, tsb_u;
    glyph_vmetrics(gid, vadv_u, tsb_u);

    if (minx > maxx) {
        // no ink (space): advance-only glyph
        out.vert_advance = (int32_t)std::lround(
            (has_vmtx_ ? vadv_u : units_per_em_) * scale * 64);
        return true;
    }

    const int emb = bold_ ? std::max(1, (int)std::lround(px_size_ / 24))
                          : 0;
    int ix0 = (int)std::floor(minx * scale);
    int ix1 = (int)std::ceil(maxx * scale) + emb;
    int iy0 = (int)std::floor(miny * scale);
    int iy1 = (int)std::ceil(maxy * scale) + emb;
    int w = ix1 - ix0, h = iy1 - iy0;
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return false;

    std::vector<float> acc((size_t)h * (w + 1), 0.f);
    for (size_t c = 0; c < xs.size(); ++c) {
        size_t n = xs[c].size();
        for (size_t i = 0; i < n; ++i) {
            size_t j = (i + 1) % n;
            add_line(acc, w, h,
                     (float)(xs[c][i] * scale - ix0),
                     (float)(iy1 - ys[c][i] * scale),
                     (float)(xs[c][j] * scale - ix0),
                     (float)(iy1 - ys[c][j] * scale));
        }
    }
    out.rows = h;
    out.width = w;
    out.pixels.assign((size_t)h * w, 0);
    for (int y = 0; y < h; ++y) {
        float cov = 0;
        const float* row = acc.data() + (size_t)y * (w + 1);
        for (int x = 0; x < w; ++x) {
            cov += row[x];
            int v = (int)std::lround(std::fabs(cov) * 255.f);
            out.pixels[(size_t)y * w + x] = (uint8_t)std::min(v, 255);
        }
    }
    if (emb > 0) {
        // synthetic embolden: dilate by `emb` pixels in both axes
        std::vector<uint8_t> d = out.pixels;
        for (int y = 0; y < h; ++y)
            for (int x = 0; x < w; ++x) {
                uint8_t m = 0;
                for (int k = 0; k <= emb; ++k) {
                    if (x - k >= 0)
                        m = std::max(m, out.pixels[(size_t)y * w + x - k]);
                    if (y - k >= 0)
                        m = std::max(m, out.pixels[(size_t)(y - k) * w + x]);
                }
                d[(size_t)y * w + x] = m;
            }
        out.pixels.swap(d);
        out.hori_advance += emb * 64;
    }

    out.bound_w = w * 64;
    out.bound_h = h * 64;
    out.hori_bearing_x = ix0 * 64;
    out.hori_bearing_y = iy1 * 64;
    if (has_vmtx_) {
        out.vert_advance = (int32_t)std::lround(vadv_u * scale * 64);
        out.vert_bearing_y = (int32_t)std::lround(tsb_u * scale * 64);
    } else {
        out.vert_advance = (int32_t)std::lround(
            units_per_em_ * scale * 64);
        out.vert_bearing_y = (out.vert_advance - out.bound_h) / 2;
    }
    out.vert_bearing_x = out.hori_bearing_x - out.hori_advance / 2;
    return true;
}

}  // namespace ttfrast
