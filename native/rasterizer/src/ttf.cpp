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

    // All file-internal offsets are validated against data_.size():
    // locally installed fonts can still be truncated or corrupt, and an
    // unchecked table walk would read out of bounds.
    uint32_t base = 0;
    uint32_t tag = rd32(data_.data());
    if (tag == 0x74746366) {   // 'ttcf'
        uint32_t nfonts = rd32(data_.data() + 8);
        if (face_index < 0 || (uint32_t)face_index >= nfonts) return false;
        if (12 + 4 * (size_t)face_index + 4 > data_.size()) return false;
        base = rd32(data_.data() + 12 + 4 * face_index);
        if ((size_t)base + 12 > data_.size()) { data_.clear(); return false; }
        tag = rd32(data_.data() + base);
    }
    if (tag != 0x00010000 && tag != 0x74727565 &&   // 'true'
        tag != 0x4F54544F) {                        // 'OTTO' (CFF)
        data_.clear();
        return false;
    }
    uint16_t num_tables = rd16(data_.data() + base + 4);
    if ((size_t)base + 12 + 16 * (size_t)num_tables > data_.size()) {
        data_.clear();
        return false;
    }
    for (uint16_t i = 0; i < num_tables; ++i) {
        const uint8_t* rec = data_.data() + base + 12 + 16 * i;
        std::string t((const char*)rec, 4);
        uint32_t off = rd32(rec + 8), len = rd32(rec + 12);
        if ((uint64_t)off + len > data_.size()) continue;   // bad record
        tables_[t] = {off, len};
    }

    uint32_t head_len = 0;
    const uint8_t* head = table("head", &head_len);
    if (!head || head_len < 52) { data_.clear(); return false; }
    units_per_em_ = rd16(head + 18);
    if (units_per_em_ == 0) units_per_em_ = 1000;
    long_loca_ = rds16(head + 50) != 0;

    uint32_t maxp_len = 0;
    const uint8_t* maxp = table("maxp", &maxp_len);
    if (maxp && maxp_len >= 6) num_glyphs_ = rd16(maxp + 4);

    uint32_t hhea_len = 0;
    const uint8_t* hhea = table("hhea", &hhea_len);
    if (hhea && hhea_len >= 36) {
        ascent_ = rds16(hhea + 4);
        descent_ = rds16(hhea + 6);
        num_hmetrics_ = rd16(hhea + 34);
    }
    uint32_t vhea_len = 0;
    const uint8_t* vhea = table("vhea", &vhea_len);
    if (vhea && vhea_len >= 36 && table("vmtx")) {
        has_vmtx_ = true;
        num_vmetrics_ = rd16(vhea + 34);
    }
    if (tag == 0x4F54544F) {
        is_cff_ = parse_cff();
        if (!is_cff_) { data_.clear(); return false; }
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
    uint32_t cm_len = 0;
    const uint8_t* cm = table("cmap", &cm_len);
    if (!cm || cm_len < 4) return;
    uint16_t n = rd16(cm + 2);
    if (4 + 8 * (size_t)n > cm_len) return;
    const uint8_t* best = nullptr;
    int best_rank = -1;
    for (uint16_t i = 0; i < n; ++i) {
        uint16_t plat = rd16(cm + 4 + 8 * i);
        uint16_t enc = rd16(cm + 6 + 8 * i);
        uint32_t sub_off = rd32(cm + 8 + 8 * i);
        if ((size_t)sub_off + 16 > cm_len) continue;
        const uint8_t* sub = cm + sub_off;
        uint16_t fmt = rd16(sub);
        int rank = -1;
        if (fmt == 12 && (plat == 3 || plat == 0)) rank = 3;
        else if (fmt == 4 && plat == 3 && enc == 1) rank = 2;
        else if (fmt == 4 && plat == 0) rank = 1;
        if (rank > best_rank) { best_rank = rank; best = sub; }
    }
    if (!best) return;
    size_t avail = cm_len - (size_t)(best - cm);
    uint16_t fmt = rd16(best);
    if (fmt == 12) {
        uint32_t groups = rd32(best + 12);
        if (16 + 12 * (uint64_t)groups > avail)
            groups = avail > 16 ? (uint32_t)((avail - 16) / 12) : 0;
        for (uint32_t g = 0; g < groups; ++g) {
            const uint8_t* rec = best + 16 + 12 * g;
            uint32_t s = rd32(rec), e = rd32(rec + 4), gid = rd32(rec + 8);
            for (uint32_t c = s; c <= e && c - s < 0x20000; ++c)
                cmap_[c] = gid + (c - s);
        }
    } else if (fmt == 4) {
        uint16_t segx2 = rd16(best + 6);
        if (14 + 4 * (size_t)segx2 + 2 > avail) return;
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

// glyph ids covered by a Coverage table, in coverage-index order;
// `end` bounds every read (corrupt GSUB offsets must not walk off the
// table)
std::vector<uint32_t> read_coverage(const uint8_t* cov,
                                    const uint8_t* end) {
    std::vector<uint32_t> out;
    if (cov + 4 > end) return out;
    uint16_t fmt = rd16(cov);
    if (fmt == 1) {
        uint16_t cnt = rd16(cov + 2);
        if (cov + 4 + 2 * (size_t)cnt > end) return out;
        for (uint16_t i = 0; i < cnt; ++i)
            out.push_back(rd16(cov + 4 + 2 * i));
    } else if (fmt == 2) {
        uint16_t rc = rd16(cov + 2);
        if (cov + 4 + 6 * (size_t)rc > end) return out;
        for (uint16_t r = 0; r < rc; ++r) {
            uint16_t s = rd16(cov + 4 + 6 * r);
            uint16_t e = rd16(cov + 6 + 6 * r);
            if (e < s || (uint32_t)e - s > 65535) continue;
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
    const uint8_t* gend = gsub + len;
    auto ok = [&](const uint8_t* p, size_t n) {
        return p >= gsub && p + n <= gend;
    };

    // union of feature indices over every script/langsys, like the
    // reference (render_font.cpp:80-104)
    std::vector<uint16_t> feat_idx;
    {
        const uint8_t* sl = gsub + script_off;
        if (!ok(sl, 2)) return;
        uint16_t sc = rd16(sl);
        if (!ok(sl, 2 + 6 * (size_t)sc)) return;
        for (uint16_t i = 0; i < sc; ++i) {
            const uint8_t* script = sl + rd16(sl + 2 + 6 * i + 4);
            if (!ok(script, 4)) continue;
            auto add_langsys = [&](const uint8_t* ls) {
                if (!ok(ls, 6)) return;
                uint16_t fc = rd16(ls + 4);
                if (!ok(ls, 6 + 2 * (size_t)fc)) return;
                for (uint16_t k = 0; k < fc; ++k)
                    feat_idx.push_back(rd16(ls + 6 + 2 * k));
            };
            uint16_t dflt = rd16(script);
            if (dflt) add_langsys(script + dflt);
            uint16_t lc = rd16(script + 2);
            if (!ok(script, 4 + 6 * (size_t)lc)) continue;
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
        if (!ok(fl, 2)) return;
        uint16_t fc = rd16(fl);
        if (!ok(fl, 2 + 6 * (size_t)fc)) return;
        for (uint16_t fi : feat_idx) {
            if (fi >= fc) continue;
            std::string tag((const char*)(fl + 2 + 6 * fi), 4);
            const uint8_t* feat = fl + rd16(fl + 2 + 6 * fi + 4);
            if (!ok(feat, 4)) continue;
            uint16_t lic = rd16(feat + 2);
            if (!ok(feat, 4 + 2 * (size_t)lic)) continue;
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
    if (!ok(ll, 2)) return;
    uint16_t lookup_count = rd16(ll);
    if (!ok(ll, 2 + 2 * (size_t)lookup_count)) return;
    auto for_each_subtable = [&](uint16_t li, uint16_t want_type,
                                 auto&& fn) {
        if (li >= lookup_count) return;
        const uint8_t* lk = ll + rd16(ll + 2 + 2 * li);
        if (!ok(lk, 6)) return;
        uint16_t type = rd16(lk);
        uint16_t stc = rd16(lk + 4);
        if (!ok(lk, 6 + 2 * (size_t)stc)) return;
        for (uint16_t s = 0; s < stc; ++s) {
            const uint8_t* st = lk + rd16(lk + 6 + 2 * s);
            uint16_t t = type;
            if (t == 7) {   // extension wrapper
                if (!ok(st, 8)) continue;
                t = rd16(st + 2);
                st = st + rd32(st + 4);
            }
            if (!ok(st, 6)) continue;
            if (t == want_type) fn(st);
        }
    };

    for (uint16_t li : vert_lookups) {
        for_each_subtable(li, 1, [&](const uint8_t* st) {
            uint16_t fmt = rd16(st);
            auto cov = read_coverage(st + rd16(st + 2), gend);
            if (fmt == 1) {
                int16_t delta = rds16(st + 4);
                for (uint32_t g : cov)
                    if (!vert_map_.count(g))
                        vert_map_[g] = (uint16_t)(g + delta);
            } else if (fmt == 2) {
                uint16_t cnt = rd16(st + 4);
                if (!ok(st, 6 + 2 * (size_t)cnt)) return;
                for (uint16_t i = 0; i < cnt && i < cov.size(); ++i)
                    if (!vert_map_.count(cov[i]))
                        vert_map_[cov[i]] = rd16(st + 6 + 2 * i);
            }
        });
    }
    for (uint16_t li : liga_lookups) {
        for_each_subtable(li, 4, [&](const uint8_t* st) {
            if (rd16(st) != 1) return;
            auto cov = read_coverage(st + rd16(st + 2), gend);
            uint16_t setc = rd16(st + 4);
            if (!ok(st, 6 + 2 * (size_t)setc)) return;
            for (uint16_t i = 0; i < setc && i < cov.size(); ++i) {
                const uint8_t* set = st + rd16(st + 6 + 2 * i);
                if (!ok(set, 2)) continue;
                uint16_t lc = rd16(set);
                if (!ok(set, 2 + 2 * (size_t)lc)) continue;
                for (uint16_t j = 0; j < lc; ++j) {
                    const uint8_t* lig = set + rd16(set + 2 + 2 * j);
                    if (!ok(lig, 4)) continue;
                    uint16_t lig_glyph = rd16(lig);
                    uint16_t comp = rd16(lig + 2);
                    if (!ok(lig, 4 + 2 * (size_t)(comp ? comp - 1 : 0)))
                        continue;
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
// CFF: Type2 charstrings (OpenType 'OTTO' fonts, incl. CID-keyed).
// The reference renders these through FreeType (render_font.cpp); this
// engine parses the CFF table directly per Adobe TN#5176/5177.
// ---------------------------------------------------------------------

namespace {

// Parse a CFF INDEX at absolute offset `pos`; fills `offs` with count+1
// absolute data offsets. Returns the offset just past the INDEX, or 0 on
// malformed structure (every offset is validated against the file size).
size_t parse_cff_index(const std::vector<uint8_t>& data, size_t pos,
                       std::vector<uint32_t>& offs) {
    offs.clear();
    if (pos + 2 > data.size()) return 0;
    uint16_t count = rd16(&data[pos]);
    if (count == 0) return pos + 2;
    if (pos + 3 > data.size()) return 0;
    uint8_t osz = data[pos + 2];
    if (osz < 1 || osz > 4) return 0;
    size_t op = pos + 3;
    if (op + (size_t)(count + 1) * osz > data.size()) return 0;
    size_t dstart = op + (size_t)(count + 1) * osz - 1;  // offsets 1-based
    offs.resize(count + 1);
    for (size_t i = 0; i <= count; ++i) {
        uint32_t v = 0;
        for (int b = 0; b < osz; ++b)
            v = (v << 8) | data[op + i * osz + b];
        uint64_t abs_off = (uint64_t)dstart + v;
        if (abs_off > data.size()) { offs.clear(); return 0; }
        offs[i] = (uint32_t)abs_off;
    }
    for (size_t i = 0; i < count; ++i)
        if (offs[i] > offs[i + 1]) { offs.clear(); return 0; }
    return offs[count];
}

// DICT: operator (two-byte ops encoded as 1200+b1) -> operand list
void parse_cff_dict(const uint8_t* p, const uint8_t* end,
                    std::map<int, std::vector<double>>& out) {
    std::vector<double> stack;
    while (p < end) {
        uint8_t b0 = *p;
        if (b0 <= 21) {
            int op = b0;
            ++p;
            if (b0 == 12) {
                if (p >= end) break;
                op = 1200 + *p++;
            }
            out[op] = stack;
            stack.clear();
        } else if (b0 == 28) {
            if (p + 3 > end) break;
            stack.push_back((double)(int16_t)(p[1] << 8 | p[2]));
            p += 3;
        } else if (b0 == 29) {
            if (p + 5 > end) break;
            stack.push_back((double)(int32_t)rd32(p + 1));
            p += 5;
        } else if (b0 == 30) {     // real number, BCD nibbles
            ++p;
            std::string s;
            bool done = false;
            while (p < end && !done) {
                uint8_t b = *p++;
                for (int half = 0; half < 2; ++half) {
                    uint8_t nib = half ? (b & 0xF) : (b >> 4);
                    if (nib <= 9) s += char('0' + nib);
                    else if (nib == 0xa) s += '.';
                    else if (nib == 0xb) s += 'E';
                    else if (nib == 0xc) s += "E-";
                    else if (nib == 0xe) s += '-';
                    else if (nib == 0xf) { done = true; break; }
                }
            }
            stack.push_back(s.empty() ? 0.0 : atof(s.c_str()));
        } else if (b0 >= 32 && b0 <= 246) {
            stack.push_back((double)b0 - 139);
            ++p;
        } else if (b0 >= 247 && b0 <= 250) {
            if (p + 2 > end) break;
            stack.push_back((b0 - 247) * 256.0 + p[1] + 108);
            p += 2;
        } else if (b0 >= 251 && b0 <= 254) {
            if (p + 2 > end) break;
            stack.push_back(-(b0 - 251) * 256.0 - p[1] - 108);
            p += 2;
        } else {
            ++p;   // reserved
        }
    }
}

int cff_subr_bias(size_t n) {
    return n < 1240 ? 107 : n < 33900 ? 1131 : 32768;
}

}  // namespace

bool Font::parse_cff() {
    uint32_t len = 0;
    const uint8_t* cff = table("CFF ", &len);
    if (!cff || len < 4) return false;
    size_t base = (size_t)(cff - data_.data());
    uint8_t hdr_size = cff[2];
    size_t pos = base + hdr_size;
    std::vector<uint32_t> tmp;
    pos = parse_cff_index(data_, pos, tmp);                // Name INDEX
    if (!pos) return false;
    std::vector<uint32_t> topdicts;
    pos = parse_cff_index(data_, pos, topdicts);           // Top DICTs
    if (!pos || topdicts.size() < 2) return false;
    pos = parse_cff_index(data_, pos, tmp);                // String INDEX
    if (!pos) return false;
    if (!parse_cff_index(data_, pos, cff_gsubrs_.offs))    // Global subrs
        return false;

    std::map<int, std::vector<double>> top;
    parse_cff_dict(data_.data() + topdicts[0],
                   data_.data() + topdicts[1], top);
    auto cs = top.find(17);                                // CharStrings
    if (cs == top.end() || cs->second.empty()) return false;
    if (!parse_cff_index(data_, base + (size_t)cs->second[0],
                         cff_charstrings_.offs))
        return false;
    if (num_glyphs_ == 0)
        num_glyphs_ = (int)cff_charstrings_.count();

    auto load_private = [&](const std::map<int, std::vector<double>>& d,
                            CffIndex& lsubrs) {
        auto pit = d.find(18);                             // Private
        if (pit == d.end() || pit->second.size() < 2) return;
        size_t psz = (size_t)pit->second[0];
        size_t poff = base + (size_t)pit->second[1];
        if (poff + psz > data_.size()) return;
        std::map<int, std::vector<double>> priv;
        parse_cff_dict(data_.data() + poff,
                       data_.data() + poff + psz, priv);
        auto sit = priv.find(19);                          // local Subrs
        if (sit != priv.end() && !sit->second.empty())
            parse_cff_index(data_, poff + (size_t)sit->second[0],
                            lsubrs.offs);
    };

    if (top.count(1230)) {    // ROS => CID-keyed (typical Japanese OTF)
        auto fa = top.find(1236);                          // FDArray
        auto fs = top.find(1237);                          // FDSelect
        if (fa == top.end() || fa->second.empty()) return false;
        std::vector<uint32_t> fdd;
        if (!parse_cff_index(data_, base + (size_t)fa->second[0], fdd) ||
            fdd.size() < 2)
            return false;
        size_t nfd = fdd.size() - 1;
        cff_lsubrs_.resize(nfd);
        for (size_t f = 0; f < nfd; ++f) {
            std::map<int, std::vector<double>> fd;
            parse_cff_dict(data_.data() + fdd[f],
                           data_.data() + fdd[f + 1], fd);
            load_private(fd, cff_lsubrs_[f]);
        }
        cff_fdselect_.assign(num_glyphs_, 0);
        if (fs != top.end() && !fs->second.empty()) {
            size_t o = base + (size_t)fs->second[0];
            if (o < data_.size()) {
                uint8_t fmt = data_[o];
                if (fmt == 0 &&
                    o + 1 + (size_t)num_glyphs_ <= data_.size()) {
                    for (int g = 0; g < num_glyphs_; ++g)
                        cff_fdselect_[g] = data_[o + 1 + g];
                } else if (fmt == 3 && o + 5 <= data_.size()) {
                    uint16_t nr = rd16(&data_[o + 1]);
                    if (o + 3 + 3 * (size_t)nr + 2 <= data_.size()) {
                        uint16_t sentinel = rd16(&data_[o + 3 + 3 * nr]);
                        for (uint16_t r = 0; r < nr; ++r) {
                            uint16_t first = rd16(&data_[o + 3 + 3 * r]);
                            uint8_t fd = data_[o + 3 + 3 * r + 2];
                            uint32_t next = (r + 1 < nr)
                                ? rd16(&data_[o + 3 + 3 * (r + 1)])
                                : sentinel;
                            for (uint32_t g = first;
                                 g < next && g < (uint32_t)num_glyphs_;
                                 ++g)
                                cff_fdselect_[g] = fd;
                        }
                    }
                }
            }
        }
    } else {
        cff_lsubrs_.resize(1);
        load_private(top, cff_lsubrs_[0]);
    }
    return cff_charstrings_.count() > 0;
}

bool Font::load_outline_cff(uint32_t gid,
                            std::vector<std::vector<float>>& xs,
                            std::vector<std::vector<float>>& ys) const {
    if ((size_t)gid >= cff_charstrings_.count()) return false;

    double x = 0, y = 0;
    std::vector<float> cx, cy;
    auto close = [&]() {
        if (cx.size() >= 2) {
            xs.push_back(cx);
            ys.push_back(cy);
        }
        cx.clear();
        cy.clear();
    };
    auto moveto = [&](double nx, double ny) {
        close();
        x = nx; y = ny;
        cx.push_back((float)x);
        cy.push_back((float)y);
    };
    auto lineto = [&](double nx, double ny) {
        x = nx; y = ny;
        cx.push_back((float)x);
        cy.push_back((float)y);
    };
    // adaptive cubic flattening (same spirit as the quad path in
    // load_outline: step count scales with on-screen deviation)
    auto curveto = [&](double x1, double y1, double x2, double y2,
                       double x3, double y3) {
        double dev = std::fabs(x1 - x) + std::fabs(y1 - y) +
                     std::fabs(x2 - x3) + std::fabs(y2 - y3);
        int steps = std::min(
            24, 2 + (int)std::sqrt(dev * px_size_ / units_per_em_));
        for (int s = 1; s <= steps; ++s) {
            double t = (double)s / steps, mt = 1 - t;
            cx.push_back((float)(mt * mt * mt * x + 3 * mt * mt * t * x1 +
                                 3 * mt * t * t * x2 + t * t * t * x3));
            cy.push_back((float)(mt * mt * mt * y + 3 * mt * mt * t * y1 +
                                 3 * mt * t * t * y2 + t * t * t * y3));
        }
        x = x3; y = y3;
    };

    struct Frame { const uint8_t* p; const uint8_t* end; };
    std::vector<Frame> frames;
    const uint8_t* p = data_.data() + cff_charstrings_.offs[gid];
    const uint8_t* end = data_.data() + cff_charstrings_.offs[gid + 1];
    double st[64];
    int sp = 0;
    int nstems = 0;
    bool width_done = false;
    int fd = cff_fdselect_.empty()
        ? 0 : (gid < cff_fdselect_.size() ? cff_fdselect_[gid] : 0);
    const CffIndex* ls =
        fd < (int)cff_lsubrs_.size() ? &cff_lsubrs_[fd] : nullptr;
    long guard = 0;

    while (true) {
        if (p >= end) {
            if (frames.empty()) break;
            p = frames.back().p;
            end = frames.back().end;
            frames.pop_back();
            continue;
        }
        if (++guard > 1 << 20) return false;   // runaway charstring
        uint8_t b0 = *p++;
        if (b0 >= 32 || b0 == 28) {            // operand
            double v;
            if (b0 == 28) {
                if (p + 2 > end) return false;
                v = (double)(int16_t)(p[0] << 8 | p[1]);
                p += 2;
            } else if (b0 <= 246) {
                v = (double)b0 - 139;
            } else if (b0 <= 250) {
                if (p >= end) return false;
                v = (b0 - 247) * 256.0 + *p++ + 108;
            } else if (b0 <= 254) {
                if (p >= end) return false;
                v = -((double)(b0 - 251) * 256.0) - *p++ - 108;
            } else {                           // 255: 16.16 fixed
                if (p + 4 > end) return false;
                v = (double)(int32_t)rd32(p) / 65536.0;
                p += 4;
            }
            if (sp < 64) st[sp++] = v;
            continue;
        }
        switch (b0) {
        case 1: case 3: case 18: case 23:      // h/v stem (hm)
            nstems += sp / 2;                  // odd count: width dropped
            sp = 0;
            width_done = true;
            break;
        case 19: case 20:                      // hintmask / cntrmask
            nstems += sp / 2;
            sp = 0;
            width_done = true;
            p += (nstems + 7) / 8;
            break;
        case 21:                               // rmoveto
            if (sp >= 2) moveto(x + st[sp - 2], y + st[sp - 1]);
            sp = 0;
            width_done = true;
            break;
        case 22:                               // hmoveto
            if (sp >= 1) moveto(x + st[sp - 1], y);
            sp = 0;
            width_done = true;
            break;
        case 4:                                // vmoveto
            if (sp >= 1) moveto(x, y + st[sp - 1]);
            sp = 0;
            width_done = true;
            break;
        case 5:                                // rlineto
            for (int i = 0; i + 1 < sp; i += 2)
                lineto(x + st[i], y + st[i + 1]);
            sp = 0;
            break;
        case 6: case 7: {                      // hlineto / vlineto
            bool horiz = (b0 == 6);
            for (int i = 0; i < sp; ++i) {
                if (horiz) lineto(x + st[i], y);
                else lineto(x, y + st[i]);
                horiz = !horiz;
            }
            sp = 0;
            break;
        }
        case 8:                                // rrcurveto
            for (int i = 0; i + 5 < sp; i += 6) {
                double c1x = x + st[i], c1y = y + st[i + 1];
                double c2x = c1x + st[i + 2], c2y = c1y + st[i + 3];
                curveto(c1x, c1y, c2x, c2y,
                        c2x + st[i + 4], c2y + st[i + 5]);
            }
            sp = 0;
            break;
        case 24: {                             // rcurveline
            int i = 0;
            for (; sp - i >= 8; i += 6) {
                double c1x = x + st[i], c1y = y + st[i + 1];
                double c2x = c1x + st[i + 2], c2y = c1y + st[i + 3];
                curveto(c1x, c1y, c2x, c2y,
                        c2x + st[i + 4], c2y + st[i + 5]);
            }
            if (sp - i >= 2) lineto(x + st[i], y + st[i + 1]);
            sp = 0;
            break;
        }
        case 25: {                             // rlinecurve
            int i = 0;
            for (; sp - i >= 8; i += 2)
                lineto(x + st[i], y + st[i + 1]);
            if (sp - i >= 6) {
                double c1x = x + st[i], c1y = y + st[i + 1];
                double c2x = c1x + st[i + 2], c2y = c1y + st[i + 3];
                curveto(c1x, c1y, c2x, c2y,
                        c2x + st[i + 4], c2y + st[i + 5]);
            }
            sp = 0;
            break;
        }
        case 26: {                             // vvcurveto
            int i = 0;
            double dx1 = 0;
            if (sp & 1) { dx1 = st[0]; i = 1; }
            for (; sp - i >= 4; i += 4) {
                double c1x = x + dx1, c1y = y + st[i];
                double c2x = c1x + st[i + 1], c2y = c1y + st[i + 2];
                curveto(c1x, c1y, c2x, c2y, c2x, c2y + st[i + 3]);
                dx1 = 0;
            }
            sp = 0;
            break;
        }
        case 27: {                             // hhcurveto
            int i = 0;
            double dy1 = 0;
            if (sp & 1) { dy1 = st[0]; i = 1; }
            for (; sp - i >= 4; i += 4) {
                double c1x = x + st[i], c1y = y + dy1;
                double c2x = c1x + st[i + 1], c2y = c1y + st[i + 2];
                curveto(c1x, c1y, c2x, c2y, c2x + st[i + 3], c2y);
                dy1 = 0;
            }
            sp = 0;
            break;
        }
        case 30: case 31: {                    // vhcurveto / hvcurveto
            bool horiz = (b0 == 31);
            int i = 0;
            while (sp - i >= 4) {
                bool last = (sp - i == 5);
                double a = st[i], b = st[i + 1], c = st[i + 2],
                       d = st[i + 3];
                double c1x, c1y, c2x, c2y, ex, ey;
                if (horiz) {
                    c1x = x + a; c1y = y;
                    c2x = c1x + b; c2y = c1y + c;
                    ey = c2y + d;
                    ex = c2x + (last ? st[i + 4] : 0);
                } else {
                    c1x = x; c1y = y + a;
                    c2x = c1x + b; c2y = c1y + c;
                    ex = c2x + d;
                    ey = c2y + (last ? st[i + 4] : 0);
                }
                curveto(c1x, c1y, c2x, c2y, ex, ey);
                horiz = !horiz;
                i += 4;
            }
            sp = 0;
            break;
        }
        case 10: case 29: {                    // callsubr / callgsubr
            if (sp < 1) { sp = 0; break; }
            const CffIndex* idx = (b0 == 10) ? ls : &cff_gsubrs_;
            if (!idx || idx->count() == 0) { --sp; break; }
            long n = (long)st[--sp] + cff_subr_bias(idx->count());
            if (n < 0 || (size_t)n >= idx->count()) break;
            if (frames.size() >= 10) return false;
            frames.push_back({p, end});
            p = data_.data() + idx->offs[n];
            end = data_.data() + idx->offs[n + 1];
            break;
        }
        case 11:                               // return
            if (!frames.empty()) {
                p = frames.back().p;
                end = frames.back().end;
                frames.pop_back();
            }
            break;
        case 14:                               // endchar
            close();
            return true;
        case 12: {                             // escape: flex family
            if (p >= end) return false;
            uint8_t b1 = *p++;
            auto two_curves = [&](const double* a) {
                double c1x = x + a[0], c1y = y + a[1];
                double c2x = c1x + a[2], c2y = c1y + a[3];
                double jx = c2x + a[4], jy = c2y + a[5];
                curveto(c1x, c1y, c2x, c2y, jx, jy);
                double d1x = x + a[6], d1y = y + a[7];
                double d2x = d1x + a[8], d2y = d1y + a[9];
                curveto(d1x, d1y, d2x, d2y, d2x + a[10], d2y + a[11]);
            };
            if (b1 == 35 && sp >= 13) {        // flex
                two_curves(st);
            } else if (b1 == 34 && sp >= 7) {  // hflex
                double a[12] = {st[0], 0, st[1], st[2], st[3], 0,
                                st[4], 0, st[5], -st[2], st[6], 0};
                two_curves(a);
            } else if (b1 == 36 && sp >= 9) {  // hflex1
                double y0 = y;
                double c1x = x + st[0], c1y = y + st[1];
                double c2x = c1x + st[2], c2y = c1y + st[3];
                double jx = c2x + st[4], jy = c2y;
                curveto(c1x, c1y, c2x, c2y, jx, jy);
                double d1x = x + st[5], d1y = y;
                double d2x = d1x + st[6], d2y = d1y + st[7];
                curveto(d1x, d1y, d2x, d2y, d2x + st[8], y0);
            } else if (b1 == 37 && sp >= 11) { // flex1
                double x0 = x, y0 = y;
                double dx = st[0] + st[2] + st[4] + st[6] + st[8];
                double dy = st[1] + st[3] + st[5] + st[7] + st[9];
                double c1x = x + st[0], c1y = y + st[1];
                double c2x = c1x + st[2], c2y = c1y + st[3];
                double jx = c2x + st[4], jy = c2y + st[5];
                curveto(c1x, c1y, c2x, c2y, jx, jy);
                double d1x = x + st[6], d1y = y + st[7];
                double d2x = d1x + st[8], d2y = d1y + st[9];
                if (std::fabs(dx) > std::fabs(dy))
                    curveto(d1x, d1y, d2x, d2y, d2x + st[10], y0);
                else
                    curveto(d1x, d1y, d2x, d2y, x0, d2y + st[10]);
            }
            sp = 0;
            break;
        }
        default:
            sp = 0;
            break;
        }
        (void)width_done;
    }
    close();
    return true;
}

// ---------------------------------------------------------------------
// glyf outlines
// ---------------------------------------------------------------------

bool Font::load_outline(uint32_t gid,
                        std::vector<std::vector<float>>& xs,
                        std::vector<std::vector<float>>& ys,
                        int depth) const {
    if (depth > 5 || (int)gid >= num_glyphs_) return false;
    if (is_cff_) return load_outline_cff(gid, xs, ys);
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
    const uint8_t* gend = glyf + end;   // walk guard for corrupt glyphs
    if (g + 10 > gend) return false;
    int16_t ncont = rds16(g);

    if (ncont >= 0) {
        // simple glyph: endpoints, flags, deltas
        if (g + 10 + 2 * ncont + 2 > gend) return false;
        std::vector<uint16_t> ends(ncont);
        for (int c = 0; c < ncont; ++c) ends[c] = rd16(g + 10 + 2 * c);
        int npts = ncont ? ends.back() + 1 : 0;
        if (npts > 100000) return false;
        const uint8_t* p = g + 10 + 2 * ncont;
        uint16_t ilen = rd16(p);
        p += 2 + ilen;
        std::vector<uint8_t> flags;
        flags.reserve(npts);
        while ((int)flags.size() < npts) {
            if (p >= gend) return false;
            uint8_t fl = *p++;
            flags.push_back(fl);
            if (fl & 8) {   // repeat
                if (p >= gend) return false;
                uint8_t rep = *p++;
                for (int r = 0; r < rep; ++r) flags.push_back(fl);
            }
        }
        std::vector<float> px(npts), py(npts);
        int v = 0;
        for (int i = 0; i < npts; ++i) {
            uint8_t fl = flags[i];
            if (fl & 2) {
                if (p >= gend) return false;
                uint8_t d = *p++;
                v += (fl & 16) ? d : -d;
            } else if (!(fl & 16)) {
                if (p + 2 > gend) return false;
                v += rds16(p);
                p += 2;
            }
            px[i] = (float)v;
        }
        v = 0;
        for (int i = 0; i < npts; ++i) {
            uint8_t fl = flags[i];
            if (fl & 4) {
                if (p >= gend) return false;
                uint8_t d = *p++;
                v += (fl & 32) ? d : -d;
            } else if (!(fl & 32)) {
                if (p + 2 > gend) return false;
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
        if (p + 4 > gend) return false;
        uint16_t flags = rd16(p);
        uint16_t child = rd16(p + 2);
        p += 4;
        if (p + ((flags & 1) ? 4 : 2) > gend) return false;
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
            if (p + 2 > gend) return false;
            a = d = rds16(p) / 16384.f;
            p += 2;
        } else if (flags & 0x40) {   // x & y scale
            if (p + 4 > gend) return false;
            a = rds16(p) / 16384.f;
            d = rds16(p + 2) / 16384.f;
            p += 4;
        } else if (flags & 0x80) {   // 2x2
            if (p + 8 > gend) return false;
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
        if (4u * num_hmetrics_ <= len)
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
        if (4u * num_vmetrics_ <= len)
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
