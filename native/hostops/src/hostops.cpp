// Host-side hot ops for the OCR pipeline, C ABI for ctypes.
//
// Native counterparts of the reference's per-box python loops
// (/root/reference/process_ocr_base.py:544-650): the histogram-contrast
// statistic (imageHist, :652-693) over N crop rectangles, and the greedy
// IoU/overlap/fill dedup of score-sorted detections (:559-608). Both are
// bit-equivalent to the numpy implementations in
// findtextcenternet_tpu/infer/pipeline.py and ~20x faster at page load.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// 2-means cluster distance over one 256-bin histogram (float64 math,
// matching the numpy version's semantics exactly). Iterates over the
// OCCUPIED bins only — empty bins contribute exactly 0.0 to every sum
// (adding 0.0 to a double is exact), so compacting first preserves the
// bit-for-bit result while a small crop touches far fewer than 256 bins.
// Counts arrive as uint32 (integers convert to double exactly; crop
// pixel counts are far below 2^32) and are CLEARED during compaction,
// so the shared histogram buffer never needs a per-crop refill.
// ``hist`` and ``hist2`` are two interleaved sub-histograms of the same
// crop (split by pixel parity to break the same-bin increment dependency
// chain on flat backgrounds); their integer sum is the true histogram.
double cluster_distance_clear(uint32_t* hist, uint32_t* hist2) {
    int vals[256];
    double cnts[256];
    int m = 0;
    double s = 0, vsum = 0;
    for (int i = 0; i < 256; ++i) {
        uint32_t hc = hist[i] + hist2[i];
        if (hc != 0) {
            hist[i] = 0;
            hist2[i] = 0;
            vals[m] = i;
            cnts[m] = (double)hc;
            s += (double)hc;
            vsum += (double)hc * i;
            ++m;
        }
    }
    if (s == 0) return 0.0;
    double mean = vsum / s;
    int split = (int)(mean + 0.5);
    double lo_s = 0, lo_v = 0;
    for (int k = 0; k < m && vals[k] < split; ++k) {
        lo_s += cnts[k];
        lo_v += cnts[k] * vals[k];
    }
    double hi_s = s - lo_s, hi_v = vsum - lo_v;
    if (lo_s == 0 || hi_s == 0) return 0.0;
    double k1 = lo_v / lo_s, k2 = hi_v / hi_s;
    double d_prev = 256.0, d = std::fabs(k1 - k2);
    while (d_prev != d) {
        d_prev = d;
        double s1 = 0, v1 = 0, s2 = 0, v2 = 0;
        for (int k = 0; k < m; ++k) {
            if (std::fabs(vals[k] - k1) < std::fabs(vals[k] - k2)) {
                s1 += cnts[k];
                v1 += cnts[k] * vals[k];
            } else {
                s2 += cnts[k];
                v2 += cnts[k] * vals[k];
            }
        }
        if (s1 == 0 || s2 == 0) return 0.0;
        k1 = v1 / s1;
        k2 = v2 / s2;
        d = std::fabs(k1 - k2);
    }
    return d;
}

}  // namespace

extern "C" {

// img: (h, w, c) uint8 row-major; rects: (n, 4) int32 [x0, y0, x1, y1]
// (clamped to the image by the caller; empty crops yield 0).
// out: (n,) float32 max-over-channels cluster distance.
void hostops_hist_contrast(const uint8_t* img, int h, int w, int c,
                           const int32_t* rects, int n, float* out) {
    // shared uint32 sub-histograms (x-parity interleaved);
    // cluster_distance_clear zeroes the occupied bins as it compacts,
    // so there is no per-crop memset
    std::vector<uint32_t> hist(2 * 256 * c, 0u);
    uint32_t* ha = hist.data();
    uint32_t* hb = hist.data() + 256 * c;
    for (int k = 0; k < n; ++k) {
        int x0 = std::max(0, rects[4 * k + 0]);
        int y0 = std::max(0, rects[4 * k + 1]);
        int x1 = std::min(w, rects[4 * k + 2]);
        int y1 = std::min(h, rects[4 * k + 3]);
        if (x1 <= x0 || y1 <= y0) {
            out[k] = 0.0f;
            continue;
        }
        for (int y = y0; y < y1; ++y) {
            const uint8_t* row = img + ((size_t)y * w + x0) * c;
            int x = x0;
            for (; x + 1 < x1; x += 2) {
                for (int ch = 0; ch < c; ++ch)
                    ++ha[ch * 256 + row[ch]];
                for (int ch = 0; ch < c; ++ch)
                    ++hb[ch * 256 + row[c + ch]];
                row += 2 * c;
            }
            if (x < x1)
                for (int ch = 0; ch < c; ++ch)
                    ++ha[ch * 256 + *row++];
        }
        double best = 0.0;
        for (int ch = 0; ch < c; ++ch)
            best = std::max(best,
                            cluster_distance_clear(ha + ch * 256,
                                                   hb + ch * 256));
        out[k] = (float)best;
    }
}

// Greedy dedup over score-DESCENDING candidates.
// boxes: (n, 4) float32 [cx, cy, w, h]; keep: (n,) uint8 out.
// A candidate is dropped when, against all previously kept boxes:
//   max IoU > iou_th, or max intersection > own area * overlap_th, or
//   the union of overlaps covers > fill_th of its own box.
// Implementation note: only kept boxes whose rectangles INTERSECT the
// candidate can affect the outcome (iou > iou_th and inter > a0 *
// overlap_th both require inter > 0, and non-intersecting boxes add
// nothing to `overlaps`), so kept boxes are indexed in a uniform spatial
// grid (cell ~ 2x mean box size) and each candidate only scans the
// kept boxes registered in the cells its own rectangle spans. Exactly
// the same keep/drop decisions as the O(N*K) scan, near-linear time.
void hostops_greedy_dedup(const float* boxes, int n, float iou_th,
                          float overlap_th, float fill_th, uint8_t* keep) {
    if (n <= 0) return;
    std::vector<double> rx0(n), ry0(n), rx1(n), ry1(n);
    double minx = boxes[0], miny = boxes[1];
    double maxx = boxes[0], maxy = boxes[1];
    double mean_sz = 0;
    for (int i = 0; i < n; ++i) {
        double cx = boxes[4 * i], cy = boxes[4 * i + 1];
        double w = boxes[4 * i + 2], h = boxes[4 * i + 3];
        rx0[i] = cx - w / 2;
        ry0[i] = cy - h / 2;
        rx1[i] = cx + w / 2;
        ry1[i] = cy + h / 2;
        minx = std::min(minx, rx0[i]);
        miny = std::min(miny, ry0[i]);
        maxx = std::max(maxx, rx1[i]);
        maxy = std::max(maxy, ry1[i]);
        mean_sz += (double)w + h;
    }
    double cell = std::max(8.0, mean_sz / n);  // = 2x mean half-perimeter/2
    // cap the grid at ~4M cells for degenerate inputs
    while ((double)(maxx - minx) * (maxy - miny) / (cell * cell) > 4e6)
        cell *= 2;
    int gw = std::max(1, (int)((maxx - minx) / cell) + 1);
    int gh = std::max(1, (int)((maxy - miny) / cell) + 1);
    std::vector<std::vector<int>> grid((size_t)gw * gh);
    std::vector<int> stamp(n, -1);
    std::vector<int> cand;
    auto cell_span = [&](int i, int& cx0, int& cy0, int& cx1, int& cy1) {
        cx0 = std::min(gw - 1, std::max(0, (int)((rx0[i] - minx) / cell)));
        cy0 = std::min(gh - 1, std::max(0, (int)((ry0[i] - miny) / cell)));
        cx1 = std::min(gw - 1, std::max(0, (int)((rx1[i] - minx) / cell)));
        cy1 = std::min(gh - 1, std::max(0, (int)((ry1[i] - miny) / cell)));
    };
    std::vector<uint8_t> fill;
    for (int i = 0; i < n; ++i) {
        double cx = boxes[4 * i], cy = boxes[4 * i + 1];
        double w = boxes[4 * i + 2], h = boxes[4 * i + 3];
        double a0 = w * h;
        bool drop = false;
        std::vector<int> overlaps;
        int cx0, cy0, cx1, cy1;
        cell_span(i, cx0, cy0, cx1, cy1);
        cand.clear();
        for (int gy = cy0; gy <= cy1; ++gy)
            for (int gx = cx0; gx <= cx1; ++gx)
                for (int j : grid[(size_t)gy * gw + gx])
                    if (stamp[j] != i) {
                        stamp[j] = i;
                        cand.push_back(j);
                    }
        for (int j : cand) {
            double ox = boxes[4 * j], oy = boxes[4 * j + 1];
            double ow = boxes[4 * j + 2], oh = boxes[4 * j + 3];
            double ix0 = std::max(cx - w / 2, ox - ow / 2);
            double iy0 = std::max(cy - h / 2, oy - oh / 2);
            double ix1 = std::min(cx + w / 2, ox + ow / 2);
            double iy1 = std::min(cy + h / 2, oy + oh / 2);
            double iw = std::max(ix1 - ix0, 0.0);
            double ih = std::max(iy1 - iy0, 0.0);
            double inter = iw * ih;
            double uni = a0 + ow * oh - inter;
            double iou = uni > 0 ? inter / uni : 0;
            if (iou > iou_th || inter > a0 * overlap_th) {
                drop = true;
                break;
            }
            if (iou > 0) overlaps.push_back(j);
        }
        if (!drop && !overlaps.empty()) {
            const int fw = std::max(1, (int)w), fh = std::max(1, (int)h);
            fill.assign((size_t)fw * fh, 0);
            for (int j : overlaps) {
                double ox = boxes[4 * j], oy = boxes[4 * j + 1];
                double ow = boxes[4 * j + 2], oh = boxes[4 * j + 3];
                int px0 = (int)(std::max(ox - ow / 2, cx - w / 2) -
                                (cx - w / 2));
                int px1 = (int)(std::min(ox + ow / 2, cx + w / 2) -
                                (cx - w / 2)) + 1;
                int py0 = (int)(std::max(oy - oh / 2, cy - h / 2) -
                                (cy - h / 2));
                int py1 = (int)(std::min(oy + oh / 2, cy + h / 2) -
                                (cy - h / 2)) + 1;
                px0 = std::max(0, px0);
                py0 = std::max(0, py0);
                px1 = std::min(fw, px1);
                py1 = std::min(fh, py1);
                for (int x = px0; x < px1; ++x)
                    for (int y = py0; y < py1; ++y)
                        fill[(size_t)x * fh + y] = 1;
            }
            size_t covered = 0;
            for (uint8_t v : fill) covered += v;
            if ((double)covered / fill.size() > fill_th) drop = true;
        }
        keep[i] = drop ? 0 : 1;
        if (!drop)
            for (int gy = cy0; gy <= cy1; ++gy)
                for (int gx = cx0; gx <= cx1; ++gx)
                    grid[(size_t)gy * gw + gx].push_back(i);
    }
}

}  // extern "C"
