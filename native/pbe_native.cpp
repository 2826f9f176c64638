// pbe_native — host-side data-path kernels for the pbe_tpu input pipeline.
//
// TPU-native replacement for the reference's compiled-extension dependencies
// on the data path (the `bezier` wheel at environment.yaml:15 and the PIL
// polygon rasterizer behind mask generation): Bézier evaluation, scanline
// polygon fill, and mask bbox reduction, exposed through a C ABI for ctypes.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Evaluate a Bézier curve of degree k (k+1 control points) at n uniform
// parameters in [0, 1]. ctrl: (k+1, 2) xy doubles; out: (n, 2).
void pbe_bezier_eval(const double* ctrl, int degree, int n, double* out) {
    const int k = degree;
    // binomial coefficients C(k, i)
    std::vector<double> binom(k + 1);
    binom[0] = 1.0;
    for (int i = 1; i <= k; ++i) {
        binom[i] = binom[i - 1] * (k - i + 1) / i;
    }
    for (int j = 0; j < n; ++j) {
        const double t = (n == 1) ? 0.0 : static_cast<double>(j) / (n - 1);
        double x = 0.0, y = 0.0;
        double tp = 1.0;  // t^i, built up incrementally
        // (1-t)^(k-i) computed via powers; accumulate stably
        for (int i = 0; i <= k; ++i) {
            const double b =
                binom[i] * tp * std::pow(1.0 - t, static_cast<double>(k - i));
            x += b * ctrl[2 * i];
            y += b * ctrl[2 * i + 1];
            tp *= t;
        }
        out[2 * j] = x;
        out[2 * j + 1] = y;
    }
}

// Scanline polygon fill with the even-odd rule, matching PIL's
// ImageDraw.polygon pixel convention closely enough for binary masks:
// a pixel (px, py) is inside if its center (px + .5 tested at py + .5? PIL
// tests integer scanlines) crosses an odd number of edges. We test the
// pixel row y at scanline y + 0.0 like PIL.
// poly: (npts, 2) xy doubles; out: (h, w) uint8 {0,1}, caller-zeroed.
void pbe_fill_polygon(const double* poly, int npts, int h, int w,
                      uint8_t* out) {
    if (npts < 3) return;
    std::vector<double> xs;
    xs.reserve(16);
    for (int y = 0; y < h; ++y) {
        const double fy = static_cast<double>(y);
        xs.clear();
        for (int i = 0; i < npts; ++i) {
            const double x1 = poly[2 * i], y1 = poly[2 * i + 1];
            const int j = (i + 1) % npts;
            const double x2 = poly[2 * j], y2 = poly[2 * j + 1];
            if ((y1 <= fy && y2 > fy) || (y2 <= fy && y1 > fy)) {
                xs.push_back(x1 + (fy - y1) / (y2 - y1) * (x2 - x1));
            }
        }
        std::sort(xs.begin(), xs.end());
        for (size_t s = 0; s + 1 < xs.size(); s += 2) {
            int xa = static_cast<int>(std::ceil(xs[s]));
            int xb = static_cast<int>(std::floor(xs[s + 1]));
            xa = std::max(xa, 0);
            xb = std::min(xb, w - 1);
            for (int x = xa; x <= xb; ++x) out[y * w + x] = 1;
        }
    }
}

// Tight bbox of nonzero mask pixels: out = {x1, y1, x2, y2} (exclusive
// max edges); {-1,-1,-1,-1} when empty.
void pbe_mask_bbox(const uint8_t* mask, int h, int w, int* out) {
    int x1 = w, y1 = h, x2 = -1, y2 = -1;
    for (int y = 0; y < h; ++y) {
        const uint8_t* row = mask + static_cast<size_t>(y) * w;
        for (int x = 0; x < w; ++x) {
            if (row[x]) {
                if (x < x1) x1 = x;
                if (x > x2) x2 = x;
                if (y < y1) y1 = y;
                y2 = y;
            }
        }
    }
    if (x2 < 0) {
        out[0] = out[1] = out[2] = out[3] = -1;
    } else {
        out[0] = x1;
        out[1] = y1;
        out[2] = x2 + 1;
        out[3] = y2 + 1;
    }
}

}  // extern "C"
