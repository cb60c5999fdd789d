// Native core for detection's multi-threshold deblending merge.
//
// ops/detection.py::_multi_threshold_merge applies SExtractor's quantized
// deblending criterion (the reference's sep.extract deblend_nthresh /
// deblend_cont parameters, /root/reference/src/debvader/detect/detection.py:
// 20-21) to the watershed segments: weakest-peak-first, each segment merges
// into its brightest-saddle neighbor unless at least one quantization level
// separates peak from saddle AND its flux clears the contrast floor.  The
// algorithm is inherently sequential (each merge rewires the neighbor graph
// and updates fluxes before later decisions), so it cannot ride XLA — but
// the Python union-find loop was ~1/3 of steady 4k detection wall time.
// This translation is operation-for-operation identical (same edge order,
// same tie-breaking, same double-precision math), so results are
// bit-identical to the Python path (asserted in tests/test_detection.py).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 segmerge.cpp -o libdvsegmerge.so
// (runtime/segmerge.py does this on first use, like runtime/loader.py).

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

int64_t find_root(std::vector<int64_t>& parent, int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {  // path compression
        int64_t nxt = parent[x];
        parent[x] = root;
        x = nxt;
    }
    return root;
}

// Quantization level of value v within [thr, island_peak], 64 exponential
// steps (mirrors the Python `level` closure exactly).
int64_t level(double v, double island_peak, double thr, int64_t nthr) {
    if (island_peak <= thr || v <= thr) return 0;
    double x = std::log(v / thr) / std::log(island_peak / thr);
    double q = std::floor(x * (double)nthr);
    if (q < 0.0) q = 0.0;
    if (q > (double)nthr) q = (double)nthr;
    return (int64_t)q;
}

}  // namespace

extern "C" {

// Runs the merge loop.  flux is modified in place (the caller passes a
// copy); roots_out[i] receives the final root compact-id of segment i.
// Returns the number of merges performed.
int64_t dvm_merge(int64_t L, int64_t E,
                  const int64_t* ea, const int64_t* eb, const double* eh,
                  const double* peak, double* flux,
                  const int64_t* order,
                  int64_t nthr, double thr, double cont,
                  int64_t* roots_out) {
    std::vector<int64_t> parent(L);
    for (int64_t i = 0; i < L; ++i) parent[i] = i;

    // incident edge-index lists, same construction order as the Python
    std::vector<std::vector<int64_t>> incident(L);
    for (int64_t e = 0; e < E; ++e) {
        incident[ea[e]].push_back(e);
        incident[eb[e]].push_back(e);
    }

    int64_t n_merges = 0;
    bool changed = true;
    while (changed) {
        changed = false;
        for (int64_t k = 0; k < L; ++k) {
            int64_t r = order[k];
            if (parent[r] != r) continue;
            // best saddle to any touching neighbor (by current roots);
            // strict > keeps the first edge on ties, like the Python
            int64_t best_other = -1;
            double best_h = -INFINITY;
            for (int64_t e : incident[r]) {
                int64_t ra = find_root(parent, ea[e]);
                int64_t rb = find_root(parent, eb[e]);
                if (ra == rb) continue;
                int64_t other = (ra == r) ? rb : ra;
                if (eh[e] > best_h) {
                    best_other = other;
                    best_h = eh[e];
                }
            }
            if (best_other < 0) continue;
            if (peak[best_other] < peak[r]) continue;  // only into brighter
            double island_peak = peak[r] > peak[best_other] ? peak[r] : peak[best_other];
            double island_flux = flux[r] + flux[best_other];
            bool separated =
                level(peak[r], island_peak, thr, nthr) >
                level(best_h, island_peak, thr, nthr);
            bool significant = flux[r] > cont * island_flux;
            if (!(separated && significant)) {
                parent[r] = best_other;
                flux[best_other] += flux[r];
                auto& src = incident[r];
                auto& dst = incident[best_other];
                dst.insert(dst.end(), src.begin(), src.end());
                src.clear();
                src.shrink_to_fit();
                changed = true;
                ++n_merges;
            }
        }
    }

    for (int64_t i = 0; i < L; ++i) roots_out[i] = find_root(parent, i);
    return n_merges;
}

}  // extern "C"
