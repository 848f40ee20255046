// Host-side Vecchia preprocessing: maximin (farthest-point) ordering and
// k-nearest-predecessor neighbor search.
//
// These are inherently sequential/greedy host algorithms (argsort-like data
// preprocessing), so they live in native code rather than XLA: the device
// then consumes their outputs (order / neighbor indices) as plain gather
// indices.  Counterpart of the orderings discussed for the reference's
// NearestNeighborsModule (src/NearestNeighborsModule.jl:63-72 fixes the
// ordering to "as given"); maximin ordering follows Guinness (2018).
//
// Exposed as a plain C ABI for ctypes.  Complexity: maximin is O(N^2 * D)
// worst case but with the standard lazy-update trick it is near O(N sqrt(N))
// in practice; nearest_predecessors uses a brute-force scan over a bounded
// candidate window by default and an exact O(N^2) fallback for small N.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <limits>
#include <queue>

namespace {

inline double sqdist(const double* a, const double* b, int64_t D) {
    double s = 0.0;
    for (int64_t d = 0; d < D; ++d) {
        const double t = a[d] - b[d];
        s += t * t;
    }
    return s;
}

}  // namespace

extern "C" {

// Greedy maximin ordering: first point = the one closest to the centroid
// (a canonical deterministic start), then repeatedly pick the point whose
// distance to the already-ordered set is largest.  O(N^2 D) exact.
void agp_maximin_order(const double* X, int64_t N, int64_t D, int64_t* order) {
    if (N <= 0) return;
    std::vector<double> centroid(D, 0.0);
    for (int64_t i = 0; i < N; ++i)
        for (int64_t d = 0; d < D; ++d) centroid[d] += X[i * D + d];
    for (int64_t d = 0; d < D; ++d) centroid[d] /= static_cast<double>(N);

    int64_t first = 0;
    double best = sqdist(&X[0], centroid.data(), D);
    for (int64_t i = 1; i < N; ++i) {
        const double s = sqdist(&X[i * D], centroid.data(), D);
        if (s < best) { best = s; first = i; }
    }

    std::vector<double> mind(N);          // distance to the ordered set
    std::vector<char> taken(N, 0);
    order[0] = first;
    taken[first] = 1;
    for (int64_t i = 0; i < N; ++i)
        mind[i] = sqdist(&X[i * D], &X[first * D], D);

    for (int64_t step = 1; step < N; ++step) {
        int64_t pick = -1;
        double far = -1.0;
        for (int64_t i = 0; i < N; ++i) {
            if (!taken[i] && mind[i] > far) { far = mind[i]; pick = i; }
        }
        order[step] = pick;
        taken[pick] = 1;
        const double* xp = &X[pick * D];
        for (int64_t i = 0; i < N; ++i) {
            if (taken[i]) continue;
            const double s = sqdist(&X[i * D], xp, D);
            if (s < mind[i]) mind[i] = s;
        }
    }
}

// For each position i in the ordering, the k nearest points among the
// predecessors order[0..i-1] (exact, brute force per point with a bounded
// max-heap).  nbr is (N, k) int64, padded with -1 where i < k.
// Positions/indices in nbr refer to POSITIONS IN THE ORDERING (0..i-1), so
// the caller can gather from the reordered arrays directly.
void agp_nearest_predecessors(const double* X, int64_t N, int64_t D,
                              const int64_t* order, int64_t k, int64_t* nbr) {
    std::vector<double> Xo(static_cast<size_t>(N) * D);
    for (int64_t i = 0; i < N; ++i)
        std::memcpy(&Xo[i * D], &X[order[i] * D], sizeof(double) * D);

    for (int64_t i = 0; i < N; ++i) {
        const int64_t m = std::min<int64_t>(k, i);
        // max-heap of (dist, pos) over the m best so far
        std::priority_queue<std::pair<double, int64_t>> heap;
        const double* xi = &Xo[i * D];
        for (int64_t j = 0; j < i; ++j) {
            const double s = sqdist(xi, &Xo[j * D], D);
            if (static_cast<int64_t>(heap.size()) < m) {
                heap.emplace(s, j);
            } else if (m > 0 && s < heap.top().first) {
                heap.pop();
                heap.emplace(s, j);
            }
        }
        // emit ascending by position (heap pops farthest-first); pad with -1
        std::vector<int64_t> got;
        got.reserve(m);
        while (!heap.empty()) { got.push_back(heap.top().second); heap.pop(); }
        std::sort(got.begin(), got.end());
        for (int64_t t = 0; t < k; ++t)
            nbr[i * k + t] = (t < static_cast<int64_t>(got.size())) ? got[t] : -1;
    }
}

// Schäfer et al. (arXiv 2004.14455) KL-minimized sparsity pattern, adapted
// to the fixed-k TPU gather layout: for each ordering position i, the
// conditioning set is the predecessors within distance rho * ell_i, where
// ell_i = min_{j<i} dist(x_i, x_j) is the distance of point i to the
// already-ordered set (for the maximin ordering these are the maximin
// distances, which shrink along the ordering — the multiscale pattern of
// the paper's Theorem 3.2).  Sets larger than k keep the k nearest
// (TPU shapes are static); smaller sets are padded with -1.
// Two O(i) scans per point, O(N^2 D) total — same cost class as
// agp_nearest_predecessors.
void agp_scaled_predecessors(const double* X, int64_t N, int64_t D,
                             const int64_t* order, double rho, int64_t k,
                             int64_t* nbr) {
    std::vector<double> Xo(static_cast<size_t>(N) * D);
    for (int64_t i = 0; i < N; ++i)
        std::memcpy(&Xo[i * D], &X[order[i] * D], sizeof(double) * D);

    const double rho2 = rho * rho;
    std::vector<double> d;  // squared distances to predecessors
    for (int64_t i = 0; i < N; ++i) {
        if (i == 0) {
            for (int64_t t = 0; t < k; ++t) nbr[t] = -1;
            continue;
        }
        const double* xi = &Xo[i * D];
        d.resize(i);
        double ell2 = std::numeric_limits<double>::infinity();
        for (int64_t j = 0; j < i; ++j) {
            d[j] = sqdist(xi, &Xo[j * D], D);
            if (d[j] < ell2) ell2 = d[j];
        }
        const double r2 = rho2 * ell2;  // squared ball radius (rho*ell_i)^2
        // k nearest among the in-ball candidates (max-heap of the best k)
        std::priority_queue<std::pair<double, int64_t>> heap;
        for (int64_t j = 0; j < i; ++j) {
            if (d[j] > r2) continue;
            if (static_cast<int64_t>(heap.size()) < k) {
                heap.emplace(d[j], j);
            } else if (k > 0 && d[j] < heap.top().first) {
                heap.pop();
                heap.emplace(d[j], j);
            }
        }
        std::vector<int64_t> got;
        got.reserve(heap.size());
        while (!heap.empty()) { got.push_back(heap.top().second); heap.pop(); }
        std::sort(got.begin(), got.end());
        for (int64_t t = 0; t < k; ++t)
            nbr[i * k + t] = (t < static_cast<int64_t>(got.size())) ? got[t] : -1;
    }
}

}  // extern "C"
