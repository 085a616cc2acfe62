// Native host-side data-path kernels for gslm_tpu.
//
// TPU-native counterpart of the reference's host/CUDA utility extensions:
//  - mean_sq_dist_3nn: exact 3-nearest-neighbor mean squared distance for
//    Gaussian scale seeding (reference simple-knn distCUDA2, used at
//    scene/gaussian_model.py:249). Grid-bucket search with an expanding
//    ring and a correct ring-distance cutoff, OpenMP-parallel over points.
//  - parse_points3d_bin: COLMAP points3D.bin parser (the Python
//    struct-loop is O(N) interpreter iterations; big scenes carry 10^5-10^6
//    points). Matches scene/colmap_loader.py:read_points3D_binary layout.
//
// Built as a plain shared library driven through ctypes (no pybind11).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Exact 3-NN mean squared distance.
// pts: n*3 floats (row major). out: n floats.
// ---------------------------------------------------------------------------
void mean_sq_dist_3nn(const float* pts, int64_t n, float* out) {
    if (n <= 1) {
        for (int64_t i = 0; i < n; ++i) out[i] = 0.f;
        return;
    }
    float lo[3] = {pts[0], pts[1], pts[2]};
    float hi[3] = {pts[0], pts[1], pts[2]};
    for (int64_t i = 0; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            lo[d] = std::min(lo[d], pts[3 * i + d]);
            hi[d] = std::max(hi[d], pts[3 * i + d]);
        }
    }
    // ~4 points per cell on average
    int dim = std::max(1, (int)std::cbrt((double)n / 4.0));
    dim = std::min(dim, 256);
    float ext[3], cell[3];
    for (int d = 0; d < 3; ++d) {
        ext[d] = std::max(hi[d] - lo[d], 1e-12f);
        cell[d] = ext[d] / dim;
    }
    auto cell_of = [&](const float* p, int* c) {
        for (int d = 0; d < 3; ++d) {
            int v = (int)((p[d] - lo[d]) / cell[d]);
            c[d] = std::min(std::max(v, 0), dim - 1);
        }
    };
    const int64_t ncells = (int64_t)dim * dim * dim;
    std::vector<int64_t> counts(ncells + 1, 0);
    std::vector<int32_t> cidx(n);
    for (int64_t i = 0; i < n; ++i) {
        int c[3];
        cell_of(pts + 3 * i, c);
        cidx[i] = (c[2] * dim + c[1]) * dim + c[0];
        counts[cidx[i] + 1]++;
    }
    for (int64_t c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
    std::vector<int32_t> order(n);
    {
        std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
        for (int64_t i = 0; i < n; ++i) order[cursor[cidx[i]]++] = (int32_t)i;
    }

#pragma omp parallel for schedule(dynamic, 256)
    for (int64_t i = 0; i < n; ++i) {
        const float* p = pts + 3 * i;
        int c[3];
        cell_of(p, c);
        float best[3] = {1e30f, 1e30f, 1e30f};
        auto push = [&](float d2) {
            if (d2 < best[2]) {
                best[2] = d2;
                if (best[2] < best[1]) std::swap(best[1], best[2]);
                if (best[1] < best[0]) std::swap(best[0], best[1]);
            }
        };
        const float min_cell = std::min(cell[0], std::min(cell[1], cell[2]));
        for (int ring = 0; ring < dim; ++ring) {
            // any point in a farther ring is at least (ring-1)*min_cell away
            if (ring > 1) {
                float dmin = (ring - 1) * min_cell;
                if (best[2] < dmin * dmin) break;
            }
            bool any_cell = false;
            for (int dz = -ring; dz <= ring; ++dz) {
                int z = c[2] + dz;
                if (z < 0 || z >= dim) continue;
                for (int dy = -ring; dy <= ring; ++dy) {
                    int y = c[1] + dy;
                    if (y < 0 || y >= dim) continue;
                    bool edge_zy = (std::abs(dz) == ring)
                        || (std::abs(dy) == ring);
                    for (int dx = -ring; dx <= ring; ++dx) {
                        // only the shell of the ring (interior already done)
                        if (!edge_zy && std::abs(dx) != ring) continue;
                        int x = c[0] + dx;
                        if (x < 0 || x >= dim) continue;
                        any_cell = true;
                        int64_t cc = ((int64_t)z * dim + y) * dim + x;
                        for (int64_t k = counts[cc]; k < counts[cc + 1]; ++k) {
                            int64_t j = order[k];
                            if (j == i) continue;
                            const float* q = pts + 3 * j;
                            float d0 = p[0] - q[0], d1 = p[1] - q[1],
                                  d2_ = p[2] - q[2];
                            push(d0 * d0 + d1 * d1 + d2_ * d2_);
                        }
                    }
                }
            }
            if (!any_cell && ring > 2 * dim) break;
        }
        float m = 0.f;
        int found = 0;
        for (int k = 0; k < 3; ++k)
            if (best[k] < 1e29f) { m += best[k]; found++; }
        out[i] = found ? m / found : 0.f;
    }
}

// ---------------------------------------------------------------------------
// COLMAP points3D.bin parser.
// buf/len: whole file. First call with xyz==nullptr returns the point count;
// second call fills xyz (n*3 f64), rgb (n*3 u8), err (n f64), ids (n i64).
// Returns the number of points, or -1 on a malformed file.
// ---------------------------------------------------------------------------
int64_t parse_points3d_bin(const uint8_t* buf, int64_t len, double* xyz,
                           uint8_t* rgb, double* err, int64_t* ids) {
    if (len < 8) return -1;
    uint64_t n;
    std::memcpy(&n, buf, 8);
    int64_t off = 8;
    if (!xyz) {  // count-only pass still validates the layout
        for (uint64_t i = 0; i < n; ++i) {
            if (off + 43 + 8 > len) return -1;
            uint64_t tlen;
            std::memcpy(&tlen, buf + off + 43, 8);
            off += 43 + 8 + (int64_t)tlen * 8;
            if (off > len) return -1;
        }
        return (int64_t)n;
    }
    for (uint64_t i = 0; i < n; ++i) {
        if (off + 43 + 8 > len) return -1;
        std::memcpy(&ids[i], buf + off, 8);
        std::memcpy(&xyz[3 * i], buf + off + 8, 24);
        rgb[3 * i + 0] = buf[off + 32];
        rgb[3 * i + 1] = buf[off + 33];
        rgb[3 * i + 2] = buf[off + 34];
        std::memcpy(&err[i], buf + off + 35, 8);
        uint64_t tlen;
        std::memcpy(&tlen, buf + off + 43, 8);
        off += 43 + 8 + (int64_t)tlen * 8;
        if (off > len) return -1;
    }
    return (int64_t)n;
}

}  // extern "C"
