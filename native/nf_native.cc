// Native host-side geometry kernels for neurofluid_tpu.
//
// Replaces the scipy cKDTree usage on the metric/eval path (reference
// utils/point_eval.py:11-14 runs a cKDTree query per rollout frame) with a
// uniform-grid nearest-neighbor structure tuned for the fluid scenes'
// bounded, roughly uniform point distributions. Exposed through ctypes
// (no pybind11 in this environment).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 nf_native.cc -o libnf_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct Grid {
  std::vector<int32_t> cell_start;  // size ncells+1
  std::vector<int32_t> order;       // point id per sorted slot
  std::vector<float> sorted_pts;    // 3 * n, sorted by cell
  float lo[3];
  float inv_cell;
  float cell;
  int dims[3];
  int n;

  int64_t cell_id(int ix, int iy, int iz) const {
    return ((int64_t)ix * dims[1] + iy) * dims[2] + iz;
  }

  void build(const float* pts, int n_, float cell_size) {
    n = n_;
    cell = cell_size;
    inv_cell = 1.0f / cell_size;
    float hi[3];
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::numeric_limits<float>::max();
      hi[d] = std::numeric_limits<float>::lowest();
    }
    for (int i = 0; i < n; ++i) {
      for (int d = 0; d < 3; ++d) {
        lo[d] = std::min(lo[d], pts[3 * i + d]);
        hi[d] = std::max(hi[d], pts[3 * i + d]);
      }
    }
    for (int d = 0; d < 3; ++d) {
      dims[d] = std::max(1, (int)std::floor((hi[d] - lo[d]) * inv_cell) + 1);
    }
    int64_t ncells = (int64_t)dims[0] * dims[1] * dims[2];
    std::vector<int32_t> counts(ncells + 1, 0);
    std::vector<int64_t> ids(n);
    for (int i = 0; i < n; ++i) {
      int c[3];
      for (int d = 0; d < 3; ++d) {
        int v = (int)((pts[3 * i + d] - lo[d]) * inv_cell);
        c[d] = std::min(std::max(v, 0), dims[d] - 1);
      }
      ids[i] = cell_id(c[0], c[1], c[2]);
      counts[ids[i] + 1]++;
    }
    for (int64_t c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
    cell_start = counts;
    order.resize(n);
    sorted_pts.resize(3 * n);
    std::vector<int32_t> cursor(cell_start.begin(), cell_start.end() - 1);
    for (int i = 0; i < n; ++i) {
      int32_t slot = cursor[ids[i]]++;
      order[slot] = i;
      std::memcpy(&sorted_pts[3 * slot], &pts[3 * i], 3 * sizeof(float));
    }
  }

  // nearest neighbor: expanding ring search over cells
  void nearest(const float* q, float* best_d2, int32_t* best_id) const {
    float bd2 = std::numeric_limits<float>::max();
    int32_t bid = -1;
    int c[3];
    for (int d = 0; d < 3; ++d) {
      int v = (int)std::floor((q[d] - lo[d]) * inv_cell);
      c[d] = std::min(std::max(v, 0), dims[d] - 1);
    }
    int max_ring = 0;
    for (int d = 0; d < 3; ++d)
      max_ring = std::max(max_ring, std::max(c[d], dims[d] - 1 - c[d]));
    for (int ring = 0; ring <= max_ring; ++ring) {
      // prune: if best distance is already closer than the ring's nearest
      // possible cell boundary, stop
      if (bid >= 0) {
        float ring_min = (ring - 1) * cell;  // conservative
        if (ring_min > 0 && ring_min * ring_min > bd2) break;
      }
      int x0 = c[0] - ring, x1 = c[0] + ring;
      int y0 = c[1] - ring, y1 = c[1] + ring;
      int z0 = c[2] - ring, z1 = c[2] + ring;
      for (int ix = std::max(x0, 0); ix <= std::min(x1, dims[0] - 1); ++ix) {
        bool xe = (ix == x0 || ix == x1);
        for (int iy = std::max(y0, 0); iy <= std::min(y1, dims[1] - 1); ++iy) {
          bool ye = (iy == y0 || iy == y1);
          for (int iz = std::max(z0, 0); iz <= std::min(z1, dims[2] - 1); ++iz) {
            bool ze = (iz == z0 || iz == z1);
            if (ring > 0 && !(xe || ye || ze)) continue;  // shell only
            int64_t cid = cell_id(ix, iy, iz);
            for (int32_t s = cell_start[cid]; s < cell_start[cid + 1]; ++s) {
              float dx = sorted_pts[3 * s] - q[0];
              float dy = sorted_pts[3 * s + 1] - q[1];
              float dz = sorted_pts[3 * s + 2] - q[2];
              float d2 = dx * dx + dy * dy + dz * dz;
              if (d2 < bd2) {
                bd2 = d2;
                bid = order[s];
              }
            }
          }
        }
      }
    }
    *best_d2 = bd2;
    *best_id = bid;
  }
};

float heuristic_cell(const float* pts, int n) {
  // aim for ~2 points per cell on average within the bounding box
  float lo[3], hi[3];
  for (int d = 0; d < 3; ++d) {
    lo[d] = std::numeric_limits<float>::max();
    hi[d] = std::numeric_limits<float>::lowest();
  }
  for (int i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], pts[3 * i + d]);
      hi[d] = std::max(hi[d], pts[3 * i + d]);
    }
  double vol = 1.0;
  for (int d = 0; d < 3; ++d) vol *= std::max(1e-6f, hi[d] - lo[d]);
  double c = std::cbrt(vol * 2.0 / std::max(1, n));
  return (float)std::max(c, 1e-4);
}

}  // namespace

extern "C" {

// For each query, Euclidean distance to (and id of) its nearest point.
void nf_nearest_neighbors(const float* points, int32_t n_points,
                          const float* queries, int32_t n_queries,
                          float* out_dist, int32_t* out_idx) {
  if (n_points <= 0) {
    for (int i = 0; i < n_queries; ++i) {
      out_dist[i] = std::numeric_limits<float>::infinity();
      out_idx[i] = -1;
    }
    return;
  }
  Grid g;
  g.build(points, n_points, heuristic_cell(points, n_points));
  for (int i = 0; i < n_queries; ++i) {
    float d2;
    int32_t id;
    g.nearest(&queries[3 * i], &d2, &id);
    out_dist[i] = std::sqrt(d2);
    out_idx[i] = id;
  }
}

// Symmetric chamfer distance (squared, mean-reduced both directions,
// pytorch3d convention — reference trainer/basetrainer.py:129-134).
float nf_chamfer(const float* x, int32_t nx, const float* y, int32_t ny) {
  std::vector<float> d(std::max(nx, ny));
  std::vector<int32_t> idx(std::max(nx, ny));
  double acc = 0.0;
  nf_nearest_neighbors(y, ny, x, nx, d.data(), idx.data());
  for (int i = 0; i < nx; ++i) acc += (double)d[i] * d[i];
  double cx = acc / std::max(1, nx);
  acc = 0.0;
  nf_nearest_neighbors(x, nx, y, ny, d.data(), idx.data());
  for (int i = 0; i < ny; ++i) acc += (double)d[i] * d[i];
  return (float)(cx + acc / std::max(1, ny));
}

// Fixed-radius neighbor counts (diagnostics / loss weighting on host).
void nf_radius_counts(const float* points, int32_t n_points,
                      const float* queries, int32_t n_queries, float radius,
                      int32_t exclude_self, int32_t* out_counts) {
  Grid g;
  g.build(points, n_points, std::max(radius, 1e-5f));
  float r2 = radius * radius;
  for (int i = 0; i < n_queries; ++i) {
    const float* q = &queries[3 * i];
    int c[3];
    for (int d = 0; d < 3; ++d) {
      int v = (int)std::floor((q[d] - g.lo[d]) * g.inv_cell);
      c[d] = v;
    }
    int32_t count = 0;
    for (int ix = std::max(c[0] - 1, 0); ix <= std::min(c[0] + 1, g.dims[0] - 1); ++ix)
      for (int iy = std::max(c[1] - 1, 0); iy <= std::min(c[1] + 1, g.dims[1] - 1); ++iy)
        for (int iz = std::max(c[2] - 1, 0); iz <= std::min(c[2] + 1, g.dims[2] - 1); ++iz) {
          int64_t cid = g.cell_id(ix, iy, iz);
          for (int32_t s = g.cell_start[cid]; s < g.cell_start[cid + 1]; ++s) {
            float dx = g.sorted_pts[3 * s] - q[0];
            float dy = g.sorted_pts[3 * s + 1] - q[1];
            float dz = g.sorted_pts[3 * s + 2] - q[2];
            float d2 = dx * dx + dy * dy + dz * dz;
            if (d2 <= r2 && !(exclude_self && d2 == 0.0f)) count++;
          }
        }
    out_counts[i] = count;
  }
}

}  // extern "C"
