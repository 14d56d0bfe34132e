// Native CPU baseline harness — the role of the reference's PCL comparison
// program (/root/reference/benchmark/speed_test_comparison.cpp:1-272) in an
// environment without PCL: a self-contained C++17 + OpenMP implementation of
// the same benchmark protocol (ICP, point-to-plane ICP, NDT, voxel filter,
// k-NN PCA normal estimation on a 1M+ map / 100k scan; max_iter=30,
// tol=1e-3, voxel_size=1, max_dist=2, k=15 — speed_test_comparison.py:166).
// It is a COMPETITOR measurement target, not part of the library: it gives
// the head-to-head tables an honest multi-threaded native CPU opponent
// (the reference's pykdtree/OpenMP backend is not installable here and the
// scipy stand-in is single-threaded).
//
// I/O contract (benchmark/speed_test_cpp.py): raw little-endian float32
// xyz triples; argv = map.bin scan.bin. Results print one "name seconds"
// line per phase plus final transforms for parity checks.
//
// Build: g++ -O3 -march=native -fopenmp -std=c++17 cpu_baseline.cpp -o cpu_baseline

#include <algorithm>
#include <array>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#include <parallel/algorithm>
#endif

using std::size_t;
using clk = std::chrono::steady_clock;

static double secs(clk::time_point a, clk::time_point b) {
  return std::chrono::duration<double>(b - a).count();
}

struct V3 {
  float x, y, z;
};

static std::vector<V3> read_bin(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(2); }
  std::fseek(f, 0, SEEK_END);
  long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<V3> pts(bytes / sizeof(V3));
  if (std::fread(pts.data(), 1, pts.size() * sizeof(V3), f) !=
      pts.size() * sizeof(V3)) {
    std::fprintf(stderr, "short read %s\n", path);
    std::exit(2);
  }
  std::fclose(f);
  return pts;
}

// ---------- tiny linear algebra (the reference's math_tools.py analogue) ----

struct Mat3 {
  double m[9];
};

static Mat3 expSO3(const double w[3]) {  // math_tools.py:80-98
  double th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  Mat3 R{};
  double K[9] = {0, -w[2], w[1], w[2], 0, -w[0], -w[1], w[0], 0};
  double a, b;
  if (th2 <= 1e-5) {  // small-angle branch: I + W (math_tools.py:90-91)
    a = 1.0;
    b = 0.0;
  } else {
    double th = std::sqrt(th2);
    a = std::sin(th) / th;
    b = (1.0 - std::cos(th)) / th2;
  }
  double K2[9];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += K[i * 3 + k] * K[k * 3 + j];
      K2[i * 3 + j] = s;
    }
  for (int i = 0; i < 9; i++) R.m[i] = (i % 4 == 0 ? 1.0 : 0.0) + a * K[i] + b * K2[i];
  return R;
}

struct T44 {
  double R[9];
  double t[3];
};

static void boxplus(T44& T, const double dx[6]) {  // math_tools.py:101-108
  Mat3 dR = expSO3(dx + 3);
  double Rn[9], tn[3];
  for (int i = 0; i < 3; i++) {
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += T.R[i * 3 + k] * dR.m[k * 3 + j];
      Rn[i * 3 + j] = s;
    }
    tn[i] = T.t[i];
    for (int k = 0; k < 3; k++) tn[i] += T.R[i * 3 + k] * dx[k];
  }
  std::memcpy(T.R, Rn, sizeof Rn);
  std::memcpy(T.t, tn, sizeof tn);
}

static bool solve6(double H[36], double g[6], double dx[6]) {
  // Gaussian elimination with partial pivoting on [H | g]
  for (int c = 0; c < 6; c++) {
    int best = c;
    for (int r = c + 1; r < 6; r++)
      if (std::fabs(H[r * 6 + c]) > std::fabs(H[best * 6 + c])) best = r;
    if (std::fabs(H[best * 6 + c]) < 1e-12) return false;
    if (best != c) {
      for (int k = 0; k < 6; k++) std::swap(H[c * 6 + k], H[best * 6 + k]);
      std::swap(g[c], g[best]);
    }
    double inv = 1.0 / H[c * 6 + c];
    for (int r = c + 1; r < 6; r++) {
      double f = H[r * 6 + c] * inv;
      for (int k = c; k < 6; k++) H[r * 6 + k] -= f * H[c * 6 + k];
      g[r] -= f * g[c];
    }
  }
  for (int r = 5; r >= 0; r--) {
    double s = g[r];
    for (int k = r + 1; k < 6; k++) s -= H[r * 6 + k] * dx[k];
    dx[r] = s / H[r * 6 + r];
  }
  return true;
}

// smallest eigenvector of a symmetric 3x3 via cyclic Jacobi (normals/voxels)
static void smallest_eigvec3(const double c[6], double v[3]) {
  // c = [xx yy zz xy xz yz]
  double A[9] = {c[0], c[3], c[4], c[3], c[1], c[5], c[4], c[5], c[2]};
  double V[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  for (int sweep = 0; sweep < 12; sweep++) {
    int p[3] = {0, 0, 1}, q[3] = {1, 2, 2};
    for (int idx = 0; idx < 3; idx++) {
      int i = p[idx], j = q[idx];
      double apq = A[i * 3 + j];
      if (std::fabs(apq) < 1e-14) continue;
      double theta = 0.5 * (A[j * 3 + j] - A[i * 3 + i]) / apq;
      double t = (theta >= 0 ? 1.0 : -1.0) /
                 (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
      double cth = 1.0 / std::sqrt(t * t + 1.0), sth = t * cth;
      for (int k = 0; k < 3; k++) {
        double aik = A[i * 3 + k], ajk = A[j * 3 + k];
        A[i * 3 + k] = cth * aik - sth * ajk;
        A[j * 3 + k] = sth * aik + cth * ajk;
      }
      for (int k = 0; k < 3; k++) {
        double aki = A[k * 3 + i], akj = A[k * 3 + j];
        A[k * 3 + i] = cth * aki - sth * akj;
        A[k * 3 + j] = sth * aki + cth * akj;
        double vki = V[k * 3 + i], vkj = V[k * 3 + j];
        V[k * 3 + i] = cth * vki - sth * vkj;
        V[k * 3 + j] = sth * vki + cth * vkj;
      }
    }
  }
  int mi = 0;
  for (int i = 1; i < 3; i++)
    if (A[i * 3 + i] < A[mi * 3 + mi]) mi = i;
  for (int k = 0; k < 3; k++) v[k] = V[k * 3 + mi];
}

// ---------- grid-hash NN index (the pykdtree/PCL-kd-tree role) -------------

struct GridNN {
  float cell;
  int64_t nx, ny, nz;
  int64_t ox, oy, oz;
  std::vector<int32_t> starts;  // CSR over sorted cell keys
  std::vector<int32_t> order;
  const std::vector<V3>* pts;

  void build(const std::vector<V3>& p, float cell_) {
    pts = &p;
    cell = cell_;
    float lox = 1e30f, loy = 1e30f, loz = 1e30f;
    float hix = -1e30f, hiy = -1e30f, hiz = -1e30f;
    for (auto& q : p) {
      lox = std::min(lox, q.x); hix = std::max(hix, q.x);
      loy = std::min(loy, q.y); hiy = std::max(hiy, q.y);
      loz = std::min(loz, q.z); hiz = std::max(hiz, q.z);
    }
    ox = (int64_t)std::floor(lox / cell);
    oy = (int64_t)std::floor(loy / cell);
    oz = (int64_t)std::floor(loz / cell);
    nx = (int64_t)std::floor(hix / cell) - ox + 1;
    ny = (int64_t)std::floor(hiy / cell) - oy + 1;
    nz = (int64_t)std::floor(hiz / cell) - oz + 1;
    size_t n = p.size();
    std::vector<std::pair<int64_t, int32_t>> kv(n);
#pragma omp parallel for schedule(static)
    for (long i = 0; i < (long)n; i++) {
      int64_t cx = (int64_t)std::floor(p[i].x / cell) - ox;
      int64_t cy = (int64_t)std::floor(p[i].y / cell) - oy;
      int64_t cz = (int64_t)std::floor(p[i].z / cell) - oz;
      kv[i] = {cx + nx * (cy + ny * cz), (int32_t)i};
    }
#ifdef _OPENMP
    __gnu_parallel::sort(kv.begin(), kv.end());
#else
    std::sort(kv.begin(), kv.end());
#endif
    order.resize(n);
    starts.assign(nx * ny * nz + 1, 0);
    for (size_t i = 0; i < n; i++) {
      order[i] = kv[i].second;
      starts[kv[i].first + 1]++;
    }
    for (size_t i = 1; i < starts.size(); i++) starts[i] += starts[i - 1];
  }

  inline int64_t key(int64_t cx, int64_t cy, int64_t cz) const {
    return cx + nx * (cy + ny * cz);
  }

  // nearest point within max_dist (window of radius ceil(max_dist/cell))
  int nearest(const V3& q, float max_dist, float* dist_out) const {
    int rad = (int)std::ceil(max_dist / cell);
    int64_t cx = (int64_t)std::floor(q.x / cell) - ox;
    int64_t cy = (int64_t)std::floor(q.y / cell) - oy;
    int64_t cz = (int64_t)std::floor(q.z / cell) - oz;
    float best = max_dist * max_dist;
    int besti = -1;
    for (int64_t dz = -rad; dz <= rad; dz++)
      for (int64_t dy = -rad; dy <= rad; dy++)
        for (int64_t dx = -rad; dx <= rad; dx++) {
          int64_t gx = cx + dx, gy = cy + dy, gz = cz + dz;
          if (gx < 0 || gx >= nx || gy < 0 || gy >= ny || gz < 0 || gz >= nz)
            continue;
          int64_t k = key(gx, gy, gz);
          for (int32_t s = starts[k]; s < starts[k + 1]; s++) {
            const V3& c = (*pts)[order[s]];
            float ddx = q.x - c.x, ddy = q.y - c.y, ddz = q.z - c.z;
            float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 < best) { best = d2; besti = order[s]; }
          }
        }
    if (dist_out) *dist_out = std::sqrt(best);
    return besti;
  }

  // k nearest (unsorted beyond size k; simple insertion top-k)
  void knn(const V3& q, int k, int rad, int32_t* idx, float* d2s) const {
    int64_t cx = (int64_t)std::floor(q.x / cell) - ox;
    int64_t cy = (int64_t)std::floor(q.y / cell) - oy;
    int64_t cz = (int64_t)std::floor(q.z / cell) - oz;
    int cnt = 0;
    float worst = 1e30f;
    for (int64_t dz = -rad; dz <= rad; dz++)
      for (int64_t dy = -rad; dy <= rad; dy++)
        for (int64_t dx = -rad; dx <= rad; dx++) {
          int64_t gx = cx + dx, gy = cy + dy, gz = cz + dz;
          if (gx < 0 || gx >= nx || gy < 0 || gy >= ny || gz < 0 || gz >= nz)
            continue;
          int64_t kk = key(gx, gy, gz);
          for (int32_t s = starts[kk]; s < starts[kk + 1]; s++) {
            const V3& c = (*pts)[order[s]];
            float ddx = q.x - c.x, ddy = q.y - c.y, ddz = q.z - c.z;
            float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (cnt < k) {
              idx[cnt] = order[s];
              d2s[cnt] = d2;
              cnt++;
              if (cnt == k) {
                worst = 0;
                for (int t = 0; t < k; t++) worst = std::max(worst, d2s[t]);
              }
            } else if (d2 < worst) {
              int wi = 0;
              for (int t = 1; t < k; t++)
                if (d2s[t] > d2s[wi]) wi = t;
              idx[wi] = order[s];
              d2s[wi] = d2;
              worst = 0;
              for (int t = 0; t < k; t++) worst = std::max(worst, d2s[t]);
            }
          }
        }
    for (int t = cnt; t < k; t++) idx[t] = -1;
  }
};

// ---------- solvers (reference semantics: registration.py:71-112) ----------

struct GNAcc {
  double H[36] = {0};
  double g[6] = {0};
  double e2 = 0;
};

template <class PerPoint>
static T44 gauss_newton(const std::vector<V3>& src, int max_iter, double tol,
                        PerPoint per_point, int* iters_out) {
  T44 T{{1, 0, 0, 0, 1, 0, 0, 0, 1}, {0, 0, 0}};
  int it = 0;
  for (; it < max_iter; it++) {
    GNAcc acc;
#pragma omp parallel
    {
      GNAcc local;
#pragma omp for schedule(static) nowait
      for (long i = 0; i < (long)src.size(); i++) {
        double p[3] = {src[i].x, src[i].y, src[i].z};
        double tp[3];
        for (int r = 0; r < 3; r++)
          tp[r] = T.R[r * 3] * p[0] + T.R[r * 3 + 1] * p[1] +
                  T.R[r * 3 + 2] * p[2] + T.t[r];
        per_point(p, tp, T, local);
      }
#pragma omp critical
      {
        for (int k = 0; k < 36; k++) acc.H[k] += local.H[k];
        for (int k = 0; k < 6; k++) acc.g[k] += local.g[k];
        acc.e2 += local.e2;
      }
    }
    // per-point lambdas fill the upper triangle only; mirror before solving
    for (int c = 0; c < 6; c++)
      for (int d = 0; d < c; d++) acc.H[c * 6 + d] = acc.H[d * 6 + c];
    double dx[6];
    if (!solve6(acc.H, acc.g, dx)) break;
    for (int k = 0; k < 6; k++) dx[k] = -dx[k];
    double n2 = 0;
    for (int k = 0; k < 6; k++) n2 += dx[k] * dx[k];
    if (std::sqrt(n2) < tol) { it++; break; }  // solve->check->update order
    boxplus(T, dx);
  }
  if (iters_out) *iters_out = it;
  return T;
}

// J = [I | -R skew(p)] rows accumulated closed-form (icp.py:24-57)
static void acc_point(const double p[3], const double r[3], const T44& T,
                      GNAcc& a) {
  double J[3][6];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 6; j++) J[i][j] = (i == j) ? 1.0 : 0.0;
  double sk[9] = {0, -p[2], p[1], p[2], 0, -p[0], -p[1], p[0], 0};
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += T.R[i * 3 + k] * sk[k * 3 + j];
      J[i][3 + j] = -s;
    }
  for (int i = 0; i < 3; i++) {
    for (int c = 0; c < 6; c++) {
      a.g[c] += J[i][c] * r[i];
      for (int d = c; d < 6; d++) a.H[c * 6 + d] += J[i][c] * J[i][d];
    }
    a.e2 += r[i] * r[i];
  }
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s map.bin scan.bin\n", argv[0]);
    return 2;
  }
  auto map = read_bin(argv[1]);
  auto scan = read_bin(argv[2]);
#ifdef _OPENMP
  std::printf("threads %d\n", omp_get_max_threads());
#endif
  std::printf("map %zu scan %zu\n", map.size(), scan.size());
  const int max_iter = 30;
  const double tol = 1e-3;
  const float max_dist = 2.0f;
  const float voxel = 1.0f;
  const int K = 15;

  // ---- ICP (set_target + align, the reference timing boundary) ----
  {
    auto t0 = clk::now();
    GridNN nn;
    nn.build(map, max_dist / 2);
    int iters = 0;
    T44 T = gauss_newton(
        scan, max_iter, tol,
        [&](const double p[3], const double tp[3], const T44& Tc, GNAcc& a) {
          V3 q{(float)tp[0], (float)tp[1], (float)tp[2]};
          float d;
          int j = nn.nearest(q, max_dist, &d);
          if (j < 0) return;
          double r[3] = {tp[0] - map[j].x, tp[1] - map[j].y, tp[2] - map[j].z};
          acc_point(p, r, Tc, a);
        },
        &iters);
    auto t1 = clk::now();
    std::printf("icp %.4f iters %d t %.6f %.6f %.6f\n", secs(t0, t1), iters,
                T.t[0], T.t[1], T.t[2]);
  }

  // ---- normal estimation (k-NN PCA, estimate_normals.py:27-87) ----
  std::vector<V3> normals(map.size());
  {
    auto t0 = clk::now();
    GridNN nn;
    // cell ~ sampled k-th radius: use a fixed heuristic of the reference
    // protocol scale (dense urban map): 0.5 m with a radius-2 window
    nn.build(map, 0.5f);
#pragma omp parallel for schedule(dynamic, 1024)
    for (long i = 0; i < (long)map.size(); i++) {
      int32_t idx[32];
      float d2s[32];
      nn.knn(map[i], K, 2, idx, d2s);
      double mean[3] = {0, 0, 0};
      int cnt = 0;
      for (int t = 0; t < K; t++)
        if (idx[t] >= 0) {
          mean[0] += map[idx[t]].x - map[i].x;
          mean[1] += map[idx[t]].y - map[i].y;
          mean[2] += map[idx[t]].z - map[i].z;
          cnt++;
        }
      if (cnt == 0) { normals[i] = {0, 0, 1}; continue; }
      for (int d = 0; d < 3; d++) mean[d] /= cnt;
      double c6[6] = {0, 0, 0, 0, 0, 0};
      for (int t = 0; t < K; t++)
        if (idx[t] >= 0) {
          double cx = map[idx[t]].x - map[i].x - mean[0];
          double cy = map[idx[t]].y - map[i].y - mean[1];
          double cz = map[idx[t]].z - map[i].z - mean[2];
          c6[0] += cx * cx; c6[1] += cy * cy; c6[2] += cz * cz;
          c6[3] += cx * cy; c6[4] += cx * cz; c6[5] += cy * cz;
        }
      double v[3];
      smallest_eigvec3(c6, v);
      normals[i] = {(float)v[0], (float)v[1], (float)v[2]};
    }
    auto t1 = clk::now();
    std::printf("normals %.4f\n", secs(t0, t1));
  }

  // ---- PlaneICP (normals precomputed per protocol, plane_icp.py:30-69) ----
  {
    auto t0 = clk::now();
    GridNN nn;
    nn.build(map, max_dist / 2);
    int iters = 0;
    T44 T = gauss_newton(
        scan, max_iter, tol,
        [&](const double p[3], const double tp[3], const T44& Tc, GNAcc& a) {
          V3 q{(float)tp[0], (float)tp[1], (float)tp[2]};
          float d;
          int j = nn.nearest(q, max_dist, &d);
          if (j < 0) return;
          const V3& nrm = normals[j];
          double r = nrm.x * (tp[0] - map[j].x) + nrm.y * (tp[1] - map[j].y) +
                     nrm.z * (tp[2] - map[j].z);
          // J = [n^T | (skew(p) R^T n)^T]
          double rn[3];
          for (int i = 0; i < 3; i++)
            rn[i] = Tc.R[0 * 3 + i] * nrm.x + Tc.R[1 * 3 + i] * nrm.y +
                    Tc.R[2 * 3 + i] * nrm.z;
          double Jr[6] = {nrm.x, nrm.y, nrm.z,
                          p[1] * rn[2] - p[2] * rn[1],
                          p[2] * rn[0] - p[0] * rn[2],
                          p[0] * rn[1] - p[1] * rn[0]};
          for (int c = 0; c < 6; c++) {
            a.g[c] += Jr[c] * r;
            for (int dd = c; dd < 6; dd++) a.H[c * 6 + dd] += Jr[c] * Jr[dd];
          }
          a.e2 += r * r;
        },
        &iters);
    auto t1 = clk::now();
    std::printf("plane_icp %.4f iters %d t %.6f %.6f %.6f\n", secs(t0, t1),
                iters, T.t[0], T.t[1], T.t[2]);
  }

  // ---- voxel filter (voxel.py:209-241) ----
  {
    auto t0 = clk::now();
    GridNN g;
    g.build(map, voxel);  // reuse the CSR grouping
    std::vector<V3> out;
    out.reserve(g.starts.size());
    for (size_t k = 0; k + 1 < g.starts.size(); k++) {
      int32_t s = g.starts[k], e = g.starts[k + 1];
      if (s == e) continue;
      double m[3] = {0, 0, 0};
      for (int32_t i = s; i < e; i++) {
        m[0] += map[g.order[i]].x;
        m[1] += map[g.order[i]].y;
        m[2] += map[g.order[i]].z;
      }
      out.push_back({(float)(m[0] / (e - s)), (float)(m[1] / (e - s)),
                     (float)(m[2] / (e - s))});
    }
    auto t1 = clk::now();
    std::printf("voxel_filter %.4f cells %zu\n", secs(t0, t1), out.size());
  }

  // ---- NDT (voxel Gaussian map + Mahalanobis GN, ndt.py:24-57) ----
  {
    auto t0 = clk::now();
    GridNN g;
    g.build(map, voxel);
    size_t ncell = g.starts.size() - 1;
    std::vector<float> mu(ncell * 3), icov(ncell * 6);
    std::vector<uint8_t> valid(ncell, 0);
#pragma omp parallel for schedule(dynamic, 4096)
    for (long k = 0; k < (long)ncell; k++) {
      int32_t s = g.starts[k], e = g.starts[k + 1];
      if (e - s < 10) continue;  // min_points (voxel.py:56)
      double m[3] = {0, 0, 0};
      for (int32_t i = s; i < e; i++) {
        m[0] += map[g.order[i]].x;
        m[1] += map[g.order[i]].y;
        m[2] += map[g.order[i]].z;
      }
      for (int d = 0; d < 3; d++) m[d] /= (e - s);
      double c[6] = {0, 0, 0, 0, 0, 0};
      for (int32_t i = s; i < e; i++) {
        double cx = map[g.order[i]].x - m[0];
        double cy = map[g.order[i]].y - m[1];
        double cz = map[g.order[i]].z - m[2];
        c[0] += cx * cx; c[1] += cy * cy; c[2] += cz * cz;
        c[3] += cx * cy; c[4] += cx * cz; c[5] += cy * cz;
      }
      for (int d = 0; d < 6; d++) c[d] /= (e - s - 1);
      // analytic symmetric 3x3 inverse (voxel.py:69-102); the reference
      // KEEPS singular voxels, forcing det to 1e6 so their icov ~ 0
      // (voxel.py:87) — they stay nearest-centroid candidates with ~zero
      // Mahalanobis weight
      double det = c[0] * (c[1] * c[2] - c[5] * c[5]) -
                   c[3] * (c[3] * c[2] - c[5] * c[4]) +
                   c[4] * (c[3] * c[5] - c[1] * c[4]);
      if (det == 0.0) det = 1e6;
      double inv = 1.0 / det;
      icov[k * 6 + 0] = (float)((c[1] * c[2] - c[5] * c[5]) * inv);
      icov[k * 6 + 1] = (float)((c[0] * c[2] - c[4] * c[4]) * inv);
      icov[k * 6 + 2] = (float)((c[0] * c[1] - c[3] * c[3]) * inv);
      icov[k * 6 + 3] = (float)((c[4] * c[5] - c[3] * c[2]) * inv);
      icov[k * 6 + 4] = (float)((c[3] * c[5] - c[4] * c[1]) * inv);
      icov[k * 6 + 5] = (float)((c[3] * c[4] - c[0] * c[5]) * inv);
      mu[k * 3 + 0] = (float)m[0];
      mu[k * 3 + 1] = (float)m[1];
      mu[k * 3 + 2] = (float)m[2];
      valid[k] = 1;
    }
    int iters = 0;
    int rad = (int)std::ceil(max_dist / voxel);
    T44 T = gauss_newton(
        scan, max_iter, tol,
        [&](const double p[3], const double tp[3], const T44& Tc, GNAcc& a) {
          // nearest valid voxel centroid in the covering window
          int64_t cx = (int64_t)std::floor(tp[0] / voxel) - g.ox;
          int64_t cy = (int64_t)std::floor(tp[1] / voxel) - g.oy;
          int64_t cz = (int64_t)std::floor(tp[2] / voxel) - g.oz;
          float best = max_dist * max_dist;
          long bj = -1;
          for (int dz = -rad; dz <= rad; dz++)
            for (int dy = -rad; dy <= rad; dy++)
              for (int dx = -rad; dx <= rad; dx++) {
                int64_t gx = cx + dx, gy = cy + dy, gz = cz + dz;
                if (gx < 0 || gx >= g.nx || gy < 0 || gy >= g.ny || gz < 0 ||
                    gz >= g.nz)
                  continue;
                int64_t k = g.key(gx, gy, gz);
                if (!valid[k]) continue;
                float ddx = (float)tp[0] - mu[k * 3];
                float ddy = (float)tp[1] - mu[k * 3 + 1];
                float ddz = (float)tp[2] - mu[k * 3 + 2];
                float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                if (d2 < best) { best = d2; bj = k; }
              }
          if (bj < 0) return;
          double d[3] = {tp[0] - mu[bj * 3], tp[1] - mu[bj * 3 + 1],
                         tp[2] - mu[bj * 3 + 2]};
          const float* S = &icov[bj * 6];
          double Sm[9] = {S[0], S[3], S[4], S[3], S[1], S[5], S[4], S[5], S[2]};
          // J = [I | -R skew(p)]; H += J^T S J, g += J^T S d, e2 += d^T S d
          double J[3][6];
          for (int i = 0; i < 3; i++)
            for (int j = 0; j < 6; j++) J[i][j] = (i == j) ? 1.0 : 0.0;
          double sk[9] = {0, -p[2], p[1], p[2], 0, -p[0], -p[1], p[0], 0};
          for (int i = 0; i < 3; i++)
            for (int j = 0; j < 3; j++) {
              double s = 0;
              for (int k = 0; k < 3; k++) s += Tc.R[i * 3 + k] * sk[k * 3 + j];
              J[i][3 + j] = -s;
            }
          double SJ[3][6], Sd[3];
          for (int i = 0; i < 3; i++) {
            Sd[i] = Sm[i * 3] * d[0] + Sm[i * 3 + 1] * d[1] + Sm[i * 3 + 2] * d[2];
            for (int c = 0; c < 6; c++)
              SJ[i][c] = Sm[i * 3] * J[0][c] + Sm[i * 3 + 1] * J[1][c] +
                         Sm[i * 3 + 2] * J[2][c];
          }
          for (int c = 0; c < 6; c++) {
            for (int dd = c; dd < 6; dd++)
              for (int i = 0; i < 3; i++) a.H[c * 6 + dd] += J[i][c] * SJ[i][dd];
            for (int i = 0; i < 3; i++) a.g[c] += J[i][c] * Sd[i];
          }
          for (int i = 0; i < 3; i++) a.e2 += d[i] * Sd[i];
        },
        &iters);
    auto t1 = clk::now();
    std::printf("ndt %.4f iters %d t %.6f %.6f %.6f\n", secs(t0, t1), iters,
                T.t[0], T.t[1], T.t[2]);
  }
  return 0;
}
