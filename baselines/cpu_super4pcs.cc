// Serial CPU Super4PCS baseline — measurement stand-in for the
// unbuildable reference tree (its vendored Eigen submodule is empty and
// the environment has zero egress, see BASELINE.md).
//
// A from-scratch, algorithmically faithful implementation of the
// reference pipeline (ref:src/super4pcs/algorithms/match4pcsBase.{hpp,cc},
// super4pcs.cc), written the way the reference is written — serial C++,
// spatial index per query, per-candidate early exit — so that the
// measured wall time is an honest proxy for "CPU Super4PCS on this
// machine". No code was copied from the reference; behaviors are cited.
//
//   g++ -O3 -march=native -std=c++17 cpu_super4pcs.cc -o cpu_super4pcs
//   ./cpu_super4pcs hippo1.obj hippo2.obj 0.7 0.01 200 600
//
// Prints one JSON line: time-to-LCP>=overlap, best LCP, trials.
//
// Pipeline (SURVEY.md §3.2):
//   voxel sampling (ref:sampling.h:105-121), centering (hpp:141-149),
//   diameter + trial estimate (hpp:155-185), per trial: wide-triangle
//   base + most-coplanar 4th (cc:185-218, 279-351), invariants via
//   closest-segment points (cc:64-131, 225-274), pair extraction over
//   the Q samples with the distance band (4pcs.cc:114-198 semantics),
//   congruent-set search on a uniform grid over invariant points with
//   the pair-direction cone filter (super4pcs.cc:80-177,
//   normalset.hpp:162-210), frame-based rigid fit (cc:365-500), LCP
//   verification with per-point grid NN and best-LCP early exit
//   (cc:504-567), anytime loop (hpp:208-274).

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <unordered_map>
#include <vector>

struct V3 {
  float x = 0, y = 0, z = 0;
  V3() = default;
  V3(float a, float b, float c) : x(a), y(b), z(c) {}
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator*(float s) const { return {x * s, y * s, z * s}; }
};
static inline float dot(const V3& a, const V3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static inline float norm2(const V3& a) { return dot(a, a); }
static inline float norm(const V3& a) { return std::sqrt(norm2(a)); }
static inline V3 normalized(const V3& a) {
  float n = norm(a);
  return n > 1e-30f ? a * (1.0f / n) : V3();
}

// ---------------------------------------------------------------- IO ----
static std::vector<V3> read_obj_positions(const char* path) {
  std::vector<V3> out;
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(1); }
  char line[512];
  while (std::fgets(line, sizeof line, f)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      V3 p;
      if (std::sscanf(line + 1, "%f %f %f", &p.x, &p.y, &p.z) == 3)
        out.push_back(p);
    }
  }
  std::fclose(f);
  return out;
}

// ------------------------------------------------- voxel sampling -------
// Keep-first-per-voxel decimation at resolution delta
// (ref:sampling.h:105-121 behavior).
static std::vector<V3> voxel_sample(const std::vector<V3>& pts,
                                    float delta) {
  std::unordered_map<uint64_t, int> seen;
  seen.reserve(pts.size() * 2);
  std::vector<V3> out;
  for (const V3& p : pts) {
    int64_t ix = (int64_t)std::floor(p.x / delta);
    int64_t iy = (int64_t)std::floor(p.y / delta);
    int64_t iz = (int64_t)std::floor(p.z / delta);
    uint64_t key = (uint64_t)(ix * 73856093LL ^ iy * 19349669LL ^
                              iz * 83492791LL);
    if (seen.emplace(key, 1).second) out.push_back(p);
  }
  return out;
}

// ------------------------------------------- uniform grid (NN w/in eps) --
// The serial-query spatial index standing in for the reference kd-tree
// (ref:kdtree.h): cell = eps, query checks the 27-neighborhood — exact
// for "exists a point within eps".
struct EpsGrid {
  float cell = 1;
  std::unordered_map<uint64_t, std::vector<int>> cells;
  const std::vector<V3>* pts = nullptr;

  static uint64_t key(int64_t ix, int64_t iy, int64_t iz) {
    return (uint64_t)(ix * 73856093LL ^ iy * 19349669LL ^ iz * 83492791LL);
  }
  void build(const std::vector<V3>& p, float c) {
    pts = &p;
    cell = c;
    cells.clear();
    cells.reserve(p.size() * 2);
    for (size_t i = 0; i < p.size(); ++i) {
      int64_t ix = (int64_t)std::floor(p[i].x / cell);
      int64_t iy = (int64_t)std::floor(p[i].y / cell);
      int64_t iz = (int64_t)std::floor(p[i].z / cell);
      cells[key(ix, iy, iz)].push_back((int)i);
    }
  }
  bool has_within(const V3& q, float eps2) const {
    int64_t ix = (int64_t)std::floor(q.x / cell);
    int64_t iy = (int64_t)std::floor(q.y / cell);
    int64_t iz = (int64_t)std::floor(q.z / cell);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          auto it = cells.find(key(ix + dx, iy + dy, iz + dz));
          if (it == cells.end()) continue;
          for (int i : it->second)
            if (norm2((*pts)[i] - q) <= eps2) return true;
        }
    return false;
  }
  template <class F>
  void for_within(const V3& q, float eps2, F&& fn) const {
    int64_t ix = (int64_t)std::floor(q.x / cell);
    int64_t iy = (int64_t)std::floor(q.y / cell);
    int64_t iz = (int64_t)std::floor(q.z / cell);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          auto it = cells.find(key(ix + dx, iy + dy, iz + dz));
          if (it == cells.end()) continue;
          for (int i : it->second)
            if (norm2((*pts)[i] - q) <= eps2) fn(i);
        }
  }
};

// ------------------------------------- segment-segment closest points ----
// Invariant computation (ref:match4pcsBase.cc:64-131 case analysis).
static bool closest_segment_params(const V3& p1, const V3& p2,
                                   const V3& q1, const V3& q2,
                                   float* s_out, float* t_out) {
  V3 u = p2 - p1, v = q2 - q1, w = p1 - q1;
  float a = dot(u, u), b = dot(u, v), c = dot(v, v);
  float d = dot(u, w), e = dot(v, w);
  float D = a * c - b * b;
  float sN, sD = D, tN, tD = D;
  const float kSmall = 1e-8f;
  if (D < kSmall) {
    sN = 0; sD = 1; tN = e; tD = c;
  } else {
    sN = b * e - c * d;
    tN = a * e - b * d;
    if (sN < 0) { sN = 0; tN = e; tD = c; }
    else if (sN > sD) { sN = sD; tN = e + b; tD = c; }
  }
  if (tN < 0) {
    tN = 0;
    sN = (-d < 0) ? 0 : ((-d > a) ? sD : -d);
    sD = (sN == 0 || sN == sD) ? sD : a;
    if (-d >= 0 && -d <= a) { sN = -d; sD = a; }
  } else if (tN > tD) {
    tN = tD;
    float nd = -d + b;
    if (nd < 0) sN = 0;
    else if (nd > a) sN = sD;
    else { sN = nd; sD = a; }
  }
  if (sD < kSmall || tD < kSmall) return false;
  *s_out = sN / sD;
  *t_out = tN / tD;
  return true;
}

// Best pairing of the 4 base points into two crossing segments
// (ref:cc:225-274): try the 3 pairings, keep the one whose closest
// points coincide.
static bool try_quadrilateral(V3 b[4], int perm_out[4], float* inv1,
                              float* inv2) {
  static const int perms[3][4] = {{0, 1, 2, 3}, {0, 2, 1, 3}, {0, 3, 1, 2}};
  float best = 1e30f;
  bool ok = false;
  for (const auto& pm : perms) {
    float s, t;
    if (!closest_segment_params(b[pm[0]], b[pm[1]], b[pm[2]], b[pm[3]],
                                &s, &t))
      continue;
    V3 cp = b[pm[0]] + (b[pm[1]] - b[pm[0]]) * s;
    V3 cq = b[pm[2]] + (b[pm[3]] - b[pm[2]]) * t;
    float d2 = norm2(cp - cq);
    if (d2 < best) {
      best = d2;
      *inv1 = s;
      *inv2 = t;
      std::memcpy(perm_out, pm, sizeof(int) * 4);
      ok = true;
    }
  }
  return ok;
}

// ------------------------------------------ frame-based rigid fit --------
// R maps the candidate quad frame onto the base frame
// (ref:cc:365-500: orthonormal frames from the two segments, R = Fp Fq^T,
// then an RMS gate).
static bool rigid_fit(const V3 base[4], const V3 cand[4], float rms_gate,
                      float R[3][3], V3* t, const V3& cbase,
                      const V3& ccand) {
  V3 u1 = base[1] - base[0], u2 = base[3] - base[2];
  V3 v1 = cand[1] - cand[0], v2 = cand[3] - cand[2];
  V3 fp0 = normalized(u1);
  V3 fp2 = normalized(cross(u1, u2));
  if (norm2(fp2) < 0.5f) return false;  // colinear base segments
  V3 fp1 = cross(fp2, fp0);
  V3 fq0 = normalized(v1);
  V3 fq2 = normalized(cross(v1, v2));
  if (norm2(fq2) < 0.5f) return false;
  V3 fq1 = cross(fq2, fq0);
  V3 FP[3] = {fp0, fp1, fp2}, FQ[3] = {fq0, fq1, fq2};
  // R = FP^T * FQ mapping cand-frame coords to base-frame: columns.
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      const float* p = &FP[0].x;
      const float* q = &FQ[0].x;
      R[i][j] = p[0 * 3 + i] * q[0 * 3 + j] + p[1 * 3 + i] * q[1 * 3 + j] +
                p[2 * 3 + i] * q[2 * 3 + j];
    }
  // translation: centroid of first three (ref:hpp:385,415-417)
  V3 rc = {R[0][0] * ccand.x + R[0][1] * ccand.y + R[0][2] * ccand.z,
           R[1][0] * ccand.x + R[1][1] * ccand.y + R[1][2] * ccand.z,
           R[2][0] * ccand.x + R[2][1] * ccand.y + R[2][2] * ccand.z};
  *t = cbase - rc;
  // RMS gate vs 2*delta (ref:hpp:439)
  float rms = 0;
  for (int k = 0; k < 4; ++k) {
    V3 rc2 = {R[0][0] * cand[k].x + R[0][1] * cand[k].y + R[0][2] * cand[k].z,
              R[1][0] * cand[k].x + R[1][1] * cand[k].y + R[1][2] * cand[k].z,
              R[2][0] * cand[k].x + R[2][1] * cand[k].y + R[2][2] * cand[k].z};
    rms += norm2(rc2 + *t - base[k]);
  }
  rms = std::sqrt(rms / 4.0f);
  return rms < rms_gate;
}

// =========================================================== main ========
int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s P.obj Q.obj overlap delta [n_samples] [max_s]\n",
                 argv[0]);
    return 2;
  }
  const float overlap = std::atof(argv[3]);
  const float delta = std::atof(argv[4]);
  const int n_samples = argc > 5 ? std::atoi(argv[5]) : 200;
  const double max_seconds = argc > 6 ? std::atof(argv[6]) : 600.0;
  const unsigned seed = argc > 7 ? (unsigned)std::atoi(argv[7]) : 5489u;
  const float eps_pair = 2.0f * delta;   // DISTANCE_FACTOR * delta
  const float rms_gate = 2.0f * delta;   // ref:hpp:439
  const float cone_tol = 0.30f;          // component-space bin tolerance

  std::vector<V3> P = read_obj_positions(argv[1]);
  std::vector<V3> Q = read_obj_positions(argv[2]);
  std::mt19937 rng(seed);

  // sampling: P keeps all voxel-sampled points; Q shuffled + truncated
  // (ref:hpp:112-138)
  std::vector<V3> sp = voxel_sample(P, delta);
  std::vector<V3> sq = voxel_sample(Q, delta);
  std::shuffle(sq.begin(), sq.end(), rng);
  if ((int)sq.size() > n_samples) sq.resize(n_samples);

  // centering (ref:hpp:141-149)
  V3 cp, cq;
  for (const V3& p : sp) cp = cp + p;
  cp = cp * (1.0f / sp.size());
  for (V3& p : sp) p = p - cp;
  for (const V3& q : sq) cq = cq + q;
  cq = cq * (1.0f / sq.size());
  for (V3& q : sq) q = q - cq;

  // diameter from 1000 random Q-sample pairs (ref:hpp:155-164)
  float diam = 0;
  std::uniform_int_distribution<int> uq(0, (int)sq.size() - 1);
  for (int i = 0; i < 1000; ++i)
    diam = std::max(diam, norm(sq[uq(rng)] - sq[uq(rng)]));
  const float max_base_diameter = diam;

  // trial estimate (ref:hpp:175-185)
  double denom = std::log(std::max(1.0 - std::pow((double)overlap, 4),
                                   1e-300));
  double first_est = denom != 0 ? std::log(1e-5) / denom : 0;
  int n_trials =
      std::max((int)(first_est * (diam / 0.3) / max_base_diameter), 4);

  // verification grid over sampled P (the kd-tree stand-in, cc:353)
  EpsGrid vgrid;
  vgrid.build(sp, std::max(delta, 1e-6f));
  const float eps2 = delta * delta;

  std::uniform_int_distribution<int> up(0, (int)sp.size() - 1);
  float best_lcp = 0;
  int trial = 0;
  auto t0 = std::chrono::steady_clock::now();
  auto elapsed = [&] {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now() - t0)
        .count();
  };

  // time-to-target contract (matches bench.py): search until the LCP
  // target or the wall budget — the trial estimate is reported but not
  // a stop (the reference's own anytime loop would grant itself its
  // full time budget here, ref:hpp:239-255)
  for (;; ++trial) {
    if (elapsed() > max_seconds || best_lcp >= overlap) break;
    // ---- base selection (cc:185-218, 279-351)
    int b0 = up(rng), b1 = -1, b2 = -1;
    float widest = 0;
    for (int k = 0; k < 1000; ++k) {
      int s = up(rng), t = up(rng);
      V3 u = sp[s] - sp[b0], w = sp[t] - sp[b0];
      if (norm2(u) >= max_base_diameter * max_base_diameter ||
          norm2(w) >= max_base_diameter * max_base_diameter)
        continue;
      float wide = norm(cross(u, w));
      if (wide > widest) { widest = wide; b1 = s; b2 = t; }
    }
    if (b1 < 0) continue;
    // plane through the triangle; most coplanar 4th (cc:310-338)
    V3 nrm = cross(sp[b1] - sp[b0], sp[b2] - sp[b0]);
    if (norm2(nrm) < 1e-20f) continue;
    nrm = normalized(nrm);
    float dref = dot(nrm, sp[b0]);
    float too_small = max_base_diameter * 0.2f;
    int b3 = -1;
    float bestd = 1e30f;
    for (int i = 0; i < (int)sp.size(); ++i) {
      if (norm(sp[i] - sp[b0]) < too_small ||
          norm(sp[i] - sp[b1]) < too_small ||
          norm(sp[i] - sp[b2]) < too_small)
        continue;
      float d = std::fabs(dot(nrm, sp[i]) - dref);
      if (d < bestd) { bestd = d; b3 = i; }
    }
    if (b3 < 0) continue;
    V3 braw[4] = {sp[b0], sp[b1], sp[b2], sp[b3]};
    int perm[4];
    float inv1, inv2;
    if (!try_quadrilateral(braw, perm, &inv1, &inv2)) continue;
    V3 base[4] = {braw[perm[0]], braw[perm[1]], braw[perm[2]],
                  braw[perm[3]]};
    float d1 = norm(base[1] - base[0]);
    float d2d = norm(base[3] - base[2]);
    V3 bs1 = normalized(base[1] - base[0]);
    V3 bs2 = normalized(base[3] - base[2]);
    float cos_alpha = dot(bs1, bs2);

    // ---- pair extraction over the Q samples (4pcs.cc:114-198 band)
    std::vector<std::pair<int, int>> pairs1, pairs2;
    for (int i = 0; i < (int)sq.size(); ++i)
      for (int j = 0; j < (int)sq.size(); ++j) {
        if (i == j) continue;
        float d = norm(sq[i] - sq[j]);
        if (std::fabs(d - d1) <= eps_pair) pairs1.emplace_back(i, j);
        if (std::fabs(d - d2d) <= eps_pair) pairs2.emplace_back(i, j);
      }

    // ---- congruent join: grid on pairs1 invariant points, cone mask
    // (super4pcs.cc:80-177)
    std::vector<V3> e1(pairs1.size());
    for (size_t i = 0; i < pairs1.size(); ++i)
      e1[i] = sq[pairs1[i].first] +
              (sq[pairs1[i].second] - sq[pairs1[i].first]) * inv1;
    EpsGrid jgrid;
    float jr = eps_pair;  // join radius = DISTANCE_FACTOR * delta
    jgrid.build(e1, std::max(jr, 1e-6f));

    float jr2 = jr * jr;
    for (const auto& p2 : pairs2) {
      if (best_lcp >= overlap || elapsed() > max_seconds) break;
      V3 e2 = sq[p2.first] + (sq[p2.second] - sq[p2.first]) * inv2;
      V3 dir2 = normalized(sq[p2.second] - sq[p2.first]);
      jgrid.for_within(e2, jr2, [&](int k1i) {
        const auto& p1 = pairs1[k1i];
        V3 dir1 = normalized(sq[p1.second] - sq[p1.first]);
        if (std::fabs(dot(dir1, dir2) - cos_alpha) > cone_tol) return;
        V3 cand[4] = {sq[p1.first], sq[p1.second], sq[p2.first],
                      sq[p2.second]};
        V3 cbase = (base[0] + base[1] + base[2]) * (1.0f / 3.0f);
        V3 ccand = (cand[0] + cand[1] + cand[2]) * (1.0f / 3.0f);
        float R[3][3];
        V3 t;
        if (!rigid_fit(base, cand, rms_gate, R, &t, cbase, ccand)) return;
        // ---- verify with early exit (cc:504-567)
        int good = 0;
        int n = (int)sq.size();
        float best_cnt = best_lcp * n;
        for (int i = 0; i < n; ++i) {
          V3 q = sq[i];
          V3 tq = {R[0][0] * q.x + R[0][1] * q.y + R[0][2] * q.z + t.x,
                   R[1][0] * q.x + R[1][1] * q.y + R[1][2] * q.z + t.y,
                   R[2][0] * q.x + R[2][1] * q.y + R[2][2] * q.z + t.z};
          if (vgrid.has_within(tq, eps2)) ++good;
          if (good + (n - i - 1) < best_cnt) return;  // early exit
        }
        float lcp = (float)good / n;
        if (lcp > best_lcp) best_lcp = lcp;
      });
    }
  }

  std::printf(
      "{\"baseline\": \"cpu_super4pcs_serial\", \"seconds\": %.3f, "
      "\"lcp\": %.4f, \"trials\": %d, \"sampled_p\": %zu, "
      "\"sampled_q\": %zu}\n",
      elapsed(), best_lcp, trial, sp.size(), sq.size());
  return 0;
}
