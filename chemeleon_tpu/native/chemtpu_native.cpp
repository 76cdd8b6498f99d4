// chemtpu_native: C++ host-side chemistry kernels for chemeleon-tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the *host*
// hot paths around it — the work the reference delegates to pymatgen's C
// extensions (structure matching, Niggli reduction, periodic distances),
// which dominate evaluation/dedupe wall-clock (StructureMatcher over
// 708 rows x 20 samples, reference evaluate.py:192-204).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Algorithms (independent implementations, mirrored by the pure-Python
// fallbacks in chemeleon_tpu/chem/):
//   * Krivy-Gruber Niggli reduction (1976)
//   * min-image periodic distances over the 3x3x3 image set
//   * structure matching: Niggli frames -> signed basis permutations with
//     parameter tolerance -> anchor translations -> per-species Hungarian
//     assignment on periodic displacements, normalized RMS test

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using std::abs;
using std::sqrt;

// ---------------------------------------------------------------- linalg --
struct Mat3 {
  double m[3][3];
};

static double det3(const Mat3 &a) {
  return a.m[0][0] * (a.m[1][1] * a.m[2][2] - a.m[1][2] * a.m[2][1]) -
         a.m[0][1] * (a.m[1][0] * a.m[2][2] - a.m[1][2] * a.m[2][0]) +
         a.m[0][2] * (a.m[1][0] * a.m[2][1] - a.m[1][1] * a.m[2][0]);
}

static Mat3 inv3(const Mat3 &a) {
  double d = det3(a);
  Mat3 r;
  r.m[0][0] = (a.m[1][1] * a.m[2][2] - a.m[1][2] * a.m[2][1]) / d;
  r.m[0][1] = (a.m[0][2] * a.m[2][1] - a.m[0][1] * a.m[2][2]) / d;
  r.m[0][2] = (a.m[0][1] * a.m[1][2] - a.m[0][2] * a.m[1][1]) / d;
  r.m[1][0] = (a.m[1][2] * a.m[2][0] - a.m[1][0] * a.m[2][2]) / d;
  r.m[1][1] = (a.m[0][0] * a.m[2][2] - a.m[0][2] * a.m[2][0]) / d;
  r.m[1][2] = (a.m[0][2] * a.m[1][0] - a.m[0][0] * a.m[1][2]) / d;
  r.m[2][0] = (a.m[1][0] * a.m[2][1] - a.m[1][1] * a.m[2][0]) / d;
  r.m[2][1] = (a.m[0][1] * a.m[2][0] - a.m[0][0] * a.m[2][1]) / d;
  r.m[2][2] = (a.m[0][0] * a.m[1][1] - a.m[0][1] * a.m[1][0]) / d;
  return r;
}

static void row_dot(const double v[3], const Mat3 &a, double out[3]) {
  for (int j = 0; j < 3; ++j)
    out[j] = v[0] * a.m[0][j] + v[1] * a.m[1][j] + v[2] * a.m[2][j];
}

static double norm3(const double v[3]) {
  return sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
}

static void lattice_params(const Mat3 &a, double out[6]) {
  double la = norm3(a.m[0]), lb = norm3(a.m[1]), lc = norm3(a.m[2]);
  auto ang = [](const double *u, const double *v) {
    double c = (u[0] * v[0] + u[1] * v[1] + u[2] * v[2]) /
               (norm3(u) * norm3(v));
    c = std::max(-1.0, std::min(1.0, c));
    return std::acos(c) * 180.0 / M_PI;
  };
  out[0] = la;
  out[1] = lb;
  out[2] = lc;
  out[3] = ang(a.m[1], a.m[2]);
  out[4] = ang(a.m[0], a.m[2]);
  out[5] = ang(a.m[0], a.m[1]);
}

// -------------------------------------------------------------- hungarian --
// O(n^3) Hungarian (Kuhn-Munkres, potentials formulation). cost is n x n
// row-major. Writes assignment col index per row into match_out.
static double hungarian(const std::vector<double> &cost, int n,
                        std::vector<int> &match_out) {
  const double INF = 1e30;
  std::vector<double> u(n + 1, 0), v(n + 1, 0);
  std::vector<int> p(n + 1, 0), way(n + 1, 0);
  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(n + 1, INF);
    std::vector<char> used(n + 1, false);
    do {
      used[j0] = true;
      int i0 = p[j0], j1 = 0;
      double delta = INF;
      for (int j = 1; j <= n; ++j) {
        if (used[j]) continue;
        double cur = cost[(i0 - 1) * n + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  match_out.assign(n, -1);
  double total = 0;
  for (int j = 1; j <= n; ++j) {
    if (p[j] > 0) {
      match_out[p[j] - 1] = j - 1;
      total += cost[(p[j] - 1) * n + (j - 1)];
    }
  }
  return total;
}

}  // namespace

extern "C" {

// ------------------------------------------------------------- niggli ----
// In-place Niggli reduction of a row-vector lattice (9 doubles, row-major).
// Returns 0 on success, 1 if not converged.
int ctpu_niggli_reduce(double *mat, double tol, int max_iter) {
  Mat3 a;
  std::memcpy(a.m, mat, 9 * sizeof(double));
  double e = tol * std::cbrt(std::abs(det3(a)));

  auto metrics = [&](double &A, double &B, double &C, double &xi, double &eta,
                     double &zeta) {
    A = a.m[0][0] * a.m[0][0] + a.m[0][1] * a.m[0][1] + a.m[0][2] * a.m[0][2];
    B = a.m[1][0] * a.m[1][0] + a.m[1][1] * a.m[1][1] + a.m[1][2] * a.m[1][2];
    C = a.m[2][0] * a.m[2][0] + a.m[2][1] * a.m[2][1] + a.m[2][2] * a.m[2][2];
    xi = 2 * (a.m[1][0] * a.m[2][0] + a.m[1][1] * a.m[2][1] +
              a.m[1][2] * a.m[2][2]);
    eta = 2 * (a.m[0][0] * a.m[2][0] + a.m[0][1] * a.m[2][1] +
               a.m[0][2] * a.m[2][2]);
    zeta = 2 * (a.m[0][0] * a.m[1][0] + a.m[0][1] * a.m[1][1] +
                a.m[0][2] * a.m[1][2]);
  };
  for (int it = 0; it < max_iter; ++it) {
    double A, B, C, xi, eta, zeta;
    metrics(A, B, C, xi, eta, zeta);
    // A1: swap a,b (negate c)
    if (A > B + e || (abs(A - B) < e && abs(xi) > abs(eta) + e)) {
      Mat3 b = a;
      for (int c = 0; c < 3; ++c) {
        a.m[0][c] = b.m[1][c];
        a.m[1][c] = b.m[0][c];
        a.m[2][c] = -b.m[2][c];
      }
      continue;
    }
    metrics(A, B, C, xi, eta, zeta);
    // A2: swap b,c (negate a)
    if (B > C + e || (abs(B - C) < e && abs(eta) > abs(zeta) + e)) {
      Mat3 b = a;
      for (int c = 0; c < 3; ++c) {
        a.m[0][c] = -b.m[0][c];
        a.m[1][c] = b.m[2][c];
        a.m[2][c] = b.m[1][c];
      }
      continue;
    }
    // A3/A4: sign fixing
    int l = xi > e ? 1 : (xi < -e ? -1 : 0);
    int m = eta > e ? 1 : (eta < -e ? -1 : 0);
    int n = zeta > e ? 1 : (zeta < -e ? -1 : 0);
    double s[3] = {1, 1, 1};
    if (l * m * n == 1) {
      s[0] = (l == -1) ? -1 : 1;
      s[1] = (m == -1) ? -1 : 1;
      s[2] = (n == -1) ? -1 : 1;
    } else {
      int undef = -1;
      double prod = 1;
      int vals[3] = {l, m, n};
      for (int k = 0; k < 3; ++k) {
        if (vals[k] == 1) {
          s[k] = -1;
          prod *= -1;
        } else if (vals[k] == 0) {
          undef = k;
        }
      }
      if (prod < 0 && undef >= 0) s[undef] = -1;
    }
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) a.m[r][c] *= s[r];
    metrics(A, B, C, xi, eta, zeta);

    // A5
    if (abs(xi) > B + e || (abs(B - xi) < e && 2 * eta < zeta - e) ||
        (abs(B + xi) < e && zeta < -e)) {
      double sgn = xi > 0 ? -1.0 : 1.0;
      for (int c = 0; c < 3; ++c) a.m[2][c] += sgn * a.m[1][c];
      continue;
    }
    // A6
    if (abs(eta) > A + e || (abs(A - eta) < e && 2 * xi < zeta - e) ||
        (abs(A + eta) < e && zeta < -e)) {
      double sgn = eta > 0 ? -1.0 : 1.0;
      for (int c = 0; c < 3; ++c) a.m[2][c] += sgn * a.m[0][c];
      continue;
    }
    // A7
    if (abs(zeta) > A + e || (abs(A - zeta) < e && 2 * xi < eta - e) ||
        (abs(A + zeta) < e && eta < -e)) {
      double sgn = zeta > 0 ? -1.0 : 1.0;
      for (int c = 0; c < 3; ++c) a.m[1][c] += sgn * a.m[0][c];
      continue;
    }
    // A8
    if (xi + eta + zeta + A + B < -e ||
        (abs(xi + eta + zeta + A + B) < e && 2 * (A + eta) + zeta > e)) {
      for (int c = 0; c < 3; ++c) a.m[2][c] += a.m[0][c] + a.m[1][c];
      continue;
    }
    std::memcpy(mat, a.m, 9 * sizeof(double));
    return 0;
  }
  return 1;
}

// ----------------------------------------------------- periodic distance --
// Min-image pairwise distance matrix over the 3x3x3 images.
// lat: 9 doubles row-major; frac: n*3; out: n*n.
void ctpu_distance_matrix(int n, const double *lat, const double *frac,
                          double *out) {
  Mat3 L;
  std::memcpy(L.m, lat, 9 * sizeof(double));
  std::vector<double> cart(n * 3);
  for (int i = 0; i < n; ++i) row_dot(&frac[i * 3], L, &cart[i * 3]);
  double img[27][3];
  int t = 0;
  for (int i = -1; i <= 1; ++i)
    for (int j = -1; j <= 1; ++j)
      for (int k = -1; k <= 1; ++k) {
        double f[3] = {(double)i, (double)j, (double)k};
        row_dot(f, L, img[t]);
        ++t;
      }
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) {
      double best = 1e300;
      for (int c = 0; c < 27; ++c) {
        double dx = cart[j * 3] + img[c][0] - cart[i * 3];
        double dy = cart[j * 3 + 1] + img[c][1] - cart[i * 3 + 1];
        double dz = cart[j * 3 + 2] + img[c][2] - cart[i * 3 + 2];
        double d = dx * dx + dy * dy + dz * dz;
        if (d < best) best = d;
      }
      out[i * n + j] = sqrt(best);
    }
}

double ctpu_min_pair_distance(int n, const double *lat, const double *frac) {
  if (n < 1) return 1e300;
  std::vector<double> dm(n * n);
  ctpu_distance_matrix(n, lat, frac, dm.data());
  double best = 1e300;
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j)
      if (i != j && dm[i * n + j] < best) best = dm[i * n + j];
  // self-image distances
  Mat3 L;
  std::memcpy(L.m, lat, 9 * sizeof(double));
  for (int c = 0; c < 27; ++c) {
    int i = c / 9 - 1, j = (c / 3) % 3 - 1, k = c % 3 - 1;
    if (i == 0 && j == 0 && k == 0) continue;
    double f[3] = {(double)i, (double)j, (double)k};
    double v[3];
    row_dot(f, L, v);
    double d = norm3(v);
    if (d < best) best = d;
  }
  return best;
}
// ----------------------------------------------------- structure matching --
// Returns 1 if the two structures match, 0 otherwise.
// latX: 9 doubles; fracX: n*3; typesX: n ints. Same n (checked by caller;
// formula-unit/supercell matching is handled by the Python wrapper, which
// builds HNF supercells and calls this equal-size core).
//
// Algorithm (mirrors chem/matcher.py, calibrated against the published
// pymatgen criteria — results/matcher_calibration.json):
//   Niggli frames -> candidate bases = unimodular integer combinations of
//   the second Niggli cell with matching lengths/angles -> anchor
//   translations -> per-species Hungarian assignment on periodic
//   displacements -> mean-displacement translation refinement ->
//   max normalized per-site displacement acceptance
//   (max_i |d_i| / (V/n)^(1/3) <= stol — pymatgen fit(), use_rms=False).
int ctpu_structures_fit(int n, const double *lat1_in, const double *frac1_in,
                        const int32_t *types1, const double *lat2_in,
                        const double *frac2_in, const int32_t *types2,
                        double ltol, double stol, double angle_tol,
                        int do_scale) {
  // Niggli frames
  Mat3 L1, L2;
  std::memcpy(L1.m, lat1_in, 9 * sizeof(double));
  std::memcpy(L2.m, lat2_in, 9 * sizeof(double));
  Mat3 R1 = L1, R2 = L2;
  double r1[9], r2[9];
  std::memcpy(r1, L1.m, 72);
  std::memcpy(r2, L2.m, 72);
  ctpu_niggli_reduce(r1, 1e-5, 100);
  ctpu_niggli_reduce(r2, 1e-5, 100);
  std::memcpy(R1.m, r1, 72);
  std::memcpy(R2.m, r2, 72);

  // re-express fracs in reduced bases: f' = f @ L @ R^-1, wrapped
  Mat3 T1 = inv3(R1), T2 = inv3(R2);
  std::vector<double> f1(n * 3), f2(n * 3);
  for (int i = 0; i < n; ++i) {
    double cart[3], fr[3];
    row_dot(&frac1_in[i * 3], L1, cart);
    row_dot(cart, T1, fr);
    for (int d = 0; d < 3; ++d)
      f1[i * 3 + d] = fr[d] - std::floor(fr[d]);
    row_dot(&frac2_in[i * 3], L2, cart);
    row_dot(cart, T2, fr);
    for (int d = 0; d < 3; ++d)
      f2[i * 3 + d] = fr[d] - std::floor(fr[d]);
  }

  if (do_scale) {
    double ratio = std::cbrt(std::abs(det3(R1)) /
                             std::max(std::abs(det3(R2)), 1e-12));
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) R2.m[r][c] *= ratio;
  }

  double p1[6];
  lattice_params(R1, p1);
  double vol = std::abs(det3(R1));
  double norm = std::cbrt(vol / n);

  // species bookkeeping + anchor species (rarest in structure 1)
  int counts[256] = {0};
  for (int i = 0; i < n; ++i) counts[types1[i] & 0xff]++;
  int anchor_sp = -1, anchor_cnt = 1 << 30;
  for (int sp = 0; sp < 256; ++sp)
    if (counts[sp] > 0 && counts[sp] < anchor_cnt) {
      anchor_cnt = counts[sp];
      anchor_sp = sp;
    }
  int idx1_anchor = -1;
  for (int i = 0; i < n; ++i)
    if ((types1[i] & 0xff) == anchor_sp) {
      idx1_anchor = i;
      break;
    }
  std::vector<int> species;
  for (int sp = 0; sp < 256; ++sp)
    if (counts[sp] > 0) species.push_back(sp);

  // candidate bases: integer coefficient vectors in [-2,2]^3 whose lattice
  // vectors match R1's lengths within ltol (capped per axis), assembled
  // into unimodular triples with matching angles
  const int MAX_AXIS = 12;
  struct Cand {
    double rel;
    double v[3];     // integer coefficients
    double len;
  };
  std::vector<Cand> axis_cands[3];
  for (int ci = -2; ci <= 2; ++ci)
    for (int cj = -2; cj <= 2; ++cj)
      for (int ck = -2; ck <= 2; ++ck) {
        if (!ci && !cj && !ck) continue;
        double coeff[3] = {(double)ci, (double)cj, (double)ck};
        double vec[3];
        row_dot(coeff, R2, vec);
        double len = norm3(vec);
        for (int ax = 0; ax < 3; ++ax) {
          double rel = std::abs(len - p1[ax]) / std::max(p1[ax], 1e-9);
          if (rel <= ltol)
            axis_cands[ax].push_back({rel, {coeff[0], coeff[1], coeff[2]},
                                      len});
        }
      }
  for (int ax = 0; ax < 3; ++ax) {
    if (axis_cands[ax].empty()) return 0;
    std::sort(axis_cands[ax].begin(), axis_cands[ax].end(),
              [](const Cand &a, const Cand &b) { return a.rel < b.rel; });
    if ((int)axis_cands[ax].size() > MAX_AXIS)
      axis_cands[ax].resize(MAX_AXIS);
  }

  std::vector<double> g(n * 3);        // f2 in the candidate basis
  std::vector<double> cost;
  std::vector<int> match;
  for (const Cand &c0 : axis_cands[0])
    for (const Cand &c1 : axis_cands[1])
      for (const Cand &c2 : axis_cands[2]) {
        Mat3 M;
        for (int d = 0; d < 3; ++d) {
          M.m[0][d] = c0.v[d];
          M.m[1][d] = c1.v[d];
          M.m[2][d] = c2.v[d];
        }
        double det = det3(M);
        if (std::abs(std::abs(det) - 1.0) > 1e-9) continue;
        // basis = M @ R2
        Mat3 basis;
        for (int r = 0; r < 3; ++r)
          for (int cc = 0; cc < 3; ++cc)
            basis.m[r][cc] = M.m[r][0] * R2.m[0][cc] +
                             M.m[r][1] * R2.m[1][cc] +
                             M.m[r][2] * R2.m[2][cc];
        double pb[6];
        lattice_params(basis, pb);
        bool ok = true;
        for (int k = 3; k < 6 && ok; ++k)
          if (std::abs(p1[k] - pb[k]) > angle_tol) ok = false;
        if (!ok) continue;

        // f2' = f2 @ inv(M) (inv of a unimodular matrix), wrapped
        Mat3 Minv = inv3(M);
        for (int i = 0; i < n; ++i) {
          double fr[3];
          row_dot(&f2[i * 3], Minv, fr);
          for (int d = 0; d < 3; ++d)
            g[i * 3 + d] = fr[d] - std::floor(fr[d]);
        }
        Mat3 Binv = inv3(basis);

        // anchor translations
        for (int j = 0; j < n; ++j) {
          if ((types2[j] & 0xff) != anchor_sp) continue;
          double shift[3];
          for (int d = 0; d < 3; ++d) {
            shift[d] = g[j * 3 + d] - f1[idx1_anchor * 3 + d];
            shift[d] -= std::floor(shift[d]);
          }
          // per-species assignment + one translation-refinement pass.
          // Acceptance is on the MAX per-site displacement (pymatgen
          // fit(), use_rms=False): a single site beyond stol*norm fails
          // the match even when the rms is small, so no sub-stol*norm
          // prune is valid and refinement must see the full assignment.
          for (int pass = 0; pass < 2; ++pass) {
            double max_d = 0, disp_sum[3] = {0, 0, 0};
            bool fail = false;
            for (int sp : species) {
              std::vector<int> i1, i2;
              for (int i = 0; i < n; ++i) {
                if ((types1[i] & 0xff) == sp) i1.push_back(i);
                if ((types2[i] & 0xff) == sp) i2.push_back(i);
              }
              if (i1.size() != i2.size()) {
                fail = true;
                break;
              }
              int m = (int)i1.size();
              cost.assign((size_t)m * m, 0.0);
              // cache matched cart vectors to accumulate the mean disp
              std::vector<double> cart_all((size_t)m * m * 3);
              for (int a = 0; a < m; ++a)
                for (int b = 0; b < m; ++b) {
                  double d[3];
                  for (int dd = 0; dd < 3; ++dd) {
                    double diff = f1[i1[a] * 3 + dd] -
                                  (g[i2[b] * 3 + dd] - shift[dd]);
                    diff -= std::round(diff);
                    d[dd] = diff;
                  }
                  double cartv[3];
                  row_dot(d, basis, cartv);
                  std::memcpy(&cart_all[((size_t)a * m + b) * 3], cartv,
                              3 * sizeof(double));
                  cost[(size_t)a * m + b] = norm3(cartv);
                }
              match.clear();
              hungarian(cost, m, match);
              for (int a = 0; a < m; ++a) {
                double dd = cost[(size_t)a * m + match[a]];
                if (dd > max_d) max_d = dd;
                const double *cv = &cart_all[((size_t)a * m + match[a]) * 3];
                disp_sum[0] += cv[0];
                disp_sum[1] += cv[1];
                disp_sum[2] += cv[2];
              }
            }
            if (fail) break;
            if (max_d / norm <= stol) return 1;
            // refine: move shift so the mean displacement vanishes
            double mean_cart[3] = {disp_sum[0] / n, disp_sum[1] / n,
                                   disp_sum[2] / n};
            double mean_frac[3];
            row_dot(mean_cart, Binv, mean_frac);
            for (int d = 0; d < 3; ++d) {
              shift[d] -= mean_frac[d];
              shift[d] -= std::floor(shift[d]);
            }
          }
        }
      }
  return 0;
}

}  // extern "C"
