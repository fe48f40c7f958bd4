// Native CPU oracle of the reference numerics (C++, OpenMP).
//
// Independent transcription of the *semantics* of the reference kernels
// (python_wrapper/seabreezediag/seabreeze_diag_python.f90:49-311 and
// sobel.f90:19-193 — see SURVEY.md §2.1-2.4) into float32 C++.  Mirrors
// tests/golden/reference_numpy.py exactly (same index maps, same float32
// operation order in the accumulation-sensitive spots) but runs ~1000x
// faster, so golden tests and the CPU baseline use this when built.
//
// Layout: row-major (nlat, nlon), 0-based; u/v are (nlev, nlat, nlon).
// Differences from the Fortran by design (documented in the NumPy oracle):
//   * get_dist is implemented in gather form (min is commutative and the
//     sign depends only on the target cell, so the result is identical to
//     the reference's scatter loop and deterministic under OpenMP);
//   * the |cdist| > 2*maxdist -> 12000 reset is a deterministic final pass.

#include <cmath>
#include <cstdint>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

const float R_EARTH = 6370.9989f;   // sobel.f90:115
const float PI_F = 3.1415926f;      // sobel.f90:116
const float D2R = PI_F / 180.0f;
const float RAD2DEG = 57.2957f;     // seabreeze_diag_python.f90:125
const float GMMA = -0.0060956f;     // seabreeze_diag_python.f90:126

inline int lon_quirky(int j, int nlon) {
  // Fortran max(1, modulo(j, nlons)) on 1-based j -> 0-based result.
  int m = (j + 1) % nlon;
  if (m < 0) m += nlon;
  return std::max(1, m) - 1;
}

inline int lat_clamp(int i, int nlat) {
  return std::min(std::max(0, i), nlat - 1);
}

inline float branch_lon(float lonval) {
  // sobel.f90:165-174 — re-branch to (-180, 180] degrees, in radians.
  return (lonval > 180.0f) ? D2R * (lonval - 360.0f) : D2R * lonval;
}

inline float haversine(float phi1, float phi2, float l1, float l2) {
  float dphi = phi1 - phi2;
  float dlam = l1 - l2;
  float sp = sinf(dphi / 2.0f);
  float sl = sinf(dlam / 2.0f);
  float a = sp * sp + cosf(phi1) * (cosf(phi2) * (sl * sl));
  return R_EARTH * 2.0f * atan2f(sqrtf(a), sqrtf(1.0f - a)) + 0.5f;
}

}  // namespace

extern "C" {

int sb_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

// sobel.f90:19-89 — land+ice mask -> binary Sobel coastline.
void sb_get_edges(const float* lsm, const float* ci, int nlat, int nlon,
                  float* coast) {
  static const float w[3][3] = {{-1, 0, 1}, {-2, 0, 2}, {-1, 0, 1}};
#pragma omp parallel for schedule(static)
  for (int y = 0; y < nlat; ++y) {
    for (int x = 0; x < nlon; ++x) {
      float px = 0.0f, py = 0.0f;
      for (int jof = -1; jof <= 1; ++jof) {
        for (int iof = -1; iof <= 1; ++iof) {
          int yy = lat_clamp(y + iof, nlat);
          int xx = lon_quirky(x + jof, nlon);
          float m = lsm[yy * nlon + xx] + (ci ? ci[yy * nlon + xx] : 0.0f);
          float mm = (m > 0.4f) ? 1.0f : 0.0f;
          px += w[iof + 1][jof + 1] * mm;
          py += w[jof + 1][iof + 1] * mm;
        }
      }
      coast[y * nlon + x] = (px != 0.0f || py != 0.0f) ? 1.0f : 0.0f;
    }
  }
}

// sobel.f90:129-137 — k = int(maxdist / dx(70 deg)).
int sb_search_radius(const float* lon, const float* lat, int nlat, int nlon,
                     float maxdist) {
  (void)nlon;
  int tlat = 0;
  float best = fabsf(70.0f - lat[0]);
  for (int i = 1; i < nlat; ++i) {
    float d = fabsf(70.0f - lat[i]);
    if (d < best) { best = d; tlat = i; }
  }
  if (tlat + 1 >= nlat) tlat = nlat - 2;
  float phi_a = D2R * lat[tlat], phi_b = D2R * lat[tlat + 1];
  float dphi = phi_b - phi_a;
  float dlam = D2R * lon[1] - D2R * lon[0];
  float sp = sinf(dphi / 2.0f), sl = sinf(dlam / 2.0f);
  float a = sp * sp + cosf(phi_b) * (cosf(phi_a) * (sl * sl));
  float dx = R_EARTH * 2.0f * atan2f(sqrtf(a), sqrtf(1.0f - a));
  return (int)(maxdist / dx);
}

// sobel.f90:91-193 — signed km distance to the nearest coastline cell
// (gather form; see file header).
void sb_get_dist(const float* coast, const float* mask, const float* lon,
                 const float* lat, int nlat, int nlon, float maxdist,
                 float* cdist) {
  int k = sb_search_radius(lon, lat, nlat, nlon, maxdist);
#pragma omp parallel for schedule(static)
  for (int yy = 0; yy < nlat; ++yy) {
    float phi_t;
    for (int xx = 0; xx < nlon; ++xx) {
      float best = 12000.0f;  // sobel.f90:141-149 sentinel
      float l2 = branch_lon(lon[xx]);
      for (int i = std::max(0, yy - k); i <= std::min(nlat - 1, yy + k);
           ++i) {
        float phi_s = D2R * lat[i];
        phi_t = D2R * lat[yy];
        for (int jj = -k; jj <= k; ++jj) {
          int j = ((xx + jj) % nlon + nlon) % nlon;
          if (coast[i * nlon + j] > 0.0f) {
            float c = haversine(phi_s, phi_t, branch_lon(lon[j]), l2);
            if (c < best) best = c;
          }
        }
      }
      float v = (mask[yy * nlon + xx] > 0.0f) ? best : -best;
      if (fabsf(v) > 2.0f * maxdist) v = 12000.0f;  // sobel.f90:188
      cdist[yy * nlon + xx] = v;
    }
  }
}

// seabreeze_diag_python.f90:287-311 — logistic orography weight.
void sb_sigmoid(const float* a, int64_t n, float* out) {
  double total = 0.0;
  float amax = a[0], amin_ = a[0];
  for (int64_t i = 0; i < n; ++i) {
    total += a[i];
    amax = std::max(amax, a[i]);
    amin_ = std::min(amin_, a[i]);
  }
  float mean = (float)(total / (double)n);
  double var = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    float d = a[i] - mean;
    var += (double)(d * d);
  }
  float s = 2.0f / sqrtf((float)(var / (double)n));
  float r = (amax - amin_) / 4.0f;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    out[i] = 1.0f / (1.0f + expf(-s * (a[i] - r)));
}

// seabreeze_diag_python.f90:49-285 — one trigger timestep.
// output is (4, nlat, nlon): sb_con, t0, windspeed, winddir (:277-280).
// State arrays (windspeed, winddir, thc) are updated in place.
void sb_diag(int tt, const float* p, int nlev, const float* z,
             const float* std_, const float* theta, const float* v,
             const float* u, const float* cdist, float* windspeed,
             float* winddir, float* thc, int nlat, int nlon,
             float target_plev, float thresh_wind, float thresh_winddir,
             float thresh_windch, float thresh_thc, float target_time,
             float timestep, float maxdist, float* output) {
  const int64_t N = (int64_t)nlat * nlon;
  float timestep_s = timestep * 60.0f;          // :146
  float target_time_s = target_time * 3600.0f;  // :147
  float target_plev_pa = target_plev * 100.0f;  // :148

  float* smod = new float[N];
  sb_sigmoid(std_, N, smod);
  float* t0 = new float[N];
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < N; ++i)
    t0[i] = theta[i] - (GMMA * z[i] * smod[i]);  // :158

  int p_lev = 0;  // :228 — nearest pressure level (constant per call)
  {
    float best = fabsf(p[0] - target_plev_pa);
    for (int l = 1; l < nlev; ++l) {
      float d = fabsf(p[l] - target_plev_pa);
      if (d < best) { best = d; p_lev = l; }
    }
  }
  bool wind_update = fmodf((float)tt * timestep_s, target_time_s) < 1.0e-4f;

  for (int64_t i = 0; i < 4 * N; ++i) output[i] = 0.0f;

#pragma omp parallel for schedule(dynamic, 4)
  for (int i = 0; i < nlat - 1; ++i) {  // :165  do i=1,nlats-1
    for (int j = 0; j < nlon; ++j) {
      int64_t ij = (int64_t)i * nlon + j;
      float sb = 0.0f;
      if (fabsf(cdist[ij]) > maxdist) {  // :171
        sb = 2.0e20f;
      } else {
        float mul = (cdist[ij] >= 0.0f) ? 1.0f : -1.0f;
        float n_l, n_s, T_l, T_s;
        for (int nn = 1;; ++nn) {  // :191 expanding ring
          n_l = n_s = T_l = T_s = 0.0f;
          for (int ii = i - nn; ii <= i + nn; ++ii) {
            int ki = lat_clamp(ii, nlat);  // :201
            for (int jj = j - nn; jj <= j + nn; ++jj) {
              int kj = lon_quirky(jj, nlon);  // :202
              float cv = cdist[(int64_t)ki * nlon + kj];
              float tv = t0[(int64_t)ki * nlon + kj];
              if (cv >= 0.0f) { T_l += tv; n_l += 1.0f; }
              else            { T_s += tv; n_s += 1.0f; }
            }
          }
          if (n_s > 0.0f && n_l > 0.0f) break;
        }
        float n_thc = mul * (T_l / n_l - T_s / n_s);  // :221

        int64_t uvij = (int64_t)p_lev * N + ij;
        float n_ws = sqrtf(u[uvij] * u[uvij] + v[uvij] * v[uvij]);
        float n_wd = atan2f(-u[uvij], -v[uvij]) * RAD2DEG;

        if (tt < 2) {  // :236-240 first-step seeding
          thc[ij] = n_thc;
          winddir[ij] = n_wd;
          windspeed[ij] = n_ws;
        }

        float thc_abs = fabsf(n_thc);
        float mws = (windspeed[ij] + n_ws) / 2.0f;
        float dws = fabsf(windspeed[ij] - n_ws);
        float md = fmodf((winddir[ij] - n_wd) + 180.0f, 360.0f);
        if (md < 0.0f) md += 360.0f;  // numpy/Fortran modulo sign
        float dwd = fabsf(md - 180.0f);

        if (dwd < thresh_winddir && dws < thresh_windch &&
            mws < thresh_wind && thc_abs > thresh_thc) {  // :253-263
          float scale_wind = (thresh_wind - mws) / std::max(1.0f, mws);
          float scale_thc = (thc_abs - thresh_thc) / n_thc;
          sb = scale_thc * scale_wind;
        } else {
          sb = 0.0f;
        }

        thc[ij] = n_thc;  // :268
        if (wind_update) {  // :271-274 — 6-hourly cadence
          windspeed[ij] = n_ws;
          winddir[ij] = n_wd;
        }
      }
      output[0 * N + ij] = sb;            // :277-280
      output[1 * N + ij] = t0[ij];
      output[2 * N + ij] = windspeed[ij];
      output[3 * N + ij] = winddir[ij];
    }
  }
  delete[] smod;
  delete[] t0;
}

}  // extern "C"
