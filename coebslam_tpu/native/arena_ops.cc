// Native host-runtime kernels for the map arena.
//
// The reference's entire runtime is native C++ (libORB_SLAM2.so, SURVEY
// §2.1); in this framework the TPU executes all numerical compute, and the
// host runtime's remaining hot loops — observation-table assembly for bundle
// adjustment windows and per-point distinctive-descriptor selection
// (MapPoint::ComputeDistinctiveDescriptors, MapPoint.cc:287-298) — live
// here.  Exposed with C linkage and called through ctypes on plain numpy
// buffers; coebslam_tpu/native/__init__.py builds this file on first use
// and falls back to the vectorized-numpy implementations if no compiler is
// available.
//
// Build: g++ -O3 -march=native -shared -fPIC arena_ops.cc -o libarena_ops.so

#include <cstdint>
#include <cstring>

extern "C" {

// Popcount-based Hamming distance between two 32-byte descriptors.
static inline int hamming32(const uint8_t* a, const uint8_t* b) {
    uint64_t x;
    uint64_t y;
    int d = 0;
    for (int i = 0; i < 4; ++i) {
        std::memcpy(&x, a + 8 * i, 8);
        std::memcpy(&y, b + 8 * i, 8);
        d += __builtin_popcountll(x ^ y);
    }
    return d;
}

// Fill the fixed-shape [P, M] BA observation table for a window.
//
//   pt_obs_kf / pt_obs_slot : [n_pts_total_rows? no: n_pts, max_obs]
//      back-references of the SELECTED points (already gathered rows).
//   kf_index_map            : [n_kf_global] window index per global KF (-1).
//   kf_uv / kf_ur / kf_level: global keyframe SoA arrays ([K, N, 2] etc.).
//
// Outputs (pre-allocated, [n_pts, M]): window-KF index, (u, v, ur),
// information weight 1/sigma^2, validity.
void fill_ba_obs_table(
    const int32_t* pt_obs_kf, const int32_t* pt_obs_slot,
    int64_t n_pts, int64_t max_obs,
    const int32_t* kf_index_map,
    const float* kf_uv, const float* kf_ur, const int32_t* kf_level,
    int64_t n_slots, double sf2, int64_t M,
    int32_t* obs_kf_out, float* obs_uvr_out, float* obs_w_out,
    uint8_t* obs_valid_out) {
    for (int64_t p = 0; p < n_pts; ++p) {
        int64_t m = 0;
        for (int64_t c = 0; c < max_obs && m < M; ++c) {
            const int32_t kf = pt_obs_kf[p * max_obs + c];
            if (kf < 0) continue;
            const int32_t w = kf_index_map[kf];
            if (w < 0) continue;
            const int32_t s = pt_obs_slot[p * max_obs + c];
            const int64_t base = ((int64_t)kf * n_slots + s);
            obs_kf_out[p * M + m] = w;
            obs_uvr_out[(p * M + m) * 3 + 0] = kf_uv[base * 2 + 0];
            obs_uvr_out[(p * M + m) * 3 + 1] = kf_uv[base * 2 + 1];
            obs_uvr_out[(p * M + m) * 3 + 2] = kf_ur[base];
            double s2 = 1.0;
            for (int l = 0; l < kf_level[base]; ++l) s2 *= sf2;
            obs_w_out[p * M + m] = (float)(1.0 / s2);
            obs_valid_out[p * M + m] = 1;
            ++m;
        }
    }
}

// Distinctive descriptor per point: the observation descriptor with minimal
// median Hamming distance to the point's other observations.
//
//   kf_desc : [n_kf, n_slots, 32] global descriptor array.
//   Returns the chosen (kf, slot) per point via best_kf/best_slot and copies
//   the descriptor into out_desc [n_pts, 32].
void distinctive_descriptors(
    const uint8_t* kf_desc, int64_t n_slots,
    const int32_t* pt_obs_kf, const int32_t* pt_obs_slot,
    int64_t n_pts, int64_t max_obs,
    uint8_t* out_desc, int32_t* best_kf, int32_t* best_slot) {
    int dists[64][64];
    const uint8_t* descs[64];
    int kfs[64];
    int slots[64];
    for (int64_t p = 0; p < n_pts; ++p) {
        int m = 0;
        for (int64_t c = 0; c < max_obs && m < 64; ++c) {
            const int32_t kf = pt_obs_kf[p * max_obs + c];
            if (kf < 0) continue;
            const int32_t s = pt_obs_slot[p * max_obs + c];
            descs[m] = kf_desc + ((int64_t)kf * n_slots + s) * 32;
            kfs[m] = kf;
            slots[m] = s;
            ++m;
        }
        if (m == 0) { best_kf[p] = -1; best_slot[p] = -1; continue; }
        for (int i = 0; i < m; ++i) {
            dists[i][i] = 0;
            for (int j = i + 1; j < m; ++j) {
                const int d = hamming32(descs[i], descs[j]);
                dists[i][j] = d;
                dists[j][i] = d;
            }
        }
        int best = 0;
        int best_med = 1 << 30;
        int row[64];
        for (int i = 0; i < m; ++i) {
            for (int j = 0; j < m; ++j) row[j] = dists[i][j];
            // insertion sort (m <= 64)
            for (int a = 1; a < m; ++a) {
                const int v = row[a];
                int b = a - 1;
                while (b >= 0 && row[b] > v) { row[b + 1] = row[b]; --b; }
                row[b + 1] = v;
            }
            const int med = row[m / 2];
            if (med < best_med) { best_med = med; best = i; }
        }
        std::memcpy(out_desc + p * 32, descs[best], 32);
        best_kf[p] = kfs[best];
        best_slot[p] = slots[best];
    }
}

// Covisibility recount for one keyframe: shared-point counts against every
// other keyframe (KeyFrame::UpdateConnections, KeyFrame.cc:289-379).
void covisibility_row(
    const int32_t* kf_obs_pt, int64_t n_kf, int64_t n_slots,
    int64_t kf_id, uint8_t* scratch_mask, int64_t n_points,
    int32_t* counts_out) {
    std::memset(scratch_mask, 0, n_points);
    const int32_t* own = kf_obs_pt + kf_id * n_slots;
    for (int64_t s = 0; s < n_slots; ++s) {
        if (own[s] >= 0 && own[s] < n_points) scratch_mask[own[s]] = 1;
    }
    for (int64_t k = 0; k < n_kf; ++k) {
        int32_t cnt = 0;
        if (k != kf_id) {
            const int32_t* row = kf_obs_pt + k * n_slots;
            for (int64_t s = 0; s < n_slots; ++s) {
                const int32_t pid = row[s];
                if (pid >= 0 && pid < n_points && scratch_mask[pid]) ++cnt;
            }
        }
        counts_out[k] = cnt;
    }
}

}  // extern "C"
