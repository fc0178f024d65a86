// Native scan preprocessing: the hot host-side path of the data loader.
//
// Capability parity with the reference's C++ preprocessing chain:
//   - 1/filter_num decimation + blind-radius removal
//     (/root/reference/legkilo/src/preprocess/lidar_processing.cc:40-41)
//   - 2 ms per-point time quantization (lidar_processing.cc:48)
//   - centroid voxel-grid downsampling averaging position and time
//     (pcl::VoxelGrid with downsample_all_data, KILO.cc:356-360)
//   - stable time-sort + fixed-shape bucket packing (the host half of the
//     TPU rollout's [n_buckets, pts_per_bucket] contract; KILO.cc:369-378)
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).  The NumPy
// implementation in legkilo_tpu/io/dataset.py is the reference semantics;
// legkilo_tpu/io/native.py validates this library against it.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct VoxelAccum {
    double x = 0, y = 0, z = 0, t = 0, inten = 0;
    int64_t count = 0;
};

inline int64_t pack_key(int64_t kx, int64_t ky, int64_t kz) {
    // 3 x 21-bit biased ints in one int64 (matches dataset.voxel_downsample).
    return ((kx + (1 << 20)) << 42) | ((ky + (1 << 20)) << 21) | (kz + (1 << 20));
}

}  // namespace

extern "C" {

// Returns the number of buckets written (<= nb).  out_counts[0] = points
// after decimation/blind/downsample, out_counts[1] = dropped points
// (bucket/point-capacity overflow), out_counts[2] = raw input count.
// intens / out_intens may be NULL; when given, per-point intensity is
// centroid-averaged alongside position/time (pcl::VoxelGrid
// downsample_all_data parity; carried by PointXYZINormal in the reference,
// lidar_processing.cc:46).
int scanprep_process(
    const float* pts, const float* toff, const float* intens, int n,
    int filter_num, float blind, float leaf, int requantize,
    float* bucket_time, unsigned char* bucket_mask,
    float* points, unsigned char* point_mask, float* out_intens,
    int nb, int pmax,
    int* out_counts) {
    const float blind2 = blind * blind;
    const bool has_i = intens != nullptr && out_intens != nullptr;

    // 1) decimate + blind filter + 2 ms quantization.
    std::vector<float> px, py, pz, pt, pi;
    px.reserve(n / filter_num + 1);
    py.reserve(n / filter_num + 1);
    pz.reserve(n / filter_num + 1);
    pt.reserve(n / filter_num + 1);
    if (has_i) pi.reserve(n / filter_num + 1);
    for (int i = 0; i < n; i += filter_num) {
        const float x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
        if (x * x + y * y + z * z <= blind2) continue;
        px.push_back(x);
        py.push_back(y);
        pz.push_back(z);
        pt.push_back(std::round(toff[i] * 500.0f) / 500.0f);
        if (has_i) pi.push_back(intens[i]);
    }

    // 2) centroid voxel-grid downsample (position + time averaged).
    std::unordered_map<int64_t, VoxelAccum> grid;
    grid.reserve(px.size());
    const double inv_leaf = 1.0 / leaf;
    for (size_t i = 0; i < px.size(); ++i) {
        const int64_t kx = (int64_t)std::floor(px[i] * inv_leaf);
        const int64_t ky = (int64_t)std::floor(py[i] * inv_leaf);
        const int64_t kz = (int64_t)std::floor(pz[i] * inv_leaf);
        VoxelAccum& a = grid[pack_key(kx, ky, kz)];
        a.x += px[i];
        a.y += py[i];
        a.z += pz[i];
        a.t += pt[i];
        if (has_i) a.inten += pi[i];
        a.count++;
    }

    struct P {
        float x, y, z, t, inten;
    };
    std::vector<P> down;
    down.reserve(grid.size());
    for (const auto& kv : grid) {
        const VoxelAccum& a = kv.second;
        float t = (float)(a.t / a.count);
        if (requantize) t = std::round(t * 500.0f) / 500.0f;
        down.push_back({(float)(a.x / a.count), (float)(a.y / a.count),
                        (float)(a.z / a.count), t,
                        has_i ? (float)(a.inten / a.count) : 0.0f});
    }

    // 3) stable sort by quantized time.
    std::stable_sort(down.begin(), down.end(),
                     [](const P& a, const P& b) { return a.t < b.t; });

    // 4) bucketize into fixed shapes.
    std::memset(bucket_mask, 0, nb);
    std::memset(point_mask, 0, (size_t)nb * pmax);
    std::memset(bucket_time, 0, sizeof(float) * nb);
    std::memset(points, 0, sizeof(float) * 3 * (size_t)nb * pmax);
    if (has_i) std::memset(out_intens, 0, sizeof(float) * (size_t)nb * pmax);

    int bucket = -1;
    int fill = 0;
    int dropped = 0;
    float cur_t = 0;
    for (const P& p : down) {
        if (bucket < 0 || p.t != cur_t) {
            if (bucket + 1 >= nb) {
                dropped++;
                continue;  // bucket overflow: drop the tail
            }
            bucket++;
            fill = 0;
            cur_t = p.t;
            bucket_time[bucket] = cur_t;
            bucket_mask[bucket] = 1;
        }
        if (fill >= pmax) {
            dropped++;
            continue;
        }
        float* dst = points + ((size_t)bucket * pmax + fill) * 3;
        dst[0] = p.x;
        dst[1] = p.y;
        dst[2] = p.z;
        if (has_i) out_intens[(size_t)bucket * pmax + fill] = p.inten;
        point_mask[(size_t)bucket * pmax + fill] = 1;
        fill++;
    }

    out_counts[0] = (int)down.size();
    out_counts[1] = dropped;
    out_counts[2] = n;
    return bucket + 1;
}

// Decimate + blind only (first-frame map path; lidar_processing.cc:40-41).
int scanprep_decimate_blind(
    const float* pts, int n, int filter_num, float blind,
    float* out_pts, int capacity) {
    const float blind2 = blind * blind;
    int m = 0;
    for (int i = 0; i < n && m < capacity; i += filter_num) {
        const float x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
        if (x * x + y * y + z * z <= blind2) continue;
        out_pts[3 * m] = x;
        out_pts[3 * m + 1] = y;
        out_pts[3 * m + 2] = z;
        m++;
    }
    return m;
}

}  // extern "C"
