// Native host-side LiDAR packet/point decoding.
//
// Counterpart of the reference's per-sensor decode loops
// (feature_point.hpp:142-366): normalize raw point records into
// padded (xyz, per-point relative time) arrays with decimation and
// blind-range culling in one pass.  The SLAM host runs on few cores
// while scans arrive at 10 Hz x ~100k points, so this path is C++
// (compiled -O3, ctypes-loaded); io/drivers.py falls back to numpy
// when the shared library is unavailable.
//
// Layout contract: points are raw bytes with a fixed stride;
// field offsets are passed in, so one entry point serves all sensor
// types (velodyne/ouster/hesai/robosense/livox).  Time semantics are
// handled per mode:
//   mode 0: relative float32 seconds at off_t
//   mode 1: relative uint32 nanoseconds at off_t (ouster)
//   mode 2: absolute float64 seconds at off_t (hesai) -> subtract t0
//   mode 3: no time field -> azimuth reconstruction (velodyne
//           fallback, feature_point.hpp:200-252, omega = 3610 deg/s)
//   mode 4: relative float32 ms at off_t (robosense-style)

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Returns number of points written (<= max_out).
int decode_points(
    const uint8_t* raw, long n_pts, long stride,
    long off_x, long off_y, long off_z, long off_t, int time_mode,
    double t0, double blind_sq, int filter_num, double max_offset,
    float* out_xyz, float* out_offt, long max_out)
{
    long m = 0;
    const double omega = 3610.0 * M_PI / 180.0;  // deg/s -> rad/s
    double first_yaw = 0.0;
    bool have_first = false;

    for (long i = 0; i < n_pts; i += (filter_num > 0 ? filter_num : 1)) {
        const uint8_t* rec = raw + i * stride;
        float x, y, z;
        std::memcpy(&x, rec + off_x, 4);
        std::memcpy(&y, rec + off_y, 4);
        std::memcpy(&z, rec + off_z, 4);
        double r2 = (double)x * x + (double)y * y + (double)z * z;
        if (r2 < blind_sq || !std::isfinite(r2)) continue;

        double offt = 0.0;
        switch (time_mode) {
        case 0: { float t; std::memcpy(&t, rec + off_t, 4); offt = t; } break;
        case 1: { uint32_t t; std::memcpy(&t, rec + off_t, 4); offt = t * 1e-9; } break;
        case 2: { double t; std::memcpy(&t, rec + off_t, 8); offt = t - t0; } break;
        case 3: {
            double yaw = std::atan2((double)y, (double)x);
            if (!have_first) { first_yaw = yaw; have_first = true; }
            double d = first_yaw - yaw;  // clockwise spin
            while (d < 0) d += 2.0 * M_PI;
            offt = d / omega;
        } break;
        case 4: { float t; std::memcpy(&t, rec + off_t, 4); offt = t * 1e-3; } break;
        }
        if (offt < 0.0 || offt > max_offset) continue;
        if (m >= max_out) break;
        out_xyz[m * 3 + 0] = x;
        out_xyz[m * 3 + 1] = y;
        out_xyz[m * 3 + 2] = z;
        out_offt[m] = (float)offt;
        m++;
    }
    return (int)m;
}

// Sort points by time offset in place (the reference sorts scans by
// curvature before processing, voxelslam.hpp:87).  Simple index sort.
int sort_by_offset(float* xyz, float* offt, long n)
{
    // insertion-ish: counting on mostly-sorted input; fall back to a
    // simple O(n log n) index sort via std::sort
    struct Rec { float t; float x, y, z; };
    // allocate on heap
    Rec* tmp = new Rec[n];
    for (long i = 0; i < n; i++) {
        tmp[i].t = offt[i];
        tmp[i].x = xyz[3 * i];
        tmp[i].y = xyz[3 * i + 1];
        tmp[i].z = xyz[3 * i + 2];
    }
    // std::sort without <algorithm> include shortcut:
    // (include it properly)
    struct Cmp { bool operator()(const Rec& a, const Rec& b) const { return a.t < b.t; } };
    // fallthrough to std::sort below
    extern void __dummy__();  // no-op
    {
        // local include-free sort: simple heapsort to avoid extra deps
        auto sift = [&](long start, long end) {
            long root = start;
            while (2 * root + 1 <= end) {
                long child = 2 * root + 1;
                if (child + 1 <= end && tmp[child].t < tmp[child + 1].t) child++;
                if (tmp[root].t < tmp[child].t) {
                    Rec s = tmp[root]; tmp[root] = tmp[child]; tmp[child] = s;
                    root = child;
                } else break;
            }
        };
        for (long start = (n - 2) / 2; start >= 0; start--) sift(start, n - 1);
        for (long end = n - 1; end > 0; end--) {
            Rec s = tmp[0]; tmp[0] = tmp[end]; tmp[end] = s;
            sift(0, end - 1);
        }
    }
    for (long i = 0; i < n; i++) {
        offt[i] = tmp[i].t;
        xyz[3 * i] = tmp[i].x;
        xyz[3 * i + 1] = tmp[i].y;
        xyz[3 * i + 2] = tmp[i].z;
    }
    delete[] tmp;
    return 0;
}

void __dummy__() {}

// Pre-deskew raw reduction: one representative point per grid cell —
// the point nearest the cell center, keeping ITS OWN timestamp so the
// device's per-point deskew stays exact.  Host-side counterpart of
// the reference's down_sampling_close (tools.hpp; the voxel-average
// variant runs on-device after deskew).  Bounds the device-side raw
// padding (n_raw) without truncating scans: callers coarsen `cell`
// until the result fits max_out.
// Returns the reduced count, or -1 when distinct cells exceed
// max_out (callers coarsen `cell` and retry).  The probe table is
// bounded by max_out, not n, so it stays cache-resident on the small
// SLAM host cores (a 2n-sized table thrashes: ~10 ms for 30k points
// vs ~1 ms with the bounded table).
int voxel_reduce(const float* xyz, const float* offt, long n,
                 double cell, float* out_xyz, float* out_offt,
                 long max_out)
{
    if (n <= 0 || cell <= 0.0 || max_out <= 0) return 0;
    long cap = 1;
    while (cap < 2 * (max_out + 1)) cap <<= 1;
    // Persistent probe state (the SLAM host is single-threaded): the
    // table outlives the call and is cleared via the used-slot list,
    // so each call touches O(uniques) slots instead of alloc+memset of
    // the whole table.  SoA layout keeps the probed keys array small
    // (8 B/slot) for cache residency on the 1-core host.
    // thread_local: ctypes releases the GIL during the call, so a
    // second Python thread entering concurrently must not race on the
    // shared table (each thread pays its own table, which is fine —
    // production uses one packing thread).
    static thread_local int64_t* keys = nullptr;
    static thread_local int32_t* idxs = nullptr;
    static thread_local float* d2s = nullptr;
    static thread_local int32_t* used = nullptr;
    static thread_local long cap_alloc = 0, used_cap = 0;
    const int64_t EMPTY = INT64_MIN;
    if (cap > cap_alloc) {
        delete[] keys; delete[] idxs; delete[] d2s;
        keys = new int64_t[cap];
        idxs = new int32_t[cap];
        d2s = new float[cap];
        for (long s = 0; s < cap; s++) keys[s] = EMPTY;
        cap_alloc = cap;
    }
    if (max_out + 1 > used_cap) {
        delete[] used;
        used = new int32_t[max_out + 1];
        used_cap = max_out + 1;
    }
    const long mask = cap_alloc - 1;
    const float inv = (float)(1.0 / cell);
    const float fcell = (float)cell;
    long uniques = 0;
    bool overflow = false;
    // scan-line coherence: consecutive rays often land in the same
    // cell — remember the last slot and skip the whole probe
    int64_t last_key = EMPTY;
    long last_slot = 0;
    for (long i = 0; i < n; i++) {
        float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
        float fx = floorf(x * inv), fy = floorf(y * inv),
              fz = floorf(z * inv);
        int64_t key = ((int64_t)((long)fx & 0x1FFFFF) << 42)
                    | ((int64_t)((long)fy & 0x1FFFFF) << 21)
                    | (int64_t)((long)fz & 0x1FFFFF);
        float dx = x - (fx + 0.5f) * fcell;
        float dy = y - (fy + 0.5f) * fcell;
        float dz = z - (fz + 0.5f) * fcell;
        float d2 = dx * dx + dy * dy + dz * dz;
        long s;
        if (key == last_key) {
            s = last_slot;
        } else {
            uint64_t h = (uint64_t)key * 0x9E3779B97F4A7C15ull;
            s = (long)((h >> 32) & (uint64_t)mask);
            while (keys[s] != EMPTY && keys[s] != key)
                s = (s + 1) & mask;
            if (keys[s] == EMPTY) {
                if (uniques >= max_out) { overflow = true; break; }
                keys[s] = key;
                idxs[s] = (int32_t)i;
                d2s[s] = 1e30f;
                used[uniques++] = (int32_t)s;
            }
            last_key = key;
            last_slot = s;
        }
        if (d2 < d2s[s]) { idxs[s] = (int32_t)i; d2s[s] = d2; }
    }
    long m = 0;
    if (!overflow) {
        for (long u = 0; u < uniques; u++) {
            long i = idxs[used[u]];
            out_xyz[3 * m + 0] = xyz[3 * i + 0];
            out_xyz[3 * m + 1] = xyz[3 * i + 1];
            out_xyz[3 * m + 2] = xyz[3 * i + 2];
            out_offt[m] = offt[i];
            m++;
        }
    }
    for (long u = 0; u < uniques; u++) keys[used[u]] = EMPTY;
    return overflow ? -1 : (int)m;
}

// Multi-cell variant: try `cells[start..n_cells)` in order inside ONE
// native call (the Python-side retry loop costs a full ctypes call +
// argument marshalling per try, and the common case needs 2-3 tries
// when the starting cell is too fine).  Writes the first fitting
// result; returns the index of the cell used (>= start), or -1 when
// even the coarsest overflows.
int voxel_reduce_auto(const float* xyz, const float* offt, long n,
                      const double* cells, int n_cells, int start,
                      float* out_xyz, float* out_offt, long max_out,
                      long* out_m)
{
    for (int c = start < 0 ? 0 : start; c < n_cells; c++) {
        int m = voxel_reduce(xyz, offt, n, cells[c], out_xyz, out_offt,
                             max_out);
        if (m >= 0) { *out_m = m; return c; }
    }
    *out_m = 0;
    return -1;
}

// Centroid (voxel-average) reduction: the mean point per cell, the
// host-side counterpart of the DEVICE voxel_average used by the
// keyframe loop program (reference down_sampling_voxel semantics,
// tools.hpp:201-238).  Pre-reducing the merged keyframe cloud here
// lets the per-keyframe device program skip its sort-based
// downsample (~9 ms/keyframe of serialized device time) — the BTC
// extract consumes the same centroids either way.  Same persistent
// SoA probe-table pattern as voxel_reduce above; accumulators are
// f64 so the merge order cannot move centroids at f32 lsb scale.
// Returns the reduced count, or -1 when distinct cells exceed
// max_out (callers fall back to the device path).
int voxel_centroid(const float* xyz, long n, double cell,
                   float* out_xyz, long max_out)
{
    if (n <= 0 || cell <= 0.0 || max_out <= 0) return 0;
    long cap = 1;
    while (cap < 2 * (max_out + 1)) cap <<= 1;
    static thread_local int64_t* keys = nullptr;
    static thread_local double* acc = nullptr;  // (cap, 4): sx sy sz cnt
    static thread_local int32_t* used = nullptr;
    static thread_local long cap_alloc = 0, used_cap = 0;
    const int64_t EMPTY = INT64_MIN;
    if (cap > cap_alloc) {
        delete[] keys; delete[] acc;
        keys = new int64_t[cap];
        acc = new double[4 * cap];
        for (long s = 0; s < cap; s++) keys[s] = EMPTY;
        cap_alloc = cap;
    }
    if (max_out + 1 > used_cap) {
        delete[] used;
        used = new int32_t[max_out + 1];
        used_cap = max_out + 1;
    }
    const long mask = cap_alloc - 1;
    const float inv = (float)(1.0 / cell);
    long uniques = 0;
    bool overflow = false;
    int64_t last_key = EMPTY;
    long last_slot = 0;
    for (long i = 0; i < n; i++) {
        float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
        float fx = floorf(x * inv), fy = floorf(y * inv),
              fz = floorf(z * inv);
        int64_t key = ((int64_t)((long)fx & 0x1FFFFF) << 42)
                    | ((int64_t)((long)fy & 0x1FFFFF) << 21)
                    | (int64_t)((long)fz & 0x1FFFFF);
        long s;
        if (key == last_key) {
            s = last_slot;
        } else {
            uint64_t h = (uint64_t)key * 0x9E3779B97F4A7C15ull;
            s = (long)((h >> 32) & (uint64_t)mask);
            while (keys[s] != EMPTY && keys[s] != key)
                s = (s + 1) & mask;
            if (keys[s] == EMPTY) {
                if (uniques >= max_out) { overflow = true; break; }
                keys[s] = key;
                acc[4 * s] = acc[4 * s + 1] = acc[4 * s + 2] =
                    acc[4 * s + 3] = 0.0;
                used[uniques++] = (int32_t)s;
            }
            last_key = key;
            last_slot = s;
        }
        acc[4 * s] += x;
        acc[4 * s + 1] += y;
        acc[4 * s + 2] += z;
        acc[4 * s + 3] += 1.0;
    }
    long m = 0;
    if (!overflow) {
        for (long u = 0; u < uniques; u++) {
            long s = used[u];
            double c = acc[4 * s + 3];
            out_xyz[3 * m + 0] = (float)(acc[4 * s] / c);
            out_xyz[3 * m + 1] = (float)(acc[4 * s + 1] / c);
            out_xyz[3 * m + 2] = (float)(acc[4 * s + 2] / c);
            m++;
        }
    }
    for (long u = 0; u < uniques; u++) keys[used[u]] = EMPTY;
    return overflow ? -1 : (int)m;
}

}  // extern "C"
