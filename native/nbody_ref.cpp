// Exact f64 O(N^2) reference kernels for host-side verification.
//
// The device engine computes in f32/ds32; measuring its energy drift needs
// an oracle with more precision than the thing being measured. numpy's
// chunked f64 path allocates multi-GB temporaries at N=65536; this flat
// C++ loop (auto-vectorized, cache-blocked) evaluates the softened
// potential and accelerations exactly, in-place, in seconds.
//
// Built as a plain shared library (no pybind11 in this image); consumed
// via ctypes from orbital_tpu.utils.native with a numpy fallback.
#include <cmath>
#include <cstdint>

extern "C" {

// Total softened potential: U = -G * sum_{i<j} m_i m_j / sqrt(r^2 + eps2).
double nbody_potential(const double* pos, const double* mass,
                       int64_t n, double eps2, double G) {
    double U = 0.0;
    constexpr int64_t B = 256;  // block for L1/L2 locality
    for (int64_t ib = 0; ib < n; ib += B) {
        const int64_t iend = ib + B < n ? ib + B : n;
        for (int64_t jb = ib; jb < n; jb += B) {
            const int64_t jend = jb + B < n ? jb + B : n;
            for (int64_t i = ib; i < iend; ++i) {
                const double xi = pos[3 * i], yi = pos[3 * i + 1], zi = pos[3 * i + 2];
                const double mi = mass[i];
                const int64_t j0 = (jb > i + 1) ? jb : i + 1;
                double acc_u = 0.0;
                for (int64_t j = j0; j < jend; ++j) {
                    const double dx = pos[3 * j] - xi;
                    const double dy = pos[3 * j + 1] - yi;
                    const double dz = pos[3 * j + 2] - zi;
                    const double r2 = dx * dx + dy * dy + dz * dz + eps2;
                    acc_u += mass[j] / std::sqrt(r2);
                }
                U -= G * mi * acc_u;
            }
        }
    }
    return U;
}

// Softened accelerations: acc[i] += G sum_j m_j (r_j - r_i) / s^3.
void nbody_accelerations(const double* pos, const double* mass,
                         int64_t n, double eps2, double G, double* acc) {
    for (int64_t i = 0; i < n; ++i) {
        acc[3 * i] = acc[3 * i + 1] = acc[3 * i + 2] = 0.0;
    }
    for (int64_t i = 0; i < n; ++i) {
        const double xi = pos[3 * i], yi = pos[3 * i + 1], zi = pos[3 * i + 2];
        const double mi = mass[i];
        double ax = 0.0, ay = 0.0, az = 0.0;
        for (int64_t j = i + 1; j < n; ++j) {
            const double dx = pos[3 * j] - xi;
            const double dy = pos[3 * j + 1] - yi;
            const double dz = pos[3 * j + 2] - zi;
            const double r2 = dx * dx + dy * dy + dz * dz + eps2;
            const double inv = 1.0 / std::sqrt(r2);
            const double w = inv * inv * inv;
            const double wj = w * mass[j];
            ax += wj * dx; ay += wj * dy; az += wj * dz;
            const double wi = w * mi;  // Newton's third law
            acc[3 * j]     -= wi * dx;
            acc[3 * j + 1] -= wi * dy;
            acc[3 * j + 2] -= wi * dz;
        }
        acc[3 * i]     += ax;
        acc[3 * i + 1] += ay;
        acc[3 * i + 2] += az;
    }
    for (int64_t i = 0; i < 3 * n; ++i) acc[i] *= G;
}

}  // extern "C"
